package graft

import graft.ops.AsOfJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  test("as-of picks the nearest prior right row per key; nulls before any") {
    val quotes = Seq( // key, t, qid, px
      (1, 10L, 100L, BigDecimal("1.00")),
      (1, 20L, 101L, BigDecimal("2.00")),
      (1, 20L, 102L, BigDecimal("3.00")), // same-time tie -> larger qid wins
      (2, 50L, 200L, BigDecimal("9.00")))
      .toDF("qk", "qt", "quote_id", "px")
    val trades = Seq( // key, t, tid
      (1, 5L, 1L), // before any quote -> nulls
      (1, 20L, 2L), // equal time -> sees the t=20 quote (tie: qid 102)
      (1, 25L, 3L), // after -> still qid 102
      (2, 60L, 4L),
      (3, 10L, 5L)) // key with no quotes -> nulls
      .toDF("tk", "tt", "trade_id")
    val out = AsOfJoin.asOf(trades, quotes,
      leftKey = "tk", rightKey = "qk", leftTime = "tt", rightTime = "qt",
      rightTiebreak = "quote_id", carryCols = Seq("quote_id", "px"))
      .collect().map(r => r.getLong(2) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(out(1L) === None)
    assert(out(2L) === Some(102L))
    assert(out(3L) === Some(102L))
    assert(out(4L) === Some(200L))
    assert(out(5L) === None)
  }

  test("as-of plan is one shuffle on the key (window), no nested loop") {
    val l = Seq((1, 10L, 1L)).toDF("k", "t", "id")
    val r = Seq((1, 5L, 7L)).toDF("rk", "rt", "rid")
    val plan = AsOfJoin.asOf(l, r, "k", "rk", "t", "rt", "rid", Seq("rid"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"))
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("Window"))
  }
}
