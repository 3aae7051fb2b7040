package graft

import graft.ops.RankLowering
import graft.patterns.WindowSqlLowering
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType
import org.scalatest.funsuite.AnyFunSuite

/** The two-phase distributed rank must be indistinguishable from the raw
  * window in RESULT while never scheduling a partition-sized sort task. */
class RankLoweringSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private lazy val df = (1 to 500)
    .map(i => (i.toLong, s"k${i % 3}", (i * 37 % 101).toDouble))
    .toDF("id", "k", "v")

  test("two-phase row_number equals the raw window (partitioned)") {
    val raw = df.withColumn("rn",
      row_number().over(Window.partitionBy($"k").orderBy($"v".desc, $"id")))
    val low = RankLowering.rowNumber(df, Seq(col("k")),
      Seq(col("v").desc, col("id").asc), "rn", buckets = 7)
    assert(low.schema("rn").dataType === IntegerType)
    val a = raw.select("id", "k", "v", "rn")
      .as[(Long, String, Double, Int)].collect().toSeq.sorted
    val b = low.select("id", "k", "v", "rn")
      .as[(Long, String, Double, Int)].collect().toSeq.sorted
    assert(a === b)
  }

  test("two-phase row_number equals the raw window (global, q75 shape)") {
    val raw = df.withColumn("rn",
      row_number().over(Window.orderBy($"v".desc, $"id")))
    val low = RankLowering.rowNumber(df, Nil,
      Seq(col("v").desc, col("id").asc), "rn", buckets = 7)
    val a = raw.select("id", "rn").as[(Long, Int)].collect().toSeq.sorted
    val b = low.select("id", "rn").as[(Long, Int)].collect().toSeq.sorted
    assert(a === b)
    // every local-rank window task is bucket-keyed, never the bare frame
    val plan = low.queryExecution.executedPlan.toString
    assert(plan.contains("__graft_rk_b"),
      "local rank must window over the range bucket")
  }

  test("WindowSqlLowering lowers the single-ROW_NUMBER analytic select") {
    df.createOrReplaceTempView("rk_t")
    val sql = "SELECT id, k, v, ROW_NUMBER() OVER (PARTITION BY k " +
      "ORDER BY v DESC, id) AS rn FROM rk_t"
    val low = WindowSqlLowering.lower(spark, sql)
      .getOrElse(fail("canonical analytic select did not lower"))
    assert(low.columns.toSeq === Seq("id", "k", "v", "rn"))
    val a = spark.sql(sql).as[(Long, String, Double, Int)]
      .collect().toSeq.sorted
    val b = low.as[(Long, String, Double, Int)].collect().toSeq.sorted
    assert(a === b)
    assert(low.queryExecution.executedPlan.toString.contains("__graft_rk_b"))
    // window item FIRST in the list: removed comma + column order survive
    val first = "SELECT ROW_NUMBER() OVER (ORDER BY v, id) AS rn, id, v FROM rk_t"
    val lowF = WindowSqlLowering.lower(spark, first)
      .getOrElse(fail("leading window item did not lower"))
    assert(lowF.columns.toSeq === Seq("rn", "id", "v"))
    val af = spark.sql(first).as[(Int, Long, Double)].collect().toSeq.sorted
    val bf = lowF.as[(Int, Long, Double)].collect().toSeq.sorted
    assert(af === bf)
  }

  test("NULL partition keys rank as a group, never dropped") {
    // a raw window treats NULL as one partition value; the offsets join
    // must be null-safe or every NULL-keyed row silently vanishes
    val dfN = Seq((1L, Some("a")), (2L, None), (3L, None), (4L, Some("a")))
      .toDF("id", "k")
    val raw = dfN.withColumn("rn",
        row_number().over(Window.partitionBy($"k").orderBy($"id")))
      .select("id", "rn").as[(Long, Int)].collect().toSeq.sorted
    val low = RankLowering.rowNumber(dfN, Seq(col("k")),
        Seq(col("id").asc), "rn", buckets = 3)
      .select("id", "rn").as[(Long, Int)].collect().toSeq.sorted
    assert(low === raw)
    assert(low.size === 4, "NULL-keyed rows were dropped by the offsets join")
  }

  test("alias shadowing, star items, and outer ORDER BY decline or stay exact") {
    df.createOrReplaceTempView("rk_t")
    // alias shadows an input column with a DIFFERENT expression: the raw
    // window orders by INPUT v, re-reading the alias would reverse the
    // rank — must decline
    assert(WindowSqlLowering.lower(spark,
      "SELECT k, 0 - v AS v, ROW_NUMBER() OVER (ORDER BY v, id) AS rn FROM rk_t")
      .isEmpty)
    // the q83 idiom: the OVER item is textually the aliased expression —
    // reusing the output column is exact, the lowering must fire
    val cast = "SELECT id, k, CAST(v AS DECIMAL(10,1)) AS v, ROW_NUMBER() " +
      "OVER (ORDER BY CAST(v AS DECIMAL(10,1)) DESC, id) AS rn FROM rk_t"
    val low = WindowSqlLowering.lower(spark, cast)
      .getOrElse(fail("aliased-expression reuse did not lower"))
    val a = spark.sql(cast).select("id", "rn").as[(Long, Int)]
      .collect().toSeq.sorted
    val b = low.select("id", "rn").as[(Long, Int)].collect().toSeq.sorted
    assert(a === b)
    // star items expand to several columns — item-position accounting
    // cannot hold, must decline
    assert(WindowSqlLowering.lower(spark,
      "SELECT *, ROW_NUMBER() OVER (ORDER BY id) AS rn FROM rk_t").isEmpty)
    // a top-level ORDER BY's row order would be destroyed — decline
    assert(WindowSqlLowering.lower(spark,
      "SELECT id, ROW_NUMBER() OVER (ORDER BY id) AS rn FROM rk_t ORDER BY id")
      .isEmpty)
    // a ' from ' INSIDE a string literal must not truncate the select
    // list — the shadowing alias after the literal is still seen and
    // the statement declines (the masked-scan contract)
    assert(WindowSqlLowering.lower(spark,
      "SELECT id, ROW_NUMBER() OVER (ORDER BY v) AS rn, " +
        "'x from y' AS note, 0 - v AS v FROM rk_t").isEmpty)
    // and a benign literal containing ' from '/' limit ' still lowers
    val benign = "SELECT id, v, 'from a limit b' AS note, " +
      "ROW_NUMBER() OVER (ORDER BY v, id) AS rn FROM rk_t"
    val lowB = WindowSqlLowering.lower(spark, benign)
      .getOrElse(fail("benign literal blocked the lowering"))
    val ab = spark.sql(benign).select("id", "rn").as[(Long, Int)]
      .collect().toSeq.sorted
    val bb = lowB.select("id", "rn").as[(Long, Int)].collect().toSeq.sorted
    assert(ab === bb)
  }

  test("property: two-phase equals raw window across shapes and bucket counts") {
    // heavy ties, skewed partitions, tiny/huge bucket counts — the
    // decomposition must be exact everywhere the order is total
    val rnd = new scala.util.Random(7)
    val data = (1 to 400).map { i =>
      (i.toLong, s"p${rnd.nextInt(2) * rnd.nextInt(3)}", rnd.nextInt(5).toDouble)
    }
    val df2 = data.toDF("id", "k", "v")
    for (buckets <- Seq(1, 3, 64, 200)) {
      val raw = df2.withColumn("rn", row_number().over(
        Window.partitionBy($"k").orderBy($"v", $"id".desc)))
        .select("id", "rn").as[(Long, Int)].collect().toSeq.sorted
      val low = RankLowering.rowNumber(df2, Seq(col("k")),
          Seq(col("v").asc, col("id").desc), "rn", buckets)
        .select("id", "rn").as[(Long, Int)].collect().toSeq.sorted
      assert(low === raw, s"mismatch at buckets=$buckets")
    }
  }

  test("property: rankLike equals raw RANK/DENSE_RANK across tie-heavy shapes") {
    // rank/dense_rank are tie-GROUP functions: the heavy-tie generator
    // (5 distinct v values over 400 rows) forces tie groups to straddle
    // every range-bucket boundary at small bucket counts — the distinct
    // key frame must make that unobservable
    val rnd = new scala.util.Random(11)
    val data = (1 to 400).map { i =>
      (i.toLong, s"p${rnd.nextInt(2) * rnd.nextInt(3)}", rnd.nextInt(5).toDouble)
    }
    val df2 = data.toDF("id", "k", "v")
    for {
      buckets <- Seq(1, 3, 64)
      desc <- Seq(false, true)
    } {
      val w = Window.partitionBy($"k")
        .orderBy(if (desc) $"v".desc else $"v".asc)
      val raw = df2
        .withColumn("r", rank().over(w))
        .withColumn("d", dense_rank().over(w))
        .select("id", "r", "d").as[(Long, Int, Int)].collect().toSeq.sorted
      val lowR = RankLowering.rankLike(df2, Seq(col("k")), Seq(col("v")),
        Seq(desc), "r", dense = false, buckets)
      val low = RankLowering.rankLike(lowR, Seq(col("k")), Seq(col("v")),
        Seq(desc), "d", dense = true, buckets)
        .select("id", "r", "d").as[(Long, Int, Int)].collect().toSeq.sorted
      assert(low === raw, s"mismatch at buckets=$buckets desc=$desc")
    }
    // global (no partition) + NULL order values rank as a group
    val dfN = Seq((1L, Some(2.0)), (2L, None), (3L, Some(2.0)), (4L, None),
      (5L, Some(1.0))).toDF("id", "v")
    val rawN = dfN.withColumn("r", rank().over(Window.orderBy($"v")))
      .select("id", "r").as[(Long, Int)].collect().toSeq.sorted
    val lowN = RankLowering.rankLike(dfN, Nil, Seq(col("v")), Seq(false),
      "r", dense = false, buckets = 3)
      .select("id", "r").as[(Long, Int)].collect().toSeq.sorted
    assert(lowN === rawN, "NULL order keys must rank as one tie group")
  }

  test("WindowSqlLowering lowers RANK/DENSE_RANK through the key frame") {
    df.createOrReplaceTempView("rk_t")
    for (fn <- Seq("RANK", "DENSE_RANK")) {
      // heavy ties: v has 101 distinct values over 500 rows
      val sql = s"SELECT id, k, v, $fn() OVER (PARTITION BY k " +
        "ORDER BY v DESC) AS rk FROM rk_t"
      val low = WindowSqlLowering.lower(spark, sql)
        .getOrElse(fail(s"$fn analytic select did not lower"))
      assert(low.columns.toSeq === Seq("id", "k", "v", "rk"))
      val a = spark.sql(sql).select("id", "rk").as[(Long, Int)]
        .collect().toSeq.sorted
      val b = low.select("id", "rk").as[(Long, Int)].collect().toSeq.sorted
      assert(a === b, s"$fn lowering changed the result")
      // the plan ranks the DISTINCT key frame with bucket-keyed tasks —
      // no window partitioned by the bare low-cardinality key survives
      val plan = low.queryExecution.executedPlan.toString
      assert(plan.contains("__graft_rkk_"),
        s"$fn must route through rankLike's key frame")
      val rawWin = plan.linesIterator.filter(l =>
        l.contains("Window") && (l.contains("rank(") || l.contains("dense_rank(")))
      assert(rawWin.isEmpty, s"$fn kept a raw rank window")
    }
  }

  test("property: ntile equals the raw window across n, buckets, partitions") {
    // uneven splits are the hazard: cnt % n tiles carry one extra row,
    // and a double-division boundary error would shift whole tiles
    val rnd = new scala.util.Random(13)
    val data = (1 to 377).map { i =>
      (i.toLong, s"p${rnd.nextInt(3)}", rnd.nextDouble())
    }
    val df2 = data.toDF("id", "k", "v")
    for {
      n <- Seq(1, 3, 4, 7, 500) // 500 > any partition: every row its own tile
      buckets <- Seq(3, 64)
    } {
      val raw = df2.withColumn("t",
        ntile(n).over(Window.partitionBy($"k").orderBy($"v", $"id")))
        .select("id", "t").as[(Long, Int)].collect().toSeq.sorted
      val low = RankLowering.ntile(df2, Seq(col("k")),
        Seq(col("v").asc, col("id").asc), n, "t", buckets)
        .select("id", "t").as[(Long, Int)].collect().toSeq.sorted
      assert(low === raw, s"mismatch at n=$n buckets=$buckets")
    }
    // global (no partition): counts ride a 1-row broadcast
    val rawG = df2.withColumn("t", ntile(7).over(Window.orderBy($"v", $"id")))
      .select("id", "t").as[(Long, Int)].collect().toSeq.sorted
    val lowG = RankLowering.ntile(df2, Nil, Seq(col("v").asc, col("id").asc),
      7, "t", 5)
      .select("id", "t").as[(Long, Int)].collect().toSeq.sorted
    assert(lowG === rawG)
  }

  test("WindowSqlLowering lowers NTILE(k) through the two-phase rank") {
    df.createOrReplaceTempView("rk_t")
    val sql = "SELECT id, k, v, NTILE(4) OVER (PARTITION BY k " +
      "ORDER BY v, id) AS qt FROM rk_t"
    val low = WindowSqlLowering.lower(spark, sql)
      .getOrElse(fail("NTILE analytic select did not lower"))
    assert(low.columns.toSeq === Seq("id", "k", "v", "qt"))
    val a = spark.sql(sql).select("id", "qt").as[(Long, Int)]
      .collect().toSeq.sorted
    val b = low.select("id", "qt").as[(Long, Int)].collect().toSeq.sorted
    assert(a === b)
    val plan = low.queryExecution.executedPlan.toString
    assert(plan.contains("__graft_rk_b"),
      "NTILE must ride the bucket-keyed two-phase row number")
    assert(!plan.linesIterator.exists(l =>
      l.contains("Window") && l.contains("ntile(")),
      "a raw ntile window survived the lowering")
    // a non-integer ntile arg is off-shape: falls back to raw SQL
    assert(WindowSqlLowering.lower(spark,
      "SELECT id, NTILE(v) OVER (ORDER BY id) AS qt FROM rk_t").isEmpty)
  }

  test("bucket ids are a pure row function: many-partition input, exact ranks") {
    // the r12 regression class: with repartitionByRange +
    // spark_partition_id, a multi-partition input made RangePartitioner
    // re-sample per evaluation, and whenever exchange reuse failed the
    // window and the offsets aggregate disagreed bucket-for-row —
    // duplicate AND missing ranks (~30% of rows on a 15k parquet scan).
    // Literal value boundaries make the bucket deterministic; this pin
    // drives the shape that exposed it: a many-partition input whose
    // consumers each re-evaluate the frame.
    val many = (1 to 5000)
      .map(i => (i.toLong, s"k${i % 3}", (i * 2654435761L % 9973).toDouble))
      .toDF("id", "k", "v").repartition(37)
    val rn = RankLowering.rowNumber(many, Seq(col("k")),
      Seq(col("v").desc, col("id").asc), "rn", buckets = 16)
    val sanity = rn.groupBy("k")
      .agg(max("rn").as("mx"), count(lit(1)).as("n"),
        countDistinct("rn").as("d"))
      .as[(String, Int, Long, Long)].collect()
    sanity.foreach { case (k, mx, n, d) =>
      assert(mx.toLong === n && d === n,
        s"partition $k: max=$mx n=$n distinct=$d — ranks must be a " +
          "permutation of 1..n on every evaluation")
    }
    // and the values equal the raw window's
    val raw = many.withColumn("rn", row_number().over(
      Window.partitionBy($"k").orderBy($"v".desc, $"id".asc)))
      .select("id", "rn").as[(Long, Int)].collect().toSeq.sorted
    val low = rn.select("id", "rn").as[(Long, Int)].collect().toSeq.sorted
    assert(low === raw)
  }

  test("boundary sample is globally budgeted at any partition count") {
    // the r12 scale caveat: 128 rows/partition × unbounded partitions
    // collected ~100M key tuples to the driver at the 100 TB partition
    // count. The plan caps the TOTAL: ≤ ~2·buckets·128 tuples however
    // many partitions the scan has, and reproduces the old full sample
    // exactly below ~budget/128 partitions (small-SF plans unchanged).
    def collected(parts: Int, buckets: Int): Long = {
      val (perPart, stride) = RankLowering.samplePlan(parts, buckets)
      // contributing partitions = ceil(parts / stride)
      (parts.toLong + stride - 1) / stride * perPart
    }
    for (buckets <- Seq(16, 64, 256); parts <- Seq(1, 32, 64, 1000,
        100000, 800000, Int.MaxValue / 2)) {
      val budget = buckets * 128L
      assert(collected(parts, buckets) <= 2 * budget,
        s"parts=$parts buckets=$buckets collects ${collected(parts, buckets)}" +
          s" > 2×budget ${2 * budget}")
    }
    // unchanged at sandbox scale: full 128/partition, no striding
    assert(RankLowering.samplePlan(32, 64) === ((128, 1)))
    assert(RankLowering.samplePlan(64, 64) === ((128, 1)))
    // boundary math itself never depends on the sample: ranks stay
    // exact on an input partitioned past the budget, which forces the
    // strided path (buckets=1 → budget 128, 300 partitions → stride 2)
    assert(RankLowering.samplePlan(300, 1)._2 > 1, "stride must engage")
    val many = (1 to 4000).map(i => (i.toLong, (i * 48271 % 7919).toDouble))
      .toDF("id", "v").repartition(300)
    val rn = RankLowering.rowNumber(many, Nil, Seq(col("v").asc), "rn",
      buckets = 1)
    val rn2 = RankLowering.rowNumber(many, Nil, Seq(col("v").asc), "rn",
      buckets = 2)
    val raw = many.withColumn("rn", row_number().over(
        Window.orderBy($"v".asc)))
      .select("id", "rn").as[(Long, Int)].collect().toSeq.sorted
    assert(rn.select("id", "rn").as[(Long, Int)].collect().toSeq.sorted === raw)
    assert(rn2.select("id", "rn").as[(Long, Int)].collect().toSeq.sorted === raw)
  }

  test("off-shape selects fall back to raw SQL (None)") {
    df.createOrReplaceTempView("rk_t")
    // two windows
    assert(WindowSqlLowering.lower(spark,
      "SELECT ROW_NUMBER() OVER (ORDER BY id) AS a, " +
        "ROW_NUMBER() OVER (ORDER BY v) AS b FROM rk_t").isEmpty)
    // window inside a subquery, not the top-level list
    assert(WindowSqlLowering.lower(spark,
      "SELECT * FROM (SELECT id, ROW_NUMBER() OVER (ORDER BY id) AS rn " +
        "FROM rk_t) s WHERE rn <= 3").isEmpty)
    // no alias
    assert(WindowSqlLowering.lower(spark,
      "SELECT id, ROW_NUMBER() OVER (ORDER BY id) FROM rk_t").isEmpty)
    // OVER references a column the window-free select does not carry:
    // must decline (raw SQL computes it; a lowering could not)
    assert(WindowSqlLowering.lower(spark,
      "SELECT k, ROW_NUMBER() OVER (ORDER BY v) AS rn FROM rk_t").isEmpty)
    // window embedded in an arithmetic item is not a whole-item window
    assert(WindowSqlLowering.lower(spark,
      "SELECT id, 1 + ROW_NUMBER() OVER (ORDER BY id) AS rn FROM rk_t").isEmpty)
    // DISTINCT dedups AFTER the window in SQL — rank-after-removal would
    // dedup first; LIMIT bounds the ranked output, not the rank's input
    assert(WindowSqlLowering.lower(spark,
      "SELECT DISTINCT k, ROW_NUMBER() OVER (ORDER BY k) AS rn FROM rk_t").isEmpty)
    assert(WindowSqlLowering.lower(spark,
      "SELECT id, ROW_NUMBER() OVER (ORDER BY id) AS rn FROM rk_t LIMIT 5").isEmpty)
  }
}
