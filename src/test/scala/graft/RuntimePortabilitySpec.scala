package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Guards against the Spark-runtime drift that killed round 8: Spark 4.1
  * dropped `spark.sql.legacy.parquet.nanosAsLong`, so parquet
  * TIMESTAMP(NANOS) started surfacing as TIMESTAMP_NTZ instead of a raw
  * ns-epoch Long, and the single `ts_us` derivation in
  * [[Tables.withEventTimeCols]] broke 23 events-based queries at once.
  *
  * Two layers of defense:
  *  1. `withEventTimeCols` must produce the IDENTICAL `ts_us`/`ts_t` from
  *     both physical representations of the same instants (ns-Long and
  *     TIMESTAMP_NTZ), so a future reader change flips the dispatch branch
  *     without changing results.
  *  2. Every single [[SparkEntry.queries]] entry must at least ANALYZE
  *     against sf0.001 — an analysis-time break in ANY query fails the
  *     suite here instead of surfacing only in the driver gate.
  */
class RuntimePortabilitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get

  private val sfDir = "/root/testdata/sf0.001"

  test("withEventTimeCols: ns-Long and TIMESTAMP_NTZ inputs yield identical ts_us and ts_t") {
    import spark.implicits._
    // Same three instants (µs precision — TIMESTAMP_NTZ carries at most µs)
    // in both physical representations.
    val micros = Seq(1704067207179575L, 1706659032194062L, 0L)
    val asNsLong = micros.map(_ * 1000L).toDF("ts")
    val asNtz = micros
      .map(us => java.time.LocalDateTime.ofEpochSecond(
        us / 1000000L, (us % 1000000L).toInt * 1000, java.time.ZoneOffset.UTC))
      .toDF("ts")
    assert(asNsLong.schema("ts").dataType === LongType)
    assert(asNtz.schema("ts").dataType === TimestampNTZType)

    def derived(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      Tables.withEventTimeCols(df)
        .select(col("ts_us"), unix_micros(col("ts_t")))
        .as[(Long, Long)].collect().toSeq.sorted
    val fromLong = derived(asNsLong)
    val fromNtz = derived(asNtz)
    assert(fromLong === fromNtz,
      "the two physical ts representations must derive identical event time")
    assert(fromLong.map(_._1) === micros.sorted)
    // ts_t must round-trip ts_us exactly on both branches
    fromLong.foreach { case (us, t) => assert(us === t) }
  }

  test("withEventTimeCols: NTZ ts_us derivation is session-timezone-independent") {
    import spark.implicits._
    val micros = Seq(1704067207179575L, 1706659032194062L, 0L)
    val asNtz = micros
      .map(us => java.time.LocalDateTime.ofEpochSecond(
        us / 1000000L, (us % 1000000L).toInt * 1000, java.time.ZoneOffset.UTC))
      .toDF("ts")
    def derive(): Seq[Long] =
      Tables.withEventTimeCols(asNtz).select("ts_us").as[Long].collect().toSeq.sorted
    val tzKey = "spark.sql.session.timeZone"
    val saved = spark.conf.get(tzKey)
    try {
      val perTz = Seq("UTC", "America/New_York", "Asia/Kolkata").map { tz =>
        spark.conf.set(tzKey, tz); tz -> derive()
      }
      perTz.foreach { case (tz, got) =>
        assert(got === micros.sorted,
          s"NTZ-as-UTC ts_us must not shift under session tz $tz")
      }
    } finally spark.conf.set(tzKey, saved)
  }

  test("withEventTimeCols: ns-Long branch floors sub-microsecond precision") {
    import spark.implicits._
    val df = Seq(1500L, 999L, 1000L).toDF("ts")
    val us = Tables.withEventTimeCols(df).select("ts_us").as[Long].collect().sorted
    assert(us === Array(0L, 1L, 1L), "ns->us must truncate toward zero like epoch_us")
  }

  test("events reader: real parquet analyzes and ts_us is a Long column") {
    val ev = Tables.eventsNs(spark, sfDir)
    assert(ev.schema("ts_us").dataType === LongType)
    assert(ev.schema("ts_t").dataType === TimestampType)
    assert(ev.limit(1).count() === 1L)
  }

  test("every SparkEntry query analyzes at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          // Constructing the frame + touching the analyzed plan is exactly
          // what the driver needs to get past ExtendedAnalysisException.
          fn(spark, sfDir).queryExecution.analyzed
          None
        } catch {
          case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName}: " +
            e.getMessage.linesIterator.take(2).mkString(" "))
        }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries fail analysis:\n${failures.mkString("\n")}")
  }

  test("queries and oracleSql keysets line up (driver compare contract)") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle entries without a query: ${(o -- q).toSeq.sorted}")
    // the realistic mistake is the OTHER direction: a query registered
    // without its oracle silently drops out of the hash gate. Every query
    // in this engine is oracle-gated; a future genuinely non-SQL-
    // expressible operator must be added to this explicit allowlist, not
    // slip through silently.
    val oracleExempt = Set.empty[String]
    assert((q -- o -- oracleExempt).isEmpty,
      s"queries without an oracle entry: ${(q -- o -- oracleExempt).toSeq.sorted}")
  }
}
