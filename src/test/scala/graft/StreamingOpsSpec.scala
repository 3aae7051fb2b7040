package graft

import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.{SessionEvent, SessionSummary}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

class StreamingOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  test("withStatePartitions restores explicit values and UNSETS unset keys") {
    val key = "spark.sql.shuffle.partitions"
    val original = spark.conf.getAll.get(key)
    try {
      // explicitly-set before: restored to that exact explicit value
      spark.conf.set(key, "13")
      StreamingOps.withStatePartitions(spark, 5) {
        assert(spark.conf.get(key) === "5")
      }
      assert(spark.conf.getAll.get(key) === Some("13"))
      // unset before: must come back UNSET (resolving to the session
      // default), never pinned to a materialized default value
      spark.conf.unset(key)
      StreamingOps.withStatePartitions(spark, 5) {
        assert(spark.conf.get(key) === "5")
      }
      assert(spark.conf.getAll.get(key) === None,
        "an unset key must not be pinned by the restore")
    } finally original match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("windowed aggregation with watermark over a memory stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val agg = StreamingOps.windowedAgg(events, "ts", "event_type", "10 minutes",
      watermarkDelay = "5 minutes")
    val q = agg.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("win_out")
      .option("checkpointLocation", tmp("ckpt-win")).start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    input.addData(
      (ts("2024-01-01 00:01:00"), "click", 1.0),
      (ts("2024-01-01 00:04:00"), "click", 2.0),
      (ts("2024-01-01 00:11:00"), "view", 5.0))
    q.processAllAvailable()
    // advance the watermark far enough to close the first windows
    input.addData((ts("2024-01-01 01:00:00"), "click", 1.0))
    q.processAllAvailable()
    val rows = spark.table("win_out")
      .select("window_start", "event_type", "n", "total_value").collect()
    q.stop()
    val byKey = rows.map(r => (r.getTimestamp(0).toString, r.getString(1)) ->
      (r.getLong(2), r.getDouble(3))).toMap
    assert(byKey(("2024-01-01 00:00:00.0", "click")) === (2L, 3.0))
    assert(byKey(("2024-01-01 00:10:00.0", "view")) === (1L, 5.0))
  }

  test("sessionize closes sessions on inactivity gap within a batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val sessions = StreamingOps.sessionize(input.toDS(), gap = 60000L,
      timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
    val q = sessions.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sess_out")
      .option("checkpointLocation", tmp("ckpt-sess")).start()
    // user 1: two events 10s apart (one session), then a 5-minute gap and
    // another event -> first session closes when the later batch arrives
    input.addData(
      SessionEvent(1L, 1000L, 1.0),
      SessionEvent(1L, 11000L, 2.0),
      SessionEvent(1L, 400000L, 3.0))
    q.processAllAvailable()
    val closed = spark.table("sess_out").as[SessionSummary].collect()
    q.stop()
    assert(closed.length === 1)
    assert(closed.head === SessionSummary(1L, 1000L, 11000L, 2L, 3.0))
  }

  test("sessionize: a late cross-batch event extends the session backward, never regresses it") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val sessions = StreamingOps.sessionize(input.toDS(), gap = 60000L,
      timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
    val q = sessions.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sess_late_out")
      .option("checkpointLocation", tmp("ckpt-sess-late")).start()
    // batch 1: session at t=100000..110000
    input.addData(SessionEvent(7L, 100000L, 1.0), SessionEvent(7L, 110000L, 1.0))
    q.processAllAvailable()
    // batch 2: a LATE event inside [start-gap, last+gap] must merge on the
    // low end (start := min) without regressing `last`
    input.addData(SessionEvent(7L, 60000L, 1.0))
    q.processAllAvailable()
    // batch 3: an event past last+gap closes the (extended) session
    input.addData(SessionEvent(7L, 500000L, 9.0))
    q.processAllAvailable()
    val closed = spark.table("sess_late_out").as[SessionSummary].collect()
    q.stop()
    assert(closed.length === 1)
    assert(closed.head === SessionSummary(7L, 60000L, 110000L, 3L, 3.0),
      "late event must extend start and keep end — end < start means state regressed")
  }

  test("sessionize rejects EventTimeTimeout up front (ms-epoch vs caller-unit mismatch)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val e = intercept[IllegalArgumentException] {
      StreamingOps.sessionize(input.toDS(), gap = 1000L,
        timeout = org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout)
    }
    assert(e.getMessage.contains("EventTimeTimeout"))
  }

  test("toPartitionedParquet writes a date-partitioned streaming sink") {
    val stage = java.nio.file.Path.of(tmp("events-psink"), "events.parquet")
    java.nio.file.Files.copy(
      java.nio.file.Path.of("/root/testdata/sf0.001/events.parquet"), stage)
    val raw = spark.readStream
      .schema(spark.read.parquet(stage.toString).schema)
      .parquet(stage.getParent.toString)
    val withDay = Tables.withEventTimeCols(raw)
      .withColumn("day", to_date(col("ts_t")))
      .select("event_id", "user_id", "value", "day")
    val out = tmp("psink-out")
    val q = StreamingOps.toPartitionedParquet(withDay, out, tmp("ckpt-psink"), Seq("day"))
    q.awaitTermination()
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
      .filterNot(_ == "_spark_metadata") // the sink's transaction log
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("day=")),
      s"expected hive day= partitions, got ${dirs.mkString(",")}")
    val expected = spark.read.parquet("/root/testdata/sf0.001/events.parquet").count()
    assert(spark.read.parquet(out).count() === expected)
  }

  test("state-store floor audit: q60/x112 state holds exactly the live groups, no residue") {
    // the r14 verdict's item 5: the two multi-second streaming floors
    // (x112 4.0 s, q60 2.2–3.2 s) are documented STATE-STORE STARTUP
    // floors, not per-row state growth. This audit pins that as a
    // measured contract via drainToMemory's state-row capture:
    //  - x112 (Complete-mode per-term aggregate): the store must hold
    //    EXACTLY one register per live (term, df_c) group — i.e. the
    //    state row count equals the output row count, at BOTH SFs. A
    //    leak (residue from dropped groups, duplicated registers)
    //    breaks the equality immediately.
    //  - q60 (watermarked stream-stream join): state is bounded by
    //    the two sides' retained tails — never more than the total
    //    view+click volume, and strictly positive (an empty store
    //    would mean the join never buffered, i.e. the test lost its
    //    subject).
    import graft.streaming.StreamingOps
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val ledger = SparkEntry.queries("x112_stream_index_ledger")(spark, sf)
      val outRows = ledger.count()
      assert(StreamingOps.lastDrainStateRows === outRows,
        s"x112 state rows != live groups at $sf — per-group residue")
      val joined = SparkEntry.queries("q60_stream_stream_join")(spark, sf)
      joined.count(): Unit
      val vc = Tables.events(spark, sf)
        .filter(col("event_type").isin("view", "click")).count()
      assert(StreamingOps.lastDrainStateRows > 0L,
        s"q60 join state empty at $sf")
      assert(StreamingOps.lastDrainStateRows <= vc,
        s"q60 join state exceeds the view+click volume at $sf — " +
          "rows are being retained more than once")
    }
  }

  test("x117: streaming mixture drift is a zero-sum ppm balance over bounded state") {
    val rows = QueriesStreaming
      .x117_stream_mixture_drift(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length > 1, "need several sources to monitor")
    // both share columns are normalized mixtures (truncation band), so
    // the drift column must sum inside ±|sources| of zero
    val dSum = rows.map(_.getAs[Long]("delta_ppm")).sum
    val sSum = rows.map(_.getAs[Long]("standing_ppm")).sum
    val drift = rows.map(_.getAs[Long]("drift_ppm")).sum
    assert(dSum <= 1000000L && dSum > 1000000L - rows.length)
    assert(sSum <= 1000000L && sSum > 1000000L - rows.length)
    assert(math.abs(drift) < rows.length.toLong,
      s"drift must be zero-sum up to truncation, got $drift")
    // per-row identity: drift is exactly the share difference
    rows.foreach { r =>
      assert(r.getAs[Long]("drift_ppm") ===
        r.getAs[Long]("delta_ppm") - r.getAs[Long]("standing_ppm"))
    }
  }

  test("AvailableNow drains the events table as an incremental batch") {
    // FileStreamSource needs a directory: stage the events file into one
    val stage = java.nio.file.Path.of(tmp("events-stage"), "events.parquet")
    java.nio.file.Files.copy(
      java.nio.file.Path.of("/root/testdata/sf0.001/events.parquet"), stage)
    val raw = spark.readStream
      .schema(spark.read.parquet(stage.toString).schema)
      .parquet(stage.getParent.toString)
    val out = raw.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("value"))
    val drained = StreamingOps.drainToMemory(out, "drain_out", tmp("ckpt-drain"))
    val expected = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .filter(col("event_type") === "purchase").count()
    assert(drained.count() === expected)
    assert(expected > 0)
  }
}
