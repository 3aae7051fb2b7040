package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming face of the incremental semantics (SURVEY.md §2.7).
  *
  * The reference has no true streams — its "streaming-shaped" features are
  * watermark variables, processed-flag handshakes and sync logs. Here those
  * become, respectively: event-time watermarks, checkpointed source
  * offsets, and streaming sinks; `Trigger.AvailableNow` turns the same
  * topology into the reference's incremental batch (drain everything new,
  * then stop — exactly the watermark-fetch + filter loop of
  * InventorySync.dtsx:58-63).
  */
object StreamingOps {

  /** File-based incremental source: processes whatever is new under
    * `path`, tracked by the checkpoint — the Structured-Streaming twin of
    * the `WHERE ModifiedDate >= ?` watermark pattern. */
  def fileStream(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(path)

  /** Tumbling/sliding window aggregation with a watermark for late data:
    * counts + sum(`valueCol`) per (window, key). */
  def windowedAgg(events: DataFrame, tsCol: String, keyCol: String,
      windowDur: String, slideDur: Option[String] = None,
      watermarkDelay: String = "10 minutes", valueCol: String = "value"): DataFrame = {
    val win = slideDur.fold(window(col(tsCol), windowDur))(s => window(col(tsCol), windowDur, s))
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(win.as("w"), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("total_value"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col(keyCol), col("n"), col("total_value"))
  }

  final case class SessionEvent(userId: Long, tsMs: Long, value: Double)
  final case class SessionState(start: Long, last: Long, n: Long, total: Double)
  final case class SessionSummary(userId: Long, sessionStartMs: Long, sessionEndMs: Long,
      nEvents: Long, totalValue: Double)

  /** Custom session windows via flatMapGroupsWithState: a session closes
    * after `gap` of inactivity — either when a later event arrives past
    * the gap, or (with `ProcessingTimeTimeout`, the production setting) via
    * a state timeout between micro-batches. The KeyValueGroupedDataset
    * path — the state store scales per-key, not per-executor.
    *
    * Units: `gap` is in the SAME unit as `SessionEvent.tsMs` (the gated
    * q44 passes µs). The processing-time timeout is WALL-CLOCK
    * milliseconds — a different clock entirely — so it has its own
    * parameter rather than reusing `gap` (reusing a µs gap as a ms
    * duration would arm a 1000× too-long timeout and closed sessions
    * would never flush between micro-batches).
    *
    * Out-of-order events ACROSS micro-batches: an event inside
    * `[start − gap, last + gap]` extends the session on BOTH ends
    * (start := min, last := max — `last` must never regress, which would
    * emit sessions with end < start); an event past `last + gap` closes
    * the session and starts a new one; an event older than `start − gap`
    * is emitted as its own already-closed session (nothing newer can
    * merge with it). In-batch events are sorted first, so a bounded
    * in-order drain (q44's gate path) reproduces the batch session
    * algebra exactly.
    *
    * Pass `NoTimeout` when draining bounded input (a timeout-driven query
    * never quiesces under `processAllAvailable`). `EventTimeTimeout` is
    * rejected up front: the state API's timeout timestamp is a ms-epoch
    * value against the stream's watermark, while `tsMs`'s unit is
    * caller-defined — a silent unit mismatch there loses state forever. */
  def sessionize(events: Dataset[SessionEvent], gap: Long,
      timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout,
      processingTimeoutMs: Long = 60000L): Dataset[SessionSummary] = {
    require(timeout != GroupStateTimeout.EventTimeTimeout,
      "EventTimeTimeout is unsupported: the state timeout timestamp is ms-epoch " +
        "against the stream watermark while tsMs's unit is caller-defined; " +
        "use ProcessingTimeTimeout (wall-clock flush) or NoTimeout (close by gap)")
    import events.sparkSession.implicits._
    val useTimeout = timeout != GroupStateTimeout.NoTimeout
    events.groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, SessionSummary](
        OutputMode.Append, timeout) {
        case (userId, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionSummary(userId, s.start, s.last, s.n, s.total))
          } else {
            val sorted = rows.toSeq.sortBy(_.tsMs)
            var closed = List.empty[SessionSummary]
            var cur = state.getOption
            sorted.foreach { e =>
              cur match {
                case Some(s) if e.tsMs >= s.start - gap && e.tsMs <= s.last + gap =>
                  cur = Some(SessionState(
                    math.min(s.start, e.tsMs), math.max(s.last, e.tsMs),
                    s.n + 1, s.total + e.value))
                case Some(s) if e.tsMs > s.last + gap =>
                  closed ::= SessionSummary(userId, s.start, s.last, s.n, s.total)
                  cur = Some(SessionState(e.tsMs, e.tsMs, 1, e.value))
                case Some(_) => // older than start − gap: late loner, already closed
                  closed ::= SessionSummary(userId, e.tsMs, e.tsMs, 1, e.value)
                case None =>
                  cur = Some(SessionState(e.tsMs, e.tsMs, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              if (useTimeout) state.setTimeoutDuration(processingTimeoutMs)
            }
            closed.reverseIterator
          }
      }
  }

  /** Runs `body` (which must both START its streaming query AND await
    * its termination inside — restoring the conf while microbatch
    * planning is still in flight would race the override) with
    * `spark.sql.shuffle.partitions` = `n`, restoring the previous value
    * after. Streaming state-store cardinality — shuffle partitions at
    * query start — is a VOLUME knob, not a semantics knob: a
    * stream-stream join materializes FOUR state stores per partition,
    * so per-partition provider setup dominates wall time whenever the
    * drained volume is small (measured on q60: 12.4 s at 32 partitions
    * → 3.2 s at 8, identical output). Size to stream volume: thousands
    * of partitions for a firehose, single digits for a bounded drain.
    * NOT thread-safe — the session conf is global; callers are the
    * serial gate/bench paths. */
  def withStatePartitions[A](spark: org.apache.spark.sql.SparkSession, n: Int)(
      body: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    // getAll carries only EXPLICIT settings — conf.get would materialize
    // the registered default (200) and the restore would then pin a value
    // for a key the caller never set, subtly changing later conf
    // resolution; an unset key must be restored by unsetting it
    val prev = spark.conf.getAll.get(key)
    spark.conf.set(key, n.toString)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  /** Run a streaming frame to completion over existing data and stop —
    * incremental-batch semantics (`Trigger.AvailableNow`). Results land in
    * an in-memory table named `queryName`. The whole start-and-await runs
    * under [[withStatePartitions]] sized by `statePartitions` (default 8:
    * a bounded drain, not a firehose — a forgotten override must not
    * silently pay 4× state-store setup per partition). */
  /** Peak state-store row count (summed across the last drain's
    * stateful operators, max over its microbatches) — the
    * state-growth audit surface: a Complete-mode aggregate must hold
    * exactly one register per live group, a watermarked join at most
    * its watermark-deep tail. -1 until a drain with state has run.
    * Written by [[drainToMemory]]; read by StreamingOpsSpec's floor
    * audit. NOT thread-safe (like withStatePartitions — callers are
    * the serial gate/bench paths). */
  @volatile private[graft] var lastDrainStateRows: Long = -1L

  def drainToMemory(df: DataFrame, queryName: String, checkpoint: String,
      outputMode: OutputMode = OutputMode.Append,
      statePartitions: Int = 8): DataFrame =
    withStatePartitions(df.sparkSession, statePartitions) {
      // re-running under the same name must not accumulate driver memory:
      // drop the previous drain's memory table (a terminated query has
      // already freed the query name)
      df.sparkSession.catalog.dropTempView(queryName): Unit
      val q = df.writeStream
        .outputMode(outputMode)
        .format("memory")
        .queryName(queryName)
        .option("checkpointLocation", checkpoint)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      lastDrainStateRows = q.recentProgress.toSeq
        .map(_.stateOperators.map(_.numRowsTotal).sum)
        .foldLeft(-1L)(math.max)
      df.sparkSession.table(queryName)
    }

  /** Streaming sink to partitioned parquet — the production write path
    * (date-partitioned sinks are the 100 TB posture; partition pruning on
    * read comes free). */
  def toPartitionedParquet(df: DataFrame, path: String, checkpoint: String,
      partitionCols: Seq[String], trigger: Trigger = Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .partitionBy(partitionCols: _*)
      .trigger(trigger)
      .start()
}
