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
    * counts + sum(value) per (window, key). */
  def windowedAgg(events: DataFrame, tsCol: String, keyCol: String,
      windowDur: String, slideDur: Option[String] = None,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val win = slideDur.fold(window(col(tsCol), windowDur))(s => window(col(tsCol), windowDur, s))
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(win.as("w"), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col(keyCol), col("n"), col("total_value"))
  }

  final case class SessionEvent(userId: Long, tsMs: Long, value: Double)
  final case class SessionState(start: Long, last: Long, n: Long, total: Double)
  final case class SessionSummary(userId: Long, sessionStartMs: Long, sessionEndMs: Long,
      nEvents: Long, totalValue: Double)

  /** Custom session windows via flatMapGroupsWithState: a session closes
    * after `gapMs` of inactivity — either when a later event arrives past
    * the gap, or (with `ProcessingTimeTimeout`, the production setting) via
    * a state timeout between micro-batches. The KeyValueGroupedDataset
    * path — the state store scales per-key, not per-executor. Pass
    * `NoTimeout` when draining bounded input (a timeout-driven query never
    * quiesces under `processAllAvailable`). */
  def sessionize(events: Dataset[SessionEvent], gapMs: Long,
      timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout)
      : Dataset[SessionSummary] = {
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
                case Some(s) if e.tsMs - s.last <= gapMs =>
                  cur = Some(SessionState(s.start, e.tsMs, s.n + 1, s.total + e.value))
                case Some(s) =>
                  closed ::= SessionSummary(userId, s.start, s.last, s.n, s.total)
                  cur = Some(SessionState(e.tsMs, e.tsMs, 1, e.value))
                case None =>
                  cur = Some(SessionState(e.tsMs, e.tsMs, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              if (useTimeout) state.setTimeoutDuration(gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  /** Run a streaming frame to completion over existing data and stop —
    * incremental-batch semantics (`Trigger.AvailableNow`). Results land in
    * an in-memory table named `queryName`. */
  def drainToMemory(df: DataFrame, queryName: String, checkpoint: String,
      outputMode: OutputMode = OutputMode.Append): DataFrame = {
    val q = df.writeStream
      .outputMode(outputMode)
      .format("memory")
      .queryName(queryName)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
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
