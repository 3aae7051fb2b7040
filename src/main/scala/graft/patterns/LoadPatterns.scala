package graft.patterns

import graft.ir.Ir._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Load-pattern classification + executors (SURVEY.md §2.7).
  *
  * Detection mirrors the reference's regex heuristics
  * (ssis-to-dbt `src/agents/analyzer.py:126-156,240-327`): watermark-ish
  * variable names and `>= ?`/`> @var` predicates → incremental; `MERGE`
  * (or UPDATE+INSERT with change detection) → merge_scd; TRUNCATE /
  * unfiltered DELETE+INSERT → full_load; with an additive confidence
  * score capped at 1.0.
  */
object LoadPatterns {

  sealed trait LoadPattern
  object LoadPattern {
    case object FullLoad extends LoadPattern
    case object Incremental extends LoadPattern
    case object MergeScd extends LoadPattern
  }

  final case class Detection(pattern: LoadPattern, confidence: Double, signals: List[String])

  private val watermarkVarRe =
    "(?i)(last.?sync|last.?modified|last.?run|watermark|high.?water)".r
  // (?s): a multi-line WHERE (CDATA / &#xA;-preserved statements) must
  // not hide the predicate from `.` — same flag the rewriter regexes use
  private val incrementalSqlRe =
    "(?is)where\\s+.{0,80}?(>=|>)\\s*(\\?|@\\w+)".r
  private val mergeRe = "(?i)\\bmerge\\b\\s+(into\\s+)?\\S+\\s+(as\\s+\\w+\\s+)?using\\b".r
  private val scdColsRe = "(?i)(is_?current|valid_?from|valid_?to|effective_?date|row_?hash)".r
  private val truncateRe = "(?i)\\btruncate\\s+table\\b".r
  // statement end = `;`, newline, or end-of-text (SSMS-authored tasks
  // often carry no semicolons)
  private val deleteAllRe = "(?i)\\bdelete\\s+from\\s+\\S+\\s*(;|\\n|$)".r
  private val processedFlagRe = "(?is)where\\s+.{0,40}?processed.?flag\\s*=\\s*0".r

  def detect(sql: String, variables: Seq[Variable] = Nil): Detection = {
    val signals = scala.collection.mutable.ListBuffer.empty[String]
    var incScore = 0.0; var mergeScore = 0.0; var fullScore = 0.2 // default prior

    if (variables.exists(v => watermarkVarRe.findFirstIn(v.name).isDefined)) {
      incScore += 0.4; signals += "watermark variable"
    }
    if (incrementalSqlRe.findFirstIn(sql).isDefined) {
      incScore += 0.4; signals += "incremental WHERE predicate"
    }
    if (processedFlagRe.findFirstIn(sql).isDefined) {
      incScore += 0.3; signals += "processed-flag handshake"
    }
    if (mergeRe.findFirstIn(sql).isDefined) {
      mergeScore += 0.6; signals += "MERGE statement"
    }
    if (scdColsRe.findFirstIn(sql).isDefined) {
      mergeScore += 0.3; signals += "SCD metadata columns"
    }
    if (truncateRe.findFirstIn(sql).isDefined) {
      fullScore += 0.5; signals += "TRUNCATE"
    }
    if (deleteAllRe.findFirstIn(sql).isDefined) {
      fullScore += 0.3; signals += "DELETE+INSERT refresh"
    }
    val (p, s) =
      if (mergeScore >= incScore && mergeScore >= fullScore && mergeScore > 0)
        (LoadPattern.MergeScd, mergeScore)
      else if (incScore >= fullScore && incScore > 0) (LoadPattern.Incremental, incScore)
      else (LoadPattern.FullLoad, fullScore)
    Detection(p, math.min(1.0, s), signals.toList)
  }
}

/** SCD Type 2 executors — both modes from SURVEY.md §7.3:
  * the reference-faithful rebuild (dim_customer.sql:34-84, lossy: every
  * row current) and a true SCD2 merge (full-outer join + union + window
  * close-out) that vanilla Spark expresses without a mutable store.
  */
object ScdType2 {

  private val NullSentinel = "_dbt_utils_surrogate_key_null_"

  /** dbt_utils.generate_surrogate_key byte-parity (fct_sales.sql:80). */
  def surrogateKey(cols: Column*): Column =
    md5(concat_ws("-", cols.map(c => coalesce(c.cast(StringType), lit(NullSentinel))): _*))

  /** Reference-faithful rebuild: surrogate key + change-detection hash,
    * everything current. Matches dim_customer.sql:34-84 semantics. */
  def rebuild(source: DataFrame, naturalKey: Seq[String], tracked: Seq[String],
      validFrom: Column = current_timestamp()): DataFrame =
    source
      .withColumn("surrogate_key", surrogateKey(naturalKey.map(col): _*))
      .withColumn("row_hash", surrogateKey(tracked.map(col): _*))
      .withColumn("is_current", lit(true))
      .withColumn("valid_from", validFrom)
      .withColumn("valid_to", lit(null).cast(TimestampType))

  /** True SCD2 merge: rows whose tracked hash changed are closed out
    * (valid_to = effectiveTs, is_current = false) and re-inserted as the
    * new current version; unseen keys insert; unchanged rows pass
    * through. Pure full-outer + union — shuffles once on the natural key.
    *
    * `current` must carry surrogate_key/row_hash/is_current/valid_from/
    * valid_to (i.e. be a prior [[rebuild]]/[[merge]] output). */
  def merge(current: DataFrame, incoming: DataFrame, naturalKey: Seq[String],
      tracked: Seq[String], effectiveTs: Column): DataFrame = {
    val inc = incoming
      .withColumn("surrogate_key", surrogateKey(naturalKey.map(col): _*))
      .withColumn("row_hash", surrogateKey(tracked.map(col): _*))
    // contract: ONE incoming version per natural key. Two versions in a
    // batch would BOTH insert as is_current=true (several "current" rows
    // per key, fanning out every later merge) — and the API carries no
    // ordering to decide which wins, so fail loud instead of guessing
    val dup = inc.groupBy(naturalKey.map(col): _*).count().filter(col("count") > 1)
    require(dup.isEmpty,
      s"SCD2 merge: incoming batch has multiple rows per natural key " +
        s"(${naturalKey.mkString(",")}) — e.g. ${dup.limit(3).collect().mkString("; ")}; " +
        "pre-aggregate to one version per key (latest-wins) before merging")
    val curKeys = current.filter(col("is_current"))
      .select((naturalKey.map(col) :+ col("row_hash").as("__cur_hash")): _*)

    val joined = inc.join(curKeys, naturalKey, "left")
    val newRows = joined.filter(col("__cur_hash").isNull || col("__cur_hash") =!= col("row_hash"))
      .drop("__cur_hash")
      .withColumn("is_current", lit(true))
      .withColumn("valid_from", effectiveTs)
      .withColumn("valid_to", lit(null).cast(TimestampType))

    val changedKeys = joined
      .filter(col("__cur_hash").isNotNull && col("__cur_hash") =!= col("row_hash"))
      .select(naturalKey.map(col): _*)
      .distinct()

    // tag `current` ONCE (left join + CASE) instead of three semi/anti
    // joins — the dimension shuffles a single time; only the current
    // version of a changed key is closed out, history rows pass through
    val marked = current.join(
      changedKeys.withColumn("__chg", lit(1)), naturalKey, "left")
    val closing = col("__chg").isNotNull && col("is_current")
    val updated = marked
      .withColumn("valid_to", when(closing, effectiveTs).otherwise(col("valid_to")))
      .withColumn("is_current", when(closing, lit(false)).otherwise(col("is_current")))
      .drop("__chg")

    updated.unionByName(newRows.select(updated.columns.map(col): _*))
  }

  /** Window-based repair/derivation of SCD2 metadata from a version log:
    * valid_from = version ts, valid_to = next version's ts, is_current =
    * last version (SURVEY §2.5 W6). */
  def fromVersionLog(log: DataFrame, naturalKey: Seq[String], versionTs: String): DataFrame = {
    val w = Window.partitionBy(naturalKey.map(col): _*).orderBy(col(versionTs))
    log.withColumn("version", row_number().over(w))
      .withColumn("valid_from", col(versionTs))
      .withColumn("valid_to", lead(col(versionTs), 1).over(w))
      .withColumn("is_current", lead(col(versionTs), 1).over(w).isNull)
  }
}

/** Incremental/watermark executors — no driver round-trip: the watermark
  * scalar rides as a broadcast single-row frame (builder.py:320-326's
  * `WHERE updated_at > (SELECT MAX(updated_at) FROM {{ this }})`). */
object Incremental {

  /** New rows strictly above the sink's current max watermark. A NULL
    * incoming watermark fails the predicate on EVERY run — including the
    * first (empty-sink) one: `WHERE wm >= ?` drops NULLs in the SSIS
    * original too, and keeping them only when the sink happens to be
    * empty would load or lose the same row depending on arrival batch. */
  def aboveWatermark(incoming: DataFrame, sink: DataFrame, watermarkCol: String): DataFrame = {
    val maxWm = sink.agg(max(col(watermarkCol)).as("__wm"))
    incoming.join(broadcast(maxWm),
      incoming(watermarkCol) > col("__wm") ||
        (col("__wm").isNull && incoming(watermarkCol).isNotNull), "inner")
      .drop("__wm")
  }

  /** Processed-flag handshake source filter (InventorySync.dtsx:107-118). */
  def unprocessed(df: DataFrame, flagCol: String): DataFrame =
    df.filter(col(flagCol) === 0 || col(flagCol).isNull)

  /** Append a sync-log row (InventorySync.dtsx:266-267 shape) — returned
    * as a single-row frame for the caller to write. An EMPTY batch has no
    * high watermark: pass None and the log row carries a NULL
    * `last_sync_time` (substituting epoch 0 would persist a claim that a
    * sync happened at 1970-01-01). */
  def syncLogEntry(spark: org.apache.spark.sql.SparkSession, packageName: String,
      rowsProcessed: Long, watermark: Option[java.sql.Timestamp]): DataFrame = {
    import spark.implicits._
    Seq((packageName, rowsProcessed, watermark))
      .toDF("package_name", "rows_processed", "last_sync_time")
      .withColumn("logged_at", current_timestamp())
  }

  /** Non-empty-batch convenience overload. */
  def syncLogEntry(spark: org.apache.spark.sql.SparkSession, packageName: String,
      rowsProcessed: Long, watermark: java.sql.Timestamp): DataFrame =
    syncLogEntry(spark, packageName, rowsProcessed, Option(watermark))
}
