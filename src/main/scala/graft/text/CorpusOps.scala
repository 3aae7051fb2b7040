package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Corpus-level text pipeline steps (multi-row shapes, unlike the
  * narrow per-row signals in [[TextOps]]): boilerplate-span detection
  * and sequence packing. Both are gated (x29/x30) and spec-tested with
  * planted inputs (CorpusOpsSpec).
  */
object CorpusOps {

  /** Per-source boilerplate-span signal — the C4/CCNet repeated-line
    * filter for a corpus without line structure: an `n`-gram span
    * present in more than `threshold` of a source's DOCUMENTS (document
    * frequency, not occurrence count) is that source's boilerplate.
    * Returns one row per doc: distinct span count, boilerplate span
    * count, boilerplate fraction.
    *
    * Shape at scale: distinct spans per doc via one narrow
    * `array_distinct` HOF before the explode (presence drives DF, so
    * multiplicity drops map-side); (source, span) document counts are a
    * partial-combining hash aggregate (never a window over the span key
    * — a span hitting 10⁸ docs must collapse map-side, not land in one
    * sort partition); per-source doc totals broadcast (source
    * cardinality ≪ corpus); the join back gets AQE's skew-split; the
    * span branch is recomputed on both uses rather than cached
    * (recompute-over-cache — it is corpus-token-sized). */
  def boilerplateSpans(docs: DataFrame, idCol: String, sourceCol: String,
      textCol: String, n: Int = 5, threshold: Double = 0.2): DataFrame = {
    val spans = docs.select(col(idCol), col(sourceCol),
      explode(array_distinct(TextOps.ngrams(TextOps.tokens(col(textCol)), n)))
        .as("gram"))
    val srcDocs = docs.groupBy(col(sourceCol)).agg(count(lit(1)).as("n_docs"))
    val flagged = spans.groupBy(col(sourceCol), col("gram"))
      .agg(count(lit(1)).as("df"))
      .join(broadcast(srcDocs), sourceCol)
      .select(col(sourceCol), col("gram"),
        (col("df").cast(DoubleType) / col("n_docs").cast(DoubleType) > threshold)
          .as("boiler"))
    spans.join(flagged, Seq(sourceCol, "gram"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).cast(LongType).as("n_spans"),
        sum(when(col("boiler"), lit(1L)).otherwise(lit(0L)))
          .cast(LongType).as("n_boiler"))
      .withColumn("boiler_frac",
        col("n_boiler").cast(DoubleType) / col("n_spans").cast(DoubleType))
  }

  /** Greedy in-order sequence packing into ~`cap`-token bins per
    * source: docs are taken in deterministic `idCol` order within their
    * source, and a running token total assigns each doc the bin its
    * FIRST token lands in. A doc straddling a boundary stays in its
    * starting bin (overflow bounded by that doc's own length) — the
    * streaming-friendly packing distributed pipelines actually ship;
    * exact bin packing is inherently sequential.
    *
    * The running total is a TWO-PHASE DISTRIBUTED PREFIX SUM, never a
    * single window over the source key (that shape sorts a whole
    * source's slice in ONE task — the x25 scale-killer class):
    *  1. a monotone bucket key is derived from the numeric id range,
    *     sized so buckets hold ~`bucketRows` rows (corpus-scaled, the
    *     x12 rule: bucket count grows with n, membership stays bounded);
    *  2. the row-level cumsum windows over `(source, bucket)` — each
    *     sort partition is ~`bucketRows` rows regardless of corpus size;
    *  3. bucket totals (one partial-combining aggregate, n/bucketRows
    *     rows) get an EXCLUSIVE per-source scan — the only
    *     source-partitioned window runs over the totals frame, ~4000×
    *     smaller than the corpus — and broadcast back onto the bucket
    *     key. At extreme scale raise `bucketRows` (or hierarchically
    *     repeat the scan) to keep the totals frame driver-sized.
    * The final `cum = local + offset` is exact integer arithmetic,
    * invariant to the bucketing, so any engine bins identically
    * (`div cap`). Ids clustered into a narrow range degrade bucket
    * balance (dense or uniformly-spread ids — the ingest-sequence norm —
    * keep buckets ~`bucketRows`). */
  def sequencePacking(docs: DataFrame, idCol: String, sourceCol: String,
      textCol: String, cap: Int = 512, bucketRows: Int = 4096): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Phase 0 (driver, column-pruned scan of the id column only): the
    // bucket width that yields ~n/bucketRows monotone buckets.
    val stats = docs.agg(count(lit(1)).as("n"),
      min(col(idCol).cast(LongType)).as("lo"),
      max(col(idCol).cast(LongType)).as("hi")).head()
    val n = stats.getLong(0)
    require(n == 0L || !stats.isNullAt(1),
      s"sequencePacking needs a numeric (castable-to-BIGINT) id column; got `$idCol`")
    val lo = if (n == 0L) 0L else stats.getLong(1)
    val hi = if (n == 0L) 0L else stats.getLong(2)
    val targetBuckets = math.max(1L, (n + bucketRows - 1L) / bucketRows.toLong)
    val width = math.max(1L, (hi - lo) / targetBuckets + 1L)

    val sized = docs.select(col(idCol), col(sourceCol),
        size(TextOps.tokens(col(textCol))).cast(LongType).as("n_tokens"))
      .withColumn("__graft_bucket",
        expr(s"(cast(`$idCol` as bigint) - ${lo}L) div ${width}L"))
    // Phase 1: bounded local cumsum — sort partitions are ~bucketRows rows.
    val wLocal = Window.partitionBy(col(sourceCol), col("__graft_bucket"))
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = sized.withColumn("__graft_local",
      sum(col("n_tokens")).over(wLocal))
    // Phase 2: exclusive scan of bucket totals (n/bucketRows rows — the
    // ONLY source-alone window, on a frame ~4000× smaller than the
    // corpus). The sized branch is recomputed, not cached (it is
    // corpus-token-sized — the x06/x14 recompute-over-cache rule).
    val wOff = Window.partitionBy(col(sourceCol)).orderBy(col("__graft_bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sized.groupBy(col(sourceCol), col("__graft_bucket"))
      .agg(sum(col("n_tokens")).as("__graft_tot"))
      .withColumn("__graft_off",
        coalesce(sum(col("__graft_tot")).over(wOff), lit(0L)))
      .select(col(sourceCol), col("__graft_bucket"), col("__graft_off"))
    // Phase 3: broadcast the tiny offset table back onto the bucket key.
    local.join(broadcast(offsets), Seq(sourceCol, "__graft_bucket"))
      .select(col(idCol), col(sourceCol), col("n_tokens"),
        expr(s"(__graft_local + __graft_off - n_tokens) div $cap").as("pack_id"))
  }
}
