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
    * exact bin packing is inherently sequential. ONE window cumsum per
    * source partition, integer `div` so any engine bins identically, no
    * joins. At 100 TB the partition key widens (e.g. (source,
    * ingest-day)) to bound the window partition; the shape is
    * unchanged. */
  def sequencePacking(docs: DataFrame, idCol: String, sourceCol: String,
      textCol: String, cap: Int = 512): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(sourceCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col(idCol), col(sourceCol),
        size(TextOps.tokens(col(textCol))).cast(LongType).as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .select(col(idCol), col(sourceCol), col("n_tokens"),
        expr(s"(cum - n_tokens) div $cap").as("pack_id"))
  }
}
