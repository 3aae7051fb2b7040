package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Binned interval join — the scale path for point-in-interval joins.
  *
  * A naive `points JOIN intervals ON start <= pt AND pt < end` has no
  * equi conjunct, so Spark plans a BroadcastNestedLoopJoin: every point
  * row is tested against every interval — O(|points| × |intervals|)
  * comparisons, and with a large interval side not even broadcastable.
  * The classic fix (used by interval-join implementations in streaming
  * engines and geospatial extensions alike) is BINNING: quantize the
  * domain into fixed-width bins, explode each interval into the bins it
  * overlaps, tag each point with its single containing bin, and equi-join
  * on the bin id with the raw range predicate as a residual filter.
  *
  * The join becomes a hash join keyed on `bin` — shuffle-partitionable,
  * AQE-skew-splittable, broadcastable when one side is small — and the
  * per-row work drops to the bin's local membership. Each qualifying
  * (point, interval) pair emerges EXACTLY once: a point has one bin, and
  * an interval's exploded bin list is distinct — so no post-join dedup is
  * needed (the textbook alternative, joining on bin ranges, double-counts
  * and needs a DISTINCT; this shape never does).
  *
  * `binWidth` trades interval-side blowup (span/binWidth rows per
  * interval) against bin membership (residual-filter work). Pick it near
  * the typical interval span so most intervals explode into O(1) bins.
  *
  * Both columns must be integral (epoch-µs timestamps, integer keys —
  * cast dates/timestamps first). Intervals are half-open `[start, end)`;
  * empty intervals (`end <= start`) match nothing and are dropped before
  * the explode (a negative-length `sequence` would throw).
  */
object RangeJoin {

  /** Inner-join `points` to `intervals` on
    * `startCol <= ptCol < endCol`, binned on `binWidth`. All columns of
    * both inputs survive; internal bin columns are dropped. */
  def binnedIntervalJoin(points: DataFrame, ptCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val s = col(startCol).cast(LongType)
    val e = col(endCol).cast(LongType)
    // floorDiv semantics for negative domains: SQL integer division
    // truncates toward zero, so build floor(a/w) from (a - pmod(a, w))/w
    def binOf(a: org.apache.spark.sql.Column) =
      ((a - pmod(a, lit(binWidth))) / binWidth).cast(LongType)
    val iv = intervals
      .filter(e > s)
      // last covered bin is the one containing end-1 (end exclusive)
      .withColumn("__graft_bin", explode(sequence(binOf(s), binOf(e - 1))))
    val pt = points.withColumn("__graft_pt_bin", binOf(col(ptCol).cast(LongType)))
    pt.join(iv,
        pt("__graft_pt_bin") === iv("__graft_bin") &&
          pt(ptCol).cast(LongType) >= s && pt(ptCol).cast(LongType) < e)
      .drop("__graft_bin", "__graft_pt_bin")
  }
}
