package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Scale-safe ROW_NUMBER / RANK / DENSE_RANK — the two-phase
  * distributed rank.
  *
  * A raw `row_number() OVER (PARTITION BY p ORDER BY o)` hash-exchanges
  * on `p` and sorts each partition in ONE task; when `p` has tiny
  * cardinality relative to the input (a 5-value market segment over a
  * fact table, or no partition at all), that task sorts ~N/|p| rows —
  * the classic single-task serialization the x34/x59/x60 queries avoid
  * with order-aligned buckets. This generalizes their shape to an
  * ARBITRARY sort order:
  *
  *  1. `repartitionByRange(buckets, p ++ o)` gives every row an
  *     order-ALIGNED bucket (the physical range-partition id): all rows
  *     of bucket b sort entirely before bucket b+1 within a partition
  *     key. Each bucket is ~N/buckets rows regardless of |p|.
  *  2. A window over (p, bucket) ranks locally — tasks bounded by
  *     bucket size, never by N/|p|.
  *  3. Bucket COUNTS (a partial-combining aggregate, ≤ buckets rows per
  *     partition key) prefix-scan into per-bucket offsets; the scan
  *     window holds ≤ `buckets` rows per key.
  *  4. local rank + offset joined back on (p, bucket) — AQE picks a
  *     broadcast when the offsets frame is small (low-|p| case) and a
  *     shuffle join when it is not (high-|p| case, where the offsets
  *     frame approaches the row count and a broadcast would be the
  *     scale hazard instead).
  *
  * The two consumers of the range exchange (the local-rank window and
  * the bucket-count aggregate) share one identical exchange subplan, so
  * Spark's ReuseExchange evaluates it once; the range partitioner's
  * boundary sampling is deterministic for a given input, and a tie
  * split across a bucket boundary still numbers every row exactly once
  * (ties make row_number order-arbitrary under ANY evaluation — gated
  * callers order by a total key).
  *
  * Cost vs the raw window: two extra small shuffles (bucket counts +
  * the offsets join). Worth it whenever |p| ≪ cores; harmless when not.
  */
object RankLowering {

  /** `row_number()` over (`partCols`, ordered by `orderCols` — pass
    * direction via `.desc`/`.asc`) as an IntegerType column `outCol`,
    * computed with bounded tasks (no partition-sized sort). Pass
    * `partCols = Nil` for a global row number (the q75 full-sort case).
    *
    * Requires a DETERMINISTIC input plan: the local-rank window and the
    * bucket-count aggregate must observe identical range-bucket
    * assignments, which holds because both consume the one ranged
    * exchange (ReuseExchange) and the RangePartitioner's boundary
    * sampling is deterministic for a given input. An upstream
    * `rand()`/`sample()` — or input files changing between the two
    * evaluations — could hand the subplans different boundaries and
    * yield wrong global ranks; callers with a non-deterministic source
    * must materialize it (cache/localCheckpoint/write) first. Every
    * gated caller here reads deterministic parquet/derived frames. */
  def rowNumber(df: DataFrame, partCols: Seq[Column], orderCols: Seq[Column],
      outCol: String, buckets: Int = 64): DataFrame = {
    require(orderCols.nonEmpty, "row_number requires an ORDER BY")
    // materialize partition EXPRESSIONS once so the window, the count
    // aggregate and the offsets join all key on identical attributes
    val pNames = partCols.indices.map(i => s"__graft_rk_p$i")
    val withP = partCols.zip(pNames).foldLeft(df) {
      case (d, (c, n)) => d.withColumn(n, c)
    }
    val ranged = withP
      .repartitionByRange(buckets, pNames.map(col) ++ orderCols: _*)
      .withColumn("__graft_rk_b", spark_partition_id())
    val wLocal = Window
      .partitionBy((pNames :+ "__graft_rk_b").map(col): _*)
      .orderBy(orderCols: _*)
    val local = ranged.withColumn("__graft_rk_l", row_number().over(wLocal))
    val wOff = Window.partitionBy(pNames.map(col): _*)
      .orderBy(col("__graft_rk_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offNames = pNames.map(n => n + "_o")
    val offsets = ranged
      .groupBy((pNames :+ "__graft_rk_b").map(col): _*)
      .agg(count(lit(1)).as("__graft_rk_n"))
      .withColumn("__graft_rk_off",
        coalesce(sum(col("__graft_rk_n")).over(wOff), lit(0L)))
      .select(pNames.zip(offNames).map { case (n, o) => col(n).as(o) } ++
        Seq(col("__graft_rk_b").as("__graft_rk_bo"), col("__graft_rk_off")): _*)
    // NULL is a legal partition-key VALUE (a raw window ranks the NULL
    // group like any other), so the offsets join must be null-safe —
    // a plain equality join would silently drop every NULL-keyed row
    val joinCond = pNames.zip(offNames)
      .map { case (n, o) => local(n) <=> offsets(o) }
      .foldLeft(local("__graft_rk_b") === offsets("__graft_rk_bo"))(_ && _)
    local.join(offsets, joinCond)
      .withColumn(outCol,
        (col("__graft_rk_l").cast(LongType) + col("__graft_rk_off"))
          .cast(IntegerType))
      .drop(pNames ++ offNames ++
        Seq("__graft_rk_b", "__graft_rk_bo", "__graft_rk_l", "__graft_rk_off"): _*)
  }

  /** `rank()` / `dense_rank()` over (`partCols`, ordered by `orderPlain`
    * with per-item `descFlags`) as an IntegerType column `outCol`,
    * computed with bounded tasks at ANY partition-key cardinality.
    *
    * Unlike ROW_NUMBER, rank functions are TIE-GROUP functions: every
    * row of a tie group takes the same value, so the two-phase bucket
    * decomposition that is exact for row_number would need a boundary
    * repair (a tie group split across a range-bucket edge restarts its
    * local rank). This implementation sidesteps boundary repair by
    * ranking the DISTINCT key frame instead:
    *
    *  1. ONE corpus shuffle: `groupBy(part ++ order keys)` with
    *     map-side combining collapses the input to its distinct keys,
    *     each carrying its tie-group size. Ties can never straddle
    *     anything afterwards — each tie group is one row.
    *  2. On the key frame (corpus → |keys| rows):
    *     dense_rank = [[rowNumber]] over the keys (distinct ⇒ no ties);
    *     rank = 1 + exclusive prefix sum of tie-group sizes, the same
    *     order-aligned bucket scan rowNumber uses, weighted by count.
    *  3. A null-safe join back on the full key — keyed by the
    *     high-cardinality (part, order) tuple, so tasks stay bounded by
    *     tie-group size; AQE picks broadcast when the key frame is
    *     small.
    *
    * Same deterministic-input requirement as [[rowNumber]]. NULL order
    * values rank per Spark's null ordering (ASC = NULLS FIRST) — SQL
    * oracles must say so explicitly. */
  def rankLike(df: DataFrame, partCols: Seq[Column], orderPlain: Seq[Column],
      descFlags: Seq[Boolean], outCol: String, dense: Boolean,
      buckets: Int = 64): DataFrame = {
    require(orderPlain.nonEmpty, "rank requires an ORDER BY")
    require(orderPlain.length == descFlags.length,
      "one desc flag per order expression")
    val pNames = partCols.indices.map(i => s"__graft_rkk_p$i")
    val oNames = orderPlain.indices.map(i => s"__graft_rkk_o$i")
    val withPO = (partCols.zip(pNames) ++ orderPlain.zip(oNames))
      .foldLeft(df) { case (d, (c, n)) => d.withColumn(n, c) }
    val keyCols = (pNames ++ oNames).map(col)
    val keyCounts = withPO.groupBy(keyCols: _*)
      .agg(count(lit(1)).as("__graft_rkk_n"))
    val directed = oNames.zip(descFlags).map { case (n, d) =>
      if (d) col(n).desc else col(n).asc
    }
    val keyRank =
      if (dense)
        rowNumber(keyCounts, pNames.map(col), directed, "__graft_rkk_r",
          buckets)
          .withColumn("__graft_rkk_r", col("__graft_rkk_r").cast(LongType))
      else {
        // weighted twin of rowNumber's scan: local exclusive cumsum of
        // tie-group sizes within order-aligned buckets + bucket-total
        // offsets; both consumers share the one ranged exchange
        val ranged = keyCounts
          .repartitionByRange(buckets, pNames.map(col) ++ directed: _*)
          .withColumn("__graft_rkk_b", spark_partition_id())
        val wLocal = Window
          .partitionBy((pNames :+ "__graft_rkk_b").map(col): _*)
          .orderBy(directed: _*)
          .rowsBetween(Window.unboundedPreceding, -1)
        val local = ranged.withColumn("__graft_rkk_cum",
          coalesce(sum(col("__graft_rkk_n")).over(wLocal), lit(0L)))
        val wOff = Window.partitionBy(pNames.map(col): _*)
          .orderBy(col("__graft_rkk_b"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val offNames = pNames.map(_ + "_o")
        val offsets = ranged
          .groupBy((pNames :+ "__graft_rkk_b").map(col): _*)
          .agg(sum(col("__graft_rkk_n")).as("__graft_rkk_bn"))
          .withColumn("__graft_rkk_off",
            coalesce(sum(col("__graft_rkk_bn")).over(wOff), lit(0L)))
          .select(pNames.zip(offNames).map { case (n, o) => col(n).as(o) } ++
            Seq(col("__graft_rkk_b").as("__graft_rkk_bo"),
              col("__graft_rkk_off")): _*)
        val jc = pNames.zip(offNames)
          .map { case (n, o) => local(n) <=> offsets(o) }
          .foldLeft(local("__graft_rkk_b") === offsets("__graft_rkk_bo"))(_ && _)
        local.join(offsets, jc)
          .withColumn("__graft_rkk_r",
            lit(1L) + col("__graft_rkk_cum") + col("__graft_rkk_off"))
      }
    // rename the key frame's columns so the back-join is unambiguous
    val kNames = (pNames ++ oNames).map(_ + "_k")
    val keyed = (pNames ++ oNames).zip(kNames)
      .foldLeft(keyRank)((d, p) => d.withColumnRenamed(p._1, p._2))
      .select((kNames.map(col) :+ col("__graft_rkk_r")): _*)
    val backCond = (pNames ++ oNames).zip(kNames)
      .map { case (n, k) => withPO(n) <=> keyed(k) }
      .reduce(_ && _)
    withPO.join(keyed, backCond)
      .withColumn(outCol, col("__graft_rkk_r").cast(IntegerType))
      .drop(pNames ++ oNames ++ kNames :+ "__graft_rkk_r": _*)
  }
}
