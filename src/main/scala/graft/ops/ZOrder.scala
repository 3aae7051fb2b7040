package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Z-order (Morton) clustering — multi-dimensional data layout for scan
  * pruning at scale.
  *
  * A table range-partitioned/sorted on ONE column gets tight parquet
  * min/max stats on that column only: predicates on any other column
  * read every file. Interleaving the bits of two columns into a single
  * Morton code and range-clustering on THAT gives every output file a
  * compact z-range, which is a compact rectangle (union of at most a few
  * rectangles) in (a, b) space — so each file's min/max stats are tight
  * in BOTH dimensions and a selective predicate on EITHER column prunes
  * most files at planning time (same layout idea Delta/Iceberg expose as
  * `OPTIMIZE ZORDER BY`). The 100 TB math: row-group pruning is the only
  * scan optimization whose benefit multiplies with table size — the
  * layout is paid once at write, every reader wins forever.
  *
  * The z-value is pure integer bit arithmetic (shift/mask/add), exact
  * and reproducible in any engine — oracle-checkable, never a float in
  * sight. Inputs must be non-negative after masking to `bits` (callers
  * map domains onto [0, 2^bits) first — e.g. `x & ((1<<bits)-1)`, or an
  * epoch-day for timestamps).
  */
object ZOrder {

  /** Morton code of the low `bits` bits of `a` and `b`: bit i of `a`
    * lands at position 2i, bit i of `b` at 2i+1. Narrow integer
    * expression — codegen-friendly, no shuffle. */
  def zValue2(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      shiftright(a.cast(LongType), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(b.cast(LongType), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** The same Morton code as oracle SQL text over column expressions. */
  def zValue2Sql(a: String, b: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($a >> $i) & 1) * ${1L << (2 * i)} + (($b >> $i) & 1) * ${1L << (2 * i + 1)})"
    }.mkString(" + ")

  /** Cluster `df` into `numFiles` range partitions of the z-value of
    * (`aCol` & mask, `bCol` & mask), sorted within each — write the
    * result and every file carries tight min/max on BOTH columns. The
    * z column is internal and dropped; the range boundaries come from
    * Spark's reservoir sampling (the standard repartitionByRange path —
    * boundary placement only shifts file edges, never correctness). */
  def clusterByZ(df: DataFrame, aCol: String, bCol: String, bits: Int,
      numFiles: Int): DataFrame = {
    val mask = (1L << bits) - 1
    df.withColumn("__graft_z",
        zValue2(col(aCol).bitwiseAND(lit(mask)), col(bCol).bitwiseAND(lit(mask)), bits))
      .repartitionByRange(numFiles, col("__graft_z"))
      .sortWithinPartitions(col("__graft_z"))
      .drop("__graft_z")
  }
}
