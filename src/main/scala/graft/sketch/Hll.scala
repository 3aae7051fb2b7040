package graft.sketch

import graft.text.TextOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** HyperLogLog-style distinct-count sketch, built entirely from
  * engine-reproducible primitives (Flajolet et al. 2007, the same
  * register/harmonic-mean construction behind `approx_count_distinct` —
  * ref analogue: the reference's validation layer counts distincts
  * exactly, src/agents/validator.py; at 100 TB an exact
  * `COUNT(DISTINCT)` is a full shuffle of every key, while this sketch
  * reduces to `m = 512` registers per group in one map-side-combining
  * pass).
  *
  * Why not Spark's built-in `approx_count_distinct`: its HLL++ registers
  * hash with xxhash64 and apply bias-correction tables — neither is
  * reproducible in another engine, so the result could only be gated
  * "within tolerance", a weaker check. Here every step up to the final
  * two doubles is INTEGER arithmetic both engines replay bit-for-bit:
  *
  *  - hash: [[TextOps.stableHash64]] (first 15 md5 hex chars → 60-bit
  *    non-negative BIGINT; DuckDB: `CAST('0x'||substr(md5(v),1,15) AS
  *    BIGINT)`);
  *  - bucket: `h % 512` (low 9 bits), value `w = h div 512` (51 bits);
  *  - rho: leading-zero rank `52 - bitlen(w)` with `bitlen(0) = 0`,
  *    via the binary-string length (`conv(w,10,2)` / DuckDB `bin(w)` —
  *    both render minimal digits, and both give "0" for 0, which the
  *    CASE handles identically);
  *  - register: `max(rho)` per (group, bucket) — a partial-combining
  *    aggregate, the property that makes the sketch MERGEABLE: registers
  *    of a union are the bucketwise max of registers, so per-day (or
  *    per-partition) sketches roll up without touching raw data;
  *  - harmonic sum: `S = Σ_buckets 2^(52-M_j)` as exact BIGINT
  *    (`M_j ∈ [0,52]`, so each term ≤ 2^52 and S ≤ 512·2^52 = 2^61 —
  *    no overflow, no floats);
  *  - estimate: `C / S` with `C = α_512·512²·2^52` pre-folded to ONE
  *    double literal, so the only floating-point ops are one BIGINT→
  *    DOUBLE cast (round-to-nearest, identical in both engines) and one
  *    division.
  *
  * The estimate is the RAW HLL estimator: no small-range linear-counting
  * correction (it needs `ln`, whose last-ulp behavior differs across
  * libm implementations — the cross-engine gate forbids it) and no
  * HLL++ bias tables. Below ~2.5·m distincts the raw estimate runs high
  * — callers reading absolute accuracy should use it above that regime
  * (HllSpec proves ±5% at 100k distincts); the gate checks parity, not
  * accuracy, and emits the empty-bucket count so the regime is visible.
  */
object Hll {

  /** Register-index bits: m = 2^9 = 512 registers per group. */
  val P = 9
  val M: Int = 1 << P

  /** Bits left in `w = h div M` for a 60-bit hash; rho ranges 1..WBits+1. */
  val WBits: Int = 60 - P
  val RhoMax: Int = WBits + 1

  /** α_512 · 512² · 2^52 folded to one double (see scaladoc): the oracle
    * embeds the same 17-significant-digit literal. */
  val EstNumerator: Double = 8.497699123215257e20

  /** 2^RhoMax as a BIGINT literal — the harmonic-sum term of an empty
    * (M_j = 0) bucket. */
  val Pow2RhoMax: Long = 1L << RhoMax

  /** One register row per (groupCols..., bucket): the bucketwise max rho
    * of `key`'s 60-bit md5 hash. Shape: a single hash-partial aggregate —
    * at any scale each task reduces its split to ≤ |groups|·512 rows
    * before the (tiny) shuffle. */
  def registers(df: DataFrame, key: Column, groupCols: Seq[Column]): DataFrame = {
    val g = groupCols.zipWithIndex.map { case (c, i) => c.as(s"g$i") }
    val gNames = groupCols.indices.map(i => col(s"g$i"))
    df.select(g :+ TextOps.stableHash64(key.cast(StringType)).as("h"): _*)
      .select(gNames :+ (col("h") % M).as("bucket") :+
        call_function("div", col("h"), lit(M.toLong)).as("w"): _*)
      .select(gNames :+ col("bucket") :+
        (lit(RhoMax) - when(col("w") === 0, lit(0))
          .otherwise(length(conv(col("w").cast(StringType), 10, 2))))
          .cast(IntegerType).as("rho"): _*)
      .groupBy(gNames :+ col("bucket"): _*)
      .agg(max(col("rho")).as("m_j"))
  }

  /** Merge register sets across their group columns into one labeled
    * sketch: bucketwise max — the union-of-sets identity. */
  def merged(regs: DataFrame, labels: Seq[Column]): DataFrame =
    regs.groupBy(col("bucket")).agg(max(col("m_j")).as("m_j"))
      .select(labels :+ col("bucket") :+ col("m_j"): _*)

  /** Finalize registers → one row per group with the raw estimate and
    * the empty-bucket count (the small-range-regime indicator). */
  def estimate(regs: DataFrame, groupNames: Seq[String]): DataFrame = {
    val gNames = groupNames.map(col)
    regs.groupBy(gNames: _*)
      .agg(
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $RhoMax - m_j)")).as("s_present"),
        count(lit(1)).as("n_present"))
      .select(gNames :+
        (lit(EstNumerator) /
          (col("s_present") + (lit(M.toLong) - col("n_present")) * Pow2RhoMax)
            .cast(DoubleType)).as("est_distinct") :+
        (lit(M.toLong) - col("n_present")).as("empty_buckets"): _*)
  }
}
