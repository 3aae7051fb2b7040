package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** The corpus-scaled blocking contract shared by every blocked
  * similarity operator (n-gram Jaccard, fuzzy Levenshtein, embedding
  * near-dup).
  *
  * Blocked all-pairs work is O(Σ blockSize²). A block key with FIXED
  * cardinality (a label column, a length band, a constant modulus) lets
  * block membership grow linearly with the corpus — so within-block
  * pairs grow QUADRATICALLY and the operator dies at 100× scale. The
  * contract here: derive the number of blocks from the corpus count so
  * membership stays ~`targetBlock` as the corpus grows — blocks multiply,
  * membership doesn't, and total pairs grow LINEARLY
  * (n/targetBlock blocks × targetBlock² pairs each).
  *
  * Everything is oracle-reproducible: the count is `COUNT(*)`, the
  * modulus ladder is integer CASE arithmetic (deliberately NOT
  * `ceil(log2(...))` — a half-ULP difference in any engine's `log2`
  * flips the ceil and desynchronizes the block keys).
  */
object Blocking {

  /** 1-row frame `nb = max(1, ceil(count / targetBlock))` — the scaled
    * block count. One map-side-combining aggregate; `crossJoin(
    * broadcast(...))` it into the corpus so key derivation stays narrow.
    * Oracle: `SELECT GREATEST(1, CAST(ceil(COUNT(*) / t) AS BIGINT))`. */
  def scaledBucketCount(df: DataFrame, targetBlock: Double): DataFrame =
    df.agg(
      greatest(lit(1L),
        ceil(count(lit(1)).cast(DoubleType) / targetBlock).cast(LongType))
        .as("nb"))

  /** Smallest power of two ≥ `nb`, capped at `2^maxBits` — the modulus
    * for BIT-SIGNATURE block keys (simhash, sign-LSH). `sig % modulus`
    * keeps the LOW log2(modulus) signature bits: because each signature
    * bit is an independent hash decision, a w-bit low slice IS a coarser
    * w-bit signature, so near-identical items still collide with the
    * full signature's per-bit probability. (A non-power-of-two modulus
    * would mix bits and break that interpretation; an arbitrary-width
    * shift would need shift-by-column, which not every engine exposes.)
    * Integer when-ladder, largest arm first — bit-exact everywhere. */
  def powTwoModulus(nb: Column, maxBits: Int): Column =
    (1 to maxBits).foldLeft(lit(1L): Column) { (acc, w) =>
      when(nb > (1L << (w - 1)), lit(1L << w)).otherwise(acc)
    }

  /** [[powTwoModulus]] as oracle SQL text over `nbExpr`. */
  def powTwoModulusSql(nbExpr: String, maxBits: Int): String =
    (maxBits to 1 by -1)
      .map(w => s"WHEN $nbExpr > ${1L << (w - 1)} THEN ${1L << w}")
      .mkString("CASE ", " ", " ELSE 1 END")

  /** Driver-side twin for operators whose PLAN STRUCTURE depends on the
    * count (e.g. how many LSH hyperplanes to instantiate): smallest
    * `w ∈ [1, maxBits]` with `2^w ≥ ceil(n / targetBlock)`. Costs the
    * caller one `count()` action — the price of a self-tuning default. */
  def scaledBits(n: Long, targetBlock: Double, maxBits: Int): Int = {
    val nb = math.max(1L, math.ceil(n / targetBlock).toLong)
    (1 to maxBits).find(w => (1L << w) >= nb).getOrElse(maxBits)
  }

  /** [[scaledBits]] as oracle SQL text over `nbExpr` (same ladder shape
    * as [[powTwoModulusSql]], emitting `w` instead of `2^w`; floor 1 so
    * a tiny corpus still instantiates one hyperplane, matching the
    * driver-side clamp). */
  def scaledBitsSql(nbExpr: String, maxBits: Int): String =
    (maxBits to 2 by -1)
      .map(w => s"WHEN $nbExpr > ${1L << (w - 1)} THEN $w")
      .mkString("CASE ", " ", " ELSE 1 END")
}
