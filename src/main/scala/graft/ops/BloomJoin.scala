package graft.ops

import graft.functions.NativeFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** Bloom-filter semi-join pushdown — the shuffle-reduction tool for a
  * selective dim×fact join (the hand-rolled, always-on form of Spark's
  * own runtime bloom filter, `spark.sql.optimizer.runtime.bloomFilter.*`,
  * which only injects under planner heuristics).
  *
  * Shape: one cheap count sizes the sketch, one small aggregate job
  * folds the (filtered) build side's join keys into it — kilobytes,
  * collected to the driver exactly
  * like Spark's `ScalarSubquery` runtime filter — and the probe side then
  * applies a codegen'd `might_contain` BEFORE any exchange, so the
  * shuffle (or broadcast probe) carries only rows that can match. False
  * positives pass the bloom but die in the exact equi-join that follows;
  * results are therefore EXACTLY the plain join's (the q57 oracle
  * contract). At 100 TB this is the difference between shuffling the
  * whole fact table and shuffling the ~matching fraction.
  *
  * The bloom aggregate/probe are Spark's own codegen'd expressions
  * (`BloomFilterAggregate`, `BloomFilterMightContain`) surfaced through
  * the session function registry as `graft_bloom_agg` /
  * `graft_might_contain` (they are not SQL-registered by default).
  */
object BloomJoin {

  /** `fact ⋈ dim` on `factKey = dimKey`, with the fact side pre-filtered
    * by a bloom of the dim keys. Expects `dim` already filtered to its
    * selective predicate — that selectivity is what the bloom ships to
    * the fact scan. */
  def prefilteredEquiJoin(fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String): DataFrame = {
    val spark = fact.sparkSession
    NativeFunctions.register(spark)
    // xxhash64 is TYPE-sensitive: the same value hashes differently as INT
    // vs BIGINT. The exact equi-join below coerces mixed numeric keys, so
    // hashing each side's native type would produce false NEGATIVES (rows
    // the join would match, silently dropped). Hash both sides through one
    // common type: integral keys widen to BIGINT; anything else must
    // already match exactly, or we fail fast rather than drop rows.
    val integral: Set[DataType] = Set(ByteType, ShortType, IntegerType, LongType)
    val hashType: DataType =
      (fact.schema(factKey).dataType, dim.schema(dimKey).dataType) match {
        case (a, b) if a == b => a
        case (a, b) if integral(a) && integral(b) => LongType
        case (a, b) => throw new IllegalArgumentException(
          s"bloom-prefiltered join keys must have matching (or both integral) " +
            s"types; got $factKey: $a vs $dimKey: $b — cast one side explicitly")
      }
    // size the bloom to the ACTUAL key count (one cheap count over the
    // already-filtered dim — at ~8 bits/key a right-sized sketch is
    // n_keys bytes, so a 10k-key dim ships a ~10 KB literal; a blind
    // big default would embed megabytes in the probe-side plan), then
    // one small aggregate folds the keys into the serialized sketch —
    // same driver round-trip as Spark's own runtime-filter subquery
    val estKeys = math.max(dim.count(), 1L)
    val bf = dim
      .select(call_function("graft_bloom_agg",
        xxhash64(col(dimKey).cast(hashType)), lit(estKeys)).as("bf"))
      .head.getAs[Array[Byte]](0)
    // dataset-resolved key columns: with same-named keys on both sides,
    // unqualified col(...) would be AMBIGUOUS_REFERENCE after the join
    val pruned = fact
      .filter(call_function("graft_might_contain", lit(bf),
        xxhash64(fact.col(factKey).cast(hashType))))
    pruned.join(dim, pruned.col(factKey) === dim.col(dimKey))
  }
}
