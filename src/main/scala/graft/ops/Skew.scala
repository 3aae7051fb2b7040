package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (SURVEY.md §7.4.5 "skewed keys →
  * salting or AQE skew-join").
  *
  * AQE's skew-join split handles most cases at runtime; explicit salting
  * remains necessary when one key dominates a *broadcast-ineligible*
  * build side or when the skew is known up front (e.g. the null-key or
  * "default dimension member" row flood in fact loads). The salted join
  * replicates the (small) right side `saltFactor` times and sprays the
  * left side uniformly, so a single hot key spreads over `saltFactor`
  * shuffle partitions.
  */
object Skew {

  /** Equi inner/left join with the left side salted. `right` is
    * replicated ×`saltFactor` — keep it the smaller input. */
  def saltedJoin(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 1, "saltFactor must be > 1")
    val salted = left.withColumn("__salt",
      (rand(seed = 7) * saltFactor).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated,
      salted(leftKey) === replicated(rightKey) && salted("__salt") === replicated("__salt"),
      joinType)
      .drop("__salt")
  }

  /** Null-safe fact-dim join that routes null/missing keys around the
    * shuffle entirely (the classic "unknown member" skew): non-null keys
    * join normally, null keys short-circuit to the default row values. */
  def joinWithNullBypass(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String): DataFrame = {
    val withKeys = fact.filter(col(factKey).isNotNull)
      .join(dim, col(factKey) === col(dimKey), "left")
    val nullKeys = fact.filter(col(factKey).isNull)
    val dimCols = dim.columns.map(c => lit(null).cast(dim.schema(c).dataType).as(c))
    withKeys.unionByName(nullKeys.select(fact.columns.map(col) ++ dimCols: _*))
  }

  /** Top-N heaviest keys of a column — the skew diagnosis query (one
    * aggregation, no collect until the N-row result). */
  def keyHistogram(df: DataFrame, key: Column, topN: Int = 20): DataFrame =
    df.groupBy(key.as("key")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc).limit(topN)
}
