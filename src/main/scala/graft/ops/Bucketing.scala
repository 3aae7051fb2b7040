package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed staging — the shuffle-elimination tool for repeated joins.
  *
  * A join between two tables bucketed into the same number of buckets on
  * the join key needs NO Exchange: each task reads bucket i of both sides
  * and merges. Pay the partitioning once at staging time, then every
  * downstream join on that key is co-located — the difference between one
  * shuffle per run and one shuffle per INGEST at 100 TB. (The reference's
  * analog is the indexed staging table its generated DDL creates before
  * fact loads — reference `src/validation/validator.py` staging compare;
  * dbt `{{ config(materialized='table') }}` + warehouse-side clustering.)
  */
object Bucketing {

  /** Stage `df` as a bucketed, bucket-sorted external parquet table.
    * Overwrites any previous staging at the same name/path. */
  def stageBucketed(df: DataFrame, table: String, path: String,
      nBuckets: Int, key: String): DataFrame = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    df.write.mode("overwrite").format("parquet")
      .option("path", path)
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .saveAsTable(table)
    spark.table(table)
  }

  /** Collision-resistant suffix for staging table names/paths derived
    * from a source identity string (e.g. the dataset directory): two
    * concurrent sessions or two datasets must never overwrite/reuse each
    * other's staging. SHA-256 prefix, not `hashCode` — 32 bits of a Java
    * string hash collide in practice. */
  def stagingKey(sourceId: String): String = {
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(sourceId.getBytes("UTF-8"))
    digest.take(8).map(b => f"$b%02x").mkString
  }

  /** Inner equi-join of two staged bucketed tables. With equal bucket
    * counts on the join keys Spark plans a sort-merge join with ZERO
    * Exchange (asserted in PlanShapeSpec). */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
