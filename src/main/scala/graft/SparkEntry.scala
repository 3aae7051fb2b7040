package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 gets a `queries` entry running over the
  * driver's testdata tables, and (where SQL-expressible) an `oracleSql`
  * entry the driver runs in DuckDB on the same parquet. Column names are
  * aliased identically on both sides (driver sorts columns by name before
  * hashing).
  */
object SparkEntry {
  import Tables._

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Mirrors the reference's aggregate-refresh pattern
    * (SalesFactETL.dtsx:293-306 → agg_daily_sales.sql).
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.q01_agg_group(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  def oracleSql: Map[String, String] = Queries.oracle
}
