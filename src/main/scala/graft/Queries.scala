package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The operator inventory (SURVEY.md §2) expressed over the driver's
  * testdata tables, each paired with DuckDB oracle SQL in [[oracle]].
  */
object Queries {
  import Tables._

  /** A1/A2 — Aggregate component / aggregate-refresh pattern
    * (ref: constants.py:31, SalesFactETL.dtsx:293-306, agg_daily_sales.sql:55-66).
    * TPC-H Q1-shaped group-by with exact decimal sums.
    */
  def q01_agg_group(spark: SparkSession, dir: String): DataFrame = {
    val li = lineitem(spark, dir)
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        // Sums stay exact in DECIMAL; the *emitted* column is DOUBLE so both
        // engines' client conversions land on the identical float64 (a decimal
        // output column stringifies with trailing zeros on the parquet side
        // but not on the oracle side — see tools/check.py).
        sum(col("l_quantity").cast(Money)).cast(DoubleType).as("sum_qty"),
        sum(col("l_extendedprice").cast(Money)).cast(DoubleType).as("sum_base_price"),
        count(lit(1)).as("count_order")
      )
  }

  val q01Oracle: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  def all: Map[String, (SparkSession, String) => DataFrame] =
    Map("q01_agg_group" -> (q01_agg_group _)) ++ QueriesRelational.all ++
      QueriesTrainingData.all ++ QueriesStreaming.all

  def oracle: Map[String, String] =
    Map("q01_agg_group" -> q01Oracle) ++ QueriesRelational.oracle ++
      QueriesTrainingData.oracle ++ QueriesStreaming.oracle
}
