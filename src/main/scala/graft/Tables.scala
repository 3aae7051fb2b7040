package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loaders for the driver-generated TPC-H-ish parquet testdata
  * (`/root/repo/TESTDATA.md`). All queries in [[SparkEntry]] read through
  * here so scans stay uniform (explicit paths, no schema inference beyond
  * parquet's own footer schema).
  *
  * Numeric convention for oracle (DuckDB) hash-parity — see SURVEY.md §7.4:
  *  - money/measure doubles are cast to DECIMAL at the scan boundary; all
  *    sums then run in exact decimal arithmetic (order-independent);
  *  - divisions are computed in DOUBLE on both engines, then cast to an
  *    explicit DECIMAL (Spark and DuckDB both round the shortest decimal
  *    representation half-up, verified empirically);
  *  - every output aggregate carries an explicit CAST on both sides so the
  *    result types line up byte-for-byte.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's µs timestamps
    * cannot hold ([PARQUET_TYPE_ILLEGAL]). We read it as a raw ns-epoch
    * Long via the legacy conf and expose `ts_us` (µs, = DuckDB's own
    * truncation on read, so `epoch_us(ts)` is the oracle-side equivalent)
    * plus `ts_t` as a proper TimestampType for window/date logic.
    */
  /** ns-epoch `ts` → `ts_us` (µs integer) + `ts_t` (TimestampType) — ONE
    * definition of the ns→µs convention, shared by the batch reader and
    * the streaming staging reader (stream/batch parity is gated, so the
    * two sides must never derive event time differently). */
  def withEventTimeCols(df: DataFrame): DataFrame =
    df.withColumn("ts_us", call_function("div", col("ts"), lit(1000L)))
      .withColumn("ts_t", timestamp_micros(col("ts_us")))

  def eventsNs(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    withEventTimeCols(load(spark, dir, "events"))
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def events(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** DECIMAL(12,2) cast used at scan boundaries for measure columns. */
  val Money: DecimalType = DecimalType(12, 2)
  /** Wide target for sums so Spark and DuckDB agree on the output type. */
  val MoneySum: DecimalType = DecimalType(38, 2)
}
