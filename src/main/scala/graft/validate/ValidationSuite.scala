package graft.validate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** DataFrame-native migration validation (SURVEY.md §2.4 A3 / §5):
  * row-count, PK integrity, and numeric checksums with the reference's
  * tolerances (row count 1%, checksum 0.01% — ssis-to-dbt
  * `config/agents.yaml:12-14`), plus the dbt-style declarative data tests
  * (not_null / unique / accepted_values / between / relationships).
  *
  * 100 TB posture: every check is a single distributed aggregation
  * returning scalars — no data ever collects to the driver, and multi-
  * metric checks fuse into one pass (e.g. PK nulls+dups+count is one
  * groupBy).
  */
object ValidationSuite {

  final case class CheckResult(
      check: String,
      target: String,
      passed: Boolean,
      expected: String,
      actual: String,
      details: String = "")

  final case class Tolerances(rowCountPct: Double = 1.0, checksumPct: Double = 0.01)

  /** Row-count equality within tolerance; warn band (≤2× tolerance) is
    * reported in details like the reference's validator (validator.py:254-260). */
  def rowCountMatch(actual: DataFrame, expected: DataFrame, target: String,
      tol: Tolerances = Tolerances()): CheckResult = {
    val a = actual.count(); val e = expected.count()
    val pct = if (e == 0) (if (a == 0) 0.0 else 100.0) else math.abs(a - e) * 100.0 / e
    CheckResult("row_count", target, pct <= tol.rowCountPct, e.toString, a.toString,
      f"variance $pct%.4f%%" + (if (pct > tol.rowCountPct && pct <= 2 * tol.rowCountPct)
        " (warn band)" else ""))
  }

  /** PK nulls + duplicates + row count in ONE aggregation pass. Null-key
    * rows report under pk_not_null ONLY — SQL PK semantics say
    * NULL ≠ NULL, so a repeated null key is not a duplicate group (and
    * double-reporting it would send the Diagnoser down the wrong
    * "deduplicate" fix for a pure null-key problem). */
  def pkIntegrity(df: DataFrame, keys: Seq[String], target: String): List[CheckResult] = {
    val anyNull = keys.map(col(_).isNull).reduce(_ || _)
    val row = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
      .agg(
        sum(col("n")).as("rows"),
        sum(when(anyNull, col("n")).otherwise(0L)).as("null_keys"),
        sum(when(col("n") > 1 && !anyNull, 1L).otherwise(0L)).as("dup_keys"))
      .head()
    val nulls = Option(row.get(1)).fold(0L)(_.toString.toLong)
    val dups = Option(row.get(2)).fold(0L)(_.toString.toLong)
    List(
      CheckResult("pk_not_null", target, nulls == 0, "0", nulls.toString,
        s"keys=${keys.mkString(",")}"),
      CheckResult("pk_unique", target, dups == 0, "0", dups.toString,
        s"keys=${keys.mkString(",")}"))
  }

  /** SUM/AVG checksum comparison on a numeric column, cast to DOUBLE like
    * the reference (`SUM(CAST(col AS FLOAT))`, sql_server.py:156-254). */
  def checksum(actual: DataFrame, expected: DataFrame, column: String, target: String,
      tol: Tolerances = Tolerances()): List[CheckResult] = {
    def sums(df: DataFrame) = {
      val r = df.agg(
        sum(col(column).cast(DoubleType)).as("s"),
        avg(col(column).cast(DoubleType)).as("a")).head()
      (Option(r.get(0)).fold(0.0)(_.toString.toDouble),
        Option(r.get(1)).fold(0.0)(_.toString.toDouble))
    }
    val (sa, aa) = sums(actual); val (se, ae) = sums(expected)
    def pct(a: Double, e: Double) = if (e == 0.0) (if (a == 0.0) 0.0 else 100.0)
      else math.abs(a - e) * 100.0 / math.abs(e)
    List(
      CheckResult(s"checksum_sum($column)", target, pct(sa, se) <= tol.checksumPct,
        se.toString, sa.toString, f"variance ${pct(sa, se)}%.6f%%"),
      CheckResult(s"checksum_avg($column)", target, pct(aa, ae) <= tol.checksumPct,
        ae.toString, aa.toString, f"variance ${pct(aa, ae)}%.6f%%"))
  }

  // ---- dbt-style declarative data tests (schema.yml semantics) ----

  def notNull(df: DataFrame, column: String, target: String): CheckResult = {
    val n = df.filter(col(column).isNull).count()
    CheckResult(s"not_null($column)", target, n == 0, "0", n.toString)
  }

  def unique(df: DataFrame, column: String, target: String): CheckResult = {
    // dbt's generic unique test filters `where column is not null` —
    // repeated NULLs are not duplicates and must not fail the model
    val n = df.filter(col(column).isNotNull)
      .groupBy(col(column)).count().filter(col("count") > 1).count()
    CheckResult(s"unique($column)", target, n == 0, "0", n.toString,
      "duplicated values")
  }

  def acceptedValues(df: DataFrame, column: String, values: Seq[String],
      target: String): CheckResult = {
    val n = df.filter(col(column).isNotNull && !col(column).isin(values: _*)).count()
    CheckResult(s"accepted_values($column)", target, n == 0, "0", n.toString,
      s"allowed=${values.mkString("|")}")
  }

  /** dbt_expectations.expect_column_values_to_be_between. */
  def valuesBetween(df: DataFrame, column: String, lo: Option[Double], hi: Option[Double],
      target: String): CheckResult = {
    val c = col(column).cast(DoubleType)
    val bad = (lo.map(c < _).toList ++ hi.map(c > _).toList).reduceOption(_ || _)
    val n = bad.fold(0L)(p => df.filter(c.isNotNull && p).count())
    CheckResult(s"between($column)", target, n == 0, "0", n.toString,
      s"range=[${lo.getOrElse("-inf")},${hi.getOrElse("inf")}]")
  }

  /** dbt `relationships` test: child FK values must exist in the parent —
    * one anti-join count. */
  def relationships(child: DataFrame, fk: String, parent: DataFrame, pk: String,
      target: String): CheckResult = {
    // DataFrame-qualified join columns: with fk and pk sharing a name
    // (customer_id → customer_id, THE common case) unqualified col()s are
    // ambiguous across the join — an AnalysisException at best, a
    // trivially-true predicate (false PASS) at worst
    val parentKeys = parent.select(col(pk)).distinct()
    val probe = child.filter(col(fk).isNotNull)
    val n = probe
      .join(parentKeys, probe(fk) === parentKeys(pk), "left_anti")
      .count()
    CheckResult(s"relationships($fk->$pk)", target, n == 0, "0", n.toString)
  }

  /** Pre-ETL guard (SalesFactETL.dtsx:54-61): a table must be non-empty. */
  def nonEmptyGuard(df: DataFrame, target: String): CheckResult = {
    val any = df.limit(1).count()
    CheckResult("non_empty_guard", target, any > 0, ">0", any.toString)
  }

  def report(results: Seq[CheckResult]): String = {
    val w = results.count(!_.passed)
    val lines = results.map { r =>
      val mark = if (r.passed) "PASS" else "FAIL"
      f"$mark  ${r.check}%-28s ${r.target}%-24s expected=${r.expected} actual=${r.actual} ${r.details}"
    }
    (lines :+ s"${results.size} checks, $w failed").mkString("\n")
  }
}
