package graft.patterns

import graft.ir.Ir.ExecuteSqlTask
import graft.pipeline.PackageRunner.SqlOutcome
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical standalone DELETE → Spark compile, completing the executed
  * DML verb family (INSERT via [[SqlPatternRewriter]], MERGE via
  * [[MergeSqlCompiler]], UPDATE via [[UpdateSqlCompiler]]):
  *
  * {{{
  * DELETE FROM <target> [WHERE <pred>]
  * }}}
  *
  * Compiled as a state replacement: keep the rows where the predicate
  * is NOT TRUE (`!coalesce(pred, false)` — a NULL predicate keeps the
  * row, SQL's WHERE-is-TRUE rule), Overwrite. A bare DELETE empties the
  * table but keeps its schema. One narrow filter, zero shuffles.
  *
  * The DELETE+INSERT refresh statement stays with
  * [[SqlPatternRewriter]]: a statement whose WHERE body carries a
  * second statement (`;`, INSERT/SELECT/JOIN keywords) or quoted
  * identifiers declines here and falls through the executor chain —
  * the refresh rewrite (or manual review) still owns it. */
object DeleteSqlCompiler {

  private val deleteRe =
    "(?is)^\\s*delete\\s+from\\s+([^\\s;]+)(?:\\s+where\\s+(.+?))?\\s*;?\\s*$".r

  /** Standalone `TRUNCATE TABLE t` — same compile as a bare DELETE
    * (empty overwrite, schema kept); TRUNCATE+INSERT reload statements
    * do not match the end anchor and stay with [[SqlPatternRewriter]]. */
  private val truncateRe =
    "(?is)^\\s*truncate\\s+table\\s+([^\\s;]+)\\s*;?\\s*$".r

  private val deleteKeywordRe = "(?i)\\b(insert|select|from|join|output)\\b".r
  private def disqualified(body: String): Boolean =
    MergeSqlCompiler.bodyDisqualified(body, deleteKeywordRe)

  /** Parse-only classification twin of [[rewrite]] (no frames touched). */
  private[graft] def shapeMatches(sqlRaw: String): Boolean = {
    val sql = SqlText.stripComments(sqlRaw)
    truncateRe.findFirstIn(sql).isDefined ||
      deleteRe.findFirstMatchIn(sql).exists(m =>
        !Option(m.group(2)).exists(disqualified))
  }

  def rewrite(spark: SparkSession, task: ExecuteSqlTask,
      resolve: String => DataFrame): Option[SqlOutcome] = {
    val sql = SqlText.stripComments(task.sqlStatement)
    truncateRe.findFirstMatchIn(sql).foreach { t =>
      val tgt = resolve(t.group(1))
      return Some(SqlOutcome(Some(tgt.filter(lit(false))), Some(t.group(1)),
        SaveMode.Overwrite,
        // T-SQL TRUNCATE does not set @@ROWCOUNT to the removed rows
        // (it reports 0 — minimally-logged, no per-row accounting)
        affected = Some(() => 0L)))
    }
    deleteRe.findFirstMatchIn(sql).flatMap { m =>
      val tgtName = m.group(1)
      val whereOpt = Option(m.group(2))
      if (whereOpt.exists(disqualified)) None
      else Some {
        val tgt = resolve(tgtName)
        val kept = whereOpt match {
          case Some(w) => tgt.filter(!coalesce(expr(w), lit(false)))
          case None => tgt.filter(lit(false))
        }
        // @@ROWCOUNT after DELETE = rows the predicate matched
        val deleted = whereOpt match {
          case Some(w) => () => tgt.filter(coalesce(expr(w), lit(false))).count()
          case None => () => tgt.count()
        }
        SqlOutcome(Some(kept), Some(tgtName), SaveMode.Overwrite,
          affected = Some(deleted))
      }
    }
  }
}
