package graft.patterns

import graft.ir.Ir.ExecuteSqlTask
import graft.pipeline.PackageRunner.SqlOutcome
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Correlated DELETE…FROM (the T-SQL join-delete) → Spark compile — the
  * deletion twin of [[UpdateFromSqlCompiler]], closing the correlated
  * DML pair a real SSIS estate uses to purge by reference data:
  *
  * {{{
  * DELETE <t-alias> FROM <target> [AS] t [INNER] JOIN <source> [AS] s
  *   ON t.k = s.k [WHERE <pred>]
  * }}}
  *
  * The DELETE clause must name the FROM leg's target (alias or table
  * name). Declined to manual review: outer/cross joins, a second JOIN,
  * comma-style FROM lists, subqueries, quoted identifiers, trailing
  * statements, and T-SQL's doubled `DELETE FROM t FROM …` spelling
  * (the single-FROM alias form is the canonical authoring).
  * [[DeleteSqlCompiler]]'s single-table regex cannot match the join
  * form (its end anchor rejects a JOIN tail), so chain order is safe
  * in both directions.
  *
  * Compiled as a state replacement over ONE target×source LEFT-ANTI
  * join on `joinCond AND wherePred`: a target row is kept exactly when
  * NO source row both joins to it and satisfies the WHERE (a NULL
  * predicate means "not deleted" — SQL's WHERE-is-TRUE rule). Unlike
  * MERGE's 8672 and UPDATE…FROM's undefined-winner hazard, multi-match
  * needs no guard here: deletion is idempotent in T-SQL too, so the
  * anti-join is exactly the statement's semantics in one shuffle. */
object DeleteFromSqlCompiler {

  private val deleteFromRe =
    ("(?is)^\\s*delete\\s+([^\\s;]+)\\s+from\\s+([^\\s;]+)\\s+" +
      "(?:as\\s+)?(\\w+)\\s+(?:inner\\s+)?join\\s+([^\\s;]+)\\s+" +
      "(?:as\\s+)?(\\w+)\\s+on\\s+(.+?)" +
      "(?:\\s+where\\s+(.+?))?\\s*;?\\s*$").r

  private val offShapeJoinRe =
    "(?i)\\b(left|right|full|outer|cross)\\s+join\\b".r

  private val bodyKeywordRe =
    "(?i)\\b(select|insert|update|delete|merge|from|join|output)\\b".r

  /** Parse-only classification twin of [[rewrite]] (no frames touched). */
  private[graft] def shapeMatches(sqlRaw: String): Boolean = {
    val sql = SqlText.stripComments(sqlRaw)
    val msk = UpdateSqlCompiler.masked(sql)
    if (offShapeJoinRe.findFirstIn(msk).isDefined) return false
    deleteFromRe.findFirstMatchIn(msk).exists { m =>
      def g(i: Int): String = sql.substring(m.start(i), m.end(i))
      val bodies = g(6) :: (if (m.group(7) == null) Nil else List(g(7)))
      val namesTarget = g(1).equalsIgnoreCase(g(3)) ||
        g(1).equalsIgnoreCase(g(2))
      namesTarget && !g(3).equalsIgnoreCase(g(5)) &&
        !bodies.exists(MergeSqlCompiler.bodyDisqualified(_, bodyKeywordRe))
    }
  }

  def rewrite(spark: SparkSession, task: ExecuteSqlTask,
      resolve: String => DataFrame): Option[SqlOutcome] = {
    val sql = SqlText.stripComments(task.sqlStatement)
    val msk = UpdateSqlCompiler.masked(sql)
    if (offShapeJoinRe.findFirstIn(msk).isDefined) return None
    deleteFromRe.findFirstMatchIn(msk).flatMap { m =>
      def g(i: Int): String = sql.substring(m.start(i), m.end(i))
      val delTok = g(1)
      val (tgtName, tA) = (g(2), g(3))
      val (srcName, sA) = (g(4), g(5))
      val onBody = g(6)
      val whereOpt = if (m.group(7) == null) None else Some(g(7))
      val bodies = onBody :: whereOpt.toList
      val namesTarget = delTok.equalsIgnoreCase(tA) ||
        delTok.equalsIgnoreCase(tgtName)
      if (!namesTarget || tA.equalsIgnoreCase(sA) ||
        bodies.exists(MergeSqlCompiler.bodyDisqualified(_, bodyKeywordRe)))
        None
      else Some {
        val tgt = resolve(tgtName)
        val srcP = resolve(srcName).columns
          .foldLeft(resolve(srcName))((d, c) =>
            d.withColumnRenamed(c, MergeSqlCompiler.SrcPrefix + c))
        val joinCond = expr(MergeSqlCompiler.xlate(onBody, tA, sA))
        val firePred = whereOpt
          .map(w => coalesce(expr(MergeSqlCompiler.xlate(w, tA, sA)), lit(false)))
          .getOrElse(lit(true))
        val kept = tgt.join(srcP, joinCond && firePred, "left_anti")
        SqlOutcome(Some(kept), Some(tgtName), SaveMode.Overwrite,
          // @@ROWCOUNT after DELETE…FROM = target rows with a firing
          // match — the anti join's complement, one semi-join count
          affected = Some(() =>
            tgt.join(srcP, joinCond && firePred, "left_semi").count()))
      }
    }
  }
}
