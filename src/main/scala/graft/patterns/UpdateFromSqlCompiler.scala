package graft.patterns

import graft.ir.Ir.ExecuteSqlTask
import graft.pipeline.PackageRunner.SqlOutcome
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Correlated UPDATE…FROM (the T-SQL join-update) → Spark compile — the
  * single most common T-SQL mutation idiom after the canonical forms the
  * engine already executes. The reference's analyzer classifies UPDATE
  * statements for exactly this manual-review reason (ssis-to-dbt
  * `src/agents/analyzer.py:137-156`); here the canonical two-table shape
  * also EXECUTES through the runner:
  *
  * {{{
  * UPDATE <t-alias> SET col = s.expr, ...
  * FROM <target> [AS] t [INNER] JOIN <source> [AS] s ON t.k = s.k
  * [WHERE <pred>]
  * }}}
  *
  * The UPDATE clause must name the FROM leg's target (alias or table
  * name). Declined to manual review ([[UpdateSqlCompiler]] already
  * declines any FROM — this compiler owns the join form): outer/cross
  * joins (their unmatched-row NULL-assignment semantics are not the
  * inner form's), more than one JOIN, comma-style FROM lists,
  * subqueries, quoted identifiers, trailing statements.
  *
  * Compiled as a state replacement over ONE target×source LEFT join —
  * the merge-key shuffle happens once: matched rows take
  * `CASE WHEN pred THEN expr ELSE old END` (every SET expression sees
  * the PRE-update row, and a NULL WHERE means "not updated" — SQL's
  * WHERE-is-TRUE rule), unmatched target rows pass through, and every
  * branch casts to the TARGET column type (T-SQL column types win).
  *
  * Multi-match: T-SQL leaves an UPDATE…FROM whose target row matches
  * several source rows UNDEFINED (one arbitrary source row wins — a
  * silent wrong answer at any scale). This engine refuses to choose: a
  * window match-count on the same joined frame raises from the action
  * that materializes the state, exactly like [[MergeSqlCompiler]]'s
  * 8672 guard (writes are lazy frames, so nothing commits). */
object UpdateFromSqlCompiler {

  private val updateFromRe =
    ("(?is)^\\s*update\\s+([^\\s;]+)\\s+set\\s+(.+?)\\s+" +
      "from\\s+([^\\s;]+)\\s+(?:as\\s+)?(\\w+)\\s+(?:inner\\s+)?join\\s+" +
      "([^\\s;]+)\\s+(?:as\\s+)?(\\w+)\\s+on\\s+(.+?)" +
      "(?:\\s+where\\s+(.+?))?\\s*;?\\s*$").r

  /** An outer/cross join anywhere in the statement is a different
    * semantics class (unmatched rows assign NULL) — decline the whole
    * statement before the permissive alias token can swallow the
    * direction keyword (`FROM t LEFT JOIN s` would otherwise parse with
    * alias "LEFT" and silently run inner semantics). */
  private val offShapeJoinRe =
    "(?i)\\b(left|right|full|outer|cross)\\s+join\\b".r

  /** Clause bodies must stay expression-only: any verb keyword, a
    * second join, or a FROM (a subquery leg) leaves the canonical
    * contract. */
  private val bodyKeywordRe =
    "(?i)\\b(select|insert|update|delete|merge|from|join|output)\\b".r

  /** Parse-only classification twin of [[rewrite]] (no frames touched). */
  private[graft] def shapeMatches(sqlRaw: String): Boolean = {
    val sql = SqlText.stripComments(sqlRaw)
    val msk = UpdateSqlCompiler.masked(sql)
    if (offShapeJoinRe.findFirstIn(msk).isDefined) return false
    updateFromRe.findFirstMatchIn(msk).exists { m =>
      def g(i: Int): String = sql.substring(m.start(i), m.end(i))
      val bodies = g(2) :: g(7) ::
        (if (m.group(8) == null) Nil else List(g(8)))
      val namesTarget = g(1).equalsIgnoreCase(g(4)) ||
        g(1).equalsIgnoreCase(g(3))
      namesTarget && !g(4).equalsIgnoreCase(g(6)) &&
        !bodies.exists(MergeSqlCompiler.bodyDisqualified(_, bodyKeywordRe))
    }
  }

  def rewrite(spark: SparkSession, task: ExecuteSqlTask,
      resolve: String => DataFrame): Option[SqlOutcome] = {
    val sql = SqlText.stripComments(task.sqlStatement)
    val msk = UpdateSqlCompiler.masked(sql)
    if (offShapeJoinRe.findFirstIn(msk).isDefined) return None
    updateFromRe.findFirstMatchIn(msk).flatMap { m =>
      // match on the masked twin, slice the ORIGINAL by group spans
      def g(i: Int): String = sql.substring(m.start(i), m.end(i))
      val updTok = g(1)
      val setList = g(2)
      val (tgtName, tA) = (g(3), g(4))
      val (srcName, sA) = (g(5), g(6))
      val onBody = g(7)
      val whereOpt = if (m.group(8) == null) None else Some(g(8))
      val bodies = setList :: onBody :: whereOpt.toList
      // the UPDATE clause must name the FROM target — a mismatch is
      // either a three-table form or a mis-split; both are manual review
      val namesTarget = updTok.equalsIgnoreCase(tA) ||
        updTok.equalsIgnoreCase(tgtName)
      if (!namesTarget || tA.equalsIgnoreCase(sA) ||
        bodies.exists(MergeSqlCompiler.bodyDisqualified(_, bodyKeywordRe)))
        None
      else Some {
        val tgt = resolve(tgtName)
        val srcP = resolve(srcName).columns
          .foldLeft(resolve(srcName))((d, c) =>
            d.withColumnRenamed(c, MergeSqlCompiler.SrcPrefix + c))
          .withColumn("__graft_smatch", lit(true))
        val joinCond = expr(MergeSqlCompiler.xlate(onBody, tA, sA))
        val assignments = MergeSqlCompiler.splitTop(setList).map { a =>
          val i = a.indexOf('=')
          require(i > 0, s"UPDATE SET assignment has no '=': $a")
          MergeSqlCompiler.xlate(a.take(i).trim, tA, sA) ->
            expr(MergeSqlCompiler.xlate(a.drop(i + 1).trim, tA, sA))
        }
        // misspelled / duplicated SET columns abort, never silently
        // no-op — the UpdateSqlCompiler validation contract
        val tgtCols = tgt.columns.map(_.toLowerCase).toSet
        val bad = assignments.map(_._1).filterNot(c => tgtCols(c.toLowerCase))
        require(bad.isEmpty,
          s"UPDATE SET names column(s) absent from target ${tgtName}: " +
            bad.mkString(", "))
        val dup = assignments.map(_._1).groupBy(_.toLowerCase)
          .filter(_._2.size > 1)
        require(dup.isEmpty,
          s"UPDATE SET assigns column(s) more than once: " +
            dup.keys.mkString(", "))
        val setLc = assignments.map { case (k, v) => k.toLowerCase -> v }.toMap
        val wherePred = whereOpt
          .map(w => coalesce(expr(MergeSqlCompiler.xlate(w, tA, sA)), lit(false)))
          .getOrElse(lit(true))
        val tgtWithId = tgt.withColumn("__graft_tid",
          monotonically_increasing_id())
        val joined = tgtWithId.join(srcP, joinCond, "left_outer")
        val isMatched = col("__graft_smatch").isNotNull
        // every target row keeps its unique tid in a LEFT join, so the
        // guard window has no null-key funnel to salt around
        val guarded = joined.withColumn("__graft_mcnt",
          count(when(isMatched, lit(1)))
            .over(Window.partitionBy(col("__graft_tid"))))
        val kept = guarded.filter(
          when(col("__graft_mcnt") > 1,
            raise_error(lit(s"UPDATE ${tgtName} FROM: a target row is " +
              "matched by multiple source rows — T-SQL leaves which one " +
              "wins undefined; compact the source to one row per join " +
              "key first")).cast("boolean"))
            .otherwise(lit(true)))
        val fire = isMatched && wherePred
        val out = kept.select(tgt.schema.fields.toSeq.map { f =>
          setLc.get(f.name.toLowerCase) match {
            case Some(e) =>
              when(fire, e).otherwise(col(f.name)).cast(f.dataType).as(f.name)
            case None => col(f.name).as(f.name)
          }
        }: _*)
        SqlOutcome(Some(out), Some(tgtName), SaveMode.Overwrite,
          // @@ROWCOUNT after UPDATE…FROM = target rows where the join
          // matched AND the WHERE fired (the guarded frame reuses the
          // one join; a multi-match still aborts through raise_error)
          affected = Some(() => kept.filter(fire).count()))
      }
    }
  }
}
