package graft.patterns

import graft.ir.Ir.ExecuteSqlTask
import graft.pipeline.PackageRunner.SqlOutcome
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** The warehouse Execute SQL compile chain + multi-statement SCRIPT
  * executor — pattern machinery shared by any scaffold that drives
  * package SQL, extracted from the q80–q90 gate scaffold so the
  * compilers it orchestrates live beside it.
  *
  * Single statements route through the compiler chain (MERGE → UPDATE →
  * UPDATE…FROM → DELETE/TRUNCATE → DELETE…FROM → literal VALUES →
  * SqlPatternRewriter). Scripts are split on quote-aware semicolons
  * AND `GO` batch-separator lines of the comment-stripped text and
  * routed by SHAPE:
  *
  *  - the canonical REFRESH script (clears followed by one
  *    INSERT…SELECT, a clear naming the insert target) keeps
  *    [[SqlPatternRewriter]]'s whole-table-overwrite semantics — the
  *    reference's `_clean_sql_for_dbt` contract (q17/q37 class);
  *  - every other script executes SEQUENTIALLY against a shadow
  *    overlay: later statements see earlier writes (the overlay is also
  *    registered as temp views so rewriter-path `spark.sql` statements
  *    read it — gated by q90), and the overlay commits only when EVERY
  *    statement compiles — a script never half-executes. The overlay
  *    views drop at script end either way: a session temp view
  *    outliving the task would leak into the NEXT package run's
  *    `spark.table` fallback (observed as a doubled append); a
  *    same-named temp view the CALLER registered before the script ran
  *    is snapshotted and re-registered after the drop.
  *    Crucially, a non-refresh script never falls back to the
  *    whole-statement chain: SqlPatternRewriter's order-blind matchers
  *    would execute the first INSERT…SELECT and silently drop the
  *    trailing statements — manual review beats a mangled half-run.
  *
  * T-SQL transaction dressing is honored, not parsed around:
  * `BEGIN TRAN[SACTION]` / `COMMIT` / `SET NOCOUNT ON|OFF` statements
  * strip away (the overlay's commit-only-when-every-statement-compiles
  * rule IS the transaction contract), a `BEGIN TRAN` fused onto the
  * next statement by a missing `;` loses just the prefix, and any
  * `ROLLBACK` — conditional undo this replay cannot express — declines
  * the whole task to manual review. */
object ScriptedSqlExecutor {

  /** T-SQL housekeeping statements that are semantic no-ops here: the
    * shadow-overlay script already IS all-or-nothing (nothing commits
    * unless every statement compiles), which is exactly the
    * BEGIN TRAN … COMMIT contract, and NOCOUNT only suppresses
    * rowcount chatter. The reference's own SQL parser tracks these
    * keywords (ssis-to-dbt `src/parser/utils.py:45`). */
  private val txnNoopRe =
    ("(?is)^\\s*(?:begin\\s+tran(?:saction)?(?:\\s+\\w+)?" +
      "|commit(?:\\s+tran(?:saction)?(?:\\s+\\w+)?)?" +
      "|set\\s+nocount\\s+(?:on|off))\\s*$").r

  /** `BEGIN TRAN` fused onto the next statement by a missing `;`
    * (`BEGIN TRANSACTION UPDATE t SET …`) — strip the prefix, keep the
    * statement. */
  private val beginTranPrefixRe =
    "(?is)^\\s*begin\\s+tran(?:saction)?\\s+(?=[A-Za-z])".r

  /** A ROLLBACK anywhere is CONTROL FLOW (conditional undo this
    * replay cannot express) — the whole task declines to manual
    * review, never a half-honored transaction. */
  private val rollbackRe = "(?i)\\brollback\\b".r

  // ANCHORED per-statement twins of SqlPatternRewriter's order-blind
  // matchers (deleteTargetRe / truncateTargetRe / insertSelectRe): the
  // routing predicate below must classify exactly the scripts that
  // rewriter compiles to its overwrite, so these regex pairs track each
  // other — RefreshRoutingSpec-style coverage lives in PipelineSpec's
  // ScriptedSqlExecutor test; table-name normalization is the
  // rewriter's own sameTable.
  private val clearStmtRe =
    "(?is)^\\s*(?:delete\\s+from|truncate\\s+table)\\s+([^\\s(;]+)".r
  private val insertSelectStmtRe =
    "(?is)^\\s*insert\\s+into\\s+([^\\s(;]+)\\s*(?:\\([^)]*\\))?\\s*select\\b".r

  /** Clears (DELETE/TRUNCATE) followed by one INSERT…SELECT, with a
    * clear naming the insert target — SqlPatternRewriter's overwrite
    * class, the only script shape the whole-statement chain may own. */
  private[patterns] def isRefreshShape(stmts: List[String]): Boolean =
    stmts.length >= 2 && {
      val clears = stmts.init
        .map(clearStmtRe.findFirstMatchIn(_).map(_.group(1)))
      val ins = insertSelectStmtRe.findFirstMatchIn(stmts.last)
        .map(_.group(1))
      clears.forall(_.isDefined) && ins.isDefined &&
        clears.flatten.exists(c => SqlPatternRewriter.sameTable(c, ins.get))
    }

  /** Build a task executor over the caller's written-state:
    * `resolveFrame` maps a table name to its current frame (throwing
    * for unknown names), `bareName` strips schema/bracket decoration,
    * `commit` lands a frame into the written state. Statement text must
    * already be parameter-bound and bracket-translated by the caller. */
  def executor(spark: SparkSession,
      resolveFrame: String => DataFrame,
      bareName: String => String,
      commit: (String, DataFrame) => Unit)
      : ExecuteSqlTask => Option[SqlOutcome] = {

    def chain(stmt: ExecuteSqlTask,
        resolve: String => DataFrame): Option[SqlOutcome] =
      MergeSqlCompiler.rewrite(spark, stmt, resolve)
        .orElse(UpdateSqlCompiler.rewrite(spark, stmt, resolve))
        .orElse(UpdateFromSqlCompiler.rewrite(spark, stmt, resolve))
        .orElse(DeleteSqlCompiler.rewrite(spark, stmt, resolve))
        .orElse(DeleteFromSqlCompiler.rewrite(spark, stmt, resolve))
        .orElse(InsertValuesSqlCompiler.rewrite(spark, stmt, resolve))
        .orElse(SelectIntoSqlCompiler.rewrite(spark, stmt, resolve))
        .orElse(SqlPatternRewriter.rewrite(spark, stmt))

    def script(bound: ExecuteSqlTask,
        stmts: List[String]): Option[SqlOutcome] = {
      val overlay = scala.collection.mutable.Map.empty[String, DataFrame]
      // a caller may have registered a same-named temp view BEFORE the
      // script runs; createOrReplaceTempView replaces it and the drop
      // below would then delete it outright — snapshot those frames now
      // and re-register them after the drop, so a caller binding views
      // once per run is not silently unbound by the first script task
      val shadowed = scala.collection.mutable.Map.empty[String, DataFrame]
      def snapshot(name: String): Unit =
        if (!overlay.contains(name) && !shadowed.contains(name))
          scala.util.Try(spark.catalog.getTable(name)).toOption
            .filter(_.isTemporary)
            .foreach { _ => shadowed(name) = spark.table(name) }
      def res(name: String): DataFrame =
        overlay.getOrElse(name, resolveFrame(name))
      def stage(o: SqlOutcome): Unit =
        for { tgt <- o.target; df <- o.df } {
          val bare = bareName(tgt)
          snapshot(bare)
          overlay(bare) = o.mode match {
            case SaveMode.Append =>
              scala.util.Try(res(bare)).toOption
                .map(_.unionByName(df)).getOrElse(df)
            case _ => df
          }
          overlay(bare).createOrReplaceTempView(bare)
        }
      val outcomes = scala.collection.mutable.ListBuffer.empty[SqlOutcome]
      // the view drop must survive EXCEPTIONS, not just declines: a
      // compiler `require` or a unionByName schema mismatch thrown
      // mid-script becomes TaskStatus.Failed upstream, and a leaked
      // overlay view would feed the next run's spark.table fallback
      // with never-committed rows — try/finally, not happy-path cleanup
      try {
        // short-circuit on the first unconvertible statement: a later
        // statement may reference a table an earlier one creates, so
        // compiling past a failure is meaningless
        val allOk = stmts.forall { s =>
          chain(bound.copy(sqlStatement = s), res) match {
            case Some(o) => stage(o); outcomes += o; true
            case None => false
          }
        }
        if (!allOk) None
        else {
          overlay.foreach { case (k, v) => commit(k, v) }
          // writes are committed; hand the runner a write-free outcome
          // carrying the final statement's frame (result-set binding)
          Some(SqlOutcome(outcomes.last.df, None))
        }
      } finally {
        overlay.keys.foreach(k => spark.catalog.dropTempView(k): Unit)
        // restore any pre-existing temp views the overlay replaced
        shadowed.foreach { case (k, f) => f.createOrReplaceTempView(k) }
      }
    }

    bound => {
      val text = SqlText.stripComments(bound.sqlStatement)
      // the DECLARE/assign/IF-RAISERROR guard block is a WHOLE-text
      // shape — it must be recognized before statement splitting would
      // shred it into unconvertible pieces
      val guard = GuardBlockSqlCompiler.rewrite(spark,
        bound.copy(sqlStatement = text), resolveFrame)
      if (guard.isDefined) guard
      else if (rollbackRe.findFirstIn(UpdateSqlCompiler.masked(text)).isDefined)
        None // conditional undo is control flow — manual review
      else {
        // GO batch separators split exactly like ';' — a batch boundary
        // is always a statement boundary
        val stmts0 = SqlText.splitBatches(text)
          .flatMap(SqlText.splitStatements)
        val stmts = stmts0
          .map(s => beginTranPrefixRe.replaceFirstIn(s, ""))
          .filterNot(s => txnNoopRe.findFirstMatchIn(s).isDefined)
        val txnStripped = stmts != stmts0
        // a statement text rewritten by the transaction strip must be
        // what the chain compiles; untouched tasks keep their ORIGINAL
        // text (compilers strip comments themselves)
        def single(s: String) =
          chain(if (txnStripped) bound.copy(sqlStatement = s) else bound,
            resolveFrame)
        if (stmts.isEmpty)
          // a script of only BEGIN TRAN/COMMIT/NOCOUNT: vacuous success
          Some(SqlOutcome(None, None))
        else if (stmts.length == 1) single(stmts.head)
        else if (isRefreshShape(stmts))
          single(stmts.mkString(";\n")).orElse(script(bound, stmts))
        else script(bound, stmts)
      }
    }
  }
}
