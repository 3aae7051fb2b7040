package graft.patterns

import graft.ir.Ir.ExecuteSqlTask
import graft.pipeline.PackageRunner.SqlOutcome
import org.apache.spark.sql.SparkSession

/** T-SQL `IF [NOT] EXISTS (subquery) <stmt> [ELSE <stmt>]` → Spark
  * compile — the set-based conditional-load idiom (guarded seeds,
  * upsert-style maintenance) that [[SqlPatternRewriter]] deliberately
  * DISQUALIFIES (its embedded-UPDATE rule exists precisely so the
  * IF-EXISTS upsert is never half-executed; the reference's analyzer
  * sends the whole class to manual review). Here it EXECUTES:
  *
  *  - the EXISTS probe runs eagerly as `LIMIT 1`-bounded driver fact
  *    (the q13/A4 guard-count convention — one row decides a branch,
  *    never a collected result set);
  *  - the TAKEN branch compiles through the caller-supplied statement
  *    chain; the UNTAKEN branch must still LOOK like a statement this
  *    engine owns (leading INSERT/UPDATE/DELETE/TRUNCATE/SELECT/MERGE)
  *    — a branch that could never compile declines the WHOLE task, so
  *    a data flip next run cannot turn a "working" package into a
  *    failing one;
  *  - optional `BEGIN … END` dressing on either branch strips (the
  *    single-statement contract: a multi-statement block, a nested IF,
  *    or a `;` inside a branch declines to manual review).
  */
object IfExistsSqlCompiler {

  private val headRe = "(?is)^\\s*if\\s+(not\\s+)?exists\\s*\\(".r
  private val elseRe = "(?i)\\belse\\b".r
  private val beginRe = "(?is)^\\s*begin\\s+".r
  private val endRe = "(?is)\\s+end\\s*;?\\s*$".r
  private val stmtHeadRe =
    "(?is)^\\s*(insert|update|delete|truncate|select|merge)\\b".r
  private val nestedControlRe = "(?i)\\b(if|while|begin)\\b|;".r

  private final case class Parsed(negated: Boolean, probe: String,
      thenStmt: String, elseStmt: Option[String])

  /** Strip one optional BEGIN … END wrapper; None = the branch is not
    * a single statement this engine can own. Shared with
    * [[IfScalarSqlCompiler]] — one branch contract for both IF forms. */
  private[patterns] def branch(raw: String): Option[String] = {
    val msk0 = UpdateSqlCompiler.masked(raw)
    val (text, msk) = beginRe.findFirstMatchIn(msk0) match {
      case Some(b) =>
        endRe.findFirstMatchIn(msk0) match {
          case Some(e) => (raw.substring(b.end, e.start),
            msk0.substring(b.end, e.start))
          case None => return None // BEGIN without END
        }
      case None =>
        val t = raw.replaceAll("[;\\s]+$", "")
        (t, msk0.take(t.length))
    }
    if (stmtHeadRe.findFirstIn(msk).isEmpty) None
    else if (nestedControlRe.findFirstIn(msk).isDefined) None
    // a TRUNCATE/DELETE head with a later depth-0 INSERT is two
    // statements fused by a missing `;` — the order-blind rewriter at
    // the chain's tail would compile BOTH under the guard where T-SQL
    // guards only the first (a false guard then silently skips an
    // unconditional INSERT): decline the fusion outright
    else if (IfLadderSqlCompiler.fusedDml(msk)) None
    else Some(text.trim)
  }

  /** Head/probe/branch splitting shared by the single-statement parse
    * (the chain member) and [[parseMulti]] (the script-routed form). */
  private def split(text: String): Option[(Boolean, String, String, Option[String])] = {
    val msk = UpdateSqlCompiler.masked(text)
    headRe.findFirstMatchIn(msk).flatMap { h =>
      var depth = 1
      var i = h.end
      while (i < msk.length && depth > 0) {
        val c = msk.charAt(i)
        if (c == '(') depth += 1 else if (c == ')') depth -= 1
        i += 1
      }
      if (depth != 0) None
      else {
        val probe = text.substring(h.end, i - 1).trim
        val restMsk = msk.substring(i)
        val rest = text.substring(i)
        // the branch split is the first TOP-LEVEL else (outside parens)
        val cut = elseRe.findAllMatchIn(restMsk)
          .find(m => WindowSqlLowering.depthAt(restMsk, m.start) == 0)
        val (thenRaw, elseRaw) = cut match {
          case Some(m) => (rest.substring(0, m.start),
            Some(rest.substring(m.end)))
          case None => (rest, None)
        }
        Some((h.group(1) != null, probe, thenRaw, elseRaw))
      }
    }
  }

  private def parse(text: String): Option[Parsed] =
    split(text).flatMap { case (neg, probe, thenRaw, elseRaw) =>
      for {
        t <- branch(thenRaw)
        e <- elseRaw match {
          case Some(r) => branch(r).map(Some(_))
          case None => Some(None)
        }
      } yield Parsed(neg, probe, t, e)
    }

  // NOTE (r18): the multi-statement `parseMulti` form this object
  // carried since q109 is gone — [[IfLadderSqlCompiler]] owns EVERY
  // beyond-chain IF shape (multi-statement branches included) through
  // ONE parser, and the dispatcher routes whole-text ladders into the
  // script overlay, so the q109 class keeps its semantics with no
  // second probe/branch implementation to keep in sync.

  /** Parse-only classification twin (ledger / dry run) — no jobs. */
  private[graft] def shapeMatches(sqlRaw: String): Boolean =
    parse(SqlText.stripComments(sqlRaw)).exists(p =>
      "(?is)^\\s*select\\b".r.findFirstIn(p.probe).isDefined)

  /** Compile: probe eagerly, run the taken branch through `chain`. An
    * untaken-branch task with no ELSE is a vacuous success (T-SQL
    * skips the statement). The probe runs through
    * [[SqlPatternRewriter.runSelect]] — inside a script the overlay's
    * temp views shadow same-named warehouse tables, so the probe sees
    * STAGED (uncommitted) state, pinned by ScriptedExecutorSpec. */
  def rewrite(spark: SparkSession, task: ExecuteSqlTask,
      chain: ExecuteSqlTask => Option[SqlOutcome]): Option[SqlOutcome] = {
    val text = SqlText.stripComments(task.sqlStatement)
    parse(text).flatMap { p =>
      if ("(?is)^\\s*select\\b".r.findFirstIn(p.probe).isEmpty) None
      else {
        val found = !SqlPatternRewriter
          .runSelect(spark, p.probe).limit(1).isEmpty
        val fired = found != p.negated
        val taken = if (fired) Some(p.thenStmt) else p.elseStmt
        taken match {
          case None => Some(SqlOutcome(None, None)) // branch skipped
          case Some(s) => chain(task.copy(sqlStatement = s))
        }
      }
    }
  }
}
