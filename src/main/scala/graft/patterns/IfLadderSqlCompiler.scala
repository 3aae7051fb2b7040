package graft.patterns

import scala.collection.mutable.ListBuffer

/** T-SQL `IF … [ELSE IF …]* [ELSE …]` LADDERS with multi-statement
  * `BEGIN … END` branches, conditional assignment legs, and the
  * top-level early-exit `RETURN` leg — the dispatcher-level promotion
  * of the r17 single-statement chain members ([[IfExistsSqlCompiler]],
  * [[IfScalarSqlCompiler]]). The reference's analyzer routes ALL
  * control flow to manual review (ssis-to-dbt
  * `src/agents/analyzer.py:137-156`); here the ladder is a first-match
  * CASCADE of the same eager driver probes the chain members run —
  * never nested control: each predicate folds to one boolean fact, the
  * first true leg's statement LIST executes through the script
  * sequencer's own `compileOne` (so `SET @v = …` reaches the
  * executor's variable state — the restriction that kept conditional
  * assignment out of the r17 chain member, `IfScalarSqlCompiler`
  * scaladoc), and `RETURN` as an entire leg exits the batch: the
  * remaining script statements are skipped and everything staged
  * commits (T-SQL batch-exit semantics; the executor keeps declining
  * RETURN inside an explicit `BEGIN TRAN` bracket — commit/rollback
  * placement there is ambiguous — and everywhere mid-body).
  *
  * This object is PARSE-ONLY — classification and structure. The
  * evaluation (predicate binding via the executor's `bindVars`, branch
  * sequencing, early-exit bookkeeping) lives in
  * [[ScriptedSqlExecutor]]'s `compileOne`, which is the one place with
  * variable state and the staging overlay in reach.
  *
  * Predicates: `[NOT] EXISTS (SELECT …)` legs probe LIMIT-1-bounded;
  * scalar legs fold as `SELECT CASE WHEN (<pred>) THEN …` — NULL is
  * not-true (T-SQL UNKNOWN), exactly the chain members' contracts.
  * Both kinds mix freely in one ladder. Branch statements must each be
  * an ownable head (INSERT/UPDATE/DELETE/TRUNCATE/MERGE/SELECT/SET)
  * with no nested control flow (IF/WHILE/BEGIN/GOTO/BREAK/CONTINUE
  * and mid-body RETURN all decline — a block that could never compile
  * declines the WHOLE ladder, so a data flip next run cannot turn a
  * working package into a failing one — the shared branch contract).
  *
  * Single-leg ladders whose branches are one plain statement
  * ([[Ladder.chainEquivalent]]) are NOT owned here: they keep the r17
  * chain-member path byte-for-byte (q148/q109 regression surface) —
  * EXCEPT assignment-shaped branches (`IF p SELECT @v = …`), which the
  * chain would mis-read after literal binding (`SELECT <lit> = …` is a
  * valid boolean projection in Spark, a silent divergence) and the
  * ladder therefore claims even single-leg. */
object IfLadderSqlCompiler {

  sealed trait Pred
  /** `[NOT] EXISTS (probe)` — probe must be SELECT-headed. */
  final case class ExistsPred(negated: Boolean, probe: String) extends Pred
  /** A scalar boolean expression (variables still unbound here). */
  final case class ScalarPred(expr: String) extends Pred

  sealed trait Branch
  /** A bare `RETURN` leg — batch exit. */
  case object ReturnExit extends Branch
  /** A `RAISERROR(<args>)` leg — the mid-script validation guard.
    * Severity ≥ 11 aborts the task exactly like
    * [[GuardBlockSqlCompiler]]'s whole-text form (and is T-SQL-
    * catchable, so a TRY/CATCH script catches it); ≤ 10 is
    * informational and the batch continues. */
  final case class Raise(args: String) extends Branch
  /** One or more ownable statements (BEGIN…END stripped). `hadSemi`
    * records a `;` inside the BEGIN…END body — the chain members'
    * single-statement contract declines those even when the body holds
    * only one statement (`BEGIN x; END`), so the ladder owns them. */
  final case class Stmts(stmts: List[String],
      hadSemi: Boolean = false) extends Branch

  final case class Ladder(legs: List[(Pred, Branch)],
      otherwise: Option[Branch]) {
    def hasReturn: Boolean =
      (legs.map(_._2) ++ otherwise).contains(ReturnExit)
    /** Would the r17 chain members own this shape identically? True for
      * a single leg whose branches are each ONE plain (non-assignment)
      * statement with no `;` inside its block dressing — those keep
      * the existing path untouched. An EXISTS-HEADED compound scalar
      * predicate (`IF EXISTS (…) AND @n > 0 …`) is NOT chain-ownable:
      * IfExists can't parse past its first close paren and IfScalar
      * declines EXISTS heads outright — the ladder folds it (r18). */
    def chainEquivalent: Boolean = legs.size == 1 &&
      (legs.head._1 match {
        case ScalarPred(e) => existsHeadRe
          .findFirstIn(UpdateSqlCompiler.masked(e).trim).isEmpty
        case _: ExistsPred => true
      }) &&
      (legs.map(_._2) ++ otherwise).forall {
        case Stmts(List(s), hadSemi) => !hadSemi && assignHeadRe
          .findFirstIn(UpdateSqlCompiler.masked(s)).isEmpty
        case _ => false
      }
  }

  // `SET @v = …` / `SELECT @v = …` heads: the executor's assignment
  // machinery must see these UNBOUND (binding the target turns the
  // assignment into a literal comparison)
  private val assignHeadRe = "(?is)^\\s*(?:set|select)\\s+@\\w+\\s*=".r

  private val existsHeadRe = "(?is)^(not\\s+)?exists\\s*\\(".r
  private val selectHeadRe = "(?is)^\\s*select\\b".r
  // tokens that OPEN a branch after a scalar predicate (word-bounded,
  // not part of an identifier / bracket / @var / #temp)
  private val openerRe = ("(?i)(?<![\\w\\[.@#$])(insert|update|delete|" +
    "truncate|merge|select|begin|set|return|raiserror)(?![\\w\\]])").r
  // control-flow keywords that may not appear inside a scalar
  // predicate span (the text is then not `IF <expr> <branch>`)
  private val predControlRe = "(?i)\\b(if|else|while|begin|end|goto)\\b".r
  private val elseTokRe = "(?i)(?<![\\w\\[.@#$])else(?![\\w\\]])".r
  // per-branch-statement gates: ownable head, no nested control
  private val stmtHeadRe =
    "(?is)^\\s*(insert|update|delete|truncate|merge|select|set)\\b".r
  private val stmtControlRe = ("(?i)(?<![\\w\\[.@#$])(if|while|begin|" +
    "goto|return|break|continue)(?![\\w\\]])").r

  // block-structure tokens for BEGIN…END matching: BEGIN and CASE
  // push, END pops (CASE…END inside block bodies pairs away); a BEGIN
  // followed by TRAN/TRANSACTION/TRY/CATCH is transaction/handler
  // dressing, not a block opener
  private val blockTokRe =
    "(?i)(?<![\\w\\[.@#$])(begin|case|end)(?![\\w\\]])".r
  private val tranDressRe = "(?is)^\\s*(tran(?:saction)?|try|catch)\\b".r

  /** Net block balance of a fragment (`begin`/`case` minus `end`). */
  private def balance(msk: String): Int = {
    var d = 0
    blockTokRe.findAllMatchIn(msk).foreach { m =>
      m.group(1).toLowerCase match {
        case "begin" =>
          if (tranDressRe.findFirstIn(msk.substring(m.end)).isEmpty) d += 1
        case "case" => d += 1
        case "end" => d -= 1
      }
    }
    d
  }

  private val ifHeadRe = "(?is)^\\s*if\\b".r
  private val elseHeadRe = "(?is)^\\s*else\\b".r

  /** A TRUNCATE/DELETE head followed by a depth-0 INSERT token: two
    * statements fused by a missing `;` (shared decline with the chain
    * members' branch contract — see [[IfExistsSqlCompiler.branch]]). */
  private[patterns] def fusedDml(msk: String): Boolean =
    "(?is)^\\s*(truncate|delete)\\b".r.findFirstIn(msk).isDefined &&
      "(?i)\\binsert\\b".r.findAllMatchIn(msk)
        .exists(m => WindowSqlLowering.depthAt(msk, m.start) == 0)

  /** Re-join the fragments the `;` splitter shredded an
    * `IF … BEGIN <stmts> END [ELSE …]` block into: while an IF-headed
    * fragment's block balance stays positive, following fragments are
    * its block body (re-joined with the `;` the splitter consumed);
    * a balanced IF-headed fragment followed by an `ELSE`-headed one is
    * the `IF <stmt>; ELSE <stmt>` spelling (the `;` before ELSE
    * terminates the THEN statement — re-joined with a space, as the
    * ladder grammar reads it). Anything else passes through untouched,
    * so non-IF scripts split exactly as before. */
  private[graft] def regroup(stmts: List[String]): List[String] = {
    val out = ListBuffer.empty[String]
    stmts.foreach { s =>
      val joined = out.lastOption.flatMap { prev =>
        val pm = UpdateSqlCompiler.masked(prev)
        if (ifHeadRe.findFirstIn(pm).isEmpty) None
        else {
          val b = balance(pm)
          if (b > 0) Some(prev + "; " + s)
          else if (b == 0 && elseHeadRe
              .findFirstIn(UpdateSqlCompiler.masked(s)).isDefined)
            Some(prev + " " + s)
          else None
        }
      }
      joined match {
        case Some(j) => out(out.length - 1) = j
        case None => out += s
      }
    }
    out.toList
  }

  /** Parse one statement text (comments already stripped) as an IF
    * ladder. None = not a shape this compiler can state — the caller
    * falls through to the r17 chain members (which own or decline). */
  def parse(text: String): Option[Ladder] = {
    val msk = UpdateSqlCompiler.masked(text)
    // the whole text must be ONE ladder: a trailing `;` is tolerated
    // (stripped below); any other trailing content declines
    var i = 0
    def ws(): Unit = {
      while (i < msk.length && msk.charAt(i).isWhitespace) i += 1 }
    def atEnd: Boolean = { ws(); i >= msk.length ||
      msk.substring(i).forall(c => c == ';' || c.isWhitespace) }
    def kwAt(k: String): Boolean = {
      msk.regionMatches(true, i, k, 0, k.length) && {
        val after = i + k.length
        (after >= msk.length ||
          (!Character.isLetterOrDigit(msk.charAt(after)) &&
            msk.charAt(after) != '_')) &&
        (i == 0 || (!Character.isLetterOrDigit(msk.charAt(i - 1)) &&
          !"_@#[.$".contains(msk.charAt(i - 1))))
      }
    }
    def eat(k: String): Boolean = {
      ws(); if (kwAt(k)) { i += k.length; true } else false }

    def parsePred(): Option[Pred] = {
      ws()
      // the scalar form: predicate runs from here to the first depth-0
      // branch-opener token. EXISTS subqueries inside it sit at paren
      // depth ≥ 1, so their SELECTs never end the scan — Spark folds
      // scalar-context EXISTS natively, so a compound predicate
      // (`@n > 0 AND EXISTS (…)`, `EXISTS (…) OR EXISTS (…)`) rides
      // the same CASE-WHEN fold as any other boolean expression.
      def scalarPred(): Option[Pred] = {
        val verb = openerRe.findAllMatchIn(msk)
          .find(m => m.start >= i &&
            WindowSqlLowering.depthAt(msk, m.start) == 0)
          .getOrElse(return None)
        val predTxt = text.substring(i, verb.start).trim
        if (predTxt.isEmpty) return None
        // control-flow keywords inside the predicate span mean the
        // text is NOT `IF <expr> <branch>` — decline, never hand
        // spark.sql an unevaluable predicate (CASE…END predicates
        // included: their END token lands here — the chain member's
        // exact gate)
        if (predControlRe.findFirstIn(
            msk.substring(i, verb.start)).isDefined) return None
        i = verb.start
        Some(ScalarPred(predTxt))
      }
      existsHeadRe.findFirstMatchIn(msk.substring(i)) match {
        case Some(h) =>
          var depth = 1
          var j = i + h.end
          while (j < msk.length && depth > 0) {
            val c = msk.charAt(j)
            if (c == '(') depth += 1 else if (c == ')') depth -= 1
            j += 1
          }
          if (depth != 0) None
          else {
            // peek past the close paren: a branch opener means the
            // predicate was EXACTLY the EXISTS probe (the LIMIT-1
            // path); anything else (AND/OR connectives) makes the
            // EXISTS one conjunct of a compound SCALAR predicate
            var k = j
            while (k < msk.length && msk.charAt(k).isWhitespace) k += 1
            val branchFollows = openerRe.findPrefixMatchOf(
              msk.subSequence(k, msk.length)).isDefined
            if (!branchFollows) scalarPred()
            else {
              val probe = text.substring(i + h.end, j - 1).trim
              if (selectHeadRe.findFirstIn(
                  UpdateSqlCompiler.masked(probe)).isEmpty) None
              else {
                val neg = h.group(1) != null
                i = j
                Some(ExistsPred(neg, probe))
              }
            }
          }
        case None => scalarPred()
      }
    }

    // one branch statement: ownable head, no nested control flow, no
    // fused-refresh text (a TRUNCATE/DELETE head with a depth-0 INSERT
    // token is two statements fused by a missing `;` — the order-blind
    // rewriter downstream would compile both under the guard where
    // T-SQL guards only the first: decline, never a silent divergence)
    def stmtOk(s: String): Boolean = {
      val m = UpdateSqlCompiler.masked(s)
      stmtHeadRe.findFirstIn(m).isDefined &&
        stmtControlRe.findFirstIn(m).isEmpty && !fusedDml(m)
    }

    def parseBranch(): Option[Branch] = {
      ws()
      if (kwAt("return")) { i += "return".length; Some(ReturnExit) }
      else if (kwAt("raiserror")) {
        // RAISERROR('msg', severity, state) — paren-matched args; the
        // leg must be exactly the call (trailing content beyond the
        // close paren falls to the end-of-branch checks)
        val open = msk.indexOf('(', i + "raiserror".length)
        if (open < 0 || msk.substring(i + "raiserror".length, open)
            .exists(!_.isWhitespace)) None
        else {
          var depth = 1
          var j = open + 1
          while (j < msk.length && depth > 0) {
            val c = msk.charAt(j)
            if (c == '(') depth += 1 else if (c == ')') depth -= 1
            j += 1
          }
          if (depth != 0) None
          else {
            val args = text.substring(open + 1, j - 1).trim
            if (args.isEmpty) None else { i = j; Some(Raise(args)) }
          }
        }
      }
      else if (kwAt("begin") &&
          tranDressRe.findFirstIn(msk.substring(i + 5)).isEmpty) {
        // match this block's END by token walk (BEGIN/CASE push, END
        // pops) — CASE expressions inside the body pair away
        val bodyStart = i + 5
        var depth = 1
        var endTok: Option[scala.util.matching.Regex.Match] = None
        blockTokRe.findAllMatchIn(msk).filter(_.start >= bodyStart)
          .takeWhile(_ => depth > 0).foreach { m =>
            m.group(1).toLowerCase match {
              case "begin" =>
                if (tranDressRe.findFirstIn(msk.substring(m.end)).isEmpty)
                  depth += 1
              case "case" => depth += 1
              case "end" =>
                depth -= 1
                if (depth == 0) endTok = Some(m)
            }
          }
        endTok.flatMap { e =>
          val body = text.substring(bodyStart, e.start)
          val stmts = SqlText.splitStatements(body)
          if (stmts.nonEmpty && stmts.forall(stmtOk)) {
            i = e.end
            Some(Stmts(stmts, hadSemi =
              msk.substring(bodyStart, e.start).contains(';')))
          } else None
        }
      } else {
        // single unwrapped statement: extends to the next depth-0 ELSE
        // token or the end of the text (a CASE expression's depth-0
        // ELSE mis-cuts here and the ladder then fails to parse — the
        // chain members' exact behavior: decline, wrap in BEGIN…END)
        val cut = elseTokRe.findAllMatchIn(msk)
          .find(m => m.start >= i &&
            WindowSqlLowering.depthAt(msk, m.start) == 0)
          .map(_.start).getOrElse(msk.length)
        val stmt = text.substring(i, cut).trim.replaceAll("[;\\s]+$", "")
        if (stmt.isEmpty || !stmtOk(stmt)) None
        else { i = cut; Some(Stmts(List(stmt))) }
      }
    }

    if (!eat("if")) return None
    val legs = ListBuffer.empty[(Pred, Branch)]
    var otherwise: Option[Branch] = None
    var done = false
    while (!done) {
      val pred = parsePred().getOrElse(return None)
      val br = parseBranch().getOrElse(return None)
      legs += ((pred, br))
      if (atEnd) done = true
      else if (eat("else")) {
        ws()
        if (kwAt("if")) i += 2 // next leg of the cascade
        else {
          otherwise = Some(parseBranch().getOrElse(return None))
          if (!atEnd) return None
          done = true
        }
      } else return None
    }
    Some(Ladder(legs.toList, otherwise))
  }

  /** May this statement be EMITTED inside an unrolled WHILE body
    * ([[WhileLoopSqlCompiler]])? It must parse as a ladder with no
    * RETURN leg (a batch exit from inside a loop is not the unroller's
    * to decide) and no assignment branches (a conditional `SET @v = …`
    * is invisible to the unroller's driver-side variable model — the
    * loop would diverge silently from T-SQL); RAISERROR legs are fine
    * (a fired guard aborts the task at its emitted position). */
  private[graft] def loopBodySafe(stmt: String): Boolean =
    parse(SqlText.stripComments(stmt)).exists { l =>
      !(l.legs.map(_._2) ++ l.otherwise).exists {
        case ReturnExit => true
        case Stmts(ss, _) => ss.exists(s =>
          assignHeadRe.findFirstIn(UpdateSqlCompiler.masked(s)).isDefined)
        case _ => false
      }
    }

  /** Parse-only classification twin: does this STATEMENT text parse as
    * a ladder the dispatcher owns beyond the r17 chain members? */
  private[graft] def ownsBeyondChain(stmt: String): Boolean =
    parse(SqlText.stripComments(stmt)).exists(l => !l.chainEquivalent)

  /** Whole-TASK twin for the migration ledger: comments stripped, GO/;
    * split, shredded blocks regrouped — True when the task is exactly
    * one ladder statement owned beyond the chain AND free of `@tokens`
    * / `@@reads`: a one-statement task has no DECLARE to bind them and
    * no countable predecessor, so the executor would decline at run —
    * the ledger must not overclaim conversion for that class
    * (IfScalarSqlCompiler's top-level gate, mirrored). */
  private[graft] def ownsWholeText(sqlRaw: String): Boolean = {
    val text = SqlText.stripComments(sqlRaw)
    val stmts = regroup(
      SqlText.splitBatches(text).flatMap(SqlText.splitStatements))
    stmts.length == 1 &&
      // no scalar @tokens anywhere (unbindable without a DECLARE) —
      // but @@ROWCOUNT is allowed INSIDE branches, where it composes
      // off an earlier branch statement's count at run time
      "(?<!@)@\\w+".r.findFirstIn(
        UpdateSqlCompiler.masked(stmts.head)).isEmpty &&
      parse(SqlText.stripComments(stmts.head)).exists { l =>
        !l.chainEquivalent && l.legs.forall { case (p, _) =>
          val predTxt = p match {
            case ExistsPred(_, probe) => probe
            case ScalarPred(e) => e
          }
          // a PREDICATE @@read has no countable predecessor at
          // whole-task level — the executor declines it
          !UpdateSqlCompiler.masked(predTxt).contains("@@")
        }
      }
  }
}
