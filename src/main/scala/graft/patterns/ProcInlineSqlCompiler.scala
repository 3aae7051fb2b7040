package graft.patterns

/** Script-local stored procedures — `CREATE PROCEDURE` in its own GO
  * batch, `EXEC <name> <literal args>` calls, `DROP PROCEDURE` — the
  * helper-proc idiom migration and maintenance scripts use (create a
  * parameterized helper, call it N times, drop it). The reference
  * routes every EXEC to manual review because a stored procedure's
  * body normally lives in the database, invisible to the task text;
  * HERE the body is in the same script, so each call is statically
  * expandable: the EXEC inlines to the body statements with every
  * parameter bound as the engine's `CAST(<literal> AS <type>)`
  * typed-literal form (the same convention as sp_executesql binding,
  * [[ExecLiteralSqlCompiler]]), and the expanded statements run
  * through the script overlay like any hand-written batch.
  *
  * T-SQL contracts held: `CREATE PROCEDURE` must lead its batch and
  * swallows the REST of the batch into the body — so the body is
  * "everything after AS to the batch's end", exactly the GO-delimited
  * reading; an EXEC before the CREATE batch or after the DROP is error
  * 2812 (could not find stored procedure) → the script declines;
  * inside a script, a declared `@var` argument is a literal by the
  * time this pre-pass sees it only at TOP level — this compiler runs
  * before variable binding, so @var arguments decline (the owned
  * spelling is literal args, the overwhelmingly common case for
  * helper procs).
  *
  * Declined to manual review: a second CREATE PROCEDURE (one helper
  * per script), OUTPUT/default/readonly parameters, RETURN or any
  * control flow in the body (IF/WHILE/BEGIN-END beyond the optional
  * outer wrapper, TRY/CATCH, transactions, cursors, nested EXEC),
  * body-local DECLAREs (their names would leak into the outer script's
  * scope on inlining), body @tokens that are not parameters, non-
  * literal arguments, arity/name mismatches, mixed positional+named
  * args, EXEC of a procedure this script never created (its body is
  * genuinely invisible), and DROP of an unknown procedure. */
object ProcInlineSqlCompiler {

  private val createProcHeadRe =
    "(?is)^\\s*create\\s+proc(?:edure)?\\s+([\\w.\\[\\]]+)\\s*(.*?)\\bas\\b(.+)$".r
  private val anyCreateProcRe = "(?i)\\bcreate\\s+proc(?:edure)?\\b".r
  private val execStmtRe =
    "(?is)^\\s*exec(?:ute)?\\s+([A-Za-z_\\[][\\w.\\[\\]]*)(.*?)\\s*;?\\s*$".r
  private val dropProcRe =
    ("(?is)^\\s*drop\\s+proc(?:edure)?\\s+(?:if\\s+exists\\s+)?" +
      "([\\w.\\[\\]]+)\\s*;?\\s*$").r
  private val namedArgRe = "(?is)^@(\\w+)\\s*=\\s*(.+)$".r
  private val scalarVarRe = "@(\\w+)".r
  private val bodyBanRe =
    ("(?i)\\b(begin|end|if|else|while|goto|return|declare|cursor|fetch|" +
      "open|close|deallocate|exec|execute|merge|tran|transaction|" +
      "rollback|commit|try|catch|output|out|readonly|default|" +
      "create|drop|alter|truncate|grant|revoke|use|waitfor)\\b").r

  private def bare(name: String): String =
    name.split('.').last.replaceAll("[\\[\\]]", "").toLowerCase

  /** Parse the CREATE batch → (bare name, ordered params, body text). */
  private def parseCreate(batch: String)
      : Option[(String, List[(String, String)], String)] = {
    val msk = UpdateSqlCompiler.masked(batch)
    val m = createProcHeadRe.findFirstMatchIn(msk).getOrElse(return None)
    def g(i: Int): String = batch.substring(m.start(i), m.end(i))
    val name = bare(g(1))
    if (name == "sp_executesql") return None
    // parameter list: optional, optionally parenthesized, comma items.
    // Strip only a MATCHING outer pair — a bare list ending in a type
    // length like `@t VARCHAR(1)` must keep its closing paren.
    val paramsTxt = {
      val p0 = g(2).trim
      val outerPair = p0.startsWith("(") && p0.endsWith(")") && {
        var d = 0
        var inner = true
        for (i <- 0 until p0.length - 1) {
          if (p0(i) == '(') d += 1 else if (p0(i) == ')') d -= 1
          if (d == 0) inner = false
        }
        inner
      }
      (if (outerPair) p0.substring(1, p0.length - 1) else p0).trim
    }
    val params =
      if (paramsTxt.isEmpty) Nil
      else {
        val items = MergeSqlCompiler.splitTop(paramsTxt).map(i =>
          ExecLiteralSqlCompiler.paramDeclRe.findFirstMatchIn(i.trim)
            .flatMap(pm => ScriptedSqlExecutor.sparkDdlType(pm.group(2))
              .map(tpe => pm.group(1).toLowerCase -> tpe)))
        if (items.exists(_.isEmpty)) return None
        items.flatten
      }
    if (params.map(_._1).distinct.size != params.size) return None
    // body: everything after AS; one optional outer BEGIN…END wrapper
    var body = g(3).trim
    val bMsk0 = UpdateSqlCompiler.masked(body)
    if ("(?is)^begin\\b".r.findFirstIn(bMsk0).isDefined &&
        "(?is)\\bend\\s*;?\\s*$".r.findFirstIn(bMsk0).isDefined)
      body = body.replaceFirst("(?is)^begin\\b", "")
        .replaceFirst("(?is)\\bend\\s*;?\\s*$", "").trim
    if (body.isEmpty) return None
    val bMsk = UpdateSqlCompiler.masked(body)
    if (bodyBanRe.findFirstIn(bMsk).isDefined) return None
    // every body @token must be a parameter
    val pset = params.map(_._1).toSet
    if (!scalarVarRe.findAllMatchIn(bMsk).map(_.group(1).toLowerCase)
        .forall(pset)) return None
    Some((name, params, body))
  }

  /** Bind one EXEC's argument text against the params → the expanded
    * body statements, or None. */
  private def expand(argsTxt: String, params: List[(String, String)],
      body: String): Option[List[String]] = {
    val t = argsTxt.trim
    val argsRaw = if (t.isEmpty) Nil else MergeSqlCompiler.splitTop(t)
    if (argsRaw.size != params.size) return None
    val named = argsRaw.map(a =>
      namedArgRe.findFirstMatchIn(
        UpdateSqlCompiler.masked(a).trim).isDefined)
    if (named.distinct.size > 1) return None // mixed positional+named
    val pairs: List[(String, String)] =
      if (named.headOption.contains(true)) {
        val bound = argsRaw.map { a =>
          val am = UpdateSqlCompiler.masked(a).trim
          namedArgRe.findFirstMatchIn(am).flatMap { nm =>
            val lit = a.trim.substring(nm.start(2)).trim
            if (ExecLiteralSqlCompiler.litArgMskRe
                .findFirstIn(am.substring(nm.start(2)).trim).isEmpty) None
            else Some(nm.group(1).toLowerCase -> lit)
          }
        }
        if (bound.exists(_.isEmpty)) return None
        val byName = bound.flatten.toMap
        if (byName.size != bound.size ||
          byName.keySet != params.map(_._1).toSet) return None
        params.map { case (n, _) => n -> byName(n) }
      } else {
        if (argsRaw.exists(a => ExecLiteralSqlCompiler.litArgMskRe
            .findFirstIn(UpdateSqlCompiler.masked(a).trim).isEmpty))
          return None
        params.map(_._1).zip(argsRaw.map(_.trim))
      }
    val byName = pairs.zip(params).map { case ((n, lit), (_, tpe)) =>
      val spelled =
        if (lit.matches("(?is)^N?'.*'$")) {
          val b = lit.replaceFirst("(?is)^N", "")
          SqlText.sqlLitOrDecline(
            b.substring(1, b.length - 1).replace("''", "'"))
        } else lit
      n -> s"CAST($spelled AS $tpe)"
    }.toMap
    val replaced = MergeSqlCompiler.segments(body).map {
      case (seg, true) => seg
      case (seg, false) => scalarVarRe.replaceAllIn(seg, rm =>
        byName.get(rm.group(1).toLowerCase) match {
          case Some(b) => java.util.regex.Matcher.quoteReplacement(b)
          case None => rm.matched
        })
    }.mkString
    Some(SqlText.splitStatements(replaced))
  }

  /** Whole-text recognizer: a script carrying its own helper procedure
    * → the statement list with every call inlined, or None. */
  private[graft] def rewriteToScript(textRaw: String): Option[List[String]] = {
    val text = SqlText.stripComments(textRaw)
    if (anyCreateProcRe
        .findFirstIn(UpdateSqlCompiler.masked(text)).isEmpty) return None
    var proc: Option[(String, List[(String, String)], String)] = None
    var dropped = false
    val out = scala.collection.mutable.ListBuffer.empty[String]
    for (batch <- SqlText.splitBatches(text)) {
      val batchMsk = UpdateSqlCompiler.masked(batch)
      if (createProcHeadRe.findFirstMatchIn(batchMsk).isDefined) {
        // one helper per script; CREATE PROC must LEAD its batch —
        // the head regex anchors at ^, so a mid-batch CREATE PROC
        // falls to the statement loop below and declines there
        if (proc.isDefined) return None
        proc = parseCreate(batch) match {
          case some @ Some(_) => some
          case None => return None // half a proc is no proc
        }
      } else for (stmt <- SqlText.splitStatements(batch)) {
        val sMsk = UpdateSqlCompiler.masked(stmt)
        if (anyCreateProcRe.findFirstIn(sMsk).isDefined) return None
        val execM = execStmtRe.findFirstMatchIn(sMsk)
          .filter(m => proc.exists(_._1 ==
            bare(stmt.substring(m.start(1), m.end(1)))))
        val dropM = dropProcRe.findFirstMatchIn(sMsk)
        if (dropM.isDefined) {
          val nm = bare(stmt.substring(dropM.get.start(1), dropM.get.end(1)))
          // dropping a procedure this script never created is state
          // this replay cannot see
          if (!proc.exists(_._1 == nm) || dropped) return None
          dropped = true
        } else execM match {
          case Some(m) =>
            if (dropped) return None // EXEC after DROP: T-SQL 2812
            val (_, params, body) = proc.get
            expand(stmt.substring(m.start(2), m.end(2)), params, body)
              match {
                case Some(ss) => out ++= ss
                case None => return None
              }
          case None =>
            // an EXEC of a name that is NOT the script's proc and NOT
            // an owned dynamic-SQL form is a procedure whose body this
            // replay cannot see — decline the whole script
            val otherExec = execStmtRe.findFirstMatchIn(sMsk).exists { m =>
              val nm = bare(stmt.substring(m.start(1), m.end(1)))
              nm != "sp_executesql" && !proc.exists(_._1 == nm)
            }
            if (otherExec) return None
            val s2 = ScriptedSqlExecutor.beginTranPrefixRe
              .replaceFirstIn(stmt, "")
            if (ScriptedSqlExecutor.txnNoopRe
                .findFirstMatchIn(s2).isEmpty) out += s2
        }
      }
    }
    if (proc.isEmpty) None else Some(out.toList)
  }
}
