package graft.patterns

import graft.ir.Ir.ExecuteSqlTask
import graft.pipeline.PackageRunner.SqlOutcome
import org.apache.spark.sql.{DataFrame, SparkSession}

/** `EXEC sp_executesql N'…'` / `EXEC('…')` with a LITERAL statement —
  * the dynamic-SQL wrapper real estates put around perfectly static
  * SQL out of habit (and the reference's analyzer sends every EXEC to
  * manual review). When the wrapped text is one string literal and
  * nothing else, the dynamic SQL is STATICALLY KNOWN: unwrap it
  * (undoing the `''` escapes) and compile it through the caller's
  * statement chain exactly as if it were written inline.
  *
  * Declined to manual review: `@param` lists (truly dynamic),
  * concatenated fragments (`EXEC('SELECT ' + @col)`), non-literal
  * arguments, and any other EXEC (stored procedures have bodies this
  * engine cannot see). One recursion level: an unwrapped text that is
  * itself an EXEC declines — dynamic SQL generating dynamic SQL is
  * manual review, not a tower. */
object ExecLiteralSqlCompiler {

  // EXEC sp_executesql N'...'  |  EXEC ('...')  — the tail after the
  // literal must be empty (a second argument = a parameter list)
  private val spExecRe =
    "(?is)^\\s*exec(?:ute)?\\s+sp_executesql\\s+(N?'.*')\\s*;?\\s*$".r
  private val execParenRe =
    "(?is)^\\s*exec(?:ute)?\\s*\\(\\s*(N?'.*')\\s*\\)\\s*;?\\s*$".r

  /** The argument text must be EXACTLY one string literal (masked scan:
    * one quoted span, nothing but whitespace around it) — a comma or a
    * `+` outside the literal means params/concatenation. */
  private def singleLiteral(arg: String): Option[String] = {
    val body = arg.replaceFirst("(?is)^\\s*N", "")
    val msk = UpdateSqlCompiler.masked(body)
    val t = msk.trim
    if (!(t.startsWith("'") && t.endsWith("'"))) return None
    // everything between the outer quotes must still be INSIDE the
    // literal on the masked twin ('' escapes mask to xx, so any
    // unmasked quote or operator marks a second token)
    val innerMsk = t.substring(1, t.length - 1)
    if (innerMsk.exists(c => c == '\'' || c == '+' || c == ',')) None
    else {
      val raw = body.trim
      Some(raw.substring(1, raw.length - 1).replace("''", "'"))
    }
  }

  /** Parse-only classification twin (ledger / dry run). */
  private[graft] def unwrap(sqlRaw: String): Option[String] = {
    val sql = SqlText.stripComments(sqlRaw)
    val msk = UpdateSqlCompiler.masked(sql)
    val m = spExecRe.findFirstMatchIn(msk)
      .orElse(execParenRe.findFirstMatchIn(msk))
      .getOrElse(return None)
    singleLiteral(sql.substring(m.start(1), m.end(1))).filter(inner =>
      // no EXEC towers
      "(?is)^\\s*exec(?:ute)?\\b".r
        .findFirstIn(UpdateSqlCompiler.masked(inner)).isEmpty)
  }

  def rewrite(spark: SparkSession, task: ExecuteSqlTask,
      resolve: String => DataFrame,
      chain: ExecuteSqlTask => Option[SqlOutcome]): Option[SqlOutcome] =
    unwrap(task.sqlStatement)
      .flatMap(inner => chain(task.copy(sqlStatement = inner)))
}
