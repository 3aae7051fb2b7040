package graft.patterns

/** Comment stripping that survives XML attribute-value normalization.
  *
  * A dtsx stores `SqlStatementSource` as an XML ATTRIBUTE; per the XML
  * spec a compliant parser replaces literal newlines in attribute values
  * with spaces (only `&#xA;` references survive). A statement written as
  * `-- description\nSELECT …` therefore arrives as ONE line whose leading
  * `--` would swallow the entire statement under line-based stripping —
  * silently classifying every commented task as unconvertible.
  *
  * With real newlines present, `--` comments strip to end-of-line as
  * usual. In the normalized (newline-free) case the end of a comment is
  * unrecoverable in general, so a documented heuristic applies: the
  * comment ends at the first UPPERCASE SQL statement keyword after the
  * `--` (comment prose is typically mixed-case, statements start with a
  * capitalized keyword). A lowercase-keyword statement behind a
  * normalized leading comment stays conservative: it strips to nothing
  * and classifies as manual-review rather than executing half a comment.
  */
object SqlText {

  private val stmtKeyword =
    ("\\b(DECLARE|SELECT|INSERT|UPDATE|DELETE|MERGE|TRUNCATE|IF|WITH|" +
      "CREATE|ALTER|DROP|EXEC|EXECUTE|BEGIN|SET|RAISERROR|GRANT|USE)\\b").r

  def stripComments(sql: String): String =
    if (sql.contains('\n'))
      sql.linesIterator.map(_.replaceAll("--.*$", "")).mkString("\n").trim
    else {
      val out = new StringBuilder
      var rest = sql
      while (rest.nonEmpty) {
        val i = rest.indexOf("--")
        if (i < 0) { out ++= rest; rest = "" }
        else {
          out ++= rest.substring(0, i)
          val after = rest.substring(i + 2)
          stmtKeyword.findFirstMatchIn(after) match {
            case Some(m) => rest = after.substring(m.start)
            case None => rest = ""
          }
        }
      }
      out.result().trim
    }
}
