package graft.patterns

/** T-SQL `PIVOT` → Spark `PIVOT` surface translation. The relational
  * operation is identical in both dialects; only the IN-list spelling
  * differs — T-SQL names each pivoted value as a (bracketed)
  * IDENTIFIER that doubles as the output column name
  * (`PIVOT (SUM(v) FOR c IN ([O], [F])) p`), Spark takes typed value
  * literals with aliases (`PIVOT (SUM(v) FOR c IN ('O' AS O, 'F' AS
  * F))`) and no result alias. The translation rewrites each `[X]` /
  * bare `X` item to `'X' AS X`, strips the T-SQL result alias, and
  * debrackets `[X]` references to the pivoted columns in the rest of
  * the statement.
  *
  * Owned only when: exactly ONE PIVOT (or one UNPIVOT — see
  * [[translateUnpivot]]; a statement carrying both declines), and
  * every IN item is a plain identifier (`[A-Za-z_]\w*`, bracketed or
  * bare) — the string-valued pivot everywhere in estate reporting.
  * Numeric or exotic value names (e.g. `[2024-01]`) compare by a
  * typed value the text alone does not determine → Left, manual
  * review. */
object PivotSql {

  private val pivotHeadRe = "(?is)\\bpivot\\s*\\(".r
  private val unpivotRe = "(?i)\\bunpivot\\b".r
  private val innerRe =
    "(?is)^\\s*(\\w+\\s*\\(.+\\))\\s+for\\s+([\\w.\\[\\]]+)\\s+in\\s*\\((.+)\\)\\s*$".r
  private val identItemRe = "(?s)^(?:\\[([A-Za-z_]\\w*)\\]|([A-Za-z_]\\w*))$".r
  private val stopWords = Set("where", "group", "order", "having", "union",
    "limit", "on", "join", "inner", "left", "right", "full", "cross",
    "pivot", "unpivot", "for", "except", "intersect", "option", "select",
    "from", "top", "offset", "fetch")

  /** None = no PIVOT (text untouched); Right = translated; Left = a
    * PIVOT/UNPIVOT this translation does not own. */
  private val unpivotHeadRe = "(?is)\\bunpivot\\s*\\(".r
  private val unpivotInnerRe =
    "(?is)^\\s*(\\[?\\w+\\]?)\\s+for\\s+(\\[?\\w+\\]?)\\s+in\\s*\\((.+)\\)\\s*$".r

  /** T-SQL `UNPIVOT (v FOR s IN ([c1], [c2])) u` → Spark's
    * `UNPIVOT ((v) FOR s IN ((c1), (c2)))` — the same operator with
    * the same NULL-dropping default (T-SQL always drops NULL measure
    * values; Spark's UNPIVOT excludes them unless INCLUDE NULLS); the
    * name column takes the column text as written in both dialects. */
  private def translateUnpivot(sqlRaw: String,
      msk0: String): Either[Unit, String] = {
    val heads = unpivotHeadRe.findAllMatchIn(msk0).toList
    if (heads.length != 1) return Left(())
    val h = heads.head
    var depth = 1
    var i = h.end
    while (depth > 0 && i < msk0.length) {
      msk0.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ => ()
      }
      i += 1
    }
    if (depth != 0) return Left(())
    val argsRaw = sqlRaw.substring(h.end, i - 1)
    val m = unpivotInnerRe.findFirstMatchIn(
      msk0.substring(h.end, i - 1)).getOrElse(return Left(()))
    def g(k: Int): String =
      argsRaw.substring(m.start(k), m.end(k)).trim.replaceAll("[\\[\\]]", "")
    val (vcol, ncol) = (g(1), g(2))
    val items = MergeSqlCompiler.splitTop(g(3)).map(_.trim)
    val cols = items.map(it => identItemRe.findFirstMatchIn(it)
      .map(im => Option(im.group(1)).getOrElse(im.group(2))))
    if (cols.isEmpty || cols.exists(_.isEmpty)) return Left(())
    val inList = cols.flatten.map(c => s"($c)").mkString(", ")
    val after0 = sqlRaw.substring(i)
    val afterMsk = msk0.substring(i)
    val aliasRe = "(?is)^\\s*(?:as\\s+)?([A-Za-z_]\\w*)".r
    val after = aliasRe.findFirstMatchIn(afterMsk) match {
      case Some(am) if !stopWords(am.group(1).toLowerCase) =>
        after0.substring(am.end)
      case _ => after0
    }
    var out = sqlRaw.substring(0, h.start) +
      s"UNPIVOT (($vcol) FOR $ncol IN ($inList))" + after
    // debracket [X] references to the unpivoted names elsewhere
    val names = cols.flatten ++ Seq(vcol, ncol)
    out = MergeSqlCompiler.segments(out).map {
      case (seg, true) => seg
      case (seg, false) =>
        names.foldLeft(seg)((s, v) => s.replace(s"[$v]", v))
    }.mkString
    Right(out)
  }

  def translate(sqlRaw: String): Option[Either[Unit, String]] = {
    val msk0 = UpdateSqlCompiler.masked(sqlRaw)
    val hasUnpivot = unpivotRe.findFirstIn(msk0).isDefined
    val heads = pivotHeadRe.findAllMatchIn(msk0).toList
    if (hasUnpivot)
      // one UNPIVOT, no PIVOT beside it — the r14-owned shape
      return Some(
        if (heads.nonEmpty) Left(()) else translateUnpivot(sqlRaw, msk0))
    if (heads.isEmpty) return None
    if (heads.length > 1) return Some(Left(()))
    val h = heads.head
    // balanced span of the PIVOT argument list
    var depth = 1
    var i = h.end
    while (depth > 0 && i < msk0.length) {
      msk0.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ => ()
      }
      i += 1
    }
    if (depth != 0) return Some(Left(()))
    val argsRaw = sqlRaw.substring(h.end, i - 1)
    val argsMsk = msk0.substring(h.end, i - 1)
    val m = innerRe.findFirstMatchIn(argsMsk).getOrElse(return Some(Left(())))
    def g(k: Int): String = argsRaw.substring(m.start(k), m.end(k)).trim
    val agg = g(1)
    val pcol = g(2).replaceAll("[\\[\\]]", "")
    val items = MergeSqlCompiler.splitTop(g(3)).map(_.trim)
    val names = items.map(it => identItemRe.findFirstMatchIn(it)
      .map(im => Option(im.group(1)).getOrElse(im.group(2))))
    if (names.isEmpty || names.exists(_.isEmpty)) return Some(Left(()))
    val vals = names.flatten
    val inList = vals.map(v => s"'$v' AS $v").mkString(", ")
    // the T-SQL result alias after the PIVOT close paren — strip it
    val after0 = sqlRaw.substring(i)
    val afterMsk = msk0.substring(i)
    val aliasRe = "(?is)^\\s*(?:as\\s+)?([A-Za-z_]\\w*)".r
    val after = aliasRe.findFirstMatchIn(afterMsk) match {
      case Some(am) if !stopWords(am.group(1).toLowerCase) =>
        after0.substring(am.end)
      case _ => after0
    }
    var out = sqlRaw.substring(0, h.start) +
      s"PIVOT ($agg FOR $pcol IN ($inList))" + after
    // debracket [X] references to the pivoted columns elsewhere
    val outMskSegs = MergeSqlCompiler.segments(out)
    out = outMskSegs.map {
      case (seg, true) => seg
      case (seg, false) =>
        vals.foldLeft(seg)((s, v) => s.replace(s"[$v]", v))
    }.mkString
    Some(Right(out))
  }
}
