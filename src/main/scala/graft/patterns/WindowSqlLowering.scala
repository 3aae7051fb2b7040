package graft.patterns

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}

/** Scale-safe lowering for rank windows in frontend-EXECUTED SQL.
  *
  * The dtsx frontend runs user-authored analytic statements (the q83
  * `ROW_NUMBER() OVER (PARTITION BY segment ...)` reporting idiom)
  * through `spark.sql`, where a raw window serializes each partition
  * key into one task — fine for a 5-segment dimension, a single-task
  * sort of ~N/5 rows the moment a user points the same package at a
  * fact table. When the executed SELECT carries exactly one top-level
  * `ROW_NUMBER() OVER (...) AS alias` item, this rewrites it through
  * [[graft.ops.RankLowering]] (order-aligned range buckets + two-phase
  * offsets — bounded tasks at ANY partition-key cardinality).
  *
  * Anything off-shape — several windows, a window inside a subquery or
  * expression, no alias, OVER references that do not resolve against
  * the window-free remainder of the select — returns None and the
  * caller executes the original SQL unchanged: the lowering must never
  * change WHAT is computed, only how it is scheduled.
  */
object WindowSqlLowering {

  private val rowNumberOpenRe = "(?i)row_number\\s*\\(\\s*\\)\\s+over\\s*\\(".r
  private val asAliasRe = "(?is)^\\s+as\\s+([A-Za-z_][A-Za-z0-9_]*)".r
  private val overBodyRe =
    "(?is)^\\s*(?:partition\\s+by\\s+(.+?))?\\s*order\\s+by\\s+(.+)$".r
  private val dirSuffixRe = "(?is)\\s+(asc|desc)\\s*$".r

  /** Depth of nesting parens at `pos`, counting only parens outside
    * single-quoted literals; 0 = the top-level select list. */
  private def depthAt(s: String, pos: Int): Int = {
    var depth = 0
    var inQ = false
    var i = 0
    while (i < pos) {
      val c = s.charAt(i)
      if (inQ) { if (c == '\'') inQ = false }
      else c match {
        case '\'' => inQ = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
      }
      i += 1
    }
    depth
  }

  /** Quote-aware scan from just past an opening paren to its matching
    * close; (content, indexAfterClose). */
  private def balanced(s: String, from: Int): Option[(String, Int)] = {
    var depth = 1
    var inQ = false
    var i = from
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQ) { if (c == '\'') inQ = false }
      else c match {
        case '\'' => inQ = true
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return Some((s.substring(from, i), i + 1))
        case _ =>
      }
      i += 1
    }
    None
  }

  /** Top-level comma split (commas inside parens/literals don't split). */
  private def splitTop(s: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var depth = 0
    var inQ = false
    val cur = new StringBuilder
    s.foreach { c =>
      if (inQ) { cur.append(c): Unit; if (c == '\'') inQ = false }
      else c match {
        case '\'' => inQ = true; cur.append(c): Unit
        case '(' => depth += 1; cur.append(c): Unit
        case ')' => depth -= 1; cur.append(c): Unit
        case ',' if depth == 0 => out += cur.toString.trim; cur.clear()
        case other => cur.append(other): Unit
      }
    }
    if (cur.nonEmpty) out += cur.toString.trim
    out.toList.filter(_.nonEmpty)
  }

  /** Statement shapes where rank-after-removal diverges from the raw
    * evaluation order: DISTINCT dedups AFTER the window in SQL but would
    * run BEFORE a post-hoc rank; LIMIT bounds the ranked output, not the
    * rank's input. Both decline (fallback raw SQL keeps semantics). */
  private val distinctRe = "(?is)^\\s*select\\s+distinct\\b".r
  private val limitRe = "(?i)\\blimit\\b".r

  def lower(spark: SparkSession, select: String): Option[DataFrame] = {
    if (distinctRe.findFirstIn(select).isDefined ||
      limitRe.findAllMatchIn(select).exists(m => depthAt(select, m.start) == 0))
      return None
    val matches = rowNumberOpenRe.findAllMatchIn(select).toList
    matches match {
      case m :: Nil if depthAt(select, m.start) == 0 =>
        for {
          (overBody, afterOver) <- balanced(select, m.end)
          am <- asAliasRe.findPrefixMatchOf(select.substring(afterOver))
          alias = am.group(1)
          itemEnd = afterOver + am.end
          ob <- overBodyRe.findFirstMatchIn(overBody)
          // the window expr must be a WHOLE select-list item: preceded by
          // a top-level comma (or the SELECT keyword), followed by one
          // (or the FROM clause)
          before = select.substring(0, m.start)
          after = select.substring(itemEnd)
          if before.trim.toLowerCase.endsWith(",") ||
            "(?is)^\\s*select\\s*$".r.findFirstIn(before).isDefined
          if "(?is)^\\s*,".r.findFirstIn(after).isDefined ||
            "(?is)^\\s*from\\b".r.findFirstIn(after).isDefined
          df <- lowerParsed(spark, before, after, alias,
            Option(ob.group(1)), ob.group(2))
        } yield df
      case _ => None
    }
  }

  private def lowerParsed(spark: SparkSession, before: String,
      after: String, alias: String, partList: Option[String],
      orderList: String): Option[DataFrame] = {
    // base select = the statement with the window item (and its comma)
    // removed; the item's index in the list = where the rank column goes
    val (baseText, itemIdx) =
      if (before.trim.toLowerCase.endsWith(",")) {
        val b = before.substring(0, before.lastIndexOf(','))
        (b + after, splitTopCountItems(b))
      } else {
        // item is first: drop the comma that FOLLOWS it
        val a = after.replaceFirst("^\\s*,", " ")
        (before + a, 0)
      }
    val partExprs = partList.toList.flatMap(splitTop).map(_.trim)
    val orderItems = splitTop(orderList).map(_.trim)
    scala.util.Try {
      val base = spark.sql(baseText)
      if (base.columns.map(_.toLowerCase).contains(alias.toLowerCase))
        throw new IllegalArgumentException(s"alias $alias collides")
      val pCols = partExprs.map(expr)
      val oCols = orderItems.map { it =>
        dirSuffixRe.findFirstMatchIn(it) match {
          case Some(dm) =>
            val e = expr(it.substring(0, dm.start))
            if (dm.group(1).equalsIgnoreCase("desc")) e.desc else e.asc
          case None => expr(it).asc
        }
      }
      // resolution check: every OVER reference must bind against the
      // window-free output — analysis failure falls back to raw SQL
      base.select(pCols ++ orderItems.map { it =>
        dirSuffixRe.findFirstMatchIn(it) match {
          case Some(dm) => expr(it.substring(0, dm.start))
          case None => expr(it)
        }
      }: _*).queryExecution.analyzed
      val ranked =
        graft.ops.RankLowering.rowNumber(base, pCols, oCols, alias)
      val ordered = {
        val bs = base.columns.toSeq
        (bs.take(itemIdx) :+ alias) ++ bs.drop(itemIdx)
      }
      ranked.select(ordered.map(col): _*)
    }.toOption
  }

  /** How many select-list items precede the removed window item = count
    * of top-level items in `SELECT item, item, …,` up to the trailing
    * comma the caller stripped. */
  private def splitTopCountItems(beforeWithoutComma: String): Int = {
    val m = "(?is)^\\s*select\\s+".r.findFirstMatchIn(beforeWithoutComma)
    m.map(mm => splitTop(beforeWithoutComma.substring(mm.end)).length)
      .getOrElse(0)
  }
}
