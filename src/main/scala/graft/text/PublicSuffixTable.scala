package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Full-scale public-suffix resolution: the publicsuffix.org list as a
  * BROADCAST RULES TABLE instead of literal `InSet` probes.
  *
  * [[PublicSuffix.registeredDomainOfHost]] compiles its curated
  * snapshot into codegen'd hash-set membership probes — the right shape
  * for a few hundred hot rules, but a Catalyst expression tree is the
  * wrong carrier for the full ~9k-rule list (and for deploy-time list
  * refreshes, which must not require a recompile). This object is the
  * documented scale path: parse the list file once, broadcast the tiny
  * rules table, and resolve the registrable boundary with per-label-
  * count broadcast hash joins — zero shuffles of the corpus side, one
  * candidate-tail extraction identical to the snapshot path's.
  *
  * Plan shape per row: the host's last-k-label tails (k = 1..maxK+2)
  * are plain `regexp_extract`s; each label-count slice of the rules
  * joins its tail column with `broadcast(...)` (BroadcastHashJoin, the
  * corpus never moves); the PSL precedence algorithm — exception rules
  * beat everything, otherwise the longest matching suffix wins, default
  * rule `*` last — is one CASE over the joined kind columns. At 9k or
  * 90k rules the broadcast is still kilobytes-to-megabytes; the
  * per-row cost stays O(maxK) hash probes, exactly the snapshot path.
  *
  * Rule encoding (the publicsuffix.org wire format, parsed by
  * [[parse]]):
  *  - `co.uk` → plain rule, suffix = the rule itself
  *  - `*.ck` → wildcard: every label directly under the PARENT is a
  *    suffix (stored as the parent, `ck`)
  *  - `!www.ck` → exception: the named host is NOT a suffix; its
  *    registrable domain is the rule itself
  */
object PublicSuffixTable {

  /** Parse publicsuffix.org list lines → (rule, nlabels, kind) rows.
    * Comments (`//`), blanks, and everything after the first whitespace
    * drop (the PSL spec: a rule ends at the first whitespace); the
    * bare `*` default rule is implicit in the resolver's fallback.
    * kind ∈ plain | wildcard (stored as the parent) | exception. */
  def parse(lines: Seq[String]): Seq[(String, Int, String)] =
    lines.iterator
      .map(_.trim.split("\\s+")(0).toLowerCase)
      .filter(l => l.nonEmpty && !l.startsWith("//") && l != "*")
      .map { l =>
        if (l.startsWith("!")) {
          val r = l.drop(1); (r, r.count(_ == '.') + 1, "exception")
        } else if (l.startsWith("*.")) {
          val p = l.drop(2); (p, p.count(_ == '.') + 1, "wildcard")
        } else (l, l.count(_ == '.') + 1, "plain")
      }
      // one row per (rule, labels): a list carrying both `x` and `*.x`
      // (or `!x`) stores the same string twice — keep the kind that
      // wins PSL precedence (exception > wildcard > plain) so the
      // per-slice join key stays unique and never duplicates corpus
      // rows; the dropped weaker kind is unreachable under that
      // precedence anyway
      .toSeq.groupBy(t => (t._1, t._2)).values.map(_.minBy(_._3 match {
        case "exception" => 0
        case "wildcard" => 1
        case _ => 2
      })).toSeq.sortBy(t => (t._2, t._1))

  /** The bundled snapshot re-expressed as table rows — the parity
    * bridge between the `InSet` fast path and this join path, and the
    * default rules argument for callers without a full list file. */
  def snapshotRules: Seq[(String, Int, String)] =
    PublicSuffix.rules2.map(r => (r, 2, "plain")) ++
      PublicSuffix.rules3.map(r => (r, 3, "plain")) ++
      PublicSuffix.wildcardTlds.map(r => (r, 1, "wildcard")) ++
      PublicSuffix.wildcardParents2.map(r => (r, 2, "wildcard")) ++
      PublicSuffix.exceptions2.map(r => (r, 2, "exception")) ++
      PublicSuffix.exceptions3.map(r => (r, 3, "exception"))

  /** The full bundled list: the wire-format resource parsed once. A
    * deploy-time list refresh replaces the resource file — no
    * recompile, which is the whole reason the long tail lives in a
    * rules TABLE instead of the expression tree. */
  lazy val bundledRules: Seq[(String, Int, String)] = {
    val in = getClass.getResourceAsStream("/psl/public_suffix_snapshot.dat")
    require(in != null, "bundled public-suffix list resource missing")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try parse(src.getLines().toList) finally src.close()
  }

  /** The long tail: bundled rules beyond the curated `InSet` snapshot,
    * compared by (rule, kind) — a `*.sch.uk` wildcard stays in the
    * tail even though the snapshot carries PLAIN `sch.uk`, because the
    * wildcard names deeper suffixes the hot path cannot.
    * [[graft.text.UrlOps.withRegisteredDomain]] composes the two —
    * InSet hot path for the snapshot, broadcast joins for this slice,
    * tail match winning. That composition is exact because every tail
    * rule is STRICTLY more specific than any hot rule it coexists with
    * on a host: no tail rule is a proper dot-suffix of a hot rule, and
    * a tail rule sharing a hot rule's string is a wildcard over the
    * hot plain (its effective suffixes are one label deeper) —
    * UrlOpsSpec pins both — so when a host matches rules from both
    * sets the tail match is the longer one and PSL precedence picks
    * it. */
  lazy val tailRules: Seq[(String, Int, String)] = {
    val hot = snapshotRules.map(r => (r._1, r._3)).toSet
    bundledRules.filterNot(r => hot((r._1, r._3)))
  }

  /** Longest label count the tail resolution must consider. */
  lazy val tailMaxK: Int =
    if (tailRules.isEmpty) 1 else tailRules.map(_._2).max

  /** Rules as a DataFrame (rule, nlabels, kind) ready to broadcast. */
  def rulesDf(spark: org.apache.spark.sql.SparkSession,
      rules: Seq[(String, Int, String)]): DataFrame = {
    import spark.implicits._
    rules.toDF("rule", "nlabels", "kind")
  }

  /** Append `out` = registered domain of `host` resolved against the
    * broadcast `rules` table. `maxK` is the longest rule label count
    * the resolution considers (the full PSL tops out at 5; the bundled
    * snapshot at 3). Hosts matching no rule fall back to the PSL
    * default `*`: registered = last two labels — identical to the
    * snapshot path's convention, so the two paths agree rule-for-rule
    * when fed the same table. With `fallbackToLast2 = false` unmatched
    * hosts yield NULL instead — the composition hook: a partial rules
    * slice (the long tail) resolves what it knows and leaves the rest
    * to a coalesce with the hot path. `presentKs`, when given, names
    * the label counts that actually carry rules: the other per-k joins
    * are skipped entirely (a left join against a provably-empty
    * broadcast is pure plan weight). */
  def withRegisteredDomain(df: DataFrame, host: Column, out: String,
      rules: DataFrame, maxK: Int = 5,
      fallbackToLast2: Boolean = true,
      presentKs: Option[Set[Int]] = None): DataFrame = {
    require(maxK >= 1 && maxK <= 6, s"maxK out of range: $maxK")
    val present = presentKs.getOrElse((1 to maxK).toSet)
    val h = regexp_replace(host, ":\\d+$", "")
    def lastK(k: Int): Column =
      regexp_extract(h, s"((?:[^.]+\\.){${k - 1}}[^.]+)$$", 1)
    val tails = (1 to maxK + 2).map(k => s"__psl_t$k" -> lastK(k))
    val based = tails.foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) }
    // one broadcast hash join per populated label count: the rules
    // slice keyed by its tail column; left joins so unmatched rows
    // keep flowing
    val joined = (1 to maxK).filter(present).foldLeft(based) { (d, k) =>
      val slice = rules.filter(col("nlabels") === k)
        .select(col("rule").as(s"__psl_r$k"), col("kind").as(s"__psl_k$k"))
      d.join(broadcast(slice),
        d(s"__psl_t$k") === slice(s"__psl_r$k"), "left_outer")
    }
    def t(k: Int): Column = col(s"__psl_t$k")
    def kind(k: Int): Column =
      if (present(k)) col(s"__psl_k$k")
      else lit(null).cast(org.apache.spark.sql.types.StringType)
    // PSL precedence: exception rules first (longest first — if several
    // match, label count decides), then matching suffixes longest
    // first (a wildcard under a (L-1)-label parent and a plain L-label
    // rule both yield an L-label suffix → registered = tail L+1; an
    // empty deeper tail means the host IS the suffix — no registrable
    // domain, engine convention falls through to the default), then
    // the default rule `*` (registered = last two labels)
    val exceptionCase = (maxK to 1 by -1).foldLeft(
      when(lit(false), lit(""))) { (acc, k) =>
      acc.when(t(k) =!= "" && kind(k) === "exception", t(k))
    }
    val suffixCase = (maxK + 1 to 2 by -1).foldLeft(exceptionCase) {
      (acc, sufLen) =>
        val viaWildcard =
          t(sufLen - 1) =!= "" && kind(sufLen - 1) === "wildcard" &&
            t(sufLen) =!= ""
        val viaPlain =
          if (sufLen <= maxK)
            t(sufLen) =!= "" && kind(sufLen) === "plain"
          else lit(false)
        acc.when((viaWildcard || viaPlain) && t(sufLen + 1) =!= "",
          t(sufLen + 1))
    }
    val dropCols = tails.map(_._1) ++
      (1 to maxK).flatMap(k => Seq(s"__psl_r$k", s"__psl_k$k"))
    val resolved =
      if (fallbackToLast2) suffixCase.otherwise(t(2)) else suffixCase
    joined.withColumn(out, resolved)
      .drop(dropCols: _*)
  }

  /** DuckDB CTE definitions for the per-(kind, label-count) slices of
    * `rules` — the oracle-side twin of the broadcast joins. Only
    * non-empty slices emit; names are `<prefix>_p<k>` (plain),
    * `<prefix>_w<k>` (wildcard parents), `<prefix>_x<k>` (exception).
    * Callers splice the result into a `WITH` and pair it with
    * [[sqlCaseFor]] built from the SAME rules. */
  def sqlRuleCtes(rules: Seq[(String, Int, String)],
      prefix: String): String = {
    def slice(kind: String, tag: String): Seq[String] =
      rules.filter(_._3 == kind).groupBy(_._2).toSeq.sortBy(_._1).map {
        case (k, rs) =>
          s"${prefix}_$tag$k(r) AS (VALUES " +
            PublicSuffix.sqlValues(rs.map(_._1).sorted) + ")"
      }
    (slice("plain", "p") ++ slice("wildcard", "w") ++
      slice("exception", "x")).mkString(",\n")
  }

  /** DuckDB CASE over a host expression resolving against the
    * `rules` slices emitted by [[sqlRuleCtes]] — the SQL mirror of
    * [[withRegisteredDomain]]'s precedence chain, WITHOUT the default
    * arm (unmatched hosts -> NULL), so callers coalesce it with the
    * hot-path CASE exactly as the engine does. */
  def sqlCaseFor(hostExpr: String, rules: Seq[(String, Int, String)],
      prefix: String): String = {
    val maxK = if (rules.isEmpty) 1 else rules.map(_._2).max
    val h = s"regexp_replace($hostExpr, ':\\d+$$', '')"
    def l(k: Int): String =
      s"regexp_extract($h, '((?:[^.]+\\.){${k - 1}}[^.]+)$$', 1)"
    def has(kind: String, k: Int): Boolean =
      rules.exists(r => r._3 == kind && r._2 == k)
    def in(tag: String, k: Int, e: String): String =
      s"$e IN (SELECT r FROM ${prefix}_$tag$k)"
    val excArms = (maxK to 1 by -1).filter(has("exception", _)).map(k =>
      s"WHEN ${l(k)} <> '' AND ${in("x", k, l(k))} THEN ${l(k)}")
    val sufArms = (maxK + 1 to 2 by -1).flatMap { sufLen =>
      val viaW =
        if (has("wildcard", sufLen - 1))
          Some(s"(${l(sufLen - 1)} <> '' AND " +
            in("w", sufLen - 1, l(sufLen - 1)) +
            s" AND ${l(sufLen)} <> '')")
        else None
      val viaP =
        if (sufLen <= maxK && has("plain", sufLen))
          Some(s"(${l(sufLen)} <> '' AND ${in("p", sufLen, l(sufLen))})")
        else None
      val via = (viaW.toSeq ++ viaP.toSeq).mkString(" OR ")
      if (via.isEmpty) None
      else Some(s"WHEN ($via) AND ${l(sufLen + 1)} <> '' " +
        s"THEN ${l(sufLen + 1)}")
    }
    val arms = excArms ++ sufArms
    if (arms.isEmpty) "NULL"
    else "CASE " + arms.mkString("\n          ") + " END"
  }
}
