package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus curation — the normalization a
  * domain-level dedup/cap pass needs before any grouping: raw crawl URLs
  * differ in scheme/host case, default ports, `www.` prefixes, trailing
  * slashes and query-parameter order while naming the same resource.
  *
  * Every function is a composition of codegen'd built-ins
  * (`regexp_extract` / `regexp_replace` / `array_sort`) — no UDFs — so
  * canonicalization runs inside whole-stage codegen on the scan, and the
  * canonical key is available to push into the dedup shuffle directly.
  * Mirrors the RFC 3986 §6.2.2 "syntax-based normalization" steps that
  * are safe without fetching (case, default port, empty path) plus the
  * crawl-pipeline conventions (strip `www.`, sort query params).
  */
object UrlOps {

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val HostRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
  private val PathRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)"
  private val QueryRe = "\\?([^#]*)"

  /** Lower-cased scheme; `""` when the value is not a URL. */
  def scheme(url: Column): Column = lower(regexp_extract(url, SchemeRe, 1))

  /** Canonical host: lower-cased, default port for the scheme stripped
    * (`:443` for https, `:80` for http), leading `www.` removed — but
    * ONLY when at least two labels remain: `www.ck` is a registrable
    * host under the PSL's `!www.ck` exception rule, and collapsing it
    * to the bare TLD would merge it with every other `*.ck` registrant
    * (and break the registered-domain extraction downstream). The
    * guarded pattern needs no lookahead, so the DuckDB oracle twin
    * (RE2, which has none) states it identically. */
  def canonicalHost(url: Column): Column = {
    val sch = scheme(url)
    val hp = lower(regexp_extract(url, HostRe, 1))
    val dePorted = when(sch === "https", regexp_replace(hp, ":443$", ""))
      .when(sch === "http", regexp_replace(hp, ":80$", ""))
      .otherwise(hp)
    regexp_replace(dePorted, "^www\\.([^.]+\\..+)", "$1")
  }

  /** Canonical path: trailing slashes dropped, empty path → `/`. */
  def canonicalPath(url: Column): Column = {
    val trimmed =
      regexp_replace(regexp_extract(url, PathRe, 1), "/+$", "")
    when(trimmed === "", lit("/")).otherwise(trimmed)
  }

  /** Canonical query: `&`-separated params sorted lexicographically;
    * `""` when the URL has no query. */
  def canonicalQuery(url: Column): Column = {
    val q = regexp_extract(url, QueryRe, 1)
    when(q === "", lit(""))
      .otherwise(concat(lit("?"), array_join(array_sort(split(q, "&")), "&")))
  }

  /** Full canonical form: scheme://host/path?sorted-query. */
  def canonicalize(url: Column): Column =
    concat(scheme(url), lit("://"), canonicalHost(url), canonicalPath(url),
      canonicalQuery(url))

  /** Registered (registrable) domain of the URL's canonical host:
    * longest matching rule in the bundled public-suffix snapshot
    * ([[PublicSuffix]]) plus one label, falling back to the last two
    * dot-labels for TLDs with no bundled rule. A non-default port is
    * stripped before label extraction so `example.com:8080` and
    * `example.com` agree at the domain key (canonicalHost keeps the
    * port — it is part of URL identity — but a domain-level cap or
    * takedown audit must not treat ports as registrants). */
  def registeredDomain(url: Column): Column =
    PublicSuffix.registeredDomainOfHost(canonicalHost(url))

  /** Append `out` = registered domain of `url` resolved against the
    * FULL bundled public-suffix list — the production path: the
    * curated snapshot stays the codegen'd `InSet` hot path
    * ([[registeredDomain]]), and the long tail
    * ([[PublicSuffixTable.tailRules]] — the `k12.<state>.us`-class
    * registries, `*.sch.uk`, AWS hosting boundaries, per-country
    * platform rules) rides per-label-count BROADCAST joins, with a
    * tail match overriding the hot answer.
    *
    * The override IS PSL precedence, not a heuristic: the tail shares
    * no rule string with the snapshot and no tail rule is a proper
    * dot-suffix of a hot rule (UrlOpsSpec pins both invariants on the
    * bundled resource), so whenever a host matches rules from both
    * sets the tail rule is strictly longer — and PSL resolution picks
    * the longest match. Hosts matching no tail rule resolve exactly as
    * [[registeredDomain]]; hosts matching no rule at all keep the
    * default last-2-label fallback.
    *
    * Scale shape: the corpus side never moves — the tail slices are
    * kilobytes broadcast to every executor, the probes are per-row
    * hash lookups, and the hot path stays inside whole-stage codegen.
    * A list refresh swaps the resource file; no recompile. */
  def withRegisteredDomain(df: DataFrame, url: Column,
      out: String): DataFrame = {
    val hostCol = "__graft_psl_host"
    val tailCol = "__graft_psl_tail"
    val joined = PublicSuffixTable.withRegisteredDomain(
      df.withColumn(hostCol, canonicalHost(url)), col(hostCol), tailCol,
      PublicSuffixTable.rulesDf(df.sparkSession, PublicSuffixTable.tailRules),
      maxK = PublicSuffixTable.tailMaxK, fallbackToLast2 = false,
      presentKs = Some(PublicSuffixTable.tailRules.map(_._2).toSet))
    joined
      .withColumn(out, coalesce(col(tailCol),
        PublicSuffix.registeredDomainOfHost(col(hostCol))))
      .drop(tailCol, hostCol)
  }
}
