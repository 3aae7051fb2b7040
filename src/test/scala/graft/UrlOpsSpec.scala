package graft

import graft.text.UrlOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** RFC 3986 §6.2.2 syntax-based normalization cases for [[UrlOps]]. */
class UrlOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def canon(urls: String*): Seq[(String, String)] =
    urls.toDF("u")
      .select(col("u"), UrlOps.canonicalize(col("u")).as("c"))
      .as[(String, String)].collect().toSeq

  test("scheme/host case, default port, www, slash, param order normalize") {
    val got = canon(
      "HTTPS://WWW.Example.COM:443/a/b/?b=2&a=1",
      "https://example.com/a/b?a=1&b=2",
      "HTTP://Sub.Example.org:80",
      "http://sub.example.org/",
      "https://example.com:8443/x",
      "https://news.example.co/path///")
    assert(got(0)._2 === "https://example.com/a/b?a=1&b=2")
    assert(got(1)._2 === got(0)._2)
    assert(got(2)._2 === "http://sub.example.org/")
    assert(got(3)._2 === got(2)._2)
    // non-default port survives
    assert(got(4)._2 === "https://example.com:8443/x")
    assert(got(5)._2 === "https://news.example.co/path")
  }

  test("canonicalize is idempotent over generated URL shapes") {
    // a canonical form must be a fixed point — if re-canonicalizing ever
    // changes the value, two pipelines disagree on the dedup key
    val schemes = Seq("http", "HTTP", "https", "HTTPS")
    val hosts = Seq("Example.COM", "www.example.com", "WWW.a.b.ORG",
      "sub.example.co:443", "example.com:8080", "x.io:80")
    val paths = Seq("", "/", "/a", "/a/b/", "/a//", "/a/b///")
    val queries = Seq("", "?a=1", "?b=2&a=1", "?z=9&a=1&m=5")
    val urls = for {
      s <- schemes; h <- hosts; p <- paths; q <- queries
    } yield s"$s://$h$p$q"
    val got = urls.toDF("u")
      .select(UrlOps.canonicalize(col("u")).as("c1"))
      .select(col("c1"), UrlOps.canonicalize(col("c1")).as("c2"))
      .as[(String, String)].collect()
    got.foreach { case (c1, c2) =>
      assert(c1 === c2, s"canonical form not a fixed point: $c1 -> $c2")
    }
    assert(got.length === schemes.size * hosts.size * paths.size * queries.size)
  }

  test("registered domain honors the bundled public-suffix snapshot") {
    val cases = Seq(
      // no matching rule -> last-2-label fallback (round-10 behavior)
      "https://WWW.a.b.Example.COM/x" -> "example.com",
      "http://example.org" -> "example.org",
      // 2-label ICANN rules: each registrant is its own domain
      "https://shop.Example.CO.UK/x" -> "example.co.uk",
      "https://www.news.example.com.au" -> "example.com.au",
      // private-section rule: one site per subdomain
      "https://project.user.GitHub.IO/docs" -> "user.github.io",
      // 3-label rule wins over the embedded 2-label edu.au rule
      "https://x.school.NSW.edu.au" -> "school.nsw.edu.au",
      // non-default port is not a registrant boundary
      "https://example.com:8080/x" -> "example.com",
      "http://sub.example.com:80/x" -> "example.com",
      // host IS a public suffix: degenerate, falls through to last-2
      "https://co.uk/" -> "co.uk",
      // wildcard rule *.ck: every label under the TLD is a suffix, so
      // the registrant carries THREE labels
      "https://a.shop.CK/x" -> "a.shop.ck",
      "https://deep.a.shop.ck/x" -> "a.shop.ck",
      // exception !www.ck cancels the wildcard: www.ck IS registrable
      "https://WWW.ck/" -> "www.ck",
      "https://mail.www.ck/" -> "www.ck",
      // second-level wildcard *.kawasaki.jp with its !city exception
      "https://x.foo.kawasaki.JP/" -> "x.foo.kawasaki.jp",
      "https://sub.city.kawasaki.jp/" -> "city.kawasaki.jp",
      "https://city.kawasaki.jp/" -> "city.kawasaki.jp",
      // plain jp 2-label rules are untouched by the city wildcards
      "https://www.example.co.jp/" -> "example.co.jp")
    val got = cases.map(_._1).toDF("u")
      .select(UrlOps.registeredDomain(col("u")))
      .as[String].collect().toSeq
    assert(got === cases.map(_._2))
  }

  test("property: registered domain is a dot-suffix of the de-ported host") {
    import graft.text.PublicSuffix
    // generated hosts across rule/fallback/port shapes: the domain must
    // always be a label-aligned suffix of the canonical host minus any
    // port, and carry exactly one label above a matched rule
    val labels = Seq("a", "bb", "shop", "x9")
    val suffixes = Seq("com", "co.uk", "github.io", "nsw.edu.au", "unlisted")
    val ports = Seq("", ":443", ":8080")
    val urls = for {
      l1 <- labels; l2 <- Seq("", "sub."); sfx <- suffixes; p <- ports
    } yield s"https://$l2$l1.$sfx$p/x"
    val got = urls.toDF("u")
      .select(col("u"), UrlOps.canonicalHost(col("u")).as("h"),
        UrlOps.registeredDomain(col("u")).as("d"))
      .as[(String, String, String)].collect()
    val rules = (PublicSuffix.rules2 ++ PublicSuffix.rules3).toSet
    got.foreach { case (u, host, d) =>
      val h = host.replaceAll(":\\d+$", "")
      assert(h == d || h.endsWith("." + d), s"$u: domain $d not a suffix of $h")
      val above = h.stripSuffix(d).stripSuffix(".")
      val matchedRule = d.split('.').drop(1).mkString(".")
      if (rules.contains(matchedRule))
        // rule matched: d = one label + rule, the rest of the host is
        // subdomain labels
        assert(d.split('.').length == matchedRule.split('.').length + 1)
      else
        // fallback: exactly the last two labels
        assert(d.split('.').length == 2, s"$u: fallback domain $d")
      assert(above.isEmpty || above.split('.').forall(_.nonEmpty))
    }
  }

  test("x63 end-to-end: URL dedup collapses (source, lang); PSL domains; cap 4") {
    val out = SparkEntry.queries("x63_url_domain_dedup")(
      spark, "/root/testdata/sf0.001").cache()
    try {
      val n = out.count()
      val keepers = out.filter(col("url_keep")).count()
      // one keeper per distinct canonical URL = per (source, lang) pair
      val pairs = Tables.documents(spark, "/root/testdata/sf0.001")
        .select(col("source"), col("lang")).distinct().count()
      assert(n === 500L && keepers === pairs)
      // domains are public-suffix-aware: 5 langs x 4 suffix classes, and
      // the co.uk registrant is `{lang}-corpus.co.uk`, NOT `co.uk`
      val domains = out.select(col("domain")).distinct()
        .as[String].collect().toSet
      assert(domains.size === 20)
      assert(domains.contains("en-corpus.co.uk") && !domains.contains("co.uk"))
      assert(domains.contains("en-corpus.github.io"))
      assert(domains.exists(_.endsWith(".nsw.edu.au")))
      // the per-domain cap binds: no domain keeps more than 4
      val maxKept = out.filter(col("domain_keep"))
        .groupBy(col("domain")).count()
        .agg(max(col("count"))).as[Long].head()
      assert(maxKept <= 4L)
      // and it really filters (5 sources per suffix class x ~5 langs > 4)
      assert(out.filter(col("url_keep") && !col("domain_keep")).count() > 0)
    } finally out.unpersist()
  }

  test("long-tail registries resolve from the extended snapshot") {
    val cases = Seq(
      // Japan prefecture geographic rules
      "https://www.pref.tokyo.jp/" -> "pref.tokyo.jp",
      "https://a.b.hokkaido.jp/" -> "b.hokkaido.jp",
      // US state locality namespace
      "https://www.cityhall.ca.us/" -> "cityhall.ca.us",
      "https://x.dmv.ny.us/" -> "dmv.ny.us",
      // African second-level registries
      "https://news.daily.com.et/" -> "daily.com.et",
      "https://portal.uni.ac.tz/" -> "uni.ac.tz",
      "https://shop.market.co.zm/" -> "market.co.zm",
      // Caucasus / Central Asia
      "https://x.site.com.ge/" -> "site.com.ge",
      "https://a.b.org.kz/" -> "b.org.kz",
      // Caribbean / Central America
      "https://www.bank.com.tt/" -> "bank.com.tt",
      "https://gob.example.gob.pa/" -> "example.gob.pa",
      // Russia second-level
      "https://www.firm.msk.ru/" -> "firm.msk.ru",
      // private-section hosting platforms
      "https://feature.myapp.amplifyapp.com/" -> "myapp.amplifyapp.com",
      "https://site.user.pythonanywhere.com/" -> "user.pythonanywhere.com")
    val got = cases.map(_._1).toDF("u")
      .select(UrlOps.registeredDomain(col("u")))
      .as[String].collect().toSeq
    assert(got === cases.map(_._2))
  }

  test("PublicSuffixTable.parse reads the publicsuffix.org wire format") {
    import graft.text.PublicSuffixTable
    val lines = Seq(
      "// ===BEGIN ICANN DOMAINS===",
      "",
      "com",
      "co.uk  // trailing comment after whitespace drops",
      "*.ck",
      "!www.ck",
      "  *.kawasaki.jp  ",
      "!city.kawasaki.jp",
      "// ===END ICANN DOMAINS===",
      "github.io",
      "*",
      "CO.UK")
    val rules = PublicSuffixTable.parse(lines).toSet
    assert(rules === Set(
      ("com", 1, "plain"), ("co.uk", 2, "plain"), ("ck", 1, "wildcard"),
      ("www.ck", 2, "exception"), ("kawasaki.jp", 2, "wildcard"),
      ("city.kawasaki.jp", 3, "exception"), ("github.io", 2, "plain")))
    // kind-precedence dedup: a list carrying x three ways keeps the
    // strongest kind so the join key stays unique
    val dup = PublicSuffixTable.parse(Seq("x.y", "*.x.y", "!x.y"))
    assert(dup === Seq(("x.y", 2, "exception")))
  }

  test("broadcast-join path agrees with the InSet snapshot path host-for-host") {
    import graft.text.{PublicSuffix, PublicSuffixTable}
    // a battery covering every rule family plus fallback and degenerate
    // shapes; the two paths share the rule table so they must agree
    val hosts = Seq(
      "a.b.example.com", "example.org", "shop.example.co.uk",
      "news.example.com.au", "project.user.github.io",
      "x.school.nsw.edu.au", "example.com:8080", "sub.example.com:80",
      "co.uk", "uk", "a.shop.ck", "deep.a.shop.ck", "www.ck",
      "mail.www.ck", "x.foo.kawasaki.jp", "sub.city.kawasaki.jp",
      "city.kawasaki.jp", "www.example.co.jp", "pref.tokyo.jp",
      "a.b.c.d.e.unlisted", "singlelabel", "x.ca.us", "k12.ca.us",
      "school.k12.ca.us", "a.com.et", "b.msk.ru")
    val rules = PublicSuffixTable.rulesDf(spark, PublicSuffixTable.snapshotRules)
    val got = PublicSuffixTable.withRegisteredDomain(
      hosts.toDF("h"), col("h"), "via_join", rules)
      .withColumn("via_inset", PublicSuffix.registeredDomainOfHost(col("h")))
      .as[(String, String, String)].collect()
    got.foreach { case (h, viaJoin, viaInset) =>
      assert(viaJoin === viaInset, s"paths disagree on $h")
    }
    assert(got.length === hosts.length)
  }

  test("bundled list invariants: the tail composes exactly over the hot snapshot") {
    import graft.text.PublicSuffixTable
    val hot = PublicSuffixTable.snapshotRules.map(_._1).toSet
    val tail = PublicSuffixTable.tailRules
    // the resource must carry the whole snapshot plus a real tail
    assert(PublicSuffixTable.bundledRules.map(_._1).toSet.intersect(hot) === hot,
      "bundled resource must contain every hot-snapshot rule")
    assert(tail.nonEmpty, "bundled resource must extend the snapshot")
    // disjointness by (rule, kind): a tail rule may share a hot rule's
    // STRING only as a wildcard over the hot plain (*.sch.uk over
    // sch.uk) — its effective suffixes are one label deeper, so the
    // tail match is still strictly more specific
    val hotPairs = PublicSuffixTable.snapshotRules
      .map(r => (r._1, r._3)).toSet
    assert(tail.forall(r => !hotPairs((r._1, r._3))))
    tail.filter(r => hot(r._1)).foreach { case (r, _, kind) =>
      assert(kind === "wildcard" && hotPairs((r, "plain")),
        s"tail rule $r shares a hot string without deepening it")
    }
    // the override invariant that makes tail-wins EXACT PSL precedence:
    // no tail rule is a proper dot-suffix of any hot rule, so when a
    // host matches both sets the tail match is strictly longer
    val violations = tail.map(_._1).filter(t => hot.exists(h =>
      h != t && h.endsWith("." + t)))
    assert(violations.isEmpty,
      s"tail rules shadowed by longer hot rules: $violations")
    // exception rules must ride with their wildcard parent's set
    val tailWild = tail.filter(_._3 == "wildcard").map(_._1).toSet
    tail.filter(_._3 == "exception").foreach { case (r, _, _) =>
      val parent = r.split('.').drop(1).mkString(".")
      assert(tailWild(parent),
        s"tail exception $r without its wildcard parent in the tail")
    }
  }

  test("production path: long-tail rules resolve; hot answers survive") {
    // the composed UrlOps.withRegisteredDomain: InSet hot path +
    // broadcast-join tail, tail match winning
    def resolve(urls: Seq[String]): Map[String, String] =
      UrlOps.withRegisteredDomain(urls.toDF("u"), col("u"), "d")
        .as[(String, String)].collect().toMap
    val got = resolve(Seq(
      // k12.<state>.us third-level registries: WITHOUT the tail these
      // fall to the hot ca.us rule (registered = k12.ca.us)
      "https://school.K12.CA.US/x",
      "https://www.district.k12.ny.us/",
      "https://a.lib.tx.us", "https://x.cc.fl.us",
      // 4-label rule
      "https://academy.pvt.k12.ma.us/",
      // *.sch.uk wildcard: suffix = <school>.sch.uk
      "https://lea.bristol.sch.uk/x",
      // AWS wildcard boundary: each instance hostname is its own site
      "https://ec2-1-2-3.us-west-2.compute.amazonaws.com/",
      // per-country platform rule overriding the hot co.uk answer
      "https://myblog.blogspot.co.uk/post",
      // eu.org national delegation
      "https://site.fr.eu.org/"))
    assert(got("https://school.K12.CA.US/x") === "school.k12.ca.us")
    assert(got("https://www.district.k12.ny.us/") === "district.k12.ny.us")
    assert(got("https://a.lib.tx.us") === "a.lib.tx.us")
    assert(got("https://x.cc.fl.us") === "x.cc.fl.us")
    assert(got("https://academy.pvt.k12.ma.us/") === "academy.pvt.k12.ma.us")
    assert(got("https://lea.bristol.sch.uk/x") === "lea.bristol.sch.uk")
    assert(got("https://ec2-1-2-3.us-west-2.compute.amazonaws.com/")
      === "ec2-1-2-3.us-west-2.compute.amazonaws.com")
    assert(got("https://myblog.blogspot.co.uk/post")
      === "myblog.blogspot.co.uk")
    assert(got("https://site.fr.eu.org/") === "site.fr.eu.org")
    // ...and the long-tail answers really did move past the hot
    // snapshot's last-rule fallback
    val hotOnly = Seq("https://school.K12.CA.US/x").toDF("u")
      .select(UrlOps.registeredDomain(col("u"))).as[String].head()
    assert(hotOnly === "k12.ca.us", "hot snapshot baseline moved")
    // parity: every host NOT matching a tail rule keeps the hot answer
    val battery = Seq(
      "https://a.b.example.com/x", "http://example.org",
      "https://shop.example.CO.UK/x", "https://news.example.com.au",
      "https://project.user.github.io/docs", "https://x.school.nsw.edu.au",
      "https://example.com:8080/x", "https://co.uk/",
      "https://a.shop.ck/x", "https://WWW.ck/", "https://mail.www.ck/",
      "https://x.foo.kawasaki.jp/", "https://sub.city.kawasaki.jp/",
      "https://www.example.co.jp/", "https://b.msk.ru/",
      "https://singlelabel/")
    val composed = resolve(battery)
    val hotGot = battery.toDF("u")
      .select(col("u"), UrlOps.registeredDomain(col("u")).as("d"))
      .as[(String, String)].collect().toMap
    battery.foreach { u =>
      assert(composed(u) === hotGot(u), s"composed path moved $u")
    }
  }

  test("full-list swap: rules beyond the snapshot resolve through the join path") {
    import graft.text.PublicSuffixTable
    // the k12.<state>.us third-level registries are real PSL rules the
    // curated snapshot omits: loading them through parse() moves the
    // boundary one level deeper with no code change — the full-9k-rule
    // swap is exactly this, at scale
    val extended = PublicSuffixTable.snapshotRules ++
      PublicSuffixTable.parse(Seq("k12.ca.us", "cc.ca.us", "lib.ca.us"))
    val rules = PublicSuffixTable.rulesDf(spark, extended)
    val got = PublicSuffixTable.withRegisteredDomain(
      Seq("district.k12.ca.us", "x.district.k12.ca.us", "city.ca.us")
        .toDF("h"), col("h"), "d", rules)
      .as[(String, String)].collect().toMap
    assert(got("district.k12.ca.us") === "district.k12.ca.us")
    assert(got("x.district.k12.ca.us") === "district.k12.ca.us")
    // rules untouched by the extension keep their snapshot answer
    assert(got("city.ca.us") === "city.ca.us")
  }
}
