package graft

import graft.text.CorpusOps
import org.apache.spark.sql.functions.{col, size}
import org.scalatest.funsuite.AnyFunSuite

/** Planted-input semantics for the corpus-level pipeline steps behind
  * x29 (boilerplate spans) and x30 (sequence packing). */
class CorpusOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  test("boilerplate spans: a span shared by most of a source is flagged, per source") {
    // srcA (10 docs): banner "one two three four five" opens 3 (DF 0.3 >
    // 0.2 → boilerplate); singleton spans sit at DF 0.1. srcB (10 docs)
    // carries the SAME span in exactly 2 (DF 0.2, not > 0.2 → clean
    // there) — per-source thresholds must not leak across sources
    val banner = "one two three four five"
    val docs = (
      (0 until 3).map(i => (i.toLong, "srcA", s"$banner uniqA$i ua${i}b ua${i}c ua${i}d ua${i}e")) ++
        (3 until 10).map(i => (i.toLong, "srcA", s"freeA$i fa${i}b fa${i}c fa${i}d fa${i}e fa${i}f")) ++
        (10 until 12).map(i => (i.toLong, "srcB", s"$banner uniqB$i ub${i}b ub${i}c ub${i}d ub${i}e")) ++
        (12 until 20).map(i => (i.toLong, "srcB", s"freeB$i fb${i}b fb${i}c fb${i}d fb${i}e fb${i}f"))
      ).toDF("doc_id", "source", "text")
    val out = CorpusOps.boilerplateSpans(docs, "doc_id", "source", "text",
      n = 5, threshold = 0.2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // srcA banner docs: exactly the banner span is flagged, nothing else
    (0 until 3).foreach { i =>
      assert(out(i.toLong)._2 === 1L, s"doc $i should carry exactly the flagged banner span")
    }
    // clean srcA docs and ALL srcB docs (including the banner carriers,
    // whose source-local DF is exactly the threshold) have none
    (3 until 10).foreach(i => assert(out(i.toLong)._2 === 0L))
    (10 until 12).foreach(i => assert(out(i.toLong)._2 === 0L,
      "threshold is strict: DF == threshold is not boilerplate"))
    (12 until 20).foreach(i => assert(out(i.toLong)._2 === 0L))
  }

  test("sequence packing: in-order bins, straddling docs keep their starting bin") {
    // cap 10; srcA docs of 4/4/4/9/2 tokens in doc_id order:
    //   cum-before: 0,4,8,12,21 → bins 0,0,0,1,2
    // (doc 2 straddles tokens 8..11 and stays in bin 0 — bounded overflow)
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, "srcA", words(4)), (2L, "srcA", words(4)), (3L, "srcA", words(4)),
      (4L, "srcA", words(9)), (5L, "srcA", words(2)),
      (9L, "srcB", words(25))).toDF("doc_id", "source", "text")
    val out = CorpusOps.sequencePacking(docs, "doc_id", "source", "text", cap = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) === ((4L, 0L)))
    assert(out(2L) === ((4L, 0L)))
    assert(out(3L) === ((4L, 0L))) // starts at token 8 < cap → bin 0
    assert(out(4L) === ((9L, 1L)))
    assert(out(5L) === ((2L, 2L)))
    // sources pack independently
    assert(out(9L) === ((25L, 0L)))
  }

  test("sequence packing: two-phase prefix sum equals the naive per-source window") {
    // Randomized corpus with sparse, clustered, and interleaved ids —
    // bucketRows=3 forces many buckets so the bucket-boundary arithmetic
    // (local cum + exclusive offset) is exercised across every boundary.
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(42)
    val ids = (Seq.tabulate(40)(i => i.toLong) ++ // dense run
      Seq.tabulate(20)(i => 1000L + i * 97L) ++ // sparse spread
      Seq.tabulate(20)(i => 5000L + i)) // clustered block
    val rows = ids.map { id =>
      val src = s"src${rnd.nextInt(4)}"
      val nTok = 1 + rnd.nextInt(30)
      (id, src, (1 to nTok).map(j => s"t$j").mkString(" "))
    }
    val docs = rows.toDF("doc_id", "source", "text")
    val got = CorpusOps.sequencePacking(docs, "doc_id", "source", "text",
        cap = 17, bucketRows = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    val w = Window.partitionBy($"source").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = docs
      .select($"doc_id", $"source",
        size(split($"text", "\\s+")).cast("long").as("n_tokens"))
      .withColumn("cum", sum($"n_tokens").over(w))
      .select($"doc_id", $"n_tokens",
        expr("(cum - n_tokens) div 17").as("pack_id"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.size === want.size)
    want.foreach { case (id, exp) =>
      assert(got(id) === exp, s"doc $id: two-phase ${got(id)} != naive $exp")
    }
  }

  test("token-budget sample: two-phase prefix equals the naive window; never overshoots") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(7)
    val docs = Seq.tabulate(60) { i =>
      (i.toLong * 13 % 1000, s"src${rnd.nextInt(3)}", 1L + rnd.nextInt(40))
    }.toDF("doc_id", "source", "n_tokens")
    val got = CorpusOps.tokenBudgetSample(docs, "doc_id", "source", "n_tokens",
        budget = 100L, salt = "t|", bucketRows = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getBoolean(4))).toMap
    val w = Window.partitionBy($"source")
      .orderBy(md5(concat(lit("t|"), $"doc_id".cast("string"))), $"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = docs.withColumn("cum", sum($"n_tokens").over(w))
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(3) <= 100L)).toMap
    assert(got === want)
    // never overshoots: per source, the kept token total stays ≤ budget
    val keptTotals = docs.join(
        CorpusOps.tokenBudgetSample(docs, "doc_id", "source", "n_tokens",
          100L, "t|", 3).filter($"keep").select($"doc_id"), Seq("doc_id"))
      .groupBy($"source").agg(sum($"n_tokens").as("t"))
      .collect().map(_.getLong(1))
    assert(keptTotals.forall(_ <= 100L), keptTotals.mkString(","))
  }

  test("global shuffle: a permutation in md5 order, cut into fixed shards") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // sparse ids so hex-prefix buckets are exercised beyond bucket 0
    val ids = (0L until 40L) ++ (900L until 930L) ++ Seq(5000L, 123456789L)
    val docs = ids.map(id => (id, s"body $id")).toDF("doc_id", "text")
    val got = CorpusOps.globalShuffleOrder(docs, "doc_id", ":t", shardDocs = 10,
        bucketRows = 8)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // positions are exactly 0..n-1 (a permutation), shards cut every 10
    assert(got.map(_._3).sorted.toSeq === (0L until ids.size.toLong))
    got.foreach { case (_, _, pos, shard) => assert(shard === pos / 10) }
    // order agrees with the naive single-window rank over (md5, id)
    val w = Window.orderBy($"hx", $"doc_id")
    val want = docs
      .select($"doc_id", md5(concat($"doc_id".cast("string"), lit(":t"))).as("hx"))
      .withColumn("pos", row_number().over(w).cast("long") - 1L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    got.foreach { case (id, _, pos, _) =>
      assert(pos === want(id), s"doc $id: two-phase rank $pos != naive ${want(id)}")
    }
  }

  test("sequence packing: degenerate inputs (empty corpus, single doc)") {
    val empty = Seq.empty[(Long, String, String)].toDF("doc_id", "source", "text")
    assert(CorpusOps.sequencePacking(empty, "doc_id", "source", "text").count() === 0L)
    val one = Seq((7L, "s", "a b c")).toDF("doc_id", "source", "text")
    val r = CorpusOps.sequencePacking(one, "doc_id", "source", "text", cap = 2)
      .collect().head
    assert(r.getLong(2) === 3L && r.getLong(3) === 0L)
  }

  test("substring removal: cross-doc and within-doc duplicated runs are excised") {
    val docs = Seq(
      (1L, "a b c d e f g h X Y"),   // shares the 8-gram a..h with doc 2
      (2L, "a b c d e f g h P Q"),
      (3L, "r r r r r r r r r"),     // within-doc dup: gram rrrrrrrr at i=1,2
      (4L, "u v w x y z"),           // too short to carry an 8-gram
      (5L, "m n o p q r s t")        // unique 8-gram, occurs once
    ).toDF("doc_id", "text")
    val got = CorpusOps.dupSpanRemoval(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got(1L) === ((10L, 8L, "X Y")))
    assert(got(2L) === ((10L, 8L, "P Q")))
    // every position of doc 3 is covered by one of the two dup instances
    assert(got(3L) === ((9L, 9L, "")))
    assert(got(4L) === ((6L, 0L, "u v w x y z")))
    assert(got(5L) === ((8L, 0L, "m n o p q r s t")))
    // the counts-only view agrees and only lists affected docs
    val counts = CorpusOps.dupCoveredCounts(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(counts === Map(1L -> 8, 2L -> 8, 3L -> 9))
  }

  test("dupCoveredCounts interval merge equals size of the covered-position set (r19)") {
    // overlap shapes: nested/chained within-doc runs, cross-doc runs with
    // interior gaps, fully-covered docs — the merge must agree with the
    // explode+collect_set form it replaced on every one, and on the real
    // sf0.001 corpus at the x14 config (n=8)
    val planted = Seq(
      (1L, "a b c d e f g h X a b c d e f g h"), // two instances, gap 9
      (2L, "a b c d e f g h i j"),               // chained: starts 1,2,3
      (3L, "a b c d e f g h i j"),
      (4L, "k k k k k k k k k k k k"),           // fully covered
      (5L, "p q r s t u v w"),                   // unique, no dup
      (6L, "z")                                   // too short for an 8-gram
    ).toDF("doc_id", "text")
    val real = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    for (docs <- Seq(planted, real); n <- Seq(3, 8)) {
      val ref = CorpusOps.dupCovered(docs, "doc_id", "text", n)
        .select(col("doc_id"), size(col("cov")).as("n"))
        .as[(Long, Int)].collect().toMap
      val got = CorpusOps.dupCoveredCounts(docs, "doc_id", "text", n)
        .as[(Long, Int)].collect().toMap
      assert(got === ref, s"interval merge drifted from the position set (n=$n)")
    }
  }

  test("substring removal: interior gap survives between two covered runs") {
    // docs share PREFIX (1-8) and SUFFIX (11-18) 8-grams; the middle two
    // tokens differ per doc and must survive as the only kept text
    val pre = "a b c d e f g h"
    val suf = "s t u v w x y z"
    val docs = Seq(
      (1L, s"$pre M1 N1 $suf"),
      (2L, s"$pre M2 N2 $suf")
    ).toDF("doc_id", "text")
    val got = CorpusOps.dupSpanRemoval(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got(1L) === ((18L, 16L, "M1 N1")))
    assert(got(2L) === ((18L, 16L, "M2 N2")))
  }
}
