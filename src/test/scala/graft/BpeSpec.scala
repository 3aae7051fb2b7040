package graft

import graft.text.{Bpe, TextOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit semantics for the BPE apply ([[graft.text.Bpe]]): the wrapper
  * representation must enforce token boundaries (no cross-boundary or
  * prefix merges), pair adjacent runs left-to-right, and the learned
  * ranks must reproduce hand-computed segmentations. Plus the headline
  * contract: BPE subword counts DIVERGE from whitespace token counts —
  * the reason x30 packing / x46 budget mixing / x59 shards should budget
  * on subwords. */
class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def encode(words: Seq[String], merges: Seq[String]): Map[String, Seq[String]] =
    words.toDF("w")
      .select(col("w"), Bpe.subwords(Bpe.applyMerges(Bpe.wrap(col("w")), merges)).as("sub"))
      .as[(String, Seq[String])].collect().toMap

  test("greedy left-to-right pairing: adjacent merge sites each merge") {
    val got = encode(Seq("aaaa", "aaa", "aa", "a"), Seq("aa"))
    assert(got("aaaa") === Seq("aa", "aa"))
    assert(got("aaa") === Seq("aa", "a"))
    assert(got("aa") === Seq("aa"))
    assert(got("a") === Seq("a"))
  }

  test("token boundaries: an earlier merge's output cannot half-merge later") {
    // rank order (ab, bc): after ab merges, the b inside token "ab" must
    // NOT pair with the following c — "abc" is (ab)(c), never (a)(bc) or
    // a re-merged (abc)
    val got = encode(Seq("abc", "bc", "abcbc"), Seq("ab", "bc"))
    assert(got("abc") === Seq("ab", "c"))
    assert(got("bc") === Seq("bc"))
    assert(got("abcbc") === Seq("ab", "c", "bc"))
  }

  test("prefix guard: a merge matches whole tokens only") {
    // merge (a,b) requires the complete token b after a; in "abb" the
    // first b IS complete so it merges, but in a vocabulary word where b
    // starts a longer unmerged run the prefix must not shear
    val got = encode(Seq("abb", "ba"), Seq("ab"))
    assert(got("abb") === Seq("ab", "b"))
    assert(got("ba") === Seq("b", "a"))
  }

  test("learned ranks reproduce a hand-computed segmentation") {
    // pair counts: 'aa' = 2×2 (aaa) + 1 (aab) = 5, 'ab' = 1 → aa ranks first
    val docs = Seq(("d1", "aaa aaa"), ("d2", "aab")).toDF("doc_id", "text")
    val wf = Bpe.wordFrequency(docs)
    val merges = Bpe.learnMerges(wf, 2)
    assert(merges.head === "aa", s"highest-frequency pair must rank first: $merges")
    val got = encode(Seq("aab"), merges)
    // rank-1 merge aa wins the leading pair; b stays single ("ab" can no
    // longer match — its a is consumed by the aa token)
    assert(got("aab") === Seq("aa", "b"))
  }

  test("subword counts diverge from whitespace counts (the x30/x46/x59 upgrade)") {
    val docs = Seq(
      ("d1", "the the cat"), ("d2", "theory theater"), ("d3", "a b c")
    ).toDF("doc_id", "text")
    val wf = Bpe.wordFrequency(docs)
    val merges = Bpe.learnMerges(wf, 4)
    val vocab = wf.select(col("w"), col("wf"),
      size(Bpe.subwords(Bpe.applyMerges(Bpe.wrap(col("w")), merges))).as("n_subwords"))
    val counts = Bpe.docSubwordCounts(docs, vocab)
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // whitespace sees 3 tokens per doc; BPE must count MORE for multi-
    // subword words and can never count fewer than one per word
    counts.foreach { case (_, (bpe, ws)) => assert(bpe >= ws) }
    assert(counts("d2")._1 > counts("d2")._2,
      s"long words must exceed their whitespace count: $counts")
    // single-char words stay 1 subword: d3 counts equal
    assert(counts("d3")._1 === counts("d3")._2)
  }

  test("x61 end-to-end: staged-vocab encode is exact over real data") {
    val enc = QueriesTrainingData.x61_bpe_encode(spark, "/root/testdata/sf0.001")
      .select(col("w"), col("n_chars"), col("n_subwords"), col("subwords"))
      .as[(String, Int, Int, String)].collect()
    assert(enc.nonEmpty)
    enc.foreach { case (w, nc, ns, sub) =>
      assert(ns >= 1 && ns <= nc, s"$w: $ns subwords vs $nc chars")
      // subwords concatenate back to the word (segmentation, not hashing)
      assert(sub.replace(" ", "") === w, s"$w segmented as '$sub'")
    }
    // merges actually fired somewhere: corpus subword total < char total
    assert(enc.map(_._3.toLong).sum < enc.map(_._2.toLong).sum,
      "no merge applied anywhere — learned ranks are not reaching the encode")
  }

  test("round-2 merges have multi-character sides (hand-computed)") {
    // vocab {ababab×10}: round 1 (k=1) learns the char pair "ab"
    // (freq 30 > "ba" 20); the partially-merged string is [ab,ab,ab],
    // so round 2's only candidate is (ab, ab) — both sides multi-char —
    // and the greedy left-to-right apply pairs non-overlapping:
    // [abab, ab], never [ab, abab] or a triple merge
    val wf = Seq(("ababab", 10L)).toDF("w", "wf")
    val m1 = Bpe.learnMerges(wf, 1)
    assert(m1 === Seq("ab"))
    val enc1 = wf.select(col("w"), col("wf"),
      Bpe.applyMerges(Bpe.wrap(col("w")), m1).as("s1"))
    val m2 = Bpe.learnTokenMerges(enc1, "s1", "wf", 1)
    assert(m2 === Seq(("ab", "ab")))
    val seg = enc1
      .select(Bpe.subwords(Bpe.applyTokenMerges(col("s1"), m2)).as("sub"))
      .as[Seq[String]].head()
    assert(seg === Seq("abab", "ab"))
  }

  test("x84 end-to-end: second iteration learns multi-char merges on real data") {
    import graft.text.Bpe
    val wf = QueriesTrainingData.stagedWordFreq(spark, "/root/testdata/sf0.001")
    val m1 = Bpe.learnMerges(wf, 16)
    val enc1 = wf.select(col("w"), col("wf"),
      Bpe.applyMerges(Bpe.wrap(col("w")), m1).as("s1"))
    val m2 = Bpe.learnTokenMerges(enc1, "s1", "wf", 8)
    assert(m2.exists { case (a, b) => a.length > 1 || b.length > 1 },
      s"round 2 learned only character pairs: $m2 — the re-count is not " +
        "seeing round-1 tokens")
    // the gate query's invariants: round 2 never lengthens a
    // segmentation, shortens at least one, and seg2 rebuilds the word
    val out = QueriesTrainingData.x84_bpe_iter2(spark, "/root/testdata/sf0.001")
      .select(col("w"), col("n_sub_r1"), col("n_sub_r2"), col("seg2"))
      .as[(String, Long, Long, String)].collect()
    assert(out.nonEmpty)
    out.foreach { case (w, r1, r2, seg2) =>
      assert(r2 <= r1, s"$w: round 2 grew the segmentation ($r1 -> $r2)")
      assert(seg2.replace("|", "") === w, s"$w segmented as '$seg2'")
    }
    assert(out.exists(o => o._3 < o._2),
      "round 2 merged nothing anywhere — the second iteration is inert")
  }

  test("x93 end-to-end: the multi-round vocabulary carries >=3-char tokens") {
    // four learning rounds (16 + 8x3 merges) must compound: merge sides
    // become multi-character tokens, so the shipped vocabulary contains
    // subwords no single round could build — and the vocabulary's
    // wf-weighted token mass must equal the corpus's segmented mass
    import graft.text.Bpe
    val vocab = QueriesTrainingData.x93_bpe_vocab(spark, "/root/testdata/sf0.001")
      .select(col("token"), col("tok_freq"), col("n_positions"), col("tok_len"))
      .as[(String, Long, Long, Int)].collect()
    assert(vocab.nonEmpty)
    assert(vocab.exists(_._4 >= 3),
      "four rounds produced no >=3-char token — the loop is not compounding")
    // conservation: total wf-weighted positions == sum over words of
    // wf * |final segmentation| (no token created or lost by the rounds)
    val wf = QueriesTrainingData.stagedWordFreq(spark, "/root/testdata/sf0.001")
    val m1 = Bpe.learnMerges(wf, 16)
    val enc1 = wf.select(col("w"), col("wf"),
      Bpe.applyMerges(Bpe.wrap(col("w")), m1).as("s"))
    val encF = (2 to 4).foldLeft(enc1) { (enc, _) =>
      val m = Bpe.learnTokenMerges(enc, "s", "wf", 8)
      enc.withColumn("s", Bpe.applyTokenMerges(col("s"), m))
    }
    val segMass = encF
      .select((col("wf") * size(Bpe.subwords(col("s")))).as("m"))
      .agg(sum(col("m"))).as[Long].head()
    assert(vocab.map(_._2).sum === segMass,
      "vocabulary token mass diverged from the segmented corpus mass")
    // every token rebuilds some word: concatenating each word's final
    // segmentation must reproduce the word (spot the whole vocab side)
    val rebuilt = encF.select(col("w"),
      array_join(Bpe.subwords(col("s")), "").as("r"))
      .filter(col("w") =!= col("r")).count()
    assert(rebuilt === 0L, "a segmentation no longer rebuilds its word")
  }
}
