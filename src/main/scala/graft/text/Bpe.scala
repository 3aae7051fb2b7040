package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding subword machinery: learn merge ranks from corpus
  * pair statistics (the x55 primitive) and APPLY them to encode words
  * into subwords — the tokenization loop a training-data pipeline closes
  * before it can budget by subword count (packing, token-budget mixing,
  * shard balancing all consume the counts this produces).
  *
  * Scale shape (the whole point): the corpus collapses ONCE to its
  * word-frequency table (map-side-combining count, vocabulary
  * cardinality); learning is one aggregate over the vocabulary's
  * character-pair explode plus a bounded top-k collect (the merge table
  * is a TOKENIZER MODEL — k rows, a driver-side plan literal exactly like
  * the IVF centroid set); encoding is k chained literal `replace` calls —
  * one narrow codegen'd projection over DISTINCT WORDS, never the token
  * stream. At 100 TB the encode runs over ~10⁷ vocabulary rows while the
  * corpus holds ~10¹² tokens; per-document subword counts then come from
  * one equi-join of the exploded corpus against the (bucketed) encoded
  * vocabulary.
  *
  * Merge ranks come from BOUNDED-ROUND pair statistics rather than the
  * classic per-merge re-count: round 1 ranks adjacent CHARACTER pairs
  * (x55's output, every merge a character pair); round 2
  * ([[tokenPairStats]]/[[learnTokenMerges]], x84) re-counts over the
  * partially-merged vocabulary so merges can have multi-character
  * sides — the tokens real vocabularies contain. Each round is one
  * aggregate + one bounded collect, and the whole apply stays
  * DuckDB-replayable (one recursive CTE level per round, applying rank
  * r at step r), which is what puts these operators under the hash
  * gate instead of a rows-only check.
  *
  * Reference has no tokenizer at all (SURVEY §2 — this is the
  * training-data plane, not reference parity); the BPE scheme follows
  * Sennrich et al. 2016 (arXiv:1508.07909), greedy left-to-right apply.
  */
object Bpe {

  /** Token delimiter inside the encode working string — U+001F (ASCII
    * unit separator), a character that cannot survive whitespace-clean
    * text. Words containing it are excluded (fail-safe, mirrored in the
    * oracle) so the delimiter can never be forged by data. */
  val Sep = "\u001f"
  private val Sep2 = Sep + Sep

  /** Corpus → word-frequency table: ONE tokenize of the corpus, then a
    * map-side-combining count on the word. Empty tokens (split artifacts)
    * and Sep-bearing words are dropped. */
  def wordFrequency(docs: DataFrame): DataFrame =
    docs.select(explode(TextOps.tokens(col("text"))).as("w"))
      .filter(col("w") =!= "" && !col("w").contains(Sep))
      .groupBy(col("w")).agg(count(lit(1)).as("wf"))

  /** Adjacent character-pair statistics over the vocabulary, weighted by
    * word frequency — the x55 definition (QueriesTrainingData.x55): the
    * pair explode runs over distinct words only, |vocab| × avg_len rows. */
  def pairStats(wf: DataFrame): DataFrame =
    wf.filter(length(col("w")) >= 2)
      .select(col("wf"), explode(expr(
        "transform(sequence(1, char_length(w) - 1), i -> substring(w, i, 2))"))
        .as("pair"))
      .groupBy(col("pair")).agg(sum(col("wf")).as("n"))

  /** Top-k merges by (count desc, pair asc — deterministic tie-break),
    * collected: k is small (a tokenizer's merge list), so this is a
    * bounded driver-side control fact that becomes a plan literal, the
    * same convention as the IVF centroid collect. */
  def learnMerges(wf: DataFrame, k: Int): Seq[String] =
    pairStats(wf).orderBy(col("n").desc, col("pair").asc)
      .limit(k).select(col("pair")).collect().map(_.getString(0)).toSeq

  /** Word → boundary-marked working string: every token wrapped in Sep on
    * BOTH sides (adjacent wrappers share no separator), plus one trailing
    * Sep — `"abc"` → `␟a␟␟b␟␟c␟␟`. Both-side marking is what makes a
    * single literal replace per merge correct:
    *  - search `␟a␟␟b␟` can only match where `a` is a COMPLETE token
    *    followed by the complete token `b` (a prefix like `b` of `bc`
    *    has no closing Sep after it);
    *  - replacement `␟ab␟` restores the wrapper invariant, and because
    *    adjacent wrappers don't share separators, back-to-back merge
    *    sites (`aaaa` with merge `aa` → `aa aa`) each keep their full
    *    pattern — left-to-right non-overlapping replace is exactly the
    *    BPE pairing convention.
    * `(?s)` pins Java's `.` to match line-separator codepoints (U+0085
    * etc.) that RE2-based engines already match — whitespace proper can
    * never appear inside a token. */
  def wrap(w: Column): Column =
    concat(lit(Sep), regexp_replace(w, "(?s)(.)", "$1" + Sep2))

  /** Apply the learned merges in rank order: k chained literal `replace`
    * calls (codegen'd StringReplace, no regex at apply time) — one
    * projection, zero shuffles. */
  def applyMerges(s: Column, merges: Seq[String]): Column =
    applyTokenMerges(s, merges.map { pair =>
      // split the 2-codepoint pair BY CODEPOINT (String.substring would
      // shear a surrogate pair; Spark-side substring was codepoint-based)
      val cps = pair.codePoints().toArray
      require(cps.length == 2, s"merge pair must be 2 codepoints: '$pair'")
      (new String(cps, 0, 1), new String(cps, 1, 1))
    })

  /** Apply TOKEN-level merges — the round-2 generalization where each
    * side may be a multi-character token produced by earlier merges.
    * Same both-side-wrapper correctness argument as [[wrap]]; same
    * codegen'd chained-replace shape. */
  def applyTokenMerges(s: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(s) { case (c, (a, b)) =>
      replace(c, lit(Sep + a + Sep2 + b + Sep), lit(Sep + a + b + Sep))
    }

  /** Adjacent TOKEN-pair statistics over partially-merged working
    * strings — the round-2 learning input: after round-1 merges, tokens
    * may be multi-character, so a candidate is an (a, b) token tuple
    * rather than a 2-codepoint string. Still vocabulary-sized (the
    * explode runs over distinct words, weighted by word frequency). */
  def tokenPairStats(encoded: DataFrame, sCol: String,
      wfCol: String): DataFrame =
    encoded
      .select(col(wfCol).as("wf"), subwords(col(sCol)).as("tl"))
      .filter(size(col("tl")) >= 2)
      .select(col("wf"), explode(expr(
        "transform(sequence(1, size(tl) - 1), " +
          "i -> struct(tl[i-1] AS a, tl[i] AS b))")).as("pr"))
      .select(col("wf"), col("pr.a").as("a"), col("pr.b").as("b"))
      .groupBy(col("a"), col("b")).agg(sum(col("wf")).as("n"))

  /** Top-k round-2 merges by (count desc, a asc, b asc — deterministic
    * tie-break), collected under the same bounded tokenizer-model
    * convention as [[learnMerges]]. */
  def learnTokenMerges(encoded: DataFrame, sCol: String, wfCol: String,
      k: Int): Seq[(String, String)] =
    tokenPairStats(encoded, sCol, wfCol)
      .orderBy(col("n").desc, col("a").asc, col("b").asc)
      .limit(k).select(col("a"), col("b")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq

  /** Working string → subword array (drop the separator artifacts). */
  def subwords(s: Column): Column =
    filter(split(s, Sep), x => x =!= "")

  /** Per-document subword counts: explode the corpus ONCE and equi-join
    * the (vocabulary-sized) encoded word table — the bridge that lets
    * packing / token-budget / shard operators budget on subwords. When
    * `encodedVocab` is the bucketed staged artifact, the vocab side of
    * the join is co-located and pre-sorted on `w`. */
  def docSubwordCounts(docs: DataFrame, encodedVocab: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("w"))
      .filter(col("w") =!= "" && !col("w").contains(Sep))
      .join(encodedVocab.select(col("w"), col("n_subwords")), Seq("w"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n_subwords")).as("n_bpe_tokens"),
        count(lit(1)).as("n_ws_tokens"))
}
