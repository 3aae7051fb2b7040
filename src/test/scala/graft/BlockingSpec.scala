package graft

import graft.dedup.{Blocking, DedupOps}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

/** The shared corpus-scaled blocking contract (x12 n-gram Jaccard, x18
  * fuzzy Levenshtein, x08 embedding near-dup): block count derived from
  * the corpus count, power-of-two modulus ladder in exact integer
  * arithmetic, Scala column ≡ oracle SQL text. A blocked operator that
  * regresses to a fixed modulus fails here, not at 100× scale. */
class BlockingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def pow2AtLeast(nb: Long, maxBits: Int): Long = {
    var m = 1L
    while (m < nb && m < (1L << maxBits)) m <<= 1
    m
  }

  test("scaledBucketCount = max(1, ceil(n / target)) — and 1 on an empty frame") {
    val docs = (1 to 500).toDF("doc_id")
    assert(Blocking.scaledBucketCount(docs, 256.0).head().getLong(0) === 2L)
    assert(Blocking.scaledBucketCount(docs, 100.0).head().getLong(0) === 5L)
    assert(Blocking.scaledBucketCount(docs, 500.0).head().getLong(0) === 1L)
    assert(Blocking.scaledBucketCount(docs.limit(0), 256.0).head().getLong(0) === 1L)
  }

  test("powTwoModulus: smallest power of two ≥ nb, capped — column ≡ SQL ladder") {
    val nbs = ((1L to 70L) ++ Seq(127L, 128L, 129L, 255L, 256L, 257L, 100000L)).toDF("nb")
    val out = nbs.select(col("nb"),
        Blocking.powTwoModulus(col("nb"), 8).as("m_col"),
        expr(Blocking.powTwoModulusSql("nb", 8)).cast(LongType).as("m_sql"))
      .collect()
    out.foreach { r =>
      val (nb, mCol, mSql) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(mCol === pow2AtLeast(nb, 8), s"nb=$nb")
      assert(mSql === mCol, s"SQL ladder diverges from the column at nb=$nb")
    }
  }

  test("scaledBits: smallest w in [1,maxBits] with 2^w ≥ ceil(n/target) — ≡ SQL ladder") {
    assert(Blocking.scaledBits(0, 256.0, 16) === 1)
    assert(Blocking.scaledBits(256, 256.0, 16) === 1)
    assert(Blocking.scaledBits(500, 256.0, 16) === 1)   // nb=2 → 2^1
    assert(Blocking.scaledBits(2000, 256.0, 16) === 3)  // nb=8 → 2^3
    assert(Blocking.scaledBits(5000, 256.0, 16) === 5)  // nb=20 → 2^5
    assert(Blocking.scaledBits(Long.MaxValue / 2, 256.0, 16) === 16) // cap
    val nbs = (1L to 300L).toDF("nb")
    nbs.select(col("nb"), expr(Blocking.scaledBitsSql("nb", 8)).cast(LongType).as("w"))
      .collect().foreach { r =>
        val (nb, w) = (r.getLong(0), r.getLong(1))
        val expected = (1 to 8).find(x => (1L << x) >= nb).getOrElse(8)
        assert(w === expected.toLong, s"nb=$nb")
      }
  }

  test("x18/x08 block keys bound real-data membership at sf0.1 (empirical evidence)") {
    // the point of the r8 re-keying: on the REAL corpus no block may hold
    // a corpus-fraction of members. Before the simhash slice, the top
    // (lang, band) block held ~450 docs of 5000 (9%); with the slice the
    // top block must be a small multiple of the slice-divided band.
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    val nbf = Blocking.scaledBucketCount(docs, 256.0)
    val topDoc = docs.crossJoin(broadcast(nbf))
      .select(col("lang"),
        floor(length(col("text")) / 40).as("band"),
        (DedupOps.simhash(col("text"), 16).cast(LongType) %
          Blocking.powTwoModulus(col("nb"), 16)).as("shs"))
      .groupBy("lang", "band", "shs").count()
      .agg(max("count")).head().getLong(0)
    // on THIS corpus the slice is weakly discriminating — the synthetic
    // docs draw from one ~30-word vocabulary, so most distinct-token
    // SETS (and hence simhashes) nearly coincide; the observed top block
    // still drops 450 → ~124. On a natural-vocabulary corpus the slice
    // approaches its uniform 1/32 split (the FuzzyBlockingSpec corpus
    // behaves that way); the asymptotic guarantee is the modulus growth,
    // not per-dataset uniformity.
    assert(topDoc <= 256, s"top x18 block holds $topDoc of 5000 docs — slice not biting")
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.1")
    val planes = graft.sim.SimilarityOps.lshHyperplanes(16, 64)
    val nbe = Blocking.scaledBucketCount(emb, 256.0)
    val topVec = graft.sim.SimilarityOps.withQuantized(emb, "embedding")
      .crossJoin(broadcast(nbe))
      .select((graft.sim.SimilarityOps.lshBucket(col("qvec"), planes).cast(LongType) %
        Blocking.powTwoModulus(col("nb"), 16)).as("blk"))
      .groupBy("blk").count()
      .agg(max("count")).head().getLong(0)
    // sign-LSH buckets are NOT uniform (correlated vectors share signs) —
    // the bound is a loose multiple of the 250-target, not equality
    assert(topVec <= 1200, s"top x08 bucket holds $topVec of 2000 vectors")
  }

  test("within-block membership stays ~target as the corpus grows (the 100× property)") {
    // the x12 contract in miniature: 4× the corpus → ~4× the blocks, NOT
    // ~4× the block size. Uniform ids; assert the max block is O(target).
    def maxBlock(n: Int): Long = {
      val df = (1 to n).map(_.toLong).toDF("doc_id")
      val nb = Blocking.scaledBucketCount(df, 64.0)
      df.crossJoin(broadcast(nb))
        .groupBy(col("doc_id") % col("nb")).count()
        .agg(max("count")).head().getLong(0)
    }
    val m1 = maxBlock(1000)
    val m4 = maxBlock(4000)
    assert(m1 <= 128, s"block membership $m1 not ~64 at n=1000")
    assert(m4 <= 128, s"block membership $m4 grew with the corpus (got $m4)")
  }
}

/** x18's widened block key, measured: docs within the Levenshtein bound
  * must still share a (lang, length-band, simhash-slice) block often
  * enough to be useful — single-table signature blocking trades recall
  * for linear pair growth, so the trade is PINNED here (seeded corpus,
  * deterministic), not assumed. */
class FuzzyBlockingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  // seeded corpus: 150 base docs of ~120 vocab tokens, one copy each —
  // 50 byte-identical, 100 with a single token substituted (edit distance
  // on the 80-char prefix ≤ ~10, well inside x18's 20 bound)
  private val rnd = new scala.util.Random(42)
  private def tok(): String = s"w${rnd.nextInt(500)}"
  private val corpus: Seq[(Long, String, String)] = (0 until 150).flatMap { i =>
    val base = Vector.fill(120)(tok())
    val copy =
      if (i < 50) base
      else base.updated(rnd.nextInt(120), tok())
    Seq((i * 2L, "en", base.mkString(" ")), (i * 2L + 1, "en", copy.mkString(" ")))
  }

  private def blockKeys(modulus: Long): Map[Long, (Long, Long)] = {
    corpus.toDF("doc_id", "lang", "text")
      .select(col("doc_id"),
        floor(length(col("text")) / 40).cast(LongType).as("band"),
        (DedupOps.simhash(col("text"), 8).cast(LongType) % lit(modulus)).as("shs"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  test("exact duplicates ALWAYS share a block, at any modulus") {
    val keys = blockKeys(32L)
    (0 until 50).foreach { i =>
      assert(keys(i * 2L) === keys(i * 2L + 1), s"identical pair $i split across blocks")
    }
  }

  test("single-token near-dups share a block at the sf0.1-scale modulus (recall pinned)") {
    // modulus 32 = the 5-bit slice a 5000-doc corpus derives (nb=20);
    // observed recall on this seeded corpus is 0.86 — pin a floor under
    // it so a key-derivation regression (e.g. hashing the band into the
    // slice, or modding by a non-power-of-two) shows up as a recall cliff
    val keys = blockKeys(32L)
    val hits = (50 until 150).count(i => keys(i * 2L) == keys(i * 2L + 1))
    info(s"measured recall: $hits/100")
    assert(hits >= 70, s"recall ${hits / 100.0} below the pinned floor 0.70")
  }

  test("widening the slice only ever splits blocks (monotone cost/recall knob)") {
    val coarse = blockKeys(2L)
    val fine = blockKeys(32L)
    corpus.foreach { case (id, _, _) =>
      val c = fine(id)
      assert((c._1, c._2 % 2) === coarse(id),
        "fine slice is not a refinement of the coarse slice")
    }
  }
}
