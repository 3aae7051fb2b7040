package graft.dedup

import graft.text.TextOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard.
  *
  * Scale design (100 TB posture):
  *  - signatures/shingles are computed as narrow per-row array expressions
  *    (no shuffle, no UDF, all codegen'd);
  *  - candidate generation is a *band-bucket equi-join* (shuffle on band
  *    key), never an O(n²) cross join — pairs only materialize inside a
  *    bucket;
  *  - exact dedup is a hash aggregate on the content fingerprint, which
  *    map-side combines before the shuffle.
  * Hashes are md5-derived (not Murmur3 `hash()`) so every signature is
  * reproducible by any SQL engine — the oracle contract.
  */
object DedupOps {

  /** Distinct word n-gram shingles ("w1 w2 w3"-style). Short documents
    * (< n words) contribute their single truncated shingle. */
  def shingles(text: Column, n: Int = 3): Column = {
    val ws = TextOps.tokens(text)
    array_distinct(
      transform(
        sequence(lit(1), greatest(size(ws) - (n - 1), lit(1))),
        i => concat_ws(" ", slice(ws, i, lit(n)))))
  }

  /** One MinHash value: lexicographic min of seed-prefixed md5 over the
    * shingle set. min(md5) over a set is a valid permutation-min family. */
  def minhash(shingleSet: Column, seed: Int): Column =
    array_min(transform(shingleSet, s => md5(concat(lit(s"$seed|"), s))))

  /** MinHash signature of `k` hashes as separate columns sig0..sig{k-1}. */
  def minhashSignature(shingleSet: Column, k: Int): Seq[(String, Column)] =
    (0 until k).map(i => s"sig$i" -> minhash(shingleSet, i))

  /** LSH band keys: bands of `rowsPerBand` consecutive signature values,
    * hashed to one key per band. Docs sharing any band key are candidates. */
  def bandKeys(sigCols: Seq[Column], rowsPerBand: Int): Column = {
    require(sigCols.length % rowsPerBand == 0, "signature length must divide into bands")
    array(sigCols.grouped(rowsPerBand).map(g => md5(concat(g: _*))).toSeq: _*)
  }

  /** Candidate pairs via the band-bucket join. Input must carry `idCol`
    * and an array column `bandsCol`; output: (doc_a, doc_b) distinct with
    * doc_a < doc_b, plus any `carry` columns from both sides (suffixed
    * _a/_b). This is the scale path: shuffle on band key, pairs exist only
    * within a bucket. */
  def lshCandidatePairs(df: DataFrame, idCol: String, bandsCol: String,
      carry: Seq[String] = Nil): DataFrame = {
    val exploded = df.select(
      (col(idCol) +: carry.map(col)) :+ posexplode(col(bandsCol)).as(Seq("band_idx", "band_key")): _*)
    val a = exploded.as("a")
    val b = exploded.as("b")
    val joined = a.join(b,
      col(s"a.band_key") === col(s"b.band_key") &&
        col(s"a.band_idx") === col(s"b.band_idx") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
    val out = joined.select(
      (Seq(col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b")) ++
        carry.map(c => col(s"a.$c").as(s"${c}_a")) ++
        carry.map(c => col(s"b.$c").as(s"${c}_b"))): _*)
    out.dropDuplicates("doc_a", "doc_b")
  }

  /** Jaccard similarity of two pre-distinct shingle arrays, as DOUBLE. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast(DoubleType)
    inter / (size(a) + size(b) - size(array_intersect(a, b))).cast(DoubleType)
  }

  /** SimHash over the distinct token set, `bits` wide (bit b of the
    * signature = sign of Σ_tokens (2·bit_b(h(token)) − 1)). md5-derived
    * 60-bit token hash keeps it engine-reproducible. */
  def simhash(text: Column, bits: Int = 8): Column = {
    val toks = array_distinct(TextOps.tokens(text))
    val sums = (0 until bits).map { b =>
      aggregate(toks, lit(0),
        (acc, w) =>
          acc + (shiftright(TextOps.stableHash64(w), b).bitwiseAND(lit(1L)) * 2 - 1).cast(IntegerType))
    }
    sums.zipWithIndex.map { case (s, b) =>
      when(s >= 0, lit(1 << b)).otherwise(lit(0))
    }.reduce(_ + _)
  }

  /** Exact-duplicate groups on a key expression: one survivor (min id) per
    * group plus group size. Hash aggregate → map-side partial combine. */
  def exactDedup(df: DataFrame, idCol: String, key: Column): DataFrame =
    df.groupBy(key.as("dup_key"))
      .agg(min(col(idCol)).as("survivor_id"), count(lit(1)).as("group_size"))
}
