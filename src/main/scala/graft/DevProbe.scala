package graft

import graft.dedup.DedupOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler for the expensive queries (x06 today).
  * Not part of the library surface; run via
  * `sbt "runMain graft.DevProbe /root/testdata/sf0.1"`. */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "1048576")
      .config("spark.sql.files.openCostInBytes", "65536")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // warm the scan like Bench does
    spark.read.parquet(s"$dir/documents.parquet").count()

    val docs = Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"), col("text"))

    val banded = docs
      .select(col("doc_id"),
        DedupOps.bandKeysFromSigArray(
          DedupOps.minhashSignatureArray(
            DedupOps.hashedShinglesOf(
              graft.text.TextOps.tokens(col("text")), 3)),
          rowsPerBand = 4, nBands = 2).as("bands"))
      .cache()
    time("signature+cache (banded)")(banded.count())

    val pairs = DedupOps.lshCandidatePairs(banded, "doc_id", "bands")
    time("bucket-join pairs")(pairs.count())

    val candIds = pairs.select(col("doc_a").as("doc_id"))
      .unionByName(pairs.select(col("doc_b").as("doc_id"))).distinct()
    time("candIds")(candIds.count())

    val candSh = docs.join(broadcast(candIds), Seq("doc_id"))
      .select(col("doc_id"), DedupOps.shingles(col("text"), 3).as("sh"))
    time("candSh (shingle recompute)")(candSh.count())

    val fin = pairs
      .join(candSh.toDF("doc_a", "sh_a"), "doc_a")
      .join(candSh.toDF("doc_b", "sh_b"), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        DedupOps.jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
    time("final join+jaccard")(fin.count())

    banded.unpersist()
    time("end-to-end as shipped")(
      QueriesTrainingData.x06_dedup_minhash_lsh(spark, dir).count())
    time("end-to-end again (warm JIT)")(
      QueriesTrainingData.x06_dedup_minhash_lsh(spark, dir).count())

    spark.stop()
  }
}
