package graft.ops

import java.io.File

import org.apache.spark.sql.SparkSession

/** Small-files compaction — the table-maintenance pass every long-lived
  * ingest dataset needs: streaming micro-batches, per-iteration ForEach
  * appends, and over-parallel writes each leave a file per task, and at
  * 100 TB a scan's cost becomes listing/open dominated long before it is
  * byte dominated. Compaction rewrites a parquet directory into
  * ~`targetFileBytes` files and atomically swaps it in place.
  *
  * Shape: size the output file count from the CURRENT on-disk bytes (a
  * directory listing, no data job), `repartition(n)` for even output
  * sizes (a round-robin exchange — coalesce would skip the shuffle but
  * inherits whatever skew the input files carry), write to a scratch
  * directory, then publish with the same atomic-rename idiom as
  * [[Bucketing.ensureStaged]] so a concurrent reader sees either the old
  * files or the new, never a half-written mix. The swap window caveat in
  * [[Bucketing.ensureStaged]] applies here too.
  */
object Compaction {

  final case class CompactionStats(
      filesBefore: Int, filesAfter: Int,
      bytesBefore: Long, bytesAfter: Long)

  private def parquetFiles(dir: File): Seq[File] = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else Seq(f)
    walk(dir).filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
  }

  /** Compact the parquet dataset at `path` toward `targetFileBytes` per
    * file. No-op (returns current stats) when the dataset already has no
    * more than one file over target — rewriting would churn bytes for
    * nothing. */
  def compact(spark: SparkSession, path: String,
      targetFileBytes: Long = 128L * 1024 * 1024): CompactionStats = {
    require(targetFileBytes > 0, s"targetFileBytes must be positive: $targetFileBytes")
    val dir = new File(path)
    val before = parquetFiles(dir)
    val bytesBefore = before.map(_.length).sum
    val nOut = math.max(1, math.ceil(bytesBefore.toDouble / targetFileBytes).toInt)
    if (before.length <= nOut)
      return CompactionStats(before.length, before.length, bytesBefore, bytesBefore)
    val df = spark.read.parquet(path)
    val scratch = new File(path + ".compact-" + java.util.UUID.randomUUID)
    df.repartition(nOut).write.parquet(scratch.getAbsolutePath)
    // atomic swap: old dir aside, scratch in, old deleted — readers see
    // one complete generation or the other
    val old = new File(path + ".old-" + java.util.UUID.randomUUID)
    java.nio.file.Files.move(dir.toPath, old.toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    java.nio.file.Files.move(scratch.toPath, dir.toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    def rm(f: File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete(): Unit
    }
    rm(old)
    val after = parquetFiles(dir)
    CompactionStats(before.length, after.length, bytesBefore, after.map(_.length).sum)
  }
}
