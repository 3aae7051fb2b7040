package graft.ops

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed staging — the shuffle-elimination tool for repeated joins.
  *
  * A join between two tables bucketed into the same number of buckets on
  * the join key needs NO Exchange: each task reads bucket i of both sides
  * and merges. Pay the partitioning once at staging time, then every
  * downstream join on that key is co-located — the difference between one
  * shuffle per run and one shuffle per INGEST at 100 TB. (The reference's
  * analog is the indexed staging table its generated DDL creates before
  * fact loads — reference `src/validation/validator.py` staging compare;
  * dbt `{{ config(materialized='table') }}` + warehouse-side clustering.)
  *
  * Staging lifecycle: staging is keyed by DATASET CONTENT (file paths +
  * sizes + mtimes), so a re-run over unchanged data legally reuses the
  * staged files — a fresh application pays only a metadata-only external
  * CREATE TABLE, not a rewrite. When the dataset changes, the key changes
  * and `cleanupStale` removes the previous staging for that same source,
  * so tmpdir holds at most one staging per dataset, never an unbounded
  * run-over-run accumulation.
  */
object Bucketing {

  /** Stage `df` as a bucketed, bucket-sorted external parquet table.
    * Overwrites any previous staging at the same name/path. */
  def stageBucketed(df: DataFrame, table: String, path: String,
      nBuckets: Int, key: String): DataFrame = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    df.write.mode("overwrite").format("parquet")
      .option("path", path)
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .saveAsTable(table)
    spark.table(table)
  }

  /** Idempotent staging with content-addressed reuse:
    *   1. table already in this session's catalog → reuse as-is (free);
    *   2. staged files already on disk (complete: `_SUCCESS` present) →
    *      register a metadata-only external bucketed table over them —
    *      no data rewrite (this is what a fresh application pays);
    *   3. otherwise → write + register via [[stageBucketed]].
    * `build` is by-name: when staging is reusable the source is never
    * even planned.
    */
  def ensureStaged(spark: SparkSession, build: => DataFrame, table: String,
      path: String, nBuckets: Int, key: String): DataFrame = {
    if (spark.catalog.tableExists(table)) return spark.table(table)
    if (new File(path, "_SUCCESS").isFile) {
      val df = build // analysis only — .schema needs no job
      spark.sql(
        s"""CREATE TABLE `$table` (${df.schema.toDDL})
           |USING PARQUET
           |CLUSTERED BY (`$key`) SORTED BY (`$key`) INTO $nBuckets BUCKETS
           |LOCATION '$path'""".stripMargin)
      spark.table(table)
    } else stageBucketed(build, table, path, nBuckets, key)
  }

  /** Collision-resistant suffix for staging table names/paths derived
    * from a source identity string (e.g. the dataset directory): two
    * concurrent sessions or two datasets must never overwrite/reuse each
    * other's staging. SHA-256 prefix, not `hashCode` — 32 bits of a Java
    * string hash collide in practice. */
  def stagingKey(sourceId: String): String = {
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(sourceId.getBytes("UTF-8"))
    digest.take(8).map(b => f"$b%02x").mkString
  }

  /** Content fingerprint of the input files backing a staging: path,
    * length and mtime of every file under each input (file or directory).
    * Same bytes on disk → same key → staging legally reused across
    * applications; touched/replaced data → new key → restaged. */
  def datasetKey(dir: String, inputs: Seq[String]): String = {
    val stats = inputs.sorted.flatMap { in =>
      val root = new File(dir, in)
      val files =
        if (root.isDirectory) root.listFiles().filter(_.isFile).sortBy(_.getName)
        else Array(root)
      files.map(f => s"${f.getAbsolutePath}:${f.length}:${f.lastModified}")
    }
    stagingKey(dir + "|" + stats.mkString(","))
  }

  private val SourceMarker = "_graft_source"

  /** Record which dataset a staging dir was built from, so stale stagings
    * of the SAME dataset (older fingerprints) can be identified later. */
  def writeSourceMarker(stageDir: File, sourceDir: String): Unit = {
    stageDir.mkdirs()
    Files.write(new File(stageDir, SourceMarker).toPath,
      sourceDir.getBytes(StandardCharsets.UTF_8))
  }

  /** Delete sibling `graft_bucketed_*` staging dirs that are (a) built
    * from `sourceDir` under a different (now stale) content key, or
    * (b) marker-less legacy orphans from before content-keyed staging.
    * Bounds tmpdir growth to one live staging per dataset. */
  def cleanupStale(tmpRoot: File, sourceDir: String, currentName: String): Unit = {
    val siblings = Option(tmpRoot.listFiles()).getOrElse(Array.empty)
    siblings.filter { d =>
      d.isDirectory && d.getName.startsWith("graft_bucketed_") &&
        d.getName != currentName && {
          val m = new File(d, SourceMarker)
          !m.isFile || new String(Files.readAllBytes(m.toPath),
            StandardCharsets.UTF_8) == sourceDir
        }
    }.foreach(deleteRecursively)
  }

  private def deleteRecursively(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty)
      .foreach(deleteRecursively)
    f.delete(): Unit
  }

  /** Inner equi-join of two staged bucketed tables. With equal bucket
    * counts on the join keys Spark plans a sort-merge join with ZERO
    * Exchange (asserted in PlanShapeSpec). */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
