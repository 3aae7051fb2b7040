package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}

/** Corpus-level text pipeline steps (multi-row shapes, unlike the
  * narrow per-row signals in [[TextOps]]): boilerplate-span detection
  * and sequence packing. Both are gated (x29/x30) and spec-tested with
  * planted inputs (CorpusOpsSpec).
  */
object CorpusOps {

  /** Per-source boilerplate-span signal — the C4/CCNet repeated-line
    * filter for a corpus without line structure: an `n`-gram span
    * present in more than `threshold` of a source's DOCUMENTS (document
    * frequency, not occurrence count) is that source's boilerplate.
    * Returns one row per doc: distinct span count, boilerplate span
    * count, boilerplate fraction.
    *
    * Shape at scale: distinct spans per doc via one narrow
    * `array_distinct` HOF before the explode (presence drives DF, so
    * multiplicity drops map-side); (source, span) document counts are a
    * partial-combining hash aggregate (never a window over the span key
    * — a span hitting 10⁸ docs must collapse map-side, not land in one
    * sort partition); per-source doc totals broadcast (source
    * cardinality ≪ corpus); the join back gets AQE's skew-split; the
    * span branch is recomputed on both uses rather than cached
    * (recompute-over-cache — it is corpus-token-sized). */
  def boilerplateSpans(docs: DataFrame, idCol: String, sourceCol: String,
      textCol: String, n: Int = 5, threshold: Double = 0.2): DataFrame = {
    val spans = docs.select(col(idCol), col(sourceCol),
      explode(array_distinct(TextOps.ngrams(TextOps.tokens(col(textCol)), n)))
        .as("gram"))
    val srcDocs = docs.groupBy(col(sourceCol)).agg(count(lit(1)).as("n_docs"))
    val flagged = spans.groupBy(col(sourceCol), col("gram"))
      .agg(count(lit(1)).as("df"))
      .join(broadcast(srcDocs), sourceCol)
      .select(col(sourceCol), col("gram"),
        (col("df").cast(DoubleType) / col("n_docs").cast(DoubleType) > threshold)
          .as("boiler"))
    spans.join(flagged, Seq(sourceCol, "gram"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).cast(LongType).as("n_spans"),
        sum(when(col("boiler"), lit(1L)).otherwise(lit(0L)))
          .cast(LongType).as("n_boiler"))
      .withColumn("boiler_frac",
        col("n_boiler").cast(DoubleType) / col("n_spans").cast(DoubleType))
  }

  /** Greedy in-order sequence packing into ~`cap`-token bins per
    * source: docs are taken in deterministic `idCol` order within their
    * source, and a running token total assigns each doc the bin its
    * FIRST token lands in. A doc straddling a boundary stays in its
    * starting bin (overflow bounded by that doc's own length) — the
    * streaming-friendly packing distributed pipelines actually ship;
    * exact bin packing is inherently sequential.
    *
    * The running total is a TWO-PHASE DISTRIBUTED PREFIX SUM, never a
    * single window over the source key (that shape sorts a whole
    * source's slice in ONE task — the x25 scale-killer class):
    *  1. a monotone bucket key is derived from the numeric id range,
    *     sized so buckets hold ~`bucketRows` rows (corpus-scaled, the
    *     x12 rule: bucket count grows with n, membership stays bounded);
    *  2. the row-level cumsum windows over `(source, bucket)` — each
    *     sort partition is ~`bucketRows` rows regardless of corpus size;
    *  3. bucket totals (one partial-combining aggregate, n/bucketRows
    *     rows) get an EXCLUSIVE per-source scan — the only
    *     source-partitioned window runs over the totals frame, ~4000×
    *     smaller than the corpus — and broadcast back onto the bucket
    *     key. At extreme scale raise `bucketRows` (or hierarchically
    *     repeat the scan) to keep the totals frame driver-sized.
    * The final `cum = local + offset` is exact integer arithmetic,
    * invariant to the bucketing, so any engine bins identically
    * (`div cap`). Ids clustered into a narrow range degrade bucket
    * balance (dense or uniformly-spread ids — the ingest-sequence norm —
    * keep buckets ~`bucketRows`). */
  def sequencePacking(docs: DataFrame, idCol: String, sourceCol: String,
      textCol: String, cap: Int = 512, bucketRows: Int = 4096): DataFrame =
    sequencePackingBySize(docs, idCol, sourceCol,
      size(TextOps.tokens(col(textCol))), "n_tokens", cap, bucketRows)

  /** [[sequencePacking]] generalized over the size column: pack on ANY
    * per-document budget — whitespace tokens (x30), learned subword
    * counts (x68), bytes — with the same two-phase prefix-sum shape. */
  def sequencePackingBySize(docs: DataFrame, idCol: String, sourceCol: String,
      sizeExpr: Column, sizeName: String, cap: Int = 512,
      bucketRows: Int = 4096, idStatsSource: Option[DataFrame] = None): DataFrame = {
    // Phase 0 (driver, column-pruned scan of the id column only): the
    // bucket width that yields ~n/bucketRows monotone buckets. When
    // `docs` embeds an expensive pipeline (x68: the whole subword
    // encode), pass the CHEAP id superset as `idStatsSource` — any
    // superset of the ids gives a valid (merely coarser) bucket width,
    // and the stats row then costs one pruned scan instead of a second
    // full pipeline execution.
    val statsDf = idStatsSource.getOrElse(docs)
    val stats = statsDf.agg(count(lit(1)).as("n"),
      min(col(idCol).cast(LongType)).as("lo"),
      max(col(idCol).cast(LongType)).as("hi")).head()
    val n = stats.getLong(0)
    require(n == 0L || !stats.isNullAt(1),
      s"sequencePacking needs a numeric (castable-to-BIGINT) id column; got `$idCol`")
    val lo = if (n == 0L) 0L else stats.getLong(1)
    val hi = if (n == 0L) 0L else stats.getLong(2)
    val targetBuckets = math.max(1L, (n + bucketRows - 1L) / bucketRows.toLong)
    val width = math.max(1L, (hi - lo) / targetBuckets + 1L)

    val sized = docs.select(col(idCol), col(sourceCol),
        sizeExpr.cast(LongType).as(sizeName))
      .withColumn("__graft_bucket",
        expr(s"(cast(`$idCol` as bigint) - ${lo}L) div ${width}L"))
    twoPhasePrefixSum(sized, Seq(sourceCol), "__graft_bucket", Seq(idCol),
        sizeName, "__graft_cum")
      .select(col(idCol), col(sourceCol), col(sizeName),
        expr(s"(__graft_cum - `$sizeName`) div $cap").as("pack_id"))
  }

  /** Deterministic global corpus shuffle + shard assignment — the step
    * between cleaning and training that randomizes document order (so a
    * shard is not one crawl slice) and cuts the shuffled order into
    * fixed-size shards. The order key is `md5(id || salt)` (reshuffles
    * are a salt change away, and any engine reproduces the permutation);
    * `position` is the 0-based global rank of `(hash, id)` and
    * `shard_id = position div shardDocs`.
    *
    * A global rank is the textbook single-task window — here it is the
    * same TWO-PHASE prefix sum as [[sequencePacking]]: a monotone bucket
    * from the first `k` hex digits of the hash (k grows with the corpus
    * so buckets stay ~`bucketRows` rows — md5 is uniform, so buckets are
    * balanced regardless of id distribution), a bounded local
    * `row_number`, and an exclusive scan over the 16^k bucket counts. */
  def globalShuffleOrder(docs: DataFrame, idCol: String, salt: String,
      shardDocs: Int = 64, bucketRows: Int = 4096): DataFrame = {
    val n = docs.count()
    // smallest hex-prefix length whose 16^k buckets hold ~bucketRows rows
    val k = {
      var kk = 1L
      while (kk < 8L && n / math.pow(16.0, kk.toDouble) > bucketRows) kk += 1
      kk.toInt
    }
    val hashed = docs.select(col(idCol),
        md5(concat(col(idCol).cast(StringType), lit(salt))).as("hx"))
      .withColumn("__graft_bucket",
        conv(substring(col("hx"), 1, k), 16, 10).cast(LongType))
      .withColumn("__graft_one", lit(1L))
    twoPhasePrefixSum(hashed, Seq.empty, "__graft_bucket",
        Seq("hx", idCol), "__graft_one", "__graft_rank")
      .select(col(idCol), col("hx"),
        (col("__graft_rank") - 1L).as("pos"),
        expr(s"(__graft_rank - 1) div $shardDocs").as("shard_id"))
  }

  /** Distributed inclusive prefix sum: `cumCol` = running total of
    * `valueCol` over rows ordered by `orderCols` within `partCols`
    * (empty = one global sequence), given a caller-derived MONOTONE
    * `bucketCol` (non-decreasing along the order, ~bounded rows per
    * bucket — the caller owns the corpus-scaled sizing). Never a single
    * window over the partition key alone (one task per partition at
    * 100× — the x25 scale-killer class):
    *  1. the row-level cumsum windows over `(part, bucket)` — every sort
    *     partition is bucket-sized regardless of corpus size;
    *  2. bucket totals (one partial-combining aggregate, one row per
    *     bucket) get an exclusive per-part scan — the only
    *     partition-key-alone window runs on the totals frame, orders of
    *     magnitude smaller than the corpus;
    *  3. the tiny offset table broadcasts back onto the bucket key.
    * The result is exact arithmetic, invariant to the bucketing, so an
    * oracle keeps the plain single-window form. The input branch is
    * referenced twice and deliberately NOT cached (it is corpus-sized —
    * the x06/x14 recompute-over-cache rule). */
  private[graft] def twoPhasePrefixSum(df: DataFrame, partCols: Seq[String],
      bucketCol: String, orderCols: Seq[String], valueCol: String,
      cumCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pCols = partCols.map(col)
    val wLocal = Window.partitionBy(pCols :+ col(bucketCol): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = df.withColumn("__graft_local", sum(col(valueCol)).over(wLocal))
    val wOff = Window.partitionBy(pCols: _*).orderBy(col(bucketCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = df.groupBy(pCols :+ col(bucketCol): _*)
      .agg(sum(col(valueCol)).as("__graft_tot"))
      .withColumn("__graft_off",
        coalesce(sum(col("__graft_tot")).over(wOff), lit(0L)))
      .select(pCols :+ col(bucketCol) :+ col("__graft_off"): _*)
    local.join(broadcast(offsets), partCols :+ bucketCol)
      .withColumn(cumCol, col("__graft_local") + col("__graft_off"))
      .drop("__graft_local", "__graft_off")
  }

  /** Token-budget sampling: per source, keep documents in deterministic
    * md5-draw order until the source's TOKEN budget is exhausted — the
    * mixing primitive when the recipe says "B tokens of source S", not
    * "N documents" (documents differ 100× in length; a doc-count quota
    * like x25's over-samples verbose sources). A doc is kept iff its
    * INCLUSIVE running token total stays ≤ budget, so the kept set is a
    * deterministic prefix of the draw order and never overshoots.
    *
    * Shape at scale: the running total is [[twoPhasePrefixSum]] over
    * (source, draw-prefix bucket) — the x30/x34 machinery: every sort
    * partition is bucket-sized, the per-source offset scan runs on the
    * tiny bucket-totals frame, offsets broadcast back. One `count()`
    * action sizes the bucket prefix (the documented driver-side cost of
    * a self-tuning layout). */
  def tokenBudgetSample(docs: DataFrame, idCol: String, sourceCol: String,
      tokensCol: String, budget: Long, salt: String,
      bucketRows: Int = 4096): DataFrame = {
    val n = docs.count()
    val k = {
      var kk = 1L
      while (kk < 8L && n / math.pow(16.0, kk.toDouble) > bucketRows) kk += 1
      kk.toInt
    }
    val hashed = docs.select(col(idCol), col(sourceCol), col(tokensCol))
      .withColumn("hx", md5(concat(lit(salt), col(idCol).cast(StringType))))
      .withColumn("__graft_bucket",
        conv(substring(col("hx"), 1, k), 16, 10).cast(LongType))
    twoPhasePrefixSum(hashed, Seq(sourceCol), "__graft_bucket",
        Seq("hx", idCol), tokensCol, "cum_tokens")
      .select(col(idCol), col(sourceCol), col(tokensCol), col("cum_tokens"),
        (col("cum_tokens") <= budget).as("keep"))
  }

  /** Snapshot diff — the incremental-ingest primitive of a long-lived
    * corpus: given two generations keyed by `idCol` with a content
    * fingerprint `fpCol` (use [[TextOps.fingerprint64]]), classify every
    * id as `added` (new only), `removed` (old only), `changed` (both,
    * fingerprints differ) or `unchanged`. Downstream pipelines reprocess
    * ONLY the delta — at 100 TB the difference between a nightly full
    * re-crawl-process and an incremental one.
    *
    * Shape at scale: ONE full-outer hash equi-join on the id — both
    * sides shuffle-partition on the same key (or co-locate for free when
    * the generations are bucketed by id on disk, the `ops.Bucketing`
    * path); the classification is a narrow CASE over the join output.
    * Fingerprints (not full texts) ride the shuffle, so the exchanged
    * bytes are id+8 per row regardless of document size. */
  /** Covered-position sets for exact-substring dedup (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better", at
    * `n`-gram token granularity): a token position is covered when ANY
    * `n`-gram instance through it occurs more than once in the corpus
    * (the x28 duplication signal, kept at instance granularity so the
    * spans are addressable). Returns one row per doc THAT HAS covered
    * positions: (idCol, cov = sorted distinct 1-based positions).
    *
    * Shape at scale (the x28 discipline, extended):
    *  - gram totals are a partial-combining HASH aggregate, never a
    *    window over the gram key (a boilerplate gram in 10⁸ docs must
    *    collapse map-side, not land in one sort partition);
    *  - the (doc, start, gram) branch feeds the aggregate and the join
    *    probe and is RECOMPUTED on both uses (recompute-over-cache: the
    *    frame is corpus-token-sized), with AQE skew-split on the join
    *    back;
    *  - the per-doc covered set is one `collect_set` aggregate — group
    *    size is bounded by the DOCUMENT's own length, the same per-doc
    *    bound every reconstruction shape carries. */
  private[graft] def dupCovered(docs: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame =
    dupGramStarts(docs, idCol, textCol, n)
      .select(col(idCol),
        explode(sequence(col("start"), col("start") + (n - 1))).as("pos"))
      .groupBy(col(idCol))
      .agg(sort_array(collect_set(col("pos"))).as("cov"))

  /** The shared front of the covered-position family: one row per
    * duplicated `n`-gram INSTANCE — (idCol, start), start 1-based. The
    * (doc, start, gram) branch feeds the gram-total aggregate and the
    * join probe and is RECOMPUTED on both uses (recompute-over-cache:
    * corpus-token-sized), with AQE skew-split on the join back. */
  private def dupGramStarts(docs: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    def grams = docs.select(col(idCol),
      posexplode(TextOps.ngrams(TextOps.tokens(col(textCol)), n))
        .as(Seq("i0", "gram")))
      .select(col(idCol), (col("i0") + 1).as("start"), col("gram"))
    val perGram = grams.groupBy(col("gram")).agg(count(lit(1)).as("cnt"))
    grams.join(perGram.filter(col("cnt") > 1), "gram")
      .select(col(idCol), col("start"))
  }

  /** Per-doc removed-token counts only (for compositions that budget on
    * post-clean counts without reconstructing text, e.g. x14).
    *
    * r19 shape: |∪ of [start, start+n−1]| is computed by an INTERVAL
    * MERGE over the sorted dup-gram starts — Σ min(next_start − start,
    * n) with the last interval contributing n — instead of exploding
    * every instance into its n positions and collect_set-deduplicating
    * them: the shuffle carries one INT per dup-gram instance (n× fewer
    * rows) and the aggregate builds no position set. Starts are distinct
    * per doc by construction (one row per gram instance), so the merge
    * is exactly `size(sorted distinct positions)` — CorpusOpsSpec pins
    * the equivalence against [[dupCovered]] on planted overlap shapes. */
  def dupCoveredCounts(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 8): DataFrame = {
    val ss = sort_array(collect_list(col("start")))
    dupGramStarts(docs, idCol, textCol, n)
      .groupBy(col(idCol))
      .agg(ss.as("ss"))
      .select(col(idCol),
        aggregate(
          zip_with(
            col("ss"),
            concat(slice(col("ss"), lit(2), size(col("ss")) - 1),
              array(element_at(col("ss"), -1) + n)),
            (a, b) => least(b - a, lit(n))),
          lit(0), (acc, v) => acc + v).as("n_removed"))
  }

  /** Exact-substring dedup WITH REMOVAL — emits the cleaned text a
    * curation pipeline actually ships (x28 detects; this excises):
    * every covered token position is dropped and the survivors re-join
    * with single spaces (whitespace-normalized on BOTH engines — the
    * no-dup doc is `concat_ws(' ', tokens)`, not the raw text, so the
    * output convention is uniform). Returns (idCol, n_tokens,
    * n_removed, text_clean).
    *
    * Reconstruction is LINEAR, not positions × tokens: the sorted
    * covered set and the token array zip into complement gap slices —
    * `flatten(zip_with(0 ++ cov, cov ++ [len+1], (a,b) -> slice(toks,
    * a+1, b-a-1)))` — one narrow HOF projection per doc, no per-token
    * membership scan (which would go quadratic on a fully-duplicated
    * doc). Docs with no covered positions keep their token array
    * untouched via the left join's null branch. */
  def dupSpanRemoval(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 8): DataFrame = {
    val covered = dupCovered(docs, idCol, textCol, n)
    val toks = TextOps.tokens(col(textCol))
    val nRaw = size(toks)
    val lo = concat(array(lit(0)), col("cov"))
    val hi = concat(col("cov"), array(nRaw + 1))
    val kept = when(col("cov").isNull, toks)
      .otherwise(flatten(zip_with(lo, hi,
        (a, b) => slice(toks, a + 1, b - a - 1))))
    docs.join(covered, Seq(idCol), "left")
      .select(col(idCol),
        TextOps.tokenCountOf(toks).cast(LongType).as("n_tokens"),
        // explicit null branch (not coalesce(size(...))): legacy
        // non-ANSI sessions make size(null) = -1, not null
        when(col("cov").isNull, lit(0)).otherwise(size(col("cov")))
          .cast(LongType).as("n_removed"),
        concat_ws(" ", kept).as("text_clean"))
  }

  def snapshotDiff(oldGen: DataFrame, newGen: DataFrame,
      idCol: String, fpCol: String): DataFrame = {
    val o = oldGen.select(col(idCol).as("__graft_id_o"), col(fpCol).as("fp_old"))
    val n = newGen.select(col(idCol).as("__graft_id_n"), col(fpCol).as("fp_new"))
    o.join(n, col("__graft_id_o") === col("__graft_id_n"), "full_outer")
      .select(
        coalesce(col("__graft_id_o"), col("__graft_id_n")).as(idCol),
        col("fp_old"), col("fp_new"),
        when(col("__graft_id_o").isNull, lit("added"))
          .when(col("__graft_id_n").isNull, lit("removed"))
          .when(col("fp_old") =!= col("fp_new"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }
}
