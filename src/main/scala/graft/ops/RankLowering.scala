package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Scale-safe ROW_NUMBER / RANK / DENSE_RANK / NTILE — the two-phase
  * distributed rank.
  *
  * A raw `row_number() OVER (PARTITION BY p ORDER BY o)` hash-exchanges
  * on `p` and sorts each partition in ONE task; when `p` has tiny
  * cardinality relative to the input (a 5-value market segment over a
  * fact table, or no partition at all), that task sorts ~N/|p| rows —
  * the classic single-task serialization the x34/x59/x60 queries avoid
  * with order-aligned buckets. This generalizes their shape to an
  * ARBITRARY sort order:
  *
  *  1. Every row gets an order-ALIGNED bucket id computed from SAMPLED
  *     VALUE BOUNDARIES: one GLOBALLY-budgeted driver-side sampling
  *     pass over the order key collects ≤ ~2·buckets·128 tuples at any
  *     partition count ([[samplePlan]]), sorts them under the directed
  *     comparator, and turns `buckets-1` cut points into plan
  *     LITERALS (the IVF-centroid / BPE-merge-table convention). The
  *     bucket is then a PURE FUNCTION of the row — every consumer of
  *     the frame agrees bucket-for-row by construction, no matter how
  *     many times the plan re-evaluates.
  *  2. A window over (p, bucket) ranks locally — its hash exchange is
  *     the ONE corpus shuffle; tasks are bounded by bucket size, never
  *     by N/|p|.
  *  3. Bucket COUNTS (a partial-combining aggregate, ≤ buckets rows per
  *     partition key) prefix-scan into per-bucket offsets; the scan
  *     window holds ≤ `buckets` rows per key.
  *  4. local rank + offset joined back on (p, bucket) — AQE picks a
  *     broadcast when the offsets frame is small (low-|p| case) and a
  *     shuffle join when it is not (high-|p| case, where the offsets
  *     frame approaches the row count and a broadcast would be the
  *     scale hazard instead).
  *
  * WHY literal boundaries and not `repartitionByRange` +
  * `spark_partition_id()`: the physical range-partition id is NOT a
  * function of the row — RangePartitioner re-samples per evaluation,
  * so the local-rank window and the bucket-count aggregate only agree
  * when ReuseExchange happens to unify their exchange subtrees. Under
  * AQE that reuse is not guaranteed (observed failing on a 15k-row
  * parquet scan: two `rangepartitioning` exchanges, no reuse, ~30% of
  * rows bucketed differently between the two consumers → duplicate and
  * missing ranks). Literal boundaries close that hazard outright AND
  * delete the range exchange — one corpus shuffle instead of two; the
  * price is the sampling pass (projection-pruned scan of the order
  * columns, the same pass RangePartitioner's sketch ran anyway).
  *
  * Boundary QUALITY only affects bucket balance, never correctness: a
  * bad sample skews task sizes, while bucket-for-row agreement and
  * order alignment hold for ANY boundary set. For ROW_NUMBER a
  * deterministic per-row hash tie-break joins the bucket key, so heavy
  * tie groups still split across buckets (identical full rows share a
  * hash and stay together — the degenerate one-value corpus keeps one
  * bucket, documented). Sort keys must be driver-Comparable (all SQL
  * scalar types are); anything else degrades to one bucket — the raw
  * window's cost, never a wrong answer.
  *
  * Cost vs the raw window: the sampling pass + two small shuffles
  * (bucket counts + the offsets join). Worth it whenever |p| ≪ cores;
  * harmless when not.
  */
object RankLowering {

  /** Per-column sort spec: materialized column name, descending?,
    * nulls-first? — parsed from a caller's `.asc`/`.desc` column. */
  private final case class SortSpec(name: String, desc: Boolean,
      nullsFirst: Boolean)

  /** Split a possibly-SortOrder column into (plain column, spec) — the
    * `.asc`/`.desc` wrapper is a public `ColumnNode` case class, so the
    * direction and null placement read straight off the node. */
  private def parseSort(c: Column, name: String): (Column, SortSpec) =
    c.node match {
      // the SortOrder node class is private[sql] in the Scala pickle,
      // but it IS a Product whose elements are (child, direction,
      // nullOrdering, origin) — read them structurally. ColumnNode
      // itself is public (it's Column's constructor parameter type).
      case s: Product
          if s.getClass.getName == "org.apache.spark.sql.internal.SortOrder" =>
        (columnFromNode(s.productElement(0).asInstanceOf[AnyRef]),
          SortSpec(name,
            desc = s.productElement(1).getClass.getName.endsWith("Descending$"),
            nullsFirst =
              s.productElement(2).getClass.getName.endsWith("NullsFirst$")))
      case _ => (c, SortSpec(name, desc = false, nullsFirst = true))
    }

  /** `new Column(node)` via runtime reflection — the `ColumnNode` type
    * is private[sql] at compile time but public in bytecode. */
  private def columnFromNode(node: AnyRef): Column = {
    val ctor = classOf[Column].getConstructors
      .find(_.getParameterTypes.exists(_.getName.endsWith("ColumnNode")))
      .getOrElse(sys.error("Column(ColumnNode) constructor not found"))
    ctor.newInstance(node).asInstanceOf[Column]
  }

  /** Driver-side directed comparator over sampled key tuples. Values
    * arrive as external Scala/Java types (String, Long, BigDecimal,
    * Timestamp — all Comparable); a non-Comparable pair compares equal,
    * which only flattens boundaries (fewer buckets), never mis-ranks. */
  private def rowOrdering(specs: Seq[SortSpec]): Ordering[Row] =
    new Ordering[Row] {
      private def cmpOne(a: Any, b: Any, s: SortSpec): Int = {
        val nullCmp =
          if (a == null && b == null) Some(0)
          else if (a == null) Some(if (s.nullsFirst) -1 else 1)
          else if (b == null) Some(if (s.nullsFirst) 1 else -1)
          else None
        nullCmp.getOrElse {
          val base = a match {
            case ac: Comparable[_] =>
              scala.util.Try(ac.asInstanceOf[Comparable[Any]].compareTo(b))
                .getOrElse(0)
            case _ => 0
          }
          if (s.desc) -base else base
        }
      }
      override def compare(x: Row, y: Row): Int = {
        var i = 0
        while (i < specs.length) {
          val c = cmpOne(x.get(i), y.get(i), specs(i))
          if (c != 0) return c
          i += 1
        }
        0
      }
    }

  /** `column strictly-after boundary` under one directed spec. Spark's
    * default null placement (asc = nulls first, desc = nulls last) and
    * explicit NULLS FIRST/LAST both encode in the spec. */
  private def afterOne(c: Column, bnd: Column, s: SortSpec): Column = {
    val cAfterNull = if (s.nullsFirst) bnd.isNull && c.isNotNull
      else c.isNull && bnd.isNotNull
    val bothSet = c.isNotNull && bnd.isNotNull
    val gt = if (s.desc) c < bnd else c > bnd
    cAfterNull || (bothSet && gt)
  }

  /** Lexicographic strictly-after across the whole key tuple. */
  private def afterExpr(cols: Seq[Column], bnds: Seq[Column],
      specs: Seq[SortSpec]): Column = {
    val terms = cols.lazyZip(bnds).lazyZip(specs).toSeq
    terms.foldRight(lit(false)) { case ((c, b, s), rest) =>
      afterOne(c, b, s) || (c <=> b && rest)
    }
  }

  /** Global sample-budget plan: (rows per contributing partition,
    * partition stride). A FIXED per-partition count times an unbounded
    * partition count is a driver bottleneck (~800k scan partitions at
    * 100 TB would collect ~100M key tuples) — the RangePartitioner
    * convention caps the TOTAL sketch instead. Budget = buckets × 128
    * tuples; below 64-ish partitions this reproduces the full
    * 128/partition sample exactly (small-SF plans unchanged), past the
    * budget only every `stride`-th partition contributes one row, so
    * the collect stays ≤ ~2× budget at ANY partition count. Boundary
    * QUALITY degrades gracefully with the sample; correctness never
    * depends on it (order alignment holds for any boundary set). */
  private[graft] def samplePlan(numParts: Int, buckets: Int): (Int, Int) = {
    val parts = math.max(numParts, 1)
    val budget = math.max(buckets, 1) * 128
    val perPart = math.min(128, math.max(1, budget / parts))
    val stride = math.max(1, parts / budget)
    (perPart, stride)
  }

  /** Add `bucketCol`: the count of sampled boundaries the row's key
    * tuple sorts strictly after — deterministic, order-aligned, literal
    * boundaries. One bounded sampling job runs at CALL time (the
    * driver-side control-fact convention); `specs` columns must already
    * exist on `df`. */
  private def withValueBuckets(df: DataFrame, specs: Seq[SortSpec],
      bucketCol: String, buckets: Int): DataFrame = {
    val keyCols = specs.map(s => col(s.name))
    val keyTypes: Seq[DataType] = specs.map(s => df.schema(s.name).dataType)
    val keyRdd = df.select(keyCols: _*).rdd
    val (perPart, stride) = samplePlan(keyRdd.getNumPartitions, buckets)
    val sampled: Array[Row] = keyRdd
      .mapPartitionsWithIndex { case (idx, it) =>
        // deterministic per-partition reservoir — though determinism is
        // not load-bearing (whatever is collected becomes the fixed
        // literal set), it keeps reruns comparable
        if (idx % stride != 0) Iterator.empty
        else {
          val rng = new java.util.Random(0x5DEECE66DL ^ idx)
          val buf = new scala.collection.mutable.ArrayBuffer[Row](perPart)
          var seen = 0L
          it.foreach { r =>
            seen += 1
            if (buf.size < perPart) buf += r
            else {
              val j = (rng.nextDouble() * seen).toLong
              if (j < perPart) buf(j.toInt) = r
            }
          }
          buf.iterator
        }
      }.collect()
    if (sampled.isEmpty || buckets <= 1)
      return df.withColumn(bucketCol, lit(0))
    val sorted = sampled.sorted(rowOrdering(specs))
    // evenly spaced cut points; consecutive duplicates collapse (equal
    // boundaries would only make provably-empty buckets)
    val raw = (1 until buckets)
      .map(i => sorted(((i.toLong * sorted.length) / buckets).toInt
        .min(sorted.length - 1)))
    val ord = rowOrdering(specs)
    val bounds = raw.foldLeft(List.empty[Row]) { (acc, r) =>
      if (acc.nonEmpty && ord.compare(acc.head, r) == 0) acc else r :: acc
    }.reverse
    def bndLits(b: Row): Seq[Column] = keyTypes.indices.map { i =>
      val v = b.get(i)
      if (v == null) lit(null).cast(keyTypes(i)) else lit(v).cast(keyTypes(i))
    }
    // binary-search CASE tree: the bucket of a row = number of
    // boundaries it sorts strictly after, found in ⌈log₂ |bounds|⌉
    // directed comparisons per row instead of |bounds| (the linear
    // sum-of-flags form tripled the q83-class query cost)
    val bArr = bounds.toArray
    def search(lo: Int, hi: Int): Column =
      if (lo > hi) lit(lo)
      else {
        val mid = (lo + hi) / 2
        when(afterExpr(keyCols, bndLits(bArr(mid)), specs),
          search(mid + 1, hi)).otherwise(search(lo, mid - 1))
      }
    df.withColumn(bucketCol, search(0, bArr.length - 1))
  }

  /** `row_number()` over (`partCols`, ordered by `orderCols` — pass
    * direction via `.desc`/`.asc`) as an IntegerType column `outCol`,
    * computed with bounded tasks (no partition-sized sort). Pass
    * `partCols = Nil` for a global row number (the q75 full-sort case).
    * Correct for any input plan and any tie distribution: the bucket id
    * is a pure function of the row (literal boundaries + a per-row hash
    * tie-break that lets tie groups split), so the window and the
    * offsets aggregate can never disagree. */
  def rowNumber(df: DataFrame, partCols: Seq[Column], orderCols: Seq[Column],
      outCol: String, buckets: Int = 64): DataFrame = {
    require(orderCols.nonEmpty, "row_number requires an ORDER BY")
    // materialize partition + order EXPRESSIONS once so the window, the
    // count aggregate and the offsets join all key on identical columns
    val pNames = partCols.indices.map(i => s"__graft_rk_p$i")
    val parsed = orderCols.zipWithIndex.map { case (c, i) =>
      parseSort(c, s"__graft_rk_o$i")
    }
    val oSpecs = parsed.map(_._2)
    val hashSpec = SortSpec("__graft_rk_h", desc = false, nullsFirst = true)
    val withPO = (partCols.zip(pNames) ++
      parsed.map { case (c, s) => (c, s.name) })
      .foldLeft(df) { case (d, (c, n)) => d.withColumn(n, c) }
      // deterministic per-row tie-break: heavy tie groups may split
      // across buckets (row_number is order-arbitrary within a tie);
      // identical full rows share a hash and stay together
      .withColumn("__graft_rk_h", xxhash64(df.columns.map(col): _*))
    // bucket key = ORDER columns (+ hash tie-break) only — order
    // alignment within every partition key holds for GLOBAL order-value
    // boundaries, and leaving the partition columns out keeps the
    // boundary CASE chain (codegen size ∝ boundaries × key width) small
    val ranged = withValueBuckets(withPO, oSpecs :+ hashSpec,
      "__graft_rk_b", buckets)
    val directed = oSpecs.map { s =>
      val c = col(s.name)
      (s.desc, s.nullsFirst) match {
        case (false, true) => c.asc
        case (false, false) => c.asc_nulls_last
        case (true, false) => c.desc
        case (true, true) => c.desc_nulls_first
      }
    }
    val wLocal = Window
      .partitionBy((pNames :+ "__graft_rk_b").map(col): _*)
      .orderBy(directed: _*)
    val local = ranged.withColumn("__graft_rk_l", row_number().over(wLocal))
    val wOff = Window.partitionBy(pNames.map(col): _*)
      .orderBy(col("__graft_rk_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offNames = pNames.map(n => n + "_o")
    val offsets = ranged
      .groupBy((pNames :+ "__graft_rk_b").map(col): _*)
      .agg(count(lit(1)).as("__graft_rk_n"))
      .withColumn("__graft_rk_off",
        coalesce(sum(col("__graft_rk_n")).over(wOff), lit(0L)))
      .select(pNames.zip(offNames).map { case (n, o) => col(n).as(o) } ++
        Seq(col("__graft_rk_b").as("__graft_rk_bo"), col("__graft_rk_off")): _*)
    // NULL is a legal partition-key VALUE (a raw window ranks the NULL
    // group like any other), so the offsets join must be null-safe —
    // a plain equality join would silently drop every NULL-keyed row
    val joinCond = pNames.zip(offNames)
      .map { case (n, o) => local(n) <=> offsets(o) }
      .foldLeft(local("__graft_rk_b") === offsets("__graft_rk_bo"))(_ && _)
    local.join(offsets, joinCond)
      .withColumn(outCol,
        (col("__graft_rk_l").cast(LongType) + col("__graft_rk_off"))
          .cast(IntegerType))
      .drop(pNames ++ offNames ++ oSpecs.map(_.name) ++
        Seq("__graft_rk_h", "__graft_rk_b", "__graft_rk_bo",
          "__graft_rk_l", "__graft_rk_off"): _*)
  }

  /** `rank()` / `dense_rank()` over (`partCols`, ordered by `orderPlain`
    * with per-item `descFlags`) as an IntegerType column `outCol`,
    * computed with bounded tasks at ANY partition-key cardinality.
    *
    * Unlike ROW_NUMBER, rank functions are TIE-GROUP functions: every
    * row of a tie group takes the same value, so the two-phase bucket
    * decomposition that is exact for row_number would need a boundary
    * repair (a tie group split across a bucket edge restarts its local
    * rank). This implementation sidesteps boundary repair by ranking
    * the DISTINCT key frame instead:
    *
    *  1. ONE corpus shuffle: `groupBy(part ++ order keys)` with
    *     map-side combining collapses the input to its distinct keys,
    *     each carrying its tie-group size. Ties can never straddle
    *     anything afterwards — each tie group is one row.
    *  2. On the key frame (corpus → |keys| rows):
    *     dense_rank = [[rowNumber]] over the keys (distinct ⇒ no ties);
    *     rank = 1 + exclusive prefix sum of tie-group sizes, the same
    *     literal-boundary bucket scan rowNumber uses, weighted by count.
    *  3. A null-safe join back on the full key — keyed by the
    *     high-cardinality (part, order) tuple, so tasks stay bounded by
    *     tie-group size; AQE picks broadcast when the key frame is
    *     small.
    *
    * NULL order values rank per Spark's null ordering (ASC = NULLS
    * FIRST) — SQL oracles must say so explicitly. */
  def rankLike(df: DataFrame, partCols: Seq[Column], orderPlain: Seq[Column],
      descFlags: Seq[Boolean], outCol: String, dense: Boolean,
      buckets: Int = 64): DataFrame = {
    require(orderPlain.nonEmpty, "rank requires an ORDER BY")
    require(orderPlain.length == descFlags.length,
      "one desc flag per order expression")
    val pNames = partCols.indices.map(i => s"__graft_rkk_p$i")
    val oNames = orderPlain.indices.map(i => s"__graft_rkk_o$i")
    val withPO = (partCols.zip(pNames) ++ orderPlain.zip(oNames))
      .foldLeft(df) { case (d, (c, n)) => d.withColumn(n, c) }
    val keyCols = (pNames ++ oNames).map(col)
    val keyCounts = withPO.groupBy(keyCols: _*)
      .agg(count(lit(1)).as("__graft_rkk_n"))
    val oSpecs = oNames.zip(descFlags).map { case (n, d) =>
      SortSpec(n, d, nullsFirst = !d)
    }
    val directed = oSpecs.map(s =>
      if (s.desc) col(s.name).desc else col(s.name).asc)
    val keyRank =
      if (dense)
        rowNumber(keyCounts, pNames.map(col), directed, "__graft_rkk_r",
          buckets)
          .withColumn("__graft_rkk_r", col("__graft_rkk_r").cast(LongType))
      else {
        // weighted twin of rowNumber's scan over the DISTINCT key frame
        // (no ties ⇒ no hash tie-break needed): local exclusive cumsum
        // of tie-group sizes within literal-boundary buckets +
        // bucket-total offsets — every bucket id a pure row function
        val ranged = withValueBuckets(keyCounts, oSpecs,
          "__graft_rkk_b", buckets)
        val wLocal = Window
          .partitionBy((pNames :+ "__graft_rkk_b").map(col): _*)
          .orderBy(directed: _*)
          .rowsBetween(Window.unboundedPreceding, -1)
        val local = ranged.withColumn("__graft_rkk_cum",
          coalesce(sum(col("__graft_rkk_n")).over(wLocal), lit(0L)))
        val wOff = Window.partitionBy(pNames.map(col): _*)
          .orderBy(col("__graft_rkk_b"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val offNames = pNames.map(_ + "_o")
        val offsets = ranged
          .groupBy((pNames :+ "__graft_rkk_b").map(col): _*)
          .agg(sum(col("__graft_rkk_n")).as("__graft_rkk_bn"))
          .withColumn("__graft_rkk_off",
            coalesce(sum(col("__graft_rkk_bn")).over(wOff), lit(0L)))
          .select(pNames.zip(offNames).map { case (n, o) => col(n).as(o) } ++
            Seq(col("__graft_rkk_b").as("__graft_rkk_bo"),
              col("__graft_rkk_off")): _*)
        val jc = pNames.zip(offNames)
          .map { case (n, o) => local(n) <=> offsets(o) }
          .foldLeft(local("__graft_rkk_b") === offsets("__graft_rkk_bo"))(_ && _)
        local.join(offsets, jc)
          .withColumn("__graft_rkk_r",
            lit(1L) + col("__graft_rkk_cum") + col("__graft_rkk_off"))
      }
    // rename the key frame's columns so the back-join is unambiguous
    val kNames = (pNames ++ oNames).map(_ + "_k")
    val keyed = (pNames ++ oNames).zip(kNames)
      .foldLeft(keyRank)((d, p) => d.withColumnRenamed(p._1, p._2))
      .select((kNames.map(col) :+ col("__graft_rkk_r")): _*)
    val backCond = (pNames ++ oNames).zip(kNames)
      .map { case (n, k) => withPO(n) <=> keyed(k) }
      .reduce(_ && _)
    withPO.join(keyed, backCond)
      .withColumn(outCol, col("__graft_rkk_r").cast(IntegerType))
      .drop(pNames ++ oNames ++ kNames :+ "__graft_rkk_r": _*)
  }

  /** `ntile(n)` over (`partCols`, ordered by `orderCols` — direction via
    * `.desc`/`.asc`) as an IntegerType column `outCol`, with bounded
    * tasks at any partition-key cardinality. NTILE is a pure function of
    * (row_number, partition size, n) — SQL's tile split gives the first
    * `cnt % n` tiles `⌈cnt/n⌉` rows and the rest `⌊cnt/n⌋` — so the plan
    * is [[rowNumber]]'s two-phase rank plus ONE partial-combining
    * partition-count aggregate joined back (broadcast under AQE when
    * |partitions| is small), then a narrow arithmetic projection. NTILE
    * over a non-total order is underdetermined (ties split arbitrarily);
    * gated callers order by a total key, same as row_number. */
  def ntile(df: DataFrame, partCols: Seq[Column], orderCols: Seq[Column],
      n: Int, outCol: String, buckets: Int = 64): DataFrame = {
    require(n >= 1, s"ntile requires a positive tile count: $n")
    val pNames = partCols.indices.map(i => s"__graft_nt_p$i")
    val withP = partCols.zip(pNames).foldLeft(df) {
      case (d, (c, nm)) => d.withColumn(nm, c)
    }
    val rn = rowNumber(withP, pNames.map(col), orderCols, "__graft_nt_rn",
      buckets)
    val cNames = pNames.map(_ + "_c")
    val counts = withP.groupBy(pNames.map(col): _*)
      .agg(count(lit(1)).as("__graft_nt_cnt"))
      .select(pNames.zip(cNames).map { case (p, c) => col(p).as(c) } :+
        col("__graft_nt_cnt"): _*)
    val joined =
      if (pNames.isEmpty) rn.crossJoin(broadcast(counts))
      else rn.join(counts,
        pNames.zip(cNames).map { case (p, c) => rn(p) <=> counts(c) }
          .reduce(_ && _))
    // integer `div`, never `/` (Column./ is DOUBLE division — a tile
    // boundary off by one ulp would truncate into the wrong bucket);
    // first r tiles carry q+1 rows, the rest q; the else branch only
    // evaluates when q >= 1, because rn <= cnt = r when q = 0
    val tile = joined
      .withColumn("__graft_nt_q", expr(s"__graft_nt_cnt div $n"))
      .withColumn("__graft_nt_r", expr(s"__graft_nt_cnt % $n"))
      .withColumn(outCol, expr(
        "CAST(CASE WHEN __graft_nt_rn <= __graft_nt_r * (__graft_nt_q + 1) " +
          "THEN (CAST(__graft_nt_rn AS BIGINT) - 1) div (__graft_nt_q + 1) + 1 " +
          "ELSE __graft_nt_r + (CAST(__graft_nt_rn AS BIGINT) - " +
          "__graft_nt_r * (__graft_nt_q + 1) - 1) div __graft_nt_q + 1 " +
          "END AS INT)"))
    tile.drop(pNames ++ cNames ++
      Seq("__graft_nt_rn", "__graft_nt_cnt", "__graft_nt_q", "__graft_nt_r"): _*)
  }
}
