package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Approximate sketches — the bounded-state twins of the exact operators
  * the gate checks (q28 exact distinct, q49 exact percentiles). At 100 TB
  * the exact forms need the full value multiset per group; the sketches
  * hold constant state per partition and MERGE, so they partial-combine
  * map-side and never concentrate a group's values on one task. The
  * DuckDB oracle can't reproduce another engine's sketch, so these are
  * spec-gated with error bounds instead of hash equality.
  */
class ApproxSketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get

  private val sf = "/root/testdata/sf0.01"
  private lazy val li = spark.read.parquet(s"$sf/lineitem.parquet")

  test("approx_count_distinct stays within its rsd bound of exact") {
    val row = li.agg(
      countDistinct(col("l_orderkey")).as("exact"),
      approx_count_distinct(col("l_orderkey"), rsd = 0.02).as("approx")).head()
    val exact = row.getLong(0).toDouble
    val approx = row.getLong(1).toDouble
    // 0.02 rsd ≈ one-sigma; 4x leaves ~0 flake probability
    assert(math.abs(approx - exact) / exact < 0.08,
      s"exact=$exact approx=$approx")
  }

  test("HLL sketches merge: per-group sketch union estimates within the error band") {
    // the mergeability contract that makes distinct-count pre-aggregation
    // legal at scale: sketch per l_returnflag partition, union the
    // sketches, estimate. Merge-then-estimate is NOT guaranteed to be
    // bit-identical to a direct global sketch (sparse→dense promotion and
    // union target type can differ), so the contract tested is that BOTH
    // estimates land inside the configured error band of the exact count.
    // Default lgConfigK=12 → rsd ≈ 1.04/sqrt(2^12) ≈ 1.6%; 5x slack ≈ 8%.
    val perGroup = li.groupBy(col("l_returnflag"))
      .agg(hll_sketch_agg(col("l_orderkey")).as("sk"))
    val merged = perGroup
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head().getLong(0)
    val direct = li
      .agg(hll_sketch_estimate(hll_sketch_agg(col("l_orderkey"))).as("est"))
      .head().getLong(0)
    val exact = li.select(countDistinct(col("l_orderkey"))).head().getLong(0)
    assert(math.abs(merged.toDouble - exact) / exact < 0.08,
      s"exact=$exact merged=$merged")
    assert(math.abs(direct.toDouble - exact) / exact < 0.08,
      s"exact=$exact direct=$direct")
  }

  test("approx_percentile lands inside the exact rank-error band") {
    // accuracy a => rank error <= 1/a; with a=1000 the p50 estimate must
    // sit between the exact p48 and p52 values (25x slack on 0.1%)
    val row = li.agg(
      expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("approx"),
      expr("percentile(l_extendedprice, 0.48)").as("lo"),
      expr("percentile(l_extendedprice, 0.52)").as("hi")).head()
    val (approx, lo, hi) = (row.getDouble(0), row.getDouble(1), row.getDouble(2))
    assert(approx >= lo && approx <= hi, s"approx=$approx not in [$lo, $hi]")
  }

  test("sketch aggregates partial-combine before the exchange") {
    val plan = li.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_orderkey")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_approx_count_distinct"))
  }

  // ------------------------------------------------- graft.sketch.Hll
  // The engine-reproducible HLL (x49's operator). Unlike the built-in
  // sketches above, its registers are DETERMINISTIC integers, so the
  // merge identity can be asserted EXACTLY, not just within a band.
  import graft.sketch.Hll

  private def idRange(lo: Int, hi: Int) = {
    import spark.implicits._
    spark.range(lo, hi).toDF("id")
  }

  test("Hll raw estimate within 10% at 100k distincts (accurate regime)") {
    val est = Hll.estimate(
      Hll.registers(idRange(0, 100000), col("id"), Seq(lit("g"))), Seq("g0"))
      .head()
    val e = est.getAs[Double]("est_distinct")
    // empirical error at this cardinality is 0.83%; 10% is safely above
    // the ~3-sigma band for m=512 (rsd 4.6%) without flake risk (the
    // input is deterministic, so this never actually varies)
    assert(math.abs(e / 100000.0 - 1.0) < 0.10, s"est=$e")
    assert(est.getAs[Long]("empty_buckets") === 0L)
  }

  test("Hll merge identity is EXACT: registers(A ∪ B) == merge(registers(A), registers(B))") {
    val whole = Hll.registers(idRange(0, 100000), col("id"), Seq(lit("g")))
      .select(col("bucket"), col("m_j"))
    val halves = Hll.merged(
      Hll.registers(idRange(0, 50000), col("id"), Seq(lit("a")))
        .unionByName(Hll.registers(idRange(50000, 100000), col("id"), Seq(lit("b")))),
      Seq(lit("m").as("g0")))
      .select(col("bucket"), col("m_j"))
    assert(whole.exceptAll(halves).isEmpty && halves.exceptAll(whole).isEmpty)
  }

  test("x54 histogram quantile lower bounds bracket the exact percentiles") {
    // the sketch's accuracy contract: p_lo <= exact < p_lo + binWidth
    val sk = QueriesTrainingData.x54_histogram_quantiles(spark, sf)
      .filter(col("g") === "ALL").head()
    val exact = li.agg(
      expr("percentile(l_extendedprice, 0.5)"),
      expr("percentile(l_extendedprice, 0.95)")).head()
    val (p50lo, p95lo) = (sk.getAs[Long]("p50_lo"), sk.getAs[Long]("p95_lo"))
    assert(p50lo <= exact.getDouble(0) && exact.getDouble(0) < p50lo + 500,
      s"p50_lo=$p50lo exact=${exact.getDouble(0)}")
    assert(p95lo <= exact.getDouble(1) && exact.getDouble(1) < p95lo + 500,
      s"p95_lo=$p95lo exact=${exact.getDouble(1)}")
  }

  test("Hll registers partial-combine map-side before the shuffle") {
    val plan = Hll.registers(idRange(0, 1000), col("id"), Seq(lit("g")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_max"))
    assert(!plan.contains("Window"))
  }

  test("count-min estimates dominate exact counts (one-sided CMS guarantee)") {
    val rows = QueriesTrainingData
      .x57_countmin_heavy_hitters(spark, sf)
      .select(col("true_n"), col("est_n")).collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      assert(r.getLong(1) >= r.getLong(0),
        s"CMS under-counted: est=${r.getLong(1)} < true=${r.getLong(0)} — " +
          "min-over-rows can only ever OVER-count (collisions add)")
    }
  }

  test("count-min sketch merge across shards = element-wise register add") {
    // the mergeability contract that makes the sketch a 100 TB operator:
    // registers built per shard then ADDED must equal registers built
    // over the union (counts are linear) — verified on a split corpus
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), explode(graft.text.TextOps.tokens(col("text"))).as("tok"))
      .filter(col("tok") =!= "")
    def registers(df: org.apache.spark.sql.DataFrame) = df
      .select(explode(array((0 until 4).map(lit): _*)).as("r"), col("tok"))
      .select(col("r"),
        pmod(graft.text.TextOps.stableHash64(concat_ws("|", col("r"), col("tok"))), lit(1024))
          .as("bucket"))
      .groupBy(col("r"), col("bucket")).agg(count(lit(1)).as("n"))
    val whole = registers(docs).as[(Int, Long, Long)].collect().toMap2
    val shardA = registers(docs.filter(col("doc_id") % 2 === 0))
    val shardB = registers(docs.filter(col("doc_id") % 2 === 1))
    val merged = shardA.unionByName(shardB)
      .groupBy(col("r"), col("bucket")).agg(sum(col("n")).as("n"))
      .as[(Int, Long, Long)].collect().toMap2
    assert(merged === whole, "shard-merged registers must equal whole-corpus registers")
  }

  private implicit class TupleMap(rows: Array[(Int, Long, Long)]) {
    def toMap2: Map[(Int, Long), Long] = rows.map(t => (t._1, t._2) -> t._3).toMap
  }
}
