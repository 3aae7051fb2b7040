package graft

import graft.functions.NativeFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class NativeQDotSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  test("native qdot equals the HOF fold on real embeddings (incl. codegen path)") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001").limit(100)
    val q = graft.sim.SimilarityOps.withQuantized(emb, "embedding")
      .select(col("vec_id"), col("qvec"))
    val pairs = q.toDF("ida", "va").crossJoin(q.toDF("idb", "vb")).limit(500)
    val hof = pairs.select(col("ida"), col("idb"),
      aggregate(zip_with(col("va"), col("vb"), (x, y) => x * y), lit(0L),
        (acc, x) => acc + x).as("d")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val native = pairs.select(col("ida"), col("idb"),
      NativeFunctions.qdot(col("va"), col("vb")).as("d")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(native === hof)
  }

  test("multiple qdot instances in ONE stage compile under CODEGEN_ONLY (no name collision)") {
    // non-nullable children skip nullSafeCodeGen's brace wrapping, so all
    // instances' locals land in one Java method scope — fixed identifiers
    // would redeclare and Janino would reject the class (Spark then
    // silently falls back to interpreted). CODEGEN_ONLY turns that
    // silent fallback into a test failure.
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      val df = Seq((Seq(1L, 2L, 3L), Seq(4L, 5L, 6L))).toDF("a", "b")
        .select(col("a"), col("b"))
      // three instances, as cosineQ emits: dot + both norms
      val out = df.select(
        NativeFunctions.qdot(col("a"), col("b")).as("d"),
        NativeFunctions.qdot(col("a"), col("a")).as("na"),
        NativeFunctions.qdot(col("b"), col("b")).as("nb")).head()
      assert(out.getLong(0) === 32L)
      assert(out.getLong(1) === 14L)
      assert(out.getLong(2) === 77L)
    } finally {
      prev.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
    }
  }

  test("minhash permutation arrays validate length and null slots (SQL-registered path)") {
    NativeFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_minhash_sig(array(1L,2L), array(3L,4L), array(5L))").collect()
    }
    assert(e.getMessage.contains("equal length") ||
      Option(e.getCause).exists(_.getMessage.contains("equal length")))
  }

  test("null array and null element both yield NULL (HOF parity)") {
    val df = Seq(
      (Seq[java.lang.Long](1L, 2L), Seq[java.lang.Long](3L, 4L)),
      (Seq[java.lang.Long](1L, null), Seq[java.lang.Long](3L, 4L)))
      .toDF("a", "b")
      .union(Seq((null, Seq[java.lang.Long](1L))).toDF("a", "b"))
    val out = df.select(NativeFunctions.qdot(col("a"), col("b"))).collect().map(_.get(0))
    assert(out(0) === 11L)
    assert(out(1) === null)
    assert(out(2) === null)
  }

  test("expression participates in whole-stage codegen over a real scan") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val df = graft.sim.SimilarityOps.withQuantized(emb, "embedding")
      .select(NativeFunctions.qdot(col("qvec"), col("qvec")).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    // the "*(n)" stage prefix marks whole-stage-codegen'd operators
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("graft_qdot")),
      s"graft_qdot not inside a codegen stage:\n$plan")
    assert(df.agg(max(col("d"))).head().getLong(0) > 0L)
  }

  test("GraftExtensions injects natives for SQL-only sessions") {
    import org.apache.spark.sql.SparkSession
    val prev = spark // keep the shared session to restore after
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // reuses prev's SparkContext; extensions apply to the new session
      val s2 = SparkSession.builder()
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      assert(s2 ne prev)
      val d = s2.sql("SELECT graft_qdot(array(1L, 2L), array(3L, 4L)) AS d")
        .head().getLong(0)
      assert(d === 11L)
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("graft_nfc: codegen parity with java.text.Normalizer; null; astral-safe") {
    // composed stays byte-identical (the no-copy fast path), decomposed
    // recomposes, ASCII untouched, NULL propagates, and a string with an
    // astral (non-BMP) codepoint survives the round trip
    val composed = "caf\u00e9"
    val decomposed = "cafe\u0301"
    val astral = "a\ud83d\ude00b" + "e\u0301"
    val rows = Seq(Some(composed), Some(decomposed), Some("plain"),
      Some(astral), None)
    val got = rows.toDF("s")
      .select(NativeFunctions.nfc(col("s")).as("n"))
      .as[Option[String]].collect().toSeq
    val expect = rows.map(_.map(
      java.text.Normalizer.normalize(_, java.text.Normalizer.Form.NFC)))
    assert(got === expect)
    assert(got(0).get === composed && got(1).get === composed)
    // the expression stays codegen'd: force CODEGEN_ONLY and re-run
    val conf = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.getAll.get(conf)
    spark.conf.set(conf, "CODEGEN_ONLY")
    try {
      val again = rows.toDF("s")
        .select(NativeFunctions.nfc(col("s")).as("n"))
        .as[Option[String]].collect().toSeq
      assert(again === expect)
    } finally prev match {
      case Some(v) => spark.conf.set(conf, v)
      case None => spark.conf.unset(conf)
    }
  }
}
