package graft

import graft.ir.Ir.{ColumnInfo, ConnectionManager}
import graft.sim.{IvfIndex, SimilarityOps}
import graft.sources.Sources
import graft.types.SsisTypes.SsisColumnType
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SourcesAndIvfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private val custCols = Seq(
    ColumnInfo("CustomerID", SsisColumnType("i4")),
    ColumnInfo("Email", SsisColumnType("wstr", Some(255))),
    ColumnInfo("Balance", SsisColumnType("numeric", None, Some(12), Some(2))))

  test("CSV round-trip with declared schema (S3): no inference, types honored") {
    val dir = java.nio.file.Files.createTempDirectory("csv-rt").toString + "/out"
    val df = Seq((1, "a@x.com", BigDecimal("10.50")), (2, "b@y.org", BigDecimal("0.25")))
      .toDF("CustomerID", "Email", "Balance")
    Sources.writeCsv(df, dir)
    val back = Sources.readCsv(spark, dir, custCols)
    assert(back.schema("CustomerID").dataType === IntegerType)
    assert(back.schema("Balance").dataType === DecimalType(12, 2))
    assert(back.count() === 2)
    assert(back.filter(col("CustomerID") === 1).head().getAs[java.math.BigDecimal]("Balance")
      .toPlainString === "10.50")
  }

  test("catalog registration + schema assertion (S6)") {
    Sources.registerParquetTable(spark, "cust_ext", "/root/testdata/sf0.001/customer.parquet")
    val df = spark.table("cust_ext")
    assert(df.count() === 150)
    val declared = Seq(
      ColumnInfo("c_custkey", SsisColumnType("i8")),
      ColumnInfo("c_name", SsisColumnType("wstr", Some(50))))
    assert(Sources.assertSchema(df, declared) === Nil)
    val bad = Seq(
      ColumnInfo("c_custkey", SsisColumnType("i4")), // wrong width
      ColumnInfo("missing_col", SsisColumnType("wstr")))
    val mismatches = Sources.assertSchema(df, bad)
    assert(mismatches.map(_.column).toSet === Set("c_custkey", "missing_col"))
  }

  test("connection manager reader options (S7)") {
    val cm = ConnectionManager("r", "SalesDB", "id",
      "Data Source=SALESSRV;Initial Catalog=Sales_OLTP;Provider=SQLNCLI11.1;Password=x;")
    val opts = Sources.readerOptions(cm)
    assert(opts("host") === "SALESSRV")
    assert(opts("url") === "jdbc:sqlserver://SALESSRV;databaseName=Sales_OLTP")
    assert(!opts.values.exists(_.contains("Password")))
  }

  test("IVF index: builds k cells, search beats nothing and approximates brute force") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .repartition(4).cache()
    val model = IvfIndex.build(emb, "vec_id", "embedding", k = 8)
    assert(model.centroids.length === 8)
    assert(model.assigned.select("cell").distinct().count() <= 8)
    val queries = emb.filter(col("vec_id") < 5)
    val approx = IvfIndex.search(spark, model, queries, "vec_id", "embedding",
      k = 3, nProbe = 3).collect()
    assert(approx.length === 15) // 5 queries × top-3
    assert(approx.forall(_.getInt(2) <= 3))
    // recall vs brute force with generous probes should be high
    val brute = SimilarityOps.knnBruteForce(queries, emb, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val wide = IvfIndex.search(spark, model, queries, "vec_id", "embedding",
      k = 3, nProbe = 8).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(wide === brute) // nProbe = k cells ⇒ exhaustive ⇒ exact
    // the approximate mode (nProbe < k, the 100 TB path: score 3/8 of the
    // corpus) must still recover most true neighbors; deterministic given
    // the seeded quantizer, so the bound is a regression gate
    val approxSet = approx.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (approxSet intersect brute).size.toDouble / brute.size
    assert(recall >= 0.6, s"nProbe=3/8 recall@3 regressed: $recall")
  }
}
