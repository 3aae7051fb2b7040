package graft

import graft.expr.{SsisAst, SsisExprCompiler, SsisExprParser}
import graft.expr.SsisExprCompiler.Env
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Expression-dialect compiler, exercised on the exact expressions that
  * appear in the reference's sample packages plus the documented dialect
  * corner cases (SURVEY.md §2.6/§7.4).
  */
class SsisExprSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  private def evalOn[A](df: org.apache.spark.sql.DataFrame, exprStr: String,
      colTypes: Map[String, DataType] = Map.empty): Any = {
    val env = Env(colType = n => colTypes.get(n))
    df.select(SsisExprCompiler.compile(exprStr, env).as("r")).collect()(0).get(0)
  }

  private val one = Seq(1).toDF("dummy")

  test("parses bracketed and bare column refs") {
    assert(SsisExprParser.parse("[Quantity] * [UnitPrice]").isRight)
    assert(SsisExprParser.parse("Quantity * UnitPrice").isRight)
  }

  test("SalesFactETL derived-amount expressions (decimal arithmetic)") {
    val df = Seq((3, BigDecimal("10.50"), BigDecimal("10.00")))
      .toDF("Quantity", "UnitPrice", "DiscountPercent")
    val gross = evalOn(df, "[Quantity] * [UnitPrice]")
    assert(gross.toString.toDouble === 31.5)
    val net = evalOn(df,
      "([Quantity] * [UnitPrice]) - (([Quantity] * [UnitPrice]) * ([DiscountPercent] / 100))",
      Map("Quantity" -> IntegerType, "UnitPrice" -> DecimalType(18, 2),
        "DiscountPercent" -> DecimalType(5, 2)))
    assert(math.abs(net.toString.toDouble - 28.35) < 1e-9)
  }

  test("CustomerDataLoad: FullName concat is NULL-propagating like T-SQL +") {
    val df = Seq(("Ada", "Lovelace"), ("Solo", null))
      .toDF("FirstName", "LastName")
    val types = Map[String, DataType]("FirstName" -> StringType, "LastName" -> StringType)
    val env = Env(colType = n => types.get(n))
    val out = df.select(
      SsisExprCompiler.compile("[FirstName] + \" \" + [LastName]", env).as("r"))
      .collect().map(_.get(0))
    assert(out(0) === "Ada Lovelace")
    assert(out(1) === null) // T-SQL `+` propagates NULL (unlike CONCAT())
  }

  test("CustomerDataLoad: email domain via SUBSTRING/FINDSTRING/LEN (1-based)") {
    val df = Seq("ada@example.com").toDF("Email")
    val r = evalOn(df, "SUBSTRING([Email], FINDSTRING([Email], \"@\", 1) + 1, LEN([Email]))",
      Map("Email" -> StringType))
    assert(r === "example.com")
  }

  test("FINDSTRING nth occurrence unrolls; 0 when absent") {
    val df = Seq("a-b-c").toDF("S")
    assert(evalOn(df, "FINDSTRING([S], \"-\", 2)") === 4)
    assert(evalOn(df, "FINDSTRING([S], \"x\", 1)") === 0)
    assert(evalOn(df, "FINDSTRING([S], \"-\", 3)") === 0)
  }

  test("InventorySync: nested ternary stock status") {
    val expr = "[QuantityAvailable] <= 0 ? \"Out of Stock\" : ([QuantityAvailable] < [ReorderPoint] ? \"Low Stock\" : \"In Stock\")"
    val df = Seq((0, 10), (5, 10), (50, 10)).toDF("QuantityAvailable", "ReorderPoint")
    val env = Env()
    val out = df.select(SsisExprCompiler.compile(expr, env).as("r")).collect().map(_.getString(0))
    assert(out.toSeq === Seq("Out of Stock", "Low Stock", "In Stock"))
  }

  test("InventorySync: int-division guard — int/int truncates (T-SQL), guarded by ternary") {
    val expr = "[ReorderPoint] > 0 ? ([QuantityAvailable] / [ReorderPoint]) * 30 : 0"
    val df = Seq((25, 10), (5, 0)).toDF("QuantityAvailable", "ReorderPoint")
    val types = Map[String, DataType]("QuantityAvailable" -> IntegerType, "ReorderPoint" -> IntegerType)
    val out = df.select(SsisExprCompiler.compile(expr, Env(colType = types.get)).as("r"))
      .collect().map(_.get(0))
    assert(out(0).toString.toDouble === 60.0) // 25/10 = 2 (truncating), *30 = 60
    assert(out(1).toString.toDouble === 0.0)
  }

  test("1-arg ISNULL is the boolean test; REPLACENULL/2-arg coalesces (SURVEY §7.4.2)") {
    val df = Seq((null: String, "x")).toDF("A", "B")
    assert(evalOn(df, "ISNULL([A])") === true)
    assert(evalOn(df, "ISNULL([B])") === false)
    assert(evalOn(df, "ISNULL([A], \"fallback\")") === "fallback")
    assert(evalOn(df, "REPLACENULL([A], [B])") === "x")
  }

  test("SSIS typed casts: (DT_WSTR,50), (DT_NUMERIC,18,2), (DT_I4)") {
    val df = Seq(("42.7", 7)).toDF("S", "N")
    assert(evalOn(df, "(DT_I4)[N]") === 7)
    assert(evalOn(df, "(DT_NUMERIC,18,2)[S]").toString === "42.70")
    assert(evalOn(df, "(DT_WSTR,50)[N]") === "7")
  }

  test("typed NULL literal") {
    val r = one.select(SsisExprCompiler.compile("NULL(DT_I4)", Env()).as("r"))
    assert(r.schema.head.dataType === IntegerType)
    assert(r.collect()(0).get(0) === null)
  }

  test("string functions: LEFT/RIGHT/REPLACE/REPLICATE/UPPER/LOWER/TRIM") {
    val df = Seq("  Hello World  ").toDF("S")
    assert(evalOn(df, "TRIM([S])") === "Hello World")
    assert(evalOn(df, "UPPER(TRIM([S]))") === "HELLO WORLD")
    assert(evalOn(df, "LEFT(TRIM([S]), 5)") === "Hello")
    assert(evalOn(df, "RIGHT(TRIM([S]), 5)") === "World")
    assert(evalOn(df, "REPLACE(TRIM([S]), \"World\", \"SSIS\")") === "Hello SSIS")
    assert(evalOn(one, "REPLICATE(\"ab\", 3)") === "ababab")
    assert(evalOn(one, "TOKEN(\"a,b,c\", \",\", 2)") === "b")
    assert(evalOn(one, "TOKENCOUNT(\"a,b,c\", \",\")") === 3)
  }

  test("date functions: DATEADD/DATEDIFF/DATEPART/YEAR/MONTH/DAY") {
    val df = Seq(java.sql.Timestamp.valueOf("2020-01-31 23:30:00")).toDF("D")
    assert(evalOn(df, "YEAR([D])") === 2020)
    assert(evalOn(df, "MONTH([D])") === 1)
    assert(evalOn(df, "DAY([D])") === 31)
    assert(evalOn(df, "DATEPART(\"hh\", [D])") === 23)
    assert(evalOn(df, "DATEADD(\"dd\", 1, [D])").toString === "2020-02-01 23:30:00.0")
    assert(evalOn(df, "DATEADD(\"mm\", 1, [D])").toString === "2020-02-29 23:30:00.0")
    assert(evalOn(df, "DATEADD(\"hh\", 2, [D])").toString === "2020-02-01 01:30:00.0")
    val df2 = Seq((java.sql.Timestamp.valueOf("2020-12-31 23:59:00"),
      java.sql.Timestamp.valueOf("2021-01-01 00:01:00"))).toDF("A", "B")
    // boundary-crossing semantics: 1 year / 1 month / 1 day / 1 hour apart
    assert(evalOn(df2, "DATEDIFF(\"yyyy\", [A], [B])") === 1)
    assert(evalOn(df2, "DATEDIFF(\"mm\", [A], [B])") === 1)
    assert(evalOn(df2, "DATEDIFF(\"dd\", [A], [B])") === 1)
    assert(evalOn(df2, "DATEDIFF(\"hh\", [A], [B])") === 1)
    assert(evalOn(df2, "DATEDIFF(\"mi\", [A], [B])") === 2)
  }

  test("logical operators and precedence: a || b && c parses as a || (b && c)") {
    import SsisAst._
    val ast = SsisExprParser.parse("TRUE || FALSE && FALSE").toOption.get
    assert(ast === Binary("||", BoolLit(true), Binary("&&", BoolLit(false), BoolLit(false))))
    assert(evalOn(one, "TRUE || FALSE && FALSE") === true)
    assert(evalOn(one, "!(1 == 2)") === true)
    assert(evalOn(one, "5 % 3") === 2)
  }

  test("variables resolve through the environment") {
    val env = Env(variable = (ns, n) => lit(s"$ns::$n"))
    val r = one.select(SsisExprCompiler.compileAst(
      SsisExprParser.parse("@[User::LastSyncTime]").toOption.get, env).as("r"))
    assert(r.collect()(0).getString(0) === "User::LastSyncTime")
  }

  test("unsupported function raises a clear error") {
    val ex = intercept[IllegalArgumentException](evalOn(one, "FROB(1)"))
    assert(ex.getMessage.contains("FROB"))
  }

  test("2-arg ISNULL carries its first argument's type through dispatch") {
    val df = Seq((Some(25), Option.empty[Int], "a", null.asInstanceOf[String]))
      .toDF("qty", "qnull", "s1", "snull")
    val types = Map[String, DataType]("qty" -> IntegerType, "qnull" -> IntegerType,
      "s1" -> StringType, "snull" -> StringType)
    // coalesced INT stays integer division (SSIS truncates), not 2.5
    assert(evalOn(df, "ISNULL(qty, 0) / 10", types) === 2)
    assert(evalOn(df, "ISNULL(qnull, 25) / 10", types) === 2)
    // coalesced STRING + stays concat, not arithmetic-on-strings NULL
    assert(evalOn(df, "ISNULL(snull, \"x\") + s1", types) === "xa")
    // 1-arg ISNULL is still the boolean test
    assert(evalOn(df, "ISNULL(qnull)", types) === true)
  }

  test("string variables concatenate with + (value-informed type dispatch)") {
    val vars = Map("User::Prefix" -> "pre_", "User::FileName" -> "f.csv",
      "User::N" -> 7)
    val env = Env(
      variable = (ns, n) => lit(vars(s"$ns::$n")),
      variableValue = (ns, n) => vars.get(s"$ns::$n"))
    def eval(e: String): Any =
      one.select(SsisExprCompiler.compile(e, env).as("r")).collect()(0).get(0)
    assert(eval("@[User::Prefix] + @[User::FileName]") === "pre_f.csv")
    assert(eval("@[User::N] + 1") === 8)
  }

  test("TOKEN/TOKENCOUNT: delimiter is a char SET, empty tokens skipped (SSIS semantics)") {
    // "." is a delimiter character, never a regex any-char
    assert(evalOn(one, "TOKENCOUNT(\"192.168.1.1\", \".\")") === 4)
    assert(evalOn(one, "TOKEN(\"192.168.1.1\", \".\", 2)") === "168")
    // consecutive delimiters collapse — SSIS skips empty tokens
    assert(evalOn(one, "TOKENCOUNT(\"a,,b\", \",\")") === 2)
    assert(evalOn(one, "TOKEN(\"a,,b\", \",\", 2)") === "b")
    // multi-char delimiter string = set of single-char delimiters
    assert(evalOn(one, "TOKENCOUNT(\"a,b;c\", \",;\")") === 3)
    // out-of-range occurrence yields the empty string, not an ANSI error
    assert(evalOn(one, "TOKEN(\"a,b\", \",\", 9)") === "")
    // regex metachars as delimiters stay literal
    assert(evalOn(one, "TOKENCOUNT(\"a|b+c(d\", \"|+(\")") === 4)
  }

  test("GETUTCDATE returns UTC wall-clock regardless of session timezone") {
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val Seq(utc, local) = one.select(
        SsisExprCompiler.compile("GETUTCDATE()", Env()).cast(LongType).as("u"),
        SsisExprCompiler.compile("GETDATE()", Env()).cast(LongType).as("l"))
        .collect()(0).toSeq.map(_.asInstanceOf[Long]).toSeq
      // NY renders 4-5 hours behind UTC; the UTC wall-clock reading is ahead
      val diffH = (utc - local) / 3600.0
      assert(diffH >= 3.9 && diffH <= 5.1,
        s"GETUTCDATE - GETDATE = $diffH h, expected the NY offset")
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("string literal escapes unescape in one pass (backslash before n survives)") {
    // "\\n" is backslash + n, NOT a newline
    assert(evalOn(one, "\"a\\\\nb\"") === "a\\nb")
    assert(evalOn(one, "\"a\\nb\"") === "a\nb")
    assert(evalOn(one, "\"a\\tb\\\"c\"") === "a\tb\"c")
  }
}
