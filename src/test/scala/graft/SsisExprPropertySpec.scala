package graft

import graft.expr.{SsisAst, SsisExprCompiler, SsisExprParser}
import graft.expr.SsisExprCompiler.Env
import org.apache.spark.sql.functions._
import org.scalacheck.{Arbitrary, Gen}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the SSIS expression dialect (SURVEY.md §5): the
  * parser round-trips generated expression trees, ternary nesting is
  * arbitrary-depth, and NULL/decimal semantics hold under composition.
  */
class SsisExprPropertySpec extends AnyFunSuite {

  /** Deterministic sampler (no scalatest-scalacheck bridge in the
    * offline cache): n values from fixed seeds. */
  private def forAll[A](g: Gen[A], n: Int = 60)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(42L + i)).foreach(f)
    }
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private lazy val one = Seq(1).toDF("dummy").cache()

  /** Render an AST back to dialect source. */
  private def render(ast: SsisAst): String = ast match {
    case SsisAst.IntLit(v) => v.toString
    case SsisAst.DecLit(v) => v.bigDecimal.toPlainString
    case SsisAst.StrLit(s) => "\"" + s + "\""
    case SsisAst.BoolLit(b) => if (b) "TRUE" else "FALSE"
    case SsisAst.ColRef(n) => s"[$n]"
    case SsisAst.Binary(op, l, r) => s"(${render(l)} $op ${render(r)})"
    case SsisAst.Unary(op, e) => s"$op(${render(e)})"
    case SsisAst.Ternary(c, t, f) => s"(${render(c)} ? ${render(t)} : ${render(f)})"
    case other => sys.error(s"not rendered in tests: $other")
  }

  private val genLeaf: Gen[SsisAst] = Gen.oneOf(
    Gen.choose(0L, 1000L).map(SsisAst.IntLit),
    Gen.choose(0, 99999).map(n => SsisAst.DecLit(BigDecimal(n) / 100)),
    Gen.oneOf(true, false).map(SsisAst.BoolLit))

  private def genNum(depth: Int): Gen[SsisAst] =
    if (depth <= 0) Gen.oneOf(Gen.choose(0L, 1000L).map(SsisAst.IntLit),
      Gen.choose(0, 99999).map(n => SsisAst.DecLit(BigDecimal(n) / 100)))
    else Gen.oneOf(
      Gen.choose(0L, 1000L).map(SsisAst.IntLit),
      for {
        op <- Gen.oneOf("+", "-", "*")
        l <- genNum(depth - 1); r <- genNum(depth - 1)
      } yield SsisAst.Binary(op, l, r))

  private def genBool(depth: Int): Gen[SsisAst] =
    if (depth <= 0) Gen.oneOf(true, false).map(SsisAst.BoolLit)
    else Gen.oneOf(
      Gen.oneOf(true, false).map(SsisAst.BoolLit),
      for {
        op <- Gen.oneOf("&&", "||")
        l <- genBool(depth - 1); r <- genBool(depth - 1)
      } yield SsisAst.Binary(op, l, r),
      for {
        op <- Gen.oneOf("<", "<=", ">", ">=", "==", "!=")
        l <- genNum(depth - 1); r <- genNum(depth - 1)
      } yield SsisAst.Binary(op, l, r))

  private def genTernary(depth: Int): Gen[SsisAst] =
    for {
      c <- genBool(depth - 1)
      t <- genNum(depth - 1)
      f <- if (depth > 1) Gen.oneOf(genNum(depth - 1), genTernary(depth - 1))
        else genNum(0)
    } yield SsisAst.Ternary(c, t, f)

  test("parse(render(ast)) == ast for generated numeric/boolean/ternary trees") {
    forAll(Gen.oneOf(genNum(3), genBool(3), genTernary(3))) { ast =>
      val src = render(ast)
      SsisExprParser.parse(src) match {
        case Right(parsed) => assert(parsed === ast, s"for source: $src")
        case Left(err) => fail(err)
      }
    }
  }

  test("integer arithmetic matches BigInt model semantics") {
    def eval(ast: SsisAst): BigInt = ast match {
      case SsisAst.IntLit(v) => BigInt(v)
      case SsisAst.Binary("+", l, r) => eval(l) + eval(r)
      case SsisAst.Binary("-", l, r) => eval(l) - eval(r)
      case SsisAst.Binary("*", l, r) => eval(l) * eval(r)
      case other => sys.error(s"$other")
    }
    val genIntTree: Gen[SsisAst] = {
      def go(d: Int): Gen[SsisAst] =
        if (d <= 0) Gen.choose(0L, 50L).map(SsisAst.IntLit)
        else Gen.oneOf(Gen.choose(0L, 50L).map(SsisAst.IntLit),
          for { op <- Gen.oneOf("+", "-", "*"); l <- go(d - 1); r <- go(d - 1) }
            yield SsisAst.Binary(op, l, r))
      go(4)
    }
    forAll(genIntTree) { ast =>
      val got = one.select(SsisExprCompiler.compileAst(ast, Env()).cast("long").as("r"))
        .head().getLong(0)
      assert(BigInt(got) === eval(ast))
    }
  }

  test("nested ternaries evaluate like Scala if-chains") {
    def eval(ast: SsisAst): BigDecimal = ast match {
      case SsisAst.IntLit(v) => BigDecimal(v)
      case SsisAst.DecLit(v) => v
      case SsisAst.BoolLit(b) => if (b) 1 else 0
      case SsisAst.Binary(op, l, r) =>
        val (a, b) = (eval(l), eval(r))
        op match {
          case "+" => a + b; case "-" => a - b; case "*" => a * b
          case "<" => if (a < b) 1 else 0; case "<=" => if (a <= b) 1 else 0
          case ">" => if (a > b) 1 else 0; case ">=" => if (a >= b) 1 else 0
          case "==" => if (a == b) 1 else 0; case "!=" => if (a != b) 1 else 0
          case "&&" => if (a != 0 && b != 0) 1 else 0
          case "||" => if (a != 0 || b != 0) 1 else 0
        }
      case SsisAst.Ternary(c, t, f) => if (eval(c) != 0) eval(t) else eval(f)
      case other => sys.error(s"$other")
    }
    forAll(genTernary(3)) { ast =>
      val got = one.select(SsisExprCompiler.compileAst(ast, Env()).cast("double").as("r"))
        .head().getDouble(0)
      assert(BigDecimal(got) === eval(ast), s"for: ${render(ast)}")
    }
  }

  test("NULL propagates through arithmetic and comparisons; ISNULL detects it") {
    val exprsWithNull = Seq(
      "NULL(DT_I4) + 5", "5 * NULL(DT_I4)", "NULL(DT_WSTR,10) + \"x\"",
      "SUBSTRING(NULL(DT_WSTR,10), 1, 2)", "LEN(NULL(DT_WSTR,10))")
    exprsWithNull.foreach { e =>
      val v = one.select(SsisExprCompiler.compile(e, Env()).as("r")).head().get(0)
      assert(v === null, s"expected NULL from: $e")
      val isn = one.select(SsisExprCompiler.compile(s"ISNULL($e)", Env()).as("r"))
        .head().getBoolean(0)
      assert(isn, s"ISNULL should be true for: $e")
    }
  }
}
