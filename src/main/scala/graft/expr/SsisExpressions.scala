package graft.expr

import graft.types.SsisTypes
import graft.types.SsisTypes.SsisColumnType

import scala.util.parsing.combinator.RegexParsers

/** AST for the SSIS expression dialect.
  *
  * Dialect contract from the reference: operator/function inventory at
  * ssis-to-dbt `src/agents/llm/prompts.py:150-164`; ternary / 1-arg-ISNULL /
  * cast handling at `src/agents/builder.py:475-504`; real-world samples in
  * the sample dtsx packages (e.g. nested ternaries at
  * InventorySync.dtsx:223, FINDSTRING/SUBSTRING/LEN at
  * CustomerDataLoad.dtsx:129).
  */
sealed trait SsisAst
object SsisAst {
  final case class IntLit(v: Long) extends SsisAst
  final case class DecLit(v: BigDecimal) extends SsisAst
  final case class StrLit(v: String) extends SsisAst
  final case class BoolLit(v: Boolean) extends SsisAst
  /** `NULL(DT_I4)` — typed null literal. */
  final case class NullLit(t: SsisColumnType) extends SsisAst
  /** `[Column Name]` or bare `ColumnName`. */
  final case class ColRef(name: String) extends SsisAst
  /** `@[User::Foo]` / `@[System::StartTime]` / `@Foo`. */
  final case class VarRef(namespace: String, name: String) extends SsisAst
  final case class Unary(op: String, e: SsisAst) extends SsisAst
  final case class Binary(op: String, l: SsisAst, r: SsisAst) extends SsisAst
  final case class Ternary(cond: SsisAst, t: SsisAst, f: SsisAst) extends SsisAst
  /** `(DT_WSTR,50)expr` / `(DT_NUMERIC,18,2)expr` / `(DT_I4)expr`. */
  final case class Cast(to: SsisColumnType, e: SsisAst) extends SsisAst
  final case class Call(name: String, args: List[SsisAst]) extends SsisAst
}

/** Recursive-descent parser (scala-parser-combinators) for the dialect.
  *
  * Precedence (SSIS follows C): `?:` < `||` < `&&` < `==`/`!=` <
  * relational < additive < multiplicative < unary (`!`, `-`) < cast <
  * postfix/primary.
  */
object SsisExprParser extends RegexParsers {
  import SsisAst._

  override def skipWhitespace = true

  private val dtNames =
    "DT_[A-Z0-9]+".r | "i[1248]".r | "ui[1248]".r | "r[48]".r |
      "wstr" | "str" | "numeric" | "decimal" | "bool" | "cy" | "guid" | "bytes"

  private def castType: Parser[SsisColumnType] =
    ("(" ~> dtNames ~ opt("," ~> "\\d+".r) ~ opt("," ~> "\\d+".r) <~ ")") ^^ {
      case name ~ a ~ b =>
        val canon = SsisTypes.canonical(name)
        canon match {
          case "DT_NUMERIC" | "DT_DECIMAL" =>
            SsisColumnType(name, None, a.map(_.toInt), b.map(_.toInt).orElse(Some(0)))
          case _ => SsisColumnType(name, a.map(_.toInt), None, None)
        }
    }

  // single lexical token: whitespace inside the quotes must survive.
  // ONE left-to-right unescape pass — chained `.replace` calls corrupt
  // mixed sequences (in "\\n" the backslash-escape's second char would be
  // re-read as the start of an \n escape, yielding backslash+newline
  // instead of the literal backslash + 'n')
  private def unescapeStringLit(raw: String): String = {
    val sb = new StringBuilder(raw.length)
    var i = 0
    while (i < raw.length) {
      val ch = raw.charAt(i)
      if (ch == '\\' && i + 1 < raw.length) {
        raw.charAt(i + 1) match {
          case 'n' => sb += '\n'
          case 't' => sb += '\t'
          case '"' => sb += '"'
          case '\\' => sb += '\\'
          case other => sb += '\\' += other // unknown escape: keep verbatim
        }
        i += 2
      } else { sb += ch; i += 1 }
    }
    sb.result()
  }

  private def stringLit: Parser[SsisAst] =
    """"(\\.|[^"\\])*"""".r ^^ { quoted =>
      StrLit(unescapeStringLit(quoted.substring(1, quoted.length - 1)))
    }

  private def numberLit: Parser[SsisAst] =
    """\d+\.\d+""".r ^^ (s => DecLit(BigDecimal(s))) |
      """\d+""".r ^^ (s => IntLit(s.toLong))

  private def boolLit: Parser[SsisAst] =
    ("TRUE" | "FALSE") ^^ (s => BoolLit(s == "TRUE"))

  private def nullLit: Parser[SsisAst] =
    "NULL" ~> castType ^^ NullLit

  private def varRef: Parser[SsisAst] =
    "@[" ~> """[A-Za-z]+""".r ~ ("::" ~> """[A-Za-z_][A-Za-z0-9_ ]*""".r) <~ "]" ^^ {
      case ns ~ n => VarRef(ns, n.trim)
    } |
      "@" ~> """[A-Za-z_][A-Za-z0-9_]*""".r ^^ (n => VarRef("User", n))

  private def bracketCol: Parser[SsisAst] =
    "[" ~> """[^\]]+""".r <~ "]" ^^ (n => ColRef(n.trim))

  private def call: Parser[SsisAst] =
    """[A-Za-z_][A-Za-z0-9_]*""".r ~ ("(" ~> repsep(expr, ",") <~ ")") ^^ {
      case name ~ args => Call(name.toUpperCase, args)
    }

  private def bareIdent: Parser[SsisAst] =
    """[A-Za-z_][A-Za-z0-9_]*""".r ^^ ColRef

  private def primary: Parser[SsisAst] =
    nullLit | boolLit | stringLit | numberLit | varRef | bracketCol |
      call | bareIdent | "(" ~> expr <~ ")"

  private def unary: Parser[SsisAst] =
    ("!" ~> unary) ^^ (e => Unary("!", e)) |
      ("-" ~> unary) ^^ (e => Unary("-", e)) |
      (castType ~ unary) ^^ { case t ~ e => Cast(t, e) } |
      primary

  private def binaryLevel(next: Parser[SsisAst], ops: Parser[String]): Parser[SsisAst] =
    next ~ rep(ops ~ next) ^^ { case first ~ rest =>
      rest.foldLeft(first) { case (acc, op ~ rhs) => Binary(op, acc, rhs) }
    }

  private def multiplicative = binaryLevel(unary, "*" | "/" | "%")
  private def additive = binaryLevel(multiplicative, "+" | "-")
  private def relational = binaryLevel(additive, ">=" | "<=" | ">" | "<")
  private def equality = binaryLevel(relational, "==" | "!=")
  private def andExpr = binaryLevel(equality, "&&")
  private def orExpr = binaryLevel(andExpr, "||")

  def expr: Parser[SsisAst] =
    orExpr ~ opt("?" ~> expr ~ (":" ~> expr)) ^^ {
      case c ~ Some(t ~ f) => Ternary(c, t, f)
      case e ~ None => e
    }

  def parse(input: String): Either[String, SsisAst] =
    parseAll(expr, input) match {
      case Success(ast, _) => Right(ast)
      case NoSuccess.I(msg, rest) =>
        Left(s"SSIS expression parse error at ${rest.pos}: $msg in: $input")
    }
}
