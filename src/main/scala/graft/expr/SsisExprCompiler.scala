package graft.expr

import graft.types.SsisTypes
import graft.types.SsisTypes.SsisColumnType
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Compiles [[SsisAst]] to a Spark `Column` tree — pure built-in functions,
  * no UDFs, so everything stays inside whole-stage codegen (SURVEY.md §2.8:
  * "every construct lowers to existing functions").
  *
  * Semantics decisions (documented divergences/SURVEY.md §7.4):
  *  - `+` on strings = T-SQL/SSIS NULL-propagating concatenation → Spark
  *    `concat` (also NULL-propagating, unlike T-SQL `CONCAT()`).
  *  - `/` on two integral operands = truncating integer division (C/T-SQL
  *    semantics) → Spark's `div`.
  *  - 1-arg `ISNULL(x)` is the SSIS *boolean* test → `isnull(x)`. The
  *    reference's regex rewrite to `ISNULL(x,'')` (builder.py:483-491)
  *    silently changes semantics; we keep the correct form and expose
  *    `REPLACENULL(x,y)` / 2-arg ISNULL for coalesce.
  *  - `FINDSTRING(s, sub, n)` is 1-based, 0 when absent, like Spark
  *    `locate`; the n-th-occurrence form requires a literal `n` and unrolls
  *    to chained `locate` calls.
  */
object SsisExprCompiler {
  import SsisAst._

  /** Compile-time environment: how column / variable references resolve.
    * `variableValue` (when the binding site knows the runtime value)
    * feeds the type-dispatch lattice, so `@[User::A] + @[User::B]` over
    * string variables compiles to concat, not arithmetic. */
  final case class Env(
      col: String => Column = c => org.apache.spark.sql.functions.col(c),
      colType: String => Option[DataType] = _ => None,
      variable: (String, String) => Column = (ns, n) =>
        throw new IllegalArgumentException(s"unbound SSIS variable @[$ns::$n]"),
      variableValue: (String, String) => Option[Any] = (_, _) => None)

  def compile(input: String, env: Env = Env()): Column =
    SsisExprParser.parse(input).fold(msg => throw new IllegalArgumentException(msg), compileAst(_, env))

  /** Abstract type lattice — only what `+`/`/` dispatch needs. */
  sealed private trait Ty
  private case object TStr extends Ty
  private case object TInt extends Ty
  private case object TFrac extends Ty
  private case object TBool extends Ty
  private case object TOther extends Ty

  private def tyOfDataType(dt: DataType): Ty = dt match {
    case StringType => TStr
    case ByteType | ShortType | IntegerType | LongType => TInt
    case _: DecimalType | FloatType | DoubleType => TFrac
    case BooleanType => TBool
    case _ => TOther
  }

  private def tyOf(ast: SsisAst, env: Env): Ty = ast match {
    case StrLit(_) => TStr
    case IntLit(_) => TInt
    case DecLit(_) => TFrac
    case BoolLit(_) => TBool
    case NullLit(t) => tyOfDataType(SsisTypes.toSpark(t))
    case ColRef(n) => env.colType(n).map(tyOfDataType).getOrElse(TOther)
    case VarRef(ns, n) => env.variableValue(ns, n) match {
      case Some(_: String) => TStr
      case Some(_: Int) | Some(_: Long) | Some(_: Short) | Some(_: Byte) => TInt
      case Some(_: Double) | Some(_: Float) | Some(_: BigDecimal) |
          Some(_: java.math.BigDecimal) => TFrac
      case Some(_: Boolean) => TBool
      case _ => TOther
    }
    case Cast(t, _) => tyOfDataType(SsisTypes.toSpark(t))
    case Unary("!", _) => TBool
    case Unary(_, e) => tyOf(e, env)
    case Ternary(_, t, f) =>
      val a = tyOf(t, env); val b = tyOf(f, env)
      if (a == b) a else if (Set(a, b) == Set(TInt, TFrac)) TFrac else a
    case Binary(op, l, r) =>
      op match {
        case "==" | "!=" | ">" | "<" | ">=" | "<=" | "&&" | "||" => TBool
        case "+" =>
          (tyOf(l, env), tyOf(r, env)) match {
            case (TStr, _) | (_, TStr) => TStr
            case (TFrac, _) | (_, TFrac) => TFrac
            case _ => TInt
          }
        case "/" =>
          (tyOf(l, env), tyOf(r, env)) match {
            case (TInt, TInt) => TInt
            case _ => TFrac
          }
        case _ =>
          (tyOf(l, env), tyOf(r, env)) match {
            case (TFrac, _) | (_, TFrac) => TFrac
            case _ => TInt
          }
      }
    case Call(name, cargs) =>
      name match {
        case "LEN" | "FINDSTRING" | "DATEDIFF" | "DATEPART" | "YEAR" | "MONTH" |
            "DAY" | "TOKENCOUNT" => TInt
        case "SUBSTRING" | "TRIM" | "LTRIM" | "RTRIM" | "UPPER" | "LOWER" |
            "LEFT" | "RIGHT" | "REPLACE" | "REPLICATE" | "REVERSE" | "TOKEN" => TStr
        // 1-arg ISNULL is the boolean null test; 2-arg is coalesce and
        // carries its FIRST argument's type (ISNULL(qty,0)/10 must stay
        // integer division; ISNULL(s,'')+x must stay concat)
        case "ISNULL" if cargs.length == 1 => TBool
        case "ISNULL" | "REPLACENULL" | "COALESCE" | "NULLIF" =>
          cargs.headOption.map(tyOf(_, env)).getOrElse(TOther)
        case _ => TOther
      }
  }

  def compileAst(ast: SsisAst, env: Env): Column = ast match {
    case IntLit(v) =>
      if (v >= Int.MinValue && v <= Int.MaxValue) lit(v.toInt) else lit(v)
    case DecLit(v) => lit(new java.math.BigDecimal(v.bigDecimal.toPlainString))
    case StrLit(s) => lit(s)
    case BoolLit(b) => lit(b)
    case NullLit(t) => lit(null).cast(SsisTypes.toSpark(t))
    case ColRef(n) => env.col(n)
    case VarRef(ns, n) => env.variable(ns, n)
    case Cast(t, e) => compileAst(e, env).cast(SsisTypes.toSpark(t))
    case Unary("!", e) => !compileAst(e, env)
    case Unary("-", e) => -compileAst(e, env)
    case Unary(op, _) => throw new IllegalArgumentException(s"unknown unary $op")
    case Ternary(c, t, f) =>
      when(compileAst(c, env), compileAst(t, env)).otherwise(compileAst(f, env))
    case Binary(op, l, r) =>
      val (lc, rc) = (compileAst(l, env), compileAst(r, env))
      op match {
        case "+" =>
          if (tyOf(l, env) == TStr || tyOf(r, env) == TStr) concat(lc, rc) else lc + rc
        case "-" => lc - rc
        case "*" => lc * rc
        case "/" =>
          if (tyOf(l, env) == TInt && tyOf(r, env) == TInt)
            call_function("div", lc, rc) // truncating integer division
          else lc / rc
        case "%" => lc % rc
        case "==" => lc === rc
        case "!=" => lc =!= rc
        case ">" => lc > rc
        case "<" => lc < rc
        case ">=" => lc >= rc
        case "<=" => lc <= rc
        case "&&" => lc && rc
        case "||" => lc || rc
        case other => throw new IllegalArgumentException(s"unknown operator $other")
      }
    case Call(name, args) => compileCall(name, args, env)
  }

  /** `[\Q<delim>\E]`: a character class over every delimiter character,
    * regex-safe for any delimiter content (except a literal `\E`,
    * documented). */
  private def tokenDelimRegex(delim: Column): Column =
    concat(lit("[\\Q"), delim, lit("\\E]"))

  private def requireArgs(name: String, args: List[SsisAst], ns: Int*): Unit =
    require(ns.contains(args.length), s"$name expects ${ns.mkString("/")} args, got ${args.length}")

  private def litInt(ast: SsisAst, what: String): Int = ast match {
    case IntLit(v) => v.toInt
    case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  private def compileCall(name: String, args: List[SsisAst], env: Env): Column = {
    def c(i: Int) = compileAst(args(i), env)
    name match {
      // ---- null handling ----
      case "ISNULL" =>
        requireArgs(name, args, 1, 2)
        if (args.length == 1) isnull(c(0)) else coalesce(c(0), c(1))
      case "REPLACENULL" | "COALESCE" =>
        require(args.length >= 2, s"$name needs >= 2 args")
        coalesce(args.indices.map(c): _*)
      case "NULLIF" => requireArgs(name, args, 2); nullif(c(0), c(1))
      // ---- strings (all 1-based like SSIS) ----
      case "SUBSTRING" => requireArgs(name, args, 3); substring(c(0), c(1), c(2))
      case "FINDSTRING" =>
        requireArgs(name, args, 2, 3)
        val occ = if (args.length == 3) litInt(args(2), "FINDSTRING occurrence") else 1
        require(occ >= 1, "FINDSTRING occurrence must be >= 1")
        // n-th occurrence: unrolled chain of locate(sub, str, start);
        // each step searches one past the previous hit; 0 propagates as "not found".
        var pos: Column = locate_(c(1), c(0), lit(1))
        for (_ <- 2 to occ)
          pos = when(pos === 0, 0).otherwise(locate_(c(1), c(0), pos + 1))
        pos
      case "LEN" => requireArgs(name, args, 1); length(c(0))
      case "TRIM" => requireArgs(name, args, 1); trim(c(0))
      case "LTRIM" => requireArgs(name, args, 1); ltrim(c(0))
      case "RTRIM" => requireArgs(name, args, 1); rtrim(c(0))
      case "UPPER" => requireArgs(name, args, 1); upper(c(0))
      case "LOWER" => requireArgs(name, args, 1); lower(c(0))
      case "LEFT" => requireArgs(name, args, 2); substring(c(0), lit(1), c(1))
      case "RIGHT" => requireArgs(name, args, 2); call_function("right", c(0), c(1))
      case "REPLACE" => requireArgs(name, args, 3); call_function("replace", c(0), c(1), c(2))
      case "REPLICATE" => requireArgs(name, args, 2); call_function("repeat", c(0), c(1))
      case "REVERSE" => requireArgs(name, args, 1); reverse(c(0))
      case "CONCAT" => concat(args.indices.map(c): _*)
      // SSIS TOKEN semantics: the delimiter argument is a SET of single-
      // character delimiters (not a regex, not one multi-char separator),
      // and empty tokens are skipped (consecutive delimiters collapse).
      // The split regex is a character class quoting the whole delimiter
      // string (`[\Q…\E]` — no metacharacter can escape), built at
      // runtime so variable-driven delimiters work too; empties are
      // filtered after the split.
      case "TOKEN" =>
        requireArgs(name, args, 3)
        val toks = filter(split(c(0), tokenDelimRegex(c(1))), t => t =!= "")
        // 1-based; out-of-range yields the empty string, as SSIS does —
        // `get` (0-based, null-safe) rather than ANSI-throwing element_at.
        // Empty delimiter (illegal as a regex class): whole string = token 1.
        when(length(c(1)) === 0,
            when(c(2).cast(IntegerType) === 1 && length(c(0)) > 0, c(0)).otherwise(lit("")))
          .otherwise(coalesce(get(toks, c(2).cast(IntegerType) - 1), lit("")))
      case "TOKENCOUNT" =>
        requireArgs(name, args, 2)
        when(length(c(0)) === 0, 0)
          .when(length(c(1)) === 0, 1)
          .otherwise(size(filter(split(c(0), tokenDelimRegex(c(1))), t => t =!= "")))
      // ---- dates ----
      case "GETDATE" => requireArgs(name, args, 0); current_timestamp()
      // UTC wall-clock, whatever the session timezone renders now() as
      case "GETUTCDATE" =>
        requireArgs(name, args, 0)
        to_utc_timestamp(current_timestamp(), call_function("current_timezone"))
      case "DATEADD" =>
        requireArgs(name, args, 3)
        val part = datePart(args.head)
        val n = c(1); val d = c(2)
        part match {
          // months slot of make_interval preserves time-of-day (add_months
          // would truncate to DATE — T-SQL DATEADD keeps the time part)
          case "year" => timestampInterval(d, n * 12, "months")
          case "quarter" => timestampInterval(d, n * 3, "months")
          case "month" => timestampInterval(d, n, "months")
          case "week" => timestampInterval(d, n * 7, "days")
          case "day" => timestampInterval(d, n, "days")
          case "hour" => timestampInterval(d, n, "hours")
          case "minute" => timestampInterval(d, n, "mins")
          case "second" => timestampInterval(d, n, "secs")
          case p => throw new IllegalArgumentException(s"DATEADD part $p unsupported")
        }
      case "DATEDIFF" =>
        requireArgs(name, args, 3)
        val part = datePart(args.head)
        val a = c(1); val b = c(2)
        // T-SQL counts datepart *boundary crossings*, so diff on truncations.
        part match {
          case "year" => year(b) - year(a)
          case "quarter" => (year(b) - year(a)) * 4 + (quarter(b) - quarter(a))
          case "month" => (year(b) - year(a)) * 12 + (month(b) - month(a))
          case "week" => // boundary = Sunday-start weeks in T-SQL default
            floor(datediff(next_day(b, "Sun"), next_day(a, "Sun")).cast(DoubleType) / 7).cast(IntegerType)
          case "day" => datediff(to_date(b), to_date(a))
          case "hour" => secondsBetweenTrunc(a, b, "hour", 3600L)
          case "minute" => secondsBetweenTrunc(a, b, "minute", 60L)
          case "second" => secondsBetweenTrunc(a, b, "second", 1L)
          case p => throw new IllegalArgumentException(s"DATEDIFF part $p unsupported")
        }
      case "DATEPART" =>
        requireArgs(name, args, 2)
        datePart(args.head) match {
          case "year" => year(c(1))
          case "quarter" => quarter(c(1))
          case "month" => month(c(1))
          case "week" => weekofyear(c(1))
          case "day" => dayofmonth(c(1))
          case "hour" => hour(c(1))
          case "minute" => minute(c(1))
          case "second" => second(c(1))
          case "weekday" => dayofweek(c(1))
          case p => throw new IllegalArgumentException(s"DATEPART part $p unsupported")
        }
      case "YEAR" => requireArgs(name, args, 1); year(c(0))
      case "MONTH" => requireArgs(name, args, 1); month(c(0))
      case "DAY" => requireArgs(name, args, 1); dayofmonth(c(0))
      // ---- math ----
      case "ABS" => requireArgs(name, args, 1); abs(c(0))
      case "CEILING" => requireArgs(name, args, 1); ceil(c(0))
      case "FLOOR" => requireArgs(name, args, 1); floor(c(0))
      case "ROUND" => requireArgs(name, args, 2); round(c(0), litInt(args(1), "ROUND scale"))
      case "POWER" => requireArgs(name, args, 2); pow(c(0), c(1))
      case "SQRT" => requireArgs(name, args, 1); sqrt(c(0))
      case "SQUARE" => requireArgs(name, args, 1); c(0) * c(0)
      case "SIGN" => requireArgs(name, args, 1); signum(c(0))
      case "EXP" => requireArgs(name, args, 1); exp(c(0))
      case "LN" => requireArgs(name, args, 1); log(c(0))
      case "LOG" => requireArgs(name, args, 1); log10(c(0))
      case other => throw new IllegalArgumentException(s"unsupported SSIS function $other")
    }
  }

  /** `locate` with a Column start offset (functions.locate only takes Int). */
  private def locate_(sub: Column, str: Column, start: Column): Column =
    call_function("locate", sub, str, start)

  private def timestampInterval(d: Column, n: Column, slot: String): Column = {
    val zero = lit(0)
    val iv = slot match {
      case "months" => make_interval(zero, n, zero, zero, zero, zero, lit(0).cast(DecimalType(18, 6)))
      case "days" => make_interval(zero, zero, zero, n, zero, zero, lit(0).cast(DecimalType(18, 6)))
      case "hours" => make_interval(zero, zero, zero, zero, n, zero, lit(0).cast(DecimalType(18, 6)))
      case "mins" => make_interval(zero, zero, zero, zero, zero, n, lit(0).cast(DecimalType(18, 6)))
      case "secs" => make_interval(zero, zero, zero, zero, zero, zero, n.cast(DecimalType(18, 6)))
    }
    d.cast(TimestampType) + iv
  }

  private def secondsBetweenTrunc(a: Column, b: Column, unit: String, secs: Long): Column =
    ((unix_timestamp(date_trunc(unit, b)) - unix_timestamp(date_trunc(unit, a))) / secs)
      .cast(IntegerType)

  /** T-SQL/SSIS datepart spellings → canonical part. */
  private def datePart(ast: SsisAst): String = {
    val raw = ast match {
      case SsisAst.StrLit(s) => s
      case SsisAst.ColRef(s) => s // unquoted datepart keyword parses as identifier
      case other => throw new IllegalArgumentException(s"datepart must be literal, got $other")
    }
    raw.toLowerCase match {
      case "year" | "yyyy" | "yy" => "year"
      case "quarter" | "qq" | "q" => "quarter"
      case "month" | "mm" | "m" => "month"
      case "week" | "wk" | "ww" => "week"
      case "day" | "dd" | "d" => "day"
      case "hour" | "hh" => "hour"
      case "minute" | "mi" | "n" => "minute"
      case "second" | "ss" | "s" => "second"
      case "weekday" | "dw" => "weekday"
      case p => p
    }
  }
}
