package graft.types

import org.apache.spark.sql.types._

/** SSIS `DT_*` / component-XML type system → Spark `DataType`.
  *
  * Mirrors the reference's mapping table (ssis-to-dbt
  * `src/parser/type_mappings.py:7-99`): both the `DT_*` spellings used in
  * Execute-SQL metadata and the lowercase spellings used in dataflow
  * component XML (`i4`, `wstr`, `dbTimeStamp`, ...). Unknown types fall back
  * to NVARCHAR(MAX) ≙ `StringType` (type_mappings.py:83).
  *
  * Spark has no TIME type; `DT_DBTIME`/`DT_DBTIME2` map to `StringType`
  * ("HH:mm:ss[.fffffff]") — documented divergence, SURVEY.md §1.2.
  */
object SsisTypes {

  /** Parsed SSIS type descriptor as it appears on an outputColumn. */
  final case class SsisColumnType(
      name: String,
      length: Option[Int] = None,
      precision: Option[Int] = None,
      scale: Option[Int] = None)

  /** Canonical (upper, `DT_`-prefixed) spelling of a component-XML type. */
  def canonical(t: String): String = t match {
    case s if s.startsWith("DT_") => s
    case "i1" => "DT_I1"; case "i2" => "DT_I2"; case "i4" => "DT_I4"; case "i8" => "DT_I8"
    case "ui1" => "DT_UI1"; case "ui2" => "DT_UI2"; case "ui4" => "DT_UI4"; case "ui8" => "DT_UI8"
    case "r4" => "DT_R4"; case "r8" => "DT_R8"
    case "wstr" => "DT_WSTR"; case "str" => "DT_STR"; case "text" => "DT_TEXT"; case "nText" => "DT_NTEXT"
    case "bool" => "DT_BOOL"
    case "dbTimeStamp" => "DT_DBTIMESTAMP"; case "dbTimeStamp2" => "DT_DBTIMESTAMP2"
    case "dbTimeStampOffset" => "DT_DBTIMESTAMPOFFSET"
    case "dbDate" => "DT_DBDATE"; case "dbTime" => "DT_DBTIME"; case "dbTime2" => "DT_DBTIME2"
    case "date" => "DT_DATE"; case "fileTime" => "DT_FILETIME"
    case "guid" => "DT_GUID"; case "bytes" => "DT_BYTES"; case "image" => "DT_IMAGE"
    case "numeric" => "DT_NUMERIC"; case "decimal" => "DT_DECIMAL"; case "cy" => "DT_CY"
    case other => other
  }

  /** SSIS type → Spark DataType (SURVEY.md §1.2 table). */
  def toSpark(t: SsisColumnType): DataType = canonical(t.name) match {
    case "DT_STR" | "DT_WSTR" | "DT_TEXT" | "DT_NTEXT" => StringType
    case "DT_I1" => ByteType
    case "DT_I2" => ShortType
    case "DT_I4" => IntegerType
    case "DT_I8" => LongType
    // unsigned types widen one step so the full value range fits:
    case "DT_UI1" => ShortType
    case "DT_UI2" => IntegerType
    case "DT_UI4" => LongType
    case "DT_UI8" => DecimalType(20, 0)
    case "DT_DECIMAL" | "DT_NUMERIC" =>
      DecimalType(t.precision.getOrElse(38), t.scale.getOrElse(0))
    case "DT_CY" => DecimalType(19, 4) // MONEY
    case "DT_R4" => FloatType
    case "DT_R8" => DoubleType
    case "DT_DATE" | "DT_DBTIMESTAMP" | "DT_DBTIMESTAMP2" | "DT_FILETIME" |
        "DT_DBTIMESTAMPOFFSET" => TimestampType
    case "DT_DBDATE" => DateType
    case "DT_DBTIME" | "DT_DBTIME2" => StringType
    case "DT_BOOL" => BooleanType
    case "DT_GUID" => StringType
    case "DT_BYTES" | "DT_IMAGE" => BinaryType
    case _ => StringType // unknown → NVARCHAR(MAX) (type_mappings.py:83)
  }

  /** SSIS type → SQL Server type string, incl. length/precision/scale
    * composition — tooling-parity with `map_ssis_type_to_sql`
    * (type_mappings.py:65-99). */
  def toSqlServer(t: SsisColumnType): String = {
    val base = canonical(t.name) match {
      case "DT_STR" => "VARCHAR"
      case "DT_WSTR" => "NVARCHAR"
      case "DT_TEXT" => "VARCHAR(MAX)"
      case "DT_NTEXT" => "NVARCHAR(MAX)"
      case "DT_I1" | "DT_UI1" => "TINYINT"
      case "DT_I2" => "SMALLINT"
      case "DT_I4" | "DT_UI2" => "INT"
      case "DT_I8" | "DT_UI4" => "BIGINT"
      case "DT_UI8" => "NUMERIC(20,0)"
      case "DT_DECIMAL" => "DECIMAL"
      case "DT_NUMERIC" => "NUMERIC"
      case "DT_CY" => "MONEY"
      case "DT_R4" => "REAL"
      case "DT_R8" => "FLOAT"
      case "DT_DATE" | "DT_DBTIMESTAMP" | "DT_FILETIME" => "DATETIME"
      case "DT_DBDATE" => "DATE"
      case "DT_DBTIME" | "DT_DBTIME2" => "TIME"
      case "DT_DBTIMESTAMP2" => "DATETIME2"
      case "DT_DBTIMESTAMPOFFSET" => "DATETIMEOFFSET"
      case "DT_BOOL" => "BIT"
      case "DT_GUID" => "UNIQUEIDENTIFIER"
      case "DT_BYTES" => "VARBINARY"
      case "DT_IMAGE" => "VARBINARY(MAX)"
      case _ => "NVARCHAR(MAX)"
    }
    canonical(t.name) match {
      case "DT_WSTR" | "DT_STR" if t.length.isDefined => s"$base(${t.length.get})"
      case "DT_DECIMAL" | "DT_NUMERIC" if t.precision.isDefined =>
        // keep the computed base: a sized DT_DECIMAL is DECIMAL(p,s), not
        // NUMERIC(p,s) — PackageJson exports this string as sql_type for
        // reference parity
        t.scale match {
          case Some(s) => s"$base(${t.precision.get},$s)"
          case None => s"$base(${t.precision.get})"
        }
      case "DT_BYTES" if t.length.isDefined => s"VARBINARY(${t.length.get})"
      case _ => base
    }
  }

  private val camel1 = "(.)([A-Z][a-z]+)".r
  private val camel2 = "([a-z0-9])([A-Z])".r

  /** `CustomerID` → `customer_id`; same two-pass regex contract as the
    * reference's `get_snake_case` (type_mappings.py:141-157). */
  def snakeCase(name: String): String = {
    // quoteReplacement: a '$' or '\\' in the captured text (both legal in
    // SQL Server identifiers) is otherwise a group reference in the
    // replacement string - IllegalArgumentException at runtime
    def join(m: scala.util.matching.Regex.Match): String =
      scala.util.matching.Regex.quoteReplacement(m.group(1) + "_" + m.group(2))
    val s1 = camel1.replaceAllIn(name, join _)
    val s2 = camel2.replaceAllIn(s1, join _)
    s2.toLowerCase
  }

  private val identRe = "^[A-Za-z_][A-Za-z0-9_]*$".r

  /** Identifier validation mirroring `validate_sql_identifier`
    * (reference `src/parser/utils.py:139-161`): rejects anything that could
    * smuggle SQL through generated casts. */
  def isValidIdentifier(name: String): Boolean =
    name.nonEmpty && name.length <= 128 && identRe.matches(name)

  /** Strip characters that are not valid in an identifier (non-strict mode
    * of `get_dbt_cast_expression`, type_mappings.py:122-127). */
  def sanitizeIdentifier(name: String): String = {
    // cap at 128 so a sanitized name always satisfies isValidIdentifier
    val cleaned = name.replaceAll("[^A-Za-z0-9_]", "_").take(128)
    if (cleaned.isEmpty || !cleaned.head.isLetter && cleaned.head != '_')
      ("_" + cleaned).take(128)
    else cleaned
  }
}
