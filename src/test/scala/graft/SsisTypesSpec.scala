package graft

import graft.types.SsisTypes
import graft.types.SsisTypes.SsisColumnType
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SsisTypesSpec extends AnyFunSuite {
  private def t(n: String, len: Option[Int] = None, p: Option[Int] = None, s: Option[Int] = None) =
    SsisColumnType(n, len, p, s)

  test("DT_* types map to Spark types per SURVEY §1.2") {
    assert(SsisTypes.toSpark(t("DT_I1")) === ByteType)
    assert(SsisTypes.toSpark(t("DT_I2")) === ShortType)
    assert(SsisTypes.toSpark(t("DT_I4")) === IntegerType)
    assert(SsisTypes.toSpark(t("DT_I8")) === LongType)
    assert(SsisTypes.toSpark(t("DT_UI1")) === ShortType)
    assert(SsisTypes.toSpark(t("DT_UI8")) === DecimalType(20, 0))
    assert(SsisTypes.toSpark(t("DT_WSTR", len = Some(50))) === StringType)
    assert(SsisTypes.toSpark(t("DT_NUMERIC", p = Some(18), s = Some(2))) === DecimalType(18, 2))
    assert(SsisTypes.toSpark(t("DT_CY")) === DecimalType(19, 4))
    assert(SsisTypes.toSpark(t("DT_R4")) === FloatType)
    assert(SsisTypes.toSpark(t("DT_R8")) === DoubleType)
    assert(SsisTypes.toSpark(t("DT_DBTIMESTAMP")) === TimestampType)
    assert(SsisTypes.toSpark(t("DT_DBDATE")) === DateType)
    assert(SsisTypes.toSpark(t("DT_BOOL")) === BooleanType)
    assert(SsisTypes.toSpark(t("DT_GUID")) === StringType)
    assert(SsisTypes.toSpark(t("DT_BYTES")) === BinaryType)
  }

  test("component-XML lowercase spellings canonicalize (i4, wstr, dbTimeStamp, numeric)") {
    assert(SsisTypes.toSpark(t("i4")) === IntegerType)
    assert(SsisTypes.toSpark(t("wstr", len = Some(255))) === StringType)
    assert(SsisTypes.toSpark(t("dbTimeStamp")) === TimestampType)
    assert(SsisTypes.toSpark(t("dbDate")) === DateType)
    assert(SsisTypes.toSpark(t("numeric", p = Some(18), s = Some(4))) === DecimalType(18, 4))
    assert(SsisTypes.toSpark(t("cy")) === DecimalType(19, 4))
  }

  test("unknown type falls back to StringType (NVARCHAR(MAX) contract)") {
    assert(SsisTypes.toSpark(t("DT_WHATEVER")) === StringType)
    assert(SsisTypes.toSqlServer(t("DT_WHATEVER")) === "NVARCHAR(MAX)")
  }

  test("SQL Server rendering composes length/precision/scale (type_mappings.py:65-99)") {
    assert(SsisTypes.toSqlServer(t("DT_WSTR", len = Some(50))) === "NVARCHAR(50)")
    assert(SsisTypes.toSqlServer(t("DT_STR", len = Some(10))) === "VARCHAR(10)")
    assert(SsisTypes.toSqlServer(t("DT_NUMERIC", p = Some(18), s = Some(2))) === "NUMERIC(18,2)")
    assert(SsisTypes.toSqlServer(t("DT_NUMERIC", p = Some(18))) === "NUMERIC(18)")
    assert(SsisTypes.toSqlServer(t("DT_BYTES", len = Some(16))) === "VARBINARY(16)")
    assert(SsisTypes.toSqlServer(t("DT_UI8")) === "NUMERIC(20,0)")
    assert(SsisTypes.toSqlServer(t("DT_IMAGE")) === "VARBINARY(MAX)")
  }

  test("snake_case matches reference get_snake_case contract") {
    assert(SsisTypes.snakeCase("CustomerID") === "customer_id")
    assert(SsisTypes.snakeCase("FirstName") === "first_name")
    assert(SsisTypes.snakeCase("QuantityOnHand") === "quantity_on_hand")
    assert(SsisTypes.snakeCase("SaleID") === "sale_id")
    assert(SsisTypes.snakeCase("already_snake") === "already_snake")
    assert(SsisTypes.snakeCase("ABC") === "abc")
    assert(SsisTypes.snakeCase("ProductSKU") === "product_sku")
  }

  test("snakeCase survives '$' and backslash (legal SQL Server identifier chars)") {
    assert(SsisTypes.snakeCase("Total$Amount") === "total$_amount")
    assert(SsisTypes.snakeCase("A\\Bcd") === "a\\_bcd")
  }

  test("sized DT_DECIMAL renders DECIMAL(p,s), not NUMERIC (sql_type parity)") {
    assert(SsisTypes.toSqlServer(
      SsisTypes.SsisColumnType("DT_DECIMAL", None, Some(18), Some(2))) === "DECIMAL(18,2)")
    assert(SsisTypes.toSqlServer(
      SsisTypes.SsisColumnType("DT_NUMERIC", None, Some(18), Some(2))) === "NUMERIC(18,2)")
  }

  test("sanitizeIdentifier output always satisfies isValidIdentifier") {
    val long = "C" * 200
    val out = SsisTypes.sanitizeIdentifier(long)
    assert(SsisTypes.isValidIdentifier(out), s"len=${out.length}")
    assert(SsisTypes.isValidIdentifier(SsisTypes.sanitizeIdentifier("9bad name!")))
  }

  test("identifier validation blocks SQL injection shapes (utils.py contract)") {
    assert(SsisTypes.isValidIdentifier("CustomerID"))
    assert(SsisTypes.isValidIdentifier("_private"))
    assert(!SsisTypes.isValidIdentifier("col; DROP TABLE x"))
    assert(!SsisTypes.isValidIdentifier("a-b"))
    assert(!SsisTypes.isValidIdentifier(""))
    assert(SsisTypes.sanitizeIdentifier("col; DROP TABLE x") === "col__DROP_TABLE_x")
  }
}
