package graft

import graft.ir.Ir._
import graft.parser.DtsxParser
import org.scalatest.funsuite.AnyFunSuite

/** Parser fixtures = the reference's three sample packages, copied
  * verbatim into test resources (FIXTURES.md §1). Assertions mirror the
  * reference's parsed_packages.json facts. */
class DtsxParserSpec extends AnyFunSuite {

  private def fixture(name: String): String =
    getClass.getResource(s"/dtsx/$name").getPath

  lazy val sales: SsisPackage = DtsxParser.parseFile(fixture("SalesFactETL.dtsx"))
  lazy val customers: SsisPackage = DtsxParser.parseFile(fixture("CustomerDataLoad.dtsx"))
  lazy val inventory: SsisPackage = DtsxParser.parseFile(fixture("InventorySync.dtsx"))

  test("SalesFactETL: package header, connection managers, variables") {
    assert(sales.name === "SalesFactETL")
    assert(sales.connectionManagers.map(_.name) === List("SalesDB", "DW"))
    val cm = sales.connectionManagers.head
    assert(cm.server === Some("SALESSRV"))
    assert(cm.database === Some("Sales_OLTP"))
    assert(sales.variables.map(_.qualifiedName) ===
      List("User::StartDate", "User::EndDate", "User::RowCount"))
    assert(sales.variables.head.ssisType === "DT_DATE")
    assert(sales.variables.last.ssisType === "DT_I4")
  }

  test("SalesFactETL: 3 tasks in declaration order; topo respects constraints") {
    assert(sales.tasks.map(_.name) ===
      List("Pre-ETL Validation", "Load Sales Facts", "Update Aggregates"))
    assert(sales.constraints.map(c => c.fromTask -> c.toTask) === List(
      "Pre-ETL Validation" -> "Load Sales Facts",
      "Load Sales Facts" -> "Update Aggregates"))
    assert(sales.topoOrder.toOption.get.map(_.name) ===
      List("Pre-ETL Validation", "Load Sales Facts", "Update Aggregates"))
  }

  test("SalesFactETL: dataflow components fully parsed") {
    val df = sales.tasks.collectFirst { case d: DataFlowTask => d }.get
    assert(df.name === "Load Sales Facts")
    val src = df.sources.head
    assert(src.sqlCommand.exists(_.contains("WHERE s.SaleDate BETWEEN ? AND ?")))
    assert(src.accessMode === Some(2))
    assert(src.columns.map(_.name) === List("SaleID", "CustomerID", "ProductID", "SaleDate",
      "Quantity", "UnitPrice", "DiscountPercent", "SalesRepID", "StoreID"))
    assert(src.columns.find(_.name == "UnitPrice").get.ssisType.precision === Some(18))

    val lookups = df.lookups
    assert(lookups.map(_.name) === List("Lookup Customer", "Lookup Product", "Lookup Date"))
    assert(lookups.forall(_.cacheMode == CacheMode.Full))
    assert(lookups.map(_.noMatchBehavior) === List(
      NoMatchBehavior.IgnoreFailure, NoMatchBehavior.IgnoreFailure, NoMatchBehavior.FailComponent))
    assert(lookups(2).inputColumns === List("SaleDate"))
    assert(lookups(1).outputColumns.map(_.name) === List("ProductKey", "CategoryID"))

    val derived = df.components.collectFirst { case d: DerivedColumnComponent => d }.get
    assert(derived.columns.map(_.name) === List("GrossAmount", "DiscountAmount", "NetAmount"))
    assert(derived.columns.head.expression === "[Quantity] * [UnitPrice]")
    assert(derived.columns.head.outputType.precision === Some(18))

    val dest = df.destinations.head
    assert(dest.tableName === Some("[fact].[Sales]"))
    assert(dest.accessMode === Some(3))
  }

  test("CustomerDataLoad: MERGE SQL task + script-free tasks parse") {
    val sqlTasks = customers.tasks.collect { case t: ExecuteSqlTask => t }
    assert(sqlTasks.exists(_.sqlStatement.toUpperCase.contains("MERGE")))
    assert(sqlTasks.exists(_.sqlStatement.toUpperCase.contains("TRUNCATE")))
  }

  test("InventorySync: script task flagged for manual review; send mail skipped") {
    val st = inventory.tasks.collectFirst { case s: ScriptTask => s }
    assert(st.isDefined)
    assert(inventory.warnings.exists(_.contains("manual review")))
    val sm = inventory.tasks.collectFirst { case s: SendMailTask => s }
    assert(sm.isDefined)
  }

  test("InventorySync: watermark SQL task has SingleRow-ish fetch") {
    val sqlTasks = inventory.tasks.collect { case t: ExecuteSqlTask => t }
    assert(sqlTasks.exists(_.sqlStatement.contains("TOP 1")))
  }

  test("credential redaction on connection strings") {
    val cm = ConnectionManager("r", "n", "id",
      "Data Source=S;Initial Catalog=D;User ID=sa;Password=hunter2;")
    assert(cm.redactedConnectionString.contains("Password=***"))
    assert(!cm.redactedConnectionString.contains("hunter2"))
  }

  test("XXE entity payloads parse without resolving entities (security contract)") {
    val xxe =
      """<?xml version="1.0"?>
        |<!DOCTYPE foo [ <!ENTITY xxe SYSTEM "file:///etc/passwd"> ]>
        |<DTS:Executable xmlns:DTS="www.microsoft.com/SqlServer/Dts"
        |  DTS:ObjectName="evil">&xxe;</DTS:Executable>""".stripMargin
    val ex = intercept[Exception](DtsxParser.parseString(xxe))
    assert(ex.getMessage.toLowerCase.contains("doctype"))
  }

  test("cycle in precedence constraints is reported") {
    val pkg = SsisPackage("p", None, Nil, Nil,
      tasks = List(
        ExecuteSqlTask("a", None, "c", "SELECT 1"),
        ExecuteSqlTask("b", None, "c", "SELECT 1")),
      constraints = List(
        PrecedenceConstraint("a", "b", ConstraintKind.Success),
        PrecedenceConstraint("b", "a", ConstraintKind.Success)))
    assert(pkg.topoOrder.isLeft)
  }
}
