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

  test("real-SSIS dialect: STOCK containers, EvalOp expression gates, internal constraints") {
    val xml =
      """<?xml version="1.0"?>
        |<DTS:Executable xmlns:DTS="www.microsoft.com/SqlServer/Dts" DTS:ObjectName="real">
        |  <DTS:Executables>
        |    <DTS:Executable DTS:ExecutableType="STOCK:SEQUENCE" DTS:ObjectName="Seq1">
        |      <DTS:Executables>
        |        <DTS:Executable DTS:ExecutableType="Microsoft.ExecuteSQLTask" DTS:ObjectName="B">
        |          <DTS:ObjectData><SQLTask:SqlTaskData SQLTask:Connection="c" SQLTask:SqlStatementSource="SELECT 2" xmlns:SQLTask="x"/></DTS:ObjectData>
        |        </DTS:Executable>
        |        <DTS:Executable DTS:ExecutableType="Microsoft.ExecuteSQLTask" DTS:ObjectName="A">
        |          <DTS:ObjectData><SQLTask:SqlTaskData SQLTask:Connection="c" SQLTask:SqlStatementSource="SELECT 1" xmlns:SQLTask="x"/></DTS:ObjectData>
        |        </DTS:Executable>
        |      </DTS:Executables>
        |      <DTS:PrecedenceConstraints>
        |        <DTS:PrecedenceConstraint DTS:From="Package\Seq1\A" DTS:To="Package\Seq1\B" DTS:Value="0"/>
        |      </DTS:PrecedenceConstraints>
        |    </DTS:Executable>
        |    <DTS:Executable DTS:ExecutableType="Microsoft.ExecuteSQLTask" DTS:ObjectName="Z">
        |      <DTS:ObjectData><SQLTask:SqlTaskData SQLTask:Connection="c" SQLTask:SqlStatementSource="SELECT 3" xmlns:SQLTask="x"/></DTS:ObjectData>
        |    </DTS:Executable>
        |  </DTS:Executables>
        |  <DTS:PrecedenceConstraints>
        |    <DTS:PrecedenceConstraint DTS:From="Package\Seq1" DTS:To="Package\Z"
        |      DTS:Value="0" DTS:EvalOp="1" DTS:Expression="@[User::RunIt]"/>
        |  </DTS:PrecedenceConstraints>
        |</DTS:Executable>""".stripMargin
    val pkg = DtsxParser.parseString(xml)
    // STOCK:SEQUENCE is a real container, not UnsupportedTask
    val seq = pkg.tasks.collectFirst { case c: ContainerTask => c }.get
    assert(seq.containerType === "Sequence")
    assert(seq.children.map(_.name) === List("B", "A"))
    // the container's OWN constraints are captured
    assert(seq.constraints === List(
      PrecedenceConstraint("A", "B", ConstraintKind.Success)))
    // EvalOp=1 + Expression (Value still 0) parses as an expression gate
    assert(pkg.constraints === List(
      PrecedenceConstraint("Seq1", "Z", ConstraintKind.Expression("@[User::RunIt]"))))
  }

  test("error outputs never pollute columns; unknown aggregation degrades to a warning") {
    val xml =
      """<?xml version="1.0"?>
        |<DTS:Executable xmlns:DTS="www.microsoft.com/SqlServer/Dts" DTS:ObjectName="p2">
        |  <DTS:Executables>
        |    <DTS:Executable DTS:ExecutableType="Microsoft.Pipeline" DTS:ObjectName="Flow">
        |      <DTS:ObjectData><pipeline><components>
        |        <component componentClassID="Microsoft.OLEDBSource" name="Src">
        |          <outputs>
        |            <output name="main">
        |              <outputColumns><outputColumn name="id" dataType="i4"/></outputColumns>
        |            </output>
        |            <output name="err" isErrorOut="true">
        |              <outputColumns>
        |                <outputColumn name="id" dataType="i4"/>
        |                <outputColumn name="ErrorCode" dataType="i4"/>
        |              </outputColumns>
        |            </output>
        |          </outputs>
        |        </component>
        |        <component componentClassID="Microsoft.Aggregate" name="Agg">
        |          <outputs><output name="out"><outputColumns>
        |            <outputColumn name="g"><properties>
        |              <property name="AggregationType">groupby</property>
        |            </properties></outputColumn>
        |            <outputColumn name="weird"><properties>
        |              <property name="AggregationType">median</property>
        |            </properties></outputColumn>
        |          </outputColumns></output></outputs>
        |        </component>
        |      </components></pipeline></DTS:ObjectData>
        |    </DTS:Executable>
        |  </DTS:Executables>
        |</DTS:Executable>""".stripMargin
    val pkg = DtsxParser.parseString(xml)
    val flow = pkg.tasks.collectFirst { case d: DataFlowTask => d }.get
    val src = flow.components.collectFirst { case s: SourceComponent => s }.get
    assert(src.columns.map(_.name) === List("id"),
      "error-output columns must not duplicate/pollute the contract")
    val agg = flow.components.collectFirst { case a: AggregateComponent => a }.get
    assert(agg.aggs.map(_.outputName) === List("g"),
      "unknown aggregation type must skip the column, not abort the parse")
    assert(pkg.warnings.exists(_.contains("median")))
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
