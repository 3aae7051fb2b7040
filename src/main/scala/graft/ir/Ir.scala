package graft.ir

import graft.types.SsisTypes.SsisColumnType

/** Typed IR for parsed SSIS packages — the Scala analog of the reference's
  * Pydantic models (ssis-to-dbt `src/parser/models.py:11-216`), extended
  * where the reference only *recognizes* a component class
  * (`constants.py:22-39`) but never parses its body: ConditionalSplit,
  * Aggregate, MergeJoin, UnionAll, Sort, RowCount, DataConversion get a
  * full parse + executable semantics here (SURVEY.md §7.4.4).
  */
object Ir {

  final case class ConnectionManager(
      refId: String,
      name: String,
      dtsId: String,
      connectionString: String) {
    private def kv(key: String): Option[String] =
      connectionString.split(';').toSeq
        .map(_.split("=", 2)).collect { case Array(k, v) => k.trim -> v.trim }
        .find(_._1.equalsIgnoreCase(key)).map(_._2)
    def server: Option[String] = kv("Data Source")
    def database: Option[String] = kv("Initial Catalog")
    def provider: Option[String] = kv("Provider")
    /** Credential redaction on serialize — models.py:47-50 contract.
      * Brace-wrapped values first: `Password={ab;cd}` is legal OLE DB
      * quoting, and a bare `[^;]*` would stop at the embedded ';' and
      * leak the password tail. */
    def redactedConnectionString: String =
      connectionString.replaceAll(
        "(?i)(Password|Pwd)\\s*=\\s*(\\{[^}]*\\}|\"[^\"]*\"|[^;]*)", "$1=***")
  }

  final case class Variable(
      namespace: String,
      name: String,
      ssisType: String, // canonical DT_* (constants.py:42-51 codes)
      value: String,
      expression: Option[String] = None) {
    def qualifiedName: String = s"$namespace::$name"
  }

  final case class ColumnInfo(
      name: String,
      ssisType: SsisColumnType,
      nullable: Boolean = true)

  // ----------------------------------------------------------- dataflow
  sealed trait DataFlowComponent {
    def name: String
    def componentType: String
  }

  final case class SourceComponent(
      name: String,
      componentType: String, // OLEDBSource | FlatFileSource | ExcelSource
      connectionRef: Option[String],
      sqlCommand: Option[String],
      tableName: Option[String],
      accessMode: Option[Int],
      columns: List[ColumnInfo]) extends DataFlowComponent

  final case class DestinationComponent(
      name: String,
      componentType: String,
      connectionRef: Option[String],
      tableName: Option[String],
      accessMode: Option[Int], // 3 = fast load
      columns: List[ColumnInfo]) extends DataFlowComponent

  sealed trait CacheMode
  object CacheMode { case object Full extends CacheMode; case object Partial extends CacheMode }

  sealed trait NoMatchBehavior
  object NoMatchBehavior {
    case object FailComponent extends NoMatchBehavior
    case object IgnoreFailure extends NoMatchBehavior
  }

  final case class LookupComponent(
      name: String,
      connectionRef: Option[String],
      sqlCommand: Option[String],
      cacheMode: CacheMode,
      noMatchBehavior: NoMatchBehavior,
      inputColumns: List[String], // probe-side join columns (cachedName)
      outputColumns: List[ColumnInfo]) extends DataFlowComponent {
    def componentType: String = "Lookup"
  }

  final case class DerivedColumnDef(
      name: String,
      expression: String,
      friendlyExpression: Option[String],
      outputType: SsisColumnType)

  final case class DerivedColumnComponent(
      name: String,
      columns: List[DerivedColumnDef]) extends DataFlowComponent {
    def componentType: String = "DerivedColumn"
  }

  /** Ordered, mutually-exclusive split cases + default output name. */
  final case class ConditionalSplitComponent(
      name: String,
      cases: List[(String, String)], // (outputName, SSIS predicate expression)
      defaultOutput: String) extends DataFlowComponent {
    def componentType: String = "ConditionalSplit"
  }

  sealed trait AggFunction
  object AggFunction {
    case object Sum extends AggFunction; case object Count extends AggFunction
    case object CountAll extends AggFunction
    case object CountDistinct extends AggFunction
    case object Avg extends AggFunction; case object Min extends AggFunction
    case object Max extends AggFunction; case object GroupBy extends AggFunction
  }

  final case class AggSpec(inputColumn: String, outputName: String, fn: AggFunction)

  final case class AggregateComponent(
      name: String,
      aggs: List[AggSpec]) extends DataFlowComponent {
    def componentType: String = "Aggregate"
    def groupByCols: List[String] =
      aggs.filter(_.fn == AggFunction.GroupBy).map(_.inputColumn)
  }

  final case class MergeJoinComponent(
      name: String,
      joinType: String, // INNER | LEFT | FULL
      leftKeys: List[String],
      rightKeys: List[String]) extends DataFlowComponent {
    def componentType: String = "MergeJoin"
  }

  final case class UnionAllComponent(name: String) extends DataFlowComponent {
    def componentType: String = "UnionAll"
  }

  final case class SortComponent(
      name: String,
      sortColumns: List[(String, Boolean)]) // (col, ascending)
      extends DataFlowComponent {
    def componentType: String = "Sort"
  }

  final case class RowCountComponent(
      name: String,
      variableName: String) extends DataFlowComponent {
    def componentType: String = "RowCount"
  }

  final case class DataConversionComponent(
      name: String,
      conversions: List[(String, SsisColumnType)]) // input col → target type (as <col>_conv)
      extends DataFlowComponent {
    def componentType: String = "DataConversion"
  }

  /** Recognized-only fallback (Excel, etc.) — carried for reporting. */
  final case class UnparsedComponent(
      name: String,
      componentType: String) extends DataFlowComponent

  // ----------------------------------------------------------- tasks
  sealed trait Task { def name: String; def description: Option[String] }

  final case class ExecuteSqlTask(
      name: String,
      description: Option[String],
      connectionId: String,
      sqlStatement: String,
      resultSet: String = "None", // None | SingleRow | Full
      parameters: List[String] = Nil,
      /** `SQLTask:ResultBinding/@DtsVariableName` — the Object variable a
        * Full/SingleRow result set is stored into (feeds the ForEach ADO
        * enumerator). */
      resultVariable: Option[String] = None) extends Task

  /** An edge of a branched dataflow: `from`'s output (optionally a named
    * ConditionalSplit route or MergeJoin side) feeds `to`. `toInput` is
    * "left"/"right" for MergeJoin inputs; None elsewhere. */
  final case class FlowPath(
      from: String,
      fromOutput: Option[String],
      to: String,
      toInput: Option[String])

  final case class DataFlowTask(
      name: String,
      description: Option[String],
      components: List[DataFlowComponent], // document order = pipeline order
      paths: List[FlowPath] = Nil) // empty → linear (document-order) flow
      extends Task {
    def sources: List[SourceComponent] =
      components.collect { case s: SourceComponent => s }
    def destinations: List[DestinationComponent] =
      components.collect { case d: DestinationComponent => d }
    def lookups: List[LookupComponent] =
      components.collect { case l: LookupComponent => l }
  }

  final case class ScriptTask(
      name: String,
      description: Option[String],
      scriptLanguage: String,
      readOnlyVariables: List[String],
      readWriteVariables: List[String],
      reviewReason: String =
        "Script Tasks require manual conversion") extends Task

  final case class SendMailTask(
      name: String,
      description: Option[String],
      smtpServer: Option[String],
      toAddress: Option[String],
      subject: Option[String],
      skipReason: String =
        "Send Mail Tasks are not converted - handle notifications externally") extends Task

  /** One enumerator item value: DT_* type + raw text (FEIEItemValue
    * Type/Value attributes; reference `constants.py:42-51` codes). */
  final case class EnumValue(ssisType: String, raw: String)

  /** ForLoop control expressions (`DTS:InitExpression` /
    * `DTS:EvalExpression` / `DTS:AssignExpression`): init/assign are
    * `@[ns::var] = <expr>` assignments, eval is a boolean condition —
    * all in the SSIS expression language over package variables. */
  final case class ForLoopSpec(
      initExpression: Option[String],
      evalExpression: String,
      assignExpression: Option[String])

  /** ForEach File enumerator spec (`ForEachFileEnumeratorProperties` /
    * `FEFEProperty` in the dtsx): enumerate files matching `fileSpec`
    * under `folder` (optionally recursing), binding each file name to the
    * mapped variable per `retrievalType`:
    * 0 = fully-qualified path, 1 = name + extension, 2 = name only
    * (the documented FileNameRetrieval values). `folder` may reference
    * package variables (`@[ns::name]`) — the dtexec `/SET`-style override
    * point for environment-specific paths. */
  final case class FileEnumSpec(
      folder: String,
      fileSpec: String = "*.*",
      retrievalType: Int = 0,
      recurse: Boolean = false)

  /** ForEach NodeList enumerator spec (`FEENODELIST`): evaluate
    * `outerXPath` over the XML in `sourceDocument` (inline text, a file
    * path, or an `@[ns::name]` variable reference per `sourceType`) and
    * iterate the matched nodes' text (`EnumerationType=NodeText`, the
    * common form; Navigator/ElementCollection stay manual-review). */
  final case class NodeListSpec(
      enumerationType: String,
      sourceType: String, // DirectInput | FileConnection | Variable
      sourceDocument: String,
      outerXPath: String)

  /** ForEach/ForLoop/Sequence containers: children run as a nested DAG —
    * once for Sequence, once per enumerator item (with
    * `variableMappings` binding item values to package variables) for
    * ForEachLoop, and while `forLoop.evalExpression` holds for ForLoop. */
  final case class ContainerTask(
      name: String,
      description: Option[String],
      containerType: String,
      children: List[Task],
      /** Item-enumerator rows (each a list of positional values). */
      enumItems: List[List[EnumValue]] = Nil,
      /** Qualified variable name → item value index. */
      variableMappings: List[(String, Int)] = Nil,
      forLoop: Option[ForLoopSpec] = None,
      /** `DTS:ForEachEnumerator/@CreationName` — the Item enumerator
        * (`Microsoft.ForEachItemEnumerator`) iterates its parsed rows and
        * the File enumerator (`Microsoft.ForEachFileEnumerator`) iterates
        * a directory listing at run time; ADO/NodeList/unparsed
        * enumerators surface as manual-review skips, never as a silent
        * single unbound pass. */
      enumeratorKind: Option[String] = None,
      /** Parsed File-enumerator configuration (File kind only). */
      fileEnum: Option[FileEnumSpec] = None,
      /** ADO enumerator (`FEEADO`): the Object variable holding the
        * recordset whose first table's rows drive the iterations. */
      adoObjectVar: Option[String] = None,
      /** NodeList enumerator (`FEENODELIST`) configuration. */
      nodeListEnum: Option[NodeListSpec] = None,
      /** Container-INTERNAL precedence constraints (a Sequence's own
        * `PrecedenceConstraints` element): they order and gate the
        * children within each container pass, independent of the
        * package-level DAG. */
      constraints: List[PrecedenceConstraint] = Nil) extends Task

  final case class UnsupportedTask(
      name: String,
      description: Option[String],
      executableType: String,
      reviewReason: String) extends Task

  // ----------------------------------------------------------- package
  sealed trait ConstraintKind
  object ConstraintKind {
    case object Success extends ConstraintKind
    case object Failure extends ConstraintKind
    case object Completion extends ConstraintKind
    final case class Expression(expr: String) extends ConstraintKind
  }

  final case class PrecedenceConstraint(
      fromTask: String,
      toTask: String,
      kind: ConstraintKind)

  final case class SsisPackage(
      name: String,
      description: Option[String],
      connectionManagers: List[ConnectionManager],
      variables: List[Variable],
      tasks: List[Task],
      constraints: List[PrecedenceConstraint],
      warnings: List[String] = Nil) {

    /** Kahn topological order over the Success/Completion constraint DAG
      * (analyzer.py:36-82 contract); ties broken by declaration order. */
    def topoOrder: Either[String, List[Task]] = Ir.topoOrderOf(tasks, constraints)
  }

  /** Kahn topological order over any task list + constraint set — shared
    * by the package level and container-internal ordering. Duplicate
    * names are rejected up front with a CLEAR error: the name-keyed maps
    * would otherwise collapse them and misreport a cycle (or silently
    * substitute the wrong task object). */
  def topoOrderOf(tasks: List[Task],
      constraints: List[PrecedenceConstraint]): Either[String, List[Task]] = {
    val names = tasks.map(t => t.name)
    val dups = names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    if (dups.nonEmpty)
      return Left(s"duplicate task name(s): ${dups.mkString(", ")}")
    val idx = names.zipWithIndex.toMap
    val edges = constraints.filter(c => idx.contains(c.fromTask) && idx.contains(c.toTask))
    val inDeg = scala.collection.mutable.Map(names.map(_ -> 0): _*)
    edges.foreach(e => inDeg(e.toTask) += 1)
    val out = scala.collection.mutable.ListBuffer.empty[String]
    val ready = scala.collection.mutable.PriorityQueue.empty[String](
      Ordering.by((n: String) => -idx(n)))
    names.filter(inDeg(_) == 0).foreach(ready.enqueue(_))
    while (ready.nonEmpty) {
      val n = ready.dequeue()
      out += n
      edges.filter(_.fromTask == n).foreach { e =>
        inDeg(e.toTask) -= 1
        if (inDeg(e.toTask) == 0) ready.enqueue(e.toTask)
      }
    }
    if (out.size != names.size)
      Left(s"cycle detected among tasks: ${names.diff(out.toList).mkString(", ")}")
    else {
      val byName = tasks.map(t => t.name -> t).toMap
      Right(out.toList.map(byName))
    }
  }
}
