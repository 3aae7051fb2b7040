package graft.pipeline

import graft.ir.Ir._
import graft.ops.DataFlowCompiler
import graft.ops.DataFlowCompiler.Resolver
import graft.patterns.LoadPatterns
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Topo-ordered package execution (SURVEY.md §3.1 lifecycle, Spark shape):
  * parse → IR → per-task DataFrame plans → ordered actions. The only
  * process boundary is Spark's own driver/executor split; each task is
  * one action (write / count / no-op).
  */
object PackageRunner {

  /** Execution environment: how tables resolve and where writes land. */
  final case class RuntimeEnv(
      resolver: Resolver,
      /** "[schema].[table]" → write. Dataflow destinations always APPEND
        * (SSIS fast load is a bulk append; row-by-row insert is too);
        * Overwrite arrives only from rewritten SQL tasks
        * (DELETE+INSERT / TRUNCATE+INSERT refresh → SqlPatternRewriter). */
      write: (String, DataFrame, SaveMode) => Unit,
      /** Execute-SQL delegate for statements the engine rewrites
        * (DELETE+INSERT → overwrite etc.); None → recorded as skipped. */
      sqlExecutor: ExecuteSqlTask => Option[SqlOutcome] = _ => None)

  /** @param affected lazily-evaluated "rows affected" fact for the
    *   statement — T-SQL's `@@ROWCOUNT` contract (UPDATE/DELETE = rows
    *   the predicate matched, INSERT = rows inserted, SELECT = rows
    *   returned). A THUNK, not a value: counting is a Spark action, and
    *   it must run only when a later script statement actually reads
    *   `@@ROWCOUNT` ([[graft.patterns.ScriptedSqlExecutor]]). None =
    *   the compiler cannot state the count (e.g. MERGE's three-verb
    *   total) — a read after such a statement declines to manual review
    *   rather than substituting a wrong number. */
  final case class SqlOutcome(df: Option[DataFrame], target: Option[String],
      mode: SaveMode = SaveMode.Overwrite,
      affected: Option[() => Long] = None,
      /** Companion writes the statement carries BESIDE its main
        * target mutation — T-SQL's `OUTPUT … INTO` audit/archive
        * clause ([[graft.patterns.OutputIntoSqlCompiler]]). Applied
        * BEFORE the main write: the side frames are built over the
        * PRE-statement state, and an audit append must never observe
        * its own statement's mutation. */
      side: List[(String, DataFrame, SaveMode)] = Nil)

  sealed trait TaskStatus
  object TaskStatus {
    case object Succeeded extends TaskStatus
    case object SkippedManualReview extends TaskStatus
    case object SkippedNotConverted extends TaskStatus
    final case class Failed(error: String) extends TaskStatus
    /** Precedence constraints did not fire (e.g. a Success edge from a
      * failed task, or a false Expression) — the task never executed. */
    case object NotRun extends TaskStatus
  }

  final case class TaskRun(
      taskName: String,
      taskType: String,
      status: TaskStatus,
      rowsWritten: Option[Long] = None,
      observedCounts: Map[String, Long] = Map.empty,
      pattern: Option[LoadPatterns.Detection] = None,
      notes: List[String] = Nil)

  final case class PackageRun(packageName: String, tasks: List[TaskRun]) {
    def failed: Boolean = tasks.exists(_.status.isInstanceOf[TaskStatus.Failed])
  }

  /** Execute the package honoring the full precedence-constraint algebra
    * (reference `src/parser/models.py:158-163`, `src/agents/
    * analyzer.py:36-67` typed DependencyGraph): a task runs iff EVERY
    * incoming edge fires — Success needs a non-failed predecessor, Failure
    * a failed one, Completion either, Expression evaluates its SSIS
    * expression over the package variables (and still requires the
    * predecessor to have completed). A task whose constraints don't fire
    * is recorded [[TaskStatus.NotRun]] and its own Success successors
    * cascade to NotRun — a failure no longer aborts the whole package, so
    * OnFailure cleanup/notify paths actually execute. */
  def run(spark: SparkSession, pkg: SsisPackage, env: RuntimeEnv): PackageRun =
    runInternal(spark, pkg, env, prior = Map.empty, statePath = None, maxAttempts = 1)

  /** [[run]] with run-state checkpointing and a bounded retry loop
    * (reference `src/agents/context.py:154-190` state JSON;
    * `orchestrator.py:275-289` max_iterations): the state file at
    * `statePath` is rewritten after every task, and a re-invocation
    * carries terminally-successful tasks over WITHOUT re-executing them —
    * only failed / never-run tasks (and their downstream) execute again.
    * A task that fails is retried in-place up to `maxAttempts` times
    * before its failure propagates to the constraint algebra.
    *
    * Retry granularity is the WHOLE task while destination writes are
    * per-write appends: a container or multi-destination dataflow that
    * failed halfway re-runs from the start, re-appending what the failed
    * attempt already committed (at-least-once semantics). Use
    * maxAttempts > 1 only for idempotent/read-only tasks, or point
    * `env.write` at an idempotent sink (e.g. keyed overwrite/merge). */
  def runResumable(spark: SparkSession, pkg: SsisPackage, env: RuntimeEnv,
      statePath: String, maxAttempts: Int = 1): PackageRun =
    runInternal(spark, pkg, env, RunState.load(statePath), Some(statePath), maxAttempts)

  // ------------------------------------------------------------ dry run

  /** One task's planned action — what [[run]] WOULD do, decided without
    * executing anything. */
  final case class PlannedTask(
      taskName: String,
      taskType: String,
      action: String,
      sinks: List[String] = Nil,
      /** Constraint gating that could keep the task from running (a
        * Failure edge, an Expression edge) — the dry run lists every
        * task that COULD run, annotated, rather than predicting
        * runtime outcomes. */
      gate: Option[String] = None,
      children: List[PlannedTask] = Nil)

  final case class DryRun(packageName: String, planned: List[PlannedTask]) {
    private def collectSinks(p: PlannedTask): List[String] =
      p.sinks ++ p.children.flatMap(collectSinks)
    /** Every table a full run could write — the list an approval gate
      * shows before anything executes. */
    def sinks: List[String] = planned.flatMap(collectSinks).distinct
    def taskNames: List[String] = planned.map(_.taskName)
    /** Approval-prompt rendering (reference `src/cli/approval.py`
      * analog): the planned actions and write targets, for a human to
      * approve before [[run]]. */
    def render: String = {
      val b = new StringBuilder
      b ++= s"Package: $packageName — planned actions (dry run, nothing executed)\n"
      def one(p: PlannedTask, indent: String): Unit = {
        val gate = p.gate.fold("")(g => s" [$g]")
        b ++= s"$indent- ${p.taskName} (${p.taskType})$gate: ${p.action}\n"
        p.sinks.foreach(s => b ++= s"$indent    writes → $s\n")
        p.children.foreach(one(_, indent + "  "))
      }
      planned.foreach(one(_, ""))
      if (sinks.nonEmpty) b ++= s"Write targets: ${sinks.mkString(", ")}\n"
      else b ++= "Write targets: none\n"
      b.result()
    }
  }

  /** Approval-gate analog of the reference's interactive `approval.py` +
    * executor dry-run flow: compile the package DAG and report every
    * planned task, action, and write target WITHOUT executing — no
    * `env.write`, no `env.sqlExecutor`, no counts. Dataflow tasks are
    * compiled for real (plan analysis only; compilation failures surface
    * here instead of mid-run), SQL tasks classify through the same rules
    * as [[graft.parser.MigrationMapping]], containers recurse with their
    * enumerator's statically-known item count. */
  def dryRun(spark: SparkSession, pkg: SsisPackage, env: RuntimeEnv): DryRun = {
    val ordered = pkg.topoOrder.fold(err => throw new IllegalStateException(err), identity)
    val values = PackageVariables.evaluate(spark, pkg.variables)

    // scope-aware: children of a container are gated by the CONTAINER's
    // own constraint set, which the runner honors — the approval prompt
    // must show the same gates the run applies
    def gateOf(name: String, scope: List[PrecedenceConstraint]): Option[String] = {
      val incoming = scope.filter(_.toTask == name)
      val gates = incoming.flatMap(c => c.kind match {
        case ConstraintKind.Failure => Some(s"only if ${c.fromTask} fails")
        case ConstraintKind.Expression(e) => Some(s"gated by expression: $e")
        case _ => None
      })
      if (gates.isEmpty) None else Some(gates.mkString("; "))
    }

    def plan(task: Task, scope: List[PrecedenceConstraint] = pkg.constraints): PlannedTask = task match {
      case df0: DataFlowTask =>
        val df = PackageVariables.bindTaskSql(df0, pkg, values)
        try {
          val sinks =
            if (df.paths.nonEmpty)
              DataFlowCompiler.compileDag(df, env.resolver, values)
                .destinations.values.map { case (d, _) =>
                  d.tableName.getOrElse(d.name)
                }.toList
            else DataFlowCompiler.compile(df, env.resolver, values)
              .destination.map(d => d.tableName.getOrElse(d.name)).toList
          val action =
            if (sinks.nonEmpty) s"compile DataFrame pipeline, append to ${sinks.size} destination(s)"
            else "compile DataFrame pipeline (no destination: count action only)"
          PlannedTask(task.name, "DataFlowTask", action, sinks, gateOf(task.name, scope))
        } catch {
          case e: Exception =>
            PlannedTask(task.name, "DataFlowTask",
              s"COMPILATION FAILS: ${e.getMessage}", Nil, gateOf(task.name, scope))
        }
      case sql0: ExecuteSqlTask =>
        // classification reads the RAW authored statement — the same
        // input the migration-mapping artifact and the real run's
        // detector see (`?`/`@var` placeholders are themselves
        // classification signals; binding them away would make the
        // approval gate classify a DIFFERENT text than the artifact and
        // the run classify). Binding happens on the EXECUTION path only;
        // a bind failure therefore surfaces at run time as that task's
        // failure, and the dry run additionally previews bindability
        // here, contained to this task.
        val bindNote =
          try { PackageVariables.bindStatement(sql0, pkg, values); None }
          catch {
            case e: Exception => Some(s" [PARAMETER BINDING FAILS: ${e.getMessage}]")
          }
        val m = graft.parser.MigrationMapping.mapTask(sql0, pkg.variables)
        val action = (m.status match {
          case "converted" => s"delegate to SQL executor — ${m.strategy.getOrElse("")}"
          case "converted_to_tests" => s"validation guard — ${m.strategy.getOrElse("")}"
          case "skipped" => s"skip — ${m.strategy.getOrElse("")}"
          case _ => "record only (manual review)"
        }) + bindNote.getOrElse("")
        PlannedTask(task.name, "ExecuteSQLTask", action,
          m.sparkPlan.toList, gateOf(task.name, scope))
      case st: ScriptTask =>
        PlannedTask(task.name, "ScriptTask",
          s"skip (manual review): ${st.reviewReason}", Nil, gateOf(task.name, scope))
      case sm: SendMailTask =>
        PlannedTask(task.name, "SendMailTask",
          s"skip: ${sm.skipReason}", Nil, gateOf(task.name, scope))
      case c: ContainerTask =>
        val iteration = c.containerType match {
          case "ForEachLoop" =>
            if (c.enumItems.nonEmpty ||
                c.enumeratorKind.exists(_.contains("ForEachItemEnumerator")))
              s"${c.enumItems.size} item(s)"
            else if (c.fileEnum.isDefined)
              try s"${enumerateFiles(c.fileEnum.get, values).size} file(s) currently match"
              catch { case e: Exception => s"file enumerator unavailable at plan time (${e.getMessage})" }
            else if (c.adoObjectVar.isDefined)
              s"rows of runtime recordset ${c.adoObjectVar.get}"
            else if (c.nodeListEnum.isDefined) "XPath node list at run time"
            else "NO parsed enumerator (manual review)"
          case "ForLoop" =>
            c.forLoop.fold("NO parsed loop spec (manual review)")(fl =>
              s"while ${fl.evalExpression}")
          case _ => "once, in sequence"
        }
        PlannedTask(task.name, s"Container(${c.containerType})",
          s"iterate children: $iteration", Nil, gateOf(task.name, scope),
          c.children.map(plan(_, c.constraints)))
      case u: UnsupportedTask =>
        PlannedTask(task.name, u.executableType,
          s"skip (manual review): ${u.reviewReason}", Nil, gateOf(task.name, scope))
    }

    DryRun(pkg.name, ordered.map(plan(_)))
  }

  /** Mutable variable state threaded through one package run: Execute SQL
    * result bindings (`ResultBinding` → Object variable) land here so a
    * later ForEach ADO enumerator can read the recordset. Loop-scoped
    * bindings stay in the per-call `values` overlay, never in the store. */
  final class VarStore(initial: Map[String, Any]) {
    @volatile var values: Map[String, Any] = initial
  }

  private def runInternal(spark: SparkSession, pkg: SsisPackage, env: RuntimeEnv,
      prior: Map[String, TaskStatus], statePath: Option[String],
      maxAttempts: Int): PackageRun = {
    val ordered = pkg.topoOrder.fold(err => throw new IllegalStateException(err), identity)
    val store = new VarStore(PackageVariables.evaluate(spark, pkg.variables))
    def values = store.values
    val completed = scala.collection.mutable.Map.empty[String, TaskStatus]
    val runs = scala.collection.mutable.ListBuffer.empty[TaskRun]
    // a succeeded Execute SQL task whose ResultBinding feeds an Object
    // variable produced an IN-MEMORY side effect (the recordset a ForEach
    // ADO enumerator iterates) that a fresh process no longer holds —
    // carrying it over would leave the variable's stale scalar declaration
    // and fail every downstream ADO loop on every resume. Re-execute it.
    def resumable(task: Task): Boolean = task match {
      case s: ExecuteSqlTask => s.resultVariable.isEmpty
      case _ => true
    }
    ordered.foreach { task =>
      prior.get(task.name) match {
        case Some(s) if RunState.isTerminalSuccess(s) && resumable(task) =>
          // checkpoint carry-over: the completed work is not repeated
          completed(task.name) = s
          runs += TaskRun(task.name, taskTypeName(task), s,
            notes = List("resumed from checkpoint: not re-executed"))
        case _ =>
          val incoming = pkg.constraints.filter(_.toTask == task.name)
          val fires = incoming.forall(c =>
            edgeFires(spark, c, completed.get(c.fromTask), values))
          if (fires) {
            var attempt = 1
            var run = runTaskWith(spark, pkg, task, env, values, store)
            while (run.status.isInstanceOf[TaskStatus.Failed] && attempt < maxAttempts) {
              attempt += 1
              run = runTaskWith(spark, pkg, task, env, values, store)
            }
            if (attempt > 1)
              run = run.copy(notes = run.notes :+ s"succeeded-or-gave-up on attempt $attempt")
            completed(task.name) = run.status
            runs += run
          } else
            runs += TaskRun(task.name, taskTypeName(task), TaskStatus.NotRun,
              notes = List("precedence constraints did not fire"))
      }
      statePath.foreach(p => RunState.save(PackageRun(pkg.name, runs.toList), p))
    }
    PackageRun(pkg.name, runs.toList)
  }

  /** One precedence edge's firing decision — the same algebra at the
    * package level and inside containers. */
  private def edgeFires(spark: SparkSession, c: PrecedenceConstraint,
      predecessor: Option[TaskStatus], values: Map[String, Any]): Boolean =
    predecessor match {
      case None => false // predecessor never executed → edge can't fire
      case Some(status) =>
        val failed = status.isInstanceOf[TaskStatus.Failed]
        c.kind match {
          case ConstraintKind.Success => !failed
          case ConstraintKind.Failure => failed
          case ConstraintKind.Completion => true
          case ConstraintKind.Expression(e) =>
            PackageVariables.evalBoolean(spark, e, values)
        }
    }

  /** One container pass over its children, honoring the container's OWN
    * precedence constraints (a Sequence's internal A→B ordering/gating —
    * previously parsed away and run in declaration order). Falls back to
    * plain declaration order when the container declares none. */
  private def runChildren(spark: SparkSession, pkg: SsisPackage, c: ContainerTask,
      env: RuntimeEnv, values: Map[String, Any], store: VarStore): List[TaskRun] =
    if (c.constraints.isEmpty)
      c.children.map(runTaskWith(spark, pkg, _, env, values, store))
    else {
      val ordered = graft.ir.Ir.topoOrderOf(c.children, c.constraints).fold(
        err => throw new IllegalStateException(s"container '${c.name}': $err"), identity)
      val completed = scala.collection.mutable.Map.empty[String, TaskStatus]
      ordered.map { ch =>
        val incoming = c.constraints.filter(_.toTask == ch.name)
        val fires = incoming.forall(k =>
          edgeFires(spark, k, completed.get(k.fromTask), values))
        if (fires) {
          val r = runTaskWith(spark, pkg, ch, env, values, store)
          completed(ch.name) = r.status
          r
        } else
          TaskRun(ch.name, taskTypeName(ch), TaskStatus.NotRun,
            notes = List("precedence constraints did not fire"))
      }
    }

  private def parseEnum(v: EnumValue): Any =
    PackageVariables.parseValue(v.ssisType, v.raw)

  /** Enumerator item → bound variable value: parsed dtsx items carry
    * typed raw text ([[EnumValue]]); ADO recordset items are already
    * typed. */
  private def itemValue(v: Any): Any = v match {
    case ev: EnumValue => parseEnum(ev)
    case other => other
  }

  /** Materialize an ADO enumerator's item list from the recordset
    * variable: the rows of the bound result-set frame, positionally.
    * ForEach ADO is driver-side control-flow iteration in SSIS too —
    * bounded here by a runaway backstop; a data-sized iteration belongs
    * in a dataflow, not a control-flow loop. */
  private def adoItems(objectVar: String, bound: Option[Any]): List[List[Any]] = {
    val maxRows = 10000
    bound match {
      case Some(ds: org.apache.spark.sql.Dataset[_]) =>
        val rows = ds.toDF().limit(maxRows + 1).collect()
        if (rows.length > maxRows)
          throw new IllegalStateException(
            s"ADO recordset in $objectVar exceeds $maxRows rows")
        rows.toList.map(_.toSeq.toList)
      case Some(other) => throw new IllegalArgumentException(
        s"ForEach ADO enumerator variable $objectVar holds " +
          s"${other.getClass.getSimpleName}, not a result set")
      case None => throw new IllegalArgumentException(
        s"ForEach ADO enumerator variable $objectVar is not bound " +
          "(does a prior Execute SQL task have a ResultBinding?)")
    }
  }

  /** Materialize a NodeList enumerator's item list: evaluate the
    * `OuterXPathString` over the source XML document and emit each
    * matched node's text content — the `EnumerationType=NodeText`
    * contract (Navigator/ElementCollection results have no scalar item
    * to bind and stay manual-review at parse time). The document comes
    * from `sourceDocument` per `sourceType`: inline text (`DirectInput`),
    * a file path (`FileConnection`, `@[ns::var]` refs resolved), or a
    * string-typed package variable (`Variable`). DTD processing is
    * disabled — a dtsx and any document it points at are untrusted
    * input, and entity expansion (XXE/billion-laughs) must not ride in
    * through an enumerator. */
  def nodeListItems(spec: NodeListSpec,
      values: Map[String, Any]): List[List[EnumValue]] = {
    val xml = spec.sourceType match {
      case "DirectInput" => spec.sourceDocument
      case "FileConnection" =>
        val p =
          if (spec.sourceDocument.contains("@["))
            PackageVariables.substituteRefs(spec.sourceDocument, values)
          else spec.sourceDocument
        new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)),
          java.nio.charset.StandardCharsets.UTF_8)
      case "Variable" =>
        val name = spec.sourceDocument.stripPrefix("@[").stripSuffix("]")
        values.get(name) match {
          case Some(s: String) if s.nonEmpty => s
          case Some(other) => throw new IllegalArgumentException(
            s"NodeList source variable $name holds " +
              s"${other.getClass.getSimpleName}, not an XML string")
          case _ => throw new IllegalArgumentException(
            s"NodeList source variable $name is not bound to a document")
        }
      case other => throw new IllegalArgumentException(
        s"unsupported NodeList SourceType $other")
    }
    val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    dbf.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    dbf.setXIncludeAware(false)
    dbf.setExpandEntityReferences(false)
    val doc = dbf.newDocumentBuilder().parse(new org.xml.sax.InputSource(
      new java.io.StringReader(xml)))
    val nodes = javax.xml.xpath.XPathFactory.newInstance().newXPath()
      .evaluate(spec.outerXPath, doc, javax.xml.xpath.XPathConstants.NODESET)
      .asInstanceOf[org.w3c.dom.NodeList]
    val maxItems = 10000 // same runaway backstop as the ADO recordset
    if (nodes.getLength > maxItems)
      throw new IllegalStateException(
        s"NodeList enumerator matched ${nodes.getLength} nodes (max $maxItems)")
    (0 until nodes.getLength).toList.map(i =>
      List(EnumValue("DT_WSTR", nodes.item(i).getTextContent.trim)))
  }

  /** Materialize a File enumerator's item list: list `folder` (variable
    * references resolved, subdirectories walked when `recurse`), keep
    * files matching the `fileSpec` wildcard pattern, render each per the
    * retrieval type. Sorted by full path — SSIS leaves enumeration order
    * to the file system; a deterministic order makes runs reproducible. */
  def enumerateFiles(spec: FileEnumSpec,
      values: Map[String, Any]): List[List[EnumValue]] = {
    val folder = new java.io.File(
      if (spec.folder.contains("@[")) PackageVariables.substituteRefs(spec.folder, values)
      else spec.folder)
    if (!folder.isDirectory)
      throw new IllegalArgumentException(
        s"ForEach File enumerator folder is not a directory: $folder")
    val nameRe = java.util.regex.Pattern.compile(
      spec.fileSpec.map {
        case '*' => ".*"
        case '?' => "."
        case ch if "\\.[]{}()+-^$|".indexOf(ch) >= 0 => "\\" + ch
        case ch => ch.toString
      }.mkString, java.util.regex.Pattern.CASE_INSENSITIVE)
    def walk(dir: java.io.File): List[java.io.File] = {
      val entries = Option(dir.listFiles()).getOrElse(Array.empty).toList
      entries.filter(_.isFile) :::
        (if (spec.recurse) entries.filter(_.isDirectory).flatMap(walk) else Nil)
    }
    walk(folder)
      .filter(f => nameRe.matcher(f.getName).matches())
      .sortBy(_.getAbsolutePath)
      .map { f =>
        val rendered = spec.retrievalType match {
          case 1 => f.getName // name + extension
          case 2 => f.getName.replaceFirst("""\.[^.]*$""", "") // name only
          case _ => f.getAbsolutePath // 0 = fully qualified (default)
        }
        List(EnumValue("DT_WSTR", rendered))
      }
  }

  private def taskTypeName(task: Task): String = task match {
    case _: DataFlowTask => "DataFlowTask"
    case _: ExecuteSqlTask => "ExecuteSQLTask"
    case _: ScriptTask => "ScriptTask"
    case _: SendMailTask => "SendMailTask"
    case c: ContainerTask => s"Container(${c.containerType})"
    case u: UnsupportedTask => u.executableType
  }

  def runTask(spark: SparkSession, pkg: SsisPackage, task: Task, env: RuntimeEnv,
      values: Map[String, Any] = Map.empty): TaskRun =
    runTaskWith(spark, pkg, task, env, values, new VarStore(values))

  private def runTaskWith(spark: SparkSession, pkg: SsisPackage, task: Task,
      env: RuntimeEnv, values: Map[String, Any], store: VarStore): TaskRun =
    try {
      // SSIS fails the component when a FailComponent lookup row has no
      // match — the compiled frames never drop rows (left joins), so the
      // semantic is enforced HERE, before any destination write (one
      // limit-1 existence job per FailComponent lookup)
      def enforceFailChecks(taskName: String,
          checks: Map[String, org.apache.spark.sql.DataFrame]): Unit =
        checks.foreach { case (lookupName, unmatched) =>
          if (!unmatched.isEmpty)
            throw new IllegalStateException(
              s"task $taskName: lookup '$lookupName' has rows with no match " +
                "(NoMatchBehavior=FailComponent)")
        }
      task match {
        case df0: DataFlowTask if df0.paths.nonEmpty =>
          val df = PackageVariables.bindTaskSql(df0, pkg, values)
          // branched topology: wiring comes from the <paths> graph
          val dag = DataFlowCompiler.compileDag(df, env.resolver, values)
          enforceFailChecks(task.name, dag.failComponentChecks)
          dag.destinations.values.foreach { case (d, frame) =>
            env.write(d.tableName.getOrElse(d.name), frame, SaveMode.Append)
          }
          // terminal non-destination branches still execute (count action)
          val terminalRows = dag.outputs.values.map(_.count()).sum
          // obs.get IS the metric map — Map.get would wrap in Some and the
          // Long cast would throw ClassCastException, failing a healthy task
          val observed = dag.observations.map { case (v, obs) =>
            v -> obs.get("row_count").asInstanceOf[Long]
          }
          TaskRun(task.name, "DataFlowTask", TaskStatus.Succeeded,
            if (dag.outputs.nonEmpty) Some(terminalRows) else None, observed,
            notes = dag.warnings)
        case df0: DataFlowTask =>
          val df = PackageVariables.bindTaskSql(df0, pkg, values)
          val compiled = DataFlowCompiler.compile(df, env.resolver, values)
          enforceFailChecks(task.name, compiled.failComponentChecks)
          val dest = compiled.destination
          // both OLE DB destination access modes land on Append: fast load
          // (3) is a bulk APPEND in SSIS too, and the non-fast path inserts
          // row by row — also an append. Overwrite semantics only ever come
          // from rewritten SQL tasks (SqlPatternRewriter), never a dataflow.
          val mode = SaveMode.Append
          val rows = dest match {
            case Some(d) =>
              // the split's internal route-tag column must never land in
              // a written table (callers that WANT the tag read
              // compiled.df / routes directly)
              env.write(d.tableName.getOrElse(d.name),
                compiled.df.drop(DataFlowCompiler.SplitTagColumn), mode)
              None // rows come from observations if a RowCount is present
            case None => Some(compiled.df.count())
          }
          val observed = compiled.observations.map { case (v, obs) =>
            v -> obs.get("row_count").asInstanceOf[Long]
          }
          TaskRun(task.name, "DataFlowTask", TaskStatus.Succeeded, rows, observed,
            notes = compiled.warnings)
        case sql0: ExecuteSqlTask =>
          // classification reads the RAW authored statement (a bound
          // literal erases the `?`-placeholder signal the detector keys
          // on, and the artifact/dry-run classify the raw text too);
          // EXECUTION uses the bound statement
          val detection = LoadPatterns.detect(sql0.sqlStatement, pkg.variables)
          val sql = PackageVariables.bindStatement(sql0, pkg, values)
          // ResultBinding: a Full result set lands in the bound Object
          // variable as a frame (the recordset a ForEach ADO enumerator
          // iterates); a SingleRow binding stores the first row's first
          // column as a SCALAR — the SSIS watermark-fetch convention
          // (`SELECT TOP 1 LastSyncTime …` → variable → the next task's
          // `?` parameter, InventorySync.dtsx:58-63). A one-row head()
          // is a bounded driver-control fact, the q13 class; an EMPTY
          // SingleRow result is an SSIS runtime error — fail loud, a
          // silently-unbound watermark would refetch the whole source.
          def bindResult(out: Option[org.apache.spark.sql.DataFrame]): List[String] =
            (sql0.resultVariable zip out).map { case (v, df) =>
              if (sql0.resultSet == "SingleRow") {
                val rows = df.limit(1).collect()
                require(rows.nonEmpty,
                  s"SingleRow result binding for $v: the query returned " +
                    "no rows (SSIS would fail the task)")
                store.values = store.values + (v -> rows.head.get(0))
                s"single-row value bound to $v"
              } else {
                store.values = store.values + (v -> df)
                s"result set bound to $v"
              }
            }.toList
          env.sqlExecutor(sql) match {
            case Some(o @ SqlOutcome(Some(out), Some(target), mode, _, _)) =>
              // OUTPUT…INTO side writes land first: audit/archive rows
              // are built over the pre-statement state
              o.side.foreach { case (t, f, m) => env.write(t, f, m) }
              env.write(target, out, mode)
              TaskRun(task.name, "ExecuteSQLTask", TaskStatus.Succeeded,
                pattern = Some(detection), notes = bindResult(Some(out)))
            case Some(o @ SqlOutcome(out, _, _, _, _)) =>
              o.side.foreach { case (t, f, m) => env.write(t, f, m) }
              TaskRun(task.name, "ExecuteSQLTask", TaskStatus.Succeeded,
                pattern = Some(detection), notes = bindResult(out))
            case None =>
              TaskRun(task.name, "ExecuteSQLTask", TaskStatus.SkippedNotConverted,
                pattern = Some(detection),
                notes = List("no SQL executor bound; statement recorded only"))
          }
        case st: ScriptTask =>
          TaskRun(task.name, "ScriptTask", TaskStatus.SkippedManualReview,
            notes = List(st.reviewReason))
        case sm: SendMailTask =>
          TaskRun(task.name, "SendMailTask", TaskStatus.SkippedNotConverted,
            notes = List(sm.skipReason))
        case c: ContainerTask
            if c.containerType == "ForEachLoop" &&
              c.enumeratorKind.exists(k => !k.contains("ForEachItemEnumerator") &&
                !(k.contains("ForEachFileEnumerator") && c.fileEnum.isDefined) &&
                !(k.contains("ForEachADOEnumerator") && c.adoObjectVar.isDefined) &&
                !(k.contains("ForEachNodeListEnumerator") && c.nodeListEnum.isDefined)) =>
          // Enumerators with no convertible item list (a File/ADO/NodeList
          // enumerator whose properties failed to parse, a NodeList in
          // Navigator/ElementCollection mode, SMO/schedule enumerators) —
          // surfacing them as a manual-review skip beats silently running
          // the body once with an unbound placeholder variable (SSIS would
          // iterate over external state we cannot see).
          TaskRun(task.name, "Container(ForEachLoop)", TaskStatus.SkippedManualReview,
            notes = List(s"unsupported ForEach enumerator ${c.enumeratorKind.get}; " +
              "requires manual review"))
        case c: ContainerTask
            if c.containerType == "ForEachLoop" && c.enumeratorKind.isEmpty &&
              c.enumItems.isEmpty =>
          // no enumerator element found at all: distinct from a CONFIRMED
          // Item enumerator with zero items (legal vacuous success) — a
          // parse miss must not masquerade as a clean empty loop
          TaskRun(task.name, "Container(ForEachLoop)", TaskStatus.SkippedManualReview,
            notes = List("ForEach container has no parsed enumerator; requires manual review"))
        case c: ContainerTask =>
          // iteration order per SSIS default MaximumErrorCount=1: the
          // container stops before the NEXT iteration once any child of
          // the current one has failed — side-effectful destination
          // appends must not continue past a failed pass.
          def iterationFailed(rs: List[TaskRun]): Boolean =
            rs.exists(_.status.isInstanceOf[TaskStatus.Failed])
          val childRuns = c.containerType match {
            case "ForEachLoop" =>
              // one child-DAG pass per enumerator item, with the item's
              // values bound to the mapped package variables; zero items
              // = zero iterations (vacuous success), never a fall-through
              // to a single Sequence pass. A File enumerator produces its
              // item list from the directory listing at run time; an ADO
              // enumerator from the bound recordset variable — resolved to
              // whichever scope actually HOLDS a result set, innermost
              // first (an enclosing loop's per-iteration binding beats the
              // store), because both scopes also carry the variable's
              // stale scalar declaration and a blind precedence would
              // shadow the real recordset with it.
              val items: List[List[Any]] =
                if (c.fileEnum.isDefined) enumerateFiles(c.fileEnum.get, values)
                else if (c.adoObjectVar.isDefined &&
                    c.enumeratorKind.exists(_.contains("ForEachADOEnumerator"))) {
                  val v = c.adoObjectVar.get
                  val scopes = List(values.get(v), store.values.get(v)).flatten
                  adoItems(v, scopes.collectFirst {
                    case ds: org.apache.spark.sql.Dataset[_] => ds
                  }.orElse(scopes.headOption))
                } else if (c.nodeListEnum.isDefined &&
                    c.enumeratorKind.exists(_.contains("ForEachNodeListEnumerator")))
                  nodeListItems(c.nodeListEnum.get, values)
                else c.enumItems
              val buf = scala.collection.mutable.ListBuffer.empty[TaskRun]
              val it = items.zipWithIndex.iterator
              var failed = false
              while (it.hasNext && !failed) {
                val (item, i) = it.next()
                val bound = values ++ c.variableMappings.collect {
                  case (qn, idx) if idx < item.length =>
                    qn -> itemValue(item(idx))
                }
                val rs = runChildren(spark, pkg, c, env, bound, store)
                  .map(r => r.copy(taskName = s"${r.taskName}#$i"))
                buf ++= rs
                failed = iterationFailed(rs)
              }
              buf.toList
            case "ForLoop" if c.forLoop.isDefined =>
              val fl = c.forLoop.get
              var cur = fl.initExpression
                .fold(values)(PackageVariables.applyAssignment(spark, _, values))
              val buf = scala.collection.mutable.ListBuffer.empty[TaskRun]
              var i = 0
              var failed = false
              val maxIterations = 10000 // runaway-eval backstop
              while (i < maxIterations && !failed &&
                  PackageVariables.evalBoolean(spark, fl.evalExpression, cur)) {
                val rs = runChildren(spark, pkg, c, env, cur, store)
                  .map(r => r.copy(taskName = s"${r.taskName}#$i"))
                buf ++= rs
                failed = iterationFailed(rs)
                cur = fl.assignExpression
                  .fold(cur)(PackageVariables.applyAssignment(spark, _, cur))
                i += 1
              }
              // runaway backstop fires only when the loop exited BECAUSE
              // of the bound (condition still true, nothing failed) — a
              // child failure on the final iteration keeps its recorded
              // failure instead of being replaced by this error
              if (i == maxIterations && !failed &&
                  PackageVariables.evalBoolean(spark, fl.evalExpression, cur))
                throw new IllegalStateException(
                  s"ForLoop '${c.name}' exceeded $maxIterations iterations")
              buf.toList
            case _ =>
              runChildren(spark, pkg, c, env, values, store)
          }
          val failed = childRuns.collectFirst {
            case TaskRun(_, _, TaskStatus.Failed(e), _, _, _, _) => e
          }
          TaskRun(task.name, s"Container(${c.containerType})",
            failed.fold[TaskStatus](TaskStatus.Succeeded)(TaskStatus.Failed),
            notes = childRuns.map(r => s"${r.taskName}: ${r.status}"))
        case u: UnsupportedTask =>
          TaskRun(task.name, u.executableType, TaskStatus.SkippedManualReview,
            notes = List(u.reviewReason))
      }
    } catch {
      case e: Exception =>
        // same labels as the success path — consumers group RunState JSON
        // by taskType, and failed tasks must not invent a second spelling
        TaskRun(task.name, taskTypeName(task), TaskStatus.Failed(e.getMessage))
    }
}
