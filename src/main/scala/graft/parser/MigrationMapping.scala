package graft.parser

import graft.expr.SsisExprCompiler
import graft.ir.Ir._
import graft.patterns.LoadPatterns

/** Migration-mapping artifact — the reference's headline output
  * (ssis-to-dbt `output/migration_mapping.json` and
  * `output/scaffolding_report.md`): a per-task conversion ledger with a
  * summary conversion rate. Every consumer of the reference reads this
  * file first to see which tasks auto-converted, which became tests, and
  * which need a human.
  *
  * Same top-level keys as the reference (`version`, `generated_at`,
  * `packages[].tasks[].{ssis_task, ssis_type, status}`, `summary{
  * total_ssis_tasks, converted, converted_to_tests, skipped,
  * manual_review, conversion_rate}`), with `spark_*` fields standing in
  * for the reference's `dbt_*` ones: a task maps to a compiled Spark
  * plan + write, not a dbt model file. Statuses are derived from the
  * ENGINE'S actual executors (the same classification
  * `pipeline/PackageRunner` applies at run time) — never from free-form
  * guessing — so the ledger can only claim what the engine really runs:
  *  - DataFlowTask        → converted iff every component compiles
  *    (`ops/DataFlowCompiler`); an unparsed component or an expression
  *    the SSIS compiler rejects → manual_review.
  *  - ExecuteSQLTask      → converted_to_tests for validation guards
  *    (RAISERROR counts — `validate/ValidationSuite`); converted for
  *    MERGE (`ScdType2.merge`), INSERT…SELECT refreshes
  *    (`SqlPatternRewriter`), sync-log appends + processed-flag
  *    handshakes and bare SELECTs (result binding); skipped for bare
  *    TRUNCATE (overwrite write mode recreates); manual_review
  *    otherwise.
  *  - ScriptTask          → manual_review (reference parity).
  *  - SendMailTask        → skipped (notifications handled externally).
  *  - Containers          → converted iff the enumerator is one the
  *    runner executes (Item/File/ADO/NodeList/ForLoop/Sequence).
  * The reference's sample trio lands at 8/11 = 72.7% here vs the
  * reference's own 63.6% — the delta is exactly the two tasks this
  * engine executes that the reference skips (watermark read with result
  * binding; sync-log append), checked by ArtifactsSpec.
  */
object MigrationMapping {

  final case class TransformMap(component: String, sparkEquivalent: String)

  final case class TaskMapping(
      task: String,
      taskType: String,
      status: String, // converted | converted_to_tests | skipped | manual_review
      sparkPlan: Option[String], // dbt_model analog: what the engine builds
      strategy: Option[String], // dbt_strategy analog: which executor, and how
      transforms: List[TransformMap],
      notes: List[String])

  final case class PackageMapping(
      pkg: String, description: Option[String], tasks: List[TaskMapping])

  final case class Summary(
      total: Int, converted: Int, convertedToTests: Int,
      skipped: Int, manualReview: Int) {
    /** (converted + converted_to_tests) / total — the reference's own
      * formula (6+1 of 11 = "63.6%"). */
    def conversionRate: String =
      if (total == 0) "0.0%"
      else f"${(converted + convertedToTests) * 100.0 / total}%.1f%%"
  }

  // ------------------------------------------------------ classification

  private def stripComments(sql: String): String =
    graft.patterns.SqlText.stripComments(sql)

  /** One component → its Spark equivalent, or Left(reason) when the
    * engine cannot compile it (drives the whole task to manual_review). */
  private def transformOf(c: DataFlowComponent): Either[String, TransformMap] = c match {
    case s: SourceComponent =>
      val how = s.sqlCommand match {
        case Some(_) => "spark.read over the pushed-down SQL command"
        case None => s"spark.read.table(${s.tableName.getOrElse(s.name)})"
      }
      Right(TransformMap(s.name, how))
    case d: DestinationComponent =>
      val mode = if (d.accessMode.contains(3)) "fast-load bulk append" else "append"
      Right(TransformMap(d.name,
        s"DataFrame write to ${d.tableName.getOrElse(d.name)} ($mode)"))
    case l: LookupComponent =>
      val side = l.cacheMode match {
        case CacheMode.Full => "broadcast hash join (full cache)"
        case CacheMode.Partial => "shuffle hash join (partial cache)"
      }
      val onMiss = l.noMatchBehavior match {
        case NoMatchBehavior.FailComponent => "validated (fails on no-match)"
        case NoMatchBehavior.IgnoreFailure => "left outer (no-match → null)"
      }
      Right(TransformMap(l.name,
        s"$side on (${l.inputColumns.mkString(", ")}), $onMiss"))
    case dc: DerivedColumnComponent =>
      // compile each expression through the real SSIS expression compiler:
      // a rejected expression means the task is NOT auto-convertible
      val results = dc.columns.map { col =>
        try Right(s"${SsisExprCompiler.compile(col.expression)} AS ${col.name}")
        catch {
          case e: Exception =>
            Left(s"${dc.name}(${col.name}): expression rejected — ${e.getMessage}")
        }
      }
      results.collectFirst { case Left(err) => err } match {
        case Some(err) => Left(err)
        case None =>
          Right(TransformMap(dc.name,
            results.collect { case Right(s) => s }.mkString("; ")))
      }
    case cs: ConditionalSplitComponent =>
      Right(TransformMap(cs.name,
        s"single-pass CASE-tag routing: ${(cs.cases.map(_._1) :+ cs.defaultOutput).mkString(", ")}"))
    case a: AggregateComponent =>
      val gb = a.groupByCols
      val aggs = a.aggs.filterNot(_.fn == AggFunction.GroupBy)
        .map(s => s"${s.fn.toString.toLowerCase}(${s.inputColumn}) AS ${s.outputName}")
      Right(TransformMap(a.name,
        s"groupBy(${gb.mkString(", ")}).agg(${aggs.mkString(", ")})"))
    case mj: MergeJoinComponent =>
      Right(TransformMap(mj.name,
        s"${mj.joinType.toLowerCase} join on (${mj.leftKeys.zip(mj.rightKeys)
          .map { case (l, r) => s"$l = $r" }.mkString(", ")})"))
    case u: UnionAllComponent => Right(TransformMap(u.name, "unionByName"))
    case s: SortComponent =>
      Right(TransformMap(s.name, s"orderBy(${s.sortColumns
        .map { case (c, asc) => if (asc) c else s"$c DESC" }.mkString(", ")})"))
    case rc: RowCountComponent =>
      Right(TransformMap(rc.name,
        s"Observation row_count → ${rc.variableName} (no extra action)"))
    case dc: DataConversionComponent =>
      Right(TransformMap(dc.name, dc.conversions
        .map { case (c, t) => s"cast($c AS ${t.name}) AS ${c}_conv" }.mkString("; ")))
    case u: UnparsedComponent =>
      Left(s"${u.name}: unrecognized component type ${u.componentType}")
  }

  private def mapDataFlow(t: DataFlowTask): TaskMapping = {
    val (errors, transforms) = t.components.map(transformOf).partitionMap(identity)
    val dest = t.destinations.headOption.flatMap(_.tableName)
    if (errors.nonEmpty)
      TaskMapping(t.name, "DataFlowTask", "manual_review", None, None,
        transforms, errors)
    else
      TaskMapping(t.name, "DataFlowTask", "converted",
        dest.orElse(Some(t.name)),
        Some("compiled DataFrame pipeline (ops/DataFlowCompiler)"),
        transforms, Nil)
  }

  private def mapSqlTask(t: ExecuteSqlTask, variables: Seq[Variable]): TaskMapping = {
    val sql = stripComments(t.sqlStatement)
    val upper = sql.toUpperCase
    val detection = LoadPatterns.detect(sql, variables)
    def signals = detection.signals.map(s => s"signal: $s")
    val insertSelect = "(?is)insert\\s+into\\s+(\\S+)[\\s(].*?select\\b".r
    val insertValues = "(?is)insert\\s+into\\s+(\\S+)\\s*\\([^)]*\\)\\s*values\\b".r

    if (graft.patterns.GuardBlockSqlCompiler.shapeMatches(sql))
      TaskMapping(t.name, "ExecuteSQLTask", "converted_to_tests", None,
        Some("pre-ETL guard block EXECUTES (patterns/GuardBlockSqlCompiler: " +
          "scalar collects + IF predicate, RAISERROR severity >= 11 fails " +
          "the task like SSIS); also expressible as validate/ValidationSuite " +
          "checks"), Nil, signals)
    else if (upper.contains("RAISERROR"))
      TaskMapping(t.name, "ExecuteSQLTask", "converted_to_tests", None,
        Some("validation aggregate guard (validate/ValidationSuite) — " +
          "RAISERROR becomes a failed check"), Nil, signals)
    else if ("(?i)\\bmerge\\b\\s+(into\\s+)?\\S+".r.findFirstIn(sql).isDefined &&
        upper.contains("USING"))
      TaskMapping(t.name, "ExecuteSQLTask", "converted",
        "(?is)merge\\s+(?:into\\s+)?(\\S+)".r.findFirstMatchIn(sql).map(_.group(1)),
        Some("canonical MERGE executes (patterns/MergeSqlCompiler — one " +
          "full-outer-join state replacement with the fused 8672 guard); " +
          "dataflow SCD2 via patterns/ScdType2.merge" +
          (if (graft.patterns.MergeSqlCompiler.bySourceShape(sql))
             "; WHEN NOT MATCHED BY SOURCE retires/flags source-absent " +
               "target rows on the same frame's null-source leg"
           else "") +
          (if (graft.patterns.MergeSqlCompiler.outputShape(sql))
             "; OUTPUT…INTO change feed rides the side append ($action + " +
               "deleted/inserted images from the same joined frame)"
           else "")), Nil, signals)
    else if (graft.patterns.ScriptedSqlExecutor.tryCatchShape(sql))
      TaskMapping(t.name, "ExecuteSQLTask", "converted", None,
        Some("TRY/CATCH batch executes (patterns/ScriptedSqlExecutor — " +
          "T-SQL-catchable aborts are caught: the eager 2714/3701/arity " +
          "classes plus the lazy 8672 multi-match guards, forced at each " +
          "statement; pre-failure effects stay staged (T-SQL without " +
          "XACT_ABORT), ERROR_MESSAGE() binds the caught text; a CATCH " +
          "LEADING with a bare ROLLBACK discards the TRY's staged " +
          "effects first — the all-or-nothing idiom; any other " +
          "rollback placement stays manual review)"),
        Nil, signals)
    else if (graft.patterns.IfExistsSqlCompiler.shapeMatches(sql))
      TaskMapping(t.name, "ExecuteSQLTask", "converted", None,
        Some("IF [NOT] EXISTS branch executes (patterns/" +
          "IfExistsSqlCompiler — LIMIT-1 probe decides, the taken " +
          "branch runs through the statement chain; both branches must " +
          "be single ownable statements)"), Nil, signals)
    else if (graft.patterns.IfScalarSqlCompiler.shapeMatches(sql))
      TaskMapping(t.name, "ExecuteSQLTask", "converted", None,
        Some("scalar-predicate IF branch executes (patterns/" +
          "IfScalarSqlCompiler — the predicate folds eagerly as one " +
          "driver fact, NULL takes the ELSE like T-SQL's UNKNOWN; the " +
          "taken branch runs through the statement chain; both " +
          "branches must be single ownable statements)"), Nil, signals)
    else if (graft.patterns.IfLadderSqlCompiler.ownsWholeText(sql))
      TaskMapping(t.name, "ExecuteSQLTask", "converted", None,
        Some("IF ladder executes (patterns/IfLadderSqlCompiler — " +
          "multi-statement BEGIN…END branches, ELSE IF first-match " +
          "cascades, and mixed scalar/EXISTS predicates fold as eager " +
          "driver probes; the taken leg's statements run through the " +
          "script overlay; nested control flow stays manual review)"),
        Nil, signals)
    else if (graft.patterns.WhileLoopSqlCompiler.shapeMatches(sql))
      TaskMapping(t.name, "ExecuteSQLTask", "converted", None,
        Some("counter WHILE loop unrolls (patterns/WhileLoopSqlCompiler " +
          "— driver-evaluated control flow, body statements execute " +
          "through the script overlay; data-dependent loops stay " +
          "manual review)"), Nil, signals)
    // the executable cursor test runs BEFORE the statement-fragment
    // branches: an INSERT-body FETCH loop would otherwise classify as a
    // bare INSERT…VALUES append — the whole-text anchors make this
    // branch precise, so testing early is safe
    else if (graft.patterns.ProcInlineSqlCompiler.rewriteToScript(sql).isDefined)
      TaskMapping(t.name, "ExecuteSQLTask", "converted", None,
        Some("script-local stored procedure inlines (patterns/" +
          "ProcInlineSqlCompiler — the CREATE PROCEDURE batch's body is " +
          "IN the script, so each EXEC call expands hygienically: one " +
          "DECLARE per parameter in a per-call namespace (literal OR " +
          "same-batch declared-variable arguments), body-locals " +
          "renamed alongside; multiple helpers own, each in its own " +
          "batch; scalar OUTPUT parameters copy in and write back " +
          "post-body; INSERT INTO t EXEC helper inlines a single-" +
          "SELECT body as the INSERT source; procs created elsewhere " +
          "keep the manual-review decline, their bodies are invisible)"),
        Nil, signals)
    else if (graft.patterns.CursorLoopSqlCompiler.rewriteToScript(sql).isDefined)
      TaskMapping(t.name, "ExecuteSQLTask", "converted", None,
        Some("canonical CURSOR FETCH loop executes set-based (patterns/" +
          "CursorLoopSqlCompiler — the cursor SELECT stages once, each " +
          "body DML becomes a join-update / anti-join delete / " +
          "insert-select (multi-statement bodies own when targets are " +
          "pairwise-distinct tables); an UPDATE whose target row two " +
          "cursor rows would hit aborts via the multi-match guard)"),
        Nil, signals)
    else if (graft.patterns.BatchedDmlLoopSqlCompiler
        .rewriteToStatement(sql).isDefined)
      TaskMapping(t.name, "ExecuteSQLTask", "converted", None,
        Some("batched-DML purge loop executes as its set-based fixpoint " +
          "(patterns/BatchedDmlLoopSqlCompiler — TOP (n) chunking exists " +
          "for row-store log pressure, which state replacement has no " +
          "analog of; the UPDATE form compiles only when a SET literal " +
          "provably falsifies a WHERE conjunct, so every batch shrinks " +
          "the pred-set)"), Nil, signals)
    else if (graft.patterns.ScriptedSqlExecutor.scriptFeatures(sql).isDefined)
      TaskMapping(t.name, "ExecuteSQLTask", "converted", None,
        Some("sequential shadow-overlay script (patterns/" +
          "ScriptedSqlExecutor): " +
          graft.patterns.ScriptedSqlExecutor.scriptFeatures(sql).get),
        Nil, signals)
    else if (insertSelect.findFirstMatchIn(sql).isDefined &&
        !graft.patterns.XmlPathAgg.translate(sql).exists(_.isLeft) &&
        !graft.patterns.PivotSql.translate(sql).exists(_.isLeft)) {
      val target = insertSelect.findFirstMatchIn(sql).map(_.group(1))
      val mode =
        if (upper.contains("DELETE FROM") || upper.contains("TRUNCATE TABLE"))
          "overwrite (DELETE+INSERT refresh)"
        else "append"
      val xmlAgg =
        if (graft.patterns.XmlPathAgg.translate(sql).isDefined)
          "; STUFF(… FOR XML PATH('')) group-concat translates to a " +
            "correlated collect_list subquery (patterns/XmlPathAgg)"
        else ""
      TaskMapping(t.name, "ExecuteSQLTask", "converted", target,
        Some(s"refresh rewrite (patterns/SqlPatternRewriter): SELECT compiles " +
          s"to a DataFrame, written $mode$xmlAgg"), Nil, signals)
    } else if (upper.startsWith("TRUNCATE TABLE") &&
        !upper.contains("INSERT") && !upper.contains("SELECT"))
      TaskMapping(t.name, "ExecuteSQLTask", "converted", None,
        Some("empty overwrite, schema kept (patterns/DeleteSqlCompiler); " +
          "a following reload's overwrite also recreates the table"),
        Nil, signals)
    else if (insertValues.findFirstMatchIn(sql).isDefined) {
      val target = insertValues.findFirstMatchIn(sql).map(_.group(1))
      val handshake = "(?i)update\\s.{0,80}?processed.?flag".r.findFirstIn(sql).isDefined
      TaskMapping(t.name, "ExecuteSQLTask", "converted", target,
        Some("sync-log append (patterns/Incremental.syncLogEntry)" +
          (if (handshake) " + processed-flag handshake (Incremental.unprocessed)"
           else "")), Nil, signals)
    } else if (graft.patterns.SelectIntoSqlCompiler.shapeTarget(sql).isDefined)
      TaskMapping(t.name, "ExecuteSQLTask", "converted",
        graft.patterns.SelectIntoSqlCompiler.shapeTarget(sql),
        Some("SELECT INTO creates its target (patterns/SelectIntoSqlCompiler " +
          "— INTO excised, pure SELECT runs, first generation written; " +
          "pre-existing target aborts with T-SQL 2714 parity)"), Nil, signals)
    else if (upper.startsWith("SELECT"))
      TaskMapping(t.name, "ExecuteSQLTask", "converted", None,
        Some("SELECT compiles to a DataFrame" + t.resultVariable.fold("")(v =>
          s"; result set bound to $v (watermark read / ForEach ADO feed)")),
        Nil, signals)
    else if (graft.patterns.OutputIntoSqlCompiler.shapeMatches(sql))
      TaskMapping(t.name, "ExecuteSQLTask", "converted", None,
        Some("OUTPUT…INTO DML executes (patterns/OutputIntoSqlCompiler — " +
          "audit/archive rows from the fired pre-state rows ride a side " +
          "append before the state replacement; both frames are narrow " +
          "projections of one scan)"), Nil, signals)
    else if (graft.patterns.UpdateSqlCompiler.shapeMatches(sql))
      TaskMapping(t.name, "ExecuteSQLTask", "converted", None,
        Some("canonical UPDATE executes (patterns/UpdateSqlCompiler — " +
          "CASE-projection state replacement, pre-update-row semantics)"),
        Nil, signals)
    else if (graft.patterns.UpdateFromSqlCompiler.shapeMatches(sql))
      TaskMapping(t.name, "ExecuteSQLTask", "converted", None,
        Some("correlated UPDATE...FROM executes (patterns/" +
          "UpdateFromSqlCompiler — one target-source join with the " +
          "multi-match guard)"), Nil, signals)
    else if (graft.patterns.DeleteFromSqlCompiler.shapeMatches(sql))
      TaskMapping(t.name, "ExecuteSQLTask", "converted", None,
        Some("correlated DELETE...FROM executes (patterns/" +
          "DeleteFromSqlCompiler — one anti-join state replacement)"),
        Nil, signals)
    else if (graft.patterns.DeleteSqlCompiler.shapeMatches(sql))
      TaskMapping(t.name, "ExecuteSQLTask", "converted", None,
        Some("canonical DELETE executes (patterns/DeleteSqlCompiler — " +
          "keep-NOT-TRUE filter + overwrite)"), Nil, signals)
    else if (upper.startsWith("UPDATE") &&
        detection.pattern == LoadPatterns.LoadPattern.Incremental)
      TaskMapping(t.name, "ExecuteSQLTask", "converted", None,
        Some("processed-flag / watermark executor (patterns/Incremental)"),
        Nil, signals)
    else if (graft.patterns.AlterTableSqlCompiler.shapeMatches(sql))
      TaskMapping(t.name, "ExecuteSQLTask", "converted", None,
        Some("migration DDL executes (patterns/AlterTableSqlCompiler — " +
          "ADD appends the typed DEFAULT/NULL column as one narrow " +
          "projection, DROP COLUMN projects it away, ALTER COLUMN " +
          "re-types in place with lazy 245/8114/515 conversion guards; " +
          "2705/4901/4924 T-SQL parity errors hold; constraints, " +
          "COLLATE, and IDENTITY stay manual review)"), Nil, signals)
    else if (graft.patterns.NoopDdlSqlCompiler.shapeMatches(sql))
      TaskMapping(t.name, "ExecuteSQLTask", "converted", None,
        Some("physical-tuning DDL / WAITFOR executes as a no-op (patterns/" +
          "NoopDdlSqlCompiler — rowstore indexes and manual statistics " +
          "have no relational content in a columnar engine; bucketing/" +
          "z-order are this engine's explicit analogs and parquet " +
          "gathers column stats at write time; WAITFOR DELAY/TIME is " +
          "the orchestrator's job in a replay and the state is " +
          "bit-identical)"), Nil, signals)
    else if (graft.patterns.ExecLiteralSqlCompiler.unwrap(sql).isDefined ||
        graft.patterns.ExecLiteralSqlCompiler.bindParameterized(sql).isDefined ||
        graft.patterns.ExecLiteralSqlCompiler.foldConcatenated(sql).isDefined)
      TaskMapping(t.name, "ExecuteSQLTask", "converted", None,
        Some("literal dynamic SQL unwraps (patterns/ExecLiteralSqlCompiler" +
          " — sp_executesql/EXEC('…') around a single static statement " +
          "compiles inline, the parameterized sp_executesql form binds " +
          "literal @p arguments as typed literals, and a constant `+` " +
          "concatenation folds to its exact T-SQL text; expression " +
          "args, OUTPUT params, and non-constant concatenation stay " +
          "manual review)"),
        Nil, signals)
    else if ("(?is)\\bdeclare\\b.{0,120}?\\bcursor\\b".r
        .findFirstIn(sql).isDefined)
      TaskMapping(t.name, "ExecuteSQLTask", "manual_review", None, None, Nil,
        List("CURSOR loop: row-at-a-time control flow this engine will " +
          "not replay — rewrite set-based (a WHILE counter loop or one " +
          "DML statement usually replaces it; the canonical FETCH-loop " +
          "shape with distinct-target body DML converts automatically " +
          "via CursorLoopSqlCompiler)") ++
          signals)
    else
      TaskMapping(t.name, "ExecuteSQLTask", "manual_review", None, None, Nil,
        List("statement shape not auto-convertible") ++ signals)
  }

  /** Classify one top-level task (containers recurse into children for
    * notes but count once, like the reference's per-task ledger). */
  def mapTask(t: Task, variables: Seq[Variable]): TaskMapping = t match {
    case d: DataFlowTask => mapDataFlow(d)
    case s: ExecuteSqlTask => mapSqlTask(s, variables)
    case s: ScriptTask =>
      TaskMapping(s.name, "ScriptTask", "manual_review", None, None, Nil,
        List(s.reviewReason))
    case m: SendMailTask =>
      TaskMapping(m.name, "SendMailTask", "skipped", None,
        Some("notifications handled externally"), Nil, List(m.skipReason))
    case u: UnsupportedTask =>
      TaskMapping(u.name, u.executableType, "manual_review", None, None, Nil,
        List(u.reviewReason))
    case c: ContainerTask =>
      val childMaps = c.children.map(mapTask(_, variables))
      val enumerable = c.containerType match {
        case "ForEachLoop" =>
          c.enumeratorKind.forall(k => k.contains("ForEachItemEnumerator") ||
            (k.contains("ForEachFileEnumerator") && c.fileEnum.isDefined) ||
            (k.contains("ForEachADOEnumerator") && c.adoObjectVar.isDefined) ||
            (k.contains("ForEachNodeListEnumerator") && c.nodeListEnum.isDefined)) &&
            (c.enumeratorKind.isDefined || c.enumItems.nonEmpty)
        case "ForLoop" => c.forLoop.isDefined
        case _ => true // Sequence
      }
      val childBad = childMaps.filter(_.status == "manual_review")
      val status =
        if (!enumerable || childBad.nonEmpty) "manual_review" else "converted"
      TaskMapping(c.name, s"Container(${c.containerType})", status, None,
        Some(c.containerType match {
          case "ForEachLoop" => "driver-side enumerator → per-item child DAG passes"
          case "ForLoop" => "driver-side loop over evaluated SSIS expressions"
          case _ => "sequential child execution"
        }),
        Nil,
        (if (enumerable) Nil
         else List(s"unsupported enumerator ${c.enumeratorKind.getOrElse("(none)")}")) ++
          childMaps.map(cm => s"child ${cm.task}: ${cm.status}"))
  }

  def mapPackage(pkg: SsisPackage): PackageMapping =
    PackageMapping(pkg.name, pkg.description,
      pkg.tasks.map(mapTask(_, pkg.variables)))

  def summarize(pkgs: Seq[PackageMapping]): Summary = {
    val ts = pkgs.flatMap(_.tasks)
    Summary(ts.size,
      ts.count(_.status == "converted"),
      ts.count(_.status == "converted_to_tests"),
      ts.count(_.status == "skipped"),
      ts.count(_.status == "manual_review"))
  }

  // ----------------------------------------------------------- artifacts

  private def q(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def obj(fields: (String, String)*): String =
    fields.map { case (k, v) => s"${q(k)}: $v" }.mkString("{", ", ", "}")

  private def arr(items: Seq[String]): String = items.mkString("[", ", ", "]")

  private def opt(o: Option[String]): String = o.fold("null")(q)

  /** `migration_mapping.json` — reference key parity with `spark_*`
    * fields in place of `dbt_*`. `generatedAt` is injected so golden
    * tests stay deterministic. */
  def toJson(pkgs: Seq[SsisPackage], generatedAt: String): String = {
    val mapped = pkgs.map(mapPackage)
    val s = summarize(mapped)
    obj(
      "version" -> q("1.0.0"),
      "generated_at" -> q(generatedAt),
      "packages" -> arr(mapped.map { p =>
        obj(
          "ssis_package" -> q(p.pkg + ".dtsx"),
          "description" -> opt(p.description),
          "tasks" -> arr(p.tasks.map { t =>
            obj(
              "ssis_task" -> q(t.task),
              "ssis_type" -> q(t.taskType),
              "spark_plan" -> opt(t.sparkPlan),
              "spark_strategy" -> opt(t.strategy),
              "transforms_mapped" -> arr(t.transforms.map(tm => obj(
                "ssis_component" -> q(tm.component),
                "spark_equivalent" -> q(tm.sparkEquivalent)))),
              "notes" -> arr(t.notes.map(q)),
              "status" -> q(t.status))
          }))
      }),
      "summary" -> obj(
        "total_ssis_tasks" -> s.total.toString,
        "converted" -> s.converted.toString,
        "converted_to_tests" -> s.convertedToTests.toString,
        "skipped" -> s.skipped.toString,
        "manual_review" -> s.manualReview.toString,
        "conversion_rate" -> q(s.conversionRate)),
      "spark_plans_created" -> arr(
        mapped.flatMap(_.tasks).flatMap(_.sparkPlan).distinct.map(q)))
  }

  /** `scaffolding_report.md` analog: the Summary table and per-package
    * model-mapping tables, plus the manual-review list a migration owner
    * works through. */
  def markdownReport(pkgs: Seq[SsisPackage], generatedAt: String): String = {
    val mapped = pkgs.map(mapPackage)
    val s = summarize(mapped)
    val b = new StringBuilder
    b ++= "# Spark Migration Scaffolding Report\n\n"
    b ++= s"**Generated**: $generatedAt\n\n"
    b ++= "## Summary\n\n| Metric | Count |\n|--------|-------|\n"
    b ++= s"| SSIS Packages Processed | ${mapped.size} |\n"
    b ++= s"| Total SSIS Tasks | ${s.total} |\n"
    b ++= s"| Spark Plans Created | ${mapped.flatMap(_.tasks).flatMap(_.sparkPlan).distinct.size} |\n"
    b ++= s"| Tasks Converted | ${s.converted} |\n"
    b ++= s"| Tasks Converted to Tests | ${s.convertedToTests} |\n"
    b ++= s"| Tasks Skipped | ${s.skipped} |\n"
    b ++= s"| Tasks Requiring Manual Review | ${s.manualReview} |\n"
    b ++= s"| Conversion Rate | ${s.conversionRate} |\n\n"
    b ++= "## Task Mapping\n\n"
    mapped.foreach { p =>
      b ++= s"### ${p.pkg}.dtsx\n\n"
      b ++= "| SSIS Task | Type | Spark Plan | Status |\n"
      b ++= "|-----------|------|------------|--------|\n"
      p.tasks.foreach { t =>
        val plan = t.sparkPlan.fold("-")(n => s"`$n`")
        val st = t.status match {
          case "manual_review" => "**Manual Review Required**"
          case "converted_to_tests" => "Converted to tests"
          case other => other.capitalize
        }
        b ++= s"| ${t.task} | ${t.taskType} | $plan | $st |\n"
      }
      b ++= "\n"
    }
    val lookups = mapped.flatMap(p => p.tasks.flatMap(t =>
      t.transforms.filter(_.sparkEquivalent.contains("join"))
        .map(tm => (p.pkg, tm))))
    if (lookups.nonEmpty) {
      b ++= "## Transform Mappings\n\n### SSIS Lookup / Join → Spark join\n\n"
      b ++= "| Package | Transform | Spark Equivalent |\n|---------|-----------|------------------|\n"
      lookups.foreach { case (pkg, tm) =>
        b ++= s"| $pkg | ${tm.component} | ${tm.sparkEquivalent} |\n"
      }
      b ++= "\n"
    }
    val reviews = mapped.flatMap(p => p.tasks.filter(_.status == "manual_review")
      .map(t => (p.pkg, t)))
    if (reviews.nonEmpty) {
      b ++= "## Manual Review Required\n\n"
      reviews.foreach { case (pkg, t) =>
        b ++= s"- **$pkg / ${t.task}** (${t.taskType}): ${t.notes.headOption.getOrElse("")}\n"
      }
      b ++= "\n"
    }
    b.result()
  }
}
