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
      /** "[schema].[table]" → write. Mode comes from the task semantics
        * (fast-load append vs full-load overwrite). */
      write: (String, DataFrame, SaveMode) => Unit,
      /** Execute-SQL delegate for statements the engine rewrites
        * (DELETE+INSERT → overwrite etc.); None → recorded as skipped. */
      sqlExecutor: ExecuteSqlTask => Option[SqlOutcome] = _ => None)

  final case class SqlOutcome(df: Option[DataFrame], target: Option[String],
      mode: SaveMode = SaveMode.Overwrite)

  sealed trait TaskStatus
  object TaskStatus {
    case object Succeeded extends TaskStatus
    case object SkippedManualReview extends TaskStatus
    case object SkippedNotConverted extends TaskStatus
    final case class Failed(error: String) extends TaskStatus
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

  def run(spark: SparkSession, pkg: SsisPackage, env: RuntimeEnv): PackageRun = {
    val ordered = pkg.topoOrder.fold(err => throw new IllegalStateException(err), identity)
    val runs = scala.collection.mutable.ListBuffer.empty[TaskRun]
    var abort = false
    ordered.foreach { task =>
      if (!abort) {
        val run = runTask(spark, pkg, task, env)
        runs += run
        run.status match {
          case TaskStatus.Failed(_) => abort = true // Success-constraint semantics
          case _ =>
        }
      }
    }
    PackageRun(pkg.name, runs.toList)
  }

  def runTask(spark: SparkSession, pkg: SsisPackage, task: Task, env: RuntimeEnv): TaskRun =
    try {
      task match {
        case df: DataFlowTask if df.paths.nonEmpty =>
          // branched topology: wiring comes from the <paths> graph
          val dag = DataFlowCompiler.compileDag(df, env.resolver)
          dag.destinations.values.foreach { case (d, frame) =>
            env.write(d.tableName.getOrElse(d.name), frame, SaveMode.Append)
          }
          // terminal non-destination branches still execute (count action)
          val terminalRows = dag.outputs.values.map(_.count()).sum
          val observed = dag.observations.map { case (v, obs) =>
            v -> obs.get.get("row_count").asInstanceOf[Long]
          }
          TaskRun(task.name, "DataFlowTask", TaskStatus.Succeeded,
            if (dag.outputs.nonEmpty) Some(terminalRows) else None, observed,
            notes = dag.warnings)
        case df: DataFlowTask =>
          val compiled = DataFlowCompiler.compile(df, env.resolver)
          val dest = compiled.destination
          val mode = dest.flatMap(_.accessMode) match {
            case Some(3) => SaveMode.Append // fast load = bulk append
            case _ => SaveMode.Append
          }
          val rows = dest match {
            case Some(d) =>
              env.write(d.tableName.getOrElse(d.name), compiled.df, mode)
              None // rows come from observations if a RowCount is present
            case None => Some(compiled.df.count())
          }
          val observed = compiled.observations.map { case (v, obs) =>
            v -> obs.get.get("row_count").asInstanceOf[Long]
          }
          TaskRun(task.name, "DataFlowTask", TaskStatus.Succeeded, rows, observed,
            notes = compiled.warnings)
        case sql: ExecuteSqlTask =>
          val detection = LoadPatterns.detect(sql.sqlStatement, pkg.variables)
          env.sqlExecutor(sql) match {
            case Some(SqlOutcome(Some(out), Some(target), mode)) =>
              env.write(target, out, mode)
              TaskRun(task.name, "ExecuteSQLTask", TaskStatus.Succeeded,
                pattern = Some(detection))
            case Some(SqlOutcome(_, _, _)) =>
              TaskRun(task.name, "ExecuteSQLTask", TaskStatus.Succeeded,
                pattern = Some(detection))
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
        case c: ContainerTask =>
          val childRuns = c.children.map(runTask(spark, pkg, _, env))
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
        TaskRun(task.name, task.getClass.getSimpleName, TaskStatus.Failed(e.getMessage))
    }
}
