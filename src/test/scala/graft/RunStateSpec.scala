package graft

import graft.ir.Ir._
import graft.ops.DataFlowCompiler.Resolver
import graft.pipeline.{PackageRunner, RunState}
import graft.pipeline.PackageRunner.{RuntimeEnv, TaskStatus}
import org.scalatest.funsuite.AnyFunSuite

/** Run-state checkpoint / resume / retry semantics (reference
  * `src/agents/context.py:154-190` state JSON, `orchestrator.py:275-289`
  * retry loop): completed tasks never re-execute on resume; failed tasks
  * and their downstream do; transient failures recover via maxAttempts. */
class RunStateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get

  private def sqlTask(name: String): ExecuteSqlTask =
    ExecuteSqlTask(name, None, connectionId = "", sqlStatement = s"SELECT 1 -- $name")

  private def pkg(tasks: List[Task], constraints: List[PrecedenceConstraint]): SsisPackage =
    SsisPackage("p", None, Nil, Nil, tasks, constraints)

  /** Counts executions per task; fails while `failing` contains the name. */
  private class CountingEnv(@volatile var failing: Set[String]) {
    val executions = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    val env: RuntimeEnv = RuntimeEnv(
      resolver = Resolver(source = _ => sys.error("no source"),
        lookup = _ => sys.error("no lookup")),
      write = (_, _, _) => (),
      sqlExecutor = t => {
        executions(t.name) += 1
        if (failing.contains(t.name)) throw new RuntimeException(s"${t.name} boom")
        Some(PackageRunner.SqlOutcome(None, None))
      })
  }

  private def tmpState(): String =
    java.nio.file.Files.createTempDirectory("runstate").resolve("state.json").toString

  private val chain = List(sqlTask("Load"), sqlTask("Aggregate"), sqlTask("Publish"))
  private val chainEdges = List(
    PrecedenceConstraint("Load", "Aggregate", ConstraintKind.Success),
    PrecedenceConstraint("Aggregate", "Publish", ConstraintKind.Success))

  test("resume skips checkpointed successes and re-runs only the failure's frontier") {
    val state = tmpState()
    val e = new CountingEnv(Set("Aggregate"))
    val first = PackageRunner.runResumable(spark, pkg(chain, chainEdges), e.env, state)
    assert(first.failed)
    val st1 = RunState.load(state)
    assert(st1("Load") === TaskStatus.Succeeded)
    assert(st1("Aggregate").isInstanceOf[TaskStatus.Failed])
    assert(st1("Publish") === TaskStatus.NotRun)

    // fix the environment and resume: Load must NOT re-execute
    e.failing = Set.empty
    val second = PackageRunner.runResumable(spark, pkg(chain, chainEdges), e.env, state)
    assert(!second.failed)
    assert(e.executions("Load") === 1)
    assert(e.executions("Aggregate") === 2)
    assert(e.executions("Publish") === 1)
    assert(second.tasks.find(_.taskName == "Load").get.notes
      .exists(_.contains("resumed from checkpoint")))
    val st2 = RunState.load(state)
    assert(st2.values.forall(_ === TaskStatus.Succeeded))
  }

  test("maxAttempts retries a transiently failing task in-place") {
    val state = tmpState()
    val e = new CountingEnv(Set("Load")) {
      override val env: RuntimeEnv = RuntimeEnv(
        resolver = Resolver(source = _ => sys.error("no source"),
          lookup = _ => sys.error("no lookup")),
        write = (_, _, _) => (),
        sqlExecutor = t => {
          executions(t.name) += 1
          // fail only the FIRST attempt of Load
          if (t.name == "Load" && executions(t.name) == 1)
            throw new RuntimeException("transient boom")
          Some(PackageRunner.SqlOutcome(None, None))
        })
    }
    val run = PackageRunner.runResumable(spark, pkg(chain, chainEdges), e.env,
      state, maxAttempts = 3)
    assert(!run.failed)
    assert(e.executions("Load") === 2) // failed once, succeeded on retry
    assert(run.tasks.find(_.taskName == "Load").get.notes
      .exists(_.contains("attempt 2")))
  }

  test("state file round-trips statuses including failure messages") {
    val run = PackageRunner.PackageRun("demo", List(
      PackageRunner.TaskRun("a", "ExecuteSQLTask", TaskStatus.Succeeded, Some(42L)),
      PackageRunner.TaskRun("b", "ExecuteSQLTask", TaskStatus.Failed("bad \"quote\"\nline")),
      PackageRunner.TaskRun("c", "ScriptTask", TaskStatus.SkippedManualReview)))
    val path = tmpState()
    RunState.save(run, path)
    val loaded = RunState.load(path)
    assert(loaded("a") === TaskStatus.Succeeded)
    assert(loaded("b") === TaskStatus.Failed("bad \"quote\"\nline"))
    assert(loaded("c") === TaskStatus.SkippedManualReview)
    assert(RunState.load(path + ".missing") === Map.empty)
  }
}
