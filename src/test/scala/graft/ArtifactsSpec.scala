package graft

import com.fasterxml.jackson.databind.ObjectMapper
import graft.parser.{DtsxParser, PackageJson}
import graft.validate.{ValidationJson, ValidationSuite}
import graft.validate.ValidationJson.ModelValidation
import org.scalatest.funsuite.AnyFunSuite

/** Golden-shape specs for the exported artifacts: `schema_metadata.json`
  * (reference `src/parser/ssis_parser.py:532-580,620-639` shape over the
  * same 3 sample packages) and `validation_log.json` /
  * `validation_report.md` (`src/validation/validator.py:393-531`). JSON is
  * validated structurally via Jackson (ships with Spark). */
class ArtifactsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private val mapper = new ObjectMapper

  private def fixture(name: String) =
    DtsxParser.parseFile(getClass.getResource(s"/dtsx/$name").getPath)

  private lazy val samplePkgs = List(
    fixture("SalesFactETL.dtsx"), fixture("CustomerDataLoad.dtsx"),
    fixture("InventorySync.dtsx"))

  test("schema_metadata.json: reference-parity tables with referenced_in lineage") {
    val json = PackageJson.schemaMetadataJson(samplePkgs)
    val root = mapper.readTree(json)
    assert(root.has("tables") && root.has("columns") && root.has("source_systems"))
    val tables = (0 until root.get("tables").size())
      .map(root.get("tables").get)
    val byFull = tables.map(t => t.get("full_name").asText() -> t).toMap
    // the reference's own output/schema_metadata.json carries exactly these
    // three destination tables for the same packages
    assert(byFull.contains("fact.Sales"))
    assert(byFull.contains("fact.InventorySnapshot"))
    assert(byFull("fact.Sales").get("schema_name").asText() === "fact")
    assert(byFull("fact.Sales").get("table_name").asText() === "Sales")
    val refIn = byFull("fact.Sales").get("referenced_in")
    assert((0 until refIn.size()).map(refIn.get(_).asText())
      .contains("Load Sales Facts"))
  }

  test("schema_metadata.json: includeSqlTables adds SQL-mode source lineage") {
    val json = PackageJson.schemaMetadataJson(samplePkgs, includeSqlTables = true)
    val root = mapper.readTree(json)
    val fulls = (0 until root.get("tables").size())
      .map(root.get("tables").get(_).get("full_name").asText())
    // SalesFactETL's source is SQL-mode over sales.Transactions — invisible
    // to the reference's exporter, recovered here
    val sqlNames = samplePkgs.flatMap(_.tasks).collect {
      case d: graft.ir.Ir.DataFlowTask => d.sources.flatMap(_.sqlCommand)
    }.flatten
    if (sqlNames.exists(_.contains("[")))
      assert(fulls.size > 3)
    assert(fulls.distinct.size === fulls.size, "no duplicate table entries")
  }

  private lazy val actualDf = Seq((1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0))
    .toDF("id", "name", "amount")
  private lazy val expectedDf = actualDf

  test("validation_log.json matches the reference ValidationReport structure") {
    val results =
      ValidationSuite.rowCountMatch(actualDf, expectedDf, "dim.Customer") ::
        ValidationSuite.pkIntegrity(actualDf, Seq("id"), "dim.Customer") :::
        ValidationSuite.checksum(actualDf, expectedDf, "amount", "dim.Customer")
    val model = ModelValidation("dim_customer", "CustomerDataLoad.dtsx",
      "Merge to Dimension", Some("dim.Customer"), results)
    val json = ValidationJson.logJson(List(model), "2026-01-01 00:00:00")
    val root = mapper.readTree(json)
    assert(root.get("generated_at").asText() === "2026-01-01 00:00:00")
    assert(root.get("dbt_run").isNull)
    val mv = root.get("model_validations").get(0)
    assert(mv.get("model_name").asText() === "dim_customer")
    assert(mv.get("ssis_package").asText() === "CustomerDataLoad.dtsx")
    val rc = mv.get("row_count")
    assert(rc.get("legacy_count").asLong() === 3L)
    assert(rc.get("dbt_count").asLong() === 3L)
    assert(rc.get("difference").asLong() === 0L)
    assert(rc.get("status").asText() === "passed")
    val pk = mv.get("primary_key")
    assert(pk.get("pk_column").asText() === "id")
    assert(pk.get("null_count").asLong() === 0L)
    assert(pk.get("duplicate_count").asLong() === 0L)
    val cs = mv.get("checksums").get(0)
    assert(cs.get("column").asText() === "amount")
    assert(cs.get("legacy_sum").asDouble() === 60.0)
    assert(cs.get("status").asText() === "passed")
    assert(mv.get("overall_status").asText() === "passed")
    assert(root.get("total_models").asInt() === 1)
    assert(root.get("models_passed").asInt() === 1)
    assert(root.get("overall_status").asText() === "passed")
  }

  test("failed data tests surface as errors and fail the model") {
    val bad = Seq((1, Option.empty[String]), (2, Some("x"))).toDF("id", "name")
    val results = List(
      ValidationSuite.rowCountMatch(bad, bad, "stg.T"),
      ValidationSuite.notNull(bad, "name", "stg.T"))
    val model = ModelValidation("stg_t", "P.dtsx", "Load", Some("stg.T"), results)
    val root = mapper.readTree(ValidationJson.logJson(List(model), "t"))
    val mv = root.get("model_validations").get(0)
    assert(mv.get("overall_status").asText() === "failed")
    assert(mv.get("errors").get(0).asText().contains("not_null(name)"))
    assert(root.get("models_failed").asInt() === 1)
    assert(root.get("overall_status").asText() === "failed")
  }

  test("diagnoser classifies seeded failures with causes, fixes, and retry verdict") {
    import graft.validate.Diagnoser
    // seeded defects: the migrated frame drops a row (missing-rows rule),
    // carries a NULL id and a duplicate id (both PK rules), and perturbs
    // the amount sum (checksum rule)
    val legacy = Seq((1, 10.0), (2, 20.0), (3, 30.0), (4, 40.0), (5, 50.0))
      .toDF("id", "amount")
    val migratedBase = Seq(
      (Option(1), 10.0), (Option.empty[Int], 20.0), (Option(3), 31.5), (Option(3), 40.0))
      .toDF("id", "amount")
    val results =
      ValidationSuite.rowCountMatch(migratedBase, legacy, "fact.Sales") ::
        ValidationSuite.pkIntegrity(migratedBase, Seq("id"), "fact.Sales") :::
        ValidationSuite.checksum(migratedBase, legacy, "amount", "fact.Sales")
    val model = ModelValidation("fact_sales", "SalesFactETL.dtsx", "Load Sales Facts",
      Some("fact.Sales"), results)
    val report = Diagnoser.diagnose(List(model))
    assert(report.hasFailures && report.failedCount === 1)
    val d = report.diagnoses.head
    assert(d.rootCauses.exists(_.contains("Missing rows")))
    assert(d.rootCauses.exists(_.startsWith("NULL primary keys: 1")))
    assert(d.rootCauses.exists(_.startsWith("Duplicate primary keys: 1")))
    assert(d.rootCauses.exists(_.contains("Numeric mismatch in columns: amount")))
    assert(d.suggestedFixes.exists(f =>
      f.description.contains("NOT NULL filter") && f.priority == "high"))
    assert(d.suggestedFixes.exists(_.description.contains("ROW_NUMBER()")))
    assert(d.investigationQueries.exists(_.contains("GROUP BY id HAVING COUNT(*) > 1")))
    // a row-count mismatch is not auto-fixable → no auto-retry
    assert(!d.canAutoFix && !report.canRetry)

    // JSON export parses and carries the AgentResult.data shape
    val root = mapper.readTree(Diagnoser.reportJson(report))
    assert(root.get("has_failures").asBoolean())
    assert(root.get("failed_count").asInt() === 1)
    assert(root.get("can_retry").asBoolean() === false)
    val dj = root.get("diagnoses").get(0)
    assert(dj.get("model").asText() === "fact_sales")
    assert(dj.get("suggested_fixes").size() >= 4)
    // markdown report
    val md = Diagnoser.markdownReport(report)
    assert(md.contains("# Validation Failure Diagnosis Report"))
    assert(md.contains("**Can Auto-Retry:** No"))
    assert(md.contains("## fact_sales"))
  }

  test("diagnoser: PK-only failures are auto-fixable and retryable") {
    import graft.validate.Diagnoser
    val migrated = Seq((Option(1), 10.0), (Option(1), 20.0), (Option(3), 30.0))
      .toDF("id", "amount")
    val results = ValidationSuite.pkIntegrity(migrated, Seq("id"), "dim.C")
    val model = ModelValidation("dim_c", "P.dtsx", "Load", Some("dim.C"), results)
    val report = Diagnoser.diagnose(List(model))
    val d = report.diagnoses.head
    assert(d.category === "logic_error")
    assert(d.canAutoFix && !d.requiresManualReview)
    assert(report.canRetry)
  }

  test("diagnoser: an avg-only checksum failure still gets a numeric-mismatch cause") {
    import graft.validate.Diagnoser
    // sums equal, averages skewed: extra zero-amount rows within the
    // row-count tolerance — must not fall through every rule undiagnosed
    val results = List(
      ValidationSuite.CheckResult("checksum_sum(amount)", "fact.S", passed = true, "60.0", "60.0"),
      ValidationSuite.CheckResult("checksum_avg(amount)", "fact.S", passed = false, "20.0", "15.0"))
    val report = Diagnoser.diagnose(List(
      ModelValidation("fact_s", "P.dtsx", "Load", Some("fact.S"), results)))
    val d = report.diagnoses.head
    assert(d.rootCauses.exists(_.contains("Numeric mismatch in columns: amount")))
    assert(d.category === "data_mismatch")
    assert(d.suggestedFixes.nonEmpty)
  }

  test("diagnoser: clean validation reports no failures and no retry") {
    import graft.validate.Diagnoser
    val results = ValidationSuite.rowCountMatch(actualDf, expectedDf, "dim.Customer") :: Nil
    val report = Diagnoser.diagnose(List(
      ModelValidation("dim_customer", "P.dtsx", "Load", None, results)))
    assert(!report.hasFailures && report.diagnoses.isEmpty && !report.canRetry)
  }

  test("validation_report.md carries the summary table and per-model sections") {
    val results = ValidationSuite.rowCountMatch(actualDf, expectedDf, "dim.Customer") :: Nil
    val md = ValidationJson.markdownReport(List(
      ModelValidation("dim_customer", "CustomerDataLoad.dtsx", "Merge to Dimension",
        Some("dim.Customer"), results)), "2026-01-01 00:00:00")
    assert(md.contains("# Migration Validation Report"))
    assert(md.contains("| Total Models | 1 |"))
    assert(md.contains("| Overall Status | **PASSED** |"))
    assert(md.contains("### dim_customer [PASS]"))
    assert(md.contains("- **SSIS Package**: CustomerDataLoad.dtsx"))
  }

  test("exportAll writes the reference's full output/ artifact set side by side") {
    import graft.parser.ArtifactExport
    val out = java.nio.file.Files.createTempDirectory("graft_artifacts").toString
    val written = ArtifactExport.exportAll(samplePkgs, out, "2026-01-01T00:00:00")
    val names = written.map(p => new java.io.File(p).getName).toSet
    // the reference's output/ directory carries exactly these parse-time
    // artifacts (validation pair is runtime output, exported after a run)
    assert(names === Set("parsed_packages.json", "schema_metadata.json",
      "parsing_report.md", "migration_mapping.json", "scaffolding_report.md"))
    written.filter(_.endsWith(".json")).foreach { p =>
      val root = mapper.readTree(new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)), "UTF-8"))
      assert(root !== null, s"$p must parse as JSON")
    }
  }

  test("migration_mapping.json: per-task ledger over the reference sample trio") {
    import graft.parser.MigrationMapping
    val json = MigrationMapping.toJson(samplePkgs, "2026-01-01T00:00:00")
    val root = mapper.readTree(json)
    // reference top-level key parity
    for (k <- Seq("version", "generated_at", "packages", "summary", "spark_plans_created"))
      assert(root.has(k), s"missing key $k")
    val statusOf = (for {
      p <- 0 until root.get("packages").size()
      pkg = root.get("packages").get(p)
      t <- 0 until pkg.get("tasks").size()
      task = pkg.get("tasks").get(t)
    } yield task.get("ssis_task").asText() -> task.get("status").asText()).toMap
    // golden statuses over the reference's own three sample packages
    assert(statusOf === Map(
      "Pre-ETL Validation" -> "converted_to_tests",
      "Load Sales Facts" -> "converted",
      "Update Aggregates" -> "converted",
      "Truncate Staging" -> "converted",
      "Load Customer Data" -> "converted",
      "Merge to Dimension" -> "converted",
      "Get Last Sync Time" -> "converted",
      "Call Inventory API" -> "manual_review",
      "Load Inventory Updates" -> "converted",
      "Update Sync Log" -> "converted",
      "Send Completion Email" -> "skipped"))
    val sum = root.get("summary")
    assert(sum.get("total_ssis_tasks").asInt() === 11)
    assert(sum.get("converted").asInt() === 8)
    assert(sum.get("converted_to_tests").asInt() === 1)
    assert(sum.get("skipped").asInt() === 1)
    assert(sum.get("manual_review").asInt() === 1)
    // (8+1)/11 — same formula as the reference's 63.6% = (6+1)/11; the
    // extra conversions over the reference are the watermark read, the
    // sync-log append, and (since r12) the standalone TRUNCATE — all
    // classes this engine executes rather than skips
    assert(sum.get("conversion_rate").asText() === "81.8%")
    // transform mapping carries real compiled expressions for derived cols
    val lsf = (0 until root.get("packages").size()).map(root.get("packages").get)
      .flatMap(p => (0 until p.get("tasks").size()).map(p.get("tasks").get))
      .find(_.get("ssis_task").asText() === "Load Sales Facts").get
    val tms = (0 until lsf.get("transforms_mapped").size())
      .map(lsf.get("transforms_mapped").get(_))
    assert(tms.nonEmpty)
    assert(tms.exists(_.get("spark_equivalent").asText().contains("join")))
  }

  test("scaffolding report carries the summary table, per-package tables, review list") {
    import graft.parser.MigrationMapping
    val md = MigrationMapping.markdownReport(samplePkgs, "2026-01-01 00:00:00")
    assert(md.contains("# Spark Migration Scaffolding Report"))
    assert(md.contains("| SSIS Packages Processed | 3 |"))
    assert(md.contains("| Total SSIS Tasks | 11 |"))
    assert(md.contains("| Conversion Rate | 81.8% |"))
    assert(md.contains("### SalesFactETL.dtsx"))
    assert(md.contains("**Manual Review Required**"))
    assert(md.contains("## Manual Review Required"))
    assert(md.contains("Call Inventory API"))
  }

  test("stated gate counts in README/COVERAGE/PERF derive from the code") {
    // the r13 verdict's mismatch class: a hand-edited count in one doc
    // drifting from the tree (PERF.md said 415 specs when 417 were
    // green). Single-source every stated number: queries/oracles from
    // SparkEntry, spec totals by instantiating every Suite on the test
    // classpath and summing testNames — the same inventory sbt runs.
    def read(f: String): String = {
      val src = scala.io.Source.fromFile(f, "UTF-8")
      try src.mkString finally src.close()
    }
    val qNames = SparkEntry.queries.keySet
    assert(qNames === SparkEntry.oracleSql.keySet,
      "queries and oracleSql keysets must match")
    val nQ = qNames.size
    def maxIdx(prefix: String): Int = qNames.toSeq
      .filter(_.startsWith(prefix))
      .map(_.drop(1).takeWhile(_.isDigit).toInt).max
    val qRange = f"q01–q${maxIdx("q")}%02d"
    val xRange = f"x01–x${maxIdx("x")}%02d"
    // suite inventory from the compiled test classpath, RECURSIVE —
    // suites live in graft and its subpackages (graft.patterns)
    val suiteRoot = new java.io.File(
      getClass.getProtectionDomain.getCodeSource.getLocation.toURI)
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else Seq(f)
    val suiteNames = walk(suiteRoot)
      .filter(f => f.getName.endsWith("Spec.class") &&
        !f.getName.contains("$"))
      .map(f => suiteRoot.toPath.relativize(f.toPath).toString
        .stripSuffix(".class").replace(java.io.File.separatorChar, '.'))
      .sorted
    val nTests = suiteNames.map { n =>
      Class.forName(n).getDeclaredConstructor().newInstance()
        .asInstanceOf[org.scalatest.Suite].testNames.size
    }.sum
    val nSuites = suiteNames.length
    // README: query count, oracle count, ranges, spec totals
    val readme = read("README.md")
    assert(readme.contains(s"exposes $nQ gated queries"),
      s"README query count != $nQ")
    assert(readme.contains(s"All $nQ have DuckDB oracles"),
      s"README oracle count != $nQ")
    assert(readme.contains(qRange) && readme.contains(xRange),
      s"README must state the ranges $qRange + $xRange")
    assert(readme.contains(s"# $nTests tests, $nSuites suites"),
      s"README spec totals != $nTests tests / $nSuites suites")
    // COVERAGE: the gate header's count and ranges
    val coverage = read("COVERAGE.md")
    assert(coverage.contains(s"$nQ in all"), s"COVERAGE count != $nQ")
    assert(coverage.contains(qRange) && coverage.contains(xRange),
      s"COVERAGE must state the ranges $qRange + $xRange")
    // PERF: the CURRENT round's gate-state line (history rows are
    // frozen records of their own rounds and exempt)
    val perf = read("PERF.md")
    val current = "(?s)<!-- gate-state -->.*?<!-- /gate-state -->".r
      .findFirstIn(perf)
      .getOrElse(fail("PERF.md must carry a <!-- gate-state --> block"))
    assert(current.contains(s"$nQ queries") &&
      current.contains(s"$nTests/$nTests specs") &&
      current.contains(s"$nSuites suites"),
      s"PERF gate-state block disagrees with the tree " +
        s"($nQ queries, $nTests specs, $nSuites suites):\n$current")
  }
}
