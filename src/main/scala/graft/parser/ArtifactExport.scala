package graft.parser

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.ir.Ir.SsisPackage

/** One-call export of the reference's `output/` artifact set
  * (ssis-to-dbt writes `parsed_packages.json`, `schema_metadata.json`,
  * `parsing_report.md`, `migration_mapping.json`, `scaffolding_report.md`
  * side by side — a consumer reads the mapping first, then drills into
  * the rest). The validation pair (`validation_log.json` /
  * `validation_report.md`) is runtime output and exports from
  * [[graft.validate.ValidationJson]] after a run, not here.
  *
  * Also runnable as a main: `ArtifactExport <outDir> <pkg.dtsx ...>`.
  */
object ArtifactExport {

  def exportAll(pkgs: Seq[SsisPackage], outDir: String,
      generatedAt: String): Seq[String] = {
    val dir = Paths.get(outDir)
    Files.createDirectories(dir)
    val files = Seq(
      "parsed_packages.json" -> PackageJson.toJson(pkgs),
      "schema_metadata.json" -> PackageJson.schemaMetadataJson(pkgs),
      "parsing_report.md" -> PackageJson.markdownReport(pkgs),
      "migration_mapping.json" -> MigrationMapping.toJson(pkgs, generatedAt),
      "scaffolding_report.md" -> MigrationMapping.markdownReport(pkgs, generatedAt))
    files.map { case (name, content) =>
      Files.write(dir.resolve(name), content.getBytes(StandardCharsets.UTF_8))
      dir.resolve(name).toString
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ArtifactExport <outDir> <package.dtsx ...>")
    val pkgs = args.drop(1).toSeq.map(DtsxParser.parseFile)
    val stamp = java.time.LocalDateTime.now()
      .format(java.time.format.DateTimeFormatter.ISO_LOCAL_DATE_TIME)
    val written = exportAll(pkgs, args(0), stamp)
    written.foreach(p => println(s"wrote $p"))
  }
}
