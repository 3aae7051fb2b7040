package graft.patterns

import graft.ir.Ir.ExecuteSqlTask
import graft.pipeline.PackageRunner.SqlOutcome
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Execute-SQL → Spark rewrite (SURVEY.md §4's "side-effecting SQL → pure
  * select + write mode" compile-time rewrite, mirroring the reference's
  * `_clean_sql_for_dbt` at builder.py:348-368):
  *
  *  - `DELETE FROM t WHERE …; INSERT INTO t (…) SELECT …` (aggregate
  *    refresh, SalesFactETL.dtsx:293-306) → run the SELECT, overwrite `t`
  *  - `TRUNCATE TABLE t; INSERT INTO t SELECT …` (full reload) → same
  *  - `INSERT INTO t SELECT …` → run the SELECT, append to `t`
  *  - `SELECT …` (read-only, e.g. watermark fetch) → run, no write
  *  - guard blocks / MERGE / UPDATE → not rewritten here (None): MERGE
  *    compiles through [[ScdType2]], guards through the validation suite
  *
  * T-SQL → Spark SQL surface translation is intentionally minimal
  * (`@var` parameters must be bound by the caller via `params`); the
  * SELECT itself runs through `spark.sql` against registered views.
  */
object SqlPatternRewriter {

  private val insertSelectRe =
    "(?is)insert\\s+into\\s+(\\S+)\\s*(?:\\([^)]*\\))?\\s*(select\\b.*?)(?:;|$)".r

  private val bareSelectRe = "(?is)^\\s*(select\\b.*?)(?:;|\\s*$)".r

  /** Strip `-- comments`, surviving XML attribute normalization (a
    * dtsx-sourced statement arrives newline-free — see [[SqlText]]). */
  private def stripComments(sql: String): String = SqlText.stripComments(sql)

  def rewrite(spark: SparkSession, task: ExecuteSqlTask,
      params: Map[String, String] = Map.empty): Option[SqlOutcome] = {
    var sql = stripComments(task.sqlStatement)
    params.foreach { case (k, v) => sql = sql.replace(s"@$k", v) }
    if (sql.isEmpty) return None
    val upper = sql.toUpperCase
    if (upper.contains("MERGE ") || upper.contains("RAISERROR") ||
      upper.startsWith("UPDATE")) return None

    insertSelectRe.findFirstMatchIn(sql) match {
      case Some(m) =>
        val target = m.group(1)
        val select = m.group(2).trim
        val mode =
          if (upper.contains("DELETE FROM") || upper.contains("TRUNCATE TABLE"))
            SaveMode.Overwrite
          else SaveMode.Append
        Some(SqlOutcome(Some(spark.sql(select)), Some(target), mode))
      case None =>
        bareSelectRe.findFirstMatchIn(sql).map { m =>
          SqlOutcome(Some(spark.sql(m.group(1))), None)
        }
    }
  }
}
