package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog/docs publication: a table-of-tables materialized from
  * TableLog manifests — the dbt-docs analog of the reference's publish
  * stage (reference `airflow/dags/lakehouse_pipelines.py:93-95` runs
  * `dbt docs generate` after the build; the artifact users browse is
  * exactly name/schema/freshness/row-count per model).
  *
  * One row per table: name, current version, last action, column
  * count, row count, schema JSON. Everything resolves from MANIFESTS —
  * `countRows` answers from file stats without opening a data file
  * (falling back to a scan only for pre-stats snapshots), and the
  * schema is the manifest-recorded one. The loop is driver-side by
  * design: a catalog is metadata-scale (one row per TABLE, not per
  * data row), so even a 10k-table lake is a trivial local build.
  */
object Catalog {

  /** Build the catalog frame for `tables` (name → TableLog path).
    * Tables whose path has no committed history are skipped — they
    * don't exist yet from a reader's point of view. */
  def build(spark: SparkSession, tables: Map[String, String]): DataFrame = {
    import spark.implicits._
    val rows = tables.toSeq.sortBy(_._1).flatMap { case (name, path) =>
      TableLog.history(spark, path).lastOption.map { c =>
        val schema = c.schema
        val nColumns = schema.map(_.fields.length)
          .getOrElse(TableLog.read(spark, path).schema.fields.length)
        val rowCount = TableLog.countRows(spark, path)
          .getOrElse(TableLog.read(spark, path).count())
        (name, c.version, c.action, nColumns, rowCount,
          schema.map(_.json).orElse(c.schemaJson).getOrElse(""))
      }
    }
    rows.toDF("table_name", "version", "last_action",
      "n_columns", "row_count", "schema_json")
  }

  /** Materialize the catalog AS a TableLog table at `path` (overwrite
    * commit — the publish stage republishes the whole catalog each
    * run, like dbt docs). Returns the committed version. */
  def publish(spark: SparkSession, tables: Map[String, String],
      path: String): TableLog.Commit =
    TableLog.commitOverwrite(spark, path, build(spark, tables))
}
