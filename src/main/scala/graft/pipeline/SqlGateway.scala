package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.io.Sources

/** SQL-text entry point: register the lake's tables as views and run
  * raw SQL through Catalyst — the surface the reference's users
  * actually write (dbt models and Athena queries are SQL text, e.g.
  * `dbt/models/marts/fct_daily_store_metrics.sql`). Everything else
  * in this engine is the DataFrame API; this gateway closes the
  * dialect gap so a reference user can paste their query.
  *
  * No custom parsing, no interposition: `spark.sql` IS the engine —
  * the registered views resolve through the session catalog, and
  * the text gets the same Catalyst optimization (pushdown, pruning,
  * join selection, AQE) as the typed API. The gateway's only job is
  * view registration through [[Sources.table]], so SQL users inherit
  * the events-ts repair and schema discipline for free. */
object SqlGateway {

  /** Register every driver table as a temp view named like the
    * table (idempotent). */
  def registerTables(spark: SparkSession, dir: String): Unit =
    Sources.tableNames.foreach { n =>
      Sources.table(spark, dir, n).createOrReplaceTempView(n)
    }

  /** Run SQL text against the registered lake views. */
  def run(spark: SparkSession, dir: String, sqlText: String): DataFrame = {
    registerTables(spark, dir)
    spark.sql(sqlText)
  }

  /** Demo mart in PURE SQL text — monthly revenue by customer
    * segment. Written in the dialect intersection both engines parse,
    * so the exact same text is the DuckDB oracle. */
  val segmentRevenueSql: String =
    """SELECT c.c_mktsegment AS segment,
      |  (year(o.o_orderdate) * 100 + month(o.o_orderdate)) AS ym,
      |  CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  ROUND(SUM(o.o_totalprice), 2) AS revenue
      |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin
}
