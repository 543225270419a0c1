package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Format-contract round-trips: write a driver table through the
  * engine's CSV / JSON-lines sinks, read it back through the
  * schema-explicit [[Sources.csv]] / [[Sources.jsonLines]] scans, and
  * aggregate — while the DuckDB oracle runs the IDENTICAL aggregate on
  * the parquet source. Any drift in header handling, quoting/escaping
  * (`props` is a JSON string full of `"` characters), timestamp
  * formatting (every `events.ts` carries non-zero microseconds), or
  * double formatting breaks the hash, which makes the file-format
  * paths S1/S2/S5 (reference `local_runner.py:47-53` suffix-dispatched
  * loads, `write_outputs` CSV sink) visible to the driver-level
  * correctness gate instead of only to the LakehouseSpec golden.
  *
  * Scale shape: the sink under test is the reference-shaped
  * single-file CSV writer (S5's coalesce(1) contract); the round-trip
  * is a format AUDIT run at bench scale, not a data-movement path —
  * the 100 TB ingest/egress story stays on parquet (S3/S6). The
  * aggregate itself is one grouped reduction per side.
  */
object RoundTrip {

  /** Lossless timestamp round-trip format: micros + explicit offset
    * (the session is pinned UTC). Spark's DEFAULT CSV/JSON timestamp
    * write format carries milliseconds only, which would silently
    * truncate the driver's microsecond-resolution event times — this
    * is exactly the kind of drift the oracle comparison pins. */
  val TsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
  private val tsOpts = Map("timestampFormat" -> TsFmt)

  /** Read-back schema for the events round-trip files. */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private def outDir(dir: String, leaf: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_roundtrip_" +
      s"${java.lang.Integer.toHexString(dir.hashCode)}/$leaf"

  /** The shared per-type summary both the engine (over the
    * round-tripped file) and the oracle (over parquet) compute:
    * exact counts, exact distinct users, exact total `props` length
    * (quote/escape drift detector), micros-exact min/max timestamps,
    * and the rounded value mean. */
  private def summarize(df: DataFrame): DataFrame =
    df.groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("users"),
        round(avg(col("value")), 6).as("avg_value"),
        sum(length(col("props"))).as("props_chars"),
        unix_micros(min(col("ts"))).as("ts_min_us"),
        unix_micros(max(col("ts"))).as("ts_max_us"))
      .orderBy("event_type")

  /** q429: events → [[graft.pipeline.Lakehouse.writeCsv]] (S5, the
    * reference-shaped header CSV sink) → [[Sources.csv]] (S1,
    * FAILFAST + explicit schema) → summary. */
  def csvEvents(spark: SparkSession, dir: String): DataFrame = {
    val out = outDir(dir, "csv_events")
    graft.pipeline.Lakehouse.writeCsv(
      Sources.table(spark, dir, "events"), out, tsOpts)
    summarize(Sources.csv(spark, out, eventsSchema, tsOpts))
  }

  /** q430: events → JSON-lines sink → [[Sources.jsonLines]] (S2,
    * explicit schema) → summary. The `props` JSON string nested
    * INSIDE the JSON document exercises the escaper both ways. */
  def jsonlEvents(spark: SparkSession, dir: String): DataFrame = {
    val out = outDir(dir, "jsonl_events")
    Sources.table(spark, dir, "events")
      .write.mode("overwrite").options(tsOpts).json(out)
    summarize(Sources.jsonLines(spark, out, eventsSchema, tsOpts))
  }

  /** DuckDB oracle for BOTH round-trips: the identical summary over
    * the parquet source — equality means the file format carried
    * every value losslessly. */
  val eventsSummaryOracleSql: String =
    """SELECT event_type,
      |  COUNT(*) AS n,
      |  COUNT(DISTINCT user_id) AS users,
      |  ROUND(AVG(value), 6) AS avg_value,
      |  SUM(LENGTH(props)) AS props_chars,
      |  epoch_us(MIN(ts)) AS ts_min_us,
      |  epoch_us(MAX(ts)) AS ts_max_us
      |FROM events
      |GROUP BY 1 ORDER BY 1""".stripMargin
}
