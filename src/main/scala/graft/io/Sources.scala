package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Multi-format ingestion with explicit schemas.
  *
  * Mirrors the reference's ingestion surface (reference
  * `local_runner.py:47-53`: suffix-dispatched CSV / JSON-lines load;
  * `terraform/main.tf:33-41`: Glue-catalogued raw tables) re-expressed as
  * schema-explicit `spark.read` calls so Catalyst gets a fixed schema and
  * the vectorized readers do the work. At 100 TB the parquet path is the
  * hot one: column pruning + predicate pushdown happen automatically as
  * long as callers keep projections/filters in the DataFrame plan.
  */
object Sources {

  /** Tables the driver testdata provides (`/root/testdata/sfN/<t>.parquet`). */
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Parquet scan of one testdata table (S3 in SURVEY §2.1).
    *
    * `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects. We read nanos as a raw long
    * (`nanosAsLong` legacy conf) and rebuild the timestamp with integer
    * division — NOT `/ 1000` (double division would lose precision at
    * 1e18-nanosecond epoch magnitudes). */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }

  /** Register every testdata table as a temp view (S4/S9: catalog +
    * view publication — temp views inline into the logical plan, so
    * downstream filters still push to the parquet scan). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    tableNames.foreach { t =>
      table(spark, dir, t).createOrReplaceTempView(t)
    }

  /** Header CSV scan with enforced schema (S1; reference
    * `local_runner.py:52`). `mode=FAILFAST` makes malformed rows loud,
    * matching the reference's fail-on-violation posture. */
  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("mode", "FAILFAST")
      .schema(schema)
      .csv(path)

  /** JSON-lines scan (S2; reference `local_runner.py:49-51`). Line-
    * delimited is Spark's default JSON format, and an explicit schema
    * avoids the extra schema-inference pass over the data. */
  def jsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** ORC scan — the other columnar format large lakehouses ingest
    * alongside parquet (built into Spark; same pushdown/pruning
    * machinery: filters and column selection reach the ORC reader). */
  def orc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** XML scan (built into Spark since 4.0) — `rowTag` names the element
    * that becomes one row; attributes surface as `_attr` columns. Same
    * schema-explicit posture as the other sources: no inference pass. */
  def xml(spark: SparkSession, path: String, rowTag: String,
      schema: StructType): DataFrame =
    spark.read
      .option("rowTag", rowTag)
      .schema(schema)
      .xml(path)

  /** Raw text-corpus scan: one row per line plus the originating file —
    * how an LLM training corpus of loose .txt shards actually enters a
    * pipeline before any schema exists. Partitioned by file/size like
    * any file scan; pair with `pathGlobFilter` to select shards. */
  def textLines(spark: SparkSession, path: String,
      glob: String = "*"): DataFrame =
    spark.read
      .option("pathGlobFilter", glob)
      .text(path)
      .select(
        org.apache.spark.sql.functions.input_file_name().as("src_file"),
        org.apache.spark.sql.functions.col("value").as("line"))
}
