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

  /** Permissive CSV scan with a dead-letter column: rows that fail the
    * schema land in `_corrupt_record` (raw line preserved) instead of
    * failing the job — the DLQ ingestion pattern for feeds where one
    * malformed row must not block the batch. Callers split on
    * `_corrupt_record IS NULL`: clean rows proceed, corrupt raw lines
    * are quarantined for replay. ([[csv]] stays FAILFAST — the
    * validate-gate default; this is the explicit opt-in.)
    *
    * Caveat from Spark's CSV parser: only REFERENCED columns are
    * parsed, so a plan that filters on `_corrupt_record` while
    * projecting other columns may never parse the failing field and
    * misclassify the row. Persist (or write out) the frame before
    * splitting clean/DLQ — the pattern Spark's own docs prescribe. */
  def csvPermissive(spark: SparkSession, path: String,
      schema: StructType): DataFrame = {
    val withDlq = org.apache.spark.sql.types.StructType(
      schema.fields :+ org.apache.spark.sql.types.StructField(
        "_corrupt_record", org.apache.spark.sql.types.StringType))
    spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(withDlq)
      .csv(path)
  }

  /** First-contact CSV ingest: ONE schema-inference pass over the data,
    * then the frame is re-read under the now-PINNED StructType — the
    * Glue-crawler / pandas entry path of the reference
    * (`terraform/main.tf:33-41` crawls raw buckets to infer table
    * schemas; `local_runner.py:49-52` lets pandas infer CSV types).
    * Returns the pinned schema alongside the frame so the caller can
    * persist it and ingest every subsequent batch schema-explicit
    * (via [[csv]]) with [[schemaDrift]] as the evolution tripwire —
    * inference runs once at first contact, never per batch. */
  def inferCsv(spark: SparkSession, path: String): (StructType, DataFrame) = {
    val pinned = spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .csv(path)
      .schema
    (pinned, csv(spark, path, pinned))
  }

  /** First-contact JSON-lines ingest; same one-pass-then-pin contract
    * as [[inferCsv]]. Spark's JSON inference maps heterogeneous nested
    * objects to a sparse struct; callers wanting the map form (the
    * web_events `metadata` shape) declare it explicitly afterwards. */
  def inferJson(spark: SparkSession, path: String): (StructType, DataFrame) = {
    val pinned = spark.read.json(path).schema
    (pinned, jsonLines(spark, path, pinned))
  }

  /** Drift report of an observed schema against the pinned one: columns
    * the new batch dropped, added, or retyped. Empty = no drift. The
    * first-contact crawler pins; every later batch is checked — the
    * lakehouse answer to silent upstream schema changes. */
  def schemaDrift(pinned: StructType, observed: StructType): Seq[String] = {
    val p = pinned.fields.map(f => f.name -> f.dataType).toMap
    val o = observed.fields.map(f => f.name -> f.dataType).toMap
    val missing = pinned.fields.collect {
      case f if !o.contains(f.name) => s"missing: ${f.name}" }
    val added = observed.fields.collect {
      case f if !p.contains(f.name) => s"added: ${f.name}" }
    val retyped = pinned.fields.collect {
      case f if o.get(f.name).exists(_ != f.dataType) =>
        s"retyped: ${f.name} ${f.dataType.simpleString} -> ${o(f.name).simpleString}" }
    (missing ++ added ++ retyped).toSeq
  }

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
