package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.io.Sources
import java.nio.file.Files

class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("orc round-trip preserves schema and values, with pushdown intact") {
    val dir = Files.createTempDirectory("graft_orc").toString + "/t"
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5))
      .toDF("id", "name", "score")
    df.write.orc(dir)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType)))
    val back = Sources.orc(spark, dir, schema)
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
    // filters reach the ORC scan (same pushdown machinery as parquet)
    val plan = back.filter(col("id") > 1L).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(id,1)"),
      s"no pushdown in:\n$plan")
  }

  test("xml round-trip preserves schema and values via rowTag records") {
    val dir = Files.createTempDirectory("graft_xml").toString + "/t"
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "<esc&aped>", 3.5))
      .toDF("id", "name", "score")
    df.write.option("rowTag", "rec").xml(dir)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType)))
    val back = Sources.xml(spark, dir, rowTag = "rec", schema)
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
  }

  test("textLines reads loose corpus shards with file attribution and glob") {
    val dir = Files.createTempDirectory("graft_txt")
    Files.writeString(dir.resolve("shard1.txt"), "hello world\nsecond line\n")
    Files.writeString(dir.resolve("shard2.txt"), "third line\n")
    Files.writeString(dir.resolve("skip.json"), "{}\n")
    val got = Sources.textLines(spark, dir.toString, glob = "*.txt")
      .select(regexp_extract(col("src_file"), "([^/]+)$", 1).as("f"), col("line"))
      .as[(String, String)].collect().toSet
    assert(got == Set(
      ("shard1.txt", "hello world"),
      ("shard1.txt", "second line"),
      ("shard2.txt", "third line")))
  }

  test("schema inference: first-contact CSV/JSON round-trip without a declared schema") {
    val rawDir = graft.pipeline.SampleData.writeTo(
      Files.createTempDirectory("graft_infer").toString)
    // CSV: inference pins the crawler-style schema; the pinned re-read
    // carries typed columns (order_id numeric, not string)
    val (csvSchema, csvDf) = Sources.inferCsv(spark, s"$rawDir/erp_orders.csv")
    assert(csvSchema.fieldNames.toSeq ==
      Seq("order_id", "customer_id", "store_id", "dt", "order_value", "status"))
    assert(csvSchema("order_id").dataType.isInstanceOf[NumericType])
    assert(csvSchema("order_value").dataType.isInstanceOf[NumericType])
    assert(csvDf.count() == 5)
    assert(csvDf.agg(sum("order_value")).collect()(0).getDouble(0) > 0)
    // the pinned schema re-ingests the same file schema-explicit
    assert(Sources.csv(spark, s"$rawDir/erp_orders.csv", csvSchema).count() == 5)
    // JSON-lines: nested metadata infers as a (sparse) struct
    val (jsonSchema, jsonDf) = Sources.inferJson(spark, s"$rawDir/web_events.json")
    assert(jsonSchema.fieldNames.contains("event_id") &&
      jsonSchema.fieldNames.contains("metadata"))
    assert(jsonDf.count() == 4)
  }

  test("permissive CSV quarantines malformed rows in _corrupt_record") {
    val dir = Files.createTempDirectory("graft_dlq")
    Files.writeString(dir.resolve("feed.csv"),
      """id,amount,name
        |1,10.5,ok
        |2,not-a-number,bad
        |3,7.25,fine
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("amount", DoubleType),
      StructField("name", StringType)))
    // persist before splitting: Spark's CSV parser only parses
    // REFERENCED columns, so an unpersisted filter-on-corrupt +
    // project-other-columns plan would skip parsing `amount` entirely
    // and misclassify row 2 (the documented corrupt-column caveat)
    val got = Sources.csvPermissive(spark, dir.resolve("feed.csv").toString, schema)
      .persist()
    got.count()
    val clean = got.filter(col("_corrupt_record").isNull)
    val dlq = got.filter(col("_corrupt_record").isNotNull)
    assert(clean.select("id").as[Long].collect().toSet == Set(1L, 3L))
    // the corrupt raw line survives verbatim for replay
    assert(dlq.select("_corrupt_record").as[String].collect().toSeq ==
      Seq("2,not-a-number,bad"))
    // FAILFAST on the same feed aborts — the gate default is loud
    intercept[org.apache.spark.SparkException] {
      Sources.csv(spark, dir.resolve("feed.csv").toString, schema).collect()
    }
  }

  test("driverSchemaCheck: clean on the real testdata; names drift, retypes, and unreadable tables") {
    val sf = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$sf/events.parquet").exists())
    // current driver data must be drift-free (ts encodings normalize
    // through the repair; LTZ/NTZ count as the same logical timestamp)
    assert(Sources.driverSchemaCheck(spark, sf).isEmpty)
    // regenerated data with a retyped/renamed table must come back as
    // NAMED drift lines — the one-line diagnosis round 8 lacked
    val dir = Files.createTempDirectory("graft_drift")
    Sources.tableNames.foreach { t =>
      Files.copy(java.nio.file.Paths.get(s"$sf/$t.parquet"),
        dir.resolve(s"$t.parquet"))
    }
    // retype events.value to string, drop props, add a column
    spark.read.parquet(s"$sf/events.parquet")
      .withColumn("value", col("value").cast("string"))
      .drop("props").withColumn("noise", lit(1))
      .write.mode("overwrite").parquet(dir.resolve("events.parquet").toString)
    val drift = Sources.driverSchemaCheck(spark, dir.toString)
    assert(drift.exists(_.startsWith("events: retyped: value double -> string")), drift.mkString("; "))
    assert(drift.contains("events: missing: props") && drift.contains("events: added: noise"))
    assert(!drift.exists(_.startsWith("orders:")), "untouched tables stay clean")
    // an unreadable table reports as drift, never throws
    Files.delete(dir.resolve("region.parquet"))
    val gone = Sources.driverSchemaCheck(spark, dir.toString)
    assert(gone.exists(_.startsWith("region: unreadable")), gone.mkString("; "))
  }

  test("schema drift: added/missing/retyped columns vs the pinned schema") {
    val pinned = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType)))
    assert(Sources.schemaDrift(pinned, pinned).isEmpty)
    val drifted = StructType(Seq(
      StructField("id", IntegerType),          // retyped
      StructField("name", StringType),
      StructField("extra", StringType)))       // added; score missing
    assert(Sources.schemaDrift(pinned, drifted).toSet == Set(
      "missing: score",
      "added: extra",
      "retyped: id bigint -> int"))
  }
}
