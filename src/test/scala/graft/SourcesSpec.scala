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
}
