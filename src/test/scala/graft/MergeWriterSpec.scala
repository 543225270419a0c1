package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.lake.MergeWriter
import java.nio.file.Files

class MergeWriterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fact(rows: (Long, String, Double)*) =
    rows.toDF("store_id", "dt", "revenue")

  test("upsert: updates win on key collision, new keys appended") {
    val target = fact((1L, "d1", 10.0), (2L, "d1", 20.0))
    val updates = fact((2L, "d1", 99.0), (3L, "d2", 30.0))
    val got = MergeWriter.upsert(target, updates, Seq("store_id", "dt"))
      .orderBy("store_id").as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((1L, "d1", 10.0), (2L, "d1", 99.0), (3L, "d2", 30.0)))
  }

  test("upsert is idempotent") {
    val target = fact((1L, "d1", 10.0), (2L, "d1", 20.0))
    val updates = fact((2L, "d1", 99.0), (3L, "d2", 30.0))
    val once = MergeWriter.upsert(target, updates, Seq("store_id", "dt"))
    val twice = MergeWriter.upsert(once, updates, Seq("store_id", "dt"))
    assert(twice.except(once).isEmpty && once.except(twice).isEmpty)
  }

  test("mergeWrite: dynamic partition overwrite touches only updated partitions") {
    val dir = Files.createTempDirectory("graft_merge").toString + "/fact"
    MergeWriter.mergeWrite(spark, dir,
      fact((1L, "d1", 10.0), (2L, "d2", 20.0)),
      keys = Seq("store_id", "dt"), partitionCols = Seq("dt"))
    MergeWriter.mergeWrite(spark, dir,
      fact((2L, "d2", 99.0), (3L, "d3", 30.0)),
      keys = Seq("store_id", "dt"), partitionCols = Seq("dt"))
    val got = spark.read.parquet(dir)
      .select("store_id", "dt", "revenue")
      .orderBy("store_id").as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((1L, "d1", 10.0), (2L, "d2", 99.0), (3L, "d3", 30.0)))
  }
}
