package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.lake.{Catalog, TableLog}
import java.nio.file.Files

class CatalogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("catalog rows resolve version/action/columns/rows from manifests; schema pinned") {
    val base = Files.createTempDirectory("graft_cat").toString
    val a = Seq((1L, "x"), (2L, "y")).toDF("id", "name")
    TableLog.commitOverwrite(spark, s"$base/a", a)
    TableLog.commitAppend(spark, s"$base/a", Seq((3L, "z")).toDF("id", "name"))
    TableLog.commitOverwrite(spark, s"$base/b",
      Seq((1L, 2.5, true)).toDF("k", "v", "flag"))
    val got = Catalog.build(spark,
      Map("a" -> s"$base/a", "b" -> s"$base/b", "ghost" -> s"$base/nope"))
    val rows = got.orderBy("table_name").collect()
    // uncommitted paths are skipped, not fabricated
    assert(rows.map(_.getString(0)).toSeq == Seq("a", "b"))
    assert(rows(0).getInt(1) == 2 && rows(0).getString(2) == "append")
    assert(rows(0).getInt(3) == 2 && rows(0).getLong(4) == 3L)
    assert(rows(1).getInt(1) == 1 && rows(1).getString(2) == "overwrite")
    assert(rows(1).getInt(3) == 3 && rows(1).getLong(4) == 1L)
    // schema_json carries the manifest-recorded snapshot schema
    val schemaA = org.apache.spark.sql.types.DataType
      .fromJson(rows(0).getString(5))
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(schemaA.fieldNames.toSeq == Seq("id", "name"))
  }

  test("publish materializes the catalog as a TableLog table; republish overwrites") {
    val base = Files.createTempDirectory("graft_catpub").toString
    TableLog.commitOverwrite(spark, s"$base/t1",
      Seq((1L, "a")).toDF("id", "v"))
    val c1 = Catalog.publish(spark,
      Map("t1" -> s"$base/t1"), s"$base/_catalog")
    assert(c1.version == 1)
    assert(TableLog.read(spark, s"$base/_catalog").count() == 1)
    // second publish sees the new table AND the catalog's own new state
    TableLog.commitOverwrite(spark, s"$base/t2",
      Seq((1L, 2L)).toDF("x", "y"))
    val c2 = Catalog.publish(spark,
      Map("t1" -> s"$base/t1", "t2" -> s"$base/t2"), s"$base/_catalog")
    assert(c2.version == 2)
    val latest = TableLog.read(spark, s"$base/_catalog")
    assert(latest.count() == 2)
    assert(latest.filter(col("table_name") === "t2").count() == 1)
    // prior catalog version remains readable (snapshot semantics)
    assert(TableLog.read(spark, s"$base/_catalog", Some(1)).count() == 1)
  }
}
