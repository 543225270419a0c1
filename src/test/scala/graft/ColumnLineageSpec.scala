package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.plans.ColumnLineage

/** Column-lineage extraction semantics over the analyzed plan:
  * aliasing, aggregation, joins, literals, unions, explode, rollup. */
class ColumnLineageSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("graft_lineage").toString
    Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "name", "amount")
      .write.mode("overwrite").parquet(s"$d/t1.parquet")
    Seq((1L, "x"), (3L, "y")).toDF("k", "tag")
      .write.mode("overwrite").parquet(s"$d/t2.parquet")
    d
  }
  private def t1 = spark.read.parquet(s"$dir/t1.parquet")
  private def t2 = spark.read.parquet(s"$dir/t2.parquet")

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    ColumnLineage.of(spark, df)
      .as[(String, String, String)].collect().toSet

  test("alias and expression nesting resolve to the physical column") {
    val got = rowsOf(t1.select(
      col("k").as("id"), (col("amount") * 2).as("double_amount")))
    assert(got == Set(
      ("id", "t1", "k"),
      ("double_amount", "t1", "amount")))
  }

  test("aggregates point at their input columns, keys at keys") {
    val got = rowsOf(
      t1.groupBy("name").agg(sum("amount").as("total"),
        count(lit(1)).as("n")))
    assert(got == Set(
      ("name", "t1", "name"),
      ("total", "t1", "amount"),
      ("n", "<constant>", "<none>")))
  }

  test("a joined+coalesced column carries BOTH physical sources") {
    val j = t1.join(t2, Seq("k"), "full_outer")
      .select(coalesce(col("name"), col("tag")).as("label"),
        col("k"))
    val got = rowsOf(j)
    assert(got.contains(("label", "t1", "name")))
    assert(got.contains(("label", "t2", "tag")))
    // USING-join output key coalesces both sides' k
    assert(got.contains(("k", "t1", "k")) && got.contains(("k", "t2", "k")))
  }

  test("literal-only outputs surface as <constant>, not silently") {
    val got = rowsOf(t1.select(lit(42).as("answer"), col("k")))
    assert(got == Set(
      ("answer", "<constant>", "<none>"),
      ("k", "t1", "k")))
  }

  test("union branches merge positionally") {
    val u = t1.select(col("k"), col("name").as("v"))
      .unionByName(t2.select(col("k"), col("tag").as("v")))
    val got = rowsOf(u)
    assert(got == Set(
      ("k", "t1", "k"), ("k", "t2", "k"),
      ("v", "t1", "name"), ("v", "t2", "tag")))
  }

  test("explode output tracks the generator's input column") {
    val got = rowsOf(
      t1.select(col("k"), explode(split(col("name"), ",")).as("part")))
    assert(got.contains(("part", "t1", "name")))
  }

  test("rollup (Expand) keeps grouping-column provenance") {
    val got = rowsOf(
      t1.rollup("name").agg(sum("amount").as("total")))
    assert(got.contains(("name", "t1", "name")))
    assert(got.contains(("total", "t1", "amount")))
  }

  test("temp views resolve THROUGH to physical leaves, never the alias") {
    t1.createOrReplaceTempView("published_t1")
    val got = rowsOf(spark.table("published_t1").select(col("k").as("id")))
    assert(got == Set(("id", "t1", "k")))
    t1.select((col("amount") + 1).as("a2"))
      .createOrReplaceTempView("derived_t1")
    val got2 = rowsOf(spark.table("derived_t1"))
    assert(got2 == Set(("a2", "t1", "amount")))
  }

  test("metadata only: lineage never triggers a Spark job") {
    val df = t1.join(t2, "k") // analysis (footer reads) outside the window
    df.queryExecution.analyzed
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    ColumnLineage.of(spark, df).queryExecution.analyzed
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(before == after)
  }
}
