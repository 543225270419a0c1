package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.plans.LayoutAdvisor

/** Layout-advisor contract on constructed workloads over REAL parquet
  * scans (only physical tables advise layout): filter and join
  * columns are counted per table, derived predicates credit their
  * base columns, and the rank weights filters over joins. */
class LayoutAdvisorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"
  private def tbl(n: String) = graft.io.Sources.table(spark, dir, n)

  test("filter and join columns are counted and ranked per table") {
    val orders = tbl("orders")
    val customer = tbl("customer")
    val workload = Seq(
      orders.where(col("o_orderstatus") === "F"),
      orders.where(col("o_orderstatus") === "O"),
      orders.join(customer, orders("o_custkey") === customer("c_custkey")))
    val rows = LayoutAdvisor.predicateProfile(spark, workload)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows(("orders", "o_orderstatus")) == (2L, 0L, 1L), s"got $rows")
    assert(rows(("orders", "o_custkey")) == (0L, 1L, 2L), s"got $rows")
    assert(rows(("customer", "c_custkey")) == (0L, 1L, 1L), s"got $rows")
  }

  test("a predicate on a DERIVED column credits its base column") {
    val ev = tbl("events")
    val workload = Seq(
      ev.withColumn("d", dayofmonth(col("ts"))).where(col("d") <= 10))
    val rows = LayoutAdvisor.predicateProfile(spark, workload)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows.contains(("events", "ts")), s"got $rows")
  }

  test("recommend keeps only the top-k per table") {
    val li = tbl("lineitem")
    val workload = Seq(
      li.where(col("l_shipdate") < "1995-01-01"),
      li.where(col("l_shipdate") < "1996-01-01"),
      li.where(col("l_quantity") > 10),
      li.where(col("l_discount") > 0.01))
    val rec = LayoutAdvisor.recommend(spark, workload, k = 2)
      .collect().map(r => r.getString(1)).toSeq
    assert(rec.length == 2)
    assert(rec.head == "l_shipdate", s"2-filter column must rank first: $rec")
  }

  test("local relations (literal frames) never advise layout") {
    import spark.implicits._
    val local = Seq((1, "a")).toDF("k", "v").where(col("k") === 1)
    val rows = LayoutAdvisor.predicateProfile(spark, Seq(local)).collect()
    assert(rows.isEmpty, s"got ${rows.mkString(",")}")
  }
}
