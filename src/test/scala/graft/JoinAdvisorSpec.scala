package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.JoinAdvisor
import graft.quality.SuggestExpectations

/** Advisor correctness: the predicted equi-join size equals the
  * actual join's row count (it is the exact frequency dot product),
  * fan-out and hot-key numbers match hand-computed cases, and the
  * expectation profiler emits the right rule per column shape. */
class JoinAdvisorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("predicted join rows equals the actual join count (with skew + misses)") {
    val left = Seq(1, 1, 1, 2, 3, 7).map(k => (k, "l")).toDF("k", "s")
    val right = Seq(1, 1, 2, 2, 2, 9).map(k => (k, "r")).toDF("k", "s")
    val r = JoinAdvisor.joinCardinality(left, right, "k", "k").collect()(0)
    val actual = left.join(right.withColumnRenamed("s", "s2"), "k").count()
    assert(r.getAs[Long]("est_join_rows") == actual)
    assert(actual == 3L * 2 + 1L * 3) // k=1: 3x2, k=2: 1x3
    assert(r.getAs[Long]("ndv_left") == 4 && r.getAs[Long]("ndv_right") == 3)
    assert(r.getAs[Long]("ndv_shared") == 2)
    assert(r.getAs[Long]("max_key_rows") == 6L) // k=1 dominates
    assert(math.abs(r.getAs[Double]("fanout") - 9.0 / 6) < 1e-9)
  }

  test("disjoint keys predict an empty join") {
    val left = Seq(1, 2).map(k => (k, "l")).toDF("k", "s")
    val right = Seq(8, 9).map(k => (k, "r")).toDF("k", "s")
    val r = JoinAdvisor.joinCardinality(left, right, "k", "k").collect()(0)
    assert(r.getAs[Long]("est_join_rows") == 0L)
    assert(r.getAs[Long]("ndv_shared") == 0L)
    assert(r.getAs[Double]("fanout") == 0.0)
  }

  test("expectation suggestion: rule priority per column shape") {
    val df = Seq(
      (1L, "A", 10.5, Option("x")),
      (2L, "B", 20.5, None),
      (3L, "A", 30.5, Option("y")),
      (4L, "C", 40.5, Option("z")))
      .toDF("id", "status", "amount", "note")
    val rows = SuggestExpectations.suggest(df,
      Seq(("id", true), ("status", false), ("amount", true),
        ("note", false)), domainMax = 3L)
      .collect().map(r => r.getString(0) -> r).toMap

    // small domain wins even for numeric-able shapes
    assert(rows("status").getAs[String]("suggested_rule") == "in_set")
    assert(rows("status").getAs[Long]("n_distinct") == 3L)
    // id: 4 distinct > 3, numeric -> between, with min/max
    assert(rows("id").getAs[String]("suggested_rule") == "between")
    assert(rows("id").getAs[Double]("min_value") == 1.0)
    assert(rows("id").getAs[Double]("max_value") == 4.0)
    // note: 3 distinct <= 3 -> in_set despite the null
    assert(rows("note").getAs[String]("suggested_rule") == "in_set")
    assert(rows("note").getAs[Long]("n_nulls") == 1L)
    assert(rows("note").getAs[Double]("null_frac") == 0.25)
    // amount: numeric, 4 distinct -> between
    assert(rows("amount").getAs[String]("suggested_rule") == "between")
  }

  test("expectation suggestion: a clean high-cardinality string column suggests not_null") {
    val df = (1 to 20).map(i => (i.toLong, s"name_$i"))
      .toDF("id", "name")
    val rows = SuggestExpectations.suggest(df,
      Seq(("name", false)), domainMax = 5L).collect()
    assert(rows(0).getAs[String]("suggested_rule") == "not_null")
  }
}
