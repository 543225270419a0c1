package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.quality.{Expectations, SuiteLoader}
import graft.quality.Expectations._

class SuiteLoaderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val suiteJson =
    """{
      |  "expectation_suite_name": "erp_orders",
      |  "expectations": [
      |    {"expectation_type": "expect_table_columns_to_match_ordered_list",
      |     "kwargs": {"column_list": ["order_id", "order_value", "email"]}},
      |    {"expectation_type": "expect_column_values_to_not_be_null",
      |     "kwargs": {"column": "order_id"}},
      |    {"expectation_type": "expect_column_values_to_be_between",
      |     "kwargs": {"column": "order_value", "min_value": 0, "max_value": 100000}},
      |    {"expectation_type": "expect_column_values_to_match_regex",
      |     "kwargs": {"column": "email", "regex": ".+@.+\\..+"}}
      |  ]
      |}""".stripMargin

  test("parses the GE suite format into typed expectations") {
    val suite = SuiteLoader.fromJsonString("erp_orders", suiteJson)
    assert(suite.columnsOrdered ==
      Some(ColumnsOrdered(Seq("order_id", "order_value", "email"))))
    assert(suite.checks == Seq(
      NotNull("order_id"),
      MinBound("order_value", 0.0),
      RegexMatch("email", ".+@.+\\..+")))
  }

  test("parsed suite evaluates like a hand-built one (max bound ignored)") {
    val suite = SuiteLoader.fromJsonString("erp_orders", suiteJson)
    // 999999 exceeds max_value but the reference never enforces max
    val df = Seq((1L, 999999.0, "a@x.com"), (2L, -1.0, "bad"))
      .toDF("order_id", "order_value", "email")
    val got = Expectations.evaluate(df, suite).as[(String, Long)].collect().toMap
    assert(got == Map(
      "columns_ordered" -> 0L,
      "order_id_not_null" -> 0L,
      "order_value_min" -> 1L,
      "email_regex" -> 1L))
  }

  test("unknown expectation types raise, matching the reference") {
    val bad = """{"expectations":[{"expectation_type":"expect_magic","kwargs":{}}]}"""
    intercept[IllegalArgumentException] {
      SuiteLoader.fromJsonString("x", bad)
    }
  }

  test("parses a dbt-style freshness block, normalizing periods to hours") {
    val json =
      """{"expectations": [],
        | "freshness": {"loaded_at_field": "dt",
        |   "warn_after": {"count": 720, "period": "minute"},
        |   "error_after": {"count": 1, "period": "day"}}}""".stripMargin
    val suite = SuiteLoader.fromJsonString("s", json)
    assert(suite.freshness ==
      Some(FreshnessPolicy("dt", Some(12.0), Some(24.0))))
    // bounds are optional, like dbt
    val warnOnly = SuiteLoader.fromJsonString("s",
      """{"expectations": [],
        | "freshness": {"loaded_at_field": "dt",
        |   "warn_after": {"count": 12, "period": "hour"}}}""".stripMargin)
    assert(warnOnly.freshness == Some(FreshnessPolicy("dt", Some(12.0), None)))
    assert(SuiteLoader.fromJsonString("s", """{"expectations": []}""").freshness.isEmpty)
  }

  test("parses unique and in-set expectations (dbt generic-test quartet)") {
    val suite = SuiteLoader.fromJsonString("s",
      """{"expectations": [
        |  {"expectation_type": "expect_column_values_to_be_unique",
        |   "kwargs": {"column": "id"}},
        |  {"expectation_type": "expect_column_values_to_be_in_set",
        |   "kwargs": {"column": "status", "value_set": ["new", "done"]}}
        |]}""".stripMargin)
    assert(suite.checks == Seq(
      Unique("id"), AcceptedValues("status", Seq("new", "done"))))
  }
}
