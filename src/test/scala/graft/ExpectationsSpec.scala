package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.quality.Expectations
import graft.quality.Expectations._

class ExpectationsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val df = Seq(
    (Some(1L), "a@x.com", 5.0),
    (None, "b@y.org", -2.0),
    (Some(3L), "not-an-email", 7.0))
    .toDF("id", "email", "amount")

  test("single-pass evaluation counts violations per check") {
    val suite = Suite("t",
      Some(ColumnsOrdered(Seq("id", "email", "amount"))),
      Seq(NotNull("id"), MinBound("amount", 0.0),
        RegexMatch("email", ".+@.+\\..+")))
    val got = Expectations.evaluate(df, suite)
      .as[(String, Long)].collect().toMap
    assert(got == Map(
      "columns_ordered" -> 0L,
      "id_not_null" -> 1L,
      "amount_min" -> 1L,
      "email_regex" -> 1L))
  }

  test("ordered-column mismatch is a schema violation") {
    val suite = Suite("t", Some(ColumnsOrdered(Seq("email", "id", "amount"))), Nil)
    val got = Expectations.evaluate(df, suite).as[(String, Long)].collect().toMap
    assert(got("columns_ordered") == 1L)
  }

  test("validateOrThrow raises on violation, passes on clean data") {
    val clean = Seq((1L, "a@x.com", 5.0)).toDF("id", "email", "amount")
    Expectations.validateOrThrow(clean,
      Suite("t", None, Seq(MinBound("amount", 0.0))))
    intercept[IllegalStateException] {
      Expectations.validateOrThrow(df,
        Suite("t", None, Seq(NotNull("id"))))
    }
  }
}
