package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import graft.io.{RoundTrip, Sources}

/** Row-level losslessness of the CSV / JSON-lines round-trip paths —
  * the q429/q430 oracle pins the aggregate; this pins the values. */
class RoundTripSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val tsOpts = Map("timestampFormat" -> RoundTrip.TsFmt)

  // adversarial fixture: non-zero microseconds, quotes + commas +
  // backslashes in props, a double that needs 17 significant digits
  private def fixture = Seq(
    (1L, java.sql.Timestamp.valueOf("2024-03-01 01:02:03.000007"),
      10L, "view", 0.1 + 0.2, """{"k": 69, "s": "a,b\"c\\d"}"""),
    (2L, java.sql.Timestamp.valueOf("2024-03-01 23:59:59.999999"),
      11L, "click", -1.5e-300, """{"empty": ""}"""),
    (3L, java.sql.Timestamp.valueOf("2024-03-02 00:00:00.0"),
      10L, "view", 4.9e-324, "plain, unquoted ish"))
    .toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[Row] =
    df.orderBy("event_id").collect().toSeq

  test("csv sink + scan round-trips micros timestamps, quotes and doubles") {
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_rtspec_csv"
    graft.pipeline.Lakehouse.writeCsv(fixture, out, tsOpts)
    val back = Sources.csv(spark, out, RoundTrip.eventsSchema, tsOpts)
    assert(sortedRows(back) == sortedRows(fixture))
  }

  test("json-lines sink + scan round-trips nested-JSON strings intact") {
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_rtspec_jsonl"
    fixture.write.mode("overwrite").options(tsOpts).json(out)
    val back = Sources.jsonLines(spark, out, RoundTrip.eventsSchema,
      tsOpts)
    assert(sortedRows(back) == sortedRows(fixture))
  }
}
