package graft.quality

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._
import graft.quality.Expectations._

/** Config-driven expectation suites: parse the reference's Great
  * Expectations JSON suite format into [[Expectations.Suite]].
  *
  * Format (reference `great_expectations/expectations/<d>.json`,
  * interpreter `local_runner.py:62-104`): an `expectations` array of
  * `{expectation_type, kwargs}`; supported types are the four the
  * reference executes — ordered column list, not-null, between
  * (min enforced, max read-but-ignored, matching local_runner.py:87-92),
  * regex match — plus unique and in-set, completing dbt's generic-test
  * quartet (not_null/unique/accepted_values; `relationships` is the
  * two-table [[Expectations.relationshipOrphans]]). Unknown types
  * raise, like the reference (:101-102).
  *
  * Uses Jackson from Spark's own classpath — no extra dependency.
  */
object SuiteLoader {

  private val mapper = new ObjectMapper()

  /** Optional top-level `freshness` block mirroring dbt's source
    * freshness declaration 1:1 (reference `dbt/models/schema.yml:10-13`):
    * `{"loaded_at_field": "dt",
    *   "warn_after": {"count": 12, "period": "hour"},
    *   "error_after": {"count": 24, "period": "hour"}}`.
    * Periods `minute|hour|day` normalize to hours; either bound may be
    * omitted, like dbt. */
  private def parseFreshness(root: JsonNode): Option[FreshnessPolicy] =
    Option(root.get("freshness")).filterNot(_.isNull).map { f =>
      def hours(key: String): Option[Double] =
        Option(f.get(key)).filterNot(_.isNull).map { b =>
          val count = b.get("count").asDouble()
          b.get("period").asText() match {
            case "minute" => count / 60.0
            case "hour"   => count
            case "day"    => count * 24.0
            case other =>
              throw new IllegalArgumentException(s"unsupported period: $other")
          }
        }
      val loadedAt = Option(f.get("loaded_at_field")).filterNot(_.isNull)
        .getOrElse(throw new IllegalArgumentException(
          "freshness block missing required loaded_at_field"))
      FreshnessPolicy(
        loadedAtCol = loadedAt.asText(),
        warnAfterHours = hours("warn_after"),
        errorAfterHours = hours("error_after"))
    }

  def fromJsonString(name: String, json: String): Suite = {
    val root = mapper.readTree(json)
    val exps = Option(root.get("expectations"))
      .map(_.elements().asScala.toSeq)
      .getOrElse(Seq.empty)
    var columnsOrdered: Option[ColumnsOrdered] = None
    val checks = Seq.newBuilder[Expectation]
    exps.foreach { e =>
      val tpe = e.get("expectation_type").asText()
      val kwargs = e.get("kwargs")
      def column = kwargs.get("column").asText()
      tpe match {
        case "expect_table_columns_to_match_ordered_list" =>
          val cols = kwargs.get("column_list").elements().asScala
            .map(_.asText()).toSeq
          columnsOrdered = Some(ColumnsOrdered(cols))
        case "expect_column_values_to_not_be_null" =>
          checks += NotNull(column)
        case "expect_column_values_to_be_between" =>
          // reference enforces only min_value (local_runner.py:87-92)
          Option(kwargs.get("min_value")).filterNot(_.isNull)
            .foreach(min => checks += MinBound(column, min.asDouble()))
        case "expect_column_values_to_match_regex" =>
          checks += RegexMatch(column, kwargs.get("regex").asText())
        case "expect_column_values_to_be_unique" =>
          checks += Unique(column)
        case "expect_column_values_to_be_in_set" =>
          checks += AcceptedValues(column,
            kwargs.get("value_set").elements().asScala.map(_.asText()).toSeq)
        case other =>
          throw new IllegalArgumentException(s"unsupported expectation: $other")
      }
    }
    Suite(name, columnsOrdered, checks.result(), parseFreshness(root))
  }

  def fromFile(name: String, path: String): Suite =
    fromJsonString(name, java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
}
