package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.lake.TableLog
import graft.operators.{Curation, Scrub}
import graft.quality.Expectations
import graft.quality.Expectations._

/** The curation pass as a PRODUCT job: run
  * [[graft.operators.Curation.pipeline]] over a raw corpus, validate
  * the output contract, and publish the curated snapshot into a
  * [[TableLog]]-versioned table — so downstream training runs read a
  * pinned table version, re-runs upsert idempotently instead of
  * duplicating, and a failed quality contract leaves the previous
  * version untouched (validate-before-publish, as a table commit).
  *
  * Scale shape inherits from the pieces: the pipeline is one scan +
  * one keyed window; the merge commit shuffles only on the key; the
  * expectation suite is a single aggregate pass over the would-be
  * snapshot.
  */
object CurationJob {

  /** Output contract for the curated corpus table. */
  def suite(minDistinctRatio: Double,
      splits: Seq[(String, Double)]): Suite = Suite(
    name = "curated_corpus",
    columnsOrdered = Some(ColumnsOrdered(
      Seq("doc_id", "split", "n_tokens", "distinct_ratio", "redacted"))),
    checks = Seq(
      NotNull("doc_id"), NotNull("split"), NotNull("redacted"),
      MinBound("n_tokens", 2),
      MinBound("distinct_ratio", minDistinctRatio),
      RegexMatch("split",
        splits.map(_._1).mkString("(", "|", ")") + "$")))

  /** Run the pipeline over `docs` and merge the curated snapshot into
    * the versioned table at `tablePath` (keyed on doc_id; incremental
    * re-runs with new raw batches upsert). Returns the commit and the
    * per-split mix report of the published snapshot. */
  def run(spark: SparkSession, docs: DataFrame, tablePath: String,
      rules: Seq[Scrub.Rule],
      minDistinctRatio: Double = 0.35,
      dedupPrefix: Int = 40,
      splits: Seq[(String, Double)] =
        Seq(("train", 0.90), ("val", 0.07), ("test", 0.03)))
      : (TableLog.Commit, DataFrame) = {
    val curated = Curation.pipeline(docs, rules, minDistinctRatio,
      dedupPrefix, splits, withText = true)
    val commit = TableLog.commitMergeValidated(
      spark, tablePath, curated, Seq("doc_id"),
      suite(minDistinctRatio, splits))
    val mix = TableLog.read(spark, tablePath)
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").cast("bigint").as("n_tokens"))
      .orderBy("split")
    (commit, mix)
  }
}
