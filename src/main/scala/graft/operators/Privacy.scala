package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pre-publication privacy audit for a curated dataset — the
  * k-anonymity / l-diversity family (Sweeney, IJUFKS 2002; Machanavajjhala
  * et al., ICDE 2006). A released corpus slice is re-identifiable when a
  * combination of quasi-identifier columns (region, segment, coarse
  * demographics) isolates a small group of rows; it leaks attributes when
  * an equivalence class, though large, is uniform in a sensitive column.
  * [[Scrub]] removes PII *strings* from text; this tier audits and gates
  * the *structured* side of a release — the audit every dataset-card
  * checklist asks for before a corpus ships.
  *
  * The reference repo has no privacy surface (its validation stops at
  * null/range expectations, `expectations/suites.py`); this extends the
  * curation tier with the standard publication gate.
  *
  * Scale shape: the audit is ONE hash aggregation on the quasi-identifier
  * key (map-side partials; class count is bounded by the quasi-space, not
  * the row count). The publication gate is that same aggregate joined
  * back as a LEFT SEMI on the key — two shuffles on narrow rows, AQE
  * handles a skewed dominant class; no windowed buffering of whole
  * classes (a `count(*) OVER (PARTITION BY quasi)` would buffer the
  * largest class per task — the semi-join form spills nothing).
  */
object Privacy {

  private def quasi(cols: Seq[String]): Seq[Column] = {
    require(cols.nonEmpty, "need at least one quasi-identifier column")
    cols.map(col)
  }

  /** Per-equivalence-class audit: one row per distinct quasi-identifier
    * combination with its size, the distinct-count of the sensitive
    * column inside it (l-diversity), and the below-k flag. The classes
    * with `below_k` are the re-identification surface; classes with
    * `l_diversity = 1` disclose the sensitive value exactly even when
    * large. */
  def kAnonymityReport(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    df.groupBy(quasi(quasiCols): _*)
      .agg(
        count(lit(1)).as("class_size"),
        countDistinct(col(sensitiveCol)).as("l_diversity"),
        (count(lit(1)) < k).as("below_k"))
      .orderBy(quasi(quasiCols): _*)
  }

  /** One-row corpus summary: the k the dataset ACTUALLY satisfies
    * (min class size), the worst l-diversity, class count, and how many
    * rows sit in below-`k` classes (the suppression cost of publishing
    * at `k`). */
  def anonymitySummary(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, k: Int): DataFrame =
    kAnonymityReport(df, quasiCols, sensitiveCol, k)
      .agg(
        min("class_size").as("k_anonymity"),
        min("l_diversity").as("l_diversity_min"),
        count(lit(1)).as("n_classes"),
        coalesce(sum(when(col("below_k"), col("class_size"))
          .otherwise(0L)), lit(0L)).as("rows_at_risk"))

  /** Publication gate: keep only rows whose equivalence class has at
    * least `k` members — suppression, the conservative end of the
    * generalize/suppress ladder. Left-semi against the aggregated class
    * table (never a window over raw rows; see the object doc for why). */
  def suppressBelowK(df: DataFrame, quasiCols: Seq[String],
      k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val safe = df.groupBy(quasi(quasiCols): _*)
      .agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") >= k)
      .select(quasi(quasiCols): _*)
    df.join(safe, quasiCols, "left_semi")
  }

  /** Generalization step for a numeric quasi-identifier: replace exact
    * values with the lower edge of a `width`-sized band
    * (`floor(v / width) * width`), coarsening the quasi-space so more
    * rows share a class — the non-destructive alternative to
    * suppression. Map-only projection. */
  def bandize(df: DataFrame, numCol: String, width: Double,
      bandCol: String): DataFrame = {
    require(width > 0, "band width must be positive")
    df.withColumn(bandCol, floor(col(numCol) / width) * width)
  }
}
