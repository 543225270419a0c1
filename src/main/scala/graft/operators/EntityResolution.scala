package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked fuzzy entity resolution — the record-linkage step a CRM
  * ingest needs before joining on names (the reference's crm_leads
  * domain carries free-text identity columns, `samples/crm_leads.csv`,
  * but the reference itself only ever equi-joins; near-duplicate
  * entities silently double-count).
  *
  * Classic two-phase shape:
  *   1. BLOCKING — candidate pairs are generated only within a cheap
  *      equality block (here: the name's last token), turning the
  *      O(N²) all-pairs comparison into Σ O(|block|²). At 100 TB the
  *      block key is the scaling lever (token + length-bucket +
  *      phonetic key, multi-pass), exactly like [[Dedup]]'s LSH bands.
  *   2. SCORING — Levenshtein edit distance on the pair, kept when
  *      `dist <= maxDist`.
  *
  * The pairs are generated over the DISTINCT-name dictionary, not the
  * raw rows: duplicate spellings collapse before the quadratic step
  * (dictionary size, not corpus size, bounds the join), and each side
  * carries its raw-row count so the caller can weigh merge impact.
  *
  * A length-band predicate (`||len(a)−len(b)|| <= maxDist`) runs
  * before the distance: edit distance is bounded below by the length
  * difference, so the band is a free exact filter that skips the
  * expensive comparison on most pairs.
  */
object EntityResolution {

  /** Candidate merge pairs over the distinct values of `nameCol`:
    * `name_a < name_b`, same block (last token), edit distance
    * `<= maxDist`. Output: names, distance, raw-row count per side. */
  def fuzzyNamePairs(entities: DataFrame, nameCol: String,
      maxDist: Int = 2): DataFrame = {
    require(maxDist >= 1, "maxDist must be >= 1")
    val names = entities
      .filter(col(nameCol).isNotNull)
      .groupBy(col(nameCol).as("name"))
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("block", element_at(split(col("name"), " "), -1))
    val a = names.select(col("block"), col("name").as("name_a"),
      col("n_rows").as("n_rows_a"))
    val b = names.select(col("block"), col("name").as("name_b"),
      col("n_rows").as("n_rows_b"))
    a.join(b, Seq("block"))
      .filter(col("name_a") < col("name_b"))
      .filter(abs(length(col("name_a")) - length(col("name_b"))) <= maxDist)
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("bigint"))
      .filter(col("dist") <= maxDist)
      .select("name_a", "name_b", "dist", "n_rows_a", "n_rows_b")
      .orderBy("name_a", "name_b")
  }
}
