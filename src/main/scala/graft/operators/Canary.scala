package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset-provenance canaries: plant uniquely-fingerprinted
  * synthetic documents in a corpus release, then test a SUSPECT
  * corpus for their presence — the "did this dataset derive from our
  * release?" trace used in practice as copyright traps / canary
  * strings in public corpus audits (the protocol studied by Carlini
  * et al., "Extracting Training Data…", USENIX Sec '21 §7 for
  * memorized canaries; map-maker trap streets, transplanted to
  * data releases).
  *
  * Canary text is generated from a seeded RNG (JDK LCG — identical
  * everywhere) as high-entropy token sequences that cannot occur
  * naturally; the SAME (seed, n) regenerates them at detection time,
  * so nothing secret needs storing beside the seed.
  *
  * Detection is two-tier, because derived datasets mutate:
  *   - exact: md5(text) equality (survives row-level copying);
  *   - near: shared-`n`-gram containment via
  *     [[Decontaminate.overlap]]'s broadcast gram join (survives
  *     truncation/light edits — a canary counts as found when ≥
  *     `minSharedGrams` of its grams appear in one suspect doc).
  *
  * Scale shape: injection unions a driver-generated canary frame
  * (n ≤ hundreds — bounded); detection broadcasts the canary gram
  * set against one corpus gram scan — [[Decontaminate]]'s exact
  * dataflow, corpus-linear, no shuffle beyond the final count.
  * Seeded generation ⇒ rows-only; round-trip/mutation/clean-corpus
  * contracts in CanarySpec. */
object Canary {

  /** Deterministic canary texts for (seed, n): 24 tokens each, every
    * token unique to (seed, canary, position). */
  private[graft] def canaryTexts(seed: Long, n: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      (0 until 24).map(_ => f"cx${rnd.nextLong().toHexString}")
        .mkString(" ")
    }
  }

  private def canaryFrame(spark: SparkSession, seed: Long, n: Int,
      startId: Long): DataFrame = {
    import spark.implicits._
    canaryTexts(seed, n).zipWithIndex
      .map { case (t, i) => (startId + i, t) }
      .toDF("doc_id", "text")
  }

  /** Corpus with `n` canaries appended above the current max id. */
  def inject(docs: DataFrame, seed: Long, n: Int = 16): DataFrame = {
    val spark = docs.sparkSession
    val maxId = docs.agg(coalesce(max(col("doc_id")), lit(0L)))
      .head.getLong(0)
    val canaries = canaryFrame(spark, seed, n, maxId + 1)
    val aligned = docs.columns.foldLeft(canaries) { (df, c) =>
      if (df.columns.contains(c)) df else df.withColumn(c, lit(null))
    }.select(docs.columns.map(col): _*)
    docs.unionByName(aligned)
  }

  /** Presence report: one row —
    * `(n_planted, n_exact, n_near, detection_rate)`. A canary is
    * `exact` when its md5 appears verbatim, `near` when any single
    * suspect doc shares ≥ `minSharedGrams` of its `n`-grams
    * (exact ⇒ near; the rate counts near). */
  def detect(suspect: DataFrame, seed: Long, n: Int = 16,
      gramN: Int = 5, minSharedGrams: Long = 3L): DataFrame = {
    val spark = suspect.sparkSession
    import spark.implicits._
    val canaries = canaryFrame(spark, seed, n, 0L)
      .withColumnRenamed("doc_id", "canary_id")

    val exactIds = suspect.select(md5(col("text")).as("h"))
      .join(broadcast(canaries.select(md5(col("text")).as("h"),
        col("canary_id"))), "h")
      .select("canary_id").distinct()

    // per-canary near detection: gram join keyed by canary id —
    // [[Decontaminate.overlap]]'s dataflow with the canary id kept
    val suspectGrams = Decontaminate.docGrams(suspect, gramN, "doc_id", "text")
      .select(col("doc_id").as("s_id"), col("gram"))
    val canaryGrams = Decontaminate.docGrams(
        canaries.withColumnRenamed("canary_id", "doc_id"), gramN,
        "doc_id", "text")
      .withColumnRenamed("doc_id", "canary_id").distinct()
    val nearFound = suspectGrams
      .join(broadcast(canaryGrams), "gram")
      .groupBy(col("canary_id"), col("s_id"))
      .agg(countDistinct(col("gram")).as("__shared"))
      .where(col("__shared") >= minSharedGrams)
      .select("canary_id").distinct()

    val nExact = exactIds.count()
    val nNear = nearFound.count()
    Seq((n.toLong, nExact, nNear,
      math.rint(nNear.toDouble / n * 1e6) / 1e6))
      .toDF("n_planted", "n_exact", "n_near", "detection_rate")
  }
}
