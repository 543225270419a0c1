package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Information-gain feature ranking for categorical features against
  * a categorical label (Quinlan's C4.5 gain-ratio criterion, Machine
  * Learning 1986/1993): IG(f) = H(label) − H(label|f), normalized by
  * the split information H(f) so many-valued features can't buy gain
  * with cardinality alone. The curation use: which cheap metadata
  * column (source, length bucket, script flag) actually predicts the
  * expensive label (lang, quality tier) — i.e. what to stratify or
  * route on before paying for a classifier.
  *
  * Scale shape per feature: ONE grouped count at |f × label| cell
  * cardinality (map-side combined), then entropy sums over that
  * bounded cell table; the corpus is scanned once per feature and
  * never joined. Entropies in bits (log₂). */
object FeatureRank {

  /** `(feature, n_values, h_label, ig, split_info, gain_ratio)` for
    * each named feature expression, ordered by feature name.
    * gain_ratio is NULL when the split information is zero (a
    * single-valued feature carries no split). */
  def gainRatio(df: DataFrame, label: Column,
      features: Seq[(String, Column)]): DataFrame = {
    require(features.nonEmpty, "need at least one feature")
    features.map { case (name, f) =>
      // cell-cardinality table read by four branches; the r14o1
      // persist here regressed the close bench 0.77x and pushed q354
      // over its 2x perf gate — reverted (replaying the cheap cell
      // aggregate beats the cache write + InMemoryTableScan read)
      val cells = df
        .where(label.isNotNull && f.isNotNull)
        .groupBy(f.as("__f"), label.as("__l"))
        .agg(count(lit(1)).as("__c"))
      val tot = cells.agg(sum("__c").as("__n"))
      val n = col("__n").cast("double")
      // H(label): entropy of the label margin, in bits
      val hLabel = cells.groupBy("__l")
        .agg(sum("__c").as("__cl"))
        .crossJoin(broadcast(tot))
        .agg(sum((col("__cl") / n) * log2(n / col("__cl")))
          .as("__hl"))
      // per-feature-value total riding beside each cell (bounded
      // cell-table window), then H_f per value and the Σ p_f·H_f /
      // H(f) reductions
      val fTot = cells.groupBy("__f").agg(sum("__c").as("__cf"))
      val perF = cells.join(broadcast(fTot), Seq("__f"))
        .groupBy("__f")
        .agg(first("__cf").as("__cf"),
          sum((col("__c") / col("__cf").cast("double")) *
            log2(col("__cf").cast("double") / col("__c")))
            .as("__hfi"))
      val s = perF.crossJoin(broadcast(tot)).agg(
        count(lit(1)).as("n_values"),
        sum((col("__cf") / n) * log2(n / col("__cf"))).as("__si"),
        sum((col("__cf") / n) * col("__hfi")).as("__hcond"))
      s.crossJoin(hLabel)   // two 1-row stat factors
        .select(lit(name).as("feature"),
          col("n_values").cast("bigint").as("n_values"),
          round(col("__hl"), 6).as("h_label"),
          round(col("__hl") - col("__hcond"), 6).as("ig"),
          round(col("__si"), 6).as("split_info"),
          round(when(col("__si") > 0.0,
            (col("__hl") - col("__hcond")) / col("__si")), 6)
            .as("gain_ratio"))
    }.reduce(_.unionByName(_)).orderBy("feature")
  }

  /** DuckDB oracle for [[gainRatio]] on documents with label = lang
    * and the q354 feature set (source, length bucket, digit flag) —
    * the CASE bucket edges must match the engine side verbatim. */
  val gainRatioDocsOracleSql: String = {
    val feats = Seq(
      ("digit_flag", "regexp_matches(text, '[0-9]')"),
      ("len_bucket",
        """CASE WHEN n_chars < 120 THEN 'xs'
          |      WHEN n_chars < 300 THEN 's'
          |      WHEN n_chars < 800 THEN 'm'
          |      ELSE 'l' END""".stripMargin),
      ("source", "source"))
    val selects = feats.map { case (name, expr) =>
      s"""SELECT '$name' AS feature, n_values, h_label, ig,
         |  split_info, gain_ratio
         |FROM (
         |  WITH cells AS (
         |    SELECT $expr AS f, lang AS l, COUNT(*) AS c
         |    FROM documents
         |    WHERE lang IS NOT NULL AND ($expr) IS NOT NULL
         |    GROUP BY 1, 2),
         |  tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM cells),
         |  hl AS (
         |    SELECT SUM((cl / n) * LOG2(n / cl)) AS h_label
         |    FROM (SELECT SUM(c) AS cl FROM cells GROUP BY l)
         |    CROSS JOIN tot),
         |  ft AS (SELECT f, SUM(c) AS cf FROM cells GROUP BY f),
         |  perf AS (
         |    SELECT cells.f, ANY_VALUE(ft.cf) AS cf,
         |      SUM((cells.c / CAST(ft.cf AS DOUBLE)) *
         |        LOG2(CAST(ft.cf AS DOUBLE) / cells.c)) AS hfi
         |    FROM cells JOIN ft ON cells.f = ft.f
         |    GROUP BY cells.f),
         |  s AS (
         |    SELECT CAST(COUNT(*) AS BIGINT) AS n_values,
         |      SUM((cf / n) * LOG2(n / cf)) AS si,
         |      SUM((cf / n) * hfi) AS hcond
         |    FROM perf CROSS JOIN tot)
         |  SELECT s.n_values, ROUND(hl.h_label, 6) AS h_label,
         |    ROUND(hl.h_label - s.hcond, 6) AS ig,
         |    ROUND(s.si, 6) AS split_info,
         |    ROUND(CASE WHEN s.si > 0
         |      THEN (hl.h_label - s.hcond) / s.si END, 6)
         |      AS gain_ratio
         |  FROM s CROSS JOIN hl)""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""SELECT * FROM (
       |$selects
       |) ORDER BY feature""".stripMargin
  }
}
