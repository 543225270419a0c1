package graft.operators

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Model-based quality filtering — the classifier tier a production
  * corpus pipeline layers on top of heuristic rules (the
  * CCNet/GPT-style pattern: fit a linear model over hashed bag-of-words
  * features against cheap labels, then score the whole corpus with it).
  * Heuristics ([[graft.functions.TextFunctions.qualityScore]]) are
  * precise but rigid; the model generalizes them to token evidence the
  * rules never mention.
  *
  * Built on Spark ML's public pipeline stages (`HashingTF`,
  * `LogisticRegression`) — the idiomatic Spark path for exactly this
  * job, and the one piece of the engine where a per-row scoring closure
  * is the right call: the model transform broadcasts O(dim) coefficients
  * and scores map-only, no shuffle.
  *
  * 100 TB shape:
  *   - FIT runs on a bounded deterministic sample: [[distill]] caps the
  *     train set at `maxTrain` rows ABSOLUTE (the md5 threshold shrinks
  *     with corpus size — same bounded-sample discipline as
  *     [[Similarity.fitCentroids]]), so L-BFGS iterations each cost one
  *     treeAggregate over ≤`maxTrain` rows, never the corpus.
  *   - SCORE is embarrassingly parallel: hashing trick (fixed `dim`,
  *     no vocabulary shuffle, no fit-time state on the score path) +
  *     a broadcast coefficient vector. Scoring 100 TB is one map pass.
  */
object QualityModel {

  final case class Fitted(model: LogisticRegressionModel, dim: Int,
      textCol: String)

  /** Weak label from the heuristic score: 1.0 when the rule-based
    * quality clears `tau`. Distilling rules into a model is the
    * standard bootstrap when no hand labels exist. */
  def weakLabel(text: Column, tau: Double = 0.75): Column =
    (TextFunctions.qualityScore(text) >= tau).cast("double")

  /** Deterministic fit/score membership: md5-prefix split, reproducible
    * across engines and runs (never `rand()`). 8 hex digits = 2^32
    * buckets, so even a 200k-of-10^11-docs fraction (~2e-6) still
    * resolves to thousands of buckets. */
  def trainSplit(idCol: Column, trainFraction: Double = 0.5): Column =
    conv(substring(md5(idCol.cast("string")), 1, 8), 16, 10)
      .cast("long") < lit((trainFraction * 4294967296.0).toLong)

  private def featurize(docs: DataFrame, textCol: String,
      dim: Int): DataFrame =
    new HashingTF()
      .setInputCol("__toks").setOutputCol("__features").setNumFeatures(dim)
      .transform(docs.withColumn("__toks",
        TextFunctions.tokens(lower(col(textCol)))))

  /** Fit a regularized logistic model of `labelCol` over hashed token
    * counts. `dim` trades collision noise for coefficient size: 2^18
    * floats ≈ 2 MB broadcast at corpus scale; tests use smaller. */
  /** Pack the train sample into ~25k-row tasks, clamped to [1, 64] —
    * proportional to the actual sample, never a fixed funnel. */
  private def packPartitions(trainRows: Long): Int =
    math.max(1, math.min(64, math.ceil(trainRows / 25000.0).toInt))

  /** `trainRows` is the caller's known train-set size (skips a count
    * job when ≥ 0); it only sizes the partition packing, never
    * membership. */
  def fit(train: DataFrame, textCol: String = "text",
      labelCol: String = "label", dim: Int = 1 << 12,
      regParam: Double = 1e-3, maxIter: Int = 20,
      trainRows: Long = -1L): Fitted = {
    // each L-BFGS iteration is one treeAggregate job over the train
    // sample; a loose tol + bounded iters caps the job count — with
    // ridge regularization the weak-label objective converges to
    // filtering-grade coefficients in well under 20 steps
    val lr = new LogisticRegression()
      .setFeaturesCol("__features").setLabelCol(labelCol)
      .setRegParam(regParam).setMaxIter(maxIter).setTol(1e-4)
      .setStandardization(false)
    // the train sample is small relative to the corpus, but each L-BFGS
    // step is a treeAggregate over it — at the session's shuffle
    // parallelism that's scheduling-overhead-dominated. Pack the sample
    // into partitions sized FROM the sample (one count if the caller
    // didn't pass it) so the iteration loop pays per-iteration work,
    // not per-iteration task dispatch — and so an unexpectedly large
    // train set widens instead of funneling into a fixed task count.
    val rows = if (trainRows >= 0L) trainRows else train.count()
    val packed = featurize(train, textCol, dim)
      .coalesce(packPartitions(rows))
    Fitted(lr.fit(packed), dim, textCol)
  }

  /** Score every row: adds `p_good` (P(label=1)) and `model_pred`
    * (thresholded at 0.5). Map-only — the model is a broadcast
    * coefficient vector. */
  def score(docs: DataFrame, fitted: Fitted): DataFrame =
    fitted.model.transform(featurize(docs, fitted.textCol, fitted.dim))
      .withColumn("p_good", element_at(vector_to_array(col("probability")), 2))
      .withColumn("model_pred", (col("p_good") >= 0.5).cast("long"))
      .drop("__toks", "__features", "rawPrediction", "probability",
        "prediction")

  /** End-to-end weak-supervision run: label heuristically, fit on a
    * BOUNDED md5-split train sample, score ALL rows. The train set is
    * capped at `maxTrain` rows absolute: the split fraction is
    * min(0.5, maxTrain/N), so on a small corpus it's the familiar
    * half-split and at 100 TB it's a fixed-size sample — a linear model
    * over hashed bag-of-words saturates long before 200k docs, and the
    * fit cost must not scale with the corpus. Returns per-doc
    * (id, weak_label, model_pred, p_good, is_train). */
  def distill(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", tau: Double = 0.75,
      dim: Int = 1 << 12, maxTrain: Long = 200000L): DataFrame = {
    require(maxTrain >= 1, "maxTrain must be >= 1")
    val n = docs.count()
    val frac = if (n == 0) 0.5 else math.min(0.5, maxTrain.toDouble / n)
    val labeled = docs
      .withColumn("weak_label", weakLabel(col(textCol), tau))
      .withColumn("is_train", trainSplit(col(idCol), frac))
    val fitted = fit(labeled.filter(col("is_train")), textCol,
      "weak_label", dim, trainRows = math.min(maxTrain, (n + 1) / 2))
    score(labeled, fitted)
      .select(col(idCol), col("weak_label").cast("long").as("weak_label"),
        col("model_pred"), col("p_good"), col("is_train"))
  }

  /** Calibration (reliability) report: bin a [0,1] score into `nBins`
    * equal-width bins and compare each bin's mean score to its observed
    * positive rate — the standard check that a quality scorer's
    * numbers MEAN what they say before a threshold is picked from them
    * (a scorer that says 0.9 but is right 60% of the time needs
    * recalibrating, not thresholding). Works on any scorer output:
    * [[score]]'s `p_good`, or the heuristic
    * [[graft.functions.TextFunctions.qualityScore]] (which is what the
    * oracled query uses — deterministic, SQL-expressible). Scores at
    * exactly 1.0 fold into the top bin. Output per non-empty bin:
    * (bin 1-based, n_docs, avg_score, frac_positive), bin-sorted.
    *
    * Scale shape: one map-side bin expression folded into ONE grouped
    * aggregate over ≤ nBins groups — no window, no join; the report is
    * nBins rows whatever the corpus size. */
  def calibration(df: DataFrame, scoreCol: String, labelCol: String,
      nBins: Int = 10): DataFrame = {
    require(nBins >= 1, "need at least one bin")
    val bin = least(floor(col(scoreCol) * nBins).cast("int"), lit(nBins - 1)) + 1
    df.groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col(scoreCol)), 6).as("avg_score"),
        round(avg(col(labelCol).cast("double")), 6).as("frac_positive"))
      .orderBy("bin")
  }

  /** Brier-score decomposition (Murphy, J. Appl. Meteorology 1973) —
    * the one-row verdict behind [[calibration]]'s reliability curve:
    * BS_binned = RELIABILITY − RESOLUTION + UNCERTAINTY, where
    * reliability = Σ nₖ(p̄ₖ−ȳₖ)²/N (calibration error — want 0),
    * resolution = Σ nₖ(ȳₖ−ȳ)²/N (how much the score separates
    * outcomes — want large), uncertainty = ȳ(1−ȳ) (the data's
    * irreducible floor). Also reports the raw unbinned Brier score.
    * A score can be beautifully calibrated and still useless
    * (resolution ≈ 0) — this is the readout that tells them apart.
    *
    * Scale shape: one corpus pass into ≤`nBins` groups + one 1-row
    * base-rate factor; identity arithmetic on a bin-bounded frame. */
  def brierDecomposition(df: DataFrame, scoreCol: String,
      labelCol: String, nBins: Int = 10): DataFrame = {
    require(nBins >= 1, "need at least one bin")
    val bin = least(floor(col(scoreCol) * nBins).cast("int"),
      lit(nBins - 1)) + 1
    val y = col(labelCol).cast("double")
    val bins = df.groupBy(bin.as("__bin"))
      .agg(count(lit(1)).cast("double").as("__n"),
        avg(col(scoreCol)).as("__p"), avg(y).as("__y"),
        sum((col(scoreCol) - y) * (col(scoreCol) - y)).as("__se"))
    val base = bins.agg(
      (sum(col("__n") * col("__y")) / sum("__n")).as("__ybar"))
    bins.crossJoin(broadcast(base))   // 1-row stat factor
      .agg(
        sum("__n").cast("bigint").as("n"),
        round(sum("__se") / sum("__n"), 6).as("brier"),
        round(sum(col("__n") * (col("__p") - col("__y")) *
          (col("__p") - col("__y"))) / sum("__n"), 6).as("reliability"),
        round(sum(col("__n") * (col("__y") - col("__ybar")) *
          (col("__y") - col("__ybar"))) / sum("__n"), 6).as("resolution"),
        round(first("__ybar") * (lit(1.0) - first("__ybar")), 6)
          .as("uncertainty"))
      .withColumn("brier_binned",
        round(col("reliability") - col("resolution") +
          col("uncertainty"), 6))
  }

  /** DuckDB oracle for [[brierDecomposition]]: `scQuery` is any SQL
    * producing columns `(p, y)` — it must compute the SAME score
    * expression the engine used. */
  def brierOracleSql(scQuery: String, nBins: Int = 10): String =
    s"""WITH sc AS ($scQuery),
       |b AS (
       |  SELECT LEAST(CAST(FLOOR(p * $nBins) AS INTEGER),
       |      ${nBins - 1}) + 1 AS bin,
       |    CAST(COUNT(*) AS DOUBLE) AS n, AVG(p) AS pb, AVG(y) AS yb,
       |    SUM((p - y) * (p - y)) AS se
       |  FROM sc GROUP BY 1),
       |base AS (SELECT SUM(n * yb) / SUM(n) AS ybar FROM b)
       |SELECT CAST(SUM(n) AS BIGINT) AS n,
       |  ROUND(SUM(se) / SUM(n), 6) AS brier,
       |  ROUND(SUM(n * (pb - yb) * (pb - yb)) / SUM(n), 6)
       |    AS reliability,
       |  ROUND(SUM(n * (yb - base.ybar) * (yb - base.ybar)) / SUM(n),
       |    6) AS resolution,
       |  ROUND(ANY_VALUE(base.ybar) * (1.0 - ANY_VALUE(base.ybar)), 6)
       |    AS uncertainty,
       |  ROUND(ROUND(SUM(n * (pb - yb) * (pb - yb)) / SUM(n), 6) -
       |    ROUND(SUM(n * (yb - base.ybar) * (yb - base.ybar)) /
       |      SUM(n), 6) +
       |    ROUND(ANY_VALUE(base.ybar) * (1.0 - ANY_VALUE(base.ybar)),
       |      6), 6) AS brier_binned
       |FROM b CROSS JOIN base""".stripMargin

  /** Isotonic calibration by pool-adjacent-violators (Ayer et al.,
    * Ann. Math. Stat. 1955; the standard classifier-calibration map
    * of Zadrozny & Elkan, KDD 2002) — the proper tool where
    * [[calibration]] only DISPLAYS the reliability curve: PAVA returns
    * the least-squares MONOTONE fit of label rate to score, which is
    * the calibrated probability a thresholding curation rule should
    * consume (a raw reliability curve can zig-zag below chance in
    * sparse bins; the isotonic fit cannot).
    *
    * Scale shape — the corpus collapses to one equal-width-bin agg
    * (≤ `nBins` rows); PAVA itself is a sequential stack pass, so it
    * runs on the DRIVER over those ≤64 rows (the q242 driver-Jacobi
    * precedent: driver work bounded by a constant, never the corpus).
    * Output per non-empty bin: `(bin, n_docs, raw_rate, iso_rate)`
    * with iso_rate non-decreasing and weight-mean-preserving. */
  def isotonicCalibration(df: DataFrame, scoreCol: String,
      labelCol: String, nBins: Int = 64): DataFrame = {
    require(nBins >= 1 && nBins <= 4096, "driver pass must stay bounded")
    val spark = df.sparkSession
    import spark.implicits._
    val bin = least(floor(col(scoreCol) * nBins).cast("int"),
      lit(nBins - 1)) + 1
    val bins = df.groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col(labelCol).cast("double")).as("x"))
      .orderBy("bin")
      .collect()                      // ≤ nBins rows — bounded
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    // PAVA: each pool carries (firstBin, weight, mass); merge backward
    // while the monotonicity constraint is violated
    final case class Pool(bin: Int, w: Double, m: Double) {
      def rate: Double = m / w
    }
    val stack = scala.collection.mutable.ArrayBuffer.empty[Pool]
    bins.foreach { case (b, n, x) =>
      var p = Pool(b, n.toDouble, x)
      while (stack.nonEmpty && stack.last.rate >= p.rate) {
        val q = stack.remove(stack.length - 1)
        p = Pool(q.bin, q.w + p.w, q.m + p.m)
      }
      stack += p
    }
    // expand pools back to bins: every bin in a pool gets the pool rate
    val poolEdges = stack.map(_.bin).toSeq :+ Int.MaxValue
    val rates = bins.map { case (b, n, x) =>
      val pi = poolEdges.lastIndexWhere(_ <= b,
        poolEdges.length - 2) match {
        case -1 => 0
        case i  => i
      }
      // HALF_UP like Spark's round() and DuckDB's ROUND — the fit is
      // hash-oracled, so the boundary rule must match the oracle's
      (b, n, round6(x / n), round6(stack(pi).rate))
    }
    rates.toSeq.toDF("bin", "n_docs", "raw_rate", "iso_rate")
      .orderBy("bin")
  }

  private def round6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** DuckDB oracle for [[isotonicCalibration]] as registered on the
    * documents table (quality-score bins vs the length label,
    * nBins = 64). PAVA is replayed through its CLASSICAL closed form
    * (Barlow–Brunk 1972): ŷᵢ = min_{j≥i} max_{k≤i} mean(k..j) over
    * the weighted bin means — O(B³) over ≤64 non-empty bins, so plain
    * prefix-sum joins, no recursion. Both engines divide the same
    * exact-integer sums, so the doubles agree bit-for-bit. */
  val isotonicOracleSql: String =
    """WITH t AS (
      |  SELECT doc_id, str_split_regex(trim(text), '\s+') AS toks
      |  FROM documents),
      |s AS (
      |  SELECT doc_id,
      |    CAST(len(toks) AS DOUBLE) AS n,
      |    CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) AS sl,
      |    CAST(list_sum(list_transform(toks, x -> CASE WHEN x IN
      |      ('the','a','of','and','to','in','is','on',
      |       'der','die','das','und','ist','nicht','ein','zu',
      |       'el','la','de','que','y','en','un','es',
      |       'le','et','les','des','est','une') THEN 1 ELSE 0 END))
      |      AS DOUBLE) AS st
      |  FROM t),
      |q AS (
      |  SELECT doc_id, ROUND(
      |    LEAST(n / 16.0, 1.0) * 0.4 +
      |    (CASE WHEN sl / n BETWEEN 2.0 AND 9.0 THEN 1.0 ELSE 0.5 END) * 0.4 +
      |    LEAST(st / n * 4.0, 1.0) * 0.2, 4) AS quality
      |  FROM s),
      |l AS (
      |  SELECT q.quality,
      |    CASE WHEN d.n_chars >= 300 THEN 1.0 ELSE 0.0 END AS lab
      |  FROM q JOIN documents d USING (doc_id)),
      |binned AS (
      |  SELECT CAST(LEAST(CAST(floor(quality * 64) AS INTEGER), 63) + 1
      |      AS INTEGER) AS bin,
      |    COUNT(*) AS n, SUM(lab) AS x
      |  FROM l GROUP BY 1),
      |ord AS (
      |  SELECT bin, n, x, ROW_NUMBER() OVER (ORDER BY bin) AS i
      |  FROM binned),
      |pre AS (
      |  SELECT i, bin, n, x,
      |    SUM(CAST(n AS DOUBLE)) OVER (ORDER BY i) AS cw,
      |    SUM(CAST(x AS DOUBLE)) OVER (ORDER BY i) AS cx
      |  FROM ord),
      |seg AS (
      |  SELECT k.i AS k, j.i AS j,
      |    (j.cx - COALESCE(km.cx, 0)) / (j.cw - COALESCE(km.cw, 0)) AS m
      |  FROM pre k JOIN pre j ON j.i >= k.i
      |  LEFT JOIN pre km ON km.i = k.i - 1),
      |upper AS (
      |  SELECT p.i, seg.j, MAX(seg.m) AS mx
      |  FROM pre p JOIN seg ON seg.k <= p.i AND seg.j >= p.i
      |  GROUP BY 1, 2),
      |iso AS (SELECT i, MIN(mx) AS iso FROM upper GROUP BY 1)
      |SELECT o.bin, CAST(o.n AS BIGINT) AS n_docs,
      |  ROUND(CAST(o.x AS DOUBLE) / o.n, 6) AS raw_rate,
      |  ROUND(iso.iso, 6) AS iso_rate
      |FROM ord o JOIN iso ON iso.i = o.i ORDER BY o.bin""".stripMargin
}
