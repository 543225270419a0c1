package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Markov-chain attribution with removal effects (Anderl, Becker,
  * v. Wangenheim & Schumann 2014, "Mapping the customer journey"):
  * credit each channel by how much the corpus-wide conversion
  * probability DROPS when journeys can no longer pass through it —
  * the data-driven alternative to last-touch heuristics, and the
  * multi-touch completion of [[graft.streaming.Streams.clickAttribution]]
  * (which pairs ONE click with one purchase).
  *
  * Journey model (deterministic): each user's event stream splits
  * into segments at purchases; a segment's transitions are
  * START → first channel, channel → channel for consecutive
  * non-purchase events, channel → CONV when the next event is a
  * purchase, and trailing channel → NULL when the stream ends
  * unconverted.
  *
  * Scale split: transition EXTRACTION is corpus-work — one window
  * shuffle on the user key (the [[Sessionize]]/[[GraphRank]] shape).
  * The chain itself is |channels|²-sized; absorption probabilities
  * are solved on the driver by fixed-iteration value iteration over
  * that tiny matrix (the same bounded-driver-state contract as the
  * k-means/codebook fits — graph-sized, never corpus-sized).
  * Removal effects re-solve the chain once per channel: k solves of
  * a k-state system. Estimates involve an iterative solve ⇒
  * rows-only; hand-computed chains in AttributionSpec. */
object Attribution {

  /** Rule-based multi-touch attribution side-by-side — first-touch /
    * last-touch / linear credit per channel over each converting
    * user's PRE-conversion journey (all non-purchase events strictly
    * before the user's first purchase). The heuristics panel next to
    * the model-based [[removalEffects]] and q283's Shapley: when the
    * three rules agree, attribution is robust; when they diverge, the
    * journey ORDER matters and only the model-based numbers are
    * trustworthy. Deterministic: journey position ties break on
    * event_id.
    *
    * Output: `(channel, journeys, first_touch, last_touch, linear)`
    * ordered by channel, credits rounded to 6.
    *
    * Scale shape: one per-user first-purchase agg, one user-keyed
    * join + two user-partitioned windows, one channel-cardinality
    * agg — the [[Sessionize]] shuffle budget. */
  def touchComparison(events: DataFrame): DataFrame = {
    val firstPurchase = events
      .where(col("event_type") === "purchase")
      .groupBy("user_id").agg(min("ts").as("__pts"))
    val pre = events
      .where(col("event_type") =!= "purchase")
      .join(firstPurchase, Seq("user_id"))
      .where(col("ts") < col("__pts"))
    val wAsc = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
    val wDesc = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    val wAll = Window.partitionBy("user_id")
    val credited = pre
      .withColumn("__first",
        when(row_number().over(wAsc) === 1, 1.0).otherwise(0.0))
      .withColumn("__last",
        when(row_number().over(wDesc) === 1, 1.0).otherwise(0.0))
      .withColumn("__linear",
        lit(1.0) / count(lit(1)).over(wAll))
    credited.groupBy(col("event_type").as("channel"))
      .agg(
        countDistinct(col("user_id")).as("journeys"),
        round(sum("__first"), 6).as("first_touch"),
        round(sum("__last"), 6).as("last_touch"),
        round(sum("__linear"), 6).as("linear"))
      .orderBy("channel")
  }

  /** DuckDB oracle for [[touchComparison]]. */
  val touchComparisonOracleSql: String =
    """WITH fp AS (
      |  SELECT user_id, MIN(ts) AS pts FROM events
      |  WHERE event_type = 'purchase' GROUP BY 1),
      |pre AS (
      |  SELECT e.user_id, e.event_type, e.ts, e.event_id
      |  FROM events e JOIN fp ON e.user_id = fp.user_id
      |  WHERE e.event_type <> 'purchase' AND e.ts < fp.pts),
      |c AS (
      |  SELECT event_type,  user_id,
      |    CASE WHEN ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) = 1 THEN 1.0 ELSE 0.0 END AS f,
      |    CASE WHEN ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY ts DESC, event_id DESC) = 1
      |      THEN 1.0 ELSE 0.0 END AS l,
      |    1.0 / COUNT(*) OVER (PARTITION BY user_id) AS lin
      |  FROM pre)
      |SELECT event_type AS channel,
      |  COUNT(DISTINCT user_id) AS journeys,
      |  ROUND(SUM(f), 6) AS first_touch,
      |  ROUND(SUM(l), 6) AS last_touch,
      |  ROUND(SUM(lin), 6) AS linear
      |FROM c GROUP BY 1 ORDER BY 1""".stripMargin

  /** Corpus-wide transition counts `(src, dst, n)` over the journey
    * model; START/CONV/NULL are reserved state names. */
  def transitions(events: DataFrame,
      convType: String = "purchase"): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    // segment = number of purchases strictly before this event
    val seg = events
      .withColumn("__isConv",
        when(col("event_type") === convType, 1L).otherwise(0L))
      .withColumn("__segment",
        coalesce(sum(col("__isConv"))
          .over(byUser.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
    val bySeg = Window.partitionBy(col("user_id"), col("__segment"))
      .orderBy(col("ts"), col("event_id"))
    val steps = seg
      .withColumn("__prev", lag(col("event_type"), 1).over(bySeg))
      .withColumn("__next", lead(col("event_type"), 1).over(bySeg))
    val fromChannels = steps.where(col("event_type") =!= convType)
      .select(
        col("event_type").as("src"),
        when(col("__next").isNull, lit("NULL"))
          .when(col("__next") === convType, lit("CONV"))
          .otherwise(col("__next")).as("dst"))
    val starts = steps
      .where(col("__prev").isNull && col("event_type") =!= convType)
      .select(lit("START").as("src"), col("event_type").as("dst"))
    fromChannels.unionAll(starts)
      .groupBy("src", "dst").agg(count(lit(1)).as("n"))
  }

  /** Conversion probability from START under value iteration:
    * v(s) = P(s→CONV) + Σ_c P(s→c)·v(c), `iters` fixed sweeps
    * (monotone convergent from v=0; deterministic). `removed`
    * channels absorb to NULL. */
  private[graft] def solveConversion(
      probs: Map[(String, String), Double], channels: Seq[String],
      removed: Set[String], iters: Int = 200): Double = {
    def p(s: String, d: String): Double =
      if (removed.contains(d)) 0.0 else probs.getOrElse((s, d), 0.0)
    var v = channels.map(_ -> 0.0).toMap
    for (_ <- 1 to iters) {
      v = channels.map { s =>
        s -> (p(s, "CONV") +
          channels.map(c => p(s, c) * v(c)).sum)
      }.toMap
    }
    p("START", "CONV") + channels.map(c => p("START", c) * v(c)).sum
  }

  /** Per-channel removal effect and normalized attribution share:
    * `(channel, removal_effect, attribution)` ordered by channel. */
  def removalEffects(spark: SparkSession, events: DataFrame,
      convType: String = "purchase"): DataFrame = {
    import spark.implicits._
    val t = transitions(events, convType).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val totals = t.groupBy(_._1._1).map { case (s, m) =>
      s -> m.values.sum.toDouble }
    val probs = t.map { case ((s, d), n) => (s, d) -> n / totals(s) }
    val channels = (t.keySet.map(_._1) ++ t.keySet.map(_._2))
      .diff(Set("START", "CONV", "NULL")).toSeq.sorted
    val full = solveConversion(probs, channels, Set.empty)
    val effects = channels.map { c =>
      val removedP = solveConversion(probs, channels, Set(c))
      c -> (if (full == 0.0) 0.0 else (full - removedP) / full)
    }
    val totalEffect = effects.map(_._2).sum
    effects.map { case (c, e) =>
      // Canon.snap6, not rint: the oracle ROUND's tie policy (see
      // Canon.snap6's doc for why half-even diverges)
      (c, graft.util.Canon.snap6(e),
        if (totalEffect == 0.0) 0.0
        else graft.util.Canon.snap6(e / totalEffect))
    }.toDF("channel", "removal_effect", "attribution")
      .orderBy("channel")
  }

  /** Exact Shapley-value channel attribution (Shapley 1953; the
    * coalition formulation for marketing touchpoints of Zhao, Mahboobi
    * & Bagheri, arXiv:1804.05327) — the fair-division counterpart to
    * [[removalEffects]]' Markov view: each channel is credited its
    * average marginal lift over every coalition of the other channels,
    * the ONLY split satisfying efficiency/symmetry/null-player.
    *
    * Coalition value is the cumulative-exposure convention:
    * v(S) = conversion rate among users whose touched-channel set ⊆ S
    * (v(∅) = the no-touch baseline; v(full) = overall rate), so v is
    * defined for every S directly from data, monotone conventions
    * aside. Shapley_i = Σ_{S ∌ i} |S|!·(C−|S|−1)!/C! · (v(S∪i) − v(S)).
    *
    * Scale shape: the corpus collapses to ONE per-user (bitmask,
    * converted) agg, then a 2^C-row mask table; every join after is
    * on the 2^C×2^C lattice — with C = 4 channels that is 16×16,
    * bounded by the CHANNEL VOCABULARY forever (C ≲ 20 keeps the
    * lattice ≤ 1M rows; more channels than that is a different
    * product). Weights are exact factorial ratios computed by the
    * same integer-CASE expression in engine and oracle. */
  def shapleyAttribution(events: DataFrame,
      channels: Seq[String] = Seq("click", "error", "signup", "view"),
      convType: String = "purchase"): DataFrame = {
    require(channels.nonEmpty && channels.size <= 20,
      "channel lattice must stay bounded")
    val c = channels.size
    val full = (1 << c) - 1
    val spark = events.sparkSession
    import spark.implicits._
    // per-user exposure mask + conversion flag — the only corpus pass
    val idx = channels.zipWithIndex
      .map { case (ch, i) => (ch, 1L << i) }.toDF("__ch", "__bit")
    val perUser = events
      .join(broadcast(idx), events("event_type") === col("__ch"),
        "left_outer")
      .groupBy("user_id")
      .agg(
        coalesce(bit_or(col("__bit")), lit(0L)).as("__mask"),
        max(when(col("event_type") === convType, 1L).otherwise(0L))
          .as("__conv"))
    val maskStats = perUser.groupBy("__mask")
      .agg(count(lit(1)).as("__u"), sum("__conv").as("__x"))
    // v(S) over the full lattice: containment join (2^C × masks)
    val spine = spark.range(0, full + 1).select(col("id").as("__s"))
    val v = spine.join(broadcast(maskStats),
        (col("__mask").bitwiseAND(col("__s"))) === col("__mask"))
      .groupBy("__s")
      .agg((sum("__x").cast("double") /
        sum("__u").cast("double")).as("__v"))
    // marginal contributions: channels × subsets-without-channel
    val chBits = channels.zipWithIndex
      .map { case (ch, i) => (ch, 1L << i) }.toDF("channel", "__bit")
    val pairs = chBits.crossJoin(broadcast(spine))   // C×2^C lattice
      .where(col("__s").bitwiseAND(col("__bit")) === 0L)
      .withColumn("__k", bit_count(col("__s")).cast("long"))
    def factCase(col0: org.apache.spark.sql.Column) = {
      // k! as an integer CASE — identical literal table in the oracle
      val facts = (0 to 20).map(k =>
        (k, (1 to k).foldLeft(1L)(_ * _)))
      facts.foldLeft(lit(1L)) { case (acc, (k, f)) =>
        when(col0 === k.toLong, lit(f)).otherwise(acc) }
    }
    val cFact = (1 to c).foldLeft(1L)(_ * _)
    // a coalition no user's exposure set fits inside has no empirical
    // v — both engine and oracle pin the v(S)=0 convention for it
    val weighted = pairs
      .join(v.select(col("__s"), col("__v").as("__v0")), Seq("__s"),
        "left_outer")
      .join(v.select(col("__s").as("__s1"), col("__v").as("__v1")),
        col("__s1") === (col("__s").bitwiseOR(col("__bit"))),
        "left_outer")
      .withColumn("__w",
        factCase(col("__k")) * factCase(lit(c.toLong) - col("__k") - 1L)
          / lit(cFact.toDouble))
      .withColumn("__m", col("__w") *
        (coalesce(col("__v1"), lit(0.0)) -
          coalesce(col("__v0"), lit(0.0))))
    val shap = weighted.groupBy("channel")
      .agg(sum("__m").as("__shap"))
    val totalRow = shap.agg(sum("__shap").as("__tot"))
    shap.crossJoin(broadcast(totalRow))   // 1-row stat factor
      .select(col("channel"),
        round(col("__shap"), 6).as("shapley"),
        round(when(abs(col("__tot")) > 0.0,
          col("__shap") / col("__tot")), 6).as("share"))
      .orderBy("channel")
  }

  /** DuckDB oracle for [[shapleyAttribution]] with the default
    * 4-channel fixture. */
  def shapleyOracleSql(
      channels: Seq[String] = Seq("click", "error", "signup", "view"),
      convType: String = "purchase"): String = {
    val c = channels.size
    val full = (1 << c) - 1
    val cFact = (1 to c).foldLeft(1L)(_ * _)
    val chValues = channels.zipWithIndex
      .map { case (ch, i) => s"('$ch', ${1L << i})" }.mkString(", ")
    val factCase = (k: String) => "CASE " + (0 to c).map(j =>
      s"WHEN $k = $j THEN ${(1 to j).foldLeft(1L)(_ * _)}")
      .mkString(" ") + " ELSE 1 END"
    s"""WITH ch(ch, bit) AS (VALUES $chValues),
       |pu AS (
       |  SELECT e.user_id,
       |    COALESCE(bit_or(ch.bit), 0) AS mask,
       |    MAX(CASE WHEN e.event_type = '$convType' THEN 1
       |      ELSE 0 END) AS conv
       |  FROM events e LEFT JOIN ch ON e.event_type = ch.ch
       |  GROUP BY 1),
       |ms AS (
       |  SELECT mask, COUNT(*) AS u, SUM(conv) AS x
       |  FROM pu GROUP BY 1),
       |spine AS (SELECT UNNEST(range(0, ${full + 1})) AS s),
       |v AS (
       |  SELECT spine.s,
       |    CAST(SUM(ms.x) AS DOUBLE) / SUM(ms.u) AS v
       |  FROM spine JOIN ms ON (ms.mask & spine.s) = ms.mask
       |  GROUP BY 1),
       |pairs AS (
       |  SELECT ch.ch AS channel, ch.bit, spine.s,
       |    bit_count(spine.s) AS k
       |  FROM ch CROSS JOIN spine
       |  WHERE (spine.s & ch.bit) = 0),
       |m AS (
       |  SELECT p.channel,
       |    (${factCase("p.k")}) * (${factCase(s"$c - p.k - 1")})
       |      / $cFact.0 *
       |      (COALESCE(v1.v, 0.0) - COALESCE(v0.v, 0.0)) AS m
       |  FROM pairs p
       |  LEFT JOIN v v0 ON v0.s = p.s
       |  LEFT JOIN v v1 ON v1.s = (p.s | p.bit)),
       |sh AS (
       |  SELECT channel, SUM(m) AS shap FROM m GROUP BY 1),
       |tot AS (SELECT SUM(shap) AS t FROM sh)
       |SELECT channel,
       |  ROUND(shap, 6) AS shapley,
       |  ROUND(CASE WHEN abs(t) > 0 THEN shap / t END, 6) AS share
       |FROM sh CROSS JOIN tot
       |ORDER BY channel""".stripMargin
  }

  /** DuckDB oracle for [[removalEffects]] over the `events` table — a
    * FULL replay: the transition extraction (purchase-segmented
    * windows), then the 200-sweep value iteration as a recursive CTE
    * carrying the per-variant state vector `v` as a DOUBLE list, one
    * variant per removed channel plus the full chain. Sums fold in
    * channel order exactly as the engine's `.sum` (list_reduce is the
    * same left fold, and the first term is non-negative so the
    * missing leading `0.0 +` cannot change a bit). TRAP captured
    * here: the recursion anchor's `v` must be `CAST(0.0 AS DOUBLE)` —
    * a bare `0.0` literal types the carried list DECIMAL(2,1) and the
    * UNION ALL quantizes every later iteration to one decimal. */
  def removalOracleSql: String =
    s"""       |WITH RECURSIVE
       |seg AS (
       |  SELECT user_id, ts, event_id, event_type,
       |    COALESCE(SUM(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY user_id ORDER BY ts, event_id
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS segment
       |  FROM events),
       |steps AS (
       |  SELECT *, LAG(event_type) OVER w AS prev, LEAD(event_type) OVER w AS nxt
       |  FROM seg WINDOW w AS (PARTITION BY user_id, segment ORDER BY ts, event_id)),
       |trans AS (
       |  SELECT src, dst, COUNT(*) AS n FROM (
       |    SELECT event_type AS src,
       |      CASE WHEN nxt IS NULL THEN 'NULL'
       |           WHEN nxt = 'purchase' THEN 'CONV' ELSE nxt END AS dst
       |    FROM steps WHERE event_type <> 'purchase'
       |    UNION ALL
       |    SELECT 'START', event_type FROM steps
       |    WHERE prev IS NULL AND event_type <> 'purchase')
       |  GROUP BY src, dst),
       |ch AS (
       |  SELECT c AS chn, ROW_NUMBER() OVER (ORDER BY c) AS i FROM (
       |    SELECT DISTINCT c FROM (
       |      SELECT src AS c FROM trans UNION SELECT dst AS c FROM trans)
       |    WHERE c NOT IN ('START','CONV','NULL'))),
       |tot AS (SELECT src, CAST(SUM(n) AS DOUBLE) AS tt FROM trans GROUP BY src),
       |p AS (SELECT t.src, t.dst, t.n / tot.tt AS pp FROM trans t JOIN tot USING (src)),
       |vars AS (SELECT 0 AS rem UNION ALL SELECT i FROM ch),
       |cells AS (
       |  SELECT v.rem, a.i AS i, b.i AS j,
       |    CASE WHEN b.i = v.rem THEN 0.0 ELSE COALESCE(pp.pp, 0.0) END AS pij
       |  FROM vars v CROSS JOIN ch a CROSS JOIN ch b
       |  LEFT JOIN p pp ON pp.src = a.chn AND pp.dst = b.chn),
       |rows_ AS (SELECT rem, i, list(pij ORDER BY j) AS prow FROM cells GROUP BY rem, i),
       |conv AS (
       |  SELECT c.i, COALESCE(pp.pp, 0.0) AS pc
       |  FROM ch c LEFT JOIN p pp ON pp.src = c.chn AND pp.dst = 'CONV'),
       |pconv1 AS (SELECT list(pc ORDER BY i) AS pconv FROM conv),
       |mats AS (
       |  SELECT r.rem, (SELECT pconv FROM pconv1) AS pconv,
       |    list(prow ORDER BY i) AS pmat
       |  FROM rows_ r GROUP BY r.rem),
       |it AS (
       |  SELECT rem, 0 AS k, list_transform(pconv, x -> CAST(0.0 AS DOUBLE)) AS v, pconv, pmat
       |  FROM mats
       |  UNION ALL
       |  SELECT rem, k + 1,
       |    list_transform(range(1, len(v) + 1), i ->
       |      pconv[i] + list_reduce(
       |        list_transform(range(1, len(v) + 1), j -> pmat[i][j] * v[j]),
       |        (a, b) -> a + b)),
       |    pconv, pmat
       |  FROM it WHERE k < 200),
       |fin AS (SELECT rem, v FROM it WHERE k = 200),
       |scells AS (
       |  SELECT v.rem, c.i AS j,
       |    CASE WHEN c.i = v.rem THEN 0.0 ELSE COALESCE(pp.pp, 0.0) END AS sj
       |  FROM vars v CROSS JOIN ch c
       |  LEFT JOIN p pp ON pp.src = 'START' AND pp.dst = c.chn),
       |sconv1 AS (
       |  SELECT COALESCE(MAX(pp), 0.0) AS sconv FROM p
       |  WHERE src = 'START' AND dst = 'CONV'),
       |sstart AS (
       |  SELECT rem, list(sj ORDER BY j) AS svec,
       |    (SELECT sconv FROM sconv1) AS sconv
       |  FROM scells GROUP BY rem),
       |res AS (
       |  SELECT f.rem,
       |    s.sconv + list_reduce(
       |      list_transform(range(1, len(f.v) + 1), j -> s.svec[j] * f.v[j]),
       |      (a, b) -> a + b) AS pstart
       |  FROM fin f JOIN sstart s ON s.rem = f.rem),
       |eff AS (
       |  SELECT c.chn AS channel, c.i,
       |    CASE WHEN (SELECT pstart FROM res WHERE rem = 0) = 0.0 THEN 0.0
       |      ELSE ((SELECT pstart FROM res WHERE rem = 0) - r.pstart)
       |        / (SELECT pstart FROM res WHERE rem = 0) END AS e
       |  FROM ch c JOIN res r ON r.rem = c.i),
       |tote AS (SELECT list_reduce(list(e ORDER BY i), (a, b) -> a + b) AS te FROM eff)
       |SELECT channel,
       |  ROUND(e, 6) AS removal_effect,
       |  CASE WHEN (SELECT te FROM tote) = 0.0 THEN 0.0
       |    ELSE ROUND(e / (SELECT te FROM tote), 6) END AS attribution
       |FROM eff ORDER BY channel""".stripMargin
}
