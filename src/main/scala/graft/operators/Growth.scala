package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Growth accounting and retention-decay fitting — the two standard
  * readings of a user-activity log's health (the "growth accounting
  * identity" popularized by Social Capital's startup diligence): DAU
  * moves only through four doors — new, retained, resurrected,
  * churned — and DAU_t = new_t + retained_t + resurrected_t,
  * DAU_t − DAU_{t−1} = new_t + resurrected_t − churned_t. A DAU chart
  * says "flat"; the decomposition says "acquiring AND churning fast",
  * which is an entirely different diagnosis.
  *
  * Scale shape: one distinct to the (user, day) presence table, one
  * per-user first-seen agg joined back, one self-equi-join on
  * (user, day−1) — all user-day-cardinality; the report is
  * calendar-sized. */
object Growth {

  /** `(d, dau, new_users, retained, resurrected, churned, net)` per
    * CALENDAR day of the observed span (zero-filled spine, the
    * fanoFactor recipe). `churned` counts users active on d−1 but not
    * d (attributed to d); `net` = new + resurrected − churned, which
    * telescopes to the DAU delta between consecutive days — including
    * across fully-inactive days, where the zero-filled row carries
    * `churned = prev_dau`, `net = −prev_dau` (without the spine those
    * users were never counted as churned anywhere: the gap day had no
    * row, and the next active day's d−1 lookup missed). */
  def accounting(events: DataFrame): DataFrame = {
    val ud = events
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
    val firstSeen = ud.groupBy("user_id").agg(min("d").as("__f"))
    // user-cardinality frames: no broadcast hint — co-partitioned
    // shuffle joins are the 100 TB shape here
    val wu = ud.join(firstSeen, "user_id")
    val prev = ud.select(col("user_id"),
      date_add(col("d"), 1).as("d"), lit(1).as("__was"))
    val flagged = wu.join(prev, Seq("user_id", "d"), "left_outer")
      .select(col("user_id"), col("d"),
        (col("__f") === col("d")).as("__new"),
        (col("__was").isNotNull && col("__f") =!= col("d")).as("__ret"),
        (col("__was").isNull && col("__f") < col("d")).as("__res"))
    val activeRaw = flagged.groupBy("d").agg(
      count(lit(1)).as("dau"),
      sum(when(col("__new"), 1L).otherwise(0L)).as("new_users"),
      sum(when(col("__ret"), 1L).otherwise(0L)).as("retained"),
      sum(when(col("__res"), 1L).otherwise(0L)).as("resurrected"))
    // zero-filled calendar spine: a day with no activity still gets a
    // row, so the d−1 churn lookup below never skips over a gap
    val spine = ud.agg(min("d").as("__lo"), max("d").as("__hi"))
      .select(explode(expr("sequence(__lo, __hi, interval 1 day)"))
        .as("d"))
    val active = spine.join(activeRaw, Seq("d"), "left_outer")
      .na.fill(0L, Seq("dau", "new_users", "retained", "resurrected"))
    // churned into day d = active on d−1 minus those retained on d
    val prevDau = active.select(date_add(col("d"), 1).as("d"),
      col("dau").as("__prev_dau"))
    active.join(broadcast(prevDau), Seq("d"), "left_outer")
      .select(col("d"), col("dau"), col("new_users"), col("retained"),
        col("resurrected"),
        (coalesce(col("__prev_dau"), lit(0L)) - col("retained"))
          .as("churned"),
        (col("new_users") + col("resurrected") -
          (coalesce(col("__prev_dau"), lit(0L)) - col("retained")))
          .as("net"))
      .orderBy("d")
  }

  /** DuckDB oracle for [[accounting]] on events. */
  val accountingOracleSql: String =
    """WITH ud AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
      |fs AS (SELECT user_id, MIN(d) AS f FROM ud GROUP BY 1),
      |fl AS (
      |  SELECT ud.user_id, ud.d,
      |    fs.f = ud.d AS is_new,
      |    p.user_id IS NOT NULL AND fs.f <> ud.d AS is_ret,
      |    p.user_id IS NULL AND fs.f < ud.d AS is_res
      |  FROM ud
      |  JOIN fs ON ud.user_id = fs.user_id
      |  LEFT JOIN ud p ON p.user_id = ud.user_id
      |    AND p.d = ud.d - INTERVAL 1 DAY),
      |act0 AS (
      |  SELECT d, COUNT(*) AS dau,
      |    SUM(CASE WHEN is_new THEN 1 ELSE 0 END) AS new_users,
      |    SUM(CASE WHEN is_ret THEN 1 ELSE 0 END) AS retained,
      |    SUM(CASE WHEN is_res THEN 1 ELSE 0 END) AS resurrected
      |  FROM fl GROUP BY 1),
      |spine AS (
      |  SELECT CAST(UNNEST(generate_series(
      |    (SELECT MIN(d) FROM ud), (SELECT MAX(d) FROM ud),
      |    INTERVAL 1 DAY)) AS DATE) AS d),
      |act AS (
      |  SELECT s.d, COALESCE(a.dau, 0) AS dau,
      |    COALESCE(a.new_users, 0) AS new_users,
      |    COALESCE(a.retained, 0) AS retained,
      |    COALESCE(a.resurrected, 0) AS resurrected
      |  FROM spine s LEFT JOIN act0 a ON a.d = s.d)
      |SELECT a.d, CAST(a.dau AS BIGINT) AS dau,
      |  CAST(a.new_users AS BIGINT) AS new_users,
      |  CAST(a.retained AS BIGINT) AS retained,
      |  CAST(a.resurrected AS BIGINT) AS resurrected,
      |  CAST(COALESCE(p.dau, 0) - a.retained AS BIGINT) AS churned,
      |  CAST(a.new_users + a.resurrected -
      |    (COALESCE(p.dau, 0) - a.retained) AS BIGINT) AS net
      |FROM act a
      |LEFT JOIN act p ON p.d = a.d - INTERVAL 1 DAY
      |ORDER BY a.d""".stripMargin

  /** Exponential retention-decay fit: aggregate day-offset retention
    * r_k = P(active at first-seen + k) across the corpus, then the
    * log-linear least-squares fit ln r_k = a + b·k over k ≥ 1 with
    * r_k > 0 — slope b < 0 is the decay rate, half-life = −ln2/b the
    * one-number retention summary a mixing/cohort plan consumes.
    * Offsets beyond each user's observable window are excluded from
    * the denominator (right-truncation, the q247 censoring lesson).
    *
    * One presence table, offset-cardinality arithmetic after. */
  def retentionDecay(events: DataFrame): DataFrame = {
    val ud = events
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
    val span = ud.agg(max("d").as("__mx"))
    val base = ud.groupBy("user_id").agg(min("d").as("__f"))
      .crossJoin(broadcast(span))   // 1-row stat factor
      .select(col("user_id"), col("__f"),
        datediff(col("__mx"), col("__f")).as("__window"))
    val offsets = ud.join(base.select("user_id", "__f"), "user_id")
      .select(col("user_id"), datediff(col("d"), col("__f")).as("k"))
    val atK = offsets.groupBy("k").agg(count(lit(1)).as("__active"))
    // denominator at k: users whose window covers offset k — from the
    // WINDOW-LENGTH frequency table (calendar-sized), so the
    // inequality join is calendar² bounded, never user-cardinality
    val wf = base.groupBy(col("__window")).agg(count(lit(1)).as("__c"))
    val denom = atK.select(col("k"))
      .join(broadcast(wf), col("__window") >= col("k"))
      .groupBy("k").agg(sum("__c").as("__covered"))
    val rk = atK.join(denom, "k")
      .select(col("k").cast("double").as("k"),
        (col("__active").cast("double") / col("__covered")).as("__r"))
      .where(col("k") >= 1.0 && col("__r") > 0.0)
    val fit = rk.agg(
      count(lit(1)).as("n_points"),
      (covar_pop(col("k"), log(col("__r"))) / var_pop(col("k")))
        .as("__b"),
      (avg(log(col("__r"))) -
        covar_pop(col("k"), log(col("__r"))) / var_pop(col("k")) *
          avg(col("k"))).as("__a"))
    fit.select(
      col("n_points"),
      round(exp(col("__a")), 6).as("r0_fit"),
      round(col("__b"), 6).as("decay_rate"),
      round(when(col("__b") < 0.0, -log(lit(2.0)) / col("__b"))
        .otherwise(lit(null).cast("double")), 6).as("half_life_days"))
  }

  /** Cumulative LTV curve by user-age offset: the average per-user
    * cumulative purchase revenue at age k, averaged over the users
    * whose observation window COVERS k (the same right-truncation
    * correction as [[retentionDecay]] — young users must not drag
    * down late offsets they haven't lived yet). The curve's flattening
    * point is where acquisition-payback math reads its number.
    *
    * Scale shape: a user-window explode to (user, k) — presence-table
    * scale, the corpus's own granularity — one cumulative sum per
    * user over offsets, then an offset-cardinality reduction. */
  def ltvCurve(events: DataFrame): DataFrame = {
    val ud = events.select(col("user_id"), to_date(col("ts")).as("d"),
      when(col("event_type") === "purchase", col("value"))
        .otherwise(lit(0.0)).as("rev"))
    val span = ud.agg(max("d").as("__mx"))
    val base = ud.groupBy("user_id").agg(min("d").as("__f"))
      .crossJoin(broadcast(span))   // 1-row stat factor
      .select(col("user_id"), col("__f"),
        datediff(col("__mx"), col("__f")).as("__window"))
    val perDay = ud.join(base.select("user_id", "__f"), "user_id")
      .groupBy(col("user_id"), datediff(col("d"), col("__f")).as("k"))
      .agg(sum("rev").as("__amt"))
    // dense per-user offset grid so the cumsum carries over quiet days
    val grid = base
      .select(col("user_id"),
        explode(expr("sequence(0, __window)")).as("k"))
      .join(perDay, Seq("user_id", "k"), "left_outer")
      .na.fill(0.0, Seq("__amt"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("k")
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    grid.withColumn("__cum", sum("__amt").over(wCum))
      .groupBy("k")
      .agg(count(lit(1)).as("n_users"),
        round(avg("__cum"), 6).as("avg_ltv"))
      .orderBy("k")
  }

  /** DuckDB oracle for [[ltvCurve]] on events. */
  val ltvOracleSql: String =
    """WITH ud AS (
      |  SELECT user_id, CAST(ts AS DATE) AS d,
      |    CASE WHEN event_type = 'purchase' THEN value
      |      ELSE 0 END AS rev
      |  FROM events),
      |mx AS (SELECT MAX(d) AS m FROM ud),
      |base AS (
      |  SELECT user_id, MIN(d) AS f,
      |    date_diff('day', MIN(d), (SELECT m FROM mx)) AS w
      |  FROM ud GROUP BY 1),
      |per AS (
      |  SELECT ud.user_id, date_diff('day', base.f, ud.d) AS k,
      |    SUM(rev) AS amt
      |  FROM ud JOIN base ON ud.user_id = base.user_id
      |  GROUP BY 1, 2),
      |grid AS (
      |  SELECT base.user_id, CAST(UNNEST(range(0, w + 1)) AS BIGINT)
      |    AS k
      |  FROM base),
      |cum AS (
      |  SELECT g.user_id, g.k,
      |    SUM(COALESCE(per.amt, 0)) OVER (PARTITION BY g.user_id
      |      ORDER BY g.k ROWS UNBOUNDED PRECEDING) AS c
      |  FROM grid g
      |  LEFT JOIN per ON per.user_id = g.user_id AND per.k = g.k)
      |SELECT CAST(k AS BIGINT) AS k,
      |  CAST(COUNT(*) AS BIGINT) AS n_users,
      |  ROUND(AVG(c), 6) AS avg_ltv
      |FROM cum GROUP BY 1 ORDER BY 1""".stripMargin

  /** DuckDB oracle for [[retentionDecay]] on events. */
  val retentionDecayOracleSql: String =
    """WITH ud AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
      |mx AS (SELECT MAX(d) AS m FROM ud),
      |base AS (
      |  SELECT user_id, MIN(d) AS f,
      |    date_diff('day', MIN(d), (SELECT m FROM mx)) AS w
      |  FROM ud GROUP BY 1),
      |offs AS (
      |  SELECT ud.user_id, date_diff('day', base.f, ud.d) AS k
      |  FROM ud JOIN base ON ud.user_id = base.user_id),
      |atk AS (SELECT k, COUNT(*) AS active FROM offs GROUP BY 1),
      |den AS (
      |  SELECT atk.k, COUNT(*) AS covered
      |  FROM atk JOIN base ON base.w >= atk.k
      |  GROUP BY 1),
      |rk AS (
      |  SELECT CAST(atk.k AS DOUBLE) AS k,
      |    CAST(active AS DOUBLE) / covered AS r
      |  FROM atk JOIN den ON atk.k = den.k
      |  WHERE atk.k >= 1 AND CAST(active AS DOUBLE) / covered > 0),
      |fit AS (
      |  SELECT COUNT(*) AS n_points,
      |    covar_pop(k, ln(r)) / var_pop(k) AS b,
      |    AVG(ln(r)) - covar_pop(k, ln(r)) / var_pop(k) * AVG(k) AS a
      |  FROM rk)
      |SELECT CAST(n_points AS BIGINT) AS n_points,
      |  ROUND(exp(a), 6) AS r0_fit,
      |  ROUND(b, 6) AS decay_rate,
      |  ROUND(CASE WHEN b < 0 THEN -ln(2.0) / b ELSE NULL END, 6)
      |    AS half_life_days
      |FROM fit""".stripMargin
}
