package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pointwise mutual information between event types co-occurring in
  * the same user-day — the classic association measure (Church &
  * Hanks, CL 1990) over behavioral "documents": which event types
  * travel together beyond what their individual frequencies predict.
  * Complements [[graft.quality.Dependencies.mutualInformation]] (one
  * expected-bits number per column PAIR) with a per-VALUE-pair
  * association table, and the Markov transition report (q107) — PMI is
  * order-free co-presence, transitions are ordered adjacency.
  *
  * Scale shape: one distinct to the (user, day, type) presence table,
  * a self-equi-join on (user, day) whose per-key fan-out is bounded by
  * the event-type VOCABULARY (not corpus size), and type-cardinality
  * stat tables joined back broadcast. The grand user-day count is a
  * 1-row stat factor. No window functions, no driver loops. */
object Cooccurrence {

  /** PMI report `(et_a, et_b, n_ab, pmi_bits, npmi)` over unordered
    * type pairs (et_a < et_b) sharing a user-day. NPMI (Bouma 2009)
    * normalizes to [−1, 1]; the always-co-occurring edge case (p_ab =
    * 1) is pinned to 1 explicitly in engine and oracle. */
  def sessionPmi(events: DataFrame): DataFrame = {
    val ud = events
      .select(col("user_id"), to_date(col("ts")).as("d"),
        col("event_type"))
      .distinct()
    val tot = ud.select("user_id", "d").distinct()
      .agg(count(lit(1)).as("__n"))
    val single = ud.groupBy("event_type").agg(count(lit(1)).as("n_t"))
    val pairs = ud.select(col("user_id"), col("d"),
        col("event_type").as("et_a"))
      .join(ud.select(col("user_id"), col("d"),
        col("event_type").as("et_b")), Seq("user_id", "d"))
      .where(col("et_a") < col("et_b"))
      .groupBy("et_a", "et_b").agg(count(lit(1)).as("n_ab"))
    val pmi = log2(col("n_ab").cast("double") * col("__n") /
      (col("n_a") * col("n_b")))
    pairs
      .join(broadcast(single.select(col("event_type").as("et_a"),
        col("n_t").cast("double").as("n_a"))), "et_a")
      .join(broadcast(single.select(col("event_type").as("et_b"),
        col("n_t").cast("double").as("n_b"))), "et_b")
      .crossJoin(broadcast(tot))   // 1-row stat factor
      .select(col("et_a"), col("et_b"), col("n_ab"),
        round(pmi, 6).as("pmi_bits"),
        round(when(col("n_ab") === col("__n"), lit(1.0))
          .otherwise(pmi /
            log2(col("__n").cast("double") / col("n_ab"))), 6)
          .as("npmi"))
      .orderBy("et_a", "et_b")
  }

  /** DuckDB oracle for [[sessionPmi]] on the events table. */
  val sessionPmiOracleSql: String =
    """WITH ud AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d, event_type
      |  FROM events),
      |tot AS (
      |  SELECT COUNT(*) AS n FROM (SELECT DISTINCT user_id, d FROM ud)),
      |s AS (SELECT event_type, COUNT(*) AS n_t FROM ud GROUP BY 1),
      |p AS (
      |  SELECT a.event_type AS et_a, b.event_type AS et_b,
      |    COUNT(*) AS n_ab
      |  FROM ud a JOIN ud b ON a.user_id = b.user_id AND a.d = b.d
      |    AND a.event_type < b.event_type
      |  GROUP BY 1, 2)
      |SELECT et_a, et_b, CAST(n_ab AS BIGINT) AS n_ab,
      |  ROUND(log2(CAST(n_ab AS DOUBLE) * (SELECT n FROM tot) /
      |    (sa.n_t * sb.n_t)), 6) AS pmi_bits,
      |  ROUND(CASE WHEN n_ab = (SELECT n FROM tot) THEN 1.0
      |    ELSE log2(CAST(n_ab AS DOUBLE) * (SELECT n FROM tot) /
      |        (sa.n_t * sb.n_t)) /
      |      log2(CAST((SELECT n FROM tot) AS DOUBLE) / n_ab) END, 6)
      |    AS npmi
      |FROM p
      |JOIN s sa ON p.et_a = sa.event_type
      |JOIN s sb ON p.et_b = sb.event_type
      |ORDER BY et_a, et_b""".stripMargin
}
