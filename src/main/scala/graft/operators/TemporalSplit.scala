package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Temporal train/validation/test split with embargo — the
  * time-series counterpart of the hash/cluster splits
  * ([[Sampling.clusterSplit]]): rows are assigned by EVENT TIME
  * (train < t1, val ∈ [t1, t2), test ≥ t2), and rows inside an
  * `embargo` window BEFORE each boundary are DROPPED so
  * lookback-feature leakage cannot straddle the cut (the purge
  * discipline of de Prado, "Advances in Financial Machine Learning"
  * ch. 7, applied to any event corpus: a training row whose feature
  * window reaches into validation time is leakage even though the
  * row itself is earlier).
  *
  * Scale shape: one map-only pass — the split is a per-row
  * CASE over the time column, no shuffle at all until the caller
  * aggregates; the audit is one grouped count. Deterministic and
  * fully SQL-expressible. */
object TemporalSplit {

  /** Adds `split` ∈ {train, val, test, embargo}: embargo marks rows
    * within `embargoSeconds` BEFORE t1 or t2 (they belong to no
    * split and must be excluded from training artifacts). */
  def assign(events: DataFrame, t1: String, t2: String,
      embargoSeconds: Long, tsCol: String = "ts"): DataFrame = {
    val es = col(tsCol).cast("long")
    val b1 = unix_timestamp(lit(t1))
    val b2 = unix_timestamp(lit(t2))
    events.withColumn("split",
      when(es >= b1 - embargoSeconds && es < b1, "embargo")
        .when(es >= b2 - embargoSeconds && es < b2, "embargo")
        .when(es < b1, "train")
        .when(es < b2, "val")
        .otherwise("test"))
  }

  /** Split audit: per split — row count, min/max event seconds, and
    * the leakage check (`gap_ok`): every non-embargo split's max
    * time stays at least `embargoSeconds` away from the NEXT
    * boundary. */
  def audit(events: DataFrame, t1: String, t2: String,
      embargoSeconds: Long, tsCol: String = "ts"): DataFrame = {
    val assigned = assign(events, t1, t2, embargoSeconds, tsCol)
    val b1 = unix_timestamp(lit(t1))
    val b2 = unix_timestamp(lit(t2))
    assigned
      .groupBy("split")
      .agg(count(lit(1)).as("n_rows"),
        min(col(tsCol).cast("long")).as("min_es"),
        max(col(tsCol).cast("long")).as("max_es"))
      .withColumn("gap_ok",
        when(col("split") === "train",
          col("max_es") < b1 - embargoSeconds)
          .when(col("split") === "val",
            col("max_es") < b2 - embargoSeconds)
          .otherwise(lit(true)))
      .orderBy("split")
  }

  /** DuckDB oracle for [[audit]] over events. */
  def auditOracleSql(t1: String, t2: String,
      embargoSeconds: Long): String =
    s"""WITH a AS (
       |  SELECT CASE
       |    WHEN es >= b1 - $embargoSeconds AND es < b1 THEN 'embargo'
       |    WHEN es >= b2 - $embargoSeconds AND es < b2 THEN 'embargo'
       |    WHEN es < b1 THEN 'train'
       |    WHEN es < b2 THEN 'val'
       |    ELSE 'test' END AS split, es, b1, b2
       |  FROM (SELECT
       |    date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) AS es,
       |    date_diff('second', TIMESTAMP '1970-01-01 00:00:00',
       |      TIMESTAMP '$t1') AS b1,
       |    date_diff('second', TIMESTAMP '1970-01-01 00:00:00',
       |      TIMESTAMP '$t2') AS b2
       |  FROM events))
       |SELECT split, CAST(COUNT(*) AS BIGINT) AS n_rows,
       |  CAST(MIN(es) AS BIGINT) AS min_es,
       |  CAST(MAX(es) AS BIGINT) AS max_es,
       |  CASE WHEN split = 'train' THEN MAX(es) < MAX(b1) - $embargoSeconds
       |    WHEN split = 'val' THEN MAX(es) < MAX(b2) - $embargoSeconds
       |    ELSE TRUE END AS gap_ok
       |FROM a GROUP BY split ORDER BY split""".stripMargin
}
