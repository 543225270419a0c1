package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Structured→text rendering: serialize each user's event history
  * into one training document — the conversion step that turns a
  * behavioral event table into LLM training text (the "linearize
  * structured records into documents" recipe behind behavioral/
  * tabular pretraining corpora). Deterministic layout: one
  * `micros|type|cents` line per event, event-time + id ordered,
  * newline-joined; all numeric fields render as integers so the
  * bytes are engine-independent (double/timestamp formatting is
  * not) and the whole doc can be oracle-compared by md5.
  *
  * Scale shape: one shuffle on the user key; the per-user window
  * caps history at `maxLines` BEFORE the collect (the context-budget
  * guard — a power user's multi-million-event history must truncate,
  * not OOM the aggregation buffer). Pair with [[Chunking]] for token
  * budgets after rendering. */
object HistoryDocs {

  /** `(user_id, n_events, n_chars, doc_md5)` per user, ordered. */
  def render(events: DataFrame, maxLines: Int = 100000): DataFrame = {
    val us = unix_micros(col("ts"))
    val cents = round(col("value") * 100).cast("bigint")
    val line = concat_ws("|", us, col("event_type"), cents)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("ts"), col("event_id"),
        struct(us.as("us"), col("event_id").as("eid"), line.as("line"))
          .as("s"))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= maxLines)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        array_join(
          transform(array_sort(collect_list(col("s"))), x => x("line")),
          "\n").as("__doc"))
      .select(col("user_id"), col("n_events"),
        length(col("__doc")).cast("bigint").as("n_chars"),
        md5(col("__doc")).as("doc_md5"))
      .orderBy("user_id")
  }

  /** DuckDB oracle for [[render]]. */
  def oracleSql(maxLines: Int = 100000): String =
    s"""WITH l AS (
       |  SELECT user_id, epoch_us(ts) AS us, event_id,
       |    CONCAT(epoch_us(ts), '|', event_type, '|',
       |      CAST(ROUND(value * 100) AS BIGINT)) AS line
       |  FROM events
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
       |    ORDER BY ts, event_id) <= $maxLines)
       |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       |  CAST(LENGTH(string_agg(line, chr(10)
       |    ORDER BY us, event_id)) AS BIGINT) AS n_chars,
       |  md5(string_agg(line, chr(10) ORDER BY us, event_id)) AS doc_md5
       |FROM l GROUP BY user_id ORDER BY user_id""".stripMargin
}
