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
      (c, math.rint(e * 1e6) / 1e6,
        if (totalEffect == 0.0) 0.0
        else math.rint(e / totalEffect * 1e6) / 1e6)
    }.toDF("channel", "removal_effect", "attribution")
      .orderBy("channel")
  }
}
