package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Canonical, hash-stable emitter for oracled floating-point outputs.
  *
  * The correctness gate compares this engine's parquet output against
  * a DuckDB replay of the same query BIT-EXACTLY (per-value hash).
  * `round(x, 6)` is NOT bit-stable across the two engines: Spark
  * rounds through `BigDecimal` with HALF_UP on the exact binary value
  * while DuckDB's `ROUND` takes a float multiply-round-divide path, so
  * the same exact double can land one ulp apart — invisible at
  * atol 1e-9, fatal to the hash. Fifteen ratio-statistic queries went
  * hash-red in round 11 from exactly this.
  *
  * The class-wide fix: oracled ratio statistics are emitted as
  * MICRO-UNIT BIGINTS — `cast(round(x * 1e6) as bigint)` — on BOTH the
  * Spark and the oracle side. Integers hash identically everywhere.
  * Bit-stability argument: the operators first snap the statistic to 6
  * decimals (`round(x, 6)`), so by the time [[micros]] sees it the
  * value is within one ulp of an exact integer count of micro-units —
  * never near a .5 rounding boundary — and both engines' final
  * round-to-integer agree for ANY input in that regime. Even for
  * un-pre-rounded inputs the two engines agree unless `x * 1e6` lands
  * within ~1e-9 of a half-integer, which pre-rounding rules out.
  *
  * Used at the query-contract layer ([[graft.SparkEntry]]): operators
  * keep their natural double-typed API (specs assert on real ratios);
  * the registered query and its oracle SQL both pass through the same
  * canonicalization.
  */
object Canon {

  /** Scala-side mirror of DuckDB's double `ROUND(x, 6)` — the
    * OPERATIONAL semantics (round the double product `x * 1e6`, ties
    * away from zero, divide back), not decimal-exact HALF_UP. The
    * distinction bites when a statistic is a product of 1e-6-grid
    * values (λ·(C·1e-6) lands within half an ulp of .5 micros for
    * every C ending in 5): there the exact-decimal comparison and the
    * double-product comparison disagree, so an engine that rounds the
    * same double differently than the oracle will flips micros.
    * Driver-side snapping for operators whose outputs replay in
    * DuckDB (MMR scores, Markov removal effects). */
  def snap6(x: Double): Double = {
    val m = x * 1e6
    val f = math.floor(m)
    val d = m - f
    (if (d > 0.5 || (d == 0.5 && m >= 0)) f + 1 else f) / 1e6
  }

  /** Micro-unit bigint of a double column: `cast(round(c * 1e6) as
    * bigint)`. Spark's scale-0 `round` is HALF_UP (ties away from
    * zero), matching DuckDB's `ROUND` (`std::round`, ties away from
    * zero), so the two engines agree bit-exactly on identical input
    * doubles away from half-integer boundaries. */
  def micros(c: Column): Column = round(c * lit(1e6)).cast("long")

  /** Replace double columns with their micro-unit bigints, renamed
    * `<name>_micros`; all other columns and the column ORDER are
    * preserved. With no explicit `cols`, every DoubleType column is
    * converted (the common case: a stat report whose doubles are all
    * oracled ratios). */
  def microsify(df: DataFrame, cols: String*): DataFrame = {
    val target: Set[String] =
      if (cols.nonEmpty) cols.toSet
      else df.schema.fields.collect {
        case f if f.dataType == DoubleType => f.name
      }.toSet
    df.select(df.columns.map { c =>
      if (target(c)) micros(col(c)).as(c + "_micros") else col(c)
    }.toIndexedSeq: _*)
  }

  /** Oracle-side mirror of [[microsify]]: wrap `sql` in a projection
    * emitting `cols` in order. Markers:
    *
    *  - trailing `*`: a double to canonicalize — emitted as
    *    `CAST(ROUND((col) * 1e6) AS BIGINT) AS col_micros`;
    *  - trailing `#`: an integer count — emitted as
    *    `CAST(col AS BIGINT)`, keeping the name. This one matters as
    *    much as `*`: DuckDB's `SUM` over integers returns HUGEINT,
    *    which pandas widens to float64, so an oracle `SUM(CASE WHEN …
    *    THEN 1 …)` hashes as `1.0` against the engine's int64 `1` —
    *    rows/schema/atol all pass, the driver's bit-exact hash fails.
    *    (This, plus DuckDB ROUND emitting `-0.0` where Spark's
    *    BigDecimal round gives `+0.0`, was the whole round-11
    *    hash-red class.)
    *
    * The marker list must match the Spark side's output schema
    * exactly: `*` on every DoubleType column, `#` on every LongType
    * column (a no-op cast when already BIGINT), nothing on strings,
    * booleans, and dates. */
  def microsifySql(sql: String, cols: Seq[String]): String = {
    val proj = cols.map { c =>
      if (c.endsWith("*")) {
        val n = c.dropRight(1)
        s"""CAST(ROUND(("$n") * 1e6) AS BIGINT) AS "${n}_micros""""
      } else if (c.endsWith("#")) {
        val n = c.dropRight(1)
        s"""CAST("$n" AS BIGINT) AS "$n""""
      } else s""""$c""""
    }.mkString(", ")
    s"SELECT $proj FROM (\n$sql\n) __canon"
  }
}
