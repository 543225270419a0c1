package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns using Spark's
  * higher-order functions (`zip_with` + `aggregate`), which codegen to
  * tight loops — no UDF serialization, no Python boundary. Elements are
  * cast to double BEFORE multiply/accumulate so results match a
  * double-precision oracle (float multiply-then-widen drifts).
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ in double precision — the native codegen'd expression
    * (see [[FloatVectorDot]]); same left-to-right accumulation as the
    * HOF form, so results are bit-identical. */
  def dot(a: Column, b: Column): Column = VectorExpressions.vecDot(a, b)

  /** Higher-order-function formulation of the same dot product; kept
    * for non-float element types and as the differential-test oracle
    * for the native expression. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d),
      (acc, v) => acc + v)

  /** ‖a‖₂ */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity, null-safe for zero vectors. */
  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0.0d, lit(0.0d)).otherwise(dot(a, b) / d)
  }

  /** Squared Euclidean distance (cheaper than sqrt for argmin). */
  def sqDist(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val diff = x.cast("double") - y.cast("double")
        diff * diff
      }),
      lit(0.0d),
      (acc, v) => acc + v)
}
