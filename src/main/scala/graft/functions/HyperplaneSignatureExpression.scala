package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Random-hyperplane (cosine) LSH signature — Charikar, "Similarity
  * estimation techniques from rounding algorithms", STOC 2002: bit r of
  * the 64-bit signature is `sign(v · h_r)` for a fixed family of
  * `numBits ≤ 64` seeded Gaussian hyperplanes. Two vectors at angle θ
  * agree on each bit with probability `1 − θ/π`, so cosine-near vectors
  * get Hamming-near signatures — the embedding-space analogue of
  * [[graft.operators.Dedup.simHash]]'s text fingerprint, bucketable by
  * the same 16-bit-chunk pigeonhole.
  *
  * Same scale shape as [[NearestCentroids]]: the hyperplane matrix is a
  * plan reference object (numBits·dim floats serialized once per
  * executor), each row computes its own signature inside whole-stage
  * codegen — map-only, no join, no shuffle, any corpus size.
  */
case class HyperplaneSignature(child: Expression, planes: Array[Float],
    dim: Int) extends UnaryExpression {

  require(dim > 0 && planes.length % dim == 0,
    s"plane matrix length ${planes.length} not a multiple of dim $dim")
  require(planes.length / dim <= 64, "at most 64 hyperplanes (one long)")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hyperplane_signature"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hyperplane_signature expects array<float>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    HyperplaneSignature.compute(input.asInstanceOf[ArrayData], planes, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pl = ctx.addReferenceObj("hyperplanes", planes, "float[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.HyperplaneSignature.compute($a, $pl, $dim);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneSignature {

  /** Bit r set iff `v · h_r >= 0` (boundary to 1 keeps determinism).
    * Shared by the interpreted and codegen paths. */
  def compute(vec: ArrayData, planes: Array[Float], dim: Int): Long = {
    val bits = planes.length / dim
    val n = math.min(dim, vec.numElements())
    var sig = 0L
    var r = 0
    while (r < bits) {
      val off = r * dim
      var d = 0.0d
      var j = 0
      while (j < n) { d += vec.getFloat(j).toDouble * planes(off + j); j += 1 }
      if (d >= 0) sig |= (1L << r)
      r += 1
    }
    sig
  }

  /** Deterministic Gaussian hyperplane family: `numBits × dim`, seeded —
    * every executor and every run sees the same planes. */
  def makePlanes(numBits: Int, dim: Int, seed: Long): Array[Float] = {
    require(numBits >= 1 && numBits <= 64, "numBits in [1, 64]")
    val rnd = new java.util.Random(seed)
    Array.fill(numBits * dim)(rnd.nextGaussian().toFloat)
  }

  def hyperplaneSignature(vec: Column, numBits: Int, dim: Int, seed: Long): Column =
    ColumnBridge.column(HyperplaneSignature(
      ColumnBridge.expression(vec), makePlanes(numBits, dim, seed), dim))
}
