package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Native per-row centroid assignment: given an `array<float>` vector
  * and a fixed centroid codebook, return the indices of the `nprobe`
  * nearest centroids (squared-L2, ties to the lower index).
  *
  * This is the IVF coarse-quantization step (Jégou/Douze/Schmid, TPAMI
  * 2011) expressed as a scalar expression instead of a join: the
  * codebook rides along as a plan reference object (serialized once per
  * executor with the plan, exactly like a broadcast of k·dim floats),
  * and each row computes its own argmin inside whole-stage codegen.
  * Compared to the crossJoin+window formulation this removes BOTH the
  * N×k scored-row blow-up and the full shuffle the window argmin needs —
  * assignment becomes a map-only pass, which is what survives 100 TB.
  *
  * `nprobe = 1` is plain argmin (cluster assignment); queries use
  * `nprobe > 1` to probe several inverted lists.
  */
case class NearestCentroids(child: Expression, centroids: Array[Float],
    dim: Int, nprobe: Int) extends UnaryExpression {

  require(dim > 0 && centroids.length % dim == 0,
    s"centroid codebook length ${centroids.length} not a multiple of dim $dim")
  require(nprobe >= 1, "nprobe must be >= 1")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nearest_centroids"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_centroids expects array<float>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val out = NearestCentroids.compute(
      input.asInstanceOf[ArrayData], centroids, dim, nprobe)
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("centroids", centroids, "float[]")
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      s"""
         |int[] $out = graft.functions.NearestCentroids.compute(
         |  $a, $cents, $dim, $nprobe);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCentroids {

  /** Top-`nprobe` centroid indices by squared L2, ascending distance;
    * strict-less insertion keeps ties on the lower (earlier) index, so
    * the result is deterministic for any input. Shared by the
    * interpreted and codegen paths.
    *
    * NaN vectors (every distance comparison false) would otherwise
    * leave -1 sentinels that explode into duplicate probe rows
    * downstream; they are instead assigned deterministically to the
    * first `nprobe` distinct cells — a NaN embedding lands somewhere
    * harmless rather than corrupting join cardinality. */
  def compute(vec: ArrayData, cents: Array[Float], dim: Int, nprobe: Int): Array[Int] = {
    val k = cents.length / dim
    val m = math.min(nprobe, k)
    val bestD = Array.fill(m)(Double.MaxValue)
    val bestI = Array.fill(m)(-1)
    val n = math.min(dim, vec.numElements())
    var c = 0
    while (c < k) {
      val off = c * dim
      var d = 0.0d
      var j = 0
      while (j < n) {
        val t = vec.getFloat(j).toDouble - cents(off + j).toDouble
        d += t * t
        j += 1
      }
      if (d < bestD(m - 1)) {
        var p = m - 1
        while (p > 0 && d < bestD(p - 1)) {
          bestD(p) = bestD(p - 1); bestI(p) = bestI(p - 1); p -= 1
        }
        bestD(p) = d; bestI(p) = c
      }
      c += 1
    }
    // NaN input ⇒ no comparison ever succeeded ⇒ all sentinels; fill
    // with the first m distinct cells (deterministic, no duplicates)
    var p = 0
    while (p < m) { if (bestI(p) == -1) bestI(p) = p % k; p += 1 }
    bestI
  }

  /** Column of the `nprobe` nearest centroid indices for `vec`. */
  def nearestCentroids(vec: Column, centroids: Array[Array[Float]], nprobe: Int): Column = {
    require(centroids.nonEmpty, "empty centroid codebook")
    val dim = centroids(0).length
    require(centroids.forall(_.length == dim), "ragged centroid codebook")
    val flat = new Array[Float](centroids.length * dim)
    var i = 0
    while (i < centroids.length) {
      System.arraycopy(centroids(i), 0, flat, i * dim, dim)
      i += 1
    }
    ColumnBridge.column(
      NearestCentroids(ColumnBridge.expression(vec), flat, dim, nprobe))
  }
}
