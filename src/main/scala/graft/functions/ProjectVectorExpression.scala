package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType}

/** Native dense matrix-vector projection: `array<float>` (dim d) ×
  * fixed k×d matrix → `array<float>` (dim k), scaled by 1/√k.
  *
  * The matrix rides as a plan reference object (the
  * [[NearestCentroids]] pattern — serialized once per executor), and
  * each row projects inside whole-stage codegen: a map-only pass with
  * zero shuffle, which is what makes Johnson–Lindenstrauss reduction
  * free to bolt in front of any of the ANN tiers at 100 TB. The 1/√k
  * scale is the JL normalization for ±1 (Rademacher) matrices
  * (Achlioptas, JCSS 2003, "Database-friendly random projections"),
  * making projected inner products unbiased estimates of the
  * originals. */
case class ProjectVector(child: Expression, matrix: Array[Float], dim: Int)
    extends UnaryExpression {

  require(dim > 0 && matrix.length % dim == 0,
    s"projection matrix length ${matrix.length} not a multiple of dim $dim")

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "project_vector"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"project_vector expects array<float>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val out = ProjectVector.compute(
      input.asInstanceOf[ArrayData], matrix, dim)
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("matrix", matrix, "float[]")
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      s"""
         |float[] $out = graft.functions.ProjectVector.compute(
         |  $a, $m, $dim);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ProjectVector {

  /** y[r] = (Σ_j M[r][j]·v[j]) / √k for each of the k matrix rows.
    * Shared by the interpreted and codegen paths. */
  def compute(vec: ArrayData, matrix: Array[Float], dim: Int): Array[Float] = {
    val k = matrix.length / dim
    val out = new Array[Float](k)
    val n = math.min(dim, vec.numElements())
    val scale = 1.0 / math.sqrt(k.toDouble)
    var r = 0
    while (r < k) {
      val off = r * dim
      var acc = 0.0d
      var j = 0
      while (j < n) {
        acc += vec.getFloat(j).toDouble * matrix(off + j).toDouble
        j += 1
      }
      out(r) = (acc * scale).toFloat
      r += 1
    }
    out
  }

  /** Column projecting `vec` through `rows` (k rows × dim floats). */
  def projectVector(vec: Column, rows: Array[Array[Float]]): Column = {
    require(rows.nonEmpty, "empty projection matrix")
    val dim = rows(0).length
    require(rows.forall(_.length == dim), "ragged projection matrix")
    val flat = new Array[Float](rows.length * dim)
    var i = 0
    while (i < rows.length) {
      System.arraycopy(rows(i), 0, flat, i * dim, dim)
      i += 1
    }
    ColumnBridge.column(
      ProjectVector(ColumnBridge.expression(vec), flat, dim))
  }
}
