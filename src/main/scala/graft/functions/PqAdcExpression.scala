package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Asymmetric-distance computation (ADC) for product quantization
  * (Jégou/Douze/Schmid, TPAMI 2011 §IV): given a vector's PQ codes
  * (one centroid index per subspace) and a query's flattened
  * per-subspace distance table (`table[j*k + c]` = squared L2 between
  * the query's j-th subvector and centroid c of subspace j), the
  * approximate squared distance is `Σ_j table[j*k + codes[j]]` — m
  * array lookups per row instead of a d-dimensional float loop.
  *
  * Why native: the lookup-sum is the per-row hot loop of PQ search
  * (every candidate row, every query); a HOF formulation
  * (`aggregate(zip_with(...))`) runs it through the lambda interpreter.
  * This is a primitive loop in codegen, same pattern as
  * [[FloatVectorDot]].
  */
case class PqAdc(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {
  require(k >= 1, "centroids-per-subspace k must be >= 1")

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_adc"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(FloatType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_adc expects (array<int> codes, array<float> table), got $other")
    }

  override def nullSafeEval(codes: Any, table: Any): Any =
    PqAdc.compute(codes.asInstanceOf[ArrayData], table.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, t) =>
      s"${ev.value} = graft.functions.PqAdc.compute($c, $t, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqAdc {

  def compute(codes: ArrayData, table: ArrayData, k: Int): Double = {
    val m = codes.numElements()
    require(table.numElements() == m * k,
      s"pq_adc: table length ${table.numElements()} != m*k = ${m * k}")
    var d = 0.0
    var j = 0
    while (j < m) {
      val c = codes.getInt(j)
      // getFloat on unsafe array data is an unchecked platform read —
      // an out-of-range code (corrupt/foreign column via the SQL
      // registration) must fail, not return garbage memory
      require(c >= 0 && c < k,
        s"pq_adc: code $c at subspace $j outside [0, $k)")
      d += table.getFloat(j * k + c)
      j += 1
    }
    d
  }

  def pqAdc(codes: Column, table: Column, k: Int): Column =
    ColumnBridge.column(PqAdc(
      ColumnBridge.expression(codes), ColumnBridge.expression(table), k))
}
