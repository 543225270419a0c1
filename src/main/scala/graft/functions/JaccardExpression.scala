package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Jaccard similarity over two `array<bigint>` hash sets:
  * |A ∩ B| / |A ∪ B| with set semantics (duplicates ignored), 0.0 when
  * both sides are empty.
  *
  * Why native: the built-in formulation
  * `size(array_intersect(a,b)) / size(array_union(a,b))` MATERIALIZES
  * the intersection and union arrays per pair just to take their
  * lengths, and walks both inputs twice through two independent
  * hash-set builds. This expression sorts local copies once and
  * merge-counts both cardinalities in a single pass — no output
  * allocation, the per-candidate-pair hot loop of dedup verification
  * (q19/q54). Bit-identical to the built-in form (asserted
  * differentially in TextDedupSpec).
  */
case class JaccardSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "jaccard_sim"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"jaccard_sim expects two array<bigint> columns, got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    JaccardSimilarity.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaccardSimilarity.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaccardSimilarity {

  /** Sort local copies, then one merge pass counting distinct-common
    * and distinct-union. */
  def compute(aData: ArrayData, bData: ArrayData): Double = {
    val a = aData.toLongArray()
    val b = bData.toLongArray()
    java.util.Arrays.sort(a)
    java.util.Arrays.sort(b)
    var i = 0; var j = 0
    var inter = 0L; var union = 0L
    while (i < a.length && j < b.length) {
      val x = a(i); val y = b(j)
      if (x == y) {
        inter += 1; union += 1
        // skip duplicate runs on both sides
        while (i < a.length && a(i) == x) i += 1
        while (j < b.length && b(j) == y) j += 1
      } else if (x < y) {
        union += 1
        while (i < a.length && a(i) == x) i += 1
      } else {
        union += 1
        while (j < b.length && b(j) == y) j += 1
      }
    }
    while (i < a.length) { union += 1; val x = a(i); while (i < a.length && a(i) == x) i += 1 }
    while (j < b.length) { union += 1; val y = b(j); while (j < b.length && b(j) == y) j += 1 }
    if (union == 0L) 0.0 else inter.toDouble / union
  }

  def jaccardSim(a: Column, b: Column): Column =
    ColumnBridge.column(JaccardSimilarity(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
