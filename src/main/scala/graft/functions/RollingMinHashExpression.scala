package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native winnowing fingerprint: minimum over all `w`-element windows of
  * a rotate-xor combine of the token hashes.
  *
  * Same motivation as [[MinHashSignature]]: the
  * sequence→transform→aggregate formulation walks interpreted
  * higher-order functions (~O(n·w) interpreter dispatches per row —
  * measured 6s for 5k docs at sf0.1 even warm); this is the same math
  * as a primitive loop. The combine `((h << 5) | (h >>> 59)) ^ x`
  * matches the HOF version exactly, so fingerprints are unchanged.
  *
  * Returns null when the array has fewer than `w` elements — the
  * caller supplies the short-document fallback.
  */
case class RollingMinHash(child: Expression, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rolling_min_hash"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"rolling_min_hash expects array<bigint>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() < w) null
    else java.lang.Long.valueOf(RollingMinHash.compute(arr, w))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |if ($a.numElements() < $w) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.RollingMinHash.compute($a, $w);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingMinHash {

  def compute(arr: ArrayData, w: Int): Long = {
    val n = arr.numElements()
    var best = Long.MaxValue
    var i = 0
    while (i <= n - w) {
      var h = 0L
      var j = 0
      while (j < w) {
        h = ((h << 5) | (h >>> 59)) ^ arr.getLong(i + j)
        j += 1
      }
      if (h < best) best = h
      i += 1
    }
    best
  }

  def rollingMinHash(tokenHashes: Column, w: Int): Column =
    ColumnBridge.column(
      RollingMinHash(ColumnBridge.expression(tokenHashes), w))
}
