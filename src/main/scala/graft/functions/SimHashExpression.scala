package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native 64-bit SimHash (Charikar, STOC 2002): per token,
  * `xxhash64(token)` (seed 42, Spark's default — bit-identical to the
  * built-in); each of its 64 bits votes ±1; fingerprint bit j is set
  * iff the bit-j vote sum is positive. One long per document.
  *
  * Why native: the built-in formulation is `explode(tokens)` →
  * `groupBy(doc)` with 64 conditional-sum aggregate columns — it
  * multiplies the row count by the token count (~60× on the documents
  * table) and shuffles every exploded row to re-group what was already
  * collocated. SimHash is a pure PER-ROW computation; this expression
  * makes it map-only: no explode, no shuffle, no aggregation. Measured
  * at sf0.1 the aggregate formulation was 5.3s of q18; the per-row form
  * is a single codegen'd pass (see BENCH). At 100 TB the difference is
  * a full shuffle of the exploded corpus vs zero.
  *
  * Output for an empty token array is 0L (all vote sums are 0, and the
  * `> 0` sign test sets no bits) — callers that must match the
  * explode+groupBy formulation (which DROPS token-less docs) filter
  * `size(tokens) >= 1` first, as [[graft.operators.Dedup.simHash]]
  * does. Differential parity with the aggregate formulation is asserted
  * in TextDedupSpec.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 expects array<string>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SimHash64.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {

  /** One pass over the tokens; 64 int vote counters on the stack. */
  def compute(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      require(t != null,
        "simhash64: null token at index " + i +
          " — whitespace split never yields nulls; pre-filter null elements")
      val h = XXH64.hashUnsafeBytes(
        t.getBaseObject, t.getBaseOffset, t.numBytes, 42L)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) fp |= (1L << j)
      j += 1
    }
    fp
  }

  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))
}
