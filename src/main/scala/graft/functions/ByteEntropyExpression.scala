package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shannon entropy (bits/byte) of a string's UTF-8 bytes — the cheap
  * compressibility proxy curation pipelines use as a quality signal:
  * near-0 entropy is degenerate repetition (one byte value dominates),
  * ~4-4.5 is normal text, ~6+ is random-looking / encoded blobs, so
  * both tails get filtered (same intent as Gopher's repetition rules,
  * Rae et al. 2021 §A1.1, via a one-number signal).
  *
  * Why native: per-document char histograms via `explode(split(text,
  * ''))` + groupBy multiply the row count by the document LENGTH (far
  * worse than per-token explode) and shuffle what is a pure per-row
  * computation. This expression is one codegen'd pass with a 256-slot
  * histogram on the stack: map-only, no explode, no shuffle, byte-
  * exact against the exploded formulation for ASCII (it measures BYTE
  * entropy; multi-byte code points count per byte, which is the
  * convention compression-ratio filters use anyway).
  */
case class ByteEntropy(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "byte_entropy"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"byte_entropy expects string, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    ByteEntropy.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.ByteEntropy.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ByteEntropy {

  private val Log2 = math.log(2.0)

  /** One pass + a 256-slot histogram; empty input is 0.0 by convention
    * (no distribution to measure). */
  def compute(s: UTF8String): Double = {
    val n = s.numBytes
    if (n == 0) return 0.0
    val hist = new Array[Int](256)
    val bytes = s.getBytes   // may copy when off-heap; n is doc-sized
    var i = 0
    while (i < n) {
      hist(bytes(i) & 0xff) += 1
      i += 1
    }
    var h = 0.0
    var b = 0
    while (b < 256) {
      val c = hist(b)
      if (c > 0) {
        val p = c.toDouble / n
        h -= p * (math.log(p) / Log2)
      }
      b += 1
    }
    h
  }

  def byteEntropy(text: Column): Column =
    ColumnBridge.column(ByteEntropy(ColumnBridge.expression(text)))
}
