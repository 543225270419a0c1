package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE compression ratio (compressed bytes / raw UTF-8 bytes) of a
  * string — the "real compressor" quality signal curation pipelines
  * run beside [[ByteEntropy]]'s order-0 estimate: entropy only sees
  * the byte histogram, while LZ77 matching also catches REPEATED
  * PHRASES, so boilerplate-heavy and template-generated documents
  * score low ratios that entropy misses entirely (the
  * compression-ratio filter of CCNet/RefinedWeb-style web curation;
  * Penedo et al. 2023 §3 use exactly this family of heuristics).
  * Normal prose lands ~0.4–0.7, degenerate repetition < 0.2,
  * random/encoded blobs ≥ 1.0 (incompressible plus header overhead) —
  * both tails get filtered.
  *
  * Why native: there is no built-in compression function, and a Scala
  * UDF would pay serialization plus a per-call `Deflater` allocation.
  * This expression stays inside whole-stage codegen and reuses one
  * `Deflater` per thread (reset between rows): map-only, no shuffle,
  * no per-row allocation beyond the unavoidable output buffer. Level
  * is BEST_SPEED — the filter needs the ratio's ORDER, not maximal
  * compression, and fastest-level ratios separate the tails just as
  * well.
  */
case class DeflateRatio(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "deflate_ratio"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"deflate_ratio expects string, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    DeflateRatio.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.DeflateRatio.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DeflateRatio {

  /** One Deflater per executor thread, reset per row. `nowrap = true`
    * drops the 6-byte zlib header/checksum so short strings aren't
    * dominated by framing; the remaining fixed cost of an empty
    * DEFLATE stream is why ratios above 1.0 are possible and
    * meaningful (incompressible input). */
  private val deflaters = new ThreadLocal[Deflater] {
    override def initialValue(): Deflater =
      new Deflater(Deflater.BEST_SPEED, true)
  }

  /** Ratio = deflate(bytes).length / bytes.length; empty input is 1.0
    * by convention (nothing to compress, nothing saved). */
  def compute(s: UTF8String): Double = {
    val raw = s.getBytes
    val n = raw.length
    if (n == 0) return 1.0
    val d = deflaters.get()
    d.reset()
    d.setInput(raw)
    d.finish()
    // worst case: stored blocks ≈ n + 5 bytes per 64 KiB block + slack
    val buf = new Array[Byte](n + (n >> 10) + 64)
    var out = 0
    while (!d.finished()) {
      val written = d.deflate(buf, out, buf.length - out)
      out += written
      if (!d.finished() && out == buf.length)
        // cannot happen with the worst-case sizing; guard anyway
        return out.toDouble / n
    }
    out.toDouble / n
  }

  def deflateRatio(text: Column): Column =
    ColumnBridge.column(DeflateRatio(ColumnBridge.expression(text)))
}
