package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native word-shingle hasher: for an `array<string>` token column,
  * returns `xxhash64(concat_ws(" ", tokens[w..w+k-1]))` for every
  * k-token window, as `array<bigint>` — bit-identical to the built-in
  * HOF formulation `transform(shingles, s -> xxhash64(s))` (asserted
  * differentially in ShingleHashSpec), empty when the document has
  * fewer than k tokens.
  *
  * Why native: the HOF formulation runs `sequence` → `transform` →
  * `slice` → `concat_ws` through the lambda interpreter, allocating a
  * shingle STRING per window per row (higher-order functions are
  * CodegenFallback). This expression materializes the space-joined
  * token bytes ONCE per row and hashes each window as a byte-range
  * slice of that buffer — zero per-window allocation, one xxhash64
  * (seed 42, Spark's default) per window over the exact same bytes.
  * Feeds MinHash signatures (q17) and n-gram Jaccard sets (q19); same
  * shared-compute pattern as [[MinHashSignature]] / [[TokenProfile]].
  *
  * Null tokens are not expected (whitespace `split` never yields them);
  * matching `concat_ws` skip-null semantics for them is out of scope.
  */
case class ShingleHashes(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "shingle size k must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_hashes"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingle_hashes expects array<string>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(ShingleHashes.compute(input.asInstanceOf[ArrayData], k))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      s"""
         |long[] $out = graft.functions.ShingleHashes.compute($a, $k);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {

  /** One pass: join all tokens with single spaces into one byte buffer,
    * then hash each k-token window as a byte range of that buffer. */
  def compute(arr: ArrayData, k: Int): Array[Long] = {
    val n = arr.numElements()
    if (n < k) return Array.emptyLongArray
    val toks = new Array[UTF8String](n)
    // starts(i) = byte offset of token i in the joined buffer;
    // starts(n) = buffer length + 1 (virtual next token) so the end of
    // window w..w+k-1 is uniformly starts(w+k) - 1 (strip the separator)
    val starts = new Array[Int](n + 1)
    var total = 0
    var i = 0
    while (i < n) {
      toks(i) = arr.getUTF8String(i)
      require(toks(i) != null,
        "shingle_hashes: null token at index " + i +
          " — whitespace split never yields nulls; pre-filter null elements")
      total += toks(i).numBytes + (if (i > 0) 1 else 0)
      i += 1
    }
    val buf = new Array[Byte](total)
    var pos = 0
    i = 0
    while (i < n) {
      if (i > 0) { buf(pos) = ' '; pos += 1 }
      starts(i) = pos
      toks(i).writeToMemory(buf, Platform.BYTE_ARRAY_OFFSET + pos)
      pos += toks(i).numBytes
      i += 1
    }
    starts(n) = pos + 1
    val out = new Array[Long](n - k + 1)
    var w = 0
    while (w <= n - k) {
      val start = starts(w)
      val len = starts(w + k) - 1 - start
      out(w) = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET + start, len, 42L)
      w += 1
    }
    out
  }

  def shingleHashes(tokens: Column, k: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(tokens), k))
}
