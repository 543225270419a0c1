package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE merge application: given an `array<string>` pre-token
  * column and a rank-ordered merge list, return
  * `array<array<string>>` — each word's final symbol sequence.
  *
  * Why native: the compositional form compiled the merge list into
  * `numMerges` STACKED `regexp_replace`s over each word's padded
  * symbol string — 30+ interpreted regex scans per word per row, the
  * engine's slowest query (q163). This expression applies each merge
  * as one in-place array compaction pass (precompiled left/right/fused
  * strings, no regex, no separator framing), and memoizes finished
  * words in a bounded per-instance table — Zipf makes the hit rate on
  * real text extreme, so most token occurrences cost one hash probe.
  *
  * Semantics are EXACTLY the regex tower's (BpeApplySpec pins this):
  *  - symbols start as the word's code points (the U+0001 framing
  *    separator is stripped defensively, as `padSyms` did) plus the
  *    trailing `</w>` marker;
  *  - merges apply in rank order; within one merge the scan is greedy
  *    left-to-right non-overlapping, and a symbol fused by THIS pass
  *    is not rescanned by the same pass (the regex scanner resumed
  *    after the consumed match) — textbook BPE;
  *  - empty pre-tokens are skipped (the caller's `filter(w != "")`).
  */
case class BpeApply(child: Expression, merges: Array[Array[String]])
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(ArrayType(StringType, containsNull = false),
      containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_apply"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_apply expects array<string>, got ${other.simpleString}")
    }

  @transient private lazy val state = new BpeApply.State(merges)

  override def nullSafeEval(input: Any): Any =
    BpeApply.compute(input.asInstanceOf[ArrayData], state)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val st = ctx.addReferenceObj("bpeState", state,
      "graft.functions.BpeApply.State")
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = graft.functions.BpeApply.compute($a, $st);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeApply {

  private val EndWord = "</w>"
  private val MemoCap = 1 << 16

  /** Per-instance apply state: precompiled merge strings plus the
    * bounded word memo. ConcurrentHashMap because a deserialized plan
    * fragment can be shared across a core's task threads. */
  final class State(mergePairs: Array[Array[String]]) extends Serializable {
    val left: Array[String] = mergePairs.map(_(0))
    val right: Array[String] = mergePairs.map(_(1))
    val fused: Array[String] = mergePairs.map(m => m(0) + m(1))
    @transient lazy val memo =
      new java.util.concurrent.ConcurrentHashMap[String, Array[UTF8String]]()
  }

  /** One word → its final symbol array. */
  private def applyWord(word: String, st: State): Array[UTF8String] = {
    // code-point split, stripping the legacy U+0001 framing separator
    var syms = new Array[String](word.length + 1)
    var n = 0
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val w = Character.charCount(cp)
      if (cp != 1) { syms(n) = word.substring(i, i + w); n += 1 }
      i += w
    }
    syms(n) = EndWord
    n += 1
    var m = 0
    while (m < st.left.length && n > 1) {
      val l = st.left(m); val r = st.right(m); val f = st.fused(m)
      var read = 0
      var write = 0
      while (read < n) {
        if (read + 1 < n && syms(read) == l && syms(read + 1) == r) {
          syms(write) = f
          read += 2
        } else {
          syms(write) = syms(read)
          read += 1
        }
        write += 1
      }
      n = write
      m += 1
    }
    val out = new Array[UTF8String](n)
    i = 0
    while (i < n) { out(i) = UTF8String.fromString(syms(i)); i += 1 }
    out
  }

  /** Shared compute for interpreted + codegen paths: per non-empty
    * token, memo probe or fresh apply. */
  def compute(tokens: ArrayData, st: State): ArrayData = {
    val nTok = tokens.numElements()
    val out = new java.util.ArrayList[GenericArrayData](nTok)
    var i = 0
    while (i < nTok) {
      val tok = tokens.getUTF8String(i)
      require(tok != null,
        "bpe_apply: null token at index " + i +
          " — whitespace split never yields nulls; pre-filter null elements")
      if (tok.numBytes() > 0) {
        val word = tok.toString
        var syms = st.memo.get(word)
        if (syms == null) {
          syms = applyWord(word, st)
          if (st.memo.size() < MemoCap) st.memo.put(word, syms)
        }
        out.add(new GenericArrayData(syms.asInstanceOf[Array[Any]]))
      }
      i += 1
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  def bpeApply(tokens: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeApply(ColumnBridge.expression(tokens),
      merges.map(m => Array(m._1, m._2)).toArray))
}
