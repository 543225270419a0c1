package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass repetition profile: given an `array<string>` token
  * column, return `struct<n_tokens, n_distinct, top_bigram,
  * top_bigram_n>` — the Gopher-rule ingredients (Rae et al. 2021
  * §A1.1) computed per row.
  *
  * Why native: every one of these metrics is a WITHIN-document
  * quantity, yet the compositional formulation had to explode each
  * document's adjacent bigrams into (doc, gram) rows, shuffle them
  * into a grouped count, and run a per-doc window for the top-1 — two
  * corpus×tokens-sized exchanges (plus the per-row materialization of
  * the bigram string array) for numbers a single map pass produces.
  * At 100 TB that is the difference between a map-only scan and
  * shuffling ~the tokenized corpus twice; under memory/disk pressure
  * the exploded form was also the engine's worst bench-variance query
  * (q71: 1.5 s steady-state, 40 s under a loaded driver). One
  * hash-map pass per document removes the shuffles, the window, and
  * the allocation pressure at once.
  *
  * Semantics match the exploded form exactly:
  *  - `n_distinct`: exact distinct tokens (binary string equality);
  *  - bigrams are adjacent pairs joined by one space;
  *  - `top_bigram`: the most frequent bigram, ties broken by binary
  *    (UTF8) lexicographic order — the same ordering Spark's
  *    `ORDER BY gram` and DuckDB's string comparison use;
  *  - rows with fewer than 2 tokens get a null `top_bigram` and
  *    `top_bigram_n = 0` (callers filter them out, as before).
  */
case class RepetitionProfile(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_bigram", StringType, nullable = true),
    StructField("top_bigram_n", LongType, nullable = false)))

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "repetition_profile"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"repetition_profile expects array<string>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    RepetitionProfile.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = graft.functions.RepetitionProfile.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepetitionProfile {

  private val Space = UTF8String.fromString(" ")

  /** One pass: a token hash-set for the distinct count and a bigram
    * hash-map for the top-1. Deterministic: the winner is chosen by
    * (count DESC, gram binary ASC), independent of map iteration
    * order. Shared by the interpreted and codegen paths. */
  def compute(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    val distinct = new java.util.HashSet[UTF8String](Math.max(16, n * 2))
    val grams = new java.util.HashMap[UTF8String, Array[Long]](
      Math.max(16, n * 2))
    var prev: UTF8String = null
    var i = 0
    while (i < n) {
      val tok = arr.getUTF8String(i)
      require(tok != null,
        "repetition_profile: null token at index " + i +
          " — whitespace split never yields nulls; pre-filter null elements")
      distinct.add(tok)
      if (prev != null) {
        val gram = UTF8String.concat(prev, Space, tok)
        val c = grams.get(gram)
        if (c == null) grams.put(gram, Array(1L)) else c(0) += 1L
      }
      prev = tok
      i += 1
    }
    var best: UTF8String = null
    var bestN = 0L
    val it = grams.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue()(0)
      if (c > bestN || (c == bestN && (best == null ||
          e.getKey.compareTo(best) < 0))) {
        best = e.getKey
        bestN = c
      }
    }
    new GenericInternalRow(Array[Any](n.toLong, distinct.size.toLong,
      best, bestN))
  }

  def repetitionProfile(tokens: Column): Column =
    ColumnBridge.column(RepetitionProfile(ColumnBridge.expression(tokens)))
}
