package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass token profile: given an `array<string>` token column
  * and a fixed set of word dictionaries, return
  * `[sum_of_token_lengths, hits(dict₀), hits(dict₁), …]` as
  * `array<bigint>`.
  *
  * Why native: the built-in formulation is one `aggregate(...)` lambda
  * per feature — higher-order functions are CodegenFallback, so every
  * token of every document walks the lambda interpreter once PER
  * DICTIONARY (language-ID scores 4+ dictionaries → 4+ interpreted
  * array walks per row; measured ~6s for 5k docs at sf0.1). This
  * expression makes ONE pass over the tokens: each token is a single
  * hash-map probe that increments every dictionary it belongs to, and
  * the char-length sum rides along for free. Same pattern as
  * [[MinHashSignature]]: shared compute for interpreted + codegen paths,
  * plain JVM arithmetic, deterministic by construction.
  *
  * Hit semantics match `aggregate + array_contains`: every token
  * OCCURRENCE counts (no dedup), membership is exact string equality.
  * A token appearing twice in one dictionary still counts once per
  * occurrence (the lookup stores each dictionary index at most once).
  */
case class TokenProfile(child: Expression, dicts: Array[Array[String]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "token_profile"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"token_profile expects array<string>, got ${other.simpleString}")
    }

  @transient private lazy val lookup = TokenProfile.buildLookup(dicts)

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(TokenProfile.compute(
      input.asInstanceOf[ArrayData], lookup, dicts.length))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val map = ctx.addReferenceObj("tokenDictLookup", lookup, "java.util.HashMap")
    val nDicts = dicts.length
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      s"""
         |long[] $out = graft.functions.TokenProfile.compute($a, $map, $nDicts);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenProfile {

  /** word → indices of the dictionaries containing it (each index at
    * most once, preserving occurrence-count semantics for dictionaries
    * that list a word twice). */
  def buildLookup(dicts: Array[Array[String]]): java.util.HashMap[UTF8String, Array[Int]] = {
    val m = new java.util.HashMap[UTF8String, Array[Int]]()
    var d = 0
    while (d < dicts.length) {
      dicts(d).foreach { w =>
        val key = UTF8String.fromString(w)
        val prev = m.get(key)
        if (prev == null) m.put(key, Array(d))
        else if (!prev.contains(d)) m.put(key, prev :+ d)
      }
      d += 1
    }
    m
  }

  /** One pass: out(0) = Σ numChars(token); out(1+d) = occurrences of
    * tokens present in dictionary d. */
  def compute(arr: ArrayData, lookup: java.util.HashMap[UTF8String, Array[Int]],
      nDicts: Int): Array[Long] = {
    val out = new Array[Long](nDicts + 1)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val tok = arr.getUTF8String(i)
      require(tok != null,
        "token_profile: null token at index " + i +
          " — whitespace split never yields nulls; pre-filter null elements")
      out(0) += tok.numChars()
      val hit = lookup.get(tok)
      if (hit != null) {
        var j = 0
        while (j < hit.length) { out(1 + hit(j)) += 1; j += 1 }
      }
      i += 1
    }
    out
  }

  def tokenProfile(tokens: Column, dicts: Seq[Seq[String]]): Column =
    ColumnBridge.column(TokenProfile(
      ColumnBridge.expression(tokens), dicts.map(_.toArray).toArray))
}
