package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native MinHash signature: given the 64-bit hashes of a document's
  * shingles, produce `numHashes` permutation minima in ONE pass.
  *
  * Why native: Spark's higher-order functions (transform/aggregate) are
  * CodegenFallback — every element of every lambda evaluates through
  * the interpreter, and the N-permutation formulation walks the array N
  * times allocating an intermediate array per permutation. Measured at
  * sf0.1 that made signatures ~10s of a 12s dedup query. This
  * expression is an O(elements × perms) primitive loop in codegen.
  *
  * Permutation family: splitmix64-style avalanche of (hash ⊕ seedᵢ),
  * seeds derived from the permutation index. Plain JVM arithmetic
  * (wrapping) in both eval paths — not Spark ANSI operators — so
  * interpreted and codegen'd results are identical by construction.
  *
  * Empty input (doc shorter than a shingle) yields Long.MaxValue
  * sentinels, matching "no shingles ⇒ collides with nothing".
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_signature"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_signature expects array<bigint>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val out = MinHashSignature.compute(arr, numHashes)
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      s"""
         |long[] $out = graft.functions.MinHashSignature.compute($a, $numHashes);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {

  /** One pass: for each element, update every permutation's minimum. */
  def compute(arr: ArrayData, numHashes: Int): Array[Long] = {
    val out = Array.fill(numHashes)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val x = arr.getLong(i)
      var p = 0
      while (p < numHashes) {
        // splitmix64 avalanche of (x ^ seed_p); wrapping JVM arithmetic
        var z = x ^ (p.toLong * 0x9E3779B97F4A7C15L)
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z = z ^ (z >>> 31)
        if (z < out(p)) out(p) = z
        p += 1
      }
      i += 1
    }
    out
  }

  def minhashSignature(shingleHashes: Column, numHashes: Int): Column =
    ColumnBridge.column(
      MinHashSignature(ColumnBridge.expression(shingleHashes), numHashes))
}
