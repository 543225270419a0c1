package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native per-row maximum cosine similarity against a FIXED reference
  * matrix: given an `array<float>` vector and a broadcast set of
  * reference vectors, return max_i cos(vec, ref_i) as a double.
  *
  * This is the semantic-decontamination hot loop (embedding analog of
  * the n-gram gate in [[graft.operators.Decontaminate]]): the reference
  * side is a held-out evaluation set — megabytes against a 100 TB
  * corpus — so it rides along as a plan reference object exactly like
  * [[NearestCentroids]]'s codebook, and every corpus row computes its
  * own max inside whole-stage codegen. Compared to the broadcast-join +
  * `groupBy(max)` formulation this emits ZERO intermediate pair rows
  * and needs no aggregation exchange at all: the gate is a map-only
  * pass over the corpus, which is what survives 100 TB.
  *
  * Reference-vector inverse norms are precomputed once at construction;
  * the per-row cost is |refs| fused multiply-adds over `dim` floats.
  * Zero-norm inputs (cosine undefined) yield NaN, matching double
  * division semantics in both Spark and DuckDB; zero-norm REFERENCE
  * rows are rejected at construction — a silent NaN in the max loop
  * would un-flag every document.
  */
case class MaxCosine(child: Expression, refs: Array[Float], dim: Int)
    extends UnaryExpression {

  require(dim > 0 && refs.length % dim == 0,
    s"reference matrix length ${refs.length} not a multiple of dim $dim")
  require(refs.length > 0, "empty reference matrix")

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "max_cosine"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"max_cosine expects array<float>, got ${other.simpleString}")
    }

  // shared by all rows of a partition; invNorms is derived state, so
  // compute it lazily once per executor rather than shipping it
  @transient private lazy val invNorms: Array[Double] =
    MaxCosine.inverseNorms(refs, dim)

  override def nullSafeEval(input: Any): Any =
    MaxCosine.compute(input.asInstanceOf[ArrayData], refs, invNorms, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refsRef = ctx.addReferenceObj("refs", refs, "float[]")
    val invRef = ctx.addReferenceObj("invNorms", invNorms, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.functions.MaxCosine.compute(
         |  $a, $refsRef, $invRef, $dim);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MaxCosine {

  /** 1/‖ref_i‖ per reference row. Rejects zero-norm rows: a NaN ref
    * cosine would silently drop out of the max (NaN comparisons are
    * false) and under-report contamination. */
  private[functions] def inverseNorms(refs: Array[Float], dim: Int): Array[Double] = {
    val k = refs.length / dim
    val out = new Array[Double](k)
    var c = 0
    while (c < k) {
      val off = c * dim
      var s = 0.0d
      var j = 0
      while (j < dim) { val v = refs(off + j).toDouble; s += v * v; j += 1 }
      require(s > 0.0, s"zero-norm reference vector at index $c")
      out(c) = 1.0 / math.sqrt(s)
      c += 1
    }
    out
  }

  /** max_i cos(vec, ref_i), exact double accumulation left-to-right per
    * pair (same order as [[VectorFunctions.cosine]], so per-pair values
    * are bit-equal to the two-column path and DuckDB round-6 parity
    * carries over). Zero-norm input ⇒ NaN (0/0), mirroring the
    * two-column cosine. Shared by interpreted and codegen paths. */
  def compute(vec: ArrayData, refs: Array[Float], invNorms: Array[Double],
      dim: Int): Double = {
    val n = math.min(dim, vec.numElements())
    var vs = 0.0d
    var j = 0
    while (j < n) { val v = vec.getFloat(j).toDouble; vs += v * v; j += 1 }
    if (vs == 0.0) return Double.NaN
    val vInv = 1.0 / math.sqrt(vs)
    val k = refs.length / dim
    var best = Double.NegativeInfinity
    var c = 0
    while (c < k) {
      val off = c * dim
      var d = 0.0d
      j = 0
      while (j < n) { d += vec.getFloat(j).toDouble * refs(off + j).toDouble; j += 1 }
      val cos = d * vInv * invNorms(c)
      if (cos > best) best = cos
      c += 1
    }
    best
  }

  /** Column of max cosine of `vec` against the reference matrix.
    * Zero-norm reference rows are rejected HERE, eagerly — failing at
    * plan-build time beats a wrapped codegen-time error. */
  def maxCosine(vec: Column, refs: Array[Array[Float]]): Column = {
    require(refs.nonEmpty, "empty reference matrix")
    val dim = refs(0).length
    require(refs.forall(_.length == dim), "ragged reference matrix")
    val flat = new Array[Float](refs.length * dim)
    var i = 0
    while (i < refs.length) {
      System.arraycopy(refs(i), 0, flat, i * dim, dim)
      i += 1
    }
    inverseNorms(flat, dim) // eager zero-norm validation
    ColumnBridge.column(MaxCosine(ColumnBridge.expression(vec), flat, dim))
  }
}
