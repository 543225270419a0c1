package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{ByteEntropy, DeflateRatio, FloatVectorDot,
  HyperplaneSignature, JaccardSimilarity, MinHashSignature, PqAdc,
  RollingMinHash, ShingleHashes, SimHash64}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions for SQL use. Install with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` /
  * `.withExtensions(new GraftExtensions)` at session build time, or
  * [[GraftExtensions.register]] on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  /** Scalar config arguments (shingle size, hash count, seed) must be
    * literals: they parameterize the generated code / plan-level
    * reference objects, exactly like Spark's own `approx_count_distinct`
    * precision argument. */
  private def foldableLong(e: Expression, fn: String, arg: String): Long = {
    require(e.foldable, s"$fn: $arg must be a literal")
    e.eval(null) match {
      case i: Int => i.toLong
      case l: Long => l
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be an integer literal, got $other")
    }
  }

  private def foldableInt(e: Expression, fn: String, arg: String): Int = {
    val l = foldableLong(e, fn, arg)
    require(l.isValidInt, s"$fn: $arg out of int range ($l)")
    l.toInt
  }

  private def fn(name: String, clazz: Class[_])(
      builder: Seq[Expression] => Expression) =
    (new FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name),
      builder)

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      fn("vec_dot", classOf[FloatVectorDot]) { children =>
        require(children.length == 2, "vec_dot takes exactly 2 arguments")
        FloatVectorDot(children.head, children(1))
      },
      fn("shingle_hashes", classOf[ShingleHashes]) { children =>
        require(children.length == 2, "shingle_hashes(tokens, k)")
        ShingleHashes(children.head,
          foldableInt(children(1), "shingle_hashes", "k"))
      },
      fn("minhash_sig", classOf[MinHashSignature]) { children =>
        require(children.length == 2, "minhash_sig(shingle_hashes, num_hashes)")
        MinHashSignature(children.head,
          foldableInt(children(1), "minhash_sig", "num_hashes"))
      },
      fn("rolling_minhash", classOf[RollingMinHash]) { children =>
        require(children.length == 2, "rolling_minhash(token_hashes, w)")
        RollingMinHash(children.head,
          foldableInt(children(1), "rolling_minhash", "w"))
      },
      fn("simhash64", classOf[SimHash64]) { children =>
        require(children.length == 1, "simhash64(tokens)")
        SimHash64(children.head)
      },
      fn("jaccard_sim", classOf[JaccardSimilarity]) { children =>
        require(children.length == 2, "jaccard_sim(a, b)")
        JaccardSimilarity(children.head, children(1))
      },
      fn("byte_entropy", classOf[ByteEntropy]) { children =>
        require(children.length == 1, "byte_entropy(text)")
        ByteEntropy(children.head)
      },
      fn("deflate_ratio", classOf[DeflateRatio]) { children =>
        require(children.length == 1, "deflate_ratio(text)")
        DeflateRatio(children.head)
      },
      fn("unicode_normalize",
          classOf[graft.functions.UnicodeNormalize]) { children =>
        require(children.length == 2, "unicode_normalize(text, form)")
        val form = children(1)
        require(form.foldable, "unicode_normalize: form must be a literal")
        graft.functions.UnicodeNormalize(children.head,
          String.valueOf(form.eval(null)))
      },
      fn("pq_adc", classOf[PqAdc]) { children =>
        require(children.length == 3, "pq_adc(codes, dist_table, k)")
        PqAdc(children.head, children(1),
          foldableInt(children(2), "pq_adc", "k"))
      },
      fn("hyperplane_sig", classOf[HyperplaneSignature]) { children =>
        require(children.length == 4,
          "hyperplane_sig(vec, num_bits, dim, seed)")
        val bits = foldableInt(children(1), "hyperplane_sig", "num_bits")
        val dim = foldableInt(children(2), "hyperplane_sig", "dim")
        val seed = foldableLong(children(3), "hyperplane_sig", "seed")
        HyperplaneSignature(children.head,
          HyperplaneSignature.makePlanes(bits, dim, seed), dim)
      })

  /** Register into an already-built session's function registry. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
