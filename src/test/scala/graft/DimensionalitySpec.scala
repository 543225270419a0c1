package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Dimensionality

/** Planted-geometry semantics for the effective-dimension audits:
  * participation ratio (linear), TwoNN (manifold), hubness
  * (k-occurrence skew). */
class DimensionalitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic hash jitter in [-0.5, 0.5) — a two-round mixer so
    * different salts give INDEPENDENT-looking streams (a linear
    * `i*c + salt` congruence makes every dim a shift of dim 1, which
    * collapses the covariance these tests need to spread). */
  private def jit(i: Long, salt: Long): Float = {
    var v = i * 2654435761L + salt * -7046029254386353131L
    v ^= v >>> 13; v *= 1274126177L; v ^= v >>> 16
    (((v % 1000L) + 1000L) % 1000L).toFloat / 1000.0f - 0.5f
  }

  test("participation ratio: isotropic reads d, collapsed reads 1") {
    // isotropic-ish: 4 independent jittered dims
    val iso = (0L until 200L).map(i =>
      (i, Array(jit(i, 1), jit(i, 2), jit(i, 3), jit(i, 4))))
      .toDF("vec_id", "embedding")
    // collapsed: all variance in dim 1, others constant
    val one = (0L until 200L).map(i =>
      (i, Array(jit(i, 1), 0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val prIso = Dimensionality.participationRatio(iso)
      .collect()(0)
    val prOne = Dimensionality.participationRatio(one)
      .collect()(0)
    assert(prIso.getLong(0) == 4L)
    assert(prIso.getDouble(3) > 3.0,
      s"isotropic PR=${prIso.getDouble(3)}")
    assert(math.abs(prOne.getDouble(3) - 1.0) < 0.01,
      s"collapsed PR=${prOne.getDouble(3)}")
  }

  test("twonn: a jittered 1-D filament reads a lower ID than a 3-D cloud") {
    // filament: points at HASH-RANDOM positions along a line (TwoNN
    // needs Poisson-like spacing — a regular lattice has d1 = d2
    // everywhere and the estimator degenerates, by design)
    val line = (0L until 120L).map { i =>
      val tpos = (jit(i, 7) + 0.5f) * 120f
      (i, Array(tpos, tpos * 0.5f + jit(i, 5) * 0.01f,
        jit(i, 6) * 0.01f, 0.0f))
    }.toDF("vec_id", "embedding")
    // cloud: 3 independent jittered dims at comparable spacing
    val cloud = (0L until 120L).map(i =>
      (i, Array(jit(i, 1) * 60f, jit(i, 2) * 60f, jit(i, 3) * 60f,
        0.0f)))
      .toDF("vec_id", "embedding")
    val idLine = Dimensionality.twoNN(line).collect()(0)
    val idCloud = Dimensionality.twoNN(cloud).collect()(0)
    val l = idLine.getDouble(3)
    val c = idCloud.getDouble(3)
    assert(l < c, s"line ID=$l should be < cloud ID=$c")
    assert(l > 0.3 && l < 2.2, s"line ID=$l out of band")
    assert(c > 1.5, s"cloud ID=$c out of band")
  }

  test("twonn: exact duplicates are excluded, not divided by") {
    val dup = ((0L until 40L).map(i =>
      (i, Array(jit(i, 1), jit(i, 2)))) ++
      // vec 100 duplicates vec 0 exactly; 0 is a probe (0 % 7 == 0)
      Seq((100L, Array(jit(0L, 1), jit(0L, 2)))))
      .toDF("vec_id", "embedding")
    val r = Dimensionality.twoNN(dup).collect()(0)
    assert(r.getLong(1) < r.getLong(0),
      s"n_used=${r.getLong(1)} should drop the d1=0 probe of " +
        s"n_probes=${r.getLong(0)}")
  }

  test("hubness: a planted everyone's-neighbor is the max and skews right") {
    // 30 near-orthogonal points (own axis + tiny jitter: pairwise
    // cos ~ 0) + one all-ones hub whose cos ~ 1/sqrt(d) to EVERY
    // point — the hub is each query's #1 neighbor by construction
    val pts = (1L until 31L).map { i =>
      val a = Array.tabulate(32)(d => jit(i, d + 1) * 0.02f)
      a(i.toInt) = 1.0f
      (i, a)
    }
    val hub = (0L, Array.fill(32)(1.0f))
    val df = (pts :+ hub).toDF("vec_id", "embedding")
    val r = Dimensionality.hubness(df, k = 3, queryMod = 2)
      .collect()(0)
    // even ids 0..30 are queries; the hub is in every non-hub
    // query's top-3 (15 of 16 queries)
    assert(r.getLong(6) >= 12L, s"max_occ=${r.getLong(6)}")
    assert(r.getDouble(5) > 1.0, s"skew=${r.getDouble(5)}")
    assert(r.getDouble(7) > 0.1, "some points are never retrieved")
  }
}
