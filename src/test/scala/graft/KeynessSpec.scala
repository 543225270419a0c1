package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Keyness, Matching}

/** Hand-computed keyness/collocation cases and the IPW-vs-CEM
  * estimator identity on a balanced design. */
class KeynessSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("dunning llr: shibboleth token tops the list with the exact G2") {
    // A says "x" often, B never; shared filler "f" is uninformative
    val docs = (Seq.fill(6)((true, "x f f f")) ++
      Seq.fill(6)((false, "y f f f")))
      .zipWithIndex.map { case ((a, t), i) =>
        (i.toLong, t, if (a) "en" else "de", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Keyness.dunningLlr(docs, col("lang") === "en",
      minCount = 5L).collect()
    // filler 'f' has identical rates → G² = 0; 'x' is A-exclusive
    val byTok = r.map(x => x.getString(0) -> x).toMap
    assert(byTok("f").getDouble(3) == 0.0)
    val x = byTok("x")
    assert(x.getLong(1) == 6L && x.getLong(2) == 0L &&
      x.getBoolean(4))
    // exact G² for the 2x2 (6,0) vs totals (24,24): both cells at
    // expectation 3 → 2·6·ln2
    assert(math.abs(x.getDouble(3) - 2.0 * 6.0 * math.log(2.0)) < 1e-6)
    // ranking: the shibboleths outrank the filler
    assert(r.head.getString(0) == "x" || r.head.getString(0) == "y")
  }

  test("fightin words: shrinkage keeps rare-word z below common-word z") {
    // 'common' is 40-vs-0, 'rare' is 2-vs-0 (below minCount=5 when
    // filtered; use minCount=1 to expose the shrinkage ordering)
    val aText = (Seq.fill(40)("common") ++ Seq.fill(2)("rare") ++
      Seq.fill(40)("f")).mkString(" ")
    val bText = (Seq.fill(40)("bword") ++ Seq.fill(2)("brare") ++
      Seq.fill(40)("f")).mkString(" ")
    val docs = Seq((1L, aText, "en", "s", 1L), (2L, bText, "de", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Keyness.monroeLogOdds(docs, col("lang") === "en",
      minCount = 1L).collect().map(x => x.getString(0) -> x).toMap
    assert(r("common").getDouble(4) > r("rare").getDouble(4),
      "the prior must shrink the hapax-ish z below the common word's")
    assert(r("common").getDouble(4) > 0.0 && r("rare").getDouble(4) > 0.0)
    // symmetric token reads ~0
    assert(math.abs(r("f").getDouble(4)) < 1.0)
  }

  test("collocations: a planted fixed phrase tops PMI with exact count") {
    // "alpha beta" always adjacent (8 times); fillers vary
    val docs = (1 to 8).map(i =>
      (i.toLong, s"alpha beta w$i v$i alpha beta x$i", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Keyness.collocations(docs, minCount = 5L).collect()
    assert(r.nonEmpty)
    val top = r.head
    assert(top.getString(0) == "alpha" && top.getString(1) == "beta")
    assert(top.getLong(2) == 16L)
    assert(top.getDouble(4) > 3.0, s"t=${top.getDouble(4)}")
  }

  test("burrows delta: template twins read closer than a stranger") {
    // A and B share the same word profile; C inverts it
    def doc(id: Long, src: String, t: String) =
      (id, t, "en", src, t.length.toLong)
    val docs = Seq(
      doc(1, "A", "the the the of of and cat"),
      doc(2, "A", "the the the of of and dog"),
      doc(3, "B", "the the the of of and fox"),
      doc(4, "B", "the the the of of and owl"),
      doc(5, "C", "cat cat cat dog dog fox the"),
      doc(6, "C", "owl owl owl fox fox dog the"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Keyness.burrowsDelta(docs, topKWords = 5).collect()
      .map(x => (x.getString(0), x.getString(1)) -> x.getDouble(3))
      .toMap
    assert(r(("A", "B")) < r(("A", "C")),
      s"AB=${r(("A", "B"))} AC=${r(("A", "C"))}")
    assert(r(("A", "B")) < r(("B", "C")))
  }

  test("lexical richness: exact spectrum arithmetic on a hand corpus") {
    import graft.operators.Vocab
    // tokens: a a a b b c → N=6 V=3 V1=1 V2=1, Σm²V = 14
    val docs = Seq((1L, "a a a b b c", "en", "s", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Vocab.lexicalRichness(docs).collect().head
    assert(r.getLong(0) == 6L && r.getLong(1) == 3L)
    assert(r.getLong(2) == 1L && r.getLong(3) == 1L)
    assert(r.getDouble(4) == 0.5)
    assert(math.abs(r.getDouble(6) - 1e4 * 8.0 / 36.0) < 1e-4)
    assert(math.abs(r.getDouble(7) - 1.0 / 3.0) < 1e-6)
    assert(math.abs(r.getDouble(8) -
      100.0 * math.log(6.0) / (1.0 - 1.0 / 3.0)) < 1e-4)
    // all-hapax corpus: Honoré undefined → NULL
    val hap = Vocab.lexicalRichness(
      Seq((1L, "p q r s", "en", "s", 7L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
      .collect().head
    assert(hap.isNullAt(8))
    // Yule's K reads repetition: templated text ≫ diverse text
    val rep = Vocab.lexicalRichness(
      Seq((1L, Seq.fill(50)("tmpl").mkString(" ") + " x y", "en", "s", 1L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
      .collect().head
    assert(rep.getDouble(6) > r.getDouble(6))
  }

  test("weighted kappa: perfect agreement 1, off-by-scale worse than off-by-one") {
    import graft.quality.Agreement
    def df(pairs: Seq[(Long, Long)]) = pairs.toDF("a", "b")
    val perfect = Agreement.weightedKappa(
      df(Seq((0L, 0L), (1L, 1L), (2L, 2L), (0L, 0L), (1L, 1L))),
      col("a"), col("b")).collect().head
    assert(perfect.getDouble(4) == 1.0)
    // same marginals, different disagreement DISTANCE: off-by-one
    // beats off-by-two under quadratic weights
    val offOne = Agreement.weightedKappa(
      df(Seq((0L, 1L), (1L, 0L), (1L, 2L), (2L, 1L), (0L, 0L),
        (2L, 2L))), col("a"), col("b")).collect().head
    val offTwo = Agreement.weightedKappa(
      df(Seq((0L, 2L), (2L, 0L), (1L, 1L), (1L, 1L), (0L, 0L),
        (2L, 2L))), col("a"), col("b")).collect().head
    assert(offOne.getDouble(4) > offTwo.getDouble(4))
    // constant raters: chance disagreement 0 → NULL
    val const = Agreement.weightedKappa(
      df(Seq((1L, 1L), (1L, 1L))), col("a"), col("b")).collect().head
    assert(const.isNullAt(4))
  }

  test("ipw att equals cem att on a design with balanced strata") {
    // one stratum, so both estimators reduce to the same difference
    // of means: treated {10, 14}, control {1, 3} → ATT = 10
    val units = Seq(
      (1L, true, 10.0), (2L, true, 14.0),
      (3L, false, 1.0), (4L, false, 3.0)).toDF("u", "t", "y")
    val ipw = Matching.ipwAtt(units, lit(1), col("t"), col("y"))
      .collect().head
    val cem = Matching.cemAtt(units, lit(1), col("t"), col("y"))
      .collect().head
    assert(ipw.getDouble(4) == 10.0 && cem.getDouble(5) == 10.0)
    // unmatched strata drop: add a treated-only stratum — ATT from
    // the matched stratum only
    val extra = units.union(Seq((5L, true, 99.0)).toDF("u", "t", "y")
      .select(col("u"), col("t"), col("y")))
    val ipw2 = Matching.ipwAtt(extra,
      when(col("u") === 5L, 2).otherwise(1), col("t"), col("y"))
      .collect().head
    assert(ipw2.getLong(3) == 1L && ipw2.getDouble(4) == 10.0)
    // fully degenerate design — every stratum one-armed, so zero
    // matched strata: att_ipw is NULL (undefined), not a confident
    // 0.0 effect, matching naive_diff's null propagation
    val oneArmed = Seq((1L, true, 10.0), (2L, true, 14.0))
      .toDF("u", "t", "y")
    val ipw3 = Matching.ipwAtt(oneArmed, lit(1), col("t"), col("y"))
      .collect().head
    assert(ipw3.getLong(3) == 0L && ipw3.isNullAt(4) && ipw3.isNullAt(5))
  }
}
