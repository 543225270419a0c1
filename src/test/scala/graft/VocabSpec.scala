package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Vocab

class VocabSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "en", "the cat sat on the mat"),
    (2L, "en", "the dog sat"),
    (3L, "de", "der hund und der katze"))
    .toDF("doc_id", "lang", "text")

  test("vocab: deterministic rank, tf/df counts, cumulative share") {
    val got = Vocab.build(docs, minCount = 2L, topK = 10)
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    // corpus = 14 tokens; tf>=2: the(3), der(2), sat(2); ties break by token asc
    assert(got == Seq(
      ("the", 3L, 2L, 1L, 0.214286),
      ("der", 2L, 1L, 2L, 0.357143),
      ("sat", 2L, 2L, 3L, 0.5)))
    // topK truncates below the threshold set
    assert(Vocab.build(docs, minCount = 2L, topK = 2).count() == 2)
  }

  test("oov report: per-group token coverage against the built vocab") {
    val vocab = Vocab.build(docs, minCount = 2L, topK = 10)
    val got = Vocab.oovReport(docs, vocab)
      .as[(String, Long, Long, Double)].collect().toSeq
    // de: 5 tokens, 'der' x2 in vocab → 3 OOV; en: 9 tokens,
    // the(3)+sat(2)=5 in vocab → 4 OOV
    assert(got == Seq(
      ("de", 5L, 3L, 0.6),
      ("en", 9L, 4L, 0.444444)))
  }

  test("zipfFit: a perfect 1/rank corpus fits slope exactly -1") {
    // tf = 6, 3, 2 at ranks 1, 2, 3: ln(tf) = ln(6) - 1·ln(rank) exactly
    val text = (Seq.fill(6)("aa") ++ Seq.fill(3)("bb") ++ Seq.fill(2)("cc"))
      .mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val r = Vocab.zipfFit(docs, minCount = 2L, topK = 10).collect()(0)
    assert(r.getDouble(0) == -1.0)
    assert(r.getDouble(1) == BigDecimal(math.log(6.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getLong(2) == 3L)
  }

  test("curriculumShards: equal tiers, easy first, deterministic ties") {
    import graft.operators.Sampling
    val rows = (1L to 8L).map(i => (i, (i % 4).toDouble)).toDF("id", "score")
    val got = Sampling.curriculumShards(rows, "score", 4, Seq("id"))
      .select("id", "shard").as[(Long, Int)].collect().toMap
    // scores: ids 4,8 -> 0.0; 1,5 -> 1.0; 2,6 -> 2.0; 3,7 -> 3.0
    assert(got(4L) == 1 && got(8L) == 1)
    assert(got(1L) == 2 && got(5L) == 2)
    assert(got(2L) == 3 && got(6L) == 3)
    assert(got(3L) == 4 && got(7L) == 4)
  }

  test("growth curve: new types land at their first bucket, cumulative sums agree") {
    // bucketDocs=2: bucket 0 = docs {0,1}, bucket 1 = docs {2,3}
    val d = Seq(
      (0L, "a b"),          // types a,b new
      (1L, "a c"),          // c new
      (2L, "a b d"),        // d new
      (3L, "e e"))          // e new
      .toDF("doc_id", "text")
    val rows = Vocab.growthCurve(d, bucketDocs = 2L).collect()
    assert(rows.length == 2)
    val b0 = rows(0); val b1 = rows(1)
    assert(b0.getAs[Long]("n_tokens") == 4 && b0.getAs[Long]("new_types") == 3)
    assert(b1.getAs[Long]("n_tokens") == 5 && b1.getAs[Long]("new_types") == 2)
    assert(b1.getAs[Long]("cum_tokens") == 9 && b1.getAs[Long]("cum_types") == 5)
    // beta = ln V / ln n under K=1
    assert(math.abs(b1.getAs[Double]("beta_pointwise") -
      math.log(5.0) / math.log(9.0)) < 1e-5)
  }

  test("growth curve: a bucket of pure repeats adds zero new types but keeps its row") {
    val d = Seq((0L, "x y"), (2L, "x y x")).toDF("doc_id", "text")
    val rows = Vocab.growthCurve(d, bucketDocs = 2L).collect()
    assert(rows.map(_.getAs[Long]("new_types")).toSeq == Seq(2L, 0L))
    assert(rows.last.getAs[Long]("cum_types") == 2L)
  }

  test("lexical kl: corpus-identical source scores 0; dialect source scores high") {
    // a and b share the corpus distribution exactly (same text);
    // c speaks its own vocabulary entirely
    val d = Seq(
      (0L, "x y x z", "a"), (1L, "x y x z", "b"),
      (2L, "q q r s", "c"))
      .toDF("doc_id", "text", "source")
    val got = Vocab.lexicalKl(d)
      .select("source", "kl_bits").as[(String, Double)].collect().toMap
    // a's p == b's p but corpus q mixes in c's mass → small positive;
    // the ordering is the contract: c ≫ a ≈ b
    assert(got("a") == got("b"))
    assert(got("c") > got("a") && got("c") > 1.0)
    // a single-source corpus IS the corpus → exactly 0
    val solo = Vocab.lexicalKl(
      Seq((0L, "x y x z", "only")).toDF("doc_id", "text", "source"))
      .select("kl_bits").as[Double].collect().head
    assert(solo == 0.0)
  }

  test("neyman: allocation follows N·σ, not row share") {
    // stratum a: many rows, zero variance; b: few rows, high variance
    val d = (
      (1 to 90).map(i => (i.toLong, "t", "a", 100L)) ++
        Seq((91L, "t", "b", 0L), (92L, "t", "b", 1000L))
      ).toDF("doc_id", "text", "source", "n_chars")
    val gotMap = graft.operators.Sampling.neymanAllocation(
      d, "source", "n_chars", budget = 100L)
      .select("stratum", "alloc_neyman", "alloc_proportional")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // zero-variance stratum gets NOTHING under Neyman despite 90% of
    // rows; proportional gives it 98
    assert(gotMap("a") == ((0L, 98L)))
    assert(gotMap("b") == ((100L, 2L)))
  }

  test("neyman: all-constant corpus falls back to proportional, no nulls") {
    // every stratum zero-variance → Σ N·σ = 0: shares must be the
    // proportional ones, not NULL/÷0
    val d = ((1 to 30).map(i => (i.toLong, "t", "a", 7L)) ++
      (31 to 40).map(i => (i.toLong, "t", "b", 9L)))
      .toDF("doc_id", "text", "source", "n_chars")
    val rows = graft.operators.Sampling.neymanAllocation(
      d, "source", "n_chars", budget = 100L)
      .select("stratum", "neyman_share", "alloc_neyman").collect()
    assert(rows.forall(r => !r.isNullAt(1) && !r.isNullAt(2)))
    val m = rows.map(r => r.getString(0) ->
      ((r.getDouble(1), r.getLong(2)))).toMap
    assert(m("a") == ((0.75, 75L)) && m("b") == ((0.25, 25L)))
  }

  test("js matrix: identical 0, disjoint 1, hand-computed mixed pair") {
    val d = Seq(
      (0L, "x y", "a"), (1L, "x y", "b"),   // identical dists
      (2L, "q q", "c")                      // disjoint from both
    ).toDF("doc_id", "text", "source")
    val got = graft.operators.Vocab.jsDivergenceMatrix(d)
      .select("src_a", "src_b", "n_shared", "js_bits")
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got(("a", "b")) == ((2L, 0.0)))
    assert(got(("a", "c")) == ((0L, 1.0)))
    assert(got(("b", "c")) == ((0L, 1.0)))
    // mixed: a = {x:1}, b = {x:½, y:½} → JS = ½[1·log2(4/3)] +
    //   ½[½·log2(2/3) + ½·1] — the one-sided y mass enters closed-form
    val m = Seq((0L, "x", "a"), (1L, "x y", "b"))
      .toDF("doc_id", "text", "source")
    val expect = BigDecimal(0.5 * (math.log(4.0 / 3.0) / math.log(2.0)) +
      0.5 * (0.5 * math.log(2.0 / 3.0) / math.log(2.0) + 0.5))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val one = graft.operators.Vocab.jsDivergenceMatrix(m)
      .select("js_bits").as[Double].collect().head
    assert(one == expect)
  }

  test("rbo: identical rankings score 1; disjoint score 0") {
    val a = Seq((0L, "x x x y y z"), (1L, "x y z"))
      .toDF("doc_id", "text")
    val same = Vocab.rankBiasedOverlap(a, a, k = 3, p = 0.9)
      .select("rbo", "jaccard_top_k", "overlap_at_k")
      .as[(Double, Double, Long)].collect().head
    // truncated RBO at K=3 with full agreement: (1-p)·Σ p^(d-1) = 1-p³
    val expect = BigDecimal(1.0 - math.pow(0.9, 3))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(same == ((expect, 1.0, 3L)))
    val b = Seq((0L, "q q q r r s")).toDF("doc_id", "text")
    val disj = Vocab.rankBiasedOverlap(a, b, k = 3)
      .select("rbo").as[Double].collect().head
    assert(disj == 0.0)
  }

  test("rbo: jaccard uses actual list lengths when a slice has < k tokens") {
    // both slices have only 2 distinct tokens at k=3: identical lists
    // must score jaccard 1.0 (2/(2+2−2)), not 2/(2·3−2) = 0.5
    val two = Seq((0L, "x x y")).toDF("doc_id", "text")
    val got = Vocab.rankBiasedOverlap(two, two, k = 3)
      .select("overlap_at_k", "jaccard_top_k")
      .as[(Long, Double)].collect().head
    assert(got == ((2L, 1.0)))
  }

  test("rbo: head agreement outweighs equal-sized tail agreement") {
    def docs(tokens: Seq[(String, Int)]) =
      Seq((0L, tokens.flatMap { case (t, n) => Seq.fill(n)(t) }
        .mkString(" "))).toDF("doc_id", "text")
    val base = docs(Seq("a" -> 9, "b" -> 8, "c" -> 7, "d" -> 6))
    // headSame agrees on ranks 1-2, differs after; tailSame agrees on
    // ranks 3-4 only
    val headSame = docs(Seq("a" -> 9, "b" -> 8, "x" -> 7, "y" -> 6))
    val tailSame = docs(Seq("x" -> 9, "y" -> 8, "c" -> 7, "d" -> 6))
    def rbo(other: org.apache.spark.sql.DataFrame) =
      Vocab.rankBiasedOverlap(base, other, k = 4)
        .select("rbo").as[Double].collect().head
    assert(rbo(headSame) > rbo(tailSame),
      "rank-1-2 agreement must outweigh rank-3-4 agreement")
  }

  test("unseen mass: hand-computed f1/f2/chao1; exhausted source near 0") {
    // source a: tokens x x y z → tf {x:2, y:1, z:1} → f1=2 f2=1
    // unseen = 2/4; chao1 = 3 + 2·1/(2·2) = 3.5
    // source b: w repeated 10 times → f1=0, unseen=0, chao1 = 1
    val d = Seq((0L, "x x y z", "a"), (1L, Seq.fill(10)("w").mkString(" "), "b"))
      .toDF("doc_id", "text", "source")
    val got = Vocab.unseenMass(d)
      .select("source", "n_tokens", "n_types", "f1", "f2",
        "unseen_mass", "chao1")
      .as[(String, Long, Long, Long, Long, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(got("a") == (("a", 4L, 3L, 2L, 1L, 0.5, 3.5)))
    assert(got("b") == (("b", 10L, 1L, 0L, 0L, 0.0, 1.0)))
  }

  test("novelty curve: fresh text is 1.0, verbatim re-ingest is 0.0") {
    val fresh = "a b c d e f g h i j"           // 3 distinct 8-grams
    val other = "q r s t u v w x y z"
    val d = Seq((0L, fresh), (1L, other), (2L, fresh), (3L, other))
      .toDF("doc_id", "text")
    val rows = Vocab.noveltyCurve(d, k = 8, bucketDocs = 2L)
      .select("bucket", "n_grams", "n_novel", "novelty_frac", "cum_novelty")
      .as[(Long, Long, Long, Double, Double)].collect().toList
    assert(rows == List((0L, 6L, 6L, 1.0, 1.0),
      (1L, 6L, 0L, 0.0, 0.5)))
  }

  test("novelty curve: partial phrase overlap attributes at first occurrence") {
    // doc 2 shares a 4-token suffix→prefix overlap with doc 0 long
    // enough to repeat exactly one 8-gram
    val a = "w1 w2 w3 w4 w5 w6 w7 w8 w9"        // grams at 1..2
    val b = "w2 w3 w4 w5 w6 w7 w8 w9 x1 x2"     // first gram = a's 2nd
    val d = Seq((0L, a), (5L, b)).toDF("doc_id", "text")
    val rows = Vocab.noveltyCurve(d, k = 8, bucketDocs = 5L)
      .select("bucket", "n_grams", "n_novel")
      .as[(Long, Long, Long)].collect().toList
    assert(rows == List((0L, 2L, 2L), (1L, 3L, 2L)))
  }
}
