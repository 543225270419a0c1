package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.Dedup

class TextDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docA = "the quick brown fox jumps over the lazy dog near the old river bank today"
  private val docANear = "the quick brown fox jumps over the lazy dog near the old river bank tomorrow"
  private val docB = "completely different words describing unrelated machinery parts and spare tooling inventory lists"

  private val docs = Seq(
    (0L, docA), (1L, docANear), (2L, docB), (3L, docA))
    .toDF("doc_id", "text")

  test("token count / shingles") {
    val r = spark.range(1).select(
      TextFunctions.tokenCount(lit("  a b  c ")).as("n"),
      TextFunctions.shingles(lit("a b c d"), 3).as("sh"))
      .collect()(0)
    assert(r.getInt(0) == 3)
    assert(r.getSeq[String](1) == Seq("a b c", "b c d"))
  }

  test("langId picks the language with most stopword hits") {
    val r = spark.range(1).select(
      TextFunctions.langId(lit("the cat is on the mat")).as("en"),
      TextFunctions.langId(lit("der hund ist nicht ein katze")).as("de"),
      TextFunctions.langId(lit("zzz qqq www")).as("und"))
      .collect()(0)
    assert((r.getString(0), r.getString(1), r.getString(2)) == ("en", "de", "und"))
  }

  test("exact dedup groups identical texts") {
    val got = Dedup.exact(docs).as[(Long, Long)].collect().toSeq
    assert(got.contains((0L, 2L)))   // docA appears twice, canonical id 0
    assert(got.length == 3)          // 3 distinct texts
  }

  test("minhash LSH surfaces the planted near-duplicate pair") {
    val cands = Dedup.minHashCandidates(docs, k = 3, numHashes = 32, bands = 16)
    val pairs = cands.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))   // near-dup
    assert(pairs.contains((0L, 3L)))   // exact dup
    assert(!pairs.contains((0L, 2L)))  // unrelated
  }

  test("minhash LSH: checkpointed (TableLog spill) and cached paths agree") {
    // spillTo writes the signature table through a TableLog commit and
    // reads it back as files — the 100 TB shape with no executor-cache
    // dependency. Candidates must be identical to the cached mode, and
    // the spill must be a durable readable table.
    val dir = java.nio.file.Files.createTempDirectory("sigspill").toString
    val cached = Dedup.minHashCandidates(docs, k = 3, numHashes = 32, bands = 16)
      .as[(Long, Long, Double)].collect().toSet
    val spilled = Dedup.minHashCandidates(docs, k = 3, numHashes = 32, bands = 16,
      spillTo = Some(s"$dir/sigs"))
      .as[(Long, Long, Double)].collect().toSet
    assert(spilled == cached)
    val persisted = graft.lake.TableLog.read(spark, s"$dir/sigs")
    assert(persisted.columns.toSeq == Seq("doc_id", "minhash_sig"))
    assert(persisted.count() == 4)   // all docs have >= 3 tokens
    // and the composed pipeline agrees across modes too
    val keptCached = Dedup.fuzzyDedupKeepFirst(docs).as[Long].collect().toSet
    val keptSpilled = Dedup.fuzzyDedupKeepFirst(docs,
      spillTo = Some(s"$dir/sigs2")).as[Long].collect().toSet
    assert(keptSpilled == keptCached)
  }

  test("jaccard verification scores the near-dup high and is symmetric-safe") {
    val cands = Seq((0L, 1L), (0L, 2L)).toDF("id_a", "id_b")
    val got = Dedup.jaccardVerify(docs, cands, k = 3, threshold = 0.0)
      .as[(Long, Long, Double)].collect().toSeq
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(got((0L, 1L)) > 0.7)
    assert(got((0L, 2L)) == 0.0)
  }

  test("composed fuzzy-dedup pipeline keeps one canonical doc per near-dup group") {
    // the EXACT operator + parameters q54 ships — one implementation,
    // asserted here, so the query and the test can't drift apart
    val kept = Dedup.fuzzyDedupKeepFirst(docs,
      k = 3, numHashes = 32, bands = 8, maxBucket = 200, threshold = 0.5)
      .as[Long].collect().toSet
    // 1 (near-dup of 0) and 3 (exact dup of 0) drop; 0 and 2 survive
    assert(kept == Set(0L, 2L))
  }

  test("simhash: identical docs share fingerprint; near-dups are close") {
    val fps = Dedup.simHash(docs).as[(Long, Long)].collect().toMap
    assert(fps(0L) == fps(3L))
    val hamming = java.lang.Long.bitCount(fps(0L) ^ fps(1L))
    assert(hamming <= 8, s"near-dup hamming was $hamming")
    val hammingFar = java.lang.Long.bitCount(fps(0L) ^ fps(2L))
    assert(hammingFar > hamming)
  }

  test("native simhash64 matches the explode+groupBy aggregate formulation") {
    val varied = docs.unionByName(Seq(
      (10L, "one"), (11L, "alpha beta gamma delta epsilon zeta"),
      (12L, "a a a a a b"), (13L, "  padded   whitespace   everywhere  "))
      .toDF("doc_id", "text"))
      .filter(size(TextFunctions.tokens(col("text"))) >= 1)
    val tok = varied.select(col("doc_id"),
      explode(TextFunctions.tokens(col("text"))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitVotes = (0 until 64).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"b$j")
    }
    val voted = tok.groupBy(col("doc_id")).agg(bitVotes.head, bitVotes.tail: _*)
    val fpAgg = (0 until 64).foldLeft(lit(0L)) { (acc, j) =>
      acc.bitwiseOR(shiftleft(when(col(s"b$j") > 0, 1L).otherwise(0L), j))
    }
    val expected = voted.select(col("doc_id"), fpAgg.as("simhash"))
      .as[(Long, Long)].collect().toMap
    val got = Dedup.simHash(varied).as[(Long, Long)].collect().toMap
    assert(got == expected)
  }

  test("native jaccard_sim matches the array_intersect/union formulation") {
    val cases = Seq(
      (Seq(1L, 2L, 3L), Seq(2L, 3L, 4L)),
      (Seq(1L, 1L, 2L), Seq(2L, 2L, 3L)),   // duplicate runs on both sides
      (Seq.empty[Long], Seq.empty[Long]),   // both empty -> 0.0
      (Seq(5L), Seq.empty[Long]),
      (Seq(1L, 2L), Seq(1L, 2L)))
      .toDF("a", "b")
    val got = cases.select(
      graft.functions.JaccardSimilarity.jaccardSim(col("a"), col("b")).as("n"),
      when(size(array_union(col("a"), col("b"))) === 0, 0.0d)
        .otherwise(size(array_intersect(col("a"), col("b"))).cast("double") /
          size(array_union(col("a"), col("b")))).as("ref"))
      .as[(Double, Double)].collect()
    got.foreach { case (n, ref) => assert(n == ref) }
    // SQL registration
    GraftExtensions.register(spark)
    val viaSql = spark.sql("SELECT jaccard_sim(array(1L,2L,3L), array(2L,3L,4L)) AS j")
      .collect()(0).getDouble(0)
    assert(viaSql == 2.0 / 4.0)
  }

  test("fingerprint is content-determined") {
    val fp = docs.select(col("doc_id"),
      TextFunctions.fingerprint(col("text")).as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(fp(0L) == fp(3L))
    assert(fp(0L) != fp(2L))
  }
}
