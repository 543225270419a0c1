package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Decontaminate, Scrub, TextQuality}

class CorpusPrepSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("redact rewrites PII patterns and counts hits per rule") {
    val docs = Seq(
      (0L, "mail me at bob.smith+x@example.co.uk or call 555-123-4567"),
      (1L, "server 10.0.0.1 and 192.168.1.255 are up"),
      (2L, "no pii here at all"))
      .toDF("doc_id", "text")
    val out = Scrub.redact(docs, Scrub.piiRules)
      .select("doc_id", "n_email", "n_phone", "n_ipv4", "n_redacted", "redacted")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getLong(1) == 1 && out(0L).getLong(2) == 1)
    assert(out(0L).getString(5) == "mail me at <EMAIL> or call <PHONE>")
    assert(out(1L).getLong(3) == 2 && out(1L).getLong(4) == 2)
    assert(out(1L).getString(5) == "server <IP> and <IP> are up")
    assert(out(2L).getLong(4) == 0 && out(2L).getString(5) == "no pii here at all")
  }

  test("redact applies rules as a chain (later rules see earlier rewrites)") {
    val docs = Seq((0L, "aa bb")).toDF("doc_id", "text")
    val rules = Seq(
      Scrub.Rule("first", "aa", "bb"),
      Scrub.Rule("second", "bb", "cc"))
    val r = Scrub.redact(docs, rules).select("n_first", "n_second", "redacted")
      .collect()(0)
    // "aa bb" -> "bb bb"; the second rule then sees TWO bb hits
    assert((r.getLong(0), r.getLong(1), r.getString(2)) == (1L, 2L, "cc cc"))
  }

  test("repetition metrics: top bigram mass and distinct ratio") {
    val docs = Seq(
      (0L, "spam spam spam spam"),          // "spam spam" x3 of 3 bigrams
      (1L, "a b c d"),                      // all distinct
      (2L, "solo"))                         // 1 token: no bigram row
      .toDF("doc_id", "text")
    val out = TextQuality.repetitionMetrics(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(!out.contains(2L))
    val spam = out(0L)
    assert(spam.getLong(1) == 4 && spam.getLong(2) == 1)
    assert(spam.getDouble(3) == 0.25)
    assert(spam.getString(4) == "spam spam" && spam.getLong(5) == 3)
    assert(spam.getDouble(6) == 1.0)
    val abcd = out(1L)
    assert(abcd.getDouble(3) == 1.0 && abcd.getLong(5) == 1)
    // deterministic tie-break: lexicographically first bigram wins
    assert(abcd.getString(4) == "a b")
  }

  test("decontaminate flags docs sharing an n-gram with the benchmark") {
    val corpus = Seq(
      (0L, "alpha beta gamma delta epsilon"),  // shares "alpha beta gamma" + "beta gamma delta"
      (1L, "beta gamma delta zeta"),           // shares "beta gamma delta"
      (2L, "one two three four"),              // clean
      (3L, "too short"))                       // < n tokens: can't match
      .toDF("doc_id", "text")
    val bench = Seq(
      (100L, "alpha beta gamma delta"),
      (101L, "beta gamma delta"))
      .toDF("doc_id", "text")
    val out = Decontaminate.overlap(corpus, bench, n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((0L, 2L, 2L), (1L, 1L, 2L)))
  }

  test("upsampleByWeight repeats, drops, and defaults rows by key weight") {
    val docs = Seq((0L, "a"), (1L, "b"), (2L, "c"))
      .toDF("doc_id", "source")
    val out = graft.operators.Sampling
      .upsampleByWeight(docs, Map("a" -> 3, "b" -> 0), keyCol = "source")
      .select("doc_id", "epoch")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(out.toSeq == Seq((0L, 1L), (0L, 2L), (0L, 3L), (2L, 1L)))
  }

  test("hashSplit is exhaustive, deterministic, and roughly proportional") {
    val docs = spark.range(0, 2000).toDF("doc_id")
    val splits = Seq(("train", 0.90), ("val", 0.07), ("test", 0.03))
    val out = graft.operators.Sampling.hashSplit(docs, splits)
    val counts = out.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 2000)
    assert(counts("train") > 1700 && counts("train") < 1900)
    assert(counts.getOrElse("val", 0L) > 80)
    assert(counts.getOrElse("test", 0L) > 20)
    // same doc always lands in the same split
    val again = graft.operators.Sampling.hashSplit(docs, splits)
    assert(out.except(again).count() == 0 && again.except(out).count() == 0)
  }

  test("curation pipeline: scrub, repetition filter, prefix dedup, split") {
    val pad = "x0 x1 x2 x3 x4 x5 x6 x7 x8"   // distinct filler, 9 tokens
    val docs = Seq(
      (0L, s"keep me $pad"),                  // survives everything
      (1L, "spam spam spam spam spam spam"),  // repetition junk: dropped
      (2L, s"keep me $pad"),                  // same 40-prefix as 0: deduped
      (3L, s"other document $pad"))           // survives
      .toDF("doc_id", "text")
    val out = graft.operators.Curation.pipeline(
      docs, Seq(graft.operators.Scrub.Rule("t", "zzz", "-")),
      minDistinctRatio = 0.5, dedupPrefix = 40)
      .select("doc_id", "split")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.map(_._1).toSeq == Seq(0L, 3L))
    assert(out.forall(r => Set("train", "val", "test").contains(r._2)))
  }

  test("decontaminate n=1 degenerates to shared-vocabulary overlap") {
    val corpus = Seq((0L, "x y"), (1L, "z")).toDF("doc_id", "text")
    val bench = Seq((9L, "y q")).toDF("doc_id", "text")
    val out = Decontaminate.overlap(corpus, bench, n = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((0L, 1L)))
  }

  test("crossSourceOverlap: planted shared core, containment normalization") {
    val core = "alpha beta gamma delta epsilon"          // 3 shingles
    val docs = Seq(
      ("A", s"$core one two three four"),                // 3 + 4 own = 7
      ("B", s"$core totally different tail words here"), // 3 + 5 own = 8
      ("C", "nothing in common with others at all"))     // 5 shingles
      .toDF("source", "text")
    val got = graft.operators.Decontaminate.crossSourceOverlap(docs, k = 3)
      .as[(String, String, Long, Double)].collect().toSeq
    // only (A, B) share: 3 shingles / min(7, 8)
    assert(got == Seq(("A", "B", 3L, 0.428571)))
  }
}
