package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.BpeTrainer

/** BPE training verified against an independent in-memory reference
  * implementation (textbook Sennrich '16 greedy merges), plus the
  * application-side invariants: symbol concatenation reconstructs the
  * word, and merge application is greedy left-to-right. */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Sep = "\u0001"

  /** Plain-Scala reference BPE: same tokenization (whitespace), same
    * tie-break ((count desc, "l<sep>r" asc)), same stop rule. */
  private def refBpe(texts: Seq[String], numMerges: Int,
      minCount: Long): Seq[(String, String, Long)] = {
    val freqs = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    texts.foreach(_.trim.split("\\s+").filter(_.nonEmpty)
      .foreach(w => freqs(w) = freqs.getOrElse(w, 0L) + 1L))
    var words: Seq[(Vector[String], Long)] = freqs.toSeq.map { case (w, f) =>
      (w.map(_.toString).toVector :+ BpeTrainer.EndWord, f) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var stop = false
    while (!stop && out.length < numMerges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- words; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
      val best = counts.toSeq
        .sortBy { case ((l, r), c) => (-c, l + Sep + r) }.headOption
      best match {
        case Some(((l, r), c)) if c >= minCount =>
          out += ((l, r, c))
          words = words.map { case (syms, f) =>
            val b = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
                b += (l + r); i += 2
              } else { b += syms(i); i += 1 }
            }
            (b.result(), f)
          }
        case _ => stop = true
      }
    }
    out.toSeq
  }

  private val corpus = Seq(
    "low low low low low",
    "lower lower",
    "newest newest newest newest newest newest",
    "widest widest widest")

  test("distributed merges equal the textbook reference, in order") {
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = BpeTrainer.fit(docs, "text", numMerges = 12, minPairCount = 2)
      .map(m => (m.left, m.right, m.count))
    val want = refBpe(corpus, numMerges = 12, minCount = 2)
    assert(got == want, s"\ngot:  $got\nwant: $want")
  }

  test("early stop when no pair reaches minPairCount") {
    val docs = Seq((1L, "ab cd ef")).toDF("doc_id", "text")
    val got = BpeTrainer.fit(docs, "text", numMerges = 10, minPairCount = 2)
    assert(got.isEmpty, "all pairs are singletons; nothing to merge")
  }

  test("tokenizeWith reconstructs every word and applies merges greedily") {
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val merges = BpeTrainer.fit(docs, "text", numMerges = 8, minPairCount = 2)
    assert(merges.nonEmpty)
    val toks = BpeTrainer.tokenizeWith(docs, merges)
      .select($"text", $"bpe_syms").as[(String, Seq[Seq[String]])].collect()
    toks.foreach { case (text, wordSyms) =>
      val words = text.trim.split("\\s+").filter(_.nonEmpty).toSeq
      assert(wordSyms.length == words.length)
      words.zip(wordSyms).foreach { case (w, syms) =>
        // merges may legitimately absorb the end-of-word marker (e.g.
        // 'newest' + '</w>' → one symbol), so the invariant is on the
        // CONCATENATION: symbols always reconstruct word + marker
        assert(syms.mkString == w + BpeTrainer.EndWord,
          s"symbols must reconstruct '$w', got $syms")
      }
    }
  }

  test("driver-side fit equals the distributed rounds merge-for-merge") {
    val messy = corpus ++ Seq("tie tie pie pie", "ab ab ba ba")
    val docs = messy.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val driver = BpeTrainer.fit(docs, "text", numMerges = 15,
      minPairCount = 2)
    val distributed = BpeTrainer.fit(docs, "text", numMerges = 15,
      minPairCount = 2, maxDriverWords = 0L)
    assert(driver == distributed,
      s"\ndriver:      $driver\ndistributed: $distributed")
  }

  test("native bpe_apply is byte-identical to the regex-tower reference") {
    // messy corpus: repeats (memo path), unicode incl. a surrogate
    // pair, digits/punct, the stripped U+0001 separator, words that
    // fuse </w>, runs that exercise greedy non-overlap, empty-ish docs
    val messy = Seq(
      "low lower lowest low low newest newest",
      "aaaa aaa aa a",
      "héllo héllo naïve 😀ab a😀b cœur",
      "xy ab ",
      "punct, punct, punct. 123 1234 12",
      "   ", "singleword",
      "newest newest newest widest widest low")
    val docs = messy.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val merges = BpeTrainer.fit(docs, "text", numMerges = 20,
      minPairCount = 2)
    assert(merges.nonEmpty)
    val native = BpeTrainer.tokenizeWith(docs, merges)
      .select($"doc_id", $"bpe_syms").as[(Long, Seq[Seq[String]])]
      .collect().sortBy(_._1)
    val regex = BpeTrainer.tokenizeWithRegex(docs, merges)
      .select($"doc_id", $"bpe_syms").as[(Long, Seq[Seq[String]])]
      .collect().sortBy(_._1)
    assert(native.length == regex.length)
    native.zip(regex).foreach { case ((id1, a), (id2, b)) =>
      assert(id1 == id2)
      assert(a == b, s"doc $id1: native $a != regex $b")
    }
  }

  test("merge application is greedy left-to-right on runs") {
    // 'aaaa' with the single merge (a,a) must become [aa, aa, </w>];
    // 'aaa' becomes [aa, a, </w>] — the consumed-boundary bug would
    // yield [aa, a, a, </w>] on 'aaaa'
    val docs = Seq((1L, "aaaa aaa")).toDF("doc_id", "text")
    val m = Seq(BpeTrainer.Merge(1, "a", "a", 99L))
    val got = BpeTrainer.tokenizeWith(docs, m)
      .select($"bpe_syms").as[Seq[Seq[String]]].collect().head
    assert(got == Seq(
      Seq("aa", "aa", BpeTrainer.EndWord),
      Seq("aa", "a", BpeTrainer.EndWord)), got.toString)
  }
}
