package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Anomaly, CorpusFilters}
import graft.streaming.TrendMonitor
import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** C4/Gopher filter audits, DoReMi tilting, and the streaming
  * Page–Hinkley dashboard's stream ≡ batch contract. */
class CorpusFiltersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "source", "text")

  test("c4 report: each rule fires on its crafted doc") {
    val d = docs(
      (1L, "s", "A clean page. It has sentences. Three of them."),
      (2L, "s", "code here { return 1; }. Two. Three."),
      (3L, "s", "Lorem Ipsum dolor sit. Two. Three."),
      (4L, "s", "Please enable JavaScript to view. Two. Three."),
      (5L, "s", "We use a Cookie Policy here. Two. Three."),
      (6L, "s", "too short"))
    val r = CorpusFilters.c4Report(d).collect().head
    assert(r.getLong(1) == 6L)                        // n_docs
    assert(r.getLong(2) == 1L, "brace")
    assert(r.getLong(3) == 1L, "lorem")
    assert(r.getLong(4) == 1L, "javascript")
    assert(r.getLong(5) == 1L, "policy")
    assert(r.getLong(6) == 1L, "short")
    assert(r.getLong(8) == 1L, "only doc 1 keeps")
    // line share: single-line docs ending in '.' → 1.0 for docs 1-5,
    // 0.0 for doc 6 → mean 5/6
    assert(math.abs(r.getDouble(7) - 5.0 / 6.0) < 1e-6)
  }

  test("c4 report: multi-line terminal-punctuation share") {
    val d = docs((1L, "s", "Line one.\nno punct line\nLine three!"))
    val r = CorpusFilters.c4Report(d).collect().head
    assert(math.abs(r.getDouble(7) - 2.0 / 3.0) < 1e-6)
  }

  test("gopher report: each rule fires on its crafted doc") {
    // 300 words; top bigram "the of" = 50/299 < 0.2 so doc 1 clears
    // the repetition gate too
    val fifty = (1 to 50)
      .map(i => s"alpha$i beta$i gamma$i the of and").mkString(" ")
    val d = docs(
      (1L, "s", fifty),                               // passes all
      (2L, "s", "the of and short doc only"),         // < 50 words
      (3L, "s", ("a " * 60).trim + " the of"),        // mean len < 3
      (4L, "s", (1 to 60).map(i => "12345").mkString(" ")
        + " the of"),                                 // alpha share low
      (5L, "s", (1 to 60).map(i => s"tok$i").mkString(" ")), // no stops
      (6L, "s", ("dup dup " * 30).trim + " the of"))  // top bigram heavy
    val r = CorpusFilters.gopherReport(d).collect().head
    assert(r.getLong(1) == 6L)
    assert(r.getLong(2) >= 1L, "word count rule")
    assert(r.getLong(3) >= 1L, "mean word length rule")
    assert(r.getLong(4) >= 1L, "alpha share rule")
    assert(r.getLong(5) >= 1L, "stopword rule")
    assert(r.getLong(6) >= 1L, "top bigram rule")
    assert(r.getLong(7) >= 1L, "doc 1 passes")
  }

  test("doremi tilt: closed-form weights and uplift direction") {
    // two sources, 1 doc each (equal shares); the 'good' doc scores
    // higher → weight above 0.5, uplift > 1
    val d = docs(
      (1L, "good", "the cat sat on the mat and then the dog came by too"),
      (2L, "bad", "zzzzzzzzzzzzzzzzzzzzzzzzzzzzzz"))
    val r = CorpusFilters.doremiTilt(d, eta = 2.0).collect()
      .map(x => x.getString(0) -> x).toMap
    val (g, b) = (r("good"), r("bad"))
    assert(math.abs(g.getDouble(2) - 0.5) < 1e-9, "base share")
    // reference closed form
    val qg = g.getDouble(3); val qb = b.getDouble(3)
    val (rg, rb) = (0.5 * math.exp(2.0 * qg), 0.5 * math.exp(2.0 * qb))
    assert(math.abs(g.getDouble(4) - rg / (rg + rb)) < 1e-6)
    assert(math.abs(b.getDouble(4) - rb / (rg + rb)) < 1e-6)
    assert(g.getDouble(4) > b.getDouble(4), "better source upweighted")
    assert(g.getDouble(5) > 1.0 && b.getDouble(5) < 1.0)
    // weights sum to 1
    assert(math.abs(g.getDouble(4) + b.getDouble(4) - 1.0) < 1e-9)
  }

  private def evRow(id: Long, day: Int, v: Double) =
    (id, java.sql.Timestamp.valueOf(f"2024-06-$day%02d 10:00:00"),
      1L, "buy", v, "{}")

  test("streaming page-hinkley dashboard equals the batch detector") {
    val rows1 = (1 to 4).map(d => evRow(d.toLong, d, 10.0))
    val rows2 = (5 to 8).map(d => evRow(d.toLong, d, 90.0)) :+
      evRow(9L, 4, 5.0)   // day 4 split across batches
    def toDF(rs: Seq[(Long, java.sql.Timestamp, Long, String, Double,
        String)]) =
      rs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val root = Files.createTempDirectory("graft_phmon")
    val src = root.resolve("src")
    Files.createDirectories(src)
    def writeOne(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val tmp = root.resolve(name + ".tmp")
      df.coalesce(1).write.parquet(tmp.toString)
      val part = Files.list(tmp).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      Files.move(part, src.resolve(name))
    }
    writeOne("f1.parquet", toDF(rows1))
    writeOne("f2.parquet", toDF(rows2))
    val daily = root.resolve("daily").toString
    TrendMonitor.monitor(spark, src.toString, "*.parquet",
      daily, root.resolve("ckpt").toString, maxFilesPerTrigger = Some(1))
    val streamed = TrendMonitor.pageHinkleyDashboard(spark, daily,
      lambda = 50.0).collect()
    val batch = Anomaly.pageHinkley(toDF(rows1 ++ rows2),
      lambda = 50.0).collect()
    assert(streamed.map(_.toString).toSeq == batch.map(_.toString).toSeq,
      "stream must equal batch row-for-row")
    assert(streamed.exists(_.getBoolean(5)), "the level shift must alarm")
  }

  test("intradoc repetition: a looped phrase fails, clean prose doesn't") {
    val d = docs(
      (1L, "s", "a b c d e f g h i j"),            // 6 grams, distinct
      // "x y z w v" ×3 → 11 grams cycling with period 5 → 5 distinct
      (2L, "s", "x y z w v x y z w v x y z w v"),
      (3L, "s", "too short here now"),             // 4 tokens: excluded
      (4L, "t", "p q r s t u"))
    val r = CorpusFilters.intradocRepetition(d).collect()
    assert(r.length == 2)
    val s = r.find(_.getString(0) == "s").get
    assert(s.getLong(1) == 2L)
    assert(math.abs(s.getDouble(2) - (0.0 + (1.0 - 5.0 / 11)) / 2)
      < 1e-6)
    assert(math.abs(s.getDouble(3) - (1.0 - 5.0 / 11)) < 1e-6)
    assert(s.getLong(4) == 1L, "only the looped doc fails")
    val t = r.find(_.getString(0) == "t").get
    assert(t.getDouble(2) == 0.0 && t.getLong(4) == 0L)
  }
}
