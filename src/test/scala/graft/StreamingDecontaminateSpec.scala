package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.operators.Decontaminate
import graft.streaming.StreamingDecontaminate
import graft.lake.TableLog

/** Gate semantics at the decision boundary, coverage of zero-overlap
  * and sub-n documents, batch-split invariance, and replay
  * idempotence of the per-batch commit. */
class StreamingDecontaminateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val bench = Seq((100L, "alpha beta gamma delta epsilon"))
    .toDF("doc_id", "text")
  private def grams = Decontaminate.benchGrams(bench, n = 4)

  private def decide(docs: Seq[(Long, String)], rejectMin: Long = 2L) =
    Decontaminate.gateDecisions(docs.toDF("doc_id", "text"), grams,
        n = 4, rejectMin = rejectMin)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap

  test("rejectMin boundary: n-1 shared grams admits, n rejects") {
    // bench 4-grams: {a b g d, b g d e}. doc 1 shares exactly one,
    // doc 2 shares both.
    val d = decide(Seq(
      (1L, "alpha beta gamma delta zeta"),
      (2L, "alpha beta gamma delta epsilon")))
    assert(d(1L) == ((1L, true)), s"one shared gram < rejectMin=2: $d")
    assert(d(2L) == ((2L, false)), s"two shared grams rejects: $d")
  }

  test("zero-overlap and sub-n-token docs report 0 and admit") {
    val d = decide(Seq(
      (3L, "totally unrelated words go here"),
      (4L, "tiny doc")))
    assert(d(3L) == ((0L, true)))
    assert(d(4L) == ((0L, true)), "3 tokens -> no 4-grams -> clean")
  }

  test("within-doc gram repeats count once toward the threshold") {
    val d = decide(Seq(
      (5L, "alpha beta gamma delta zeta alpha beta gamma delta zeta")))
    assert(d(5L)._1 == 1L,
      s"repeated 'alpha beta gamma delta' is ONE distinct shared gram: $d")
  }

  test("gateOnce replays idempotently: same batchId commits once") {
    val root = java.nio.file.Files.createTempDirectory("sdecon_spec")
    val decisions = root.resolve("dec").toString
    val benchPath = root.resolve("bench").toString
    grams.coalesce(1).write.parquet(benchPath)
    val batch = Seq((1L, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val n1 = StreamingDecontaminate.gateOnce(spark, batch, benchPath,
      decisions, batchId = 0L, n = 4, rejectMin = 2L)
    val n2 = StreamingDecontaminate.gateOnce(spark, batch, benchPath,
      decisions, batchId = 0L, n = 4, rejectMin = 2L)
    assert(n1 == 1L && n2 == 0L, s"replay must skip: $n1 / $n2")
    assert(TableLog.read(spark, decisions).count() == 1L)
  }

  test("bounded run equals the one-shot batch gate (batch-split invariance)") {
    val dir = "/root/testdata/sf0.001"
    val streamed = StreamingDecontaminate.gateDocuments(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val docs = graft.io.Sources.table(spark, dir, "documents")
    val oneShot = Decontaminate.gateDecisions(
        docs.filter(col("doc_id") % 41 =!= 0),
        Decontaminate.benchGrams(
          docs.filter(col("doc_id") % 41 === 0), n = 4),
        n = 4, rejectMin = 2L)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(streamed.toSeq == oneShot.toSeq)
    assert(streamed.nonEmpty)
  }
}
