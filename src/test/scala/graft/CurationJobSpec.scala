package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Scrub
import graft.pipeline.CurationJob
import graft.lake.TableLog
import java.nio.file.Files

class CurationJobSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rules = Seq(Scrub.Rule("t", "secret", "<X>"))
  private val pad = (0 until 9).map(i => s"w$i").mkString(" ")

  test("publishes a validated versioned corpus; reruns replace the snapshot") {
    val dir = Files.createTempDirectory("graft_curation").toString + "/tbl"
    val batch1 = Seq(
      (0L, s"keep one secret $pad"),
      (1L, "spam spam spam spam spam spam"),   // filtered out
      (2L, s"other text $pad"))
      .toDF("doc_id", "text")
    val (c1, mix1) = CurationJob.run(spark, batch1, dir, rules,
      minDistinctRatio = 0.5)
    assert(c1.version == 1)
    val t1 = TableLog.read(spark, dir)
    assert(t1.select("doc_id").as[Long].collect().sorted.toSeq == Seq(0L, 2L))
    // redaction reached the published text
    assert(t1.filter($"doc_id" === 0L).select("redacted")
      .as[String].collect()(0).contains("<X>"))
    assert(mix1.agg(org.apache.spark.sql.functions.sum("n_docs"))
      .collect()(0).getLong(0) == 2L)

    // rerun on a corpus where doc 0 was deleted and doc 7 arrived:
    // the new snapshot reflects BOTH (replace semantics — a merge
    // would strand the deleted doc 0 forever)
    val batch2 = Seq(
      (2L, s"other text $pad"),
      (7L, s"a new arrival $pad"))
      .toDF("doc_id", "text")
    val (c2, _) = CurationJob.run(spark, batch2, dir, rules,
      minDistinctRatio = 0.5)
    assert(c2.version == 2)
    val t2 = TableLog.read(spark, dir)
    assert(t2.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(2L, 7L))
    // prior version still readable (time travel over the curated corpus)
    assert(TableLog.read(spark, dir, Some(1))
      .select("doc_id").as[Long].collect().sorted.toSeq == Seq(0L, 2L))
  }
}
