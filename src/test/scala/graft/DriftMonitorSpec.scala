package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.lake.TableLog
import graft.operators.Drift
import graft.streaming.DriftMonitor
import java.nio.file.Files
import scala.jdk.CollectionConverters._

class DriftMonitorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("per-batch PSI reports append with batch ids; math matches the batch operator") {
    val root = Files.createTempDirectory("graft_driftmon")
    val baseline = root.resolve("baseline").toString
    TableLog.commitOverwrite(spark, baseline,
      (1 to 100).map(i => (i % 10) * 10.0).toDF("v"))
    // two single-FILE parquet sources → two micro-batches at
    // maxFilesPerTrigger=1 (the glob matches leaf files, so each
    // dataset is materialized as one plain .parquet file)
    val src = root.resolve("src")
    Files.createDirectories(src)
    def writeOne(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val tmp = root.resolve(name + ".tmp")
      df.coalesce(1).write.parquet(tmp.toString)
      val part = Files.list(tmp).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      Files.move(part, src.resolve(name))
    }
    writeOne("f1.parquet", (1 to 50).map(_ => 85.0).toDF("v"))
    writeOne("f2.parquet", (1 to 50).map(_ => 15.0).toDF("v"))
    val report = root.resolve("report").toString
    DriftMonitor.monitor(spark, src.toString, "*.parquet",
      baseline, 1, report, "v", bucketWidth = 10.0,
      root.resolve("ckpt").toString, maxFilesPerTrigger = Some(1))
    val got = TableLog.read(spark, report)
    // one report per batch, all buckets of the union of sides
    assert(got.select("batch_id").distinct().count() == 2)
    // each batch's rows equal the batch operator run directly
    val perBatch = got.filter(col("batch_id") === 0)
      .drop("batch_id")
    val direct0 = Drift.psiReport(
      TableLog.read(spark, baseline),
      perBatch.sparkSession.read.parquet(
        src.resolve("f1.parquet").toString), "v", 10.0)
    // batch 0 is whichever file the source listed first; compare
    // against the matching direct run (sum of psi must agree with one)
    val gotSums = got.groupBy("batch_id")
      .agg(round(sum("psi_term"), 6).as("s"))
      .select("s").as[Double].collect().toSet
    val directSums = Seq(
      src.resolve("f1.parquet").toString,
      src.resolve("f2.parquet").toString).map { f =>
      Drift.psiReport(TableLog.read(spark, baseline),
        spark.read.parquet(f), "v", 10.0)
        .agg(round(sum("psi_term"), 6)).collect()(0).getDouble(0)
    }.toSet
    assert(gotSums == directSums)
    assert(direct0.count() > 0)
  }

  test("crash-replay: a batch that already reported commits nothing on replay") {
    val root = Files.createTempDirectory("graft_driftreplay")
    val baseline = root.resolve("baseline").toString
    TableLog.commitOverwrite(spark, baseline, Seq(1.0, 11.0).toDF("v"))
    val report = root.resolve("report").toString
    val batch = Seq(1.0, 1.0, 11.0).toDF("v")
    val n1 = DriftMonitor.reportOnce(spark, batch, baseline, 1, report,
      "v", 10.0, batchId = 7L)
    assert(n1 > 0)
    val v1 = TableLog.latestVersion(spark, report)
    val n2 = DriftMonitor.reportOnce(spark, batch, baseline, 1, report,
      "v", 10.0, batchId = 7L)
    assert(n2 == 0L)
    assert(TableLog.latestVersion(spark, report) == v1)   // no new commit
    // a NEW batch id still reports
    assert(DriftMonitor.reportOnce(spark, batch, baseline, 1, report,
      "v", 10.0, batchId = 8L) > 0)
  }

  test("embedding monitor: batch report equals the batch operator; replay commits nothing") {
    val root = Files.createTempDirectory("graft_embmon")
    val baseline = root.resolve("baseline").toString
    def frame(rows: Seq[(Long, Int, Seq[Float])]) =
      rows.toDF("vec_id", "label", "embedding")
    TableLog.commitOverwrite(spark, baseline,
      frame(Seq((1L, 0, Seq(1f, 0f)), (2L, 0, Seq(1f, 0f)))))
    val report = root.resolve("report").toString
    val batch = frame(Seq((3L, 0, Seq(0f, 2f))))
    val n1 = DriftMonitor.reportEmbeddingOnce(spark, batch, baseline, 1,
      report, batchId = 3L)
    assert(n1 == 1L)
    val got = TableLog.read(spark, report)
      .select("label", "n_old", "n_new", "centroid_cos", "centroid_l2",
        "batch_id")
      .as[(Int, Long, Long, Double, Double, Long)].collect().toSeq
    val direct = Drift.embeddingDrift(TableLog.read(spark, baseline), batch)
      .as[(Int, Long, Long, Double, Double)].collect().toSeq
    assert(got.map(r => (r._1, r._2, r._3, r._4, r._5)) == direct)
    assert(got.head._6 == 3L && got.head._4 == 0.0, got.toString)
    // replay of the same batch id is a no-op commit-wise
    val v1 = TableLog.latestVersion(spark, report)
    assert(DriftMonitor.reportEmbeddingOnce(spark, batch, baseline, 1,
      report, batchId = 3L) == 0L)
    assert(TableLog.latestVersion(spark, report) == v1)
  }

  test("mix monitor: batch report equals the batch operator; replay commits nothing") {
    val root = Files.createTempDirectory("graft_mixmon")
    val baseline = root.resolve("baseline").toString
    TableLog.commitOverwrite(spark, baseline,
      Seq("a", "a", "b").toDF("cat"))
    val report = root.resolve("report").toString
    val batch = Seq("a", "b", "b", "c").toDF("cat")
    val n1 = DriftMonitor.reportMixOnce(spark, batch, baseline, 1,
      report, "cat", batchId = 5L)
    assert(n1 == 3L) // categories a, b, c
    val got = TableLog.read(spark, report)
      .select("category", "n_ref", "n_cur", "p_ref", "p_cur",
        "js_contrib_bits", "js_bits", "batch_id")
      .as[(String, Long, Long, Double, Double, Double, Double, Long)]
      .collect().toSeq.sortBy(_._1)
    val direct = Drift.mixDivergence(
      TableLog.read(spark, baseline), batch, "cat")
      .as[(String, Long, Long, Double, Double, Double, Double)]
      .collect().toSeq
    assert(got.map(r => (r._1, r._2, r._3, r._4, r._5, r._6, r._7)) == direct)
    assert(got.forall(_._8 == 5L))
    // the baseline-only-vs-new-category case stays finite
    assert(got.find(_._1 == "c").exists(r => r._2 == 0L && r._6 > 0.0))
    // replay of the same batch id is a no-op commit-wise
    val v1 = TableLog.latestVersion(spark, report)
    assert(DriftMonitor.reportMixOnce(spark, batch, baseline, 1,
      report, "cat", batchId = 5L) == 0L)
    assert(TableLog.latestVersion(spark, report) == v1)
  }

  test("w1 monitor: batch report equals the batch operator; replay commits nothing") {
    val root = Files.createTempDirectory("graft_w1mon")
    val baseline = root.resolve("baseline").toString
    TableLog.commitOverwrite(spark, baseline,
      Seq(1.0, 1.0, 1.0, 11.0).toDF("v"))
    val report = root.resolve("report").toString
    val batch = Seq(1.0, 11.0, 11.0, 11.0).toDF("v")
    val n1 = DriftMonitor.reportW1Once(spark, batch, baseline, 1,
      report, "v", 10.0, batchId = 4L)
    assert(n1 == 2L)
    val got = TableLog.read(spark, report)
      .select("bucket", "w1_term", "w1", "batch_id")
      .as[(Long, Double, Double, Long)].collect().sortBy(_._1).toList
    // hand case from DriftSpec: |ΔCDF| = (.5, 0) × width 10 → W1 = 5
    assert(got == List((0L, 5.0, 5.0, 4L), (1L, 0.0, 5.0, 4L)))
    val v1 = TableLog.latestVersion(spark, report)
    assert(DriftMonitor.reportW1Once(spark, batch, baseline, 1,
      report, "v", 10.0, batchId = 4L) == 0L)
    assert(TableLog.latestVersion(spark, report) == v1)
  }

  test("auc monitor: batch report equals the batch operator; decay shows as delta") {
    val root = Files.createTempDirectory("graft_aucmon")
    val baseline = root.resolve("baseline").toString
    // validated snapshot: perfectly separated → base_auc = 1.0
    TableLog.commitOverwrite(spark, baseline,
      Seq((0.9, true), (0.8, true), (0.2, false), (0.1, false))
        .toDF("score", "label"))
    val report = root.resolve("report").toString
    // drifted batch: positives fell into the negative score range
    val batch = Seq((0.9, true), (0.2, true), (0.2, false), (0.1, false))
      .toDF("score", "label")
    val n1 = DriftMonitor.reportAucOnce(spark, batch, baseline, 1,
      report, "score", "label", batchId = 2L)
    assert(n1 == 1L)
    val got = TableLog.read(spark, report)
      .select("auc", "base_auc", "delta", "batch_id")
      .as[(Double, Double, Double, Long)].collect().head
    val direct = graft.operators.ClassifierEval
      .aucSummary(batch, "score", "label")
      .select("auc").as[Double].collect().head
    assert(got._1 == direct && got._2 == 1.0)
    assert(got._3 == BigDecimal(direct - 1.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got._4 == 2L && got._3 < 0.0)   // decay is visible
    // replay of the same batch id is a no-op commit-wise
    val v1 = TableLog.latestVersion(spark, report)
    assert(DriftMonitor.reportAucOnce(spark, batch, baseline, 1,
      report, "score", "label", batchId = 2L) == 0L)
    assert(TableLog.latestVersion(spark, report) == v1)
    // a second batch appends a second report row
    assert(DriftMonitor.reportAucOnce(spark,
      Seq((0.7, true), (0.3, false)).toDF("score", "label"),
      baseline, 1, report, "score", "label", batchId = 3L) == 1L)
    assert(TableLog.read(spark, report).count() == 2L)
  }
}
