package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRow

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("featurize is deterministic and batch-shape independent") {
    val media = spark.createDataset(Seq(
      MediaRow(1L, "image/png", 4, 4, Array[Byte](1, 2, 3, 4)),
      MediaRow(2L, "audio/wav", 0, 0, Array[Byte](9, 8, 7))))
    val a = Multimodal.featurize(media, batchSize = 1)
      .collect().map(f => (f.media_id, f.checksum)).toMap
    val b = Multimodal.featurize(media, batchSize = 64)
      .collect().map(f => (f.media_id, f.checksum)).toMap
    assert(a == b)
    assert(a(1L) != a(2L))
  }

  test("feature schema carries typed metadata through") {
    val media = spark.createDataset(Seq(
      MediaRow(1L, "image/png", 4, 4, Array[Byte](1, 2, 3, 4))))
    val f = Multimodal.featurize(media).collect()(0)
    assert(f.mime == "image/png" && f.n_bytes == 4L && f.features.length == 8)
  }

  test("binaryFile source ingests opaque assets with glob filtering") {
    val dir = java.nio.file.Files.createTempDirectory("graft_media")
    java.nio.file.Files.write(dir.resolve("a.bin"), Array[Byte](1, 2, 3))
    java.nio.file.Files.write(dir.resolve("b.bin"), Array[Byte](9, 8))
    java.nio.file.Files.write(dir.resolve("skip.txt"), Array[Byte](0))
    val got = Multimodal.readBinaryFiles(spark, dir.toString, "*.bin")
      .selectExpr("path", "length", "content")
      .collect()
      .map(r => (r.getString(0).split('/').last, r.getLong(1),
        r.getAs[Array[Byte]](2).toSeq))
      .sortBy(_._1)
    assert(got.map(t => (t._1, t._2)).toSeq == Seq(("a.bin", 3L), ("b.bin", 2L)))
    assert(got(0)._3 == Seq[Byte](1, 2, 3))
  }
}
