package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.lake.ZOrder

class ZOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("interleaveBits column expression matches the reference impl") {
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (5L, 9L), (65535L, 1L),
      (12345L, 54321L))
    val got = rows.toDF("a", "b")
      .select(ZOrder.interleaveBits(col("a"), col("b")).as("z"))
      .as[Long].collect().toSeq
    assert(got == rows.map { case (a, b) => ZOrder.interleaveRef(a, b) })
  }

  test("interleave round-trips: de-interleaving recovers the inputs") {
    val rnd = new scala.util.Random(42)
    (0 until 500).foreach { _ =>
      val a = rnd.nextInt(65536).toLong
      val b = rnd.nextInt(65536).toLong
      val z = ZOrder.interleaveRef(a, b)
      var ra = 0L; var rb = 0L
      (0 until 16).foreach { i =>
        ra |= ((z >> (2 * i)) & 1L) << i
        rb |= ((z >> (2 * i + 1)) & 1L) << i
      }
      assert(ra == a && rb == b, s"round-trip failed for ($a, $b)")
    }
  }

  test("cluster keeps all rows and produces the requested file count") {
    val df = (0 until 1000).map(i => (i.toLong, (i * 7 % 100).toLong))
      .toDF("x", "y")
    val clustered = ZOrder.cluster(df, "x", "y", numFiles = 4, bits = 8)
    assert(clustered.count() == 1000)
    assert(clustered.rdd.getNumPartitions == 4)
  }
}
