package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Concentration

class ConcentrationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def gini(docs: Seq[(Long, String, String)]): Map[String, Double] =
    Concentration.tokenGiniBySource(
      docs.toDF("doc_id", "text", "source"))
      .select("source", "gini").as[(String, Double)].collect().toMap

  private def words(n: Int): String = Seq.fill(n)("w").mkString(" ")

  test("uniform mass is 0; single doc is 0") {
    val uniform = (0L until 10L).map(i => (i, words(7), "u"))
    val single = Seq((99L, words(42), "s"))
    val got = gini(uniform ++ single)
    assert(got("u") == 0.0)
    assert(got("s") == 0.0)
  }

  test("one doc holding all mass among empties approaches (n-1)/n") {
    // values 0,0,0,x → G = 2·4x/(4x) − 5/4 = 0.75
    val docs = Seq((0L, "", "a"), (1L, "", "a"), (2L, "", "a"),
      (3L, words(20), "a"))
    assert(gini(docs)("a") == 0.75)
  }

  test("histogram path matches the sorted-document definition with ties") {
    val sizes = Seq(3, 3, 7, 1, 7, 7, 12, 1)
    val docs = sizes.zipWithIndex.map { case (n, i) =>
      (i.toLong, words(n), "x") }
    val sorted = sizes.sorted.map(_.toDouble)
    val n = sorted.size
    val total = sorted.sum
    val si = sorted.zipWithIndex.map { case (v, i) => v * (i + 1) }.sum
    val expect = BigDecimal(2.0 * si / (n * total) - (n + 1.0) / n)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(gini(docs)("x") == expect)
  }

  test("groups are independent") {
    val docs = Seq((0L, words(5), "a"), (1L, words(5), "a"),
      (2L, words(1), "b"), (3L, words(9), "b"))
    val got = gini(docs)
    assert(got("a") == 0.0)
    // b: sorted 1,9 → 2·(1+18)/(2·10) − 3/2 = 1.9 − 1.5 = 0.4
    assert(got("b") == 0.4)
  }
}
