package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SkewAdvisor

/** Stats contract of the skew profile: exact max/avg/ratio, the
  * deterministic hottest-key tie-break (count desc, key asc), the
  * salt recommendation cap, and null keys excluded from profiling. */
class SkewAdvisorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("profile row: counts, ratio, top key, salt") {
    val df = (Seq.fill(8)("a") ++ Seq("b", "c")).toDF("k")
    val r = SkewAdvisor.analyze(df, "k", "t.k").head
    assert(r.getAs[Long]("n_keys") == 3L)
    assert(r.getAs[Long]("n_rows") == 10L)
    assert(r.getAs[Long]("max_cnt") == 8L)
    assert(r.getAs[Double]("avg_cnt") == 3.3333)
    assert(r.getAs[Double]("skew_ratio") == 2.4)
    assert(r.getAs[String]("top_key") == "a")
    assert(r.getAs[Long]("rec_salt") == 3L, "ceil(8 / 3.333) = 3")
  }

  test("hottest-key tie breaks to the smallest key") {
    val df = Seq("b", "b", "a", "a").toDF("k")
    assert(SkewAdvisor.analyze(df, "k", "t").head.getAs[String]("top_key") == "a")
  }

  test("salt recommendation is capped at maxSalt") {
    val df = (Seq.fill(1000)("hot") ++ (1 to 100).map(i => s"x$i")).toDF("k")
    assert(SkewAdvisor.analyze(df, "k", "t", maxSalt = 32)
      .head.getAs[Long]("rec_salt") == 32L)
  }

  test("null keys are excluded from the profile") {
    val df = Seq(Some("a"), Some("a"), None).toDF("k")
    val r = SkewAdvisor.analyze(df, "k", "t").head
    assert(r.getAs[Long]("n_keys") == 1L && r.getAs[Long]("n_rows") == 2L)
  }

  test("report emits one labeled row per key, ordered by label") {
    val a = Seq(1, 1, 2).toDF("x")
    val b = Seq("u", "v").toDF("y")
    val rows = SkewAdvisor.report(Seq((a, "x", "t1.x"), (b, "y", "t0.y")))
      .select("key_col").as[String].collect().toSeq
    assert(rows == Seq("t0.y", "t1.x"))
  }
}
