package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression net: every contract query must construct a
  * physical plan with no unexpected nested-loop/cartesian join. Catches
  * an operator silently degrading (e.g. a join condition change turning
  * a hash join into NLJ) at `sbt test` time instead of at the bench. */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("no contract query plans an unexpected NLJ or fails to plan") {
    val results = PlanAudit.audit(spark, "/root/testdata/sf0.001")
    assert(results.size == SparkEntry.queries.size)
    val bad = results.filter(_.flagged)
    assert(bad.isEmpty, bad.map(a =>
      s"${a.name}: ${a.error.getOrElse("unexpected NLJ")}").mkString("; "))
  }
}
