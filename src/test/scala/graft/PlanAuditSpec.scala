package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression net: every contract query must construct a
  * physical plan with no unexpected nested-loop/cartesian join, and no
  * ORACLED query outside the frozen legacy set may emit a
  * round()-produced double output (the driver hashes oracled output
  * bit-exactly; rounded doubles must go through SparkEntry.canonPlan).
  * Catches an operator silently degrading (e.g. a join condition
  * change turning a hash join into NLJ) at `sbt test` time instead of
  * at the bench. */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("no contract query plans an unexpected NLJ, emits un-canonicalized " +
    "rounded doubles, or fails to plan") {
    val results = PlanAudit.audit(spark, "/root/testdata/sf0.001")
    assert(results.size == SparkEntry.queries.size)
    val bad = results.filter(_.flagged)
    assert(bad.isEmpty, bad.map { a =>
      val why = a.error.getOrElse(
        if (a.roundedDoubles.nonEmpty)
          s"rounded-double oracled output (add a canonPlan entry): " +
            a.roundedDoubles.mkString(",")
        else "unexpected NLJ")
      s"${a.name}: $why"
    }.mkString("; "))
  }

  test("roundedDoubleLegacy is frozen: every member is an oracled query " +
    "that still exists") {
    val qs = SparkEntry.queries.keySet
    val oracled = SparkEntry.oracleSql.keySet
    val ghosts = PlanAudit.roundedDoubleLegacy.diff(qs)
    assert(ghosts.isEmpty, s"legacy entries for dropped queries: $ghosts")
    val unoracled = PlanAudit.roundedDoubleLegacy.diff(oracled)
    assert(unoracled.isEmpty,
      s"legacy entries for rows-only queries (pointless): $unoracled")
  }
}
