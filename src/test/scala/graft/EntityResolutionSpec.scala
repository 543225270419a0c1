package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.EntityResolution

/** Blocking and scoring contract of the fuzzy ER join: pairs exist
  * only within a block (last name token), distance is bounded by
  * maxDist, and row counts aggregate the raw table, not the
  * dictionary. */
class EntityResolutionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val entities = Seq(
    "cold widget", "cold widget", "bold widget", "old widget",
    "cold widgets",                       // different block (widgets)
    "green rod", "grain rod",             // dist 2 within block rod
    "totally different rod"               // same block, far distance
  ).toDF("p_name")

  private lazy val pairs =
    EntityResolution.fuzzyNamePairs(entities, "p_name", maxDist = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))

  test("within-block near-matches are found with raw-row counts") {
    assert(pairs.contains(("bold widget", "cold widget", 1L, 1L, 2L)),
      s"got ${pairs.mkString(", ")}")
    assert(pairs.contains(("grain rod", "green rod", 2L, 1L, 1L)))
  }

  test("identical spellings collapse before pairing — no dist-0 self pairs") {
    assert(!pairs.exists(p => p._1 == p._2))
    assert(!pairs.exists(_._3 == 0L))
  }

  test("cross-block near-matches are intentionally not candidates") {
    assert(!pairs.exists(p => p._1.endsWith("widgets") || p._2.endsWith("widgets")),
      "'cold widgets' blocks under 'widgets', never compared to 'widget'")
  }

  test("distance threshold excludes far pairs even within a block") {
    assert(!pairs.exists(p => p._1.startsWith("totally") || p._2.startsWith("totally")))
  }

  test("pair orientation is canonical: name_a < name_b") {
    assert(pairs.forall(p => p._1 < p._2))
  }
}
