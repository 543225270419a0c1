package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types.{DoubleType, LongType}

/** The canonicalization plan (SparkEntry.canonPlan) is a per-query
  * ORDERED marker list that must mirror the raw registration's output
  * schema exactly — a drifted list silently mis-projects the oracle
  * side and the driver's hash gate is the first thing to notice.
  * This spec pins the contract:
  *
  *  - every plan entry names a registered AND oracled query;
  *  - marker base names equal the raw output columns, in order;
  *  - `*` markers sit on DoubleType columns (to become micro-unit
  *    bigints), `#` markers on LongType columns (oracle-side BIGINT
  *    cast), bare names on everything else;
  *  - the derived public query really emits `<name>_micros: bigint`
  *    for every `*` column.
  */
class CanonPlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("every canonPlan entry names a registered, oracled query") {
    val qs = SparkEntry.registered.keySet
    val oracled = SparkEntry.registeredOracleSql.keySet
    val missing = SparkEntry.canonPlan.keySet.diff(qs)
    assert(missing.isEmpty, s"canonPlan entries for unknown queries: $missing")
    val unoracled = SparkEntry.canonPlan.keySet.diff(oracled)
    assert(unoracled.isEmpty,
      s"canonPlan entries for rows-only queries (pointless): $unoracled")
  }

  test("marker lists mirror the raw output schemas exactly") {
    SparkEntry.canonPlan.foreach { case (name, markers) =>
      val raw = SparkEntry.registered(name)(spark, sfDir)
      val fields = raw.schema.fields
      assert(fields.length == markers.length,
        s"$name: ${markers.length} markers vs ${fields.length} columns")
      markers.zip(fields).foreach { case (m, f) =>
        val base = m.stripSuffix("*").stripSuffix("#")
        assert(base == f.name, s"$name: marker $m vs column ${f.name}")
        if (m.endsWith("*"))
          assert(f.dataType == DoubleType,
            s"$name: * marker on non-double ${f.name}: ${f.dataType}")
        if (m.endsWith("#"))
          assert(f.dataType == LongType,
            s"$name: # marker on non-long ${f.name}: ${f.dataType}")
      }
      // the derived public query emits micro-unit bigints for * cols
      val pub = SparkEntry.queries(name)(spark, sfDir).schema
      markers.filter(_.endsWith("*")).foreach { m =>
        val micros = m.dropRight(1) + "_micros"
        val f = pub.fields.find(_.name == micros)
        assert(f.exists(_.dataType == LongType),
          s"$name: expected $micros: bigint in public output, " +
            s"got ${pub.simpleString}")
      }
    }
  }
}
