package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("binned range join equals the naive theta join") {
    val rnd = new scala.util.Random(11)
    val points = (0 until 500).map(i => (i.toLong, rnd.nextInt(1000).toDouble))
      .toDF("pid", "v")
    val intervals = (0 until 40).map { i =>
      val lo = rnd.nextInt(900).toDouble
      (i.toLong, lo, lo + rnd.nextInt(120))
    }.toDF("iid", "lo", "hi")
    val naive = points.join(intervals,
      col("v") >= col("lo") && col("v") <= col("hi"))
      .select("pid", "iid")
    val binned = RangeJoin.binned(points, intervals, "v", "lo", "hi", 64L)
      .select("pid", "iid")
    assert(binned.count() == naive.count())
    assert(binned.except(naive).isEmpty && naive.except(binned).isEmpty)
    // and it does NOT plan as a nested loop
    assert(!binned.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
    assert(naive.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
  }
}
