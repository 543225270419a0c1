package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions, VectorExpressions}

class VectorExpressionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("native vec_dot is bit-identical to the HOF formulation") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      (i.toLong,
        Array.fill(64)(rnd.nextFloat()),
        Array.fill(64)(rnd.nextFloat()))
    }
    val df = rows.toDF("id", "a", "b")
    val diff = df.select(
      VectorExpressions.vecDot(col("a"), col("b")).as("native"),
      VectorFunctions.dotHof(col("a"), col("b")).as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(diff.isEmpty)
  }

  test("interpreted eval path (non-codegen) agrees too") {
    val r = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b")
      .select(VectorExpressions.vecDot(col("a"), col("b")))
      .collect()(0).getDouble(0)
    assert(r == 32.0)
  }

  test("vec_dot registers for SQL via GraftExtensions") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))," +
        " array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .collect()(0).getDouble(0)
    assert(r == 11.0)
  }
}
