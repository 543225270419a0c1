package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Ordinal

class OrdinalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("gamma/somers/lambda replay a hand-computed 2x2 table") {
    // cells: (1,1)=3 (1,2)=1 (2,1)=1 (2,2)=3, n=8
    // C = 3·3 = 9, D = 1·1 = 1 → γ = 8/10 = 0.8
    // pairs = 28, T_x = 2·C(4,2) = 12 → d_yx = 8/16 = 0.5
    // λ = (3+3 − 4)/(8 − 4) = 0.5
    val rows =
      Seq.fill(3)((1, 1)) ++ Seq.fill(1)((1, 2)) ++
      Seq.fill(1)((2, 1)) ++ Seq.fill(3)((2, 2))
    val r = Ordinal.ordinalAssociation(rows.toDF("x", "y"),
      col("x"), col("y")).collect().head
    assert(r.getLong(0) == 8L)
    assert(r.getLong(1) == 9L && r.getLong(2) == 1L)
    assert(math.abs(r.getDouble(3) - 0.8) < 1e-9)
    assert(math.abs(r.getDouble(4) - 0.5) < 1e-9)
    assert(math.abs(r.getDouble(5) - 0.5) < 1e-9)
  }

  test("perfect concordance reads gamma = 1, reversal reads -1") {
    val up = (Seq.fill(2)((1, 1)) ++ Seq.fill(2)((2, 2)) ++
      Seq.fill(2)((3, 3))).toDF("x", "y")
    val rUp = Ordinal.ordinalAssociation(up, col("x"), col("y"))
      .collect().head
    assert(rUp.getDouble(3) == 1.0 && rUp.getLong(2) == 0L)
    val down = (Seq.fill(2)((1, 3)) ++ Seq.fill(2)((2, 2)) ++
      Seq.fill(2)((3, 1))).toDF("x", "y")
    val rDown = Ordinal.ordinalAssociation(down, col("x"), col("y"))
      .collect().head
    assert(rDown.getDouble(3) == -1.0 && rDown.getLong(1) == 0L)
  }

  test("independence reads gamma ~ 0 and lambda = 0") {
    // uniform 3x3 grid: every (x, y) cell equally filled
    val rows = for (x <- 1 to 3; y <- 1 to 3; _ <- 1 to 4)
      yield (x, y)
    val r = Ordinal.ordinalAssociation(rows.toDF("x", "y"),
      col("x"), col("y")).collect().head
    assert(r.getDouble(3) == 0.0 && r.getDouble(4) == 0.0)
    // no row mode beats the global mode on a flat table
    assert(r.getDouble(5) == 0.0)
  }

  test("the registered fixture is sane on sf0.001") {
    val orders = graft.io.Sources.table(spark,
      "/root/testdata/sf0.001", "orders")
    val r = Ordinal.priceUrgencyAssociation(orders).collect().head
    assert(r.getLong(0) > 0L)
    assert(math.abs(r.getDouble(3)) <= 1.0)
    assert(math.abs(r.getDouble(4)) <= 1.0)
    assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
  }
}
