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

  test("theil's U and GK tau replay hand-computed tables") {
    // perfect determination X→Y (but not Y→X):
    // X=1→Y=a (2), X=2→Y=a (2), X=3→Y=b (2): knowing X fixes Y
    // partially — build a FULLY determining one instead:
    // X∈{1,2}, Y=f(X): U(Y|X)=1, tau(Y|X)=1
    val det = (Seq.fill(2)((1, "a")) ++ Seq.fill(3)((2, "b")))
      .toDF("x", "y")
    val r = Ordinal.nominalAssociation(det, col("x"), col("y"))
      .collect().head
    assert(r.getLong(0) == 5L)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-9)   // u_yx
    assert(math.abs(r.getDouble(3) - 1.0) < 1e-9)   // tau_yx
    // symmetric here (bijective) — both directions 1
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-9)
    // independence: uniform 2x2 → everything 0
    val ind = (for (x <- 1 to 2; y <- Seq("a", "b"); _ <- 1 to 3)
      yield (x, y)).toDF("x", "y")
    val ri = Ordinal.nominalAssociation(ind, col("x"), col("y"))
      .collect().head
    assert(math.abs(ri.getDouble(1)) < 1e-9 &&
      math.abs(ri.getDouble(3)) < 1e-9)
    // constant Y: H(Y) = 0 and baseline error 0 → NULLs in the
    // Y-direction, 0 in the X-direction (Y explains nothing of X)
    val cy = Seq((1, "a"), (2, "a"), (3, "a")).toDF("x", "y")
    val rc = Ordinal.nominalAssociation(cy, col("x"), col("y"))
      .collect().head
    assert(rc.isNullAt(1) && rc.isNullAt(3))
    assert(rc.getDouble(2) == 0.0 && rc.getDouble(4) == 0.0)
    // hand-replay of an ASYMMETRIC table: X=1→a only; X=2→{a,b}
    // cells: (1,a)=2, (2,a)=1, (2,b)=1; n=4
    val asym = (Seq.fill(2)((1, "a")) ++ Seq((2, "a"), (2, "b")))
      .toDF("x", "y")
    val ra = Ordinal.nominalAssociation(asym, col("x"), col("y"))
      .collect().head
    // H(Y): p_a=3/4, p_b=1/4; MI = Σ p ln(p/(px py))
    def ln(d: Double) = math.log(d)
    val hy = -(0.75 * ln(0.75) + 0.25 * ln(0.25))
    val hx = -(0.5 * ln(0.5) + 0.5 * ln(0.5))
    val mi = 0.5 * ln(0.5 / (0.5 * 0.75)) +
      0.25 * ln(0.25 / (0.5 * 0.75)) +
      0.25 * ln(0.25 / (0.5 * 0.25))
    assert(math.abs(ra.getDouble(1) - mi / hy) < 1e-6)
    assert(math.abs(ra.getDouble(2) - mi / hx) < 1e-6)
    // tau(Y|X): Σ p_xy²/p_x = .25/.5 + .0625/.5 + .0625/.5 = 0.75;
    // baseline Σ p_y² = 0.625 → (0.75−0.625)/0.375 = 1/3
    assert(math.abs(ra.getDouble(3) - 1.0 / 3) < 1e-6)
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

  test("jonckheere-terpstra replays a hand-counted 3-group table") {
    // a:[1,2,2] b:[2,3,4] c:[4,5,6] — U_ab = 3+2.5+2.5 = 8 (ties
    // at ½), U_ac = 9, U_bc = 3+3+2.5 = 8.5 → J = 25.5;
    // μ = (81−27)/4 = 13.5, σ² = (81·21 − 3·81)/72 = 20.25
    val rows = Seq("a" -> 1.0, "a" -> 2.0, "a" -> 2.0,
      "b" -> 2.0, "b" -> 3.0, "b" -> 4.0,
      "c" -> 4.0, "c" -> 5.0, "c" -> 6.0)
      .toDF("o_orderpriority", "o_totalprice")
    val r = Ordinal.jonckheereTerpstra(rows).collect().head
    assert(r.getLong(0) == 9L && r.getLong(1) == 3L)
    assert(math.abs(r.getDouble(2) - 25.5) < 1e-9)
    assert(math.abs(r.getDouble(3) - 13.5) < 1e-9)
    assert(math.abs(r.getDouble(4) - 4.5) < 1e-9)
    assert(math.abs(r.getDouble(5) - 12.0 / 4.5) < 1e-6)
    assert(r.getBoolean(6), "monotone shift is significant")
    // a reversed ordering flips the sign of z
    val rev = Seq("a" -> 6.0, "a" -> 5.0, "a" -> 4.0,
      "b" -> 4.0, "b" -> 3.0, "b" -> 2.0,
      "c" -> 2.0, "c" -> 2.0, "c" -> 1.0)
      .toDF("o_orderpriority", "o_totalprice")
    val rr = Ordinal.jonckheereTerpstra(rev).collect().head
    assert(rr.getDouble(5) < 0.0)
  }
}
