package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Attribution

/** Shapley attribution: hand-computed 2-channel case, efficiency
  * (credits sum to v(full) − v(∅)), symmetry, and the null player. */
class ShapleySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private var nextId = 0L
  private def user(u: Long, types: Seq[String]) = types.map { et =>
    nextId += 1
    (nextId, java.sql.Timestamp.valueOf("2024-08-01 10:00:00"),
      u, et, 1.0, "{}")
  }

  private def frame(rows: Seq[(Long, java.sql.Timestamp, Long, String,
      Double, String)]) =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("two channels: hand-computed Shapley values and efficiency") {
    // masks: u1 {a} conv, u2 {a}, u3 {b} conv, u4 {a,b} conv, u5 {b}
    // v(∅)=0 (no mask-0 users), v({a}) = 1/2, v({b}) = 1/2,
    // v({a,b}) = 3/5 → φ_a = ½·½ + ½·(3/5 − ½) = 0.3 = φ_b
    val e = frame(
      user(1, Seq("a", "purchase")) ++ user(2, Seq("a")) ++
      user(3, Seq("b", "purchase")) ++ user(4, Seq("a", "b", "purchase")) ++
      user(5, Seq("b")))
    val got = Attribution.shapleyAttribution(e, channels = Seq("a", "b"))
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(math.abs(got("a")._1 - 0.3) < 1e-9)
    assert(math.abs(got("b")._1 - 0.3) < 1e-9, "symmetry")
    assert(math.abs(got("a")._2 - 0.5) < 1e-9)
    // efficiency: credits sum to v(full) − v(∅) = 3/5
    assert(math.abs(got.values.map(_._1).sum - 0.6) < 1e-9)
  }

  test("null player: an untouched channel gets exactly zero credit") {
    val e = frame(
      user(1, Seq("a", "purchase")) ++ user(2, Seq("a")) ++
      user(3, Seq("a", "purchase")))
    val got = Attribution.shapleyAttribution(e,
      channels = Seq("a", "ghost")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("ghost") == 0.0)
    assert(got("a") > 0.0)
  }

  test("efficiency holds on a seeded pseudo-random 4-channel corpus") {
    var s = 7L
    def next(m: Int) = { s = (s * 1103515245L + 12345L) & 0x7fffffffL
      (s % m).toInt }
    val chs = Seq("c0", "c1", "c2", "c3")
    val rows = (1 to 80).flatMap { u =>
      val touched = chs.filter(_ => next(2) == 1)
      val conv = if (next(3) == 0) Seq("purchase") else Nil
      // guarantee a nonempty event list so the user exists
      user(u.toLong, (if (touched.isEmpty) Seq(chs(next(4))) else
        touched) ++ conv)
    }
    val e = frame(rows)
    val got = Attribution.shapleyAttribution(e, channels = chs)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // v(full) = overall conversion rate; v(∅) = 0 (every user touched)
    val overall = {
      val byU = rows.groupBy(_._3)
      byU.values.count(_.exists(_._4 == "purchase")).toDouble / byU.size
    }
    assert(math.abs(got.values.sum - overall) < 1e-6,
      s"Shapley credits must sum to v(full) = $overall")
  }
}
