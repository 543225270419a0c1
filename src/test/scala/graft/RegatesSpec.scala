package graft

import org.scalatest.funsuite.AnyFunSuite

/** `dev/regates.json` is the bench gate's escape hatch: an entry
  * replaces a query's first-recorded gate time with an explicitly
  * justified ceiling. Escape hatches accumulate silently unless
  * linted, so this spec pins the contract bench_report.py relies on:
  *
  *  - the file is valid JSON of shape {query: {gate, reason}};
  *  - every entry names a REGISTERED query (a typo'd or deleted
  *    query name would make the re-gate dead while looking alive);
  *  - every entry carries a positive finite gate and a substantive
  *    reason (≥ 40 chars — a sentence, not a shrug);
  *  - the file stays SMALL (≤ 5 entries): past that, re-gating is
  *    masking a systemic perf problem, not noise.
  */
class RegatesSpec extends AnyFunSuite {

  private lazy val entries: Map[String, Map[String, Any]] = {
    val path = java.nio.file.Paths.get("dev/regates.json")
    assert(java.nio.file.Files.exists(path), s"missing $path")
    val txt = new String(java.nio.file.Files.readAllBytes(path), "UTF-8")
    parseObj(txt).map { case (k, v) =>
      k -> v.asInstanceOf[Map[String, Any]]
    }
  }

  // minimal JSON-object parser (no deps): the file is flat
  // {name: {gate: num, reason: str}} — parsed with Spark's own
  // Jackson, which is already on the classpath.
  private def parseObj(txt: String): Map[String, Any] = {
    val mapper =
      new com.fasterxml.jackson.databind.ObjectMapper()
    val m = mapper.readValue(
      txt, classOf[java.util.Map[String, Object]])
    def conv(v: Any): Any = v match {
      case jm: java.util.Map[_, _] =>
        jm.asInstanceOf[java.util.Map[String, Object]]
          .entrySet().toArray.map { e0 =>
            val e = e0.asInstanceOf[
              java.util.Map.Entry[String, Object]]
            e.getKey -> conv(e.getValue)
          }.toMap
      case other => other
    }
    conv(m).asInstanceOf[Map[String, Any]]
  }

  test("every re-gate names a registered query") {
    val known = SparkEntry.registered.keySet
    val unknown = entries.keySet.diff(known)
    assert(unknown.isEmpty,
      s"re-gates for unregistered queries (dead entries): $unknown")
  }

  test("every re-gate carries a positive gate and a substantive reason") {
    entries.foreach { case (q, e) =>
      val gate = e.get("gate") match {
        case Some(n: Number) => n.doubleValue()
        case other => fail(s"$q: gate is $other, want a number")
      }
      assert(gate > 0.0 && gate.isFinite, s"$q: gate=$gate")
      val reason = e.get("reason") match {
        case Some(s: String) => s
        case other => fail(s"$q: reason is $other, want a string")
      }
      assert(reason.trim.length >= 40,
        s"$q: reason too thin (${reason.trim.length} chars) — " +
          "record WHY the first-recorded gate is unattainable")
    }
  }

  test("the re-gate list stays small") {
    assert(entries.size <= 5,
      s"${entries.size} re-gates — past 5 this is masking a " +
        "systemic perf problem, not recording noise")
  }
}
