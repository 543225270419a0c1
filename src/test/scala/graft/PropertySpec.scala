package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}
import org.apache.spark.sql.functions._
import graft.lake.MergeWriter
import graft.operators.Sessionize

/** Property tests (SURVEY §5): invariants over generated inputs rather
  * than fixed fixtures. Spark actions are expensive, so properties run
  * with a reduced case count but unconstrained generators. */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val params = Parameters.default.withMinSuccessfulTests(12)

  private def assertProp(p: Prop): Unit = {
    val r = check(params, p)
    assert(r.passed, r.status.toString)
  }

  test("upsert: idempotent, keys unique, updates always win") {
    val rowGen = Gen.listOfN(12,
      Gen.zip(Gen.chooseNum(0L, 5L), Gen.chooseNum(0L, 3L), Gen.chooseNum(0, 999)))
    assertProp(Prop.forAll(rowGen, rowGen) { (t, u) =>
      // de-dup generated keys inside each side (upsert's contract)
      val target = t.distinctBy(r => (r._1, r._2))
        .toDF("store_id", "dt", "v")
      val updates = u.distinctBy(r => (r._1, r._2))
        .toDF("store_id", "dt", "v")
      val once = MergeWriter.upsert(target, updates, Seq("store_id", "dt"))
      val twice = MergeWriter.upsert(once, updates, Seq("store_id", "dt"))
      val rows = once.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
      val updMap = updates.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
      val keysUnique = once.groupBy("store_id", "dt").count()
        .filter(col("count") > 1).isEmpty
      val updatesWin = updMap.forall { case (k, v) => rows.get(k).contains(v) }
      val idempotent = twice.except(once).isEmpty && once.except(twice).isEmpty
      keysUnique && updatesWin && idempotent
    })
  }

  test("rfmSegmentsApprox: grid partitions users, buckets in range") {
    val evGen = Gen.listOfN(30, Gen.zip(
      Gen.chooseNum(1L, 8L),                       // user
      Gen.chooseNum(0L, 30L * 86400L),             // ts offset seconds
      Gen.chooseNum(1, 500)))                      // value cents
    assertProp(Prop.forAll(evGen, Gen.chooseNum(1, 5)) { (evs, nTiles) =>
      val df = evs.map { case (u, off, v) =>
        (f"u$u%02d", new java.sql.Timestamp(1704067200000L + off * 1000L),
          v / 100.0)
      }.toDF("user_id", "ts", "value")
      val nUsers = evs.map(_._1).distinct.size
      val grid = graft.operators.Retention
        .rfmSegmentsApprox(df, nTiles = nTiles).collect()
      val partitions = grid.map(_.getLong(3)).sum == nUsers
      val inRange = grid.forall(r => Seq(0, 1, 2).forall { i =>
        r.getInt(i) >= 1 && r.getInt(i) <= nTiles
      })
      partitions && inRange
    })
  }

  test("curriculumShardsApprox: total assignment, range, monotone in score") {
    val docGen = Gen.listOfN(25, Gen.chooseNum(0, 80)) // scores w/ ties
    assertProp(Prop.forAll(docGen, Gen.chooseNum(1, 5)) { (scores, nShards) =>
      val df = scores.zipWithIndex.map { case (s, i) =>
        (i.toLong, s / 16.0)
      }.toDF("doc_id", "score")
      val out = graft.operators.Sampling
        .curriculumShardsApprox(df, "score", nShards)
        .select("doc_id", "score", "shard")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
      val total = out.length == scores.length
      val inRange = out.forall(r => r._3 >= 1 && r._3 <= nShards)
      // equal scores share a shard; higher score never gets a lower shard
      val byScore = out.groupBy(_._2).view.mapValues(_.map(_._3).toSet)
      val tiesTogether = byScore.values.forall(_.size == 1)
      val sorted = byScore.toSeq.sortBy(_._1).map(_._2.head)
      val monotone = sorted.zip(sorted.drop(1)).forall { case (a, b) => a <= b }
      total && inRange && tiesTogether && monotone
    })
  }

  test("sessionize: event counts are conserved and durations bounded") {
    val evGen = Gen.listOfN(25, Gen.zip(
      Gen.chooseNum(1L, 3L),                       // user
      Gen.chooseNum(0L, 4L * 3600L),               // offset seconds
      Gen.chooseNum(0, 100)))                      // value
    assertProp(Prop.forAll(evGen) { evs =>
      val df = evs.zipWithIndex.map { case ((u, off, v), i) =>
        (u, new java.sql.Timestamp(1704067200000L + off * 1000L + i), v.toDouble)
      }.toDF("user_id", "ts", "value")
      val stats = Sessionize.sessionStats(df, "user_id", "ts", 1800L, "value")
        .collect()
      val conserved = stats.map(_.getLong(2)).sum == evs.length
      // a session's span is < gap * events (each gap within a session ≤ gapSeconds)
      val bounded = stats.forall(r =>
        r.getLong(3) <= 1800L * 1000000L * r.getLong(2))
      conserved && bounded
    })
  }

  test("shingle_hashes: window count, locality, and concat consistency") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.ShingleHashes
    def arr(toks: Seq[String]) =
      new GenericArrayData(toks.map(t => UTF8String.fromString(t): Any).toArray)
    val tokGen = Gen.listOf(Gen.oneOf("a", "bb", "ccc", "Ω", "x1"))
    val kGen = Gen.chooseNum(1, 4)
    assertProp(Prop.forAll(tokGen, kGen) { (toks, k) =>
      val out = ShingleHashes.compute(arr(toks), k)
      val countOk = out.length == math.max(0, toks.length - k + 1)
      // window hash = hash of the space-joined window string computed
      // independently (locality: window w depends only on tokens w..w+k-1)
      val independent = toks.sliding(k).filter(_.length == k).toSeq.map(w =>
        ShingleHashes.compute(arr(w), k).head)
      countOk && out.toSeq == independent
    })
  }

  test("token_profile: counts equal brute-force occurrence counts") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.TokenProfile
    val dicts = Array(Array("a", "b"), Array("b", "c", "c"), Array("zz"))
    val lookup = TokenProfile.buildLookup(dicts)
    val tokGen = Gen.listOf(Gen.oneOf("a", "b", "c", "zz", "q", ""))
    assertProp(Prop.forAll(tokGen) { toks =>
      val out = TokenProfile.compute(
        new GenericArrayData(toks.map(t => UTF8String.fromString(t): Any).toArray),
        lookup, dicts.length)
      val lenOk = out(0) == toks.map(_.length).sum.toLong
      val hitsOk = dicts.zipWithIndex.forall { case (d, i) =>
        out(i + 1) == toks.count(d.contains).toLong
      }
      lenOk && hitsOk
    })
  }

  test("hyperplane signature: bit agreement grows with cosine similarity") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import graft.functions.HyperplaneSignature
    val planes = HyperplaneSignature.makePlanes(64, 8, seed = 11L)
    def sig(v: Array[Float]) = HyperplaneSignature.compute(
      new GenericArrayData(v.map(x => x: Any)), planes, 8)
    val vecGen = Gen.listOfN(8, Gen.chooseNum(-1.0f, 1.0f))
      .map(_.toArray).suchThat(v => v.exists(math.abs(_) > 1e-3))
    assertProp(Prop.forAll(vecGen) { v =>
      val near = v.clone(); near(0) = near(0) * 0.9f   // small perturbation
      val far = v.map(-_)                              // antipode
      val dNear = java.lang.Long.bitCount(sig(v) ^ sig(near))
      val dFar = java.lang.Long.bitCount(sig(v) ^ sig(far))
      dFar == 64 && dNear <= 16
    })
  }

  test("ppm: resize-to-same and split∘concat are identity") {
    import graft.operators.Multimodal
    val geomGen = Gen.zip(Gen.chooseNum(1, 12), Gen.chooseNum(1, 9),
      Gen.chooseNum(0L, 999L))
    assertProp(Prop.forAll(geomGen) { case (w, h, seed) =>
      val ppm = Multimodal.generatePpm(w, h, seed)
      val same = Multimodal.resizePpm(ppm, w, h)
      val (_, _, _, o1) = Multimodal.PpmDecoder.parseHeader(ppm)
      val (_, _, _, o2) = Multimodal.PpmDecoder.parseHeader(same)
      val identity = ppm.drop(o1).sameElements(same.drop(o2))
      val frames = Seq(ppm, Multimodal.generatePpm(h, w, seed + 1))
      val roundTrip = Multimodal.splitFrames(frames.flatten.toArray)
        .zip(frames).forall { case (a, b) => a.sameElements(b) }
      identity && roundTrip
    })
  }

  test("fillna leaves no nulls on filled columns") {
    val g = Gen.listOfN(10, Gen.option(Gen.chooseNum(0, 100)))
    assertProp(Prop.forAll(g) { xs =>
      val df = xs.zipWithIndex.map { case (x, i) => (i.toLong, x.map(_.toDouble)) }
        .toDF("id", "v")
        .na.fill(0.0, Seq("v"))
      df.filter(col("v").isNull).isEmpty
    })
  }

  test("stratified sampling: per-stratum count = min(n, stratum size); subset of input") {
    val docGen = Gen.listOfN(30, Gen.zip(
      Gen.chooseNum(0L, 40L), Gen.oneOf("en", "de", "es")))
    assertProp(Prop.forAll(docGen, Gen.chooseNum(1, 6)) { (docs, n) =>
      val d = docs.distinctBy(_._1).toDF("doc_id", "lang")
      val got = graft.operators.Sampling.stratifiedN(d, Seq("lang"), n)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      val strata = docs.distinctBy(_._1).groupBy(_._2).view.mapValues(_.size)
      val counts = got.groupBy(_._2).view.mapValues(_.size)
      val quotaOk = strata.forall { case (l, sz) =>
        counts.getOrElse(l, 0) == math.min(n, sz)
      }
      quotaOk && got.toSet.subsetOf(docs.distinctBy(_._1).toSet)
    })
  }

  test("sequence packing: offsets chain exactly — no gaps, no overlaps per shard") {
    val docGen = Gen.listOfN(20, Gen.zip(
      Gen.chooseNum(0L, 60L), Gen.chooseNum(1, 9)))
    assertProp(Prop.forAll(docGen, Gen.chooseNum(4, 12)) { (docs, maxTok) =>
      val d = docs.distinctBy(_._1)
        .map { case (id, nt) => (id, ("w " * nt).trim) }
        .toDF("doc_id", "text")
      val got = graft.operators.Chunking.packSequences(d, maxTok, shards = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
      got.groupBy(_._2).forall { case (_, rows) =>
        val sorted = rows.sortBy(_._1)
        val positions = sorted.map(r => r._3 * maxTok + r._4)
        val chained = sorted.indices.forall { i =>
          positions(i) == sorted.take(i).map(_._5).sum
        }
        chained && sorted.headOption.forall(_._4 == 0L)
      }
    })
  }

  test("snapshot diff: diff(a, a) is empty; classified keys = expected sets") {
    val tblGen = Gen.listOfN(15, Gen.zip(Gen.chooseNum(0L, 20L), Gen.chooseNum(0, 5)))
    assertProp(Prop.forAll(tblGen, tblGen) { (aRaw, bRaw) =>
      val aRows = aRaw.distinctBy(_._1); val bRows = bRaw.distinctBy(_._1)
      val a = aRows.toDF("id", "v")
      val b = bRows.toDF("id", "v")
      val self = graft.lake.SnapshotDiff.diff(a, a, Seq("id")).isEmpty
      val got = graft.lake.SnapshotDiff.diff(a, b, Seq("id"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val aMap = aRows.toMap; val bMap = bRows.toMap
      val expected =
        bMap.keySet.diff(aMap.keySet).map(_ -> "added") ++
          aMap.keySet.diff(bMap.keySet).map(_ -> "removed") ++
          aMap.keySet.intersect(bMap.keySet)
            .filter(k => aMap(k) != bMap(k)).map(_ -> "changed")
      self && got == expected.toMap
    })
  }

  test("funnel: step counts are non-increasing and bounded by distinct users") {
    val evGen = Gen.listOfN(30, Gen.zip(
      Gen.chooseNum(1L, 5L),                       // user
      Gen.chooseNum(0L, 1000L),                    // ts offset seconds
      Gen.oneOf("view", "click", "purchase")))
    assertProp(Prop.forAll(evGen) { evs =>
      val df = evs.zipWithIndex.map { case ((u, s, t), i) =>
        (u, new java.sql.Timestamp(1700000000000L + s * 1000L + i), t)
      }.toDF("user_id", "ts", "event_type")
      val counts = graft.operators.Funnel
        .funnel(df, Seq("view", "click", "purchase"))
        .select("users").as[Long].collect().toSeq
      val users = evs.map(_._1).distinct.size
      counts.sliding(2).forall(w => w.size < 2 || w(0) >= w(1)) &&
        counts.headOption.forall(_ <= users)
    })
  }

  test("quantileKeep: larger keep fractions are supersets; output ⊆ input") {
    val rowGen = Gen.listOfN(20, Gen.zip(
      Gen.chooseNum(1L, 100L), Gen.chooseNum(0, 9), Gen.chooseNum(0.0, 10.0)))
    assertProp(Prop.forAll(rowGen) { rows =>
      val df = rows.distinctBy(_._1).toDF("id", "g", "score")
      def keep(f: Double) = graft.operators.Sampling
        .quantileKeep(df, "score", Seq("g"), f, Seq("id"))
        .select("id").as[Long].collect().toSet
      val (k3, k7) = (keep(0.3), keep(0.7))
      val all = df.select("id").as[Long].collect().toSet
      k3.subsetOf(k7) && k7.subsetOf(all) && keep(1.0) == all
    })
  }

  test("weightedSample: exact k (capped at n), subset, deterministic") {
    val rowGen = Gen.listOfN(15, Gen.zip(
      Gen.chooseNum(1L, 1000L), Gen.chooseNum(0.1, 100.0)))
    assertProp(Prop.forAll(rowGen, Gen.chooseNum(1, 20)) { (rows, k) =>
      val df = rows.distinctBy(_._1).toDF("id", "w")
      val n = rows.distinctBy(_._1).size
      def draw() = graft.operators.Sampling.weightedSample(df, "w", k, "id")
        .select("id").as[Long].collect().toSeq
      val s = draw()
      s.size == math.min(k, n) && s.distinct.size == s.size &&
        s.toSet.subsetOf(rows.map(_._1).toSet) && s == draw()
    })
  }

  test("psi: zero on identical frames, non-negative terms, permutation-invariant") {
    val valGen = Gen.listOfN(25, Gen.chooseNum(0.0, 100.0))
    assertProp(Prop.forAll(valGen, valGen) { (a, b) =>
      val (da, db) = (a.toDF("v"), b.toDF("v"))
      val terms = graft.operators.Drift.psiReport(da, db, "v", 10.0)
        .select("psi_term").as[Double].collect()
      val same = graft.operators.Drift.psiReport(da, da, "v", 10.0)
        .agg(sum("psi_term")).collect()(0).getDouble(0)
      val shuffled = graft.operators.Drift
        .psiReport(da, scala.util.Random.shuffle(b).toDF("v"), "v", 10.0)
        .agg(sum("psi_term")).collect()(0).getDouble(0)
      val total = terms.sum
      terms.forall(_ >= 0.0) && same == 0.0 &&
        math.abs(shuffled - total) < 1e-9
    })
  }
}
