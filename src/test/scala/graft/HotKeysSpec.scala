package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.HotKeys
import graft.streaming.HotKeys.{Candidate, Ev}

/** Misra–Gries contract of the streaming hot-key monitor: exact when
  * k covers the distinct keys, bounded undercount + guaranteed
  * heavy-key survival when it doesn't, and state that never exceeds
  * k counters per shard. */
class HotKeysSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def streamOf(evs: Seq[Ev]): org.apache.spark.sql.Dataset[Ev] = {
    val dir = java.nio.file.Files.createTempDirectory("hotkeys_spec")
    evs.toDF("shard", "key").coalesce(1)
      .write.mode("overwrite").parquet(dir.toString)
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "4")
    import ss.implicits._
    ss.readStream.schema("shard INT, key BIGINT")
      .parquet(dir.toString).as[Ev]
  }

  private def runLocal(evs: Seq[Ev], k: Int): Map[Long, Candidate] =
    HotKeys.finalSummary(HotKeys.run(spark, streamOf(evs), k,
      s"hotkeys_spec_${System.nanoTime()}"))
      .collect()
      .map(c => c.key -> c).toMap

  test("k above distinct keys: exact counts, zero err") {
    val evs = (Seq.fill(7)(3L) ++ Seq.fill(4)(5L) ++ Seq(9L))
      .map(u => Ev(0, u))
    val got = runLocal(evs, k = 16)
    assert(got(3L).est == 7L && got(5L).est == 4L && got(9L).est == 1L)
    assert(got.values.forall(_.err == 0L))
  }

  test("k below distinct keys: heavy key survives with bounded undercount") {
    // one heavy key (60 of 100) + 40 singletons, k=4: any key with
    // count > N/(k+1)=20 must survive; undercount <= err <= N/(k+1)
    val evs = (Seq.fill(60)(1L) ++ (100L until 140L)).map(u => Ev(0, u))
    val got = runLocal(evs, k = 4)
    assert(got.contains(1L), "heavy key evicted — MG guarantee broken")
    val c = got(1L)
    assert(c.est <= 60L && c.est + c.err >= 60L,
      s"est ${c.est} + err ${c.err} must bound the true count 60")
    assert(c.err <= 100L / 5, s"err ${c.err} exceeds N/(k+1)")
  }

  test("summary size stays bounded by k per shard") {
    val evs = (0L until 500L).map(u => Ev((u % 2).toInt, u))
    val perShard = HotKeys.run(spark, streamOf(evs), k = 8,
      s"hotkeys_spec_${System.nanoTime()}")
      .collect().groupBy(_.shard).map(_._2.map(_.key).distinct.length)
    assert(perShard.forall(_ <= 8))
  }

  test("eviction across batches: finalSummary is the end state, not a stale max") {
    // batch 1: a=5 b=4 c=3 with k=2 -> cut 3, state {a:2, b:1}, err 3
    // batch 2: one more c   -> merged {a:2, b:1, c:1}, cut 1 -> {a:1}, err 4
    val dir = java.nio.file.Files.createTempDirectory("hotkeys_spec_ev")
    def writeBatch(name: String, keys: Seq[Long]): Unit =
      keys.map(Ev(0, _)).toDF("shard", "key").coalesce(1)
        .write.parquet(dir.resolve(name).toString)
    writeBatch("b1", Seq.fill(5)(1L) ++ Seq.fill(4)(2L) ++ Seq.fill(3)(3L))
    writeBatch("b2", Seq(3L))
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "4")
    import ss.implicits._
    val stream = ss.readStream.schema("shard INT, key BIGINT")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString + "/*").as[Ev]
    val all = HotKeys.run(ss, stream, k = 2,
      s"hotkeys_spec_${System.nanoTime()}")
    val fin = HotKeys.finalSummary(all).collect()
    assert(fin.map(_.key).toSet == Set(1L),
      s"final summary must be the last batch's state, got ${fin.toSeq}")
    val a = fin.head
    assert(a.est + a.err >= 5L && a.est <= 5L,
      "undercount bound must still cover the true count")
    // the raw emissions DO contain the stale batch-1 rows the final
    // summary must exclude
    assert(all.collect().exists(c => c.key == 2L))
  }

  test("topEventUsers equals the batch GROUP BY top-20 at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val streamed = HotKeys.topEventUsers(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val batch = graft.io.Sources.table(spark, dir, "events")
      .groupBy("user_id").agg(count(lit(1)).as("n_events"))
      .orderBy(col("n_events").desc, col("user_id")).limit(20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(streamed == batch)
  }
}
