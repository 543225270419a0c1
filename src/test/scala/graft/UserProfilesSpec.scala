package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import java.sql.Timestamp
import graft.streaming.UserProfiles

/** transformWithState per-user profiles: typed ValueState accumulation
  * across micro-batches. */
class UserProfilesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def writeFiles(batches: Seq[Seq[(Long, String, Double)]]): String = {
    val dir = Files.createTempDirectory("graft_profiles_src")
    val scratch = Files.createTempDirectory("graft_profiles_scratch")
    batches.zipWithIndex.foreach { case (rows, i) =>
      val tmp = s"$scratch/b$i"
      rows.map { case (u, ts, v) => (u, Timestamp.valueOf(ts), v) }
        .toDF("user_id", "ts", "value")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = Files.list(Paths.get(tmp)).toArray.map(_.toString)
        .filter(p => p.endsWith(".parquet") && !p.contains("_SUCCESS")).head
      Files.copy(Paths.get(part), dir.resolve(f"$i%02d.parquet"))
      Thread.sleep(5)
    }
    dir.toString
  }

  test("state accumulates across micro-batches; last update is the running total") {
    val dir = writeFiles(Seq(
      Seq((1L, "2024-01-01 10:00:00", 5.0), (2L, "2024-01-01 10:30:00", 2.0)),
      Seq((1L, "2024-01-02 09:00:00", 3.0)),
      Seq((1L, "2024-01-03 08:00:00", 1.0), (2L, "2024-01-03 08:10:00", 4.0))))
    val stream = spark.readStream
      .schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)
      .as[UserProfiles.Event]
    val updates = UserProfiles.run(spark, stream, "profiles_spec_multi")
      .collect()
    // per-batch updates: user 1 appears in 3 batches, user 2 in 2
    assert(updates.count(_.user_id == 1L) == 3)
    assert(updates.count(_.user_id == 2L) == 2)
    // the final (max-n) update per user carries the cumulative profile
    val finalByUser = updates.groupBy(_.user_id).view
      .mapValues(_.maxBy(_.n_events)).toMap
    assert(finalByUser(1L).n_events == 3 && finalByUser(1L).total_value == 9.0)
    assert(finalByUser(2L).n_events == 2 && finalByUser(2L).total_value == 6.0)
    assert(finalByUser(1L).last_ts == Timestamp.valueOf("2024-01-03 08:00:00"))
  }

  test("single-batch run equals the batch group-by (the q69 oracle shape)") {
    val dir = writeFiles(Seq(
      Seq((1L, "2024-01-01 10:00:00", 5.0), (1L, "2024-01-01 11:00:00", 2.5),
        (3L, "2024-01-01 12:00:00", 7.0))))
    val stream = spark.readStream
      .schema(spark.read.parquet(dir).schema)
      .parquet(dir)
      .as[UserProfiles.Event]
    val got = UserProfiles.run(spark, stream, "profiles_spec_single")
      .collect().map(p => (p.user_id, p.n_events, p.total_value, p.last_ts)).toSet
    val expected = spark.read.parquet(dir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("value").as("t"), max("ts").as("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getTimestamp(3))).toSet
    assert(got == expected)
  }
}
