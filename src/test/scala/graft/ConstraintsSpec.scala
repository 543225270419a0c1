package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files
import graft.lake.TableLog
import graft.lake.TableLog.ConstraintViolationException

class ConstraintsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshPath() =
    Files.createTempDirectory("graft_constraints").resolve("t").toString

  private def dataDirs(path: String): Set[String] = {
    val d = java.nio.file.Paths.get(path, "data")
    if (!Files.exists(d)) Set.empty
    else {
      val s = Files.list(d)
      try scala.jdk.CollectionConverters.IteratorHasAsScala(s.iterator())
        .asScala.map(_.getFileName.toString).toSet
      finally s.close()
    }
  }

  test("violating append is rejected atomically: version, rows, and data dirs untouched") {
    val path = freshPath()
    TableLog.commitOverwrite(spark, path,
      spark.range(0, 100).toDF("id").withColumn("v", col("id") * 2))
    TableLog.addConstraint(spark, path, "v_nonneg", "v >= 0")
    val vBefore = TableLog.latestVersion(spark, path).get
    val dirsBefore = dataDirs(path)
    val ex = intercept[ConstraintViolationException] {
      TableLog.commitAppend(spark, path,
        spark.range(100, 120).toDF("id")
          .withColumn("v", when(col("id") % 4 === 0, lit(-1L))
            .otherwise(col("id"))))
    }
    assert(ex.byConstraint == Seq("v_nonneg" -> 5L))
    assert(TableLog.latestVersion(spark, path).get == vBefore)
    assert(TableLog.read(spark, path).count() == 100L)
    assert(dataDirs(path) == dirsBefore, "rejected dir must be cleaned up")
  }

  test("addConstraint refuses when existing data already violates") {
    val path = freshPath()
    TableLog.commitOverwrite(spark, path,
      spark.range(0, 50).toDF("id").withColumn("v", col("id") - 10))
    intercept[ConstraintViolationException] {
      TableLog.addConstraint(spark, path, "v_nonneg", "v >= 0")
    }
    assert(TableLog.constraints(spark, path).isEmpty)
  }

  test("NULL passes CHECK (SQL semantics); addNotNull catches nulls") {
    val path = freshPath()
    TableLog.commitOverwrite(spark, path,
      spark.range(0, 10).toDF("id")
        .withColumn("v", when(col("id") % 2 === 0, col("id") + 1)))
    // half the rows have v NULL — a range check passes them
    TableLog.addConstraint(spark, path, "v_pos", "v > 0")
    TableLog.commitAppend(spark, path,
      spark.range(10, 20).toDF("id").withColumn("v", lit(null).cast("long")))
    assert(TableLog.read(spark, path).count() == 20L)
    // but NOT NULL is its own check and refuses the existing nulls
    intercept[ConstraintViolationException] {
      TableLog.addNotNull(spark, path, "v")
    }
  }

  test("constraints survive overwrite and merge, and gate both") {
    val path = freshPath()
    TableLog.commitOverwrite(spark, path,
      spark.range(0, 20).toDF("id").withColumn("v", col("id")))
    TableLog.addConstraint(spark, path, "v_nonneg", "v >= 0")
    // overwrite replaces data, not table metadata
    TableLog.commitOverwrite(spark, path,
      spark.range(0, 30).toDF("id").withColumn("v", col("id") + 1))
    assert(TableLog.constraints(spark, path).map(_.name) == Seq("v_nonneg"))
    intercept[ConstraintViolationException] {
      TableLog.commitOverwrite(spark, path,
        spark.range(0, 5).toDF("id").withColumn("v", lit(-1L)))
    }
    intercept[ConstraintViolationException] {
      TableLog.commitMerge(spark, path,
        spark.range(0, 5).toDF("id").withColumn("v", lit(-7L)), Seq("id"))
    }
    // merge with valid updates still works
    TableLog.commitMerge(spark, path,
      spark.range(0, 5).toDF("id").withColumn("v", lit(99L)), Seq("id"))
    assert(TableLog.read(spark, path).where(col("v") === 99L).count() == 5L)
  }

  test("dropConstraint lifts enforcement") {
    val path = freshPath()
    TableLog.commitOverwrite(spark, path,
      spark.range(0, 10).toDF("id").withColumn("v", col("id")))
    TableLog.addConstraint(spark, path, "v_small", "v < 100")
    intercept[ConstraintViolationException] {
      TableLog.commitAppend(spark, path,
        spark.range(0, 3).toDF("id").withColumn("v", lit(500L)))
    }
    TableLog.dropConstraint(spark, path, "v_small")
    TableLog.commitAppend(spark, path,
      spark.range(0, 3).toDF("id").withColumn("v", lit(500L)))
    assert(TableLog.read(spark, path).count() == 13L)
  }

  test("schema-evolution append lacking a NOT NULL column is rejected (null-backfill is visible to checks)") {
    val path = freshPath()
    TableLog.commitOverwrite(spark, path,
      spark.range(0, 10).toDF("id").withColumn("tag", lit("x")))
    TableLog.addNotNull(spark, path, "tag")
    intercept[ConstraintViolationException] {
      TableLog.commitAppend(spark, path, spark.range(10, 15).toDF("id"))
    }
    assert(TableLog.read(spark, path).count() == 10L)
  }

  test("rollback restores the target version's constraint set") {
    val path = freshPath()
    val c1 = TableLog.commitOverwrite(spark, path,
      spark.range(0, 10).toDF("id").withColumn("v", col("id")))
    TableLog.addConstraint(spark, path, "v_nonneg", "v >= 0")
    assert(TableLog.constraints(spark, path).nonEmpty)
    TableLog.rollback(spark, path, c1.version)
    assert(TableLog.constraints(spark, path).isEmpty)
    // and enforcement follows the metadata: negatives append fine now
    TableLog.commitAppend(spark, path,
      spark.range(0, 2).toDF("id").withColumn("v", lit(-5L)))
    assert(TableLog.read(spark, path).count() == 12L)
  }

  test("multiple violated constraints report per-constraint counts from one pass") {
    val path = freshPath()
    TableLog.commitOverwrite(spark, path,
      spark.range(0, 10).toDF("id").withColumn("v", col("id")))
    TableLog.addConstraint(spark, path, "v_nonneg", "v >= 0")
    TableLog.addConstraint(spark, path, "v_small", "v < 1000")
    val ex = intercept[ConstraintViolationException] {
      TableLog.commitAppend(spark, path,
        spark.range(0, 6).toDF("id")
          .withColumn("v", when(col("id") < 2, lit(-1L)).otherwise(lit(5000L))))
    }
    assert(ex.byConstraint.toMap == Map("v_nonneg" -> 2L, "v_small" -> 4L))
  }

  test("optimize keeps constraints without a re-validation scan gating it") {
    val path = freshPath()
    TableLog.commitOverwrite(spark, path,
      spark.range(0, 100).toDF("id")
        .withColumn("a", col("id") % 7).withColumn("b", col("id") % 11))
    TableLog.addConstraint(spark, path, "id_nonneg", "id >= 0")
    TableLog.commitOptimize(spark, path, ("a", "b"), numFiles = 2)
    assert(TableLog.constraints(spark, path).map(_.name) == Seq("id_nonneg"))
    assert(TableLog.read(spark, path).count() == 100L)
  }
}
