package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: the HEAVY-TAIL scale probe. The per-round 30×/60×
  * ScaleProbe amplifies a 5k-row documents base; the slowest bench
  * queries deserve one probe at bench scale ×10 — an sf1-equivalent
  * corpus (6M lineitem / 6M events / 500k docs) built by amplifying
  * EVERY table the heavy queries read, with foreign keys shifted
  * consistently so join semantics scale honestly:
  *
  *  - events: event_id/user_id shift per copy → 10× more users with
  *    the same per-user stream shape (navigation graphs, sessions,
  *    and per-user aggregates scale in user count, not depth);
  *  - orders/lineitem/customer: o_orderkey=l_orderkey and
  *    o_custkey=c_custkey shift TOGETHER so FK joins stay 1:N;
  *  - documents: doc_id shift + per-copy token suffix → copies are
  *    DISJOINT in shingle space (near-dup structure per copy is
  *    preserved; copies are not mutual near-dups — else LSH pays
  *    C(N,2) artifactual pairs that say nothing about corpus scale);
  *  - embeddings: vec_id shift + a per-copy nudge on dimension 0 so
  *    copies are near but not exact duplicates (exact ties make
  *    top-k cuts degenerate);
  *  - dimension tables (nation/region/supplier/part): copied as-is.
  *
  * Prints per-query warm times at sf0.1 and at the amplified dir,
  * and the ratio vs the ideal ×10. Ratios ≪ 10 = fixed overhead
  * still dominates; ≫ 10 = superlinearity, the 100 TB killer.
  *
  * Usage: runMain graft.HeavyProbe [factor] [queries CSV]
  * Output recorded as dev/scaleprobe_r13_heavy_sf1.txt.
  */
object HeavyProbe {

  private val DefaultQueries = Seq(
    "q360_hits", "q211_fd_discovery", "q214_incremental_allpairs",
    "q246_whitened_ann", "q150_pagerank", "q321_ind_discovery",
    "q80_incremental_dedup", "q218_personalized_rank",
    "q92_span_excision", "q316_link_prediction",
    "q97_mv_percentiles", "q217_stream_allpairs",
    "q302_market_basket", "q356_hubness", "q329_stream_stream_join")

  private def shiftOf(df: DataFrame, c: String): Long =
    df.agg(max(col(c))).collect()(0).getLong(0) + 1L

  private def amplifyTables(spark: SparkSession, srcDir: String,
      outDir: String, factor: Int): Unit = {
    val f = java.nio.file.Paths.get(outDir)
    if (java.nio.file.Files.exists(f.resolve("_READY"))) {
      println(s"[heavy] reusing amplified corpus at $outDir")
      return
    }
    java.nio.file.Files.createDirectories(f)
    def t(n: String) =
      spark.read.parquet(s"$srcDir/$n.parquet")
    // the driver testdata layout is ONE FILE per table named
    // `<name>.parquet` — stream fixtures glob on that exact file
    // name (pathGlobFilter matches files, not directories), so the
    // amplified corpus must reproduce the single-file layout
    def write(df: DataFrame, n: String): Unit = {
      val tmp = s"$outDir/_tmp_$n"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no part file for $n"))
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$outDir/$n.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      new java.io.File(tmp).listFiles().foreach(_.delete())
      new java.io.File(tmp).delete()
      println(s"[heavy] wrote $n")
    }
    def copies(df: DataFrame)(mk: Int => DataFrame): DataFrame =
      (0 until factor).map(mk).reduce(_ unionByName _)

    val ev = t("events")
    val (se, su) = (shiftOf(ev, "event_id"), shiftOf(ev, "user_id"))
    write(copies(ev)(i => ev
      .withColumn("event_id", col("event_id") + lit(i * se))
      .withColumn("user_id", col("user_id") + lit(i * su))), "events")

    val ord = t("orders"); val cust = t("customer")
    val li = t("lineitem")
    val so = shiftOf(ord, "o_orderkey")
    val sc = shiftOf(cust, "c_custkey")
    write(copies(ord)(i => ord
      .withColumn("o_orderkey", col("o_orderkey") + lit(i * so))
      .withColumn("o_custkey", col("o_custkey") + lit(i * sc))),
      "orders")
    write(copies(cust)(i => cust
      .withColumn("c_custkey", col("c_custkey") + lit(i * sc))),
      "customer")
    write(copies(li)(i => li
      .withColumn("l_orderkey", col("l_orderkey") + lit(i * so))),
      "lineitem")

    val docs = t("documents")
    val sd = shiftOf(docs, "doc_id")
    write(copies(docs)(i => docs
      .withColumn("doc_id", col("doc_id") + lit(i * sd))
      .withColumn("text", concat_ws(" ",
        transform(split(col("text"), "\\s+"),
          tk => concat(tk, lit(s"_$i")))))), "documents")

    val emb = t("embeddings")
    val sv = shiftOf(emb, "vec_id")
    write(copies(emb)(i => emb
      .withColumn("vec_id", col("vec_id") + lit(i * sv))
      .withColumn("embedding", transform(col("embedding"),
        (x, j) => when(j === 0, x + lit(i * 0.013f))
          .otherwise(x)))), "embeddings")

    Seq("nation", "region", "supplier", "part").foreach { n =>
      write(t(n), n)
    }
    java.nio.file.Files.write(f.resolve("_READY"), Array.empty[Byte])
  }

  private def timeQuery(spark: SparkSession, q: String, dir: String,
      reps: Int): Double = {
    var best = Double.MaxValue
    for (_ <- 1 to reps) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      try SparkEntry.registered(q)(spark, dir).write
        .mode("overwrite").format("noop").save()
      catch { case e: Throwable =>
        println(s"[heavy] $q FAILED at $dir: " +
          String.valueOf(e.getMessage).linesIterator.next())
        return Double.NaN
      }
      best = math.min(best, (System.nanoTime() - t0) / 1e9)
    }
    best
  }

  def main(args: Array[String]): Unit = {
    val factor = if (args.nonEmpty) args(0).toInt else 10
    val queries = args.lift(1)
      .map(_.split(",").map(_.trim).toSeq)
      .getOrElse(DefaultQueries)
    val srcDir = "/root/testdata/sf0.1"
    val outDir = s"/tmp/graft_sf1equiv_x$factor"
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("ERROR")

    amplifyTables(spark, srcDir, outDir, factor)

    println(f"[heavy] query                          base_s    x${factor}_s   ratio (ideal <= $factor)")
    queries.foreach { q =>
      val base = timeQuery(spark, q, srcDir, reps = 2)
      val big = timeQuery(spark, q, outDir, reps = 2)
      println(f"[heavy] $q%-30s $base%7.2f  $big%7.2f  ${big / base}%6.2f")
    }
    spark.stop()
  }
}
