package graft

/** Dev tool: time one or more named queries at a given sf dir and/or
  * print plans. Not the bench contract (that is [[Bench]]) — this is
  * the per-query optimization loop:
  *
  *   runMain graft.QueryProbe <name[,name...]> <sfDir> [explain|schema|show]
  *
  * Timing methodology matches Bench (guide §1.4): the action is a
  * noop-sink write (count() would let Catalyst drop sorts and prune
  * the projection — probing a shallower plan than the one Bench
  * times), the session is the same GraftSession.local (extensions,
  * AQE, shuffle partitions = cpus) and each rep clears the cache the
  * way Bench does between queries. SPARK_GRAFT_REPS reps per query
  * (default 3); the MIN is the steady-state number (same rationale as
  * close.sh's min-of-N: shared-box contention swings single passes).
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    // park the periodic driver GC like Bench: a full GC inside a timed
    // rep is measurement noise, not engine work
    System.setProperty("spark.cleaner.periodicGC.interval", "120min")
    val spark = GraftSession.local(cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    if (args.contains("explain")) names.foreach { q =>
      println(s"== plan $q ==")
      SparkEntry.queries(q)(spark, sfDir).explain("formatted")
    }
    if (args.contains("schema")) names.foreach { q =>
      val df = SparkEntry.queries(q)(spark, sfDir)
      println(s"[schema] $q " + df.schema.fields
        .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", "))
    }
    if (args.contains("show")) names.foreach { q =>
      SparkEntry.queries(q)(spark, sfDir).show(50, truncate = false)
    }
    val reps =
      if (args.exists(Set("schema", "explain", "show"))) 0
      else sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    names.foreach { q =>
      val times = (1 to reps).flatMap { r =>
        val t0 = System.nanoTime()
        // construction + execution, like Bench measures (operators may
        // do eager work — index builds, cache warm-up — at construction)
        val ok =
          try {
            SparkEntry.queries(q)(spark, sfDir)
              .write.format("noop").mode("overwrite").save()
            true
          } catch { case e: Throwable =>
            println(s"[probe] $q rep=$r FAILED: ${e.getClass.getSimpleName}: " +
              String.valueOf(e.getMessage).take(200))
            false
          }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        println(f"[probe] $q rep=$r time=$dt%.3fs" +
          (if (ok) "" else " (FAILED — excluded from min)"))
        // a failed rep's (typically tiny) elapsed time must never win
        // the min and report a fast failure as the steady state
        if (ok) Some(dt) else None
      }
      if (times.nonEmpty)
        println(f"[probe] $q min=${times.min}%.3fs reps=$reps " +
          f"ok=${times.size}")
      else if (reps > 0)
        println(s"[probe] $q ALL $reps reps FAILED — no min")
    }
    spark.stop()
  }
}
