package graft.pipeline

import org.apache.spark.sql.SparkSession
import scala.util.{Failure, Success, Try}

/** Per-domain DAG orchestration: ingest → validate → transform →
  * publish, with retries and an SLA clock — the control-flow surface of
  * the reference's Airflow DAGs (reference
  * `airflow/dags/lakehouse_pipelines.py:98-144`: `retries=2`, 5-min
  * delay, 60-min SLA, publish gated on all-success, failure callback).
  *
  * In Spark the only real process boundary is driver↔executors, so the
  * "DAG" is plain driver-side control flow; what's preserved is the
  * contract: retry policy per stage, fail-fast validation, publish only
  * after every upstream stage succeeded, and an observer hook for
  * failure/SLA notifications (the reference's Slack/email callbacks).
  */
object Orchestrator {

  final case class RetryPolicy(retries: Int = 2, delayMillis: Long = 0L)

  /** `durationMillis` spans all attempts including retry delays — the
    * number an SLA dashboard needs (the reference ships stage durations
    * to its callbacks the same way, airflow/dags/lakehouse_pipelines.py:50-73). */
  final case class StageResult(domain: String, stage: String,
      attempts: Int, ok: Boolean, error: Option[String],
      durationMillis: Long = 0L)

  /** Notification surface of the reference's Airflow callbacks
    * (`airflow/dags/lakehouse_pipelines.py:50-73`): `onFailure` is the
    * `on_failure_callback` analog — fired once per stage whose retries
    * are exhausted, AFTER `onStageComplete`, never on success — and
    * `onSlaMiss` mirrors `sla_miss_callback`. All hooks default to
    * no-ops; wiring Slack/email/pager is the caller's one-liner. */
  trait Observer {
    def onStageComplete(r: StageResult): Unit = ()
    def onFailure(r: StageResult): Unit = ()
    def onSlaMiss(domain: String, elapsedMillis: Long): Unit = ()
  }
  object NoopObserver extends Observer

  /** Run `body` with retries; returns the result plus attempt count. */
  def withRetries[T](policy: RetryPolicy)(body: => T): (Try[T], Int) = {
    var attempt = 0
    var last: Try[T] = Failure(new IllegalStateException("not run"))
    while (attempt <= policy.retries && last.isFailure) {
      attempt += 1
      last = Try(body)
      if (last.isFailure && attempt <= policy.retries && policy.delayMillis > 0)
        Thread.sleep(policy.delayMillis)
    }
    (last, attempt)
  }

  /** Run one domain through the four reference stages. `publish` runs
    * only when ingest+validate+transform all succeeded (the reference's
    * ALL_SUCCESS trigger rule). Returns per-stage results. */
  def runDomain(spark: SparkSession, rawDir: String, domain: String,
      policy: RetryPolicy = RetryPolicy(),
      slaMillis: Long = 60L * 60 * 1000,
      observer: Observer = NoopObserver): Seq[StageResult] = {
    val t0 = System.nanoTime()
    val results = Seq.newBuilder[StageResult]
    var ok = true
    var staged: Option[org.apache.spark.sql.DataFrame] = None

    def stage(name: String)(body: => Unit): Unit = if (ok) {
      val s0 = System.nanoTime()
      val (r, attempts) = withRetries(policy)(body)
      val sr = StageResult(domain, name, attempts, r.isSuccess,
        r.failed.toOption.map(_.getMessage),
        durationMillis = (System.nanoTime() - s0) / 1000000L)
      observer.onStageComplete(sr)
      if (r.isFailure) observer.onFailure(sr)
      results += sr
      if (r.isFailure) ok = false
    }

    stage("ingest") {
      staged = Some(Lakehouse.ingest(spark, rawDir, domain))
    }
    stage("validate") {
      graft.quality.Expectations.validateOrThrow(
        staged.get, Lakehouse.suites(domain))
    }
    stage("transform") {
      staged = Some(Lakehouse.stage(domain, staged.get))
    }
    stage("publish") {
      staged.get.createOrReplaceTempView(s"stg_$domain")
    }

    val elapsed = (System.nanoTime() - t0) / 1000000L
    if (elapsed > slaMillis) observer.onSlaMiss(domain, elapsed)
    results.result()
  }

  val DefaultDomains: Seq[String] =
    Seq("erp_orders", "crm_leads", "products", "web_events")

  /** All domains CONCURRENTLY; cross-domain fact only if every domain
    * published (the reference's end-of-DAG gating).
    *
    * The reference runs its four DAGs as independent Airflow schedules
    * (`airflow/dags/lakehouse_pipelines.py:98-144`) and dbt builds with
    * `threads: 4` (`dbt/profiles.yml.example:11`). Spark job submission
    * is thread-safe, and concurrent driver threads let independent
    * domains overlap scan I/O with compute and fill executor slots one
    * domain alone can't — on a real cluster this is the difference
    * between 4× the wall-clock and ~1× the slowest domain. One domain's
    * failure never interrupts the others; it only gates the fact build.
    *
    * `observer` callbacks may fire from multiple threads — implementations
    * must be thread-safe (the reference's Slack/email callbacks are
    * per-DAG processes, so this matches their concurrency contract). */
  def runAll(spark: SparkSession, rawDir: String,
      policy: RetryPolicy = RetryPolicy(),
      observer: Observer = NoopObserver,
      domains: Seq[String] = DefaultDomains,
      parallelism: Int = 4):
      (Seq[StageResult], Option[org.apache.spark.sql.DataFrame]) = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(parallelism, domains.size)))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val all =
      try Await.result(
        Future.sequence(domains.map(d =>
          Future(runDomain(spark, rawDir, d, policy, observer = observer)))),
        Duration.Inf).flatten
      finally pool.shutdown()
    val fact =
      if (all.forall(_.ok))
        Some(Lakehouse.buildFact(
          spark.table("stg_erp_orders"),
          spark.table("stg_crm_leads"),
          spark.table("stg_web_events")))
      else None
    (all, fact)
  }
}
