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

  final case class StageResult(domain: String, stage: String,
      attempts: Int, ok: Boolean, error: Option[String])

  trait Observer {
    def onStageComplete(r: StageResult): Unit = ()
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
      val (r, attempts) = withRetries(policy)(body)
      val sr = StageResult(domain, name, attempts, r.isSuccess,
        r.failed.toOption.map(_.getMessage))
      observer.onStageComplete(sr)
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

  /** All four domains; cross-domain fact only if every domain published
    * (the reference's end-of-DAG gating). */
  def runAll(spark: SparkSession, rawDir: String,
      policy: RetryPolicy = RetryPolicy(),
      observer: Observer = NoopObserver):
      (Seq[StageResult], Option[org.apache.spark.sql.DataFrame]) = {
    val all = Seq("erp_orders", "crm_leads", "products", "web_events")
      .flatMap(d => runDomain(spark, rawDir, d, policy, observer = observer))
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
