package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.lake.Bucketing
import graft.pipeline.{Orchestrator, SampleData}
import graft.pipeline.Orchestrator.{RetryPolicy, StageResult}

class BucketingOrchestratorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bucketed join plans without any shuffle exchange") {
    val orders = (0 until 1000).map(i => (i.toLong % 50, i.toLong, i * 1.5))
      .toDF("custkey", "orderkey", "total")
    val customers = (0 until 50).map(i => (i.toLong, s"c$i"))
      .toDF("custkey", "name")
    Bucketing.writeBucketed(orders, "b_orders", "custkey", 8)
    Bucketing.writeBucketed(customers, "b_customers", "custkey", 8)
    // disable broadcast so the planner actually uses the bucket layout
    // (with a broadcastable dim the bucket files are moot)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_customers", "custkey")
      assert(joined.count() == 1000)
      assert(Bucketing.isShuffleFree(joined),
        s"expected no shuffle in:\n${joined.queryExecution.executedPlan}")
      // contrast: the same join on plain (unbucketed) frames shuffles
      assert(!Bucketing.isShuffleFree(orders.join(customers, "custkey")))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("orchestrator: all domains green → fact built; stages in order") {
    val dir = SampleData.writeTo(
      java.nio.file.Files.createTempDirectory("graft_orch").toString)
    val (results, fact) = Orchestrator.runAll(spark, dir)
    assert(results.size == 16 && results.forall(_.ok))
    assert(results.map(_.stage).take(4) ==
      Seq("ingest", "validate", "transform", "publish"))
    // per-stage durations are observable (validate actually scans data,
    // so at least it must register wall-clock)
    assert(results.filter(_.stage == "validate").forall(_.durationMillis > 0))
    assert(fact.isDefined && fact.get.count() == 5)
  }

  test("orchestrator: concurrent domains — one failure gates the fact, others complete") {
    val dir = SampleData.writeTo(
      java.nio.file.Files.createTempDirectory("graft_orch_par").toString)
    val seen = java.util.Collections.synchronizedList(
      new java.util.ArrayList[StageResult]())
    val observer = new Orchestrator.Observer {
      override def onStageComplete(r: StageResult): Unit = { seen.add(r); () }
    }
    val (results, fact) = Orchestrator.runAll(spark, dir,
      RetryPolicy(retries = 0), observer = observer,
      domains = Orchestrator.DefaultDomains :+ "no_such_domain")
    // the injected domain fails at ingest and runs nothing further
    val bad = results.filter(_.domain == "no_such_domain")
    assert(bad.map(_.stage) == Seq("ingest") && !bad.head.ok)
    // every real domain still runs all four stages green, concurrently
    val good = results.filter(_.domain != "no_such_domain")
    assert(good.size == 16 && good.forall(_.ok))
    // ALL_SUCCESS gating: one red domain ⇒ no fact
    assert(fact.isEmpty)
    assert(seen.size == results.size)
  }

  test("orchestrator: validation failure gates publish and retries stop") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orch_bad").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "erp_orders.csv"),
      """order_id,customer_id,store_id,dt,order_value,status
        |1001,C001,store_01,2024-06-01,-5.00,shipped
        |""".stripMargin)
    val seen = scala.collection.mutable.Buffer[StageResult]()
    val observer = new Orchestrator.Observer {
      override def onStageComplete(r: StageResult): Unit = seen += r
    }
    val results = Orchestrator.runDomain(spark, dir, "erp_orders",
      RetryPolicy(retries = 2), observer = observer)
    val validate = results.find(_.stage == "validate").get
    assert(!validate.ok && validate.attempts == 3)   // 1 try + 2 retries
    assert(!results.exists(_.stage == "publish"))    // gated
    assert(seen.map(_.stage) == results.map(_.stage))
  }

  test("orchestrator: onFailure fires once per failed stage, never on success; onSlaMiss on breach") {
    val good = SampleData.writeTo(
      java.nio.file.Files.createTempDirectory("graft_orch_cb").toString)
    val failures = scala.collection.mutable.Buffer[StageResult]()
    val slaMisses = scala.collection.mutable.Buffer[(String, Long)]()
    val observer = new Orchestrator.Observer {
      override def onFailure(r: StageResult): Unit = failures += r
      override def onSlaMiss(d: String, ms: Long): Unit = slaMisses += ((d, ms))
    }
    // green domain: no onFailure; slaMillis=0 forces the SLA callback
    Orchestrator.runDomain(spark, good, "erp_orders",
      RetryPolicy(retries = 0), slaMillis = 0L, observer = observer)
    assert(failures.isEmpty)
    assert(slaMisses.map(_._1) == Seq("erp_orders") && slaMisses.head._2 > 0)
    // failing domain: exactly one onFailure, for the failing stage,
    // after retries exhausted
    Orchestrator.runDomain(spark, good, "no_such_domain",
      RetryPolicy(retries = 1), observer = observer)
    assert(failures.map(r => (r.domain, r.stage, r.ok, r.attempts)) ==
      Seq(("no_such_domain", "ingest", false, 2)))
  }
}
