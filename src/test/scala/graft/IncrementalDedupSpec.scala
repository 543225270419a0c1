package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, DupClusters, IncrementalDedup}

class IncrementalDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def toDf(docs: Seq[(Long, String)]) = docs.toDF("doc_id", "text")

  /** Global dedup survivors: min doc_id per band-collision connected
    * component (the full-corpus reference the incremental path must
    * reproduce batch by batch). */
  private def globalSurvivors(docs: Seq[(Long, String)]): Set[Long] = {
    val df = toDf(docs)
    val pairs = Dedup.minHashCandidates(df).select("id_a", "id_b")
    DupClusters.clusterDocuments(df, pairs)
      .filter(col("doc_id") === col("cluster_id"))
      .select("doc_id").as[Long].collect().toSet
  }

  private def mk(id: Long, words: Seq[String]) = (id, words.mkString(" "))

  // three distinct 12-word vocabularies → three document families.
  // Collisions in these tests are EXACT text dups (identical signatures
  // ⇒ identical in every band — collision guaranteed, not hash luck).
  private val famA = (0 until 12).map(i => s"alpha$i")
  private val famB = (0 until 12).map(i => s"beta$i")
  private val famC = (0 until 12).map(i => s"gamma$i")

  test("two-batch admission matches full-corpus dedup when no batch bridges components") {
    val batch1 = Seq(
      mk(1, famA), mk(2, famA), // exact-dup pair within batch 1
      mk(3, famB),
      mk(4, famC))
    val batch2 = Seq(
      mk(10, famA),         // dup of published 1
      mk(11, famB.reverse), // reversed order ⇒ disjoint 3-shingles ⇒ new
      mk(12, famB),         // dup of published 3
      mk(13, (0 until 12).map(i => s"delta$i"))) // genuinely new

    val adm1 = IncrementalDedup.admitBatch(toDf(batch1), None)
    val acc1 = adm1.accepted.select("doc_id").as[Long].collect().toSet
    val adm2 = IncrementalDedup.admitBatch(toDf(batch2), Some(adm1.bands))
    val acc2 = adm2.accepted.select("doc_id").as[Long].collect().toSet

    assert(acc1 == Set(1L, 3L, 4L), "within-batch CC keeps min id")
    assert(acc2 == Set(11L, 13L), "store collisions rejected, novel docs admitted")
    // batch1 ids precede batch2 ids, so global canonical (min id) for
    // any cross-batch component lands in batch1 — incremental admission
    // must reproduce global dedup exactly on bridge-free data
    assert((acc1 ++ acc2) == globalSurvivors(batch1 ++ batch2))
    spark.catalog.clearCache()
  }

  test("rejected docs' bands are stored, and stored bands block regardless of origin") {
    // rejection does not drop a doc's bands from the append frame
    val text = (0 until 20).map(i => s"omega$i")
    val adm = IncrementalDedup.admitBatch(toDf(Seq(mk(1, text), mk(2, text))), None)
    assert(adm.accepted.select("doc_id").as[Long].collect().toSeq == Seq(1L))
    assert(adm.bands.select("doc_id").distinct().as[Long].collect().toSet ==
      Set(1L, 2L), "bands of the rejected doc must be in the append frame")

    // chain mechanism, isolated from hash luck: C's admission is
    // blocked by a store row carrying ONE of C's own band hashes under
    // another doc's id (exactly what a rejected near-dup B leaves
    // behind), and sails through when that hash is perturbed
    val cDoc = Seq(mk(3, (0 until 20).map(i => s"kappa$i")))
    val cBands = Dedup.bandTable(toDf(cDoc))
    val asRejectedB = cBands.limit(1).withColumn("doc_id", lit(2L))
    assert(IncrementalDedup.admitBatch(toDf(cDoc), Some(asRejectedB))
      .accepted.count() == 0, "one shared band with a stored doc blocks")
    val unrelated = asRejectedB.withColumn("band_hash", col("band_hash") + 1)
    assert(IncrementalDedup.admitBatch(toDf(cDoc), Some(unrelated))
      .accepted.count() == 1, "non-colliding store must not block")
    spark.catalog.clearCache()
  }

  test("short docs (no shingles) are always admitted and never block") {
    val batch1 = Seq((1L, "tiny doc"), (2L, "tiny doc"))
    val adm1 = IncrementalDedup.admitBatch(toDf(batch1), None)
    // both < k=3 tokens: no bands, no rejection — near-dedup does not
    // see them (exact dedup is a different operator)
    assert(adm1.accepted.count() == 2)
    assert(adm1.bands.count() == 0)
    spark.catalog.clearCache()
  }

  test("versioned store: admissions append band versions and replay consistently") {
    val dir = java.nio.file.Files.createTempDirectory("graft_inc")
      .resolve("store").toString
    val b1 = toDf(Seq(mk(1, famA), mk(2, famB)))
    val b2 = toDf(Seq(mk(10, famA), mk(11, famC)))
    val (adm1, v1) = IncrementalDedup.admitVersioned(spark, dir, b1)
    assert(v1 == 1 && adm1.accepted.count() == 2)
    val (adm2, v2) = IncrementalDedup.admitVersioned(spark, dir, b2)
    assert(v2 == 2)
    assert(adm2.accepted.select("doc_id").as[Long].collect().toSet == Set(11L))
    // the store now holds ALL four docs' bands (accepted + rejected)
    assert(graft.lake.TableLog.read(spark, dir)
      .select("doc_id").distinct().count() == 4L)
    spark.catalog.clearCache()
  }
}
