package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental near-dedup: admit a NEW batch of documents against an
  * already-published corpus WITHOUT touching the corpus text — the
  * 100 TB operating mode, where re-running full-corpus dedup per
  * ingest batch (reference behavior: the pipeline's full-refresh
  * dedup models, `dbt/models/staging`) would re-shingle petabytes to
  * admit gigabytes.
  *
  * The persisted state is the LSH band table (doc_id, band_id,
  * band_hash) — two longs and an int per band, ~40 bytes × bands per
  * document regardless of document size. Admission is:
  *
  *  1. batch docs whose bands collide with the store are rejected
  *     (near-dup of something already seen);
  *  2. the remaining docs are deduped WITHIN the batch: band-collision
  *     pairs → connected components ([[DupClusters]]), smallest id per
  *     component survives — but a component any of whose members
  *     collides with the store is rejected wholesale (its members are
  *     transitively near the published corpus);
  *  3. ALL batch bands — accepted and rejected alike — are appended to
  *     the store. Storing rejected docs' bands is what keeps admission
  *     consistent with global transitive closure: if B was rejected as
  *     a near-dup of published A, a later C that resembles only B must
  *     still be blocked, and only B's bands can block it.
  *
  * Scale shape: one shingle+signature pass over the BATCH only; the
  * store is touched by one equi-join on (band_id, band_hash) — at 100 TB
  * corpus / 1 TB batch that join broadcasts nothing and shuffles only
  * band-key pairs, and the store itself can be bucketed on band_hash to
  * make admission shuffle-free on the corpus side.
  *
  * Incremental-vs-global caveat (inherent, not a bug): a later batch
  * can BRIDGE two components that were each admitted earlier; global
  * dedup would have kept one of the two, incremental has already
  * published both and admits neither bridge. Published admissions are
  * never retracted.
  */
object IncrementalDedup {

  /** Result of admitting one batch: `accepted` is the surviving slice
    * of the batch (original columns), `bands` is the batch's full band
    * table to append to the store (accepted AND rejected docs). */
  final case class Admission(accepted: DataFrame, bands: DataFrame)

  /** Admit `batch` against `store` (the accumulated band table; None =
    * first batch). Pure function of its inputs — persistence is the
    * caller's (or [[admitVersioned]]'s) concern. */
  def admitBatch(batch: DataFrame, store: Option[DataFrame],
      k: Int = 3, numHashes: Int = 32, bands: Int = 4,
      maxBucket: Int = 200, idCol: String = "doc_id",
      textCol: String = "text"): Admission = {
    // bands are consumed by the store join, the pair self-join, AND the
    // returned append frame — pay the shingle/signature pass once
    val batchBands = Dedup.bandTable(batch, k, numHashes, bands, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    batchBands.count()

    // 1. direct collisions with the published corpus
    val crossHit = store match {
      case Some(st) => batchBands
        .join(st.select(col("band_id"), col("band_hash")),
          Seq("band_id", "band_hash"), "left_semi")
        .select(col(idCol)).distinct()
      case None => batch.select(col(idCol)).limit(0)
    }

    // 2. within-batch collision graph (same bucket-capped shape as
    //    Dedup.minHashCandidates: join only (band, hash, id) triples)
    val bucketSizes = batchBands.groupBy("band_id", "band_hash")
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n").between(2, maxBucket))
    val inBuckets = batchBands
      .join(bucketSizes, Seq("band_id", "band_hash"), "left_semi")
    val a = inBuckets.select(col("band_id"), col("band_hash"), col(idCol).as("id_a"))
    val b = inBuckets.select(col("band_id"), col("band_hash"), col(idCol).as("id_b"))
    val pairs = a.join(b, Seq("band_id", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()

    val comp = DupClusters.connectedComponents(pairs) // (node, component)
    // components with ANY member near the corpus are rejected wholesale
    val doomed = comp
      .join(crossHit.withColumnRenamed(idCol, "node"), Seq("node"), "left_semi")
      .select(col("component")).distinct()
    val pairedAccepted = comp
      .filter(col("node") === col("component"))
      .join(doomed, Seq("component"), "left_anti")
      .select(col("node").as(idCol))
    // singletons: in no within-batch pair and no corpus collision
    val singletonAccepted = batch.select(col(idCol))
      .join(comp.select(col("node").as(idCol)), Seq(idCol), "left_anti")
      .join(crossHit, Seq(idCol), "left_anti")
    val acceptedIds = pairedAccepted.unionByName(singletonAccepted)

    Admission(batch.join(acceptedIds, Seq(idCol), "left_semi"), batchBands)
  }

  /** Production shape: band store as a [[graft.lake.TableLog]] table.
    * Reads the store snapshot, admits the batch, appends the batch's
    * bands as a new store version — so admission is replayable (time
    * travel the store) and concurrent ingest batches serialize through
    * the log's optimistic commit. Returns the admission and the new
    * store version. */
  def admitVersioned(spark: SparkSession, storePath: String,
      batch: DataFrame, k: Int = 3, numHashes: Int = 32, bands: Int = 4,
      maxBucket: Int = 200, idCol: String = "doc_id",
      textCol: String = "text"): (Admission, Int) = {
    val store = graft.lake.TableLog.latestVersion(spark, storePath)
      .map(_ => graft.lake.TableLog.read(spark, storePath))
    val adm = admitBatch(batch, store, k, numHashes, bands, maxBucket,
      idCol, textCol)
    val c = graft.lake.TableLog.commitAppend(spark, storePath, adm.bands)
    (adm, c.version)
  }
}
