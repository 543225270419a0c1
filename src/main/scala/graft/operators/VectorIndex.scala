package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.lake.TableLog

/** Persisted, incrementally-usable IVF vector index — the 100 TB
  * operating mode for ANN, where refitting a codebook per query run
  * (what [[Similarity.ivfTopK]] does, correctly, for one-shot search)
  * would re-sample the corpus on every ingest batch.
  *
  * Layout under the index root, both [[graft.lake.TableLog]] tables (so
  * the index is versioned, time-travelable, and concurrent ingest
  * serializes through the log's optimistic commit — the same
  * persistence pattern as [[IncrementalDedup.admitVersioned]]'s band
  * store):
  * {{{
  *   codebook/   (cluster_id long, centroid array<float>, build_err double)
  *   postings/   (vec_id, embedding, cluster_id)   # the inverted file
  * }}}
  *
  * Lifecycle:
  *  - [[build]] fits the codebook once on a bounded sample and assigns
  *    the base corpus (map-only broadcast argmin);
  *  - [[addBatch]] assigns NEW vectors against the PERSISTED codebook —
  *    no refit, one map pass over the batch plus one postings append —
  *    and reports a drift ratio (batch quantization error / build
  *    error) so the caller refits only when the embedding distribution
  *    actually moved ([[needsRefit]]);
  *  - [[search]] probes the persisted inverted file with the standard
  *    IVF two-stage scan ([[Similarity.probeTopK]]).
  *
  * Assignment stability is the point: a vector's cell depends only on
  * the persisted codebook, so earlier postings are never invalidated by
  * later batches (append-only index growth), and any search sees a
  * consistent snapshot via the log.
  */
object VectorIndex {

  def codebookPath(root: String): String = s"$root/codebook"
  def postingsPath(root: String): String = s"$root/postings"

  /** √N capped at 1024 — same sizing rule as the one-shot ANN tier. */
  private def autoK(vectors: DataFrame): Int =
    math.max(2, math.min(1024, math.sqrt(vectors.count().toDouble).toInt))

  /** Mean quantization error (1 − cosine to own centroid) of an
    * assigned frame — the scalar the drift check compares. */
  private def avgQuantErr(assigned: DataFrame, cents: Array[Array[Float]],
      vecCol: String): Double = {
    val spark = assigned.sparkSession
    import spark.implicits._
    val centsDf = broadcast(cents.toSeq.zipWithIndex
      .map { case (c, i) => (i.toLong, c.toSeq) }
      .toDF("cluster_id", "__centroid"))
    val row = assigned.join(centsDf, Seq("cluster_id"))
      .agg(avg(lit(1.0) - cosine(col(vecCol), col("__centroid"))))
      .first()
    if (row.isNullAt(0)) 0.0 else row.getDouble(0)
  }

  /** Fit the codebook on a bounded sample, assign every base vector,
    * persist both tables. Returns the codebook size. */
  def build(spark: SparkSession, root: String, vectors: DataFrame,
      numCentroids: Int = 0, idCol: String = "vec_id",
      vecCol: String = "embedding"): Int = {
    import spark.implicits._
    val nc = if (numCentroids > 0) numCentroids else autoK(vectors)
    val cents = Similarity.fitCentroids(vectors, nc,
      idCol = idCol, vecCol = vecCol)
    val assigned = Similarity.assignToCentroids(vectors, cents, idCol, vecCol)
    val buildErr = avgQuantErr(assigned, cents, vecCol)
    val centsDf = cents.toSeq.zipWithIndex
      .map { case (c, i) => (i.toLong, c.toSeq) }
      .toDF("cluster_id", "centroid")
      .withColumn("build_err", lit(buildErr))
    TableLog.commitOverwrite(spark, codebookPath(root), centsDf)
    TableLog.commitOverwrite(spark, postingsPath(root), assigned)
    cents.length
  }

  /** The persisted codebook, densified by cluster_id, plus its build
    * error. Driver-side by design — the codebook is ≤1024 rows. */
  def loadCodebook(spark: SparkSession,
      root: String): (Array[Array[Float]], Double) = {
    val rows = TableLog.read(spark, codebookPath(root))
      .select("cluster_id", "centroid", "build_err")
      .collect()
    val cents = rows.sortBy(_.getLong(0))
      .map(_.getSeq[Float](1).toArray)
    (cents, rows.head.getDouble(2))
  }

  /** Assign `batch` against the persisted codebook (map-only, NO
    * refit) and append to the inverted file. Returns the new postings
    * version and the drift ratio — batch quantization error relative
    * to build-time error; ≳ [[needsRefit]]'s tolerance means the
    * embedding distribution moved and the codebook is stale. */
  /** Drift ratio of an assigned batch vs the build-time error. The
    * denominator floor (1% cosine error) keeps the ratio meaningful
    * when the build corpus quantizes near-perfectly — otherwise a
    * well-clustered build (err ≈ 1e-7) makes ANY batch look like
    * drift. */
  private[graft] def batchDrift(assigned: DataFrame,
      cents: Array[Array[Float]], buildErr: Double, vecCol: String): Double =
    avgQuantErr(assigned, cents, vecCol) / math.max(buildErr, 0.01)

  def addBatch(spark: SparkSession, root: String, batch: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): (Int, Double) = {
    val (cents, buildErr) = loadCodebook(spark, root)
    val assigned = Similarity.assignToCentroids(batch, cents, idCol, vecCol)
    val drift = batchDrift(assigned, cents, buildErr, vecCol)
    val c = TableLog.commitAppend(spark, postingsPath(root), assigned)
    (c.version, drift)
  }

  /** Refit policy: a batch quantizing ≥ `tolerance`× worse than the
    * build corpus indicates drift. The caller then re-[[build]]s from
    * the union — refit stays an explicit, rare event, never implicit
    * per-batch work. */
  def needsRefit(driftRatio: Double, tolerance: Double = 2.0): Boolean =
    driftRatio >= tolerance

  /** Re-cluster the postings by cell (Z-order on (cluster_id, vec_id),
    * committed atomically) so [[search]]'s cell-pruned scan opens
    * ~nprobe/k of the files instead of all of them. Run after a
    * batch-add burst — the same compaction cadence as any table; at
    * 100 TB postings this is the difference between a probe reading
    * two cells and a probe reading the index. */
  def optimize(spark: SparkSession, root: String, numFiles: Int): Int =
    TableLog.commitOptimize(spark, postingsPath(root),
      ("cluster_id", "vec_id"), numFiles).version

  /** IVF search over the persisted inverted file at its latest (or a
    * time-traveled) version. No fitting, no assignment of the corpus —
    * one codebook read + the standard two-stage probe scan. The probed
    * cell set is resolved FIRST (one small job over the query set,
    * which is broadcast-small by contract), so the postings scan is a
    * stats-pruned [[TableLog.readWhereIn]]: over [[optimize]]d layout
    * only the probed cells' files are opened. */
  def search(spark: SparkSession, root: String, queries: DataFrame,
      k: Int, nprobe: Int = 2, version: Option[Int] = None,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val (cents, _) = loadCodebook(spark, root)
    val cells = queries
      .select(explode(graft.functions.NearestCentroids
        .nearestCentroids(col(vecCol), cents, nprobe)).as("__cell"))
      .distinct().collect().map(_.getInt(0))
    val assigned =
      if (cells.isEmpty) TableLog.read(spark, postingsPath(root), version).limit(0)
      else TableLog.readWhereIn(spark, postingsPath(root), "cluster_id",
        cells.toSeq, version)
    Similarity.probeTopK(assigned, cents, queries, k, nprobe, idCol, vecCol)
  }
}
