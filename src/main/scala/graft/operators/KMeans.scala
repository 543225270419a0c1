package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.NearestCentroids.nearestCentroids

/** Distributed Lloyd k-means over an `array<float>` embedding column —
  * the full-corpus refinement tier above
  * [[Similarity.fitCentroids]]'s train-on-sample codebook, and a
  * first-class clustering operator for training-data curation
  * (semantic bucketing, per-cluster sampling quotas, cluster-balanced
  * mixes).
  *
  * Scale shape of one iteration (the part that must survive 100 TB):
  *  - ASSIGN: per-row argmin against the broadcast codebook inside
  *    whole-stage codegen ([[graft.functions.NearestCentroids]]) —
  *    map-only, zero shuffle, exactly the IVF assignment primitive.
  *  - UPDATE: `posexplode(vector)` → groupBy (cluster, dim position) →
  *    avg. The explode LOOKS like an N×dim blow-up, but hash
  *    aggregation runs map-side partial first: each task reduces to
  *    ≤ k×dim (cluster, pos, sum, count) cells before anything moves,
  *    so the shuffle is #tasks × k × dim partial cells, independent of
  *    row count — the DataFrame equivalent of MLlib's treeAggregate.
  *  - k×dim averaged cells collect to the driver (the codebook itself;
  *    bounded and tiny), never the data.
  *
  * Convergence: stops when no centroid moves more than `tol` (L∞ over
  * coordinates) or after `maxIter` rounds. Empty clusters keep their
  * previous centroid (same policy as the sample-fit path, keeps k
  * stable and runs deterministic). Deterministic end-to-end: init is
  * the xxhash64-ordered sample, and float averaging is over
  * double-precision sums.
  */
object KMeans {

  /** Fitted model: row-major codebook + per-iteration mean squared
    * distance (cost) trace, cost measured on the assignment that
    * PRODUCED each new codebook. */
  final case class Model(centroids: Array[Array[Float]], costTrace: Seq[Double]) {
    def k: Int = centroids.length
    def dim: Int = if (centroids.isEmpty) 0 else centroids(0).length
  }

  /** Lloyd iterations over the full corpus, initialized from the
    * deterministic bounded sample (so a 0-iteration fit IS the
    * sample codebook). */
  def fit(vectors: DataFrame, k: Int, maxIter: Int = 5, tol: Double = 1e-4,
      idCol: String = "vec_id", vecCol: String = "embedding"): Model = {
    require(k >= 1, "k must be >= 1")
    var cents = Similarity.fitCentroids(vectors, k, idCol = idCol, vecCol = vecCol)
    val dim = cents(0).length
    val costs = scala.collection.mutable.ArrayBuffer.empty[Double]
    // Σ|x|² is iteration-invariant: one native vec_dot pass, up front.
    val sqNorm = vectors
      .agg(sum(graft.functions.VectorFunctions.dot(col(vecCol), col(vecCol))))
      .head().getDouble(0)
    var it = 0
    var moved = true
    while (it < maxIter && moved) {
      // ASSIGN (map-only) + squared distance to the assigned centroid
      // for the cost trace: |x-c|² via vec_dot would need c per row;
      // cheaper to fold it into the same aggregate pass below.
      val assigned = vectors.select(
        col(vecCol).as("v"),
        nearestCentroids(col(vecCol), cents, nprobe = 1).getItem(0).as("cid"))

      // UPDATE: one pass computes per-(cluster, pos) sums/counts AND
      // the global squared-error in the same shuffle round.
      val cells = assigned
        .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cid", "pos")
        .agg(sum(col("x").cast("double")).as("s"), count(lit(1)).as("n"))
        .collect()

      val sums = Array.ofDim[Double](cents.length, dim)
      val counts = new Array[Long](cents.length)
      cells.foreach { r =>
        val cid = r.getInt(0); val pos = r.getInt(1)
        sums(cid)(pos) += r.getDouble(2)
        if (pos == 0) counts(cid) = r.getLong(3)
      }
      val next = Array.tabulate(cents.length) { c =>
        if (counts(c) == 0L) cents(c)
        else Array.tabulate(dim)(j => (sums(c)(j) / counts(c)).toFloat)
      }

      // cost of the assignment just used (against the OLD codebook):
      // Σ|x-c|² = Σ|x|² − 2·Σ c·s_c + Σ n_c|c|², assembled driver-side
      // from the k×dim cells — no extra pass over the data.
      var cross = 0.0; var cnorm = 0.0; var nTotal = 0L
      var c = 0
      while (c < cents.length) {
        var j = 0
        while (j < dim) {
          cross += sums(c)(j) * cents(c)(j)
          cnorm += counts(c) * cents(c)(j).toDouble * cents(c)(j).toDouble
          j += 1
        }
        nTotal += counts(c)
        c += 1
      }
      costs += (sqNorm - 2.0 * cross + cnorm) / math.max(nTotal, 1L)

      moved = next.zip(cents).exists { case (a, b) =>
        var j = 0; var mx = 0.0
        while (j < dim) { mx = math.max(mx, math.abs(a(j) - b(j))); j += 1 }
        mx > tol
      }
      cents = next
      it += 1
    }
    Model(cents, costs.toSeq)
  }

  /** Cluster assignment as a query: (id, cluster_id) + per-cluster
    * sizes — the curation view of the fitted model. Map-only assignment
    * plus one k-cardinality aggregate. */
  def assign(vectors: DataFrame, model: Model,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = vectors.select(col(idCol),
      nearestCentroids(col(vecCol), model.centroids, nprobe = 1)
        .getItem(0).cast("bigint").as("cluster_id"))
    val sizes = a.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
    a.join(sizes, "cluster_id")
      .select(col(idCol), col("cluster_id"), col("cluster_size"))
      .orderBy(idCol)
  }
}
