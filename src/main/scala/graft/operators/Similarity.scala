package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFunctions._
import graft.functions.NearestCentroids.nearestCentroids

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * The IVF (inverted-file) structure follows the public formulation of
  * Jégou/Douze/Schmid ("Product quantization for nearest neighbor
  * search", TPAMI 2011) minus the PQ compression: coarse-quantize to a
  * FIXED-SIZE centroid codebook, probe the nprobe nearest cells.
  *
  * Two tiers, per the north-star contract:
  *  - `bruteForceTopK`: exact cosine top-k — the correctness baseline.
  *    The query set is broadcast, so the big side streams once with no
  *    shuffle; cost is O(|candidates|·|queries|·dim) flops inside
  *    codegen'd native expressions.
  *  - `ivfTopK`: IVF scale path. The codebook is fit once on a bounded
  *    sample (driver-side Lloyd over ≤`sampleSize` vectors — standard
  *    train-on-sample / apply-everywhere), then EVERY assignment is a
  *    per-row argmin against the broadcast codebook inside codegen
  *    ([[graft.functions.NearestCentroids]]): zero joins, zero shuffles
  *    for quantization, regardless of corpus size. Pairwise work drops
  *    by ~k/nprobe. k defaults to √N capped — it does NOT grow linearly
  *    with the corpus, so assignment cost stays O(N·k·dim) map-only.
  */
object Similarity {

  /** Truncated-dimension fidelity report: cosine similarity of vector
    * pairs at the full dimension vs prefix truncations — the
    * evaluation behind Matryoshka-style embeddings (Kusupati et al.,
    * NeurIPS 2022: prefix dims carry most of the signal, so indexes
    * can store/search a truncation). Pairs are consecutive ids inside
    * a bounded block, so the report is deterministic and exact; a
    * truncation whose cosines track `cos_full` closely is safe to
    * index at that width (e.g. a 2× smaller IVF/PQ tier).
    *
    * Map-only: pairs form by an id equi-join inside the bounded block;
    * each cosine is codegen'd vector math, no shuffle beyond the tiny
    * self-join. */
  def truncationFidelity(emb: DataFrame, truncDims: Seq[Int],
      maxId: Long = 200L, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(truncDims.nonEmpty, "need at least one truncation width")
    require(truncDims.forall(_ > 0), "truncation widths must be positive")
    // slice(vec, 1, d) with d > len returns the WHOLE vector — the
    // report would fabricate perfect fidelity for a width that isn't
    // a truncation at all, so reject widths ≥ the embedding dim
    val dim = emb.select(size(col(vecCol))).first().getInt(0)
    require(truncDims.forall(_ < dim),
      s"truncation widths ${truncDims.filter(_ >= dim).mkString(",")} are " +
        s"not below the embedding dimension $dim — not a truncation")
    val a = emb.filter(col(idCol) < maxId && col(idCol) % 2 === 0)
      .select(col(idCol).as("id_a"), col(vecCol).as("__va"))
    val b = emb.filter(col(idCol) < maxId && col(idCol) % 2 === 1)
      .select((col(idCol) - 1).as("id_a"), col(vecCol).as("__vb"))
    val cosCols = round(cosine(col("__va"), col("__vb")), 6).as("cos_full") +:
      truncDims.map(d => round(cosine(
        slice(col("__va"), 1, d), slice(col("__vb"), 1, d)), 6).as(s"cos_$d"))
    a.join(b, "id_a")
      .select(col("id_a") +: cosCols: _*)
      .orderBy("id_a")
  }

  /** Exact cosine top-k: for each query vector, the `k` most similar
    * candidate vectors (excluding itself). */
  def bruteForceTopK(candidates: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(
      col(idCol).as("query_id"), col(vecCol).as("q_vec")))
    val c = candidates.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
    val scored = c.join(q, col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("q_vec"), col("c_vec")), 6).as("cos_sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos_sim", "rank")
      .orderBy("query_id", "rank")
  }

  /** Fit a fixed-size centroid codebook: deterministic uniform sample
    * (top-`sampleSize` by xxhash64 of the id — a distributed
    * TakeOrdered, not a full sort), then `iters` Lloyd steps on the
    * driver. The sample is bounded (sampleSize·dim floats) no matter
    * the corpus size; the fit never touches the full data. Empty
    * clusters keep their previous centroid, so the codebook size is
    * stable and the fit is deterministic end-to-end. */
  def fitCentroids(vectors: DataFrame, k: Int,
      sampleSize: Int = 4096, iters: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): Array[Array[Float]] = {
    require(k >= 1, "k must be >= 1")
    val sample = vectors
      .select(col(vecCol), xxhash64(col(idCol)).as("__h"))
      .orderBy(col("__h"))
      .limit(math.max(k, sampleSize))
      .select(col(vecCol))
      .collect()
      .map(_.getSeq[Float](0).toArray)
    lloydOnSample(sample, math.min(k, sample.length), iters)
  }

  /** Driver-side Lloyd iterations over a bounded in-memory sample
    * (shared with [[ProductQuantization]]'s per-subspace training). */
  private[operators] def lloydOnSample(points: Array[Array[Float]], k: Int,
      iters: Int): Array[Array[Float]] = {
    require(points.nonEmpty,
      "cannot fit centroids on an empty corpus — an upstream filter " +
        "matched no vectors")
    var cents = points.take(k).map(_.clone())
    val dim = cents(0).length
    var it = 0
    while (it < iters) {
      val sums = Array.ofDim[Double](k, dim)
      val counts = new Array[Long](k)
      points.foreach { p =>
        var best = 0
        var bd = Double.MaxValue
        var c = 0
        while (c < k) {
          var d = 0.0d
          var j = 0
          while (j < dim) { val t = p(j).toDouble - cents(c)(j).toDouble; d += t * t; j += 1 }
          if (d < bd) { bd = d; best = c }
          c += 1
        }
        counts(best) += 1
        var j = 0
        while (j < dim) { sums(best)(j) += p(j); j += 1 }
      }
      cents = Array.tabulate(k) { c =>
        if (counts(c) == 0) cents(c)
        else Array.tabulate(dim)(j => (sums(c)(j) / counts(c)).toFloat)
      }
      it += 1
    }
    cents
  }

  /** Assign each vector to its nearest centroid: a per-row codegen'd
    * argmin against the broadcast codebook — map-only, no join, no
    * shuffle. This is the step that must survive 100 TB. */
  def assignToCentroids(vectors: DataFrame, centroids: Array[Array[Float]],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    vectors.select(col(idCol), col(vecCol),
      nearestCentroids(col(vecCol), centroids, nprobe = 1)
        .getItem(0).as("cluster_id"))

  /** √N capped — fixed relative to corpus size so assignment stays
    * O(N·k) with bounded k, never O(N²). */
  private def autoK(vectors: DataFrame): Int =
    math.max(2, math.min(1024, math.sqrt(vectors.count().toDouble).toInt))

  /** IVF ANN top-k: probe the `nprobe` closest centroid cells per
    * query, brute-force only within them. Approximate (recall < 1 when
    * the true neighbor lives in an unprobed cell) but the per-query
    * candidate set shrinks from |N| to ~|N|·nprobe/k.
    * `numCentroids = 0` ⇒ √N capped at 1024. */
  def ivfTopK(vectors: DataFrame, queries: DataFrame, k: Int,
      numCentroids: Int = 0, nprobe: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val nc = if (numCentroids > 0) numCentroids else autoK(vectors)
    val cents = fitCentroids(vectors, nc, idCol = idCol, vecCol = vecCol)
    val assigned = assignToCentroids(vectors, cents, idCol, vecCol)
    probeTopK(assigned, cents, queries, k, nprobe, idCol, vecCol)
  }

  /** The probe stage of IVF search, factored so a PERSISTED inverted
    * file ([[VectorIndex]]) can search without refitting: queries map
    * to their nprobe nearest cells (per-row codegen'd argmin, query
    * side broadcast), exact cosine only within probed cells. */
  private[graft] def probeTopK(assigned: DataFrame,
      cents: Array[Array[Float]], queries: DataFrame, k: Int, nprobe: Int,
      idCol: String, vecCol: String): DataFrame = {
    val probes = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
        nearestCentroids(col(vecCol), cents, nprobe).as("__cells"))
      .withColumn("cluster_id", explode(col("__cells")))
      .drop("__cells")
    val scored = assigned.join(broadcast(probes), Seq("cluster_id"))
      .filter(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        round(cosine(col("q_vec"), col(vecCol)), 6).as("cos_sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos_sim", "rank")
      .orderBy("query_id", "rank")
  }

  /** Embedding near-duplicate pairs via random-hyperplane LSH
    * (Charikar, STOC 2002) — the codebook-free alternative to
    * [[embeddingNearDups]]: no training step at all, so it suits
    * pipelines where even fitting on a sample is unwanted.
    *
    * Shape: per-row native 64-bit signature
    * ([[graft.functions.HyperplaneSignature]], map-only) → bucket by
    * 16-bit signature chunks (pigeonhole: Hamming ≤ 3 guarantees a
    * shared chunk) → exact cosine verify within buckets. Precision is
    * exact; recall covers genuinely NEAR pairs (θ → 0 ⇒ chunk-collision
    * probability (1−θ/π)^16 → 1) and falls off for mid-similarity pairs
    * — the near-DUP contract, same as SimHash over text.
    *
    * Shuffle discipline (the [[Dedup.minHashCandidates]] recipe): the
    * chunk equi-join carries only (int, long, id) rows — the full
    * embedding would multiply the shuffle by dim×4 copies per side —
    * and candidate id pairs are DISTINCT'd before the vectors
    * re-attach, so a pair sharing all 4 chunks costs one cosine, not
    * four. Chunk buckets past `maxBucket` are dropped (hot-bucket cap,
    * same contract as the text-side candidates). */
  def hyperplaneNearDups(vectors: DataFrame, threshold: Double,
      dim: Int, seed: Long = 7L,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxBucket: Int = 200): DataFrame = {
    val signed = vectors.select(col(idCol),
      graft.functions.HyperplaneSignature
        .hyperplaneSignature(col(vecCol), numBits = 64, dim = dim, seed = seed)
        .as("hp_sig"))
    val chunked0 = signed.select(col(idCol),
      explode(array((0 until 4).map { c =>
        struct(lit(c).as("chunk_id"),
          shiftright(col("hp_sig"), c * 16).bitwiseAND(lit(0xFFFFL)).as("chunk"))
      }: _*)).as("c"))
      .select(col(idCol), col("c.chunk_id"), col("c.chunk"))
    val bucketSizes = chunked0.groupBy("chunk_id", "chunk")
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n").between(2, maxBucket))
    val chunked = chunked0.join(bucketSizes.select("chunk_id", "chunk"),
      Seq("chunk_id", "chunk"), "left_semi")
    val pairs = chunked.select(col("chunk_id"), col("chunk"),
        col(idCol).as("id_a"))
      .join(chunked.select(col("chunk_id"), col("chunk"),
        col(idCol).as("id_b")), Seq("chunk_id", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    pairs
      .join(vectors.select(col(idCol).as("id_a"), col(vecCol).as("v_a")), "id_a")
      .join(vectors.select(col(idCol).as("id_b"), col(vecCol).as("v_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        round(cosine(col("v_a"), col("v_b")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
      .orderBy("id_a", "id_b")
  }

  /** The composed embedding-dedup pipeline — the vector-side analog of
    * [[Dedup.fuzzyDedupKeepFirst]], but with EXACT transitive
    * resolution: hyperplane-LSH candidate pairs (bucketed, never
    * all-pairs) → connected components over the verified pairs
    * ([[DupClusters.connectedComponents]], log-round star contraction)
    * → keep the cluster-min vector as canonical. Returns
    * (vec_id, cluster_id, is_canonical) for every vector. */
  def embeddingDedupPipeline(vectors: DataFrame, threshold: Double, dim: Int,
      seed: Long = 7L,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val pairs = hyperplaneNearDups(vectors, threshold, dim, seed, idCol, vecCol)
      .select("id_a", "id_b")
    DupClusters.clusterDocuments(vectors, pairs, idCol)
      .select(col(idCol), col("cluster_id"),
        (col(idCol) === col("cluster_id")).as("is_canonical"))
      .orderBy(idCol)
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold, bucketed via
    * the per-row centroid assignment so only same-cell pairs are
    * compared (near-dups land in the same cell with high probability).
    * The only shuffle is the equi-join on cluster_id — the LSH-bucket
    * shape; assignment itself is map-only. Precision is exact (true
    * cosine is computed per surviving pair); recall < 1 for pairs split
    * across cells — raise numCentroids/lower threshold to trade. */
  def embeddingNearDups(vectors: DataFrame, threshold: Double,
      numCentroids: Int = 0, maxCell: Int = 4096, neighborWindow: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val nc = if (numCentroids > 0) numCentroids else autoK(vectors)
    val cents = fitCentroids(vectors, nc, idCol = idCol, vecCol = vecCol)
    val assigned = assignToCentroids(vectors, cents, idCol, vecCol)
    // same skew guard as [[semDeDup]]: a degenerate embedding cluster
    // puts m ≫ maxCell rows on one cluster_id and the within-cell
    // self-join goes O(m²) on a single key — oversized cells fall back
    // to sorted-neighborhood candidates. Candidate pairs are ids only;
    // vectors re-attach once per pair for the exact cosine.
    val cellSizes = assigned.groupBy("cluster_id")
      .agg(count(lit(1)).as("__cell_n"))
    val withN = assigned.join(broadcast(cellSizes), Seq("cluster_id"))
    val small = withN.filter(col("__cell_n") <= maxCell)
      .select(col("cluster_id"), col(idCol))
    val smallPairs = small.select(col("cluster_id"), col(idCol).as("id_a"))
      .join(small.select(col("cluster_id"), col(idCol).as("id_b")),
        Seq("cluster_id"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
    val dim = cents.headOption.map(_.length).getOrElse(0)
    val bigPairs = sortedNeighborhoodPairs(
      withN.filter(col("__cell_n") > maxCell).drop("__cell_n"),
      dim, neighborWindow, seed = 7L, idCol = idCol, vecCol = vecCol)
    smallPairs.unionByName(bigPairs)
      .join(vectors.select(col(idCol).as("id_a"), col(vecCol).as("v_a")), "id_a")
      .join(vectors.select(col(idCol).as("id_b"), col(vecCol).as("v_b")), "id_b")
      .withColumn("cos_sim", round(cosine(col("v_a"), col("v_b")), 6))
      .filter(col("cos_sim") >= threshold)
      .select("id_a", "id_b", "cos_sim")
      .orderBy("id_a", "id_b")
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540 — public method):
    * semantic deduplication of an embedded corpus. Candidates come from
    * k-means cells (map-only broadcast assignment, exact cosine only
    * within a cell — never all-pairs), transitive closure merges
    * overlapping pairs into dup GROUPS, and each group survives through
    * exactly one member: the one FARTHEST from its cell centroid
    * (lowest centroid cosine), the paper's diversity-keeping rule —
    * dropping centroid-near members removes the most redundant
    * examples. Ties break on the lower id.
    *
    * Scale shape: codebook fit on a bounded sample; assignment
    * codegen'd per-row against the broadcast codebook; the only
    * data-scale shuffles are the cell equi-join, the log-round
    * component contraction, and one window over dup groups (group
    * cardinality, not corpus cardinality, bounds the skew). Cells
    * larger than `maxCell` never go all-pairs — they fall back to
    * sorted-neighborhood candidates ([[sortedNeighborhoodPairs]]), so a
    * degenerate embedding cluster costs O(m·win), not O(m²). Recall < 1
    * for dup pairs split across cells — the documented SemDeDup
    * trade; raise `numCentroids` to shrink cells, lower it to shrink
    * the split risk.
    *
    * Returns every input row: (id, group_id, group_size, centroid_cos,
    * keep). Filtering `keep` yields the deduplicated corpus. */
  /** Dedup-flavored codebook sizing: k targets a FIXED expected cell
    * size (~256), i.e. k ∝ N — unlike the ANN tier's √N rule. The
    * within-cell pair stage costs Σ|cell|² ≈ N·cellSize, which stays
    * LINEAR in the corpus only if cell size is pinned; a √N codebook
    * would make it N^1.5. The cap bounds the broadcast codebook and
    * the per-row argmin (k·dim flops); past cap·256 vectors the cells
    * grow again — at that scale switch to [[hyperplaneNearDups]]
    * (hash-bucketed, no codebook) and accept its recall profile. */
  private def autoKDedup(vectors: DataFrame): Int = {
    val n = vectors.count()
    math.max(2, math.min(4096, math.ceil(n / 256.0).toInt))
  }

  /** Sorted-neighborhood candidate pairs for a SKEWED cell population:
    * rank members by (hyperplane signature, id) and pair each row with
    * its next `win` neighbors — O(m·win) pairs instead of the all-pairs
    * O(m²). The degenerate mass semDeDup exists to kill (near-identical
    * embeddings: empty docs, boilerplate, template farms) collapses to
    * EQUAL signatures, so its members rank contiguously and the chain
    * pairs (i, i+1) alone keep the whole run transitively connected —
    * bounded work without losing the dup group. Mid-similarity pairs
    * further than `win` apart in signature order are the recall trade,
    * same contract as every banded tier here. The rank itself sorts one
    * partition per oversized cell over (id, sig) rows only (~24 B/row —
    * vectors re-attach per emitted pair, never travel through the
    * sort); pair generation re-distributes on (cell, rank). */
  private[graft] def sortedNeighborhoodPairs(members: DataFrame,
      dim: Int, win: Int, seed: Long,
      idCol: String, vecCol: String): DataFrame = {
    val sigd = members.select(col("cluster_id"), col(idCol),
      graft.functions.HyperplaneSignature
        .hyperplaneSignature(col(vecCol), numBits = 64, dim = dim, seed = seed)
        .as("__sig"))
    val w = Window.partitionBy("cluster_id").orderBy(col("__sig"), col(idCol))
    val ranked = sigd.withColumn("__rn", row_number().over(w))
    val anchors = ranked.select(col("cluster_id"), col(idCol).as("__id_x"),
      explode(sequence(col("__rn") + 1, col("__rn") + lit(win))).as("__rn_y"))
    val partners = ranked.select(col("cluster_id"),
      col("__rn").as("__rn_y"), col(idCol).as("__id_y"))
    anchors.join(partners, Seq("cluster_id", "__rn_y"))
      .select(least(col("__id_x"), col("__id_y")).as("id_a"),
        greatest(col("__id_x"), col("__id_y")).as("id_b"))
  }

  def semDeDup(vectors: DataFrame, tau: Double, numCentroids: Int = 0,
      maxCell: Int = 4096, neighborWindow: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val nc = if (numCentroids > 0) numCentroids else autoKDedup(vectors)
    val cents = fitCentroids(vectors, nc,
      sampleSize = math.max(4096, 4 * nc), idCol = idCol, vecCol = vecCol)
    // the per-row argmin (k·dim flops) feeds THREE consumers below
    // (cell sizes, the cell join, centroid cosines) — materialize it
    // once, eagerly, like every multiply-consumed frame in this repo;
    // the cache lives until the caller clears it (Bench/Verify do)
    val assigned = assignToCentroids(vectors, cents, idCol, vecCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    assigned.count()
    // Skew guard: autoKDedup pins the EXPECTED cell at ~256 members, but
    // k-means cells skew — a degenerate embedding cluster can put
    // millions of rows in one cell, turning the within-cell join into
    // O(m²) on a single key. Cells over `maxCell` switch from all-pairs
    // to sorted-neighborhood candidates (the text tier's maxBucket
    // analog, but connectivity-preserving instead of dropping the
    // bucket). The cell-size agg is one k-row broadcast.
    val cellSizes = assigned.groupBy("cluster_id")
      .agg(count(lit(1)).as("__cell_n"))
    val withN = assigned.join(broadcast(cellSizes), Seq("cluster_id"))
    val smallCells = withN.filter(col("__cell_n") <= maxCell).drop("__cell_n")
    val bigCells = withN.filter(col("__cell_n") > maxCell).drop("__cell_n")
    val a = smallCells.select(col("cluster_id"),
      col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val b = smallCells.select(col("cluster_id"),
      col(idCol).as("id_b"), col(vecCol).as("v_b"))
    val smallPairs = a.join(b, Seq("cluster_id"))
      .filter(col("id_a") < col("id_b"))
      .filter(cosine(col("v_a"), col("v_b")) >= tau)
      .select("id_a", "id_b")
    val dim = cents.headOption.map(_.length).getOrElse(0)
    val bigCand = sortedNeighborhoodPairs(bigCells, dim,
      neighborWindow, seed = 7L, idCol = idCol, vecCol = vecCol)
    val va = vectors.select(col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val vb = vectors.select(col(idCol).as("id_b"), col(vecCol).as("v_b"))
    val bigPairs = bigCand.join(va, "id_a").join(vb, "id_b")
      .filter(cosine(col("v_a"), col("v_b")) >= tau)
      .select("id_a", "id_b")
    val pairs = smallPairs.unionByName(bigPairs)
    val groups = DupClusters.clusterDocuments(vectors, pairs, idCol)
      .withColumnRenamed("cluster_id", "group_id")
      .withColumnRenamed("cluster_size", "group_size")
    // per-row distance to own centroid: broadcast the k-row codebook
    val centsDf = broadcast(
      cents.toSeq.zipWithIndex
        .map { case (c, i) => (i.toLong, c.toSeq) }
        .toDF("cluster_id", "__centroid"))
    val withCos = assigned.join(centsDf, Seq("cluster_id"))
      .select(col(idCol),
        round(cosine(col(vecCol), col("__centroid")), 6).as("centroid_cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("group_id"))
      .orderBy(col("centroid_cos").asc, col(idCol).asc)
    groups.join(withCos, Seq(idCol))
      .withColumn("keep", row_number().over(w) === 1)
      .select(col(idCol), col("group_id"), col("group_size"),
        col("centroid_cos"), col("keep"))
      .orderBy(idCol)
  }

  /** Maximal-marginal-relevance rerank of ANN results: greedily pick
    * `m` of each query's `k` candidates trading relevance against
    * redundancy — MMR_i = λ·sim(q,c_i) − (1−λ)·max_{s∈S} sim(c_i,s)
    * (Carbonell & Goldstein, SIGIR 1998). Plain top-k returns
    * near-duplicate hits back-to-back; retrieval feeding a training
    * mix or a RAG context wants the *distinct* near neighbors.
    *
    * Scale shape: the expensive part (corpus-wide search) stays the
    * IVF path; the greedy pass runs per query over its OWN ≤k
    * candidate rows via `groupByKey.mapGroups` — bounded O(k²·dim)
    * state per key, the same bounded-per-group contract as the funnel
    * tier's typed state. λ=1 degenerates to plain top-m (asserted in
    * spec); ties break (score desc, id asc), deterministic. */
  def mmrRerank(vectors: DataFrame, queries: DataFrame, k: Int = 32,
      m: Int = 8, lambda: Double = 0.7, numCentroids: Int = 0,
      nprobe: Int = 2, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(m >= 1 && k >= m, s"need k >= m >= 1, got k=$k m=$m")
    mmrGreedy(
      ivfTopK(vectors, queries, k, numCentroids, nprobe, idCol, vecCol),
      vectors, m, lambda, idCol, vecCol)
  }

  /** [[mmrRerank]] over EXACT brute-force candidates instead of the
    * hash-seeded IVF path: fully deterministic, so the whole rerank is
    * DuckDB-replayable (see [[mmrOracleSql]]) — the oracled face of
    * the operator, with the IVF variant as the corpus-scale path. */
  def mmrRerankExact(vectors: DataFrame, queries: DataFrame, k: Int = 32,
      m: Int = 8, lambda: Double = 0.7, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(m >= 1 && k >= m, s"need k >= m >= 1, got k=$k m=$m")
    mmrGreedy(bruteForceTopK(vectors, queries, k, idCol, vecCol),
      vectors, m, lambda, idCol, vecCol)
  }

  /** The shared greedy stage: per query, pick `m` of its candidate
    * rows by MMR score. Every compared quantity is snapped to the
    * 1e-6 grid (the relevance cos arrives 6-rounded from the top-k
    * stage; the pairwise redundancy cos is snapped here), so the
    * argmax sequence is reproducible across engines — raw-ulp noise
    * in a cosine can't flip a pick. */
  private def mmrGreedy(topk: DataFrame, vectors: DataFrame, m: Int,
      lambda: Double, idCol: String, vecCol: String): DataFrame = {
    require(m >= 1, s"need m >= 1, got m=$m")
    require(lambda >= 0.0 && lambda <= 1.0, "lambda must be in [0, 1]")
    val spark = vectors.sparkSession
    import spark.implicits._
    val withVec = topk.join(
      vectors.select(col(idCol).as("neighbor_id"), col(vecCol).as("__nv")),
      Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"),
        col("__nv"))
      .as[(Long, Long, Double, Array[Float])]
    withVec.groupByKey(_._1)
      .flatMapGroups { (qid, it) =>
        val cand = it.toArray.sortBy(r => (-r._3, r._2))
        val chosen = scala.collection.mutable.ArrayBuffer.empty[Int]
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Long, Double, Long)]
        var step = 0
        while (step < math.min(m, cand.length)) {
          var bestIdx = -1
          var bestScore = Double.NegativeInfinity
          var i = 0
          while (i < cand.length) {
            if (!chosen.contains(i)) {
              var red = 0.0
              var j = 0
              while (j < chosen.length) {
                // snap to the 1e-6 grid BEFORE the max, with the
                // oracle ROUND's operational semantics: a one-ulp
                // difference vs the oracle's cosine must not be able
                // to flip which neighbor dominates the redundancy term
                val s = MmrMath.round6(
                  MmrMath.cos(cand(i)._4, cand(chosen(j))._4))
                if (s > red) red = s
                j += 1
              }
              val score = lambda * cand(i)._3 - (1.0 - lambda) * red
              // strict > keeps the earlier (higher-sim, lower-id) on tie
              if (score > bestScore) { bestScore = score; bestIdx = i }
            }
            i += 1
          }
          chosen += bestIdx
          out += ((qid, cand(bestIdx)._2,
            MmrMath.round6(bestScore), (step + 1).toLong))
          step += 1
        }
        out.iterator
      }
      .toDF("query_id", "neighbor_id", "mmr_score", "mmr_rank")
      .orderBy("query_id", "mmr_rank")
  }

  /** Hard-negative mining for contrastive training: for every anchor
    * vector, the `k` most-similar vectors carrying a DIFFERENT label —
    * the ANN-retrieved negatives that make embedding training work
    * (the public ANCE protocol: Xiong et al., "Approximate Nearest
    * Neighbor Negative Contrastive Learning", ICLR 2021 — random
    * negatives are trivially easy; the informative ones are the near
    * misses).
    *
    * Unlike [[ivfTopK]] the "query" set here is the whole corpus, so
    * broadcasting it is off the table; instead candidates form WITHIN
    * coarse cells (the [[semDeDup]] shape): map-only assignment, an
    * equi-join on the cell id, label-mismatch filter, then a per-anchor
    * top-k window whose partition is bounded by cell size. Cells past
    * `maxCell` switch to mirrored sorted-neighborhood candidates —
    * O(m·win) instead of O(m²), same trade as the dedup tier.
    * Approximate by construction (a cross-cell near miss is unseen);
    * the recall floor vs brute force is spec-asserted. */
  def hardNegatives(vectors: DataFrame, k: Int = 5, numCentroids: Int = 0,
      maxCell: Int = 4096, neighborWindow: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val nc = if (numCentroids > 0) numCentroids else autoKDedup(vectors)
    val cents = fitCentroids(vectors, nc,
      sampleSize = math.max(4096, 4 * nc), idCol = idCol, vecCol = vecCol)
    val assigned = vectors.select(col(idCol), col(vecCol), col(labelCol),
      nearestCentroids(col(vecCol), cents, nprobe = 1)
        .getItem(0).as("cluster_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cellSizes = assigned.groupBy("cluster_id")
      .agg(count(lit(1)).as("__cell_n"))
    val withN = assigned.join(broadcast(cellSizes), Seq("cluster_id"))
    val small = withN.filter(col("__cell_n") <= maxCell).drop("__cell_n")
    val big = withN.filter(col("__cell_n") > maxCell).drop("__cell_n")
    val smallPairs = small
      .select(col("cluster_id"), col(idCol).as("anchor_id"),
        col(vecCol).as("__av"), col(labelCol).as("__al"))
      .join(small.select(col("cluster_id"), col(idCol).as("neg_id"),
        col(vecCol).as("__nv"), col(labelCol).as("__nl")),
        Seq("cluster_id"))
      .filter(col("anchor_id") =!= col("neg_id") &&
        col("__al") =!= col("__nl"))
      .select(col("anchor_id"), col("neg_id"),
        round(cosine(col("__av"), col("__nv")), 6).as("cos_sim"))
    val dim = cents.headOption.map(_.length).getOrElse(0)
    // sorted-neighborhood emits undirected (id_a < id_b) pairs; mining
    // is per-anchor directional, so mirror before scoring
    val bigCand = sortedNeighborhoodPairs(big, dim, neighborWindow,
      seed = 11L, idCol = idCol, vecCol = vecCol)
    val mirrored = bigCand.select(col("id_a").as("anchor_id"),
        col("id_b").as("neg_id"))
      .unionByName(bigCand.select(col("id_b").as("anchor_id"),
        col("id_a").as("neg_id")))
    val av = vectors.select(col(idCol).as("anchor_id"),
      col(vecCol).as("__av"), col(labelCol).as("__al"))
    val nv = vectors.select(col(idCol).as("neg_id"),
      col(vecCol).as("__nv"), col(labelCol).as("__nl"))
    val bigPairs = mirrored.join(av, "anchor_id").join(nv, "neg_id")
      .filter(col("__al") =!= col("__nl"))
      .select(col("anchor_id"), col("neg_id"),
        round(cosine(col("__av"), col("__nv")), 6).as("cos_sim"))
    val w = Window.partitionBy("anchor_id")
      .orderBy(col("cos_sim").desc, col("neg_id"))
    smallPairs.unionByName(bigPairs)
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .orderBy("anchor_id", "rank")
  }

  /** Diversity-aware corpus subselection: pick `budget` rows that COVER
    * the embedding space instead of mirroring its density — the
    * selection step of cluster-coverage curation (the public D4 recipe:
    * Tirumala et al., "D4: Improving LLM Pretraining via Document
    * De-Duplication and Diversification", NeurIPS 2023, composes
    * dedup with cluster-aware reselection; per-cluster prototype
    * picking is the k-center/coreset idea of Sener & Savarese, ICLR
    * 2018). Dense regions are over-represented in raw corpora; a
    * subsample proportional to cluster SIZE just reproduces that skew,
    * so the per-cluster budget here grows with √size — sublinear, so
    * rare modes keep seats — and within a cluster the most CENTRAL
    * rows win (prototypes, not outliers).
    *
    * Scale shape: codebook fit on a bounded sample; assignment is the
    * map-only codegen argmin; cluster sizes are one k-row agg collected
    * to the driver (k ≤ 1024, bounded) where the √-weighted
    * largest-remainder allocation runs; the within-cluster top-m is the
    * SALTED two-phase pattern — phase 1 ranks inside (cluster, salt)
    * groups so no single window partition sees the whole cluster (the
    * k ≤ 1024 skew trap of a direct per-cluster window at 100 TB),
    * phase 2 re-ranks only the ≤ salts·alloc survivors. Any global
    * top-m row is also top-m within its salt group, so the two-phase
    * result equals the unsalted one exactly. */
  def diverseSubset(vectors: DataFrame, budget: Int, numCentroids: Int = 0,
      salts: Int = 8, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val nc = if (numCentroids > 0) numCentroids else autoK(vectors)
    val cents = fitCentroids(vectors, nc, idCol = idCol, vecCol = vecCol)
    diverseSubsetWith(vectors, cents, budget, salts, idCol, vecCol)
  }

  /** [[diverseSubset]] against a CALLER-SUPPLIED codebook (a persisted
    * [[VectorIndex]] codebook, or a test's fixed centroids). */
  def diverseSubsetWith(vectors: DataFrame, centroids: Array[Array[Float]],
      budget: Int, salts: Int = 8, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(budget >= 1, "budget must be >= 1")
    require(salts >= 1, "salts must be >= 1")
    val spark = vectors.sparkSession
    import spark.implicits._
    val assigned = assignToCentroids(vectors, centroids, idCol, vecCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = assigned.groupBy("cluster_id")
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val alloc = allocateSqrt(sizes, budget)
    val allocDf = broadcast(
      alloc.toSeq.sorted.toDF("cluster_id", "__alloc"))
    val centsDf = broadcast(
      centroids.toSeq.zipWithIndex
        .map { case (c, i) => (i, c.toSeq) }
        .toDF("cluster_id", "__centroid")
        .select(col("cluster_id"),
          col("__centroid").cast("array<float>").as("__centroid")))
    val withDist = assigned
      .join(allocDf, Seq("cluster_id")) // drops zero-alloc clusters early
      .filter(col("__alloc") >= 1)
      .join(centsDf, Seq("cluster_id"))
      .withColumn("__dist",
        graft.functions.VectorFunctions.sqDist(col(vecCol), col("__centroid")))
    val salted = withDist
      .withColumn("__salt", pmod(hash(col(idCol)), lit(salts)))
    val w1 = Window.partitionBy("cluster_id", "__salt")
      .orderBy(col("__dist").asc, col(idCol).asc)
    val phase1 = salted.withColumn("__r1", row_number().over(w1))
      .filter(col("__r1") <= col("__alloc"))
    val w2 = Window.partitionBy("cluster_id")
      .orderBy(col("__dist").asc, col(idCol).asc)
    phase1.withColumn("centroid_rank", row_number().over(w2))
      .filter(col("centroid_rank") <= col("__alloc"))
      .select(col(idCol), col("cluster_id"),
        round(col("__dist"), 6).as("sq_dist"), col("centroid_rank"))
      .orderBy("cluster_id", "centroid_rank")
  }

  /** Plain-array cosine for the driver/executor-side MMR greedy loop
    * (operates on collected candidate rows, not Columns). */
  private[operators] object MmrMath {
    /** DuckDB-operational 6-decimal snap: round(x * 1e6) / 1e6 with
      * ties away from zero, computed on the DOUBLE product exactly as
      * DuckDB's float ROUND does. NOT BigDecimal HALF_UP: λ·(C·1e-6)
      * scores land within half an ulp of .5 micros SYSTEMATICALLY
      * (every relevance count C ending in 5), and there the exact
      * decimal comparison and the double-product comparison disagree
      * — the engine must round the same double the same way the
      * oracle will. */
    def round6(x: Double): Double = graft.util.Canon.snap6(x)

    def cos(a: Array[Float], b: Array[Float]): Double = {
      val n = math.min(a.length, b.length)
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < n) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
  }

  /** √-weighted largest-remainder seat allocation, capped at cluster
    * size; deterministic (remainder desc, cluster asc). Driver-side
    * over the ≤1024-entry cluster-size map — bounded state. When the
    * budget covers everything, everything is taken. */
  private[graft] def allocateSqrt(sizes: Map[Int, Long],
      budget: Int): Map[Int, Int] = {
    if (sizes.isEmpty) return Map.empty
    val total = sizes.values.sum
    if (budget >= total) return sizes.map { case (c, n) => c -> n.toInt }
    val w = sizes.map { case (c, n) => c -> math.sqrt(n.toDouble) }
    val wSum = w.values.sum
    val ideal = w.map { case (c, wi) => c -> budget * wi / wSum }
    var alloc = ideal.map { case (c, x) =>
      c -> math.min(sizes(c), x.toLong).toInt }
    var rem = budget - alloc.values.sum
    while (rem > 0) {
      val open = sizes.keys.toSeq
        .filter(c => alloc(c) < sizes(c))
        .sortBy(c => (-(ideal(c) - alloc(c)), c))
      // budget < total guarantees spare capacity somewhere
      val take = open.take(rem)
      alloc = alloc ++ take.map(c => c -> (alloc(c) + 1))
      rem -= take.size
    }
    alloc
  }

  /** DuckDB oracle for [[mmrRerankExact]] over the `embeddings` table
    * with queries `vec_id < 8`: the exact brute-force top-`k` (the
    * q20 recipe — ROUND(list_cosine_similarity, 6), row_number by
    * (cos desc, id)) feeds a recursive CTE that replays the greedy
    * pick step by step, carrying the chosen-id and score lists.
    * Every compared quantity sits on the same 1e-6 grid as the
    * engine's (relevance cos and pairwise redundancy cos both
    * 6-rounded), so the argmax sequence is bit-reproducible; the
    * redundancy max mirrors the engine's `max(0, ...)` floor via
    * GREATEST(COALESCE(...), 0). The (1 − λ) factor is interpolated
    * PRE-COMPUTED from the engine's IEEE double (`1.0 - 0.7` =
    * 0.30000000000000004): written as SQL arithmetic it would be
    * DECIMAL-exact 0.3 in DuckDB — one ulp away, one micro off on a
    * near-half score (observed on q1's rank-2 pick). */
  def mmrOracleSql(k: Int, m: Int, lambda: Double): String =
    s"""WITH RECURSIVE e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |cand AS (
       |  SELECT query_id, neighbor_id, cos_sim FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |      ROUND(list_cosine_similarity(q.v, c.v), 6) AS cos_sim,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |        ORDER BY ROUND(list_cosine_similarity(q.v, c.v), 6) DESC,
       |          c.vec_id) AS rnk
       |    FROM e q JOIN e c ON c.vec_id <> q.vec_id
       |    WHERE q.vec_id < 8)
       |  WHERE rnk <= $k),
       |pair AS (
       |  SELECT a.query_id, a.neighbor_id AS id_a, b.neighbor_id AS id_b,
       |    ROUND(list_cosine_similarity(ea.v, eb.v), 6) AS cs
       |  FROM cand a
       |  JOIN cand b ON b.query_id = a.query_id
       |    AND b.neighbor_id <> a.neighbor_id
       |  JOIN e ea ON ea.vec_id = a.neighbor_id
       |  JOIN e eb ON eb.vec_id = b.neighbor_id),
       |r AS (
       |  SELECT query_id, 1 AS step,
       |    [pk[1]] AS chosen, [pk[2]] AS scores
       |  FROM (
       |    SELECT cq.query_id,
       |      (SELECT [CAST(s.neighbor_id AS DOUBLE), s.score] FROM (
       |         SELECT c2.neighbor_id, c2.cos_sim,
       |           $lambda * c2.cos_sim AS score
       |         FROM cand c2 WHERE c2.query_id = cq.query_id) s
       |       ORDER BY s.score DESC, s.cos_sim DESC, s.neighbor_id
       |       LIMIT 1) AS pk
       |    FROM (SELECT DISTINCT query_id FROM cand) cq)
       |  UNION ALL
       |  SELECT query_id, step + 1,
       |    list_append(chosen, pk[1]), list_append(scores, pk[2])
       |  FROM (
       |    SELECT r.query_id, r.step, r.chosen, r.scores,
       |      (SELECT [CAST(s.neighbor_id AS DOUBLE), s.score] FROM (
       |         SELECT c2.neighbor_id, c2.cos_sim,
       |           $lambda * c2.cos_sim - ${1.0 - lambda} * GREATEST(
       |             COALESCE((
       |               SELECT MAX(p.cs) FROM pair p
       |               WHERE p.query_id = r.query_id
       |                 AND p.id_a = c2.neighbor_id
       |                 AND list_contains(r.chosen, CAST(p.id_b AS DOUBLE))),
       |             0.0), 0.0) AS score
       |         FROM cand c2
       |         WHERE c2.query_id = r.query_id
       |           AND NOT list_contains(r.chosen,
       |             CAST(c2.neighbor_id AS DOUBLE))) s
       |       ORDER BY s.score DESC, s.cos_sim DESC, s.neighbor_id
       |       LIMIT 1) AS pk
       |    FROM r WHERE r.step < $m) t)
       |SELECT query_id,
       |  CAST(chosen[g] AS BIGINT) AS neighbor_id,
       |  ROUND(scores[g], 6) AS mmr_score,
       |  CAST(g AS BIGINT) AS mmr_rank
       |FROM r, (SELECT unnest(range(1, ${m + 1})) AS g) gs
       |WHERE step = $m AND g <= len(chosen)
       |ORDER BY query_id, mmr_rank""".stripMargin
}
