package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution: connected components over a near-dup
  * pair graph, entirely in the DataFrame API.
  *
  * Pairwise dedup (MinHash/SimHash/embedding near-dups) emits EDGES;
  * production dedup needs the transitive closure — if A~B and B~C, all
  * three are one duplicate cluster and one canonical representative
  * survives. [[Dedup.fuzzyDedupKeepFirst]] approximates this with the
  * keep-first heuristic; this operator computes the exact partition.
  *
  * Algorithm: alternating large-star / small-star contraction (Kiveris
  * et al., "Connected Components in MapReduce and Beyond", SoCC 2014).
  * Each round is a groupBy + equi-join over (long, long) edge pairs;
  * the edge list monotonically contracts toward one star per component
  * in O(log²) rounds of the component diameter — unlike naive
  * min-label propagation, whose round count grows linearly with the
  * diameter (a 100-link chain of near-dups costs 100 propagation
  * rounds but ~7 star rounds). Per round the working set is only the
  * edge pairs; every pass shuffles by node id. Lineage is truncated
  * every round (default `localCheckpoint`, eager) so the plan does not
  * grow unboundedly across iterations; on a real cluster pass a
  * reliable `checkpoint` through `checkpointer`.
  *
  * Convergence is detected from a 2-long fingerprint of the canonical
  * edge multiset (count + XOR of per-edge xxhash64) — one tiny action
  * per round, never a driver-side collect of the data.
  */
object DupClusters {

  /** Connected components of the undirected graph given as (srcCol,
    * dstCol) edge pairs. Returns one row per node that appears in an
    * edge: (node, component), component = min node id in the
    * component. Isolated nodes never appear in edges and so are absent;
    * [[clusterDocuments]] unions them back as singletons.
    *
    * Size-based strategy switch (the same reasoning as Spark's
    * broadcast-join threshold): a dedup pair graph is usually ORDERS
    * of magnitude smaller than its corpus — at or below
    * `smallGraphEdges` canonical edges (16 bytes each; the default is
    * ~8 MB) the star rounds' fixed cost (≥6 shuffles + a checkpoint +
    * a fingerprint job per round) dwarfs a driver union-find, so the
    * edges are collected and resolved in one pass. Above it, the
    * distributed contraction runs unchanged. Both paths produce the
    * identical labeling (property-tested against each other). */
  def connectedComponents(edges: DataFrame, srcCol: String = "id_a",
      dstCol: String = "id_b", maxIter: Int = 25,
      checkpointer: DataFrame => DataFrame = graft.util.Checkpoints.truncate,
      smallGraphEdges: Long = 500000L): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    // Canonical (hi → lo) direction; self-loops contribute nothing.
    val e0 = edges
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .distinct()
      // two consumers before the first star round (the convergence
      // fingerprint, then either the small-graph collect or the first
      // symmetrize) — persist, or the caller's whole edge-generation
      // plan (e.g. the affix self-join) replays per consumer
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var e = e0

    def fingerprint(d: DataFrame): (Long, Long) = {
      val r = d.agg(
        count(lit(1)).as("n"),
        coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L)).as("h"))
        .as[(Long, Long)].head()
      r
    }

    var fp = fingerprint(e)

    if (fp._1 <= smallGraphEdges) {
      val collected = e.as[(Long, Long)].collect()
      e0.unpersist()
      return unionFind(spark, collected)
    }

    var it = 0
    var converged = fp._1 == 0L
    while (!converged && it < maxIter) {
      // -- large-star: from each node u's full neighborhood Γ(u),
      //    m = min(Γ(u) ∪ {u}); every strictly-larger neighbor v > u
      //    re-links to m. Processed from the smaller endpoint of each
      //    edge via the symmetrized list.
      val sym = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
      val lsMin = sym.groupBy("u")
        .agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val ls = sym.join(lsMin, "u")
        .filter(col("v") > col("u"))
        .select(greatest(col("v"), col("m")).as("u"), least(col("v"), col("m")).as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()

      // -- small-star: direct edges larger→smaller; from each node u's
      //    smaller neighborhood Γ⁻(u), m = min; every v ∈ Γ⁻(u) ∪ {u}
      //    re-links to m. (ls is already hi→lo canonical.)
      val ssMin = ls.groupBy("u").agg(min(col("v")).as("m"))
      val ss = ls.join(ssMin, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .unionByName(ssMin.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v"))
        .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
        .distinct()

      e = checkpointer(ss)
      // the initial cached edge set is consumed for the last time by
      // this round's sym/star reads — release it once e has moved on
      // (it used to stay resident until the caller's clearCache)
      if (it == 0) e0.unpersist()
      val nfp = fingerprint(e)
      converged = nfp == fp
      fp = nfp
      it += 1
    }
    // a silent non-converged return would emit WRONG cluster labels;
    // log²-round convergence makes this unreachable at sane maxIter,
    // so reaching it means the budget was misconfigured — fail loudly
    require(converged,
      s"connected components did not converge within $maxIter rounds — " +
        "raise maxIter (round count is O(log² diameter))")

    // Converged edge set is one star per component, centered at the
    // component min: (member, root) pairs plus the roots themselves.
    e.select(col("u").as("node"), col("v").as("component"))
      .unionByName(e.select(col("v").as("node"), col("v").as("component")))
      .distinct()
  }

  /** Driver-side union-find with path halving, min member as the
    * component label — the small-graph fast path of
    * [[connectedComponents]]. */
  private def unionFind(spark: org.apache.spark.sql.SparkSession,
      edges: Array[(Long, Long)]): DataFrame = {
    import spark.implicits._
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) { parent(r) = parent(parent(r)); r = parent(r) }
      r
    }
    edges.foreach { case (u, v) =>
      parent.getOrElseUpdate(u, u); parent.getOrElseUpdate(v, v)
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) parent(math.max(ru, rv)) = math.min(ru, rv)
    }
    // roots chosen as min at every union, and find() only ever walks
    // UP to a root, so the final root IS the component min
    val labels = parent.keysIterator.map(n => (n, find(n))).toSeq
    spark.createDataset(labels).toDF("node", "component")
  }

  /** Assign every document a duplicate-cluster id from near-dup pairs:
    * nodes in the pair graph get their component min; documents in no
    * pair are their own singleton cluster. Adds the cluster size.
    * Output: (idCol, cluster_id, cluster_size), one row per document.
    */
  def clusterDocuments(docs: DataFrame, pairs: DataFrame,
      idCol: String = "doc_id", srcCol: String = "id_a",
      dstCol: String = "id_b", maxIter: Int = 25): DataFrame = {
    // the long cast below nulls out non-numeric ids, which would
    // silently collapse EVERY row into one null cluster — reject the
    // schema up front instead
    {
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      val dt = docs.schema(idCol).dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
        s"clusterDocuments needs an integral id column; '$idCol' is " +
          s"${dt.simpleString} — map string ids to longs (e.g. xxhash64) " +
          "before clustering")
    }
    val labels = connectedComponents(pairs, srcCol, dstCol, maxIter)
    val assigned = docs.select(col(idCol).cast("long").as(idCol))
      .join(labels.withColumnRenamed("node", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("component"), col(idCol)).as("cluster_id"))
    val sizes = assigned.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
    assigned.join(sizes, "cluster_id")
      .select(col(idCol), col("cluster_id"), col("cluster_size"))
      .orderBy(idCol)
  }

  /** Deterministic, SQL-expressible near-dup edge generator used by the
    * oracled cluster query: two documents are linked if they share
    * their first `n` characters OR their last `n` characters. Each
    * relation alone is an equivalence (groups by a key); their UNION is
    * not — A,B may share a prefix while B,C share a suffix — so the
    * transitive closure is a genuine connected-components problem, yet
    * both generators are plain equi-self-joins (shuffle on the
    * fixed-width key, never all-pairs) that DuckDB reproduces exactly.
    */
  def affixPairs(docs: DataFrame, n: Int = 40,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    def pairsOn(key: org.apache.spark.sql.Column): DataFrame = {
      val keyed = docs.select(col(idCol), key.as("k"))
      val a = keyed.select(col("k"), col(idCol).as("id_a"))
      val b = keyed.select(col("k"), col(idCol).as("id_b"))
      a.join(b, "k").filter(col("id_a") < col("id_b")).select("id_a", "id_b")
    }
    val prefix = pairsOn(substring(col(textCol), 1, n))
    val suffix = pairsOn(col(textCol).substr(
      greatest(lit(1), length(col(textCol)) - (n - 1)), lit(n)))
    prefix.unionByName(suffix).distinct()
  }

  /** Quality-aware canonicalization: from each duplicate cluster keep
    * the single BEST document — highest `scoreCol`, ties to the lowest
    * id — not the arbitrary min-id member. This is the selection policy
    * production corpus dedup actually ships (keep the longest / highest-
    * quality copy; RefinedWeb, FineWeb and the Gopher pipeline all keep
    * by quality, never by id), layered on [[clusterDocuments]]'s exact
    * partition. Output: one row per cluster —
    * (idCol, cluster_id, cluster_size, scoreCol), id-sorted.
    *
    * Scale shape: one equi-join of docs to their cluster label (shuffle
    * on the id key), then a declarative `max_by` aggregate on the
    * cluster key — partial aggregation combines map-side, so a giant
    * cluster costs one combiner row per input partition, never a
    * per-cluster sort (the row_number window a naive version would
    * use serializes each cluster through one task; `max_by` doesn't).
    * The (score asc, id desc) ordering struct makes max_by pick
    * highest score then LOWEST id — deterministic under score ties. */
  def canonicalize(docs: DataFrame, clusters: DataFrame, scoreCol: String,
      idCol: String = "doc_id"): DataFrame = {
    val joined = docs.select(col(idCol), col(scoreCol))
      .join(clusters.select(col(idCol), col("cluster_id"), col("cluster_size")),
        idCol)
    joined
      .groupBy("cluster_id", "cluster_size")
      .agg(max_by(struct(col(idCol), col(scoreCol)),
        struct(col(scoreCol), (-col(idCol)).as("__negid"))).as("__best"))
      .select(col(s"__best.$idCol").as(idCol), col("cluster_id"),
        col("cluster_size"), col(s"__best.$scoreCol").as(scoreCol))
      .orderBy(idCol)
  }
}
