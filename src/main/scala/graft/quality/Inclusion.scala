package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inclusion-dependency discovery — the foreign-key detector that
  * complements [[Dependencies]]' functional-dependency profiler: for
  * every ordered pair of profiled key columns, how much of A's value
  * set lives inside B's? containment(A⊆B) = |dist(A) ∩ dist(B)| /
  * |dist(A)|; 1.0 flags a referential edge (the SPIDER/De Marchi
  * family of profilers, e.g. Bauckmann et al. BTW 2007, reduce IND
  * discovery to exactly this distinct-set containment).
  *
  * Scale shape: ONE distinct pass per column collapsed into a single
  * tagged value table (p·|dist| rows), one self equi-join ON VALUE
  * (hash-partitioned; per-value fan-out is bounded by p², the column
  * count, never the corpus), one p²-cardinality reduction. No
  * driver-side value sets, no per-pair scans: adding a column is one
  * more branch of the union, not another pass.
  */
object Inclusion {

  /** Containment report over named key columns. `cols` maps a label
    * (e.g. "orders.o_custkey") to its (frame, column). Output:
    * `(from_col, to_col, n_from, n_overlap, containment, is_ind)`
    * for every ordered pair, ordered by (from_col, to_col).
    * `is_ind` is exact containment = 1. */
  def indReport(cols: Seq[(String, (DataFrame, String))]): DataFrame = {
    require(cols.nonEmpty, "at least one column to profile")
    // persist the tagged distinct-value table: it anchors FIVE plan
    // branches (sizes, both self-join sides, both grid sides) and
    // unpersisted each branch replayed all p column scans + distincts
    // (measured: 96 parquet scans / 108 exchanges in the q321 plan;
    // 12 scans with the cache)
    val tagged = cols.map { case (label, (df, c)) =>
      df.select(col(c).cast("bigint").as("v"))
        .where(col("v").isNotNull).distinct()
        .select(lit(label).as("tag"), col("v"))
    }.reduce(_.unionByName(_))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = tagged.groupBy("tag").agg(count(lit(1)).as("n_from"))
    val overlap = tagged.as("a")
      .join(tagged.as("b"), col("a.v") === col("b.v"))
      .where(col("a.tag") =!= col("b.tag"))
      .groupBy(col("a.tag").as("from_col"), col("b.tag").as("to_col"))
      .agg(count(lit(1)).as("n_overlap"))
    // left join from the full pair grid so empty overlaps still report
    val grid = sizes.select(col("tag").as("from_col"), col("n_from"))
      .crossJoin(sizes.select(col("tag").as("to_col")))
      .where(col("from_col") =!= col("to_col"))
    grid.join(overlap, Seq("from_col", "to_col"), "left")
      .select(col("from_col"), col("to_col"), col("n_from"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        round(coalesce(col("n_overlap"), lit(0L)).cast("double") /
          col("n_from"), 6).as("containment"),
        (coalesce(col("n_overlap"), lit(0L)) === col("n_from"))
          .as("is_ind"))
      .orderBy("from_col", "to_col")
  }

  /** DuckDB oracle for the q321 registration: the TPC-H key columns
    * profiled by [[graft.SparkEntry]]. */
  val indReportOracleSql: String =
    """WITH tagged AS (
      |  SELECT 'customer.c_custkey' AS tag, c_custkey AS v
      |    FROM customer WHERE c_custkey IS NOT NULL GROUP BY 2
      |  UNION ALL SELECT 'customer.c_nationkey', c_nationkey
      |    FROM customer WHERE c_nationkey IS NOT NULL GROUP BY 2
      |  UNION ALL SELECT 'lineitem.l_orderkey', l_orderkey
      |    FROM lineitem WHERE l_orderkey IS NOT NULL GROUP BY 2
      |  UNION ALL SELECT 'lineitem.l_partkey', l_partkey
      |    FROM lineitem WHERE l_partkey IS NOT NULL GROUP BY 2
      |  UNION ALL SELECT 'lineitem.l_suppkey', l_suppkey
      |    FROM lineitem WHERE l_suppkey IS NOT NULL GROUP BY 2
      |  UNION ALL SELECT 'nation.n_nationkey', n_nationkey
      |    FROM nation WHERE n_nationkey IS NOT NULL GROUP BY 2
      |  UNION ALL SELECT 'nation.n_regionkey', n_regionkey
      |    FROM nation WHERE n_regionkey IS NOT NULL GROUP BY 2
      |  UNION ALL SELECT 'orders.o_custkey', o_custkey
      |    FROM orders WHERE o_custkey IS NOT NULL GROUP BY 2
      |  UNION ALL SELECT 'orders.o_orderkey', o_orderkey
      |    FROM orders WHERE o_orderkey IS NOT NULL GROUP BY 2
      |  UNION ALL SELECT 'region.r_regionkey', r_regionkey
      |    FROM region WHERE r_regionkey IS NOT NULL GROUP BY 2
      |  UNION ALL SELECT 'supplier.s_nationkey', s_nationkey
      |    FROM supplier WHERE s_nationkey IS NOT NULL GROUP BY 2
      |  UNION ALL SELECT 'supplier.s_suppkey', s_suppkey
      |    FROM supplier WHERE s_suppkey IS NOT NULL GROUP BY 2),
      |sizes AS (SELECT tag, COUNT(*) AS n_from FROM tagged GROUP BY 1),
      |overlap AS (
      |  SELECT a.tag AS from_col, b.tag AS to_col,
      |    COUNT(*) AS n_overlap
      |  FROM tagged a JOIN tagged b ON a.v = b.v AND a.tag <> b.tag
      |  GROUP BY 1, 2),
      |grid AS (
      |  SELECT f.tag AS from_col, f.n_from, t.tag AS to_col
      |  FROM sizes f CROSS JOIN sizes t WHERE f.tag <> t.tag)
      |SELECT grid.from_col AS from_col, grid.to_col AS to_col,
      |  grid.n_from AS n_from,
      |  COALESCE(o.n_overlap, 0) AS n_overlap,
      |  ROUND(CAST(COALESCE(o.n_overlap, 0) AS DOUBLE)
      |    / grid.n_from, 6) AS containment,
      |  COALESCE(o.n_overlap, 0) = grid.n_from AS is_ind
      |FROM grid LEFT JOIN overlap o
      |  ON grid.from_col = o.from_col AND grid.to_col = o.to_col
      |ORDER BY grid.from_col, grid.to_col""".stripMargin
}
