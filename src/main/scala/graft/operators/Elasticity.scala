package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Log-log price elasticity of demand per product brand — the pricing
  * readout every revenue mart grows into: ε = d ln(qty)/d ln(price),
  * estimated per brand by OLS of ln(quantity) on ln(effective unit
  * price) across line items. |ε| > 1 is elastic (discount deepens
  * revenue), |ε| < 1 inelastic (discount burns margin). Same
  * closed-form moment discipline as [[Regression.olsTrend]]: one
  * fact→dim equi-join, one grouped moment aggregate at brand
  * cardinality, scalar arithmetic — no residual vectors at any scale.
  */
object Elasticity {

  /** `(brand, n, elasticity, r2)` per brand, ordered by brand.
    * Effective unit price = (extendedprice/quantity)·(1−discount);
    * rows with non-positive quantity or price are excluded (log
    * support). NULL elasticity when the brand's price variance is
    * numerically zero (single price point). */
  def byBrand(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val li = lineitem
      .where(col("l_quantity") > 0.0 &&
        col("l_extendedprice") > 0.0 && col("l_discount") < 1.0)
      .select(col("l_partkey"),
        log(col("l_quantity")).as("lq"),
        log(col("l_extendedprice") / col("l_quantity") *
          (lit(1.0) - col("l_discount"))).as("lp"))
    li.join(part.select(col("p_partkey").as("l_partkey"),
        col("p_brand")), Seq("l_partkey"))
      .groupBy(col("p_brand").as("brand"))
      .agg(count(lit(1)).as("n"),
        var_pop(col("lp")).as("__vp"), var_pop(col("lq")).as("__vq"),
        covar_pop(col("lp"), col("lq")).as("__c"))
      .select(col("brand"), col("n"),
        round(when(col("__vp") > 0.0, col("__c") / col("__vp")), 6)
          .as("elasticity"),
        round(when(col("__vp") > 0.0 && col("__vq") > 0.0,
          col("__c") * col("__c") / (col("__vp") * col("__vq"))), 6)
          .as("r2"))
      .orderBy("brand")
  }

  /** DuckDB oracle for [[byBrand]]. */
  val byBrandOracleSql: String =
    """WITH li AS (
      |  SELECT l_partkey, LN(l_quantity) AS lq,
      |    LN(l_extendedprice / l_quantity * (1.0 - l_discount)) AS lp
      |  FROM lineitem
      |  WHERE l_quantity > 0 AND l_extendedprice > 0
      |    AND l_discount < 1),
      |m AS (
      |  SELECT p.p_brand AS brand, COUNT(*) AS n,
      |    VAR_POP(lp) AS vp, VAR_POP(lq) AS vq,
      |    COVAR_POP(lp, lq) AS c
      |  FROM li JOIN part p ON li.l_partkey = p.p_partkey
      |  GROUP BY 1)
      |SELECT brand, n,
      |  ROUND(CASE WHEN vp > 0 THEN c / vp END, 6) AS elasticity,
      |  ROUND(CASE WHEN vp > 0 AND vq > 0
      |    THEN c * c / (vp * vq) END, 6) AS r2
      |FROM m ORDER BY brand""".stripMargin
}
