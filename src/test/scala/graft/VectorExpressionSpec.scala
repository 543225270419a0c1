package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions, VectorExpressions}

class VectorExpressionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("native vec_dot is bit-identical to the HOF formulation") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      (i.toLong,
        Array.fill(64)(rnd.nextFloat()),
        Array.fill(64)(rnd.nextFloat()))
    }
    val df = rows.toDF("id", "a", "b")
    val diff = df.select(
      VectorExpressions.vecDot(col("a"), col("b")).as("native"),
      VectorFunctions.dotHof(col("a"), col("b")).as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(diff.isEmpty)
  }

  test("interpreted eval path (non-codegen) agrees too") {
    val r = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b")
      .select(VectorExpressions.vecDot(col("a"), col("b")))
      .collect()(0).getDouble(0)
    assert(r == 32.0)
  }

  test("vec_dot registers for SQL via GraftExtensions") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))," +
        " array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .collect()(0).getDouble(0)
    assert(r == 11.0)
  }

  test("full native-function SQL surface registers and evaluates") {
    GraftExtensions.register(spark)
    // shingle_hashes ∘ minhash_sig from plain SQL, matching the
    // DataFrame-path values
    val sig = spark.sql(
      "SELECT minhash_sig(shingle_hashes(array('a','b','c','d'), 2), 4) AS s")
      .collect()(0).getSeq[Long](0)
    assert(sig.length == 4)
    val viaDf = Seq(Seq("a", "b", "c", "d")).toDF("toks")
      .select(graft.functions.MinHashSignature.minhashSignature(
        graft.functions.ShingleHashes.shingleHashes(col("toks"), 2), 4).as("s"))
      .collect()(0).getSeq[Long](0)
    assert(sig == viaDf)
    val rm = spark.sql(
      "SELECT rolling_minhash(array(9L, 1L, 5L, 3L), 2) AS m")
      .collect()(0).getLong(0)
    val rmDf = Seq(Seq(9L, 1L, 5L, 3L)).toDF("h")
      .select(graft.functions.RollingMinHash.rollingMinHash(col("h"), 2).as("m"))
      .collect()(0).getLong(0)
    assert(rm == rmDf)
    val hp = spark.sql(
      "SELECT hyperplane_sig(array(CAST(0.5 AS FLOAT), CAST(-0.5 AS FLOAT)), 64, 2, 7) AS h")
      .collect()(0).getLong(0)
    val hpDf = Seq(Array(0.5f, -0.5f)).toDF("v")
      .select(graft.functions.HyperplaneSignature
        .hyperplaneSignature(col("v"), 64, 2, 7L).as("h"))
      .collect()(0).getLong(0)
    assert(hp == hpDf)
    val sh = spark.sql("SELECT simhash64(array('the','cat','sat')) AS f")
      .collect()(0).getLong(0)
    val shDf = Seq(Seq("the", "cat", "sat")).toDF("toks")
      .select(graft.functions.SimHash64.simhash64(col("toks")).as("f"))
      .collect()(0).getLong(0)
    assert(sh == shDf)
    val pq = spark.sql(
      "SELECT pq_adc(array(1, 0), array(CAST(0.5 AS FLOAT), CAST(1.5 AS FLOAT)," +
        " CAST(2.5 AS FLOAT), CAST(3.5 AS FLOAT)), 2) AS d")
      .collect()(0).getDouble(0)
    assert(pq == 1.5 + 2.5)   // table[0*2+1] + table[1*2+0]
    val be = spark.sql("SELECT byte_entropy('abca') AS h")
      .collect()(0).getDouble(0)
    assert(be == 1.5)         // {a:1/2, b:1/4, c:1/4} -> 0.5 + 0.5 + 0.5
    assert(spark.sql("SELECT byte_entropy('') AS h")
      .collect()(0).getDouble(0) == 0.0)
    assert(spark.sql("SELECT byte_entropy('aaaa') AS h")
      .collect()(0).getDouble(0) == 0.0)
    // deflate_ratio via SQL matches the column API on the same input
    val drSql = spark.sql("SELECT deflate_ratio('abab abab abab abab') AS r")
      .collect()(0).getDouble(0)
    val drCol = Seq("abab abab abab abab").toDF("t")
      .select(graft.functions.DeflateRatio.deflateRatio(col("t")))
      .collect()(0).getDouble(0)
    assert(drSql == drCol && drSql < 1.0)
    // config args must be literals
    intercept[Exception] {
      spark.sql("SELECT shingle_hashes(array('a'), CAST(rand()*2 AS INT))").collect()
    }
  }
}
