package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{ShingleHashes, TextFunctions}

class ShingleHashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("native shingle_hashes is bit-identical to the HOF formulation") {
    val rnd = new scala.util.Random(23)
    val vocab = "alpha beta gamma delta x yz épsilon 日本語 token".split(" ")
    val docs = (0 until 300).map { i =>
      // lengths 0..39 exercise the n<k empty case and 1-token windows
      (i.toLong,
        Seq.fill(rnd.nextInt(40))(vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
    for (k <- Seq(1, 2, 3, 5)) {
      val df = docs.toDF("id", "text")
        .withColumn("toks", TextFunctions.tokens(col("text")))
      val diff = df.select(
        ShingleHashes.shingleHashes(col("toks"), k).as("native"),
        transform(TextFunctions.shingles(col("text"), k), s => xxhash64(s))
          .as("hof"))
        .filter(col("native") =!= col("hof"))
      assert(diff.isEmpty, s"mismatch at k=$k")
    }
  }

  test("interpreted compute: windows, separators, multi-byte UTF-8") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def arr(toks: String*) =
      new GenericArrayData(toks.map(t => UTF8String.fromString(t): Any).toArray)
    // n < k => empty
    assert(ShingleHashes.compute(arr("a"), 2).isEmpty)
    // hand-check window count and that adjacent windows differ
    val out = ShingleHashes.compute(arr("a", "b", "c", "d"), 2)
    assert(out.length == 3 && out.distinct.length == 3)
    // multi-byte tokens hash over their full byte length
    val uni = ShingleHashes.compute(arr("日本", "語"), 2)
    assert(uni.length == 1)
  }
}
