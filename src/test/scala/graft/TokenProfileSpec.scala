package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{TextFunctions, TokenProfile}

class TokenProfileSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("native token_profile matches the HOF formulation on random docs") {
    val rnd = new scala.util.Random(11)
    val vocab = ("the a of und der la que les est une nicht " +
      "xyzzy foo bar baz quux longishword").split(" ")
    val docs = (0 until 300).map { i =>
      (i.toLong,
        Seq.fill(rnd.nextInt(40))(vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
    val df = docs.toDF("id", "text")
      .withColumn("toks", TextFunctions.tokens(col("text")))
    val hofCols =
      TextFunctions.sumTokenLenT(col("toks")).cast("bigint") +:
        TextFunctions.ProfileDicts.map(d =>
          TextFunctions.wordHitsT(col("toks"), d).cast("bigint"))
    val diff = df.select(
      TextFunctions.profileT(col("toks")).as("native"),
      array(hofCols: _*).as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(diff.isEmpty)
  }

  test("profile-based lang-id and quality match the HOF formulations") {
    val texts = Seq(
      "the cat sat on the mat and the dog",
      "der hund ist nicht ein tier und das",
      "el gato es un animal que la casa en",
      "le chat est une des betes les plus",
      "zzz qqq www",
      "")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .withColumn("toks", TextFunctions.tokens(col("text")))
      .withColumn("prof", TextFunctions.profileT(col("toks")))
    val diff = df.select(
      TextFunctions.langIdT(col("toks")).as("lang_hof"),
      TextFunctions.langIdP(col("prof")).as("lang_p"),
      TextFunctions.qualityScoreT(col("toks")).as("q_hof"),
      TextFunctions.qualityScoreP(size(col("toks")), col("prof")).as("q_p"))
      .filter(col("lang_hof") =!= col("lang_p") || col("q_hof") =!= col("q_p"))
    assert(diff.isEmpty)
  }

  test("bpe pre-tokenizer: contractions, CJK, punctuation runs") {
    val got = Seq("I'll go, won't you? 日本語123")
      .toDF("text")
      .select(TextFunctions.bpeTokens(col("text")).as("t"))
      .collect()(0).getSeq[String](0)
    assert(got == Seq("I", "'ll", " go", ",", " won", "'t", " you", "?",
      " 日本語", "123"))
    // whitespace count badly underestimates here; bpe-ish does not
    val counts = Seq("日本語の文章です。Tokens matter!")
      .toDF("text")
      .select(TextFunctions.bpeTokenCount(col("text")).as("bpe"),
        TextFunctions.tokenCount(col("text")).as("ws"))
      .collect()(0)
    assert(counts.getInt(0) > counts.getInt(1))
  }

  test("interpreted eval: occurrence counting and duplicate dict words") {
    val lookup = TokenProfile.buildLookup(Array(Array("a", "a", "b"), Array("b")))
    val arr = new GenericArrayData(
      Array("a", "a", "b", "c").map(s => UTF8String.fromString(s): Any))
    val out = TokenProfile.compute(arr, lookup, 2)
    // sum of lengths = 4; dict0 hits: a,a,b = 3 (dup listing counts once
    // per occurrence, not twice); dict1 hits: b = 1
    assert(out.toSeq == Seq(4L, 3L, 1L))
  }
}
