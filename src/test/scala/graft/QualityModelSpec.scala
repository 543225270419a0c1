package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.QualityModel

class QualityModelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // synthetic corpus with a controlled quality signal: clean docs carry
  // stopwords + mid-length words, junk docs are symbol soup
  private lazy val corpus = {
    val clean = (0L until 100L).map(i =>
      (i, s"the quick brown fox $i jumps over the lazy dog and runs to " +
        s"the river in the morning light of day $i"))
    val junk = (100L until 200L).map(i =>
      (i, s"zzzzzzzzzzzzzz qqqqqqqqqqqq xxxxxxxxxxxxxxxx $i @@@@@@@@@"))
    (clean ++ junk).toDF("doc_id", "text")
  }

  test("distill separates clean from junk on the holdout half") {
    val out = QualityModel.distill(corpus, dim = 1 << 10).cache()
    // weak labels must themselves separate (sanity of the supervision)
    val weakByClass = out
      .withColumn("is_clean", col("doc_id") < 100)
      .groupBy("is_clean").agg(avg("weak_label").as("w"))
      .as[(Boolean, Double)].collect().toMap
    assert(weakByClass(true) > 0.9 && weakByClass(false) < 0.1)
    // model agreement with the weak label on rows it never trained on
    val holdout = out.filter(!col("is_train"))
    val n = holdout.count()
    val agree = holdout.filter(col("model_pred") === col("weak_label")).count()
    assert(n > 20, s"degenerate split: $n holdout rows")
    assert(agree.toDouble / n >= 0.9, s"holdout agreement ${agree.toDouble / n}")
    out.unpersist()
  }

  test("scoring is map-only: no shuffle in the score-path plan") {
    val fitted = QualityModel.fit(
      corpus.withColumn("label", QualityModel.weakLabel(col("text"))),
      labelCol = "label", dim = 1 << 10)
    val plan = QualityModel.score(corpus, fitted)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"score path shuffles:\n$plan")
  }

  test("distill caps the train set at maxTrain (absolute, not a fraction)") {
    val out = QualityModel.distill(corpus, dim = 1 << 10, maxTrain = 40L)
      .cache()
    val nTrain = out.filter(col("is_train")).count()
    // expected ≈ 40 of 200 (frac 0.2); binomial spread stays well clear
    // of the half-split's ≈100
    assert(nTrain >= 10 && nTrain <= 80, s"train set $nTrain not bounded")
    assert(out.count() == 200, "scoring must still cover every row")
    out.unpersist()
  }

  test("trainSplit is deterministic and roughly balanced") {
    val ids = (0L until 2000L).toDF("id")
    val frac = ids.filter(QualityModel.trainSplit(col("id"), 0.5)).count()
    assert(math.abs(frac - 1000L) < 150, s"split count $frac")
    val again = ids.filter(QualityModel.trainSplit(col("id"), 0.5)).count()
    assert(frac == again)
  }
}
