package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ml.Metrics

/** Exact AUC / confusion metrics on hand-computable fixtures. */
class MetricsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("binaryAuc: tied pair gets half credit (17/18 by hand)") {
    // pos scores 0.9, 0.8, 0.5; neg scores 0.5, 0.3, 0.1
    // wins: 3 + 3 + 2 = 8, ties: 1 → AUC = (2*8 + 1) / (2*9) = 17/18
    val df = Seq((1, 0.9), (1, 0.8), (1, 0.5), (0, 0.5), (0, 0.3),
      (0, 0.1)).toDF("label", "score")
    val r = Metrics.binaryAuc(df).head()
    assert(r.getAs[Long]("n_pos") === 3L)
    assert(r.getAs[Long]("n_neg") === 3L)
    assert(r.getAs[Long]("n_scores") === 5L)
    assert(r.getAs[Double]("auc") === 17.0 / 18.0)
  }

  test("binaryAuc: perfect separation = 1, inverted = 0") {
    val perfect = Seq((1, 0.9), (1, 0.8), (0, 0.2), (0, 0.1))
      .toDF("label", "score")
    assert(Metrics.binaryAuc(perfect).head().getAs[Double]("auc") === 1.0)
    val inverted = Seq((0, 0.9), (0, 0.8), (1, 0.2), (1, 0.1))
      .toDF("label", "score")
    assert(Metrics.binaryAuc(inverted).head().getAs[Double]("auc") === 0.0)
  }

  test("binaryAuc: all-tied scores give 0.5") {
    val flat = Seq((1, 0.5), (1, 0.5), (0, 0.5), (0, 0.5))
      .toDF("label", "score")
    assert(Metrics.binaryAuc(flat).head().getAs[Double]("auc") === 0.5)
  }

  test("confusionAtThreshold: counts and exact rates") {
    // at t=0.5: tp=2 (0.9, 0.5), fn=1 (0.2); fp=1 (0.7), tn=2 (0.4, 0.1)
    val df = Seq((1, 0.9), (1, 0.5), (1, 0.2), (0, 0.7), (0, 0.4),
      (0, 0.1)).toDF("label", "score")
    val r = Metrics.confusionAtThreshold(df, 0.5).head()
    assert((r.getAs[Long]("tp"), r.getAs[Long]("fp"), r.getAs[Long]("tn"),
      r.getAs[Long]("fn")) === ((2L, 1L, 2L, 1L)))
    assert(r.getAs[Double]("accuracy") === 4.0 / 6.0)
    assert(r.getAs[Double]("precision") === 2.0 / 3.0)
    assert(r.getAs[Double]("recall") === 2.0 / 3.0)
    assert(r.getAs[Double]("f1") === 4.0 / 6.0)
  }
}
