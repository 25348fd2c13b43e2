package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.features.Features
import graft.ml.Forecast
import graft.queries.PipelineQueries

class ForecastSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("GBT forecast pipeline trains on the distributed feature matrix " +
    "and reports the reference metric set") {
    val gold = PipelineQueries.gold(spark, "/root/testdata/sf0.001")
    val matrix = Features.featureMatrix(gold)
    val (model, predictions) = Forecast.train(matrix, maxIter = 3,
      maxDepth = 3)
    assert(model.getMaxIter === 3)
    val m = Forecast.metrics(predictions)
    assert(Seq("rmse", "mae", "mape", "r2").forall(m.contains))
    assert(m("rmse") > 0 && m("rmse") < 500, s"rmse out of range: $m")
    assert(m("mae") <= m("rmse"))
    assert(predictions.count() > 0)
    assert(m.values.forall(v => !v.isNaN && !v.isInfinite),
      s"non-finite metric: $m")
    // the trained model must beat predicting last value (persistence)
    val baseline = Forecast.persistenceRmse(predictions)
    assert(m("rmse") < baseline,
      s"GBT rmse ${m("rmse")} does not beat persistence $baseline")
  }

  test("time split holds out the LATEST slice (no leakage)") {
    import org.apache.spark.sql.functions._
    val gold = PipelineQueries.gold(spark, "/root/testdata/sf0.001")
    val matrix = Features.featureMatrix(gold)
      .withColumn("ts_seconds",
        unix_timestamp(col("datetime")).cast("double"))
    val (train, test) = Forecast.timeSplit(matrix)
    val maxTrain = train.agg(max("ts_seconds")).head().getDouble(0)
    val minTest = test.agg(min("ts_seconds")).head().getDouble(0)
    assert(maxTrain <= minTest)
    assert(test.count() > 0 && train.count() > test.count())
  }
}
