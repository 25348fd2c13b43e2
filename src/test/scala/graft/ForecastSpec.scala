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

  test("model save/load round-trip: a loaded model's predictions are " +
    "bit-identical to the trained one's; the serving path scores " +
    "inference features with the loaded model") {
    import org.apache.spark.sql.functions._
    val gold = PipelineQueries.gold(spark, "/root/testdata/sf0.001")
    val matrix = Features.featureMatrix(gold)
    val (model, predictions) = Forecast.train(matrix, maxIter = 3,
      maxDepth = 3)
    val path = "/tmp/graft_gbt_model_roundtrip"
    Forecast.save(model, path)
    val loaded = Forecast.load(path)
    assert(loaded.getMaxIter === model.getMaxIter)
    assert(loaded.getMaxDepth === model.getMaxDepth)
    assert(loaded.trees.length === model.trees.length)
    // bit-identical: same rows, same order, EXACT double equality —
    // the persisted ensemble is the ensemble, not an approximation
    val key = Seq("location_id", "datetime").map(col)
    val before = predictions.orderBy(key: _*)
      .select("prediction").collect().map(_.getDouble(0))
    val after = loaded.transform(predictions.drop("prediction"))
      .orderBy(key: _*)
      .select("prediction").collect().map(_.getDouble(0))
    assert(before.length > 0 && before.length === after.length)
    assert(before.sameElements(after),
      "loaded model drifted from the trained one")
    // serving contract (app.py:118): latest per-station snapshot →
    // loaded model → one finite forecast per station
    val served = Forecast.serve(loaded,
      Features.inferenceFeatures(gold))
    val rows = served.select("location_id", "predicted_aqi_next")
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => !r.getDouble(1).isNaN &&
      !r.getDouble(1).isInfinite))
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
