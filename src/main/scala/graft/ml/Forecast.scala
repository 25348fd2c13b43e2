package graft.ml

import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.{GBTRegressionModel, GBTRegressor}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** AQI t+1h forecasting (SURVEY.md §7.1 step 9) — the reference trains
  * LightGBM/XGBoost on a pandas frame (ml_training/train_lightgbm.py);
  * here the whole pipeline is Spark ML: the distributed feature matrix
  * from [[graft.features.Features]] feeds a GBTRegressor, with the same
  * time-ordered split and the same metric set (RMSE/MAE/MAPE/R²,
  * train_lightgbm.py:17-36).
  */
object Forecast {

  val featureCols: Seq[String] = Seq(
    "hour", "day_of_week", "month_num", "day_of_year",
    "aqi_lag_1h", "aqi_lag_24h", "aqi_lag_168h",
    "aqi_mean_7d", "aqi_std_7d", "aqi_max_7d", "aqi_min_7d", "aqi_mean_30d",
    "country_encoded", "latitude", "longitude",
    "pm25", "pm10", "o3", "co", "so2", "no2")

  /** Time-ordered split (no shuffle leakage): rows with datetime below the
    * per-dataset quantile boundary train, the rest test
    * (train_lightgbm.py time split). */
  def timeSplit(matrix: DataFrame, trainFrac: Double = 0.8)
      : (DataFrame, DataFrame) = {
    val cut = matrix.stat.approxQuantile(
      "ts_seconds", Array(trainFrac), 0.001)(0)
    val withTs = matrix
    (withTs.filter(col("ts_seconds") <= cut),
      withTs.filter(col("ts_seconds") > cut))
  }

  private def prepare(matrix: DataFrame): DataFrame = {
    val filled = featureCols.foldLeft(
      matrix.withColumn("ts_seconds",
        unix_timestamp(col("datetime")).cast("double"))) {
      (df, c) => df.withColumn(c, coalesce(col(c).cast("double"), lit(0.0)))
    }
    new VectorAssembler()
      .setInputCols(featureCols.toArray)
      .setOutputCol("features")
      .transform(filled
        .withColumn("is_weekend_d",
          col("is_weekend").cast("int").cast("double"))
        .filter(col("aqi_next").isNotNull))
      .withColumn("label", col("aqi_next"))
  }

  def train(matrix: DataFrame, maxIter: Int = 20,
      maxDepth: Int = 5): (GBTRegressionModel, DataFrame) = {
    val prepared = prepare(matrix)
    val (trainDf, testDf) = timeSplit(prepared)
    val model = new GBTRegressor()
      .setMaxIter(maxIter)
      .setMaxDepth(maxDepth)
      .setSeed(42L)
      .fit(trainDf)
    (model, model.transform(testDf))
  }

  /** RMSE / MAE / MAPE / R² on held-out predictions
    * (train_lightgbm.py:17-36 metric set). */
  def metrics(predictions: DataFrame): Map[String, Double] = {
    def evalM(metric: String) = new RegressionEvaluator()
      .setMetricName(metric).evaluate(predictions)
    val mape = predictions
      .filter(col("label") =!= 0)
      .select(avg(abs((col("label") - col("prediction")) / col("label"))))
      .head().getDouble(0) * 100
    Map("rmse" -> evalM("rmse"), "mae" -> evalM("mae"),
      "r2" -> evalM("r2"), "mape" -> mape)
  }
}
