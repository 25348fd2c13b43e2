package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ml.NormalEquations

/** Closed-form ridge fit from the one-pass Gram statistics. */
class NormalEquationsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("ridge solve from the Gram row beats the persistence baseline " +
    "and recovers finite coefficients") {
    val fm = NormalEquations.designMatrix(
      graft.queries.PipelineQueries.gold(spark, dir)).cache()
    try {
      val g = NormalEquations.gram(fm).collect()(0)
      val beta = NormalEquations.solveRidge(g, lambda = 1e-3)
      assert(beta.length === NormalEquations.features.size)
      assert(beta.forall(b => !b.isNaN && !b.isInfinite))
      // residual sums via the same distributed pattern
      val pred = NormalEquations.features.zip(beta)
        .map { case (f, b) => col(f) * lit(b) }.reduce(_ + _)
      val r = fm.agg(
        sum(pow(col("y") - pred, 2)).as("sse_model"),
        sum(pow(col("y") - col("aqi"), 2)).as("sse_persist"),
        count(lit(1)).as("n")).collect()(0)
      val (sseModel, ssePersist) = (r.getDouble(0), r.getDouble(1))
      assert(sseModel > 0)
      // the linear model must beat "predict no change" on next-hour AQI
      assert(sseModel < ssePersist,
        s"model SSE $sseModel not better than persistence $ssePersist")
    } finally fm.unpersist()
  }

  test("the Gram solve reproduces a planted linear relationship") {
    import spark.implicits._
    // y = 3 + 2*aqi exactly (other features constant/zero so the Gram
    // stays solvable through the ridge term)
    val rows = (1 to 200).map { i =>
      val aqi = i.toDouble % 37
      (1.0, aqi, i.toDouble % 5, i.toDouble % 7, i.toDouble % 24,
        i.toDouble % 3, 10.0 + (i % 11), 100.0 + (i % 13),
        3.0 + 2.0 * aqi)
    }
    val fm = rows.toDF("one", "aqi", "aqi_lag_1h", "aqi_lag_24h",
      "hour_d", "dow_d", "latitude", "longitude", "y")
    val beta = NormalEquations.solveRidge(
      NormalEquations.gram(fm).collect()(0), lambda = 1e-9)
    // aqi coefficient ~2, every other non-intercept coefficient ~0
    assert(math.abs(beta(1) - 2.0) < 1e-3, beta.mkString(","))
    Seq(2, 3, 4, 5).foreach(i =>
      assert(math.abs(beta(i)) < 1e-3, s"beta($i)=${beta(i)}"))
  }
}
