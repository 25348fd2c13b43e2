package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ridge regression via distributed normal equations — the second ML
  * path next to [[Forecast]]'s GBT: closed-form linear modeling where
  * the ONLY distributed work is one aggregate pass.
  *
  * Scale shape: X'X and X'y are sums of per-row products — 46 scalar
  * sums for 8 features, all in ONE hash aggregate at scan speed (no
  * iteration, no gradient steps, no caching); the k×k Gram matrix is
  * metadata-sized, so the solve happens on the driver in microseconds.
  * This is how linear models actually get fit at 100 TB: the cluster
  * computes sufficient statistics, not coefficients.
  *
  * Determinism: each product rounds to 6 dp and sums in DECIMAL —
  * cross-partition float addition reorders, decimal addition is
  * associative — so the Gram matrix (and therefore the fit) is
  * bit-reproducible and oracle-checkable.
  */
object NormalEquations {

  /** Feature names, in Gram-index order; "one" is the intercept. */
  val features: Seq[String] = Seq("one", "aqi", "aqi_lag_1h",
    "aqi_lag_24h", "hour_d", "dow_d", "latitude", "longitude")

  /** The 8-feature design frame + target from the Gold table: current
    * AQI, two lags, time-of-day/week, station coordinates. Rows with
    * any null feature (window edges) drop — same rule both engines. */
  def designMatrix(gold: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("location_id")).orderBy(col("datetime"))
    gold
      .select(col("location_id"), col("datetime"), col("aqi"),
        col("latitude"), col("longitude"))
      .withColumn("one", lit(1.0))
      .withColumn("aqi_lag_1h", lag(col("aqi"), 1).over(w))
      .withColumn("aqi_lag_24h", lag(col("aqi"), 24).over(w))
      .withColumn("hour_d", hour(col("datetime")).cast("double"))
      .withColumn("dow_d", weekday(col("datetime")).cast("double"))
      .withColumn("y", lead(col("aqi"), 1).over(w))
      .filter(features.map(col(_).isNotNull).reduce(_ && _) &&
        col("y").isNotNull)
  }

  private def dsum(c: Column): Column =
    sum(round(c, 6).cast("decimal(30,6)")).cast("double")

  /** One-row Gram statistics: upper-triangle X'X (`g_i_j`), X'y
    * (`b_i`), y'y and n — everything the ridge solve needs. */
  def gram(fm: DataFrame): DataFrame = {
    val k = features.size
    val xx = for (i <- 0 until k; j <- i until k)
      yield dsum(col(features(i)) * col(features(j))).as(s"g_${i}_$j")
    val xy = (0 until k).map(i =>
      dsum(col(features(i)) * col("y")).as(s"b_$i"))
    val aggs = xx ++ xy :+ dsum(col("y") * col("y")).as("yy") :+
      count(lit(1)).as("n")
    fm.agg(aggs.head, aggs.tail: _*)
  }

  /** DuckDB twin of designMatrix+gram as a `withPipeline` body
    * (continues the WITH chain after the gold CTE). */
  def gramSql: String = {
    val k = features.size
    def ds(e: String) =
      s"CAST(sum(CAST(round($e, 6) AS DECIMAL(30,6))) AS DOUBLE)"
    val xx = (for (i <- 0 until k; j <- i until k) yield
      s"${ds(s"${features(i)} * ${features(j)}")} AS g_${i}_$j")
    val xy = (0 until k).map(i => s"${ds(s"${features(i)} * y")} AS b_$i")
    val cols = (xx ++ xy :+ s"${ds("y * y")} AS yy" :+
      "count(*) AS n").mkString(", ")
    s""", fm AS (
       |  SELECT CAST('1' AS DOUBLE) AS one, aqi,
       |    lag(aqi, 1) OVER w AS aqi_lag_1h,
       |    lag(aqi, 24) OVER w AS aqi_lag_24h,
       |    CAST(hour(datetime) AS DOUBLE) AS hour_d,
       |    CAST(isodow(datetime) - 1 AS DOUBLE) AS dow_d,
       |    latitude, longitude,
       |    lead(aqi, 1) OVER w AS y
       |  FROM gold
       |  WINDOW w AS (PARTITION BY location_id ORDER BY datetime)
       |  QUALIFY ${features.map(f => s"$f IS NOT NULL").mkString(" AND ")}
       |    AND y IS NOT NULL)
       |SELECT $cols FROM fm""".stripMargin.replace('\n', ' ')
  }

  /** Driver-side ridge solve of the collected Gram row:
    * (X'X + λI)β = X'y by Gaussian elimination with partial pivoting
    * (k×k, metadata-sized; the intercept is not penalized). */
  def solveRidge(row: org.apache.spark.sql.Row,
      lambda: Double): Array[Double] = {
    val k = features.size
    val a = Array.ofDim[Double](k, k + 1)
    for (i <- 0 until k; j <- i until k) {
      val v = row.getAs[Double](s"g_${i}_$j")
      a(i)(j) = v; a(j)(i) = v
    }
    for (i <- 1 until k) a(i)(i) += lambda // skip intercept
    for (i <- 0 until k) a(i)(k) = row.getAs[Double](s"b_$i")
    for (p <- 0 until k) {
      val piv = (p until k).maxBy(r => math.abs(a(r)(p)))
      val tmp = a(p); a(p) = a(piv); a(piv) = tmp
      require(math.abs(a(p)(p)) > 1e-12, "singular Gram matrix")
      for (r <- p + 1 until k) {
        val f = a(r)(p) / a(p)(p)
        for (c <- p to k) a(r)(c) -= f * a(p)(c)
      }
    }
    val beta = new Array[Double](k)
    for (p <- k - 1 to 0 by -1) {
      var s = a(p)(k)
      for (c <- p + 1 until k) s -= a(p)(c) * beta(c)
      beta(p) = s / a(p)(p)
    }
    beta
  }
}
