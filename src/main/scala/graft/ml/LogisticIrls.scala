package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Logistic regression by iteratively reweighted least squares
  * (Newton's method), distributed the same way as the ridge normal
  * equations (`NormalEquations`): each iteration is ONE aggregate pass
  * over the data computing five sufficient statistics, and the driver
  * solves only the tiny normal system. */
object LogisticIrls {

  /** Train intercept + single-feature logistic regression. Per
    * iteration with current (b0, b1):
    *
    *   p  = σ(b0 + b1·x)        (rounded to 6 dp — see below)
    *   w  = p(1−p)
    *   H  = [[Σw, Σwx], [Σwx, Σwx²]]   g = [Σ(y−p), Σ(y−p)x]
    *   Δβ = H⁻¹g  via the closed-form 2×2 solve
    *
    * Determinism contract (the ml2/x40 discipline, extended through an
    * iteration): p is rounded to 6 dp right after the sigmoid so a
    * cross-engine exp() ulp can never propagate; every per-row term is
    * rounded to 6 dp and summed in DECIMAL (partial-sum order
    * irrelevant). Scale 6 — not 12 — is load-bearing: it keeps the
    * sum's unscaled integer far below 2^53, where BOTH engines'
    * decimal→double conversions are single correctly-rounded
    * divisions (at scale 12 the 16-digit sums made DuckDB's
    * hugeint/10^12 path double-round, diverging from Java's
    * BigDecimal in the last bit); the Newton update is then the
    * identical double expression
    * in both engines evaluated on those exact sums — so after any
    * fixed iteration count both engines hold bit-identical betas.
    * Scale: per-iteration cost is one scan + one 5-column partial
    * aggregate; driver state is a 2-vector. */
  def train(data: DataFrame, xCol: String, yCol: String,
      iters: Int = 3): DataFrame = {
    val spark = data.sparkSession
    import spark.implicits._
    val d = data.select(col(xCol).cast("double").as("x"),
      col(yCol).cast("double").as("y"))
    var b0 = 0.0
    var b1 = 0.0
    val trajectory = Seq.newBuilder[(Int, Double, Double)]
    for (t <- 1 to iters) {
      val p = round(lit(1.0) /
        (lit(1.0) + exp(-(lit(b0) + lit(b1) * col("x")))), 6)
      val w = col("p") * (lit(1.0) - col("p"))
      def term(c: org.apache.spark.sql.Column) =
        round(c, 6).cast("decimal(38,6)")
      val r = d.withColumn("p", p)
        .select(
          term(w).as("w_t"),
          term(w * col("x")).as("wx_t"),
          term(w * col("x") * col("x")).as("wxx_t"),
          term(col("y") - col("p")).as("r_t"),
          term((col("y") - col("p")) * col("x")).as("rx_t"))
        .agg(sum(col("w_t")), sum(col("wx_t")), sum(col("wxx_t")),
          sum(col("r_t")), sum(col("rx_t")))
        .first()
      val sw = r.getDecimal(0).doubleValue
      val swx = r.getDecimal(1).doubleValue
      val swxx = r.getDecimal(2).doubleValue
      val g0 = r.getDecimal(3).doubleValue
      val g1 = r.getDecimal(4).doubleValue
      val det = sw * swxx - swx * swx
      b0 = b0 + (swxx * g0 - swx * g1) / det
      b1 = b1 + (sw * g1 - swx * g0) / det
      trajectory += ((t, b0, b1))
    }
    trajectory.result().toDF("iter", "b0", "b1")
  }

  private val one = "CAST('1' AS DOUBLE)"

  /** The statically unrolled iteration CTEs `it0, s1, it1, …, itN`
    * shared by [[irlsSql]] and [[irlsScoredSql]]; callers prepend the
    * MATERIALIZED `d` CTE (must expose columns x, y) and append their
    * own final SELECT. */
  private def unrolledCtes(iters: Int): String = {
    val steps = (1 to iters).map { t =>
      s"""s$t AS (SELECT
         |  CAST(sum(CAST(round(w, 6) AS DECIMAL(38,6))) AS DOUBLE)
         |    AS sw,
         |  CAST(sum(CAST(round(w * x, 6) AS DECIMAL(38,6))) AS DOUBLE)
         |    AS swx,
         |  CAST(sum(CAST(round(w * x * x, 6) AS DECIMAL(38,6)))
         |    AS DOUBLE) AS swxx,
         |  CAST(sum(CAST(round(y - p, 6) AS DECIMAL(38,6))) AS DOUBLE)
         |    AS g0,
         |  CAST(sum(CAST(round((y - p) * x, 6) AS DECIMAL(38,6)))
         |    AS DOUBLE) AS g1
         |FROM (SELECT x, y, p, p * ($one - p) AS w
         |  FROM (SELECT x, y,
         |      round($one / ($one + exp(-(b.b0 + b.b1 * x))), 6) AS p
         |    FROM d CROSS JOIN it${t - 1} b))),
         |it$t AS (SELECT
         |  b.b0 + (s.swxx * s.g0 - s.swx * s.g1) /
         |    (s.sw * s.swxx - s.swx * s.swx) AS b0,
         |  b.b1 + (s.sw * s.g1 - s.swx * s.g0) /
         |    (s.sw * s.swxx - s.swx * s.swx) AS b1
         |FROM s$t s CROSS JOIN it${t - 1} b)""".stripMargin
    }
    s"""it0 AS (SELECT CAST('0' AS DOUBLE) AS b0,
       |  CAST('0' AS DOUBLE) AS b1),
       |${steps.mkString(", ")}""".stripMargin
  }

  /** DuckDB twin of [[train]]: the same iterations statically unrolled
    * as CTEs (the g3/g4 pattern; the data CTE is MATERIALIZED since
    * every iteration references it). `dataSql` must yield (x, y) with
    * y ∈ {0.0, 1.0}. */
  def irlsSql(dataSql: String, iters: Int = 3): String = {
    val union = (1 to iters)
      .map(t => s"SELECT $t AS i, b0, b1 FROM it$t")
      .mkString(" UNION ALL ")
    s"""WITH d AS MATERIALIZED (SELECT x, y FROM ($dataSql)),
       |${unrolledCtes(iters)}
       |SELECT CAST(i AS INT) AS iter, b0, b1
       |FROM ($union) ORDER BY iter""".stripMargin.replace('\n', ' ')
  }

  /** Per-row scored twin: identical unrolled training, but instead of
    * the beta trajectory it emits every input row with its calibrated
    * probability under the FINAL betas — the oracle for operators that
    * ship scores, not models (t27). `dataSql` must yield `keyCols` ++
    * (x, y). */
  def irlsScoredSql(dataSql: String, keyCols: Seq[String],
      iters: Int = 3): String = {
    val keys = keyCols.mkString(", ")
    s"""WITH d AS MATERIALIZED (SELECT $keys, x, y FROM ($dataSql)),
       |${unrolledCtes(iters)}
       |SELECT $keys, x, y,
       |  round($one / ($one + exp(-(b.b0 + b.b1 * x))), 6) AS p
       |FROM d CROSS JOIN it$iters b""".stripMargin.replace('\n', ' ')
  }

}
