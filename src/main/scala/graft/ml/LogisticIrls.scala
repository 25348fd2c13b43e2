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
    *   p  = σ(b0 + b1·x)        (micro-quantized — see below)
    *   w  = p(1−p)
    *   H  = [[Σw, Σwx], [Σwx, Σwx²]]   g = [Σ(y−p), Σ(y−p)x]
    *   Δβ = H⁻¹g  via the closed-form 2×2 solve
    *
    * Determinism contract (the round-8 q6 discipline, extended
    * through an iteration): the sigmoid and every per-row term
    * quantize to INTEGER MICRO-UNITS via a 0-dp round of value·10⁶ —
    * at 0 dp a double either sits EXACTLY on a half-integer (where
    * every away-from-zero engine agrees) or strictly on one side, so
    * no string-tie/binary-tie divergence exists (the `round(x, 6)`
    * this replaces could string-tie on non-boundary doubles — the
    * class the round-8 rounding audit flagged). Terms sum as exact
    * integers whose magnitude stays below 2⁵³ (6-dp quantization is
    * load-bearing exactly as before), so the sum→double conversion is
    * exact and the per-statistic /10⁶ is ONE correctly-rounded
    * division; the Newton update is then the identical double
    * expression in both engines — after any fixed iteration count
    * both engines hold bit-identical betas.
    * Scale: per-iteration cost is one scan + one 5-column partial
    * aggregate; driver state is a 2-vector. */
  def train(data: DataFrame, xCol: String, yCol: String,
      iters: Int = 3): DataFrame = {
    val spark = data.sparkSession
    import spark.implicits._
    // materialize the (x, y) projection ONCE: every Newton iteration's
    // sufficient-statistics pass is a driver action, and an unbound
    // input would re-run the caller's whole upstream pipeline per
    // iteration (guide §1.2 — measured round 15 on t27: the scored
    // frame's tokenize+model pipeline executed 4×). Two doubles per
    // row, so the checkpoint is scan-sized at any SF.
    val d = data.select(col(xCol).cast("double").as("x"),
      col(yCol).cast("double").as("y")).localCheckpoint()
    var b0 = 0.0
    var b1 = 0.0
    val trajectory = Seq.newBuilder[(Int, Double, Double)]
    for (t <- 1 to iters) {
      val pMicro = round(lit(1.0) /
        (lit(1.0) + exp(-(lit(b0) + lit(b1) * col("x")))) *
        lit(1000000.0)).cast("long")
      val p = col("pm").cast("double") / lit(1000000.0)
      val w = p * (lit(1.0) - p)
      def term(c: org.apache.spark.sql.Column) =
        round(c * lit(1000000.0)).cast("long")
      val r = d.withColumn("pm", pMicro)
        .select(
          term(w).as("w_t"),
          term(w * col("x")).as("wx_t"),
          term(w * col("x") * col("x")).as("wxx_t"),
          term(col("y") - p).as("r_t"),
          term((col("y") - p) * col("x")).as("rx_t"))
        .agg(sum(col("w_t")), sum(col("wx_t")), sum(col("wxx_t")),
          sum(col("r_t")), sum(col("rx_t")))
        .first()
      def s(i: Int) = r.getLong(i).toDouble / 1e6
      val sw = s(0); val swx = s(1); val swxx = s(2)
      val g0 = s(3); val g1 = s(4)
      val det = sw * swxx - swx * swx
      b0 = b0 + (swxx * g0 - swx * g1) / det
      b1 = b1 + (sw * g1 - swx * g0) / det
      trajectory += ((t, b0, b1))
    }
    // the trajectory is driver-side — the data checkpoint is dead
    graft.util.Checkpoints.free(d)
    trajectory.result().toDF("iter", "b0", "b1")
  }

  private val one = "CAST('1' AS DOUBLE)"
  private val mil = "CAST('1000000' AS DOUBLE)"

  /** The statically unrolled iteration CTEs `it0, s1, it1, …, itN`
    * shared by [[irlsSql]] and [[irlsScoredSql]]; callers prepend the
    * MATERIALIZED `d` CTE (must expose columns x, y) and append their
    * own final SELECT. Mirrors [[train]]'s q6 micro-integer terms
    * exactly (same multiplication order, same 0-dp rounds). */
  private def unrolledCtes(iters: Int): String = {
    val steps = (1 to iters).map { t =>
      s"""s$t AS (SELECT
         |  CAST(sum(CAST(round(w * $mil) AS BIGINT)) AS DOUBLE)
         |    / $mil AS sw,
         |  CAST(sum(CAST(round(w * x * $mil) AS BIGINT)) AS DOUBLE)
         |    / $mil AS swx,
         |  CAST(sum(CAST(round(w * x * x * $mil) AS BIGINT))
         |    AS DOUBLE) / $mil AS swxx,
         |  CAST(sum(CAST(round((y - p) * $mil) AS BIGINT)) AS DOUBLE)
         |    / $mil AS g0,
         |  CAST(sum(CAST(round((y - p) * x * $mil) AS BIGINT))
         |    AS DOUBLE) / $mil AS g1
         |FROM (SELECT x, y, p, p * ($one - p) AS w
         |  FROM (SELECT x, y,
         |      CAST(CAST(round($one / ($one + exp(-(b.b0 + b.b1 * x)))
         |        * $mil) AS BIGINT) AS DOUBLE) / $mil AS p
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
    * probability under the FINAL betas, micro-quantized
    * (`p_micro` BIGINT) — the oracle for operators that ship scores,
    * not models (t27). `dataSql` must yield `keyCols` ++ (x, y). */
  def irlsScoredSql(dataSql: String, keyCols: Seq[String],
      iters: Int = 3): String = {
    val keys = keyCols.mkString(", ")
    s"""WITH d AS MATERIALIZED (SELECT $keys, x, y FROM ($dataSql)),
       |${unrolledCtes(iters)}
       |SELECT $keys, x, y,
       |  CAST(round($one / ($one + exp(-(b.b0 + b.b1 * x))) * $mil)
       |    AS BIGINT) AS p_micro
       |FROM d CROSS JOIN it$iters b""".stripMargin.replace('\n', ' ')
  }

}
