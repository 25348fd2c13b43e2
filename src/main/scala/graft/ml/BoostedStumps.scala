package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-round gradient boosting with decision-stump weak learners
  * (ml22) — the distributed core of the GBT loop: fit the best stump
  * on feature 1, subtract its leaf predictions, fit the best stump on
  * feature 2 against the RESIDUALS. Squared loss, so the gradient step
  * IS the residual — two rounds expose the whole mechanism (per-round
  * histogram → cumulative split scan → argmax → residual update)
  * without pretending to be a full GBM.
  *
  * Scale: each round reduces the corpus to a DOMAIN-BOUNDED
  * (feature-value → n, Σt, Σt²) histogram (the ml21 shape — bounded
  * by max events per user, not user count) and evaluates every
  * candidate split from cumulative sums over that bounded grain; the
  * residual update is one broadcast of the 1-row fitted stump. Two
  * corpus passes total — the same count a production GBM pays per
  * boosting round.
  *
  * Determinism: targets live in exact integer MICRO-CENT units; Σt
  * rides DECIMAL(30,0) and Σt² DECIMAL(19,0)² sums (order-free); leaf
  * means are integer `div` fixed-point (truncation parity with the
  * oracle's HUGEINT `//`, x84) so residuals stay exact integers; SSE
  * gains are UNROUNDED fixed double trees over those exact operands
  * (w13 discipline) and the per-round argmax breaks ties by smallest
  * threshold — identical doubles, identical winner, in both engines. */
object BoostedStumps {

  /** All candidate splits of `df` on integer `xCol` against integer
    * target `tCol`: (x, n_l, s_l, q_l, n_t, s_t, q_t, vr). */
  private def candidates(df: DataFrame, xCol: String,
      tCol: String): DataFrame = {
    val hist = df.groupBy(col(xCol).as("x"))
      .agg(count(lit(1)).as("n_x"),
        sum(col(tCol).cast("decimal(30,0)")).as("s_x"),
        sum(col(tCol).cast("decimal(19,0)") *
          col(tCol).cast("decimal(19,0)")).as("q_x"))
    val cum = Window.orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val whole = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
    def sse(q: Column, sv: Column, n: Column) =
      q.cast("double") -
        sv.cast("double") * sv.cast("double") / n.cast("double")
    hist
      .withColumn("n_l", sum(col("n_x")).over(cum))
      .withColumn("s_l", sum(col("s_x")).over(cum))
      .withColumn("q_l", sum(col("q_x")).over(cum))
      .withColumn("n_t", sum(col("n_x")).over(whole))
      .withColumn("s_t", sum(col("s_x")).over(whole))
      .withColumn("q_t", sum(col("q_x")).over(whole))
      .filter(col("n_l") < col("n_t"))
      .withColumn("vr",
        sse(col("q_t"), col("s_t"), col("n_t")) -
          sse(col("q_l"), col("s_l"), col("n_l")) -
          sse(col("q_t") - col("q_l"), col("s_t") - col("s_l"),
            col("n_t") - col("n_l")))
  }

  /** Best split: max gain, ties to the smallest threshold. 1-row. */
  private def best(cand: DataFrame): DataFrame =
    cand.orderBy(desc("vr"), col("x"))
      .limit(1)
      .withColumn("mean_l", expr("CAST(s_l div n_l AS BIGINT)"))
      .withColumn("mean_r",
        expr("CAST((s_t - s_l) div (n_t - n_l) AS BIGINT)"))

  /** @param per one row per entity: (x1, x2 integer features,
    *   y integer cents); both features need ≥ 2 distinct values
    * @return one row per boosting round: (rnd, feature, threshold,
    *   n_left, n_right, var_reduction) */
  def twoRounds(per: DataFrame, feature1: String = "x1",
      feature2: String = "x2"): DataFrame = {
    val t1 = per.withColumn("t", col("y") * 1000000L)
    val b1 = best(candidates(t1, feature1, "t"))
      .localCheckpoint() // 1 row; feeds the residual join AND output
    val resid = t1.crossJoin(broadcast(b1.select(
      col("x").as("thr"), col("mean_l"), col("mean_r"))))
      .withColumn("t2", col("t") -
        when(col(feature1) <= col("thr"), col("mean_l"))
          .otherwise(col("mean_r")))
    val b2 = best(candidates(resid, feature2, "t2"))
    def row(b: DataFrame, rnd: Int, f: String) =
      b.select(lit(rnd).as("rnd"), lit(f).as("feature"),
        col("x").as("threshold"), col("n_l").as("n_left"),
        (col("n_t") - col("n_l")).as("n_right"),
        col("vr").as("var_reduction"))
    row(b1, 1, feature1).unionAll(row(b2, 2, feature2))
  }

  /** DuckDB twin: `perRel` must yield (x1, x2, y) at the same grain. */
  def twoRoundsSql(perRel: String, feature1: String = "x1",
      feature2: String = "x2"): String = {
    def stage(src: String, xc: String, tc: String, out: String) =
      s"""h_$out AS (SELECT $xc AS x, CAST(count(*) AS BIGINT) AS n_x,
         |    CAST(sum($tc) AS HUGEINT) AS s_x,
         |    CAST(sum(CAST($tc AS DECIMAL(19,0)) *
         |      CAST($tc AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS q_x
         |  FROM $src GROUP BY 1),
         |c_$out AS (SELECT x,
         |    CAST(sum(n_x) OVER w AS BIGINT) AS n_l,
         |    sum(s_x) OVER w AS s_l,
         |    CAST(sum(q_x) OVER w AS DECIMAL(38,0)) AS q_l,
         |    CAST(sum(n_x) OVER () AS BIGINT) AS n_t,
         |    sum(s_x) OVER () AS s_t,
         |    CAST(sum(q_x) OVER () AS DECIMAL(38,0)) AS q_t
         |  FROM h_$out
         |  WINDOW w AS (ORDER BY x
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |$out AS (SELECT x, n_l, s_l, q_l, n_t, s_t, q_t,
         |    (CAST(q_t AS DOUBLE) - CAST(s_t AS DOUBLE) *
         |       CAST(s_t AS DOUBLE) / CAST(n_t AS DOUBLE)) -
         |    (CAST(q_l AS DOUBLE) - CAST(s_l AS DOUBLE) *
         |       CAST(s_l AS DOUBLE) / CAST(n_l AS DOUBLE)) -
         |    (CAST(q_t - q_l AS DOUBLE) -
         |       CAST(s_t - s_l AS DOUBLE) * CAST(s_t - s_l AS DOUBLE) /
         |       CAST(n_t - n_l AS DOUBLE)) AS vr
         |  FROM c_$out WHERE n_l < n_t
         |  ORDER BY vr DESC, x LIMIT 1)""".stripMargin
    s"""WITH per AS ($perRel),
       |t1 AS (SELECT x1, x2, y * 1000000 AS t FROM per),
       |${stage("t1", feature1, "t", "b1")},
       |m1 AS (SELECT x AS thr,
       |    CAST(s_l // n_l AS BIGINT) AS mean_l,
       |    CAST((s_t - s_l) // (n_t - n_l) AS BIGINT) AS mean_r
       |  FROM b1),
       |r2 AS (SELECT $feature2, t - CASE WHEN $feature1 <= thr
       |    THEN mean_l ELSE mean_r END AS t2
       |  FROM t1 CROSS JOIN m1),
       |${stage("r2", feature2, "t2", "b2")}
       |SELECT CAST(1 AS INT) AS rnd, '$feature1' AS feature,
       |  CAST(x AS BIGINT) AS threshold, n_l AS n_left,
       |  n_t - n_l AS n_right, vr AS var_reduction FROM b1
       |UNION ALL
       |SELECT CAST(2 AS INT), '$feature2', CAST(x AS BIGINT), n_l,
       |  n_t - n_l, vr FROM b2
       |ORDER BY rnd""".stripMargin.replace('\n', ' ')
  }
}
