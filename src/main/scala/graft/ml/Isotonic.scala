package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Isotonic (monotone non-decreasing) calibration — the non-parametric
  * sibling of the binned reliability table (`Metrics.calibrationTable`,
  * ml5) and Platt-style parametric scaling: map raw model scores to
  * calibrated probabilities with NO shape assumption beyond monotonicity.
  * This is the calibrator sklearn's `IsotonicRegression` ships and the
  * one production ranking/ads stacks run when scores are plentiful.
  *
  * Algorithmic choice, 100 TB reasoning: the classical pool-adjacent-
  * violators (PAV) algorithm is an inherently sequential left-to-right
  * pooling scan — useless as a distributed plan. But the L2-isotonic fit
  * has an exact closed-form MINIMAX characterization (Robertson/Wright/
  * Dykstra 1988, "Order Restricted Statistical Inference", eq. 1.9):
  *
  *   fit(i) = max_{a ≤ i} min_{b ≥ i} wavg(a..b)
  *
  * where wavg(a..b) is the label-weighted mean over the CONTIGUOUS score
  * bins a..b. That formula is pure joins + aggregates. The corpus
  * contributes exactly ONE user-grain aggregate; everything after runs on
  * the (score → n_pos, n_tot) GRAIN, which is domain-bounded (scores are
  * small-integer click counts — tens of distinct values no matter how
  * many users, the ml13 argument), so the S² interval table and the S³
  * minimax join are metadata-sized at any corpus scale.
  *
  * Determinism: interval means are double divisions of exact integer
  * cumulative sums — both engines divide the same integers, so the
  * max/min lattice compares identical IEEE doubles; output rates round
  * once at 6dp. Weights never enter as doubles.
  */
object Isotonic {

  /** Isotonic calibration over a pre-aggregated (score, n_pos, n_neg)
    * grain. Returns one row per score with the raw and calibrated
    * (isotonic) positive rate; `rate_iso` is non-decreasing in score by
    * construction. */
  def calibrate(grain: DataFrame, scoreCol: String = "score",
      posCol: String = "np", negCol: String = "nn"): DataFrame = {
    val cum = Window.orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // single-partition window: the grain is domain-bounded (S rows)
    // localCheckpoint: the grain is referenced three times below (iv,
    // fit spine, final join) — without truncation each lineage would
    // re-run the corpus-sized upstream aggregate
    val c = grain
      .select(col(scoreCol).as("s"), col(posCol).cast("long").as("np"),
        (col(posCol) + col(negCol)).cast("long").as("nt"))
      .withColumn("cp", sum(col("np")).over(cum))
      .withColumn("cw", sum(col("nt")).over(cum))
      .localCheckpoint()
    // contiguous-interval means: sum over bins a..b via cumsum differences
    val a = c.select(col("s").as("sa"), col("cp").as("cpa"),
      col("cw").as("cwa"), col("np").as("npa"), col("nt").as("nta"))
    val b = c.select(col("s").as("sb"), col("cp").as("cpb"),
      col("cw").as("cwb"))
    val iv = a.join(broadcast(b), col("sa") <= col("sb"))
      .select(col("sa"), col("sb"),
        ((col("cpb") - col("cpa") + col("npa")).cast("double") /
          (col("cwb") - col("cwa") + col("nta")).cast("double")).as("m"))
    // fit(i) = max over a<=i of ( min over b>=i of m(a,b) ); a<=i<=b
    val fit = iv
      .join(broadcast(c.select(col("s").as("si"))),
        col("sa") <= col("si") && col("sb") >= col("si"))
      .groupBy(col("si"), col("sa")).agg(min(col("m")).as("mn"))
      .groupBy(col("si")).agg(max(col("mn")).as("fit"))
    c.join(broadcast(fit), col("s") === col("si"))
      .select(col("s").as(scoreCol), col("np").as("n_pos"),
        col("nt").as("n"),
        round(col("np").cast("double") / col("nt").cast("double"), 6)
          .as("rate_raw"),
        round(col("fit"), 6).as("rate_iso"))
  }

  /** DuckDB twin of [[calibrate]]: same cumulative-sum interval means and
    * minimax lattice over a `grain` CTE exposing (score, np, nn). */
  def calibrateSql(grainCte: String): String =
    s"""WITH grain AS ($grainCte),
       |c AS (SELECT score AS s, CAST(np AS BIGINT) AS np,
       |    CAST(np + nn AS BIGINT) AS nt,
       |    sum(np) OVER (ORDER BY score) AS cp,
       |    sum(np + nn) OVER (ORDER BY score) AS cw
       |  FROM grain),
       |iv AS (SELECT a.s AS sa, b.s AS sb,
       |    CAST(b.cp - a.cp + a.np AS DOUBLE)
       |      / CAST(b.cw - a.cw + a.nt AS DOUBLE) AS m
       |  FROM c a JOIN c b ON a.s <= b.s),
       |inner_min AS (SELECT i.s AS si, iv.sa, min(iv.m) AS mn
       |  FROM iv JOIN c i ON iv.sa <= i.s AND iv.sb >= i.s
       |  GROUP BY 1, 2),
       |fit AS (SELECT si, max(mn) AS fit FROM inner_min GROUP BY 1)
       |SELECT c.s AS score, c.np AS n_pos, c.nt AS n,
       |  round(CAST(c.np AS DOUBLE) / CAST(c.nt AS DOUBLE), 6)
       |    AS rate_raw,
       |  round(f.fit, 6) AS rate_iso
       |FROM c JOIN fit f ON f.si = c.s"""
      .stripMargin.replace('\n', ' ')
}
