package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Benford first-digit conformance test (dq9) — the classic
  * fraud / data-fabrication screen: natural multi-magnitude positive
  * quantities (payments, populations, file sizes) have first digits
  * distributed as P(d) = log10(1 + 1/d); fabricated or truncated data
  * does not. The χ² statistic against that law is the audit readout.
  *
  * Scale design: ONE scan reduces the corpus to the 9-row digit
  * histogram (partial-aggregatable count), and everything after runs on
  * those 9 rows. The first digit comes from the decimal string of the
  * positive integer (identical rendering in Spark and DuckDB — no
  * float log10 whose rounding could reassign a boundary value).
  *
  * Determinism: expected shares are PRECOMPUTED 6dp literals emitted
  * identically into both engines (the x73 precomputed-constant
  * discipline) — no engine evaluates a transcendental; each χ² term is
  * a fixed expression tree over exact integers and those literals,
  * rounded once to 6dp; the total is a DECIMAL(38,6) sum of the
  * rounded terms, so partial-aggregation order is irrelevant. Digits
  * that never occur still contribute their full expected-count term
  * ((0−e)²/e = e) via the left join from the law side.
  */
object Benford {

  /** P(first digit = d) = log10(1 + 1/d), rounded once to 6dp.
    * These literals are the contract with the oracle twin. */
  val expectedShares: Seq[(Int, Double)] = Seq(
    1 -> 0.301030, 2 -> 0.176091, 3 -> 0.124939, 4 -> 0.096910,
    5 -> 0.079181, 6 -> 0.066947, 7 -> 0.057992, 8 -> 0.051153,
    9 -> 0.045757)

  /** @param values frame with a positive-integer column `intCol`
    *   (quantize currency to cents upstream); non-positive rows are
    *   excluded (Benford is undefined for them)
    * @return 9 rows: digit, n_obs, obs_share, exp_share, chi2_term,
    *   chi2_total (repeated — the statistic; df = 8) */
  def firstDigitTest(values: DataFrame, intCol: String): DataFrame = {
    val spark = values.sparkSession
    import spark.implicits._
    val counts = values
      .filter(col(intCol) > 0)
      .select(substring(col(intCol).cast("long").cast("string"), 1, 1)
        .cast("int").as("digit"))
      .groupBy(col("digit"))
      .agg(count(lit(1)).as("n_obs"))
    val law = expectedShares.toDF("digit", "exp_share")
    val n = values.filter(col(intCol) > 0)
      .agg(count(lit(1)).as("n")) // one-row broadcast
    val terms = law
      .join(counts, Seq("digit"), "left")
      .crossJoin(broadcast(n))
      .select(col("digit"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        col("exp_share"), col("n"))
      .withColumn("obs_share",
        round(col("n_obs").cast("double") / col("n").cast("double"), 6))
      .withColumn("chi2_term",
        // fixed tree: (obs − e·n)² / (e·n), one rounding at the end
        round(
          (col("n_obs").cast("double") - col("exp_share") *
            col("n").cast("double")) *
            (col("n_obs").cast("double") - col("exp_share") *
              col("n").cast("double")) /
            (col("exp_share") * col("n").cast("double")), 6))
    terms
      .withColumn("chi2_total",
        sum(col("chi2_term").cast("decimal(38,6)"))
          .over(Window.partitionBy()).cast("double"))
      .select(col("digit"), col("n_obs"), col("obs_share"),
        col("exp_share"), col("chi2_term"), col("chi2_total"))
  }
}
