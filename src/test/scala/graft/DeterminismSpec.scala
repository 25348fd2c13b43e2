package graft

import org.scalatest.funsuite.AnyFunSuite

/** Partition-invariance certification — the repo's core determinism
  * claim tested DIRECTLY: every result must be identical under a
  * different shuffle layout, not just hash-equal to DuckDB once.
  * Twenty representative registered queries (decimal partial sums,
  * integer rank-picks, decimal argmaxes, fixed-point iterations,
  * window statistics, ln-term sums — one per discipline) run twice at
  * sf0.001: once under the session default and once under
  * spark.sql.shuffle.partitions = 5, and the collected row multisets
  * must match exactly. A partial-aggregation-order bug (float fold,
  * unquantized argmax tie, collect_list dependence) that happened to
  * agree with DuckDB under one layout fails here. */
class DeterminismSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private val names = Seq(
    "a1_gold_hourly",        // decimal roll-up + deterministic arrays
    "q5_revenue_by_nation",  // TPC-H join + decimal agg
    "x64_rfm_segmentation",  // integer rank-pick binning
    "ml16_isotonic",         // minimax lattice on the score grain
    "ml20_mutual_info",      // ln terms, decimal window total
    "x76_acf",               // n²-integer estimator + spine fill
    "x84_pvm_bridge",        // integer-cents bridge, truncating div
    "t31_source_kl",         // vocabulary-grain decimal KL
    "er6_fellegi_sunter",    // weight table + jw argmax
    "g21_conductance",       // LPA fixpoint + community aggregates
    "x72_markov_attribution",// collected-matrix fixed point
    "x58_weighted_median",   // weighted rank-pick
    "w15_rolling_corr",      // decimal window sufficient statistics
    "x82_top_paths",         // sort_array over collect_list structs
    "x22_topk_per_group",    // typed TopK aggregator
    // round-7 session-4 disciplines
    "x86_anova_dow",         // quantized-mean fixed point, unit² sums
    "ml22_gbt_stumps",       // double argmax + integer residual update
    "g20_feature_prop",      // micro-unit div means over two hops
    "x85_holt_forecast",     // driver recursion over collected series
    "dq9_benford",           // precomputed-literal χ² decimal total
    // round-8 q6/e4 integer disciplines
    "ml15_linear_shap",      // DECIMAL(38,0) Cramer ints, sdiv outputs
    "x70_stl_decompose",     // cents×400 trend, truncating seasonal div
    "t27_quality_filter",    // micro log-odds + IRLS micro terms
    "t28_lm_perplexity",     // micro-nat terms, integer mean
    "sim11_ann_recall_report", // e4 recall/ratio over two top-k legs
    "ml24_loo_influence",    // held-out integer Cramer per row
    "t36_temperature_mix",   // q6-quantized n^alpha, integer normalizer
    "mm7_media_exact_dedup", // sha-256 digest grain
    "ml25_conformal_intervals", // rank-pick q-hat + sdiv micro preds
    "ml26_grouped_ols",      // per-segment Cramer ints, two-stage agg
    "dq11_ks_test",          // integer CDF numerators, squared gate
    "t37_ngram_novelty",     // df-grain counts, truncating e6 share
    "x92_holt_winters",      // 7-slot integer seasonal recursion
    "sim13_centroid_drift",  // integer sum-vector cosine, floor tree
    "dq12_key_skew",         // count-of-counts histogram rank-picks
    "ml27_ndcg_eval",        // literal-weight integer DCG/IDCG
    "mm8_shard_plan",        // two-phase cumsum shard assignment
    "x93_forecast_backtest", // one-walk backtest, BigInt skill ratio
    "g24_neighbor_sampling", // integer-mix bottom-k via typed TopK
    "t38_source_overlap",    // source-grain postings matrix, e6 ratio
    "x94_decomposition_strength") // exact integer variance ratios

  private def run(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, dir)
      .collect().map(_.toString).sorted.toSeq

  test("the discipline-representative queries are bit-identical " +
    "under a different shuffle partitioning") {
    val key = "spark.sql.shuffle.partitions"
    val saved = spark.conf.get(key)
    names.foreach { n =>
      spark.conf.set(key, saved)
      val base = run(n)
      spark.conf.set(key, "5")
      val alt = try run(n) finally spark.conf.set(key, saved)
      assert(base === alt,
        s"$n diverged under a different shuffle layout " +
          s"(${base.size} vs ${alt.size} rows)")
      assert(base.nonEmpty, s"$n returned no rows at sf0.001")
    }
  }
}
