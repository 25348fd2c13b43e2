package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Two-hop neighbor feature aggregation (g20) — the GraphSAGE /
  * message-passing feature prep every graph-ML pipeline runs before
  * training: h1(v) = mean of neighbor features, h2(v) = mean of
  * neighbor h1 — "what do my neighbors look like, and what do THEIR
  * neighborhoods look like". Two edge joins + two partial-aggregatable
  * sums; everything shuffles on node ids, nothing collects.
  *
  * Determinism: neighbor sums are exact integers (feature cents in
  * int64, hop-2 sums cast to DECIMAL(38,0) BEFORE summing so no silent
  * int64 overflow at high degree), and each mean is integer
  * fixed-point — (Σ·10⁶) div deg in micro-units, truncation-parity
  * with the oracle's HUGEINT `//` established in x84 (both truncate
  * toward zero, which matters: account balances go negative). Mean
  * magnitudes are bounded by the max feature value regardless of
  * corpus size, so the unit longs never outgrow int64. The output
  * doubles are single exact-integer /1e6 conversions (fixed tree, no
  * round() call — the w13 identical-operands discipline). */
object FeatureProp {

  /** @param edges (src, dst) directed pairs (emit both directions for
    *   an undirected graph); every src must have ≥1 row
    * @param feats (node, f) with f an int64 feature (quantize upstream)
    * @return (node, f, deg, h1, h2) for every node appearing as src */
  def twoHopMeans(edges: DataFrame, feats: DataFrame): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    val hop1 = e
      .join(feats.select(col("node").as("dst"), col("f")), Seq("dst"))
      .groupBy(col("src"))
      .agg(count(lit(1)).as("deg"),
        sum(col("f").cast("decimal(30,0)")).as("sf"))
      .withColumn("h1_units",
        expr("CAST((sf * 1000000) div deg AS BIGINT)"))
    val hop2 = e
      .join(hop1.select(col("src").as("dst"),
        col("h1_units").as("nb_h1")), Seq("dst"))
      .groupBy(col("src"))
      .agg(sum(col("nb_h1").cast("decimal(38,0)")).as("s2"))
    hop1
      .join(hop2, Seq("src"))
      .withColumn("h2_units", expr("CAST(s2 div deg AS BIGINT)"))
      .join(feats.select(col("node").as("src"), col("f")), Seq("src"))
      .select(col("src").as("node"), col("f"), col("deg"),
        (col("h1_units").cast("double") / 1e6).as("h1"),
        (col("h2_units").cast("double") / 1e6).as("h2"))
  }
}
