package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Newman modularity of a node→community partition over an undirected
  * simple graph — the quality score for the communities g4/g5 emit
  * (Newman & Girvan 2004, the standard community-detection objective):
  *
  *   Q = Σ_c [ in_c/m − (deg_c/2m)² ]  =  Σ_c (4m·in_c − deg_c²) / 4m²
  *
  * computed entirely in EXACT integer arithmetic: per-community
  * numerator contribution `q_num = 4m·in_c − deg_c²` is a long, and
  * the only doubles are the final identical-operand divisions, so the
  * score is bit-reproducible cross-engine (the x51 Pearson rule).
  * Integer bounds: safe while m < ~2^30 edges and deg_c < ~2^31 — at
  * larger graphs lift q_num to DECIMAL(38,0) sums.
  *
  * Scale shape: the edge list shuffles twice (once per endpoint label
  * join) against the node-sized labeling, degrees come from one
  * partial-aggregatable count, and everything after the two joins is
  * community-grain. The ROLLUP total row (community NULL) carries the
  * graph-wide Q in `q_part` — per-community rows carry their share. */
object Modularity {

  /** @param edges  numeric `src`, `dst` (orientation/dupes irrelevant)
    * @param labels `node`, `community` (e.g. [[LabelPropagation.run]])
    */
  def run(edges: DataFrame, labels: DataFrame): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val m = und.agg(count(lit(1)).as("mm"))
    val deg = und.select(col("a").as("node"))
      .unionAll(und.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val lab = labels.select(col("node"), col("community"))
    val internal = und
      .join(lab.select(col("node").as("a"), col("community").as("ca")),
        "a")
      .join(lab.select(col("node").as("b"), col("community").as("cb")),
        "b")
      .filter(col("ca") === col("cb"))
      .groupBy(col("ca").as("community"))
      .agg(count(lit(1)).as("in_edges"))
    val degc = deg.join(lab, "node")
      .groupBy(col("community"))
      .agg(sum(col("deg")).as("deg_sum"), count(lit(1)).as("n_nodes"))
    degc.join(internal, Seq("community"), "left")
      .na.fill(0L, Seq("in_edges"))
      .crossJoin(broadcast(m))
      .withColumn("q_num",
        lit(4L) * col("mm") * col("in_edges") -
          col("deg_sum") * col("deg_sum"))
      .rollup(col("community"))
      .agg(sum(col("n_nodes")).cast("long").as("n_nodes"),
        sum(col("in_edges")).cast("long").as("in_edges"),
        sum(col("deg_sum")).cast("long").as("deg_sum"),
        sum(col("q_num")).cast("long").as("q_num"),
        max(col("mm")).as("m_edges"))
      .withColumn("q_part", col("q_num").cast("double") /
        (lit(4.0) * col("m_edges") * col("m_edges")))
      .select(col("community"), col("n_nodes"), col("in_edges"),
        col("deg_sum"), col("q_num"), col("q_part"))
  }

  /** DuckDB twin: [[LabelPropagation.lpaCtes]]'s unrolled labeling,
    * then the identical integer modularity algebra with
    * `GROUP BY ROLLUP(community)` (sum(BIGINT) is HUGEINT in DuckDB —
    * every sum casts back to BIGINT). */
  def modularitySql(edgesSql: String, rounds: Int = 5): String =
    LabelPropagation.lpaCtes(edgesSql, rounds) +
      ", und AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, " +
      "greatest(src, dst) AS b FROM e)" +
      ", mm AS (SELECT count(*) AS m FROM und)" +
      ", dg AS (SELECT node, count(*) AS deg FROM " +
      "(SELECT a AS node FROM und UNION ALL SELECT b FROM und) " +
      "GROUP BY 1)" +
      s", lab AS (SELECT node, community FROM l$rounds)" +
      ", internal AS (SELECT la.community, count(*) AS in_edges " +
      "FROM und JOIN lab la ON und.a = la.node " +
      "JOIN lab lb ON und.b = lb.node " +
      "WHERE la.community = lb.community GROUP BY 1)" +
      ", degc AS (SELECT community, sum(deg) AS deg_sum, " +
      "count(*) AS n_nodes FROM dg JOIN lab USING (node) GROUP BY 1)" +
      ", per AS (SELECT d.community, d.n_nodes, " +
      "coalesce(i.in_edges, 0) AS in_edges, d.deg_sum, " +
      "4 * m * coalesce(i.in_edges, 0) - d.deg_sum * d.deg_sum " +
      "AS q_num, m FROM degc d LEFT JOIN internal i USING (community) " +
      "CROSS JOIN mm) " +
      "SELECT community, CAST(sum(n_nodes) AS BIGINT) AS n_nodes, " +
      "CAST(sum(in_edges) AS BIGINT) AS in_edges, " +
      "CAST(sum(deg_sum) AS BIGINT) AS deg_sum, " +
      "CAST(sum(q_num) AS BIGINT) AS q_num, " +
      "CAST(sum(q_num) AS DOUBLE) / (4.0 * max(m) * max(m)) AS q_part " +
      "FROM per GROUP BY ROLLUP(community) ORDER BY community"
}
