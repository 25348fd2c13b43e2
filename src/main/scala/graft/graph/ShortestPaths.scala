package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-source weighted shortest paths over an undirected edge list
  * with positive integer weights. */
object ShortestPaths {

  /** Bellman–Ford with delta pruning: each round relaxes only edges
    * leaving nodes whose tentative distance IMPROVED last round (the
    * frontier), merges candidates into the distance table by min, and
    * keeps as the next frontier exactly the improved nodes. After R
    * rounds the table holds the exact minimum weight over all paths of
    * at most R edges — which is also precisely what the hop-capped
    * recursive oracle computes, so a fixed round count is a
    * deterministic contract, not a convergence gamble. Integer weights
    * make every distance exact in both engines. Per-round work is
    * proportional to the frontier's edge boundary; `localCheckpoint`
    * truncates the iterative lineage (the PageRank/CC/BFS rule). */
  def sssp(edges: DataFrame, source: Long, maxRounds: Int = 6)
      : DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val sym = edges.select(col("src"), col("dst"), col("w"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst"),
        col("w")))
      .filter(col("src") =!= col("dst"))
      .groupBy(col("src"), col("dst")).agg(min(col("w")).as("w"))
      .localCheckpoint()
    // guarded broadcast of the node-sized frontier + size-derived edge
    // partitioning (guide §3.1/§2.2, the PageRank/CC/BFS pattern)
    val fr = sym.agg(count(lit(1)),
      approx_count_distinct(col("src"))).first()
    val symL = PageRank.sized(sym, PageRank.edgePartitions(fr.getLong(0)))
    val fits = PageRank.broadcastFits(sym.sparkSession, fr.getLong(1))
    def side(df: DataFrame): DataFrame = if (fits) broadcast(df) else df
    var dist = Seq((source, 0L)).toDF("node", "dist").localCheckpoint()
    var frontier = dist
    var prevMerged: DataFrame = null
    var round = 0
    while (round < maxRounds && !frontier.isEmpty) {
      round += 1
      val cand = symL
        .join(side(frontier.select(col("node").as("src"),
          col("dist").as("fd"))), "src")
        .groupBy(col("dst").as("node"))
        .agg(min(col("fd") + col("w")).as("cd"))
      val merged = dist.join(cand, Seq("node"), "full_outer")
        .select(col("node"),
          least(coalesce(col("dist"), col("cd")),
            coalesce(col("cd"), col("dist"))).as("dist"),
          (col("dist").isNull ||
            (col("cd").isNotNull && col("cd") < col("dist")))
            .as("improved"))
        .localCheckpoint()
      val nextFrontier = merged.filter(col("improved"))
        .select(col("node"), col("dist")).localCheckpoint()
      // merged (and the next frontier) are materialized — the prior
      // round's merged/frontier frames are dead; release eagerly
      // (round 1: frontier eq dist-init, which merged superseded too)
      graft.util.Checkpoints.free(frontier)
      if (prevMerged ne null) graft.util.Checkpoints.free(prevMerged)
      prevMerged = merged
      frontier = nextFrontier
      dist = merged.select(col("node"), col("dist"))
    }
    // dist is a lazy projection over the LAST merged — keep that one;
    // the final (typically empty) frontier is dead unless it IS dist
    if (frontier ne dist) graft.util.Checkpoints.free(frontier)
    graft.util.Checkpoints.free(sym)
    dist
  }

  /** DuckDB twin of [[sssp]]: hop-capped recursive relaxation (the cap
    * bounds recursion through cycles) collapsed by min(total weight).
    * `edgesSql` must yield (src, dst, w) with positive integer w. */
  def ssspSql(edgesSql: String, sourceSql: String, maxRounds: Int = 6)
      : String =
    s"""WITH RECURSIVE e AS (
       |  SELECT src, dst, min(w) AS w FROM (
       |    SELECT src, dst, w FROM $edgesSql
       |    UNION ALL SELECT dst, src, w FROM $edgesSql)
       |  WHERE src <> dst GROUP BY 1, 2),
       |reach(node, d, hops) AS (
       |  SELECT CAST(($sourceSql) AS BIGINT), CAST(0 AS BIGINT), 0
       |  UNION
       |  SELECT e.dst, r.d + e.w, r.hops + 1
       |  FROM reach r JOIN e ON e.src = r.node
       |  WHERE r.hops < $maxRounds)
       |SELECT node, CAST(min(d) AS BIGINT) AS dist FROM reach
       |GROUP BY 1 ORDER BY node""".stripMargin.replace('\n', ' ')
}
