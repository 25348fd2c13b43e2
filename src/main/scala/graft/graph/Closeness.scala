package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source closeness centrality (g17): for a hash-picked panel
  * of seed nodes, (reached count, distance sum, closeness =
  * n_reached / Σd) — the "how central is this entity" score whose
  * exact all-pairs form is O(V·E) and is therefore always computed
  * for a SAMPLE of sources at scale (the Brandes-sampling idea
  * applied to closeness). Complements g6 (one source, distances out)
  * with a per-source summary over many sources at once.
  *
  * One BFS runs for ALL sources simultaneously over (source, node)
  * composite state: per level the combined frontier joins the edge
  * list once — k sources cost one traversal with k× state, not k
  * traversals — with the usual anti-join against visited,
  * localCheckpoint lineage truncation, and a driver emptiness check
  * (the Bfs/KTruss fixpoint pattern), hop-capped to bound worst-case
  * diameter chains. The DuckDB twin is the g6 recursive-reach shape
  * seeded with every source, collapsed by min distance.
  *
  * Everything is exact integers until the one closeness division
  * (rounded 6 dp, identical tree both engines). A source reaching
  * nothing within the cap is absent from the report in both. */
object Closeness {

  /** The shared multi-source BFS: (s, node, hops) rows for every node
    * reachable from each source within `maxHops` (self at hops 0). */
  private def reachSet(edges: DataFrame, sources: DataFrame,
      maxHops: Int): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"),
        col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint()
    var visited = sources
      .select(col("node").as("s"), col("node"),
        lit(0).as("hops"))
      .localCheckpoint()
    var frontier = visited
    var hop = 0
    while (hop < maxHops && !frontier.isEmpty) {
      hop += 1
      frontier = sym
        .join(frontier.select(col("s"), col("node").as("src")), "src")
        .select(col("s"), col("dst").as("node")).distinct()
        .join(visited.select(col("s"), col("node")),
          Seq("s", "node"), "left_anti")
        .withColumn("hops", lit(hop))
        .localCheckpoint()
      visited = visited.unionAll(frontier).localCheckpoint()
    }
    visited
  }

  /** @param sources one `node` column
    * @return (node, n_reached, sum_dist, closeness), self excluded */
  def multiSource(edges: DataFrame, sources: DataFrame,
      maxHops: Int = 10): DataFrame = {
    reachSet(edges, sources, maxHops).filter(col("hops") > 0)
      .groupBy(col("s"))
      .agg(count(lit(1)).as("n_reached"),
        sum(col("hops").cast("long")).as("sum_dist"))
      .select(col("s").as("node"), col("n_reached"), col("sum_dist"),
        expr("round(CAST(n_reached AS DOUBLE) " +
          "/ CAST(sum_dist AS DOUBLE), 6)").as("closeness"))
      .orderBy("node")
  }

  /** Hop-distance distribution + EFFECTIVE DIAMETER (g18) over the
    * same sampled-source BFS: per hop, the number of (source, node)
    * pairs at that exact distance, the running cumulative, and the
    * integer-exact test cum·10 ≥ 9·total marking the 90th-percentile
    * hop — the smallest flagged hop IS the effective diameter
    * (Leskovec & Faloutsos's graph-over-time statistic, computed the
    * only way it ever is at scale: from a source sample). Exact
    * integers throughout except the one rounded cum fraction; the
    * distribution is hop-grained (≤ maxHops rows) no matter the SF. */
  def hopDistribution(edges: DataFrame, sources: DataFrame,
      maxHops: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byHop = reachSet(edges, sources, maxHops)
      .filter(col("hops") > 0)
      .groupBy(col("hops").as("hop"))
      .agg(count(lit(1)).as("n_pairs"))
    val total = byHop.agg(sum(col("n_pairs")).as("tot"))
    byHop
      .withColumn("cum_pairs", sum(col("n_pairs")).over(Window
        .orderBy(col("hop"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(total))
      .select(col("hop").cast("int").as("hop"), col("n_pairs"),
        col("cum_pairs"),
        round(col("cum_pairs").cast("double") /
          col("tot").cast("double"), 6).as("cum_frac"),
        (col("cum_pairs") * 10 >= col("tot") * 9).as("reaches_p90"))
      .orderBy("hop")
  }

  /** DuckDB twin of [[hopDistribution]]: recursive reach, min-d
    * collapse, hop-grain cumulative with the same integer p90 test. */
  def hopDistributionSql(edgesSql: String, sourcesSql: String,
      maxHops: Int = 10): String =
    s"""WITH RECURSIVE e AS (SELECT DISTINCT src, dst FROM
       |  (SELECT src, dst FROM $edgesSql
       |   UNION ALL SELECT dst, src FROM $edgesSql) WHERE src <> dst),
       |srcs AS (SELECT node AS s FROM $sourcesSql),
       |reach(s, node, d) AS (
       |  SELECT s, s, 0 FROM srcs
       |  UNION
       |  SELECT r.s, e.dst, r.d + 1 FROM reach r JOIN e ON e.src = r.node
       |  WHERE r.d < $maxHops),
       |md AS (SELECT s, node, min(d) AS d FROM reach GROUP BY 1, 2),
       |bh AS (SELECT d AS hop, CAST(count(*) AS BIGINT) AS n_pairs
       |  FROM md WHERE d > 0 GROUP BY 1),
       |cm AS (SELECT hop, n_pairs,
       |    CAST(sum(n_pairs) OVER (ORDER BY hop) AS BIGINT) AS cum_pairs
       |  FROM bh),
       |t AS (SELECT CAST(sum(n_pairs) AS BIGINT) AS tot FROM bh)
       |SELECT CAST(hop AS INT) AS hop, n_pairs, cum_pairs,
       |  round(CAST(cum_pairs AS DOUBLE) / CAST(tot AS DOUBLE), 6)
       |    AS cum_frac,
       |  cum_pairs * 10 >= tot * 9 AS reaches_p90
       |FROM cm CROSS JOIN t ORDER BY hop"""
      .stripMargin.replace('\n', ' ')

  /** DuckDB twin: recursive multi-source reach, min-d collapse. */
  def multiSourceSql(edgesSql: String, sourcesSql: String,
      maxHops: Int = 10): String =
    s"""WITH RECURSIVE e AS (SELECT DISTINCT src, dst FROM
       |  (SELECT src, dst FROM $edgesSql
       |   UNION ALL SELECT dst, src FROM $edgesSql) WHERE src <> dst),
       |srcs AS (SELECT node AS s FROM $sourcesSql),
       |reach(s, node, d) AS (
       |  SELECT s, s, 0 FROM srcs
       |  UNION
       |  SELECT r.s, e.dst, r.d + 1 FROM reach r JOIN e ON e.src = r.node
       |  WHERE r.d < $maxHops),
       |md AS (SELECT s, node, min(d) AS d FROM reach GROUP BY 1, 2)
       |SELECT s AS node, count(*) AS n_reached,
       |  CAST(sum(d) AS BIGINT) AS sum_dist,
       |  round(CAST(count(*) AS DOUBLE) / CAST(sum(d) AS DOUBLE), 6)
       |    AS closeness
       |FROM md WHERE d > 0 GROUP BY s ORDER BY node"""
      .stripMargin.replace('\n', ' ')
}
