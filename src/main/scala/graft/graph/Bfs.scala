package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-source BFS over an undirected edge list. */
object Bfs {

  /** Single-source BFS hop distances, capped at `maxHops`: iterative
    * frontier expansion where each round joins the CURRENT frontier
    * (only newly-reached nodes — not the whole visited set) against the
    * edge list and anti-joins out already-visited nodes. Work per round
    * is proportional to the frontier's edge boundary, the textbook
    * distributed BFS; `localCheckpoint` per round as in the other
    * iterative operators. Distances are exact for every node within
    * `maxHops` of the source. */
  def bfsHops(edges: DataFrame, source: Long, maxHops: Int = 6)
      : DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val sym = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint()
    // guarded broadcast of the node-sized frontier/visited frames +
    // size-derived edge partitioning (guide §3.1/§2.2; one combined
    // stat pass — the approx node count bounds both build sides)
    val fr = sym.agg(count(lit(1)),
      approx_count_distinct(col("src"))).first()
    val symL = PageRank.sized(sym, PageRank.edgePartitions(fr.getLong(0)))
    val fits = PageRank.broadcastFits(sym.sparkSession, fr.getLong(1))
    def side(df: DataFrame): DataFrame = if (fits) broadcast(df) else df
    var visited = Seq((source, 0)).toDF("node", "hops")
      .localCheckpoint()
    var frontier = visited
    var hop = 0
    while (hop < maxHops && !frontier.isEmpty) {
      hop += 1
      val nextFrontier = symL
        .join(side(frontier.select(col("node").as("src"))), "src")
        .select(col("dst").as("node")).distinct()
        .join(side(visited.select(col("node"))), Seq("node"), "left_anti")
        .withColumn("hops", lit(hop))
        .localCheckpoint()
      val nextVisited = visited.unionAll(nextFrontier).localCheckpoint()
      // both successors are materialized — the superseded round's
      // frames are dead; release eagerly (see Checkpoints.free).
      // Round 1: frontier eq visited — double free is a no-op.
      graft.util.Checkpoints.free(frontier)
      graft.util.Checkpoints.free(visited)
      frontier = nextFrontier
      visited = nextVisited
    }
    graft.util.Checkpoints.free(sym)
    if (frontier ne visited) graft.util.Checkpoints.free(frontier)
    visited
  }

  /** DuckDB twin of [[bfsHops]]: recursive reach with a hop cap (the
    * cap bounds the recursion through cycles) collapsed by min(dist). */
  def bfsHopsSql(edgesSql: String, sourceSql: String, maxHops: Int = 6)
      : String =
    s"""WITH RECURSIVE e AS (SELECT DISTINCT src, dst FROM
       |  (SELECT src, dst FROM $edgesSql
       |   UNION ALL SELECT dst, src FROM $edgesSql) WHERE src <> dst),
       |reach(node, d) AS (
       |  SELECT CAST(($sourceSql) AS BIGINT), 0
       |  UNION
       |  SELECT e.dst, r.d + 1 FROM reach r JOIN e ON e.src = r.node
       |  WHERE r.d < $maxHops)
       |SELECT node, CAST(min(d) AS INT) AS hops FROM reach
       |GROUP BY 1 ORDER BY node""".stripMargin.replace('\n', ' ')

}
