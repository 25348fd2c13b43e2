package graft.graph

import org.apache.spark.sql.{functions, DataFrame}
import org.apache.spark.sql.functions._

/** Exact triangle counting — the clustering / community-density
  * primitive (and the third graph operator next to connected components
  * and PageRank).
  *
  * Scale design: the naive three-way self-join enumerates every wedge at
  * every node — a single hub with degree d contributes d² wedge rows, so
  * a power-law graph explodes quadratically at its hubs. The standard
  * fix (degree-ordered orientation): orient each undirected edge from
  * its lower-(degree, id) endpoint to the higher one. The result is a
  * DAG where every node's OUT-degree is O(√|E|) on any graph, wedges are
  * generated only at each triangle's minimum vertex, and the total wedge
  * count drops to O(|E|^1.5) worst-case — the optimal bound for exact
  * counting. All joins are plain hash equi-joins on node ids; nothing
  * ever broadcasts a data-proportional table.
  */
object Triangles {

  /** Count triangles in an undirected graph given as (src, dst) pairs
    * (self-loops dropped, duplicates and direction collapsed). Returns
    * one row: (n_nodes, n_edges, n_triangles). */
  def count(edges: DataFrame): DataFrame = {
    val und = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val deg = und.select(explode(array(col("a"), col("b"))).as("n"))
      .groupBy(col("n")).agg(functions.count(lit(1)).as("deg"))
    val withDeg = und
      .join(deg.select(col("n").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("deg").as("db")), "b")
    // orient low → high in (degree, id) order: a DAG whose max
    // out-degree is O(√|E|)
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("u"),
      when(aFirst, col("b")).otherwise(col("a")).as("v"))
    // wedges at each triangle's minimum-order vertex, closed against the
    // undirected edge set (left_semi: the closing edge's own wedge is
    // generated elsewhere exactly once)
    val wedges = oriented.select(col("u"), col("v").as("v1"))
      .join(oriented.select(col("u"), col("v").as("v2")), "u")
      .filter(col("v1") < col("v2"))
    // v1 < v2 and und is canonical a < b, so the closing probe is a
    // plain two-column equi-join
    val closed = wedges.join(und,
      col("a") === col("v1") && col("b") === col("v2"), "left_semi")
    val nNodes = deg.agg(functions.count(lit(1)).as("n_nodes"))
    val nEdges = und.agg(functions.count(lit(1)).as("n_edges"))
    closed.agg(functions.count(lit(1)).as("n_triangles"))
      .crossJoin(broadcast(nNodes))
      .crossJoin(broadcast(nEdges))
      .select(col("n_nodes"), col("n_edges"), col("n_triangles"))
  }
}
