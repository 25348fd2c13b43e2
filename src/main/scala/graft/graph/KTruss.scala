package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-truss extraction: the maximal subgraph in which every edge is
  * supported by at least k−2 triangles — the edge-grained cousin of
  * k-core (g3), and the standard community-backbone filter (an edge in
  * many triangles is intra-community; bridges have support 0). */
object KTruss {

  /** Iterative edge peel: each round counts per-edge triangle support
    * through the SAME degree-ordered O(|E|^1.5) enumeration as triangle
    * counting (each closed triangle credits its three edges — never a
    * per-edge neighborhood intersection), drops edges below k−2, and
    * repeats until the edge set stops shrinking. Dropping an edge can
    * only reduce other edges' support, so the edge set strictly shrinks
    * until the fixpoint — rounds are bounded by |E| and in practice a
    * handful; `localCheckpoint` truncates the per-round lineage. The
    * DuckDB twin statically unrolls the peel (peeling a fixpoint is the
    * identity, the g3 contract). */
  def run(edges: DataFrame, k: Int, maxRounds: Int = 20): DataFrame = {
    require(k >= 3, s"k must be >= 3: $k")
    var und = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct().localCheckpoint()
    var n = und.count()
    var round = 0
    var converged = n == 0L
    while (!converged && round < maxRounds) {
      round += 1
      val sup = edgeSupport(und)
      val kept = und.join(sup, Seq("a", "b"), "left")
        .filter(coalesce(col("support"), lit(0L)) >= k - 2)
        .select(col("a"), col("b")).localCheckpoint()
      val m = kept.count()
      converged = m == n
      n = m
      und = kept
    }
    und
  }

  /** Per-edge triangle support from one oriented enumeration. */
  private def edgeSupport(und: DataFrame): DataFrame = {
    val (_, _, closed) = Triangles.closedTriangles(
      und.select(col("a").as("src"), col("b").as("dst")))
    closed.select(explode(array(
        struct(least(col("u"), col("v1")).as("a"),
          greatest(col("u"), col("v1")).as("b")),
        struct(least(col("u"), col("v2")).as("a"),
          greatest(col("u"), col("v2")).as("b")),
        struct(least(col("v1"), col("v2")).as("a"),
          greatest(col("v1"), col("v2")).as("b")))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("support"))
  }

  /** DuckDB twin of [[run]]: `rounds` peel rounds statically unrolled
    * (MATERIALIZED per round — each is referenced three times). Choose
    * `rounds` ≥ the empirical convergence round count; extra rounds are
    * no-ops. `edgesSql` yields (src, dst). */
  def kTrussSql(edgesSql: String, k: Int, rounds: Int): String = {
    val steps = (1 to rounds).map { t =>
      val p = t - 1
      s"""sup$t AS MATERIALIZED (SELECT e.a, e.b, count(*) AS sup
         |  FROM e$p e
         |  JOIN sym$p s1 ON s1.src = e.a
         |  JOIN sym$p s2 ON s2.src = e.b AND s2.dst = s1.dst
         |  GROUP BY 1, 2),
         |e$t AS MATERIALIZED (SELECT e.a, e.b FROM e$p e
         |  LEFT JOIN sup$t s ON s.a = e.a AND s.b = e.b
         |  WHERE coalesce(s.sup, 0) >= ${k - 2}),
         |sym$t AS MATERIALIZED (SELECT a AS src, b AS dst FROM e$t
         |  UNION ALL SELECT b, a FROM e$t)""".stripMargin
    }
    s"""WITH e0 AS MATERIALIZED (
       |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       |  FROM $edgesSql WHERE src <> dst),
       |sym0 AS MATERIALIZED (SELECT a AS src, b AS dst FROM e0
       |  UNION ALL SELECT b, a FROM e0),
       |${steps.mkString(", ")}
       |SELECT a, b FROM e$rounds ORDER BY a, b"""
      .stripMargin.replace('\n', ' ')
  }
}
