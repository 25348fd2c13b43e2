package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-truss extraction: the maximal subgraph in which every edge is
  * supported by at least k−2 triangles — the edge-grained cousin of
  * k-core (g3), and the standard community-backbone filter (an edge in
  * many triangles is intra-community; bridges have support 0). */
object KTruss {

  /** Iterative edge peel with HYBRID support maintenance. Every round
    * drops edges below k−2 support; the next round's supports come from
    * one of two equivalent computations, chosen by drop size:
    *
    *  - big drop (early rounds, where most of the graph peels away):
    *    full degree-ordered O(|E|^1.5) re-enumeration on the SMALLER
    *    kept graph — re-counting what survived is cheaper than
    *    enumerating the neighborhoods of everything that died;
    *  - small drop (the convergence tail): INCREMENTAL decrement — only
    *    triangles that contained a just-dropped edge are enumerated
    *    (dropped-edge × old adjacency, deduped on the node triple so a
    *    triangle losing two edges at once still decrements its survivor
    *    exactly once) and subtracted from kept supports. A tail round
    *    then costs O(dropped-edge neighborhoods) instead of a full
    *    recount.
    *
    * Both branches yield the same supports (a kept edge's old triangles
    * minus those touching a dropped edge ARE its triangles in the kept
    * graph), so the fixpoint — and the DuckDB twin, which statically
    * unrolls full recounts (peeling a fixpoint is the identity, the g3
    * contract) — is unchanged. Dropping an edge only reduces other
    * supports, so the edge set strictly shrinks; `localCheckpoint`
    * truncates per-round lineage. */
  def run(edges: DataFrame, k: Int, maxRounds: Int = 20): DataFrame = {
    require(k >= 3, s"k must be >= 3: $k")
    val und = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct().localCheckpoint()
    var n = und.count()
    if (n == 0L) return und
    def fullSupport(e: DataFrame): DataFrame =
      e.join(edgeSupport(e), Seq("a", "b"), "left")
        .select(col("a"), col("b"),
          coalesce(col("support"), lit(0L)).as("support"))
        .localCheckpoint()
    var withSup = fullSupport(und)
    graft.util.Checkpoints.free(und) // folded into the support frame
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      round += 1
      val kept = withSup.filter(col("support") >= k - 2).localCheckpoint()
      val m = kept.count()
      if (m == n) {
        converged = true
        // the loop's last withSup stays — it backs the returned filter;
        // this kept duplicates it and is dead
        graft.util.Checkpoints.free(kept)
      } else if ((n - m) * 4 > m) {
        // big drop: recount on the kept graph
        val next = fullSupport(kept.select(col("a"), col("b")))
        // next is materialized — pre-drop graph + kept are dead
        graft.util.Checkpoints.free(withSup)
        graft.util.Checkpoints.free(kept)
        withSup = next
        n = m
      } else {
        val dropped = withSup.filter(col("support") < k - 2)
          .select(col("a"), col("b"))
        // triangles of the PRE-drop graph containing >=1 dropped edge:
        // dropped (a,b) + common neighbor c over the old adjacency
        val sym = withSup
          .select(col("a").as("src"), col("b").as("dst"))
          .unionAll(withSup.select(col("b").as("src"), col("a").as("dst")))
        val tri = dropped
          .join(sym.select(col("src").as("a"), col("dst").as("c")),
            Seq("a"))
          .join(sym.select(col("src").as("b"), col("dst").as("c")),
            Seq("b", "c"))
          .select(array_sort(array(col("a"), col("b"), col("c")))
            .as("t"))
          .distinct()
          .select(element_at(col("t"), 1).as("x"),
            element_at(col("t"), 2).as("y"),
            element_at(col("t"), 3).as("z"))
        val dec = tri.select(explode(array(
            struct(col("x").as("a"), col("y").as("b")),
            struct(col("x").as("a"), col("z").as("b")),
            struct(col("y").as("a"), col("z").as("b")))).as("e"))
          .select(col("e.a").as("a"), col("e.b").as("b"))
          .groupBy(col("a"), col("b"))
          .agg(count(lit(1)).as("dec"))
        val next = kept.join(dec, Seq("a", "b"), "left")
          .select(col("a"), col("b"),
            (col("support") - coalesce(col("dec"), lit(0L)))
              .as("support"))
          .localCheckpoint()
        // next is materialized — pre-drop graph + kept are dead
        graft.util.Checkpoints.free(withSup)
        graft.util.Checkpoints.free(kept)
        withSup = next
        n = m
      }
    }
    withSup.filter(col("support") >= k - 2).select(col("a"), col("b"))
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
