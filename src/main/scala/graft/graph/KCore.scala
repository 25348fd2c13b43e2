package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core extraction over an undirected edge list: iteratively peel
  * nodes of degree < k until the fixpoint; what survives is the maximal
  * subgraph where every node keeps ≥ k neighbors — the standard "dense
  * collaboration core" filter (community seeding, spam/bot filtering,
  * graph sparsification before expensive algorithms).
  *
  * Each round is one degree aggregate plus two anti joins against the
  * round's drop list — all hash-partitioned on node id, no global
  * structure. Convergence is a cheap count of dropped nodes; edge
  * frames are `localCheckpoint`ed per round (the CC/PageRank lineage
  * rule — the plan is self-referencing, so without truncation it
  * doubles every round). Termination is guaranteed: the node set
  * strictly shrinks every non-final round, so rounds ≤ |V| (maxIter is
  * a safety valve). At 100 TB the drop list is small after the first
  * round or two and AQE broadcasts the anti joins.
  */
object KCore {

  /** @param edges two numeric-id columns `src`, `dst` (one row per
    *              undirected edge; orientation/duplication irrelevant)
    * @return (node, core_degree) — k-core members with their degree
    *         INSIDE the core (≥ k by construction) */
  def run(edges: DataFrame, k: Int, maxIter: Int = 50): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    // symmetrize + dedupe so degree = count of distinct neighbors
    var sym = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint()
    // the per-round drop list is node-sized: broadcast it into both
    // anti joins under the threshold guard (guide §3.1; bound = approx
    // node count of the INITIAL graph — the peel only shrinks it).
    // symCk stays the raw checkpoint (free() must see the bare
    // LogicalRDD); sym is the size-partitioned view the loop reads.
    var symCk = sym
    val fr = sym.agg(count(lit(1)),
      approx_count_distinct(col("src"))).first()
    sym = PageRank.sized(symCk, PageRank.edgePartitions(fr.getLong(0)))
    val fits = PageRank.broadcastFits(sym.sparkSession, fr.getLong(1))
    def side(df: DataFrame): DataFrame = if (fits) broadcast(df) else df
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val drop = sym.groupBy(col("src"))
        .agg(count(lit(1)).as("deg"))
        .filter(col("deg") < k)
        .select(col("src").as("bad"))
        .localCheckpoint()
      if (drop.isEmpty) {
        converged = true
        graft.util.Checkpoints.free(drop)
      } else {
        // anti joins emit no right-side columns, so each join's probe
        // column resolves unambiguously by name
        val dropDst = drop.select(col("bad").as("bad_dst"))
        val peeled = sym
          .join(side(drop), col("src") === col("bad"), "left_anti")
          .join(side(dropDst), col("dst") === col("bad_dst"), "left_anti")
          .localCheckpoint()
        // peeled is materialized — the pre-peel graph and the drop
        // list are dead; release eagerly (see Checkpoints.free)
        graft.util.Checkpoints.free(symCk)
        graft.util.Checkpoints.free(drop)
        symCk = peeled
        sym = peeled
        iter += 1
      }
    }
    sym.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("core_degree"))
  }

  /** DuckDB twin: `rounds` peel rounds statically unrolled as chained
    * CTEs (recursive CTEs cannot aggregate over the recursive relation,
    * so the loop unrolls instead). Peeling a fixpoint is the identity,
    * so any rounds beyond convergence are no-ops — the twin equals
    * [[run]] whenever the engine converges within `rounds`. */
  def kcoreSql(edgesSql: String, k: Int, rounds: Int = 16): String = {
    val sb = new StringBuilder
    // MATERIALIZED is load-bearing: each round references the previous
    // one three times, so inlining would expand the plan 3^rounds-fold
    sb ++= s"WITH e0 AS MATERIALIZED (SELECT DISTINCT src, dst FROM " +
      s"(SELECT src, dst FROM $edgesSql " +
      s"UNION ALL SELECT dst, src FROM $edgesSql) WHERE src <> dst)"
    for (r <- 1 to rounds) {
      sb ++= s", d${r - 1} AS MATERIALIZED (SELECT src AS bad " +
        s"FROM e${r - 1} GROUP BY 1 HAVING count(*) < $k)"
      sb ++= s", e$r AS MATERIALIZED (SELECT src, dst FROM e${r - 1} " +
        s"WHERE src NOT IN (SELECT bad FROM d${r - 1}) " +
        s"AND dst NOT IN (SELECT bad FROM d${r - 1}))"
    }
    sb ++= s" SELECT src AS node, count(*) AS core_degree " +
      s"FROM e$rounds GROUP BY 1 ORDER BY node"
    sb.toString
  }
}
