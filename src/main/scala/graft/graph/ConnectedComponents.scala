package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the clustering
  * step that turns near-duplicate PAIRS (MinHash/SimHash/Jaccard output,
  * SURVEY.md §8 north-star rows) into dedup CLUSTERS, so one canonical
  * document per component survives.
  *
  * Algorithm: iterative min-label propagation. Every node starts labeled
  * with itself; each round joins labels across edges and keeps the
  * minimum seen; a fixpoint is reached within graph-diameter rounds.
  * Near-dup graphs are forests of tiny cliques (diameter ≲ 3), so the
  * loop converges in a handful of rounds.
  *
  * Scale notes: each round is one shuffle join on `dst` plus a groupBy on
  * `src` — both hash-partitioned on node id; convergence is checked with
  * a cheap scalar aggregate (sum of labels strictly decreases until the
  * fixpoint — labels only ever move down). Each round's label frame is
  * `localCheckpoint`ed: the next plan references labels TWICE, so without
  * lineage truncation the logical plan doubles per round (exponential
  * analysis time well before data size matters). On a multi-executor
  * cluster prefer `spark.sparkContext.setCheckpointDir` + `.checkpoint()`
  * for fault-tolerant truncation. At web scale swap the propagation loop
  * for the alternating large-star/small-star formulation (Kiveris et
  * al., "Connected Components in MapReduce and Beyond") — same
  * primitives, fewer rounds.
  */
object ConnectedComponents {

  /** @param edges two numeric-id columns `id_a`, `id_b` (one row per
    *              undirected edge; orientation/duplication irrelevant)
    * @return (node, component) — component = min node id reachable */
  def run(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val sym = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionAll(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
      .persist()
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("component", col("node"))
      .localCheckpoint()
    // sum() over zero rows is a null cell — Option-guard so an empty edge
    // list returns the empty labels frame instead of an NPE
    def sumOf(df: DataFrame): Long =
      Option(df.agg(sum(col("component"))).first().get(0))
        .map(_.asInstanceOf[Long]).getOrElse(0L)
    var checksum = sumOf(labels)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val viaNeighbors = sym
        .join(labels.select(col("node").as("dst"), col("component")), "dst")
        .groupBy(col("src").as("node"))
        .agg(min(col("component")).as("nbr_min"))
      val next = labels.join(viaNeighbors, Seq("node"), "left")
        .select(col("node"),
          least(col("component"), coalesce(col("nbr_min"), col("component")))
            .as("component"))
        .localCheckpoint() // truncate lineage — plan is self-referencing
      val nextSum = sumOf(next)
      labels = next
      converged = nextSum == checksum // labels monotone ↓; equal sum = fixpoint
      checksum = nextSum
      iter += 1
    }
    sym.unpersist()
    labels
  }
}
