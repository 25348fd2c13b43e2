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
    val sym0 = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionAll(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
      .persist()
    var labels = sym0.select(col("src").as("node")).distinct()
      .withColumn("component", col("node"))
      .localCheckpoint()
    // node-sized label frames join the cached edge list every round;
    // broadcast them under the PageRank threshold guard (guide §3.1 —
    // the planner sees only unsized LogicalRDDs and would sort-merge,
    // re-shuffling the edges per round), and read the edge cache at a
    // size-derived partition count (guide §2.2). Falls back to the
    // identical sort-merge shape when the node set outgrows the budget.
    val fits = PageRank.broadcastFits(sym0.sparkSession, labels.count())
    def side(df: DataFrame): DataFrame = if (fits) broadcast(df) else df
    val sym = PageRank.sized(sym0, PageRank.edgePartitions(sym0.count()))
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
        .join(side(labels.select(col("node").as("dst"),
          col("component"))), "dst")
        .groupBy(col("src").as("node"))
        .agg(min(col("component")).as("nbr_min"))
      val stepped = labels.join(side(viaNeighbors), Seq("node"), "left")
        .select(col("node"),
          least(col("component"), coalesce(col("nbr_min"), col("component")))
            .as("component"))
      // pointer jumping: also adopt the component's OWN current label —
      // halves the distance to the root every round, so convergence is
      // O(log diameter) instead of O(diameter). Without this a 40-node
      // chain silently exhausted maxIter and returned unconverged
      // labels (caught by StarCCSpec's equality check).
      val jump = stepped.select(col("node").as("component"),
        col("component").as("parent_comp"))
      val next = stepped.join(side(jump), Seq("component"), "left")
        .select(col("node"),
          least(col("component"),
            coalesce(col("parent_comp"), col("component")))
            .as("component"))
        .localCheckpoint() // truncate lineage — plan is self-referencing
      val nextSum = sumOf(next)
      // next is materialized (eager checkpoint) — the superseded
      // round's blocks can never be read again; drop them now instead
      // of waiting on a full GC (round-12 driver bench: accumulated
      // checkpoint blocks = 3–48× pass-2 blowups on iterative ops)
      graft.util.Checkpoints.free(labels)
      labels = next
      converged = nextSum == checksum // labels monotone ↓; equal sum = fixpoint
      checksum = nextSum
      iter += 1
    }
    sym0.unpersist()
    labels
  }

  /** Alternating large-star / small-star connected components (Kiveris
    * et al. 2014, "Connected Components in MapReduce and Beyond") — the
    * O(log n)-round formulation [[run]]'s scaladoc points to for web
    * scale. Label propagation needs graph-diameter rounds (a 1M-long
    * chain = 1M rounds); star contraction squares away long paths:
    *
    *  - large-star (per node n, over the symmetrized edges): connect
    *    every STRICTLY LARGER neighbor to m = min(N(n) ∪ {n});
    *  - small-star (per larger endpoint u of the now big→small edges):
    *    connect u and all its smaller neighbors to their minimum.
    *
    * Both rounds keep every edge pointing big→small, monotonically pull
    * nodes toward component minima, and preserve connectivity; the
    * fixpoint is a star forest — the (node, component-min) mapping
    * itself. Each round is one groupBy + one join, hash-partitioned on
    * node id; convergence checks a 3-number checksum (count, Σu, Σv) —
    * edge sets only ever contract toward the fixpoint.
    *
    * Same contract as [[run]]: (node, component = min reachable id). */
  def runStars(edges: DataFrame, maxIter: Int = 30): DataFrame = {
    var e = edges
      .select(greatest(col("id_a"), col("id_b")).as("u"),
        least(col("id_a"), col("id_b")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()
    def checksum(df: DataFrame): (Long, Long, Long) = {
      val r = df.agg(count(lit(1)), sum(col("u")), sum(col("v"))).first()
      (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Long]).getOrElse(0L),
        Option(r.get(2)).map(_.asInstanceOf[Long]).getOrElse(0L))
    }
    var cs = checksum(e)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // large-star over the symmetrized neighborhood of every node
      val sym = e.select(col("u"), col("v"))
        .unionAll(e.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy(col("u")).agg(min(col("v")).as("mn"))
      val large = sym.join(mins, "u")
        .withColumn("m", least(col("mn"), col("u")))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
        // three consumers below (smins + both small-star legs) —
        // materialize once instead of re-running the large-star round
        // per consumer
        .localCheckpoint()
      // small-star over the big→small edges large-star produced
      val smins = large.groupBy(col("u")).agg(min(col("v")).as("m"))
      val small = large.join(smins, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .unionAll(large.join(smins, "u")
          .select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct()
        .localCheckpoint()
      val next = checksum(small)
      // checksum match is a cheap screen; confirm with an exact set
      // compare (runs only on the final round or a freak collision)
      converged = next == cs && small.exceptAll(e).isEmpty
      // small is materialized and the exceptAll above was the last
      // reader of this round's e/large — release both eagerly
      graft.util.Checkpoints.free(large)
      graft.util.Checkpoints.free(e)
      cs = next
      e = small
      iter += 1
    }
    // the fixpoint is a star forest: edges ARE the mapping; roots (and
    // isolated post-contraction minima) map to themselves
    val roots = e.select(col("v").as("node"))
      .distinct()
      .join(e.select(col("u").as("node")), Seq("node"), "left_anti")
      .withColumn("component", col("node"))
    e.select(col("u").as("node"), col("v").as("component"))
      .unionAll(roots)
      .distinct()
  }
}
