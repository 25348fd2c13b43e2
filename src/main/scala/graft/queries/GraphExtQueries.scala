package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.PipelineQueries.{eventsTs, eventsUs, gold, table, withPipeline}
import graft.queries.ExtendedQueries.sessionize
import graft.text.TextAnalysis

/** Graph operator family: PageRank/HITS, components, triangles,
  * k-core/k-truss, BFS closeness/diameter, label propagation, link
  * prediction, modularity, conductance, feature propagation.
  *
  * Mechanically split out of ExtendedQueries (round 8, VERDICT ask #8)
  * — query keys and bodies unchanged; [[ExtendedQueries]] aggregates
  * the family maps so the driver contract is untouched. */
object GraphExtQueries {

  /** The g17h/g18h bipartite workload on an EIGHTH of the CUSTOMERS
    * (all suppliers stay — they are the hubs, so the diameter and hop
    * structure are unchanged). HyperBall's per-hop cost is the honest
    * nodes·m register state + |E|·m union volume; the customer cut
    * shrinks both ~8×, and the bench override below additionally runs
    * the m=16 register panel (4× less state again, same algorithm) —
    * round-12's driver bench spent 27.5 s of minima on these two
    * estimators alone and never reached its re-run phase. */
  private def hyperballBenchEdges(s: SparkSession,
      d: String): DataFrame =
    table(s, d, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(table(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .filter(col("o_custkey") % 8 === 0),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("l_suppkey") * 2).as("src"),
        (col("o_custkey") * 2 + 1).as("dst"))

  /** Bench-scoped workload substitutions (see SparkEntry
    * .benchOverrides); Verify never reads these and Bench records
    * every substitution. g12: the SAME k-truss peel over the same
    * co-occurrence construction from a smaller planted slice
    * (l_quantity ≥ 48 instead of ≥ 45 ⇒ ~4× fewer edges), so the
    * iterative support peel's steady shape is timed instead of the
    * full fixture re-enumeration. */
  val benchOverrides: Map[String, (SparkSession, String) => DataFrame] =
    Map(
      "g12_ktruss" -> ((s, d) => {
        val sl = table(s, d, "lineitem")
          .filter(col("l_quantity") >= 48)
          .select(col("l_orderkey"), col("l_suppkey")).distinct()
        val edges = sl.alias("x")
          .join(sl.alias("y"),
            col("x.l_orderkey") === col("y.l_orderkey") &&
              col("x.l_suppkey") < col("y.l_suppkey"))
          .select(col("x.l_suppkey").as("src"),
            col("y.l_suppkey").as("dst"))
        graft.graph.KTruss.run(edges, k = 4).orderBy("a", "b")
      }),
      "g17h_closeness_hll" -> ((s, d) =>
        graft.graph.HyperBall.closeness(hyperballBenchEdges(s, d),
          m = 16)),
      "g18h_diameter_hll" -> ((s, d) =>
        graft.graph.HyperBall.hopDistribution(hyperballBenchEdges(s, d),
          m = 16)))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // damped PageRank (exact integer fixed-point, 5 iterations) over the
    // bipartite supplier↔customer graph induced by orders — the second
    // iterative graph operator next to connected components
    "g1_pagerank" -> ((s, d) => {
      import graft.graph.PageRank
      // numeric node ids (even = supplier·2, odd = customer·2+1): long
      // shuffle keys, not concat'd strings. Dedup the HALF-size pair
      // set; the two directions are disjoint (even→odd vs odd→even) so
      // the union stays distinct — run() skips its dedup shuffle
      val pairs = table(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
        .join(table(s, d, "orders")
          .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("l_suppkey") * 2).as("s_node"),
          (col("o_custkey") * 2 + 1).as("c_node"))
        .distinct()
      val edges = pairs
        .select(col("s_node").as("src"), col("c_node").as("dst"))
        .unionAll(pairs
          .select(col("c_node").as("src"), col("s_node").as("dst")))
      // supplier+customer node set is dimension-sized → ranks broadcast;
      // the cached edge table never re-shuffles across iterations. The
      // doubled bipartite edge set is symmetric: node set = outdeg keys,
      // no per-iteration join back to the node list
      PageRank.run(edges, iters = 5, broadcastRanks = true,
        assumeDistinct = true, symmetric = true)
        .orderBy("node")
    }),
    // TWO-HOP NEIGHBOR FEATURE AGGREGATION (g20): the GraphSAGE-style
    // message-passing feature prep — each node's mean neighbor
    // account balance and mean neighbor-of-neighbor summary over the
    // g1 bipartite supplier↔customer graph. Two edge joins + two
    // partial aggregates on node-id shuffle keys; means are integer
    // fixed-point micro-cent units (div truncation parity with the
    // oracle's HUGEINT //), hop-2 sums DECIMAL-widened before summing
    "g20_feature_prop" -> ((s, d) => {
      val pairs = table(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
        .join(table(s, d, "orders")
          .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("l_suppkey") * 2).as("s_node"),
          (col("o_custkey") * 2 + 1).as("c_node"))
        .distinct()
      val edges = pairs
        .select(col("s_node").as("src"), col("c_node").as("dst"))
        .unionAll(pairs
          .select(col("c_node").as("src"), col("s_node").as("dst")))
      val feats = table(s, d, "supplier")
        .select((col("s_suppkey") * 2).as("node"),
          expr("CAST(round(s_acctbal * 100) AS BIGINT)").as("f"))
        .unionAll(table(s, d, "customer")
          .select((col("c_custkey") * 2 + 1).as("node"),
            expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("f")))
      graft.graph.FeatureProp.twoHopMeans(edges, feats)
        .orderBy("node")
    }),
    // PERSONALIZED PageRank over the same bipartite graph: teleport
    // restarts at the nation<5 supplier seeds, so rank = proximity to
    // that seed set (the related-items / trust-propagation primitive),
    // not global importance. Same integer fixed-point; rank-0 nodes
    // skip the contribution join until mass reaches them
    "g14_personalized_pagerank" -> ((s, d) => {
      import graft.graph.PageRank
      val pairs = table(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
        .join(table(s, d, "orders")
          .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("l_suppkey") * 2).as("s_node"),
          (col("o_custkey") * 2 + 1).as("c_node"))
        .distinct()
      val edges = pairs
        .select(col("s_node").as("src"), col("c_node").as("dst"))
        .unionAll(pairs
          .select(col("c_node").as("src"), col("s_node").as("dst")))
      val seeds = table(s, d, "supplier")
        .filter(col("s_nationkey") < 5)
        .select((col("s_suppkey") * 2).as("node"))
      PageRank.personalized(edges, seeds, iters = 5,
        broadcastRanks = true, assumeDistinct = true, symmetric = true)
        .orderBy("node")
    }),
    // MULTI-SOURCE closeness centrality (g17): how central is each
    // seed — one BFS for ALL hash-picked sources over (source, node)
    // composite state (k sources = one traversal with kx state, the
    // sampled-closeness shape exact all-pairs can't afford); exact
    // integer counts, one rounded division
    // HOP-DISTANCE DISTRIBUTION + effective diameter (g18): the same
    // sampled-source BFS as g17, summarized per hop — n_pairs / cum /
    // fraction, with the integer cum·10 ≥ 9·total test whose smallest
    // true hop is the effective diameter. Hop-grained output (≤ cap
    // rows) at any SF.
    "g18_effective_diameter" -> ((s, d) => {
      val pairs = table(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
        .join(table(s, d, "orders")
          .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("l_suppkey") * 2).as("src"),
          (col("o_custkey") * 2 + 1).as("dst"))
      val sources = table(s, d, "supplier")
        .filter(col("s_suppkey") % 25 === 3)
        .select((col("s_suppkey") * 2).as("node"))
      graft.graph.Closeness.hopDistribution(pairs, sources)
    }),
    // HYPERBALL closeness (g17h): the HLL-register form of the g17
    // bitset BFS — EVERY node's ball sizes from one node-grain sketch
    // state, no source panel at all (the k ≫ 64 scale path; Boldi &
    // Vigna 2013). Estimator output ⇒ rows-only by design;
    // HyperBallSpec pins accuracy against the exact bitset BFS
    "g17h_closeness_hll" -> ((s, d) => {
      val pairs = table(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
        .join(table(s, d, "orders")
          .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("l_suppkey") * 2).as("src"),
          (col("o_custkey") * 2 + 1).as("dst"))
      graft.graph.HyperBall.closeness(pairs)
    }),
    // HYPERBALL neighborhood function + effective diameter (g18h):
    // g18's statistic over ALL source nodes via HLL sketches —
    // the true ANF. Rows-only (estimator); spec-pinned vs exact
    "g18h_diameter_hll" -> ((s, d) => {
      val pairs = table(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
        .join(table(s, d, "orders")
          .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("l_suppkey") * 2).as("src"),
          (col("o_custkey") * 2 + 1).as("dst"))
      graft.graph.HyperBall.hopDistribution(pairs)
    }),
    // PORTABLE HyperBall register state (g17hp ★): the exact-integer
    // (node, idx, rho) registers at hop 2, m = 16, over the same
    // bipartite graph — the md5₄₈ register hash is engine-portable,
    // so the oracle replays B(v, ≤2) with two unrolled self-joins and
    // takes the identical per-(node, idx) max. Upgrades the HLL
    // estimator family from rows-only to hash-checked: the registers
    // ARE the estimator's entire state.
    "g17hp_registers_portable" -> ((s, d) => {
      val pairs = table(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
        .join(table(s, d, "orders")
          .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("l_suppkey") * 2).as("src"),
          (col("o_custkey") * 2 + 1).as("dst"))
      graft.graph.HyperBall.registerTable(pairs, hops = 2, m = 16)
    }),
    // PORTABLE HyperBall sufficient statistics (g18hp ★): per-node,
    // per-hop integer zsum_scaled = Σ_slots 2^(49−rho) and nreg for
    // hops 0..2 — the double estimate is the pure function
    // α·m²·2^49 / zsum_scaled of these integers, so hash-checking
    // them checks everything the g18h estimate depends on without a
    // double crossing the engine boundary
    "g18hp_ballsums_portable" -> ((s, d) => {
      val pairs = table(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
        .join(table(s, d, "orders")
          .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("l_suppkey") * 2).as("src"),
          (col("o_custkey") * 2 + 1).as("dst"))
      graft.graph.HyperBall.ballSums(pairs, maxHops = 2, m = 16)
    }),
    // DEGREE DISTRIBUTION summary + Hill tail exponent (g19): the
    // graph-shape statistic that decides every downstream algorithm
    // choice (skew-aware joins, degree-ordered triangle counting,
    // hub sampling) — node/edge counts, degree extremes, and the MLE
    // power-law alpha = 1 + n'/Σ ln(dᵢ/dmin) over the tail dᵢ ≥ dmin
    // (Clauset-Shalizi-Newman form, dmin = 2 fixed). One edge-list
    // aggregate to the degree grain; ln terms are 6dp-rounded
    // decimal-summed doubles of exact integer ratios; alpha NULL when
    // the tail is empty or all at dmin (no ε).
    // RICH-CLUB COEFFICIENT (g22): phi(k) = 2·E_k / (N_k·(N_k−1))
    // over the nodes of degree > k — do the hubs of the
    // supplier↔customer graph preferentially trade with each other?
    // (Colizza et al. 2006; the structural complement of g11's
    // assortativity scalar.) ONE edge-degree join computes every
    // threshold at once: an undirected edge survives at k iff
    // min(deg_u, deg_v) > k, so the per-k numerators are sums over a
    // degree-bounded histogram — the t34 per-term-min-level trick.
    // The k-spine × histogram joins are literal-row × tiny-table;
    // the corpus-sized work is the degree aggregate and two
    // node-keyed joins. phi in exact e6 via truncating div on
    // non-negative DECIMAL(38,0)/HUGEINT operands (2·E_k·10⁶
    // overflows BIGINT at web-graph scale); NULL when N_k < 2
    // DETERMINISTIC NEIGHBOR SAMPLING (g24): per-node fixed-fanout
    // neighbor sample over the g1 bipartite graph — GraphSAGE-style
    // minibatch construction, where hub nodes must be CUT to a fanout
    // or one supplier's million edges blow the batch. "Random" but
    // reproducible: priority = a fixed odd-multiplier integer mix of
    // (src, dst) both engines compute exactly (change the multiplier
    // to reseed epochs); per-node bottom-3 by (priority, id) rides
    // the x22 typed TopK aggregator — ≤3 items of state per node,
    // map-side combined, NEVER a per-node window sort over hub
    // degrees. Self-contained int64: node·2654435761 < 2⁶³ to ~10¹²
    // nodes
    "g24_neighbor_sampling" -> ((s, d) => {
      import s.implicits._
      import graft.agg.{TopItem, TopK}
      val e = table(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
        .join(table(s, d, "orders")
          .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("l_suppkey") * 2).as("src"),
          (col("o_custkey") * 2 + 1).as("dst"))
        .distinct()
      val both = e.unionAll(
        e.select(col("dst").as("src"), col("src").as("dst")))
      both.select(col("src"),
          expr("(src * 2654435761 + dst * 40503) % 2147483647")
            .as("p"), col("dst"))
        .as[(Long, Long, Long)]
        .groupByKey(_._1)
        // bottom-k by priority = top-k of the negated value
        .mapValues { case (_, p, dst) => TopItem(-p.toDouble, dst) }
        .agg(new TopK(3).toColumn.name("top"))
        .toDF("node", "top")
        .select(col("node"), posexplode(col("top")))
        .select(col("node"), (col("pos") + 1).cast("int").as("slot"),
          col("col.id").as("neighbor"),
          (-col("col.value")).cast("long").as("priority"))
        .orderBy("node", "slot")
    }),
    "g22_rich_club" -> ((s, d) => {
      val pairs = table(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
        .join(table(s, d, "orders")
          .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("l_suppkey") * 2).as("u"),
          (col("o_custkey") * 2 + 1).as("v"))
        .distinct()
      val sym = pairs.select(col("u").as("src"), col("v").as("dst"))
        .unionAll(pairs.select(col("v").as("src"), col("u").as("dst")))
      val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("dg"))
      val edgeHist = pairs
        .join(deg.select(col("src").as("u"), col("dg").as("du")), Seq("u"))
        .join(deg.select(col("src").as("v"), col("dg").as("dv")), Seq("v"))
        .select(least(col("du"), col("dv")).as("min_deg"))
        .groupBy(col("min_deg")).agg(count(lit(1)).as("ecnt"))
      val nodeHist = deg.groupBy(col("dg")).agg(count(lit(1)).as("ncnt"))
      val ks = s.range(1, 13).select(col("id").cast("int").as("k"))
      val nk = ks.join(broadcast(nodeHist), col("dg") > col("k"), "left")
        .groupBy(col("k")).agg(coalesce(sum(col("ncnt")), lit(0L)).as("n_k"))
      val ek = ks.join(broadcast(edgeHist), col("min_deg") > col("k"), "left")
        .groupBy(col("k")).agg(coalesce(sum(col("ecnt")), lit(0L)).as("e_k"))
      nk.join(ek, Seq("k"))
        .select(col("k"), col("n_k"), col("e_k"),
          expr("CASE WHEN n_k >= 2 THEN CAST(" +
            "(2 * CAST(e_k AS DECIMAL(38,0)) * 1000000) div " +
            "(CAST(n_k AS DECIMAL(38,0)) * (n_k - 1)) AS BIGINT) END")
            .as("phi_e6"))
        .orderBy("k")
    }),
    "g19_degree_stats" -> ((s, d) => {
      val pairs = table(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
        .join(table(s, d, "orders")
          .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("l_suppkey") * 2).as("src"),
          (col("o_custkey") * 2 + 1).as("dst"))
      val sym = pairs.select(col("src"), col("dst"))
        .unionAll(pairs.select(col("dst").as("src"),
          col("src").as("dst")))
        .filter(col("src") =!= col("dst"))
        .distinct()
      val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("dg"))
      deg.agg(
          count(lit(1)).as("n_nodes"),
          sum(col("dg")).as("sum_deg"),
          min(col("dg")).as("min_deg"),
          max(col("dg")).as("max_deg"),
          sum(when(col("dg") >= 2, 1L).otherwise(0L)).as("n_tail"),
          sum(when(col("dg") >= 2,
            round(log(col("dg").cast("double") / lit(2.0)), 6)
              .cast("decimal(38,6)"))).as("lnsum"))
        .select(col("n_nodes"), expr("sum_deg div 2").as("n_edges"),
          col("min_deg"), col("max_deg"), col("n_tail"),
          when(col("lnsum") > 0, round(lit(1.0) +
            col("n_tail").cast("double") /
              col("lnsum").cast("double"), 6)).as("alpha"))
    }),
    "g17_closeness" -> ((s, d) => {
      val pairs = table(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
        .join(table(s, d, "orders")
          .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("l_suppkey") * 2).as("src"),
          (col("o_custkey") * 2 + 1).as("dst"))
      val sources = table(s, d, "supplier")
        .filter(col("s_suppkey") % 25 === 3)
        .select((col("s_suppkey") * 2).as("node"))
      graft.graph.Closeness.multiSource(pairs, sources)
    }),
    // MAXIMAL INDEPENDENT SET (g16): Luby-style with FIXED md5
    // priorities — node joins when it is the priority local minimum
    // among undecided neighbors, neighbors drop out, fixpoint. The
    // symmetry-breaking primitive (conflict-free scheduling, exemplar
    // picking); fixed priorities = the canonical greedy MIS, so the
    // oracle unrolls the identical rounds
    "g16_mis" -> ((s, d) => {
      val pairs = table(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
        .join(table(s, d, "orders")
          .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("l_suppkey") * 2).as("src"),
          (col("o_custkey") * 2 + 1).as("dst"))
      graft.graph.Mis.run(pairs)
    }),
    // DETERMINISTIC random walks (g15): the node2vec/DeepWalk corpus
    // generator at p=q=1 over the g1 bipartite graph — one 4-step
    // walk per supplier node, each step a hash-picked neighbor
    // (md5_48(walk|step|node) mod outdeg over the dst-ranked
    // adjacency). RNG-free; the oracle replays identical choices
    "g15_random_walks" -> ((s, d) => {
      val pairs = table(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
        .join(table(s, d, "orders")
          .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("l_suppkey") * 2).as("s_node"),
          (col("o_custkey") * 2 + 1).as("c_node"))
        .distinct()
      val edges = pairs
        .select(col("s_node").as("src"), col("c_node").as("dst"))
        .unionAll(pairs
          .select(col("c_node").as("src"), col("s_node").as("dst")))
      val starts = table(s, d, "supplier")
        .select((col("s_suppkey") * 2).as("node"))
      graft.graph.RandomWalks.run(edges, starts, steps = 4)
    }),
    // exact triangle count over the co-supplier graph (suppliers that
    // share an order) via degree-ordered orientation — wedges generated
    // only at each triangle's minimum-order vertex, O(|E|^1.5) total
    "g2_triangle_count" -> ((s, d) => {
      // high-quantity lines only: the unfiltered co-supplier graph is
      // near-complete (every supplier pair shares SOME order), which
      // says nothing and costs |V|³ — the interesting clustering lives
      // in the sparse co-occurrence graph
      val sl = table(s, d, "lineitem")
        .filter(col("l_quantity") >= 45)
        .select(col("l_orderkey"), col("l_suppkey")).distinct()
      val edges = sl.alias("x")
        .join(sl.alias("y"), col("x.l_orderkey") === col("y.l_orderkey") &&
          col("x.l_suppkey") < col("y.l_suppkey"))
        .select(col("x.l_suppkey").as("src"), col("y.l_suppkey").as("dst"))
      graft.graph.Triangles.count(edges)
    }),
    // k-core of the sparse co-supplier graph (g2's edges): iterative
    // degree peel with per-round lineage truncation; the dense
    // collaboration core that survives every peel round
    "g3_kcore" -> ((s, d) => {
      val sl = table(s, d, "lineitem")
        .filter(col("l_quantity") >= 45)
        .select(col("l_orderkey"), col("l_suppkey")).distinct()
      val edges = sl.alias("x")
        .join(sl.alias("y"), col("x.l_orderkey") === col("y.l_orderkey") &&
          col("x.l_suppkey") < col("y.l_suppkey"))
        .select(col("x.l_suppkey").as("src"), col("y.l_suppkey").as("dst"))
      graft.graph.KCore.run(edges, k = 2).orderBy("node")
    }),
    // single-source BFS hop distances (capped): frontier-expansion
    // rounds touch only the frontier's edge boundary; source = the
    // graph's minimum node id (one metadata-sized aggregate)
    // SAMPLED BETWEENNESS (g25): Brandes dependency accumulation for
    // a hash-picked source panel over the g6 co-supplier graph — the
    // bridge/broker score closeness and PageRank don't capture. Exact
    // integer fixed-point (sigma = exact path counts, delta in 1e-6
    // units via truncating div), so the oracle unrolls the identical
    // forward levels + backward sweeps and hash-matches exactly
    "g25_betweenness" -> ((s, d) => {
      val sl = table(s, d, "lineitem")
        .filter(col("l_quantity") >= 45)
        .select(col("l_orderkey"), col("l_suppkey")).distinct()
      val edges = sl.alias("x")
        .join(sl.alias("y"), col("x.l_orderkey") === col("y.l_orderkey") &&
          col("x.l_suppkey") < col("y.l_suppkey"))
        .select(col("x.l_suppkey").as("src"), col("y.l_suppkey").as("dst"))
      val sources = table(s, d, "supplier")
        .filter(col("s_suppkey") % 17 === 3)
        .select(col("s_suppkey").as("node"))
      graft.graph.Betweenness.sampled(edges, sources, maxHops = 4)
    }),
    "g6_bfs_hops" -> ((s, d) => {
      val sl = table(s, d, "lineitem")
        .filter(col("l_quantity") >= 45)
        .select(col("l_orderkey"), col("l_suppkey")).distinct()
      val edges = sl.alias("x")
        .join(sl.alias("y"), col("x.l_orderkey") === col("y.l_orderkey") &&
          col("x.l_suppkey") < col("y.l_suppkey"))
        .select(col("x.l_suppkey").as("src"), col("y.l_suppkey").as("dst"))
        .localCheckpoint()
      val source = edges.agg(min(least(col("src"), col("dst"))))
        .first().getLong(0)
      graft.graph.Bfs.bfsHops(edges, source, maxHops = 6).orderBy("node")
    }),
    // single-source weighted shortest paths: Bellman–Ford frontier
    // relaxation over the co-supplier graph, edge weight 4−min(shared
    // orders, 3) ∈ {1,2,3} (stronger ties are shorter); 6 rounds ≡ the
    // oracle's hop-capped recursive min — a deterministic contract,
    // not a convergence gamble (integer weights, exact both engines)
    "g7_sssp" -> ((s, d) => {
      val sl = table(s, d, "lineitem")
        .filter(col("l_quantity") >= 45)
        .select(col("l_orderkey"), col("l_suppkey")).distinct()
      val edges = sl.alias("x")
        .join(sl.alias("y"), col("x.l_orderkey") === col("y.l_orderkey") &&
          col("x.l_suppkey") < col("y.l_suppkey"))
        .groupBy(col("x.l_suppkey").as("src"), col("y.l_suppkey").as("dst"))
        .agg(count(lit(1)).as("n_shared"))
        .select(col("src"), col("dst"),
          (lit(4L) - least(col("n_shared"), lit(3L))).as("w"))
        .localCheckpoint()
      val source = edges.agg(min(least(col("src"), col("dst"))))
        .first().getLong(0)
      graft.graph.ShortestPaths.sssp(edges, source, maxRounds = 6)
        .orderBy("node")
    }),
    // link prediction by Adamic–Adar over the co-ordered-parts graph
    // (the co-supplier graph is pure order-cliques at the smallest SF —
    // zero non-adjacent 2-hop pairs): which parts never yet co-ordered
    // are most likely to be? Hub centers above deg 50 are excluded
    // (the wedge-fanout cap, part of the operator contract)
    "g8_link_prediction" -> ((s, d) => {
      val lp = table(s, d, "lineitem")
        .filter(col("l_quantity") >= 45)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val edges = lp.alias("x")
        .join(lp.alias("y"), col("x.l_orderkey") === col("y.l_orderkey") &&
          col("x.l_partkey") < col("y.l_partkey"))
        .select(col("x.l_partkey").as("src"), col("y.l_partkey").as("dst"))
      graft.graph.LinkPrediction.adamicAdar(edges, topN = 25,
        maxDegree = 50)
    }),
    // degree assortativity of the co-supplier graph: Pearson over the
    // (deg(u), deg(v)) pairs of every directed edge (both orientations
    // — the standard undirected convention). Same decimal-moment
    // correlation as x51; degrees are small integers so every sum
    // stays in the exact-conversion budget
    "g11_assortativity" -> ((s, d) => {
      def d6(c: org.apache.spark.sql.Column) = c.cast("decimal(24,6)")
      val sl = table(s, d, "lineitem")
        .filter(col("l_quantity") >= 45)
        .select(col("l_orderkey"), col("l_suppkey")).distinct()
      val pairs = sl.alias("x")
        .join(sl.alias("y"), col("x.l_orderkey") === col("y.l_orderkey") &&
          col("x.l_suppkey") < col("y.l_suppkey"))
        .select(col("x.l_suppkey").as("a"), col("y.l_suppkey").as("b"))
        .distinct()
      val sym = pairs.select(col("a").as("src"), col("b").as("dst"))
        .unionAll(pairs.select(col("b").as("src"), col("a").as("dst")))
      val deg = sym.groupBy(col("src").as("nd"))
        .agg(count(lit(1)).as("deg"))
      val x = col("du").cast("double")
      val y = col("dv").cast("double")
      val vx = col("n").cast("double") * col("sxx").cast("double") -
        col("sx").cast("double") * col("sx").cast("double")
      val vy = col("n").cast("double") * col("syy").cast("double") -
        col("sy").cast("double") * col("sy").cast("double")
      sym
        .join(deg.select(col("nd").as("src"), col("deg").as("du")), "src")
        .join(deg.select(col("nd").as("dst"), col("deg").as("dv")), "dst")
        .agg(count(lit(1)).as("n"),
          sum(d6(x)).as("sx"), sum(d6(y)).as("sy"),
          sum(d6(x * x)).as("sxx"), sum(d6(y * y)).as("syy"),
          sum(d6(x * y)).as("sxy"))
        .select(col("n"),
          // a degree-regular graph (sf0.001 is one 10-clique) has zero
          // degree variance: assortativity is undefined → NULL, not 0/0
          when(vx > 0 && vy > 0,
            (col("n").cast("double") * col("sxy").cast("double") -
              col("sx").cast("double") * col("sy").cast("double")) /
              (sqrt(vx) * sqrt(vy)))
            .as("assortativity"))
    }),
    // per-node local clustering coefficient over the co-supplier
    // graph: the same degree-ordered O(|E|^1.5) triangle enumeration
    // as g2, each closed triangle crediting its three corners, then
    // cc = 2T/(d(d−1)) as a ratio of identical integer operands
    "g10_clustering_coeff" -> ((s, d) => {
      val sl = table(s, d, "lineitem")
        .filter(col("l_quantity") >= 45)
        .select(col("l_orderkey"), col("l_suppkey")).distinct()
      val edges = sl.alias("x")
        .join(sl.alias("y"), col("x.l_orderkey") === col("y.l_orderkey") &&
          col("x.l_suppkey") < col("y.l_suppkey"))
        .select(col("x.l_suppkey").as("src"), col("y.l_suppkey").as("dst"))
      graft.graph.Triangles.perNodeClustering(edges).orderBy("node")
    }),
    // k-truss backbone (k=4: every edge in ≥2 triangles) of the
    // co-supplier graph — the edge-grained cousin of g3's k-core;
    // per-round support comes from the same degree-ordered triangle
    // enumeration as g2/g10 (each triangle credits its three edges),
    // peel runs to the fixpoint, oracle unrolls 4 rounds (extras no-op)
    "g12_ktruss" -> ((s, d) => {
      val sl = table(s, d, "lineitem")
        .filter(col("l_quantity") >= 45)
        .select(col("l_orderkey"), col("l_suppkey")).distinct()
      val edges = sl.alias("x")
        .join(sl.alias("y"), col("x.l_orderkey") === col("y.l_orderkey") &&
          col("x.l_suppkey") < col("y.l_suppkey"))
        .select(col("x.l_suppkey").as("src"), col("y.l_suppkey").as("dst"))
      graft.graph.KTruss.run(edges, k = 4).orderBy("a", "b")
    }),
    // modularity of the g4 label-propagation communities — the quality
    // score that says whether a partition is BETTER than random, per
    // community and graph-wide (the ROLLUP total row carries Q). All
    // integer algebra (q_num = 4m·in_c − deg_c²) on top of the same
    // 5-round deterministic LPA both engines unroll; see
    // graph/Modularity.scala for the scale shape
    "g13_modularity" -> ((s, d) => {
      val sl = table(s, d, "lineitem")
        .filter(col("l_quantity") >= 50)
        .select(col("l_orderkey"), col("l_suppkey")).distinct()
      val edges = sl.alias("x")
        .join(sl.alias("y"), col("x.l_orderkey") === col("y.l_orderkey") &&
          col("x.l_suppkey") < col("y.l_suppkey"))
        .select(col("x.l_suppkey").as("src"), col("y.l_suppkey").as("dst"))
      val labels = graft.graph.LabelPropagation.run(edges, rounds = 5)
      graft.graph.Modularity.run(edges, labels).orderBy("community")
    }),
    // HITS hubs & authorities over the directed customer→supplier
    // purchase graph: 3 synchronous rounds, max-normalized (not L2 —
    // the per-round reduction stays a plain max, no sqrt of a float
    // sum), scores 6dp-rounded then DECIMAL-summed so rounds reproduce
    // bit-identically; oracle unrolls the same rounds as CTEs
    "g9_hits" -> ((s, d) => {
      val e = table(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(table(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"), col("l_suppkey").as("dst"))
      graft.graph.Hits.run(e, rounds = 3).orderBy("role", "node")
    }),
    // web-scale connected components: alternating large-star/small-star
    // contraction (O(log n) rounds vs label propagation's diameter
    // rounds) — same (node, min-reachable) contract as d5, checked
    // against the same recursive-CTE oracle
    "g5_cc_stars" -> ((s, d) => {
      val sl = table(s, d, "lineitem")
        .filter(col("l_quantity") >= 45)
        .select(col("l_orderkey"), col("l_suppkey")).distinct()
      val edges = sl.alias("x")
        .join(sl.alias("y"), col("x.l_orderkey") === col("y.l_orderkey") &&
          col("x.l_suppkey") < col("y.l_suppkey"))
        .select(col("x.l_suppkey").as("id_a"), col("y.l_suppkey").as("id_b"))
      graft.graph.ConnectedComponents.runStars(edges).orderBy("node")
    }),
    // community detection by synchronous label propagation (self-vote +
    // min tie-break = a pure deterministic function of the previous
    // round, so exactly 5 rounds reproduce identically in both engines)
    // COMMUNITY CONDUCTANCE (g21): cut/vol per g4 community — the
    // per-community quality score next to g13's whole-partition
    // modularity (what an application actually prunes on); exact
    // integers, vol = 2·internal + cut so no degree table
    "g21_conductance" -> ((s, d) => {
      val sl = table(s, d, "lineitem")
        .filter(col("l_quantity") >= 49)
        .select(col("l_orderkey"), col("l_suppkey")).distinct()
      val edges = sl.alias("x")
        .join(sl.alias("y"), col("x.l_orderkey") === col("y.l_orderkey") &&
          col("x.l_suppkey") < col("y.l_suppkey"))
        .select(col("x.l_suppkey").as("src"), col("y.l_suppkey").as("dst"))
      graft.graph.LabelPropagation.conductance(edges, rounds = 5)
    }),
    "g4_label_propagation" -> ((s, d) => {
      val sl = table(s, d, "lineitem")
        .filter(col("l_quantity") >= 45)
        .select(col("l_orderkey"), col("l_suppkey")).distinct()
      val edges = sl.alias("x")
        .join(sl.alias("y"), col("x.l_orderkey") === col("y.l_orderkey") &&
          col("x.l_suppkey") < col("y.l_suppkey"))
        .select(col("x.l_suppkey").as("src"), col("y.l_suppkey").as("dst"))
      graft.graph.LabelPropagation.run(edges, rounds = 5).orderBy("node")
    })
  )

  /** Shared oracle prelude for the HyperBall portable twins: the
    * symmetrized bipartite graph, the md5₄₈ register hash per node
    * (idx = h mod 16, rho = trailing-zeros(h div 16) + 1, zero
    * quotient → 45 = 48 − log2 16 + 1), and the unrolled 2-hop balls
    * b0/b1/b2 — DuckDB's replay of `HyperBall.initPacked` + two
    * max-merge hops. */
  private val hyperballCte: String =
    """pairs AS (SELECT DISTINCT l_suppkey * 2 AS s_node,
      |    o_custkey * 2 + 1 AS c_node
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |sym AS (SELECT s_node AS src, c_node AS dst FROM pairs
      |  UNION SELECT c_node, s_node FROM pairs),
      |nodes AS (SELECT DISTINCT src AS node FROM sym),
      |hsh AS (SELECT node,
      |    ('0x' || substr(md5(CAST(node AS VARCHAR)), 1, 12))::BIGINT
      |      AS hv FROM nodes),
      |reg AS (SELECT node, CAST(hv % 16 AS INT) AS idx,
      |    CAST(CASE WHEN hv // 16 = 0 THEN 45
      |      ELSE bit_count(((hv // 16) & (-(hv // 16))) - 1) + 1 END
      |      AS INT) AS rho FROM hsh),
      |b0 AS (SELECT node AS v, node AS u FROM nodes),
      |b1 AS (SELECT DISTINCT v, u FROM (SELECT v, u FROM b0
      |  UNION ALL SELECT b.v, e.dst AS u FROM b0 b
      |    JOIN sym e ON b.u = e.src) t1),
      |b2 AS (SELECT DISTINCT v, u FROM (SELECT v, u FROM b1
      |  UNION ALL SELECT b.v, e.dst AS u FROM b1 b
      |    JOIN sym e ON b.u = e.src) t2)"""
      .stripMargin.replace('\n', ' ')

  val oracle: Map[String, String] = Map(
    "g17hp_registers_portable" ->
      s"""WITH $hyperballCte
         |SELECT b2.v AS node, r.idx AS idx, CAST(max(r.rho) AS INT)
         |  AS rho
         |FROM b2 JOIN reg r ON b2.u = r.node
         |GROUP BY 1, 2 ORDER BY node, idx""".stripMargin
        .replace('\n', ' '),
    "g18hp_ballsums_portable" ->
      s"""WITH $hyperballCte,
         |r0 AS (SELECT b0.v, r.idx, max(r.rho) AS rho FROM b0
         |  JOIN reg r ON b0.u = r.node GROUP BY 1, 2),
         |r1 AS (SELECT b1.v, r.idx, max(r.rho) AS rho FROM b1
         |  JOIN reg r ON b1.u = r.node GROUP BY 1, 2),
         |r2 AS (SELECT b2.v, r.idx, max(r.rho) AS rho FROM b2
         |  JOIN reg r ON b2.u = r.node GROUP BY 1, 2),
         |s0 AS (SELECT v AS node, CAST(0 AS INT) AS hop,
         |    CAST(CAST(sum(CAST(power(2, 49 - rho) AS BIGINT))
         |        AS BIGINT)
         |      + (16 - count(*)) * CAST(power(2, 49) AS BIGINT)
         |      AS BIGINT) AS zsum_scaled,
         |    CAST(count(*) AS INT) AS nreg FROM r0 GROUP BY 1, 2),
         |s1 AS (SELECT v AS node, CAST(1 AS INT) AS hop,
         |    CAST(CAST(sum(CAST(power(2, 49 - rho) AS BIGINT))
         |        AS BIGINT)
         |      + (16 - count(*)) * CAST(power(2, 49) AS BIGINT)
         |      AS BIGINT) AS zsum_scaled,
         |    CAST(count(*) AS INT) AS nreg FROM r1 GROUP BY 1, 2),
         |s2 AS (SELECT v AS node, CAST(2 AS INT) AS hop,
         |    CAST(CAST(sum(CAST(power(2, 49 - rho) AS BIGINT))
         |        AS BIGINT)
         |      + (16 - count(*)) * CAST(power(2, 49) AS BIGINT)
         |      AS BIGINT) AS zsum_scaled,
         |    CAST(count(*) AS INT) AS nreg FROM r2 GROUP BY 1, 2)
         |SELECT * FROM (SELECT * FROM s0 UNION ALL SELECT * FROM s1
         |  UNION ALL SELECT * FROM s2) u
         |ORDER BY node, hop""".stripMargin.replace('\n', ' '),
    // same integer mix, row_number bottom-3 replays the TopK kept set
    "g24_neighbor_sampling" ->
      """WITH e AS (SELECT DISTINCT l_suppkey * 2 AS src,
        |    o_custkey * 2 + 1 AS dst
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |b AS (SELECT src, dst FROM e
        |  UNION ALL SELECT dst, src FROM e),
        |p AS (SELECT src AS node, dst AS neighbor,
        |    (src * 2654435761 + dst * 40503) % 2147483647 AS p
        |  FROM b),
        |r AS (SELECT node, neighbor, p,
        |    row_number() OVER (PARTITION BY node
        |      ORDER BY p, neighbor) AS slot
        |  FROM p)
        |SELECT node, CAST(slot AS INT) AS slot, neighbor,
        |  CAST(p AS BIGINT) AS priority
        |FROM r WHERE slot <= 3 ORDER BY node, slot"""
        .stripMargin.replace('\n', ' '),
    "g1_pagerank" -> (graft.graph.PageRank.sql(
      """(SELECT l_suppkey * 2 AS src, o_custkey * 2 + 1 AS dst
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  UNION ALL
        |  SELECT o_custkey * 2 + 1, l_suppkey * 2
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)"""
        .stripMargin.replace('\n', ' '), iters = 5) + " ORDER BY node"),
    "g14_personalized_pagerank" -> (graft.graph.PageRank.personalizedSql(
      """(SELECT l_suppkey * 2 AS src, o_custkey * 2 + 1 AS dst
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  UNION ALL
        |  SELECT o_custkey * 2 + 1, l_suppkey * 2
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)"""
        .stripMargin.replace('\n', ' '),
      "SELECT s_suppkey * 2 AS node FROM supplier WHERE s_nationkey < 5",
      iters = 5) + " ORDER BY node"),
    "g25_betweenness" -> graft.graph.Betweenness.sampledSql(
      """(WITH sl AS (SELECT DISTINCT l_orderkey, l_suppkey
        |  FROM lineitem WHERE l_quantity >= 45)
        |SELECT x.l_suppkey AS src, y.l_suppkey AS dst
        |FROM sl x JOIN sl y ON x.l_orderkey = y.l_orderkey
        |  AND x.l_suppkey < y.l_suppkey)""".stripMargin.replace('\n', ' '),
      "SELECT s_suppkey AS node FROM supplier WHERE s_suppkey % 17 = 3",
      maxHops = 4),
    "g6_bfs_hops" -> graft.graph.Bfs.bfsHopsSql(
      """(WITH sl AS (SELECT DISTINCT l_orderkey, l_suppkey
        |  FROM lineitem WHERE l_quantity >= 45)
        |SELECT x.l_suppkey AS src, y.l_suppkey AS dst
        |FROM sl x JOIN sl y ON x.l_orderkey = y.l_orderkey
        |  AND x.l_suppkey < y.l_suppkey)""".stripMargin.replace('\n', ' '),
      sourceSql = "SELECT min(least(src, dst)) FROM e",
      maxHops = 6),
    "g11_assortativity" ->
      """WITH sl AS (SELECT DISTINCT l_orderkey, l_suppkey
        |  FROM lineitem WHERE l_quantity >= 45),
        |pairs AS (SELECT DISTINCT x.l_suppkey AS a, y.l_suppkey AS b
        |  FROM sl x JOIN sl y ON x.l_orderkey = y.l_orderkey
        |    AND x.l_suppkey < y.l_suppkey),
        |sym AS (SELECT a AS src, b AS dst FROM pairs
        |  UNION ALL SELECT b, a FROM pairs),
        |deg AS (SELECT src AS nd, count(*) AS deg FROM sym GROUP BY 1),
        |ed AS (SELECT CAST(d1.deg AS DOUBLE) AS x,
        |    CAST(d2.deg AS DOUBLE) AS y
        |  FROM sym JOIN deg d1 ON d1.nd = sym.src
        |  JOIN deg d2 ON d2.nd = sym.dst),
        |m AS (SELECT count(*) AS n,
        |    sum(CAST(x AS DECIMAL(24,6))) AS sx,
        |    sum(CAST(y AS DECIMAL(24,6))) AS sy,
        |    sum(CAST(x * x AS DECIMAL(24,6))) AS sxx,
        |    sum(CAST(y * y AS DECIMAL(24,6))) AS syy,
        |    sum(CAST(x * y AS DECIMAL(24,6))) AS sxy
        |  FROM ed)
        |SELECT CAST(n AS BIGINT) AS n,
        |  CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |      CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
        |    AND (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
        |      CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
        |  THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
        |    CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |  (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |    CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |   sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
        |    CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
        |  END AS assortativity
        |FROM m""".stripMargin.replace('\n', ' '),
    "g10_clustering_coeff" -> graft.graph.Triangles.perNodeClusteringSql(
      """(WITH sl AS (SELECT DISTINCT l_orderkey, l_suppkey
        |  FROM lineitem WHERE l_quantity >= 45)
        |SELECT x.l_suppkey AS src, y.l_suppkey AS dst
        |FROM sl x JOIN sl y ON x.l_orderkey = y.l_orderkey
        |  AND x.l_suppkey < y.l_suppkey)""".stripMargin
        .replace('\n', ' ')),
    "g13_modularity" -> graft.graph.Modularity.modularitySql(
      """(WITH sl AS (SELECT DISTINCT l_orderkey, l_suppkey
        |  FROM lineitem WHERE l_quantity >= 50)
        |SELECT x.l_suppkey AS src, y.l_suppkey AS dst
        |FROM sl x JOIN sl y ON x.l_orderkey = y.l_orderkey
        |  AND x.l_suppkey < y.l_suppkey)""".stripMargin
        .replace('\n', ' '),
      rounds = 5),
    "g12_ktruss" -> graft.graph.KTruss.kTrussSql(
      """(WITH sl AS (SELECT DISTINCT l_orderkey, l_suppkey
        |  FROM lineitem WHERE l_quantity >= 45)
        |SELECT x.l_suppkey AS src, y.l_suppkey AS dst
        |FROM sl x JOIN sl y ON x.l_orderkey = y.l_orderkey
        |  AND x.l_suppkey < y.l_suppkey)""".stripMargin
        .replace('\n', ' '),
      // 14 ≥ the empirical convergence round count at every tested SF
      // (sf0.01 converges in ≤4 rounds, sf0.1 in 12; extra unrolled
      // rounds peel a fixpoint = no-ops) — rounds=4 was enough for the
      // sf0.01 gate but silently short of sf0.1's fixpoint
      k = 4, rounds = 14),
    "g9_hits" -> graft.graph.Hits.hitsSql(
      """(SELECT o_custkey AS src, l_suppkey AS dst
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey)"""
        .stripMargin.replace('\n', ' '),
      rounds = 3),
    "g7_sssp" -> graft.graph.ShortestPaths.ssspSql(
      """(WITH sl AS (SELECT DISTINCT l_orderkey, l_suppkey
        |  FROM lineitem WHERE l_quantity >= 45)
        |SELECT x.l_suppkey AS src, y.l_suppkey AS dst,
        |  4 - least(count(*), 3) AS w
        |FROM sl x JOIN sl y ON x.l_orderkey = y.l_orderkey
        |  AND x.l_suppkey < y.l_suppkey
        |GROUP BY 1, 2)""".stripMargin.replace('\n', ' '),
      sourceSql = "SELECT min(least(src, dst)) FROM e",
      maxRounds = 6),
    "g8_link_prediction" -> graft.graph.LinkPrediction.adamicAdarSql(
      """(WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey
        |  FROM lineitem WHERE l_quantity >= 45)
        |SELECT x.l_partkey AS src, y.l_partkey AS dst
        |FROM lp x JOIN lp y ON x.l_orderkey = y.l_orderkey
        |  AND x.l_partkey < y.l_partkey)""".stripMargin.replace('\n', ' '),
      topN = 25, maxDegree = 50),
    "g5_cc_stars" ->
      """WITH RECURSIVE sl AS (SELECT DISTINCT l_orderkey, l_suppkey
        |  FROM lineitem WHERE l_quantity >= 45),
        |pairs AS (SELECT DISTINCT x.l_suppkey AS id_a,
        |    y.l_suppkey AS id_b
        |  FROM sl x JOIN sl y ON x.l_orderkey = y.l_orderkey
        |    AND x.l_suppkey < y.l_suppkey),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(node, root) AS (
        |  SELECT DISTINCT src, src FROM edges
        |  UNION
        |  SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.node)
        |SELECT node, min(root) AS component FROM reach
        |GROUP BY 1 ORDER BY node""".stripMargin.replace('\n', ' '),
    "g21_conductance" -> graft.graph.LabelPropagation.conductanceSql(
      """(WITH sl AS (SELECT DISTINCT l_orderkey, l_suppkey
        |  FROM lineitem WHERE l_quantity >= 49)
        |SELECT x.l_suppkey AS src, y.l_suppkey AS dst
        |FROM sl x JOIN sl y ON x.l_orderkey = y.l_orderkey
        |  AND x.l_suppkey < y.l_suppkey)""".stripMargin.replace('\n', ' '),
      rounds = 5),
    "g4_label_propagation" -> graft.graph.LabelPropagation.lpaSql(
      """(WITH sl AS (SELECT DISTINCT l_orderkey, l_suppkey
        |  FROM lineitem WHERE l_quantity >= 45)
        |SELECT x.l_suppkey AS src, y.l_suppkey AS dst
        |FROM sl x JOIN sl y ON x.l_orderkey = y.l_orderkey
        |  AND x.l_suppkey < y.l_suppkey)""".stripMargin.replace('\n', ' '),
      rounds = 5),
    "g3_kcore" -> graft.graph.KCore.kcoreSql(
      """(WITH sl AS (SELECT DISTINCT l_orderkey, l_suppkey
        |  FROM lineitem WHERE l_quantity >= 45)
        |SELECT x.l_suppkey AS src, y.l_suppkey AS dst
        |FROM sl x JOIN sl y ON x.l_orderkey = y.l_orderkey
        |  AND x.l_suppkey < y.l_suppkey)""".stripMargin.replace('\n', ' '),
      k = 2),
    // same bipartite edges, HUGEINT fixed-point means (// truncation
    // parity with Spark div), /1e6 fixed-tree output doubles
    "g20_feature_prop" ->
      """WITH pairs AS (SELECT DISTINCT l_suppkey * 2 AS s_node,
        |    o_custkey * 2 + 1 AS c_node
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |e AS (SELECT s_node AS src, c_node AS dst FROM pairs
        |  UNION ALL SELECT c_node, s_node FROM pairs),
        |feats AS (SELECT s_suppkey * 2 AS node,
        |    CAST(round(s_acctbal * 100) AS BIGINT) AS f FROM supplier
        |  UNION ALL SELECT c_custkey * 2 + 1,
        |    CAST(round(c_acctbal * 100) AS BIGINT) FROM customer),
        |hop1 AS (SELECT src, CAST(count(*) AS BIGINT) AS deg,
        |    CAST(sum(f) AS HUGEINT) AS sf
        |  FROM e JOIN feats ON e.dst = feats.node GROUP BY 1),
        |h1 AS (SELECT src, deg,
        |    CAST((sf * 1000000) // deg AS BIGINT) AS h1_units
        |  FROM hop1),
        |hop2 AS (SELECT e.src,
        |    CAST(sum(CAST(h1.h1_units AS HUGEINT)) AS HUGEINT) AS s2
        |  FROM e JOIN h1 ON e.dst = h1.src GROUP BY 1),
        |j AS (SELECT h1.src AS node, feats.f, h1.deg, h1.h1_units,
        |    CAST(hop2.s2 // h1.deg AS BIGINT) AS h2_units
        |  FROM h1 JOIN hop2 ON h1.src = hop2.src
        |  JOIN feats ON h1.src = feats.node)
        |SELECT node, f, deg, CAST(h1_units AS DOUBLE) / 1e6 AS h1,
        |  CAST(h2_units AS DOUBLE) / 1e6 AS h2
        |FROM j ORDER BY node""".stripMargin.replace('\n', ' '),
    // same undirected pair set; HUGEINT numerator, truncating //
    "g22_rich_club" ->
      """WITH p AS (SELECT DISTINCT l_suppkey * 2 AS u,
        |    o_custkey * 2 + 1 AS v
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |e AS (SELECT u AS src, v AS dst FROM p
        |  UNION ALL SELECT v, u FROM p),
        |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS dg
        |  FROM e GROUP BY 1),
        |em AS (SELECT least(du.dg, dv.dg) AS min_deg,
        |    CAST(count(*) AS BIGINT) AS ecnt
        |  FROM p JOIN deg du ON p.u = du.src
        |  JOIN deg dv ON p.v = dv.src GROUP BY 1),
        |nh AS (SELECT dg, CAST(count(*) AS BIGINT) AS ncnt
        |  FROM deg GROUP BY 1),
        |ks AS (SELECT CAST(range AS INT) AS k FROM range(1, 13)),
        |nk AS (SELECT k, CAST(coalesce(sum(ncnt), 0) AS BIGINT) AS n_k
        |  FROM ks LEFT JOIN nh ON nh.dg > ks.k GROUP BY 1),
        |ek AS (SELECT k, CAST(coalesce(sum(ecnt), 0) AS BIGINT) AS e_k
        |  FROM ks LEFT JOIN em ON em.min_deg > ks.k GROUP BY 1)
        |SELECT nk.k, n_k, e_k,
        |  CASE WHEN n_k >= 2 THEN CAST(
        |    (2 * CAST(e_k AS HUGEINT) * 1000000) //
        |    (CAST(n_k AS HUGEINT) * (n_k - 1)) AS BIGINT) END AS phi_e6
        |FROM nk JOIN ek ON nk.k = ek.k
        |ORDER BY nk.k""".stripMargin.replace('\n', ' '),
    // same degree grain, 6dp ln terms, decimal sum, NULL-guarded alpha
    "g19_degree_stats" ->
      """WITH e AS (SELECT DISTINCT src, dst FROM (
        |    SELECT l_suppkey * 2 AS src, o_custkey * 2 + 1 AS dst
        |    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |    UNION ALL
        |    SELECT o_custkey * 2 + 1 AS src, l_suppkey * 2 AS dst
        |    FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |  WHERE src <> dst),
        |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS dg
        |  FROM e GROUP BY 1),
        |ag AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
        |    CAST(sum(dg) AS BIGINT) AS sum_deg,
        |    min(dg) AS min_deg, max(dg) AS max_deg,
        |    CAST(sum(CASE WHEN dg >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_tail,
        |    sum(CASE WHEN dg >= 2 THEN
        |      CAST(round(ln(CAST(dg AS DOUBLE) / CAST('2' AS DOUBLE)), 6)
        |        AS DECIMAL(38,6)) END) AS lnsum
        |  FROM deg)
        |SELECT n_nodes, sum_deg // 2 AS n_edges, min_deg, max_deg,
        |  n_tail,
        |  CASE WHEN lnsum > 0 THEN round(CAST('1' AS DOUBLE) +
        |    CAST(n_tail AS DOUBLE) / CAST(lnsum AS DOUBLE), 6)
        |  END AS alpha
        |FROM ag""".stripMargin.replace('\n', ' '),
    "g18_effective_diameter" -> graft.graph.Closeness.hopDistributionSql(
      """(SELECT l_suppkey * 2 AS src, o_custkey * 2 + 1 AS dst
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)"""
        .stripMargin.replace('\n', ' '),
      "(SELECT s_suppkey * 2 AS node FROM supplier " +
        "WHERE s_suppkey % 25 = 3)"),
    "g17_closeness" -> graft.graph.Closeness.multiSourceSql(
      """(SELECT l_suppkey * 2 AS src, o_custkey * 2 + 1 AS dst
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)"""
        .stripMargin.replace('\n', ' '),
      "(SELECT s_suppkey * 2 AS node FROM supplier " +
        "WHERE s_suppkey % 25 = 3)"),
    "g16_mis" -> graft.graph.Mis.sql(
      """(SELECT l_suppkey * 2 AS src, o_custkey * 2 + 1 AS dst
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)"""
        .stripMargin.replace('\n', ' ')),
    "g15_random_walks" -> graft.graph.RandomWalks.sql(
      """(SELECT l_suppkey * 2 AS src, o_custkey * 2 + 1 AS dst
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  UNION ALL
        |  SELECT o_custkey * 2 + 1, l_suppkey * 2
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)"""
        .stripMargin.replace('\n', ' '),
      "(SELECT s_suppkey * 2 AS node FROM supplier)"),
    // triangles (a<b<c) counted once each via three canonical-edge joins
    "g2_triangle_count" ->
      """WITH sl AS (SELECT DISTINCT l_orderkey, l_suppkey
        |  FROM lineitem WHERE l_quantity >= 45),
        |e AS (SELECT DISTINCT x.l_suppkey AS a, y.l_suppkey AS b
        |  FROM sl x JOIN sl y ON x.l_orderkey = y.l_orderkey
        |    AND x.l_suppkey < y.l_suppkey),
        |nodes AS (SELECT count(DISTINCT n) AS n_nodes FROM
        |  (SELECT a AS n FROM e UNION ALL SELECT b FROM e)),
        |edges AS (SELECT count(*) AS n_edges FROM e),
        |tri AS (SELECT count(*) AS n_triangles
        |  FROM e e1 JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
        |    JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b)
        |SELECT n_nodes, n_edges, n_triangles
        |FROM nodes CROSS JOIN edges CROSS JOIN tri"""
        .stripMargin.replace('\n', ' ')
  )
}
