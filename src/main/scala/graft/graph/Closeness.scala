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
  * BITSET BFS: per-node state is ONE row with a 64-bit mask of the
  * sources that have reached it (sources beyond 64 run in chunked
  * panels of 64 — an outer loop over ⌈k/64⌉ passes, each node-grain).
  * Per hop the frontier's new bits ride the edge join, OR-reduce per
  * destination (`bit_or` — commutative, deterministic), and the bits
  * not yet in the visited mask are that hop's discoveries. This is
  * the exact-bitset form of the HyperBall/ANF neighborhood-function
  * iteration (Boldi & Vigna; Palmer et al.'s ANF) — the way
  * multi-source reachability is actually run at 100 TB: state and
  * shuffle volume are node-grain (n rows × 16 B) instead of the
  * (source × node) composite grain, a k× reduction with k = panel
  * size. localCheckpoint truncates per-hop lineage and the driver
  * emptiness check ends the fixpoint (the Bfs/KTruss pattern),
  * hop-capped to bound worst-case diameter chains.
  *
  * The DuckDB twin is the g6 recursive-reach shape seeded with every
  * source, collapsed by min distance — semantics are unchanged from
  * the composite-state form (a bit first appears at a node exactly at
  * their BFS distance).
  *
  * Everything is exact integers until the one closeness division
  * (rounded 6 dp, identical tree both engines). A source reaching
  * nothing within the cap is absent from the report in both. */
object Closeness {

  private def symmetrize(edges: DataFrame): DataFrame =
    edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"),
        col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()

  /** One ≤64-source panel of the bitset BFS: (node, hop, newmask)
    * rows — the source-bits FIRST reaching `node` at exactly `hop`
    * (hop 0 = the sources themselves). Node-grain per hop. */
  private def reachBitsChunk(sym: DataFrame, chunk: Seq[Long],
      maxHops: Int): DataFrame = {
    val spark = sym.sparkSession
    import spark.implicits._
    require(chunk.size <= 64, "one panel holds at most 64 source bits")
    val init = chunk.zipWithIndex
      .map { case (n, b) => (n, 1L << b) }
      .toDF("node", "newmask")
    // ONE checkpointed frame per hop backs BOTH the visited mask and
    // the frontier (the HyperBall packedSweep layout): merged =
    // state ⟗ cand computes vis' = vis | cand and newmask =
    // cand & ~vis in one full-outer join, so a hop is one
    // materialization instead of two (frontier + state) and one join
    // instead of two (cand⋈state + state⋈frontier) — same vis/newmask
    // values row for row (vis | (cand & ~vis) = vis | cand). perHop's
    // lazy frontier filters reference their hop's backing frame, which
    // therefore stays pinned — node-grain rows, maxHops generations.
    var backing = init
      .select(col("node"), col("newmask").as("vis"), col("newmask"))
      .localCheckpoint()
    def frontier: DataFrame = backing
      .filter(col("newmask") =!= 0)
      .select(col("node"), col("newmask"))
    val perHop = scala.collection.mutable.ListBuffer[DataFrame](
      frontier.withColumn("hop", lit(0)))
    var hop = 0
    while (hop < maxHops && !frontier.isEmpty) {
      hop += 1
      // bits ride the edge join; OR-reduce per destination, then keep
      // only bits the visited mask doesn't already hold
      val cand = sym
        .join(frontier.select(col("node").as("src"), col("newmask")),
          "src")
        .groupBy(col("dst").as("node"))
        .agg(expr("bit_or(newmask)").as("cand"))
      backing = backing.select(col("node"), col("vis"))
        .join(cand, Seq("node"), "full_outer")
        .select(col("node"),
          expr("coalesce(vis, 0L) | coalesce(cand, 0L)").as("vis"),
          expr("coalesce(cand, 0L) & ~coalesce(vis, 0L)").as("newmask"))
        .localCheckpoint()
      perHop += frontier.withColumn("hop", lit(hop))
    }
    perHop.reduce(_.unionAll(_))
  }

  /** All panels, hop > 0 only: (chunk-local `bit`, absolute source
    * `src_node`, `node`, `hop`, `newmask`) discovery rows plus the
    * per-chunk bit→source map for the caller's accounting. The source
    * panel is metadata-sized BY CONSTRUCTION (sampled closeness), so
    * collecting its ids to drive the ⌈k/64⌉ chunk loop is a
    * driver-side loop over a sample, not over data. */
  private def discoveries(edges: DataFrame, sources: DataFrame,
      maxHops: Int): Seq[(Seq[Long], DataFrame)] = {
    val sym = symmetrize(edges).localCheckpoint()
    val srcIds = sources.select(col("node").cast("long"))
      .distinct().collect().map(_.getLong(0)).sorted.toSeq
    val out = srcIds.grouped(64).toSeq.map { chunk =>
      (chunk, reachBitsChunk(sym, chunk, maxHops)
        .filter(col("hop") > 0))
    }
    // every chunk's per-hop frontiers are checkpoint-materialized by
    // now — the shared symmetrized edge frame is dead
    graft.util.Checkpoints.free(sym)
    out
  }

  /** @param sources one `node` column
    * @return (node, n_reached, sum_dist, closeness), self excluded */
  def multiSource(edges: DataFrame, sources: DataFrame,
      maxHops: Int = 10): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val perSource = discoveries(edges, sources, maxHops)
      .map { case (chunk, rows) =>
        val bits = chunk.zipWithIndex.map { case (n, b) => (b, n) }
          .toDF("bit", "src_node")
        // unpack each discovery row's bits: ≤64× blowup of integer
        // triples, aggregated immediately — the per-source accounting
        // runs on the node-grain discovery set, never on edges
        rows
          .select(col("hop"), col("newmask"),
            explode(sequence(lit(0), lit(chunk.size - 1))).as("bit"))
          .filter(expr("((newmask >> bit) & 1) = 1"))
          .groupBy(col("bit"))
          .agg(count(lit(1)).as("n_reached"),
            sum(col("hop").cast("long")).as("sum_dist"))
          .join(broadcast(bits), "bit")
          .select(col("src_node").as("node"), col("n_reached"),
            col("sum_dist"))
      }
      .reduce(_.unionAll(_))
    perSource
      .select(col("node"), col("n_reached"), col("sum_dist"),
        expr("round(CAST(n_reached AS DOUBLE) " +
          "/ CAST(sum_dist AS DOUBLE), 6)").as("closeness"))
      .orderBy("node")
  }

  /** Hop-distance distribution + EFFECTIVE DIAMETER (g18) over the
    * same sampled-source bitset BFS: per hop, the number of
    * (source, node) pairs at that exact distance — `bit_count` of the
    * discovery masks, no per-bit unpack needed — the running
    * cumulative, and the integer-exact test cum·10 ≥ 9·total marking
    * the 90th-percentile hop: the smallest flagged hop IS the
    * effective diameter (Leskovec & Faloutsos's graph-over-time
    * statistic, computed the only way it ever is at scale: from a
    * source sample). Exact integers throughout except the one rounded
    * cum fraction; the distribution is hop-grained (≤ maxHops rows) no
    * matter the SF, so the one cumulative window runs over ≤ maxHops
    * rows. */
  def hopDistribution(edges: DataFrame, sources: DataFrame,
      maxHops: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byHop = discoveries(edges, sources, maxHops)
      .map(_._2)
      .reduce(_.unionAll(_))
      .groupBy(col("hop"))
      .agg(sum(bit_count(col("newmask")).cast("long")).as("n_pairs"))
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
       |tt AS (SELECT sum(n_pairs) AS tot FROM bh)
       |SELECT CAST(hop AS INTEGER) AS hop, n_pairs, cum_pairs,
       |  round(CAST(cum_pairs AS DOUBLE) / CAST(tot AS DOUBLE), 6)
       |    AS cum_frac,
       |  cum_pairs * 10 >= tot * 9 AS reaches_p90
       |FROM cm CROSS JOIN tt ORDER BY hop""".stripMargin
      .replace('\n', ' ')

  /** DuckDB twin of [[multiSource]]: recursive reach seeded with every
    * source, min-distance collapse, per-source summary. */
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
