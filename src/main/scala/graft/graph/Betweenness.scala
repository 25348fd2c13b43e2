package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sampled-source betweenness centrality — Brandes' dependency
  * accumulation (Brandes 2001) run for a hash-picked source panel,
  * the standard approximation (Brandes & Pich 2007) because exact
  * betweenness is O(V·E): how much shortest-path traffic flows
  * THROUGH each node, the bridge/broker score that closeness (g17)
  * and PageRank (g1/g14) don't capture.
  *
  * Arithmetic is EXACT integer fixed-point, the PageRank/Conformal
  * discipline: path counts σ are exact integer sums; each dependency
  * term δ accumulates in 1e-6 units via the truncating division
  * `(σ_v · (U + δ_w)) div σ_w`, spelled identically in both engines
  * (Spark DECIMAL(38,0) `div`; DuckDB HUGEINT `//` — same values on
  * the same nonnegative operands), so the DuckDB twin that unrolls
  * the identical forward levels and backward sweeps hash-matches
  * bit for bit. No doubles anywhere.
  *
  * Distributed shape: level-synchronous forward BFS over (source,
  * node) composite state — k·V rows for a k-source panel, the
  * sampled-centrality contract that keeps state bounded — where each
  * level is ONE edge join + ONE partial-aggregating groupBy (σ sums
  * ride the frontier); the backward sweep is the same join shape run
  * depth-many times on the per-level frames. All frames
  * localCheckpoint per round (lineage truncation, the iterative-
  * operator pattern). Nothing in the plan depends on |V| beyond the
  * composite frontier.
  */
object Betweenness {

  private val U = 1000000L // 1.0 in 1e-6 dependency units

  private def symmetrize(edges: DataFrame): DataFrame =
    edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()

  /** @param edges   undirected edge list (symmetrized + deduped here)
    * @param sources one `node` column — the sampled panel; restricted
    *                to nodes present in the graph
    * @param maxHops forward depth cap (bounds both sweeps)
    * @return (node, bt_micro): Brandes dependency sum over the panel
    *         in 1e-6 units, endpoints excluded (sources carry no δ of
    *         their own); every node reached at depth ≥ 1 appears,
    *         zeros included. Raw sampled sums — no 1/((n-1)(n-2))
    *         normalization and no undirected halving, so values are
    *         comparable only within one run (the use case: ranking). */
  def sampled(edges: DataFrame, sources: DataFrame,
      maxHops: Int = 4): DataFrame = {
    val sym = symmetrize(edges).localCheckpoint()
    val srcs = sources.select(col("node")).distinct()
      .join(sym.select(col("src").as("node")).distinct(),
        Seq("node"), "left_semi")
    val one = lit(1L).cast("decimal(38,0)")
    val zero = lit(0L).cast("decimal(38,0)")
    // ---- forward: per-level (src_s, node, sigma), level 0 = sources
    var level = srcs
      .select(col("node").as("src_s"), col("node"), one.as("sigma"))
      .localCheckpoint()
    // the visited set is a UNION of already-checkpointed level frames
    // — no checkpoint of its own (≤ maxHops cheap leaves; a second
    // materialization per level would double the job count)
    var vis = level.select(col("src_s"), col("node"))
    val levels = scala.collection.mutable.ListBuffer(level)
    var h = 0
    while (h < maxHops && !level.isEmpty) {
      h += 1
      val cand = sym
        .join(level.select(col("src_s"), col("node").as("src"),
          col("sigma")), "src")
        .groupBy(col("src_s"), col("dst").as("node"))
        .agg(sum(col("sigma")).as("sigma"))
      level = cand
        .join(vis, Seq("src_s", "node"), "left_anti")
        .localCheckpoint()
      vis = vis.unionAll(level.select(col("src_s"), col("node")))
      levels += level
    }
    val maxd = levels.size - 1 // deepest level actually reached
    if (maxd == 0) {
      // no edges out of any source: empty report, stable schema
      return srcs.select(col("node"), lit(0L).as("bt_micro"))
        .filter(lit(false))
    }
    // ---- backward: δ(v) = Σ_{succ w} (σ_v · (U + δ_w)) div σ_w
    var deltaNext = levels(maxd)
      .select(col("src_s"), col("node"), col("sigma"),
        zero.as("delta"))
      .localCheckpoint()
    val deltas = scala.collection.mutable.ListBuffer(deltaNext)
    var hh = maxd - 1
    while (hh >= 0) {
      val cur = levels(hh)
      // FUSED sweep step (the shape the DuckDB twin already uses):
      // LEFT-join the successor edges and the level-(hh+1) deltas onto
      // cur, aggregate with a null-skipping sum, coalesce to zero — one
      // aggregation replaces the old inner-join term build + groupBy +
      // join-back-to-cur (3 joins + 2 exchanges per depth → 2 joins +
      // 1 exchange; guide §2.4). Rows with no successor (null edge or
      // no delta at (src_s, dst)) yield a NULL term that sum() skips —
      // exactly the rows the old inner joins dropped — so the per-node
      // delta sums are term-for-term identical.
      val terms = cur
        .join(sym, cur("node") === sym("src"), "left")
        .join(deltaNext
          .select(col("src_s").as("w_src_s"), col("node").as("w_dst"),
            col("sigma").as("sigma_w"), col("delta").as("delta_w")),
          cur("src_s") === col("w_src_s") && sym("dst") === col("w_dst"),
          "left")
        .select(cur("src_s"), cur("node"), cur("sigma"),
          // σ, δ_w, σ_w are never null on matched rows (σ from inner
          // joins, δ coalesced), so a NULL product under a non-null
          // σ_w can only mean DECIMAL(38,0) overflow — which non-ANSI
          // Spark would otherwise silently drop from sum() while
          // DuckDB's HUGEINT holds the value or errors. Surface it
          // loudly instead (round-11 ADVICE). Unmatched rows (σ_w
          // null) legitimately carry a NULL term that sum() skips.
          when(col("sigma_w").isNull, lit(null).cast("decimal(38,0)"))
            .otherwise(expr(
              s"coalesce(sigma * ($U + delta_w) div sigma_w, " +
                "CAST(raise_error('g25: DECIMAL(38,0) overflow in " +
                "Brandes delta term') AS BIGINT))")).as("term"))
      deltaNext = terms
        .groupBy(col("src_s"), col("node"), col("sigma"))
        .agg(coalesce(sum(col("term")), zero).as("delta"))
        .select(col("src_s"), col("node"), col("sigma"), col("delta"))
        .localCheckpoint()
      if (hh >= 1) deltas += deltaNext
      hh -= 1
    }
    // the returned plan references only the checkpointed delta frames
    // in `deltas` — the forward levels, the symmetrized edge frame and
    // the dropped hh=0 delta (sources carry no δ) are dead; release
    // their blocks eagerly instead of waiting on a full GC
    graft.util.Checkpoints.freeAll(levels)
    graft.util.Checkpoints.free(sym)
    // deltaNext here is always the hh=0 sweep result (never appended
    // to deltas — the loop adds only hh >= 1, and maxd == 0 returned
    // early), so it is unconditionally dead
    graft.util.Checkpoints.free(deltaNext)
    deltas.reduce(_.unionAll(_))
      .groupBy(col("node"))
      .agg(sum(col("delta")).cast("bigint").as("bt_micro"))
      .orderBy("node")
  }

  /** DuckDB twin: recursive min-dist reach (the g6 shape) feeds
    * statically unrolled σ levels and δ sweeps — identical integer
    * fixed-point terms in HUGEINT. `edgesRel` yields (src, dst),
    * `sourcesRel` a `node` column. */
  def sampledSql(edgesRel: String, sourcesRel: String,
      maxHops: Int = 4): String = {
    val sig = (1 to maxHops).map { k =>
      s"""sig$k AS (SELECT dv.src_s, dv.node,
         |    CAST(sum(sp.sigma) AS HUGEINT) AS sigma
         |  FROM dist dv JOIN e ON e.dst = dv.node
         |  JOIN sig${k - 1} sp
         |    ON sp.src_s = dv.src_s AND sp.node = e.src
         |  WHERE dv.d = $k GROUP BY 1, 2)""".stripMargin
        .replace('\n', ' ')
    }.mkString(", ")
    val del = (maxHops - 1 to 0 by -1).map { k =>
      s"""del$k AS (SELECT sv.src_s, sv.node, sv.sigma,
         |    COALESCE(CAST(sum(
         |      sv.sigma * (${U} + dw.delta) // dw.sigma) AS HUGEINT),
         |      CAST(0 AS HUGEINT)) AS delta
         |  FROM sig$k sv
         |  LEFT JOIN e ON e.src = sv.node
         |  LEFT JOIN del${k + 1} dw
         |    ON dw.src_s = sv.src_s AND dw.node = e.dst
         |  GROUP BY 1, 2, 3)""".stripMargin.replace('\n', ' ')
    }.mkString(", ")
    val body = (1 to maxHops)
      .map(k => s"SELECT node, delta FROM del$k")
      .mkString(" UNION ALL ")
    s"""WITH RECURSIVE e AS (SELECT DISTINCT src, dst FROM
       |  (SELECT src, dst FROM $edgesRel
       |   UNION ALL SELECT dst, src FROM $edgesRel) WHERE src <> dst),
       |srcs AS (SELECT DISTINCT node FROM ($sourcesRel)
       |  WHERE node IN (SELECT src FROM e)),
       |reach(src_s, node, d) AS (
       |  SELECT node, node, 0 FROM srcs
       |  UNION
       |  SELECT r.src_s, e.dst, r.d + 1 FROM reach r
       |  JOIN e ON e.src = r.node WHERE r.d < $maxHops),
       |dist AS (SELECT src_s, node, MIN(d) AS d FROM reach
       |  GROUP BY 1, 2),
       |sig0 AS (SELECT src_s, node, CAST(1 AS HUGEINT) AS sigma
       |  FROM dist WHERE d = 0),
       |$sig,
       |del$maxHops AS (SELECT src_s, node, sigma,
       |  CAST(0 AS HUGEINT) AS delta FROM sig$maxHops),
       |$del
       |SELECT node, CAST(sum(delta) AS BIGINT) AS bt_micro
       |FROM ($body) GROUP BY 1 ORDER BY 1""".stripMargin
      .replace('\n', ' ')
  }
}
