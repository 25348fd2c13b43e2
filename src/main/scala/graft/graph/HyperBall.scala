package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** HyperBall (Boldi & Vigna 2013) — the HLL-register form of the
  * bitset multi-source BFS in [[Closeness]], and the REAL 100 TB path
  * once the source set outgrows chunked 64-bit panels: every node
  * keeps one HyperLogLog sketch of its ball B(v, h) (the nodes within
  * h hops), per hop the sketch unions along edges (element-wise
  * register max — commutative, idempotent, order-independent), and
  * per-node ball SIZES fall out as HLL estimates. Neighborhood
  * function, effective diameter, and closeness for EVERY node at
  * node-grain state — no source sampling at all — which is exactly
  * what the exact-mask variant cannot do past ~64·chunks sources.
  *
  * Representation: registers live EXPLODED and SPARSE as
  * (node, idx, rho) rows — only registers ever hit exist, and each
  * hop propagates only the DELTA (register entries that improved), so
  * shuffle volume tracks convergence, not state size (the classic
  * delta iteration; HyperBall's systolic form). A packed
  * array<byte>-per-node layout with a custom max-merge aggregate is
  * the squeeze-the-constant production refinement; the sparse form
  * stays pure-DataFrame and its volume is ≤ n·m integer triples.
  *
  * Register hash is the repo's portable md5₄₈ family: idx = h mod m,
  * rho = trailing-zeros(h div m) + 1 via the pure-integer
  * `bit_count((w & -w) - 1) + 1` — deterministic across engines,
  * runs, and partitionings. Estimates are the standard α_m·m²/ΣZ
  * with the small-range linear-counting correction; estimate rows are
  * doubles and the harness rows are rows-only by design (estimator
  * output; the spec pins accuracy against the exact bitset BFS).
  *
  * m = 64 registers (p = 6, σ ≈ 1.04/√64 ≈ 13% per node; sums over
  * nodes concentrate further). maxHops mirrors the exact variant. */
object HyperBall {

  private val M = 64
  /** α_m bias constants (Flajolet et al. 2007): the three register
    * counts the engine exposes — 64 is the default accuracy point,
    * 16/32 are the bench-scoped cheap panels (state and per-hop union
    * volume scale linearly with m, the algorithm is unchanged). */
  private val Alphas = Map(16 -> 0.673, 32 -> 0.697, 64 -> 0.709)

  private def symmetrize(edges: DataFrame): DataFrame =
    edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()

  /** Per-hop per-node ball-size estimates (node, hop, est) for
    * hop 0..maxHops (stops early at the fixpoint). est includes the
    * node itself (|B(v,0)| ≈ 1). */
  def ballEstimates(edges: DataFrame, maxHops: Int = 10,
      m: Int = M): DataFrame = {
    val alpha = Alphas.getOrElse(m,
      throw new IllegalArgumentException(s"unsupported register count $m"))
    // rho for an all-zero quotient: h carries 48 md5 bits, h div m
    // drops log2(m) of them, so the zero-quotient sentinel is
    // (48 − log2 m) + 1 — 43 at m=64, 44 at 32, 45 at 16
    val zeroRho = 49 - java.lang.Integer.numberOfTrailingZeros(m)
    val sym = symmetrize(edges).localCheckpoint()
    val nodes = sym.select(col("src").as("node")).distinct()
    // one initial register row per node: its own hash
    val init = nodes.select(col("node"),
        expr("CAST(conv(substring(md5(CAST(node AS STRING)), 1, 12), " +
          "16, 10) AS BIGINT)").as("h"))
      .select(col("node"), expr(s"CAST(h % $m AS INT)").as("idx"),
        expr(s"CAST(CASE WHEN h div $m = 0 THEN $zeroRho ELSE " +
          s"bit_count(((h div $m) & -(h div $m)) - 1) + 1 END AS INT)")
          .as("rho"))
    var state = init.localCheckpoint()
    var delta = state
    // per-node estimate over the CURRENT registers: ΣZ = Σ 2^-rho over
    // present registers + one unit per absent register; small-range
    // linear counting below 2.5m
    def estimate(hop: Int): DataFrame =
      state.groupBy(col("node"))
        .agg(sum(expr("pow(CAST('2' AS DOUBLE), -rho)")).as("zsum"),
          count(lit(1)).as("nreg"))
        .select(col("node"), lit(hop).as("hop"),
          expr(s"CASE WHEN ($alpha * $m * $m) / (zsum + ($m - nreg)) " +
            s"<= 2.5 * $m AND nreg < $m " +
            s"THEN $m * ln(CAST($m AS DOUBLE) / ($m - nreg)) " +
            s"ELSE ($alpha * $m * $m) / (zsum + ($m - nreg)) END")
            .as("est"))
    // estimates are node-grain (tiny next to the register-grain state)
    // — checkpointing each one unpins its state generation, so the
    // superseded state/delta frames can be released per round instead
    // of accumulating for the whole sweep (see Checkpoints.free)
    val perHop =
      scala.collection.mutable.ListBuffer(estimate(0).localCheckpoint())
    var hop = 0
    while (hop < maxHops && !delta.isEmpty) {
      hop += 1
      // only IMPROVED register entries ride the edge join
      val cand = sym
        .join(delta.select(col("node").as("src"), col("idx"),
          col("rho")), "src")
        .groupBy(col("dst").as("node"), col("idx"))
        .agg(max(col("rho")).as("cr"))
      val nextDelta = cand
        .join(state, Seq("node", "idx"), "left")
        .filter(col("cr") > coalesce(col("rho"), lit(0)))
        .select(col("node"), col("idx"), col("cr").as("rho"))
        .localCheckpoint()
      val nextState = state.unionAll(nextDelta)
        .groupBy(col("node"), col("idx"))
        .agg(max(col("rho")).as("rho"))
        .localCheckpoint()
      // successors are materialized — release the superseded round.
      // Hop 1: delta eq state (both = the init checkpoint), so free
      // only one of them; double free would be a harmless no-op anyway
      graft.util.Checkpoints.free(delta)
      if (state ne delta) graft.util.Checkpoints.free(state)
      delta = nextDelta
      state = nextState
      perHop += estimate(hop).localCheckpoint()
    }
    // every estimate is checkpointed — the final state/delta/edge
    // frames are all dead; the return plan unions only the estimates
    graft.util.Checkpoints.free(sym)
    graft.util.Checkpoints.free(delta)
    if (state ne delta) graft.util.Checkpoints.free(state)
    perHop.reduce(_.unionAll(_))
  }

  // ------------------------------------------------------------------
  // PACKED register representation (the production constant-factor
  // refinement the sparse form documents): one array<int> of m slots
  // per node instead of up to m (node, idx, rho) rows. Same hash, same
  // register algebra, bit-identical registers — the sparse form stays
  // as the oracle twin (HyperBallSpec pins packed ≡ sparse). Per hop:
  //   cand  = edges ⋈ changed-node arrays, groupBy(dst) with m
  //           partial-aggregating max() slots (map-side combine — the
  //           shuffle ships one m-int array per (dst, mapper))
  //   merge = state ⋈ cand left, zip_with(regs, cregs, greatest)
  //   delta = rows whose array changed (systolic delta: unchanged
  //           nodes drop out of the next hop's join entirely)
  // State is node-grain (m ints ≈ m bytes packed by parquet/Tungsten
  // dictionary) vs the sparse form's up-to-n·m rows — ~m× less
  // shuffle per hop at the same convergence.
  // ------------------------------------------------------------------

  /** init: each node's own hash in its slot, zeros elsewhere. */
  private def initPacked(nodes: DataFrame, m: Int,
      zeroRho: Int): DataFrame =
    nodes.select(col("node"),
        expr("CAST(conv(substring(md5(CAST(node AS STRING)), 1, 12), " +
          "16, 10) AS BIGINT)").as("h"))
      .select(col("node"), expr(s"CAST(h % $m AS INT)").as("idx"),
        expr(s"CAST(CASE WHEN h div $m = 0 THEN $zeroRho ELSE " +
          s"bit_count(((h div $m) & -(h div $m)) - 1) + 1 END AS INT)")
          .as("rho"))
      .select(col("node"),
        expr(s"transform(sequence(0, ${m - 1}), " +
          "i -> CASE WHEN i = idx THEN rho ELSE 0 END)").as("regs"))

  /** The packed hop loop. Per-hop statistics ride INSIDE the state
    * row as history arrays (`hist`: name → SQL-expr builder over a
    * register-column name, appended each hop), so a hop costs exactly
    * TWO jobs — the merge checkpoint and the (cheap, checkpoint-read)
    * convergence probe — instead of a third per-hop derive/checkpoint
    * job. At local bench scale the sweep is fixed-job-overhead bound,
    * so jobs-per-hop is the constant that matters; at cluster scale
    * the history adds hops·8 bytes per node — noise next to the m-int
    * registers.
    *
    * Returns (normalized view (node, regs, hist…), backing frame,
    * hops swept). The backing is checkpointed and NOT freed — the
    * view reads it; callers free it once their derived result is
    * materialized. */
  private def packedSweep(edges: DataFrame, maxHops: Int, m: Int,
      hist: Seq[(String, String => String)])
      : (DataFrame, DataFrame, Int) = {
    require(Alphas.contains(m), s"unsupported register count $m")
    val zeroRho = 49 - java.lang.Integer.numberOfTrailingZeros(m)
    val sym = symmetrize(edges).localCheckpoint()
    val nodes = sym.select(col("src").as("node")).distinct()
    // ONE checkpointed frame per round backs both the state and the
    // delta (the delta is a filter over it — no second copy). free()
    // only acts on the bare LogicalRDD frame, so the backing frame is
    // tracked explicitly; state/delta are lazy selects over it.
    val init = initPacked(nodes, m, zeroRho)
    var backing = init
      .select(Seq(col("node"), col("regs")) ++ hist.map { case (n, e) =>
        expr(s"array(${e("regs")})").as(n) }: _*)
      .localCheckpoint()
    var state = backing
    var delta = backing
    val maxSlots = (0 until m).map(i =>
      max(element_at(col("regs"), i + 1)).as(s"r$i"))
    var hop = 0
    while (hop < maxHops && !delta.isEmpty) {
      hop += 1
      val cand = sym
        .join(delta.select(col("node").as("src"), col("regs")), "src")
        .groupBy(col("dst").as("node"))
        .agg(maxSlots.head, maxSlots.tail: _*)
        .select(col("node"),
          array((0 until m).map(i => col(s"r$i")): _*).as("cregs"))
      val stepCols = Seq(col("node"),
          when(col("cregs").isNull, col("regs"))
            .otherwise(expr(
              "zip_with(regs, cregs, (a, b) -> greatest(a, b))"))
            .as("nregs"),
          (col("cregs").isNotNull &&
            expr("zip_with(regs, cregs, (a, b) -> greatest(a, b))")
              =!= col("regs")).as("changed")) ++
        hist.map { case (n, _) => col(n) }
      // two selects so the history expressions see the merged `nregs`
      // column by NAME (Catalyst collapses the projections; the O(m)
      // folds stay per-row, per-hop)
      val merged = state.join(cand, Seq("node"), "left")
        .select(stepCols: _*)
        .select(Seq(col("node"), col("nregs"), col("changed")) ++
          hist.map { case (n, e) =>
            concat(col(n), array(expr(e("nregs")))).as(n) }: _*)
        .localCheckpoint()
      graft.util.Checkpoints.free(backing) // successor is materialized
      backing = merged
      state = merged.select(Seq(col("node"),
        col("nregs").as("regs")) ++ hist.map(h => col(h._1)): _*)
      delta = merged.filter(col("changed"))
        .select(col("node"), col("nregs").as("regs"))
    }
    graft.util.Checkpoints.free(sym)
    (state, backing, hop)
  }

  /** The per-node HLL estimate as a SQL expression over register
    * column `rc`: absent slots hold 0 → 2^-0 = 1 each, so the plain
    * fold IS zsum + (m − nreg) of the sparse formula; the small-range
    * linear-counting correction matches [[ballEstimates]] exactly. */
  private def estExpr(rc: String, m: Int): String = {
    val alpha = Alphas(m)
    val zsum = s"aggregate($rc, CAST(0 AS DOUBLE), " +
      "(acc, r) -> acc + pow(CAST('2' AS DOUBLE), -r))"
    val nreg = s"size(filter($rc, r -> r > 0))"
    s"CASE WHEN ($alpha * $m * $m) / ($zsum) <= 2.5 * $m " +
      s"AND $nreg < $m " +
      s"THEN $m * ln(CAST($m AS DOUBLE) / ($m - $nreg)) " +
      s"ELSE ($alpha * $m * $m) / ($zsum) END"
  }

  /** Per-hop per-node ball-size estimates from the PACKED sweep —
    * same (node, hop, est) contract as [[ballEstimates]], ~m× less
    * per-hop shuffle and two jobs per hop. The per-row fold over m
    * slots is deterministic slot order, so estimates don\'t depend on
    * partitioning. */
  def packedBallEstimates(edges: DataFrame, maxHops: Int = 10,
      m: Int = M): DataFrame = {
    val (view, backing, _) = packedSweep(edges, maxHops, m,
      Seq("est_hist" -> (rc => estExpr(rc, m))))
    val out = view
      .select(col("node"), posexplode(col("est_hist")).as(Seq("hop", "est")))
      .localCheckpoint()
    graft.util.Checkpoints.free(backing)
    out
  }

  /** The EXACT-INTEGER register table at hop `hops` — (node, idx, rho)
    * for every hit slot, identical to the sparse state by construction
    * (same md5₄₈ hash, same max algebra) and REPLAYABLE BY THE ORACLE:
    * DuckDB computes B(v, ≤hops) with unrolled self-joins and takes
    * per-(v, idx) max rho over the same portable hashes — the g17hp ★
    * twin that upgrades the estimator family from rows-only to
    * hash-checked. Convergence before `hops` is a fixpoint, so the
    * early-stopped state equals the hop-`hops` state. */
  def registerTable(edges: DataFrame, hops: Int = 2,
      m: Int = M): DataFrame = {
    val (view, _, _) = packedSweep(edges, hops, m, Nil)
    view.select(col("node"), posexplode(col("regs")).as(Seq("idx", "rho")))
      .filter(col("rho") > 0)
      .select(col("node"), col("idx").cast("int").as("idx"),
        col("rho").cast("int").as("rho"))
      .orderBy("node", "idx")
  }

  /** Per-node per-hop EXACT-INTEGER sufficient statistics of the HLL
    * estimate: zsum_scaled = Σ_slots 2^(49−rho) (absent slot rho=0 →
    * 2^49; ≤ m·2^49 ≤ 2^55, BIGINT-safe) and nreg = hit slots. The
    * double-typed estimate is exactly α·m²·2^49 / zsum_scaled — so
    * hash-checking these integers checks everything the estimator
    * depends on, without a double crossing the engine boundary
    * (the g18hp ★ twin). Early convergence is a fixpoint and the
    * oracle unrolls EVERY hop, so the converged statistics pad
    * forward to the full hop range. */
  def ballSums(edges: DataFrame, maxHops: Int = 2,
      m: Int = M): DataFrame = {
    val zs = (rc: String) => s"aggregate($rc, CAST(0 AS BIGINT), " +
      "(acc, r) -> acc + shiftleft(CAST(1 AS BIGINT), 49 - r))"
    val nr = (rc: String) => s"size(filter($rc, r -> r > 0))"
    val (view, _, _) = packedSweep(edges, maxHops, m,
      Seq("zsum_hist" -> zs, "nreg_hist" -> nr))
    view
      .select(col("node"), col("zsum_hist"), col("nreg_hist"),
        explode(expr(s"sequence(0, $maxHops)")).as("hop"))
      .select(col("node"), col("hop").cast("int").as("hop"),
        expr("element_at(zsum_hist, " +
          "least(hop + 1, size(zsum_hist)))").as("zsum_scaled"),
        expr("element_at(nreg_hist, " +
          "least(hop + 1, size(nreg_hist)))").cast("int").as("nreg"))
      .orderBy("node", "hop")
  }

  /** ALL-node closeness estimates (g17's statistic without the source
    * panel): n_reached_est = E(v, H) − 1, sum_dist_est =
    * Σ_h h·max(ΔE_h, 0). The per-node window runs over ≤ maxHops+1
    * rows — hop-grain, never data-grain. */
  def closeness(edges: DataFrame, maxHops: Int = 10,
      m: Int = M, packed: Boolean = true): DataFrame = {
    val w = Window.partitionBy(col("node")).orderBy(col("hop"))
    (if (packed) packedBallEstimates(edges, maxHops, m)
     else ballEstimates(edges, maxHops, m))
      .withColumn("d",
        greatest(col("est") - lag(col("est"), 1).over(w), lit(0.0)))
      .groupBy(col("node"))
      .agg(max(col("est")).as("efin"),
        sum(col("d") * col("hop")).as("sde"))
      .filter(col("sde") > 0)
      .select(col("node"),
        round(col("efin") - 1, 4).as("n_reached_est"),
        round(col("sde"), 4).as("sum_dist_est"),
        round((col("efin") - 1) / col("sde"), 6).as("closeness_est"))
      .orderBy("node")
  }

  /** Neighborhood function + effective diameter (g18's statistic over
    * ALL pairs, not a panel): cum(h) = Σ_v E(v, h) − n, per-hop pair
    * deltas, cumulative fraction, and the p90 hop. Hop-grain output. */
  def hopDistribution(edges: DataFrame, maxHops: Int = 10,
      m: Int = M, packed: Boolean = true): DataFrame = {
    val byHop = (if (packed) packedBallEstimates(edges, maxHops, m)
      else ballEstimates(edges, maxHops, m))
      .groupBy(col("hop"))
      .agg(sum(col("est")).as("tot_est"), count(lit(1)).as("n"))
      .select(col("hop"),
        greatest(col("tot_est") - col("n"), lit(0.0)).as("cum_est"))
    val w = Window.orderBy(col("hop"))
    val tot = byHop.agg(max(col("cum_est")).as("tot"))
    byHop
      .withColumn("n_pairs_est",
        greatest(col("cum_est") - coalesce(lag(col("cum_est"), 1)
          .over(w), lit(0.0)), lit(0.0)))
      .filter(col("hop") > 0)
      .crossJoin(broadcast(tot))
      .select(col("hop").cast("int").as("hop"),
        round(col("n_pairs_est"), 4).as("n_pairs_est"),
        round(col("cum_est"), 4).as("cum_pairs_est"),
        round(col("cum_est") / col("tot"), 6).as("cum_frac_est"),
        (col("cum_est") * 10 >= col("tot") * 9).as("reaches_p90"))
      .orderBy("hop")
  }
}
