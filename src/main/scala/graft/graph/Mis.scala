package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Maximal independent set (g16) — Luby-style with FIXED hash
  * priorities: node v joins the MIS in the first round where its
  * priority (md5₄₈(v), v) is a strict local minimum among still-
  * undecided neighbors; its neighbors drop out; repeat to fixpoint.
  * With fixed (not per-round) priorities the result is exactly the
  * sequential greedy MIS under the hash order — one canonical answer,
  * reproducible across engines, runs, and partitionings — while the
  * computation keeps Luby's parallel O(log n)-round shape. MIS is the
  * classic symmetry-breaking primitive (scheduling conflict-free
  * work, picking cluster exemplars over a conflict graph, distributed
  * coloring's inner step).
  *
  * Scale: each round is the undirected edge list joined to the
  * node-sized undecided frame on BOTH endpoints (partial-aggregatable
  * distinct over losers/excluded — shuffles bounded by the live
  * neighborhood, which shrinks geometrically), followed by two
  * node-sized anti-joins; every frame localCheckpoints per round
  * (lineage truncation, the PageRank/KTruss discipline). The
  * data-dependent round count terminates via a driver-side scalar
  * count per round — the established fixpoint pattern; the DuckDB
  * twin unrolls a fixed round budget whose surplus rounds are
  * no-ops once the undecided set empties. */
object Mis {

  private val prio =
    "CAST(conv(substring(md5(CAST(node AS STRING)), 1, 12), 16, 10) " +
      "AS BIGINT)"
  private val prioSql =
    "CAST(('0x' || substr(md5(CAST(node AS VARCHAR)), 1, 12)) AS BIGINT)"

  /** @param edges (src, dst) edge list, symmetrized + deduped
    *              internally (treated as undirected)
    * @return (node, round) — MIS members and the round each joined */
  def run(edges: DataFrame): DataFrame = {
    val fwd = edges.select(col("src"), col("dst"))
    val sym = fwd.unionAll(fwd.select(col("dst").as("src"),
      col("src").as("dst"))).distinct().persist()
    var u = sym.select(col("src").as("node")).distinct()
      .withColumn("p", expr(prio)).localCheckpoint()
    val out = Seq.newBuilder[DataFrame]
    var round = 0
    while (u.limit(1).count() > 0) {
      round += 1
      val losers = sym
        .join(u.select(col("node").as("src"), col("p").as("ps")), "src")
        .join(u.select(col("node").as("dst"), col("p").as("pd")), "dst")
        .filter(col("pd") < col("ps") ||
          (col("pd") === col("ps") && col("dst") < col("src")))
        .select(col("src").as("node")).distinct()
      val winners = u.join(losers, Seq("node"), "left_anti")
        .select(col("node")).localCheckpoint()
      out += winners.withColumn("round", lit(round.toLong))
      val excluded = sym
        .join(winners.select(col("node").as("src")), "src")
        .select(col("dst").as("node")).distinct()
      val nextU = u.join(winners.unionAll(excluded), Seq("node"),
        "left_anti").localCheckpoint()
      // winners is checkpointed (its lazy withColumn in `out` survives
      // this) and nextU is materialized — the old undecided set is dead
      graft.util.Checkpoints.free(u)
      u = nextU
    }
    graft.util.Checkpoints.free(u) // final (empty) undecided set
    sym.unpersist(blocking = false)
    out.result().reduce(_.unionAll(_)).orderBy("node")
  }

  /** DuckDB twin of [[run]]: `rounds` unrolled fixpoint steps —
    * surplus rounds are no-ops on an empty undecided set, so any
    * budget ≥ the engine's data-dependent round count matches. */
  // every CTE is MATERIALIZED: DuckDB inlines plain CTEs per
  // reference, so a 12-round NOT-EXISTS chain would re-expand (and
  // re-open the base parquet) exponentially
  def sql(edgesRel: String, rounds: Int = 12): String = {
    val pre =
      s"""fwd AS MATERIALIZED (SELECT src, dst FROM $edgesRel),
         |sym AS MATERIALIZED (SELECT DISTINCT src, dst FROM
         |  (SELECT src, dst FROM fwd
         |   UNION ALL SELECT dst, src FROM fwd)),
         |u0 AS MATERIALIZED (SELECT node, $prioSql AS p FROM
         |  (SELECT DISTINCT src AS node FROM sym))"""
        .stripMargin.replace('\n', ' ')
    val steps = (1 to rounds).map { k =>
      s"""w$k AS MATERIALIZED (SELECT a.node FROM u${k - 1} a
         |  WHERE NOT EXISTS (SELECT 1 FROM sym e
         |    JOIN u${k - 1} b ON b.node = e.dst
         |    WHERE e.src = a.node
         |      AND (b.p < a.p OR (b.p = a.p AND e.dst < e.src)))),
         |u$k AS MATERIALIZED (SELECT a.node, a.p FROM u${k - 1} a
         |  WHERE NOT EXISTS (SELECT 1 FROM w$k w
         |      WHERE w.node = a.node)
         |    AND NOT EXISTS (SELECT 1 FROM sym e JOIN w$k w
         |      ON w.node = e.src WHERE e.dst = a.node))"""
        .stripMargin.replace('\n', ' ')
    }.mkString(", ")
    val sel = (1 to rounds).map { k =>
      s"SELECT node, CAST($k AS BIGINT) AS round FROM w$k"
    }.mkString(" UNION ALL ")
    s"WITH $pre, $steps $sel ORDER BY node"
  }
}
