package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label propagation (Raghavan et al. 2007) for community
  * detection: every node starts labeled with itself; each round it
  * adopts the most frequent label among its neighbors PLUS itself,
  * breaking frequency ties on the smaller label. Including the node's
  * own vote damps the two-coloring oscillation plain synchronous LPA is
  * known for; the min tie-break makes every round a pure deterministic
  * function of the previous labeling — so a FIXED number of rounds is
  * identically reproducible on any engine or cluster layout (the
  * property the DuckDB twin relies on; convergence on top of that is
  * checked in the spec, not assumed).
  *
  * Scale per round: one join of the edge list with the label frame
  * (hash-partitioned on node id), one (node, label) count aggregate,
  * one partial-aggregatable min_by argmax — no windows, no global
  * structure; `localCheckpoint` truncates the self-referencing lineage
  * (the CC/PageRank/KCore rule).
  */
object LabelPropagation {

  /** @param edges two numeric-id columns `src`, `dst` (one row per
    *              undirected edge; orientation/duplication irrelevant)
    * @return (node, community) after exactly `rounds` synchronous
    *         updates */
  def run(edges: DataFrame, rounds: Int = 5): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    val sym = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint()
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("community", col("node"))
      .localCheckpoint()
    // node-sized label frame joins the edge frame every round: guarded
    // broadcast + size-derived edge partitioning (guide §3.1/§2.2, the
    // PageRank/CC pattern — the planner sort-merges unsized
    // LogicalRDDs otherwise)
    val fits = PageRank.broadcastFits(sym.sparkSession, labels.count())
    def side(df: DataFrame): DataFrame = if (fits) broadcast(df) else df
    val symL = PageRank.sized(sym, PageRank.edgePartitions(sym.count()))
    for (_ <- 0 until rounds) {
      val votes = symL
        .join(side(labels.select(col("node").as("dst"),
          col("community").as("nbr_label"))), "dst")
        .select(col("src").as("node"), col("nbr_label").as("label"))
        .unionAll(labels.select(col("node"),
          col("community").as("label")))
      val next = votes
        .groupBy(col("node"), col("label"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("node"))
        .agg(min_by(col("label"),
          struct((-col("cnt")).as("nc"), col("label"))).as("community"))
        .localCheckpoint()
      // eager release of the superseded round (see Checkpoints.free)
      graft.util.Checkpoints.free(labels)
      labels = next
    }
    graft.util.Checkpoints.free(sym)
    labels
  }

  /** The unrolled CTE chain shared by [[lpaSql]] and
    * [[Modularity.modularitySql]]: symmetrized simple edge set `e`,
    * initial labeling `l0`, and one (vote, argmax) CTE pair per round,
    * ending at `l$rounds`. MATERIALIZED because each round references
    * the previous labeling twice — via the edge join and the self
    * vote — so inlining would blow up exponentially (see
    * [[KCore.kcoreSql]]). */
  private[graph] def lpaCtes(edgesSql: String, rounds: Int): String = {
    val sb = new StringBuilder
    sb ++= s"WITH e AS MATERIALIZED (SELECT DISTINCT src, dst FROM " +
      s"(SELECT src, dst FROM $edgesSql " +
      s"UNION ALL SELECT dst, src FROM $edgesSql) WHERE src <> dst)"
    sb ++= ", l0 AS MATERIALIZED (SELECT DISTINCT src AS node, " +
      "src AS community FROM e)"
    for (r <- 1 to rounds) {
      sb ++= s", v$r AS MATERIALIZED (" +
        s"SELECT e.src AS node, l.community AS label " +
        s"FROM e JOIN l${r - 1} l ON e.dst = l.node " +
        s"UNION ALL SELECT node, community FROM l${r - 1})"
      sb ++= s", l$r AS MATERIALIZED (SELECT node, label AS community " +
        s"FROM (SELECT node, label, " +
        s"row_number() OVER (PARTITION BY node " +
        s"ORDER BY count(*) DESC, label) AS rn " +
        s"FROM v$r GROUP BY node, label) WHERE rn = 1)"
    }
    sb.toString
  }

  /** DuckDB twin: the same fixed `rounds` synchronous updates unrolled
    * as chained MATERIALIZED CTEs. */
  def lpaSql(edgesSql: String, rounds: Int = 5): String =
    lpaCtes(edgesSql, rounds) +
      s" SELECT node, community FROM l$rounds ORDER BY node"

  /** COMMUNITY CONDUCTANCE (g21) — the partition-quality eval for the
    * communities [[run]] finds: per community, cut / vol where vol =
    * 2·internal + cut (every member's incident edge is one or the
    * other, so no degree table is needed). Low conductance = a real
    * community (few escaping edges); 1.0 = pure bridge nodes. The
    * "did the algorithm find structure" readout next to g13's
    * modularity — modularity scores the PARTITION, conductance scores
    * each community, which is what an application prunes on.
    *
    * Exact integers until one rounded division; canonical (least,
    * greatest) undirected edges counted once, cut edges charged to
    * BOTH sides. Scale: one labels join per edge endpoint + two
    * community-grain aggregates; vol > 0 always (members exist only
    * via edges). */
  def conductance(edges: DataFrame, rounds: Int = 5): DataFrame = {
    val labels = run(edges, rounds) // already checkpoint-materialized
    val fits = PageRank.broadcastFits(edges.sparkSession, labels.count())
    def side(df: DataFrame): DataFrame = if (fits) broadcast(df) else df
    val e = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val tagged = e
      .join(side(labels.select(col("node").as("a"),
        col("community").as("ca"))), Seq("a"))
      .join(side(labels.select(col("node").as("b"),
        col("community").as("cb"))), Seq("b"))
      .localCheckpoint() // edge-grain, referenced by both counters
    val internal = tagged.filter(col("ca") === col("cb"))
      .groupBy(col("ca").as("community"))
      .agg(count(lit(1)).as("n_internal"))
    val cut = tagged.filter(col("ca") =!= col("cb"))
      .select(col("ca").as("community"))
      .unionAll(tagged.filter(col("ca") =!= col("cb"))
        .select(col("cb").as("community")))
      .groupBy(col("community"))
      .agg(count(lit(1)).as("n_cut"))
    labels.groupBy(col("community")).agg(count(lit(1)).as("n_nodes"))
      .join(internal, Seq("community"), "left")
      .join(cut, Seq("community"), "left")
      .select(col("community"), col("n_nodes"),
        coalesce(col("n_internal"), lit(0L)).as("n_internal"),
        coalesce(col("n_cut"), lit(0L)).as("n_cut"),
        round(coalesce(col("n_cut"), lit(0L)).cast("double") /
          (lit(2) * coalesce(col("n_internal"), lit(0L)) +
            coalesce(col("n_cut"), lit(0L))).cast("double"), 6)
          .as("conductance"))
      .orderBy("community")
  }

  /** DuckDB twin of [[conductance]]. */
  def conductanceSql(edgesSql: String, rounds: Int = 5): String =
    lpaCtes(edgesSql, rounds) +
      s""", lab AS (SELECT node, community FROM l$rounds),
         |ed AS (SELECT DISTINCT least(src, dst) AS a,
         |    greatest(src, dst) AS b FROM $edgesSql WHERE src <> dst),
         |tg AS (SELECT la.community AS ca, lb.community AS cb
         |  FROM ed JOIN lab la ON la.node = ed.a
         |  JOIN lab lb ON lb.node = ed.b),
         |icnt AS (SELECT ca AS community,
         |    CAST(count(*) AS BIGINT) AS n_internal
         |  FROM tg WHERE ca = cb GROUP BY 1),
         |ccnt AS (SELECT c AS community,
         |    CAST(count(*) AS BIGINT) AS n_cut FROM (
         |    SELECT ca AS c FROM tg WHERE ca <> cb
         |    UNION ALL SELECT cb AS c FROM tg WHERE ca <> cb)
         |  GROUP BY 1),
         |nn AS (SELECT community, CAST(count(*) AS BIGINT) AS n_nodes
         |  FROM lab GROUP BY 1)
         |SELECT nn.community, nn.n_nodes,
         |  coalesce(icnt.n_internal, 0) AS n_internal,
         |  coalesce(ccnt.n_cut, 0) AS n_cut,
         |  round(CAST(coalesce(ccnt.n_cut, 0) AS DOUBLE) /
         |    (2 * coalesce(icnt.n_internal, 0)
         |      + coalesce(ccnt.n_cut, 0)), 6) AS conductance
         |FROM nn LEFT JOIN icnt USING (community)
         |LEFT JOIN ccnt USING (community)
         |ORDER BY community""".stripMargin.replace('\n', ' ')
}
