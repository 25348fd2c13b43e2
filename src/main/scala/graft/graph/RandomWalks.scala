package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic uniform random walks (the node2vec/DeepWalk corpus
  * generator at p = q = 1): from each start node, take `steps` uniform
  * steps over the directed edge list and emit the full walk as
  * (walk, step, node) rows — the embedding-training precursor that
  * turns a graph into token sequences.
  *
  * "Random" is the repo's RNG-free convention: the step-k choice from
  * node v on walk w is neighbor index md5₄₈(w|k|v) mod outdeg(v) over
  * the neighbor list RANKED BY destination id — reproducible across
  * engines, runs, and partitionings, and the DuckDB oracle replays
  * the identical choices (same hash, same ranking) with one unrolled
  * CTE per step. A 48-bit hash mod small degrees is uniform to
  * ~2⁻⁴⁸ — bias far below anything an embedding consumer can see.
  *
  * Scale design: the ranked adjacency (src, idx → dst) and the
  * node-sized degree table are built once (one window over edges
  * partitioned BY src — never a global sort) and cached; each step is
  * (a) a broadcast join of the walk frontier against degrees to
  * compute the pick, then (b) one EQUI-join on (src, idx) against the
  * cached adjacency — exact keys, no degree-sized blow-up before a
  * filter, frontier-sized shuffle only. Walks that reach a sink
  * (outdeg 0) terminate by the inner join, identically in both
  * engines. */
object RandomWalks {

  private def choiceHash(k: Int): org.apache.spark.sql.Column =
    expr(s"CAST(conv(substring(md5(concat(CAST(walk AS STRING), '|', " +
      s"CAST($k AS STRING), '|', CAST(cur AS STRING))), 1, 12), " +
      s"16, 10) AS BIGINT)")

  private def choiceHashSql(k: Int, walk: String, cur: String): String =
    s"CAST(('0x' || substr(md5(CAST($walk AS VARCHAR) || '|' || " +
      s"CAST($k AS VARCHAR) || '|' || CAST($cur AS VARCHAR)), 1, 12)) " +
      s"AS BIGINT)"

  /** @param edges  (src, dst) directed edges (deduped internally)
    * @param starts one `node` column; each start owns one walk keyed
    *               by its node id
    * @return (walk, step, node) for step 0..`steps`, walk-terminated
    *         early at sinks */
  def run(edges: DataFrame, starts: DataFrame,
      steps: Int = 4): DataFrame = {
    val adj = edges.select(col("src"), col("dst")).distinct()
      .withColumn("idx",
        (row_number().over(Window.partitionBy(col("src"))
          .orderBy(col("dst"))) - 1).cast("long"))
      .persist()
    val deg = adj.groupBy(col("src"))
      .agg(count(lit(1)).as("outdeg")).localCheckpoint()
    var cur = starts.select(col("node").as("walk"),
      col("node").as("cur"))
    val levels = Seq.newBuilder[DataFrame]
    levels += cur.select(col("walk"), lit(0L).as("step"),
      col("cur").as("node"))
    for (k <- 1 to steps) {
      val picked = cur
        .join(broadcast(deg), cur("cur") === deg("src"))
        .select(col("walk"), col("cur"),
          (choiceHash(k) % col("outdeg")).as("pick"))
      // localCheckpoint: truncates lineage so the per-step re-join
      // against the SAME cached adjacency never trips the self-join
      // ambiguity, and the final 5-way union re-reads materialized
      // levels instead of recomputing the whole chain per branch
      cur = picked
        .join(adj, picked("cur") === adj("src") &&
          picked("pick") === adj("idx"))
        .select(col("walk"), adj("dst").as("cur"))
        .localCheckpoint()
      levels += cur.select(col("walk"), lit(k.toLong).as("step"),
        col("cur").as("node"))
    }
    // Every level is localCheckpoint-materialized by now (eager), so
    // nothing in the output's lineage references the cached adjacency
    // — free its E-sized blocks IMMEDIATELY instead of leaving them
    // for the inter-query sweep's GC point. This was g15's bench
    // dispersion: each sample persisted a fresh adjacency copy whose
    // blocks survived the sample, inflating later in-pass work
    // (BENCH_FULL r11: samples 72.1/5.4/15.5 on identical plans).
    adj.unpersist(blocking = false)
    levels.result().reduce(_.unionAll(_)).orderBy("walk", "step")
  }

  /** DuckDB twin of [[run]]: one CTE per step, identical hash and
    * neighbor ranking. */
  def sql(edgesRel: String, startsRel: String, steps: Int = 4): String = {
    val pre =
      s"""edges AS (SELECT DISTINCT src, dst FROM $edgesRel),
         |adj AS (SELECT src, dst,
         |  CAST(row_number() OVER (PARTITION BY src ORDER BY dst) - 1
         |    AS BIGINT) AS idx FROM edges),
         |deg AS (SELECT src, count(*) AS outdeg FROM adj GROUP BY 1),
         |w0 AS (SELECT node AS walk, node AS cur FROM $startsRel)"""
        .stripMargin.replace('\n', ' ')
    val stepCtes = (1 to steps).map { k =>
      s"""w$k AS (SELECT w.walk, a.dst AS cur
         |  FROM w${k - 1} w
         |  JOIN deg d ON w.cur = d.src
         |  JOIN adj a ON a.src = w.cur
         |    AND a.idx = ${choiceHashSql(k, "w.walk", "w.cur")}
         |      % d.outdeg)""".stripMargin.replace('\n', ' ')
    }.mkString(", ")
    val sel = (0 to steps).map { k =>
      s"SELECT walk, CAST($k AS BIGINT) AS step, cur AS node FROM w$k"
    }.mkString(" UNION ALL ")
    s"WITH $pre, $stepCtes $sel ORDER BY walk, step"
  }
}
