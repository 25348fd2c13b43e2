package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sim.Similarity

/** Semantic deduplication (d12) — the embedding-space sibling of the
  * text near-dup pipeline (d6) and the SemDeDup construction
  * (Abbas et al. 2023): cluster the corpus, find cosine-near pairs only
  * WITHIN a cluster, connected-components the pairs, and keep one
  * representative per duplicate set — the member LEAST similar to its
  * cluster centroid (the paper's choice: prefer the most "prototypical
  * distance" example, i.e. drop the redundant core), tie-broken by min
  * id so the pick is total-ordered and engine-portable.
  *
  * Scale shape: the quadratic stage is bounded by CLUSTER size, never
  * the corpus — k grows with the corpus so |cluster| stays ~constant
  * (SemDeDup runs 50k clusters at LAION scale); the pair join is keyed
  * by cluster id, the component graph is |near-dup pairs|-sized, the
  * loser list broadcasts under AQE, and the corpus itself never
  * re-shuffles for the final anti join. Centroid assignment is the x10
  * max_by argmax under a broadcast centroid table — nothing sorts the
  * corpus. */
object SemDedup {

  /** Nearest-centroid assignment (the x10 shape): `vecs` (idCol, vec:
    * array<double>) × broadcast `centroids` (label, centroid) →
    * (idCol, cluster, csim), argmax by (sim desc, label asc), sims
    * rounded to 4 dp for cross-engine stability. */
  def assign(vecs: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id"): DataFrame =
    vecs.join(broadcast(centroids))
      .withColumn("csim",
        round(Similarity.cosine(col("vec"), col("centroid")), 4))
      .groupBy(col(idCol))
      .agg(max_by(
        struct(col("label"), col("csim")),
        struct(col("csim"), (-col("label")).as("neg_label"))).as("best"))
      .select(col(idCol), col("best.label").as("cluster"),
        col("best.csim").as("csim"))

  /** Drop semantic near-duplicates: returns the KEPT rows
    * (idCol, cluster, csim). A pair is duplicate iff both members land
    * in the same cluster and their cosine (4 dp) reaches `threshold`;
    * duplicate sets are transitive closures of such pairs. */
  def semanticDedup(vecs: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", threshold: Double = 0.95): DataFrame = {
    // consumed three times below (pair join, keeper pick, final
    // anti join) — materialize the argmax once instead of re-running
    // the corpus x centroid assignment per consumer (the
    // twice-consumed-frame discipline)
    val assigned = assign(vecs, centroids, idCol).localCheckpoint()
    val members = assigned.join(vecs, Seq(idCol))
    val pairs = members
      .select(col("cluster"), col(idCol).as("id_a"), col("vec").as("va"))
      .join(members.select(col("cluster"), col(idCol).as("id_b"),
        col("vec").as("vb")), Seq("cluster"))
      .filter(col("id_a") < col("id_b"))
      .filter(round(Similarity.cosine(col("va"), col("vb")), 4)
        >= threshold)
      .select(col("id_a"), col("id_b"))
    val comp = graft.graph.ConnectedComponents.run(pairs)
    val keepers = comp
      .join(assigned.select(col(idCol).as("node"), col("csim")),
        Seq("node"))
      .groupBy(col("component"))
      .agg(min_by(col("node"), struct(col("csim"), col("node")))
        .as("keep_id"))
    val losers = comp.join(keepers, Seq("component"))
      .filter(col("node") =!= col("keep_id"))
      .select(col("node").as(idCol))
    assigned.join(losers, Seq(idCol), "left_anti")
  }
}
