package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.SemDedup

/** SemDeDup semantics on hand-built vectors: within-cluster prune,
  * least-centroid-sim representative, cluster-bounded comparisons. */
class SemDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def centroids = Seq(
    (0, Seq(1.0, 0.0, 0.0, 0.0)),
    (1, Seq(0.0, 1.0, 0.0, 0.0))
  ).toDF("label", "centroid")

  test("planted semantic dupes collapse to ONE representative — the " +
    "member least similar to its centroid, min-id tie-break") {
    val vecs = Seq(
      (1L, Seq(1.0, 0.0, 0.0, 0.0)),      // cluster 0, csim 1.0
      (2L, Seq(0.999, 0.02, 0.0, 0.0)),   // near-dup of 1, csim < 1.0
      (3L, Seq(0.8, 0.3, 0.0, 0.0)),      // cluster 0, distinct
      (4L, Seq(0.0, 1.0, 0.0, 0.0))       // cluster 1, alone
    ).toDF("vec_id", "vec")
    val kept = SemDedup.semanticDedup(vecs, centroids, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
    // the duplicate set {1, 2} keeps 2 (lower centroid sim), drops 1
    assert(kept.toSeq === Seq((2L, 0), (3L, 0), (4L, 1)))
  }

  test("comparisons are cluster-bounded: a near-dup pair straddling a " +
    "cluster boundary survives (the documented SemDeDup trade-off)") {
    val vecs = Seq(
      (1L, Seq(0.72, 0.69, 0.0, 0.0)), // argmax → cluster 0
      (2L, Seq(0.69, 0.72, 0.0, 0.0))  // argmax → cluster 1
    ).toDF("vec_id", "vec")
    val kept = SemDedup.semanticDedup(vecs, centroids, threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
    assert(kept.toSeq === Seq((1L, 0), (2L, 1)),
      "cosine(v1,v2) ≈ 0.998 but clusters differ — never compared")
  }

  test("transitive duplicate chains collapse to one keeper per " +
    "component, not one per pair") {
    val vecs = Seq(
      (1L, Seq(1.0, 0.0, 0.0, 0.0)),
      (2L, Seq(0.999, 0.0447, 0.0, 0.0)),
      (3L, Seq(0.996, 0.0893, 0.0, 0.0)) // near 2, maybe not near 1
    ).toDF("vec_id", "vec")
    val kept = SemDedup.semanticDedup(vecs, centroids, threshold = 0.998)
      .collect().map(_.getLong(0)).sorted
    assert(kept.length === 1, s"chain must collapse to one keeper, " +
      s"got ${kept.mkString(",")}")
    assert(kept.head === 3L, "3 has the lowest centroid sim")
  }
}
