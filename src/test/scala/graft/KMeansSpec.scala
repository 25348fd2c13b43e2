package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ml.KMeans

/** Deterministic Lloyd semantics on hand vectors: warm-start
  * reassignment, exact updated centroids, empty-cluster vanishing. */
class KMeansSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def init(vecs: Seq[(Long, Seq[Double], Int)]) = {
    // per-label mean, the same warm start the harness query uses
    val byLabel = vecs.groupBy(_._3).toSeq.map { case (l, vs) =>
      val dims = vs.map(_._2).transpose.map(d => d.sum / d.size)
      (l, dims)
    }
    byLabel.toDF("label", "centroid")
  }

  test("a mislabeled point reassigns in iteration 1 and the updated " +
    "centroids are the exact member means") {
    val data = Seq(
      (1L, Seq(1.0, 0.0, 0.0, 0.0), 0),
      (2L, Seq(0.9, 0.1, 0.0, 0.0), 1), // mislabeled: nearest cluster 0
      (3L, Seq(0.0, 1.0, 0.0, 0.0), 1),
      (4L, Seq(0.0, 0.9, 0.1, 0.0), 1)
    )
    val out = KMeans.lloyd(
      data.map(t => (t._1, t._2)).toDF("vec_id", "vec"),
      init(data), iters = 2)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val sizes = out.map(r => r._1 -> r._2).distinct.toMap
    assert(sizes === Map(0 -> 2L, 1 -> 2L),
      "v2 must migrate to cluster 0 in iteration 1")
    val dim = out.map(r => (r._1, r._3) -> r._4).toMap
    assert(dim((0, 0L)) === 0.95 && dim((0, 1L)) === 0.05)
    assert(dim((1, 1L)) === 0.95 && dim((1, 2L)) === 0.05)
  }

  test("simplified silhouette: tight clusters score 1, a boundary " +
    "point scores 0 (and ties assign to the lower label)") {
    val centroids = Seq(
      (0, Seq(1.0, 0.0, 0.0, 0.0)),
      (1, Seq(0.0, 1.0, 0.0, 0.0))
    ).toDF("label", "centroid")
    val vecs = Seq(
      (1L, Seq(1.0, 0.0, 0.0, 0.0)),
      (2L, Seq(1.0, 0.0, 0.0, 0.0)),
      (3L, Seq(0.0, 1.0, 0.0, 0.0)),
      (4L, Seq(0.0, 1.0, 0.0, 0.0)),
      (5L, Seq(0.7071, 0.7071, 0.0, 0.0)) // equidistant boundary
    ).toDF("vec_id", "vec")
    val out = KMeans.simplifiedSilhouette(vecs, centroids)
      .collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(0)._1 === 3L, "the tie must land on the lower label")
    assert(out(1)._1 === 2L)
    assert(out(1)._2 === 1.0, "axis-aligned members: a=0, b=1 → s=1")
    assert(out(0)._2 === 0.6667, "(1 + 1 + 0)/3 — boundary point s=0")
  }

  test("a cluster whose members all defect vanishes from the output") {
    val data = Seq(
      (1L, Seq(1.0, 0.0, 0.0, 0.0), 0),
      (2L, Seq(0.0, 1.0, 0.0, 0.0), 1),
      // label 2's mean (0.495, 0.495, …) is farther from each member
      // than the axis centroids are — both defect, cluster 2 dies
      (3L, Seq(0.99, 0.0, 0.0, 0.0), 2),
      (4L, Seq(0.0, 0.99, 0.0, 0.0), 2)
    )
    val out = KMeans.lloyd(
      data.map(t => (t._1, t._2)).toDF("vec_id", "vec"),
      init(data), iters = 2)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(out.map(_._1).distinct.sorted.toSeq === Seq(0, 1))
    assert(out.map(r => r._1 -> r._2).distinct.toMap ===
      Map(0 -> 2L, 1 -> 2L))
  }
}
