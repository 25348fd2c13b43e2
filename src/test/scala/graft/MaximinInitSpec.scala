package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ml.KMeans

/** Maximin (k-means++-style deterministic) seeding on planted vectors. */
class MaximinInitSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("three orthogonal directions are found before any duplicate " +
    "of an already-chosen direction") {
    // ids 1..3: axis e1 (and near-copies), 4: axis e2, 5: axis e3
    val vecs = Seq(
      (1L, Seq(1.0, 0.0, 0.0)),
      (2L, Seq(0.999, 0.01, 0.0)), // near-dup of seed
      (3L, Seq(0.998, 0.02, 0.0)), // near-dup of seed
      (4L, Seq(0.0, 1.0, 0.0)),
      (5L, Seq(0.0, 0.0, 1.0)))
      .toDF("vec_id", "vec")
    val out = KMeans.maximinInit(vecs, k = 3).collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    assert(out.head === ((1, 1L)), "seed = lowest id")
    // rounds 2 and 3 must pick the two other axes (max_sim 0 beats
    // the near-duplicates' ~1.0), tie between 4 and 5 resolves to 4
    assert(out.map(_._2).toSet === Set(1L, 4L, 5L))
    assert(out(1)._2 === 4L, "orthogonal tie breaks to the lower id")
  }

  test("max_sim is NULL for the seed and the similarity to the " +
    "nearest chosen center for the rest") {
    val vecs = Seq(
      (10L, Seq(1.0, 0.0)),
      (20L, Seq(0.0, 1.0)),
      (30L, Seq(1.0, 1.0)))
      .toDF("vec_id", "vec")
    val out = KMeans.maximinInit(vecs, k = 2).collect()
    assert(out(0).isNullAt(2))
    // round 2 picks 20 (sim 0 to seed); 30 has sim 0.7071
    assert(out(1).getLong(1) === 20L && out(1).getDouble(2) === 0.0)
  }
}
