package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sim.AnnIndexStore

/** sim14 persisted ANN index lifecycle: the store grows by append and
  * searches see the growth (probe-after-grow); the quantizer trained
  * at init is frozen — appends never move centroids. */
class AnnStoreSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def root(tag: String) =
    s"/tmp/graft_sink_annspec_$tag"

  test("probe-after-grow: an appended exact twin takes rank 1, and " +
    "append leaves the centroids bit-identical") {
    import spark.implicits._
    // two well-separated label clusters in 4 dims
    val seed = Seq(
      (1L, Seq(1.0, 0.1, 0.0, 0.0), 0),
      (2L, Seq(0.9, 0.0, 0.1, 0.0), 0),
      (3L, Seq(1.0, 0.0, 0.0, 0.1), 0),
      (4L, Seq(0.0, 1.0, 0.1, 0.0), 1),
      (5L, Seq(0.1, 0.9, 0.0, 0.0), 1),
      (6L, Seq(0.0, 1.0, 0.0, 0.1), 1))
      .toDF("vec_id", "embedding", "label")
    val q = Seq((100L, Seq(0.8, 0.05, 0.05, 0.0)))
      .toDF("vec_id", "embedding")
    val r = root("grow")
    AnnIndexStore.init(seed, r)
    val before = AnnIndexStore.search(spark, r, q, k = 1, probes = 1)
      .collect()
    assert(before.length === 1)
    val firstHit = before(0).getLong(2)
    assert(Set(1L, 2L, 3L).contains(firstHit),
      s"pre-grow top-1 must come from the label-0 seed, got $firstHit")
    val centsBefore = AnnIndexStore.centroids(spark, r)
      .orderBy("cl").collect().map(_.toString).toSeq

    // grow the store: id 200 is an exact twin of the query vector
    val batch = Seq(
      (200L, Seq(0.8, 0.05, 0.05, 0.0)),
      (201L, Seq(0.0, 0.95, 0.05, 0.0)))
      .toDF("vec_id", "embedding")
    val assigned = AnnIndexStore.append(spark, r, batch)
    assert(assigned.count() === 2)

    val after = AnnIndexStore.search(spark, r, q, k = 2, probes = 1)
      .orderBy("rank").collect()
    assert(after(0).getLong(2) === 200L,
      "post-grow top-1 must be the appended exact twin (cos = 1)")
    assert(after(0).getDouble(3) === 1.0)
    // the twin landed in the probed (label-0) cell, so search read
    // the GROWN list from disk, not a stale snapshot
    val centsAfter = AnnIndexStore.centroids(spark, r)
      .orderBy("cl").collect().map(_.toString).toSeq
    assert(centsAfter === centsBefore,
      "append must not retrain the quantizer")
    // lists really persisted: 6 seed + 2 appended
    assert(AnnIndexStore.vectors(spark, r).count() === 8)
  }

  test("two appends compose: both batches' vectors are probeable and " +
    "assignment at ingest equals assignment recomputed from frozen " +
    "centroids") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val seed = Seq(
      (1L, Seq(1.0, 0.0), 0), (2L, Seq(0.9, 0.1), 0),
      (3L, Seq(0.0, 1.0), 1), (4L, Seq(0.1, 0.9), 1))
      .toDF("vec_id", "embedding", "label")
    val r = root("compose")
    AnnIndexStore.init(seed, r)
    AnnIndexStore.append(spark, r,
      Seq((10L, Seq(0.95, 0.05))).toDF("vec_id", "embedding"))
    AnnIndexStore.append(spark, r,
      Seq((11L, Seq(0.05, 0.95))).toDF("vec_id", "embedding"))
    val vecs = AnnIndexStore.vectors(spark, r)
    assert(vecs.count() === 6)
    // each appended vector sits in the cell of its nearest centroid
    val cells = vecs.filter(col("vec_id") >= 10L)
      .select(col("vec_id"), col("cell")).collect()
      .map(row => row.getLong(0) -> row.getInt(1)).toMap
    assert(cells(10L) === 0 && cells(11L) === 1)
    // and a 2-probe search over the grown store finds both
    val hits = AnnIndexStore.search(spark, r,
        Seq((100L, Seq(0.7, 0.3))).toDF("vec_id", "embedding"),
        k = 6, probes = 2)
      .select(col("corpus_id")).collect().map(_.getLong(0)).toSet
    assert(hits === Set(1L, 2L, 3L, 4L, 10L, 11L))
  }
}
