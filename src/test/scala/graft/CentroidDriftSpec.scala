package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sim.Similarity

/** Embedding centroid drift (sim13): identical batches read cos ≈ 1
  * and stay quiet, scale-invariance (a doubled batch is NOT drift),
  * orthogonal/opposite rotations flag with the exact cosine, and
  * empty legs fail toward drifted. */
class CentroidDriftSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  // rows: (label, src, pos, q)
  private def df(rows: Seq[(Int, Int, Int, Long)]) = {
    import spark.implicits._
    rows.toDF("label", "src", "pos", "q")
  }

  test("identical, scaled, orthogonal and opposite centroids") {
    // label 0: identical single vector (1e6, 0) in both batches
    // label 1: cur = two copies of ref's vector → sums scale ×2,
    //          cosine unchanged (drift is direction, not volume)
    // label 2: ref along pos0, cur along pos1 → cos 0
    // label 3: cur = −ref → cos −1
    val rows = Seq(
      (0, 0, 0, 1000000L), (0, 0, 1, 0L),
      (0, 1, 0, 1000000L), (0, 1, 1, 0L),
      (1, 0, 0, 700000L), (1, 0, 1, 300000L),
      (1, 1, 0, 700000L), (1, 1, 1, 300000L),
      (1, 1, 0, 700000L), (1, 1, 1, 300000L),
      (2, 0, 0, 1000000L), (2, 0, 1, 0L),
      (2, 1, 0, 0L), (2, 1, 1, 1000000L),
      (3, 0, 0, 1000000L), (3, 0, 1, 0L),
      (3, 1, 0, -1000000L), (3, 1, 1, 0L))
    val out = Similarity.centroidDrift(df(rows)).collect()
      .map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .toMap
    assert(out(0)._3 >= 999999L && !out(0)._4, "identical ⇒ quiet")
    assert(out(1)._1 === 1L && out(1)._2 === 2L)
    assert(out(1)._3 >= 999999L && !out(1)._4,
      "volume change alone is not drift")
    assert(out(2)._3 === 0L && out(2)._4, "orthogonal ⇒ cos 0, flagged")
    assert(out(3)._3 === -1000000L && out(3)._4, "opposite ⇒ cos −1")
  }

  test("an empty leg fails toward drifted (NULL cosine coalesces true)") {
    val rows = Seq((5, 0, 0, 1000000L)) // ref only, no cur rows
    val out = Similarity.centroidDrift(df(rows)).collect()(0)
    assert(out.isNullAt(3) && out.getBoolean(4),
      "missing batch must alarm, not pass silently")
  }
}
