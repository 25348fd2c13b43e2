package graft

import org.scalatest.funsuite.AnyFunSuite

/** Fellegi–Sunter linkage via the registered er6 query on sf0.001:
  * the decision bands must be populated the way the planted
  * perturbations dictate. */
class FellegiSunterSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val rows =
    SparkEntry.queries("er6_fellegi_sunter")(spark, dir).collect()

  test("every dirty record resolves to its own source record — the " +
    "multi-field score survives single-field perturbations") {
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) === r.getLong(1),
        s"d_key ${r.getLong(0)} matched ${r.getLong(1)}")
    }
  }

  test("records with more perturbed fields score lower; clean-field " +
    "records clear the match band") {
    val byKey = rows.map(r => r.getLong(0) ->
      (r.getDouble(2), r.getString(3))).toMap
    // keys ending 7 with key % 4 != 0 and key % 2 != 0 keep segment
    // AND balance agreement -> highest scores
    val cleanish = byKey.filter { case (k, _) => k % 2 != 0 && k % 4 != 0 }
    val doubly = byKey.filter { case (k, _) => k % 4 == 0 }
    assert(cleanish.nonEmpty)
    if (doubly.nonEmpty) {
      val minClean = cleanish.values.map(_._1).min
      val maxDirty = doubly.values.map(_._1).max
      assert(minClean > maxDirty,
        s"perturbation did not reduce score: $minClean <= $maxDirty")
    }
    assert(cleanish.values.forall(_._2 == "match"))
  }

  test("decisions follow the score bands exactly") {
    rows.foreach { r =>
      val (s, d) = (r.getDouble(2), r.getString(3))
      val expect = if (s > 10) "match"
        else if (s > 0) "possible" else "non_match"
      assert(d === expect)
    }
  }
}
