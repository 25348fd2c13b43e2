package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.analytics.Experiment

/** A/B z-test and CUPED on planted fixtures: formulas pinned against
  * independent Scala arithmetic, degenerate designs yield NULL (not
  * NaN/Infinity), assignment is deterministic and outcome-blind. */
class ExperimentSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Hash arms for ids 1..n, read back through the production expr. */
  private def arms(n: Int): Map[Long, Long] =
    (1L to n.toLong).toDF("user_id")
      .withColumn("v", Experiment.variant("user_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("ab test matches hand-computed pooled two-proportion z on a " +
    "planted fixture") {
    val n = 40
    val v = arms(n)
    // conversion pattern fixed by id, independent of arm: every 3rd
    // user converts (one 'purchase' event), others only 'view'
    val events = (1L to n.toLong).flatMap { u =>
      val t = if (u % 3 == 0) "purchase" else "view"
      Seq((u, t), (u, "view"))
    }.toDF("user_id", "event_type")
    val row = Experiment.abTest(events).collect().head
    val (na, nb) = (v.count(_._2 == 0).toLong, v.count(_._2 == 1).toLong)
    val xa = v.count { case (u, a) => a == 0 && u % 3 == 0 }.toLong
    val xb = v.count { case (u, a) => a == 1 && u % 3 == 0 }.toLong
    assert((row.getLong(0), row.getLong(1), row.getLong(2),
      row.getLong(3)) === ((na, nb, xa, xb)))
    val p = (xa + xb).toDouble / (na + nb).toDouble
    val z = (xa.toDouble / na - xb.toDouble / nb) /
      math.sqrt(p * (1.0 - p) * (1.0 / na + 1.0 / nb))
    assert(math.abs(row.getDouble(7) - z) < 1e-6,
      s"z ${row.getDouble(7)} vs hand $z")
    assert(math.abs(row.getDouble(4) - xa.toDouble / na) < 1e-6)
  }

  test("degenerate designs yield NULL z: universal conversion has " +
    "zero pooled standard error") {
    val events = (1L to 10L).map(u => (u, "purchase"))
      .toDF("user_id", "event_type")
    val row = Experiment.abTest(events).collect().head
    assert(row.isNullAt(7), "all-converted design must not divide by 0")
    // and with zero conversions likewise
    val none = (1L to 10L).map(u => (u, "view"))
      .toDF("user_id", "event_type")
    assert(Experiment.abTest(none).collect().head.isNullAt(7))
  }

  test("assignment is deterministic and outcome-blind") {
    assert(arms(50) === arms(50))
    val both = arms(200).values.toSet
    assert(both === Set(0L, 1L), "both arms populated over 200 ids")
  }

  test("cuped: theta and variance reduction match hand-computed " +
    "moments; adjusted means shift by theta times the pre-period " +
    "imbalance") {
    val n = 30
    val v = arms(n)
    val cutoff = 1000L
    // y_u = 2*x_u + small id-dependent noise: strong X-Y correlation
    val xs = (1L to n.toLong).map(u => u -> (10.0 + u % 7)).toMap
    val ys = (1L to n.toLong).map(u => u -> (2 * xs(u) + u % 3)).toMap
    val events = (1L to n.toLong).flatMap { u =>
      Seq((u, 500L, xs(u)), (u, 1500L, ys(u)))
    }.toDF("user_id", "us", "value")
    val row = Experiment.cuped(events, cutoff).collect().head
    val sx = xs.values.sum; val sy = ys.values.sum
    val sxy = xs.map { case (u, x) => x * ys(u) }.sum
    val sxx = xs.values.map(x => x * x).sum
    val syy = ys.values.map(y => y * y).sum
    val cov = n * sxy - sx * sy
    val varX = n * sxx - sx * sx
    val varY = n * syy - sy * sy
    val theta = cov / varX
    assert(math.abs(row.getDouble(4) - theta) < 1e-6)
    assert(math.abs(row.getDouble(7) - cov * cov / (varX * varY)) < 1e-6,
      "var_reduction = squared X-Y correlation")
    val aUsers = (1L to n.toLong).filter(v(_) == 0)
    val meanYA = aUsers.map(ys).sum / aUsers.size
    val meanXA = aUsers.map(xs).sum / aUsers.size
    val adjA = meanYA - theta * (meanXA - sx / n)
    assert(math.abs(row.getDouble(5) - adjA) < 1e-4,
      s"adjusted A mean ${row.getDouble(5)} vs hand $adjA")
    assert(math.abs(row.getDouble(2) - meanYA) < 1e-4)
  }

  test("cuped: zero pre-period variance yields NULL theta and NULL " +
    "adjusted means, never NaN") {
    val events = (1L to 10L).flatMap { u =>
      Seq((u, 500L, 5.0), (u, 1500L, u.toDouble))
    }.toDF("user_id", "us", "value")
    val row = Experiment.cuped(events, 1000L).collect().head
    assert(row.isNullAt(4) && row.isNullAt(5) && row.isNullAt(6) &&
      row.isNullAt(7))
    assert(!row.isNullAt(2) && !row.isNullAt(3),
      "raw means still report")
  }
}
