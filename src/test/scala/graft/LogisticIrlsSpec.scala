package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ml.LogisticIrls

class LogisticIrlsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("first Newton step matches the exact hand computation") {
    // from beta = 0: p = 1/2, w = 1/4 exactly, so on {(1,1), (-1,0)}
    // sw = 1/2, swx = 0, swxx = 1/2, g0 = 0, g1 = 1, det = 1/4
    // -> beta_1 = (0 + (1/2*0 - 0)/0.25, 0 + (1/2*1 - 0)/0.25) = (0, 2)
    val d = Seq((1.0, 1.0), (-1.0, 0.0)).toDF("x", "y")
    val got = LogisticIrls.train(d, "x", "y", iters = 1).collect()
    assert(got.length === 1)
    assert(got(0).getInt(0) === 1)
    assert(got(0).getDouble(1) === 0.0)
    assert(got(0).getDouble(2) === 2.0)
  }

  test("separable planted relationship drives b1 up every iteration") {
    val d = (-20 to 20).filter(_ != 0)
      .map(i => (i / 10.0, if (i > 0) 1.0 else 0.0))
      .toDF("x", "y")
    val bs = LogisticIrls.train(d, "x", "y", iters = 3).collect()
      .map(r => r.getInt(0) -> r.getDouble(2)).sortBy(_._1).map(_._2)
    assert(bs(0) > 0.0)
    assert(bs(1) > bs(0))
    assert(bs(2) > bs(1))
  }

  test("negated labels flip the learned slope exactly") {
    val d = (-20 to 20).filter(_ != 0)
      .map(i => (i / 10.0, if (i > 0) 1.0 else 0.0))
    val pos = LogisticIrls.train(d.toDF("x", "y"), "x", "y", 2).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    val neg = LogisticIrls.train(
      d.map { case (x, y) => (x, 1.0 - y) }.toDF("x", "y"),
      "x", "y", 2).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    // symmetric x grid: negating y negates both coefficients
    assert(pos.map { case (t, a, b) => (t, -a, -b) }.toSeq === neg.toSeq)
  }

  test("trajectory is invariant to input partitioning") {
    val d = (1 to 500)
      .map(i => (math.sin(i.toDouble), if (i % 3 == 0) 1.0 else 0.0))
      .toDF("x", "y")
    val a = LogisticIrls.train(d, "x", "y", 3).collect().toSeq
    val b = LogisticIrls.train(d.repartition(7), "x", "y", 3)
      .collect().toSeq
    assert(a === b)
  }
}
