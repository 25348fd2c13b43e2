package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ml.LinearShap

/** Exact linear Shapley: recovers a noiseless model, attributions
  * sum to pred − base, an orthogonal irrelevant feature gets exactly
  * zero, a singular design yields NULLs. */
class LinearShapSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("noiseless y = 3 + 2 x1 - x2 is recovered exactly and " +
    "attributions reconstruct the prediction") {
    val data = Seq(
      (1L, 1L, 1L), (2L, 2L, 1L), (3L, 1L, 3L), (4L, 4L, 2L),
      (5L, 3L, 5L)
    ).map { case (id, a, b) => (id, a, b, BigDecimal(3 + 2 * a - b)) }
      .toDF("id", "x1", "x2", "y")
    val out = LinearShap.attribute(data, "id", "x1", "x2", "y",
      explainFilter = lit(true)).collect()
    out.foreach { r =>
      assert(math.abs(r.getDouble(5) - 2.0) < 1e-6, "beta1 = 2")
      assert(math.abs(r.getDouble(6) + 1.0) < 1e-6, "beta2 = -1")
      val y = r.getDecimal(3).doubleValue()
      assert(math.abs(r.getDouble(9) - y) < 1e-5,
        "noiseless fit predicts y exactly")
      val recon = r.getDouble(4) + r.getDouble(7) + r.getDouble(8)
      assert(math.abs(r.getDouble(9) - recon) < 1e-5,
        "pred = base + phi1 + phi2")
    }
  }

  test("a feature orthogonal to both y and the other feature gets " +
    "attribution exactly zero") {
    val data = Seq(
      (1L, 1L, 1L, BigDecimal(2)), (2L, 1L, 2L, BigDecimal(2)),
      (3L, 2L, 1L, BigDecimal(4)), (4L, 2L, 2L, BigDecimal(4))
    ).toDF("id", "x1", "x2", "y")
    val out = LinearShap.attribute(data, "id", "x1", "x2", "y",
      explainFilter = lit(true)).collect()
    out.foreach { r =>
      assert(r.getDouble(6) === 0.0, "beta2 exactly 0")
      assert(r.getDouble(8) === 0.0 || r.getDouble(8) === -0.0,
        "phi_x2 exactly 0")
    }
  }

  test("a collinear design yields NULL everywhere, never NaN") {
    val data = Seq(
      (1L, 1L, 2L, BigDecimal(1)), (2L, 2L, 4L, BigDecimal(2)),
      (3L, 3L, 6L, BigDecimal(3))
    ).toDF("id", "x1", "x2", "y")
    val out = LinearShap.attribute(data, "id", "x1", "x2", "y",
      explainFilter = lit(true)).collect()
    out.foreach { r =>
      (4 to 9).foreach(i => assert(r.isNullAt(i),
        s"column $i must be NULL on det = 0"))
    }
  }
}
