package graft

import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

import graft.ml.Conformal

/** Split-conformal intervals (ml25): interval arithmetic is exact
  * integer micro-units, q-hat is the exact rank-pick a BigInt replay
  * of the whole construction (content-hash split, closed-form OLS,
  * truncating division) reproduces, and empirical coverage on the
  * test split is near the nominal 1 − α. */
class ConformalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // y = 3x + deterministic bounded noise, in cents
  private val rows: Seq[(Long, Long, BigDecimal)] =
    (1L to 400L).map { id =>
      val x = id % 17
      val noiseCents = (id * 37 % 11) - 5 // [-5, 5] cents
      (id, x, BigDecimal(300L * x * 100 + noiseCents) / 100)
    }

  private def md5split(id: Long): Long = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    java.lang.Long.parseLong(hex, 16) % 4
  }

  private def sdiv(a: BigInt, b: BigInt) =
    if (a >= 0) a / b else -((-a) / b)

  /** BigInt replay of the whole construction. Returns
    * (qhatMicro, predMicro by id). */
  private def replay(alphaPct: Int): (BigInt, Map[Long, BigInt]) = {
    val withSplit = rows.map { case (id, x, y) =>
      (id, BigInt(x), (y * 100).toBigInt, md5split(id))
    }
    val train = withSplit.filter(_._4 < 2)
    val n = BigInt(train.size)
    val sx = train.map(_._2).sum
    val syc = train.map(_._3).sum
    val sxx = train.map(t => t._2 * t._2).sum
    val sxyc = train.map(t => t._2 * t._3).sum
    val det = n * sxx - sx * sx
    val nb = n * sxyc - sx * syc
    def pred(x: BigInt) =
      sdiv((syc * det + nb * (n * x - sx)) * 10000, n * det)
    val calAbs = withSplit.filter(_._4 == 2)
      .map(t => (t._3 * 10000 - pred(t._2)).abs -> t._1)
      .sortBy(p => (p._1, p._2))
    val nc = calAbs.size
    val k = math.min(nc, ((nc + 1) * (100 - alphaPct) + 99) / 100)
    val qhat = calAbs(k - 1)._1
    (qhat, withSplit.filter(_._4 == 3)
      .map(t => t._1 -> pred(t._2)).toMap)
  }

  test("q-hat, predictions, and interval bounds match the exact " +
    "BigInt replay of the rank-pick construction") {
    val out = Conformal.intervals(
      rows.toDF("id", "x", "y"), "id", "x", "y").collect()
    val (qhat, preds) = replay(10)
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getLong(0)
      assert(BigInt(r.getLong(4)) === qhat, s"qhat at id=$id")
      assert(BigInt(r.getLong(3)) === preds(id), s"pred at id=$id")
      assert(r.getLong(5) === r.getLong(3) - r.getLong(4), "lo")
      assert(r.getLong(6) === r.getLong(3) + r.getLong(4), "hi")
    }
  }

  test("covered flag is exact membership, and empirical coverage on " +
    "the test split is >= 80% at nominal 90%") {
    val out = Conformal.intervals(
      rows.toDF("id", "x", "y"), "id", "x", "y").collect()
    val ycMicro = rows.map { case (id, _, y) =>
      id -> ((y * 100).toBigInt * 10000)
    }.toMap
    out.foreach { r =>
      val in = ycMicro(r.getLong(0)) >= BigInt(r.getLong(5)) &&
        ycMicro(r.getLong(0)) <= BigInt(r.getLong(6))
      assert(r.getLong(7) === (if (in) 1L else 0L))
    }
    val cov = out.count(_.getLong(7) == 1L).toDouble / out.length
    assert(cov >= 0.80, s"coverage $cov below slack bound")
  }

  test("y_cents is the exact integer-cents rendering of the raw " +
    "decimal y — the raw-decimal parity fixture kept local now that " +
    "no decimal crosses the engine boundary") {
    val out = Conformal.intervals(
      rows.toDF("id", "x", "y"), "id", "x", "y").collect()
    val cents = rows.map { case (id, _, y) =>
      id -> (y * 100).toLongExact
    }.toMap
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getLong(2) === cents(r.getLong(0))))
  }

  test("tighter alpha widens intervals: q-hat at 1% >= q-hat at 20%") {
    val df = rows.toDF("id", "x", "y")
    val q01 = Conformal.intervals(df, "id", "x", "y", alphaPct = 1)
      .select("qhat_micro").head().getLong(0)
    val q20 = Conformal.intervals(df, "id", "x", "y", alphaPct = 20)
      .select("qhat_micro").head().getLong(0)
    assert(q01 >= q20)
  }
}
