package graft

import org.scalatest.funsuite.AnyFunSuite

/** Rich-club coefficient (g22): internal consistency on real data —
  * node and edge survivor counts are nonincreasing in the threshold,
  * and every phi value is the exact integer formula over its own row's
  * counts (the oracle certifies the counts; this pins the algebra). */
class RichClubSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("survivor counts are nonincreasing in k and phi_e6 replays " +
    "exactly from the row's own counts") {
    val rows = SparkEntry.queries("g22_rich_club")(spark, dir)
      .collect()
    assert(rows.length === 12)
    val nk = rows.map(_.getLong(1))
    val ek = rows.map(_.getLong(2))
    assert(nk.zip(nk.tail).forall { case (a, b) => a >= b },
      s"N_k must be nonincreasing: ${nk.toSeq}")
    assert(ek.zip(ek.tail).forall { case (a, b) => a >= b },
      s"E_k must be nonincreasing: ${ek.toSeq}")
    rows.foreach { r =>
      val (n, e) = (BigInt(r.getLong(1)), BigInt(r.getLong(2)))
      if (n >= 2) {
        assert(BigInt(r.getLong(3)) === (2 * e * 1000000) / (n * (n - 1)),
          s"phi replay at k=${r.getInt(0)}")
        assert(r.getLong(3) <= 1000000L, "phi is a fraction of pairs")
      } else assert(r.isNullAt(3))
    }
    assert(ek.head > 0L, "fixture must have edges at k=1")
  }
}
