package graft

import java.sql.Date

import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.Growth

/** Growth accounting on a planted activity calendar: every lifecycle
  * branch (new / retained / resurrected / churn identity) and the
  * NULL guards. */
class GrowthSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  test("new / retained / resurrected split and identity churn") {
    // u1 active d1,d2,d4 (new, retained, resurrected)
    // u2 active d1 only   (new, churns on d2)
    // u3 active d2,d4     (new on d2, resurrected d4? no - gap is 2
    //                      days, so resurrected on d4)
    val act = Seq(
      (1L, d("2024-01-01")), (1L, d("2024-01-02")), (1L, d("2024-01-04")),
      (2L, d("2024-01-01")),
      (3L, d("2024-01-02")), (3L, d("2024-01-04"))
    ).toDF("user_id", "day")
    val out = Growth.dailyAccounting(act).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) -1L else r.getLong(5)))
    assert(out.toSeq === Seq(
      // day, active, new, retained, resurrected, churned(-1=NULL)
      ("2024-01-01", 2L, 2L, 0L, 0L, -1L),
      // d2: u1 retained, u3 new; churned = active(d1)=2 - retained=1
      ("2024-01-02", 2L, 1L, 1L, 0L, 1L),
      // d4: u1,u3 resurrected; d3 not in the calendar -> NULL churn
      ("2024-01-04", 2L, 0L, 0L, 2L, -1L)))
  }

  test("duplicate activity rows collapse; quick ratio guarded") {
    val act = Seq(
      (1L, d("2024-02-01")), (1L, d("2024-02-01")),
      (2L, d("2024-02-01")),
      (1L, d("2024-02-02")), (2L, d("2024-02-02")),
      (3L, d("2024-02-02"))
    ).toDF("user_id", "day")
    val out = Growth.dailyAccounting(act).collect()
    val d2 = out.find(_.getDate(0).toString == "2024-02-02").get
    // both prior actives retained -> churned 0 -> quick_ratio NULL
    assert(d2.getLong(5) === 0L && d2.isNullAt(6))
    val d1 = out.find(_.getDate(0).toString == "2024-02-01").get
    assert(d1.getLong(1) === 2L && d1.getLong(2) === 2L)
  }

  test("quick ratio = (new + resurrected) / churned when churn > 0") {
    val act = Seq(
      (1L, d("2024-03-01")), (2L, d("2024-03-01")),
      (3L, d("2024-03-02"))
    ).toDF("user_id", "day")
    val out = Growth.dailyAccounting(act).collect()
      .find(_.getDate(0).toString == "2024-03-02").get
    // churned = 2 (u1, u2), new = 1, resurrected = 0 -> 0.5
    assert(out.getLong(5) === 2L && out.getDouble(6) === 0.5)
  }
}
