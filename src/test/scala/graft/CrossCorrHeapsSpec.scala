package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.analytics.Autocorrelation
import graft.text.TextAnalysis

/** Cross-correlation lead-lag and Heaps-law fit on planted data. */
class CrossCorrHeapsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val H = 3600000000L

  test("a purchase series that is the click series shifted by +2 h " +
    "peaks at lag 2 with correlation 1") {
    // clicks pulse at hours 0,4,8,...; purchases at 2,6,10,...
    val ev = (0 until 48).flatMap { h =>
      val t = h.toLong * H
      (if (h % 4 == 0) Seq(("click", t), ("click", t)) else Seq.empty) ++
        (if (h % 4 == 2) Seq(("purchase", t), ("purchase", t))
         else Seq.empty)
    }.toDF("event_type", "us")
    val out = Autocorrelation.hourlyCrossCorr(ev, maxLag = 3)
      .collect().map(r => r.getInt(0) ->
        (if (r.isNullAt(1)) Double.NaN else r.getDouble(1))).toMap
    assert(out(2) > 0.99, s"lag +2 must peak: ${out(2)}")
    assert(out(0) < 0.0, "aligned hours anti-correlate on this comb")
  }

  test("a constant series yields NULL, not NaN") {
    val ev = (0 until 24).flatMap { h =>
      Seq(("click", h.toLong * H), ("purchase", 0L))
    }.toDF("event_type", "us")
    // purchases all in hour 0 → beyond overlap edges variance can be
    // zero at extreme lags; assert no NaN anywhere
    val vals = Autocorrelation.hourlyCrossCorr(ev, maxLag = 3)
      .collect().map(r => if (r.isNullAt(1)) None else Some(r.getDouble(1)))
    assert(vals.flatten.forall(v => !v.isNaN))
  }

  test("heapsFit on a corpus where vocabulary grows with corpus size " +
    "yields beta in (0, 1) and monotone counts") {
    val docs = (0 until 400).map { i =>
      // each doc contributes common tokens plus one rare token
      (i.toLong, s"the quick fox tok$i")
    }.toDF("doc_id", "text")
    val out = TextAnalysis.heapsFit(docs).orderBy("cut_permille")
      .collect()
    val nTokens = out.map(_.getLong(1))
    val nDistinct = out.map(_.getLong(2))
    assert(nTokens.sliding(2).forall(p => p(0) < p(1)))
    assert(nDistinct.sliding(2).forall(p => p(0) < p(1)))
    val beta = out.head.getDouble(3)
    assert(beta > 0.0 && beta < 1.0, s"beta $beta")
    // all rows carry the same fit
    assert(out.map(_.getDouble(3)).distinct.length === 1)
  }
}
