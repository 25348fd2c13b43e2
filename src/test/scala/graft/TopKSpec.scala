package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.agg.{TopItem, TopK}

/** Typed top-k aggregator: ordering, tie-break, k bound, map-side
  * partial merge correctness, and the windowless plan shape. */
class TopKSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("insert order never matters: reduce+merge equals global sort") {
    val agg = new TopK(3)
    val items = Seq(
      TopItem(5.0, 9), TopItem(7.0, 2), TopItem(5.0, 1),
      TopItem(7.0, 8), TopItem(1.0, 3), TopItem(9.0, 4))
    val expected = items
      .sortBy(x => (-x.value, x.id)).take(3)
    // every permutation, split arbitrarily into two partial buffers
    items.permutations.take(120).foreach { perm =>
      val (l, r) = perm.splitAt(perm.length / 2)
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
      assert(agg.finish(merged) === expected, s"perm $perm")
    }
  }

  test("NaN has a total, order-independent position (sorts largest, " +
    "like ORDER BY value DESC)") {
    val agg = new TopK(2)
    val items = Seq(
      TopItem(Double.NaN, 7), TopItem(3.0, 1),
      TopItem(5.0, 2), TopItem(Double.NaN, 4))
    // NaN first (largest under DESC), ties on id: keep NaN#4, NaN#7
    val expected = List(TopItem(Double.NaN, 4), TopItem(Double.NaN, 7))
    items.permutations.foreach { perm =>
      val (l, r) = perm.splitAt(perm.length / 2)
      val out = agg.finish(agg.merge(
        l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce)))
      // compare ids (NaN != NaN under ===)
      assert(out.map(_.id) === expected.map(_.id), s"perm $perm")
      assert(out.forall(_.value.isNaN))
    }
  }

  test("groups smaller than k keep everything, in order") {
    val agg = new TopK(5)
    val out = agg.finish(Seq(TopItem(1.0, 1), TopItem(2.0, 2))
      .foldLeft(agg.zero)(agg.reduce))
    assert(out === List(TopItem(2.0, 2), TopItem(1.0, 1)))
  }

  test("x22 plans as a partial-aggregating object aggregate — no Window") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
    // static plan (AQE off): AdaptiveSparkPlanExec hides the inner plan
    // from collect() until execution — same approach as PlanShapeSpec
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val p =
      try SparkEntry.queries("x22_topk_per_group")(
        spark, "/root/testdata/sf0.001")
        .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    assert(p.collect { case w: WindowExec => w }.isEmpty,
      "top-k must not sort whole groups through a window")
    val oha = p.collect { case a: ObjectHashAggregateExec => a }
    assert(oha.size >= 2, "expected partial + final object aggregates")
  }
}
