package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.agg.CountMin

/** Count-min sketch: overestimate-only, bounded error, merge identity. */
class CountMinSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val d = 4
  private val w = 64

  // planted skew: one heavy hitter (200), one mid (40), 60 singletons
  private def items: Seq[String] =
    Seq.fill(200)("heavy") ++ Seq.fill(40)("mid") ++
      (0 until 60).map(i => s"rare$i")

  private def hashes = items.toDF("item")
    .select(xxhash64(col("item")).as("h")).as[Long]

  private def itemHash(s: String): Long =
    Seq(s).toDF("item").select(xxhash64(col("item"))).as[Long].head()

  test("estimates are >= true counts and within the sketch error bound") {
    val sketch = hashes.select(new CountMin(d, w).toColumn).head()
    val n = items.size
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong)
    exact.foreach { case (item, cnt) =>
      val est = CountMin.estimate(sketch, itemHash(item), d, w)
      assert(est >= cnt, s"$item underestimated: $est < $cnt")
      // e/w * N is the classic w.p. bound; 4N/w is a very generous
      // deterministic ceiling for this fixed fixture
      assert(est - cnt <= 4L * n / w,
        s"$item over by ${est - cnt} (> ${4L * n / w})")
    }
  }

  test("sketch is partition-order independent (mergeable state)") {
    val a = hashes.repartition(7)
      .select(new CountMin(d, w).toColumn).head()
    val b = hashes.repartition(2)
      .select(new CountMin(d, w).toColumn).head()
    assert(a.toSeq === b.toSeq)
  }

  test("manual merge of half-sketches equals the full sketch") {
    val full = hashes.select(new CountMin(d, w).toColumn).head()
    val (h1, h2) = items.splitAt(100)
    def sk(xs: Seq[String]) = xs.toDF("item")
      .select(xxhash64(col("item")).as("h")).as[Long]
      .select(new CountMin(d, w).toColumn).head()
    val merged = new CountMin(d, w).merge(sk(h1), sk(h2))
    assert(merged.toSeq === full.toSeq)
  }
}
