package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computable Newman-modularity identities: the all-one-community
  * partition scores exactly 0, a perfect two-clique partition scores
  * exactly 0.5, and the ROLLUP total equals the per-community sum. */
class ModularitySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import graft.graph.Modularity

  private def edges(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.toDF("src", "dst")
  }

  private def labels(m: (Long, Long)*) = {
    import spark.implicits._
    m.toDF("node", "community")
  }

  test("single community: Q is exactly 0 (4m·m − (2m)² ≡ 0)") {
    val e = edges((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val l = labels((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L))
    val total = Modularity.run(e, l)
      .filter(col("community").isNull).collect()(0)
    assert(total.getAs[Long]("q_num") === 0L)
    assert(total.getAs[Double]("q_part") === 0.0)
  }

  test("two disjoint triangles, partitioned by component: Q = 0.5, " +
    "and the total row equals the per-community sum") {
    val e = edges((1L, 2L), (2L, 3L), (1L, 3L),
      (11L, 12L), (12L, 13L), (11L, 13L))
    val l = labels((1L, 0L), (2L, 0L), (3L, 0L),
      (11L, 1L), (12L, 1L), (13L, 1L))
    val rows = Modularity.run(e, l).collect()
    val total = rows.filter(_.isNullAt(0)).head
    val per = rows.filterNot(_.isNullAt(0))
    // m=6; each community: in=3, deg=6 -> q_num = 4*6*3 - 36 = 36
    assert(per.map(_.getAs[Long]("q_num")).toSeq === Seq(36L, 36L))
    assert(total.getAs[Long]("q_num") ===
      per.map(_.getAs[Long]("q_num")).sum)
    assert(total.getAs[Double]("q_part") === 0.5)
  }

  test("cross-community edges count in degrees but not in in_edges " +
    "(a bad split scores below the component split)") {
    // two triangles bridged by one edge; good split = the components
    val e = edges((1L, 2L), (2L, 3L), (1L, 3L),
      (11L, 12L), (12L, 13L), (11L, 13L), (3L, 11L))
    val good = labels((1L, 0L), (2L, 0L), (3L, 0L),
      (11L, 1L), (12L, 1L), (13L, 1L))
    // bad split cuts one triangle in half
    val bad = labels((1L, 0L), (2L, 0L), (3L, 1L),
      (11L, 1L), (12L, 1L), (13L, 1L))
    def q(l: org.apache.spark.sql.DataFrame): Double =
      Modularity.run(e, l).filter(col("community").isNull)
        .collect()(0).getAs[Double]("q_part")
    assert(q(good) > q(bad))
  }
}
