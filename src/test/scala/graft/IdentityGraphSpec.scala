package graft

import org.scalatest.funsuite.AnyFunSuite

/** er8: the transitive-closure claim — the two dirty variants of a
  * customer land in ONE cluster although they are never compared to
  * each other directly. */
class IdentityGraphSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("dirty variants cluster with their source via transitivity; " +
    "well-matched customers form exact {source, v1, v2} triples") {
    val out = SparkEntry.queries("er8_identity_graph")(
      spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    val byCluster = out.groupBy(_._2)
    // every cluster is exactly {source, v1, v2}: the prefix-typo
    // variants are distance 1 from their source and ≥ 2 from any
    // other customer, so best matches are always correct
    byCluster.values.foreach { members =>
      val ids = members.map(_._1).sorted
      val base = ids.head
      assert(ids.toSeq === Seq(base, base + 1, base + 2) &&
        base % 10 === 0,
        s"a cluster must be a source with its two variants: $ids")
    }
    // every entity's cluster id is the min member (CC contract)
    byCluster.foreach { case (cid, members) =>
      assert(cid === members.map(_._1).min)
    }
  }
}
