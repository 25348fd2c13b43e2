package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.graph.Mis

/** MIS invariants on planted graphs: independence, maximality, and
  * agreement with the sequential greedy under the same md5 priority
  * order. */
class MisSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The production priority, recomputed independently. */
  private def prio(node: Long): BigInt = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(node.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    BigInt(hex, 16)
  }

  /** Sequential greedy MIS under (prio, node) order. */
  private def greedy(nodes: Seq[Long],
      edges: Set[(Long, Long)]): Set[Long] = {
    val adj = (edges ++ edges.map(_.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var taken = Set.empty[Long]
    var blocked = Set.empty[Long]
    nodes.sortBy(n => (prio(n), n)).foreach { n =>
      if (!blocked(n) && !taken(n)) {
        taken += n
        blocked ++= adj.getOrElse(n, Set.empty)
      }
    }
    taken
  }

  test("independence and maximality hold, and the result IS the " +
    "sequential greedy MIS under the hash order") {
    val es = (for (a <- 1L to 12L; b <- 1L to 12L
      if a < b && (a * 7 + b) % 4 == 0) yield (a, b)).toSet
    val nodes = es.flatMap(e => Seq(e._1, e._2)).toSeq.distinct
    val mis = Mis.run(es.toSeq.toDF("src", "dst")).collect()
      .map(_.getLong(0)).toSet
    val sym = es ++ es.map(_.swap)
    assert(!sym.exists(e => mis(e._1) && mis(e._2)), "independence")
    nodes.filterNot(mis).foreach { n =>
      assert(sym.exists(e => e._1 == n && mis(e._2)),
        s"non-member $n has no MIS neighbor: not maximal")
    }
    assert(mis === greedy(nodes, es),
      "fixed priorities must yield the canonical greedy MIS")
  }

  test("a single edge admits exactly the higher-priority endpoint, " +
    "in round 1") {
    val out = Mis.run(Seq((1L, 2L)).toDF("src", "dst")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = if (prio(1L) < prio(2L)) 1L else 2L
    assert(out.toSeq === Seq((expected, 1L)))
  }

  test("a triangle keeps exactly one node; a node isolated by " +
    "round-1 exclusions joins in round 2") {
    val tri = Mis.run(Seq((1L, 2L), (2L, 3L), (1L, 3L))
      .toDF("src", "dst")).collect()
    assert(tri.length === 1)
    // path a-b-c-d where b has the minimum priority: b wins round 1,
    // a and c drop, d (isolated once c left) joins round 2 unless it
    // already won round 1 outright — both orders are valid MIS; pin
    // against greedy instead
    val es = Set((10L, 11L), (11L, 12L), (12L, 13L))
    val mis = Mis.run(es.toSeq.toDF("src", "dst")).collect()
      .map(_.getLong(0)).toSet
    assert(mis === greedy(Seq(10L, 11L, 12L, 13L), es))
  }
}
