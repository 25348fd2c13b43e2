package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Neighbor sampling (g24): fanout cap honored (min(degree, 3) rows
  * per node), and the kept set equals an independent driver-side
  * bottom-3 recomputation of the priority mix — the aggregator never
  * drops or reorders against the rule it claims. */
class NeighborSamplingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("per-node fanout = min(degree, 3); kept set replays the " +
    "priority rule exactly") {
    val out = SparkEntry.queries("g24_neighbor_sampling")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3)))
    // rebuild the full adjacency independently
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_suppkey"))
    val o = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"))
    val edges = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select((col("l_suppkey") * 2).as("src"),
        (col("o_custkey") * 2 + 1).as("dst"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = (edges ++ edges.map(_.swap))
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
    def pri(src: Long, dst: Long) =
      (src * 2654435761L + dst * 40503L) % 2147483647L
    val bySlot = out.groupBy(_._1)
    assert(bySlot.keySet === adj.keySet, "every node is sampled")
    bySlot.foreach { case (node, rows) =>
      val neigh = adj(node)
      assert(rows.length === math.min(neigh.size, 3),
        s"fanout cap at node $node")
      val expect = neigh.toSeq.map(d => (pri(node, d), d))
        .sorted.take(3)
      assert(rows.sortBy(_._2).map(r => (r._4, r._3)).toSeq === expect,
        s"kept set at node $node")
    }
  }
}
