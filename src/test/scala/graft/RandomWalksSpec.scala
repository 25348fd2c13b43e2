package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.graph.RandomWalks

/** Deterministic walks: forced paths follow the only edge, sinks
  * terminate walks early, every emitted transition is a real edge,
  * and two runs agree exactly. */
class RandomWalksSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("a path graph forces the unique walk; step numbering is dense") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val out = RandomWalks.run(edges, Seq(1L).toDF("node"), steps = 4)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(out === Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L),
      (4L, 5L)))
  }

  test("a sink terminates the walk early instead of emitting nulls") {
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val out = RandomWalks.run(edges, Seq(1L).toDF("node"), steps = 4)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(out === Seq((0L, 1L), (1L, 2L)),
      "node 2 has no out-edges; steps 2..4 must not exist")
  }

  test("every emitted transition is a real edge and reruns are " +
    "bit-identical on a dense graph") {
    // complete-ish directed graph over 8 nodes
    val es = for (a <- 1L to 8L; b <- 1L to 8L if a != b && (a + b) % 3 != 0)
      yield (a, b)
    val edges = es.toDF("src", "dst")
    val starts = (1L to 8L).toDF("node")
    val run1 = RandomWalks.run(edges, starts, steps = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val run2 = RandomWalks.run(edges, starts, steps = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(run1 === run2, "hash-driven choices are run-invariant")
    val edgeSet = es.toSet
    val byWalk = run1.groupBy(_._1).values
    byWalk.foreach { steps =>
      val path = steps.sortBy(_._2).map(_._3)
      path.sliding(2).foreach {
        case Array(a, b) => assert(edgeSet.contains((a, b)),
          s"walk transition $a->$b is not a graph edge")
        case _ =>
      }
    }
    assert(run1.count(_._2 == 0L) === 8, "one walk per start")
  }
}
