package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.graph.ConnectedComponents

/** Large-star/small-star CC must agree exactly with the label-
  * propagation formulation on every graph shape. */
class StarCCSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def compare(edges: Seq[(Long, Long)]): Unit = {
    val df = edges.toDF("id_a", "id_b")
    val viaLabels = ConnectedComponents.run(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaStars = ConnectedComponents.runStars(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaStars === viaLabels)
  }

  test("long chain (the diameter case star contraction exists for)") {
    compare((1L until 40L).map(i => (i, i + 1)))
  }

  test("two cliques + isolated pair + self-contained triangle") {
    val clique = (ids: Seq[Long]) =>
      for { a <- ids; b <- ids if a < b } yield (a, b)
    compare(clique(Seq(1L, 2L, 3L, 4L)) ++
      clique(Seq(10L, 11L, 12L)) ++
      Seq((20L, 21L), (30L, 31L), (31L, 32L), (30L, 32L)))
  }

  test("random graph, fixed seed") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(80)(
      (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter { case (a, b) => a != b }
    compare(edges)
  }

  test("star already: single hub") {
    compare(Seq((9L, 1L), (9L, 2L), (9L, 3L), (9L, 4L)))
  }
}
