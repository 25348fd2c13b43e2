package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Regression pin for the round-13 headline fix: iterative operators
  * must not accumulate superseded localCheckpoint generations. The
  * round-12 driver bench's pass-2 blowups (d9 3.2→153.5 s, g1
  * 6.5→80.9 s) were exactly this leak — dead rounds pinned in the
  * block manager until a full GC.
  *
  * The sharp assertion is the persisted-RDD census right AFTER a run
  * materializes, BEFORE any sweep: it must be bounded by the
  * operator's RESULT-backing frames (a per-op constant), not by its
  * round count. The fixture graphs are chains, so round counts are
  * ≥ 5 — an operator that leaks one frame per round fails the
  * allowance; the eager-free implementation leaves only the frames
  * the returned plan genuinely references. */
class IterativeLeakSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** unpersist(blocking=false) settles async — poll until the census
    * stops shrinking (or a deadline), the same discipline as
    * CheckpointsSpec; a fixed sleep over-counts under CI load. */
  private def persistedCount: Int = {
    val deadline = System.nanoTime() + 10e9.toLong
    var last = spark.sparkContext.getPersistentRDDs.size
    var settled = false
    while (!settled && System.nanoTime() < deadline) {
      Thread.sleep(100)
      val now = spark.sparkContext.getPersistentRDDs.size
      settled = now >= last
      last = now
    }
    last
  }

  private def sweep(): Unit =
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))

  private def edges = {
    import spark.implicits._
    // two chains + a clique: chain diameter forces >= 5 rounds
    ((1L to 40L).sliding(2).map(p => (p.head, p.last)) ++
      (50L to 60L).sliding(2).map(p => (p.head, p.last)) ++
      (for (a <- 70L to 75L; b <- 70L to 75L if a < b) yield (a, b)))
      .toSeq.toDF("id_a", "id_b")
  }

  test("iterative loops leave only result-backing frames persisted — " +
    "never one frame per round") {
    val e2 = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
    // (label, run, allowed result-backing frames)
    val runs: Seq[(String, () => DataFrame, Int)] = Seq(
      ("cc_run", () => graft.graph.ConnectedComponents.run(edges), 2),
      ("cc_stars", () => graft.graph.ConnectedComponents.runStars(edges), 2),
      ("pagerank", () => graft.graph.PageRank.run(e2, iters = 6), 2),
      // HyperBall's result IS the per-hop estimate union: hops+1 frames
      ("hyperball", () => graft.graph.HyperBall.ballEstimates(e2,
        maxHops = 5), 7),
      ("bfs", () => graft.graph.Bfs.bfsHops(e2, 1L, maxHops = 8), 2),
      ("lpa", () => graft.graph.LabelPropagation.run(e2, rounds = 5), 2),
      ("sssp", () => {
        val we = e2.withColumn("w", lit(1L))
        graft.graph.ShortestPaths.sssp(we, 1L, maxRounds = 8)
      }, 2))
    sweep()
    val base = persistedCount
    runs.foreach { case (label, run, allowance) =>
      val out = run()
      assert(out.count() >= 0)
      val leak = persistedCount - base
      assert(leak <= allowance,
        s"$label left $leak persisted frames (> $allowance): " +
          "superseded rounds are not being released eagerly")
      sweep() // what the harness does between queries
      assert(persistedCount <= base, s"$label: sweep did not restore")
    }
  }
}
