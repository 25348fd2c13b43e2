package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.{Closeness, HyperBall}

/** HyperBall estimates vs the EXACT bitset multi-source BFS on a
  * planted graph: the estimator must converge monotonically and land
  * within HLL tolerance of the exact neighborhood function. Fixture:
  * a 120-node ring with skip chords (diameter ~a dozen hops, every
  * node reaches every other), fixed ids ⇒ deterministic hashes ⇒
  * deterministic estimates. */
class HyperBallSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val n = 120

  /** ring + skip-7 chords */
  private def edges = (0 until n).flatMap { i =>
    Seq((i.toLong, ((i + 1) % n).toLong),
      (i.toLong, ((i + 7) % n).toLong))
  }.toDF("src", "dst")

  test("per-node ball estimates are monotone in hop and end near n") {
    val est = HyperBall.ballEstimates(edges, maxHops = 15)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val byNode = est.groupBy(_._1)
    assert(byNode.size === n)
    byNode.foreach { case (_, rows) =>
      val seq = rows.sortBy(_._2).map(_._3)
      // monotone non-decreasing within estimator jitter (union of
      // registers only grows; tiny dips can only come from the
      // small-range correction boundary)
      seq.zip(seq.tail).foreach { case (a, b) =>
        assert(b >= a - 1e-9, s"estimate decreased: $a -> $b")
      }
      // fully mixed ring: final ball ≈ all n nodes within ±30%
      // (HLL σ at m=64 is ~13%)
      assert(math.abs(seq.last - n) / n <= 0.3,
        s"final ball estimate ${seq.last} far from $n")
    }
  }

  test("neighborhood function tracks the exact bitset BFS within HLL " +
    "tolerance; effective diameter within one hop") {
    val all = (0 until n).map(_.toLong).toDF("node")
    val exact = Closeness.hopDistribution(edges, all, maxHops = 15)
      .collect()
      .map(r => (r.getInt(0), r.getAs[Long]("cum_pairs"),
        r.getAs[Boolean]("reaches_p90")))
    val hll = HyperBall.hopDistribution(edges, maxHops = 15)
      .collect()
      .map(r => (r.getInt(0), r.getAs[Double]("cum_pairs_est"),
        r.getAs[Boolean]("reaches_p90")))
    val exactCum = exact.map(t => t._1 -> t._2).toMap
    // per-hop relative error of the summed neighborhood function —
    // n·HLL sums concentrate well below the single-sketch σ
    hll.foreach { case (hop, cumEst, _) =>
      exactCum.get(hop).foreach { trueCum =>
        val rel = math.abs(cumEst - trueCum) / trueCum.toDouble
        assert(rel <= 0.2,
          s"hop $hop: est $cumEst vs exact $trueCum (rel $rel)")
      }
    }
    val exactP90 = exact.filter(_._3).map(_._1).min
    val hllP90 = hll.filter(_._3).map(_._1).min
    assert(math.abs(exactP90 - hllP90) <= 1,
      s"effective diameter: exact $exactP90, hll $hllP90")
  }

  test("all-node closeness: estimates exist for every node and " +
    "correlate with the exact panel values") {
    val cls = HyperBall.closeness(edges, maxHops = 15)
      .collect()
      .map(r => (r.getLong(0), r.getAs[Double]("n_reached_est"),
        r.getAs[Double]("sum_dist_est")))
    assert(cls.length === n)
    // symmetric vertex-transitive-ish fixture: every node reaches
    // everyone, so estimates must cluster: n_reached within ±30% of
    // n−1 for every node
    cls.foreach { case (node, nr, sd) =>
      assert(math.abs(nr - (n - 1)) / (n - 1) <= 0.3,
        s"node $node n_reached_est $nr")
      assert(sd > 0)
    }
    // exact comparison on a 40-node source panel: HLL sum_dist within
    // 25% of exact for those nodes (sum over hops concentrates)
    val panel = (0 until n by 3).map(_.toLong).toDF("node")
    val exact = Closeness.multiSource(edges, panel, maxHops = 15)
      .collect()
      .map(r => (r.getAs[Long]("node"), r.getAs[Long]("sum_dist")))
      .toMap
    val est = cls.map(t => (t._1, t._3)).toMap
    exact.foreach { case (node, sdExact) =>
      val rel = math.abs(est(node) - sdExact) / sdExact.toDouble
      assert(rel <= 0.25,
        s"node $node: sum_dist est ${est(node)} vs exact $sdExact")
    }
  }

  test("packed register sweep ≡ sparse sweep: identical (node, hop) " +
    "estimate sets for every register count") {
    for (m <- Seq(16, 64)) {
      val sparse = HyperBall.ballEstimates(edges, maxHops = 6, m = m)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
      val packed = HyperBall.packedBallEstimates(edges, maxHops = 6,
          m = m)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
      assert(packed.keySet === sparse.keySet, s"m=$m key sets differ")
      packed.foreach { case (k, v) =>
        // same registers, same formula; the only freedom is FP
        // summation order over ≤ m exact powers of two
        assert(math.abs(v - sparse(k)) <= 1e-9 * math.max(1.0, v),
          s"m=$m $k: packed $v vs sparse ${sparse(k)}")
      }
    }
  }

  test("registerTable: exact-integer registers at hop H — valid slot " +
    "ranges, and on the fully-mixed ring every node converges to the " +
    "IDENTICAL register set (ball = whole graph)") {
    val m = 16
    val regs = HyperBall.registerTable(edges, hops = 15, m = m)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(regs.map(_._1).distinct.length === n)
    assert(regs.forall(t => t._2 >= 0 && t._2 < m))
    assert(regs.forall(t => t._3 >= 1 && t._3 <= 49 -
      java.lang.Integer.numberOfTrailingZeros(m)))
    // every ball is the full node set ⇒ every node's (idx, rho) set is
    // the global max-register set
    val byNode = regs.groupBy(_._1)
      .map { case (_, v) => v.map(t => (t._2, t._3)).toSet }
    assert(byNode.toSet.size === 1,
      "converged balls must share one register set")
  }

  test("ballSums: the integer sufficient statistics replay the " +
    "estimate exactly (est = α·m²·2^49 / zsum_scaled outside the " +
    "small-range regime) and pad early convergence to the hop range") {
    val m = 16
    val alpha = 0.673 // α₁₆ (Flajolet et al. 2007)
    val sums = HyperBall.ballSums(edges, maxHops = 15, m = m)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), r.getInt(3))).toMap
    val est = HyperBall.packedBallEstimates(edges, maxHops = 15, m = m)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    // estimates stop at convergence; sums pad to maxHops inclusive
    assert(sums.keySet.filter(_._2 <= est.keys.map(_._2).max) ===
      est.keySet)
    assert(sums.keys.map(_._2).max === 15)
    est.foreach { case (k, e) =>
      val (z, nreg) = sums(k)
      val raw = alpha * m * m * math.pow(2.0, 49) / z.toDouble
      if (!(raw <= 2.5 * m && nreg < m)) {
        assert(math.abs(raw - e) <= 1e-6 * e,
          s"$k: replayed $raw vs est $e")
      }
    }
  }
}
