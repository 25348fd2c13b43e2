package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup
import graft.sim.PortableSim

/** Algorithm-property pins for the ENGINE-PORTABLE similarity family
  * (sim2p/sim4p/sim7p + d4p). The harness oracle rows prove engine
  * parity; these specs pin the ALGORITHMS on planted geometry —
  * recall, no-false-positives, rank sanity — so a refactor can't keep
  * parity while breaking the semantics. All fixtures are fixed-seed ⇒
  * every assertion is deterministic. */
class PortableSimSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 100 random 64-dim bases + 20 planted near-identical dups
    * (cosine ≈ 0.999), the SimilaritySpec fixture. */
  private def plantedCorpus = {
    val rnd = new scala.util.Random(42)
    val bases = (0 until 100).map { i =>
      (i.toLong, Seq.fill(64)(rnd.nextGaussian().toFloat))
    }
    val dups = bases.take(20).map { case (id, v) =>
      (id + 1000L, v.map(x => x + 0.01f * rnd.nextGaussian().toFloat))
    }
    (bases ++ dups).toDF("vec_id", "embedding")
  }

  /** Exact integer pair stats over the SAME floor(x·1000) grid the
    * portable operators use — the spec-side ground truth. */
  private def quantVecs: Map[Long, Array[Long]] = {
    val rnd = new scala.util.Random(42)
    val bases = (0 until 100).map { i =>
      (i.toLong, Seq.fill(64)(rnd.nextGaussian().toFloat))
    }
    val dups = bases.take(20).map { case (id, v) =>
      (id + 1000L, v.map(x => x + 0.01f * rnd.nextGaussian().toFloat))
    }
    (bases ++ dups).map { case (id, v) =>
      id -> v.map(x => math.floor(x.toDouble * 1000d).toLong).toArray
    }.toMap
  }

  private def cos2e8(a: Array[Long], b: Array[Long]): (Long, Long) = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    val na2 = a.map(x => x * x).sum
    val nb2 = b.map(x => x * x).sum
    (dot, (BigInt(dot) * dot * 100000000L / (BigInt(na2) * nb2)).toLong)
  }

  test("sim4p: every emitted pair passes the exact integer cosine " +
    "threshold; >=90% recall on the planted near-identical dups") {
    val t2e4 = 9025L // 0.95²·1e4 — exact (0.95 = 19/20)
    val got = PortableSim.portableLshPairs(plantedCorpus, t2e4 = t2e4)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3))))
    val q = quantVecs
    got.foreach { case ((a, b), (nBands, c2)) =>
      assert(nBands >= 1 && nBands <= 4)
      val (dot, expC2) = cos2e8(q(a), q(b))
      assert(dot > 0 && c2 === expC2,
        s"pair ($a,$b): got cos2_e8 $c2, exact $expC2")
      assert(c2 >= t2e4 * 10000L, s"pair ($a,$b) below threshold: $c2")
    }
    val found = got.map(_._1).toSet
    val planted = (0 until 20).map(i => (i.toLong, i + 1000L)).toSet
    val recall = planted.count(found.contains).toDouble / planted.size
    assert(recall >= 0.9, s"sim4p recall $recall (${found.size} pairs)")
  }

  test("sim2p: well-formed per-query top-k, scores exact, planted dup " +
    "ranks first for nearly all dup-holding queries") {
    val corpus = plantedCorpus
    val queries = corpus.filter(col("vec_id") < 10)
    val got = PortableSim.portableIvfTopK(corpus, queries, k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val q = quantVecs
    val byQuery = got.groupBy(_._1)
    assert(byQuery.keySet === (0L until 10L).toSet)
    byQuery.foreach { case (qid, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1 to sorted.length).toSeq)
      // scores non-increasing, ids distinct, each score exact
      assert(sorted.map(_._4).toSeq ===
        sorted.map(_._4).sorted(Ordering[Long].reverse).toSeq)
      assert(sorted.map(_._3).distinct.length === sorted.length)
      sorted.foreach { case (_, _, cid, s) =>
        val (dot, c2) = cos2e8(q(qid), q(cid))
        val exp = if (dot >= 0) c2 else -c2
        assert(s === exp, s"($qid,$cid): score $s, exact $exp")
      }
    }
    // each query 0..9 has a planted near-identical dup at id+1000;
    // with 4 sign bits + Hamming-1 multi-probe the dup is missed only
    // when >=2 of 4 bucket bits flip (cosine 0.999 ⇒ per-bit p≈0.014)
    val hits = (0L until 10L).count { qid =>
      byQuery(qid).exists(r => r._2 === 1 && r._3 === qid + 1000L)
    }
    assert(hits >= 8, s"planted dup at rank 1 for only $hits/10 queries")
  }

  test("sim7p: trained quantizer returns well-formed exact-scored " +
    "ranks and finds the planted dups") {
    val corpus = plantedCorpus
    val queries = corpus.filter(col("vec_id") < 10)
    val got = PortableSim
      .portableIvfTrainedTopK(corpus, queries, k = 5, nlist = 8)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val q = quantVecs
    val byQuery = got.groupBy(_._1)
    assert(byQuery.keySet === (0L until 10L).toSet)
    byQuery.foreach { case (qid, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1 to sorted.length).toSeq)
      assert(sorted.map(_._4).toSeq ===
        sorted.map(_._4).sorted(Ordering[Long].reverse).toSeq)
      sorted.foreach { case (_, _, cid, s) =>
        val (dot, c2) = cos2e8(q(qid), q(cid))
        assert(s === (if (dot >= 0) c2 else -c2))
      }
    }
    // a near-identical dup lands in the same trained cell as its base
    // (cosine 0.999 vs cell centroids); the base's own cell is always
    // probed first ⇒ the dup should top nearly every dup query
    val hits = (0L until 10L).count { qid =>
      byQuery(qid).exists(r => r._2 === 1 && r._3 === qid + 1000L)
    }
    assert(hits >= 8, s"planted dup at rank 1 for only $hits/10 queries")
  }

  test("sim8p: PQ+ADC finds planted dups at rank 1; re-ranked " +
    "distances are exact integer L2 on the quantized grid") {
    val corpus = plantedCorpus
    val queries = corpus.filter(col("vec_id") < 10)
    val got = PortableSim.portablePqTopK(corpus, queries, k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val q = quantVecs
    val byQuery = got.groupBy(_._1)
    assert(byQuery.keySet === (0L until 10L).toSet)
    byQuery.foreach { case (qid, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1 to sorted.length).toSeq)
      // dist2 non-decreasing with rank; each value exactly Σ(qa−qb)²
      assert(sorted.map(_._4).toSeq === sorted.map(_._4).sorted.toSeq)
      sorted.foreach { case (_, _, cid, d2) =>
        val exp = q(qid).zip(q(cid))
          .map { case (a, b) => (a - b) * (a - b) }.sum
        assert(d2 === exp, s"($qid,$cid): dist2 $d2, exact $exp")
      }
    }
    // the planted near-identical dup is the L2 nearest neighbor and
    // must survive ADC into the re-rank for nearly every query
    val hits = (0L until 10L).count { qid =>
      byQuery(qid).exists(r => r._2 === 1 && r._3 === qid + 1000L)
    }
    assert(hits >= 8, s"planted dup at rank 1 for only $hits/10 queries")
  }

  private val base =
    "the quick brown fox jumps over the lazy dog while the cat sleeps " +
      "on the warm windowsill in the afternoon sun near the garden"

  private def docs = Seq(
    (1L, base),
    (2L, base + " today"), // near-dup of 1
    (3L, "  THE quick   brown fox jumps over the lazy dog while the " +
      "cat sleeps on the warm windowsill in the afternoon sun near " +
      "the garden "), // exact dup of 1 after normalization
    (4L, "completely different content about distributed query engines " +
      "and columnar storage formats with vectorized execution pipelines"),
    (5L, "another unrelated text mentioning parquet files shuffle " +
      "partitions broadcast joins and adaptive execution in spark clusters")
  ).toDF("doc_id", "text")

  test("d4p: 48-bit portable simhash — exact dup at distance 0, " +
    "near-dup within 3 bits, unrelated docs unpaired") {
    val sigs = Dedup.portableSimhash(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    sigs.values.foreach(s => assert((s >> 48) === 0L,
      "signature exceeds 48 bits"))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(sigs(a) ^ sigs(b))
    assert(ham(1L, 3L) === 0)
    assert(ham(1L, 2L) < ham(1L, 4L))
    val pairs = Dedup
      .simhashNearPairs(Dedup.portableSimhash(docs), maxDist = 3,
        sigBits = 48)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2)))
      .toMap
    assert(pairs((1L, 3L)) === 0)
    assert(!pairs.contains((4L, 5L)))
    pairs.values.foreach(h => assert(h <= 3))
  }
}
