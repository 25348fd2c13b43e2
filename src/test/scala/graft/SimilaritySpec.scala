package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sim.Similarity

class SimilaritySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vecs = Seq(
    (1L, Seq(1.0f, 0.0f, 0.0f)),
    (2L, Seq(0.9f, 0.1f, 0.0f)),  // close to 1
    (3L, Seq(0.0f, 1.0f, 0.0f)),  // orthogonal to 1
    (4L, Seq(-1.0f, 0.0f, 0.0f)), // opposite of 1
    (5L, Seq(0.5f, 0.5f, 0.5f))
  ).toDF("vec_id", "embedding")

  test("cosine on hand vectors") {
    val df = Seq((Seq(1.0, 0.0), Seq(1.0, 0.0)),
      (Seq(1.0, 0.0), Seq(0.0, 1.0)),
      (Seq(1.0, 0.0), Seq(-1.0, 0.0)))
      .toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b")).as("c"))
    assert(df.as[Double].collect().toSeq === Seq(1.0, 0.0, -1.0))
  }

  test("brute-force top-k ranks by similarity with id tie-break") {
    val got = Similarity
      .bruteForceTopK(vecs, vecs.filter(col("vec_id") === 1L), k = 4)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("corpus_id")))
    assert(got.map(_._2).toSeq === Seq(2L, 5L, 3L, 4L))
  }

  test("IVF bucketed search returns a subset of brute-force candidates " +
    "with identical scores where present") {
    val brute = Similarity.bruteForceTopK(vecs, vecs, k = 4)
      .select("query_id", "corpus_id", "sim").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val ivf = Similarity.ivfTopK(vecs, vecs, k = 4)
      .select("query_id", "corpus_id", "sim").collect()
    assert(ivf.nonEmpty)
    ivf.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(brute.contains(key) && brute(key) === r.getDouble(2))
    }
  }

  test("near-dup pairs finds exactly the high-cosine pair") {
    val pairs = Similarity.cosineNearDupPairs(vecs, threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq === Seq((1L, 2L)))
  }

  /** 100 random 64-dim base vectors + 20 planted near-identical dups
    * (tiny perturbation ⇒ cosine ≈ 0.999). Fixed seed: deterministic. */
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

  test("banded LSH near-dup: ≥90% recall on planted dups, " +
    "every emitted pair exact-verified") {
    val corpus = plantedCorpus
    val brute = Similarity.cosineNearDupPairs(corpus, threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.size >= 20) // the 20 planted pairs are all above 0.95
    val lsh = Similarity.cosineLshNearDupPairs(corpus, threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(brute)) // exact verify ⇒ no false positives
    val recall = lsh.size.toDouble / brute.size
    assert(recall >= 0.9, s"banded-LSH recall $recall below 0.9 " +
      s"(${lsh.size}/${brute.size})")
  }

  test("wide LSH configs (bands x bandBits > 64) work with the " +
    "per-band signature words: narrower buckets, recall bought back " +
    "with more bands, still zero false positives") {
    val corpus = plantedCorpus
    val brute = Similarity.cosineNearDupPairs(corpus, threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 8 bands x 20 bits = 160 hyperplanes — impossible with one packed
    // long; the large-corpus posture from SCALE.md
    val wide = Similarity.cosineLshNearDupPairs(corpus,
        threshold = 0.95, bands = 8, bandBits = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(wide.subsetOf(brute), "exact verify => no false positives")
    // band-collision prob for a 0.95 pair at 20 bits ~ 0.899^20 = 0.12;
    // 8 bands => ~0.64 expected — assert a loose floor only (the pin
    // here is that the wide config RUNS and amplifies, not its exact
    // recall, which SimilaritySpec pins at the default config)
    assert(wide.size.toDouble / brute.size >= 0.3,
      s"wide-config recall collapsed: ${wide.size}/${brute.size}")
  }

  test("cosineNearDupPairs routes to the LSH path above the brute cap") {
    val corpus = plantedCorpus
    val routed = Similarity
      .cosineNearDupPairs(corpus, threshold = 0.95, bruteMaxRows = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Similarity.cosineNearDupPairs(corpus, threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(routed.nonEmpty && routed.subsetOf(brute))
  }

  test("multi-probe IVF recall ≥ single-probe, both score-exact vs brute") {
    val corpus = plantedCorpus
    val queries = corpus.filter(col("vec_id") < 20)
    def hits(probes: Int): Set[(Long, Long)] =
      Similarity.ivfTopK(corpus, queries, k = 5, probes = probes)
        .select("query_id", "corpus_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Similarity.bruteForceTopK(corpus, queries, k = 5)
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val single = hits(1)
    val multi = hits(3)
    val rSingle = (single & brute).size.toDouble / brute.size
    val rMulti = (multi & brute).size.toDouble / brute.size
    assert(rMulti >= rSingle,
      s"multi-probe recall $rMulti < single-probe $rSingle")
    assert(rMulti > rSingle,
      s"fixture expected a strict recall gain ($rSingle -> $rMulti)")
  }

  test("trained-centroid IVF: recall >= hyperplane IVF at equal bucket " +
    "count and probe count; all scores exact vs brute") {
    val corpus = plantedCorpus
    val queries = corpus.filter(col("vec_id") < 20)
    val brute = Similarity.bruteForceTopK(corpus, queries, k = 5)
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // equal comparison: 16 buckets each (bits=4 → 2^4 for hyperplanes,
    // nlist=16 for k-means), 3 probed buckets per query
    val hyper = Similarity.ivfTopK(corpus, queries, k = 5,
        bits = 4, probes = 3)
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val trained = Similarity.ivfTrainedTopK(corpus, queries, k = 5,
        nlist = 16, probes = 3)
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rHyper = (hyper & brute).size.toDouble / brute.size
    val rTrained = (trained & brute).size.toDouble / brute.size
    assert(rTrained >= rHyper,
      s"trained-centroid recall $rTrained below hyperplane $rHyper")
    // scores must be the exact cosine (bucketing only prunes candidates)
    val bruteScores = Similarity.bruteForceTopK(corpus, queries, k = 120)
      .select("query_id", "corpus_id", "sim").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    Similarity.ivfTrainedTopK(corpus, queries, k = 5, nlist = 16,
        probes = 3)
      .select("query_id", "corpus_id", "sim").collect()
      .foreach { r =>
        val key = (r.getLong(0), r.getLong(1))
        assert(bruteScores(key) === r.getDouble(2))
      }
  }

  test("PQ ADC + re-rank: planted dups retrieved, scores exact vs " +
    "brute, recall competitive") {
    val corpus = plantedCorpus
    val queries = corpus.filter(col("vec_id") < 20)
    val brute = Similarity.bruteForceTopK(corpus, queries, k = 5)
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Similarity.pqTopK(corpus, queries, k = 5, dims = 64,
        m = 8, ksub = 16, rerank = 4)
      .select("query_id", "corpus_id", "sim").collect()
    val pqPairs = pq.map(r => (r.getLong(0), r.getLong(1))).toSet
    // a near-identical dup quantizes to (almost) the query's own codes,
    // so ADC puts it at the top: every planted dup must be retrieved
    (0L until 20L).foreach { q =>
      assert(pqPairs.contains((q, q + 1000L)),
        s"planted dup of $q missed by PQ")
    }
    val recall = (pqPairs & brute).size.toDouble / brute.size
    assert(recall >= 0.5, s"PQ recall $recall below 0.5")
    // re-ranked scores are the exact rounded cosine (candidates only
    // are approximate; emitted similarities are not)
    val bruteScores = Similarity.bruteForceTopK(corpus, queries, k = 120)
      .select("query_id", "corpus_id", "sim").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    pq.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(bruteScores(key) === r.getDouble(2),
        s"PQ re-rank score differs from brute at $key")
    }
  }

  test("lsh signature is deterministic across evaluations") {
    val a = Similarity.cosineLshBuckets(vecs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = Similarity.cosineLshBuckets(vecs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a === b)
    // opposite vectors get complementary signatures → different buckets
    assert(a(1L) !== a(4L))
  }

  test("int8 quantization: bounded reconstruction error, zero-vector safe") {
    val withZero = vecs.unionAll(
      Seq((6L, Seq(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding"))
    val rows = Similarity.quantizeInt8(withZero, "embedding")
      .select(col("vec_id"), col("embedding"),
        col("max_abs").as("mx"), col("q")).collect()
    rows.foreach { r =>
      val orig = r.getAs[collection.Seq[Float]]("embedding")
      val scale = r.getDouble(2)
      val quant = r.getAs[collection.Seq[Byte]]("q")
      assert(quant.length === orig.length)
      if (scale == 0.0) assert(quant.forall(_ === 0))
      else orig.zip(quant).foreach { case (x, qi) =>
        assert(qi >= -127 && qi <= 127)
        // dequantized value within half a quantization step
        assert(math.abs(qi * scale / 127.0 - x) <= scale / 127.0 / 2 + 1e-9)
      }
    }
  }

  test("mmr: a near-clone of the first pick is demoted below an " +
    "equally-relevant but diverse candidate") {
    // query 0; candidates 1 and 2 are clones at +26 deg, candidate 3
    // mirrors them at -26 deg (same relevance, low mutual similarity)
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f)),
      (1L, Seq(0.9f, 0.436f, 0.0f)),
      (2L, Seq(0.9f, 0.4359f, 0.01f)),
      (3L, Seq(0.9f, -0.436f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = graft.sim.Similarity
      .mmrRerank(emb, emb.filter($"vec_id" === 0), k = 3, poolK = 3)
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(out.toSeq === Seq((1, 1L), (2, 3L), (3, 2L)),
      "greedy order must be: top pick, then the diverse mirror, " +
        "then the clone")
  }

  test("mmr at lambda = 1 degenerates to pure relevance ranking") {
    val emb = vecs
    val mmr = graft.sim.Similarity
      .mmrRerank(emb, emb.filter($"vec_id" === 1), k = 3, poolK = 4,
        lambda = 1.0)
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    val plain = graft.sim.Similarity
      .bruteForceTopK(emb, emb.filter($"vec_id" === 1), k = 3)
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(mmr.toSeq === plain.toSeq)
  }

  test("mmr never repeats a pick within a query") {
    val emb = vecs
    val out = graft.sim.Similarity
      .mmrRerank(emb, emb.filter($"vec_id" <= 2), k = 3, poolK = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    out.groupBy(_._1).values.foreach { picks =>
      assert(picks.map(_._2).distinct.length === picks.length)
    }
  }

  test("sim11 recall report: measured recall@5 of every ANN variant " +
    "on the harness embeddings — rows-only operators get their " +
    "quality numbers pinned HERE (sim2/sim7/sim8), and the " +
    "deterministic label-IVF leg reports sane integer metrics") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 20)
    val truth = Similarity.bruteForceTopK(emb, q, k = 5)
    def meanRecallE4(ann: org.apache.spark.sql.DataFrame): Double =
      Similarity.annRecallReport(truth, ann)
        .agg(avg(col("recall_e4"))).head().getDouble(0)
    val rIvf = meanRecallE4(
      Similarity.ivfTopK(emb, q, k = 5, probes = 3))
    val rTrained = meanRecallE4(
      Similarity.ivfTrainedTopK(emb, q, k = 5, nlist = 16, probes = 3))
    val rPq = meanRecallE4(Similarity.pqTopK(emb, q, k = 5,
      dims = 64, m = 8, ksub = 16, rerank = 4))
    val rLabel = meanRecallE4(
      Similarity.labelCentroidIvfTopK(emb, q, k = 5, probes = 2))
    // measured floors on this corpus (generous margins below the
    // observed values so data regrowth doesn't flap the pin)
    assert(rIvf >= 1000.0, s"hyperplane-IVF recall@5 fell to $rIvf")
    assert(rTrained >= rIvf,
      s"trained IVF ($rTrained) must not trail hyperplane ($rIvf)")
    assert(rPq >= 2000.0, s"PQ+rerank recall@5 fell to $rPq")
    assert(rLabel >= 2000.0, s"label-IVF recall@5 fell to $rLabel")
    // the report itself: full ann_k, ratio bounded by 1 when truth
    // dominates, exact integers end to end
    val rep = Similarity.annRecallReport(truth,
      Similarity.labelCentroidIvfTopK(emb, q, k = 5, probes = 2))
      .collect()
    assert(rep.length === 20)
    rep.foreach { r =>
      assert(r.getAs[Long]("ann_k") === 5L)
      assert(r.getAs[Long]("recall_e4") ===
        2000L * r.getAs[Long]("n_overlap"))
      assert(r.getAs[Long]("sim_ratio_e4") <= 10000L,
        "ANN similarity mass cannot beat exact truth")
    }
  }
}
