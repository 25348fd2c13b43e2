package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup

/** Dedup operators on planted duplicates / near-duplicates. */
class DedupSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while the cat sleeps " +
      "on the warm windowsill in the afternoon sun near the garden"

  private def docs = Seq(
    (1L, base),
    (2L, base + " today"),                       // near-dup of 1
    (3L, "  THE quick   brown fox jumps over the lazy dog while the cat " +
      "sleeps on the warm windowsill in the afternoon sun near the garden "),
    // 3 = exact dup of 1 after normalization
    (4L, "completely different content about distributed query engines " +
      "and columnar storage formats with vectorized execution pipelines"),
    (5L, "another unrelated text mentioning parquet files shuffle " +
      "partitions broadcast joins and adaptive execution in spark clusters")
  ).toDF("doc_id", "text")

  test("exact dedup groups normalized duplicates, keeps min id") {
    val groups = Dedup.exactGroups(docs).collect()
    assert(groups.length === 1)
    assert(groups(0).getAs[Long]("canonical_id") === 1L)
    assert(groups(0).getAs[Seq[Long]]("member_ids") === Seq(1L, 3L))
    val kept = Dedup.dropExactDuplicates(docs)
    assert(kept.select("doc_id").as[Long].collect().sorted ===
      Array(1L, 2L, 4L, 5L))
  }

  test("minhash LSH surfaces the planted near-dup pair, not the " +
    "unrelated ones") {
    val sigs = Dedup.minhashSignatures(docs)
    assert(sigs.count() === 5)
    val cands = Dedup.lshCandidatePairs(sigs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((1L, 3L))) // identical shingle sets
    assert(cands.contains((1L, 2L)) || cands.contains((2L, 3L)),
      s"near-dup pair missed: $cands")
    assert(!cands.contains((4L, 5L)))
  }

  test("ngram jaccard verifies near-dups with exact similarity") {
    val pairs = Dedup.ngramJaccardPairs(docs, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val m = pairs.map(p => ((p._1, p._2), p._3)).toMap
    assert(m((1L, 3L)) === 10000L)
    assert(m.contains((1L, 2L)) && m((1L, 2L)) > 9000L)
    assert(!m.contains((4L, 5L)))
  }

  test("ngram jaccard prunes tokens above the absolute df cap") {
    // maxDf = 2 drops every token shared by docs 1, 2 AND 3 (df = 3),
    // leaving doc 2 only its unique "today" — so the (1,3) exact-dup
    // pair survives on nothing and no pair reaches the threshold.
    val pruned = Dedup.ngramJaccardPairs(docs, threshold = 0.5, maxDf = 2)
      .collect()
    assert(pruned.isEmpty)
    // default cap (10k) prunes nothing at fixture scale: identical result
    // to the unpruned jaccard of the other test
    val full = Dedup.ngramJaccardPairs(docs, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(full.map(p => (p._1, p._2)).toSet === Set((1L, 3L), (1L, 2L),
      (2L, 3L)))
  }

  test("simhash: identical docs distance 0; similar docs closer than " +
    "unrelated ones") {
    val sigs = Dedup.simhash(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(sigs(a) ^ sigs(b))
    assert(ham(1L, 3L) === 0)
    assert(ham(1L, 2L) < ham(1L, 4L))
    val pairs = Dedup.simhashNearPairs(Dedup.simhash(docs), maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val m = pairs.map(p => ((p._1, p._2), p._3)).toMap
    assert(m((1L, 3L)) === 0)
    assert(!m.contains((4L, 5L)))
  }

  test("shingles: distinct k-grams of the normalized text") {
    val sh = docs.filter(col("doc_id") === 1L)
      .select(Dedup.shingles(col("text"), k = 5).as("sh"))
      .head().getAs[collection.Seq[String]]("sh")
    assert(sh.contains("quick"))
    assert(sh.distinct.length === sh.length)
  }

  test("dropNearDuplicates keeps canonical members + unpaired docs") {
    // 1-2-3 cluster near-dups (1 canonical); 4 and 5 unpaired
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val kept = Dedup.dropNearDuplicates(docs, pairs)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(1L, 4L, 5L))
  }

  test("incrementalDedup: corpus-known texts die against the index " +
    "(even normalized variants), within-batch dups collapse to min id, " +
    "fresh texts survive") {
    val corpus = docs.filter(col("doc_id") <= 2) // texts of 1 and 2
    val incoming = Seq(
      (10L, base),                   // exact re-delivery of corpus text 1
      (11L, "  THE quick   brown fox jumps over the lazy dog while the " +
        "cat sleeps on the warm windowsill in the afternoon sun near " +
        "the garden "),              // normalized dup of corpus text 1
      (12L, "a genuinely new document about stream processing"),
      (13L, "a genuinely new document about stream processing"), // batch dup
      (14L, "another new document mentioning columnar formats")
    ).toDF("doc_id", "text")
    val kept = Dedup.incrementalDedup(corpus, incoming)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(12L, 14L))
  }

  test("incrementalNearDedup: a MUTATED re-delivery slips past the " +
    "exact index (d10) but dies against the LSH band index (d11); " +
    "novel docs survive both") {
    val corpus = docs.filter(col("doc_id") <= 2) // texts of 1 and 2
    val incoming = Seq(
      (10L, base + " z"),            // mutated re-delivery of corpus 1
      (11L, base),                   // exact re-delivery of corpus 1
      (12L, "a genuinely new document about stream processing engines " +
        "and their watermark semantics under late arriving data"),
      (13L, "another new document mentioning columnar storage formats " +
        "dictionary encoding and predicate pushdown at the scan")
    ).toDF("doc_id", "text")
    // d10's exact index accepts the mutation (different fingerprint)...
    val exactKept = Dedup.incrementalDedup(corpus, incoming)
      .select("doc_id").as[Long].collect().sorted
    assert(exactKept.toSeq === Seq(10L, 12L, 13L),
      "exact-only dedup must MISS the mutated re-delivery")
    // ...the near-dup band index catches it (and still the exact one)
    val nearKept = Dedup.incrementalNearDedup(corpus, incoming)
      .select("doc_id").as[Long].collect().sorted
    assert(nearKept.toSeq === Seq(12L, 13L),
      "near-dup dedup must catch both the mutated and the exact " +
        "re-delivery while keeping novel docs")
  }

  test("incrementalNearDedupBySignature: same catches as the exact-" +
    "verify path on planted data, with NO text on the verify leg") {
    val corpus = docs.filter(col("doc_id") <= 2)
    val incoming = Seq(
      (10L, base + " z"),            // mutated re-delivery of corpus 1
      (11L, base),                   // exact re-delivery of corpus 1
      (12L, "a genuinely new document about stream processing engines " +
        "and their watermark semantics under late arriving data")
    ).toDF("doc_id", "text")
    val kept = Dedup.incrementalNearDedupBySignature(corpus, incoming)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(12L),
      "estimated-Jaccard verification must catch both re-deliveries " +
        "and keep the novel doc")
  }

  test("lshBandIndex is the persistable probe surface: bands × docs " +
    "rows, and identical texts collide on every band") {
    val idx = Dedup.lshBandIndex(docs)
    assert(idx.count() === 5 * 4)
    val byDoc = idx.collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getInt(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byDoc(1L) === byDoc(3L),
      "normalization-equal texts must share all band buckets")
    assert(byDoc(4L) != byDoc(5L))
  }

  test("decontaminate drops docs sharing an n-gram with the benchmark") {
    // doc 2 embeds a verbatim 5-gram of benchmark doc 1; docs 4/5 share
    // no 5-gram with it (case/whitespace-insensitive via normalization)
    val benchmark = Seq((1L, base)).toDF("doc_id", "text")
    val corpus = docs.filter(col("doc_id") > 1)
    val kept = Dedup.decontaminate(corpus, benchmark)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(4L, 5L))
    // short docs (< n tokens) can never be flagged
    val shorty = Seq((9L, "tiny doc")).toDF("doc_id", "text")
    assert(Dedup.decontaminate(shorty, benchmark).count() === 1)
  }

  test("duplicateSpans: cross-doc overlap, within-doc repeat, island " +
    "merge, clean docs absent") {
    val fixture = Seq(
      // shares "a b c d e f" with doc 2 → one merged span [1,6] of 8
      (1L, "a b c d e f x1 x2"),
      // the shared run sits mid-doc → span [3,8] of 9
      (2L, "z1 z2 a b c d e f z3"),
      // "p q r s" repeats WITHIN the doc (pos 1 and 7, gap > k) → two
      // spans [1,4] + [7,10] of 10
      (3L, "p q r s m1 n1 p q r s"),
      // no 4-gram occurs twice anywhere → absent from the output
      (4L, "u1 u2 u3 u4 u5 u6 u7 u8")
    ).toDF("doc_id", "text")
    val out = Dedup.duplicateSpans(fixture, k = 4)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_dup_spans"),
          r.getAs[Long]("dup_tokens")))).toMap
    assert(out === Map(
      1L -> ((8L, 1L, 6L)),
      2L -> ((9L, 1L, 6L)),
      3L -> ((10L, 2L, 8L))))
    // adjacent-but-distinct islands merge when the repeat is contiguous:
    // "m a b c d a b c d n" — "a b c d" at pos 2 and 6; overlapping
    // duplicated windows in between chain the coverage into ONE span
    val contiguous = Seq(
      (10L, "m1 a b c d a b c d n1"),
      (11L, "zz a b c d zz2")).toDF("doc_id", "text")
    val merged = Dedup.duplicateSpans(contiguous, k = 4)
      .filter(col("doc_id") === 10L).collect()
    assert(merged.length === 1)
    assert(merged(0).getAs[Long]("n_dup_spans") === 1L)
    assert(merged(0).getAs[Long]("dup_tokens") === 8L)
  }

  test("wordNgrams: joined windows of the normalized token stream") {
    val grams = Seq((1L, "A  b c d")).toDF("doc_id", "text")
      .select(Dedup.wordNgrams(col("text"), 3).as("g"))
      .head().getAs[collection.Seq[String]]("g")
    assert(grams.toSeq === Seq("a b c", "b c d"))
    val empty = Seq((1L, "a b")).toDF("doc_id", "text")
      .select(Dedup.wordNgrams(col("text"), 3).as("g"))
      .head().getAs[collection.Seq[String]]("g")
    assert(empty.isEmpty)
  }

  test("containment is DIRECTED: the excerpt flags against its " +
    "source at 1.0, the source does not flag against the excerpt, " +
    "and Jaccard misses the pair entirely") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
        "lambda mu nu xi omicron pi rho sigma tau upsilon"),
      (2L, "alpha beta gamma delta epsilon"), // strict excerpt of 1
      (3L, "completely different words entirely here now")
    ).toDF("doc_id", "text")
    val out = Dedup.ngramContainmentPairs(docs, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((2L, 1L, 10000L)),
      s"expected only the directed excerpt pair, got ${out.toSeq}")
    // the symmetric token Jaccard at the same bar sees nothing: the
    // excerpt's 5 tokens over the union of 20 is 0.25
    val j = Dedup.ngramJaccardPairs(docs, threshold = 0.9).collect()
    assert(j.isEmpty)
  }
}
