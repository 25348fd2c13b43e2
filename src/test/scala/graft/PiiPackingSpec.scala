package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.TextAnalysis

/** PII scrub (detection + redaction) and sequence packing semantics on
  * planted fixtures, plus the empty-map regression for the stratified
  * samplers (the fold previously NPE'd instead of taking the default). */
class PiiPackingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("piiScrub finds and redacts planted emails, phones, ips") {
    val docs = Seq(
      (1L, "reach me at alice.smith@corp-mail.org thanks"),
      (2L, "call +1-555-0134 or +44-201-7777 today"),
      (3L, "server 10.1.22.3 and backup 192.168.0.254"),
      (4L, "no pii here at all"),
      (5L, "mixed bob@x.io from 8.8.8.8 dial +1-555-9999")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.piiScrub(docs)
      .select($"doc_id", $"n_emails", $"n_phones", $"n_ips", $"scrubbed",
        $"has_pii")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getInt(1) === 1 &&
      out(1L).getString(4).contains("<EMAIL>"))
    assert(out(2L).getInt(2) === 2 &&
      !out(2L).getString(4).contains("555"))
    assert(out(3L).getInt(3) === 2 &&
      out(3L).getString(4) === "server <IP> and backup <IP>")
    assert(out(4L).getInt(1) === 0 && out(4L).getInt(2) === 0 &&
      out(4L).getInt(3) === 0 && !out(4L).getBoolean(5) &&
      out(4L).getString(4) === "no pii here at all")
    assert(out(5L).getInt(1) === 1 && out(5L).getInt(2) === 1 &&
      out(5L).getInt(3) === 1 && out(5L).getBoolean(5))
  }

  test("packSequences: offsets advance by token counts within a stratum " +
    "and packs cut at capacity") {
    // one stratum, fingerprint order is deterministic; capacity 5 tokens
    val docs = Seq(
      (1L, "s", "a b c"),       // 3 tokens
      (2L, "s", "d e f g"),     // 4 tokens
      (3L, "s", "h i"),         // 2 tokens
      (4L, "s", "j k l m n o")  // 6 tokens — longer than one pack
    ).toDF("doc_id", "source", "text")
    val out = TextAnalysis.packSequences(docs, "source", capacity = 5)
      .select($"doc_id", $"n_tokens", $"pack_id", $"offset_in_pack",
        $"crosses_boundary")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    // total stream = 15 tokens => 3 packs; doc order follows fingerprints,
    // so reconstruct expectations from the emitted cumulative layout
    val totalTokens = out.values.map(_._1).sum
    assert(totalTokens === 15L)
    // every doc's offset is its stream position mod 5, pack is div 5
    val byStart = out.values.toSeq.sortBy(v => (v._2, v._3)) // (pack, off)
    var pos = 0L
    byStart.foreach { case (n, pack, off, crosses) =>
      assert(pack === pos / 5, s"pack at pos $pos")
      assert(off === pos % 5, s"offset at pos $pos")
      assert(crosses === (pos % 5 + n > 5), s"crossing at pos $pos")
      pos += n
    }
    // a 6-token doc can never fit one 5-token pack
    assert(out(4L)._4 === true)
  }

  test("chunkOverlap: stride-spaced starts, overlap preserved, short " +
    "docs yield one chunk, tail chunk short but never empty") {
    val docs = Seq(
      (1L, (1 to 10).map("t" + _).mkString(" ")), // 10 tokens
      (2L, "a b c")                               // shorter than window
    ).toDF("doc_id", "text")
    val out = TextAnalysis.chunkOverlap(docs, window = 4, stride = 3)
      .select($"doc_id", $"chunk_id", $"chunk_start", $"chunk_len",
        $"chunk_text")
      .collect().groupBy(_.getLong(0))
    // 10 tokens, window 4, stride 3 => ceil((10-4)/3)+1 = 3 chunks
    val d1 = out(1L).sortBy(_.getLong(1))
    assert(d1.length === 3)
    assert(d1.map(_.getLong(2)).toSeq === Seq(0L, 3L, 6L))
    assert(d1.map(_.getLong(3)).toSeq === Seq(4L, 4L, 4L))
    assert(d1(0).getString(4) === "t1 t2 t3 t4")
    assert(d1(1).getString(4) === "t4 t5 t6 t7") // 1-token overlap
    assert(d1(2).getString(4) === "t7 t8 t9 t10")
    val d2 = out(2L)
    assert(d2.length === 1 && d2(0).getLong(3) === 3L &&
      d2(0).getString(4) === "a b c")
  }

  test("stratifiedSample and tokenBudgetSample accept empty maps " +
    "(default applies to every stratum)") {
    val docs = (0 until 200)
      .map(i => (i.toLong, "s" + (i % 3), s"text body number $i"))
      .toDF("doc_id", "lang", "text")
    val kept = TextAnalysis.stratifiedSample(docs, "lang", "text",
      rates = Map.empty, defaultRate = 1.0).count()
    assert(kept === 200L)
    val budgeted = TextAnalysis.tokenBudgetSample(docs, "lang",
      budgets = Map.empty, defaultBudget = Long.MaxValue,
      idCol = "doc_id", textCol = "text").count()
    assert(budgeted === 200L)
  }
}
