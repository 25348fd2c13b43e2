package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup

/** Engine-portable MinHash-LSH (d17): planted duplicates must surface
  * through the banding with the agreement the theory predicts. */
class PortableMinhashSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val lorem = "the quick brown fox jumps over the lazy dog " +
    "while the cat watches from the warm stone wall near the garden"

  test("an exact duplicate agrees on every minhash and every band; " +
    "a light suffix mutation still collides on most") {
    val docs = Seq(
      (1L, lorem),
      (2L, lorem), // exact dup of 1
      (3L, lorem + " zq3x"), // suffix-mutated near-dup
      (4L, "completely different content about distributed query " +
        "engines shuffling partitioned columnar data across executors")
    ).toDF("doc_id", "text")
    val out = Dedup.portableMinhashPairs(docs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(out((1L, 2L)) === (4L, 16L),
      "identical text => identical signature => all 4 bands, 16/16")
    val (nb, ag) = out.getOrElse((1L, 3L), out((2L, 3L)))
    assert(nb >= 1 && ag >= 8,
      s"suffix mutation must stay a candidate with high agreement: " +
        s"bands=$nb agree=$ag")
    assert(!out.contains((1L, 4L)) && !out.contains((2L, 4L)),
      "unrelated docs must not collide on any band")
  }

  test("signatures are the documented md5-prefix family (portable: " +
    "the same value DuckDB computes)") {
    // replay h_0 of one shingle by hand against the engine's minhash
    // on a single-shingle doc (text shorter than k=5 yields exactly
    // one shingle: the whole string)
    val docs = Seq((1L, "abc")).toDF("doc_id", "text")
    val got = Dedup.portableMinhashPairs(docs.unionAll(
      Seq((2L, "abc")).toDF("doc_id", "text")))
      .collect().head
    assert(got.getLong(2) === 4L && got.getLong(3) === 16L)
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("0:abc".getBytes("UTF-8"))
    val h0 = java.lang.Long.parseLong(
      md.map("%02x".format(_)).mkString.take(12), 16)
    val sig0 = docs
      .select(col("doc_id"), explode(Dedup.shingles(col("text")))
        .as("shingle"))
      .select(expr(
        "CAST(conv(substring(md5(concat('0:', shingle)), 1, 12), 16," +
          " 10) AS BIGINT)"))
      .collect().head.getLong(0)
    assert(sig0 === h0, "the hash family is bit-replayable by hand")
  }
}
