package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq(
    (0L, "hello world"),
    (1L, "abc"),
    (2L, "zzzz zzzz")
  ).toDF("doc_id", "text")

  test("binary payload + typed metadata per media type") {
    val m = Multimodal.withBinaryPayload(docs).orderBy("doc_id").collect()
    assert(m(0).getAs[String]("media_type") === "image")
    assert(m(1).getAs[String]("media_type") === "audio")
    assert(m(2).getAs[String]("media_type") === "video")
    val meta0 = m(0).getAs[org.apache.spark.sql.Row]("metadata")
    assert(meta0.getAs[Int]("width") === 64)
    assert(meta0.isNullAt(meta0.fieldIndex("sample_rate")))
    val meta1 = m(1).getAs[org.apache.spark.sql.Row]("metadata")
    assert(meta1.getAs[Int]("sample_rate") === 16000)
    assert(m(0).getAs[Array[Byte]]("media") ===
      "hello world".getBytes("UTF-8"))
  }

  test("feature extraction: schema + deterministic stub features") {
    val f = Multimodal
      .extractFeatures(Multimodal.withBinaryPayload(docs))
      .orderBy("doc_id").collect()
    assert(f.length === 3)
    val r = f(1) // "abc" = bytes 97,98,99
    assert(r.getAs[Int]("byte_len") === 3)
    assert(r.getAs[Seq[Double]]("feature") === Seq(3.0, 98.0, 97.0, 99.0))
  }

  test("mm6 perceptual dedup: an exact copy pairs at hamming 0, a " +
    "local edit pairs at small hamming, an unrelated payload does " +
    "not pair") {
    import org.apache.spark.sql.functions.col
    val base = ("aaaa bbbb cccc dddd eeee ffff gggg hhhh iiii jjjj " +
      "kkkk llll mmmm nnnn oooo pppp qqqq rrrr ssss tttt") * 3
    val edited = base.updated(50, 'Z').updated(51, 'Z')
    val unrelated = ("zz a zz yy b xx zz ww c vv zz uu d tt zz ss e " +
      "rr zz qq f pp zz oo g nn zz mm h ll zz kk i jj") * 3
    val docs = Seq(
      (1L, base), (2L, base), (3L, edited), (4L, unrelated))
      .toDF("doc_id", "text")
    val pairs = Multimodal.mediaNearDupPairs(
      Multimodal.withBinaryPayload(docs))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs((1L, 2L)) === 0, "exact copy must be hamming 0")
    assert(pairs.contains((1L, 3L)) && pairs((1L, 3L)) <= 6,
      s"local edit must pair closely: $pairs")
    assert(!pairs.keys.exists(k => k._1 == 4L || k._2 == 4L),
      s"unrelated payload must not pair: $pairs")
  }

  test("mm6p portable perceptual hash: exact copy at hamming 0, local " +
    "edit pairs closely, unrelated text does not pair — same contract " +
    "as mm6 through the md5-span grid") {
    import org.apache.spark.sql.functions.col
    val base = ("aaaa bbbb cccc dddd eeee ffff gggg hhhh iiii jjjj " +
      "kkkk llll mmmm nnnn oooo pppp qqqq rrrr ssss tttt") * 3
    val edited = base.updated(50, 'Z').updated(51, 'Z')
    val unrelated = ("zz a zz yy b xx zz ww c vv zz uu d tt zz ss e " +
      "rr zz qq f pp zz oo g nn zz mm h ll zz kk i jj") * 3
    val docs = Seq(
      (1L, base), (2L, base), (3L, edited), (4L, unrelated))
      .toDF("doc_id", "text")
    val pairs = graft.dedup.Dedup.simhashNearPairs(
        Multimodal.portablePerceptualHashes(docs),
        maxDist = 6, sigBits = 48)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs((1L, 2L)) === 0, "exact copy must be hamming 0")
    assert(pairs.contains((1L, 3L)) && pairs((1L, 3L)) <= 6,
      s"local edit must pair closely: $pairs")
    assert(!pairs.keys.exists(k => k._1 == 4L || k._2 == 4L),
      s"unrelated payload must not pair: $pairs")
  }

  test("mm7 exact media dedup: byte-identical payloads collapse on " +
    "the digest despite divergent metadata; unique payloads drop") {
    // ids 0 and 3 are both images (doc_id % 3 == 0) with DIFFERENT
    // widths (doc_id % 1024 + 64) but the same bytes; id 1 shares
    // bytes with 6 under different media types; id 2 is unique
    val docs = Seq(
      (0L, "same payload"), (3L, "same payload"),
      (1L, "other bytes"), (6L, "other bytes"),
      (2L, "loner")).toDF("doc_id", "text")
    val out = Multimodal.exactMediaDedup(
      Multimodal.withBinaryPayload(docs))
      .orderBy("canonical_id").collect()
    assert(out.length === 2, "exactly two duplicate sets")
    val first = out(0)
    assert(first.getAs[Long]("canonical_id") === 0L)
    assert(first.getAs[Long]("n_copies") === 2L)
    assert(first.getAs[Long]("n_meta_variants") === 2L,
      "widths 64 and 67 are distinct metadata on identical bytes")
    val second = out(1)
    assert(second.getAs[Long]("canonical_id") === 1L)
    assert(second.getAs[Long]("n_copies") === 2L)
    // id 1 is audio (width null), id 6 is image (width 70): one
    // non-null distinct width
    assert(second.getAs[Long]("n_meta_variants") === 1L)
  }
}
