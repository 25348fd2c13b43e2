package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.Dsir

/** DSIR importance weights on a planted two-domain corpus: docs that
  * share the target's bigrams must outrank docs from the off-domain
  * pool, featureless docs score 0, and the top-k cut is deterministic. */
class DsirSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // target domain speaks "alpha beta gamma", the off-domain pool
  // speaks "zork quux blarg"
  private def corpus = Seq(
    // target slice (is_target = src == "curated")
    (1L, "alpha beta gamma alpha beta", "curated"),
    (2L, "beta gamma alpha beta gamma", "curated"),
    // raw pool: on-domain (should score high)
    (10L, "alpha beta gamma alpha beta gamma", "crawl"),
    (11L, "gamma alpha beta gamma", "crawl"),
    // raw pool: off-domain (should score low)
    (20L, "zork quux blarg zork quux", "crawl"),
    (21L, "blarg zork quux blarg", "crawl"),
    // raw pool: featureless (single token => no bigrams)
    (30L, "solo", "crawl")
  ).toDF("doc_id", "text", "source")

  test("on-domain raw docs outrank off-domain; featureless doc " +
    "scores exactly 0") {
    val w = Dsir.weights(corpus, col("source") === "curated",
      buckets = 256)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(w.keySet === Set(10L, 11L, 20L, 21L, 30L),
      "every raw doc scored, no target doc scored")
    assert(w(30L) === (0L, 0.0), "featureless doc: 0 features, weight 0")
    assert(w(10L)._2 > 0 && w(11L)._2 > 0,
      s"target-domain bigrams must upweight: ${w(10L)}, ${w(11L)}")
    assert(w(20L)._2 < 0 && w(21L)._2 < 0,
      s"pool-only bigrams must downweight: ${w(20L)}, ${w(21L)}")
    assert(w(10L)._1 === 5L && w(30L)._1 === 0L,
      "n_feats = bigram occurrence count")
  }

  test("selectTopK keeps the highest-weight docs with a " +
    "deterministic id tie-break") {
    val top = Dsir.selectTopK(corpus, col("source") === "curated",
      k = 2, buckets = 256).collect().map(_.getLong(0)).toSeq
    assert(top === Seq(10L, 11L),
      s"the two on-domain docs must win the cut: $top")
  }

  test("weight replays from the scalar definition (per-bucket 6dp " +
    "rounded log-ratios, exact decimal sum)") {
    val b = 256
    // hand-build the same model from the corpus rows
    def bigrams(t: String): Seq[String] =
      t.split("\\s+").sliding(2).filter(_.length == 2)
        .map(_.mkString(" ")).toSeq
    val rows = corpus.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2)))
    def bucket(bg: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(bg.getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(12)
      java.lang.Long.parseLong(hex, 16) % b
    }
    val tCnt = rows.filter(_._3 == "curated")
      .flatMap(r => bigrams(r._2)).groupBy(bucket).map {
        case (k, v) => k -> v.size.toLong }
    val rRows = rows.filter(_._3 != "curated")
    val rCnt = rRows.flatMap(r => bigrams(r._2)).groupBy(bucket).map {
      case (k, v) => k -> v.size.toLong }
    val nt = tCnt.values.sum; val nr = rCnt.values.sum
    def r6(x: Double): BigDecimal =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val lambda = rCnt.keys.map { bk =>
      bk -> (r6(math.log((tCnt.getOrElse(bk, 0L) + 1).toDouble /
          (nt + b))) -
        r6(math.log((rCnt(bk) + 1).toDouble / (nr + b))))
    }.toMap
    val expected = rRows.map { case (id, t, _) =>
      id -> bigrams(t).map(bg => lambda(bucket(bg))).sum.toDouble
    }.toMap
    val got = Dsir.weights(corpus, col("source") === "curated",
      buckets = b).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    expected.foreach { case (id, w) =>
      assert(got(id) === w, s"doc $id: engine ${got(id)} vs scalar $w")
    }
  }
}
