package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.Dsir

/** s20's offline half: the dense λ model persists losslessly and
  * scores a pool identically from disk — the frozen-artifact property
  * the stream gate's batch-boundary independence rests on. */
class StreamDsirGateSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus = Seq(
    (1L, "alpha beta gamma alpha beta", "curated"),
    (2L, "beta gamma alpha beta gamma", "curated"),
    (10L, "alpha beta gamma alpha beta gamma", "crawl"),
    (20L, "zork quux blarg zork quux", "crawl")
  ).toDF("doc_id", "text", "source")

  test("denseLambda is dense (exactly B rows) and round-trips " +
    "through parquet bit-identically") {
    val b = 128
    val lam = Dsir.denseLambda(corpus, col("source") === "curated",
      buckets = b)
    val rows = lam.collect()
    assert(rows.length === b, "one row per bucket, populated or not")
    val dir = java.nio.file.Files
      .createTempDirectory("dsir_lam").resolve("m").toString
    lam.write.parquet(dir)
    val back = spark.read.parquet(dir)
    val a = rows.map(r => r.getLong(0) -> r.getDecimal(1)).toMap
    val c = back.collect().map(r => r.getLong(0) -> r.getDecimal(1))
      .toMap
    assert(a === c, "persisted model must be exact, not approximate")
  }

  test("scoring from the persisted model equals scoring in memory, " +
    "and the keep flag follows the weight sign") {
    val b = 128
    val lam = Dsir.denseLambda(corpus, col("source") === "curated",
      buckets = b)
    val dir = java.nio.file.Files
      .createTempDirectory("dsir_lam2").resolve("m").toString
    lam.write.parquet(dir)
    val pool = Seq(
      (100L, "alpha beta gamma"), // target-leaning
      (101L, "zork quux blarg"), // pool-leaning
      (102L, "solo") // featureless
    ).toDF("doc_id", "text")
    def collectW(l: org.apache.spark.sql.DataFrame) =
      Dsir.scoreWith(l, pool, buckets = b).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
        .toMap
    val mem = collectW(lam)
    val disk = collectW(spark.read.parquet(dir))
    assert(mem === disk, "frozen artifact ⇒ identical verdicts")
    assert(mem(100L)._2 > 0 && mem(101L)._2 < 0)
    assert(mem(102L) === (0L, 0.0))
  }
}
