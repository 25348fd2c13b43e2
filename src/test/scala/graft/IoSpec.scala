package graft

import org.scalatest.funsuite.AnyFunSuite

/** File-layout side effects the oracle can't see: compaction actually
  * reduces file counts and respects maxRecordsPerFile. */
class IoSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("io4 compaction: 64-file layout collapses to a handful of " +
    "right-sized files with identical content") {
    // run the registered query (it writes src + dst as side effects)
    val agg = SparkEntry.queries("io4_compaction")(spark, dir).collect()
    assert(agg.length === 1 && agg(0).getLong(0) > 0)
    def files(p: String): Int =
      spark.read.parquet(p).inputFiles.length
    val src = graft.queries.SinkQueries.tmp("events_small_files", dir)
    val dst = graft.queries.SinkQueries.tmp("events_compacted", dir)
    val (nSrc, nDst) = (files(src), files(dst))
    assert(nSrc >= 64, s"small-file layout expected >=64 files, got $nSrc")
    // 2 partitions, maxRecordsPerFile 40k, sf0.001 has ~10k events:
    // each task emits exactly one file
    assert(nDst <= 4, s"compaction left $nDst files")
    assert(spark.read.parquet(dst).count() ===
      spark.read.parquet(src).count())
  }
}
