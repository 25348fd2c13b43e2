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

  test("io14 compaction plan rejects non-positive targetRows") {
    import graft.io.Compaction
    val parts = Seq(Compaction.PartInfo(1L, 10L),
      Compaction.PartInfo(2L, 20L))
    intercept[IllegalArgumentException](Compaction.plan(parts, 0L))
    intercept[IllegalArgumentException](Compaction.plan(parts, -5L))
    // and the boundary case still plans: one bin per 10 rows
    assert(Compaction.plan(parts, 10L).map(_._1) === Seq(0L, 1L))
  }

  test("io10 zone maps: footer stats match the data per file, the " +
    "predicate skips files on the clustered layout, and the pruned " +
    "scan equals the full filter") {
    import org.apache.spark.sql.functions._
    import graft.io.ZoneMap
    val agg = SparkEntry.queries("io10_zone_map_scan")(spark, dir)
      .collect()
    assert(agg.length === 1 && agg(0).getLong(0) > 0)
    val path = graft.queries.SinkQueries.tmp("events_zonemap", dir)
    val zones = ZoneMap.build(spark, path, "value")
    // footer stats == data stats, per file
    val byFile = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(count(lit(1)).as("n"), min(col("value")).as("mn"),
        max(col("value")).as("mx"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(zones.nonEmpty && zones.size === byFile.size)
    zones.foreach { z =>
      val key = byFile.keys.find(_.endsWith(
        z.path.split('/').last)).get
      assert(byFile(key) === ((z.rows, z.min, z.max)),
        s"footer stats diverge for ${z.path}")
    }
    // pruning really skips files on this layout...
    val kept = ZoneMap.prunedPaths(zones, 120.0, 180.0)
    assert(kept.nonEmpty && kept.size < zones.size,
      s"expected skipping: kept ${kept.size} of ${zones.size}")
    // ...without losing a single matching row
    val full = spark.read.parquet(path)
      .filter(col("value") >= 120 && col("value") <= 180).count()
    val pruned = spark.read.parquet(kept: _*)
      .filter(col("value") >= 120 && col("value") <= 180).count()
    assert(pruned === full)
  }

  test("io5 z-order: every file covers a small rectangle of (user, " +
    "time) — both dims cluster, unlike a time-sorted layout") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("io5_zorder_layout")(spark, dir)
    assert(out.count() === spark.read.parquet(s"$dir/events.parquet")
      .count())
    val dst = graft.queries.SinkQueries.tmp("events_zorder", dir)
    // mean per-file span of each bucketed dim, as a fraction of the
    // 64-bucket domain; a single-dim-sorted layout leaves the OTHER
    // dim's span at ~1.0 while z-order shrinks both
    def spans(p: String): (Double, Double) = {
      val r = spark.read.parquet(p)
        .groupBy(input_file_name())
        .agg((max(col("ub")) - min(col("ub"))).as("us"),
          (max(col("tb")) - min(col("tb"))).as("ts"))
        .agg(avg(col("us")), avg(col("ts"))).collect()(0)
      (r.getDouble(0) / 64.0, r.getDouble(1) / 64.0)
    }
    val (uSpan, tSpan) = spans(dst)
    assert(uSpan < 0.45, s"user-dim span $uSpan not clustered")
    assert(tSpan < 0.45, s"time-dim span $tSpan not clustered")
    // control: the same data range-sorted by time alone — time spans
    // cluster tightly but user spans stay at ~the full domain
    val ctrl = graft.queries.SinkQueries.tmp("events_tsorted", dir)
    spark.read.parquet(dst)
      .repartitionByRange(16, col("tb"), col("ts"))
      .write.mode("overwrite").parquet(ctrl)
    val (uCtrl, _) = spans(ctrl)
    assert(uCtrl > 0.9, s"control layout unexpectedly clustered: $uCtrl")
    assert(uSpan < uCtrl / 2,
      s"z-order user span $uSpan not better than time-sorted $uCtrl")
  }

  test("hilbert index: bijective on the grid, and consecutive curve " +
    "positions are always grid-adjacent (the property Z-order lacks)") {
    import graft.io.{Hilbert, ZOrder}
    val n = 16 // order 4
    val cells = for (x <- 0 until n; y <- 0 until n)
      yield (x.toLong, y.toLong)
    val d = cells.map { case (x, y) =>
      (x, y) -> Hilbert.index(x, y, 4)
    }.toMap
    assert(d.values.toSet === (0L until (n.toLong * n)).toSet,
      "index must be a bijection onto [0, 4^order)")
    val byD = d.toSeq.sortBy(_._2).map(_._1)
    byD.sliding(2).foreach { case Seq((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1,
        s"curve jump between ($x1,$y1) and ($x2,$y2)")
    }
    // Z-order on the same grid DOES jump (quadrant seams) — the
    // contrast that motivates the Hilbert layout
    val zByD = cells.map { case (x, y) =>
      val z = spark.range(1).select(
        ZOrder.zValue(org.apache.spark.sql.functions.lit(x),
          org.apache.spark.sql.functions.lit(y), 4)).first().getLong(0)
      (x, y) -> z
    }.toMap.toSeq.sortBy(_._2).map(_._1)
    val zJumps = zByD.sliding(2).count {
      case Seq((x1, y1), (x2, y2)) =>
        math.abs(x1 - x2) + math.abs(y1 - y2) > 1
    }
    assert(zJumps > 0, "z-order unexpectedly adjacency-preserving")
  }

  test("io8 hilbert layout: both dims cluster per file, at least as " +
    "tightly as the io5 z-order layout") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("io8_hilbert_layout")(spark, dir)
    assert(out.count() === spark.read.parquet(s"$dir/events.parquet")
      .count())
    def spans(p: String): (Double, Double) = {
      val r = spark.read.parquet(p)
        .groupBy(input_file_name())
        .agg((max(col("ub")) - min(col("ub"))).as("us"),
          (max(col("tb")) - min(col("tb"))).as("ts"))
        .agg(avg(col("us")), avg(col("ts"))).collect()(0)
      (r.getDouble(0) / 64.0, r.getDouble(1) / 64.0)
    }
    val (uH, tH) = spans(
      graft.queries.SinkQueries.tmp("events_hilbert", dir))
    assert(uH < 0.45, s"user-dim span $uH not clustered")
    assert(tH < 0.45, s"time-dim span $tH not clustered")
    // run io5 so its layout exists, then compare combined tightness
    SparkEntry.queries("io5_zorder_layout")(spark, dir).count()
    val (uZ, tZ) = spans(
      graft.queries.SinkQueries.tmp("events_zorder", dir))
    assert(uH + tH <= (uZ + tZ) * 1.15,
      s"hilbert spans ($uH,$tH) much worse than z-order ($uZ,$tZ)")
  }

  test("io8 file skipping: a 2-dim box predicate touches no more " +
    "hilbert files than a time-sorted layout (min/max file stats, " +
    "the mechanism lake engines prune with)") {
    import org.apache.spark.sql.functions._
    SparkEntry.queries("io8_hilbert_layout")(spark, dir).count()
    val hil = graft.queries.SinkQueries.tmp("events_hilbert", dir)
    val ctrl = graft.queries.SinkQueries.tmp("events_timesorted", dir)
    spark.read.parquet(hil)
      .repartitionByRange(16, col("tb")).sortWithinPartitions("tb")
      .write.mode("overwrite").parquet(ctrl)
    // box: first quarter of both dims — the (user range, time range)
    // slice a typical debug/backfill query asks for
    def touched(p: String): Int =
      spark.read.parquet(p).groupBy(input_file_name())
        .agg(min(col("ub")).as("u0"), max(col("ub")).as("u1"),
          min(col("tb")).as("t0"), max(col("tb")).as("t1"))
        .filter(col("u0") <= 15 && col("u1") >= 0 &&
          col("t0") <= 15 && col("t1") >= 0)
        .count().toInt
    val (h, c) = (touched(hil), touched(ctrl))
    assert(h <= c, s"hilbert touches $h files, time-sorted only $c")
    assert(h < 16, s"hilbert layout must skip SOME files, touched $h/16")
  }

  test("zValue interleaves bits: unit cases and monotone quadrants") {
    import org.apache.spark.sql.functions._
    import graft.io.ZOrder
    val df = spark.range(1).select(
      ZOrder.zValue(lit(0), lit(0), 4).as("z00"),
      ZOrder.zValue(lit(1), lit(0), 4).as("z10"),
      ZOrder.zValue(lit(0), lit(1), 4).as("z01"),
      ZOrder.zValue(lit(3), lit(5), 4).as("z35"),
      ZOrder.zValue(lit(15), lit(15), 4).as("zmax"))
    val r = df.collect()(0)
    assert(r.getLong(0) === 0L)
    assert(r.getLong(1) === 1L) // a occupies even bits
    assert(r.getLong(2) === 2L) // b occupies odd bits
    // a=0011, b=0101 -> z = b3 a3 b2 a2 b1 a1 b0 a0 = 0 0 1 0 0 1 1 1
    assert(r.getLong(3) === 39L)
    assert(r.getLong(4) === 255L)
  }

  test("S6: configureS3a lands the six object-store keys in " +
    "hadoopConfiguration exactly as batch_processor.py:57-62 sets them") {
    val spark = TestSpark.spark
    val conf = spark.sparkContext.hadoopConfiguration
    val keys = Seq("fs.s3a.endpoint", "fs.s3a.access.key",
      "fs.s3a.secret.key", "fs.s3a.path.style.access", "fs.s3a.impl",
      "fs.s3a.connection.ssl.enabled")
    val prev = keys.map(k => k -> Option(conf.get(k)))
    try {
      graft.io.Sinks.configureS3a(spark, "http://localhost:9000",
        "test-access", "test-secret")
      assert(conf.get("fs.s3a.endpoint") === "http://localhost:9000")
      assert(conf.get("fs.s3a.access.key") === "test-access")
      assert(conf.get("fs.s3a.secret.key") === "test-secret")
      assert(conf.get("fs.s3a.path.style.access") === "true")
      assert(conf.get("fs.s3a.impl") ===
        "org.apache.hadoop.fs.s3a.S3AFileSystem")
      assert(conf.get("fs.s3a.connection.ssl.enabled") === "false")
    } finally prev.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
