package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.EventsAdapter

/** Pins the events.ts physical-type contract. The harness testdata has
  * carried this column as TIMESTAMP(NANOS)-read-as-long in rounds 1–4
  * and as parquet `timestamp[us]` (TIMESTAMP_NTZ) from round 5 — a
  * drift that crashed 33 queries at analysis time because they hardcoded
  * the long-nanos arithmetic. [[EventsAdapter.tsMicros]] is the single
  * normalization point; this spec writes the SAME logical instants as
  * all three physical types and asserts the accessor reads identical
  * µs from each, so the next drift fails HERE, loudly, not in 33
  * registry entries at driver time.
  */
class TsContractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // µs instants with deliberate sub-millisecond precision (the s9/io1
  // regression was a silent µs→ms truncation) plus the epoch edge
  private val micros = Seq(0L, 1706745600123456L, 1706831999999999L,
    1704067200000001L, 1738368000654321L)

  private def root = {
    val p = Paths.get("/tmp/graft_ts_contract")
    Files.createDirectories(p)
    p
  }

  /** Write `micros` as (id, ts) with the given physical flavor. */
  private def writeFixture(flavor: String): String = {
    import spark.implicits._
    val base = micros.zipWithIndex
      .map { case (us, i) => (i.toLong, us) }
      .toDF("id", "us")
    val df = flavor match {
      case "long_nanos" =>
        base.select(col("id"), (col("us") * 1000L).as("ts"))
      case "timestamp_ltz" =>
        base.select(col("id"), timestamp_micros(col("us")).as("ts"))
      case "timestamp_ntz" =>
        base.select(col("id"),
          timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
    }
    val path = root.resolve(flavor).toString
    df.coalesce(1).write.mode("overwrite").parquet(path)
    path
  }

  private def readMicros(path: String): Map[Long, Long] = {
    val df = spark.read.parquet(path)
    df.select(col("id"), EventsAdapter.tsMicros(df).as("us"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("tsMicros yields identical µs for all three physical ts types") {
    val expected = micros.zipWithIndex.map { case (us, i) =>
      i.toLong -> us
    }.toMap
    for (flavor <- Seq("long_nanos", "timestamp_ltz", "timestamp_ntz")) {
      val path = writeFixture(flavor)
      val got = readMicros(path)
      // physical type actually differs per fixture (the whole point)
      val dt = spark.read.parquet(path).schema("ts").dataType
      flavor match {
        case "long_nanos"    => assert(dt == LongType, s"$flavor: $dt")
        case "timestamp_ltz" => assert(dt == TimestampType, s"$flavor: $dt")
        case "timestamp_ntz" =>
          assert(dt == TimestampNTZType, s"$flavor: $dt")
      }
      assert(got == expected, s"flavor=$flavor")
    }
  }

  test("real testdata events.ts normalizes and wire emits TimestampType") {
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val ev = spark.read.parquet(s"/root/testdata/$sf/events.parquet")
      val stats = ev
        .select(EventsAdapter.tsMicros(ev).as("us"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("us").isNull, 1).otherwise(0)).as("n_null"),
          min(col("us")).as("mn"), max(col("us")).as("mx"))
        .head()
      assert(stats.getLong(1) == 0, s"$sf: null µs")
      // events are generated in 2024 — a unit slip (ns↔µs↔ms) moves the
      // epoch by 1000× and lands far outside [2020, 2030)
      val lo = 1577836800000000L // 2020-01-01 UTC µs
      val hi = 1893456000000000L // 2030-01-01 UTC µs
      assert(stats.getLong(2) >= lo && stats.getLong(3) < hi,
        s"$sf: µs range [${stats.getLong(2)}, ${stats.getLong(3)}]")
      // the wire record must surface datetime as TimestampType whatever
      // the file carries (NTZ leaking through broke s9/io1 text sinks)
      val wired = EventsAdapter.wire(ev)
      assert(wired.schema("datetime").dataType == TimestampType)
    }
  }
}
