package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.ClickHouseDdl

/** Pins the Spark→ClickHouse type mapping, the MergeTree key rules,
  * and the full generated DDL for the gold layer (the reference's
  * `clickhouse/init.sql` shape, generated instead of hand-kept). */
class ClickHouseDdlSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("type mapping: scalars, decimals, arrays, timestamps, " +
    "nullability — and the illegal Nullable(Array) never emits") {
    assert(ClickHouseDdl.chType(LongType, nullable = false) === "Int64")
    assert(ClickHouseDdl.chType(DoubleType, nullable = true) ===
      "Nullable(Float64)")
    assert(ClickHouseDdl.chType(StringType, nullable = true) ===
      "Nullable(String)")
    assert(ClickHouseDdl.chType(DecimalType(18, 2), nullable = false)
      === "Decimal(18, 2)")
    assert(ClickHouseDdl.chType(TimestampType, nullable = false) ===
      "DateTime64(6, 'UTC')")
    assert(ClickHouseDdl.chType(TimestampNTZType, nullable = false) ===
      "DateTime64(6)")
    // element nullability goes INSIDE the array; the array itself is
    // never wrapped (Nullable(Array) is illegal in ClickHouse)
    assert(ClickHouseDdl.chType(
      ArrayType(DoubleType, containsNull = true), nullable = true) ===
      "Array(Nullable(Float64))")
    assert(ClickHouseDdl.chType(
      ArrayType(StringType, containsNull = false), nullable = true) ===
      "Array(String)")
    intercept[IllegalArgumentException] {
      ClickHouseDdl.chType(CalendarIntervalType, nullable = false)
    }
  }

  test("MergeTree key rules: nullable or missing ORDER BY columns are " +
    "refused, never silently stripped") {
    val sch = StructType(Seq(
      StructField("id", LongType, nullable = true),
      StructField("v", DoubleType, nullable = true)))
    intercept[IllegalArgumentException] {
      ClickHouseDdl.createTable("t", sch, Seq("id"))
    }
    intercept[IllegalArgumentException] {
      ClickHouseDdl.createTable("t", sch, Seq("nope"))
    }
  }

  test("gold DDL generates the init.sql shape from the live pipeline " +
    "schema: MergeTree, monthly partitions, (location_id, datetime) key") {
    val dir = "/root/testdata/sf0.001"
    val rows = ClickHouseDdl.medallionDdl(
      graft.queries.PipelineQueries.bronze(spark, dir).drop("props"),
      graft.queries.PipelineQueries.silver(spark, dir),
      graft.queries.PipelineQueries.gold(spark, dir))
    assert(rows.map(_._1) === Seq("bronze", "silver", "gold", "mv"))
    val gold = rows(2)._3
    assert(gold.contains("CREATE TABLE IF NOT EXISTS graft.gold_hourly_aqi"))
    assert(gold.contains("ENGINE = MergeTree()"))
    assert(gold.contains("PARTITION BY toYYYYMM(datetime)"))
    assert(gold.contains("ORDER BY (location_id, datetime)"))
    assert(gold.contains("datetime DateTime64(6)") ||
      gold.contains("datetime DateTime64(6, 'UTC')"))
    assert(gold.contains("parameters Array("))
    // key columns emitted bare (non-Nullable) — the MergeTree rule
    assert(!gold.matches("(?s).*location_id Nullable.*"))
  }

  test("latest_aqi materialized view matches the init.sql:67-80 " +
    "contract: MergeTree, PARTITION BY country, (location_id, datetime)" +
    " key, Gold minus the array/aggregation columns") {
    val dir = "/root/testdata/sf0.001"
    val rows = ClickHouseDdl.medallionDdl(
      graft.queries.PipelineQueries.bronze(spark, dir).drop("props"),
      graft.queries.PipelineQueries.silver(spark, dir),
      graft.queries.PipelineQueries.gold(spark, dir))
    val mv = rows.find(_._1 == "mv").map(_._3).getOrElse(
      fail("mv row missing"))
    assert(rows.find(_._1 == "mv").get._2 === "latest_aqi")
    assert(mv.contains(
      "CREATE MATERIALIZED VIEW IF NOT EXISTS graft.latest_aqi"))
    assert(mv.contains("ENGINE = MergeTree()"))
    assert(mv.contains("PARTITION BY country"))
    assert(mv.contains("ORDER BY (location_id, datetime)"))
    assert(mv.contains("FROM graft.gold_hourly_aqi"))
    // init.sql:71-79 — exactly the eight projected columns, in order
    val sel = mv.split("AS SELECT").last
    val cols = sel.split("FROM").head.split(",").map(_.trim).toSeq
    assert(cols === Seq("datetime", "location_id", "location_name",
      "country", "latitude", "longitude", "aqi", "aqi_category"))
    // the arrays and the aggregation timestamp stay OUT of the view
    assert(!sel.contains("parameters") && !sel.contains("values") &&
      !sel.contains("aggregation_timestamp"))
    // a nullable partition column must refuse, not silently emit
    val badGold = graft.queries.PipelineQueries.gold(spark, dir)
    intercept[IllegalArgumentException] {
      ClickHouseDdl.createMaterializedView("v", "t", badGold.schema,
        Seq("country"), Seq("location_id"), Some("country"))
    }
    // a TYPO'D bare partition column must also refuse — it is a
    // column reference ClickHouse would reject, not an expression to
    // pass through (the old filter silently skipped its checks)
    val goldNn = org.apache.spark.sql.types.StructType(
      graft.queries.PipelineQueries.gold(spark, dir).schema.fields.map(
        f => if (f.name == "datetime" || f.name == "location_id")
          f.copy(nullable = false) else f))
    intercept[IllegalArgumentException] {
      ClickHouseDdl.createMaterializedView("v", "t", goldNn,
        Seq("location_id", "datetime"), Seq("location_id"),
        Some("countty"))
    }
    // an expression partition key passes through unchecked — its
    // inputs are ClickHouse's to resolve
    val exprMv = ClickHouseDdl.createMaterializedView("v", "t", goldNn,
      Seq("location_id", "datetime"), Seq("location_id"),
      Some("toYYYYMM(datetime)"))
    assert(exprMv.contains("PARTITION BY toYYYYMM(datetime)"))
  }
}
