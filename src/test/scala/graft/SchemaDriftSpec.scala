package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.quality.SchemaDrift

/** dq13 schema-drift gate: the report is pure schema introspection —
  * planted add/remove/type-change cases, the identity case, and the
  * type-vocabulary normalization the DuckDB twin's introspection
  * depends on. */
class SchemaDriftSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("all three drift classes report correctly, unchanged stays quiet") {
    val ref = Seq((1L, "a", 1.0)).toDF("id", "name", "score")
    val cur = ref.drop("name") // removed
      .withColumn("id", col("id").cast("int")) // type_changed
      .withColumn("tag", lit("x")) // added
    val got = SchemaDrift.drift(spark, ref, cur)
      .orderBy("column_name")
      .collect()
      .map(r => (r.getString(0), Option(r.getString(1)),
        Option(r.getString(2)), r.getString(3)))
    assert(got === Array(
      ("id", Some("BIGINT"), Some("INTEGER"), "type_changed"),
      ("name", Some("VARCHAR"), None, "removed"),
      ("score", Some("DOUBLE"), Some("DOUBLE"), "unchanged"),
      ("tag", None, Some("VARCHAR"), "added")))
  }

  test("identical schemas -> every column unchanged") {
    val ref = Seq((1L, "a")).toDF("id", "name")
    val rows = SchemaDrift.drift(spark, ref, ref).collect()
    assert(rows.length === 2)
    assert(rows.forall(_.getString(3) == "unchanged"))
  }

  test("type vocabulary matches DuckDB's introspection names") {
    import org.apache.spark.sql.types._
    assert(SchemaDrift.normType(LongType) === "BIGINT")
    assert(SchemaDrift.normType(StringType) === "VARCHAR")
    // the tz split matters: DuckDB introspects UTC-adjusted parquet
    // timestamps as TIMESTAMP WITH TIME ZONE and only NTZ as plain
    // TIMESTAMP — collapsing them would mask a tz-semantics change
    assert(SchemaDrift.normType(TimestampType) ===
      "TIMESTAMP WITH TIME ZONE")
    assert(SchemaDrift.normType(TimestampNTZType) === "TIMESTAMP")
    assert(SchemaDrift.normType(DecimalType(18, 2)) === "DECIMAL(18,2)")
    assert(SchemaDrift.normType(BinaryType) === "BLOB")
  }

  test("report is metadata-only: no scan of either frame is planned") {
    val ref = Seq((1L, "a")).toDF("id", "name")
    val cur = ref.withColumn("extra", lit(1))
    val report = SchemaDrift.drift(spark, ref, cur)
    // schemas are lifted to driver-side LocalRelations — the input
    // frames themselves never enter the report's plan
    val scans = report.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LeafNode => l
    }
    assert(scans.forall(
      _.getClass.getSimpleName.contains("LocalRelation")),
      s"expected only LocalRelation leaves, got $scans")
  }
}
