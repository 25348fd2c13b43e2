package graft.quality

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-drift gate (dq13) — the structural sibling of dq10's value
  * profile and dq11's distribution gate: before a batch lands, diff its
  * SCHEMA against the reference table's (new columns, vanished columns,
  * type changes). In a lake ingest this is the first gate a batch hits
  * — value profiles can't even run over a column that changed type.
  *
  * Metadata-sized by construction: schemas are driver-side values (a
  * parquet footer / catalog read — reference `app.py`-era pipelines get
  * the same from the table format's manifest), so the report costs ZERO
  * row scans of either side; it composes with s17's per-micro-batch
  * gating exactly like the KS gate but at schema grain.
  *
  * Types normalize to the neutral SQL vocabulary DuckDB's own
  * introspection emits (`information_schema.columns` /
  * `DESCRIBE SELECT`), so the twin recomputes the identical report from
  * its catalog — both engines introspect, neither hardcodes. */
object SchemaDrift {

  /** Spark DataType → the DuckDB type-name vocabulary. */
  def normType(dt: DataType): String = dt match {
    case LongType          => "BIGINT"
    case IntegerType       => "INTEGER"
    case ShortType         => "SMALLINT"
    case ByteType          => "TINYINT"
    case DoubleType        => "DOUBLE"
    case FloatType         => "FLOAT"
    case StringType        => "VARCHAR"
    case BooleanType       => "BOOLEAN"
    case BinaryType        => "BLOB"
    case DateType          => "DATE"
    // Spark's TimestampType is the UTC-adjusted instant (parquet
    // isAdjustedToUTC=true), which DuckDB introspects as TIMESTAMP
    // WITH TIME ZONE; only NTZ maps to plain TIMESTAMP. Collapsing
    // both to one name would mask a real tz-semantics change (or
    // report a spurious one against a DuckDB-introspected reference).
    case TimestampType     => "TIMESTAMP WITH TIME ZONE"
    case TimestampNTZType  => "TIMESTAMP"
    case d: DecimalType    => s"DECIMAL(${d.precision},${d.scale})"
    case other             => other.sql
  }

  /** One row per column present in either schema:
    * (column_name, ref_type, cur_type, status) with
    * status ∈ added | removed | type_changed | unchanged. */
  def drift(spark: SparkSession, ref: DataFrame, cur: DataFrame)
      : DataFrame = {
    import spark.implicits._
    val r = ref.schema.map(f => (f.name, normType(f.dataType)))
      .toDF("column_name", "ref_type")
    val c = cur.schema.map(f => (f.name, normType(f.dataType)))
      .toDF("column_name", "cur_type")
    r.join(c, Seq("column_name"), "full_outer")
      .select(col("column_name"), col("ref_type"), col("cur_type"),
        when(col("ref_type").isNull, "added")
          .when(col("cur_type").isNull, "removed")
          .when(col("ref_type") =!= col("cur_type"), "type_changed")
          .otherwise("unchanged").as("status"))
  }

  /** DuckDB twin: reference side from information_schema over the
    * registered view, current side from `DESCRIBE` of the batch's
    * SELECT — both genuinely introspected by the engine. */
  def driftSql(refTable: String, curSelect: String): String =
    s"""WITH ref AS (
       |  SELECT column_name, data_type AS ref_type
       |  FROM information_schema.columns
       |  WHERE table_name = '$refTable'),
       |cur AS (
       |  SELECT column_name, column_type AS cur_type
       |  FROM (DESCRIBE $curSelect))
       |SELECT column_name, ref_type, cur_type,
       |  CASE WHEN ref_type IS NULL THEN 'added'
       |       WHEN cur_type IS NULL THEN 'removed'
       |       WHEN ref_type <> cur_type THEN 'type_changed'
       |       ELSE 'unchanged' END AS status
       |FROM ref FULL OUTER JOIN cur USING (column_name)
       |ORDER BY column_name""".stripMargin.replace('\n', ' ')
}
