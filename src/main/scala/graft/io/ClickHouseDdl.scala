package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** ClickHouse sink DDL generation — the engine half of the reference's
  * OLAP load path: its loader inserts Spark-written parquet into
  * MergeTree tables created ahead of time by hand-written DDL
  * (reference `load_to_clickhouse.py:87-99` inserting into
  * `clickhouse/init.sql:7-80`'s bronze/silver/gold tables). Keeping
  * that DDL in sync with the pipeline schema by hand is exactly the
  * drift dq13 gates against — so here the DDL GENERATES from the
  * actual DataFrame schema: the type mapping, nullability rules, and
  * MergeTree clauses are engine logic and spec-pinned
  * (ClickHouseDdlSpec); only the network insert needs a live server,
  * which the sandbox does not have (same S6 posture as the object
  * store).
  *
  * Mapping notes (ClickHouse constraints, not style):
  *   - MergeTree ORDER BY / PARTITION BY key columns cannot be
  *     Nullable — key columns are emitted bare and the generator
  *     REFUSES a nullable key rather than silently stripping it;
  *   - Nullable(Array(...)) is illegal — arrays stay bare, element
  *     nullability maps to Array(Nullable(T));
  *   - Spark TimestampType is a UTC-adjusted instant →
  *     DateTime64(6, 'UTC'); TimestampNTZType has no zone →
  *     DateTime64(6). */
object ClickHouseDdl {

  def chType(dt: DataType, nullable: Boolean): String = {
    val base = dt match {
      case LongType            => "Int64"
      case IntegerType         => "Int32"
      case ShortType           => "Int16"
      case ByteType            => "Int8"
      case DoubleType          => "Float64"
      case FloatType           => "Float32"
      case StringType          => "String"
      case BooleanType         => "Bool"
      case DateType            => "Date32"
      case TimestampType       => "DateTime64(6, 'UTC')"
      case TimestampNTZType    => "DateTime64(6)"
      case d: DecimalType     => s"Decimal(${d.precision}, ${d.scale})"
      case BinaryType          => "String"
      case ArrayType(et, ecn)  => s"Array(${chType(et, ecn)})"
      case other => throw new IllegalArgumentException(
        s"no ClickHouse mapping for Spark type ${other.sql}")
    }
    val isArray = dt.isInstanceOf[ArrayType]
    if (nullable && !isArray) s"Nullable($base)" else base
  }

  /** CREATE TABLE IF NOT EXISTS DDL for `schema` as a MergeTree table.
    *
    * @param orderBy     the MergeTree primary/order key — every column
    *                    must exist and be non-nullable in `schema`
    * @param partitionBy optional PARTITION BY expression (e.g.
    *                    "toYYYYMM(datetime)") */
  def createTable(table: String, schema: StructType,
      orderBy: Seq[String], partitionBy: Option[String] = None,
      database: Option[String] = None): String = {
    require(orderBy.nonEmpty, "MergeTree needs an ORDER BY key")
    orderBy.foreach { k =>
      val f = schema.fields.find(_.name == k).getOrElse(
        throw new IllegalArgumentException(
          s"ORDER BY column $k not in schema for $table"))
      require(!f.nullable,
        s"ORDER BY column $k is nullable — MergeTree key columns " +
          "cannot be Nullable; make the pipeline column non-null " +
          "(or gate it) instead of silently stripping nullability")
    }
    val cols = schema.fields.map { f =>
      s"    ${f.name} ${chType(f.dataType, f.nullable)}"
    }.mkString(",\n")
    val qualified = database.map(db => s"$db.$table").getOrElse(table)
    val part = partitionBy
      .map(p => s"PARTITION BY $p\n").getOrElse("")
    s"""CREATE TABLE IF NOT EXISTS $qualified
       |(
       |$cols
       |)
       |ENGINE = MergeTree()
       |${part}ORDER BY (${orderBy.mkString(", ")})""".stripMargin
  }

  /** CREATE MATERIALIZED VIEW DDL over an existing MergeTree table —
    * the reference's `latest_aqi` real-time view
    * (`clickhouse/init.sql:67-80`): a column-subset projection of the
    * Gold table into its own MergeTree with a different partitioning
    * (PARTITION BY country — the live-dashboard access path slices by
    * country, not by month). Columns in the SELECT are validated
    * against the source schema; key columns get the same
    * non-nullability rule as [[createTable]] (MergeTree keys cannot
    * be Nullable, and the MV's implicit target table inherits them). */
  def createMaterializedView(view: String, source: String,
      sourceSchema: StructType, selectCols: Seq[String],
      orderBy: Seq[String], partitionBy: Option[String] = None,
      database: Option[String] = None): String = {
    require(orderBy.nonEmpty, "MergeTree needs an ORDER BY key")
    selectCols.foreach { c =>
      require(sourceSchema.fieldNames.contains(c),
        s"SELECT column $c not in source schema for $view")
    }
    // same refusal discipline as createTable: a key column must EXIST
    // (in the source schema AND the projected column list — the MV's
    // implicit target table only has the projected columns) and be
    // non-nullable. A PARTITION BY that is a bare identifier IS a
    // column and gets the full checks — silently skipping an unknown
    // one would emit DDL ClickHouse rejects (a typo'd partition column
    // must throw here, not there); only an EXPRESSION (anything beyond
    // an identifier, e.g. toYYYYMM(datetime)) is passed through
    // unchecked, since its input columns are ClickHouse's to resolve
    val bareIdent = "^[A-Za-z_][A-Za-z0-9_]*$".r
    (orderBy ++ partitionBy.filter(p => bareIdent.matches(p)))
      .foreach { k =>
        val f = sourceSchema.fields.find(_.name == k).getOrElse(
          throw new IllegalArgumentException(
            s"key column $k not in source schema for $view"))
        require(selectCols.contains(k),
          s"key column $k is not projected by $view — the MV's " +
            "target table cannot order/partition by it")
        require(!f.nullable,
          s"key column $k is nullable — MergeTree key/partition " +
            "columns cannot be Nullable")
      }
    val qualify: String => String =
      t => database.map(db => s"$db.$t").getOrElse(t)
    val part = partitionBy.map(p => s"PARTITION BY $p\n").getOrElse("")
    s"""CREATE MATERIALIZED VIEW IF NOT EXISTS ${qualify(view)}
       |ENGINE = MergeTree()
       |${part}ORDER BY (${orderBy.mkString(", ")})
       |AS SELECT
       |${selectCols.map("    " + _).mkString(",\n")}
       |FROM ${qualify(source)}""".stripMargin
  }

  /** The reference's three-layer OLAP load, generated from the LIVE
    * pipeline schemas: (layer, table_name, ddl) rows — the three
    * MergeTree tables plus the `latest_aqi` materialized view
    * (Gold minus the array/aggregation columns, PARTITION BY country,
    * init.sql:67-80). `datetime` and the order keys are non-null by
    * pipeline construction (P3's null gate), which the require above
    * re-checks on every call. */
  def medallionDdl(bronze: DataFrame, silver: DataFrame,
      gold: DataFrame, database: String = "graft"): Seq[(String,
      String, String)] = {
    def nn(df: DataFrame, keys: Seq[String]): StructType =
      StructType(df.schema.fields.map(f =>
        if (keys.contains(f.name)) f.copy(nullable = false) else f))
    val bKeys = Seq("location_id", "datetime", "parameter")
    val sKeys = Seq("location_id", "datetime", "parameter")
    val gKeys = Seq("location_id", "datetime")
    Seq(
      ("bronze", "bronze_measurements", createTable(
        "bronze_measurements", nn(bronze, bKeys), bKeys,
        Some("toYYYYMM(datetime)"), Some(database))),
      ("silver", "silver_measurements", createTable(
        "silver_measurements", nn(silver, sKeys), sKeys,
        Some("toYYYYMM(datetime)"), Some(database))),
      ("gold", "gold_hourly_aqi", createTable(
        "gold_hourly_aqi", nn(gold, gKeys), gKeys,
        Some("toYYYYMM(datetime)"), Some(database))),
      // the real-time view: Gold minus the array + aggregation
      // columns, repartitioned by country for the dashboard slice
      // (country is total by construction — user_id % 9 hits every
      // branch of the encoding CASE — so the partition key is sound)
      ("mv", "latest_aqi", createMaterializedView(
        "latest_aqi", "gold_hourly_aqi",
        nn(gold, gKeys :+ "country"),
        Seq("datetime", "location_id", "location_name", "country",
          "latitude", "longitude", "aqi", "aqi_category"),
        gKeys, Some("country"), Some(database))))
  }
}
