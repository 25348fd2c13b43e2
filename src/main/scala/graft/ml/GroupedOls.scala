package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-segment OLS (ml26) — one regression line per group from
  * sufficient statistics, the "million models" pattern (per-SKU price
  * elasticity, per-tenant usage trend, per-device calibration): fit
  * y = a + b·x independently within every segment WITHOUT per-segment
  * passes. All five sufficient statistics (n, Σx, Σy, Σxy, Σx²) are
  * additive, so the whole operator is partial aggregation; the slope
  * and intercept are closed-form rationals of the sums.
  *
  * The 100 TB shape (and the reason this is not "groupBy + fit"):
  * the fact table partial-aggregates to the FOREIGN-KEY grain first
  * (per l_partkey here — map-side combine does most of the work),
  * THEN joins the dimension to map key → segment, then re-aggregates
  * to the segment grain. Fact rows never ship through the dimension
  * join; the join input is key-grain sufficient statistics (|parts|
  * rows, 5 numbers each), two partial aggregates + one key-grain join
  * total, no windows anywhere.
  *
  * Determinism (the ml24 discipline): x integral, y exact cents;
  * numerator/determinant products in DECIMAL(38,0) (Spark) / HUGEINT
  * (DuckDB); outputs BIGINT micro-dollars-per-unit via ONE sign-safe
  * truncating division each (operands of `div`//`//` kept
  * non-negative so both engines agree — proven truncate-toward-zero
  * parity, the x84 result). NULL slope/intercept when the segment
  * design is singular (all x equal) or n < 2.
  *
  * Integer headroom: det = n·Σx² − (Σx)² ≤ n²·x_max²; the slope
  * numerator·10⁴ at n=10⁹ rows/segment, x≤50, y≤10⁹ cents stays
  * under ~10³⁴ < 38 digits — segments beyond that need the stats
  * pre-scaled (documented, same bound family as g22/ml25).
  *
  * Reference anchor: the per-station trend fits the reference's
  * dashboard draws per location (app.py's per-station series) — same
  * closed form, segment = station. */
object GroupedOls {

  private case class Engine(big: String => String, divOp: String)
  private val sparkE = Engine(c => s"CAST($c AS DECIMAL(38,0))", "div")
  private val duckE = Engine(c => s"CAST($c AS HUGEINT)", "//")

  private def sdiv(a: String, b: String, e: Engine): String =
    s"(CASE WHEN ($a) >= 0 THEN ($a) ${e.divOp} ($b) " +
      s"ELSE -((-($a)) ${e.divOp} ($b)) END)"

  /** Slope/intercept expressions over (n, sx, syc, sxx, sxyc).
    * beta_micro: micro-dollars per unit x (cents ratio ×10⁴);
    * alpha_micro: micro-dollar intercept = (Σy·det − Nb·Σx)/(n·det). */
  private def outs(e: Engine): Seq[(String, String)] = {
    import e.big
    val det = s"(${big("n")} * ${big("sxx")} - ${big("sx")} * ${big("sx")})"
    val nb = s"(${big("n")} * ${big("sxyc")} - ${big("sx")} * ${big("syc")})"
    val guard = s"n >= 2 AND $det <> 0"
    def g(x: String) = s"CASE WHEN $guard THEN CAST($x AS BIGINT) END"
    Seq(
      "beta_micro" -> g(sdiv(s"$nb * 10000", det, e)),
      "alpha_micro" -> g(sdiv(
        s"(${big("syc")} * $det - $nb * ${big("sx")}) * 10000",
        s"(${big("n")} * $det)", e)))
  }

  /** General row-grain form: one line per group from (integral x,
    * DECIMAL-dollar y) rows — one hash aggregate + scan-speed closed
    * form. [[brandLines]] is this with the FK-grain pre-aggregation
    * inserted (identical result: the statistics are additive). */
  def lines(data: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val prep = data.select(col(groupCol).as("g"),
      col(xCol).cast("long").as("x"),
      expr(s"CAST(round(CAST($yCol AS DOUBLE) * 100) AS BIGINT)")
        .as("yc"))
    val st = prep.groupBy(col("g")).agg(
      count(lit(1)).as("n"), sum(col("x")).as("sx"),
      sum(col("yc")).as("syc"), sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("yc")).as("sxyc"))
    val cols = Seq(col("g"), col("n").cast("long").as("n")) ++
      outs(sparkE).map { case (name, ex) => expr(ex).as(name) }
    st.select(cols: _*).orderBy("g")
  }

  /** Per-brand price-vs-quantity lines over lineitem×part.
    * @param dir testdata sf directory */
  def brandLines(spark: SparkSession, dir: String): DataFrame = {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_partkey").as("pk"),
        col("l_quantity").cast("long").as("x"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("yc"))
    // fact → FK-grain sufficient stats (map-side combinable)
    val perKey = li.groupBy(col("pk")).agg(
      count(lit(1)).as("n"), sum(col("x")).as("sx"),
      sum(col("yc")).as("syc"), sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("yc")).as("sxyc"))
    val dim = spark.read.parquet(s"$dir/part.parquet")
      .select(col("p_partkey").as("pk"), col("p_brand"))
    val perBrand = perKey.join(dim, Seq("pk"))
      .groupBy(col("p_brand")).agg(
        sum(col("n")).as("n"), sum(col("sx")).as("sx"),
        sum(col("syc")).as("syc"), sum(col("sxx")).as("sxx"),
        sum(col("sxyc")).as("sxyc"))
    val cols = Seq(col("p_brand"), col("n").cast("long").as("n")) ++
      outs(sparkE).map { case (name, ex) => expr(ex).as(name) }
    perBrand.select(cols: _*).orderBy("p_brand")
  }

  /** DuckDB twin of [[brandLines]]. */
  def brandLinesSql(): String = {
    val o = outs(duckE).map { case (n, ex) => s"$ex AS $n" }.mkString(", ")
    """WITH li AS (SELECT l_partkey AS pk,
      |    CAST(l_quantity AS BIGINT) AS x,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS yc
      |  FROM lineitem),
      |pk AS (SELECT pk, count(*) AS n, sum(x) AS sx, sum(yc) AS syc,
      |    sum(x * x) AS sxx, sum(x * yc) AS sxyc
      |  FROM li GROUP BY pk),
      |pb AS (SELECT p_brand, sum(n) AS n, sum(sx) AS sx,
      |    sum(syc) AS syc, sum(sxx) AS sxx, sum(sxyc) AS sxyc
      |  FROM pk JOIN part ON p_partkey = pk GROUP BY p_brand)
      |SELECT p_brand, CAST(n AS BIGINT) AS n, """.stripMargin
      .replace('\n', ' ') + o +
      " FROM pb ORDER BY p_brand"
  }
}
