package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.PipelineQueries.table

/** Generic relational surface over the TPC-H-shaped tables — the join
  * inventory the reference's OLAP layer invites (SURVEY.md §2.3: the
  * reference itself has no joins, but engine parity ships the standard
  * surface: inner/left/semi/anti + broadcast hints).
  *
  * Scale notes:
  *  - dimension sides (region/nation/customer/supplier/part) get explicit
  *    `broadcast()` hints — at 100 TB the fact table never shuffles for
  *    these joins; only the lineitem↔orders join is shuffle-worthy and AQE
  *    picks sort-merge vs shuffled-hash from runtime stats;
  *  - exact-money sums go through DECIMAL(18,x) so partial-aggregate
  *    ordering cannot perturb results (doubles are rounded once, at the
  *    end);
  *  - top-N is TakeOrderedAndProject (no global sort).
  */
object RelationalQueries {

  private def dec2(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  /** TPC-H Q1-shaped pricing summary: the canonical wide aggregate. */
  def q1Pricing(s: SparkSession, d: String): DataFrame = {
    val li = table(s, d, "lineitem")
    val revenue = (col("l_extendedprice") * (lit(1) - col("l_discount")))
      .cast("decimal(18,4)")
    // scale 6: price(2dp)·(1−disc)(2dp)·(1+tax)(2dp) has ≤6 exact decimals,
    // so the double→decimal cast never lands on a rounding tie (HALF_UP vs
    // half-even would diverge at scale 4)
    val charge = (col("l_extendedprice") * (lit(1) - col("l_discount")) *
      (lit(1) + col("l_tax"))).cast("decimal(18,6)")
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec2(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(revenue).cast("double").as("sum_disc_price"),
        sum(charge).cast("double").as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** TPC-H Q3-shaped: broadcast dim filter → fact join → top-10 revenue. */
  def q3TopOrders(s: SparkSession, d: String): DataFrame = {
    val cust = table(s, d, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
    val orders = table(s, d, "orders")
    val li = table(s, d, "lineitem")
    val revenue = (col("l_extendedprice") * (lit(1) - col("l_discount")))
      .cast("decimal(18,4)")
    li.join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(revenue).cast("double").as("revenue"))
      .orderBy(desc("revenue"), col("o_orderkey"))
      .limit(10)
  }

  /** TPC-H Q14-shaped: revenue share per part type over one shipping
    * year — fact ⋈ broadcast(part) + conditional aggregation; the share
    * denominator joins back as a broadcast 1-row total, and the division
    * runs in DOUBLE on exact decimal sums (identical operands in the
    * DuckDB twin, so no cross-engine rounding drift). */
  def q14PromoShare(s: SparkSession, d: String): DataFrame = {
    val li = table(s, d, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1997-01-01"))
    val revenue = (col("l_extendedprice") * (lit(1) - col("l_discount")))
      .cast("decimal(18,4)")
    val perType = li
      .join(broadcast(table(s, d, "part")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_type"))
      .agg(sum(revenue).as("rev_d"), count(lit(1)).as("n_items"))
    val total = perType.agg(sum(col("rev_d")).as("tot_d"))
    perType.crossJoin(broadcast(total))
      .select(col("p_type"),
        col("rev_d").cast("double").as("revenue"),
        col("n_items"),
        round(col("rev_d").cast("double") * 100 /
          col("tot_d").cast("double"), 4).as("share_pct"))
      .orderBy("p_type")
  }

  /** TPC-H Q5-shaped: snowflake join region→nation→customer→orders→
    * lineitem→supplier (co-located nation check), revenue per nation. */
  def q5RevenueByNation(s: SparkSession, d: String): DataFrame = {
    val region = table(s, d, "region").filter(col("r_name") === "ASIA")
    val nation = table(s, d, "nation")
    val cust = table(s, d, "customer")
    val supp = table(s, d, "supplier")
    val orders = table(s, d, "orders")
    val li = table(s, d, "lineitem")
    val revenue = (col("l_extendedprice") * (lit(1) - col("l_discount")))
      .cast("decimal(18,4)")
    li.join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(cust),
        col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(revenue).cast("double").as("revenue"))
      .orderBy(desc("revenue"), col("n_name"))
  }

  /** Left-semi join: orders having at least one returned lineitem. */
  def semiReturnedOrders(s: SparkSession, d: String): DataFrame = {
    val returned = table(s, d, "lineitem").filter(col("l_returnflag") === "R")
    table(s, d, "orders")
      .join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(dec2(col("o_totalprice"))).cast("double").as("total_price"))
      .orderBy(col("o_orderstatus"))
  }

  /** Left-anti join: customers with no Finalized order, per segment
    * (plain no-orders is empty at small SFs — filter makes the anti path
    * produce real rows at every scale). */
  def antiCustomersNoOrders(s: SparkSession, d: String): DataFrame =
    table(s, d, "customer")
      .join(table(s, d, "orders").filter(col("o_orderstatus") === "F"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))

  /** TPC-H Q6-shaped: pure filter + single-row aggregate — the predicate
    * pushdown showcase (all three filters reach the parquet scan as
    * `PushedFilters`; only 3 columns are read). */
  def q6FilterAgg(s: SparkSession, d: String): DataFrame =
    table(s, d, "lineitem")
      .filter(col("l_quantity") < 24 &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07)
      .agg(
        sum((col("l_extendedprice") * col("l_discount"))
          .cast("decimal(18,4)")).cast("double").as("revenue"),
        count(lit(1)).as("n_rows"))

  /** Scalar-subquery surface: customers whose order total exceeds 2× the
    * average order total of their market segment (broadcast the 5-row
    * per-segment averages back — the fact side never reshuffles twice). */
  def q7AboveAvgCustomers(s: SparkSession, d: String): DataFrame = {
    val perCust = table(s, d, "orders")
      .join(broadcast(table(s, d, "customer")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_mktsegment"))
      .agg(sum(dec2(col("o_totalprice"))).cast("double").as("cust_total"))
    // exact decimal segment sums; the threshold test multiplies instead
    // of dividing so both engines compare identical IEEE operands
    val segAvg = perCust.groupBy(col("c_mktsegment").as("seg"))
      .agg(sum(dec2(col("cust_total"))).cast("double").as("seg_sum"),
        count(lit(1)).as("seg_n"))
    perCust.join(broadcast(segAvg), col("c_mktsegment") === col("seg"))
      .filter(col("cust_total") * col("seg_n") > lit(2.0) * col("seg_sum"))
      .select(col("c_custkey"), col("c_mktsegment"),
        col("cust_total"),
        round(col("seg_sum") / col("seg_n"), 4).as("seg_avg"))
      .orderBy("c_custkey")
  }

  /** TPC-H Q10-shaped: revenue lost to returns per customer over a
    * half-year order window — date-filtered fact ⋈ orders shuffle join,
    * then broadcast customer/nation enrichment, top-20 by lost revenue.
    * The only shuffles are the fact⋈orders join and the final customer
    * aggregate; top-N is TakeOrderedAndProject. */
  def q10ReturnedCustomers(s: SparkSession, d: String): DataFrame = {
    val orders = table(s, d, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1996-07-01"))
    val li = table(s, d, "lineitem").filter(col("l_returnflag") === "R")
    val revenue = (col("l_extendedprice") * (lit(1) - col("l_discount")))
      .cast("decimal(18,4)")
    li.join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(table(s, d, "customer")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(table(s, d, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        col("n_name"))
      .agg(sum(revenue).cast("double").as("lost_revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(desc("lost_revenue"), col("c_custkey"))
      .limit(20)
  }

  /** Left outer join + conditional agg: per-segment order coverage. */
  def leftJoinCoverage(s: SparkSession, d: String): DataFrame =
    table(s, d, "customer")
      .join(table(s, d, "orders"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_mktsegment"))
      .agg(
        countDistinct(col("c_custkey")).as("n_customers"),
        count(col("o_orderkey")).as("n_orders"),
        countDistinct(when(col("o_orderkey").isNull, col("c_custkey")))
          .as("n_without_orders"))
      .orderBy(col("c_mktsegment"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> q1Pricing,
    "q3_top_orders" -> q3TopOrders,
    "q5_revenue_by_nation" -> q5RevenueByNation,
    "q6_filter_agg" -> q6FilterAgg,
    "q14_promo_share" -> q14PromoShare,
    "q10_returned_customers" -> q10ReturnedCustomers,
    "q7_above_avg_customers" -> q7AboveAvgCustomers,
    "j1_semi_returned_orders" -> semiReturnedOrders,
    "j2_anti_customers_no_orders" -> antiCustomersNoOrders,
    "j3_left_join_coverage" -> leftJoinCoverage
  )

  val oracle: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
        |    AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_extendedprice), 4) AS avg_price,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY 1, 2
        |ORDER BY l_returnflag, l_linestatus""".stripMargin.replace('\n', ' '),
    "q3_top_orders" ->
      """SELECT o_orderkey, o_orderdate, o_orderpriority,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 10""".stripMargin.replace('\n', ' '),
    "q5_revenue_by_nation" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey
        |  AND c_nationkey = s_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY 1
        |ORDER BY revenue DESC, n_name""".stripMargin.replace('\n', ' '),
    "q6_filter_agg" ->
      """SELECT CAST(sum(CAST(l_extendedprice * l_discount
        |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  count(*) AS n_rows
        |FROM lineitem
        |WHERE l_quantity < 24 AND l_discount >= CAST('0.05' AS DOUBLE)
        |  AND l_discount <= CAST('0.07' AS DOUBLE)"""
        .stripMargin.replace('\n', ' '),
    "q14_promo_share" ->
      """WITH j AS (
        |  SELECT p_type,
        |    CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
        |      AS rev
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-01-01'),
        |pt AS (SELECT p_type, sum(rev) AS rev_d, count(*) AS n_items
        |  FROM j GROUP BY 1),
        |tot AS (SELECT sum(rev_d) AS tot_d FROM pt)
        |SELECT p_type, CAST(rev_d AS DOUBLE) AS revenue, n_items,
        |  round(CAST(rev_d AS DOUBLE) * 100 / CAST(tot_d AS DOUBLE), 4)
        |    AS share_pct
        |FROM pt, tot ORDER BY p_type""".stripMargin.replace('\n', ' '),
    "q10_returned_customers" ->
      """SELECT c_custkey, c_name, c_mktsegment, n_name,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,4))) AS DOUBLE) AS lost_revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-07-01'
        |GROUP BY 1, 2, 3, 4
        |ORDER BY lost_revenue DESC, c_custkey
        |LIMIT 20""".stripMargin.replace('\n', ' '),
    "q7_above_avg_customers" ->
      """WITH per_cust AS (
        |  SELECT c_custkey, c_mktsegment,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |      AS cust_total
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |seg AS (
        |  SELECT c_mktsegment AS seg,
        |    CAST(sum(CAST(cust_total AS DECIMAL(18,2))) AS DOUBLE)
        |      AS seg_sum,
        |    count(*) AS seg_n
        |  FROM per_cust GROUP BY 1)
        |SELECT c_custkey, c_mktsegment, cust_total,
        |  round(seg_sum / seg_n, 4) AS seg_avg
        |FROM per_cust JOIN seg ON c_mktsegment = seg
        |WHERE cust_total * seg_n > 2 * seg_sum
        |ORDER BY c_custkey""".stripMargin.replace('\n', ' '),
    "j1_semi_returned_orders" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total_price
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY 1 ORDER BY o_orderstatus""".stripMargin.replace('\n', ' '),
    "j2_anti_customers_no_orders" ->
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |GROUP BY 1 ORDER BY c_mktsegment""".stripMargin.replace('\n', ' '),
    "j3_left_join_coverage" ->
      """SELECT c_mktsegment,
        |  count(DISTINCT c_custkey) AS n_customers,
        |  count(o_orderkey) AS n_orders,
        |  count(DISTINCT CASE WHEN o_orderkey IS NULL THEN c_custkey END)
        |    AS n_without_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY 1 ORDER BY c_mktsegment""".stripMargin.replace('\n', ' ')
  )
}
