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
  *  - explicit `broadcast()` hints are reserved for sides whose size is
  *    BOUNDED BY SCHEMA, not by SF: region (5), nation (25), per-segment
  *    (5) and single-row scalar aggregates. customer/supplier/part scale
  *    linearly with SF — at the 100 TB north star customer is billions of
  *    rows, and a forced hint bypasses AQE's size check and OOMs instead
  *    of degrading to a shuffle join. Those sides carry NO hint: AQE
  *    promotes them to broadcast at runtime when stats allow (it does at
  *    bench SFs) and falls back to shuffle joins when they don't;
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

  /** TPC-H Q3-shaped: dim filter → fact join → top-10 revenue (customer
    * is SF-proportional — AQE decides whether the filtered side
    * broadcasts). */
  def q3TopOrders(s: SparkSession, d: String): DataFrame = {
    val cust = table(s, d, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
    val orders = table(s, d, "orders")
    val li = table(s, d, "lineitem")
    val revenue = (col("l_extendedprice") * (lit(1) - col("l_discount")))
      .cast("decimal(18,4)")
    li.join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(revenue).cast("double").as("revenue"))
      .orderBy(desc("revenue"), col("o_orderkey"))
      .limit(10)
  }

  /** TPC-H Q14-shaped: revenue share per part type over one shipping
    * year — fact ⋈ part (unhinted; SF-proportional) + conditional
    * aggregation; the share
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
      .join(table(s, d, "part"),
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
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(cust,
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
      .join(table(s, d, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_mktsegment"))
      .agg(sum(dec2(col("o_totalprice"))).cast("double").as("cust_total"))
    // exact decimal segment sums; the threshold test multiplies instead
    // of dividing so both engines compare identical IEEE operands
    val segAvg = perCust.groupBy(col("c_mktsegment").as("seg"))
      .agg(sum(dec2(col("cust_total"))).as("seg_sum_dec"),
        count(lit(1)).as("seg_n"))
      .withColumn("seg_sum", col("seg_sum_dec").cast("double"))
    perCust.join(broadcast(segAvg), col("c_mktsegment") === col("seg"))
      .filter(col("cust_total") * col("seg_n") > lit(2.0) * col("seg_sum"))
      .select(col("c_custkey"), col("c_mktsegment"),
        col("cust_total"),
        // exact half-away 4-dp average from exact cents (round-8
        // q-discipline; wide decimals keep 100 TB sums in range)
        expr("CAST((2 * CAST(seg_sum_dec * 100 AS DECIMAL(38,0)) * 100" +
          " + seg_n) div (2 * seg_n) AS BIGINT)").as("seg_avg_e4"))
      .orderBy("c_custkey")
  }

  /** TPC-H Q10-shaped: revenue lost to returns per customer over a
    * half-year order window — date-filtered fact ⋈ orders shuffle join,
    * then customer (unhinted) / nation (broadcast) enrichment, top-20 by
    * lost revenue.
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
      .join(table(s, d, "customer"),
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

  /** TPC-H Q4-shaped: priority distribution of 1996 orders with at least
    * one lineitem shipped more than a year after ordering. The semi join
    * carries the extra non-equi term inside the equi-join condition —
    * Spark plans it as a hash semi join on l_orderkey with the date
    * comparison as a residual, so the fact side still hash-partitions
    * (no cartesian, no window). The testdata has no commit/receipt dates
    * (TESTDATA.md), so "late" is ship-lag > 365 days. */
  def q4PriorityLate(s: SparkSession, d: String): DataFrame = {
    val orders = table(s, d, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1997-01-01"))
    val li = table(s, d, "lineitem")
    orders
      .join(li, col("o_orderkey") === col("l_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 365 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  /** TPC-H Q8-shaped: NATION_1's share of AMERICA's PROMO-part market
    * per order year. Only schema-bounded nation/region hint; the share is a
    * conditional sum over one fact aggregate (no second pass over the
    * fact table, no join back), and the division runs in DOUBLE on
    * exact decimal operands — same plan shape as [[q14PromoShare]]. */
  def q8MarketShare(s: SparkSession, d: String): DataFrame = {
    val nation = table(s, d, "nation")
    val region = table(s, d, "region").filter(col("r_name") === "AMERICA")
    // customer nation must lie in AMERICA (the market being measured);
    // the SUPPLIER nation is what the share numerator keys on
    val custSide = table(s, d, "customer")
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"))
    val suppNation = table(s, d, "supplier")
      .join(broadcast(nation.select(col("n_nationkey").as("sn_key"),
        col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("sn_key"))
      .select(col("s_suppkey"), col("supp_nation"))
    val promoParts = table(s, d, "part")
      .filter(col("p_type") === "PROMO").select(col("p_partkey"))
    val revenue = (col("l_extendedprice") * (lit(1) - col("l_discount")))
      .cast("decimal(18,4)")
    table(s, d, "lineitem")
      .join(table(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(promoParts, col("l_partkey") === col("p_partkey"))
      // no hints: promoParts/custSide/suppNation are part-, customer- and
      // supplier-proportional — AQE decides whether each broadcasts
      .join(custSide, col("o_custkey") === col("c_custkey"))
      .join(suppNation, col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_1", revenue)
          .otherwise(lit(0).cast("decimal(18,4)"))).as("nation_rev"),
        sum(revenue).as("total_rev"))
      .select(col("o_year"),
        col("nation_rev").cast("double").as("nation_revenue"),
        col("total_rev").cast("double").as("total_revenue"),
        round(col("nation_rev").cast("double") * 100 /
          col("total_rev").cast("double"), 4).as("share_pct"))
      .orderBy(col("o_year"))
  }

  /** TPC-H Q13-shaped: distribution of customers by order count,
    * including zero-order customers (left join). Two aggregates: the
    * per-customer count reuses the join's hash partitioning; the
    * distribution aggregate moves only |distinct counts| rows. */
  def q13OrderCountDist(s: SparkSession, d: String): DataFrame =
    table(s, d, "customer")
      .join(table(s, d, "orders"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .groupBy(col("n_orders"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(desc("n_customers"), desc("n_orders"))

  /** TPC-H Q18-shaped: large-quantity orders — groupBy(orderkey) HAVING
    * sum(qty) > 250, joined back to orders + broadcast customer for
    * presentation, top-50 via TakeOrderedAndProject. The HAVING filter
    * runs on the aggregate output (map-side partials first), so only
    * qualifying orderkeys reach the join back. */
  def q18LargeOrders(s: SparkSession, d: String): DataFrame = {
    val bigOrders = table(s, d, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"))
      .filter(col("sum_qty") > 250)
    bigOrders
      .join(table(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(table(s, d, "customer"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
      .orderBy(desc("sum_qty"), col("o_orderkey"))
      .limit(50)
  }

  /** TPC-H Q19-shaped: revenue over three OR'd (brand, size-range,
    * quantity-range) brackets. The OR mixes part and lineitem columns,
    * which no optimizer can push through the join — so the part side is
    * explicitly pre-filtered with the IMPLIED part-only disjunction
    * (brand ∧ size per bracket) before the join: at 100 TB that prunes
    * the part side to the brands in play (AQE broadcasts it if the
    * pruned side fits), and the full mixed-side predicate evaluates as
    * the join residual. */
  def q19BracketRevenue(s: SparkSession, d: String): DataFrame = {
    val b1p = col("p_brand") === "Brand#1" && col("p_size").between(1, 15)
    val b2p = col("p_brand") === "Brand#13" && col("p_size").between(10, 30)
    val b3p = col("p_brand") === "Brand#22" && col("p_size").between(20, 50)
    val part = table(s, d, "part").filter(b1p || b2p || b3p)
    val li = table(s, d, "lineitem")
    val bracket =
      (b1p && col("l_quantity").between(1, 20)) ||
      (b2p && col("l_quantity").between(10, 30)) ||
      (b3p && col("l_quantity").between(20, 40))
    val revenue = (col("l_extendedprice") * (lit(1) - col("l_discount")))
      .cast("decimal(18,4)")
    li.join(part, col("l_partkey") === col("p_partkey"))
      .filter(bracket)
      .agg(sum(revenue).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q22-shaped: per-nation count + balance of "idle rich"
    * customers — above-average positive account balance and no order
    * after 1999-01-01. The global average is a broadcast 1-row
    * aggregate (never a collect); the no-recent-orders test is a
    * left-anti join on the date-filtered order side. */
  def q22IdleRichCustomers(s: SparkSession, d: String): DataFrame = {
    val cust = table(s, d, "customer")
    val avgBal = cust.filter(col("c_acctbal") > 0)
      .agg((sum(dec2(col("c_acctbal"))) / count(lit(1)))
        .cast("double").as("avg_bal"))
    val recent = table(s, d, "orders")
      .filter(col("o_orderdate") >= lit("1999-01-01"))
    cust
      .crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(table(s, d, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
        sum(dec2(col("c_acctbal"))).cast("double").as("total_acctbal"))
      .orderBy(col("n_name"))
  }

  /** TPC-H Q9-shaped product profit (adapted: the testdata has no
    * partsupp, so line cost is `p_retailprice · l_quantity` instead of
    * `ps_supplycost · l_quantity`): profit per (supplier nation, order
    * year) over parts whose name contains "red". Filtered part and the
    * supplier→nation map are SF-proportional (no hint; AQE decides);
    * only nation hints.
    * Profit is an exact decimal difference (≤4dp revenue, ≤1dp cost),
    * summed in DECIMAL so partial-agg order can't perturb it. */
  def q9ProductProfit(s: SparkSession, d: String): DataFrame = {
    val redParts = table(s, d, "part")
      .filter(col("p_name").contains("red"))
      .select(col("p_partkey"), col("p_retailprice"))
    val suppNation = table(s, d, "supplier")
      .join(broadcast(table(s, d, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    val profit =
      (col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(18,4)") -
      (col("p_retailprice") * col("l_quantity")).cast("decimal(18,4)")
    table(s, d, "lineitem")
      .join(redParts, col("l_partkey") === col("p_partkey"))
      .join(table(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(suppNation, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).as("o_year"))
      .agg(sum(profit).cast("double").as("sum_profit"))
      .orderBy(col("n_name"), desc("o_year"))
  }

  /** TPC-H Q12-shaped (adapted: no l_shipmode/commit/receipt dates —
    * the "late" predicate is ship-lag > 60 days and the grouping key is
    * l_returnflag): two-level conditional count of high- vs low-priority
    * orders among 1997-shipped late lines. The date bracket and the
    * returnflag projection push to the lineitem scan; one shuffle join
    * with orders (the lag predicate is a residual on the join), one
    * metadata-sized aggregate. */
  def q12LatePriority(s: SparkSession, d: String): DataFrame = {
    val li = table(s, d, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1998-01-01"))
    val highPri = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    li.join(table(s, d, "orders"),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") +
            expr("INTERVAL 60 DAYS"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(highPri, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(highPri, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy(col("l_returnflag"))
  }

  /** TPC-H Q15-shaped: the top-revenue supplier(s) of 1996Q1. The
    * per-supplier revenue aggregate is supplier-cardinality (dimension
    * -bounded), its global max is a broadcast single row, and the
    * winner filter is an exact DECIMAL equality — the double cast
    * happens after selection, so cross-engine float drift can't flip
    * the argmax. Ties all surface (standard Q15 semantics). */
  def q15TopSupplier(s: SparkSession, d: String): DataFrame = {
    val revenue = (col("l_extendedprice") * (lit(1) - col("l_discount")))
      .cast("decimal(18,4)")
    val perSupp = table(s, d, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1996-04-01"))
      .groupBy(col("l_suppkey"))
      .agg(sum(revenue).as("total_rev"))
    val maxRev = perSupp.agg(max(col("total_rev")).as("max_rev"))
    perSupp
      .crossJoin(broadcast(maxRev))
      .filter(col("total_rev") === col("max_rev"))
      .join(table(s, d, "supplier"),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("total_rev").cast("double").as("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H Q16-shaped supplier-variety count (adapted: the part↔supplier
    * link is lineitem, not partsupp, and "complaint" suppliers are the
    * negative-balance ones): distinct suppliers per (brand, type, size)
    * for a size whitelist, excluding Brand#1 / PROMO parts and bad
    * suppliers. Part prefilter and the exclusion list are SF-proportional
    * (unhinted — AQE promotes them when small); the
    * count-distinct dedups on (brand,type,size,suppkey) first, so the
    * final aggregate only sees already-distinct pairs. */
  def q16SupplierVariety(s: SparkSession, d: String): DataFrame = {
    val parts = table(s, d, "part")
      .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 5, 11, 17, 23, 29, 35, 41, 47))
      .select(col("p_partkey"), col("p_brand"), col("p_type"),
        col("p_size"))
    val badSuppliers = table(s, d, "supplier")
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    table(s, d, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"))
      .join(parts, col("l_partkey") === col("p_partkey"))
      .join(badSuppliers,
        col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(desc("supplier_cnt"), col("p_brand"), col("p_type"),
        col("p_size"))
  }

  /** TPC-H Q17-shaped small-quantity revenue (adapted: p_container →
    * p_type = SMALL): average yearly revenue that would vanish if
    * sub-20%-of-average-quantity orders of Brand#3 SMALL parts stopped.
    * The per-part average joins back unhinted (part-proportional — AQE
    * broadcasts it when it fits). The 20% test is DECIMAL-exact by
    * multiplying THROUGH the average's division: `qty·5·n < Σqty` with
    * every operand a bounded decimal — (12,2)·(2,0)·(10,0) stays well
    * under precision 38 in both engines — so no engine-specific
    * division scale or double rounding can flip a boundary row. */
  def q17SmallQtyRevenue(s: SparkSession, d: String): DataFrame = {
    val target = table(s, d, "part")
      .filter(col("p_brand") === "Brand#3" && col("p_type") === "SMALL")
      .select(col("p_partkey"))
    val li = table(s, d, "lineitem")
      .join(target, col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
    val avgQty = li.groupBy(col("l_partkey").as("a_partkey"))
      .agg(sum(dec2(col("l_quantity"))).as("sum_qty"),
        count(lit(1)).as("n_qty"))
    li.join(avgQty, col("l_partkey") === col("a_partkey"))
      .filter(col("l_quantity").cast("decimal(12,2)") *
        lit(5).cast("decimal(2,0)") *
        col("n_qty").cast("decimal(10,0)") < col("sum_qty"))
      .agg(
        (sum(dec2(col("l_extendedprice"))).cast("double") /
          lit(7.0)).as("avg_yearly"),
        count(lit(1)).as("n_lines"))
  }

  /** TPC-H Q2-shaped min-cost supplier (adapted: no partsupp — the
    * part↔supplier offer price is the average sale price observed in
    * lineitem): for each SMALL part of size < 15, the supplier(s) whose
    * avg price equals the per-part minimum. The correlated-min
    * join-back runs on the (part, supplier)-grain aggregate — never on
    * the fact table — and the min comparison is decimal-exact, so the
    * argmin can't flip on float drift. */
  def q2MinCostSupplier(s: SparkSession, d: String): DataFrame = {
    val parts = table(s, d, "part")
      .filter(col("p_type") === "SMALL" && col("p_size") < 15)
      .select(col("p_partkey"), col("p_name"))
    val offers = table(s, d, "lineitem")
      .join(parts, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_partkey"), col("p_name"), col("l_suppkey"))
      .agg((sum(dec2(col("l_extendedprice"))) /
        count(lit(1))).as("avg_price"))
    val minPrice = offers.groupBy(col("p_partkey").as("m_partkey"))
      .agg(min(col("avg_price")).as("min_price"))
    offers
      .join(minPrice, col("p_partkey") === col("m_partkey") &&
        col("avg_price") === col("min_price"))
      .join(table(s, d, "supplier"),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("p_partkey"), col("p_name"), col("s_suppkey"),
        col("s_name"), col("s_acctbal"),
        col("avg_price").cast("double").as("best_price"))
      .orderBy(col("p_partkey"), col("s_suppkey"))
  }

  /** TPC-H Q11-shaped important-stock (adapted: inventory value =
    * shipped `l_quantity · l_extendedprice/l_quantity` ≈ extendedprice,
    * grouped by part, for NATION_2's suppliers): parts whose total
    * value exceeds 0.1% of the nation's total. The HAVING threshold is
    * a broadcast 1-row aggregate-of-the-aggregate; everything after the
    * fact join is (part)-grain. Decimal sums; the share predicate
    * compares decimal·int vs decimal — exact in both engines. */
  def q11ImportantStock(s: SparkSession, d: String): DataFrame = {
    // region-level scope: a single nation is empty at the smallest SF
    // (10 suppliers over 25 nations) — the plan shape is identical
    val suppN = table(s, d, "supplier")
      .join(broadcast(table(s, d, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(table(s, d, "region")
        .filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"))
    val valued = table(s, d, "lineitem")
      .join(suppN, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"))
      .agg(sum(dec2(col("l_extendedprice"))).as("part_value"))
    val total = valued.agg(sum(col("part_value")).as("total_value"))
    valued.crossJoin(broadcast(total))
      .filter(col("part_value") * 1000 > col("total_value"))
      .select(col("l_partkey"),
        col("part_value").cast("double").as("part_value"))
      .orderBy(desc("part_value"), col("l_partkey"))
  }

  /** TPC-H Q20-shaped (adapted: "excess stock" = shipped more than 40
    * units of some red part in 1996): the suppliers-to-audit list via a
    * two-level semi-join chain — per-(supplier, part) 1996 shipments
    * over red parts, thresholded, then supplier names for NATION_1.
    * Both reducing joins are semi (no fan-out), the part prefilter is
    * unhinted (AQE decides), and the fact table is touched once. */
  def q20ExcessShippers(s: SparkSession, d: String): DataFrame = {
    val redParts = table(s, d, "part")
      .filter(col("p_name").contains("red")).select(col("p_partkey"))
    val shipped = table(s, d, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1997-01-01"))
      .join(redParts, col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(dec2(col("l_quantity"))).as("qty"))
      .filter(col("qty") > 40)
      .select(col("l_suppkey")).distinct()
    table(s, d, "supplier")
      .join(broadcast(table(s, d, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(table(s, d, "region")
        .filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .join(shipped, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H Q21-shaped waiting-orders (adapted: "late" = ship-lag > 365
    * days): suppliers of NATION_3 who were the ONLY late supplier on a
    * multi-supplier order. The exists/not-exists pair collapses into
    * per-order window-free aggregates: distinct suppliers and distinct
    * LATE suppliers per order (one pass over the joined fact), then the
    * qualifying condition is row-local on the (order, supplier) grain.
    * No correlated subquery ever re-scans lineitem. */
  def q21WaitingSuppliers(s: SparkSession, d: String): DataFrame = {
    val li = table(s, d, "lineitem")
      .join(table(s, d, "orders").filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") > col("o_orderdate") +
          expr("INTERVAL 365 DAYS")).as("is_late"))
    val perOrder = li
      .groupBy(col("l_orderkey"))
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(when(col("is_late"), col("l_suppkey")))
          .as("n_late_supp"))
      .filter(col("n_supp") >= 2 && col("n_late_supp") === 1)
      .select(col("l_orderkey").as("q_orderkey"))
    val lateLines = li.filter(col("is_late"))
      .select(col("l_orderkey"), col("l_suppkey")).distinct()
    lateLines
      .join(perOrder, col("l_orderkey") === col("q_orderkey"), "left_semi")
      .join(table(s, d, "supplier"),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(table(s, d, "nation")
        .filter(col("n_name") === "NATION_3")),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(desc("numwait"), col("s_suppkey"))
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
    "q4_priority_late" -> q4PriorityLate,
    "q8_market_share" -> q8MarketShare,
    "q13_order_count_dist" -> q13OrderCountDist,
    "q18_large_orders" -> q18LargeOrders,
    "q19_bracket_revenue" -> q19BracketRevenue,
    "q22_idle_rich_customers" -> q22IdleRichCustomers,
    "q9_product_profit" -> q9ProductProfit,
    "q2_min_cost_supplier" -> q2MinCostSupplier,
    "q11_important_stock" -> q11ImportantStock,
    "q20_excess_shippers" -> q20ExcessShippers,
    "q21_waiting_suppliers" -> q21WaitingSuppliers,
    "q12_late_priority" -> q12LatePriority,
    "q15_top_supplier" -> q15TopSupplier,
    "q16_supplier_variety" -> q16SupplierVariety,
    "q17_small_qty_revenue" -> q17SmallQtyRevenue,
    "j1_semi_returned_orders" -> semiReturnedOrders,
    "j2_anti_customers_no_orders" -> antiCustomersNoOrders,
    "j3_left_join_coverage" -> leftJoinCoverage
  )

  val oracle: Map[String, String] = Map(
    "q2_min_cost_supplier" ->
      """WITH offers AS (
        |  SELECT p_partkey, p_name, l_suppkey,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) / count(*)
        |      AS avg_price
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_type = 'SMALL' AND p_size < 15
        |  GROUP BY 1, 2, 3),
        |mn AS (SELECT p_partkey AS m_partkey, min(avg_price)
        |  AS min_price FROM offers GROUP BY 1)
        |SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal,
        |  CAST(avg_price AS DOUBLE) AS best_price
        |FROM offers
        |JOIN mn ON p_partkey = m_partkey AND avg_price = min_price
        |JOIN supplier ON l_suppkey = s_suppkey
        |ORDER BY p_partkey, s_suppkey""".stripMargin.replace('\n', ' '),
    "q11_important_stock" ->
      """WITH valued AS (
        |  SELECT l_partkey,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS part_value
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'
        |  GROUP BY 1),
        |total AS (SELECT sum(part_value) AS total_value FROM valued)
        |SELECT l_partkey, CAST(part_value AS DOUBLE) AS part_value
        |FROM valued CROSS JOIN total
        |WHERE part_value * 1000 > total_value
        |ORDER BY part_value DESC, l_partkey"""
        .stripMargin.replace('\n', ' '),
    "q20_excess_shippers" ->
      """WITH shipped AS (
        |  SELECT DISTINCT l_suppkey
        |  FROM (SELECT l_suppkey, l_partkey,
        |      sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty
        |    FROM lineitem JOIN part ON l_partkey = p_partkey
        |    WHERE p_name LIKE '%red%'
        |      AND l_shipdate >= TIMESTAMP '1996-01-01'
        |      AND l_shipdate < TIMESTAMP '1997-01-01'
        |    GROUP BY 1, 2)
        |  WHERE qty > 40)
        |SELECT s_suppkey, s_name, s_acctbal
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'EUROPE'
        |  AND s_suppkey IN (SELECT l_suppkey FROM shipped)
        |ORDER BY s_suppkey""".stripMargin.replace('\n', ' '),
    "q21_waiting_suppliers" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_suppkey,
        |    l_shipdate > o_orderdate + INTERVAL 365 DAY AS is_late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'),
        |per_order AS (
        |  SELECT l_orderkey
        |  FROM li GROUP BY 1
        |  HAVING count(DISTINCT l_suppkey) >= 2
        |    AND count(DISTINCT CASE WHEN is_late THEN l_suppkey END) = 1),
        |late_lines AS (
        |  SELECT DISTINCT l_orderkey, l_suppkey FROM li WHERE is_late)
        |SELECT s_suppkey, s_name, count(*) AS numwait
        |FROM late_lines
        |JOIN per_order USING (l_orderkey)
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_3'
        |GROUP BY 1, 2
        |ORDER BY numwait DESC, s_suppkey"""
        .stripMargin.replace('\n', ' '),
    "q9_product_profit" ->
      """SELECT n_name, CAST(year(o_orderdate) AS INT) AS o_year,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |      AS DECIMAL(18,4)) -
        |    CAST(p_retailprice * l_quantity AS DECIMAL(18,4)))
        |    AS DOUBLE) AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY 1, 2
        |ORDER BY n_name, o_year DESC""".stripMargin.replace('\n', ' '),
    "q12_late_priority" ->
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
        |GROUP BY 1 ORDER BY l_returnflag""".stripMargin.replace('\n', ' '),
    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    sum(CAST(l_extendedprice * (1 - l_discount)
        |      AS DECIMAL(18,4))) AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE)
        |  AS total_revenue
        |FROM supplier JOIN rev ON s_suppkey = l_suppkey
        |WHERE total_rev = (SELECT max(total_rev) FROM rev)
        |ORDER BY s_suppkey""".stripMargin.replace('\n', ' '),
    "q16_supplier_variety" ->
      """SELECT p_brand, p_type, p_size,
        |  count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 5, 11, 17, 23, 29, 35, 41, 47)
        |  AND l_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""
        .stripMargin.replace('\n', ' '),
    "q17_small_qty_revenue" ->
      """WITH li AS (
        |  SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#3' AND p_type = 'SMALL'),
        |avgq AS (
        |  SELECT l_partkey AS a_partkey,
        |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
        |    count(*) AS n_qty
        |  FROM li GROUP BY 1)
        |SELECT
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    / CAST('7' AS DOUBLE) AS avg_yearly,
        |  count(*) AS n_lines
        |FROM li JOIN avgq ON l_partkey = a_partkey
        |WHERE CAST(l_quantity AS DECIMAL(12,2)) * CAST(5 AS DECIMAL(2,0))
        |  * CAST(n_qty AS DECIMAL(10,0)) < sum_qty"""
        .stripMargin.replace('\n', ' '),
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
        |    sum(CAST(cust_total AS DECIMAL(18,2))) AS seg_sum_dec,
        |    CAST(sum(CAST(cust_total AS DECIMAL(18,2))) AS DOUBLE)
        |      AS seg_sum,
        |    count(*) AS seg_n
        |  FROM per_cust GROUP BY 1)
        |SELECT c_custkey, c_mktsegment, cust_total,
        |  CAST((2 * CAST(seg_sum_dec * 100 AS HUGEINT) * 100 + seg_n)
        |    // (2 * seg_n) AS BIGINT) AS seg_avg_e4
        |FROM per_cust JOIN seg ON c_mktsegment = seg
        |WHERE cust_total * seg_n > 2 * seg_sum
        |ORDER BY c_custkey""".stripMargin.replace('\n', ' '),
    "q4_priority_late" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL 365 DAY)
        |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin.replace('\n', ' '),
    "q8_market_share" ->
      """WITH f AS (
        |  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        |    CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
        |      AS rev,
        |    sn.n_name AS supp_nation
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation cn ON c_nationkey = cn.n_nationkey
        |  JOIN region ON cn.n_regionkey = r_regionkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation sn ON s_nationkey = sn.n_nationkey
        |  WHERE p_type = 'PROMO' AND r_name = 'AMERICA'),
        |agg AS (
        |  SELECT o_year,
        |    sum(CASE WHEN supp_nation = 'NATION_1' THEN rev
        |        ELSE CAST(0 AS DECIMAL(18,4)) END) AS nation_rev,
        |    sum(rev) AS total_rev
        |  FROM f GROUP BY 1)
        |SELECT o_year,
        |  CAST(nation_rev AS DOUBLE) AS nation_revenue,
        |  CAST(total_rev AS DOUBLE) AS total_revenue,
        |  round(CAST(nation_rev AS DOUBLE) * 100 /
        |    CAST(total_rev AS DOUBLE), 4) AS share_pct
        |FROM agg ORDER BY o_year""".stripMargin.replace('\n', ' '),
    "q13_order_count_dist" ->
      """WITH per_cust AS (
        |  SELECT c_custkey, count(o_orderkey) AS n_orders
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY 1)
        |SELECT n_orders, count(*) AS n_customers
        |FROM per_cust GROUP BY 1
        |ORDER BY n_customers DESC, n_orders DESC"""
        .stripMargin.replace('\n', ' '),
    "q18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |      AS sum_qty
        |  FROM lineitem GROUP BY 1
        |  HAVING CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |    > 250)
        |SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  sum_qty
        |FROM big
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY sum_qty DESC, o_orderkey
        |LIMIT 50""".stripMargin.replace('\n', ' '),
    "q19_bracket_revenue" ->
      """SELECT
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE
        |  (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        |    AND l_quantity BETWEEN 1 AND 20)
        |  OR (p_brand = 'Brand#13' AND p_size BETWEEN 10 AND 30
        |    AND l_quantity BETWEEN 10 AND 30)
        |  OR (p_brand = 'Brand#22' AND p_size BETWEEN 20 AND 50
        |    AND l_quantity BETWEEN 20 AND 40)"""
        .stripMargin.replace('\n', ' '),
    "q22_idle_rich_customers" ->
      """WITH avg_bal AS (
        |  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) / count(*)
        |    AS DOUBLE) AS avg_bal
        |  FROM customer WHERE c_acctbal > 0)
        |SELECT n_name, count(*) AS n_customers,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |CROSS JOIN avg_bal
        |WHERE c_acctbal > avg_bal
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey
        |      AND o_orderdate >= TIMESTAMP '1999-01-01')
        |GROUP BY 1 ORDER BY n_name""".stripMargin.replace('\n', ' '),
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
