package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.PipelineQueries.table
import graft.text.TextAnalysis

/** Decision-support shapes beyond the TPC-H surface (TPC-DS-style
  * year-over-year, set-intersection and top-fraction patterns) plus two
  * corpus-curation operators (vocabulary coverage, target-mixture
  * resampling) and an exact distributed percentile.
  *
  * Scale conventions follow RelationalQueries: no broadcast hint on any
  * SF-proportional side (AQE decides), exact DECIMAL money sums, ratios
  * divide identical operands in both engines so no rounding is needed,
  * windows only ever run over dimension-grain or top-k-bounded rows.
  */
object DecisionSupportQueries {

  private def dec2(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  /** TPC-DS Q74/Q75-shaped year-over-year growth: revenue per
    * (nation, order year), self-joined on the previous year. The fact
    * table is touched ONCE; the self-join runs on the nations×years
    * aggregate (dimension-grain). */
  def ds1YoyGrowth(s: SparkSession, d: String): DataFrame = {
    val revenue = (col("l_extendedprice") * (lit(1) - col("l_discount")))
      .cast("decimal(18,4)")
    val rev = table(s, d, "lineitem")
      .join(table(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(table(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(table(s, d, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).as("o_year"))
      .agg(sum(revenue).as("rev_d"))
    val prev = rev.select(col("n_name").as("p_name"),
      col("o_year").as("p_year"), col("rev_d").as("prev_d"))
    rev.join(prev, col("n_name") === col("p_name") &&
        col("o_year") === col("p_year") + 1)
      .select(col("n_name"), col("o_year"),
        col("rev_d").cast("double").as("revenue"),
        col("prev_d").cast("double").as("prev_revenue"),
        // identical decimal-derived operands in both engines: the raw
        // IEEE quotient is deterministic, no rounding needed
        (col("rev_d").cast("double") / col("prev_d").cast("double"))
          .as("growth"))
      .orderBy(col("n_name"), col("o_year"))
  }

  /** TPC-DS Q38-shaped repeat customers: active (≥1 order) in BOTH 1996
    * and 1997, counted per segment. The INTERSECT is two distinct
    * custkey sets semi-joined — set rows only, never fact rows. */
  def ds2RepeatCustomers(s: SparkSession, d: String): DataFrame = {
    def active(year: Int) = table(s, d, "orders")
      .filter(col("o_orderdate") >= lit(s"$year-01-01") &&
        col("o_orderdate") < lit(s"${year + 1}-01-01"))
      .select(col("o_custkey")).distinct()
    val both = active(1996)
      .join(active(1997).select(col("o_custkey").as("c2")),
        col("o_custkey") === col("c2"), "left_semi")
    table(s, d, "customer")
      .join(both, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        sum(dec2(col("c_acctbal"))).cast("double").as("total_acctbal"))
      .orderBy(col("c_mktsegment"))
  }

  /** TPC-DS Q11-shaped top-decile spenders: per segment, the top
    * ⌈n/10⌉ customers by lifetime order total and their share of the
    * segment's revenue. The per-segment rank is the two-phase
    * [[graft.etl.Ids.keyedCumsum]] of ones — range-partitioned on
    * (segment, -cents, custkey) so every shuffle partition works,
    * instead of a rank window whose parallelism is the SEGMENT
    * cardinality (5 tasks carrying the whole customer grain at any
    * SF). Cent-exact totals with custkey tie-break make the cut
    * deterministic. */
  def ds3TopDecile(s: SparkSession, d: String): DataFrame = {
    val perCust = table(s, d, "orders")
      .join(table(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_mktsegment"))
      .agg(sum(dec2(col("o_totalprice"))).as("tot_d"))
    val segTot = perCust.groupBy(col("c_mktsegment").as("seg"))
      .agg(count(lit(1)).as("seg_n"), sum(col("tot_d")).as("seg_d"))
    val ranked = graft.etl.Ids.keyedCumsum(
      perCust
        .withColumn("__negc", -(col("tot_d") * 100).cast("long"))
        .withColumn("__one", lit(1L)),
      "c_mktsegment", Seq("__negc", "c_custkey"), "__one", "rn")
    ranked
      .join(broadcast(segTot), col("c_mktsegment") === col("seg"))
      .filter(col("rn") <= expr("(seg_n + 9) div 10"))
      .groupBy(col("c_mktsegment"), col("seg_n"), col("seg_d"))
      .agg(count(lit(1)).as("n_top"), sum(col("tot_d")).as("top_d"))
      .select(col("c_mktsegment"), col("seg_n").as("n_customers"),
        col("n_top"),
        col("top_d").cast("double").as("top_revenue"),
        (col("top_d").cast("double") / col("seg_d").cast("double"))
          .as("revenue_share"))
      .orderBy(col("c_mktsegment"))
  }

  /** Exact distributed percentiles (p50/p90 of event value per type) via
    * rank-and-pick: per-type rank from the two-phase
    * [[graft.etl.Ids.keyedCumsum]] of ones (range-partitioned on
    * (type, value, event_id) — every shuffle partition works, never
    * |types| tasks carrying the event grain), per-type counts broadcast
    * from a key-cardinality aggregate, select the ⌈p·n⌉-th row — pure
    * integer index math, no interpolation, so both engines pick the
    * identical stored double. */
  def w8Percentile(s: SparkSession, d: String): DataFrame = {
    val ev = table(s, d, "events")
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("value"), col("event_id"))
    val counts = ev.groupBy(col("event_type").as("n_type"))
      .agg(count(lit(1)).as("n"))
    graft.etl.Ids.keyedCumsum(ev.withColumn("__one", lit(1L)),
        "event_type", Seq("value", "event_id"), "__one", "rn")
      .join(broadcast(counts), col("event_type") === col("n_type"))
      .filter(col("rn") === expr("(n + 1) div 2") ||
        col("rn") === expr("(9 * n + 9) div 10"))
      .groupBy(col("event_type"), col("n").as("n_events"))
      .agg(
        max(when(col("rn") === expr("(n + 1) div 2"), col("value")))
          .as("p50"),
        max(when(col("rn") === expr("(9 * n + 9) div 10"), col("value")))
          .as("p90"))
      .orderBy(col("event_type"))
  }

  /** Vocabulary coverage: the top-50 corpus tokens with cumulative
    * coverage fraction — the curve tokenizer/vocab builders read before
    * fixing a vocab size. The heavy part is one hash aggregate over the
    * token stream; the top-50 cut is TakeOrderedAndProject and the
    * cumulative window runs over those 50 rows (metadata-sized), with
    * the corpus total joined back as a broadcast single row. */
  def t20VocabCoverage(s: SparkSession, d: String): DataFrame = {
    val freq = table(s, d, "documents")
      .select(explode(TextAnalysis.tokens(
        TextAnalysis.normalized(col("text")))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
    val total = freq.agg(sum(col("cnt")).as("total"))
    val top = freq.orderBy(col("cnt").desc, col("term")).limit(50)
    val w = Window.orderBy(col("cnt").desc, col("term"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    top
      .withColumn("rank",
        row_number().over(Window.orderBy(col("cnt").desc, col("term"))))
      .withColumn("cum_cnt", sum(col("cnt")).over(w))
      .crossJoin(broadcast(total))
      .select(col("rank"), col("term"), col("cnt"), col("cum_cnt"),
        (col("cum_cnt").cast("double") / col("total").cast("double"))
          .as("coverage"))
      .orderBy(col("rank"))
  }

  /** Target-mixture resampling: rebalance the corpus toward Zipf-ish
    * source weights w_s ∝ 1/(1+idx) at the largest feasible scale
    * c = min_s(n_s/w_s), keeping each row iff its content-hash unit
    * value clears the source's acceptance rate c·w_s/n_s — the domain
    * re-weighting step of pretraining-data curation (e.g. up-weighting
    * curated sources against web crawl), deterministic and RNG-free via
    * the same md5 cut as stableSample.
    *
    * Scale: per-source rates come from a metadata-sized aggregate
    * (|sources| rows) broadcast back; the keep test is a per-row
    * expression on the scan — the corpus never shuffles. */
  def t21DomainMixture(s: SparkSession, d: String): DataFrame = {
    val docs = table(s, d, "documents")
    val weight = lit(1.0) /
      (lit(1.0) + substring(col("source"), 4, 8).cast("int"))
    val counts = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("w", weight)
    val scale = counts
      .agg(min(col("n_docs").cast("double") / col("w")).as("c"))
    val rates = counts.crossJoin(broadcast(scale))
      .select(col("source").as("r_src"), col("n_docs"),
        least(lit(1.0), col("c") * col("w") / col("n_docs")).as("rate"))
    val hashUnit = conv(
      substring(TextAnalysis.fingerprint(col("text")), 1, 4), 16, 10)
      .cast("long")
    val kept = docs.join(broadcast(rates), col("source") === col("r_src"))
      .filter(hashUnit < col("rate") * 65536)
      .groupBy(col("source")).agg(count(lit(1)).as("n_kept"))
    rates
      .join(kept, col("r_src") === col("source"), "left")
      .select(col("r_src").as("source"), col("n_docs"), col("rate"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
      .orderBy(col("source"))
  }

  /** Ranking-function completeness: ntile / percent_rank / cume_dist over
    * a tie-free total order (acctbal, custkey), aggregated to quartile
    * summaries. With a unique ordering key percent_rank = (rn-1)/(N-1)
    * and cume_dist = rn/N in BOTH engines — integer-operand IEEE
    * quotients, deterministic unrounded. The per-segment rank is the
    * two-phase keyedCumsum of ones (the ds3 shape — parallelism is the
    * shuffle-partition count, not the segment count); ntile(4) is the
    * exact boundary arithmetic against broadcast per-segment counts. */
  def w9RankFunctions(s: SparkSession, d: String): DataFrame = {
    val cust = table(s, d, "customer")
      .select(col("c_mktsegment"), col("c_acctbal"), col("c_custkey"))
    val counts = cust.groupBy(col("c_mktsegment").as("n_seg"))
      .agg(count(lit(1)).as("__n"))
    val ranked = graft.etl.Ids.keyedCumsum(
        cust.withColumn("__one", lit(1L)),
        "c_mktsegment", Seq("c_acctbal", "c_custkey"), "__one", "rn")
      .join(broadcast(counts), col("c_mktsegment") === col("n_seg"))
    graft.etl.Ids
      .exactNtileByCount(ranked, "rn", "__n", 4, "quartile")
      .withColumn("pr", (col("rn") - 1).cast("double") /
        (col("__n") - 1).cast("double"))
      .withColumn("cd",
        col("rn").cast("double") / col("__n").cast("double"))
      .groupBy(col("c_mktsegment"), col("quartile"))
      .agg(count(lit(1)).as("n_customers"),
        min(col("c_acctbal")).as("min_acctbal"),
        max(col("c_acctbal")).as("max_acctbal"),
        min(col("pr")).as("min_pct_rank"),
        max(col("pr")).as("max_pct_rank"),
        max(col("cd")).as("max_cume_dist"))
      .orderBy(col("c_mktsegment"), col("quartile"))
  }

  /** ROLLUP(nation, year) revenue — the hierarchical-subtotal twin of
    * x28's GROUPING SETS. gid spelled as explicit grouping() arithmetic
    * (engine-specific grouping_id encodings don't hash-match); ordering
    * coalesces the NULL subtotal rows because Spark sorts NULLS FIRST
    * and DuckDB NULLS LAST by default. Fact table touched once; nation
    * is the only (schema-bounded, 25-row) broadcast hint. */
  def x38Rollup(s: SparkSession, d: String): DataFrame =
    table(s, d, "orders")
      .join(table(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(table(s, d, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), year(col("o_orderdate")).as("o_year"),
        dec2(col("o_totalprice")).as("price_d"))
      .rollup(col("n_name"), col("o_year"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("price_d")).cast("double").as("revenue"),
        (grouping(col("n_name")) * 2 + grouping(col("o_year")))
          .cast("long").as("gid"))
      .orderBy(col("gid"), coalesce(col("n_name"), lit("")),
        coalesce(col("o_year"), lit(-1)))

  /** Fixed-bin value histogram per event type. The bucket index is the
    * SAME manual expression in both engines — floor(value/width) clamped
    * — rather than each engine's width_bucket builtin (boundary-rounding
    * conventions differ). One hash aggregate over the scan; output is
    * |types|×|bins| rows. */
  def x39Histogram(s: SparkSession, d: String): DataFrame = {
    val bucket = least(lit(19), greatest(lit(0),
      floor(col("value") / lit(25.0)))).cast("int")
    table(s, d, "events")
      .filter(col("value").isNotNull)
      .groupBy(col("event_type"), bucket.as("bucket"))
      .agg(count(lit(1)).as("n_events"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .withColumn("bucket_lo", col("bucket").cast("double") * 25.0)
      .select(col("event_type"), col("bucket"), col("bucket_lo"),
        col("n_events"), col("min_value"), col("max_value"))
      .orderBy(col("event_type"), col("bucket"))
  }

  /** TPC-DS-style cross-channel behavior: TWO fact tables (orders =
    * purchase channel, events = web channel) each pre-aggregated to the
    * shared customer grain, full-outer joined, profiled
    * both/orders_only/web_only, rolled up per nation. The multi-fact
    * shape: each fact shuffles ONCE at its own aggregate (map-side
    * combine), the channel join runs on the small per-customer grain,
    * and only nation (25 rows) is broadcast — the q-family rule that
    * customer-sized sides are never hinted. */
  def ds4CrossChannel(s: SparkSession, d: String): DataFrame = {
    val ord = table(s, d, "orders")
      .groupBy(col("o_custkey").as("k"))
      .agg(count(lit(1)).as("o_n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("rev_d"))
    val web = table(s, d, "events")
      .filter(col("value").isNotNull)
      .groupBy(col("user_id").as("wk"))
      .agg(count(lit(1)).as("w_n"),
        sum(col("value").cast("decimal(18,6)")).as("webv_d"))
    val cust = table(s, d, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
    val nat = table(s, d, "nation")
      .select(col("n_nationkey"), col("n_name"))
    ord.join(web, col("k") === col("wk"), "full_outer")
      .select(coalesce(col("k"), col("wk")).as("custkey"),
        col("o_n"), col("rev_d"), col("w_n"), col("webv_d"))
      .join(cust, col("custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .withColumn("profile",
        when(col("o_n").isNotNull && col("w_n").isNotNull, "both")
          .when(col("o_n").isNotNull, "orders_only")
          .otherwise("web_only"))
      .groupBy(col("n_name"), col("profile"))
      .agg(count(lit(1)).as("n_customers"),
        sum(coalesce(col("o_n"), lit(0L))).as("n_orders"),
        sum(coalesce(col("rev_d"), lit(0).cast("decimal(18,2)")))
          .cast("double").as("revenue"),
        sum(coalesce(col("w_n"), lit(0L))).as("n_events"),
        sum(coalesce(col("webv_d"), lit(0).cast("decimal(18,6)")))
          .cast("double").as("web_value"))
      .orderBy("n_name", "profile")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ds4_cross_channel" -> ds4CrossChannel,
    "w9_rank_functions" -> w9RankFunctions,
    "x38_rollup" -> x38Rollup,
    "x39_histogram" -> x39Histogram,
    "ds1_yoy_growth" -> ds1YoyGrowth,
    "ds2_repeat_customers" -> ds2RepeatCustomers,
    "ds3_top_decile" -> ds3TopDecile,
    "w8_percentile" -> w8Percentile,
    "t20_vocab_coverage" -> t20VocabCoverage,
    "t21_domain_mixture" -> t21DomainMixture
  )

  val oracle: Map[String, String] = Map(
    "ds4_cross_channel" ->
      """WITH ord AS (SELECT o_custkey AS k, count(*) AS o_n,
        |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_d
        |  FROM orders GROUP BY 1),
        |web AS (SELECT user_id AS wk, count(*) AS w_n,
        |    sum(CAST(value AS DECIMAL(18,6))) AS webv_d
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |ch AS (SELECT coalesce(o.k, w.wk) AS custkey, o.o_n, o.rev_d,
        |    w.w_n, w.webv_d,
        |    CASE WHEN o.o_n IS NOT NULL AND w.w_n IS NOT NULL
        |        THEN 'both'
        |      WHEN o.o_n IS NOT NULL THEN 'orders_only'
        |      ELSE 'web_only' END AS profile
        |  FROM ord o FULL OUTER JOIN web w ON o.k = w.wk)
        |SELECT n_name, profile, count(*) AS n_customers,
        |  CAST(sum(coalesce(o_n, 0)) AS BIGINT) AS n_orders,
        |  CAST(sum(coalesce(rev_d, CAST('0' AS DECIMAL(18,2))))
        |    AS DOUBLE) AS revenue,
        |  CAST(sum(coalesce(w_n, 0)) AS BIGINT) AS n_events,
        |  CAST(sum(coalesce(webv_d, CAST('0' AS DECIMAL(18,6))))
        |    AS DOUBLE) AS web_value
        |FROM ch
        |JOIN customer ON custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1, 2 ORDER BY n_name, profile"""
        .stripMargin.replace('\n', ' '),
    "w9_rank_functions" ->
      """WITH ranked AS (
        |  SELECT c_mktsegment, c_acctbal,
        |    ntile(4) OVER w AS quartile,
        |    percent_rank() OVER w AS pr,
        |    cume_dist() OVER w AS cd
        |  FROM customer
        |  WINDOW w AS (PARTITION BY c_mktsegment
        |    ORDER BY c_acctbal, c_custkey))
        |SELECT c_mktsegment, CAST(quartile AS INT) AS quartile,
        |  count(*) AS n_customers,
        |  min(c_acctbal) AS min_acctbal, max(c_acctbal) AS max_acctbal,
        |  min(pr) AS min_pct_rank, max(pr) AS max_pct_rank,
        |  max(cd) AS max_cume_dist
        |FROM ranked GROUP BY 1, 2
        |ORDER BY c_mktsegment, quartile""".stripMargin.replace('\n', ' '),
    "x38_rollup" ->
      """WITH base AS (
        |  SELECT n_name, CAST(year(o_orderdate) AS INT) AS o_year,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS price_d
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey)
        |SELECT n_name, o_year, count(*) AS n_orders,
        |  CAST(sum(price_d) AS DOUBLE) AS revenue,
        |  CAST(grouping(n_name) * 2 + grouping(o_year) AS BIGINT) AS gid
        |FROM base
        |GROUP BY ROLLUP (n_name, o_year)
        |ORDER BY gid, coalesce(n_name, ''),
        |  coalesce(o_year, -1)""".stripMargin.replace('\n', ' '),
    "x39_histogram" ->
      """SELECT event_type,
        |  CAST(least(19, greatest(0, floor(value / 25.0))) AS INT)
        |    AS bucket,
        |  CAST(least(19, greatest(0, floor(value / 25.0))) AS INT)
        |    * CAST('25' AS DOUBLE) AS bucket_lo,
        |  count(*) AS n_events,
        |  min(value) AS min_value, max(value) AS max_value
        |FROM events WHERE value IS NOT NULL
        |GROUP BY 1, 2, 3
        |ORDER BY event_type, bucket""".stripMargin.replace('\n', ' '),
    "ds1_yoy_growth" ->
      """WITH rev AS (
        |  SELECT n_name, CAST(year(o_orderdate) AS INT) AS o_year,
        |    sum(CAST(l_extendedprice * (1 - l_discount)
        |      AS DECIMAL(18,4))) AS rev_d
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1, 2)
        |SELECT c.n_name, c.o_year,
        |  CAST(c.rev_d AS DOUBLE) AS revenue,
        |  CAST(p.rev_d AS DOUBLE) AS prev_revenue,
        |  CAST(c.rev_d AS DOUBLE) / CAST(p.rev_d AS DOUBLE) AS growth
        |FROM rev c JOIN rev p
        |  ON c.n_name = p.n_name AND c.o_year = p.o_year + 1
        |ORDER BY c.n_name, c.o_year""".stripMargin.replace('\n', ' '),
    "ds2_repeat_customers" ->
      """SELECT c_mktsegment, count(*) AS n_customers,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total_acctbal
        |FROM customer
        |WHERE c_custkey IN (
        |  SELECT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate < TIMESTAMP '1997-01-01'
        |  INTERSECT
        |  SELECT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |    AND o_orderdate < TIMESTAMP '1998-01-01')
        |GROUP BY 1 ORDER BY c_mktsegment""".stripMargin.replace('\n', ' '),
    "ds3_top_decile" ->
      """WITH per_cust AS (
        |  SELECT c_custkey, c_mktsegment,
        |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS tot_d
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |seg AS (SELECT c_mktsegment AS seg, count(*) AS seg_n,
        |    sum(tot_d) AS seg_d
        |  FROM per_cust GROUP BY 1),
        |ranked AS (SELECT *, row_number() OVER (
        |    PARTITION BY c_mktsegment
        |    ORDER BY tot_d DESC, c_custkey) AS rn
        |  FROM per_cust)
        |SELECT c_mktsegment, seg_n AS n_customers,
        |  count(*) AS n_top,
        |  CAST(sum(tot_d) AS DOUBLE) AS top_revenue,
        |  CAST(sum(tot_d) AS DOUBLE) / CAST(seg_d AS DOUBLE)
        |    AS revenue_share
        |FROM ranked JOIN seg ON c_mktsegment = seg
        |WHERE rn <= (seg_n + 9) // 10
        |GROUP BY c_mktsegment, seg_n, seg_d
        |ORDER BY c_mktsegment""".stripMargin.replace('\n', ' '),
    "w8_percentile" ->
      """WITH ranked AS (
        |  SELECT event_type, value,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY value, event_id) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM events WHERE value IS NOT NULL)
        |SELECT event_type, n AS n_events,
        |  max(CASE WHEN rn = (n + 1) // 2 THEN value END) AS p50,
        |  max(CASE WHEN rn = (9 * n + 9) // 10 THEN value END) AS p90
        |FROM ranked
        |WHERE rn = (n + 1) // 2 OR rn = (9 * n + 9) // 10
        |GROUP BY 1, 2 ORDER BY event_type""".stripMargin.replace('\n', ' '),
    "t20_vocab_coverage" -> {
      val toks = TextAnalysis.tokensSql(TextAnalysis.normalizedSql("text"))
      s"""WITH toks AS (SELECT unnest($toks) AS term FROM documents),
         |freq AS (SELECT term, count(*) AS cnt FROM toks GROUP BY 1),
         |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM freq),
         |top AS (SELECT term, cnt FROM freq
         |  ORDER BY cnt DESC, term LIMIT 50)
         |SELECT CAST(row_number() OVER
         |    (ORDER BY cnt DESC, term) AS INT) AS rank,
         |  term, cnt,
         |  CAST(sum(cnt) OVER (ORDER BY cnt DESC, term
         |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cnt,
         |  CAST(CAST(sum(cnt) OVER (ORDER BY cnt DESC, term
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS DOUBLE)
         |    / CAST(total AS DOUBLE) AS coverage
         |FROM top CROSS JOIN tot
         |ORDER BY rank""".stripMargin.replace('\n', ' ')
    },
    "t21_domain_mixture" -> {
      val fp = TextAnalysis.fingerprintSql("text")
      """WITH counts AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST('1' AS DOUBLE) /
        |      (CAST('1' AS DOUBLE) + CAST(substr(source, 4) AS INT)) AS w
        |  FROM documents GROUP BY 1),
        |sc AS (SELECT min(CAST(n_docs AS DOUBLE) / w) AS c FROM counts),
        |rates AS (SELECT source, n_docs,
        |    least(CAST('1' AS DOUBLE), c * w / n_docs) AS rate
        |  FROM counts CROSS JOIN sc),
        |kept AS (
        |  SELECT d.source, count(*) AS n_kept
        |  FROM documents d JOIN rates r ON d.source = r.source
        |  WHERE ('0x' || substr(FPEXPR, 1, 4))::INT < r.rate * 65536
        |  GROUP BY 1)
        |SELECT r.source, r.n_docs, r.rate,
        |  coalesce(k.n_kept, 0) AS n_kept
        |FROM rates r LEFT JOIN kept k ON r.source = k.source
        |ORDER BY r.source""".stripMargin.replace('\n', ' ')
        .replace("FPEXPR", fp)
    }
  )
}
