package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.join.Joins
import graft.queries.PipelineQueries.{eventsTs, table}

/** Harness surface for [[graft.join.Joins]]: as-of join (DuckDB `ASOF
  * JOIN` oracle), broadcast range join, and the salting skew-control path
  * (oracle = the plain equi-join it must be equivalent to). */
object JoinQueries {

  private def events(s: SparkSession, d: String): DataFrame =
    eventsTs(s, d)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // as-of backward: every purchase joined to the user's latest
    // prior-or-simultaneous click (one shuffle; see Joins.asOfBackward)
    "xj1_asof_join" -> ((s, d) => {
      val ev = events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("user_id", "event_id", "ts", "value")
      val clicks = ev.filter(col("event_type") === "click")
        .select("user_id", "ts", "value")
      Joins.asOfBackward(purchases, clicks, Seq("user_id"),
          leftTs = "ts", rightTs = "ts", payload = Seq("ts", "value"))
        .select(col("event_id"), col("user_id"),
          col("ts").as("purchase_ts"), col("value").as("purchase_value"),
          col("asof_ts").as("click_ts"), col("asof_value").as("click_value"))
        .orderBy("event_id")
    }),
    // as-of with 30-day max lookback: stale matches null out, rows kept
    "xj4_asof_tolerance" -> ((s, d) => {
      val ev = events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("user_id", "event_id", "ts")
      val clicks = ev.filter(col("event_type") === "click")
        .select("user_id", "ts", "value")
      Joins.asOfBackward(purchases, clicks, Seq("user_id"),
          leftTs = "ts", rightTs = "ts", payload = Seq("value"),
          toleranceMicros = Some(30L * 86400 * 1000000))
        .select(col("event_id"), col("user_id"),
          col("ts").as("purchase_ts"), col("asof_value").as("click_value"))
        .orderBy("event_id")
    }),
    // broadcast range join: events binned into 20 fixed value bands
    "xj2_range_join" -> ((s, d) => {
      val bands = s.range(0, 20).select(
        col("id").as("band_id"),
        (col("id") * 25).cast("double").as("lo"),
        ((col("id") + 1) * 25).cast("double").as("hi"))
      Joins.rangeJoinBroadcast(events(s, d), bands, "value", "lo", "hi")
        .groupBy(col("band_id"), col("lo"), col("hi"))
        // exact half-away 4-dp average in pure integers (round-8
        // audit: the round(double,4) form hit a genuine inexact tie
        // at sf0.01 — 337.95375 — that any engine could flip)
        .agg(count(lit(1)).as("n_events"),
          expr("(2 * CAST(sum(CAST(value AS DECIMAL(18,2))) * 100" +
            " AS DECIMAL(38,0)) * 100 + count(1))" +
            " div (2 * count(1))").as("avg_value_e4"))
        .orderBy("band_id")
    }),
    // salted skew join ≡ plain equi-join (events.user_id → customer)
    "xj3_salted_join" -> ((s, d) =>
      Joins.saltedEquiJoin(table(s, d, "events"), table(s, d, "customer"),
          factKey = "user_id", dimKey = "c_custkey",
          saltBy = "event_id", salts = 8)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("sum_value"))
        .orderBy("c_mktsegment"))
  )

  val oracle: Map[String, String] = Map(
    "xj1_asof_join" ->
      """WITH l AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |    value FROM events WHERE event_type = 'purchase'),
        |  r AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
        |    FROM events WHERE event_type = 'click')
        |SELECT l.event_id, l.user_id, l.ts AS purchase_ts,
        |  l.value AS purchase_value,
        |  r.ts AS click_ts, r.value AS click_value
        |FROM l ASOF LEFT JOIN r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.event_id""".stripMargin.replace('\n', ' '),
    "xj4_asof_tolerance" ->
      """WITH l AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |    FROM events WHERE event_type = 'purchase'),
        |  r AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
        |    FROM events WHERE event_type = 'click')
        |SELECT l.event_id, l.user_id, l.ts AS purchase_ts,
        |  CASE WHEN epoch_us(l.ts) - epoch_us(r.ts) <= 2592000000000
        |    THEN r.value END AS click_value
        |FROM l ASOF LEFT JOIN r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.event_id""".stripMargin.replace('\n', ' '),
    "xj2_range_join" ->
      """WITH bands AS (SELECT i AS band_id, CAST(i * 25 AS DOUBLE) AS lo,
        |    CAST((i + 1) * 25 AS DOUBLE) AS hi FROM range(0, 20) t(i))
        |SELECT band_id, lo, hi, count(*) AS n_events,
        |  CAST((2 * CAST(sum(CAST(value AS DECIMAL(18,2))) * 100
        |      AS HUGEINT) * 100 + count(*))
        |    // (2 * count(*)) AS BIGINT) AS avg_value_e4
        |FROM events JOIN bands ON value >= lo AND value < hi
        |GROUP BY 1, 2, 3 ORDER BY band_id""".stripMargin.replace('\n', ' '),
    "xj3_salted_join" ->
      """SELECT c_mktsegment, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY 1 ORDER BY c_mktsegment""".stripMargin.replace('\n', ' ')
  )
}
