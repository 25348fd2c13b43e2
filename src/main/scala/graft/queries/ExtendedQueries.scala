package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.PipelineQueries.{table, withPipeline}
import graft.text.TextAnalysis

/** Additional large-scale operators rounding out the engine surface:
  * sessionization, pivot, vocabulary statistics, embedding centroids.
  * All oracle-checked. */
object ExtendedQueries {

  /** Sessionization: split each user's event stream at >30 min gaps —
    * the canonical event-log operator. One shuffle (window by user);
    * the running session counter is a cumulative sum over the gap flags. */
  def sessionize(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val gap = col("ts").cast("long") -
      lag(col("ts"), 1).over(byUser).cast("long")
    val isNew = when(gap.isNull || gap > 1800, 1).otherwise(0)
    events
      .withColumn("is_new", isNew)
      .withColumn("session_seq",
        sum(col("is_new")).over(byUser.rowsBetween(
          Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        round(sum(col("value")).cast("double"), 4).as("session_value"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x1_sessionize" -> ((s, d) => {
      val ev = table(s, d, "events")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      sessionize(ev)
        .orderBy("user_id", "session_seq")
    }),
    // groupBy().pivot(): avg standard value per country × pollutant
    "x2_pivot_param" -> ((s, d) => {
      val piv = PipelineQueries.silver(s, d)
        .groupBy(col("country"))
        .pivot("parameter", Seq("pm25", "pm10", "o3", "so2"))
        .agg(round(avg(col("value")), 4))
        .orderBy("country")
      piv
    }),
    // corpus vocabulary: top-20 tokens by document frequency
    "x3_vocab_top20" -> ((s, d) =>
      table(s, d, "documents")
        .select(explode(array_distinct(TextAnalysis.tokens(
          TextAnalysis.normalized(col("text"))))).as("tok"))
        .groupBy(col("tok"))
        .agg(count(lit(1)).as("doc_freq"))
        .orderBy(desc("doc_freq"), col("tok"))
        .limit(20)),
    // per-label embedding centroids via posexplode → avg per dim →
    // reassemble (the k-means building block, fully distributed)
    "x4_label_centroids" -> ((s, d) => {
      val emb = table(s, d, "embeddings")
      emb
        .select(col("label"), posexplode(col("embedding")))
        .groupBy(col("label"), col("pos"))
        .agg(avg(col("col").cast("double")).as("dim_avg"))
        .groupBy(col("label"))
        .agg(
          count(lit(1)).as("n_dims"),
          array_join(
            transform(
              array_sort(collect_list(struct(col("pos"), col("dim_avg")))),
              x => format_string("%.4f", x.getField("dim_avg")))
            , ",").as("centroid"))
        .orderBy("label")
    })
  )

  val oracle: Map[String, String] = Map(
    "x1_sessionize" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
        |  FROM events),
        |flagged AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN epoch(ts) - epoch(lag(ts, 1) OVER w) IS NULL
        |      OR epoch(ts) - epoch(lag(ts, 1) OVER w) > 1800
        |      THEN 1 ELSE 0 END AS is_new
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sessions AS (
        |  SELECT user_id, ts, value,
        |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS session_seq
        |  FROM flagged)
        |SELECT user_id, session_seq, count(*) AS n_events,
        |  min(ts) AS session_start, max(ts) AS session_end,
        |  round(CAST(sum(value) AS DOUBLE), 4) AS session_value
        |FROM sessions GROUP BY 1, 2
        |ORDER BY user_id, session_seq""".stripMargin.replace('\n', ' '),
    "x2_pivot_param" -> withPipeline(
      """SELECT country,
        |  round(avg(value) FILTER (WHERE parameter = 'pm25'), 4) AS pm25,
        |  round(avg(value) FILTER (WHERE parameter = 'pm10'), 4) AS pm10,
        |  round(avg(value) FILTER (WHERE parameter = 'o3'), 4) AS o3,
        |  round(avg(value) FILTER (WHERE parameter = 'so2'), 4) AS so2
        |FROM silver GROUP BY country
        |ORDER BY country""".stripMargin.replace('\n', ' ')),
    "x3_vocab_top20" -> {
      val norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
      s"""SELECT tok, count(*) AS doc_freq FROM (
         |  SELECT unnest(list_distinct(
         |    regexp_split_to_array($norm, '\\s+'))) AS tok
         |  FROM documents)
         |GROUP BY tok ORDER BY doc_freq DESC, tok
         |LIMIT 20""".stripMargin.replace('\n', ' ')
    },
    "x4_label_centroids" ->
      """WITH exploded AS (
        |  SELECT label, generate_subscripts(embedding, 1) - 1 AS pos,
        |    unnest(embedding) AS val
        |  FROM embeddings),
        |dims AS (
        |  SELECT label, pos, avg(CAST(val AS DOUBLE)) AS dim_avg
        |  FROM exploded GROUP BY 1, 2)
        |SELECT label, count(*) AS n_dims,
        |  array_to_string(list(printf('%.4f', dim_avg) ORDER BY pos), ',')
        |    AS centroid
        |FROM dims GROUP BY label
        |ORDER BY label""".stripMargin.replace('\n', ' ')
  )
}
