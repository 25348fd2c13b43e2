package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Markov-chain attribution with removal effects (x72) — the
  * data-driven alternative to the positional heuristics (x45 linear,
  * x61 time-decay): model user journeys as a first-order chain over
  * channels with absorbing CONV/NULL states, compute the absorbing
  * conversion probability from START, and credit each channel by its
  * REMOVAL EFFECT — how much conversion drops when every passage
  * through that channel is redirected to NULL (Anderl et al. 2014).
  *
  * Determinism: the transition matrix is exact integer counts; rates
  * quantize once to 1e-9 fixed-point units (q = c·10⁹ div out) and
  * the absorbing fixed-point iterates in PURE INTEGER arithmetic
  * (p' = Σ q·p div 10⁹ — the g1 PageRank discipline), so after the
  * fixed iteration budget both engines hold bit-identical
  * probabilities; all operands stay non-negative, where Scala's
  * truncating / and DuckDB's flooring // agree. The removal run pins
  * the removed channel's probability to 0 wherever it appears as an
  * input — monotone, so effects are never negative.
  *
  * Scale: the corpus contributes the per-user ordered-path pass (one
  * window partitioned by user) reduced to the (state, state) →
  * count grain — a ≤(channels+1)² table. The fixed-point runs on
  * that metadata-sized matrix: engine-side it is a driver loop over
  * the COLLECTED counts (the documented cms1-class metadata collect —
  * at 100 TB the matrix is still ~30 rows), oracle-side the identical
  * iterations unroll as CTEs. */
object MarkovAttribution {

  private val U = 1000000000L
  val Start = "_start"
  val Conv  = "_conv"
  val Null_ = "_null"

  /** Transition rows (s, t) per user journey: START → first pre-
    * conversion event, each pre-conversion event → its successor,
    * last → CONV (converters, at the FIRST purchase) or NULL.
    * Events after the first conversion are outside the journey. */
  def transitions(events: DataFrame, convType: String,
      usCol: String = "us", userCol: String = "user_id",
      typeCol: String = "event_type",
      idCol: String = "event_id"): DataFrame = {
    val fp = events.filter(col(typeCol) === convType)
      .groupBy(col(userCol).as("fu"))
      .agg(min(struct(col(usCol), col(idCol))).as("f"))
      .select(col("fu"), col("f").getField(usCol).as("fus"),
        col("f").getField(idCol).as("fid"))
    val joined = events.join(fp, col(userCol) === col("fu"), "left")
    val pre = joined.filter(col("fus").isNull ||
      col(usCol) < col("fus") ||
      (col(usCol) === col("fus") && col(idCol) < col("fid")))
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(usCol), col(idCol))
    val steps = pre
      .withColumn("nxt", lead(col(typeCol), 1).over(w))
      .withColumn("rn", row_number().over(w))
    val body = steps.select(col(typeCol).as("s"),
      coalesce(col("nxt"),
        when(col("fus").isNotNull, lit(Conv)).otherwise(lit(Null_)))
        .as("t"))
    val starts = steps.filter(col("rn") === 1)
      .select(lit(Start).as("s"), col(typeCol).as("t"))
    // converters whose FIRST event is the conversion: empty journey
    val instant = fp.join(
      steps.filter(col("rn") === 1)
        .select(col(userCol).as("su")),
      col("fu") === col("su"), "left_anti")
      .select(lit(Start).as("s"), lit(Conv).as("t"))
    body.unionAll(starts).unionAll(instant)
  }

  /** Integer fixed-point absorbing probability from START, with
    * `removed` (if any) pinned to 0 as an input. `q` maps
    * (s, t) → 1e-9-unit rate; `states` = transient states. */
  private def absorb(states: Seq[String],
      q: Map[(String, String), Long], iters: Int,
      removed: Option[String]): Map[String, Long] = {
    var p = states.map(_ -> 0L).toMap
    def read(t: String): Long = t match {
      case Conv => U
      case Null_ => 0L
      case s if removed.contains(s) => 0L
      case s => p.getOrElse(s, 0L)
    }
    for (_ <- 1 to iters) {
      p = states.map { s =>
        val acc = q.collect { case ((`s`, t), r) => r * read(t) }.sum
        s -> acc / U
      }.toMap
    }
    p
  }

  /** @return one row per channel: (channel, base_units,
    *         removed_units, removal_effect, attribution) */
  def removalEffects(events: DataFrame, channels: Seq[String],
      convType: String = "purchase", iters: Int = 20,
      usCol: String = "us"): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val tr = transitions(events, convType, usCol)
      .groupBy(col("s"), col("t")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2)))
    val out = tr.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val q = tr.map { case (s, t, c) => (s, t) -> c * U / out(s) }.toMap
    val states = Start +: channels
    val base = absorb(states, q, iters, None)(Start)
    val removedP = channels.map(ch =>
      ch -> absorb(states, q, iters, Some(ch))(Start)).toMap
    val totalDrop = channels.map(ch => base - removedP(ch)).sum
    def r6(x: Double): Double =
      BigDecimal.valueOf(x)
        .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP)
        .doubleValue
    channels.sorted.map { ch =>
      val rem = removedP(ch)
      (ch, base, rem,
        if (base > 0) Some(r6((base - rem).toDouble / base.toDouble))
        else None,
        if (totalDrop > 0)
          Some(r6((base - rem).toDouble / totalDrop.toDouble))
        else None)
    }.toDF("channel", "base_units", "removed_units",
      "removal_effect", "attribution")
  }

  /** DuckDB twin: identical journey build, rate quantization, and
    * unrolled integer fixed-point (base run + one per channel). */
  def removalEffectsSql(channels: Seq[String],
      convType: String = "purchase", iters: Int = 20,
      eventsRel: String =
        "(SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events)")
      : String = {
    // first conversion = min us, min event_id among its ties —
    // two-step arg-min, equal to Spark's lexicographic struct min
    val pre2 =
      s"""ev AS MATERIALIZED (SELECT * FROM $eventsRel),
         |fp0 AS (SELECT user_id AS fu, min(us) AS fus FROM ev
         |  WHERE event_type = '$convType' GROUP BY 1),
         |fp2 AS MATERIALIZED (SELECT fu, fus,
         |    min(event_id) AS fid
         |  FROM ev JOIN fp0 ON user_id = fu AND us = fus
         |  WHERE event_type = '$convType' GROUP BY 1, 2),
         |pre AS MATERIALIZED (SELECT e.*, f.fus FROM ev e
         |  LEFT JOIN fp2 f ON e.user_id = f.fu
         |  WHERE f.fus IS NULL OR e.us < f.fus
         |    OR (e.us = f.fus AND e.event_id < f.fid)),
         |steps AS MATERIALIZED (SELECT user_id, event_type, fus,
         |    lead(event_type) OVER w AS nxt,
         |    row_number() OVER w AS rn
         |  FROM pre
         |  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
         |trans AS (
         |  SELECT event_type AS s,
         |    coalesce(nxt, CASE WHEN fus IS NOT NULL THEN '$Conv'
         |      ELSE '$Null_' END) AS t
         |  FROM steps
         |  UNION ALL
         |  SELECT '$Start', event_type FROM steps WHERE rn = 1
         |  UNION ALL
         |  SELECT '$Start', '$Conv' FROM fp2
         |  WHERE fu NOT IN (SELECT user_id FROM steps WHERE rn = 1)),
         |tr AS MATERIALIZED (SELECT s, t, count(*) AS c FROM trans
         |  GROUP BY 1, 2),
         |outs AS MATERIALIZED (SELECT s, CAST(sum(c) AS BIGINT) AS o
         |  FROM tr GROUP BY 1),
         |q AS MATERIALIZED (SELECT tr.s, tr.t,
         |    CAST(tr.c * $U // o.o AS BIGINT) AS q
         |  FROM tr JOIN outs o ON tr.s = o.s),
         |st AS MATERIALIZED (SELECT s FROM outs)"""
        .stripMargin.replace('\n', ' ')
    def run(tag: String, removed: Option[String]): String = {
      val mask = removed match {
        case Some(x) =>
          s"CASE WHEN q.t = '$x' THEN 0 ELSE pa.p END"
        case None => "pa.p"
      }
      val zero =
        s"p${tag}_0 AS (SELECT s, CAST(0 AS BIGINT) AS p FROM st)"
      val its = (1 to iters).map { k =>
        s"""p${tag}_$k AS MATERIALIZED (
           |  SELECT st.s, CAST(coalesce(sum(q.q * ($mask)), 0) // $U
           |    AS BIGINT) AS p
           |  FROM st
           |  LEFT JOIN q ON q.s = st.s
           |  LEFT JOIN (SELECT s, p FROM p${tag}_${k - 1}
           |    UNION ALL SELECT '$Conv', $U
           |    UNION ALL SELECT '$Null_', 0) pa ON pa.s = q.t
           |  GROUP BY st.s)""".stripMargin.replace('\n', ' ')
      }
      (zero +: its).mkString(", ")
    }
    val runs = (run("b", None) +: channels.zipWithIndex.map {
      case (ch, i) => run(s"r$i", Some(ch))
    }).mkString(", ")
    val arms = channels.sorted.map { ch =>
      val i = channels.indexOf(ch)
      s"""SELECT '$ch' AS channel,
         |  (SELECT p FROM pb_$iters WHERE s = '$Start') AS base_units,
         |  (SELECT p FROM pr${i}_$iters WHERE s = '$Start')
         |    AS removed_units""".stripMargin.replace('\n', ' ')
    }.mkString(" UNION ALL ")
    val drops = channels.indices.map(i =>
      s"(SELECT p FROM pb_$iters WHERE s = '$Start') - " +
        s"(SELECT p FROM pr${i}_$iters WHERE s = '$Start')")
      .mkString(" + ")
    s"""WITH $pre2, $runs,
       |res AS ($arms),
       |tot AS (SELECT $drops AS total_drop)
       |SELECT channel, base_units, removed_units,
       |  CASE WHEN base_units > 0 THEN
       |    round(CAST(base_units - removed_units AS DOUBLE)
       |      / CAST(base_units AS DOUBLE), 6) END AS removal_effect,
       |  CASE WHEN total_drop > 0 THEN
       |    round(CAST(base_units - removed_units AS DOUBLE)
       |      / CAST(total_drop AS DOUBLE), 6) END AS attribution
       |FROM res CROSS JOIN tot ORDER BY channel"""
      .stripMargin.replace('\n', ' ')
  }
}
