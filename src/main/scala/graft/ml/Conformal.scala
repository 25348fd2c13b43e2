package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Split-conformal prediction intervals (ml25) — distribution-free
  * uncertainty for any point model (Vovk; Lei et al.): fit on a TRAIN
  * split, score a CALIBRATION split's absolute residuals, take the
  * ⌈(n_cal+1)(1−α)⌉-th smallest as q̂, and every future prediction
  * carries the finite-sample-valid interval [ŷ − q̂, ŷ + q̂] —
  * marginal coverage ≥ 1−α under exchangeability, no distributional
  * assumption. The production eval-stack piece AFTER ml16's
  * calibration: calibrated probabilities say how likely, conformal
  * intervals say how wrong the regressor can be.
  *
  * Construction, fully engine-replayable: the t6 content-hash split
  * (md5 of id — deterministic, outcome-blind) partitions units into
  * train/calibration/test; the base model is 1-feature OLS from
  * exact integer sufficient statistics (the ml15/ml24 closed form);
  * predictions are BIGINT micro-units via sign-safe truncating
  * division; residual magnitudes are exact integer differences; q̂ is
  * an integer RANK-PICK over (|r|, id) — the x79 discipline, no
  * percentile interpolation ambiguity — at
  * k = min(n_cal, ⌈(n_cal+1)(100−a)/100⌉) spelled with ceil-div
  * integer arithmetic; intervals are integer additions. Zero doubles
  * anywhere (round-8 q6/e4 discipline).
  *
  * Scale: one stats aggregate over train, one residual pass, then the
  * calibration rank-pick via [[graft.etl.Ids.withOrderedIds]] — the
  * two-phase range-partitioned rank, so no single-partition WindowExec
  * even when the entity grain is itself huge — and a 1-row q̂
  * broadcast onto the scored slice.
  *
  * [[slice]]/[[sliceSql]] expose one-column projections of the SAME
  * pipeline (ml25c_* harness canaries): every individual construct
  * here is proven driver-green in other queries, so when the full
  * 8-column output hash-diverges on a foreign DuckDB build, the
  * slices localize WHICH column that build computes or canonicalizes
  * differently. */
object Conformal {

  // The ml15/ml24 engine discipline: DuckDB's `//` on DECIMAL
  // operands returns a fractional DOUBLE (lossy past 2^53 — measured
  // off-by-one at this query's ~2e16 numerators), so the DuckDB leg
  // must stay in HUGEINT while Spark uses DECIMAL(38,0) + `div`.
  private case class Engine(big: String => String, divOp: String)
  private val sparkE = Engine(c => s"CAST($c AS DECIMAL(38,0))", "div")
  private val duckE = Engine(c => s"CAST($c AS HUGEINT)", "//")

  private def sdiv(a: String, b: String, e: Engine) =
    s"(CASE WHEN ($a) >= 0 THEN ($a) ${e.divOp} ($b) " +
      s"ELSE -((-($a)) ${e.divOp} ($b)) END)"

  /** Shared SQL fragment: pred_micro over (x, n, sx, syc, sxx, sxyc)
    * columns. */
  private def predMicro(e: Engine): String = {
    import e.big
    val det = s"(${big("n")} * ${big("sxx")} - ${big("sx")} * ${big("sx")})"
    val nb = s"(${big("n")} * ${big("sxyc")} - ${big("sx")} * ${big("syc")})"
    sdiv(
      s"(${big("syc")} * $det + $nb * (${big("n")} * ${big("x")} - " +
        s"${big("sx")})) * 10000",
      s"(${big("n")} * $det)", e)
  }
  private def guard(e: Engine) = {
    import e.big
    val det = s"(${big("n")} * ${big("sxx")} - ${big("sx")} * ${big("sx")})"
    s"$det <> 0"
  }

  /** (id, x, y, yc, split) with the t6 content-hash split:
    * 0,1 = train; 2 = calibration; 3 = test. */
  private def prepare(data: DataFrame, idCol: String, xCol: String,
      yCol: String): DataFrame =
    data.select(col(idCol).as("id"),
      col(xCol).cast("long").as("x"),
      col(yCol).cast("decimal(18,2)").as("y"))
      .withColumn("yc", expr("CAST(y * 100 AS BIGINT)"))
      .withColumn("split", expr(
        "CAST(conv(substring(md5(CAST(id AS STRING)), 1, 12), 16, 10)" +
          " AS BIGINT) % 4"))

  private def trainStats(prep: DataFrame): DataFrame =
    prep.filter(col("split") < 2).agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("yc")).as("syc"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("yc")).as("sxyc"))

  private def scored(prep: DataFrame, split: Int): DataFrame =
    prep.filter(col("split") === split)
      .crossJoin(broadcast(trainStats(prep)))
      .withColumn("pred_micro", expr(
        s"CASE WHEN ${guard(sparkE)} " +
          s"THEN CAST(${predMicro(sparkE)} AS BIGINT) END"))

  /** 1-row (qhat_micro) via the two-phase distributed rank: a fixed-
    * width sort key replays ORDER BY (absr NULLS FIRST, id) — "!"
    * < "0" keeps NULL residuals (singular train design) first, id
    * zero-padded so string order equals numeric order for the
    * non-negative integral ids this pipeline feeds. */
  private def qhat(prep: DataFrame, alphaPct: Int): DataFrame = {
    val cal = scored(prep, 2)
      .withColumn("absr",
        abs(col("yc") * 10000L - col("pred_micro")))
    val ncal = cal.agg(count(lit(1)).as("ncal"))
    val keyed = cal.withColumn("__ok", concat(
      when(col("absr").isNull, lit("!"))
        .otherwise(graft.etl.Ids.fixedWidthKey(col("absr"), 20)),
      graft.etl.Ids.fixedWidthKey(col("id"), 24)))
    graft.etl.Ids.withOrderedIds(keyed, "__ok", idName = "rn")
      .crossJoin(broadcast(ncal))
      // k = min(ncal, ceil((ncal+1)(100-a)/100)), ceil via (x+99) div
      .filter(col("rn") === expr(
        s"least(ncal, ((ncal + 1) * ${100 - alphaPct} + 99) div 100)"))
      .select(col("absr").as("qhat_micro"))
  }

  /** @param data one row per unit: idCol, integral xCol, decimal yCol
    * @param alphaPct miscoverage in percent (10 = 90% intervals)
    * @return test-split rows: (id, x, y_cents, pred_micro, qhat_micro,
    *         lo_micro, hi_micro, covered) ordered by id; `covered` is
    *         BIGINT 1/0 and stays NULL when the prediction itself is
    *         NULL (singular train design) — an unknown interval is
    *         unknown coverage, not "not covered". The observed value
    *         rides out as BIGINT cents (round-8 discipline: no decimal
    *         crosses the engine boundary — the round-10 ml25c_*
    *         canaries fingerprinted the 4-round driver hash-red to
    *         exactly the raw DECIMAL(18,2) passthrough column, with
    *         every integer column green). */
  def intervals(data: DataFrame, idCol: String, xCol: String,
      yCol: String, alphaPct: Int = 10): DataFrame = {
    val prep = prepare(data, idCol, xCol, yCol)
    val cond = col("yc") * 10000L >= col("pred_micro") - col("qhat_micro") &&
      col("yc") * 10000L <= col("pred_micro") + col("qhat_micro")
    scored(prep, 3)
      .crossJoin(broadcast(qhat(prep, alphaPct)))
      .select(col("id"), col("x"), col("yc").as("y_cents"),
        col("pred_micro"),
        col("qhat_micro"),
        (col("pred_micro") - col("qhat_micro")).as("lo_micro"),
        (col("pred_micro") + col("qhat_micro")).as("hi_micro"),
        when(cond, 1L).when(!cond, 0L).as("covered"))
      .orderBy("id")
  }

  /** Column-sliced canaries of the ml25 pipeline (ml25c_*): same
    * splits, same model, same q̂ — one output column each, so a
    * driver-side hash mismatch on [[intervals]] fingerprints to the
    * specific column a foreign DuckDB build disagrees on.
    * `which` ∈ ids | pred | qhat | y | cov. */
  def slice(data: DataFrame, idCol: String, xCol: String,
      yCol: String, which: String, alphaPct: Int = 10): DataFrame = {
    val prep = prepare(data, idCol, xCol, yCol)
    which match {
      case "ids" => prep.filter(col("split") === 3)
        .select(col("id")).orderBy("id")
      case "y" => prep.filter(col("split") === 3)
        .select(col("id"), col("yc").as("y_cents")).orderBy("id")
      case "pred" => scored(prep, 3)
        .select(col("id"), col("pred_micro")).orderBy("id")
      case "qhat" => qhat(prep, alphaPct)
      case "cov" =>
        intervals(data, idCol, xCol, yCol, alphaPct)
          .select(col("id"), col("covered")).orderBy("id")
      case other => throw new IllegalArgumentException(
        s"unknown ml25 slice: $other")
    }
  }

  /** Shared DuckDB CTE prefix (prep/st/sc/cal/qh); unreferenced CTEs
    * cost nothing, so every slice reuses one prefix verbatim — the
    * canaries replay the EXACT production text, not a paraphrase. */
  private def cte(dataRel: String, alphaPct: Int): String =
    s"""WITH prep AS (SELECT id, CAST(x AS BIGINT) AS x, y,
       |    CAST(y * 100 AS BIGINT) AS yc,
       |    CAST(('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 12))
       |      AS BIGINT) % 4 AS split
       |  FROM $dataRel),
       |st AS (SELECT count(*) AS n, sum(x) AS sx, sum(yc) AS syc,
       |    sum(x * x) AS sxx, sum(x * yc) AS sxyc
       |  FROM prep WHERE split < 2),
       |sc AS (SELECT p.*, CASE WHEN ${guard(duckE)}
       |    THEN CAST(${predMicro(duckE)} AS BIGINT) END AS pred_micro
       |  FROM prep p CROSS JOIN st WHERE split IN (2, 3)),
       |cal AS (SELECT abs(yc * 10000 - pred_micro) AS absr,
       |    row_number() OVER (ORDER BY abs(yc * 10000 - pred_micro)
       |      NULLS FIRST, id) AS rn,
       |    count(*) OVER () AS ncal
       |  FROM sc WHERE split = 2),
       |qh AS (SELECT absr AS qhat_micro FROM cal
       |  WHERE rn = least(ncal,
       |    ((ncal + 1) * ${100 - alphaPct} + 99) // 100))""".stripMargin

  /** DuckDB twin; `dataRel` must yield (id, x, y DECIMAL(18,2)). */
  def sql(dataRel: String, alphaPct: Int = 10): String =
    s"""${cte(dataRel, alphaPct)}
       |SELECT id, x, yc AS y_cents, pred_micro, qhat_micro,
       |  pred_micro - qhat_micro AS lo_micro,
       |  pred_micro + qhat_micro AS hi_micro,
       |  CAST(CASE WHEN yc * 10000 >= pred_micro - qhat_micro AND
       |      yc * 10000 <= pred_micro + qhat_micro THEN 1
       |    WHEN NOT (yc * 10000 >= pred_micro - qhat_micro AND
       |      yc * 10000 <= pred_micro + qhat_micro) THEN 0
       |    END AS BIGINT) AS covered
       |FROM sc CROSS JOIN qh
       |WHERE split = 3
       |ORDER BY id""".stripMargin.replace('\n', ' ')

  /** DuckDB twin of [[slice]]. */
  def sliceSql(dataRel: String, which: String,
      alphaPct: Int = 10): String = {
    val tail = which match {
      case "ids" => "SELECT id FROM prep WHERE split = 3 ORDER BY id"
      case "y" =>
        "SELECT id, yc AS y_cents FROM prep WHERE split = 3 ORDER BY id"
      case "pred" =>
        "SELECT id, pred_micro FROM sc WHERE split = 3 ORDER BY id"
      case "qhat" => "SELECT qhat_micro FROM qh"
      case "cov" =>
        """SELECT id,
          |  CAST(CASE WHEN yc * 10000 >= pred_micro - qhat_micro AND
          |      yc * 10000 <= pred_micro + qhat_micro THEN 1
          |    WHEN NOT (yc * 10000 >= pred_micro - qhat_micro AND
          |      yc * 10000 <= pred_micro + qhat_micro) THEN 0
          |    END AS BIGINT) AS covered
          |FROM sc CROSS JOIN qh WHERE split = 3
          |ORDER BY id""".stripMargin
      case other => throw new IllegalArgumentException(
        s"unknown ml25 slice: $other")
    }
    s"${cte(dataRel, alphaPct)}\n$tail".replace('\n', ' ')
  }
}
