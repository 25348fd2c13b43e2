package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ENGINE-PORTABLE sketches (a3p / cms1p): the HyperLogLog and
  * count-min algorithms under the md5-prefix hash family with the
  * sketch STATE itself exact-integer, so a DuckDB oracle replays
  * registers / tables / estimates bit-for-bit — the d17 pattern
  * applied to the sketch family. The production paths stay what they
  * are (a3's Spark-native approx_count_distinct HLL++, cms1's typed
  * CountMin Aggregator over xxhash64 — both faster); these rows give
  * the sketch ALGORITHMS oracle evidence instead of only
  * measured-property checks.
  *
  * HLL portability: register index = h mod m, rho = trailing-zero
  * rank of (h div m) + 1 (pure integer; the HyperBall convention).
  * The estimator's Σ 2^−rho is made integer by scaling with 2^43
  * (rho ≤ 43 ⇒ every term is an exact BIGINT), and the raw estimate
  * α·m²/ΣZ is emitted as an exact integral division — no float, no
  * ln, ever crosses the engine boundary. (The small-range
  * linear-counting CORRECTION needs ln and engines' libm ulps differ,
  * so the row emits the RAW estimator + the full register state; the
  * corrected presentation value is derivable from either engine's
  * state and is pinned in ScalaTest instead.)
  *
  * Count-min portability: row-r hash = md5₄₈("r:" ∥ key) mod w; the
  * d×w table is plain counts; the point estimate is the min over the
  * d home cells. All integers end to end. */
object PortableSketch {

  private val M = 64          // HLL registers (p = 6)
  private val MaxRho = 43     // 48 hash bits − 6 index bits + 1
  private val Pow243 = 8796093022208L // 2^43

  /** Per-group portable-HLL distinct estimate of `valueCol`:
    * (group, nreg, zscaled, est_e2) where nreg = occupied registers,
    * zscaled = Σ 2^(43−rho) over them (the exact register state, a
    * checksum any engine reproduces), and est_e2 = raw HLL estimate
    * α₆₄·m²/(ΣZ) in 0.01 units via exact integral division. */
  def hllDistinct(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val regs = df
      .select(col(groupCol).as("g"),
        expr(s"CAST(conv(substring(md5(CAST($valueCol AS STRING)), " +
          "1, 12), 16, 10) AS BIGINT)").as("h"))
      .select(col("g"), expr(s"CAST(h % $M AS INT)").as("idx"),
        expr(s"CAST(CASE WHEN h div $M = 0 THEN $MaxRho ELSE " +
          s"bit_count(((h div $M) & -(h div $M)) - 1) + 1 END AS INT)")
          .as("rho"))
      .groupBy(col("g"), col("idx"))
      .agg(max(col("rho")).as("rho"))
    regs
      .groupBy(col("g"))
      .agg(count(lit(1)).as("nreg"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $MaxRho - rho)"))
          .as("zscaled"))
      // denom in 2^-43 units includes one unit per EMPTY register;
      // α₆₄ = 0.709 = 709/1000, so est·100 = 709·m²·2^43 div
      // (10·denom) — numerator ≈ 2.55e19 rides DECIMAL(38,0), the
      // quotient is ≤ 2.55e18 (denom ≥ 1) and always fits BIGINT
      .select(col("g").as(groupCol), col("nreg"), col("zscaled"),
        expr(s"CAST((CAST(709 AS DECIMAL(38,0)) * ${M.toLong * M} * " +
          s"$Pow243) div (10 * (zscaled + ($M - nreg) * $Pow243)) " +
          "AS BIGINT)").as("est_e2"))
  }

  /** DuckDB twin of [[hllDistinct]]; `rel` yields (groupCol,
    * valueCol). */
  def hllDistinctSql(rel: String, groupCol: String,
      valueCol: String): String =
    s"""WITH src AS (SELECT $groupCol AS g, $valueCol AS v FROM $rel),
       |h AS (SELECT g, CAST(('0x' || substr(md5(CAST(v AS VARCHAR)),
       |    1, 12)) AS BIGINT) AS h FROM src),
       |r AS (SELECT g, CAST(h % $M AS INT) AS idx,
       |    CAST(CASE WHEN h // $M = 0 THEN $MaxRho ELSE
       |      bit_count(((h // $M) & -(h // $M)) - 1) + 1 END AS INT)
       |      AS rho
       |  FROM h),
       |mx AS (SELECT g, idx, max(rho) AS rho FROM r GROUP BY 1, 2),
       |st AS (SELECT g, count(*) AS nreg,
       |    sum(CAST(1 AS BIGINT) << ($MaxRho - rho)) AS zscaled
       |  FROM mx GROUP BY 1)
       |SELECT g AS $groupCol, nreg, CAST(zscaled AS BIGINT) AS zscaled,
       |  CAST(CAST(709 AS HUGEINT) * ${M.toLong * M} * $Pow243 //
       |    (10 * (CAST(zscaled AS HUGEINT) + ($M - nreg) * $Pow243))
       |    AS BIGINT) AS est_e2
       |FROM st ORDER BY $groupCol""".stripMargin.replace('\n', ' ')

  /** Portable count-min point estimates for every distinct key:
    * (key, est_n, exact_n) with est_n = min over the d rows of the
    * key's home-cell count. est_n ≥ exact_n always (the CM
    * guarantee, pinned in spec); both engines fill the identical
    * d×w table. */
  def cmsEstimates(df: DataFrame, keyCol: String, d: Int = 4,
      w: Int = 256): DataFrame = {
    val hashed = df
      .select(col(keyCol).as("k"),
        explode(array((0 until d).map(lit): _*)).as("r"))
      .withColumn("c", expr(
        s"CAST(conv(substring(md5(concat(CAST(r AS STRING), ':', " +
          s"CAST(k AS STRING))), 1, 12), 16, 10) AS BIGINT) % $w"))
    val tab = hashed.groupBy(col("r"), col("c"))
      .agg(count(lit(1)).as("n"))
    val keys = df.select(col(keyCol).as("k")).distinct()
      .select(col("k"), explode(array((0 until d).map(lit): _*)).as("r"))
      .withColumn("c", expr(
        s"CAST(conv(substring(md5(concat(CAST(r AS STRING), ':', " +
          s"CAST(k AS STRING))), 1, 12), 16, 10) AS BIGINT) % $w"))
    val est = keys.join(tab, Seq("r", "c"))
      .groupBy(col("k"))
      .agg(min(col("n")).as("est_n"))
    val exact = df.groupBy(col(keyCol).as("k"))
      .agg(count(lit(1)).as("exact_n"))
    est.join(exact, Seq("k"))
      .select(col("k").as(keyCol), col("est_n"), col("exact_n"))
  }

  /** Portable Bloom semi-join statistics: build a `bits`-wide filter
    * over `buildKeys` (k md5 positions per key; the filter IS the
    * distinct-position set — engine-replayable, unlike a packed
    * xxhash word array), probe every distinct `probeCol` key, and
    * report the key-level truth table: a probe passes iff ALL k of
    * its positions are set; pass ⊇ exact (no false negatives — the
    * Bloom guarantee, spec-pinned), and n_fp is the measured
    * false-positive cost. One summary row of exact BIGINTs.
    *
    * Scale shape: the position set is ≤ k·|build| rows (dim-sized —
    * this is a dim→fact pruning filter), the probe explodes distinct
    * fact keys ×k and left-joins the broadcast position set; fact
    * ROWS never explode. */
  def bloomStats(build: DataFrame, buildKeyCol: String,
      probe: DataFrame, probeKeyCol: String, k: Int = 5,
      bits: Int = 16384): DataFrame = {
    def positions(df: DataFrame, keyCol: String): DataFrame = df
      .select(col(keyCol).cast("long").as("key"))
      .distinct()
      .select(col("key"),
        explode(array((0 until k).map(lit): _*)).as("i"))
      .withColumn("p", expr(
        s"CAST(conv(substring(md5(concat(CAST(i AS STRING), ':', " +
          s"CAST(key AS STRING))), 1, 12), 16, 10) AS BIGINT) % $bits"))
    val set = positions(build, buildKeyCol)
      .select(col("p")).distinct()
      .withColumn("hit", lit(1L))
    val passKeys = positions(probe, probeKeyCol)
      .join(broadcast(set), Seq("p"), "left")
      .groupBy(col("key"))
      .agg((sum(coalesce(col("hit"), lit(0L))) === k).as("pass"))
    val exactKeys = build.select(col(buildKeyCol).cast("long")
      .as("key")).distinct().withColumn("ex", lit(true))
    passKeys
      .join(broadcast(exactKeys), Seq("key"), "left")
      .select(col("pass"), coalesce(col("ex"), lit(false)).as("ex"))
      .agg(count(lit(1)).as("n_keys"),
        sum(when(col("pass"), 1L).otherwise(0L)).as("n_pass"),
        sum(when(col("ex"), 1L).otherwise(0L)).as("n_exact"),
        sum(when(col("pass") && !col("ex"), 1L).otherwise(0L))
          .as("n_fp"))
  }

  /** DuckDB twin of [[bloomStats]]; `buildRel`/`probeRel` yield the
    * respective key columns. */
  def bloomStatsSql(buildRel: String, buildKeyCol: String,
      probeRel: String, probeKeyCol: String, k: Int = 5,
      bits: Int = 16384): String = {
    def cell(key: String) = s"CAST(('0x' || substr(md5(CAST(i.x AS " +
      s"VARCHAR) || ':' || CAST($key AS VARCHAR)), 1, 12)) AS BIGINT)" +
      s" % $bits"
    s"""WITH bk AS (SELECT DISTINCT CAST($buildKeyCol AS BIGINT)
       |    AS key FROM $buildRel),
       |pos AS (SELECT DISTINCT ${cell("bk.key")} AS p
       |  FROM bk, generate_series(0, ${k - 1}) i(x)),
       |pk AS (SELECT DISTINCT CAST($probeKeyCol AS BIGINT) AS key
       |  FROM $probeRel),
       |ph AS (SELECT pk.key,
       |    sum(CASE WHEN pos.p IS NOT NULL THEN 1 ELSE 0 END) AS hits
       |  FROM (SELECT pk.key, ${cell("pk.key")} AS p
       |    FROM pk, generate_series(0, ${k - 1}) i(x)) pk
       |  LEFT JOIN pos ON pos.p = pk.p
       |  GROUP BY 1),
       |tt AS (SELECT ph.key, ph.hits = $k AS pass,
       |    bk.key IS NOT NULL AS ex
       |  FROM ph LEFT JOIN bk ON bk.key = ph.key)
       |SELECT count(*) AS n_keys,
       |  CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_pass,
       |  CAST(sum(CASE WHEN ex THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_exact,
       |  CAST(sum(CASE WHEN pass AND NOT ex THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_fp
       |FROM tt""".stripMargin.replace('\n', ' ')
  }

  /** DuckDB twin of [[cmsEstimates]]. */
  def cmsEstimatesSql(rel: String, keyCol: String, d: Int = 4,
      w: Int = 256): String = {
    val cell = s"CAST(('0x' || substr(md5(CAST(r.x AS VARCHAR) || " +
      s"':' || CAST(k AS VARCHAR)), 1, 12)) AS BIGINT) % $w"
    s"""WITH src AS (SELECT $keyCol AS k FROM $rel),
       |rows_h AS (SELECT k, CAST(r.x AS INT) AS r, $cell AS c
       |  FROM src, generate_series(0, ${d - 1}) r(x)),
       |tab AS (SELECT r, c, count(*) AS n FROM rows_h GROUP BY 1, 2),
       |keys AS (SELECT DISTINCT k FROM src),
       |kh AS (SELECT k, CAST(r.x AS INT) AS r, $cell AS c
       |  FROM keys, generate_series(0, ${d - 1}) r(x)),
       |est AS (SELECT kh.k, min(t.n) AS est_n
       |  FROM kh JOIN tab t ON t.r = kh.r AND t.c = kh.c
       |  GROUP BY 1),
       |ex AS (SELECT k, count(*) AS exact_n FROM src GROUP BY 1)
       |SELECT e.k AS $keyCol, CAST(e.est_n AS BIGINT) AS est_n,
       |  CAST(x.exact_n AS BIGINT) AS exact_n
       |FROM est e JOIN ex x ON x.k = e.k
       |ORDER BY $keyCol""".stripMargin.replace('\n', ' ')
  }
}
