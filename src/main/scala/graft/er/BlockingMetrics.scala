package graft.er

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocking-quality metrics (er5) — the evaluation step that decides
  * which blocking scheme an entity-resolution pipeline ships: for
  * each candidate scheme, PAIR COMPLETENESS (what fraction of true
  * matches survive into the candidate set — blocking recall) against
  * REDUCTION RATIO (what fraction of the full cross product the
  * scheme avoids scoring). The er1/er2/er3 matchers all assume their
  * blocking key keeps the true match reachable; this operator
  * measures that assumption instead of trusting it.
  *
  * Scale design: the candidate count is NEVER materialized as pairs —
  * each side reduces to its (block key → count) table and the pair
  * count is Σ_k n_dirty(k)·n_clean(k), a key-grain join of two
  * partially-aggregated tables (the blow-up a bad scheme would cause
  * is exactly what this report warns about, so the report itself must
  * not pay it). Coverage joins only on (block key, true id) — a
  * semi-join-shaped probe bounded by the dirty side. Per scheme: two
  * scan-speed aggregates + one key-grain join; the report is
  * |schemes| rows.
  *
  * Determinism: every statistic is an exact BIGINT count; the two
  * ratios are single divisions of exact operands rounded to 6 dp —
  * identical in the DuckDB twin. */
object BlockingMetrics {

  /** Ground truth is positional: a dirty record's true entity is the
    * clean record with the same id (the er1 planted construction).
    *
    * @param schemes (name, dirtyKeyExpr, cleanKeyExpr) blocking
    *                candidates, evaluated per scheme */
  def report(dirty: DataFrame, clean: DataFrame,
      schemes: Seq[(String, Column, Column)],
      dirtyId: String = "d_key",
      cleanId: String = "c_custkey"): DataFrame = {
    require(schemes.nonEmpty, "at least one blocking scheme required")
    val totals = dirty.agg(count(lit(1)).as("n_dirty"))
      .crossJoin(clean.agg(count(lit(1)).as("n_clean")))
    schemes.map { case (name, dKey, cKey) =>
      val kd = dirty.select(col(dirtyId).as("d_id"), dKey.as("bk"))
      val kc = clean.select(col(cleanId).as("c_id"), cKey.as("bk"))
      val cand = kd.groupBy(col("bk")).agg(count(lit(1)).as("nd"))
        .join(kc.groupBy(col("bk")).agg(count(lit(1)).as("nc")), "bk")
        .agg(coalesce(sum(col("nd") * col("nc")), lit(0L))
          .as("n_candidates"))
      val covered = kd.join(kc,
        kd("bk") === kc("bk") && kd("d_id") === kc("c_id"))
        .agg(countDistinct(col("d_id")).as("n_covered"))
      cand.crossJoin(covered).crossJoin(broadcast(totals))
        .select(lit(name).as("scheme"), col("n_dirty"),
          col("n_candidates"), (col("n_dirty") * col("n_clean"))
            .as("n_possible"),
          col("n_covered"),
          round(col("n_covered").cast("double") /
            col("n_dirty").cast("double"), 6).as("pair_completeness"),
          round(lit(1.0) - col("n_candidates").cast("double") /
            (col("n_dirty") * col("n_clean")).cast("double"), 6)
            .as("reduction_ratio"))
    }.reduce(_.unionByName(_))
  }

  /** DuckDB twin; schemes are (name, dirtyKeySql, cleanKeySql) over
    * the raw relations' columns — each key is computed ONCE per side
    * in the materialized CTE, so the per-scheme arms only reference
    * plain `bk<i>` columns. */
  def reportSql(dirtyRel: String, cleanRel: String,
      schemes: Seq[(String, String, String)],
      dirtyId: String = "d_key",
      cleanId: String = "c_custkey"): String = {
    val dCols = schemes.zipWithIndex
      .map { case ((_, dk, _), i) => s"$dk AS bk$i" }.mkString(", ")
    val cCols = schemes.zipWithIndex
      .map { case ((_, _, ck), i) => s"$ck AS bk$i" }.mkString(", ")
    val arms = schemes.zipWithIndex.map { case ((name, _, _), i) =>
      val candSub =
        s"""coalesce((SELECT CAST(sum(nd * nc) AS BIGINT) FROM
           |  (SELECT bk$i AS bk, count(*) AS nd FROM d GROUP BY 1) x
           |  JOIN (SELECT bk$i AS bk, count(*) AS nc FROM c
           |    GROUP BY 1) y USING (bk)), 0)"""
          .stripMargin.replace('\n', ' ')
      val covSub =
        s"""(SELECT count(DISTINCT dd.$dirtyId) FROM d dd JOIN c cc
           |  ON dd.bk$i = cc.bk$i AND dd.$dirtyId = cc.$cleanId)"""
          .stripMargin.replace('\n', ' ')
      s"""SELECT '$name' AS scheme,
         |  (SELECT count(*) FROM d) AS n_dirty,
         |  $candSub AS n_candidates,
         |  (SELECT count(*) FROM d) * (SELECT count(*) FROM c)
         |    AS n_possible,
         |  $covSub AS n_covered,
         |  round(CAST($covSub AS DOUBLE)
         |    / CAST((SELECT count(*) FROM d) AS DOUBLE), 6)
         |    AS pair_completeness,
         |  round(CAST('1' AS DOUBLE) - CAST($candSub AS DOUBLE)
         |    / CAST((SELECT count(*) FROM d)
         |      * (SELECT count(*) FROM c) AS DOUBLE), 6)
         |    AS reduction_ratio""".stripMargin.replace('\n', ' ')
    }.mkString(" UNION ALL ")
    s"WITH d AS MATERIALIZED (SELECT *, $dCols FROM $dirtyRel dr), " +
      s"c AS MATERIALIZED (SELECT *, $cCols FROM $cleanRel cr) $arms"
  }
}
