package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link prediction over an undirected edge list: score non-adjacent
  * node pairs by their shared neighborhood. */
object LinkPrediction {

  /** Adamic–Adar + common-neighbor scores: candidates are 2-hop pairs
    * (wedges a–z–b) that are NOT directly connected; the score sums
    * 1/ln(deg(z)) over the shared neighbors z, so rare shared
    * neighbors count more than hubs. Each 1/ln term is rounded to 6 dp
    * and summed in DECIMAL (the t5/t16 rule) so the score — and the
    * top-N cut ordered by it — is bit-stable under any partial-sum
    * order. Scale: the wedge join fans out deg(z)² per center, so
    * centers above `maxDegree` are excluded — the standard hub cap in
    * production link prediction (a hub shared by everyone carries ~no
    * signal and its ln-damped term is smallest anyway); the cap is
    * part of the operator contract and the oracle applies it too. */
  def adamicAdar(edges: DataFrame, topN: Int = 25, maxDegree: Int = 50)
      : DataFrame = {
    val pairs = edges
      .select(least(col("src"), col("dst")).as("pa"),
        greatest(col("src"), col("dst")).as("pb"))
      .filter(col("pa") =!= col("pb")).distinct()
      .localCheckpoint()
    val sym = pairs.select(col("pa").as("src"), col("pb").as("dst"))
      .unionAll(pairs.select(col("pb").as("src"), col("pa").as("dst")))
    // deg >= 2: a wedge center always has two distinct neighbors, and
    // the bound keeps ANSI mode from evaluating 1/ln(1) on leaf nodes
    val deg = sym.groupBy(col("src").as("z"))
      .agg(count(lit(1)).as("deg"))
      .filter(col("deg") >= 2 && col("deg") <= maxDegree)
      .withColumn("term",
        round(lit(1.0) / log(col("deg").cast("double")), 6)
          .cast("decimal(18,6)"))
    val wedges = sym.select(col("dst").as("z"), col("src").as("a"))
      .join(sym.select(col("src").as("z"), col("dst").as("b")), "z")
      .filter(col("a") < col("b"))
      .join(deg, "z")
    wedges
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("common_neighbors"),
        sum(col("term")).as("aa_d"))
      .join(pairs, col("a") === col("pa") && col("b") === col("pb"),
        "left_anti")
      .select(col("a"), col("b"), col("common_neighbors"),
        col("aa_d").cast("double").as("adamic_adar"))
      .orderBy(desc("adamic_adar"), col("a"), col("b"))
      .limit(topN)
  }

  /** DuckDB twin of [[adamicAdar]]. `edgesSql` must yield (src, dst). */
  def adamicAdarSql(edgesSql: String, topN: Int = 25,
      maxDegree: Int = 50): String =
    s"""WITH pairs AS (
       |  SELECT DISTINCT least(src, dst) AS pa, greatest(src, dst) AS pb
       |  FROM $edgesSql WHERE src <> dst),
       |sym AS (SELECT pa AS src, pb AS dst FROM pairs
       |  UNION ALL SELECT pb, pa FROM pairs),
       |deg AS (SELECT src AS z, count(*) AS deg FROM sym GROUP BY 1),
       |ctr AS (SELECT z,
       |    CAST(round(CAST('1' AS DOUBLE) / ln(CAST(deg AS DOUBLE)), 6)
       |      AS DECIMAL(18,6)) AS term
       |  FROM deg WHERE deg >= 2 AND deg <= $maxDegree),
       |wedge AS (
       |  SELECT e1.src AS a, e1.dst AS z, e2.dst AS b
       |  FROM sym e1 JOIN sym e2 ON e1.dst = e2.src
       |  WHERE e1.src < e2.dst),
       |scored AS (
       |  SELECT a, b, count(*) AS common_neighbors,
       |    sum(term) AS aa_d
       |  FROM wedge JOIN ctr USING (z) GROUP BY 1, 2)
       |SELECT a, b, CAST(common_neighbors AS BIGINT) AS common_neighbors,
       |  CAST(aa_d AS DOUBLE) AS adamic_adar
       |FROM scored s
       |WHERE NOT EXISTS (SELECT 1 FROM pairs p
       |  WHERE p.pa = s.a AND p.pb = s.b)
       |ORDER BY adamic_adar DESC, a, b LIMIT $topN""".stripMargin
      .replace('\n', ' ')
}
