package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PCA, top principal component by POWER ITERATION (ml18)
  * — the dimensionality-reduction / whitening primitive ANN and
  * embedding pipelines run before indexing (sim2/sim6/sim8 all
  * consume raw vectors; this is the op that would rotate them). The
  * full eigendecomposition never touches the corpus: PCA at scale is
  * always "reduce to the d×d covariance, iterate on the tiny matrix".
  *
  * Stage shape (the 100 TB story):
  *  1. ONE corpus pass builds the d² second-moment sums and the d
  *     column sums — n·d² products reduced by partial aggregation to
  *     a d²-row table (d = 64 → 4096 rows, metadata at any SF);
  *  2. the covariance matrix C_ij = S_ij/n − μ_i μ_j materializes
  *     once (localCheckpoint) — everything after runs on ≤ d² rows;
  *  3. 20 power iterations v ← C·v/‖C·v‖ on d-row frames, each one
  *     broadcast-join + aggregate; ‖C·v‖ of the final iterate IS the
  *     dominant eigenvalue; explained share = λ / trace(C).
  *
  * Cross-engine determinism (the x72/t27 discipline, floating-point
  * edition): every sum that a parallel engine could reorder runs over
  * terms ROUNDED once to a fixed scale and summed in DECIMAL — the
  * moment sums (12 dp), the mat-vec products (12 dp), the norm
  * squares (12 dp), the trace (9 dp via exact decimal cast of the
  * already-9dp matrix); the iterate re-QUANTIZES to 9 dp after each
  * normalize, so both engines walk bit-identical states for all 20
  * iterations and agree on every output digit. The start vector
  * 1/√d = 0.125 is exactly representable. Sign convention is whatever
  * the iteration converges to from that start — deterministic. */
object Pca {

  /** @return one row per dimension: (dim, v, lambda, explained_share)
    *         — the unit top component, its eigenvalue, and λ/tr(C). */
  def topComponent(emb: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", dims: Int = 64,
      iters: Int = 20): DataFrame = {
    val spark = emb.sparkSession
    val x = emb
      .select(col(idCol).as("vid"), posexplode(col(vecCol)))
      .select(col("vid"), (col("pos") + 1).as("i"),
        round(col("col").cast("double"), 12).as("xi"))
    val s1 = x.groupBy(col("i"))
      .agg(sum(col("xi").cast("decimal(38,12)")).as("si"))
    val sp = x.select(col("vid"), col("i"), col("xi"))
      .join(x.select(col("vid"), col("i").as("j"), col("xi").as("xj")),
        Seq("vid"))
      .groupBy(col("i"), col("j"))
      .agg(sum(round(col("xi") * col("xj"), 12).cast("decimal(38,12)"))
        .as("sij"))
    val n = emb.agg(count(lit(1)).as("n"))
    val m = sp
      .join(broadcast(s1), Seq("i"))
      .join(broadcast(s1.select(col("i").as("j"), col("si").as("sj"))),
        Seq("j"))
      .crossJoin(broadcast(n))
      .select(col("i"), col("j"), round(
        col("sij").cast("double") / col("n") -
          (col("si").cast("double") / col("n")) *
          (col("sj").cast("double") / col("n")), 9).as("m"))
      .localCheckpoint() // d² rows; the corpus contributed one pass
    var v = spark.range(1, dims + 1)
      .select(col("id").as("j"), lit(0.125).as("vj"))
      .localCheckpoint()
    var nr: DataFrame = null
    for (_ <- 1 to iters) {
      val w = m.join(broadcast(v), Seq("j"))
        .groupBy(col("i"))
        .agg(sum(round(col("m") * col("vj"), 12).cast("decimal(38,12)"))
          .as("w"))
        .select(col("i").as("j"), col("w"))
        .localCheckpoint()
      nr = w.agg(sqrt(sum(
        round(col("w").cast("double") * col("w").cast("double"), 12)
          .cast("decimal(38,12)")).cast("double")).as("nr"))
        .localCheckpoint()
      v = w.crossJoin(broadcast(nr))
        .select(col("j"),
          round(col("w").cast("double") / col("nr"), 9).as("vj"))
        .localCheckpoint()
    }
    val trace = m.filter(col("i") === col("j"))
      .agg(sum(col("m").cast("decimal(38,9)")).cast("double")
        .as("trace"))
    v.crossJoin(broadcast(nr)).crossJoin(broadcast(trace))
      .select(col("j").cast("long").as("dim"), round(col("vj"), 6).as("v"),
        round(col("nr"), 6).as("lambda"),
        round(col("nr") / col("trace"), 6).as("explained_share"))
      .orderBy("dim")
  }

  /** DuckDB twin of [[topComponent]]: the same moment reduction and 20
    * unrolled power iterations as MATERIALIZED CTEs. */
  def topComponentSql(dims: Int = 64, iters: Int = 20): String = {
    val head =
      s"""WITH x AS (SELECT vec_id AS vid, t.i,
         |    round(CAST(embedding[t.i] AS DOUBLE), 12) AS xi
         |  FROM embeddings CROSS JOIN
         |    unnest(range(1, ${dims + 1})) AS t(i)),
         |s1 AS (SELECT i, sum(CAST(xi AS DECIMAL(38,12))) AS si
         |  FROM x GROUP BY 1),
         |sp AS (SELECT a.i, b.i AS j,
         |    sum(CAST(round(a.xi * b.xi, 12) AS DECIMAL(38,12))) AS sij
         |  FROM x a JOIN x b ON a.vid = b.vid GROUP BY 1, 2),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings),
         |m AS MATERIALIZED (SELECT sp.i, sp.j, round(
         |    CAST(sij AS DOUBLE) / n -
         |    (CAST(a.si AS DOUBLE) / n) * (CAST(b.si AS DOUBLE) / n),
         |    9) AS m
         |  FROM sp JOIN s1 a ON a.i = sp.i JOIN s1 b ON b.i = sp.j
         |  CROSS JOIN nn),
         |it0 AS (SELECT i AS j, CAST('0.125' AS DOUBLE) AS vj
         |  FROM (SELECT unnest(range(1, ${dims + 1})) AS i))"""
        .stripMargin
    val its = (1 to iters).map { k =>
      s"""w$k AS (SELECT m.i AS j,
         |    sum(CAST(round(m.m * v.vj, 12) AS DECIMAL(38,12))) AS w
         |  FROM m JOIN it${k - 1} v ON v.j = m.j GROUP BY 1),
         |n$k AS (SELECT sqrt(CAST(sum(CAST(round(
         |    CAST(w AS DOUBLE) * CAST(w AS DOUBLE), 12)
         |    AS DECIMAL(38,12))) AS DOUBLE)) AS nr FROM w$k),
         |it$k AS MATERIALIZED (SELECT j,
         |    round(CAST(w AS DOUBLE) / nr, 9) AS vj
         |  FROM w$k CROSS JOIN n$k)""".stripMargin
    }.mkString(",\n", ",\n", "")
    val tail =
      s""",tr AS (SELECT CAST(sum(CAST(m AS DECIMAL(38,9))) AS DOUBLE)
         |    AS trace FROM m WHERE i = j)
         |SELECT j AS dim, round(vj, 6) AS v, round(nr, 6) AS lambda,
         |  round(nr / trace, 6) AS explained_share
         |FROM it$iters CROSS JOIN n$iters CROSS JOIN tr
         |ORDER BY dim""".stripMargin
    (head + its + tail).replace('\n', ' ')
  }
}
