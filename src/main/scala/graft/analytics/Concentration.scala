package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gini coefficient of a per-entity integer quantity (x78) — the
  * whale-dependence / concentration metric next to x50's revenue-share
  * ladder and ds3's top-decile cut: 0 = perfectly equal, (n−1)/n = one
  * entity holds everything.
  *
  * Exact integer form on the ascending-sorted values:
  *   G = (2·Σ i·yᵢ − (n+1)·Σy) / (n·Σy)
  * Within-tie rank order provably cancels (Σ i·y over a tie group is
  * y·Σi whatever the permutation), so the one entity-grain window is
  * deterministic; Σ(i·y) accumulates in DECIMAL(38,0) for headroom
  * (the doubling is iy + iy so no decimal width ever exceeds 38 in
  * either engine). One corpus aggregate to entity grain upstream; the
  * entity-grain rank is the two-phase [[graft.etl.Ids.withOrderedIds]]
  * shape (range-partitioned slices + broadcast offsets) — a global
  * `row_number() OVER (ORDER BY …)` would funnel the whole entity
  * grain through one task, the ml8-class anti-pattern. */
object Concentration {

  /** @param per one row per entity: (`keyCol`, `centsCol` integer ≥ 0)
    * @return one row (n_entities, total, gini) */
  def gini(per: DataFrame, keyCol: String, centsCol: String): DataFrame = {
    val keyed = per
      .select(col(keyCol).as("k"), col(centsCol).cast("long").as("y"))
      .withColumn("__ord", concat(
        graft.etl.Ids.fixedWidthKey(col("y"), 20),
        graft.etl.Ids.fixedWidthKey(col("k"), 20)))
    val ranked = graft.etl.Ids.withOrderedIds(keyed, "__ord", "i")
      .withColumn("i", col("i").cast("long"))
    ranked
      .agg(count(lit(1)).as("n_entities"),
        sum(col("y")).as("total"),
        sum((col("i") * col("y")).cast("decimal(38,0)")).as("iy"))
      .select(col("n_entities"), col("total"),
        round(
          (col("iy") + col("iy") -
            ((col("n_entities") + 1) * col("total"))
              .cast("decimal(38,0)")).cast("double") /
            (col("n_entities") * col("total")).cast("double"),
          6).as("gini"))
  }
}
