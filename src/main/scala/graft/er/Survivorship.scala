package graft.er

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Field-wise survivorship — the merge step of golden-record
  * construction (er4): within each resolved entity cluster, each field
  * independently keeps its most-frequent non-null value, with a
  * (count desc, value asc) tie-break so the pick is total-ordered and
  * engine-portable. NULLs never vote (a record missing a field
  * abstains rather than vetoing), and a field whose values disagree is
  * counted as a conflict so data stewards can audit the merge.
  *
  * Shape: the record set unpivots to an (entity, field, value) long
  * form — adding a field adds ROWS to a skinny aggregate, not another
  * corpus pass — then two hash aggregates (value counts → min_by mode
  * pick) and one pivot-back produce the golden table. Everything after
  * the unpivot is cluster-sized; no window ever runs over the records.
  */
object Survivorship {

  /** @param records  resolved records: `entityCol` + string `fields`
    * @return one row per entity: golden_<field> columns, n_records,
    *         n_conflicts (fields with >1 distinct non-null value).
    *         An entity whose records are NULL in EVERY field still
    *         surfaces (all-NULL golden columns, 0 conflicts) — the
    *         records side of the final join is preserved, so "one row
    *         per entity" holds even for the degenerate cluster. */
  def goldenRecords(records: DataFrame, entityCol: String,
      fields: Seq[String]): DataFrame = {
    require(fields.nonEmpty, "at least one field required")
    val long = records.select(col(entityCol),
      explode(map(fields.flatMap(f =>
        Seq(lit(f), col(f))): _*)).as(Seq("field", "value")))
      .filter(col("value").isNotNull)
    val picked = long
      .groupBy(col(entityCol), col("field"), col("value"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col(entityCol), col("field"))
      .agg(min_by(col("value"),
        struct((-col("cnt")).as("nc"), col("value"))).as("golden"),
        count(lit(1)).as("n_values"))
    val goldenCols = fields.map(f =>
      max(when(col("field") === f, col("golden"))).as(s"golden_$f"))
    val aggs = goldenCols :+
      sum(when(col("n_values") > 1, 1L).otherwise(0L)).as("n_conflicts")
    records.groupBy(col(entityCol))
      .agg(count(lit(1)).as("n_records"))
      .join(picked.groupBy(col(entityCol)).agg(aggs.head, aggs.tail: _*),
        Seq(entityCol), "left_outer")
      .withColumn("n_conflicts", coalesce(col("n_conflicts"), lit(0L)))
      .select(col(entityCol) +: fields.map(f => col(s"golden_$f")) :+
        col("n_conflicts") :+ col("n_records"): _*)
  }
}
