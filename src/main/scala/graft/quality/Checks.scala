package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks (the Deequ-style constraint report):
  * given row-local rules and uniqueness constraints, produce one small
  * report row per rule with its violation count.
  *
  * Scale design: every row-local rule folds into ONE shared hash
  * aggregate over the data (conditional sums — a single pass at scan
  * speed, no matter how many rules), then unpivots the one result row
  * into per-rule rows driver-free. Each uniqueness constraint is its
  * own count-distinct aggregate (inherently a shuffle on the key), and
  * everything unions into a metadata-sized report. Nothing collects;
  * adding a rule adds a column to one aggregate, not a pass.
  */
object Checks {

  /** Violation report. `rules`: (name, predicate) where the predicate
    * must hold for a row to PASS — null predicates count as violations
    * (SQL three-valued logic must not silently pass). `uniqueKeys`:
    * (name, key columns) — violations = rows in excess of one per
    * distinct key combination. */
  def report(df: DataFrame, rules: Seq[(String, Column)],
      uniqueKeys: Seq[(String, Seq[String])] = Nil): DataFrame = {
    require(rules.nonEmpty, "at least one row-local rule required")
    val aggs = rules.map { case (n, p) =>
      sum(when(coalesce(p, lit(false)), 0L).otherwise(1L)).as(s"v_$n")
    } :+ count(lit(1)).as("n_rows")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rowLocal = one.select(explode(array(rules.map { case (n, _) =>
      struct(lit(n).as("rule"), col(s"v_$n").as("n_violations"),
        col("n_rows"))
    }: _*)).as("r")).select(col("r.rule"), col("r.n_violations"),
      col("r.n_rows"))
    val uniq = uniqueKeys.map { case (n, ks) =>
      df.agg(
        (count(lit(1)) - countDistinct(col(ks.head), ks.tail.map(col): _*))
          .as("n_violations"),
        count(lit(1)).as("n_rows"))
        .select(lit(n).as("rule"), col("n_violations"), col("n_rows"))
    }
    (rowLocal +: uniq).reduce(_.unionByName(_))
      .withColumn("pass", col("n_violations") === 0)
  }
}
