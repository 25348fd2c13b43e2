package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.join.Joins

/** Edge semantics of the join operators: as-of inclusivity/nulls, range
  * band boundaries, salted-join ≡ plain-join equivalence. */
class JoinsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOfBackward matches latest prior row, inclusive on equal ts, " +
    "null when no prior") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "l-early"),  // before any right row
      (1L, ts("2024-01-01 12:00:00"), "l-equal"),  // ties a right row
      (1L, ts("2024-01-01 13:30:00"), "l-late"),
      (2L, ts("2024-01-01 09:00:00"), "l-otherkey")
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 11:00:00"), 10.0),
      (1L, ts("2024-01-01 12:00:00"), 20.0),
      (1L, ts("2024-01-01 13:00:00"), 30.0),
      (3L, ts("2024-01-01 08:00:00"), 99.0)        // different key
    ).toDF("k", "t", "v")
    val out = Joins.asOfBackward(left, right, Seq("k"), "t", "t", Seq("v"))
      .select($"tag", $"asof_v").as[(String, Option[Double])]
      .collect().toMap
    assert(out("l-early") === None)
    assert(out("l-equal") === Some(20.0))   // equal ts IS a match
    assert(out("l-late") === Some(30.0))
    assert(out("l-otherkey") === None)      // keys don't leak
  }

  test("asOfBackward tolerance nulls stale matches but keeps the rows") {
    val left = Seq(
      (1L, ts("2024-01-01 12:00:00"), "fresh"), // match age 0 → kept
      (1L, ts("2024-01-01 13:30:00"), "stale")  // match age 30 min → null
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 12:00:00"), 20.0),
      (1L, ts("2024-01-01 13:00:00"), 30.0)
    ).toDF("k", "t", "v")
    val out = Joins.asOfBackward(left, right, Seq("k"), "t", "t", Seq("v"),
        toleranceMicros = Some(10L * 60 * 1000000))
      .select($"tag", $"asof_v").as[(String, Option[Double])]
      .collect().toMap
    assert(out === Map("fresh" -> Some(20.0), "stale" -> None))
  }

  test("asOfBackward carries null payload fields from a matched row " +
    "(a null field is not 'no match')") {
    val left = Seq((1L, ts("2024-01-01 12:00:00"))).toDF("k", "t")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), Some(7.0)),
      (1L, ts("2024-01-01 11:00:00"), Option.empty[Double]) // latest, null v
    ).toDF("k", "t", "v")
    val out = Joins.asOfBackward(left, right, Seq("k"), "t", "t", Seq("t", "v"))
      .select($"asof_t", $"asof_v").collect()(0)
    assert(out.getTimestamp(0) === ts("2024-01-01 11:00:00"))
    assert(out.isNullAt(1)) // matched row's v is null — kept, not skipped
  }

  test("rangeJoinBroadcast: [lo, hi) boundaries") {
    val fact = Seq((1L, 0.0), (2L, 24.99), (3L, 25.0), (4L, 50.0))
      .toDF("id", "value")
    val bands = Seq((0L, 0.0, 25.0), (1L, 25.0, 50.0))
      .toDF("band_id", "lo", "hi")
    val got = Joins.rangeJoinBroadcast(fact, bands, "value", "lo", "hi")
      .select($"id", $"band_id").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 2L -> 0L, 3L -> 1L)) // 50.0 out of range
  }

  test("saltedEquiJoin equals the plain equi-join") {
    val fact = (0L until 200L).map(i => (i, i % 7, s"f$i"))
      .toDF("row_id", "fk", "payload")
    val dim = (0L until 5L).map(i => (i, s"dim$i")).toDF("pk", "name")
    val salted = Joins.saltedEquiJoin(fact, dim, "fk", "pk", "row_id", 4)
      .select($"row_id", $"name").as[(Long, String)].collect().toSet
    val plain = fact.join(dim, $"fk" === $"pk")
      .select($"row_id", $"name").as[(Long, String)].collect().toSet
    assert(salted === plain)
    // fk in 0..6 but dim pk only 0..4: residues 0-3 × 29 rows + 4 × 28
    assert(salted.size === 144)
  }
}
