package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.er.Survivorship

/** Survivorship-merge semantics on planted conflicts — the branches the
  * sf-data oracle cannot isolate: majority wins, exact tie-break,
  * NULL abstention, conflict counting. */
class SurvivorshipSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def recs = Seq(
    // entity 1: name majority 2-1; phone tie broken by value asc;
    // segment has a single voter (others NULL) → no conflict
    (1L, "Alice", "111", null.asInstanceOf[String]),
    (1L, "Alice", "222", "GOLD"),
    (1L, "Alicia", null.asInstanceOf[String], null.asInstanceOf[String]),
    // entity 2: all fields agree (one NULL abstains) → zero conflicts
    (2L, "Bob", "333", "SILVER"),
    (2L, "Bob", "333", null.asInstanceOf[String])
  ).toDF("entity", "name", "phone", "segment")

  test("majority wins; ties break (count desc, value asc); NULLs " +
    "abstain; conflicts counted per field") {
    val out = Survivorship.goldenRecords(recs, "entity",
      Seq("name", "phone", "segment"))
      .orderBy("entity").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(5), r.getLong(4)))
    assert(out(0) === ((1L, "Alice", "111", "GOLD", 3L, 2L)),
      "name 2-1 majority; phone 1-1 tie → '111' < '222'; lone GOLD " +
        "voter wins segment; name+phone conflict, segment does not")
    assert(out(1) === ((2L, "Bob", "333", "SILVER", 2L, 0L)),
      "agreement (with a NULL abstention) is zero conflicts")
  }

  test("a field that is NULL in every record yields a NULL golden " +
    "value and no conflict") {
    val allNull = Seq(
      (1L, "A", null.asInstanceOf[String]),
      (1L, "A", null.asInstanceOf[String])
    ).toDF("entity", "name", "phone")
    val r = Survivorship.goldenRecords(allNull, "entity",
      Seq("name", "phone")).collect().head
    assert(r.getAs[String]("golden_name") === "A")
    assert(r.getAs[String]("golden_phone") === null)
    assert(r.getAs[Long]("n_conflicts") === 0L)
  }

  test("an entity whose records are NULL in EVERY field still surfaces " +
    "with all-NULL golden columns and 0 conflicts") {
    val n = null.asInstanceOf[String]
    val mixed = Seq(
      (1L, "A", "111"),
      (2L, n, n),
      (2L, n, n)
    ).toDF("entity", "name", "phone")
    val out = Survivorship.goldenRecords(mixed, "entity",
      Seq("name", "phone")).orderBy("entity").collect()
    assert(out.length === 2, "one row per entity even when all fields " +
      "are NULL everywhere")
    val ghost = out(1)
    assert(ghost.getAs[String]("golden_name") === null)
    assert(ghost.getAs[String]("golden_phone") === null)
    assert(ghost.getAs[Long]("n_conflicts") === 0L)
    assert(ghost.getAs[Long]("n_records") === 2L)
  }
}
