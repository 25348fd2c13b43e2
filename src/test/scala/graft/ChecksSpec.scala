package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.quality.Checks

/** Declarative quality checks on a planted dirty dataset. */
class ChecksSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("planted violations are counted per rule; nulls violate; " +
    "duplicates count in excess of one per key") {
    val df = Seq(
      (1L, Some(5.0), "ok"),
      (2L, Some(-1.0), "ok"),   // negative
      (3L, None, "ok"),         // null value -> violates value rule
      (3L, Some(2.0), "bad"),   // dup id + unknown tag
      (3L, Some(3.0), "ok")     // dup id again
    ).toDF("id", "value", "tag")
    val out = Checks.report(df,
      rules = Seq(
        "value_non_negative" -> (col("value") >= 0),
        "tag_known" -> col("tag").isin("ok")),
      uniqueKeys = Seq("unique_id" -> Seq("id")))
      .orderBy("rule")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    assert(out.toSeq === Seq(
      ("tag_known", 1L, 5L, false),
      // id 3 appears 3x -> 2 rows in excess
      ("unique_id", 2L, 5L, false),
      // -1 plus the NULL both violate
      ("value_non_negative", 2L, 5L, false)))
  }

  test("quarantine routes only failing rows, tags every violated " +
    "rule in order, and treats NULL rule results as violations") {
    val df = Seq(
      (1L, Some(5.0), "ok"),    // clean -> not quarantined
      (2L, Some(-1.0), "ok"),   // one violation
      (3L, None, "bad"),        // NULL value violates + bad tag
      (4L, Some(2.0), "bad")    // tag only
    ).toDF("id", "value", "tag")
    val out = Checks.quarantine(df, Seq(
      "value_non_negative" -> (col("value") >= 0),
      "tag_known" -> col("tag").isin("ok")))
      .orderBy("id")
      .collect()
      .map(r => (r.getLong(0), r.getString(3)))
    assert(out.toSeq === Seq(
      (2L, "value_non_negative"),
      (3L, "value_non_negative,tag_known"),
      (4L, "tag_known")))
  }

  test("referential integrity: planted orphans are counted by key " +
    "and by row; NULL foreign keys are orphans; intact edge passes") {
    val parent = Seq(10L, 20L, 30L).toDF("pk")
    val child = Seq(
      (1L, Some(10L)),  // ok
      (2L, Some(10L)),  // ok (same key twice)
      (3L, Some(99L)),  // orphan key 99, row 1
      (4L, Some(99L)),  // orphan key 99, row 2
      (5L, None)        // NULL fk -> orphan
    ).toDF("id", "fk")
    val out = Checks.referentialIntegrity(Seq(
      ("child_fk", child, "fk", parent),
      ("self", parent.select(col("pk").as("fk")), "fk", parent)))
      .orderBy("rule").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    assert(out.toSeq === Seq(
      // 99 and NULL are the two orphan keys; rows 3,4,5 orphaned
      ("child_fk", 2L, 3L, 5L, false),
      ("self", 0L, 0L, 3L, true)))
  }

  test("referential integrity: empty child still yields a (0,0,0,pass) " +
    "row; multi-column parentKeys is rejected") {
    val parent = Seq(10L, 20L).toDF("pk")
    val child = Seq((1L, 10L)).toDF("id", "fk").filter(col("id") < 0)
    val out = Checks.referentialIntegrity(Seq(
      ("empty_child", child, "fk", parent))).collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getBoolean(4))).toSeq ===
      Seq(("empty_child", 0L, 0L, 0L, true)))
    val twoCol = Seq((10L, 1L)).toDF("pk", "extra")
    val err = intercept[IllegalArgumentException] {
      Checks.referentialIntegrity(Seq(("bad", child, "fk", twoCol)))
    }
    assert(err.getMessage.contains("single key column"))
  }

  test("categorical drift: vanished category reports (expected>0, " +
    "observed 0); brand-new category yields NULL term; chi2 exact on " +
    "a hand-computed split") {
    val ref = Seq("a", "a", "a", "b").toDF("cat")
    val cur = Seq("a", "b", "b", "c").toDF("cat")
    val out = Checks.categoricalDrift(ref, cur, "cat")
      .orderBy("cat").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), Option(r.get(4)).map(_.asInstanceOf[Double])))
    // totals: tr=4, tc=4; expected a=3, b=1, c=0
    // a: (1-3)²/3 = 4/3 → 1.333333 at 6dp
    assert(out(0) === (("a", 3L, 1L, 3.0, Some(1.333333))))
    assert(out(1) === (("b", 1L, 2L, 1.0, Some(1.0))))
    assert(out(2)._1 === "c" && out(2)._2 === 0L && out(2)._3 === 1L)
    assert(out(2)._5.isEmpty, "no reference mass → NULL term, no ε")
    // vanished category: present in ref, absent from cur
    val gone = Checks.categoricalDrift(ref,
      Seq("a").toDF("cat"), "cat").orderBy("cat").collect()
    val bRow = gone.find(_.getString(0) == "b").get
    assert(bRow.getLong(2) === 0L && bRow.getDouble(3) > 0,
      "a vanished category must still report with expected > 0")
  }

  test("freshness: stale partition fails the SLO, fresh one passes, " +
    "lag floors to whole seconds") {
    val asOf = 1706745600000000L
    val rows = Seq(
      ("fresh", asOf - 5500000L),       // 5.5 s ago (latest wins)
      ("fresh", asOf - 3600000000L),    // 1 h ago
      ("stale", asOf - 7200L * 1000000L) // 2 h ago
    ).toDF("k", "us")
    val out = Checks.freshness(rows, "k", col("us"), asOf,
      maxLagSeconds = 60)
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(out.toSeq === Seq(
      ("fresh", 2L, 5L, true), ("stale", 1L, 7200L, false)))
  }

  test("freshness: a future-dated partition FAILS rather than reading " +
    "fresh; its lag floors to 0") {
    val asOf = 1706745600000000L
    val rows = Seq(
      ("future", asOf + 60000000L),   // 60 s AFTER the as-of instant
      ("ok", asOf - 1000000L)
    ).toDF("k", "us")
    val out = Checks.freshness(rows, "k", col("us"), asOf,
      maxLagSeconds = 60)
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(3), r.getBoolean(4)))
    assert(out.toSeq === Seq(("future", 0L, false), ("ok", 1L, true)),
      "contract violation (max ts > as-of) must fail the gate, never " +
        "produce a negative lag")
  }

  test("categorical drift: empty reference window yields NULL expected " +
    "and NULL terms, not NaN/Infinity") {
    val ref = Seq.empty[String].toDF("cat")
    val cur = Seq("a", "b").toDF("cat")
    val out = Checks.categoricalDrift(ref, cur, "cat")
      .orderBy("cat").collect()
    assert(out.length === 2)
    out.foreach { r =>
      assert(r.isNullAt(3), s"expected_cur must be NULL, got ${r.get(3)}")
      assert(r.isNullAt(4), s"chi2_term must be NULL, got ${r.get(4)}")
    }
  }

  test("profile: one row per column with typed min/max lanes, null " +
    "and exact-distinct counts; nulls excluded from distinct/min/max") {
    val df = Seq(
      (Some(1.0), Some("a")),
      (Some(3.0), Some("a")),
      (None, Some("b")),
      (Some(3.0), None)
    ).toDF("v", "s")
    val out = Checks.profile(df, Seq("v"), Seq("s"))
      .orderBy("column").collect()
    val sRow = out(0); val vRow = out(1)
    assert(vRow.getString(0) === "v" && vRow.getLong(1) === 4L)
    assert(vRow.getLong(2) === 1L && vRow.getLong(3) === 2L)
    assert(vRow.getDouble(4) === 1.0 && vRow.getDouble(5) === 3.0)
    assert(vRow.isNullAt(6) && vRow.isNullAt(7),
      "numeric columns leave the string lane NULL")
    assert(sRow.getString(0) === "s" && sRow.getLong(2) === 1L &&
      sRow.getLong(3) === 2L)
    assert(sRow.isNullAt(4) && sRow.isNullAt(5))
    assert(sRow.getString(6) === "a" && sRow.getString(7) === "b")
  }

  test("functional dependencies: a violating group counts once but " +
    "contributes all its rows; NULL RHS abstains; a held FD passes") {
    val df = Seq(
      (1L, "a", Some("en")),  // group 'a': en, en, NULL -> held
      (2L, "a", Some("en")),
      (3L, "a", None),
      (4L, "b", Some("en")),  // group 'b': en, de -> violated (2 rows)
      (5L, "b", Some("de")),
      (6L, "c", None)         // group 'c': all NULL -> 0 distinct, held
    ).toDF("id", "grp", "lang")
    val out = Checks.functionalDependencies(Seq(
      ("grp_determines_lang", df, Seq("grp"), "lang"),
      ("id_determines_grp", df, Seq("id"), "grp")))
      .orderBy("rule").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    assert(out(0) === ("grp_determines_lang", 3L, 1L, 2L, false),
      "only group b violates, and its TWO rows are the repair surface")
    assert(out(1) === ("id_determines_grp", 6L, 0L, 0L, true),
      "id is a real key for grp")
  }

  test("clean data passes every rule") {
    val df = Seq((1L, 1.0), (2L, 2.0)).toDF("id", "value")
    val out = Checks.report(df,
      rules = Seq("value_non_negative" -> (col("value") >= 0)),
      uniqueKeys = Seq("unique_id" -> Seq("id")))
      .collect()
    assert(out.forall(_.getBoolean(3)))
    assert(out.forall(_.getLong(1) === 0L))
  }
}
