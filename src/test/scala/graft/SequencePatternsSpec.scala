package graft

import org.scalatest.funsuite.AnyFunSuite

/** Designed-fixture semantics for the sequence/association/phonetic
  * operators — the properties the sf-data oracle can't isolate:
  * gapped-vs-adjacent credit (x59), the exact lift arithmetic (x60),
  * and vowel-typo recovery through the phonetic block (er3). Each test
  * writes a tiny parquet table and runs the REGISTERED query on it. */
class SequencePatternsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def fixtureDir(name: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft_seq_$name").toString
    d
  }

  test("x59: credits a-before-b at ANY gap (view->purchase with no " +
    "adjacent transition), strict on equal timestamps") {
    import spark.implicits._
    val dir = fixtureDir("x59")
    // u1: view@1 click@2 purchase@3 — (view,purchase) never adjacent
    // u2: view@5 click@5 — equal ts must NOT count (strict <)
    Seq(
      (1L, 1L, "view", 1L), (2L, 1L, "click", 2L),
      (3L, 1L, "purchase", 3L),
      (4L, 2L, "view", 5L), (5L, 2L, "click", 5L))
      .toDF("event_id", "user_id", "event_type", "ts")
      .write.parquet(s"$dir/events.parquet")
    val rows = SparkEntry.queries("x59_seq2_support")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
      .toSet
    assert(rows === Set(
      ("click", "purchase", 1L, 5000L),
      ("view", "click", 1L, 5000L),
      ("view", "purchase", 1L, 5000L)),
      "gapped pair must be credited; the equal-ts pair must not")
  }

  test("x60: support/confidence/lift basis points are the exact " +
    "integer quotients on a hand-computable basket set") {
    import spark.implicits._
    val dir = fixtureDir("x60")
    // baskets: u1{a,b} u2{a,b} u3{a} u4{b}; the duplicate (1,a) row
    // pins the DISTINCT step. nu=4, n_a=3, n_b=3, n_ab=2.
    Seq((1L, "a"), (1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"),
      (3L, "a"), (4L, "b"))
      .toDF("user_id", "event_type")
      .write.parquet(s"$dir/events.parquet")
    val rows = SparkEntry.queries("x60_pair_lift")(spark, dir).collect()
    assert(rows.length === 1)
    val r = rows(0)
    assert((r.getString(0), r.getString(1), r.getLong(2)) ===
      ("a", "b", 2L))
    assert(r.getLong(3) === 5000L)  // 2*10000/4
    assert(r.getLong(4) === 6666L)  // 2*10000/3 floored
    assert(r.getLong(5) === 8888L)  // 2*4*10000/(3*3) floored
  }

  test("er3: every vowel-perturbed name (o->a, drop-e, i->u) lands in " +
    "its clean name's phonetic block and matches it back") {
    import spark.implicits._
    val dir = fixtureDir("er3")
    // dirty keys are %10==3; perturbation arm is key%3. Distractors
    // share no consonant skeleton with the dirty names.
    Seq(
      (3L, "cargo bay"),    // arm 0: o->a  => "carga bay"
      (13L, "green bolt"),  // arm 1: -e    => "grn bolt"
      (23L, "blind rod"),   // arm 2: i->u  => "blund rod"
      (1L, "steel hub"), (2L, "quartz fan"), (4L, "copper pin"))
      .toDF("p_partkey", "p_name")
      .write.parquet(s"$dir/part.parquet")
    val rows = SparkEntry.queries("er3_phonetic_match")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .toSet
    assert(rows === Set((3L, 3L), (13L, 13L), (23L, 23L)),
      "each dirty row must recover exactly its own clean row")
  }
}
