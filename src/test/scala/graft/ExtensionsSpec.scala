package graft

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions.sqrt
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions: the custom expression is a real SQL function when the
  * extension is installed via `spark.sql.extensions`. */
class ExtensionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("graft_dot is registered and evaluates in pure SQL") {
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .head().getDouble(0)
    assert(r == 32.0)
  }

  test("graft_dot agrees with the Column API on table data") {
    import spark.implicits._
    val df = Seq((1L, Array(0.5, 2.0)), (2L, Array(-1.0, 4.0)))
      .toDF("id", "v")
    df.createOrReplaceTempView("ext_vecs")
    val sql = spark.sql(
      "SELECT id, graft_dot(v, v) AS d FROM ext_vecs ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val api = df.select($"id",
        graft.expr.VectorExprs.dotProduct($"v", $"v").as("d"))
      .orderBy($"id")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(sql.sameElements(api))
    assert(sql.map(_._2).toSeq == Seq(4.25, 17.0))
  }

  test("graft_cosine matches the composed dot/norm form exactly") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(-2.0, 0.5, 1.0)))
      .toDF("a", "b")
    df.createOrReplaceTempView("ext_cos")
    val fused = spark.sql("SELECT graft_cosine(a, b) AS c FROM ext_cos")
      .head().getDouble(0)
    val composed = df.select(
      (graft.expr.VectorExprs.dotProduct($"a", $"b") /
        (sqrt(graft.expr.VectorExprs.dotProduct($"a", $"a")) *
          sqrt(graft.expr.VectorExprs.dotProduct($"b", $"b")))).as("c"))
      .head().getDouble(0)
    assert(fused == composed) // bit-identical, not just approximate
  }

  test("graft_dot rejects non-double-array inputs at analysis time") {
    val ex = intercept[AnalysisException] {
      spark.sql("SELECT graft_dot(array('a'), array('b'))").collect()
    }
    assert(ex.getMessage.contains("graft_dot") ||
      ex.getMessage.toLowerCase.contains("mismatch"))
  }

  test("graft_dot wrong arity fails analysis") {
    intercept[Exception] {
      spark.sql("SELECT graft_dot(array(1.0d))").collect()
    }
  }

  test("graft_jaro_winkler reproduces the textbook values in pure SQL " +
    "(boost only above 0.7, prefix cap 4, empty-string edges)") {
    def jw(a: String, b: String): Double = spark.sql(
      s"SELECT graft_jaro_winkler('$a', '$b') AS v").head.getDouble(0)
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-12)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.84) < 1e-12)
    // jaro 0.8963 but zero common prefix: no boost
    assert(math.abs(jw("JELLYFISH", "SMELLYFISH") -
      0.8962962962962964) < 1e-12)
    // below the 0.7 boost threshold: prefix must NOT boost
    assert(math.abs(jw("abcdxxxx", "abcyyyyyyyyyy") -
      0.5352564102564102) < 1e-12)
    assert(jw("abc", "abc") === 1.0)
    assert(jw("", "abc") === 0.0)
    assert(spark.sql("SELECT graft_jaro_winkler('', '') AS v")
      .head.getDouble(0) === 1.0)
  }

  test("graft_nfc normalizes combining sequences in pure SQL and " +
    "passes ASCII through untouched") {
    // 'e' + U+0301 combining acute must normalize to precomposed U+00E9
    // (Spark's chr() is ASCII-only — the codepoint goes in as \u escape)
    val r = spark.sql(
      "SELECT graft_nfc('cafe\\u0301') AS s").head.getString(0)
    assert(r === "café")
    assert(r.length === 4, "NFC output must be the precomposed form")
    val ascii = spark.sql("SELECT graft_nfc('plain ascii') AS s")
      .head.getString(0)
    assert(ascii === "plain ascii")
  }
}
