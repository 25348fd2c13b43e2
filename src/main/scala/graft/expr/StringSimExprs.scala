package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler string similarity as a native codegen'd Catalyst
  * expression — the fuzzy-match kernel for entity resolution (dedup of
  * names/titles/addresses across sources).
  *
  * Why custom: Spark ships `levenshtein` and `soundex` but no
  * Jaro-Winkler (4.x), and JW is the standard scorer for short-name
  * matching (prefix-weighted, transposition-tolerant). A UDF would break
  * the WholeStageCodegen span around the blocking join where this runs;
  * the expression stays inside it (same altitude decision as
  * [[DotProduct]]/[[NfcNormalize]]).
  *
  * Algorithm parity with the oracle (DuckDB `jaro_winkler_similarity`):
  * classic Jaro with match window `max(|a|,|b|)/2 − 1`, Winkler prefix
  * boost `jw = j + ℓ·0.1·(1−j)` with ℓ = common prefix capped at 4,
  * applied only when `j > 0.7`. Scores are compared at 4 dp in the
  * harness — both engines compute the same rational in doubles.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure("graft_jaro_winkler expects two string arguments")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cls = JaroWinkler.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, (a, b) => s"$cls.similarity($a, $b)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

object JaroWinkler {

  /** Shared by interpreted + codegen paths. Works on code points so
    * multilingual names score correctly (not UTF-8 bytes); pure-ASCII
    * inputs (the hot entity-resolution case) skip the String/codepoint
    * materialization entirely and compare bytes — the blocking join
    * evaluates this once per candidate pair, so the constant factor IS
    * the operator's cost (er1 at sf0.1: 10.8 s → byte path). */
  def similarity(ua: UTF8String, ub: UTF8String): Double = {
    val na = ua.numBytes
    val nb = ub.numBytes
    if (na == ua.numChars && nb == ub.numChars) {
      val ca = new Array[Int](na)
      val cb = new Array[Int](nb)
      var i = 0
      while (i < na) { ca(i) = ua.getByte(i); i += 1 }
      i = 0
      while (i < nb) { cb(i) = ub.getByte(i); i += 1 }
      return jaroWinkler(ca, cb)
    }
    val a = ua.toString
    val b = ub.toString
    jaroWinkler(a.codePoints().toArray, b.codePoints().toArray)
  }

  private def jaroWinkler(ca: Array[Int], cb: Array[Int]): Double = {
    val la = ca.length
    val lb = cb.length
    if (la == 0 || lb == 0) return if (la == lb) 1.0 else 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val matchedA = new Array[Boolean](la)
    val matchedB = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!matchedB(j) && ca(i) == cb(j)) {
          matchedA(i) = true; matchedB(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched chars out of relative order, halved with
    // INTEGER division (t = ⌊mismatches/2⌋) — the rule DuckDB's
    // implementation uses; an exact t/2.0 diverges on odd mismatch
    // counts (found empirically: swapped-digit ids score 0.9833 vs
    // DuckDB's 0.9889)
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (matchedA(i)) {
        while (!matchedB(k)) k += 1
        if (ca(i) != cb(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val j = (md / la + md / lb + (md - (t / 2).toDouble) / md) / 3.0
    if (j <= 0.7) j
    else {
      var l = 0
      val cap = math.min(4, math.min(la, lb))
      while (l < cap && ca(l) == cb(l)) l += 1
      j + l * 0.1 * (1.0 - j)
    }
  }

  /** Column API. */
  def jw(a: Column, b: Column): Column =
    Bridge.column(JaroWinkler(Bridge.expression(a), Bridge.expression(b)))
}
