package graft.expr

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension entry point (`spark.sql.extensions=graft.expr.GraftExtensions`).
  *
  * Registers graft's custom Catalyst expressions in the session's
  * FunctionRegistry so they are first-class SQL functions — usable from
  * `spark.sql(...)`, views, and the S8 SQL surface, not just the Scala
  * Column API. This is the standard library-distribution mechanism: a user
  * adds one config line and every session (including Thrift/Connect ones
  * the library never sees being built) gets the functions.
  *
  * Only genuinely custom expressions are injected; everything else in the
  * engine is built from `org.apache.spark.sql.functions` and needs no
  * registration.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"graft_dot takes exactly 2 arguments, got ${children.size}")
        DotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSim].getName, "graft_cosine"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"graft_cosine takes exactly 2 arguments, got ${children.size}")
        CosineSim(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName,
        "graft_jaro_winkler"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"graft_jaro_winkler takes exactly 2 arguments, " +
            s"got ${children.size}")
        JaroWinkler(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          s"graft_nfc takes exactly 1 argument, got ${children.size}")
        NfcNormalize(children.head)
      }))
  }
}
