package graft

import org.apache.spark.sql.catalyst.expressions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural lint for the HOF-inlining trap: Catalyst evaluates
  * higher-order-function lambdas interpreted and re-computes child
  * expressions PER ELEMENT, so a loop-invariant expensive subtree inside
  * a lambda body turns O(n) row work into O(n·cost) — the defect that
  * made t19_bigram_logprob 30× slower than its unigram sibling
  * (re-tokenizing the document at every bigram position) and the
  * pre-fix quantizeInt8 re-run its array_max fold per element.
  *
  * The timing-based alternative (compare sf0.01 vs sf0.001 runtimes and
  * flag super-linear ratios) is flaky on a contended driver machine
  * (4–40× sample variance observed); this lint is deterministic: it
  * walks every registered query's OPTIMIZED plan — post CollapseProject,
  * so a materialization the optimizer would undo still fails — and
  * flags any lambda whose body contains an expensive node (regex, split,
  * array fold/transform/sort) that references no enclosing lambda
  * variable. Such a subtree should be bound to an attribute in its own
  * projection first (the bigramLogProb / bandedBuckets pattern).
  */
class HofInliningLintSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** Expensive-to-re-evaluate node kinds: per-call cost is O(|input|)
    * or regex-compilation-heavy, so per-element re-execution inside a
    * lambda is the O(n²) trap. Cheap leaves/arithmetic/comparisons and
    * attribute references are free to re-evaluate and stay allowed. */
  private def isExpensive(e: Expression): Boolean = e match {
    case _: RegExpReplace | _: RegExpExtract | _: StringSplit => true
    case _: ArrayAggregate | _: ArrayTransform | _: ArrayFilter => true
    case _: ArraySort | _: ArrayDistinct | _: SortArray => true
    case _: ArrayMax | _: ArrayMin => true
    case _: ArraysZip | _: ZipWith | _: ArrayExists => true
    case _ => false
  }

  /** Collect offending (lambda-invariant, expensive) subtrees in `e`,
    * tracking the set of lambda-variable exprIds in scope. */
  private def offenders(e: Expression,
      inScope: Set[Long], inLambda: Boolean): Seq[Expression] = e match {
    case LambdaFunction(body, args, _) =>
      offenders(body,
        inScope ++ args.map(_.exprId.id), inLambda = true)
    case hof: HigherOrderFunction =>
      // the HOF's own input arrays evaluate once — only its function
      // lambdas run per element. If the HOF sits inside an enclosing
      // lambda it is itself re-run per outer element, so keep scanning
      // its inputs in that case.
      hof.arguments.flatMap(offenders(_, inScope, inLambda)) ++
        hof.functions.flatMap(offenders(_, inScope, inLambda))
    case _ =>
      val invariantExpensive = inLambda && isExpensive(e) &&
        !e.exists {
          case v: NamedLambdaVariable => inScope.contains(v.exprId.id)
          case _ => false
        }
      if (invariantExpensive) Seq(e)
      else e.children.flatMap(offenders(_, inScope, inLambda))
  }

  test("no registered query embeds a loop-invariant expensive " +
      "expression inside a higher-order-function lambda") {
    val bad = scala.collection.mutable.ArrayBuffer[String]()
    val unplannable = scala.collection.mutable.ArrayBuffer[String]()
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      // skip-with-note on analysis failure: one broken query must not
      // void the lint's guarantee over the other ~220 plans (the
      // EntrySmokeSpec is the gate for queries that fail to plan)
      val plan =
        try Some(fn(spark, dir)
          .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
          .queryExecution.optimizedPlan)
        catch { case e: Throwable =>
          unplannable += s"$name: ${String.valueOf(e.getMessage).take(120)}"
          None
        }
      plan.foreach(_.foreach { node =>
        node.expressions.foreach { root =>
          offenders(root, Set.empty, inLambda = false).foreach { off =>
            bad += s"$name: ${off.sql.take(160)}"
          }
        }
      })
    }
    if (unplannable.nonEmpty)
      info(s"skipped ${unplannable.size} unplannable queries " +
        s"(EntrySmokeSpec owns these failures):\n  " +
        unplannable.mkString("\n  "))
    assert(bad.isEmpty,
      s"lambda-invariant expensive expressions (materialize them as " +
        s"columns in their own projection first):\n  ${bad.mkString("\n  ")}")
  }
}
