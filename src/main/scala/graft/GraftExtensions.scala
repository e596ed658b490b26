package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.TextExpressions.ShingleHashes
import graft.functions.VectorExpressions.{DotProduct, SumSq}

/** SparkSessionExtensions installer — the no-code-change way to get
  * the custom kernels into every session of an application:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)        // or
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  *
  * Equivalent to calling [[Register.all]] on an existing session. No
  * custom Rule/SparkStrategy is injected — every operator in this
  * library plans well through stock Catalyst (SURVEY.md §4).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - dot product of two numeric arrays"),
      es => DotProduct(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("graft_sumsq"),
      info("graft_sumsq", "graft_sumsq(a) - sum of squared elements"),
      es => SumSq(es.head)))
    e.injectFunction((FunctionIdentifier("graft_shingle_hashes"),
      info("graft_shingle_hashes",
        "graft_shingle_hashes(text, n) - distinct XXH64 hashes of word n-grams"),
      es => ShingleHashes(es(0), intLit(es(1), "n"))))
  }
}
