package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity as a native Catalyst expression — the
  * fuzzy-match kernel for record-linkage blocking (SURVEY §2.8 X127).
  * Spark has `levenshtein` built in (q76) but no Jaro-Winkler; the
  * composable alternative (per-char HOF lambdas) would interpret a
  * lambda per character pair, so a native expression is the §7.5
  * preference order at work.
  *
  * Semantics match DuckDB's `jaro_winkler_similarity` (verified
  * empirically against the standard test vectors martha/marhta=0.9611,
  * dwayne/duane=0.84, dixon/dicksonx=0.8133, plus edge cases):
  *   - either side empty → 0.0; zero matches → 0.0
  *   - match window = max(len1,len2)/2 - 1 (floor; "ab"/"ba" → 0.0)
  *   - transpositions = half the out-of-order matched chars
  *   - Winkler boost only when jaro > 0.7: jw = j + p·0.1·(1−j),
  *     common prefix p capped at 4
  * Operates on UTF-16 chars — identical to codepoint semantics on the
  * ASCII part/customer names it is used on. Generates a static call
  * (doGenCode below) so the surrounding join stage keeps whole-stage
  * codegen.
  */
object Linkage {

  def jaroWinkler(s1: String, s2: String): Double = {
    val len1 = s1.length; val len2 = s2.length
    if (len1 == 0 || len2 == 0) return 0.0
    val window = math.max(math.max(len1, len2) / 2 - 1, 0)
    val m1 = new Array[Boolean](len1)
    val m2 = new Array[Boolean](len2)
    var m = 0
    var i = 0
    while (i < len1) {
      val lo = math.max(0, i - window)
      val hi = math.min(len2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: walk matched chars of both sides in order
    var t = 0
    var j = 0
    i = 0
    while (i < len1) {
      if (m1(i)) {
        while (!m2(j)) j += 1
        if (s1.charAt(i) != s2.charAt(j)) t += 1
        j += 1
      }
      i += 1
    }
    val half = t / 2
    val jaro = (m.toDouble / len1 + m.toDouble / len2 +
      (m - half).toDouble / m) / 3.0
    if (jaro > 0.7) {
      val pMax = math.min(4, math.min(len1, len2))
      var p = 0
      while (p < pMax && s1.charAt(p) == s2.charAt(p)) p += 1
      jaro + p * 0.1 * (1.0 - jaro)
    } else jaro
  }

  /** UTF8String entry point for generated code. */
  def jaroWinklerUtf8(a: UTF8String, b: UTF8String): Double =
    jaroWinkler(a.toString, b.toString)

  case class JaroWinkler(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(l: Any, r: Any): Any =
      jaroWinkler(l.asInstanceOf[UTF8String].toString,
        r.asInstanceOf[UTF8String].toString)
    // a real doGenCode (static call) rather than CodegenFallback: the
    // comparator sits inside the block join's filter+project stage,
    // and a fallback expression would break whole-stage codegen for
    // that entire stage, not just this scalar
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.Linkage.jaroWinklerUtf8($a, $b)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  def jaro_winkler(a: Column, b: Column): Column =
    GraftShim.column(JaroWinkler(GraftShim.expression(a),
      GraftShim.expression(b)))

  /** One-pass deletion neighborhood: variant i replaces char i with
    * the '·' marker (q171's Hamming-1 blocking key — two names are
    * Hamming-1 iff they share a variant at the same position).
    * Value-identical to the composable
    * `transform(sequence(0, len-1), i -> concat(substr(1,i),'·',substr(i+2)))`
    * but built in one pass instead of len interpreted lambda calls
    * with 2·len substring allocations.
    */
  case class DeletionVariants(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    override def dataType: DataType =
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(v: Any): Any = {
      val s = v.asInstanceOf[UTF8String].toString
      val n = s.length
      val out = new Array[Any](n)
      val chars = s.toCharArray
      var i = 0
      while (i < n) {
        val c = chars(i)
        chars(i) = '·'
        out(i) = UTF8String.fromString(new String(chars))
        chars(i) = c
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def deletion_variants(name: Column): Column =
    GraftShim.column(DeletionVariants(GraftShim.expression(name)))
}
