package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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
  * ASCII part/customer names it is used on. CodegenFallback is fine
  * here (TextExpressions rationale): per-call work is O(len²-ish),
  * dwarfing the boxed-call overhead, unlike per-element lambdas.
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

  case class JaroWinkler(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(l: Any, r: Any): Any =
      jaroWinkler(l.asInstanceOf[UTF8String].toString,
        r.asInstanceOf[UTF8String].toString)
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  def jaro_winkler(a: Column, b: Column): Column =
    GraftShim.column(JaroWinkler(GraftShim.expression(a),
      GraftShim.expression(b)))
}
