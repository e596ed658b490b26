package graft.functions

import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructType}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass shingle hashing for near-dup candidate generation.
  *
  * The composable form (Text.shingles → array_distinct → xxhash64 per
  * element) walks interpreted higher-order lambdas and materializes
  * every n-gram string three times (size + explode + the
  * InferFiltersFromGenerate guard). This expression does one pass per
  * document: tokenize on ' ' (split(" ", -1) semantics — empties
  * kept), compose each word n-gram, XXH64 the bytes, and emit the
  * DISTINCT hashes (first-occurrence order).
  *
  * Count parity with list_distinct(shingles) holds modulo 64-bit hash
  * collisions (~|shingles|²/2⁶⁵ — below every rounding threshold used
  * by the oracles). CodegenFallback is fine here: the per-call work is
  * O(doc length), dwarfing the call overhead — unlike per-element
  * lambda interpretation.
  */
object TextExpressions {

  case class ShingleHashes(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true

    override def nullSafeEval(v: Any): Any = {
      val text = v.asInstanceOf[UTF8String].toString
      // split(" ", -1) semantics: keep empty tokens, no regex
      val toks = mutable.ArrayBuffer.empty[String]
      var start = 0; var i = 0
      while (i <= text.length) {
        if (i == text.length || text.charAt(i) == ' ') {
          toks += text.substring(start, i); start = i + 1
        }
        i += 1
      }
      // same window count as Text.shingles: max(len - n + 1, 1) grams,
      // window truncated at the end of the doc
      val grams = math.max(toks.length - n + 1, 1)
      val seen = new mutable.LinkedHashSet[Long]
      val sb = new java.lang.StringBuilder
      var g = 0
      while (g < grams) {
        sb.setLength(0)
        var k = g
        val end = math.min(g + n, toks.length)
        while (k < end) {
          if (k > g) sb.append(' ')
          sb.append(toks(k)); k += 1
        }
        val u = UTF8String.fromString(sb.toString)
        seen += XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
        g += 1
      }
      new GenericArrayData(seen.toArray)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Distinct XXH64 hashes of word n-gram shingles. */
  def shingle_hashes(text: Column, n: Int): Column =
    GraftShim.column(ShingleHashes(GraftShim.expression(text), n))

  /** NON-distinct XXH64 n-gram census hashes: one hash per OCCURRENCE
    * of each word n-gram, len − n + 1 grams (zero when the doc has
    * fewer than n tokens — the census convention, unlike
    * ShingleHashes' clamped ≥ 1 truncated gram used by the SET
    * family). Same tokenize (split(" ", -1), empties kept) and gram
    * composition (space-joined) as ShingleHashes, so
    * xxhash64-grouping a census over these hashes yields the same
    * frequency table as grouping the gram STRINGS, modulo 64-bit
    * collisions (~|grams|²/2⁶⁵ — the q125/q37 disclaimer). Replaces
    * interpreted transform-lambda string building + a ~30-byte-string
    * census shuffle with one kernel pass + an 8-byte shuffle key.
    */
  case class NgramHashes(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true

    override def nullSafeEval(v: Any): Any = {
      val text = v.asInstanceOf[UTF8String].toString
      val toks = mutable.ArrayBuffer.empty[String]
      var start = 0; var i = 0
      while (i <= text.length) {
        if (i == text.length || text.charAt(i) == ' ') {
          toks += text.substring(start, i); start = i + 1
        }
        i += 1
      }
      val grams = math.max(toks.length - n + 1, 0)
      val out = new Array[Long](grams)
      val sb = new java.lang.StringBuilder
      var g = 0
      while (g < grams) {
        sb.setLength(0)
        var k = g
        while (k < g + n) {
          if (k > g) sb.append(' ')
          sb.append(toks(k)); k += 1
        }
        val u = UTF8String.fromString(sb.toString)
        out(g) = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset,
          u.numBytes, 42L)
        g += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Per-occurrence XXH64 hashes of word n-grams (census form). */
  def ngram_hashes(text: Column, n: Int): Column =
    GraftShim.column(NgramHashes(GraftShim.expression(text), n))

  /** One-pass md5-based shingle hashes for the MINHASH family: same
    * tokenize + n-gram walk as ShingleHashes, but each gram is hashed
    * with md5 and projected to the 60-bit value
    * `conv(substring(md5(s),1,15),16,10)` — i.e. bit-identical to
    * Text.md5Long over Text.shingles, computed WITHOUT materializing
    * the shingle string array through the row pipeline or walking
    * per-element interpreted lambdas. NOT deduplicated: a min over the
    * multiset equals the min over the set, and q37's distinct-count
    * semantics stay on ShingleHashes.
    *
    * (The first 15 hex chars of the digest are bytes 0..6 plus the
    * high nibble of byte 7, read big-endian.)
    */
  case class Md5ShingleHashes(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true

    // ThreadLocal: MessageDigest is not thread-safe, and one expression
    // instance may be evaluated from several threads (driver-side eval,
    // plan reuse) even though task deserialization usually isolates it
    @transient private lazy val md5Local =
      ThreadLocal.withInitial[java.security.MessageDigest](() =>
        java.security.MessageDigest.getInstance("MD5"))

    override def nullSafeEval(v: Any): Any = {
      val md5 = md5Local.get()
      val text = v.asInstanceOf[UTF8String].toString
      val toks = mutable.ArrayBuffer.empty[String]
      var start = 0; var i = 0
      while (i <= text.length) {
        if (i == text.length || text.charAt(i) == ' ') {
          toks += text.substring(start, i); start = i + 1
        }
        i += 1
      }
      val grams = math.max(toks.length - n + 1, 1)
      val out = new Array[Long](grams)
      val sb = new java.lang.StringBuilder
      var g = 0
      while (g < grams) {
        sb.setLength(0)
        var k = g
        val end = math.min(g + n, toks.length)
        while (k < end) {
          if (k > g) sb.append(' ')
          sb.append(toks(k)); k += 1
        }
        val d = md5.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        var v56 = 0L
        var b = 0
        while (b < 7) { v56 = (v56 << 8) | (d(b) & 0xffL); b += 1 }
        out(g) = (v56 << 4) | ((d(7) & 0xf0L) >>> 4)
        g += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** md5-derived 60-bit hashes of word n-gram shingles (minhash base). */
  def md5_shingle_hashes(text: Column, n: Int): Column =
    GraftShim.column(Md5ShingleHashes(GraftShim.expression(text), n))

  /** Whole-document packed SimHash in ONE pass: tokenize on ' '
    * (empties kept), md5 each token to the 60-bit projection
    * (bit-identical to Text.md5Long — first 15 hex chars big-endian),
    * accumulate the per-bit ±1 votes in a local array, pack bits with
    * positive votes. Value-identical to the explode + 48-column
    * aggregate form (vote sums are order-independent integers) with
    * NO shuffle at all — the fingerprint is a narrow projection, which
    * is the shape you want at 100 TB (the only shuffle left in a
    * simhash pair pipeline is the band bucketing).
    */
  case class SimhashPacked(child: Expression, bits: Int)
      extends UnaryExpression with CodegenFallback {
    require(bits <= 60,
      s"simhash bits must be <= 60 (md5Long yields 60 usable bits), got $bits")
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true

    @transient private lazy val md5Local =
      ThreadLocal.withInitial[java.security.MessageDigest](() =>
        java.security.MessageDigest.getInstance("MD5"))

    override def nullSafeEval(v: Any): Any = {
      val md5 = md5Local.get()
      val text = v.asInstanceOf[UTF8String].toString
      val votes = new Array[Int](bits)
      var start = 0; var i = 0
      while (i <= text.length) {
        if (i == text.length || text.charAt(i) == ' ') {
          val d = md5.digest(text.substring(start, i)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          var v56 = 0L
          var bb = 0
          while (bb < 7) { v56 = (v56 << 8) | (d(bb) & 0xffL); bb += 1 }
          val h = (v56 << 4) | ((d(7) & 0xf0L) >>> 4)
          var b = 0
          while (b < bits) {
            if ((h & (1L << (b % 60))) != 0L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
          start = i + 1
        }
        i += 1
      }
      var sh = 0L
      var b = 0
      while (b < bits) { if (votes(b) > 0) sh |= (1L << b); b += 1 }
      sh
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** One-pass packed simhash fingerprint over whitespace tokens. */
  def simhash_packed(text: Column, bits: Int): Column =
    GraftShim.column(SimhashPacked(GraftShim.expression(text), bits))

  /** Distinct word n-gram shingle STRINGS in one pass — set-identical
    * to array_distinct(Text.shingles(text, n)) without materializing
    * the full shingle array through interpreted lambdas (the string
    * twin of ShingleHashes, for consumers that need the readable
    * n-gram, e.g. corpus boilerplate reporting).
    */
  case class ShingleStrings(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType =
      ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
    override def nullIntolerant: Boolean = true

    override def nullSafeEval(v: Any): Any = {
      val text = v.asInstanceOf[UTF8String].toString
      val toks = mutable.ArrayBuffer.empty[String]
      var start = 0; var i = 0
      while (i <= text.length) {
        if (i == text.length || text.charAt(i) == ' ') {
          toks += text.substring(start, i); start = i + 1
        }
        i += 1
      }
      val grams = math.max(toks.length - n + 1, 1)
      val seen = new mutable.LinkedHashSet[UTF8String]
      val sb = new java.lang.StringBuilder
      var g = 0
      while (g < grams) {
        sb.setLength(0)
        var k = g
        val end = math.min(g + n, toks.length)
        while (k < end) {
          if (k > g) sb.append(' ')
          sb.append(toks(k)); k += 1
        }
        seen += UTF8String.fromString(sb.toString)
        g += 1
      }
      new GenericArrayData(seen.toArray[Any])
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Distinct n-gram shingle strings (single-pass kernel). */
  def shingle_strings(text: Column, n: Int): Column =
    GraftShim.column(ShingleStrings(GraftShim.expression(text), n))

  /** Per-document quality statistics in ONE pass: tokenize, count,
    * character-length sum (UTF8 numChars — same unit as Spark's
    * length()), all-language stopword hits, ASCII-lowercase presence;
    * emits the struct (n_tok, mean_tok_len, stop_ratio, quality,
    * alpha_frac) with EXACTLY the Column-form arithmetic
    * (Text.qualityScore's int length sum / max(n,1) / least caps / 3
    * blend; q64's rlike("[a-z]") alphabetic fraction), so consumers
    * swap in value-identically. The Column forms walk interpreted
    * lambdas over the token array several times per document; this is
    * the q33/q64/q77/q85/q92 hot kernel.
    */
  case class QualityStats(child: Expression)
      extends UnaryExpression with CodegenFallback {
    import org.apache.spark.sql.types.{DoubleType, IntegerType, StructField, StructType}
    override def dataType: DataType = StructType(Seq(
      StructField("n_tok", IntegerType, nullable = false),
      StructField("mean_tok_len", DoubleType, nullable = false),
      StructField("stop_ratio", DoubleType, nullable = false),
      StructField("quality", DoubleType, nullable = false),
      StructField("alpha_frac", DoubleType, nullable = false)))
    override def nullIntolerant: Boolean = true

    @transient private lazy val stopSet: java.util.HashSet[String] = {
      val s = new java.util.HashSet[String]()
      Text.stopwords.values.flatten.foreach(s.add)
      s
    }

    override def nullSafeEval(v: Any): Any = {
      val text = v.asInstanceOf[UTF8String].toString
      var nTok = 0; var sumLen = 0; var nStop = 0; var nAlpha = 0
      var start = 0; var i = 0
      while (i <= text.length) {
        if (i == text.length || text.charAt(i) == ' ') {
          val tok = text.substring(start, i)
          nTok += 1
          // code points == UTF8String.numChars == Spark length(), with
          // no per-token re-encode/allocation
          sumLen += tok.codePointCount(0, tok.length)
          if (stopSet.contains(tok)) nStop += 1
          // rlike("[a-z]") semantics: contains any ASCII lowercase char
          var k = 0; var hasAlpha = false
          while (k < tok.length && !hasAlpha) {
            val c = tok.charAt(k)
            if (c >= 'a' && c <= 'z') hasAlpha = true
            k += 1
          }
          if (hasAlpha) nAlpha += 1
          start = i + 1
        }
        i += 1
      }
      val denom = math.max(nTok, 1).toDouble
      val mtl = sumLen.toDouble / denom
      val sr = nStop.toDouble / denom
      val q = (math.min(nTok.toDouble / 50.0, 1.0) +
        math.min(mtl / 5.0, 1.0) + math.min(sr * 5.0, 1.0)) / 3.0
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](nTok, mtl, sr, q, nAlpha.toDouble / denom))
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** One-pass (n_tok, mean_tok_len, stop_ratio, quality, alpha_frac)
    * struct.
    */
  def quality_stats(text: Column): Column =
    GraftShim.column(QualityStats(GraftShim.expression(text)))

  /** k-combination expansion over a string array — the basket-mining
    * inner loop (q234 pairs, q279 triples). The composable form
    * (nested transform/sequence/slice HOFs) interprets one lambda
    * frame per index step: ~1.1M triples at sf0.1 cost ~3-5 boxed
    * lambda calls each, and CPU-throttled bench windows inflated
    * exactly this query hardest (r11 driver passes 1.6-11.2 s on
    * identical code). One tight loop per row emits the same structs;
    * output order is combination-lexicographic over input positions,
    * and every consumer aggregates (order-free). Elements are emitted
    * BY REFERENCE (UTF8String views into the input array, valid for
    * the generator's per-row lifetime — the explode above copies each
    * struct before the next input row). CodegenFallback: per-call
    * work is O(C(n,k)), dwarfing the boxed-call overhead (the
    * ShingleHashes / JlAudit convention, SURVEY §2.9).
    */
  case class Combos(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback {
    require(k == 2 || k == 3, s"Combos supports k=2 or 3, got $k")
    private def elemType: DataType = child.dataType match {
      case ArrayType(et, _) => et
      case other => other // unresolved/invalid input surfaces in checkInputDataTypes
    }
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(_, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"Combos needs an array input, got ${other.sql}")
      }
    override def dataType: DataType = ArrayType(
      StructType((if (k == 2) Seq("a", "b") else Seq("a", "b", "c"))
        .map(f => org.apache.spark.sql.types.StructField(f, elemType,
          nullable = true))),
      containsNull = false)
    override def nullIntolerant: Boolean = true

    override def nullSafeEval(v: Any): Any = {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val et = elemType
      val n = arr.numElements()
      if (n < k) return new GenericArrayData(Array.empty[Any])
      val xs = new Array[Any](n)
      var i = 0
      while (i < n) { xs(i) = arr.get(i, et); i += 1 }
      // size in Long: n ≥ ~2344 (k=3) / ~46342 (k=2) overflows Int and
      // would mis-size the output instead of erroring (ADVICE r12)
      val mL = if (k == 2) n.toLong * (n - 1) / 2
               else n.toLong * (n - 1) * (n - 2) / 6
      if (mL > Int.MaxValue)
        throw new IllegalArgumentException(
          s"Combos(k=$k): input of $n elements expands to $mL tuples, " +
            "exceeding the single-array limit; cap the input list " +
            "(e.g. slice to the per-key top items) before expanding")
      val m = mL.toInt
      val out = new Array[Any](m)
      var w = 0
      if (k == 2) {
        var a = 0
        while (a < n - 1) {
          var b = a + 1
          while (b < n) {
            out(w) = new org.apache.spark.sql.catalyst.expressions
              .GenericInternalRow(Array[Any](xs(a), xs(b)))
            w += 1; b += 1
          }
          a += 1
        }
      } else {
        var a = 0
        while (a < n - 2) {
          var b = a + 1
          while (b < n - 1) {
            var c = b + 1
            while (c < n) {
              out(w) = new org.apache.spark.sql.catalyst.expressions
                .GenericInternalRow(Array[Any](xs(a), xs(b), xs(c)))
              w += 1; c += 1
            }
            b += 1
          }
          a += 1
        }
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** All k-combinations (positions i<j[<l]) of an array as an array of
    * structs (fields a,b[,c]) — see [[Combos]].
    */
  def combos(arr: Column, k: Int): Column =
    GraftShim.column(Combos(GraftShim.expression(arr), k))
}
