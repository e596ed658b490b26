package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis kernels for the training-data-pipeline surface
  * (north-star extensions; SURVEY.md §2.8 X1/X3): tokenization, n-gram
  * shingles, language-ID heuristic, quality scoring, fingerprinting,
  * MinHash/SimHash dedup primitives.
  *
  * Everything is a pure Column expression over built-ins (split /
  * transform / filter / md5 / conv) — codegen'd, per-row, no shuffles
  * of its own, so it composes into whatever aggregation the caller
  * partitions. Hash primitives use md5 (present + identical in both
  * Spark and DuckDB) rather than xxhash64 (Spark-only) so dedup
  * queries stay oracle-checkable.
  */
object Text {

  /** Whitespace tokenizer. `documents.text` is space-separated
    * lowercase words (FIXTURES.md §A notes).
    */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish regex token count: runs of letters, runs of digits, or a
    * single other non-space char. Same RE2-compatible pattern works in
    * Spark (Java regex) and DuckDB.
    */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0)))

  /** Word-level n-gram shingles, joined with a space */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    val k = size(toks) - lit(n - 1)
    // slide a window: for i in 0..(len-n) emit toks[i..i+n-1]
    transform(sequence(lit(0), greatest(k - 1, lit(0))),
      i => array_join(slice(toks, i + 1, lit(n)), " "))
  }

  /** Deterministic 64-bit-ish hash from md5 hex: first 15 hex digits →
    * bigint (60 bits, fits signed 64). Identical in DuckDB via
    * `('0x' || substr(md5(s),1,15))::BIGINT`-style casts.
    */
  def md5Long(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  /** Seeded variant for MinHash families: h_i(s) = md5Long(i || s).
    * (Kept for API completeness; the minhash pipeline now derives its
    * families from ONE md5 via minhashMix — 8× fewer crypto hashes.)
    */
  def md5LongSeeded(s: Column, seed: Int): Column =
    md5Long(concat(lit(seed.toString), s))

  /** Universal-hash family constants for minhashMix, derived from a
    * fixed seed so the DuckDB oracles can splice the SAME literals.
    * A/B odd multipliers < 2^31 (a 30-bit draw shifted left once,
    * low bit set); C < 2^60.
    */
  private val mixRnd = new scala.util.Random(42)
  val minhashA: IndexedSeq[Long] =
    IndexedSeq.fill(64)((mixRnd.nextInt(1 << 30).toLong << 1) | 1L)
  val minhashB: IndexedSeq[Long] =
    IndexedSeq.fill(64)((mixRnd.nextInt(1 << 30).toLong << 1) | 1L)
  val minhashC: IndexedSeq[Long] =
    IndexedSeq.fill(64)(mixRnd.nextLong() & ((1L << 60) - 1))

  /** Family-i hash from one 60-bit base hash: split the base into two
    * 30-bit halves and combine linearly mod 2^60. Each product is a
    * 30-bit half × a sub-2^31 multiplier < 2^61, and the 3-term sum
    * stays under 2^61 + 2^61 + 2^60 < 2^63, so the arithmetic is
    * overflow-free in BOTH engines (DuckDB errors on BIGINT overflow
    * rather than wrapping). Widening the base hash past 60 bits or the
    * multipliers past 2^31 would break this bound — re-derive it
    * before touching either. One md5 per shingle instead of k
    * (Broder-style universal families over a single strong
    * fingerprint).
    */
  def minhashMix(h: Column, i: Int): Column =
    (h.bitwiseAND(lit((1L << 30) - 1)) * lit(minhashA(i)) +
      shiftright(h, 30) * lit(minhashB(i)) + lit(minhashC(i))) % lit(1L << 60)

  /** MinHash signature of a shingle array: array of k minima, one per
    * hash family. Classic shingle→minhash (Broder 1997).
    */
  def minhashSignature(shingleArr: Column, k: Int): Column =
    array((0 until k).map { i =>
      array_min(transform(shingleArr, s => minhashMix(md5Long(s), i)))
    }: _*)

  /** SimHash-64-ish fingerprint over tokens (Charikar 2002): for each
    * of `bits` positions, sign of sum over tokens of (+1 if hash bit
    * set else -1); pack to a bit string. Uses md5-derived bits so it is
    * engine-portable.
    */
  def simhashBits(toks: Column, bits: Int): Column = {
    require(bits <= 60, s"simhash bits must be <= 60 (md5Long yields 60 usable bits; bit ${bits - 1} would alias bit ${(bits - 1) % 60}), got $bits")
    concat((0 until bits).map { b =>
      val vote = aggregate(
        transform(toks, t => when(md5Long(t).bitwiseAND(lit(1L << (b % 60))) =!= 0L, 1).otherwise(-1)),
        lit(0), (acc, v) => acc + v)
      when(vote > 0, lit("1")).otherwise(lit("0"))
    }: _*)
  }

  /** SimHash as a packed integer (bit b set iff the b-th vote is
    * positive) — the joinable form: near-dups have small Hamming
    * distance `bit_count(a ^ b)`.
    */
  def simhash64(toks: Column, bits: Int): Column = {
    require(bits <= 60, s"simhash bits must be <= 60 (md5Long yields 60 usable bits; bit ${bits - 1} would alias bit ${(bits - 1) % 60}), got $bits")
    (0 until bits).map { b =>
      val vote = aggregate(
        transform(toks, t => when(md5Long(t).bitwiseAND(lit(1L << (b % 60))) =!= 0L, 1).otherwise(-1)),
        lit(0), (acc, v) => acc + v)
      when(vote > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Exact content fingerprint (md5 of full text) — X1 exact-dedup key.
    * At 100 TB: groupBy this 128-bit key instead of the full text so
    * the shuffle carries 16 bytes/row, not the document body.
    */
  def fingerprint(text: Column): Column = md5(text)

  // ---- language ID (n-gram/stopword heuristic) ------------------------

  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "une"),
    "es" -> Seq("el", "los", "las", "y", "una", "que", "por"),
    "de" -> Seq("der", "die", "das", "und", "ein", "mit", "von"),
    "zh" -> Seq("的", "了", "是", "我", "不", "在", "有")
  )

  private def stopCount(toks: Column, lang: String): Column =
    size(filter(toks, t => t.isInCollection(stopwords(lang))))

  /** Heuristic language ID: argmax of per-language stopword hits, with
    * a fixed priority order (en,fr,es,de,zh) breaking ties; "und"
    * (undetermined) when no stopword matches at all.
    */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val langs = Seq("en", "fr", "es", "de", "zh")
    val counts = langs.map(l => l -> stopCount(toks, l))
    val best = counts.map(_._2).reduce((a, b) => greatest(a, b))
    // nested WHENs, outermost = en, so earlier langs win ties
    counts.foldRight(lit("und")) { case ((l, c), acc) =>
      when(c === best && best > 0, lit(l)).otherwise(acc)
    }
  }

  // ---- quality scoring -------------------------------------------------

  /** Stopword ratio across all known languages. */
  def stopwordRatio(toks: Column): Column = {
    val all = stopwords.values.flatten.toSeq
    size(filter(toks, t => t.isInCollection(all))).cast("double") /
      greatest(size(toks), lit(1)).cast("double")
  }

  /** Mean token length. */
  def meanTokenLen(toks: Column): Column =
    aggregate(transform(toks, t => length(t)), lit(0),
      (a, v) => a + v).cast("double") / greatest(size(toks), lit(1)).cast("double")

  /** Heuristic document quality score in [0,1]: blend of length,
    * mean-token-length, and stopword signals (the reference's
    * data_quality_score idea, README.md:485-499, re-targeted at text).
    * Deterministic closed-form — oracle-expressible.
    */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val nTok = size(toks).cast("double")
    val lenScore = least(nTok / lit(50.0), lit(1.0))
    val tokLen = meanTokenLen(toks)
    val tokLenScore = least(tokLen / lit(5.0), lit(1.0))
    val stopScore = least(stopwordRatio(toks) * lit(5.0), lit(1.0))
    (lenScore + tokLenScore + stopScore) / lit(3.0)
  }
}
