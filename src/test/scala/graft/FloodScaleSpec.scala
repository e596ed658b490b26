package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Adversarial boilerplate-flood behavior of every capped dedup path —
  * the 100×-corpus demonstration the unit suites assert only at toy
  * size (round-6 verdict item 2).
  *
  * The corpus: 3000 near-identical "flood" docs (one shared 60-token
  * boilerplate passage + 2 doc-unique trailing tokens — the license-
  * header / navigation-chrome pathology that makes every quadratic
  * candidate generator explode), plus 6 sparse GENUINE pairs with
  * disjoint vocabularies: 3 "twin" pairs (identical 80-token docs) and
  * 3 "span" pairs (80 tokens, one substitution at index 50 → shared
  * runs of 50 and 29 tokens).
  *
  * Every assertion is on ROW COUNTS and pair identities, never
  * wall-time (host-safe). The hashes (md5/xxh64) are deterministic, so
  * the expected sets are exact — no seeds, no tolerances except where
  * a doc-unique token may perturb a minhash family min (called out
  * inline).
  */
class FloodScaleSpec extends SparkSpec {
  import spark.implicits._

  private val FloodN = 3000
  private val Boiler = (0 until 60).map(i => s"b$i").mkString(" ")

  private def floodDoc(i: Int): (Long, String) =
    (10000L + i, s"$Boiler fu${i}a fu${i}b")

  /** twin pair p: two ids with IDENTICAL 80-token text. */
  private def twinPair(p: Int): Seq[(Long, String)] = {
    val text = (0 until 80).map(i => s"t${p}w$i").mkString(" ")
    Seq((100L + 2 * p, text), (101L + 2 * p, text))
  }

  /** span pair p: 80 tokens, b-side substitutes index 50 → shared
    * contiguous runs of 50 and 29 tokens (31 + 10 = 41 shared
    * 20-token windows, longest span 31).
    */
  private def spanPair(p: Int): Seq[(Long, String)] = {
    val toks = (0 until 80).map(i => s"s${p}x$i")
    val a = toks.mkString(" ")
    val b = toks.updated(50, s"s${p}CHG").mkString(" ")
    Seq((200L + 2 * p, a), (201L + 2 * p, b))
  }

  private lazy val corpus: DataFrame = {
    val rows = (0 until FloodN).map(floodDoc) ++
      (0 until 3).flatMap(twinPair) ++ (0 until 3).flatMap(spanPair)
    rows.toDF("doc_id", "text").repartition(8).cache()
  }

  private def isFlood(id: Long): Boolean = id >= 10000L
  private val twinPairs = (0 until 3).map(p => (100L + 2 * p, 101L + 2 * p)).toSet
  private val spanPairs = (0 until 3).map(p => (200L + 2 * p, 201L + 2 * p)).toSet

  test("capped LSH banding: flood proposes zero pairs, twins all survive, count within cap bound") {
    val pairs = Dedup.lshCandidates(corpus, $"text", $"doc_id",
        n = LshStages.ShingleN, bands = LshStages.Bands,
        rowsPerBand = LshStages.RowsPerBand, maxBucket = Queries13.MaxBucket)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // (a) bounded: the flood's mega-buckets are dropped, so the pair
    // count is the genuine population, not C(3000,2) ≈ 4.5M
    assert(pairs.size <= (twinPairs ++ spanPairs).size,
      s"capped banding over-proposed: ${pairs.size} pairs")
    assert(!pairs.exists { case (a, b) => isFlood(a) && isFlood(b) },
      "a flood-flood pair leaked through the bucket cap")
    // (b) genuine twins (identical text → identical signatures →
    // 2-doc buckets, far under the cap) all survive; span pairs MAY
    // appear too (3 of 81 shingles differ — per-band collision is
    // probable but not structural), and nothing else can
    assert(twinPairs.subsetOf(pairs), s"twin pair lost: $pairs")
    assert(pairs.subsetOf(twinPairs ++ spanPairs), s"phantom pair: $pairs")
  }

  test("lshBucketProfile flags the flood: mega-bucket measured and counted as dropped") {
    val prof = Dedup.lshBucketProfile(corpus, $"text", $"doc_id",
        LshStages.ShingleN, LshStages.Bands, LshStages.RowsPerBand,
        maxBucket = Queries13.MaxBucket)
      .collect().map(r => (r.getInt(0), r.getLong(2), r.getLong(4)))
    assert(prof.length == LshStages.Bands)
    prof.foreach { case (band, maxBucket, nDropped) =>
      // most flood docs share every family min (a doc-unique trailing
      // token intrudes with prob ≈ 2/60 per family), so each band's
      // hottest bucket holds the bulk of the 3000-doc flood
      assert(maxBucket > 1000L, s"band $band hottest bucket only $maxBucket")
      assert(nDropped >= 1L, s"band $band profile missed the flood bucket")
    }
  }

  test("capped lshLookup: incremental ingest against a flooded corpus stays bounded, planted dups found") {
    val existing = corpus.filter($"doc_id" % 2 === 0 || $"doc_id" >= 10000L)
    // incoming: the twin/span b-sides (planted genuine dups of
    // existing a-sides) + 50 fresh flood-shaped docs (new crawl of the
    // same boilerplate)
    val incoming = corpus.filter($"doc_id" % 2 === 1 && $"doc_id" < 10000L)
      .union((0 until 50).map(i => (20000L + i, s"$Boiler nu${i}a nu${i}b"))
        .toDF("doc_id", "text"))
    val found = Dedup.lshLookup(existing, incoming, $"text", $"doc_id",
        LshStages.ShingleN, LshStages.Bands, LshStages.RowsPerBand,
        maxBucket = Queries13.MaxBucket)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // bounded by construction: every surviving existing bucket holds
    // <= maxBucket rows, so candidates <= |incoming| * bands * maxBucket
    // — and in fact the flood matches NOTHING (its corpus-side bucket
    // is dropped), so only genuine planted pairs remain
    assert(!found.exists { case (in, ex) => in >= 20000L || ex >= 10000L },
      s"flood leaked through the capped lookup: $found")
    val twinFound = twinPairs.map { case (a, b) => (b, a) }
    assert(twinFound.subsetOf(found), s"planted twin dup missed: $found")
    assert(found.subsetOf(twinFound ++ spanPairs.map { case (a, b) => (b, a) }),
      s"phantom lookup match: $found")
  }

  test("capped dupSpans: flood windows dropped before pairing, genuine spans exact") {
    val spans = Dedup.dupSpans(corpus, $"text", $"doc_id",
        windowTokens = 20, minSpanWindows = 21,
        maxDf = Queries17.MaxWindowDf)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    // the 3000-doc boilerplate run (41 shared windows each, df=3000)
    // is dropped by the df gate; the genuine reports are EXACT:
    // twins share one 80-token run → 61 aligned windows, span 61;
    // span pairs share runs of 50+29 tokens → 31+10 aligned, span 31
    assert(spans.keySet == twinPairs ++ spanPairs,
      s"dupSpans pair set wrong: ${spans.keySet}")
    twinPairs.foreach(p => assert(spans(p) == ((61L, 61L)), s"$p -> ${spans(p)}"))
    spanPairs.foreach(p => assert(spans(p) == ((41L, 31L)), s"$p -> ${spans(p)}"))
  }

  test("windowDfProfile flags the flood with exact counts") {
    val r = Dedup.windowDfProfile(corpus, $"text", $"doc_id",
      windowTokens = 20, maxDf = Queries17.MaxWindowDf).collect()(0)
    assert(r.getAs[Long]("max_df") == FloodN.toLong)
    // the boilerplate run contributes exactly 41 fully-contained
    // window fingerprints (positions 0..40 of a 62-token doc), each in
    // all 3000 flood docs — the profile must price the cap's effect
    // exactly: 41 dropped fingerprints, 41 × 3000 dropped window rows
    assert(r.getAs[Long]("n_dropped_fps") == 41L, r.toString)
    assert(r.getAs[Long]("n_dropped_windows") == 41L * FloodN, r.toString)
    // multi-doc fps: 41 flood + 61×3 twin + 41×3 span = 347
    assert(r.getAs[Long]("n_multi_fps") == 347L, r.toString)
  }

  /** Round-7 verdict item 4: turn "bounded at one size" into "bounded
    * GROWTH". A corpus whose flood AND genuine content both scale 4×
    * (3k → 12k flood docs, twins ∝ flood) must grow every capped
    * path's output EXACTLY 4× — a quadratic leak anywhere would show
    * up as 16× pair growth or ~16× dropped-window volume. All
    * assertions are exact row counts (deterministic hashes, identical
    * twin texts), never wall-time.
    */
  test("two-point scale probe: capped-path outputs grow linearly with corpus size") {
    case class Counts(lsh: Long, spans: Long, droppedW: Long, jacc: Long)
    def measure(floodN: Int): (Counts, Long) = {
      val nTwins = floodN / 500
      val rows = (0 until floodN).map(i =>
          (10000L + i, s"$Boiler fu${i}a fu${i}b")) ++
        (0 until nTwins).flatMap { p =>
          val text = (0 until 80).map(i => s"g${p}w$i").mkString(" ")
          Seq((500000L + 2 * p, text), (500001L + 2 * p, text))
        }
      val c = rows.toDF("doc_id", "text").repartition(8).cache()
      c.count()
      val out = Counts(
        Dedup.lshCandidates(c, $"text", $"doc_id", n = LshStages.ShingleN,
          bands = LshStages.Bands, rowsPerBand = LshStages.RowsPerBand,
          maxBucket = Queries13.MaxBucket).count(),
        Dedup.dupSpans(c, $"text", $"doc_id", windowTokens = 20,
          minSpanWindows = 21, maxDf = Queries17.MaxWindowDf).count(),
        Dedup.windowDfProfile(c, $"text", $"doc_id", windowTokens = 20,
          maxDf = Queries17.MaxWindowDf)
          .collect()(0).getAs[Long]("n_dropped_windows"),
        Dedup.ngramJaccardPairs(c, $"text", $"doc_id", n = 3,
          minJaccard = 0.12, maxDf = 5).count())
      c.unpersist()
      (out, nTwins.toLong)
    }
    val (c1, t1) = measure(3000)
    val (c2, t2) = measure(12000)
    // each path reports exactly the genuine population (flood → zero
    // pairs) and the profile prices exactly the 41 boilerplate window
    // fingerprints × floodN dropped rows
    assert(c1 == Counts(t1, t1, 41L * 3000, t1), s"3k: $c1 (twins $t1)")
    assert(c2 == Counts(t2, t2, 41L * 12000, t2), s"12k: $c2 (twins $t2)")
    // 4× corpus → 4× outputs; a quadratic leak would read 16×
    assert(t2 == 4 * t1)
  }

  test("capped ngram Jaccard (q102 config): flood proposes nothing, genuine similarity exact") {
    val pairs = Dedup.ngramJaccardPairs(corpus, $"text", $"doc_id",
        n = 3, minJaccard = 0.12, maxDf = 5)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // boilerplate trigrams (df=3000 > 5) leave the inverted index
    // before pair generation; doc-unique trailing trigrams have df=1
    // (no bucket) — so the flood contributes ZERO pairs while the
    // genuine pairs keep their exact scores: twins 78/78 = 1.0, span
    // pairs 75 shared of 81 distinct = 0.9259 (sizes stay uncapped,
    // so the denominator is the true union even under the cap)
    assert(pairs.keySet == twinPairs ++ spanPairs,
      s"ngram pair set wrong: ${pairs.keySet}")
    twinPairs.foreach(p => assert(pairs(p) == 1.0, s"$p -> ${pairs(p)}"))
    spanPairs.foreach(p => assert(pairs(p) == 0.9259, s"$p -> ${pairs(p)}"))
  }
}
