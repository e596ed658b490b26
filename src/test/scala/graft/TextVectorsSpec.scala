package graft

import org.apache.spark.sql.functions._
import graft.functions.{Text, Vectors}

class TextVectorsSpec extends SparkSpec {
  import spark.implicits._

  test("cosine of a vector with itself is 1") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f, 3.0f))).toDF("a", "b")
    val c = df.select(Vectors.cosine($"a", $"b")).head().getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("cosine of orthogonal vectors is 0") {
    val df = Seq((Seq(1.0f, 0.0f), Seq(0.0f, 1.0f))).toDF("a", "b")
    assert(math.abs(df.select(Vectors.cosine($"a", $"b")).head().getDouble(0)) < 1e-12)
  }

  test("shingles produce n-grams in order") {
    val df = Seq("a b c d").toDF("t")
    val sh = df.select(Text.shingles($"t", 3)).head().getSeq[String](0)
    assert(sh.toList.map(_.toString) == List("a b c", "b c d"))
  }

  test("minhash signature is deterministic and dup-invariant") {
    val df = Seq("x y z w v u t s", "x y z w v u t s", "totally different words here")
      .toDF("t")
    val sigs = df.select(Text.minhashSignature(Text.shingles($"t", 3), 4))
      .collect().map(_.getSeq[Long](0))
    assert(sigs(0) == sigs(1))       // identical docs → identical signature
    assert(sigs(0) != sigs(2))       // different docs → different signature
  }

  test("LSH banding finds planted near-duplicates") {
    import graft.operators.Dedup
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      (0L, base),
      (1L, base),                       // exact dup → identical signature
      (2L, base + " x"),                // near dup → most bands agree
      (3L, "completely different words describing unrelated things entirely")
    ).toDF("doc_id", "text")
    val pairs = Dedup.lshCandidates(docs, $"text", $"doc_id", 3, 4, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), s"exact dup not found in $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      s"unrelated doc paired: $pairs")
  }

  test("Md5ShingleHashes == md5Long over Text.shingles (bit-identical)") {
    import graft.functions.TextExpressions
    val docs = Seq("a b c d e", "x", "", "汉字 漢字 测试 again",
      "one two", "a  b").toDF("t") // incl. empty token cases
    val fused = docs.select(TextExpressions.md5_shingle_hashes($"t", 3))
      .collect().map(_.getSeq[Long](0).toList)
    val composed = docs.select(
      transform(Text.shingles($"t", 3), s => Text.md5Long(s)))
      .collect().map(_.getSeq[Long](0).toList)
    assert(fused.toList == composed.toList)
  }

  test("connectedComponents clusters planted chains and keeps singletons apart") {
    import graft.operators.Dedup
    // components: {1,2,3,4} (a chain), {10,11}, {20,21,22} (a star)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (20L, 22L)).toDF("a_id", "b_id")
    val cc = Dedup.connectedComponents(edges, "a_id", "b_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("connectedComponents on an empty edge list returns an empty result") {
    import graft.operators.Dedup
    val edges = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    assert(Dedup.connectedComponents(edges, "a_id", "b_id").count() == 0)
  }

  test("minhash explode-form == Column-form signatures") {
    import graft.operators.Dedup
    val docs = Seq((0L, "a b c d e f"), (1L, "x y z w v u t"), (2L, "a b"))
      .toDF("doc_id", "text")
    val fast = Dedup.minhashSignature(docs, $"text", $"doc_id", 3, 4)
      .orderBy("doc_id").collect()
      .map(r => (1 to 4).map(r.getLong))
    val colForm = docs
      .select($"doc_id", Text.minhashSignature(Text.shingles($"text", 3), 4).as("sig"))
      .orderBy("doc_id").collect()
      .map(_.getSeq[Long](1).toSeq)
    assert(fast.map(_.toSeq).toSeq == colForm.toSeq)
  }

  test("simhash explode-form == Column-form packed fingerprints") {
    import graft.operators.Dedup
    val docs = Seq((0L, "a b c d e"), (1L, "x y z"), (2L, "a a a b"))
      .toDF("doc_id", "text")
    val fast = Dedup.simhashPacked(docs, $"text", $"doc_id", 12)
      .orderBy("doc_id").collect().map(_.getLong(1)).toSeq
    val expected = docs
      .select($"doc_id", Text.simhash64(Text.tokens($"text"), 12).as("sh"))
      .orderBy("doc_id").collect().map(_.getLong(1)).toSeq
    assert(fast == expected)
  }

  test("simhash rejects bits > 60 (md5Long bit-aliasing guard)") {
    import graft.operators.Dedup
    val docs = Seq((0L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](Text.simhashBits(Text.tokens($"text"), 64))
    intercept[IllegalArgumentException](Text.simhash64(Text.tokens($"text"), 61))
    intercept[IllegalArgumentException](Dedup.simhashPacked(docs, $"text", $"doc_id", 64))
  }

  test("minhash/simhash keep NULL-text docs with NULL fingerprints") {
    import graft.operators.Dedup
    val docs = Seq((0L, Some("a b c d")), (1L, Option.empty[String]))
      .toDF("doc_id", "text")
    val sig = Dedup.minhashSignature(docs, $"text", $"doc_id", 3, 4)
    assert(sig.count() == 2)
    val nullRow = sig.filter($"doc_id" === 1).head()
    assert(nullRow.isNullAt(nullRow.fieldIndex("s0")))
    val sh = Dedup.simhashPacked(docs, $"text", $"doc_id", 8)
    assert(sh.count() == 2)
    // NULL text → fingerprint 0 (all votes vacuously non-positive),
    // matching Text.simhash64 and the oracle CASE semantics
    assert(sh.filter($"doc_id" === 1).head().getLong(1) == 0L)
  }

  test("langid picks the language with most stopword hits") {
    val df = Seq(
      "the cat and the dog is here",  // en
      "le chat et la souris",         // fr
      "der hund und die katze",       // de
      "qqq www eee"                   // none
    ).toDF("t")
    val got = df.select(Text.langId($"t")).collect().map(_.getString(0)).toSeq
    assert(got == Seq("en", "fr", "de", "und"))
  }

  test("quality score is in [0,1] and higher for stopword-rich text") {
    val df = Seq("the and of to a in is the and of", "zzzz").toDF("t")
    val qs = df.select(Text.qualityScore($"t")).collect().map(_.getDouble(0))
    assert(qs.forall(q => q >= 0 && q <= 1))
    assert(qs(0) > qs(1))
  }

  test("fingerprint equals md5 and md5Long is stable") {
    val df = Seq("hello world").toDF("t")
    val row = df.select(Text.fingerprint($"t"), Text.md5Long($"t")).head()
    assert(row.getString(0) == "5eb63bbbe01eeed093cb22bb8f5acdc3")
    // first 15 hex of md5 as base-16 long
    assert(row.getLong(1) == java.lang.Long.parseLong("5eb63bbbe01eeed", 16))
  }

  test("regex token count: words, numbers, punctuation") {
    val df = Seq("abc 12 d-e!").toDF("t")
    // tokens: abc, 12, d, -, e, !
    assert(df.select(Text.regexTokenCount($"t")).head().getInt(0) == 6)
  }

  test("QualityStats kernel == the Column-form quality formulas on real docs") {
    import graft.functions.TextExpressions
    val docs = Tables.documents(spark, sf)
    val toks = Text.tokens($"text")
    val st = TextExpressions.quality_stats($"text")
    val alphaRef = size(filter(toks, t => t.rlike("[a-z]"))).cast("double") /
      greatest(size(toks), lit(1)).cast("double")
    val both = docs.filter($"text".isNotNull).select(
      st.getField("n_tok"), size(toks),
      st.getField("mean_tok_len"), Text.meanTokenLen(toks),
      st.getField("stop_ratio"), Text.stopwordRatio(toks),
      st.getField("quality"), Text.qualityScore($"text"),
      st.getField("alpha_frac"), alphaRef)
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getInt(0) == r.getInt(1))
      assert(r.getDouble(2) == r.getDouble(3))
      assert(r.getDouble(4) == r.getDouble(5))
      assert(r.getDouble(6) == r.getDouble(7))
      assert(r.getDouble(8) == r.getDouble(9))
    }
  }

  test("single-pass kernels == Column forms on tokenizer edge cases") {
    import graft.functions.TextExpressions
    // the hand-written tokenizers must replicate split(' ', -1) exactly:
    // empty tokens kept, leading/trailing/double spaces, unicode, empties
    val edge = Seq("", " ", "  ", "a", "a ", " a", "a  b", "the the the",
      "的 了 是", ("x " * 100).trim, "one two three four five six seven")
      .toDF("t")
    val rows = edge.select(
      TextExpressions.simhash_packed($"t", 16),
      Text.simhash64(Text.tokens($"t"), 16),
      TextExpressions.shingle_strings($"t", 3),
      array_distinct(Text.shingles($"t", 3)),
      TextExpressions.md5_shingle_hashes($"t", 3),
      transform(Text.shingles($"t", 3), s => Text.md5Long(s)),
      TextExpressions.quality_stats($"t").getField("quality"),
      Text.qualityScore($"t"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(0) == r.getLong(1), s"simhash mismatch: $r")
      assert(r.getSeq[String](2) == r.getSeq[String](3), s"shingle strings: $r")
      assert(r.getSeq[Long](4) == r.getSeq[Long](5), s"md5 shingle hashes: $r")
      assert(r.getDouble(6) == r.getDouble(7), s"quality: $r")
    }
  }

  test("ShingleStrings kernel == array_distinct(shingles) on real docs") {
    import graft.functions.TextExpressions
    val docs = Tables.documents(spark, sf).limit(100)
    val both = docs.select(
      TextExpressions.shingle_strings($"text", 7).as("fast"),
      array_distinct(Text.shingles($"text", 7)).as("ref"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getSeq[String](0).toSet == r.getSeq[String](1).toSet)
    }
  }

  test("lshCandidates maxBucket drops a planted mega-bucket, keeps sparse pairs") {
    import graft.operators.Dedup
    // 6 identical boilerplate docs: every band bucket holds all 6, so a
    // cap of 4 drops ALL their pairs (the O(k²) bound in action). The
    // separate near-dup pair (100, 101) lives in 2-doc buckets and must
    // survive the cap untouched.
    val boiler = "subscribe to our newsletter for the latest updates and offers today"
    val other = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = ((0L until 6L).map(i => (i, boiler)) ++
      Seq((100L, other), (101L, other + " x"))).toDF("doc_id", "text")
    val uncapped = Dedup.lshCandidates(docs, $"text", $"doc_id", 3, 4, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Dedup.lshCandidates(docs, $"text", $"doc_id", 3, 4, 2,
        maxBucket = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.contains((0L, 1L)) && uncapped.contains((100L, 101L)))
    assert(capped == Set((100L, 101L)),
      s"cap should drop exactly the mega-bucket pairs: $capped")
    // the profile sees what the cap dropped: some band has a 6-deep
    // bucket over the cap
    val prof = Dedup.lshBucketProfile(docs, $"text", $"doc_id", 3, 4, 2,
        maxBucket = 4)
      .collect().map(r => (r.getInt(0), r.getLong(2), r.getLong(4))).toList
    assert(prof.forall { case (_, maxB, nDrop) => maxB == 6L && nDrop >= 1L },
      s"profile should report the 6-deep over-cap bucket per band: $prof")
  }

  test("dupSpans: shift-invariant spans, exact run length, maxDf drops boilerplate") {
    import graft.operators.Dedup
    // docs 1/2 share a 6-token run at DIFFERENT offsets (doc 2 has a
    // 1-token prefix — the case fixed-chunk dedup misses entirely);
    // stride-1 windows of 2 tokens see 5 consecutive matches on one
    // diagonal: the exact 6-token run length is 5 + (2-1)
    val run = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (1L, run + " one two"),
      (2L, "intro " + run + " three four"),
      (10L, "subscribe now aa bb"),
      (11L, "subscribe now cc dd"),
      (12L, "subscribe now ee ff"),
      (13L, "subscribe now gg hh")).toDF("doc_id", "text")
    val spans = Dedup.dupSpans(docs, $"text", $"doc_id",
        windowTokens = 2, minSpanWindows = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Long]("max_span_windows"))).toSet
    assert(spans == Set((1L, 2L, 5L)),
      s"expected the shifted 5-window run: $spans")
    // with minSpanWindows=1 the df=4 boilerplate window ("subscribe
    // now") emits all 6 pairs; a df cap of 3 removes them while the
    // genuine run (df=2 windows) survives
    val all1 = Dedup.dupSpans(docs, $"text", $"doc_id", 2, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(all1.size == 1 + 6, s"expected run pair + 6 boilerplate pairs: $all1")
    val capped = Dedup.dupSpans(docs, $"text", $"doc_id", 2, 1, maxDf = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((1L, 2L)), s"cap should keep only the real run: $capped")
  }

  test("lshLookup maxBucket bounds a corpus mega-bucket, keeps sparse matches") {
    import graft.operators.Dedup
    // corpus: 6 identical boilerplate docs (one mega-bucket per band)
    // + 1 ordinary doc; the incoming batch contains a near-dup of the
    // ordinary doc and a copy of the boilerplate. The capped probe
    // must still find the ordinary match (sparse buckets) while the
    // boilerplate probe stops fanning out to all 6 corpus copies.
    val boiler = "subscribe to our newsletter for the latest updates and offers today"
    val real = "the quick brown fox jumps over the lazy dog again and again today"
    val corpus = ((0L until 6L).map(i => (i, boiler)) :+ (50L, real))
      .toDF("doc_id", "text")
    val incoming = Seq((100L, boiler), (101L, real + " x"))
      .toDF("doc_id", "text")
    def probe(maxBucket: Int): Set[(Long, Long)] =
      Dedup.lshLookup(corpus, incoming, $"text", $"doc_id", 3, 4, 2,
          maxBucket = maxBucket)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = probe(0)
    assert(uncapped.contains((101L, 50L)) &&
      (0L until 6L).forall(i => uncapped.contains((100L, i))),
      s"uncapped probe should see all matches: $uncapped")
    val capped = probe(4)
    assert(capped == Set((101L, 50L)),
      s"cap should keep only the sparse-bucket match: $capped")
  }

  test("q143's band-bucket cap is answer-invisible at sf0.1 (no bucket hits it)") {
    import graft.operators.Dedup
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    val prof = Dedup.lshBucketProfile(docs, $"text", $"doc_id",
        LshStages.ShingleN, LshStages.Bands, LshStages.RowsPerBand,
        maxBucket = Queries13.MaxBucket)
      .collect()
    assert(prof.nonEmpty)
    // no bucket reaches the cap at 10× the correctness-gate scale...
    prof.foreach { r =>
      assert(r.getLong(4) == 0L, s"unexpected over-cap bucket: $r")
      assert(r.getLong(2) <= Queries13.MaxBucket, s"hot bucket: $r")
    }
    // ...so the capped pair set IS the uncapped one, bit for bit
    val capped = Dedup.lshCandidates(docs, $"text", $"doc_id",
        LshStages.ShingleN, LshStages.Bands, LshStages.RowsPerBand,
        maxBucket = Queries13.MaxBucket)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = Dedup.lshCandidates(docs, $"text", $"doc_id",
        LshStages.ShingleN, LshStages.Bands, LshStages.RowsPerBand)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == uncapped)
  }

  test("q157's window-df cap is answer-invisible at sf0.1 (no fingerprint hits it)") {
    import graft.operators.Dedup
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    val prof = Dedup.windowDfProfile(docs, $"text", $"doc_id",
      windowTokens = 20, maxDf = Queries17.MaxWindowDf).collect()
    assert(prof.length == 1)
    // no window fingerprint reaches the cap at 10× the gate scale...
    assert(prof(0).getAs[Long]("n_dropped_fps") == 0L,
      s"unexpected over-cap fingerprints: ${prof(0)}")
    assert(prof(0).getAs[Long]("max_df") <= Queries17.MaxWindowDf,
      s"hot fingerprint: ${prof(0)}")
    // ...so the capped span report IS the uncapped one, bit for bit
    def spans(maxDf: Int): Set[String] =
      Dedup.dupSpans(docs, $"text", $"doc_id", windowTokens = 20,
          minSpanWindows = 21, maxDf = maxDf)
        .collect().map(_.toString).toSet
    assert(spans(Queries17.MaxWindowDf) == spans(0))
  }
}
