package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the q76-q80 training-data curation family
  * (edit-distance pairs, cluster representatives, split assignment,
  * contamination screen, mixture reweighting). Value parity with
  * DuckDB is the oracle gate; these pin the operator CONTRACTS.
  */
class TrainPipeSpec extends SparkSpec {
  import spark.implicits._

  test("q76: pairs are same-lang, ordered, within both thresholds") {
    val pairs = Queries3.q76(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"lang", $"text", $"n_chars")
      .collect().map(r => r.getLong(0) -> r).toMap
    pairs.foreach { p =>
      val (a, b) = (docs(p.getLong(0)), docs(p.getLong(1)))
      assert(p.getLong(0) < p.getLong(1), "pair not ordered")
      assert(a.getString(1) == b.getString(1), "cross-lang pair")
      assert(math.abs(a.getLong(3) - b.getLong(3)) <= 10, "length prefilter leak")
      val d = p.getInt(2)
      assert(d >= 0 && d <= 10, s"distance $d outside threshold")
    }
  }

  test("q76: composed blocking == plain (lang, Δlen) quadratic join ∩ LSH candidates") {
    // the declared form's recall stage is exactly LshStages'
    // candidate set — no pair invented, none dropped beyond LSH recall
    val docs = Tables.documents(spark, sf).select($"doc_id", $"lang", $"text", $"n_chars")
    val plain = docs.as("a").join(docs.as("b"),
        $"a.lang" === $"b.lang" && $"a.doc_id" < $"b.doc_id" &&
          abs($"a.n_chars" - $"b.n_chars") <= 10)
      .filter(levenshtein($"a.text", $"b.text", 10) >= 0)
      .select($"a.doc_id", $"b.doc_id").as[(Long, Long)].collect().toSet
    val cand = LshStages.candidatePairs(spark, sf)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    val composed = Queries3.q76(spark, sf)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(composed == (plain & cand),
      s"composed\\expected=${composed -- (plain & cand)}, " +
        s"expected\\composed=${(plain & cand) -- composed}")
    assert(composed.nonEmpty, "planted near-dups should survive LSH recall")
  }

  test("q81: verified pairs are exactly the LSH candidates within distance 30") {
    import graft.operators.Dedup
    val docs = Tables.documents(spark, sf)
    val cand = Dedup.lshCandidates(docs, $"text", $"doc_id", 3, 4, 2)
      .as[(Long, Long)].collect().toSet
    val verified = Queries3.q81(spark, sf).collect()
    assert(verified.nonEmpty)
    verified.foreach { r =>
      assert(cand.contains((r.getLong(0), r.getLong(1))), "pair not an LSH candidate")
      assert(r.getInt(2) >= 0 && r.getInt(2) <= 30)
    }
  }

  test("q77: the representative has max quality in its cluster") {
    import graft.operators.Dedup
    import graft.functions.Text
    val docs = Tables.documents(spark, sf)
    val edges = Dedup.lshCandidates(docs, $"text", $"doc_id", 3, 4, 2)
    val members = Dedup.connectedComponents(edges, "a_id", "b_id")
      .join(docs.select($"doc_id", Text.qualityScore($"text").as("q")),
        $"node" === $"doc_id")
      .select($"cluster", $"doc_id", $"q")
      .collect().groupBy(_.getLong(0))
    val reps = Queries3.q77(spark, sf).collect()
    assert(reps.nonEmpty)
    reps.foreach { r =>
      val cluster = members(r.getLong(0))
      assert(r.getLong(2) == cluster.length, "n_docs != member count")
      val repQ = cluster.find(_.getLong(1) == r.getLong(1)).get.getDouble(2)
      assert(cluster.forall(_.getDouble(2) <= repQ + 1e-12), "rep not max-quality")
    }
  }

  test("q78: every doc gets exactly one split; assignment is content-keyed") {
    val out = Queries3.q78(spark, sf)
    val n = Tables.documents(spark, sf).count()
    assert(out.count() == n)
    assert(out.select($"split").distinct().as[String].collect().toSet
      .subsetOf(Set("train", "val", "test")))
    // re-running yields the identical assignment (no RNG)
    assert(Queries3.q78(spark, sf).except(out).isEmpty)
  }

  test("q79: test-split docs are excluded; flag equals n_shared >= 1") {
    import graft.functions.Text
    val out = Queries3.q79(spark, sf).collect()
    val testDocs = Tables.documents(spark, sf)
      .filter(pmod(Text.md5Long($"text"), lit(100L)) >= 90)
      .select($"doc_id").as[Long].collect().toSet
    out.foreach { r =>
      assert(!testDocs.contains(r.getLong(0)), "test doc in screened set")
      assert(r.getBoolean(2) == (r.getLong(1) >= 1), "flag drift")
    }
    assert(out.length == Tables.documents(spark, sf).count() - testDocs.size)
  }

  test("q80: thresholds cap at 10000 and kept counts recount exactly") {
    import graft.functions.Text
    val docs = Tables.documents(spark, sf)
    val total = docs.count()
    val rows = Queries3.q80(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum == total)
    rows.foreach { r =>
      val (lang, nDocs, thresh, nKept) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val expected = math.min(10000L, (10000L * total) / (5L * nDocs))
      assert(thresh == expected, s"$lang thresh $thresh != $expected")
      assert(nKept <= nDocs)
      if (nDocs * 5 <= total) assert(thresh == 10000L, "under-represented lang must keep all")
      val recount = docs.filter($"lang" === lang &&
        pmod(Text.md5Long($"text"), lit(10000L)) < thresh).count()
      assert(nKept == recount, s"$lang kept $nKept != recount $recount")
    }
  }

  test("q147: nll is positive, covers every non-null-text doc, and a " +
      "common-token doc scores below a rare-token doc") {
    val rows = Queries14.q147(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf)
      .filter($"text".isNotNull).count()
    assert(rows.length == nDocs)
    rows.foreach { r =>
      val nll = r.getAs[Double]("mean_nll")
      assert(nll > 0, s"unigram nll must be positive: $r")
      assert(r.getAs[Boolean]("drop") == (nll > 7.0) ||
        math.abs(nll - 7.0) < 1e-3, s"drop flag inconsistent: $r")
    }
    // model sanity on a synthetic corpus: the doc made of the corpus'
    // commonest token must be more probable than the rare-token doc
    import spark.implicits._
    // schema-complete fixture: docToks REQUIRES `source` (round 12 —
    // the silent null-source fallback is gone, per ADVICE r11)
    val synth = (Seq.fill(9)("common common common") :+ "rare")
      .zipWithIndex.map { case (t, i) => (i.toLong, t, "synth") }
      .toDF("doc_id", "text", "source")
    val sdir = java.nio.file.Files.createTempDirectory("graft_q147_").toString
    synth.write.mode("overwrite").parquet(s"$sdir/documents.parquet")
    val nlls = Queries14.q147(spark, sdir).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("mean_nll")).toMap
    assert(nlls(0) < nlls(9), s"common-token doc must score lower: $nlls")
  }

  test("q148: co-occurrence counts are consistent and pmi recomputes") {
    val rows = Queries14.q148(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val n = Tables.documents(spark, sf).count()
    rows.foreach { r =>
      val (nab, pmi) = (r.getAs[Long]("n_ab"), r.getAs[Double]("pmi"))
      assert(nab >= 5)
      // n_ab <= N always; pmi bounded above by ln(N / n_ab) when both
      // marginals are at least n_ab
      assert(nab <= n)
      assert(pmi <= math.log(n.toDouble / nab) + 1e-9, s"pmi too large: $r")
    }
  }

  test("q149: weights are a distribution and small sources are upweighted") {
    val rows = Queries14.q149(spark, sf).collect()
    val wsum = rows.map(_.getAs[Double]("weight")).sum
    assert(math.abs(wsum - 1.0) < 1e-2, s"weights sum to $wsum")
    val n = rows.map(_.getAs[Long]("n_docs")).sum
    val effSum = rows.map(_.getAs[Double]("eff_docs")).sum
    assert(math.abs(effSum - n) / n < 1e-2, s"eff docs sum to $effSum of $n")
    // temperature flattening: weight/p ratio must be (weakly) larger
    // for smaller sources
    val byN = rows.sortBy(_.getAs[Long]("n_docs")).map { r =>
      r.getAs[Double]("weight") / (r.getAs[Long]("n_docs").toDouble / n)
    }
    byN.sliding(2).foreach { case Array(small, large) =>
      assert(small >= large - 1e-9,
        s"smaller source must be upweighted at least as much: ${byN.toSeq}")
    }
  }
}
