package graft

import org.apache.spark.sql.functions._

/** Invariants of the round-10 corpus-curation batch (Queries64) that
  * the DuckDB hash gate can't express directly: conservation across
  * the blocklist audit, the zero-leakage-by-construction property of
  * the cluster-level split (and its doc-level scheme's identity with
  * q78), and bounds on the triplet/continuation statistics.
  */
class CorpusOpsSpec extends SparkSpec {

  test("q285 blocklist audit conserves token mass and bounds counters") {
    val rows = Queries64.q285(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nDocs = r.getAs[Long]("n_docs")
      val nFlag = r.getAs[Long]("n_flagged")
      val tot = r.getAs[Long]("total_tokens")
      val hits = r.getAs[Long]("blocklist_tokens")
      val surv = r.getAs[Long]("surviving_tokens")
      val share = r.getAs[Double]("removed_token_share")
      assert(nFlag <= nDocs)
      assert(hits <= tot)
      assert(surv <= tot)
      assert(share >= 0.0 && share <= 1.0)
      // removed + surviving partition the source's token mass
      assert(math.abs((tot - surv).toDouble / tot - share) < 5e-5)
    }
    val totalDocs = rows.map(_.getAs[Long]("n_docs")).sum
    assert(totalDocs == Tables.documents(spark, sf).count())
  }

  test("q286 cluster-level split leaks ZERO pairs; doc scheme leaks " +
    "and matches q78's assignment") {
    val rows = Queries64.q286(spark, sf).collect()
    val (cluster, doc) = rows.partition(_.getString(0) == "cluster")
    assert(cluster.nonEmpty && doc.nonEmpty)
    // the core guarantee: no candidate pair straddles a cluster split
    cluster.foreach(r => assert(r.getAs[Long]("n_leaking_pairs") == 0L,
      s"cluster split ${r.getString(1)} leaked"))
    // both schemes partition the same corpus
    val nDocs = Tables.documents(spark, sf).count()
    assert(cluster.map(_.getAs[Long]("n_docs")).sum == nDocs)
    assert(doc.map(_.getAs[Long]("n_docs")).sum == nDocs)
    assert(cluster.map(_.getAs[Long]("char_mass")).sum ==
      doc.map(_.getAs[Long]("char_mass")).sum)
    // doc-level leak count recomputed independently from q78's output
    val splits = Queries3.q78(spark, sf)
    val pairs = LshStages.candidatePairs(spark, sf)
    val leak = pairs
      .join(splits.withColumnRenamed("doc_id", "a_id")
        .withColumnRenamed("split", "sa"), Seq("a_id"))
      .join(splits.withColumnRenamed("doc_id", "b_id")
        .withColumnRenamed("split", "sb"), Seq("b_id"))
      .filter(col("sa") =!= col("sb")).count()
    assert(doc.map(_.getAs[Long]("n_leaking_pairs")).sum == leak)
  }

  test("q287 triplet stats are bounded and deterministic") {
    val rows = Queries64.q287(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_margin_positive") <= r.getAs[Long]("n_triplets"))
      Seq("avg_pos_cos", "avg_neg_cos").foreach { c =>
        val v = r.getAs[Double](c)
        assert(v >= -1.0 && v <= 1.0, s"$c out of range: $v")
      }
      // positives are threshold-gated at >= 0.30, so their mean is too
      assert(r.getAs[Double]("avg_pos_cos") >= 0.30)
    }
    val again = Queries64.q287(spark, sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("q288 continuation counts are bounded by the bigram-type total " +
    "and ranked non-increasing") {
    val rows = Queries64.q288(spark, sf).collect()
    assert(rows.nonEmpty)
    val t = rows.head.getAs[Long]("n_bigram_types")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_bigram_types") == t)
      val cc = r.getAs[Long]("n_contexts")
      assert(cc >= 1 && cc <= t)
      val p = r.getAs[Double]("p_continuation")
      // p is round(cc/t, 6) — tolerance is the 6dp rounding bound
      assert(math.abs(p - cc.toDouble / t) <= 5e-7)
    }
    val ccs = rows.map(_.getAs[Long]("n_contexts"))
    assert(ccs.zip(ccs.tail).forall { case (a, b) => a >= b })
  }
}
