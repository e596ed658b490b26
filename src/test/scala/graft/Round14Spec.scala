package graft

import org.apache.spark.sql.functions._

/** Round-14 hardening gates (ADVICE r13). */
class Round14Spec extends SparkSpec {

  test("pairsFromInverted: over-cap buckets take the join fallback and produce identical pair stats") {
    // One token (99) shared by 6 docs — with comboCap=2 that bucket
    // must route through the streamed equi-join fallback; with a huge
    // cap everything stays on the in-row Combos expansion. The two
    // paths must agree exactly (pairs, intersections, set sizes):
    // that is the ADVICE r13 guarantee that a flood corpus putting
    // one token into most prefixes degrades to a join, not to a
    // C(n,2) single-row blowup (or the Int overflow past 65,535).
    import spark.implicits._
    val docs = Seq(
      (1L, Seq(99L, 10L, 11L)),
      (2L, Seq(99L, 10L, 12L)),
      (3L, Seq(99L, 11L, 12L)),
      (4L, Seq(99L, 13L)),
      (5L, Seq(99L, 13L, 10L)),
      (6L, Seq(99L, 14L)))
    val sh = docs.toDF("doc_id", "shs").select(
      struct(col("doc_id"), size(col("shs")).as("n_sh")).as("dn"),
      explode(col("shs")).as("h"))
    def dump(cap: Int): Seq[(Long, Long, Long, Int, Int)] =
      graft.operators.Dedup.pairsFromInverted(sh, 0, cap)
        .orderBy(col("a_id"), col("b_id"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getInt(3), r.getInt(4)))
        .toSeq
    val viaJoin = dump(2)     // token-99 bucket (6 docs) > cap → join path
    val viaCombos = dump(1000) // everything in-row
    assert(viaJoin == viaCombos,
      s"fallback diverged:\njoin  =$viaJoin\ncombos=$viaCombos")
    // the all-pairs bucket alone yields C(6,2)=15 pairs; smaller
    // buckets only add intersections to existing pairs here
    assert(viaJoin.size == 15, s"expected 15 pairs, got ${viaJoin.size}")
    // doc pair (1,2) shares {99,10} → inter=2, sizes 3/3
    assert(viaJoin.contains((1L, 2L, 2L, 3, 3)))
  }

  test("Snapshots.audit surfaces an empty-but-kept version with n_docs=0 (and writeVersion records its manifest)") {
    import graft.operators.Snapshots
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_r14_snap").toString
    // doc_ids 13 and 26: version 0's derivation rule (doc_id % 13)
    // drops BOTH rows → an empty, but retained, snapshot
    val base = Seq((13L, "alpha", 5L), (26L, "beta", 4L))
      .toDF("doc_id", "text", "n_chars")
    val m0 = Snapshots.writeVersion(base, dir, 0)
    val m1 = Snapshots.writeVersion(base, dir, 1)
    assert(m0.nDocs == 0L && m0.nChars == 0L,
      s"empty commit must record a (0,0) manifest, got $m0")
    val manifests = Seq(m0, m1)
    val (kept, expired) = Snapshots.vacuum(dir, manifests, keepDays = 10)
    assert(kept == Set(0, 1) && expired.isEmpty)
    val rows = Snapshots.audit(spark, dir, manifests, kept)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.isNullAt(4))).toSeq
    // ADVICE r13: before the left-join fix the empty kept version
    // yielded NO audit row at all (groupBy emits no group for an
    // empty partition) — the audit silently lost a surviving snapshot.
    // ADVICE r14: its n_chars is now 0, matching the manifest's
    // accounting convention (one representation on both surfaces);
    // content_sum stays NULL (nothing to checksum).
    assert(rows.size == 2, s"audit must surface every kept version: $rows")
    assert(rows.contains((0, "kept", 0L, 0L, true)),
      s"empty kept version must surface as (0, kept, 0, 0, NULL): $rows")
    assert(rows.exists(r => r._1 == 1 && r._2 == "kept" && r._3 == 2L))
  }

  test("chunkedSessionize: distinct inputs evict old stage persists (bounded cache, ADVICE r13)") {
    import spark.implicits._
    val sc = spark.sparkContext
    def cachedN = sc.getRDDStorageInfo.length
    val ev = (1 to 60).map(i => (i % 3L,
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(i * 40L)),
      i.toLong)).toDF("k", "ts", "id")
    val before = cachedN
    // 12 distinct parameterizations → 12 distinct canonical plans;
    // the bounded LRU registry (cap 8) must evict the oldest stages
    (1 to 12).foreach { i =>
      graft.operators.Skew
        .chunkedSessionize(ev, "k", "ts", "id", 30.0 + i, 60L).count()
    }
    // unpersist(blocking=false) is async — poll briefly
    val deadline = System.currentTimeMillis() + 20000
    var delta = cachedN - before
    while (delta > 8 && System.currentTimeMillis() < deadline) {
      Thread.sleep(250); delta = cachedN - before
    }
    assert(delta <= 8,
      s"expected ≤8 live chunkedSessionize stage caches, found $delta")
    // and the operator still computes correct sessions after eviction
    val out = graft.operators.Skew
      .chunkedSessionize(ev, "k", "ts", "id", 30.0, 60L)
    assert(out.count() == 60)
  }
}
