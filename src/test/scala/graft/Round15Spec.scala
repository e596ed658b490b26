package graft

import org.apache.spark.sql.functions._

/** Round-15 hardening gates (ADVICE r14). */
class Round15Spec extends SparkSpec {

  test("Skew.releaseDisplaced: a colliding put unpersists the displaced stage, a plan-equal one does not") {
    import spark.implicits._
    val sc = spark.sparkContext
    def cachedN = sc.getRDDStorageInfo.length
    def awaitCached(expect: Int): Int = {
      // unpersist(blocking=false) is async — poll briefly
      val deadline = System.currentTimeMillis() + 20000
      var n = cachedN
      while (n != expect && System.currentTimeMillis() < deadline) {
        Thread.sleep(200); n = cachedN
      }
      n
    }
    val before = cachedN
    val a = Seq((1, "a"), (2, "b")).toDF("k", "v")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val b = Seq((3L, 4.0), (5L, 6.0)).toDF("x", "y")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    a.count(); b.count()
    assert(awaitCached(before + 2) == before + 2)
    // plan-EQUAL displacement (same canonical plan, re-built df):
    // CacheManager deduped the persists onto one entry — the guard
    // must NOT release it (the survivor is about to use it).
    // blocking = true (ADVICE r15): with async unpersist this was a
    // sleep-then-assert negative — a slow wrongly-issued unpersist
    // could land after the assert and pass flakily; blocking makes
    // any unpersist complete before the call returns, so the
    // immediate assert is deterministic
    val aTwin = Seq((1, "a"), (2, "b")).toDF("k", "v")
    graft.operators.Skew.releaseDisplaced(a, aTwin, blocking = true)
    assert(cachedN == before + 2,
      "plan-equal displacement must not unpersist the shared cache entry")
    // plan-DIFFERENT displacement (the ADVICE r14 hole: an Int
    // semanticHash collision displaces a distinct plan): the displaced
    // DataFrame's cache entry must be released, not leaked untracked
    graft.operators.Skew.releaseDisplaced(a, b, blocking = true)
    assert(awaitCached(before + 1) == before + 1,
      "a displaced distinct-plan stage must be unpersisted")
    b.unpersist(blocking = true)
  }

  test("Snapshots: empty-version n_chars is ZERO on both surfaces (manifest == audit, ADVICE r14)") {
    import graft.operators.Snapshots
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_r15_snap").toString
    // doc_ids 13 and 26: version 0's derivation rule (doc_id % 13)
    // drops BOTH rows → an empty, but retained, snapshot
    val base = Seq((13L, "alpha", 5L), (26L, "beta", 4L))
      .toDF("doc_id", "text", "n_chars")
    val m0 = Snapshots.writeVersion(base, dir, 0)
    val m1 = Snapshots.writeVersion(base, dir, 1)
    val manifests = Seq(m0, m1)
    val (kept, _) = Snapshots.vacuum(dir, manifests, keepDays = 10)
    val audit = Snapshots.audit(spark, dir, manifests, kept)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    // ONE accounting convention: for EVERY kept version the audit's
    // (n_docs, n_chars) equal the manifest's commit-time stats —
    // including the empty version, where both now read (0, 0) instead
    // of manifest 0 vs audit NULL
    manifests.foreach { m =>
      assert(audit(m.version) == ((m.nDocs, Some(m.nChars))),
        s"v=${m.version}: audit ${audit(m.version)} != manifest (${m.nDocs}, ${m.nChars})")
    }
    assert(m0.nDocs == 0L && m0.nChars == 0L)
  }

  test("q17: the lake write lands few, whole files per partition dir (no small-file fan-out)") {
    // the round-15 write shape (repartitionByRange + sortWithin) must
    // keep the small-file guarantee the hash repartition gave: each
    // (event_type, day) dir holds its rows in at most TWO part files
    // (one, except where a range boundary splits a key) — a regression
    // to pre-shuffle fan-out writes |tasks|x|dirs| fragments, the
    // exact pathology q152's compaction exists to repair
    val before = System.currentTimeMillis()
    val res = SparkEntry.queries("q17_partitioned_write")(spark, sf)
    val total = res.collect().map(_.getLong(1)).sum
    val pid = ProcessHandle.current().pid()
    val root = new java.io.File("/root/repo/target/lake")
    val lake = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("q17_") &&
        f.getName.endsWith(s"_p$pid") && f.lastModified() >= before - 60000)
      .maxBy(_.lastModified())
    val partDirs = for {
      t <- Option(lake.listFiles()).getOrElse(Array.empty)
      if t.isDirectory && t.getName.startsWith("event_type=")
      day <- Option(t.listFiles()).getOrElse(Array.empty)
      if day.isDirectory && day.getName.startsWith("day=")
    } yield day
    assert(partDirs.nonEmpty, s"no partition dirs under $lake")
    partDirs.foreach { dir =>
      val parts = Option(dir.listFiles()).getOrElse(Array.empty)
        .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      assert(parts >= 1 && parts <= 2,
        s"${dir.getName}: $parts part files — small-file fan-out regressed")
    }
    // and the write lost nothing: read-back counts == source rows
    assert(total == Tables.events(spark, sf).count())
  }

  test("Bench.windowVerdictOf: a plan-speedup-masked window can no longer stamp itself clean") {
    import Bench.windowVerdictOf
    // the ADVICE r14 scenario: true contention ~1.3x masked by a ~0.7x
    // plan win → drift median ~0.9 with converged passes. Before the
    // guard this read "clean"; the drift gauge is unreliable below 0.9
    // (the record no longer describes this code) → unknown
    assert(windowVerdictOf(1.05, 0.88) == "unknown")
    assert(windowVerdictOf(1.02, 0.55) == "unknown")
    // the genuine clean window: converged passes, drift inside [0.9, 1.05]
    assert(windowVerdictOf(1.05, 0.96) == "clean")
    assert(windowVerdictOf(1.09, 1.05) == "clean")
    // contended: inflated drift or non-converged passes
    assert(windowVerdictOf(1.05, 1.26) == "contended")
    assert(windowVerdictOf(1.40, 1.00) == "contended")
    // either signal missing → unknown
    assert(windowVerdictOf(-1.0, 1.00) == "unknown")
    assert(windowVerdictOf(1.05, -1.0) == "unknown")
  }
}
