package graft

import org.apache.spark.sql.functions._
import graft.functions.Text

/** Properties of the round-5 diagnostics/sketch batch (Queries8) that
  * the DuckDB hash match can't express: the CMS one-sided error
  * guarantee over the WHOLE vocabulary (the oracle only pins the
  * top-20 rows), transition-matrix stochasticity, and winsorization
  * bounds.
  */
class DiagnosticsSpec extends SparkSpec {

  test("q123 CMS: estimates never undercount, for every token in the corpus") {
    // rebuild the same depth-4 x 1024 sketch the query uses and probe
    // EVERY token, not just the top-20 the declared query reports
    val exact = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n_exact"))
    val cells = exact.select(col("tok"), col("n_exact"),
      posexplode(array((0 until 4).map(j =>
        pmod(Text.md5LongSeeded(col("tok"), j), lit(1024L))): _*))
        .as(Seq("j", "cell")))
    val sketch = cells.groupBy(col("j"), col("cell"))
      .agg(sum(col("n_exact")).as("cnt"))
    val under = cells.join(broadcast(sketch), Seq("j", "cell"))
      .groupBy(col("tok"), col("n_exact"))
      .agg(min(col("cnt")).as("n_est"))
      .filter(col("n_est") < col("n_exact"))
      .count()
    assert(under === 0L, s"$under tokens undercounted — CMS invariant broken")
  }

  test("q119: transition matrix is row-stochastic and counts every transition") {
    val rows = Queries8.q119(spark, sf).collect()
    assert(rows.nonEmpty)
    val byPrev = rows.groupBy(_.getAs[String]("prev_type"))
    byPrev.foreach { case (prev, rs) =>
      val psum = rs.map(_.getAs[Double]("p")).sum
      assert(math.abs(psum - 1.0) < 1e-2, s"$prev: p sums to $psum")
    }
    val totalTransitions = rows.map(_.getAs[Long]("n")).sum
    val nEvents = Tables.events(spark, sf).count()
    val nUsers = Tables.events(spark, sf).select(col("user_id")).distinct().count()
    // each user contributes (its events - 1) transitions
    assert(totalTransitions === nEvents - nUsers)
  }

  test("q121: winsorized mean lies inside [lo, hi] and clipping is minority") {
    Queries8.q121(spark, sf).collect().foreach { r =>
      val lo = r.getAs[Double]("lo"); val hi = r.getAs[Double]("hi")
      val m = r.getAs[Double]("winsor_mean")
      assert(lo <= m && m <= hi, s"mean $m outside [$lo,$hi]")
      // p05/p95 clip by construction at most ~10% of the group
      assert(r.getAs[Long]("n_clipped").toDouble <=
        0.11 * r.getAs[Long]("n"))
    }
  }

  test("q120: retention is a valid fraction and boilerplate hits are bounded") {
    Queries8.q120(spark, sf).collect().foreach { r =>
      val ret = r.getAs[Double]("retention")
      assert(ret >= 0.0 && ret <= 1.0)
      assert(r.getAs[Long]("n_boiler") <= 20L)
      assert(r.getAs[Long]("n_boiler") <= r.getAs[Long]("n_shingles"))
    }
  }

  test("q118: shares are descending and sum to at most 1") {
    val rows = Queries8.q118(spark, sf).collect()
    assert(rows.length === 10)
    val counts = rows.map(_.getAs[Long]("n_events"))
    assert(counts.sameElements(counts.sorted.reverse), "not descending")
    assert(rows.map(_.getAs[Double]("share")).sum <= 1.0 + 1e-9)
  }

  test("q124: every cohort retains exactly 100% at offset 0") {
    val rows = Queries9.q124(spark, sf).collect()
    assert(rows.nonEmpty)
    val day0 = rows.filter(_.getAs[Int]("offset") == 0)
    assert(day0.nonEmpty)
    day0.foreach(r => assert(r.getAs[Double]("retention") === 1.0,
      s"cohort ${r.get(0)} day-0 retention ${r.get(3)}"))
  }

  test("q125: every emitted pair clears the 0.8 threshold") {
    Queries9.q125(spark, sf).collect().foreach { r =>
      assert(r.getAs[Double]("jaccard") >= 0.8)
    }
  }

  test("q128: merge keeps base+insert cardinality and bumps only change keys") {
    val out = Queries9.q128(spark, sf)
    val base = Tables.documents(spark, sf)
    val nBase = base.count()
    val nIns = base.filter(col("doc_id") % 100 === 0).count()
    assert(out.count() === nBase + nIns)
    val v2 = out.filter(col("version") === 2L)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(v2.forall(id => id % 50 == 0 || id >= 1000000L))
  }

  test("q129: at most 3 rows per language, ranks contiguous from 1") {
    val rows = Queries9.q129(spark, sf).collect()
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, rs) =>
      assert(rs.length <= 3, lang)
      assert(rs.map(_.getAs[Int]("rnk")).sorted
        .sameElements(1 to rs.length), lang)
    }
  }

  test("q130: pagerank mass is conserved (sums to 1 on the dup graph)") {
    // undirected graph => no dangling nodes => each iteration
    // redistributes all mass; 2 iterations keep the total at 1
    val total = Queries10.q130(spark, sf).collect()
      .map(_.getAs[Double]("pagerank")).sum
    assert(math.abs(total - 1.0) < 1e-3, s"pagerank mass $total")
  }

  test("q130: per-iteration localCheckpoint truncates the plan (no nested rounds)") {
    // the declared 2-iteration result must read the LAST round's
    // materialized ranks, not a plan that re-nests (and re-executes)
    // round 1 inside round 2 — at 20 iterations that nesting is the
    // difference between a scan and an exponential replay
    val plan = Queries10.pagerank(spark, sf, 3)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("LogicalRDD") || plan.contains("ExistingRDD"),
      s"expected a checkpoint scan at the root of:\n$plan")
    assert(!plan.contains("Join"),
      s"iteration joins leaked past the checkpoint:\n$plan")
  }

  test("q131: bm25 scores are positive and descending") {
    val rows = Queries10.q131(spark, sf).collect()
    assert(rows.nonEmpty)
    val scores = rows.map(_.getAs[Double]("bm25"))
    assert(scores.forall(_ > 0))
    assert(scores.sameElements(scores.sorted.reverse))
  }

  test("q132: recycled chunks are a valid subset of each doc's chunks") {
    Queries10.q132(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("n_recycled") <= r.getAs[Long]("n_chunks"))
      val f = r.getAs[Double]("recycled_frac")
      assert(f >= 0.0 && f <= 1.0)
    }
  }

  test("q136: the synthetic warehouse is FK-consistent (zero orphans)") {
    Queries11.q136(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("n_child") > 0, r.toString)
      assert(r.getAs[Long]("n_orphans") === 0L,
        s"${r.getAs[String]("relation")} has orphans")
    }
  }

  test("q138: disorder quantiles are ordered and the drop count bounded") {
    Queries11.q138(spark, sf).collect().foreach { r =>
      val (p50, p95, mx) = (r.getAs[Double]("p50_s"),
        r.getAs[Double]("p95_s"), r.getAs[Double]("max_s"))
      assert(p50 <= p95 && p95 <= mx, r.toString)
      assert(r.getAs[Long]("n_past_watermark") <= r.getAs[Long]("n"))
    }
  }

  test("q139: pair features are valid fractions and distances") {
    val rows = Queries12.q139(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lr = r.getAs[Double]("len_ratio")
      assert(lr > 0.0 && lr <= 1.0, r.toString)
      val ls = r.getAs[Double]("lev_sim")
      assert(ls >= 0.0 && ls <= 1.0, r.toString)
      assert(r.getAs[Int]("lev_dist") >= 0)
    }
  }

  test("q140: KL divergence is non-negative (Gibbs) for every source") {
    Queries12.q140(spark, sf).collect().foreach { r =>
      assert(r.getAs[Double]("kl_divergence") >= -1e-9, r.toString)
    }
  }

  test("q141: zipf fit covers min(100, vocab) tokens with a negative slope") {
    val vocab = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("t"))
      .distinct().count()
    val r = Queries12.q141(spark, sf).collect().head
    assert(r.getAs[Long]("n_tokens") === math.min(100L, vocab))
    assert(r.getAs[Double]("zipf_slope") < 0.0, r.toString)
  }

  test("q133: per-dimension stats are internally consistent") {
    val rows = Queries10.q133(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (mn, mx) = (r.getAs[Double]("min_x"), r.getAs[Double]("max_x"))
      val mean = r.getAs[Double]("mean")
      assert(mn <= mean + 1e-4 && mean <= mx + 1e-4, r.toString)
      assert(r.getAs[Double]("std") >= 0.0)
    }
  }
}
