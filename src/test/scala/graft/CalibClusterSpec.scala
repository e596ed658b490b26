package graft

import org.apache.spark.sql.functions._

/** Invariants and driver-side differentials for the round-10 batch-3
  * operators (Queries66): repetition-audit mass conservation, the
  * lead–lag scan against a naive driver recomputation, l-diversity
  * partition totals, the Brier decomposition against a per-user
  * naive Brier AND its Murphy identity, and the Lloyd step against a
  * brute-force driver k-means iteration on the real vectors.
  */
class CalibClusterSpec extends SparkSpec {

  test("q295 repetition audit: bounds, mass conservation, share consistency") {
    val rows = Queries66.q295(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nDocs = r.getAs[Long]("n_docs")
      val nFlag = r.getAs[Long]("n_flagged")
      val dupBi = r.getAs[Long]("dup_bigrams")
      val totBi = r.getAs[Long]("total_bigrams")
      val share = r.getAs[Double]("dup_bigram_share")
      assert(nFlag <= nDocs)
      assert(dupBi >= 0 && dupBi <= totBi)
      assert(share >= 0.0 && share <= 1.0)
      assert(math.abs(dupBi.toDouble / totBi - share) < 5e-7)
      assert(r.getAs[Double]("mean_dup_bigram") >= 0.0)
      assert(r.getAs[Double]("mean_dup_trigram") >= 0.0)
    }
    // doc partition: every doc with >=3 tokens is counted exactly once
    val expected = Tables.documents(spark, sf)
      .filter(size(expr("filter(split(text, ' '), w -> length(w) > 0)")) >= 3)
      .count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == expected)
  }

  test("q296 lead-lag scan matches a naive driver recomputation") {
    val rows = Queries66.q296(spark, sf).collect()
    assert(rows.length == 8)
    assert(rows.count(_.getAs[Boolean]("is_best")) == 1)
    rows.foreach { r =>
      Option(r.getAs[java.lang.Double]("lag_corr")).foreach(c =>
        assert(c >= -1.0 && c <= 1.0))
    }
    // naive recomputation of every lag from the collected daily frame
    val daily = Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
        .as("x"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("y"))
      .collect()
      .map(r => (r.getAs[Long]("day"), (r.getAs[Long]("x"), r.getAs[Long]("y"))))
      .toMap
    rows.foreach { r =>
      val lag = r.getAs[Long]("lag")
      val pairs = daily.keys.toSeq.sorted.flatMap(d =>
        daily.get(d + lag).map(t => (daily(d)._1, t._2)))
      assert(r.getAs[Long]("n_days") == pairs.length)
      if (pairs.length >= 3) {
        val n = pairs.length.toDouble
        val sx = pairs.map(_._1).sum.toDouble
        val sy = pairs.map(_._2).sum.toDouble
        val sxy = pairs.map(p => p._1 * p._2).sum.toDouble
        val sxx = pairs.map(p => p._1 * p._1).sum.toDouble
        val syy = pairs.map(p => p._2 * p._2).sum.toDouble
        val den = math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
        if (den > 0) {
          val naive = (n * sxy - sx * sy) / den
          val got = r.getAs[Double]("lag_corr")
          assert(math.abs(naive - got) < 5e-5, s"lag $lag: $naive vs $got")
        }
      }
    }
  }

  test("q297 l-diversity histogram partitions the corpus") {
    val rows = Queries66.q297(spark, sf).collect()
    assert(rows.nonEmpty)
    val expected = Tables.documents(spark, sf)
      .filter(col("lang").isNotNull).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == expected)
    rows.foreach { r =>
      assert(r.getAs[Long]("l") >= 1)
      assert(r.getAs[Long]("n_c2_fail") <= r.getAs[Long]("n_cells"))
    }
    assert(math.abs(rows.map(_.getAs[Double]("docs_share")).sum - 1.0) < 1e-3)
  }

  test("q298 Brier equals the naive per-user score; Murphy identity holds") {
    val r = Queries66.q298(spark, sf).collect().head
    val brier = r.getAs[Double]("brier")
    val rel = r.getAs[Double]("reliability")
    val res = r.getAs[Double]("resolution")
    val unc = r.getAs[Double]("uncertainty")
    assert(brier >= 0.0 && brier <= 1.0)
    assert(rel >= 0.0 && unc >= 0.0 && unc <= 0.25)
    // Murphy 1973: Brier = REL - RES + UNC (up to the declared 6dp
    // per-bin rounding; gap must reconcile the two)
    assert(math.abs(r.getAs[Double]("decomp_gap")) < 1e-3)
    assert(math.abs(brier - (rel - res + unc) -
      r.getAs[Double]("decomp_gap")) < 1e-5)
    // naive differential: per-user (f - y)^2 averaged over the test arm
    val snap = Queries36.snapshot(spark, sf)
      .withColumn("bin", least(expr("n_pre div 10"), lit(8L)))
      .withColumn("arm", pmod(col("user_id"), lit(2L)))
      .select(col("bin"), col("arm"), col("churned")).collect()
      .map(x => (x.getAs[Long]("bin"), x.getAs[Long]("arm"),
        if (x.getAs[Boolean]("churned")) 1.0 else 0.0))
    val f = snap.filter(_._2 == 0).groupBy(_._1).map { case (b, xs) =>
      b -> BigDecimal(xs.map(_._3).sum / xs.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val test = snap.filter(t => t._2 == 1 && f.contains(t._1))
    val naive = test.map(t => math.pow(f(t._1) - t._3, 2)).sum / test.size
    assert(math.abs(naive - brier) < 5e-5, s"naive $naive vs $brier")
  }

  test("q299 Lloyd step equals a brute-force driver iteration") {
    val rows = Queries66.q299(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 4)
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getAs[Seq[Float]]("embedding").toArray))
    assert(rows.map(_.getAs[Long]("n")).sum == vecs.length)
    // seeds exactly as the query draws them (md5 order, id tiebreak)
    val seeds = Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        functions.Text.md5Long(concat(lit("kmseed:"),
          col("vec_id").cast("string"))).as("h"))
      .collect().map(r => (r.getAs[Long]("h"), r.getAs[Long]("vec_id")))
      .sorted.take(4).map(_._2)
    val seedVec = vecs.toMap.view.filterKeys(seeds.contains).toMap
    // brute-force assignment in the SAME floor(d2*1e8) fixed point
    def d2(a: Array[Float], b: Array[Float]): Long =
      a.zip(b).map { case (x, m) =>
        val dd = x.toDouble - m.toDouble
        math.floor(dd * dd * 1e8).toLong
      }.sum
    val assign = vecs.map { case (id, v) =>
      val (bd, seed) = seeds.map(sd => (d2(v, seedVec(sd)), sd)).min
      (id, seed, bd)
    }
    val byCluster = assign.groupBy(_._2)
    rows.foreach { r =>
      val c = r.getAs[Long]("cluster")
      val members = byCluster.getOrElse(c, Array.empty)
      assert(r.getAs[Long]("n") == members.length, s"cluster $c size")
      val inertia = members.map(_._3).sum / 1e8
      assert(math.abs(r.getAs[Double]("inertia") - inertia) < 1e-3,
        s"cluster $c inertia")
      // centroid shift against a naive double recomputation
      val dims = seedVec(c).length
      val mu = Array.tabulate(dims)(j =>
        members.map(m => vecs.toMap.apply(m._1)(j).toDouble).sum /
          members.length)
      val shift = math.sqrt(mu.zip(seedVec(c)).map { case (a, b) =>
        val dd = a - b.toDouble; dd * dd
      }.sum)
      assert(math.abs(r.getAs[Double]("centroid_shift") - shift) < 1e-3,
        s"cluster $c shift")
    }
  }
}
