package graft

import org.apache.spark.sql.functions._

/** Invariants and driver-side differentials for the round-10
  * statistical-test batch (Queries65). The DuckDB gate hash-proves
  * engine parity; these tests prove the STATISTICS are right —
  * variance decomposition against Spark's own var_pop, and the two
  * window-based diagnostics (Durbin-Watson, runs test) recomputed
  * naively on a collected per-type series.
  */
class StatTestsSpec extends SparkSpec {

  /** The daily count series for one event type, ordered — bounded by
    * the day span (≤ ~400 rows at any sf), the legitimate collect.
    */
  private def series(eventType: String): Seq[(Long, Long)] =
    Tables.events(spark, sf)
      .filter(col("event_type") === eventType)
      .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("x"))
      .orderBy(col("day"))
      .collect()
      .map(r => (r.getAs[Long]("day"), r.getAs[Long]("x")))
      .toSeq

  test("q289 ANOVA decomposes Spark's own total sum of squares") {
    val r = Queries65.q289(spark, sf).collect().head
    val ssb = r.getAs[Double]("ss_between")
    val ssw = r.getAs[Double]("ss_within")
    val n = r.getAs[Long]("n_total")
    assert(ssb >= 0 && ssw >= 0)
    assert(r.getAs[Long]("df1") + r.getAs[Long]("df2") == n - 1)
    val eta = r.getAs[Double]("eta_squared")
    assert(eta >= 0 && eta <= 1)
    // SSB + SSW must equal N·var_pop(value) (independent computation)
    val sst = Tables.events(spark, sf)
      .filter(col("event_type").isNotNull)
      .agg((var_pop(col("value")) * count(lit(1))).as("sst"))
      .collect().head.getAs[Double]("sst")
    assert(math.abs(ssb + ssw - sst) / sst < 1e-6,
      s"ssb=$ssb ssw=$ssw sst=$sst")
  }

  test("q290 Kruskal-Wallis H is tie-corrected upward and rank mass " +
    "is conserved") {
    val r = Queries65.q290(spark, sf).collect().head
    val h = r.getAs[Double]("h_stat")
    val cf = r.getAs[Double]("tie_correction")
    val hc = r.getAs[Double]("h_corrected")
    assert(h >= 0)
    assert(cf > 0 && cf <= 1)
    assert(hc >= h - 1e-9)
    assert(math.abs(hc - h / cf) < 1e-3)
    assert(r.getAs[Long]("n_total") == Tables.lineitem(spark, sf).count())
    assert(r.getAs[Long]("n_values") <= 50)
  }

  test("q291 Welch arms partition the stream; t sign follows the " +
    "mean difference") {
    val rows = Queries65.q291(spark, sf).collect()
    assert(rows.length >= 2)
    val total = Tables.events(spark, sf)
      .filter(col("event_type").isNotNull).count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n") + r.getAs[Long]("n_rest") == total)
      val md = r.getAs[Double]("mean_diff")
      val t = r.getAs[Double]("t_stat")
      assert(md.signum == t.signum || md == 0.0 || t == 0.0)
      val df = r.getAs[Double]("df")
      // Welch df is bracketed by min(n1,n0)−1 and n1+n0−2
      assert(df >= math.min(r.getAs[Long]("n"), r.getAs[Long]("n_rest")) - 1.0)
      assert(df <= total - 2.0)
    }
  }

  test("q292 Durbin-Watson matches a naive residual walk per type") {
    val rows = Queries65.q292(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val dw = r.getAs[Double]("dw_stat")
      assert(dw >= 0 && dw <= 4, s"DW out of range: $dw")
      assert(math.abs(r.getAs[Double]("rho1") - (1.0 - dw / 2.0)) < 1e-3)
      // naive recomputation: OLS fit then explicit residual deltas
      val et = r.getAs[String]("event_type")
      val ser = series(et)
      val t0 = ser.map(_._1).min
      val pts = ser.map { case (d, x) => ((d - t0).toDouble, x.toDouble) }
      val n = pts.length.toDouble
      val st = pts.map(_._1).sum; val sx = pts.map(_._2).sum
      val stx = pts.map(p => p._1 * p._2).sum
      val stt = pts.map(p => p._1 * p._1).sum
      val b = (n * stx - st * sx) / (n * stt - st * st)
      val a = (sx - b * st) / n
      val e = pts.map { case (t, x) => x - a - b * t }
      val dwNaive = e.sliding(2).map { case Seq(p, q) => (q - p) * (q - p) }
        .sum / e.map(v => v * v).sum
      assert(math.abs(dw - dwNaive) < 1e-3, s"$et: $dw vs naive $dwNaive")
    }
  }

  test("q293 runs test matches a naive sign-run count per type") {
    val rows = Queries65.q293(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val et = r.getAs[String]("event_type")
      val xs = series(et).map(_._2)
      val signs = xs.sliding(2).map { case Seq(p, q) => q - p }
        .filter(_ != 0).map(d => if (d > 0) 1 else -1).toSeq
      val runsNaive = 1 + signs.sliding(2).count {
        case Seq(p, q) => p != q; case _ => false }
      assert(r.getAs[Long]("n_up") == signs.count(_ == 1))
      assert(r.getAs[Long]("n_down") == signs.count(_ == -1))
      assert(r.getAs[Long]("n_runs") == runsNaive)
      val nRuns = r.getAs[Long]("n_runs")
      assert(nRuns >= 1 && nRuns <= r.getAs[Long]("n_moves"))
    }
  }

  test("q294 richness ratios are bounded and Guiraud dominates TTR") {
    val rows = Queries65.q294(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("total_types") <= r.getAs[Long]("total_tokens"))
      val ttr = r.getAs[Double]("avg_ttr")
      val g = r.getAs[Double]("avg_guiraud")
      assert(ttr > 0 && ttr <= 1.0)
      // V/√N ≥ V/N for N ≥ 1, so the means inherit the inequality
      assert(g >= ttr - 1e-9)
      val cttr = r.getAs[Double]("corpus_ttr")
      assert(cttr > 0 && cttr <= 1.0)
    }
    assert(rows.map(_.getAs[Long]("n_docs")).sum ==
      Tables.documents(spark, sf).count())
  }
}
