package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Invariants for the round-9 operator batch (q273-q284). The DuckDB
  * gate proves value parity; these pin the mathematical contracts
  * (Lorenz monotonicity, correlation ranges, pair-count identities,
  * peeling monotonicity, JL unbiasedness, round-trip losslessness)
  * so a refactor can't keep a hash while breaking the semantics.
  */
class Round9Spec extends SparkSpec {

  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sf)

  test("q273: Lorenz curve is monotone to 1.0, Gini in [0,1), deciles partition customers") {
    val rows = q("q273_gini_lorenz").collect().sortBy(_.getAs[Int]("decile"))
    assert(rows.map(_.getAs[Int]("decile")).toSeq == (1 to 10))
    val shares = rows.map(_.getAs[Double]("lorenz_cum_share"))
    shares.sliding(2).foreach { case Array(a, b) => assert(b >= a); case _ => () }
    assert(math.abs(shares.last - 1.0) < 1e-9)
    // convexity of the empirical Lorenz curve: below the diagonal
    shares.zipWithIndex.foreach { case (s, i) =>
      assert(s <= (i + 1) / 10.0 + 1e-9, s"decile ${i + 1}: $s above diagonal")
    }
    val g = rows.head.getAs[Double]("gini")
    assert(rows.forall(_.getAs[Double]("gini") == g))
    assert(g >= 0.0 && g < 1.0)
    val total = rows.map(_.getAs[Long]("n_customers")).sum
    assert(total == Tables.orders(spark, sf)
      .select("o_custkey").distinct().count())
  }

  test("q274/q275: correlation statistics stay in range and agree in sign") {
    val sp = q("q274_spearman").collect().head
    val rho = sp.getAs[Double]("spearman_rho")
    assert(rho >= -1.0 && rho <= 1.0)
    val kt = q("q275_kendall_tau").collect().head
    val tau = kt.getAs[Double]("kendall_tau_b")
    assert(tau >= -1.0 && tau <= 1.0)
    // pair-count identity: C + D + all tie classes == n0 == n(n-1)/2
    val n0 = kt.getAs[Long]("n0")
    val parts = Seq("c", "disc", "tx", "ty", "txy")
      .map(kt.getAs[Long](_)).sum
    assert(parts == n0, s"$parts != $n0")
    val nDays = sp.getAs[Long]("n_days")
    assert(n0 == nDays * (nDays - 1) / 2)
    // both measure the same monotone association: same sign (or one ~0)
    assert(rho * tau >= 0.0 || math.abs(rho) < 0.1 || math.abs(tau) < 0.1)
  }

  test("q276: coefficient buckets cover [0,1] and partition the deg>=2 nodes") {
    val rows = q("q276_clustering_coef").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(b >= 0L && b <= 10L)
    }
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(rows.forall(_.getAs[Long]("n_nodes") == total))
    val mean = rows.head.getAs[Double]("mean_coef")
    assert(mean >= 0.0 && mean <= 1.0)
  }

  test("q277: peeling survivors are monotone in round and in k") {
    val rows = q("q277_kcore_peeling").collect()
      .map(r => (r.getAs[Int]("k"), r.getAs[Int]("round"),
        r.getAs[Long]("n_nodes_in"), r.getAs[Long]("n_edges_in")))
    assert(rows.length == 8)
    for (k <- 2 to 3) {
      val byRound = rows.filter(_._1 == k).sortBy(_._2)
      byRound.sliding(2).foreach {
        case Array(a, b) => assert(b._3 <= a._3 && b._4 <= a._4); case _ => ()
      }
    }
    // a 3-core is contained in the 2-core, round by round
    for (r <- 1 to 4) {
      val n2 = rows.find(x => x._1 == 2 && x._2 == r).get
      val n3 = rows.find(x => x._1 == 3 && x._2 == r).get
      assert(n3._3 <= n2._3 && n3._4 <= n2._4)
    }
  }

  test("q278: distortion histogram partitions the vectors; mean ratio near 1 (JL unbiased)") {
    val rows = q("q278_jl_projection").collect()
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(rows.forall(_.getAs[Long]("n_vecs") == total))
    assert(total == Tables.embeddings(spark, sf).count())
    val mean = rows.head.getAs[Double]("mean_ratio")
    assert(mean > 0.5 && mean < 1.5, s"mean distortion $mean")
  }

  test("q279: triples are canonical and support/lift well-formed") {
    val rows = q("q279_brand_triples").collect()
    rows.foreach { r =>
      val (a, b, c) = (r.getAs[String]("brand_a"), r.getAs[String]("brand_b"),
        r.getAs[String]("brand_c"))
      assert(a < b && b < c, s"non-canonical triple $a,$b,$c")
      assert(r.getAs[Long]("n_abc") >= 5L)
      assert(r.getAs[Double]("support") > 0.0 &&
        r.getAs[Double]("support") <= 1.0)
      assert(r.getAs[Double]("lift3") > 0.0)
    }
  }

  test("q280: the split partitions the day range and maximizes a nonnegative gain") {
    val r = q("q280_binary_segmentation").collect().head
    val nDays = Tables.orders(spark, sf)
      .select(expr(
        "unix_micros(cast(o_orderdate as timestamp)) div 86400000000"))
      .distinct().count()
    assert(r.getAs[Long]("n_left") + r.getAs[Long]("n_right") == nDays)
    assert(r.getAs[Double]("gain_sq") >= 0.0)
  }

  test("q281: Good-Turing masses are probabilities and the census is consistent") {
    val rows = q("q281_good_turing").collect().sortBy(_.getAs[Long]("r"))
    // only the r values present in the census appear; all lie in 1..5
    // and include the singleton row (sparse 5-grams guarantee N₁ > 0)
    val rs = rows.map(_.getAs[Long]("r")).toSeq
    assert(rs.nonEmpty && rs.head == 1L && rs.forall(r => r >= 1L && r <= 5L))
    assert(rs == rs.sorted && rs.distinct == rs)
    val p0 = rows.head.getAs[Double]("p0_unseen")
    assert(rows.forall(_.getAs[Double]("p0_unseen") == p0))
    assert(p0 > 0.0 && p0 < 1.0)
    rows.foreach { r =>
      assert(r.getAs[Long]("nr") > 0L)
      assert(r.getAs[Double]("r_star") >= 0.0)
    }
  }

  test("q282: the merge strictly shortens affected tokens and the audit is self-consistent") {
    val r = q("q282_bpe_merge_step").collect().head
    assert(r.getAs[String]("merged_pair").length == 2)
    assert(r.getAs[Long]("total_merges") >= r.getAs[Long]("n_tokens_affected"))
    assert(r.getAs[Long]("n_tokens_affected") >= r.getAs[Long]("n_types_affected"))
    assert(r.getAs[Double]("avg_len_after") < r.getAs[Double]("avg_len_before"))
  }

  test("q283/q284: format round-trips are lossless vs direct parquet rollups") {
    // Avro: compare the round-tripped rollup to the same rollup
    // computed directly from the source table
    val direct283 = Tables.orders(spark, sf)
      .groupBy(date_format(col("o_orderdate").cast("timestamp"), "yyyy-MM")
        .as("month"))
      .agg(count(lit(1)).as("n_orders"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rt283 = q("q283_avro_roundtrip").collect()
      .map(r => r.getAs[String]("month") -> r.getAs[Long]("n_orders")).toMap
    assert(rt283 == direct283)
    val direct284 = Tables.supplier(spark, sf).count()
    val rt284 = q("q284_xml_roundtrip").collect()
      .map(_.getAs[Long]("n_suppliers")).sum
    assert(rt284 == direct284)
  }
}
