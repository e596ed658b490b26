package graft

import java.math.{BigDecimal => JBig, MathContext, RoundingMode}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Invariants + plan shapes for the round-8 statistics/mining batch
  * (q234-q245). The DuckDB gate proves value parity; these tests pin
  * the mathematical contracts (monotone survival, probability ranges,
  * fold exactness vs an independent BigDecimal replay) and the scale
  * shapes (no data×data cartesian, broadcast dimensions) so a
  * refactor can't keep the hash while breaking the semantics the
  * numbers rely on.
  */
class StatsSpec extends SparkSpec {
  import PlanCheck._

  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sf)

  // ---- association rules / CF -------------------------------------

  test("q234: directed rules come in symmetric n_ab pairs, support/conf/lift in range") {
    val rows = q("q234_assoc_rules").collect()
    val byPair = rows.map(r => ((r.getAs[String]("antecedent"),
      r.getAs[String]("consequent")), r.getAs[Long]("n_ab"))).toMap
    byPair.foreach { case ((a, b), n) =>
      assert(byPair.get((b, a)).contains(n), s"asymmetric pair $a↔$b")
    }
    rows.foreach { r =>
      assert(r.getAs[Double]("support") > 0 && r.getAs[Double]("support") <= 1)
      assert(r.getAs[Double]("confidence") > 0 && r.getAs[Double]("confidence") <= 1)
      assert(r.getAs[Double]("lift") > 0)
    }
  }

  test("q234/q235: pair expansion never plans a data-by-data cartesian") {
    assert(!hasCartesian(q("q234_assoc_rules")))
    assert(!hasCartesian(q("q235_item_cf")))
    assert(hasBroadcastExchange(q("q234_assoc_rules")))
  }

  test("q235: at most 3 neighbors per brand, ranks are 1..k contiguous") {
    val rows = q("q235_item_cf").collect()
    rows.groupBy(_.getAs[String]("brand")).foreach { case (b, rs) =>
      val ranks = rs.map(_.getAs[Int]("rk")).sorted
      assert(ranks.length <= 3 && ranks.sameElements(1 to ranks.length), s"$b: ${ranks.toSeq}")
    }
    rows.foreach(r => assert(r.getAs[Double]("cosine") > 0 &&
      r.getAs[Double]("cosine") <= 1.0))
  }

  // ---- chi-square / KS / stump ------------------------------------

  test("q236: per-type parts sum to the total chi2 (within 4dp rounding slack)") {
    val rows = q("q236_chi2_independence").collect()
    val total = rows.head.getAs[Double]("chi2_total")
    assert(rows.forall(_.getAs[Double]("chi2_total") == total))
    val partSum = rows.map(_.getAs[Double]("chi2_part")).sum
    assert(math.abs(partSum - total) < 1e-3, s"$partSum vs $total")
    assert(rows.head.getAs[Long]("dof") > 0)
  }

  test("q238: KS statistic and its exact numerator are consistent and in range") {
    val r = q("q238_ks_test").collect().head
    val n1 = r.getAs[Long]("n1"); val n2 = r.getAs[Long]("n2")
    val dnum = r.getAs[Long]("d_num"); val d = r.getAs[Double]("d_stat")
    assert(dnum >= 0 && dnum <= n1 * n2)
    assert(d >= 0.0 && d <= 1.0)
    assert(math.abs(d - dnum.toDouble / (n1 * n2)) < 1e-4)
  }

  test("q239: gains are in [0,1] bits for a binary label and splits partition the data") {
    val rows = q("q239_stump_split").collect()
    rows.foreach { r =>
      assert(r.getAs[Double]("gain_bits") >= 0.0 &&
        r.getAs[Double]("gain_bits") <= 1.0)
      assert(r.getAs[Long]("n_left") + r.getAs[Long]("n_right") ==
        rows.head.getAs[Long]("n_left") + rows.head.getAs[Long]("n_right"))
    }
  }

  // ---- Kaplan-Meier -----------------------------------------------

  test("q237: KM curve is monotone, bounded, and exactly replays the e8 integer fold") {
    val rows = q("q237_kaplan_meier").collect().sortBy(_.getAs[Long]("t"))
    assert(rows.nonEmpty)
    // monotone non-increasing survival and risk set
    val survs = rows.map(_.getAs[Double]("surv"))
    survs.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a, s"surv increased $a -> $b")
    }
    val risks = rows.map(_.getAs[Long]("n_risk"))
    risks.sliding(2).foreach { case Array(a, b) => assert(b <= a) }
    // independent replay of the fixed-point fold:
    // s_e8 ← (s_e8 · ((n−d)·10⁸ div n)) div 10⁸
    var s8 = 100000000L
    rows.foreach { r =>
      val n = r.getAs[Long]("n_risk"); val d = r.getAs[Long]("d")
      s8 = s8 * (((n - d) * 100000000L) / n) / 100000000L
      val got = r.getAs[Double]("surv")
      assert(got == s8.toDouble / 1e8, s"t=${r.getAs[Long]("t")}: $got != $s8")
    }
  }

  // ---- resampling -------------------------------------------------

  test("q240: bootstrap interval brackets the point estimate") {
    val r = q("q240_bootstrap_ci").collect().head
    assert(r.getAs[Long]("n_boot") == 200L)
    val lo = r.getAs[Double]("ci_lo"); val hi = r.getAs[Double]("ci_hi")
    val theta = r.getAs[Double]("theta_hat")
    assert(lo <= hi)
    assert(theta >= lo - math.abs(theta) && theta <= hi + math.abs(theta))
  }

  test("q241: permutation p-value is a valid randomization probability") {
    val r = q("q241_permutation_test").collect().head
    val p = r.getAs[Double]("p_value")
    assert(r.getAs[Long]("n_perm") == 499L)
    assert(p > 0.0 && p <= 1.0)
    assert(r.getAs[Long]("n_extreme") >= 0 &&
      r.getAs[Long]("n_extreme") <= 499)
  }

  test("q242: segment counts partition the customer base") {
    val rows = q("q242_rfm_segments").collect()
    val total = rows.map(_.getAs[Long]("n_customers")).sum
    val nCust = Tables.orders(spark, sf)
      .select("o_custkey").distinct().count()
    assert(total == nCust, s"$total vs $nCust")
  }

  // ---- CV / graph / alignment -------------------------------------

  test("q244: held-out folds partition orders; accuracies are probabilities") {
    val rows = q("q244_cv_stump").collect()
    assert(rows.length == 5)
    val testTotal = rows.map(_.getAs[Long]("test_n")).sum
    assert(testTotal == Tables.orders(spark, sf).count())
    rows.foreach { r =>
      assert(r.getAs[Double]("test_acc") >= 0.0 &&
        r.getAs[Double]("test_acc") <= 1.0)
      assert(r.getAs[Double]("baseline_acc") >= 0.0 &&
        r.getAs[Double]("baseline_acc") <= 1.0)
    }
  }

  test("q243: predicted links are genuine NON-edges of the support-2 graph") {
    val preds = q("q243_adamic_adar")
      .select("part_a", "part_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val edges = Queries40.coOrderEdges(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    preds.foreach { case (a, b) =>
      assert(a < b, s"pair not canonical: ($a,$b)")
      assert(!edges.contains((a, b)), s"predicted an existing edge ($a,$b)")
    }
  }

  test("q246: outlier scores are positive and returned in strict rank order") {
    val rows = q("q246_mahalanobis_outliers").collect()
    assert(rows.length == 20)
    val scores = rows.map(_.getAs[Double]("m2_score"))
    scores.sliding(2).foreach { case Array(a, b) => assert(b <= a); case _ => () }
    assert(scores.forall(_ > 0.0))
  }

  test("q247: isotonic fit is monotone non-decreasing and preserves the total") {
    val rows = q("q247_isotonic_calibration").collect()
      .sortBy(_.getAs[Int]("decile"))
    val iso = rows.map(_.getAs[Double]("iso_rate"))
    iso.sliding(2).foreach { case Array(a, b) => assert(b >= a, s"$a -> $b"); case _ => () }
    // PAVA preserves the weighted mean: Σ n_i·iso_i ≈ Σ pos_i
    val fitted = rows.map(r => r.getAs[Long]("n") * r.getAs[Double]("iso_rate")).sum
    val actual = rows.map(_.getAs[Long]("pos")).sum.toDouble
    assert(math.abs(fitted - actual) / actual < 0.01, s"$fitted vs $actual")
  }

  test("q248: conformal coverage lands near the 90% target on every type") {
    val rows = q("q248_conformal_coverage").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val c = r.getAs[Double]("coverage")
      assert(c >= 0.75 && c <= 1.0,
        s"${r.getAs[String]("event_type")}: coverage $c")
      assert(r.getAs[Double]("qhat") > 0.0)
    }
  }

  test("q249: level-0 Haar coefficient is the exact series total per type") {
    val rows = q("q249_haar_energy").collect()
    val dc = rows.filter(_.getAs[Long]("level") == 0L)
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("max_abs"))
      .toMap
    val totals = Tables.events(spark, sf)
      .filter(col("event_type").isNotNull)
      .groupBy(col("event_type"))
      .agg((round(sum(col("value").cast("decimal(38,10)")), 4) *
        lit(10000)).cast("long").as("tot"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    totals.foreach { case (t, tot) =>
      assert(dc(t) == math.abs(tot), s"$t: dc=${dc(t)} total=$tot")
    }
    // detail levels halve in length: 16, 8, 4, 2, 1
    rows.filter(_.getAs[Long]("level") > 0L)
      .groupBy(_.getAs[Long]("level")).foreach { case (l, rs) =>
        assert(rs.head.getAs[Int]("n_coeffs") == 32 >> l.toInt)
      }
  }

  test("q250: BFS histogram partitions the node set; distances contiguous from 0") {
    val rows = q("q250_bfs_hops").collect()
    val total = rows.map(_.getAs[Long]("n_parts")).sum
    val nNodes = Queries40.coOrderEdges(spark, sf)
      .select("u").distinct().count()
    assert(total == nNodes, s"$total vs $nNodes")
    val dists = rows.map(_.getAs[Long]("dist")).filter(_ >= 0).sorted
    assert(dists.headOption.contains(0L))
    dists.sliding(2).foreach {
      case Array(a, b) => assert(b == a + 1, s"gap $a -> $b"); case _ => ()
    }
  }

  test("q270: authorities are a normalized distribution over parts") {
    val top = q("q270_hits_authorities").collect()
    assert(top.length == 10)
    val as = top.map(_.getAs[Double]("authority"))
    as.sliding(2).foreach {
      case Array(a, b) => assert(b <= a); case _ => ()
    }
    assert(as.forall(_ > 0.0))
    // top-10 of an L1-normalized (floor-scaled) vector can't exceed 1
    assert(as.sum <= 1.0 + 1e-6)
  }

  test("q264: kept rates track 1/cluster-size within binomial noise") {
    val rows = q("q264_dup_weighted_sample").collect()
    val singleton = rows.find(_.getAs[Long]("cluster_size") == 1L).get
    assert(singleton.getAs[Long]("n_kept") == singleton.getAs[Long]("n_docs"),
      "singletons must always be kept")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_docs"))
    }
  }

  test("q247/q261: evaluation scores stay in their defined ranges") {
    q("q261_silhouette").collect().foreach { r =>
      val m = r.getAs[Double]("mean_silhouette")
      assert(m >= -1.0 && m <= 1.0)
    }
    q("q266_markov_eval").collect().foreach { r =>
      assert(r.getAs[Double]("top1_acc") >= 0.0 &&
        r.getAs[Double]("top1_acc") <= 1.0)
    }
  }

  test("q245: decile mappings are complete and monotone per source") {
    val rows = q("q245_quantile_normalize").collect()
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
      val ds = rs.map(_.getAs[Long]("decile")).sorted
      assert(ds.sameElements(1L to 10L), s"$src deciles: ${ds.toSeq}")
      val sorted = rs.sortBy(_.getAs[Long]("decile"))
      sorted.map(_.getAs[Long]("src_value")).sliding(2).foreach {
        case Array(a, b) => assert(b >= a); case _ => ()
      }
      sorted.map(_.getAs[Long]("pooled_value")).sliding(2).foreach {
        case Array(a, b) => assert(b >= a); case _ => ()
      }
    }
  }
}
