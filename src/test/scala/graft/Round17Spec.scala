package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-17 pins (VERDICT r16 #5 — the unpartitioned-window audit):
  *  - ScaleRank.withGlobalCumsum ≡ the single-partition running-sum
  *    window it replaces, on exact types (decimal and long), total
  *    order, including the grand-total column;
  *  - the q210 weighted-union degree histogram ≡ the two-pass
  *    hist + isolated-count form it replaced;
  *  - the q191/q213 value-histogram rank statistics ≡ the direct
  *    per-row rank-window forms they replaced (closed-form rank sums
  *    over tie runs).
  */
class Round17Spec extends SparkSpec {

  test("ScaleRank.withGlobalCumsum == single-partition cumsum window (decimal + total)") {
    val base = Tables.lineitem(spark, sf)
      .groupBy(col("l_partkey"))
      .agg(round(sum((col("l_extendedprice") *
        (lit(1.0) - col("l_discount"))).cast("decimal(38,10)")), 4)
        .cast("decimal(28,4)").as("rev"))
    val outCols = Seq("l_partkey", "rev", "cum", "tot").map(col)
    val viaScale = ScaleRank.withGlobalCumsum(base, col("rev"),
      "cum", "tot", col("rev").desc, col("l_partkey"))
      .select(outCols: _*)
    val w = Window.orderBy(col("rev").desc, col("l_partkey"))
    val viaWindow = base
      .withColumn("cum", sum(col("rev")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("tot", sum(col("rev")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(outCols: _*)
    assert(viaScale.count() == viaWindow.count())
    assert(viaScale.exceptAll(viaWindow).isEmpty &&
      viaWindow.exceptAll(viaScale).isEmpty)
  }

  test("ScaleRank.withGlobalCumsum == single-partition cumsum window (long, asc)") {
    val base = Tables.events(spark, sf)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    val outCols = Seq("user_id", "n", "cum", "tot").map(col)
    val viaScale = ScaleRank.withGlobalCumsum(base, col("n"),
      "cum", "tot", col("n"), col("user_id"))
      .select(outCols: _*)
    val w = Window.orderBy(col("n"), col("user_id"))
    val viaWindow = base
      .withColumn("cum", sum(col("n")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("tot", sum(col("n")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(outCols: _*)
    assert(viaScale.exceptAll(viaWindow).isEmpty &&
      viaWindow.exceptAll(viaScale).isEmpty)
  }

  test("q210 weighted-union degree histogram == two-pass hist + isolated form") {
    val pairs = LshStages.candidatePairs(spark, sf)
    // the pre-r17 shape, inline: degree per endpoint doc, histogram,
    // plus the (0, n_total - n_paired) isolated row
    val deg = pairs.select(col("a_id").as("doc_id"))
      .unionAll(pairs.select(col("b_id").as("doc_id")))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("degree"))
    val hist = deg.groupBy(col("degree")).agg(count(lit(1)).as("n_docs"))
    val isolated = Tables.documents(spark, sf)
      .agg(count(lit(1)).as("n_total"))
      .crossJoin(broadcast(deg.agg(count(lit(1)).as("n_paired"))))
      .select(lit(0L).as("degree"),
        (col("n_total") - col("n_paired")).as("n_docs"))
    val old = hist.unionByName(isolated)
    val now = Queries34.q210(spark, sf)
    assert(now.exceptAll(old).isEmpty && old.exceptAll(now).isEmpty)
  }

  test("q191 histogram closed-form rank sums == direct row_number windows") {
    val perUser = Tables.events(spark, sf).groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"))
    val direct = perUser
      .withColumn("i", row_number().over(
        Window.orderBy(col("n"), col("user_id"))))
      .withColumn("r", row_number().over(
        Window.orderBy(col("n").desc, col("user_id"))))
      .agg(count(lit(1)).as("n_users"), sum(col("n")).as("n_events"),
        sum((col("i").cast(DecimalType(19, 0)) * col("n"))
          .cast(DecimalType(38, 0))).as("ws"),
        sum(when(col("r") === 1, col("n")).otherwise(lit(0L))).as("top1"),
        sum(when(col("r") <= 10, col("n")).otherwise(lit(0L))).as("top10"))
    val d = direct.collect()(0)
    val out = Queries26.q191(spark, sf).collect()(0)
    assert(out.getAs[Long]("n_users") == d.getAs[Long]("n_users"))
    assert(out.getAs[Long]("n_events") == d.getAs[Long]("n_events"))
    // gini/top shares are pure functions of (n_users, n_events, ws,
    // top1, top10) — recompute them from the direct windows' exact
    // integers and compare the rounded outputs
    val nUsers = d.getAs[Long]("n_users").toDouble
    val nEvents = d.getAs[Long]("n_events").toDouble
    val ws = d.getAs[java.math.BigDecimal]("ws").doubleValue()
    val gini = BigDecimal(2.0 * ws / (nUsers * nEvents) -
      (nUsers + 1.0) / nUsers)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(out.getAs[Double]("gini") - gini) < 1e-9)
    val t1 = BigDecimal(d.getAs[Long]("top1").toDouble / nEvents)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val t10 = BigDecimal(d.getAs[Long]("top10").toDouble / nEvents)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(out.getAs[Double]("top1_share") - t1) < 1e-9)
    assert(math.abs(out.getAs[Double]("top10_share") - t10) < 1e-9)
  }

  test("withGlobalRankAuto: both branches dispatch and agree (conf-forced)") {
    val base = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_totalprice"))
    val key = "spark.graft.scaleRank.localBytes"
    def viaAuto() = ScaleRank.withGlobalRankAuto(base, "rn", "n_tot",
      col("o_totalprice"), col("o_orderkey"))
      .select(col("o_orderkey"), col("rn"), col("n_tot"))
    try {
      spark.conf.set(key, "0") // force the distributed branch
      val dist = viaAuto()
      // the range exchange lives inside the truncated (checkpointed)
      // lineage, invisible to the final plan — the distributed
      // branch's visible signature is the offsets broadcast join
      assert(PlanCheck.joinTypes(dist).nonEmpty,
        "localBytes=0 must take the distributed ScaleRank branch")
      val distRows = dist.collect().toSet
      spark.conf.set(key, String.valueOf(Long.MaxValue)) // force window
      val local = viaAuto()
      assert(PlanCheck.joinTypes(local).isEmpty,
        "huge localBytes must take the single-window branch")
      assert(local.collect().toSet == distRows)
    } finally spark.conf.unset(key)
  }

  test("q213 histogram AUC == direct rank()/count() window form") {
    val snap = Queries36.snapshot(spark, sf)
    val byScore = Window.orderBy(col("n_pre"))
    val direct = snap
      .withColumn("r_min", rank().over(byScore))
      .withColumn("ties", count(lit(1)).over(
        Window.partitionBy(col("n_pre"))))
      .withColumn("avg_rank",
        col("r_min").cast("double") +
          (col("ties") - lit(1)).cast("double") / 2.0)
      .agg(
        sum(when(!col("churned"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("churned"), 1L).otherwise(0L)).as("n_neg"),
        sum(when(!col("churned"), col("avg_rank")).otherwise(lit(0.0))
          .cast(DecimalType(38, 18))).as("rank_sum_pos"))
      .collect()(0)
    val out = Queries36.q213(spark, sf).collect()(0)
    assert(out.getAs[Long]("n_pos") == direct.getAs[Long]("n_pos"))
    assert(out.getAs[Long]("n_neg") == direct.getAs[Long]("n_neg"))
    val nPos = direct.getAs[Long]("n_pos").toDouble
    val nNeg = direct.getAs[Long]("n_neg").toDouble
    val rs = direct.getAs[java.math.BigDecimal]("rank_sum_pos").doubleValue()
    val auc = BigDecimal((rs - nPos * (nPos + 1.0) / 2.0) / (nPos * nNeg))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(out.getAs[Double]("auc") - auc) < 1e-9)
  }
}
