package graft

import org.apache.spark.sql.execution.SimpleMode
import org.apache.spark.sql.functions._

/** Adaptive Query Execution compatibility — the cluster-default story
  * PERF.md argues (AQE re-plans at runtime: skew-join splitting,
  * partition coalescing, broadcast demotion/promotion) asserted
  * in-engine: the load-bearing plan shapes PlanSpec locks in under
  * the static planner must SURVIVE adaptive re-planning, and results
  * must be bit-identical with AQE on. Bench/Verify run with the
  * static planner for reproducibility; a 1000-executor deployment
  * runs with these flags on, so the declared plans must hold under
  * both.
  */
class AqeSpec extends SparkSpec {

  private val flags = Map(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true")

  private def withAqe[T](f: => T): T = {
    val prior = flags.keys.map(k => k -> spark.conf.getOption(k)).toMap
    flags.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Execute under AQE, then read the FINAL adaptive plan (the one
    * that actually ran, not the initial static sketch).
    */
  private def ranPlan(name: String): String = withAqe {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect()
    df.queryExecution.explainString(SimpleMode)
  }

  test("AQE: dimension broadcasts survive adaptive re-planning") {
    val p16 = ranPlan("q16_enrich_join")
    assert(p16.contains("AdaptiveSparkPlan"), p16.take(200))
    assert(p16.contains("BroadcastHashJoin"), p16.take(400))
    val p22 = ranPlan("q22_multi_join_agg")
    assert(p22.contains("BroadcastHashJoin"), p22.take(400))
  }

  test("AQE: semi/anti joins keep their no-payload-duplication shape") {
    assert(ranPlan("q23_semi_join").contains("LeftSemi"))
    assert(ranPlan("q24_anti_join").contains("LeftAnti"))
    assert(ranPlan("q58_exists_subquery").contains("LeftSemi"))
  }

  test("AQE: top-k still plans TakeOrderedAndProject, not a global sort") {
    assert(ranPlan("q26_topk_users").contains("TakeOrderedAndProject"))
    assert(ranPlan("q29_cosine_topk").contains("TakeOrderedAndProject"))
  }

  test("AQE: a planted hot key triggers the skew-join split (isSkew in plan)") {
    import spark.implicits._
    // 200k rows on ONE key vs 64 rows spread over 64 keys: with the
    // skew thresholds lowered to test scale, AQE must mark the SMJ
    // skewed and split the hot partition — the runtime half of the
    // salting story (operators/Skew.scala is the planner-time half)
    val skewKeys = Map(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prior = skewKeys.keys.map(k => k -> spark.conf.getOption(k)).toMap
    skewKeys.foreach { case (k, v) => spark.conf.set(k, v) }
    try withAqe {
      val hot = spark.range(200000)
        .select(when(col("id") < 190000, lit(7L)).otherwise(col("id") % 64)
          .as("k"), col("id").as("v"))
      val dim = spark.range(64).select(col("id").as("k"),
        concat(lit("d"), col("id")).as("label"))
      val joined = hot.join(dim, Seq("k"))
      // collect() (not count()) so THIS DataFrame's adaptive plan is
      // the one that runs to its final form
      assert(joined.collect().length == 200000)
      // structural check (not plan-string matching, which is rendering-
      // version-dependent): walk the FINAL adaptive plan — descending
      // through AdaptiveSparkPlanExec and QueryStageExec, which are
      // LEAF nodes to plan.collect — and find a sort-merge join whose
      // isSkewJoin flag is set
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.joins.SortMergeJoinExec
      def skewJoins(p: SparkPlan): Seq[SortMergeJoinExec] = {
        val here = p match {
          case smj: SortMergeJoinExec if smj.isSkewJoin => Seq(smj)
          case _ => Seq.empty
        }
        val kids = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case q: QueryStageExec => Seq(q.plan)
          case other => other.children
        }
        here ++ kids.flatMap(skewJoins)
      }
      val executed = joined.queryExecution.executedPlan
      assert(skewJoins(executed).nonEmpty,
        s"expected a skew-split SortMergeJoinExec in:\n${executed.toString.take(1500)}")
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE: flagship and skew-safe results are identical with AQE on") {
    // same rows, same order, same values — adaptive re-planning must
    // be answer-invisible for deterministic (fully ordered) queries
    def rows(name: String): Seq[String] =
      SparkEntry.queries(name)(spark, sf).collect().map(_.toString).toSeq
    Seq("q22_multi_join_agg", "q28_sessionize", "q101_chunked_sessions")
      .foreach { name =>
        val static = rows(name)
        val adaptive = withAqe(rows(name))
        assert(static == adaptive, s"$name diverged under AQE")
      }
  }

  test("AQE: the round-7 TPC-H shapes keep equi-joins and identical results") {
    // Q5 (q186) and Q7 (q201): no cartesian/BNLJ may appear in the
    // final adaptive plan, and results must match the static planner
    val p186 = ranPlan("q186_local_revenue")
    assert(!p186.contains("CartesianProduct") &&
      !p186.contains("BroadcastNestedLoopJoin"), p186.take(400))
    val p201 = ranPlan("q201_nation_pair_trade")
    assert(!p201.contains("CartesianProduct") &&
      !p201.contains("BroadcastNestedLoopJoin"), p201.take(400))
    def rows(name: String): Seq[String] =
      SparkEntry.queries(name)(spark, sf).collect().map(_.toString).toSeq
    Seq("q186_local_revenue", "q201_nation_pair_trade").foreach { name =>
      val static = rows(name)
      val adaptive = withAqe(rows(name))
      assert(static == adaptive, s"$name diverged under AQE")
    }
  }
}
