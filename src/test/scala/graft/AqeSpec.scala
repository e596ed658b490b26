package graft

import org.apache.spark.sql.execution.SimpleMode

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
}
