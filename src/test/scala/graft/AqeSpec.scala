package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.{LeftAnti, LeftSemi}
import org.apache.spark.sql.functions._

/** Adaptive Query Execution compatibility — the cluster-default story
  * PERF.md argues (AQE re-plans at runtime: skew-join splitting,
  * partition coalescing, broadcast demotion/promotion) asserted
  * in-engine: the load-bearing plan shapes PlanSpec locks in under
  * the static planner must SURVIVE adaptive re-planning, and results
  * must be bit-identical with AQE on. Bench/Verify run with the
  * static planner for reproducibility; a 1000-executor deployment
  * runs with these flags on, so the declared plans must hold under
  * both. All assertions are STRUCTURAL tree matches via PlanCheck
  * (round-7 verdict item 6) — PlanCheck.nodes descends through
  * AdaptiveSparkPlanExec/QueryStageExec, so every check reads the
  * FINAL adaptive plan, never a rendered string.
  */
class AqeSpec extends SparkSpec {
  import PlanCheck._

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

  /** Execute under AQE and hand back the DataFrame whose
    * queryExecution now holds the FINAL adaptive plan (the one that
    * actually ran, not the initial static sketch).
    */
  private def ran(name: String): DataFrame = withAqe {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect()
    df
  }

  test("AQE: dimension broadcasts survive adaptive re-planning") {
    val df16 = ran("q16_enrich_join")
    assert(df16.queryExecution.executedPlan.isInstanceOf[
      org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec],
      "AQE did not wrap the plan — the suite is not testing what it claims")
    assert(broadcastHashJoins(df16).nonEmpty)
    assert(broadcastHashJoins(ran("q22_multi_join_agg")).nonEmpty)
  }

  test("AQE: semi/anti joins keep their no-payload-duplication shape") {
    import spark.implicits._
    assert(hasJoinType(ran("q23_semi_join"), LeftSemi))
    assert(hasJoinType(ran("q58_exists_subquery"), LeftSemi))
    // q24's anti join is EMPTY at the test SFs (every customer has an
    // order), and AQE's empty-relation propagation rightly collapses
    // the whole plan — the structural check exposed that the previous
    // string assertion was matching "LeftAnti" in the RENDERED initial
    // -plan section, i.e. it was vacuous. Assert the collapse is the
    // legitimate empty-input case...
    val df24 = ran("q24_anti_join")
    assert(hasJoinType(df24, LeftAnti) ||
      has[org.apache.spark.sql.execution.EmptyRelationExec](df24),
      "q24 final plan has neither a LeftAnti join nor the empty-collapse")
    // ...and prove LeftAnti SURVIVES adaptive re-planning when the
    // result is non-empty, on a planted anti join with survivors
    val left = spark.range(100).select($"id".as("k"))
    val right = spark.range(50).select($"id".as("k"))
    val anti = withAqe {
      val df = left.join(right, Seq("k"), "left_anti")
      assert(df.collect().length == 50)
      df
    }
    assert(hasJoinType(anti, LeftAnti),
      "planted non-empty anti join lost its LeftAnti under AQE")
  }

  test("AQE: top-k still plans TakeOrderedAndProject, not a global sort") {
    assert(hasTakeOrdered(ran("q26_topk_users")))
    assert(hasTakeOrdered(ran("q29_cosine_topk")))
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
      // structural: the final adaptive plan must hold a sort-merge
      // join whose isSkewJoin flag is set
      import org.apache.spark.sql.execution.joins.SortMergeJoinExec
      val skewed = collect[SortMergeJoinExec](joined).filter(_.isSkewJoin)
      assert(skewed.nonEmpty,
        "expected a skew-split SortMergeJoinExec in the final adaptive plan")
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
    val df186 = ran("q186_local_revenue")
    assert(!hasCartesian(df186) && !hasNestedLoop(df186))
    val df201 = ran("q201_nation_pair_trade")
    assert(!hasCartesian(df201) && !hasNestedLoop(df201))
    def rows(name: String): Seq[String] =
      SparkEntry.queries(name)(spark, sf).collect().map(_.toString).toSeq
    Seq("q186_local_revenue", "q201_nation_pair_trade").foreach { name =>
      val static = rows(name)
      val adaptive = withAqe(rows(name))
      assert(static == adaptive, s"$name diverged under AQE")
    }
  }
}
