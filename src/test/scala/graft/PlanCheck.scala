package graft

import scala.reflect.ClassTag

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.ElementAt
import org.apache.spark.sql.catalyst.plans.JoinType
import org.apache.spark.sql.catalyst.plans.physical.{HashPartitioning, Partitioning, RangePartitioning, SinglePartition}
import org.apache.spark.sql.execution.{ExecSubqueryExpression, FileSourceScanExec, SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BaseJoinExec, BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec, SortMergeJoinExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Structural physical-plan assertions (round-7 verdict item 6): every
  * check walks the executed-plan TREE and matches operator classes /
  * fields, never the rendered plan string — a Spark upgrade that
  * changes plan rendering cannot rot these into vacuity, and a check
  * that stops matching fails loudly instead of silently passing.
  *
  * The walk descends through the adaptive wrappers
  * (AdaptiveSparkPlanExec → its CURRENT executedPlan, QueryStageExec →
  * its materialized plan, ReusedExchangeExec → the reused child), so
  * the same helpers serve PlanSpec (static planner) and AqeSpec
  * (final adaptive plans). It deliberately does NOT descend into
  * InMemoryTableScan cached-plan interiors — a cached segment's shape
  * is asserted where it is BUILT, not at every reuse site.
  */
object PlanCheck {

  /** All nodes of the plan tree, through adaptive wrappers. */
  def nodes(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case other => other.children
    }
    p +: kids.flatMap(nodes)
  }

  def nodes(df: DataFrame): Seq[SparkPlan] =
    nodes(df.queryExecution.executedPlan)

  def collect[T <: SparkPlan : ClassTag](df: DataFrame): Seq[T] =
    nodes(df).collect { case t: T => t }

  def has[T <: SparkPlan : ClassTag](df: DataFrame): Boolean =
    collect[T](df).nonEmpty

  def countOf[T <: SparkPlan : ClassTag](df: DataFrame): Int =
    collect[T](df).size

  /** Join types of every join operator in the tree (all join execs
    * extend BaseJoinExec except CartesianProductExec, which is
    * Inner by construction).
    */
  def joinTypes(df: DataFrame): Seq[JoinType] =
    nodes(df).collect { case j: BaseJoinExec => j.joinType }

  def hasJoinType(df: DataFrame, jt: JoinType): Boolean =
    joinTypes(df).contains(jt)

  def hasAnyJoin(df: DataFrame): Boolean =
    nodes(df).exists {
      case _: BaseJoinExec | _: CartesianProductExec => true
      case _ => false
    }

  def broadcastHashJoins(df: DataFrame): Seq[BroadcastHashJoinExec] =
    collect[BroadcastHashJoinExec](df)

  def hasCartesian(df: DataFrame): Boolean =
    has[CartesianProductExec](df)

  def hasNestedLoop(df: DataFrame): Boolean =
    has[BroadcastNestedLoopJoinExec](df)

  def hasSortMergeJoin(df: DataFrame): Boolean =
    has[SortMergeJoinExec](df)

  def hasTakeOrdered(df: DataFrame): Boolean =
    has[TakeOrderedAndProjectExec](df)

  def hasBroadcastExchange(df: DataFrame): Boolean =
    has[BroadcastExchangeExec](df)

  def hasWindow(df: DataFrame): Boolean = has[WindowExec](df)

  def hashAggCount(df: DataFrame): Int = countOf[HashAggregateExec](df)

  def objectHashAggCount(df: DataFrame): Int =
    countOf[ObjectHashAggregateExec](df)

  /** Shuffle output partitionings (the exchanges' target layout). */
  def shufflePartitionings(df: DataFrame): Seq[Partitioning] =
    collect[ShuffleExchangeExec](df).map(_.outputPartitioning)

  def hasHashShuffle(df: DataFrame): Boolean =
    shufflePartitionings(df).exists(_.isInstanceOf[HashPartitioning])

  def hasRangeShuffle(df: DataFrame): Boolean =
    shufflePartitionings(df).exists(_.isInstanceOf[RangePartitioning])

  def hasSinglePartitionShuffle(df: DataFrame): Boolean =
    shufflePartitionings(df).contains(SinglePartition)

  def shuffleCount(df: DataFrame): Int = countOf[ShuffleExchangeExec](df)

  /** True if some UNPARTITIONED WindowExec consumes a FACT-table file
    * scan with no aggregate in between — the one-task-at-100-TB plan
    * shape VERDICT r11 #3 banned (WindowExec with empty partitionSpec
    * moves ALL input to a single partition). An aggregate between the
    * scan and the window reduces the frame to aggregate scale (per-day
    * series, value histograms, decile tables — the permitted class);
    * tiny dims (region/nation) are exempt; cached/checkpointed
    * segments are not descended into (their shape is pinned where
    * built, per this object's convention).
    */
  def unpartitionedWindowOverFactScan(df: DataFrame): Boolean = {
    val facts = Set("lineitem", "orders", "events", "customer", "part",
      "supplier", "documents", "embeddings")
    def isFactScan(p: SparkPlan): Boolean = p match {
      case s: FileSourceScanExec =>
        s.relation.location.rootPaths.exists(p =>
          facts.contains(p.getName.stripSuffix(".parquet")) ||
            p.toString.contains("/events_us/")) // µs-normalized events
      case _ => false
    }
    def rawReach(p: SparkPlan): Boolean = p match {
      case _: HashAggregateExec | _: ObjectHashAggregateExec |
           _: org.apache.spark.sql.execution.aggregate.SortAggregateExec => false
      // limits bound the frame to k (or k per partition) rows — a
      // window above a top-k / rank-filter (WindowGroupLimit pushes
      // rank<=k BELOW the shuffle) sees bounded input at any scale
      case _: TakeOrderedAndProjectExec => false
      case _: org.apache.spark.sql.execution.GlobalLimitExec |
           _: org.apache.spark.sql.execution.LocalLimitExec |
           _: org.apache.spark.sql.execution.CollectLimitExec => false
      case _: org.apache.spark.sql.execution.window.WindowGroupLimitExec => false
      case s if isFactScan(s) => true
      case a: AdaptiveSparkPlanExec => rawReach(a.executedPlan)
      case q: QueryStageExec => rawReach(q.plan)
      case r: ReusedExchangeExec => rawReach(r.child)
      case other => other.children.exists(rawReach)
    }
    nodes(df).exists {
      case w: WindowExec if w.partitionSpec.isEmpty => rawReach(w.child)
      case _ => false
    }
  }

  /** File-source scans (parquet/csv/json) in the tree. */
  def fileScans(df: DataFrame): Seq[FileSourceScanExec] =
    collect[FileSourceScanExec](df)

  /** Union of column names the scans actually read (requiredSchema —
    * the structural form of the rendered ReadSchema line).
    */
  def readColumns(df: DataFrame): Set[String] =
    fileScans(df).flatMap(_.requiredSchema.fieldNames).toSet

  /** Per-scan pushed-filter rendering, read from each scan NODE's
    * metadata (not from the rendered whole-plan string): the one
    * stable surface Spark exposes for data-source pushdown.
    */
  def pushedFilters(df: DataFrame): String =
    fileScans(df).flatMap(_.metadata.get("PushedFilters")).mkString(";")

  /** File formats scanned, as simple class names
    * (CSVFileFormat / JsonFileFormat / ParquetFileFormat).
    */
  def scanFormats(df: DataFrame): Set[String] =
    fileScans(df).map(_.relation.fileFormat.getClass.getSimpleName).toSet

  /** Any subquery expression left in the physical tree (q57 asserts
    * decorrelation removed them all).
    */
  def hasSubqueryExpr(df: DataFrame): Boolean =
    nodes(df).exists(_.expressions.exists(_.exists {
      case _: ExecSubqueryExpression => true
      case _ => false
    }))

  /** Does any nested-loop join's condition include an element_at
    * probe (q110's bloom-bitset lookup fused into the join)?
    */
  def nestedLoopConditionHasElementAt(df: DataFrame): Boolean =
    collect[BroadcastNestedLoopJoinExec](df).exists(_.condition.exists(_.exists {
      case _: ElementAt => true
      case _ => false
    }))
}
