package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe global total-order ranking (VERDICT r11 #3).
  *
  * `row_number()/ntile().over(Window.orderBy(...))` with no partitionBy
  * plans WindowExec on ONE partition — fine at sf0.1, a single-task
  * serialization point on fact-scale input at 100 TB. The distributed
  * equivalent, result-identical by construction:
  *
  *   1. `repartitionByRange(k, sort…)` + local sort — disjoint,
  *      ordered key ranges (ties colocated: the RangePartitioner
  *      routes per key value), each range sorted in place;
  *   2. partition-local rank decoded from
  *      `monotonically_increasing_id()` — (pid << 33) | position,
  *      position order = sort order, so NO WindowExec and no extra
  *      pid-clustering exchange;
  *   3. per-partition counts (k rows) → cumulative offsets + total n,
  *      broadcast back: global rank = offset(pid) + local rank.
  *
  * The ranked frame is MATERIALIZED (Materialize.truncate) before the
  * offset aggregate: range boundaries come from sampling, so the frame
  * must be evaluated exactly once — two independent evaluations (one
  * for offsets, one for the join) could legally draw different
  * boundaries and mis-align rank arithmetic. ReusedExchange would
  * usually cover it, but exchange reuse is an optimization, not a
  * contract (PERF.md: the q125 reuse claim rotted once already).
  * WHERE the boundaries land never affects the answer — only balance —
  * because rank = offset + local rank is exact for any disjoint ordered
  * partitioning; the sort columns must form a TOTAL order (include a
  * tiebreaker) for the rank itself to be well-defined.
  *
  * Residual windows are scale-safe: the local row_number partitions by
  * pid (k ≈ shuffle partitions, each a task), and the offset cumsum is
  * unpartitioned but over exactly k rows — the aggregate-frame class.
  */
object ScaleRank {

  /** df + rankName (LongType, 1-based global rank over `sort`) +
    * nName (LongType, total row count) — the (rank, n) pair every rank
    * statistic (ntile, percentile index) is a closed form of.
    */
  def withGlobalRank(df: DataFrame, rankName: String, nName: String,
      sort: Column*): DataFrame = {
    val k = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // local rank WITHOUT a WindowExec: after the range exchange + local
    // sort, monotonically_increasing_id() is (partition id << 33) |
    // within-partition position — position order IS the sort order, so
    // pid and local rank decode from the id with two bit ops (no extra
    // hash exchange to cluster by pid, no window sort)
    val ranked = Materialize.truncate(
      df.repartitionByRange(k, sort: _*)
        .sortWithinPartitions(sort: _*)
        .withColumn("_gr_mid", monotonically_increasing_id())
        .withColumn("_gr_pid", shiftright(col("_gr_mid"), 33).cast("int"))
        .withColumn("_gr_lrn",
          col("_gr_mid").bitwiseAND(lit((1L << 33) - 1)) + lit(1L))
        .drop("_gr_mid"))
    val offs = ranked.groupBy(col("_gr_pid"))
      .agg(count(lit(1)).as("_gr_cnt"))
      .withColumn("_gr_off", coalesce(sum(col("_gr_cnt")).over(
        Window.orderBy(col("_gr_pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn(nName, sum(col("_gr_cnt")).over(
        Window.orderBy(col("_gr_pid")).rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("_gr_pid"), col("_gr_off"), col(nName))
    ranked.join(broadcast(offs), Seq("_gr_pid"))
      .withColumn(rankName,
        (col("_gr_off") + col("_gr_lrn")).cast("long"))
      .drop("_gr_pid", "_gr_lrn", "_gr_off")
  }

  /** The adaptive split (round 17, the q17 writeTaskCount convention):
    * below spark.graft.scaleRank.localBytes (default 64 MB) of
    * optimizer-estimated input, the classic single-partition window is
    * planned — one task sorting ≤64 MB of aggregate rows costs less
    * than the range exchange + offset broadcast machinery (measured at
    * sf0.1: q242 5 → 24 stage-jobs / 0.7 → 2.2 s under unconditional
    * ScaleRank) — and above it the distributed form is mandatory (a
    * fact-scale single-task sort is the 100 TB serialization point
    * VERDICT r16 #5 banned). Results are identical on either branch:
    * Round12Spec pins rank/ntile ≡ the window builtins, Round17Spec
    * pins the cumsum twin and both Auto branches.
    */
  private def useLocalWindow(df: DataFrame): Boolean = {
    val limit = df.sparkSession.conf
      .getOption("spark.graft.scaleRank.localBytes")
      .map(_.toLong).getOrElse(64L << 20)
    df.queryExecution.optimizedPlan.stats.sizeInBytes <= limit
  }

  /** Adaptive global rank: window form under the size threshold,
    * distributed `withGlobalRank` above it. Same (rank, n) columns,
    * same LongType, same values.
    */
  def withGlobalRankAuto(df: DataFrame, rankName: String, nName: String,
      sort: Column*): DataFrame =
    if (useLocalWindow(df))
      df.withColumn(rankName,
          row_number().over(Window.orderBy(sort: _*)).cast("long"))
        .withColumn(nName,
          count(lit(1)).over(Window.partitionBy(lit(1))))
    else withGlobalRank(df, rankName, nName, sort: _*)

  /** Adaptive global running sum: window form under the size
    * threshold, distributed `withGlobalCumsum` above it.
    */
  def withGlobalCumsumAuto(df: DataFrame, value: Column, cumName: String,
      totName: String, sort: Column*): DataFrame =
    if (useLocalWindow(df)) {
      val w = Window.orderBy(sort: _*)
      df.withColumn(cumName, sum(value).over(
          w.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn(totName, sum(value).over(
          w.rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)))
    } else withGlobalCumsum(df, value, cumName, totName, sort: _*)

  /** Scale-safe global running sum (round 17 — the cumsum twin of
    * `withGlobalRank`): replaces
    * `sum(v).over(Window.orderBy(sort…).rowsBetween(unboundedPreceding,
    * currentRow))` — WindowExec on ONE partition at fact scale — with
    * the distributed equivalent:
    *
    *   1. range exchange + local sort (disjoint ordered key ranges);
    *   2. per-partition partial sums (k rows) → cumulative offsets +
    *      grand total, broadcast back;
    *   3. cum = offset(pid) + partition-local running sum (a window
    *      PARTITIONED by pid — every partition is one task).
    *
    * Result-identical for EXACT sum types (long/decimal — addition is
    * associative, so regrouping the adds cannot change a digit; do
    * not use with double sums, whose add order is observable). The
    * frame is materialized once for the same sampling reason as
    * withGlobalRank. `sort` must form a total order. The value column
    * is evaluated BEFORE the truncate so the local window and the
    * offset aggregate read one frozen copy.
    */
  def withGlobalCumsum(df: DataFrame, value: Column, cumName: String,
      totName: String, sort: Column*): DataFrame = {
    val k = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val ranked = Materialize.truncate(
      df.repartitionByRange(k, sort: _*)
        .sortWithinPartitions(sort: _*)
        .withColumn("_gc_v", value)
        .withColumn("_gc_pid",
          shiftright(monotonically_increasing_id(), 33).cast("int")))
    val offs = ranked.groupBy(col("_gc_pid"))
      .agg(sum(col("_gc_v")).as("_gc_psum"))
      .withColumn("_gc_off", sum(col("_gc_psum")).over(
        Window.orderBy(col("_gc_pid"))
          .rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn(totName, sum(col("_gc_psum")).over(
        Window.orderBy(col("_gc_pid")).rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("_gc_pid"), col("_gc_off"), col(totName))
    val localCum = sum(col("_gc_v")).over(
      Window.partitionBy(col("_gc_pid")).orderBy(sort: _*)
        .rowsBetween(Window.unboundedPreceding, 0))
    ranked.join(broadcast(offs), Seq("_gc_pid"))
      .withColumn(cumName,
        when(col("_gc_off").isNull, localCum)
          .otherwise(col("_gc_off") + localCum))
      .drop("_gc_pid", "_gc_v", "_gc_off")
  }

  /** NTILE(k) as its closed form of (global rank, n): with base=n div k
    * and rem=n%k, buckets 1..rem hold base+1 rows, the rest base — the
    * SQL:2003 rule Spark and DuckDB both implement. IntegerType, like
    * the builtin. `rank`/`n` are column NAMES present on the frame.
    */
  def ntileExpr(rank: String, n: String, k: Int): Column = expr(
    s"""CAST(CASE WHEN $rank <= ($n % $k) * (($n div $k) + 1)
       |  THEN ($rank - 1) div (($n div $k) + 1)
       |  ELSE ($n % $k) + ($rank - 1 - ($n % $k) * (($n div $k) + 1))
       |       div ($n div $k)
       |  END + 1 AS INT)""".stripMargin)
}
