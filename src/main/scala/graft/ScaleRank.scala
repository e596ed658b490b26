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
