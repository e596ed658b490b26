package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Text

/** Round-5 batch 6: pipeline-operations correctness ops — the checks a
  * production lake runs between ingest and training.
  *
  *  - q136 referential-integrity audit: orphan counts across the
  *    warehouse FK chain (lineitem→orders→customer→nation) — the
  *    cross-table twin of q127's single-table profile.
  *  - q137 incremental-aggregate merge: state+delta partial aggregates
  *    merged vs the oracle's straight full recompute — the hash match
  *    IS the mergeability proof behind every incremental ETL rollup.
  *  - q138 out-of-order audit: per-type arrival-disorder depth
  *    quantiles + how many events a 10-minute watermark would drop —
  *    the measurement that justifies (or indicts) T3's watermark
  *    choice.
  *
  * Every query is DuckDB-oracled (Oracle11) under the §7.4
  * conventions.
  */
object Queries11 {
  import Tables._

  /** q136 — REFERENTIAL INTEGRITY AUDIT. One row per FK relationship:
    * child rows, orphan rows (no parent), orphan rate. Spark side uses
    * a left join + null-count aggregate so child count and orphan
    * count come from ONE pass per relationship.
    *
    * Scale: each relationship is a key-shuffled left join (broadcast
    * when the parent is a dim) + one aggregate; relationship results
    * are 1-row, so the union is free. The shape a Deequ-style
    * constraint suite compiles to.
    */
  def q136(s: SparkSession, d: String): DataFrame = {
    def rel(name: String, child: DataFrame, key: Column,
        parent: DataFrame, pkey: Column): DataFrame =
      child.select(key.as("ck"))
        .join(parent.select(pkey.as("ck"), lit(1).as("hit"))
          .distinct(), Seq("ck"), "left")
        .agg(count(lit(1)).as("n_child"),
          sum(when(col("hit").isNull, 1L).otherwise(0L)).as("n_orphans"))
        .select(lit(name).as("relation"), col("n_child"), col("n_orphans"),
          round(col("n_orphans").cast("double") / col("n_child"), 4)
            .as("orphan_rate"))
    rel("customer->nation", customer(s, d), col("c_nationkey"),
        nation(s, d), col("n_nationkey"))
      .unionByName(rel("lineitem->orders", lineitem(s, d), col("l_orderkey"),
        orders(s, d), col("o_orderkey")))
      .unionByName(rel("orders->customer", orders(s, d), col("o_custkey"),
        customer(s, d), col("c_custkey")))
      .orderBy(col("relation"))
  }

  /** q137 — INCREMENTAL-AGGREGATE MERGE. Events split into a "state"
    * half and a "delta" half by content hash; each half is aggregated
    * INDEPENDENTLY (count + decimal sum per type), then the two
    * partial-aggregate tables are merged by re-aggregation. The oracle
    * computes the straight full aggregate — the hash match proves
    * merge(agg(state), agg(delta)) == agg(state ∪ delta), which is the
    * correctness obligation of every incremental rollup pipeline.
    *
    * Scale: this IS the at-scale shape — a daily delta re-aggregates
    * against yesterday's |keys|-row state table instead of the full
    * history; the merge step touches only aggregate rows.
    */
  def q137(s: SparkSession, d: String): DataFrame = {
    val dec = DecimalType(38, 6)
    val e = events(s, d).select(col("event_type"), col("value"),
      pmod(Text.md5Long(col("event_id").cast("string")), lit(2L)).as("half"))
    def partial(half: Int): DataFrame = e.filter(col("half") === half)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value").cast(dec)).as("sv"))
    partial(0).unionByName(partial(1))
      .groupBy(col("event_type"))
      .agg(sum(col("n")).as("n_events"),
        round(sum(col("sv")), 4).cast("double").as("total_value"))
      .orderBy(col("event_type"))
  }

  /** q138 — OUT-OF-ORDER AUDIT. Arrival order is the monotone ingest
    * id (event_id); an event's disorder depth = how far the per-user
    * event-time high-water mark had already advanced past it when it
    * arrived. Reports per-type depth quantiles (exact interpolated,
    * q41's kernel, on integer-µs depths) and how many events a
    * 10-minute watermark would have dropped — measured evidence for
    * T3's watermark configuration.
    *
    * Scale: one per-user window over (event_id) order + one aggregate
    * on the type key; depths are integer µs so both engines compare
    * exactly at the 600 s boundary.
    */
  def q138(s: SparkSession, d: String): DataFrame = {
    val byArrival = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("hwm", max(col("us")).over(byArrival))
      .withColumn("delay_us",
        greatest(coalesce(col("hwm") - col("us"), lit(0L)), lit(0L)))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(percentile(col("delay_us"), lit(0.5)) / 1e6, 4).as("p50_s"),
        round(percentile(col("delay_us"), lit(0.95)) / 1e6, 4).as("p95_s"),
        round(max(col("delay_us")) / 1e6, 4).as("max_s"),
        sum(when(col("delay_us") > 600L * 1000000L, 1L).otherwise(0L))
          .as("n_past_watermark"))
      .orderBy(col("event_type"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q136_fk_integrity" -> (q136 _),
    "q137_incremental_merge" -> (q137 _),
    "q138_out_of_order" -> (q138 _))
}

/** DuckDB mirrors of Queries11 — same formulas, same decimal paths,
  * same rounding (§7.4).
  */
object Oracle11 {

  private def md5long(e: String): String =
    s"CAST('0x' || substring(md5($e), 1, 15) AS BIGINT)"

  val sql: Map[String, String] = Map(
    "q136_fk_integrity" ->
      """WITH r1 AS (SELECT 'customer->nation' AS relation,
        |    count(*) AS n_child,
        |    CAST(SUM(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_orphans
        |  FROM customer c LEFT JOIN nation n
        |    ON c.c_nationkey = n.n_nationkey),
        |r2 AS (SELECT 'lineitem->orders' AS relation,
        |    count(*) AS n_child,
        |    CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_orphans
        |  FROM lineitem l LEFT JOIN orders o
        |    ON l.l_orderkey = o.o_orderkey),
        |r3 AS (SELECT 'orders->customer' AS relation,
        |    count(*) AS n_child,
        |    CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_orphans
        |  FROM orders o LEFT JOIN customer c
        |    ON o.o_custkey = c.c_custkey),
        |u AS (SELECT * FROM r1 UNION ALL SELECT * FROM r2
        |  UNION ALL SELECT * FROM r3)
        |SELECT relation, n_child, n_orphans,
        |  round(CAST(n_orphans AS DOUBLE) / n_child, 4) AS orphan_rate
        |FROM u ORDER BY relation""".stripMargin,

    // the STRAIGHT full aggregate — no split, no merge. Matching the
    // Spark side's state+delta merge proves partial-aggregate
    // mergeability.
    "q137_incremental_merge" ->
      """SELECT event_type, count(*) AS n_events,
        |  CAST(round(SUM(CAST(value AS DECIMAL(38,6))), 4) AS DOUBLE)
        |    AS total_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q138_out_of_order" ->
      """WITH x AS (SELECT user_id, event_id, event_type,
        |    epoch_ns(ts) // 1000 AS us
        |  FROM events),
        |h AS (SELECT event_type, us,
        |    max(us) OVER (PARTITION BY user_id ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm
        |  FROM x),
        |dl AS (SELECT event_type,
        |    greatest(COALESCE(hwm - us, 0), 0) AS delay_us
        |  FROM h)
        |SELECT event_type, count(*) AS n,
        |  round(quantile_cont(delay_us, 0.5) / 1e6, 4) AS p50_s,
        |  round(quantile_cont(delay_us, 0.95) / 1e6, 4) AS p95_s,
        |  round(max(delay_us) / 1e6, 4) AS max_s,
        |  CAST(SUM(CASE WHEN delay_us > 600000000 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_past_watermark
        |FROM dl GROUP BY event_type ORDER BY event_type""".stripMargin)
}
