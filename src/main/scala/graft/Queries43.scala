package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 batch 7: windowed regression and exact proportional
  * allocation (SURVEY §2.8 X140-X141).
  */
object Queries43 {
  import Tables._

  /** q230 — ROLLING OLS SLOPE (X140). The 14-day rolling least-squares
    * slope of each event type's daily count — q227's fit becomes a
    * trend MONITOR (a level change shows up as a slope spike long
    * before the full-series fit moves). Every moment (n, Σt, Σx, Σtx,
    * Σt²) is a windowed sum of integers in decimal — exact — and the
    * slope is one float division over identical integer inputs, so no
    * tolerance is needed. Windows shorter than 3 days emit NULL
    * (slope of 1-2 points is noise, and n=1 would divide by zero).
    *
    * Scale: one hash shuffle on event_type + one ordered window pass
    * carrying five decimal accumulators — the rolling fit never
    * re-scans history.
    */
  def q230(s: SparkSession, d: String): DataFrame = {
    val dec = "decimal(38,0)"
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-13, Window.currentRow)
    val daily = events(s, d)
      .filter(col("event_type").isNotNull)
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("x"))
    val n = count(lit(1)).over(w)
    val st = sum(col("day").cast(dec)).over(w)
    val sx = sum(col("x").cast(dec)).over(w)
    val stx = sum((col("day") * col("x")).cast(dec)).over(w)
    val stt = sum((col("day") * col("day")).cast(dec)).over(w)
    daily.select(col("event_type"), col("day"), col("x"),
        n.as("n_window"),
        when(n >= 3, round((n * stx - st * sx).cast("double") /
          (n * stt - st * st).cast("double"), 6)).as("slope14"))
      .orderBy(col("event_type"), col("day"))
  }

  /** q231 — LARGEST-REMAINDER ALLOCATION (X141). Split an integer
    * sampling budget (100 000 docs) across sources proportionally to
    * their corpus share using Hamilton's largest-remainder method:
    * floor the exact proportional quota, then hand the leftover units
    * to the largest fractional remainders (ties → source asc). The
    * result is EXACT: allocations are integers, sum exactly to the
    * budget, and each is within 1 of the true quota — what q80's
    * float mixture weights cannot give a sampler that must draw whole
    * documents. All arithmetic is integer/decimal (remainders compared
    * as budget·n_src mod total — never as floats).
    *
    * Scale: one |sources|-row aggregate + a rank over it; the fact
    * table is touched once.
    */
  def q231(s: SparkSession, d: String): DataFrame = {
    val budget = 100000L
    val per = documents(s, d)
      .groupBy(col("source")).agg(count(lit(1)).as("n_src"))
    val tot = per.agg(sum(col("n_src")).as("total"))
    val base = per.crossJoin(broadcast(tot))
      // exact integer floor + remainder: quota = budget*n/total
      .withColumn("floor_alloc",
        (lit(budget) * col("n_src")).cast("decimal(38,0)")
          .divide(col("total").cast("decimal(38,0)")).cast("long"))
      .withColumn("rem", (lit(budget) * col("n_src")) % col("total"))
    val leftover = lit(budget) -
      sum(col("floor_alloc")).over(Window.partitionBy())
    val ranked = base.withColumn("rk", row_number().over(
      Window.orderBy(col("rem").desc, col("source"))))
    ranked
      .withColumn("alloc",
        col("floor_alloc") + when(col("rk") <= leftover, 1L).otherwise(0L))
      .select(col("source"), col("n_src"), col("floor_alloc"),
        col("rem"), col("alloc"))
      .orderBy(col("source"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q230_rolling_slope" -> (q230 _),
    "q231_largest_remainder" -> (q231 _))
}

/** DuckDB mirrors of Queries43 — identical frames and identical
  * integer arithmetic.
  */
object Oracle43 {

  val sql: Map[String, String] = Map(
    "q230_rolling_slope" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    (epoch_ns(ts) // 1000) // 86400000000 AS day,
        |    count(*) AS x
        |  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
        |w AS (SELECT event_type, day, x,
        |    count(*) OVER win AS n_window,
        |    sum(CAST(day AS DECIMAL(38,0))) OVER win AS st,
        |    sum(CAST(x AS DECIMAL(38,0))) OVER win AS sx,
        |    sum(CAST(day * x AS DECIMAL(38,0))) OVER win AS stx,
        |    sum(CAST(day * day AS DECIMAL(38,0))) OVER win AS stt
        |  FROM daily
        |  WINDOW win AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
        |SELECT event_type, day, x, n_window,
        |  CASE WHEN n_window >= 3 THEN
        |    round(CAST(n_window * stx - st * sx AS DOUBLE)
        |      / CAST(n_window * stt - st * st AS DOUBLE), 6)
        |  END AS slope14
        |FROM w ORDER BY event_type, day""".stripMargin,

    "q231_largest_remainder" ->
      """WITH per AS (SELECT source, count(*) AS n_src
        |  FROM documents GROUP BY source),
        |tot AS (SELECT sum(n_src) AS total FROM per),
        |base AS (SELECT source, n_src,
        |    CAST((100000 * n_src) // total AS BIGINT) AS floor_alloc,
        |    CAST((100000 * n_src) % total AS BIGINT) AS rem
        |  FROM per, tot),
        |lo AS (SELECT 100000 - sum(floor_alloc) AS leftover FROM base),
        |rk AS (SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS r
        |  FROM base)
        |SELECT source, n_src, floor_alloc, rem,
        |  floor_alloc + CASE WHEN r <= lo.leftover THEN 1 ELSE 0 END AS alloc
        |FROM rk, lo ORDER BY source""".stripMargin)
}
