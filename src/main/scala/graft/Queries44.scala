package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 batch 8: nonparametric trend testing and forecast
  * backtesting (SURVEY §2.8 X142-X143).
  */
object Queries44 {
  import Tables._

  private def dailyCounts(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .filter(col("event_type").isNotNull)
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("x"))

  /** q232 — MANN-KENDALL TREND TEST (X142). The nonparametric
    * complement to q227's OLS: S = Σ_{i<j} sign(x_j − x_i) over the
    * day-ordered daily counts, tie-corrected variance
    * (n(n−1)(2n+5) − Σ t(t−1)(2t+5))/18, continuity-corrected
    * Z = (S∓1)/√Var — robust to outliers and needing no linearity
    * assumption (Mann 1945, Kendall 1975; the standard hydrology/
    * monitoring trend test). S, n, and every tie term are EXACT
    * integers; only √Var and the final division are float.
    *
    * Scale: the pair sum is quadratic in DAYS, not events — C(n,2)
    * per key over the daily aggregate (435 pairs at 30 days), joined
    * key-local. The fact table is touched once.
    */
  def q232(s: SparkSession, d: String): DataFrame = {
    val daily = dailyCounts(s, d)
    val a = daily.select(col("event_type"), col("day").as("di"),
      col("x").as("xi"))
    val b = daily.select(col("event_type"), col("day").as("dj"),
      col("x").as("xj"))
    val sTab = a.join(b, Seq("event_type"))
      .filter(col("di") < col("dj"))
      .groupBy(col("event_type"))
      .agg(sum(signum(col("xj") - col("xi")).cast("long")).as("s_stat"))
    val ties = daily.groupBy(col("event_type"), col("x"))
      .agg(count(lit(1)).as("t"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_distinct"),
        sum(col("t")).as("n"),
        sum(col("t") * (col("t") - 1) * (lit(2) * col("t") + 5)).as("tieterm"))
    val joined = sTab.join(ties, Seq("event_type"))
      .withColumn("var_s",
        (col("n") * (col("n") - 1) * (lit(2) * col("n") + 5) -
          col("tieterm")).cast("double") / 18.0)
      .withColumn("z",
        when(col("s_stat") > 0,
          (col("s_stat") - 1).cast("double") / sqrt(col("var_s")))
          .when(col("s_stat") < 0,
            (col("s_stat") + 1).cast("double") / sqrt(col("var_s")))
          .otherwise(lit(0.0)))
    joined.select(col("event_type"), col("n"), col("s_stat"),
        round(col("var_s"), 4).as("var_s"), round(col("z"), 4).as("z"),
        when(round(col("z"), 4) > 1.96, "increasing")
          .when(round(col("z"), 4) < -1.96, "decreasing")
          .otherwise("none").as("trend"))
      .orderBy(col("event_type"))
  }

  /** q233 — FORECAST BACKTEST (X143). Walk-forward evaluation of
    * three baseline forecasters over each type's last 7 days of
    * daily value totals: naive (yesterday), seasonal-naive (7 days
    * ago), drift (yesterday + last-week slope (x_{d−1} − x_{d−8})/7).
    * Reports per-method MAE and the winner — the evaluation harness
    * q224's Holt model would be judged by (a forecast op without its
    * backtest is unfalsifiable). Daily totals are decimal-exact and
    * 4dp-rounded; errors accumulate in EXACT decimal so the MAE is
    * identical cross-engine regardless of summation order.
    *
    * Scale: three lag windows over one day-ordered pass per key +
    * a 7-row-per-key aggregate.
    */
  def q233(s: SparkSession, d: String): DataFrame = {
    val byDay = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val daily = events(s, d)
      .filter(col("event_type").isNotNull)
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(round(sum(col("value").cast("decimal(38,10)")), 4)
        .cast("decimal(28,4)").as("x"))
    val maxDay = daily.groupBy(col("event_type"))
      .agg(max(col("day")).as("max_day"))
    val lagged = daily
      .withColumn("l1", lag(col("x"), 1).over(byDay))
      .withColumn("l7", lag(col("x"), 7).over(byDay))
      .withColumn("l8", lag(col("x"), 8).over(byDay))
      .join(maxDay, Seq("event_type"))
      .filter(col("day") > col("max_day") - 7 &&
        col("l1").isNotNull && col("l7").isNotNull && col("l8").isNotNull)
      .withColumn("e_naive", abs(col("x") - col("l1")))
      .withColumn("e_snaive", abs(col("x") - col("l7")))
      // drift error ×7 in EXACT decimal — 7·|x − (l1 + (l1−l8)/7)| =
      // |7x − (8·l1 − l8)|; the single /7 happens once, on the summed
      // total, so no per-row decimal-division rounding rules differ
      // across engines
      .withColumn("e_drift7",
        abs(lit(7) * col("x") - (lit(8) * col("l1") - col("l8"))))
    val mae = lagged.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_eval"),
        round(sum(col("e_naive")).cast("double") / count(lit(1)), 4)
          .as("mae_naive"),
        round(sum(col("e_snaive")).cast("double") / count(lit(1)), 4)
          .as("mae_snaive"),
        round(sum(col("e_drift7")).cast("double") / 7.0 / count(lit(1)), 4)
          .as("mae_drift"))
    mae.withColumn("best",
        when(col("mae_naive") <= col("mae_snaive") &&
          col("mae_naive") <= col("mae_drift"), "naive")
          .when(col("mae_snaive") <= col("mae_drift"), "snaive")
          .otherwise("drift"))
      .orderBy(col("event_type"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q232_mann_kendall" -> (q232 _),
    "q233_forecast_backtest" -> (q233 _))
}

/** DuckDB mirrors of Queries44 — exact integer S/tie terms, decimal
  * error sums, identical lag frames.
  */
object Oracle44 {

  val sql: Map[String, String] = Map(
    "q232_mann_kendall" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    (epoch_ns(ts) // 1000) // 86400000000 AS day,
        |    count(*) AS x
        |  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
        |st AS (SELECT a.event_type,
        |    CAST(sum(sign(b.x - a.x)) AS BIGINT) AS s_stat
        |  FROM daily a JOIN daily b
        |    ON a.event_type = b.event_type AND a.day < b.day
        |  GROUP BY a.event_type),
        |tg AS (SELECT event_type, x, count(*) AS t FROM daily
        |  GROUP BY event_type, x),
        |ties AS (SELECT event_type, count(*) AS n_distinct,
        |    CAST(sum(t) AS BIGINT) AS n,
        |    CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tieterm
        |  FROM tg GROUP BY event_type),
        |j AS (SELECT st.event_type, s_stat, n,
        |    CAST(n * (n - 1) * (2 * n + 5) - tieterm AS DOUBLE) / 18.0
        |      AS var_s
        |  FROM st JOIN ties USING (event_type)),
        |z AS (SELECT *,
        |    CASE WHEN s_stat > 0
        |           THEN CAST(s_stat - 1 AS DOUBLE) / sqrt(var_s)
        |         WHEN s_stat < 0
        |           THEN CAST(s_stat + 1 AS DOUBLE) / sqrt(var_s)
        |         ELSE 0.0 END AS zv
        |  FROM j)
        |SELECT event_type, n, s_stat, round(var_s, 4) AS var_s,
        |  round(zv, 4) AS z,
        |  CASE WHEN round(zv, 4) > 1.96 THEN 'increasing'
        |       WHEN round(zv, 4) < -1.96 THEN 'decreasing'
        |       ELSE 'none' END AS trend
        |FROM z ORDER BY event_type""".stripMargin,

    "q233_forecast_backtest" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    (epoch_ns(ts) // 1000) // 86400000000 AS day,
        |    CAST(round(sum(CAST("value" AS DECIMAL(38,10))), 4)
        |      AS DECIMAL(28,4)) AS x
        |  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
        |lagged AS (SELECT event_type, day, x,
        |    lag(x, 1) OVER w AS l1,
        |    lag(x, 7) OVER w AS l7,
        |    lag(x, 8) OVER w AS l8,
        |    max(day) OVER (PARTITION BY event_type) AS max_day
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day)),
        |hold AS (SELECT *,
        |    abs(x - l1) AS e_naive,
        |    abs(x - l7) AS e_snaive,
        |    abs(7 * x - (8 * l1 - l8)) AS e_drift7
        |  FROM lagged
        |  WHERE day > max_day - 7 AND l1 IS NOT NULL
        |    AND l7 IS NOT NULL AND l8 IS NOT NULL),
        |mae AS (SELECT event_type, count(*) AS n_eval,
        |    round(CAST(sum(e_naive) AS DOUBLE) / count(*), 4) AS mae_naive,
        |    round(CAST(sum(e_snaive) AS DOUBLE) / count(*), 4) AS mae_snaive,
        |    round(CAST(sum(e_drift7) AS DOUBLE) / 7.0 / count(*), 4) AS mae_drift
        |  FROM hold GROUP BY event_type)
        |SELECT event_type, n_eval, mae_naive, mae_snaive, mae_drift,
        |  CASE WHEN mae_naive <= mae_snaive AND mae_naive <= mae_drift
        |         THEN 'naive'
        |       WHEN mae_snaive <= mae_drift THEN 'snaive'
        |       ELSE 'drift' END AS best
        |FROM mae ORDER BY event_type""".stripMargin)
}
