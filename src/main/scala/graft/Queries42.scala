package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 batch 6: regression, ranking-under-uncertainty, and
  * changepoint detection (SURVEY §2.8 X137-X139).
  */
object Queries42 {
  import Tables._

  /** q227 — PER-GROUP OLS TREND (X137). Least-squares fit of each
    * event type's daily event count against the day index: slope,
    * intercept, and r² from the closed-form moment sums. Day indices
    * and daily counts are INTEGERS, so every moment (Σt, Σx, Σtx,
    * Σt², Σx²) is summed exactly in decimal; the only float ops are
    * the final three divisions over identical integer inputs —
    * engine-proof without any tolerance.
    *
    * Scale: two chained aggregates (daily roll-up, then a 5-moment
    * fold per key) — the regression never sees raw events, and the
    * moments are the same mergeable-shard algebra as q202.
    */
  def q227(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .filter(col("event_type").isNotNull)
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("x"))
      .withColumn("t", col("day") -
        min(col("day")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type"))))
    val dec = "decimal(38,0)"
    daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("t").cast(dec)).as("st"),
        sum(col("x").cast(dec)).as("sx"),
        sum((col("t") * col("x")).cast(dec)).as("stx"),
        sum((col("t") * col("t")).cast(dec)).as("stt"),
        sum((col("x") * col("x")).cast(dec)).as("sxx"))
      .select(col("event_type"), col("n"),
        round((col("n") * col("stx") - col("st") * col("sx")).cast("double")
          / (col("n") * col("stt") - col("st") * col("st")).cast("double"), 6)
          .as("slope"),
        round((col("sx").cast("double") -
          (col("n") * col("stx") - col("st") * col("sx")).cast("double")
          / (col("n") * col("stt") - col("st") * col("st")).cast("double")
          * col("st").cast("double")) / col("n").cast("double"), 6)
          .as("intercept"),
        round(((col("n") * col("stx") - col("st") * col("sx")) *
               (col("n") * col("stx") - col("st") * col("sx"))).cast("double")
          / ((col("n") * col("stt") - col("st") * col("st")).cast("double") *
             (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")), 6)
          .as("r2"))
      .orderBy(col("event_type"))
  }

  /** q228 — WILSON LOWER-BOUND RANKING (X138). Parts ranked by the
    * 95% Wilson score lower bound of their return rate (l_returnflag
    * = 'R') — the sort-by-confidence idiom (Miller/Evan 2009, every
    * rating system) that a raw rate cannot provide: 2/2 returns must
    * NOT outrank 40/50. Minimum 20 trials; z = 1.96 fixed. The bound
    * is pure float arithmetic over the integer (successes, trials)
    * pair, identical op order both engines.
    *
    * Scale: one per-part aggregate + TakeOrdered(50).
    */
  def q228(s: SparkSession, d: String): DataFrame = {
    val z = 1.96
    // literal 3.8416, NOT z*z: the Scala product 1.96*1.96 and the
    // oracle's decimal literal differ in the last ulp
    val z2 = 3.8416
    val agg = lineitem(s, d)
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("trials"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
          .as("returns"))
      .filter(col("trials") >= 20)
    val nD = col("trials").cast("double")
    val p = col("returns").cast("double") / nD
    val wlb = (p + lit(z2) / (lit(2.0) * nD) -
      lit(z) * sqrt(p * (lit(1.0) - p) / nD +
        lit(z2) / (lit(4.0) * nD * nD))) /
      (lit(1.0) + lit(z2) / nD)
    agg.select(col("l_partkey"), col("trials"), col("returns"),
        round(p, 6).as("rate"), round(wlb, 6).as("wilson_lb"))
      .orderBy(col("wilson_lb").desc, col("l_partkey"))
      .limit(50)
  }

  /** q229 — CUSUM CHANGEPOINT ALERTS (X139). One-sided CUSUM over
    * each event type's daily counts in σ UNITS (the standard Page
    * parameterization): s_t = max(0, s_{t−1} + (x_t − μ − 0.5σ)),
    * alert when s_t > 2σ, with μ/σ the type's daily mean and
    * population stddev. σ-scaling matters at scale: daily-count noise
    * shrinks ~1/√volume, so a μ-proportional threshold that fires on
    * a small corpus goes permanently silent on a large one (measured:
    * 0 alerts at sf0.1 with μ-units, ~6 at every sf with σ-units).
    * Completes the anomaly family (q94 EWMA deviations, q193 burst
    * windows, q203 consensus — none accumulate evidence across days).
    * The recursion lives in an in-row left fold over the day-ordered
    * series, same cross-engine guarantees as q224's Holt fold; the
    * oracle replays it as a recursive CTE (the q224 list_reduce
    * lesson). μ and σ come from exact integer moment sums.
    *
    * Scale: daily aggregate → per-key bounded-array fold; alerts
    * explode from the fold's accumulator, never from a window chain.
    */
  def q229(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .filter(col("event_type").isNotNull)
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("x"))
    val mu = daily.groupBy(col("event_type"))
      .agg((sum(col("x").cast("decimal(38,0)")).cast("double") /
          count(lit(1))).as("mu"),
        (sum((col("x") * col("x")).cast("decimal(38,0)")).cast("double") /
          count(lit(1))).as("ex2"),
        array_sort(collect_list(struct(col("day"), col("x")))).as("series"))
      .withColumn("sd", sqrt(col("ex2") - col("mu") * col("mu")))
    mu.withColumn("alerts", expr(
        """aggregate(series,
          |  named_struct('s', CAST(0.0 AS DOUBLE),
          |    'al', CAST(array() AS ARRAY<STRUCT<day: BIGINT, s: DOUBLE>>)),
          |  (acc, e) -> named_struct(
          |    's', greatest(CAST(0.0 AS DOUBLE),
          |           acc.s + (CAST(e.x AS DOUBLE) - mu - 0.5D * sd)),
          |    'al', CASE WHEN greatest(CAST(0.0 AS DOUBLE),
          |           acc.s + (CAST(e.x AS DOUBLE) - mu - 0.5D * sd))
          |             > 2.0D * sd
          |      THEN array_append(acc.al, named_struct('day', e.day,
          |        's', greatest(CAST(0.0 AS DOUBLE),
          |           acc.s + (CAST(e.x AS DOUBLE) - mu - 0.5D * sd))))
          |      ELSE acc.al END)).al""".stripMargin))
      .select(col("event_type"), round(col("mu"), 4).as("mu"),
        round(col("sd"), 4).as("sd"), explode(col("alerts")).as("a"))
      .select(col("event_type"), col("mu"), col("sd"),
        col("a.day").as("day"), round(col("a.s"), 4).as("cusum"))
      .orderBy(col("event_type"), col("day"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q227_ols_trend" -> (q227 _),
    "q228_wilson_rank" -> (q228 _),
    "q229_cusum_alerts" -> (q229 _))
}

/** DuckDB mirrors of Queries42 — exact integer moments for OLS, the
  * same single-expression Wilson bound, and the CUSUM recursion as a
  * recursive CTE (DuckDB's struct-acc list_reduce is unreliable —
  * Oracle41's measured note).
  */
object Oracle42 {

  val sql: Map[String, String] = Map(
    "q227_ols_trend" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    (epoch_ns(ts) // 1000) // 86400000000 AS day,
        |    count(*) AS x
        |  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
        |idx AS (SELECT event_type, x,
        |    day - min(day) OVER (PARTITION BY event_type) AS t
        |  FROM daily),
        |m AS (SELECT event_type, count(*) AS n,
        |    sum(CAST(t AS DECIMAL(38,0))) AS st,
        |    sum(CAST(x AS DECIMAL(38,0))) AS sx,
        |    sum(CAST(t * x AS DECIMAL(38,0))) AS stx,
        |    sum(CAST(t * t AS DECIMAL(38,0))) AS stt,
        |    sum(CAST(x * x AS DECIMAL(38,0))) AS sxx
        |  FROM idx GROUP BY event_type)
        |SELECT event_type, n,
        |  round(CAST(n * stx - st * sx AS DOUBLE)
        |    / CAST(n * stt - st * st AS DOUBLE), 6) AS slope,
        |  round((CAST(sx AS DOUBLE) -
        |    CAST(n * stx - st * sx AS DOUBLE)
        |    / CAST(n * stt - st * st AS DOUBLE)
        |    * CAST(st AS DOUBLE)) / CAST(n AS DOUBLE), 6) AS intercept,
        |  round(CAST((n * stx - st * sx) * (n * stx - st * sx) AS DOUBLE)
        |    / (CAST(n * stt - st * st AS DOUBLE) *
        |       CAST(n * sxx - sx * sx AS DOUBLE)), 6) AS r2
        |FROM m ORDER BY event_type""".stripMargin,

    "q228_wilson_rank" ->
      """WITH a AS (
        |  SELECT l_partkey, count(*) AS trials,
        |    sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS returns
        |  FROM lineitem GROUP BY l_partkey HAVING count(*) >= 20),
        |w AS (SELECT l_partkey, trials,
        |    CAST(returns AS BIGINT) AS returns,
        |    CAST(returns AS DOUBLE) / CAST(trials AS DOUBLE) AS p,
        |    CAST(trials AS DOUBLE) AS nd
        |  FROM a)
        |SELECT l_partkey, trials, returns, round(p, 6) AS rate,
        |  round((p + 3.8416 / (2.0 * nd) -
        |    1.96 * sqrt(p * (1.0 - p) / nd + 3.8416 / (4.0 * nd * nd))) /
        |    (1.0 + 3.8416 / nd), 6) AS wilson_lb
        |FROM w ORDER BY wilson_lb DESC, l_partkey LIMIT 50""".stripMargin,

    "q229_cusum_alerts" ->
      """WITH RECURSIVE daily AS (
        |  SELECT event_type,
        |    (epoch_ns(ts) // 1000) // 86400000000 AS day,
        |    count(*) AS x
        |  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
        |mu AS (SELECT event_type,
        |    CAST(sum(CAST(x AS DECIMAL(38,0))) AS DOUBLE) / count(*) AS mu,
        |    CAST(sum(CAST(x * x AS DECIMAL(38,0))) AS DOUBLE) / count(*)
        |      AS ex2
        |  FROM daily GROUP BY event_type),
        |ms AS (SELECT event_type, mu, sqrt(ex2 - mu * mu) AS sd FROM mu),
        |idx AS (SELECT d.event_type, d.day, d.x, m.mu, m.sd,
        |    row_number() OVER (PARTITION BY d.event_type ORDER BY d.day) AS i
        |  FROM daily d JOIN ms m USING (event_type)),
        |rec AS (
        |  SELECT event_type, day, mu, sd, CAST(1 AS BIGINT) AS i,
        |    greatest(CAST(0.0 AS DOUBLE),
        |      0.0 + (CAST(x AS DOUBLE) - mu - 0.5 * sd)) AS s
        |  FROM idx WHERE i = 1
        |  UNION ALL
        |  SELECT ix.event_type, ix.day, ix.mu, ix.sd, r.i + 1,
        |    greatest(CAST(0.0 AS DOUBLE),
        |      r.s + (CAST(ix.x AS DOUBLE) - ix.mu - 0.5 * ix.sd))
        |  FROM rec r JOIN idx ix
        |    ON ix.event_type = r.event_type AND ix.i = r.i + 1)
        |SELECT event_type, round(mu, 4) AS mu, round(sd, 4) AS sd,
        |  day, round(s, 4) AS cusum
        |FROM rec WHERE s > 2.0 * sd
        |ORDER BY event_type, day""".stripMargin)
}
