package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 batch 15: robust regression — Huber IRLS refit and the
  * Theil-Sen median-of-slopes estimator (SURVEY §2.8 X161-X162).
  */
object Queries51 {
  import Tables._

  /** Shared per-type daily series: t = day index from the type's
    * first day, x as EXACT decimal(18,4) (and its double image for
    * residual arithmetic).
    *
    * Materialized per execution (round 16, the q255/q267 move): the
    * lazy frame headed EVERY consumer's lineage, and q251's consumer
    * tree (moments, residuals, median rank, refit) multiplied it into
    * **24 parquet scans of the events fact in one plan**
    * (plans/r16/q251_huber_irls_before.txt — aliased subtrees defeat
    * exchange reuse, the q125 lesson). Truncated, the fact aggregate
    * runs once and every consumer reads the ≤|types|×|days| rows.
    * `minDay` as a window over the same grouping key keeps the whole
    * series build inside the daily aggregate's single exchange — the
    * broadcast join-back it replaces was a second job per reference.
    */
  private def series(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .filter(col("event_type").isNotNull)
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(round(sum(col("value").cast("decimal(38,10)")), 4)
        .cast("decimal(18,4)").as("x"))
    daily
      .withColumn("d0",
        min(col("day")).over(Window.partitionBy(col("event_type"))))
      .select(col("event_type"), (col("day") - col("d0")).as("t"),
        col("x"), col("x").cast("double").as("xd"))
      .transform(Materialize.truncate)
  }

  /** q251 — HUBER ROBUST REGRESSION, ONE IRLS STEP (X161). q227's
    * OLS is the init; residuals are scaled by the MAD estimate
    * σ̂ = 1.4826·median|r| (lower median, day tiebreak) and Huber
    * weights w = min(1, k/|r|) with k = 1.345σ̂ (the 95%-efficiency
    * constant; Huber 1964) are 6dp-rounded into decimal; the
    * weighted refit sums its five moments in EXACT decimal, so both
    * engines see bit-identical sums and the final slope/intercept
    * divisions are single float ops. One declared IRLS step —
    * enough to cut outlier leverage, fixed so the plan and oracle
    * stay static (the q224/q130 argument).
    *
    * Scale: the fact table is read once into the daily aggregate;
    * everything downstream (moments, median rank, refit) runs on
    * |types|×|days| rows with broadcast joins back.
    */
  def q251(s: SparkSession, d: String): DataFrame = {
    val ser = series(s, d)
    // ONE moment aggregate: the old second aggregate (sxd/std/n2,
    // joined back onto mom0) recomputed columns that are pure
    // projections of THIS aggregate's sums — sxd = cast(sx as
    // double), std = cast(st as double), n2 = n — so the OLS
    // intercept is derived here from the same exact decimal sums
    // (bit-identical doubles, one aggregate and zero joins instead
    // of two aggregates and one join; round 16)
    val mom0b = ser.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("t")).as("st"),
        sum(col("x")).as("sx"),
        sum(col("t") * col("t")).as("stt"),
        sum(col("x") * col("t").cast("decimal(4,0)")).as("stx"))
      .select(col("event_type"), col("n"),
        ((col("n") * col("stx").cast("double") -
          col("st").cast("double") * col("sx").cast("double")) /
          (col("n") * col("stt").cast("double") -
            col("st").cast("double") * col("st").cast("double")))
          .as("slope0"),
        col("st"), col("sx"))
      .select(col("event_type"), col("n"), col("slope0"),
        ((col("sx").cast("double") - col("slope0") * col("st").cast("double"))
          / col("n")).as("int0"))
    val resid = ser.join(broadcast(mom0b), Seq("event_type"))
      .withColumn("ar",
        abs(col("xd") - (col("int0") + col("slope0") * col("t"))))
    // MAD median carried by a same-partition window instead of the
    // old rank-filter + broadcast-join-back (round 16): the picked
    // |r| is the unique row at rank (n+1) div 2, broadcast to its
    // partition by max(when(...)) over the SAME event_type
    // partitioning the rank window established — no second exchange,
    // no join, and `resid` is consumed once instead of twice. Same
    // pick, same tiebreak, same k = 1.345·1.4826·|r|_med.
    val wByType = Window.partitionBy(col("event_type"))
    val weighted = resid
      .withColumn("rn", row_number().over(
        wByType.orderBy(col("ar"), col("t"))))
      .withColumn("k", lit(1.345) * lit(1.4826) *
        max(when(col("rn") === expr("(n + 1) div 2"), col("ar")))
          .over(wByType))
      .withColumn("w",
        round(when(col("ar") === 0.0, lit(1.0))
          .otherwise(least(lit(1.0), col("k") / col("ar"))), 6)
          .cast("decimal(10,6)"))
    val mom1 = weighted.groupBy(col("event_type"))
      .agg(max(col("k")).as("k"),
        max(col("slope0")).as("slope0"),
        count(lit(1)).as("n_days"),
        sum(when(col("w") < 1.0, 1L).otherwise(0L)).as("n_downweighted"),
        sum(col("w")).cast("double").as("sw"),
        sum(col("w") * col("t").cast("decimal(4,0)")).cast("double")
          .as("swt"),
        sum(col("w") * col("x")).cast("double").as("swx"),
        sum(col("w") * (col("t") * col("t")).cast("decimal(7,0)"))
          .cast("double").as("swtt"),
        sum((col("w") * col("t").cast("decimal(4,0)")) * col("x"))
          .cast("double").as("swtx"))
    mom1.select(col("event_type"), col("n_days"), col("n_downweighted"),
        round(col("k"), 4).as("k"),
        round(col("slope0"), 4).as("slope_ols"),
        round((col("sw") * col("swtx") - col("swt") * col("swx")) /
          (col("sw") * col("swtt") - col("swt") * col("swt")), 4)
          .as("slope_huber"),
        round((col("swx") - ((col("sw") * col("swtx") -
          col("swt") * col("swx")) /
          (col("sw") * col("swtt") - col("swt") * col("swt"))) *
          col("swt")) / col("sw"), 4).as("intercept_huber"))
      .orderBy(col("event_type"))
  }

  /** q252 — THEIL-SEN ROBUST SLOPE (X162). The median of all C(n,2)
    * pairwise slopes (x_j−x_i)/(t_j−t_i) per type (Theil 1950; Sen
    * 1968) — the nonparametric point estimate to go with q232's
    * Mann-Kendall test (same pair structure, 29.3% breakdown point,
    * no weighting scheme to tune). Each pairwise slope is ONE double
    * division of exact decimal/integer differences; the median is an
    * integer-rank pick (lower median, (i,j) tiebreak) over those
    * doubles, so cross-engine parity needs no tolerance.
    *
    * Scale: quadratic in DAYS, not events (the q232 argument —
    * C(30,2) pairs per key, key-local join on the daily aggregate).
    */
  def q252(s: SparkSession, d: String): DataFrame = {
    val ser = series(s, d)
    val a = ser.select(col("event_type"), col("t").as("ti"),
      col("x").as("xi"))
    val b = ser.select(col("event_type"), col("t").as("tj"),
      col("x").as("xj"))
    val slopes = a.join(b, Seq("event_type"))
      .filter(col("ti") < col("tj"))
      .select(col("event_type"), col("ti"), col("tj"),
        ((col("xj") - col("xi")).cast("double") /
          (col("tj") - col("ti")).cast("double")).as("sl"))
    val ranked = slopes
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("event_type"))
          .orderBy(col("sl"), col("ti"), col("tj"))))
      .withColumn("np", count(lit(1)).over(
        Window.partitionBy(col("event_type"))))
    ranked.filter(col("rn") === expr("(np + 1) div 2"))
      .select(col("event_type"), col("np").as("n_pairs"),
        round(col("sl"), 4).as("ts_slope"))
      .orderBy(col("event_type"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q251_huber_irls" -> (q251 _),
    "q252_theil_sen" -> (q252 _))
}

/** DuckDB mirrors of Queries51 — identical decimal moment algebra,
  * identical rank-pick medians.
  */
object Oracle51 {

  private val SERIES =
    """daily AS (
      |  SELECT event_type,
      |    (epoch_ns(ts) // 1000) // 86400000000 AS day,
      |    CAST(round(sum(CAST("value" AS DECIMAL(38,10))), 4)
      |      AS DECIMAL(18,4)) AS x
      |  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
      |m0 AS (SELECT event_type, min(day) AS d0 FROM daily GROUP BY 1),
      |ser AS (SELECT d.event_type, d.day - m.d0 AS t, d.x,
      |    CAST(d.x AS DOUBLE) AS xd
      |  FROM daily d JOIN m0 m ON m.event_type = d.event_type)"""
      .stripMargin

  val sql: Map[String, String] = Map(
    "q251_huber_irls" ->
      s"""WITH $SERIES,
         |mom0 AS (SELECT event_type, count(*) AS n,
         |    CAST(sum(t) AS DOUBLE) AS std,
         |    CAST(sum(x) AS DOUBLE) AS sxd,
         |    CAST(sum(t * t) AS DOUBLE) AS sttd,
         |    CAST(sum(x * CAST(t AS DECIMAL(4,0))) AS DOUBLE) AS stxd
         |  FROM ser GROUP BY event_type),
         |fit0 AS (SELECT event_type, n,
         |    (n * stxd - std * sxd) / (n * sttd - std * std) AS slope0,
         |    (sxd - (n * stxd - std * sxd) / (n * sttd - std * std)
         |      * std) / n AS int0
         |  FROM mom0),
         |res AS (SELECT s.event_type, s.t, s.x, f.n, f.slope0,
         |    abs(s.xd - (f.int0 + f.slope0 * s.t)) AS ar
         |  FROM ser s JOIN fit0 f USING (event_type)),
         |med AS (SELECT event_type, 1.345 * 1.4826 * ar AS k
         |  FROM (SELECT *, row_number() OVER (PARTITION BY event_type
         |      ORDER BY ar, t) AS rn FROM res) z
         |  WHERE rn = (n + 1) // 2),
         |wts AS (SELECT r.event_type, r.t, r.x, r.slope0, m.k,
         |    CAST(round(CASE WHEN r.ar = 0.0 THEN 1.0
         |      ELSE least(1.0, m.k / r.ar) END, 6) AS DECIMAL(10,6)) AS w
         |  FROM res r JOIN med m USING (event_type)),
         |mom1 AS (SELECT event_type, max(k) AS k, max(slope0) AS slope0,
         |    count(*) AS n_days,
         |    CAST(sum(CASE WHEN w < 1.0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_downweighted,
         |    CAST(sum(w) AS DOUBLE) AS sw,
         |    CAST(sum(w * CAST(t AS DECIMAL(4,0))) AS DOUBLE) AS swt,
         |    CAST(sum(w * x) AS DOUBLE) AS swx,
         |    CAST(sum(w * CAST(t * t AS DECIMAL(7,0))) AS DOUBLE) AS swtt,
         |    CAST(sum((w * CAST(t AS DECIMAL(4,0))) * x) AS DOUBLE)
         |      AS swtx
         |  FROM wts GROUP BY event_type)
         |SELECT event_type, n_days, n_downweighted,
         |  round(k, 4) AS k, round(slope0, 4) AS slope_ols,
         |  round((sw * swtx - swt * swx) / (sw * swtt - swt * swt), 4)
         |    AS slope_huber,
         |  round((swx - ((sw * swtx - swt * swx) /
         |    (sw * swtt - swt * swt)) * swt) / sw, 4) AS intercept_huber
         |FROM mom1 ORDER BY event_type""".stripMargin,

    "q252_theil_sen" ->
      s"""WITH $SERIES,
         |pairs AS (SELECT a.event_type, a.t AS ti, b.t AS tj,
         |    CAST(b.x - a.x AS DOUBLE) / CAST(b.t - a.t AS DOUBLE) AS sl
         |  FROM ser a JOIN ser b
         |    ON a.event_type = b.event_type AND a.t < b.t),
         |rk AS (SELECT *,
         |    row_number() OVER (PARTITION BY event_type
         |      ORDER BY sl, ti, tj) AS rn,
         |    count(*) OVER (PARTITION BY event_type) AS np
         |  FROM pairs)
         |SELECT event_type, np AS n_pairs, round(sl, 4) AS ts_slope
         |FROM rk WHERE rn = (np + 1) // 2
         |ORDER BY event_type""".stripMargin)
}
