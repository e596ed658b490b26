package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-9 batch 1: inequality / rank-correlation statistics
  * (SURVEY §2.8 X183-X185) — the revenue-concentration and
  * monotone-association read-outs every marketplace / corpus-balance
  * analysis starts from, built on the round-9 determinism conventions
  * (§7.4: decimal-exact monetary sums, floor-scaled event values,
  * integer rank algebra, one float expression per output).
  */
object Queries60 {
  import Tables._

  /** q273 — GINI COEFFICIENT + LORENZ DECILES (X183). Revenue
    * concentration across customers: per-customer decimal-exact
    * revenue, the Lorenz curve at customer deciles (cumulative
    * revenue share of the poorest 10%, 20%, …), and the Gini index
    * via the exact rank formula G = (2·Σᵢ i·rᵢ − (n+1)·Σrᵢ)/(n·Σrᵢ)
    * over revenues sorted ascending (i = 1..n, custkey tiebreak —
    * total order ⇒ identical ranks cross-engine). Σ i·rᵢ and Σ rᵢ
    * are EXACT decimal sums; G is one float division rounded 4dp.
    *
    * Scale: one custkey aggregate over orders; ranking windows run on
    * the |customers| aggregate; the decile rollup is 10 rows.
    */
  def q273(s: SparkSession, d: String): DataFrame = {
    val rev = orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(round(sum(col("o_totalprice").cast("decimal(38,10)")), 4)
        .cast("decimal(28,4)").as("r"))
    // Round 17 (VERDICT r16 #5): row_number + ntile over |customers|
    // rows planned a single-partition WindowExec unconditionally —
    // ONE adaptive ScaleRank pass now carries both (the global rank,
    // and ntile as its SQL:2003 closed form — result-identical on
    // either branch): the window under the 64 MB size estimate, the
    // distributed rank above it, where it also materializes the
    // ranked frame for the two consumers below.
    val ranked = ScaleRank.withGlobalRankAuto(rev, "i", "_n",
        col("r"), col("o_custkey"))
      .withColumn("decile", ScaleRank.ntileExpr("i", "_n", 10))
    val g = ranked.agg(
      count(lit(1)).as("n"),
      sum(col("r")).as("tot"),
      sum(col("r") * col("i")).as("wsum"))
      .select(col("n"), col("tot"),
        round((lit(2.0) * col("wsum").cast("double") -
          (col("n") + 1).cast("double") * col("tot").cast("double")) /
          (col("n").cast("double") * col("tot").cast("double")), 4)
          .as("gini"))
    ranked.groupBy(col("decile"))
      .agg(count(lit(1)).as("n_customers"), sum(col("r")).as("dec_rev"))
      .withColumn("cum_rev", sum(col("dec_rev")).over(
        Window.orderBy(col("decile"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .crossJoin(broadcast(g))
      .select(col("decile"), col("n_customers"),
        round(col("dec_rev").cast("double"), 4).as("decile_revenue"),
        round(col("cum_rev").cast("double") / col("tot").cast("double"), 4)
          .as("lorenz_cum_share"),
        col("gini"))
      .orderBy(col("decile"))
  }

  /** Shared daily (click, purchase) floor-scaled totals — the paired
    * series q274/q275 correlate. Days missing either type carry NULL
    * for it and are dropped (complete-pairs convention) BEFORE
    * ranking, so both tests see the same pair population.
    */
  private[graft] def dailyPairs(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(sum(when(col("event_type") === "click",
        floor(col("value") * lit(10000.0)).cast("long"))).as("x"),
        sum(when(col("event_type") === "purchase",
          floor(col("value") * lit(10000.0)).cast("long"))).as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)

  /** q274 — SPEARMAN RANK CORRELATION (X184). ρ between daily click
    * and purchase value totals = Pearson correlation of the AVERAGE
    * ranks, with ties handled by the standard midrank. Midranks are
    * half-integers, so both engines carry the EXACT doubled rank
    * r2 = 2·rank_min + (ties−1) as integers; the five correlation
    * moments are exact decimal(38,0) sums of r2 products and ρ is
    * one float expression (the ×2 scaling cancels). The
    * monotone-association complement to q207's Pearson screen —
    * outlier-immune, the form used for metric drift vs volume.
    *
    * Scale: one fact pass into the calendar-bounded day table; two
    * rank windows + a 5-moment aggregate on it.
    */
  def q274(s: SparkSession, d: String): DataFrame = {
    val dec = DecimalType(38, 0)
    def r2(v: String): org.apache.spark.sql.Column =
      lit(2) * rank().over(Window.orderBy(col(v))) +
        count(lit(1)).over(Window.partitionBy(col(v))) - 1
    val ranked = dailyPairs(s, d)
      .withColumn("rx", r2("x"))
      .withColumn("ry", r2("y"))
    ranked.agg(
      count(lit(1)).as("n_days"),
      sum(col("rx").cast(dec)).as("sx"),
      sum(col("ry").cast(dec)).as("sy"),
      sum((col("rx") * col("ry")).cast(dec)).as("sxy"),
      sum((col("rx") * col("rx")).cast(dec)).as("sxx"),
      sum((col("ry") * col("ry")).cast(dec)).as("syy"))
      .select(col("n_days"),
        round((col("n_days").cast("double") * col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double")) /
          (sqrt(col("n_days").cast("double") * col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double")) *
           sqrt(col("n_days").cast("double") * col("syy").cast("double") -
             col("sy").cast("double") * col("sy").cast("double"))), 4)
          .as("spearman_rho"))
      .withColumn("verdict",
        when(col("spearman_rho") > 0.5, "strong_positive")
          .when(col("spearman_rho") < -0.5, "strong_negative")
          .otherwise("weak"))
  }

  /** q275 — KENDALL TAU-B (X185). Concordant/discordant pair counts
    * over the same daily (click, purchase) series:
    * τ_b = (C − D)/√((n₀ − tx)(n₀ − ty)) with n₀ = n(n−1)/2 and
    * tx/ty the tied-pair counts — EVERYTHING up to the final square
    * roots is exact integer arithmetic on the day-pair self-join,
    * which is CALENDAR-bounded (n days ⇒ n²/2 pairs, independent of
    * the fact-table size — the q240 grid argument), so the quadratic
    * shape is scale-safe by construction.
    */
  def q275(s: SparkSession, d: String): DataFrame = {
    val p = dailyPairs(s, d)
    val a = p.select(col("day").as("da"), col("x").as("xa"), col("y").as("ya"))
    val b = p.select(col("day").as("db"), col("x").as("xb"), col("y").as("yb"))
    val pairs = a.join(b, col("da") < col("db"))
      .select(
        signum(col("xb") - col("xa")).as("sx"),
        signum(col("yb") - col("ya")).as("sy"))
    pairs.agg(
      sum(when(col("sx") * col("sy") > 0, 1L).otherwise(0L)).as("c"),
      sum(when(col("sx") * col("sy") < 0, 1L).otherwise(0L)).as("disc"),
      sum(when(col("sx") === 0 && col("sy") =!= 0, 1L).otherwise(0L)).as("tx"),
      sum(when(col("sy") === 0 && col("sx") =!= 0, 1L).otherwise(0L)).as("ty"),
      sum(when(col("sx") === 0 && col("sy") === 0, 1L).otherwise(0L)).as("txy"),
      count(lit(1)).as("n0"))
      .select(col("n0"), col("c"), col("disc"), col("tx"), col("ty"),
        col("txy"),
        round((col("c") - col("disc")).cast("double") /
          (sqrt((col("n0") - col("tx") - col("txy")).cast("double")) *
           sqrt((col("n0") - col("ty") - col("txy")).cast("double"))), 4)
          .as("kendall_tau_b"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q273_gini_lorenz" -> (q273 _),
    "q274_spearman" -> (q274 _),
    "q275_kendall_tau" -> (q275 _))
}

/** DuckDB mirrors of Queries60 — identical rank algebra, decimal
  * moments, calendar-bounded pair grids.
  */
object Oracle60 {

  val sql: Map[String, String] = Map(
    "q273_gini_lorenz" ->
      """WITH rev AS (
        |  SELECT o_custkey,
        |    CAST(round(sum(CAST(o_totalprice AS DECIMAL(38,10))), 4)
        |      AS DECIMAL(28,4)) AS r
        |  FROM orders GROUP BY 1),
        |rk AS (SELECT o_custkey, r,
        |    row_number() OVER (ORDER BY r, o_custkey) AS i,
        |    ntile(10) OVER (ORDER BY r, o_custkey) AS decile
        |  FROM rev),
        |g AS (SELECT count(*) AS n, sum(r) AS tot,
        |    sum(r * i) AS wsum FROM rk),
        |gg AS (SELECT n, tot,
        |    round((2.0 * CAST(wsum AS DOUBLE) -
        |      CAST(n + 1 AS DOUBLE) * CAST(tot AS DOUBLE)) /
        |      (CAST(n AS DOUBLE) * CAST(tot AS DOUBLE)), 4) AS gini
        |  FROM g),
        |dd AS (SELECT decile, count(*) AS n_customers,
        |    sum(r) AS dec_rev FROM rk GROUP BY decile),
        |cc AS (SELECT decile, n_customers, dec_rev,
        |    sum(dec_rev) OVER (ORDER BY decile
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rev
        |  FROM dd)
        |SELECT cc.decile, cc.n_customers,
        |  round(CAST(cc.dec_rev AS DOUBLE), 4) AS decile_revenue,
        |  round(CAST(cc.cum_rev AS DOUBLE) / CAST(gg.tot AS DOUBLE), 4)
        |    AS lorenz_cum_share,
        |  gg.gini
        |FROM cc, gg ORDER BY cc.decile""".stripMargin,

    "q274_spearman" ->
      """WITH dp AS (
        |  SELECT (epoch_ns(ts) // 1000) // 86400000000 AS day,
        |    sum(CASE WHEN event_type = 'click'
        |      THEN CAST(floor("value" * 10000.0) AS BIGINT) END) AS x,
        |    sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(floor("value" * 10000.0) AS BIGINT) END) AS y
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |  GROUP BY 1),
        |cp AS (SELECT day, x, y FROM dp
        |  WHERE x IS NOT NULL AND y IS NOT NULL),
        |rk AS (SELECT day,
        |    2 * rank() OVER (ORDER BY x) +
        |      count(*) OVER (PARTITION BY x) - 1 AS rx,
        |    2 * rank() OVER (ORDER BY y) +
        |      count(*) OVER (PARTITION BY y) - 1 AS ry
        |  FROM cp),
        |m AS (SELECT count(*) AS n,
        |    sum(CAST(rx AS DECIMAL(38,0))) AS sx,
        |    sum(CAST(ry AS DECIMAL(38,0))) AS sy,
        |    sum(CAST(rx * ry AS DECIMAL(38,0))) AS sxy,
        |    sum(CAST(rx * rx AS DECIMAL(38,0))) AS sxx,
        |    sum(CAST(ry * ry AS DECIMAL(38,0))) AS syy
        |  FROM rk)
        |SELECT n AS n_days,
        |  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
        |    CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |    (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |      CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |     sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
        |       CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 4)
        |    AS spearman_rho,
        |  CASE WHEN round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
        |      CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |      (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |        CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |       sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
        |         CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 4) > 0.5
        |      THEN 'strong_positive'
        |    WHEN round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
        |      CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |      (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |        CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |       sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
        |         CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 4) < -0.5
        |      THEN 'strong_negative'
        |    ELSE 'weak' END AS verdict
        |FROM m""".stripMargin,

    "q275_kendall_tau" ->
      """WITH dp AS (
        |  SELECT (epoch_ns(ts) // 1000) // 86400000000 AS day,
        |    sum(CASE WHEN event_type = 'click'
        |      THEN CAST(floor("value" * 10000.0) AS BIGINT) END) AS x,
        |    sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(floor("value" * 10000.0) AS BIGINT) END) AS y
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |  GROUP BY 1),
        |cp AS (SELECT day, x, y FROM dp
        |  WHERE x IS NOT NULL AND y IS NOT NULL),
        |pr AS (SELECT sign(b.x - a.x) AS sx, sign(b.y - a.y) AS sy
        |  FROM cp a JOIN cp b ON a.day < b.day),
        |m AS (SELECT
        |    CAST(sum(CASE WHEN sx * sy > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS c,
        |    CAST(sum(CASE WHEN sx * sy < 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS disc,
        |    CAST(sum(CASE WHEN sx = 0 AND sy <> 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS tx,
        |    CAST(sum(CASE WHEN sy = 0 AND sx <> 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS ty,
        |    CAST(sum(CASE WHEN sx = 0 AND sy = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS txy,
        |    count(*) AS n0
        |  FROM pr)
        |SELECT n0, c, disc, tx, ty, txy,
        |  round(CAST(c - disc AS DOUBLE) /
        |    (sqrt(CAST(n0 - tx - txy AS DOUBLE)) *
        |     sqrt(CAST(n0 - ty - txy AS DOUBLE))), 4) AS kendall_tau_b
        |FROM m""".stripMargin)
}
