package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 batch 2: six classical statistical-test / diagnostics
  * operators (SURVEY §2.8 X199–X204) — one-way ANOVA, Kruskal-Wallis,
  * Welch's t, Durbin-Watson, the Wald-Wolfowitz runs test, and a
  * lexical-richness census. All follow the §7.4 parity discipline:
  * moment sums are exact decimals (order-free), per-group float terms
  * are 6dp-rounded decimals before any cross-group sum, and the final
  * statistic is one scalar double expression identical in both
  * engines.
  */
object Queries65 {
  import Tables._

  private val dec10 = "decimal(38,10)"
  private val dec0 = "decimal(38,0)"

  /** Shared per-event-type moment frame: n, Σx, Σx² over events.value
    * with the decimal-sum discipline (x·x is ONE double product —
    * IEEE-identical in both engines — then quantized to 10dp so the
    * sum is order-free).
    */
  private def typeMoments(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .filter(col("event_type").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(dec10)).as("sx"),
        sum((col("value") * col("value")).cast(dec10)).as("sxx"))

  /** q289 — ONE-WAY ANOVA F-TEST (X199). Does mean event value differ
    * across event types? Decomposes total variance into
    * between/within sums of squares and reports F = (SSB/df1)/
    * (SSW/df2) plus the η² effect size. Per-group contribution
    * (Σx_g)²/n_g is rounded to 6dp decimal BEFORE the cross-group sum
    * (the q236 term discipline) so the statistic is
    * evaluation-order-free; grand moments are exact decimal sums of
    * the group moments.
    *
    * Scale: one partial+final aggregate over the fact table into a
    * ≤|types|-row frame; everything after is broadcast scalar
    * algebra. No second data pass — SSW comes from ΣΣx² − Σterms.
    */
  def q289(s: SparkSession, d: String): DataFrame = {
    val terms = typeMoments(s, d)
      .withColumn("term",
        round(col("sx").cast("double") * col("sx").cast("double") /
          col("n").cast("double"), 6).cast("decimal(38,6)"))
    terms.agg(
        count(lit(1)).as("n_groups"),
        sum(col("n")).as("n_total"),
        sum(col("sx")).as("sxg"),
        sum(col("sxx")).as("sxxg"),
        sum(col("term")).as("c"))
      .select(col("n_groups"), col("n_total"),
        (col("c").cast("double") -
          col("sxg").cast("double") * col("sxg").cast("double") /
            col("n_total").cast("double")).as("ssb"),
        (col("sxxg").cast("double") - col("c").cast("double")).as("ssw"),
        (col("n_groups") - 1).as("df1"),
        (col("n_total") - col("n_groups")).as("df2"))
      .select(col("n_groups"), col("n_total"),
        round(col("ssb"), 4).as("ss_between"),
        round(col("ssw"), 4).as("ss_within"),
        col("df1"), col("df2"),
        round((col("ssb") / col("df1")) / (col("ssw") / col("df2")), 4)
          .as("f_stat"),
        round(col("ssb") / (col("ssb") + col("ssw")), 6).as("eta_squared"))
  }

  /** q290 — KRUSKAL-WALLIS H TEST (X200). The rank-based ANOVA:
    * does the l_quantity distribution differ across return flags?
    * Ranks are mid-ranks over the VALUE CENSUS, not the rows — the
    * cumulative window runs over ≤50 distinct quantities, never the
    * fact table, and doubled ranks (2·cum_before + t + 1) keep every
    * rank an exact integer. Per-group doubled rank sums are exact
    * decimal dot products of the census; the (R_g)²/n_g terms are
    * 6dp-rounded decimals before the cross-group sum. Includes the
    * tie correction 1 − Σ(t³−t)/(N³−N) computed in decimal (N³
    * exceeds 2^53 already at sf0.1 — a double would silently round).
    *
    * Scale: one (flag, value) census aggregate; the rank window is
    * value-cardinality-bounded, single tiny partition by design.
    */
  def q290(s: SparkSession, d: String): DataFrame = {
    val cells = lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_quantity"))
      .agg(count(lit(1)).as("cg"))
    val census = cells.groupBy(col("l_quantity"))
      .agg(sum(col("cg")).as("t"))
      .withColumn("cum",
        sum(col("t")).over(Window.orderBy(col("l_quantity"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      // doubled mid-rank: 2·(cum − t) + t + 1 = 2·cum − t + 1
      .withColumn("rank2", lit(2L) * col("cum") - col("t") + 1L)
    val groups = cells.join(census.select(col("l_quantity"), col("rank2")),
        Seq("l_quantity"))
      .groupBy(col("l_returnflag"))
      .agg(sum(col("cg")).as("ng"),
        sum((col("cg") * col("rank2")).cast(dec0)).as("r2g"))
      .withColumn("term",
        round(col("r2g").cast("double") * col("r2g").cast("double") /
          (lit(4.0) * col("ng").cast("double")), 6).cast("decimal(38,6)"))
    val ties = census.agg(
      sum((col("t").cast(dec0) * col("t").cast(dec0) * col("t").cast(dec0) -
        col("t").cast(dec0))).as("tie3"),
      count(lit(1)).as("n_values"))
    groups.agg(count(lit(1)).as("n_groups"), sum(col("ng")).as("n_total"),
        sum(col("term")).as("srt"))
      .crossJoin(broadcast(ties))
      .withColumn("nd", col("n_total").cast("double"))
      .withColumn("h",
        lit(12.0) / (col("nd") * (col("nd") + 1.0)) *
          col("srt").cast("double") - lit(3.0) * (col("nd") + 1.0))
      .withColumn("cf",
        lit(1.0) - col("tie3").cast("double") /
          (col("n_total").cast(dec0) * col("n_total").cast(dec0) *
            col("n_total").cast(dec0) - col("n_total").cast(dec0))
            .cast("double"))
      .select(col("n_total"), col("n_groups"), col("n_values"),
        round(col("h"), 4).as("h_stat"),
        round(col("cf"), 6).as("tie_correction"),
        round(col("h") / col("cf"), 4).as("h_corrected"))
  }

  /** q291 — WELCH'S T-TEST, ONE-VS-REST (X201). For each event type:
    * is its mean value different from the rest of the stream? The
    * unequal-variance t with Welch-Satterthwaite degrees of freedom.
    * The rest-arm moments are EXACT decimal differences of the grand
    * totals (n₀ = N − n, Σx₀ = ΣX − Σx) — one data pass serves all
    * five tests, no per-type anti-join.
    *
    * Scale: one aggregate + a 1-row broadcast of the grand totals.
    */
  def q291(s: SparkSession, d: String): DataFrame = {
    val g = typeMoments(s, d)
    val tot = g.agg(sum(col("n")).as("nt"), sum(col("sx")).as("sxt"),
      sum(col("sxx")).as("sxxt"))
    g.crossJoin(broadcast(tot))
      .withColumn("n0", col("nt") - col("n"))
      .withColumn("m1", col("sx").cast("double") / col("n"))
      .withColumn("m0",
        (col("sxt") - col("sx")).cast("double") / col("n0"))
      .withColumn("v1",
        (col("sxx").cast("double") -
          col("sx").cast("double") * col("sx").cast("double") / col("n")) /
          (col("n") - 1))
      .withColumn("v0",
        ((col("sxxt") - col("sxx")).cast("double") -
          (col("sxt") - col("sx")).cast("double") *
          (col("sxt") - col("sx")).cast("double") / col("n0")) /
          (col("n0") - 1))
      .withColumn("se2", col("v1") / col("n") + col("v0") / col("n0"))
      // + 0.0 canonicalizes IEEE -0.0 (q66/q133 convention: DuckDB
      // round() preserves the sign, Spark's does not — bites when a
      // type's mean sits within 5e-5 of the rest's)
      .select(col("event_type"), col("n"), col("n0").as("n_rest"),
        (round(col("m1") - col("m0"), 4) + lit(0.0)).as("mean_diff"),
        (round((col("m1") - col("m0")) / sqrt(col("se2")), 4) + lit(0.0))
          .as("t_stat"),
        round(col("se2") * col("se2") /
          ((col("v1") / col("n")) * (col("v1") / col("n")) /
            (col("n") - 1) +
           (col("v0") / col("n0")) * (col("v0") / col("n0")) /
            (col("n0") - 1)), 2).as("df"))
      .orderBy(col("event_type"))
  }

  /** Shared per-type daily series with the q227 time index. */
  private def dailySeries(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .filter(col("event_type").isNotNull)
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("x"))
      .withColumn("t", col("day") -
        min(col("day")).over(Window.partitionBy(col("event_type"))))

  /** q292 — DURBIN-WATSON AUTOCORRELATION DIAGNOSTIC (X202). Fits the
    * q227 OLS trend to each type's daily-count series, then tests the
    * RESIDUALS for serial correlation: DW = Σ(e_t−e_{t−1})²/Σe_t².
    * Both sums collapse to exact-integer building blocks — the
    * numerator is ΣΔx² − 2b·ΣΔxΔt + b²·ΣΔt² over consecutive-day
    * deltas (integers), the denominator is SSE = Syy − b·Sty from the
    * OLS moment sums — so the only floats are b and the final ratio.
    * ρ₁ ≈ 1 − DW/2 is reported alongside.
    *
    * Scale: daily pre-aggregation first (the series, not the fact
    * table, feeds the lag window); per-type windows are
    * days-bounded. n_days ≥ 3 and SSE > 0 guards mirror the q246
    * zero-variance convention.
    */
  def q292(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("t"))
    val daily = dailySeries(s, d)
      .withColumn("dx", col("x") - lag(col("x"), 1).over(w))
      .withColumn("dt", col("t") - lag(col("t"), 1).over(w))
    daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("t").cast(dec0)).as("st"),
        sum(col("x").cast(dec0)).as("sx"),
        sum((col("t") * col("x")).cast(dec0)).as("stx"),
        sum((col("t") * col("t")).cast(dec0)).as("stt"),
        sum((col("x") * col("x")).cast(dec0)).as("sxx"),
        sum((col("dx") * col("dx")).cast(dec0)).as("sdx2"),
        sum((col("dx") * col("dt")).cast(dec0)).as("sdxdt"),
        sum((col("dt") * col("dt")).cast(dec0)).as("sdt2"))
      .filter(col("n") >= 3)
      .withColumn("b",
        (col("n") * col("stx") - col("st") * col("sx")).cast("double") /
          (col("n") * col("stt") - col("st") * col("st")).cast("double"))
      .withColumn("sse",
        (col("sxx").cast("double") -
          col("sx").cast("double") * col("sx").cast("double") /
            col("n").cast("double")) -
        col("b") * (col("stx").cast("double") -
          col("st").cast("double") * col("sx").cast("double") /
            col("n").cast("double")))
      .filter(col("sse") > 0)
      .withColumn("dw",
        (col("sdx2").cast("double") -
          lit(2.0) * col("b") * col("sdxdt").cast("double") +
          col("b") * col("b") * col("sdt2").cast("double")) / col("sse"))
      .select(col("event_type"), col("n").as("n_days"),
        round(col("b"), 6).as("slope"),
        round(col("dw"), 4).as("dw_stat"),
        round(lit(1.0) - col("dw") / 2.0, 4).as("rho1"))
      .orderBy(col("event_type"))
  }

  /** q293 — WALD-WOLFOWITZ RUNS TEST (X203). Is each type's daily
    * up/down pattern random? Signs of consecutive-day count deltas
    * (zeros dropped), runs counted as sign changes + 1, z-scored
    * against E[R] = 2n₊n₋/n + 1 and its exact variance. Everything
    * up to the final z is integer arithmetic; groups without both
    * signs (variance undefined) are filtered, mirroring q246.
    *
    * Scale: the two windows run over the days-bounded per-type
    * series; the test itself is a ≤|types|-row aggregate.
    */
  def q293(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("t"))
    val signs = dailySeries(s, d)
      .withColumn("dx", col("x") - lag(col("x"), 1).over(w))
      .filter(col("dx").isNotNull && col("dx") =!= 0)
      .withColumn("sgn", when(col("dx") > 0, 1).otherwise(-1))
      .withColumn("chg",
        when(lag(col("sgn"), 1).over(w).isNull, 0)
          .when(lag(col("sgn"), 1).over(w) =!= col("sgn"), 1)
          .otherwise(0))
    signs.groupBy(col("event_type"))
      .agg(sum(when(col("sgn") === 1, 1L).otherwise(0L)).as("n_up"),
        sum(when(col("sgn") === -1, 1L).otherwise(0L)).as("n_down"),
        (sum(col("chg")) + 1L).as("n_runs"))
      .filter(col("n_up") > 0 && col("n_down") > 0 &&
        col("n_up") + col("n_down") > 1)
      .withColumn("n", (col("n_up") + col("n_down")).cast("double"))
      .withColumn("p2", lit(2.0) * col("n_up") * col("n_down"))
      .withColumn("er", col("p2") / col("n") + 1.0)
      .withColumn("vr",
        col("p2") * (col("p2") - col("n")) /
          (col("n") * col("n") * (col("n") - 1.0)))
      .select(col("event_type"),
        (col("n_up") + col("n_down")).as("n_moves"),
        col("n_up"), col("n_down"), col("n_runs"),
        round(col("er"), 4).as("expected_runs"),
        round((col("n_runs") - col("er")) / sqrt(col("vr")), 4)
          .as("z_stat"))
      .orderBy(col("event_type"))
  }

  /** q294 — LEXICAL-RICHNESS CENSUS (X204). Per-source vocabulary
    * health for corpus curation: type-token ratio and Guiraud's
    * R = V/√N per document (both quantized to 6dp decimal so the
    * per-source means are order-free), plus the aggregate
    * types-per-token ratio. Degenerate TTR≈1 sources are synthetic
    * or deduplicated-to-death; TTR collapsing toward 0 flags
    * boilerplate. The log-log Herdan fit is deliberately NOT used —
    * ln() inside an accumulated sum is the libm-divergence class
    * §7.4 bans; V/√N keeps the richness normalization inside IEEE-
    * exact sqrt.
    *
    * Scale: per-row HOF tokenize + array_distinct (no shuffle), one
    * source-bounded aggregate.
    */
  def q294(s: SparkSession, d: String): DataFrame = {
    val dec6 = "decimal(18,6)"
    documents(s, d)
      .withColumn("toks", expr("filter(split(text, ' '), w -> length(w) > 0)"))
      .withColumn("nt", size(col("toks")).cast("long"))
      .filter(col("nt") >= 1)
      .withColumn("nv", size(array_distinct(col("toks"))).cast("long"))
      .withColumn("ttr",
        round(col("nv").cast("double") / col("nt").cast("double"), 6)
          .cast(dec6))
      .withColumn("guiraud",
        round(col("nv").cast("double") / sqrt(col("nt").cast("double")), 6)
          .cast(dec6))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nt")).as("total_tokens"),
        sum(col("nv")).as("total_types"),
        round(sum(col("ttr")).cast("double") / count(lit(1)), 4)
          .as("avg_ttr"),
        round(sum(col("guiraud")).cast("double") / count(lit(1)), 4)
          .as("avg_guiraud"),
        round(sum(col("nv")).cast("double") / sum(col("nt")).cast("double"),
          6).as("corpus_ttr"))
      .orderBy(col("source"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q289_anova_f" -> (q289 _),
    "q290_kruskal_wallis" -> (q290 _),
    "q291_welch_ttest" -> (q291 _),
    "q292_durbin_watson" -> (q292 _),
    "q293_runs_test" -> (q293 _),
    "q294_lexical_richness" -> (q294 _))
}

/** DuckDB mirrors of Queries65 — identical moment/term/rank algebra,
  * decimal where Spark is decimal, the same guards.
  */
object Oracle65 {

  private val day = "(epoch_ns(ts) // 1000) // 86400000000"

  private val typeMoments =
    s"""g AS (SELECT event_type, count(*) AS n,
       |    sum(CAST("value" AS DECIMAL(38,10))) AS sx,
       |    sum(CAST("value" * "value" AS DECIMAL(38,10))) AS sxx
       |  FROM events WHERE event_type IS NOT NULL GROUP BY 1)""".stripMargin

  private val dailySeries =
    s"""daily AS (SELECT event_type, $day AS day, count(*) AS x
       |  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
       |ser AS (SELECT event_type, x,
       |    day - min(day) OVER (PARTITION BY event_type) AS t
       |  FROM daily)""".stripMargin

  val sql: Map[String, String] = Map(
    "q289_anova_f" ->
      s"""WITH $typeMoments,
         |terms AS (SELECT n, sx, sxx,
         |    CAST(round(CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) /
         |      CAST(n AS DOUBLE), 6) AS DECIMAL(38,6)) AS term
         |  FROM g),
         |tot AS (SELECT count(*) AS n_groups,
         |    CAST(sum(n) AS BIGINT) AS n_total,
         |    sum(sx) AS sxg, sum(sxx) AS sxxg, sum(term) AS c
         |  FROM terms),
         |ss AS (SELECT n_groups, n_total,
         |    CAST(c AS DOUBLE) - CAST(sxg AS DOUBLE) * CAST(sxg AS DOUBLE) /
         |      CAST(n_total AS DOUBLE) AS ssb,
         |    CAST(sxxg AS DOUBLE) - CAST(c AS DOUBLE) AS ssw,
         |    n_groups - 1 AS df1, n_total - n_groups AS df2
         |  FROM tot)
         |SELECT n_groups, n_total,
         |  round(ssb, 4) AS ss_between, round(ssw, 4) AS ss_within,
         |  CAST(df1 AS BIGINT) AS df1, CAST(df2 AS BIGINT) AS df2,
         |  round((ssb / df1) / (ssw / df2), 4) AS f_stat,
         |  round(ssb / (ssb + ssw), 6) AS eta_squared
         |FROM ss""".stripMargin,

    "q290_kruskal_wallis" ->
      """WITH cells AS (SELECT l_returnflag, l_quantity, count(*) AS cg
        |  FROM lineitem GROUP BY 1, 2),
        |census AS (SELECT l_quantity, sum(cg) AS t,
        |    sum(sum(cg)) OVER (ORDER BY l_quantity
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM cells GROUP BY 1),
        |ranked AS (SELECT l_quantity, t, 2 * cum - t + 1 AS rank2
        |  FROM census),
        |groups AS (SELECT c.l_returnflag, sum(c.cg) AS ng,
        |    sum(CAST(c.cg * r.rank2 AS DECIMAL(38,0))) AS r2g
        |  FROM cells c JOIN ranked r USING (l_quantity) GROUP BY 1),
        |terms AS (SELECT ng,
        |    CAST(round(CAST(r2g AS DOUBLE) * CAST(r2g AS DOUBLE) /
        |      (4.0 * CAST(ng AS DOUBLE)), 6) AS DECIMAL(38,6)) AS term
        |  FROM groups),
        |ties AS (SELECT
        |    sum(CAST(t AS DECIMAL(38,0)) * CAST(t AS DECIMAL(38,0)) *
        |      CAST(t AS DECIMAL(38,0)) - CAST(t AS DECIMAL(38,0))) AS tie3,
        |    count(*) AS n_values
        |  FROM census),
        |agg AS (SELECT count(*) AS n_groups,
        |    CAST(sum(ng) AS BIGINT) AS n_total, sum(term) AS srt
        |  FROM terms),
        |stat AS (SELECT n_total, n_groups, n_values,
        |    12.0 / (CAST(n_total AS DOUBLE) * (CAST(n_total AS DOUBLE) + 1.0))
        |      * CAST(srt AS DOUBLE) - 3.0 * (CAST(n_total AS DOUBLE) + 1.0)
        |      AS h,
        |    1.0 - CAST(tie3 AS DOUBLE) /
        |      CAST(CAST(n_total AS DECIMAL(38,0)) *
        |        CAST(n_total AS DECIMAL(38,0)) *
        |        CAST(n_total AS DECIMAL(38,0)) -
        |        CAST(n_total AS DECIMAL(38,0)) AS DOUBLE) AS cf
        |  FROM agg, ties)
        |SELECT n_total, n_groups, n_values,
        |  round(h, 4) AS h_stat, round(cf, 6) AS tie_correction,
        |  round(h / cf, 4) AS h_corrected
        |FROM stat""".stripMargin,

    "q291_welch_ttest" ->
      s"""WITH $typeMoments,
         |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt, sum(sx) AS sxt,
         |    sum(sxx) AS sxxt
         |  FROM g),
         |j AS (SELECT g.event_type, g.n, tot.nt - g.n AS n0,
         |    CAST(g.sx AS DOUBLE) / g.n AS m1,
         |    CAST(tot.sxt - g.sx AS DOUBLE) / (tot.nt - g.n) AS m0,
         |    (CAST(g.sxx AS DOUBLE) -
         |      CAST(g.sx AS DOUBLE) * CAST(g.sx AS DOUBLE) / g.n) /
         |      (g.n - 1) AS v1,
         |    (CAST(tot.sxxt - g.sxx AS DOUBLE) -
         |      CAST(tot.sxt - g.sx AS DOUBLE) *
         |      CAST(tot.sxt - g.sx AS DOUBLE) / (tot.nt - g.n)) /
         |      (tot.nt - g.n - 1) AS v0
         |  FROM g, tot),
         |se AS (SELECT *, v1 / n + v0 / n0 AS se2 FROM j)
         |SELECT event_type, CAST(n AS BIGINT) AS n,
         |  CAST(n0 AS BIGINT) AS n_rest,
         |  round(m1 - m0, 4) + 0.0 AS mean_diff,
         |  round((m1 - m0) / sqrt(se2), 4) + 0.0 AS t_stat,
         |  round(se2 * se2 /
         |    ((v1 / n) * (v1 / n) / (n - 1) +
         |     (v0 / n0) * (v0 / n0) / (n0 - 1)), 2) AS df
         |FROM se ORDER BY event_type""".stripMargin,

    "q292_durbin_watson" ->
      s"""WITH $dailySeries,
         |lagged AS (SELECT event_type, x, t,
         |    x - lag(x) OVER (PARTITION BY event_type ORDER BY t) AS dx,
         |    t - lag(t) OVER (PARTITION BY event_type ORDER BY t) AS dt
         |  FROM ser),
         |m AS (SELECT event_type, count(*) AS n,
         |    sum(CAST(t AS DECIMAL(38,0))) AS st,
         |    sum(CAST(x AS DECIMAL(38,0))) AS sx,
         |    sum(CAST(t * x AS DECIMAL(38,0))) AS stx,
         |    sum(CAST(t * t AS DECIMAL(38,0))) AS stt,
         |    sum(CAST(x * x AS DECIMAL(38,0))) AS sxx,
         |    sum(CAST(dx * dx AS DECIMAL(38,0))) AS sdx2,
         |    sum(CAST(dx * dt AS DECIMAL(38,0))) AS sdxdt,
         |    sum(CAST(dt * dt AS DECIMAL(38,0))) AS sdt2
         |  FROM lagged GROUP BY 1 HAVING count(*) >= 3),
         |fit AS (SELECT *,
         |    CAST(n * stx - st * sx AS DOUBLE) /
         |      CAST(n * stt - st * st AS DOUBLE) AS b
         |  FROM m),
         |res AS (SELECT *,
         |    (CAST(sxx AS DOUBLE) -
         |      CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) /
         |        CAST(n AS DOUBLE)) -
         |    b * (CAST(stx AS DOUBLE) -
         |      CAST(st AS DOUBLE) * CAST(sx AS DOUBLE) /
         |        CAST(n AS DOUBLE)) AS sse
         |  FROM fit),
         |dw AS (SELECT *,
         |    (CAST(sdx2 AS DOUBLE) - 2.0 * b * CAST(sdxdt AS DOUBLE) +
         |      b * b * CAST(sdt2 AS DOUBLE)) / sse AS dwv
         |  FROM res WHERE sse > 0)
         |SELECT event_type, CAST(n AS BIGINT) AS n_days,
         |  round(b, 6) AS slope, round(dwv, 4) AS dw_stat,
         |  round(1.0 - dwv / 2.0, 4) AS rho1
         |FROM dw ORDER BY event_type""".stripMargin,

    "q293_runs_test" ->
      s"""WITH $dailySeries,
         |lagged AS (SELECT event_type, t,
         |    x - lag(x) OVER (PARTITION BY event_type ORDER BY t) AS dx
         |  FROM ser),
         |sgns AS (SELECT event_type, t,
         |    CASE WHEN dx > 0 THEN 1 ELSE -1 END AS sgn
         |  FROM lagged WHERE dx IS NOT NULL AND dx <> 0),
         |chg AS (SELECT event_type, sgn,
         |    CASE WHEN lag(sgn) OVER
         |        (PARTITION BY event_type ORDER BY t) IS NULL THEN 0
         |      WHEN lag(sgn) OVER
         |        (PARTITION BY event_type ORDER BY t) <> sgn THEN 1
         |      ELSE 0 END AS c
         |  FROM sgns),
         |r AS (SELECT event_type,
         |    sum(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS n_up,
         |    sum(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS n_down,
         |    sum(c) + 1 AS n_runs
         |  FROM chg GROUP BY 1
         |  HAVING sum(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) > 0
         |    AND sum(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) > 0
         |    AND count(*) > 1),
         |s AS (SELECT *, CAST(n_up + n_down AS DOUBLE) AS n,
         |    2.0 * n_up * n_down AS p2
         |  FROM r),
         |e AS (SELECT *, p2 / n + 1.0 AS er,
         |    p2 * (p2 - n) / (n * n * (n - 1.0)) AS vr
         |  FROM s)
         |SELECT event_type, CAST(n_up + n_down AS BIGINT) AS n_moves,
         |  CAST(n_up AS BIGINT) AS n_up, CAST(n_down AS BIGINT) AS n_down,
         |  CAST(n_runs AS BIGINT) AS n_runs,
         |  round(er, 4) AS expected_runs,
         |  round((n_runs - er) / sqrt(vr), 4) AS z_stat
         |FROM e ORDER BY event_type""".stripMargin,

    "q294_lexical_richness" ->
      """WITH t AS (SELECT source,
        |    list_filter(string_split(text, ' '), w -> length(w) > 0) AS toks
        |  FROM documents),
        |pd AS (SELECT source, len(toks) AS nt,
        |    len(list_distinct(toks)) AS nv
        |  FROM t WHERE len(toks) >= 1),
        |q AS (SELECT source, nt, nv,
        |    CAST(round(CAST(nv AS DOUBLE) / CAST(nt AS DOUBLE), 6)
        |      AS DECIMAL(18,6)) AS ttr,
        |    CAST(round(CAST(nv AS DOUBLE) / sqrt(CAST(nt AS DOUBLE)), 6)
        |      AS DECIMAL(18,6)) AS guiraud
        |  FROM pd)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(nt) AS BIGINT) AS total_tokens,
        |  CAST(sum(nv) AS BIGINT) AS total_types,
        |  round(CAST(sum(ttr) AS DOUBLE) / count(*), 4) AS avg_ttr,
        |  round(CAST(sum(guiraud) AS DOUBLE) / count(*), 4) AS avg_guiraud,
        |  round(CAST(sum(nv) AS DOUBLE) / CAST(sum(nt) AS DOUBLE), 6)
        |    AS corpus_ttr
        |FROM q GROUP BY source ORDER BY source""".stripMargin)
}
