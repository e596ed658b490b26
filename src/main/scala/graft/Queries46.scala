package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 batch 10: survival analysis, two-sample distribution
  * testing, and single-split supervised structure
  * (SURVEY §2.8 X147-X149).
  */
object Queries46 {
  import Tables._

  /** q237 — KAPLAN-MEIER SURVIVAL CURVE (X147). Time-to-first-
    * purchase per user in whole hours from the user's first event,
    * administratively right-censored at 48 h (the fixed cutoff is
    * what makes censoring REAL at every sf — raw delays are all
    * observed). S(t) = Π_{t'≤t} (1 − d/n) (Kaplan & Meier 1958) in
    * 8dp FIXED-POINT: each factor is the integer floor
    * ((n−d)·10⁸) div n and the running product refolds to the e8
    * scale by integer division — no float and no round(double,·)
    * anywhere in the recursion, so the curve is engine- AND
    * libm-version-proof (round-8 driver gate: round(double,8) inside
    * the fold diverged across DuckDB builds); the oracle replays the
    * same integer fold as a recursive CTE. `surv` is the exact
    * IEEE division surv_e8/10⁸ (both factors ≤ 2⁵³ — deterministic).
    *
    * Scale: one user_id shuffle for the per-user aggregate, a ≤49-row
    * hour-level aggregate (bounded by the 48 h cutoff grid, not the
    * corpus), windows + the fold run on those ≤49 rows.
    */
  def q237(s: SparkSession, d: String): DataFrame = {
    val perUser = events(s, d)
      .groupBy(col("user_id"))
      .agg(min(expr("unix_micros(ts)")).as("fts"),
        min(when(col("event_type") === "purchase",
          expr("unix_micros(ts)"))).as("pts"))
      .withColumn("delay_h", expr("(pts - fts) div 3600000000"))
      .select(
        when(col("pts").isNotNull && col("delay_h") <= 48,
          col("delay_h")).otherwise(lit(48L)).as("t"),
        when(col("pts").isNotNull && col("delay_h") <= 48, lit(1L))
          .otherwise(lit(0L)).as("ev"))
    val byT = perUser.groupBy(col("t"))
      .agg(sum(col("ev")).as("d"), count(lit(1)).as("m"))
    val before = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val whole = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val withRisk = byT
      .withColumn("n_risk",
        sum(col("m")).over(whole) -
          coalesce(sum(col("m")).over(before), lit(0L)))
    withRisk
      .agg(sort_array(collect_list(
        struct(col("t"), col("n_risk"), col("d")))).as("steps"))
      .withColumn("survs", expr(
        """slice(aggregate(steps,
          |  array(CAST(100000000 AS BIGINT)),
          |  (acc, s) -> concat(acc, array(
          |    (element_at(acc, -1) *
          |      (((s.n_risk - s.d) * 100000000) div s.n_risk))
          |    div 100000000))),
          |2, size(steps))""".stripMargin))
      .select(explode(arrays_zip(col("steps"), col("survs"))).as("z"))
      .select(col("z.steps.t").as("t"), col("z.steps.n_risk").as("n_risk"),
        col("z.steps.d").as("d"),
        (col("z.survs").cast("double") / lit(100000000L)).as("surv"))
      .orderBy(col("t"))
  }

  /** q238 — TWO-SAMPLE KOLMOGOROV-SMIRNOV TEST (X148). Binned KS
    * (0.01-value grid) between the click and purchase value
    * distributions: D = max_x |F₁(x) − F₂(x)| evaluated at bin
    * boundaries. The numerator max|cum₁·n₂ − cum₂·n₁| is EXACT
    * integer arithmetic — only the final D and the 5% critical value
    * c(α)·√((n₁+n₂)/(n₁n₂)) are float, each one expression.
    *
    * Scale: one value-keyed aggregate over the fact table (bins
    * bounded by the 0.01 grid ≈ 49k, not by rows); the cumulative
    * window and argmax run on the bin aggregate; the tail is
    * TakeOrdered(1).
    */
  def q238(s: SparkSession, d: String): DataFrame = {
    val vals = events(s, d)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_type"), round(col("value"), 2).as("x"))
    val bins = vals.groupBy(col("x"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
        .as("b1"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("b2"))
    val cum = Window.orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val whole = Window.orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    bins
      .withColumn("cum1", sum(col("b1")).over(cum))
      .withColumn("cum2", sum(col("b2")).over(cum))
      .withColumn("n1", sum(col("b1")).over(whole))
      .withColumn("n2", sum(col("b2")).over(whole))
      .withColumn("gap", abs(col("cum1") * col("n2") - col("cum2") * col("n1")))
      .orderBy(col("gap").desc, col("x"))
      .limit(1)
      .select(col("n1"), col("n2"), col("gap").as("d_num"),
        col("x").as("at_value"),
        round(col("gap").cast("double") / (col("n1") * col("n2")), 6)
          .as("d_stat"),
        round(lit(1.358) * sqrt((col("n1") + col("n2")).cast("double") /
          (col("n1") * col("n2")).cast("double")), 6).as("crit_05"),
        when(round(col("gap").cast("double") / (col("n1") * col("n2")), 6) >
          round(lit(1.358) * sqrt((col("n1") + col("n2")).cast("double") /
            (col("n1") * col("n2")).cast("double")), 6),
          "reject_h0").otherwise("fail_to_reject").as("verdict"))
  }

  /** Weighted entropy block n·H(n,p) = n ln n − p ln p − (n−p) ln(n−p)
    * with the 0·ln 0 = 0 convention — integer counts in, one double
    * expression out, so the information gain below needs no per-class
    * ratio divisions.
    */
  private[graft] def went(n: Column, p: Column): Column = {
    def xlnx(c: Column): Column =
      when(c <= 0L, lit(0.0))
        .otherwise(c.cast("double") * log(c.cast("double")))
    xlnx(n) - xlnx(p) - xlnx(n - p)
  }

  /** q239 — DECISION-STUMP SPLIT FINDING (X149). Best single
    * threshold on o_totalprice (5000-currency-unit grid) predicting
    * urgent/high order priority, ranked by information gain in bits:
    * gain = [N·H(N,P) − nl·H(l) − nr·H(r)] / (N·ln 2). Counts and
    * cumulative sums are EXACT integers; entropy is the only float
    * stage, ranked on its 6dp rounding with the threshold as
    * tiebreak — the CART/C4.5 split-selection primitive every
    * feature-importance or binning pipeline reduces to.
    *
    * Scale: one ≤100-bin aggregate over orders (bounded by the price
    * grid), cumulative windows on the bin table, TakeOrdered(5) tail.
    */
  def q239(s: SparkSession, d: String): DataFrame = {
    val lab = orders(s, d).select(
      floor(col("o_totalprice") / 5000).cast("long").as("bin"),
      when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
        .otherwise(0L).as("y"))
    val byBin = lab.groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
    val cum = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val whole = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    byBin
      .withColumn("nl", sum(col("n")).over(cum))
      .withColumn("pl", sum(col("pos")).over(cum))
      .withColumn("nt", sum(col("n")).over(whole))
      .withColumn("pt", sum(col("pos")).over(whole))
      .withColumn("nr", col("nt") - col("nl"))
      .withColumn("pr", col("pt") - col("pl"))
      .filter(col("nl") > 0 && col("nr") > 0)
      .withColumn("gain_bits",
        round((went(col("nt"), col("pt")) - went(col("nl"), col("pl")) -
          went(col("nr"), col("pr"))) /
          col("nt").cast("double") / lit(0.6931471805599453), 6))
      .orderBy(col("gain_bits").desc, col("bin"))
      .limit(5)
      .select(((col("bin") + 1) * 5000).as("threshold"), col("gain_bits"),
        col("nl").as("n_left"), col("pl").as("pos_left"),
        col("nr").as("n_right"), col("pr").as("pos_right"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q237_kaplan_meier" -> (q237 _),
    "q238_ks_test" -> (q238 _),
    "q239_stump_split" -> (q239 _))
}

/** DuckDB mirrors of Queries46 — the KM decimal product replayed as a
  * recursive CTE, KS/stump on identical integer cumulatives.
  */
object Oracle46 {

  val sql: Map[String, String] = Map(
    "q237_kaplan_meier" ->
      """WITH RECURSIVE u AS (
        |  SELECT user_id, min(epoch_ns(ts) // 1000) AS fts,
        |    min(CASE WHEN event_type = 'purchase'
        |        THEN epoch_ns(ts) // 1000 END) AS pts
        |  FROM events GROUP BY 1),
        |dur AS (SELECT
        |    CASE WHEN pts IS NOT NULL AND (pts - fts) // 3600000000 <= 48
        |      THEN (pts - fts) // 3600000000 ELSE 48 END AS t,
        |    CASE WHEN pts IS NOT NULL AND (pts - fts) // 3600000000 <= 48
        |      THEN 1 ELSE 0 END AS ev
        |  FROM u),
        |byt AS (SELECT t, CAST(sum(ev) AS BIGINT) AS d, count(*) AS m
        |  FROM dur GROUP BY 1),
        |base AS (SELECT t, d,
        |    CAST(sum(m) OVER () - coalesce(sum(m) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS n_risk,
        |    row_number() OVER (ORDER BY t) AS rn
        |  FROM byt),
        |r AS (
        |  SELECT rn, t, n_risk, d,
        |    CAST((CAST(100000000 AS BIGINT) *
        |      (((n_risk - d) * 100000000) // n_risk)) // 100000000
        |      AS BIGINT) AS surv_e8
        |  FROM base WHERE rn = 1
        |  UNION ALL
        |  SELECT b.rn, b.t, b.n_risk, b.d,
        |    CAST((r.surv_e8 *
        |      (((b.n_risk - b.d) * 100000000) // b.n_risk)) // 100000000
        |      AS BIGINT)
        |  FROM r JOIN base b ON b.rn = r.rn + 1)
        |SELECT t, n_risk, d,
        |  CAST(surv_e8 AS DOUBLE) / 100000000 AS surv
        |FROM r ORDER BY t""".stripMargin,

    "q238_ks_test" ->
      """WITH vals AS (
        |  SELECT event_type, round("value", 2) AS x FROM events
        |  WHERE event_type IN ('click', 'purchase')),
        |bins AS (SELECT x,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS b1,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS b2
        |  FROM vals GROUP BY x),
        |c AS (SELECT x,
        |    CAST(sum(b1) OVER (ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum1,
        |    CAST(sum(b2) OVER (ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum2,
        |    CAST(sum(b1) OVER () AS BIGINT) AS n1,
        |    CAST(sum(b2) OVER () AS BIGINT) AS n2
        |  FROM bins),
        |g AS (SELECT *, abs(cum1 * n2 - cum2 * n1) AS gap FROM c
        |  ORDER BY gap DESC, x LIMIT 1)
        |SELECT n1, n2, gap AS d_num, x AS at_value,
        |  round(CAST(gap AS DOUBLE) / (n1 * n2), 6) AS d_stat,
        |  round(1.358 * sqrt(CAST(n1 + n2 AS DOUBLE) /
        |    CAST(n1 * n2 AS DOUBLE)), 6) AS crit_05,
        |  CASE WHEN round(CAST(gap AS DOUBLE) / (n1 * n2), 6) >
        |    round(1.358 * sqrt(CAST(n1 + n2 AS DOUBLE) /
        |      CAST(n1 * n2 AS DOUBLE)), 6)
        |    THEN 'reject_h0' ELSE 'fail_to_reject' END AS verdict
        |FROM g""".stripMargin,

    "q239_stump_split" ->
      """WITH lab AS (
        |  SELECT CAST(floor(o_totalprice / 5000) AS BIGINT) AS bin,
        |    CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END AS y
        |  FROM orders),
        |byb AS (SELECT bin, count(*) AS n, CAST(sum(y) AS BIGINT) AS pos
        |  FROM lab GROUP BY bin),
        |c AS (SELECT bin,
        |    CAST(sum(n) OVER (ORDER BY bin
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS nl,
        |    CAST(sum(pos) OVER (ORDER BY bin
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS pl,
        |    CAST(sum(n) OVER () AS BIGINT) AS nt,
        |    CAST(sum(pos) OVER () AS BIGINT) AS pt
        |  FROM byb),
        |f AS (SELECT bin, nl, pl, nt, pt, nt - nl AS nr, pt - pl AS pr
        |  FROM c WHERE nl > 0 AND nt - nl > 0),
        |g AS (SELECT *,
        |    round((
        |      (CASE WHEN nt <= 0 THEN 0.0 ELSE nt * ln(CAST(nt AS DOUBLE)) END
        |       - CASE WHEN pt <= 0 THEN 0.0 ELSE pt * ln(CAST(pt AS DOUBLE)) END
        |       - CASE WHEN nt - pt <= 0 THEN 0.0
        |           ELSE (nt - pt) * ln(CAST(nt - pt AS DOUBLE)) END)
        |      - (CASE WHEN nl <= 0 THEN 0.0 ELSE nl * ln(CAST(nl AS DOUBLE)) END
        |       - CASE WHEN pl <= 0 THEN 0.0 ELSE pl * ln(CAST(pl AS DOUBLE)) END
        |       - CASE WHEN nl - pl <= 0 THEN 0.0
        |           ELSE (nl - pl) * ln(CAST(nl - pl AS DOUBLE)) END)
        |      - (CASE WHEN nr <= 0 THEN 0.0 ELSE nr * ln(CAST(nr AS DOUBLE)) END
        |       - CASE WHEN pr <= 0 THEN 0.0 ELSE pr * ln(CAST(pr AS DOUBLE)) END
        |       - CASE WHEN nr - pr <= 0 THEN 0.0
        |           ELSE (nr - pr) * ln(CAST(nr - pr AS DOUBLE)) END)
        |    ) / CAST(nt AS DOUBLE) / 0.6931471805599453, 6) AS gain_bits
        |  FROM f)
        |SELECT (bin + 1) * 5000 AS threshold, gain_bits,
        |  nl AS n_left, pl AS pos_left, nr AS n_right, pr AS pos_right
        |FROM g ORDER BY gain_bits DESC, bin LIMIT 5""".stripMargin)
}
