package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-7 batch 11: expectation-suite validation, burst detection,
  * seasonal decomposition, and tokenizer-vocabulary planning.
  *
  *  - q192 runs a multi-rule data contract (expectations suite) over
  *    documents in ONE pass — the Great-Expectations-style gate a
  *    pipeline runs before promoting a crawl (q74/q19 check one rule
  *    each; this is the suite report).
  *  - q193 finds burst behavior: each user's max event count in any
  *    sliding 1-hour window, via a RANGE frame (value-based, so
  *    tied timestamps behave identically cross-engine).
  *  - q194 decomposes the daily event series into trend (centered
  *    7-day MA) + day-of-week effect + residual — the monitor that
  *    separates "weekend dip" from "real anomaly".
  *  - q195 turns the q164 BPE pair census into a coverage curve:
  *    what share of adjacent-pair occurrences the top-K merges
  *    capture — the measurement a tokenizer-vocab size is chosen
  *    from.
  */
object Queries27 {
  import Tables._

  private val dec = DecimalType(38, 18)

  /** q192 — DATA-CONTRACT SUITE. Six expectations evaluated in one
    * narrow pass (conditional sums; uniqueness as count −
    * count_distinct in the same aggregate), emitted long-form via
    * stack() with per-rule violation rates. Rules are calibrated so
    * some FIRE on this corpus (r3/r4 length band) — an all-green
    * suite would be a vacuous oracle.
    *
    * Scale: one partial+final aggregate over the scan; the suite
    * report is 6 rows from a stack generator on the 1-row aggregate.
    * count_distinct is the one expensive term (exact by contract —
    * the release gate must not estimate); at 100 TB it rides the
    * same aggregate's partial path.
    */
  def q192(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("text").isNull || length(col("text")) === 0, 1L)
          .otherwise(0L)).as("v1"),
        sum(when(col("lang").isNull ||
          !col("lang").isInCollection(Seq("en", "fr", "es", "de", "zh")),
          1L).otherwise(0L)).as("v2"),
        sum(when(col("n_chars").isNull || col("n_chars") < 100, 1L)
          .otherwise(0L)).as("v3"),
        sum(when(col("n_chars") > 500, 1L).otherwise(0L)).as("v4"),
        sum(when(col("n_chars") =!= length(col("text")), 1L)
          .otherwise(0L)).as("v5"),
        (count(lit(1)) - count_distinct(col("doc_id"))).as("v6"))
      .selectExpr(
        """stack(6,
          |  'r1_text_nonempty', v1,
          |  'r2_lang_known', v2,
          |  'r3_len_min100', v3,
          |  'r4_len_max500', v4,
          |  'r5_chars_consistent', v5,
          |  'r6_id_unique', v6) AS (rule, n_violations)""".stripMargin,
        "n_docs")
      .select(col("rule"), col("n_violations"),
        round(col("n_violations").cast("double") /
          col("n_docs").cast("double"), 4).as("violation_rate"),
        (col("n_violations") === 0).as("passed"))
      .orderBy(col("rule"))

  /** q193 — BURST DETECTION. Each user's maximum event count inside
    * any sliding 1-hour window, top-10 burstiest users. The frame is
    * RANGE-based on integer µs (value frames treat tied timestamps
    * identically on both engines, unlike ROWS) and slides per event —
    * no self-join against a time range, no window fan-out.
    *
    * Scale: one linear RANGE-frame pass per user partition, then a
    * per-user max in the same shuffle's aggregate; top-10 is
    * TakeOrdered. A skewed user concentrates one partition — the
    * q178 diagnosis applies before this runs.
    */
  def q193(s: SparkSession, d: String): DataFrame = {
    val wr = Window.partitionBy(col("user_id")).orderBy(col("t"))
      .rangeBetween(-3599999999L, 0L)
    events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("t"))
      .withColumn("burst", count(lit(1)).over(wr))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), max(col("burst")).as("max_burst"))
      .orderBy(col("max_burst").desc, col("user_id"))
      .limit(10)
  }

  /** q194 — SEASONAL DECOMPOSITION. The daily event series split into
    * trend (centered 7-day moving average), day-of-week effect (mean
    * detrended value per dow) and residual, reported for days with a
    * full MA frame. Integer daily counts; trend = frame-sum / 7.0
    * (one IEEE division); the dow means go through decimal sums.
    *
    * Scale: everything after the per-day aggregate operates on ≤ one
    * row per DAY (the q170/q73 aggregate-then-window discipline) —
    * the window frames and the 7-row dow table never touch events.
    */
  def q194(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .select(expr("unix_micros(ts) div 86400000000").as("day_idx"))
      .groupBy(col("day_idx")).agg(count(lit(1)).as("n"))
    val w7 = Window.orderBy(col("day_idx")).rowsBetween(-3, 3)
    val trended = daily
      .withColumn("frame_n", count(lit(1)).over(w7))
      .withColumn("trend", sum(col("n")).over(w7).cast("double") / 7.0)
      .filter(col("frame_n") === 7)
      .withColumn("dow", (col("day_idx") + 4) % 7)
      .withColumn("detr", col("n").cast("double") - col("trend"))
    val dowAdj = trended.groupBy(col("dow"))
      .agg((sum(col("detr").cast(dec)).cast("double") /
        count(lit(1)).cast("double")).as("adj"))
    trended.join(broadcast(dowAdj), Seq("dow"))
      .select(col("day_idx"), col("dow"), col("n"),
        round(col("trend"), 4).as("trend"),
        round(col("adj"), 4).as("dow_adj"),
        round(col("n").cast("double") - col("trend") - col("adj"), 4)
          .as("residual"))
      .orderBy(col("day_idx"))
  }

  /** q195 — BPE-VOCAB COVERAGE CURVE. What fraction of all
    * adjacent-pair occurrences the top-K merge candidates capture,
    * for K = 10/20/30 — the measurement a tokenizer vocabulary size
    * is chosen from (q164 lists the candidates; this sizes the
    * budget).
    *
    * Scale: the pair census is the one event-scale aggregate (the
    * q164 shape, map-side combinable); ranking and the cumulative
    * sum run over census AGGREGATE rows; the total rides a 1-row
    * broadcast. Integer counts end-to-end — the only float op is
    * the final share division.
    */
  def q195(s: SparkSession, d: String): DataFrame = {
    val census = documents(s, d).filter(col("text").isNotNull)
      .select(graft.functions.Text.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(slice(t, 1, size(t) - 1), " +
          "(x, i) -> struct(x AS l, element_at(t, i + 2) AS r))")).as("pr"))
      .select(col("pr.l").as("l"), col("pr.r").as("r"))
      .filter(col("l") =!= "" && col("r") =!= "")
      .groupBy(col("l"), col("r"))
      .agg(count(lit(1)).as("n"))
    val tot = census.agg(sum(col("n")).as("total_pairs"))
    // top-30 prefix FIRST (round 17, VERDICT r16 #5): the rank and
    // running sum are only read at k ∈ {10,20,30}, and both are
    // prefix-local over the (n desc, l, r) total order — identical
    // on the top-30 rows whether computed over 30 rows or over the
    // whole census. TakeOrdered replaces the single-partition
    // fact-domain WindowExec (the census is vocab²-scale at 100 TB);
    // the residual window runs over ≤30 rows.
    val wRank = Window.orderBy(col("n").desc, col("l"), col("r"))
    census
      .orderBy(col("n").desc, col("l"), col("r"))
      .limit(30)
      .withColumn("k", row_number().over(wRank))
      .withColumn("covered", sum(col("n")).over(
        wRank.rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("k").isin(10, 20, 30))
      .crossJoin(broadcast(tot))
      .select(col("k"), col("covered"), col("total_pairs"),
        round(col("covered").cast("double") /
          col("total_pairs").cast("double"), 4).as("coverage"))
      .orderBy(col("k"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q192_contract_check" -> (q192 _),
    "q193_burst_windows" -> (q193 _),
    "q194_seasonal_decompose" -> (q194 _),
    "q195_bpe_coverage" -> (q195 _))
}

/** DuckDB mirrors of Queries27 — same rules, same frames, same
  * decimal paths, same rounding (§7.4).
  */
object Oracle27 {

  val sql: Map[String, String] = Map(
    "q192_contract_check" ->
      """WITH a AS (SELECT count(*) AS n_docs,
        |    CAST(sum(CASE WHEN text IS NULL OR length(text) = 0
        |      THEN 1 ELSE 0 END) AS BIGINT) AS v1,
        |    CAST(sum(CASE WHEN lang IS NULL OR lang NOT IN
        |      ('en','fr','es','de','zh') THEN 1 ELSE 0 END) AS BIGINT)
        |      AS v2,
        |    CAST(sum(CASE WHEN n_chars IS NULL OR n_chars < 100
        |      THEN 1 ELSE 0 END) AS BIGINT) AS v3,
        |    CAST(sum(CASE WHEN n_chars > 500 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS v4,
        |    CAST(sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0
        |      END) AS BIGINT) AS v5,
        |    count(*) - count(DISTINCT doc_id) AS v6
        |  FROM documents),
        |s AS (
        |  SELECT 'r1_text_nonempty' AS rule, v1 AS n_violations, n_docs FROM a
        |  UNION ALL SELECT 'r2_lang_known', v2, n_docs FROM a
        |  UNION ALL SELECT 'r3_len_min100', v3, n_docs FROM a
        |  UNION ALL SELECT 'r4_len_max500', v4, n_docs FROM a
        |  UNION ALL SELECT 'r5_chars_consistent', v5, n_docs FROM a
        |  UNION ALL SELECT 'r6_id_unique', v6, n_docs FROM a)
        |SELECT rule, n_violations,
        |  round(CAST(n_violations AS DOUBLE) / CAST(n_docs AS DOUBLE), 4)
        |    AS violation_rate,
        |  n_violations = 0 AS passed
        |FROM s ORDER BY rule""".stripMargin,

    "q193_burst_windows" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 AS t
        |  FROM events),
        |b AS (SELECT user_id,
        |    count(*) OVER (PARTITION BY user_id ORDER BY t
        |      RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW)
        |      AS burst
        |  FROM e)
        |SELECT user_id, count(*) AS n_events,
        |  CAST(max(burst) AS BIGINT) AS max_burst
        |FROM b GROUP BY user_id
        |ORDER BY max_burst DESC, user_id LIMIT 10""".stripMargin,

    "q194_seasonal_decompose" ->
      """WITH daily AS (SELECT epoch_ns(ts) // 1000 // 86400000000
        |    AS day_idx, count(*) AS n
        |  FROM events GROUP BY day_idx),
        |tr AS (SELECT day_idx, n,
        |    count(*) OVER w AS frame_n,
        |    CAST(sum(n) OVER w AS DOUBLE) / 7.0 AS trend
        |  FROM daily
        |  WINDOW w AS (ORDER BY day_idx
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |f AS (SELECT day_idx, (day_idx + 4) % 7 AS dow, n, trend,
        |    CAST(n AS DOUBLE) - trend AS detr
        |  FROM tr WHERE frame_n = 7),
        |adj AS (SELECT dow,
        |    CAST(sum(CAST(detr AS DECIMAL(38,18))) AS DOUBLE) /
        |      CAST(count(*) AS DOUBLE) AS adj
        |  FROM f GROUP BY dow)
        |SELECT f.day_idx, f.dow, f.n,
        |  round(f.trend, 4) AS trend,
        |  round(adj.adj, 4) AS dow_adj,
        |  round(CAST(f.n AS DOUBLE) - f.trend - adj.adj, 4) AS residual
        |FROM f JOIN adj ON f.dow = adj.dow
        |ORDER BY f.day_idx""".stripMargin,

    "q195_bpe_coverage" ->
      """WITH t AS (SELECT string_split(text, ' ') AS ts
        |  FROM documents WHERE text IS NOT NULL
        |    AND len(string_split(text, ' ')) >= 2),
        |i AS (SELECT ts, unnest(range(1, len(ts))) AS i FROM t),
        |p AS (SELECT ts[i] AS l, ts[i + 1] AS r FROM i),
        |census AS (SELECT l, r, count(*) AS n FROM p
        |  WHERE l <> '' AND r <> '' GROUP BY l, r),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS total_pairs
        |  FROM census),
        |rk AS (SELECT n,
        |    CAST(row_number() OVER (ORDER BY n DESC, l, r) AS INTEGER)
        |      AS k,
        |    CAST(sum(n) OVER (ORDER BY n DESC, l, r
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS covered
        |  FROM census)
        |SELECT k, covered, tot.total_pairs,
        |  round(CAST(covered AS DOUBLE) /
        |    CAST(tot.total_pairs AS DOUBLE), 4) AS coverage
        |FROM rk, tot WHERE k IN (10, 20, 30) ORDER BY k""".stripMargin)
}
