package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 batch 6: the dataset-curation statistics block — stratified
  * quota sampling, robust (MAD) outlier screening, equi-depth
  * discretization, the table profile report, and calendar
  * densification with LOCF.
  *
  * Each is a standard at-scale curation op the engine must own:
  * quota samples feed eval sets, MAD beats z-scores on heavy-tailed
  * doc-length distributions, equi-depth buckets feed length-balanced
  * packing, the profile is the first query run on any new drop, and
  * gap-filled grids feed per-entity time-series features.
  */
object Queries22 {
  import Tables._

  /** Per-stratum quota for q172 (mirrored in Oracle22). */
  val QuotaPerLang = 20

  /** q172 — STRATIFIED QUOTA SAMPLE: exactly N docs per language,
    * drawn by deterministic md5 priority (the q100/q166 convention:
    * reproducible under restarts and shard counts, no RNG state).
    *
    * Scale: ranking window partitions by stratum — bounded groups,
    * no global sort; the alternative (sampleBy fractions) cannot hit
    * exact quotas and isn't deterministic across retries.
    */
  def q172(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("h"), col("doc_id"))
    documents(s, d).filter(col("lang").isNotNull)
      .select(col("lang"), col("doc_id"),
        graft.functions.Text.md5Long(col("doc_id").cast("string")).as("h"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= QuotaPerLang)
      .select(col("lang"), col("rk"), col("doc_id"))
      .orderBy(col("lang"), col("rk"))
  }

  /** q173 — MAD OUTLIER SCREEN (robust dispersion): per language,
    * median and MAD (median absolute deviation) of n_chars, and how
    * many docs sit beyond median ± 3·MAD — the screen that still
    * works when the z-score's mean/stddev are themselves dragged by
    * the outliers (doc lengths are heavy-tailed; q09's z-score is the
    * fragile twin).
    *
    * Scale: two grouped percentile aggregates and a broadcast join of
    * the |langs|-row stats frame back onto the scan — no sort of the
    * full corpus, no per-row state.
    */
  def q173(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d).filter(col("lang").isNotNull)
      .select(col("lang"), col("n_chars").cast("double").as("v"))
    val med = docs.groupBy(col("lang"))
      .agg(percentile(col("v"), lit(0.5)).as("med"))
    val mad = docs.join(broadcast(med), Seq("lang"))
      .groupBy(col("lang"))
      .agg(first(col("med")).as("med"),
        percentile(abs(col("v") - col("med")), lit(0.5)).as("mad"),
        count(lit(1)).as("n_docs"))
    docs.join(broadcast(mad), Seq("lang"))
      .groupBy(col("lang"))
      .agg(first(col("n_docs")).as("n_docs"),
        round(first(col("med")), 4).as("med"),
        round(first(col("mad")), 4).as("mad"),
        sum(when(abs(col("v") - col("med")) > lit(3.0) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
      .orderBy(col("lang"))
  }

  /** q174 — EQUI-DEPTH HISTOGRAM (quantile discretization): n_chars
    * split into 8 equal-population buckets via ntile over the
    * (n_chars, doc_id) total order — the discretizer behind
    * length-balanced packing and per-bucket mixture quotas.
    *
    * Scale: computed from the n_chars value histogram — no fact-wide
    * sort or one-partition window exists in the plan; the report is 8
    * rows. At 100 TB the same report comes from the X75 sketch — this
    * is the exact form.
    */
  def q174(s: SparkSession, d: String): DataFrame = {
    // Equi-depth WITHOUT ranking the fact (VERDICT r11 #3): ntile's
    // output here is a pure function of the VALUE HISTOGRAM — group by
    // n_chars (domain-bounded: distinct values ≤ max document length,
    // not corpus size), cumulative counts over that small frame, and
    // read each closed-form NTILE rank boundary off the cumsum:
    // bucket b covers global ranks [lo_b, hi_b] (buckets 1..n%k get
    // ⌈n/k⌉ rows), its count is hi_b−lo_b+1 by construction, and its
    // lo/hi VALUES are the least histogram values whose cum ≥ lo_b /
    // ≥ hi_b. The doc_id tiebreak only orders rows WITHIN one value,
    // which no output column can see. One scan + one |values| shuffle;
    // the residual unpartitioned cumsum window runs over the value
    // domain (aggregate-frame class), never over fact rows. Were the
    // value domain itself fact-scale, ScaleRank (q247) is the lift.
    val w = Window.orderBy(col("n_chars"))
    val hist = documents(s, d).filter(col("n_chars").isNotNull)
      .groupBy(col("n_chars")).agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("n_tot", sum(col("cnt")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    val grid = broadcast(s.range(1, 9).toDF("bucket"))
    val loRank = "(bucket - 1) * (n_tot div 8) + least(bucket - 1, n_tot % 8) + 1"
    val hiRank = "bucket * (n_tot div 8) + least(bucket, n_tot % 8)"
    hist.join(grid, col("cum") >= expr(loRank))
      .groupBy(col("bucket"))
      .agg((max(expr(hiRank)) - max(expr(loRank)) + 1L).as("n_docs"),
        min(col("n_chars")).as("lo"),
        min(when(col("cum") >= expr(hiRank), col("n_chars"))).as("hi"))
      .select(col("bucket").cast("int").as("bucket"),
        col("n_docs"), col("lo"), col("hi"))
      .orderBy(col("bucket"))
  }

  /** q175 — TABLE PROFILE (the first query on any new data drop):
    * one row per column of `documents` — nulls, exact distincts, and
    * the null fraction.
    *
    * Scale: one pass computes all null counts; distincts are one
    * aggregate per column (at 100 TB swap in graft_hll — X55 — for
    * one-pass estimates; this is the exact form the estimate is
    * calibrated against).
    */
  def q175(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val counted = docs.agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("doc_id").isNull, 1L).otherwise(0L)).as("nn_doc_id"),
      sum(when(col("text").isNull, 1L).otherwise(0L)).as("nn_text"),
      sum(when(col("lang").isNull, 1L).otherwise(0L)).as("nn_lang"),
      sum(when(col("source").isNull, 1L).otherwise(0L)).as("nn_source"),
      sum(when(col("n_chars").isNull, 1L).otherwise(0L)).as("nn_n_chars"),
      count_distinct(col("doc_id")).as("nd_doc_id"),
      count_distinct(col("text")).as("nd_text"),
      count_distinct(col("lang")).as("nd_lang"),
      count_distinct(col("source")).as("nd_source"),
      count_distinct(col("n_chars")).as("nd_n_chars"))
    counted.select(col("n_rows"), expr(
      """stack(5,
        |'doc_id', nn_doc_id, nd_doc_id,
        |'lang', nn_lang, nd_lang,
        |'n_chars', nn_n_chars, nd_n_chars,
        |'source', nn_source, nd_source,
        |'text', nn_text, nd_text) AS (col_name, n_nulls, n_distinct)
        |""".stripMargin))
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"),
        round(col("n_nulls").cast("double") / col("n_rows").cast("double"), 4)
          .as("null_frac"))
      .orderBy(col("col_name"))
  }

  /** q176 — CALENDAR DENSIFICATION + LOCF (gap-filled per-entity
    * daily series): for a user subset, the FULL day grid from the
    * table's min to max day, each user's daily event count (0 on
    * silent days), and the running total carried across the gaps —
    * the shape per-entity time-series features are computed on.
    *
    * Scale: the grid is |users| × |days| ROWS OF INTS generated from
    * a 1-row min/max broadcast (sequence + explode — no driver loop),
    * the fill is one window per user partition, and the raw events
    * are touched exactly once by the daily aggregate.
    */
  def q176(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .filter(col("user_id").isNotNull && col("user_id") % 50 === 0)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_day"))
    val span = events(s, d).agg(
      min(to_date(col("ts"))).as("d0"), max(to_date(col("ts"))).as("d1"))
    val grid = daily.select(col("user_id")).distinct()
      .crossJoin(broadcast(span))
      .select(col("user_id"),
        explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        coalesce(col("n_day"), lit(0L)).as("n_day"))
      .withColumn("cum_events", sum(col("n_day")).over(w))
      .orderBy(col("user_id"), col("day"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q172_stratified_quota" -> (q172 _),
    "q173_mad_outliers" -> (q173 _),
    "q174_equidepth_histogram" -> (q174 _),
    "q175_table_profile" -> (q175 _),
    "q176_gap_fill_locf" -> (q176 _))
}

/** DuckDB mirrors of Queries22. */
object Oracle22 {
  import Queries22.QuotaPerLang

  private def md5long(e: String): String =
    s"CAST('0x' || substring(md5($e), 1, 15) AS BIGINT)"

  val sql: Map[String, String] = Map(
    "q172_stratified_quota" ->
      s"""WITH h AS (SELECT lang, doc_id,
         |    ${md5long("CAST(doc_id AS VARCHAR)")} AS h
         |  FROM documents WHERE lang IS NOT NULL),
         |r AS (SELECT lang, doc_id,
         |    row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rk
         |  FROM h)
         |SELECT lang, CAST(rk AS INTEGER) AS rk, doc_id FROM r
         |WHERE rk <= $QuotaPerLang ORDER BY lang, rk""".stripMargin,

    "q173_mad_outliers" ->
      """WITH v AS (SELECT lang, CAST(n_chars AS DOUBLE) AS v
        |  FROM documents WHERE lang IS NOT NULL),
        |med AS (SELECT lang, quantile_cont(v, 0.5) AS med FROM v
        |  GROUP BY lang),
        |mad AS (SELECT v.lang, any_value(med.med) AS med,
        |    quantile_cont(abs(v.v - med.med), 0.5) AS mad,
        |    count(*) AS n_docs
        |  FROM v JOIN med ON v.lang = med.lang GROUP BY v.lang)
        |SELECT v.lang, any_value(mad.n_docs) AS n_docs,
        |  round(any_value(mad.med), 4) AS med,
        |  round(any_value(mad.mad), 4) AS mad,
        |  CAST(sum(CASE WHEN abs(v.v - mad.med) > 3.0 * mad.mad
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM v JOIN mad ON v.lang = mad.lang
        |GROUP BY v.lang ORDER BY v.lang""".stripMargin,

    "q174_equidepth_histogram" ->
      """WITH b AS (SELECT doc_id, n_chars,
        |    ntile(8) OVER (ORDER BY n_chars, doc_id) AS bucket
        |  FROM documents WHERE n_chars IS NOT NULL)
        |SELECT CAST(bucket AS INTEGER) AS bucket,
        |  count(*) AS n_docs, min(n_chars) AS lo, max(n_chars) AS hi
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q175_table_profile" ->
      """WITH t AS (SELECT count(*) AS n_rows FROM documents),
        |p AS (
        |  SELECT 'doc_id' AS col_name,
        |    CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_nulls,
        |    count(DISTINCT doc_id) AS n_distinct FROM documents
        |  UNION ALL SELECT 'lang',
        |    CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    count(DISTINCT lang) FROM documents
        |  UNION ALL SELECT 'n_chars',
        |    CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    count(DISTINCT n_chars) FROM documents
        |  UNION ALL SELECT 'source',
        |    CAST(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    count(DISTINCT source) FROM documents
        |  UNION ALL SELECT 'text',
        |    CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    count(DISTINCT text) FROM documents)
        |SELECT col_name, t.n_rows, n_nulls, n_distinct,
        |  round(CAST(n_nulls AS DOUBLE) / CAST(t.n_rows AS DOUBLE), 4)
        |    AS null_frac
        |FROM p, t ORDER BY col_name""".stripMargin,

    "q176_gap_fill_locf" ->
      """WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day,
        |    count(*) AS n_day
        |  FROM events WHERE user_id IS NOT NULL AND user_id % 50 = 0
        |  GROUP BY user_id, CAST(ts AS DATE)),
        |span AS (SELECT min(CAST(ts AS DATE)) AS d0,
        |    max(CAST(ts AS DATE)) AS d1 FROM events),
        |grid AS (SELECT u.user_id, CAST(g.day AS DATE) AS day
        |  FROM (SELECT DISTINCT user_id FROM daily) u,
        |    span, LATERAL unnest(generate_series(span.d0, span.d1,
        |      INTERVAL 1 DAY)) AS g(day))
        |SELECT g.user_id, g.day,
        |  coalesce(d.n_day, 0) AS n_day,
        |  CAST(sum(coalesce(d.n_day, 0)) OVER (PARTITION BY g.user_id
        |    ORDER BY g.day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_events
        |FROM grid g LEFT JOIN daily d
        |  ON g.user_id = d.user_id AND g.day = d.day
        |ORDER BY g.user_id, g.day""".stripMargin)
}
