package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-7 batch 1: the at-100× configuration of the exact-substring
  * dedup path — the q102/q143 move applied to q155 (the round-6
  * verdict's top next item).
  *
  *  - q157: q155's maximal recycled spans with the window-fingerprint
  *    df cap (Dedup.dupSpans maxDf = 8) — the 100 TB mode that drops
  *    boilerplate mega-windows (a window shared by thousands of docs,
  *    e.g. a license header) BEFORE the fingerprint equi-join goes
  *    quadratic on them. The oracle applies the same df gate, so the
  *    at-scale configuration is itself hash-verified; at sf0.01/sf0.1
  *    no window fingerprint reaches the cap (q158 measures it, and
  *    ScaleOpsSpec proves invariance in-engine), so q157's rows equal
  *    q155's — the cap is answer-invisible until a degenerate window
  *    appears, and then it bounds the join instead of letting it
  *    explode.
  *  - q158: the window-df profile (Dedup.windowDfProfile) — the
  *    measurement q157's cap is chosen from: distinct fingerprints,
  *    hottest df, pair-generating fingerprints, and what the cap
  *    would drop (fingerprints AND window rows). Declared + oracled
  *    so the measurement itself is hash-verified, per the q144
  *    convention.
  */
object Queries17 {
  import Tables._

  /** The declared window-df cap: far above any window fingerprint's
    * document frequency at test scale (q158 measures the hottest; at
    * sf0.1 it is low single digits), far below the thousands-deep
    * boilerplate fingerprint it exists to bound.
    */
  val MaxWindowDf = 8

  private val WindowTokens = LshStages.WindowTokens
  private val MinRunTokens = LshStages.MinRunTokens

  /** q157 — CAPPED MAXIMAL RECYCLED SPANS (q155's pipeline with
    * maxDf, same 20-token stride-1 windows / ≥40-token span gate;
    * window rows from the shared LshStages.windowFps arm).
    */
  def q157(s: SparkSession, d: String): DataFrame =
    graft.operators.Dedup.dupSpansFromWindows(LshStages.windowFps(s, d),
        minSpanWindows = MinRunTokens - WindowTokens + 1,
        maxDf = MaxWindowDf)
      .select(col("a_id"), col("b_id"), col("n_aligned_windows"),
        col("max_span_windows"),
        (col("max_span_windows") + (WindowTokens - 1)).as("max_span_tokens"))
      .orderBy(col("a_id"), col("b_id"))

  /** q158 — WINDOW-DF PROFILE: the measurement q157's cap is chosen
    * from. One aggregate over the window rows; nothing quadratic.
    */
  def q158(s: SparkSession, d: String): DataFrame =
    graft.operators.Dedup.windowDfProfileFromWindows(
      LshStages.windowFps(s, d), maxDf = MaxWindowDf)

  /** q159 — QUANTILE-SKETCH CALIBRATION (the second
    * TypedImperativeAggregate, SketchAggregates.QuantileSketch). Per
    * lang: exact interpolated p50/p90 of n_chars (q41's parity-proven
    * percentile kernel) next to the s=5 log2-linear sketch estimates.
    * The oracle rebuilds the ENTIRE sketch in SQL — bitlength
    * quantization, per-bucket counts, integer rank selection — so the
    * custom aggregate's update/merge/eval path is HASH-verified
    * against an independent implementation of the same layout, and
    * the sketch-vs-exact gap is part of the verified row (every
    * reader of the report sees the error they are buying).
    *
    * Scale: the POINT of the operator — per-group quantiles at 100 TB
    * carry a bounded integer histogram (≤ 12 bytes per occupied
    * magnitude bucket on the wire) through a normal partial+final
    * aggregate, where the exact form must sort each group.
    * PropertySpec proves partitioning-invariance and the 2^-5
    * relative error bound corpus-wide.
    */
  def q159(s: SparkSession, d: String): DataFrame = {
    import graft.functions.SketchAggregates.qsketch_quantile
    documents(s, d)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        qsketch_quantile(col("n_chars").cast("long"), 0.5, 5).as("p50_sketch"),
        qsketch_quantile(col("n_chars").cast("long"), 0.9, 5).as("p90_sketch"),
        round(percentile(col("n_chars"), lit(0.5)), 4).as("p50_exact"),
        round(percentile(col("n_chars"), lit(0.9)), 4).as("p90_exact"))
      .orderBy(col("lang").asc_nulls_last)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q157_capped_dup_spans" -> (q157 _),
    "q158_window_df_profile" -> (q158 _),
    "q159_qsketch_calibration" -> (q159 _))
}

object Oracle17 {
  import Queries17.MaxWindowDf

  /** q155's stride-1 window CTEs (Text.shingles clamping convention),
    * shared by both round-7 dedup oracles.
    */
  private val windowCtes =
    """t AS (SELECT doc_id, string_split(text, ' ') AS toks
      |    FROM documents),
      |wn AS (SELECT doc_id, i AS pos,
      |    md5(array_to_string(toks[i+1:i+20], ' ')) AS fp
      |  FROM t, LATERAL unnest(range(0,
      |    greatest(len(toks) - 20, 0) + 1)) AS r(i))""".stripMargin

  val sql: Map[String, String] = Map(
    // q155's gaps-and-islands + the SAME df gate the Spark side
    // applies: window fingerprints in more than MaxWindowDf distinct
    // docs are dropped BEFORE pairing
    "q157_capped_dup_spans" ->
      s"""WITH $windowCtes,
         |keepfp AS (SELECT fp FROM wn
         |  GROUP BY fp HAVING count(DISTINCT doc_id) <= $MaxWindowDf),
         |wk AS (SELECT wn.* FROM wn JOIN keepfp USING (fp)),
         |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.pos AS ai,
         |    b.pos - a.pos AS diag
         |  FROM wk a JOIN wk b ON a.fp = b.fp AND a.doc_id < b.doc_id),
         |isl AS (SELECT a_id, b_id, diag, ai,
         |    ai - row_number() OVER (PARTITION BY a_id, b_id, diag
         |      ORDER BY ai) AS grp
         |  FROM p),
         |sp AS (SELECT a_id, b_id, diag, grp, count(*) AS span_windows
         |  FROM isl GROUP BY a_id, b_id, diag, grp),
         |o AS (SELECT a_id, b_id,
         |    CAST(sum(span_windows) AS BIGINT) AS n_aligned_windows,
         |    CAST(max(span_windows) AS BIGINT) AS max_span_windows
         |  FROM sp GROUP BY a_id, b_id)
         |SELECT a_id, b_id, n_aligned_windows, max_span_windows,
         |  max_span_windows + 19 AS max_span_tokens
         |FROM o WHERE max_span_windows >= 21
         |ORDER BY a_id, b_id""".stripMargin,

    // full SQL rebuild of the s=5 log2-linear sketch: shift =
    // max(bitlength(v)-6, 0), qv = v >> shift, index = shift*64 + qv
    // (monotone in v), counts per index, then integer rank selection
    // at r = max(1, ceil(q*n)) and lower-edge decode (qv << shift) —
    // every step the same arithmetic the aggregate's buffer does
    "q159_qsketch_calibration" ->
      """WITH v AS (SELECT lang,
        |    greatest(CAST(n_chars AS BIGINT), 0) AS v
        |  FROM documents),
        |b AS (SELECT lang, v,
        |    greatest(length(format('{:b}', v)) - 6, 0) AS shift
        |  FROM v),
        |c AS (SELECT lang, shift * 64 + (v >> shift) AS i, count(*) AS cnt
        |  FROM b GROUP BY lang, shift * 64 + (v >> shift)),
        |r AS (SELECT lang, i, cnt,
        |    sum(cnt) OVER (PARTITION BY lang ORDER BY i) AS cum,
        |    sum(cnt) OVER (PARTITION BY lang) AS n
        |  FROM c),
        |s50 AS (SELECT lang, min(i) AS i50 FROM r
        |  WHERE cum >= greatest(1, CAST(ceil(0.5 * n) AS BIGINT))
        |  GROUP BY lang),
        |s90 AS (SELECT lang, min(i) AS i90 FROM r
        |  WHERE cum >= greatest(1, CAST(ceil(0.9 * n) AS BIGINT))
        |  GROUP BY lang),
        |e AS (SELECT lang, count(*) AS n_docs,
        |    round(quantile_cont(n_chars, 0.5), 4) AS p50_exact,
        |    round(quantile_cont(n_chars, 0.9), 4) AS p90_exact
        |  FROM documents GROUP BY lang)
        |SELECT e.lang, e.n_docs,
        |  CAST((i50 % 64) << (i50 // 64) AS BIGINT) AS p50_sketch,
        |  CAST((i90 % 64) << (i90 // 64) AS BIGINT) AS p90_sketch,
        |  p50_exact, p90_exact
        |FROM e JOIN s50 ON e.lang IS NOT DISTINCT FROM s50.lang
        |  JOIN s90 ON e.lang IS NOT DISTINCT FROM s90.lang
        |ORDER BY e.lang""".stripMargin,

    "q158_window_df_profile" ->
      s"""WITH $windowCtes,
         |d AS (SELECT fp, count(*) AS n_wins,
         |    count(DISTINCT doc_id) AS fp_df
         |  FROM wn GROUP BY fp)
         |SELECT CAST(count(*) AS BIGINT) AS n_fps,
         |  CAST(max(fp_df) AS BIGINT) AS max_df,
         |  CAST(sum(CASE WHEN fp_df > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_multi_fps,
         |  CAST(sum(CASE WHEN fp_df > $MaxWindowDf THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_dropped_fps,
         |  CAST(sum(CASE WHEN fp_df > $MaxWindowDf THEN n_wins ELSE 0 END)
         |    AS BIGINT) AS n_dropped_windows
         |FROM d""".stripMargin)
}
