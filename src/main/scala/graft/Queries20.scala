package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 batch 4: quantile-sketch algebra, deterministic weighted
  * sampling, and ordered-sequence funnel detection.
  *
  *  - q165 completes the sketch-ALGEBRA story q163 opened for HLL:
  *    per-shard quantile-sketch states (graft_qsketch_counts) merged
  *    RELATIONALLY (explode → groupBy bucket → sum) into global
  *    p50/p90/p99 — the oracle rebuilds the global sketch directly
  *    from the values, so hash equality IS the merge-identity proof
  *    (sum of shard states ≡ state of the union).
  *  - q166 is weighted sampling-without-replacement the way a 100 TB
  *    engine has to do it: sequential Poisson sampling (Ohlsson 1998;
  *    the priority-sampling family of Duffield-Lund-Thorup 2007) with
  *    a DETERMINISTIC md5-derived uniform, so the drawn sample is
  *    reproducible and cross-engine provable. priority = u/w; the k
  *    smallest priorities are the sample — one narrow pass + top-k,
  *    no global sort, no per-group state.
  *  - q167 is ordered-sequence detection (the MATCH_RECOGNIZE shape):
  *    view → click → purchase per user with each step within 6 h
  *    of the previous, via two chained running-max windows — linear
  *    per user, no self-join, no row explosion.
  */
object Queries20 {
  import Tables._

  /** q165/q166 shared shard/precision constants (mirrored in Oracle20). */
  val NShards = 8
  val QsketchS = 5
  val SampleK = 100

  /** q165 — QUANTILE-SKETCH SHARD MERGE (sketch algebra for
    * percentiles). Each md5-assigned shard (q162's content-stable
    * assignment) computes its own sparse sketch state in ONE pass;
    * the global p50/p90/p99 then come from a relational merge of the
    * ≤ (64−s)·2^(s+1)-entry states — explode, sum per bucket,
    * cumulative-sum rank walk — never from re-reading the documents.
    *
    * Scale: this is the pre-aggregation contract that makes global
    * percentiles cheap at 100 TB — per-shard (or per-day, per-source)
    * states are kilobytes, any later grouping of them is arithmetic,
    * and the rank walk runs over ≤ 3712 bucket rows REGARDLESS of
    * corpus size (the single-partition window below is bounded by the
    * sketch layout, not the data). The exact twins ride along as the
    * calibration columns, per the q159 convention.
    */
  def q165(s: SparkSession, d: String): DataFrame = {
    import graft.functions.SketchAggregates.qsketch_counts
    val subB = 1 << (QsketchS + 1)
    val docs = documents(s, d).filter(col("n_chars").isNotNull)
      .select((graft.functions.Text.md5Long(col("doc_id").cast("string"))
          % NShards).as("shard"),
        col("n_chars").cast("long").as("v"))
    val perShard = docs.groupBy(col("shard"))
      .agg(qsketch_counts(col("v"), QsketchS).as("st"),
        count(lit(1)).as("n"))
    // relational sketch merge: elementwise count sum across shards
    val merged = perShard.select(explode(col("st")).as("e"))
      .groupBy(col("e.i").as("i")).agg(sum(col("e.cnt")).as("cnt"))
    // grand totals off the tiny per-shard frame (1-row broadcast)
    val grand = perShard.agg(sum(col("n")).as("n_docs"),
      count(lit(1)).as("n_shards"),
      sum(size(col("st"))).cast("long").as("state_entries"))
    // rank walk: cum over ≤3712 bucket rows (sketch-bounded, not data-
    // bounded — the one place a single-partition window is correct)
    val ranked = merged.withColumn("cum",
      sum(col("cnt")).over(Window.orderBy(col("i"))))
    def rank(q: Double) =
      greatest(lit(1L), ceil(lit(q) * col("n_docs").cast("double")).cast("long"))
    val picked = ranked.crossJoin(broadcast(grand))
      .agg(
        min(when(col("cum") >= rank(0.5), col("i"))).as("i50"),
        min(when(col("cum") >= rank(0.9), col("i"))).as("i90"),
        min(when(col("cum") >= rank(0.99), col("i"))).as("i99"),
        first(col("n_docs")).as("n_docs"),
        first(col("n_shards")).as("n_shards"),
        first(col("state_entries")).as("state_entries"))
    val exact = documents(s, d).filter(col("n_chars").isNotNull)
      .agg(round(percentile(col("n_chars"), lit(0.5)), 4).as("p50_exact"),
        round(percentile(col("n_chars"), lit(0.9)), 4).as("p90_exact"),
        round(percentile(col("n_chars"), lit(0.99)), 4).as("p99_exact"))
    def dec(c: String) =
      expr(s"shiftleft(CAST($c % $subB AS BIGINT), CAST($c div $subB AS INT))")
    picked.crossJoin(broadcast(exact))
      .select(col("n_docs"), col("n_shards"), col("state_entries"),
        dec("i50").as("p50_sketch"), dec("i90").as("p90_sketch"),
        dec("i99").as("p99_sketch"),
        col("p50_exact"), col("p90_exact"), col("p99_exact"))
  }

  /** q166 — DETERMINISTIC WEIGHTED SAMPLE (sequential Poisson /
    * priority sampling, πps-without-replacement): sample K documents
    * with inclusion probability ∝ n_chars, reproducibly. The uniform
    * is the repo's md5 projection scaled to (0,1) — u = (h52 + 0.5)
    * / 2^52 is a dyadic rational, EXACT in a double, and priority =
    * u / w is one correctly-rounded IEEE division, so both engines
    * compute bit-identical priorities (the no-libm rule: no pow/exp
    * in the sampling key).
    *
    * Scale: one narrow pass computing (doc_id, w, priority) + a
    * TakeOrdered top-K — no global sort, no state; restarting the job
    * or adding shards cannot change the sample.
    */
  def q166(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .filter(col("n_chars").isNotNull && col("n_chars") > 0)
      .select(col("doc_id"), col("n_chars"),
        ((graft.functions.Text.md5Long(col("doc_id").cast("string"))
            .bitwiseAND(lit((1L << 52) - 1)).cast("double") + lit(0.5)) /
          lit(4503599627370496.0) / col("n_chars").cast("double"))
          .as("priority"))
      .orderBy(col("priority"), col("doc_id"))
      .limit(SampleK)

  /** q167 — ORDERED-SEQUENCE FUNNEL (view → click → purchase, each
    * step ≤ 6 h after the previous, per user). Two chained
    * running-max windows: the first carries the latest view time to
    * every later row; the second carries the latest CHAIN-VALID click
    * (a click within 6 h of a view); a purchase converts if a
    * chain-valid click happened within its own 6-h lookback. All
    * comparisons in integer µs.
    *
    * Scale: the MATCH_RECOGNIZE shape without a join — each user's
    * partition is scanned once, state is two longs per row, and the
    * quadratic alternative (events self-joined on user × time-window)
    * never materializes.
    */
  def q167(s: SparkSession, d: String): DataFrame = {
    val winUs = 6L * 3600L * 1000000L
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("t"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, d)
      .filter(col("user_id").isNotNull &&
        col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("t"), col("event_type"))
      .withColumn("last_view",
        max(when(col("event_type") === "view", col("t"))).over(w))
      .withColumn("chain_click", max(when(
        col("event_type") === "click" && col("last_view").isNotNull &&
          col("t") - col("last_view") <= winUs, col("t"))).over(w))
      .filter(col("event_type") === "purchase" &&
        col("chain_click").isNotNull &&
        col("t") - col("chain_click") <= winUs)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_conversions"),
        min(col("t")).as("first_conversion_us"))
      .orderBy(col("user_id"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q165_qsketch_shard_merge" -> (q165 _),
    "q166_weighted_sample" -> (q166 _),
    "q167_funnel_sequence" -> (q167 _))
}

/** DuckDB mirrors of Queries20. The q165 oracle quantizes the values
  * GLOBALLY (no shard detour) — hash equality with the Spark side's
  * shard-then-merge plan is therefore an end-to-end proof of the
  * merge identity Σ_shard state(shard) = state(all). q166 re-derives
  * the exact dyadic priority; q167 mirrors the chained running-max
  * windows with the same (t, event_id) tie-break.
  */
object Oracle20 {
  import Queries20.{NShards, SampleK}

  private def md5long(e: String): String =
    s"CAST('0x' || substring(md5($e), 1, 15) AS BIGINT)"

  val sql: Map[String, String] = Map(
    "q165_qsketch_shard_merge" ->
      s"""WITH v AS (SELECT ${md5long("CAST(doc_id AS VARCHAR)")} % $NShards
         |      AS shard,
         |    greatest(CAST(n_chars AS BIGINT), 0) AS v
         |  FROM documents WHERE n_chars IS NOT NULL),
         |b AS (SELECT shard, v,
         |    greatest(length(format('{:b}', v)) - 6, 0) AS shift
         |  FROM v),
         |c AS (SELECT shard, shift * 64 + (v >> shift) AS i, count(*) AS cnt
         |  FROM b GROUP BY shard, shift * 64 + (v >> shift)),
         |m AS (SELECT i, sum(cnt) AS cnt FROM c GROUP BY i),
         |r AS (SELECT i, cnt, sum(cnt) OVER (ORDER BY i) AS cum FROM m),
         |g AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(count(DISTINCT shard) AS BIGINT) AS n_shards,
         |    (SELECT CAST(count(*) AS BIGINT) FROM c) AS state_entries
         |  FROM v),
         |s50 AS (SELECT min(i) AS i50 FROM r WHERE cum >=
         |  greatest(1, CAST(ceil(0.5 * (SELECT n_docs FROM g)) AS BIGINT))),
         |s90 AS (SELECT min(i) AS i90 FROM r WHERE cum >=
         |  greatest(1, CAST(ceil(0.9 * (SELECT n_docs FROM g)) AS BIGINT))),
         |s99 AS (SELECT min(i) AS i99 FROM r WHERE cum >=
         |  greatest(1, CAST(ceil(0.99 * (SELECT n_docs FROM g)) AS BIGINT))),
         |e AS (SELECT round(quantile_cont(n_chars, 0.5), 4) AS p50_exact,
         |    round(quantile_cont(n_chars, 0.9), 4) AS p90_exact,
         |    round(quantile_cont(n_chars, 0.99), 4) AS p99_exact
         |  FROM documents WHERE n_chars IS NOT NULL)
         |SELECT n_docs, n_shards, state_entries,
         |  CAST((i50 % 64) << (i50 // 64) AS BIGINT) AS p50_sketch,
         |  CAST((i90 % 64) << (i90 // 64) AS BIGINT) AS p90_sketch,
         |  CAST((i99 % 64) << (i99 // 64) AS BIGINT) AS p99_sketch,
         |  p50_exact, p90_exact, p99_exact
         |FROM g, s50, s90, s99, e""".stripMargin,

    "q166_weighted_sample" ->
      s"""SELECT doc_id, n_chars,
         |  (CAST(${md5long("CAST(doc_id AS VARCHAR)")} & 4503599627370495
         |      AS DOUBLE) + 0.5)
         |    / 4503599627370496.0 / CAST(n_chars AS DOUBLE) AS priority
         |FROM documents
         |WHERE n_chars IS NOT NULL AND n_chars > 0
         |ORDER BY priority, doc_id LIMIT $SampleK""".stripMargin,

    "q167_funnel_sequence" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ns(ts) // 1000 AS t,
        |    event_type
        |  FROM events WHERE user_id IS NOT NULL
        |    AND event_type IN ('view', 'click', 'purchase')),
        |w1 AS (SELECT *, max(CASE WHEN event_type = 'view' THEN t END)
        |    OVER (PARTITION BY user_id ORDER BY t, event_id
        |      ROWS UNBOUNDED PRECEDING) AS last_view
        |  FROM e),
        |w2 AS (SELECT *, max(CASE WHEN event_type = 'click'
        |      AND last_view IS NOT NULL
        |      AND t - last_view <= 21600000000 THEN t END)
        |    OVER (PARTITION BY user_id ORDER BY t, event_id
        |      ROWS UNBOUNDED PRECEDING) AS chain_click
        |  FROM w1)
        |SELECT user_id, count(*) AS n_conversions,
        |  min(t) AS first_conversion_us
        |FROM w2
        |WHERE event_type = 'purchase' AND chain_click IS NOT NULL
        |  AND t - chain_click <= 21600000000
        |GROUP BY user_id ORDER BY user_id""".stripMargin)
}
