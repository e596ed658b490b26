package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-7 batch 7: hopping windows, join-key skew diagnosis, and
  * distribution-drift (PSI) monitoring.
  *
  *  - q177 declares the HOPPING window semantic (Spark `window(ts,
  *    len, slide)`) in oracled batch form — the streaming T2 path's
  *    other window shape, previously only tumbling.
  *  - q178 is the measurement that justifies J6's salting: per-key
  *    fan-in stats of the orders⋈lineitem join key BEFORE the join.
  *  - q179 is population-stability-index drift between two source
  *    cohorts on decile buckets — the monitor that pages before a
  *    silent distribution shift poisons a training mix.
  */
object Queries23 {
  import Tables._

  /** q177 — HOPPING-WINDOW AGGREGATION: 10-minute windows sliding
    * every 5 minutes over day-1 events (epoch-aligned, so each event
    * lands in exactly 2 windows). Declared with integer-µs window
    * starts per the repo's timestamp-parity convention.
    *
    * Scale: the hop fan-out is len/slide = 2 rows per event BEFORE
    * the shuffle (Spark expands then partially aggregates map-side),
    * so the shuffle carries |windows × keys| partials, never raw
    * events; the day filter prunes at the scan.
    */
  def q177(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .filter(to_date(col("ts")) === lit("2024-01-01"))
      .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
        count_distinct(col("user_id")).as("n_users"))
      .select(unix_micros(col("w.start")).as("w_start_us"),
        col("n_events"), col("n_users"))
      .orderBy(col("w_start_us"))

  /** q178 — JOIN-KEY SKEW DIAGNOSIS (measure before you salt): the
    * per-key fan-in profile of lineitem's join key — key count,
    * average items per key, and the 5 hottest keys with their
    * skew-vs-average factor. The report J6's salted paths are sized
    * from; avg is computed as exact-sum / exact-count (one IEEE
    * division, no streaming-mean ambiguity).
    *
    * Scale: one map-side-combinable count per key + a 1-row stats
    * broadcast + TakeOrdered(5) — the diagnosis costs one narrow
    * pass, the thing it prevents costs a straggler executor.
    */
  def q178(s: SparkSession, d: String): DataFrame = {
    val perKey = table(s, d, "lineitem")
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n_items"))
    val stats = perKey.agg(count(lit(1)).as("n_keys"),
      (sum(col("n_items")).cast("double") /
        count(lit(1)).cast("double")).as("avg_items"))
    perKey.orderBy(col("n_items").desc, col("l_orderkey")).limit(5)
      .crossJoin(broadcast(stats))
      .select(col("l_orderkey"), col("n_items"), col("n_keys"),
        round(col("avg_items"), 4).as("avg_items"),
        round(col("n_items").cast("double") / col("avg_items"), 4)
          .as("skew_vs_avg"))
      .orderBy(col("n_items").desc, col("l_orderkey"))
  }

  /** q179 — PSI DISTRIBUTION DRIFT: population stability index of
    * n_chars between source cohort A (src0-src9) and cohort B
    * (src10-src19), on A's decile edges. Laplace-smoothed shares so
    * an empty bucket cannot blow up the log; per-bucket terms are
    * round(,4)-pinned and the total is a DECIMAL(38,18) sum of the
    * pinned terms — order-free, so partitioning cannot change the
    * headline number.
    *
    * Scale: 9 decile edges from the A-side percentile aggregate ride
    * a 1-row broadcast; bucketing is 9 scalar comparisons per row
    * (no per-row join fan-out); the report is 10 rows — everything
    * after the ≤10-row bucket aggregate is ONE single-row
    * higher-order-function pass (the relational form scheduled 4 more
    * stage-jobs — tots + psi aggregates and their crossJoin broadcast
    * builds — to move ≤10 rows; census: 11 → 5 jobs, re-confirmed at
    * 5 by the round-17 full census). Same
    * arithmetic: pa/pb are the same two double divisions (computing a
    * pure double twice is bit-identical), the per-bucket term is
    * round(,4)-pinned, and the PSI total folds the pinned terms in
    * decimal(38,18) — exact and order-free, like the relational sum.
    */
  def q179(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d).filter(col("n_chars").isNotNull)
      .select((length(col("source")) === 4).as("is_a"),
        col("n_chars").cast("double").as("v"))
    val edgeCols = (1 to 9).map(k =>
      percentile(col("v"), lit(k / 10.0)).as(s"e$k"))
    val edges = docs.filter(col("is_a"))
      .agg(edgeCols.head, edgeCols.tail: _*)
    val bucketed = docs.crossJoin(broadcast(edges))
      .withColumn("bucket", (1 to 9).map(k =>
        when(col("v") > col(s"e$k"), 1).otherwise(0)).reduce(_ + _))
      .groupBy(col("bucket"))
      .agg(sum(when(col("is_a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(!col("is_a"), 1L).otherwise(0L)).as("n_b"))
    bucketed
      .agg(collect_list(struct(col("bucket"), col("n_a"), col("n_b")))
        .as("bs"))
      .withColumn("tot_a", expr("aggregate(bs, 0L, (a, x) -> a + x.n_a)"))
      .withColumn("tot_b", expr("aggregate(bs, 0L, (a, x) -> a + x.n_b)"))
      .withColumn("terms", expr(
        """transform(bs, x -> struct(
          |  x.bucket as bucket, x.n_a as n_a, x.n_b as n_b,
          |  round((cast(x.n_a + 1 as double) / cast(tot_a + 10 as double)
          |      - cast(x.n_b + 1 as double) / cast(tot_b + 10 as double))
          |    * ln((cast(x.n_a + 1 as double) /
          |           cast(tot_a + 10 as double)) /
          |         (cast(x.n_b + 1 as double) /
          |           cast(tot_b + 10 as double))), 4) as term))"""
          .stripMargin))
      .withColumn("psi", expr(
        """cast(aggregate(terms, cast(0 as decimal(38,18)),
          |  (a, t) -> cast(a + cast(t.term as decimal(38,18))
          |    as decimal(38,18))) as double)""".stripMargin))
      .select(explode(col("terms")).as("r"),
        round(col("psi"), 4).as("psi_total"))
      .select(col("r.bucket"), col("r.n_a"), col("r.n_b"), col("r.term"),
        col("psi_total"))
      .orderBy(col("bucket"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q177_hopping_windows" -> (q177 _),
    "q178_join_key_skew" -> (q178 _),
    "q179_psi_drift" -> (q179 _))
}

/** DuckDB mirrors of Queries23. The q177 oracle expands each event
  * into its len/slide = 2 containing epoch-aligned windows explicitly
  * — the same expansion Spark's window() generator performs.
  */
object Oracle23 {

  val sql: Map[String, String] = Map(
    "q177_hopping_windows" ->
      """WITH e AS (SELECT epoch_ns(ts) // 1000 AS t, user_id
        |  FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-01'),
        |x AS (SELECT t, user_id,
        |    ((t // 300000000) - k) * 300000000 AS w_start_us
        |  FROM e, LATERAL unnest([0, 1]) AS u(k))
        |SELECT w_start_us, count(*) AS n_events,
        |  count(DISTINCT user_id) AS n_users
        |FROM x GROUP BY w_start_us ORDER BY w_start_us""".stripMargin,

    "q178_join_key_skew" ->
      """WITH pk AS (SELECT l_orderkey, count(*) AS n_items FROM lineitem
        |  GROUP BY l_orderkey),
        |st AS (SELECT count(*) AS n_keys,
        |    CAST(sum(n_items) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |      AS avg_items
        |  FROM pk)
        |SELECT pk.l_orderkey, pk.n_items, st.n_keys,
        |  round(st.avg_items, 4) AS avg_items,
        |  round(CAST(pk.n_items AS DOUBLE) / st.avg_items, 4)
        |    AS skew_vs_avg
        |FROM pk, st ORDER BY pk.n_items DESC, pk.l_orderkey LIMIT 5""".stripMargin,

    "q179_psi_drift" ->
      """WITH v AS (SELECT length(source) = 4 AS is_a,
        |    CAST(n_chars AS DOUBLE) AS v
        |  FROM documents WHERE n_chars IS NOT NULL),
        |ed AS (SELECT quantile_cont(v, 0.1) AS e1, quantile_cont(v, 0.2) AS e2,
        |    quantile_cont(v, 0.3) AS e3, quantile_cont(v, 0.4) AS e4,
        |    quantile_cont(v, 0.5) AS e5, quantile_cont(v, 0.6) AS e6,
        |    quantile_cont(v, 0.7) AS e7, quantile_cont(v, 0.8) AS e8,
        |    quantile_cont(v, 0.9) AS e9
        |  FROM v WHERE is_a),
        |b AS (SELECT
        |    (CASE WHEN v > e1 THEN 1 ELSE 0 END) +
        |    (CASE WHEN v > e2 THEN 1 ELSE 0 END) +
        |    (CASE WHEN v > e3 THEN 1 ELSE 0 END) +
        |    (CASE WHEN v > e4 THEN 1 ELSE 0 END) +
        |    (CASE WHEN v > e5 THEN 1 ELSE 0 END) +
        |    (CASE WHEN v > e6 THEN 1 ELSE 0 END) +
        |    (CASE WHEN v > e7 THEN 1 ELSE 0 END) +
        |    (CASE WHEN v > e8 THEN 1 ELSE 0 END) +
        |    (CASE WHEN v > e9 THEN 1 ELSE 0 END) AS bucket,
        |    is_a
        |  FROM v, ed),
        |c AS (SELECT bucket,
        |    CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS n_b
        |  FROM b GROUP BY bucket),
        |tt AS (SELECT sum(n_a) AS tot_a, sum(n_b) AS tot_b FROM c),
        |tm AS (SELECT bucket, n_a, n_b,
        |    round((CAST(n_a + 1 AS DOUBLE) / CAST(tot_a + 10 AS DOUBLE)
        |      - CAST(n_b + 1 AS DOUBLE) / CAST(tot_b + 10 AS DOUBLE))
        |      * ln((CAST(n_a + 1 AS DOUBLE) / CAST(tot_a + 10 AS DOUBLE))
        |        / (CAST(n_b + 1 AS DOUBLE) / CAST(tot_b + 10 AS DOUBLE))), 4)
        |      AS term
        |  FROM c, tt),
        |ps AS (SELECT CAST(sum(CAST(term AS DECIMAL(38,18))) AS DOUBLE)
        |    AS psi FROM tm)
        |SELECT tm.bucket, tm.n_a, tm.n_b, tm.term,
        |  round(ps.psi, 4) AS psi_total
        |FROM tm, ps ORDER BY tm.bucket""".stripMargin)
}
