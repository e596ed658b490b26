package graft

/** DuckDB-runnable ANSI SQL equivalents for every entry in
  * Queries.all (driver contract: SparkEntry.oracleSql). Conventions
  * mirror SURVEY.md §7.4:
  *   - same output column names + ORDER BY as the Spark side;
  *   - ROUND(x,4) on derived float aggregates;
  *   - kurtosis via explicit population moments (DuckDB's kurtosis()
  *     is sample-corrected, Spark's is population excess);
  *   - big sums via DECIMAL(18,6) per-row casts (order-independent);
  *   - array elements cast to double before arithmetic;
  *   - epoch(ts) fractional-second parity with Spark's ts.cast(double).
  */
object Oracle {

  val sql: Map[String, String] = Map(
    "q01_scan_projection" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q02_filter_predicate" ->
      """SELECT event_id, ts, user_id, event_type, value FROM events
        |WHERE event_type <> 'error' AND value > 50 ORDER BY event_id""".stripMargin,

    "q03_json_extract" ->
      """SELECT event_id, event_type,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
        |FROM events ORDER BY event_id""".stripMargin,

    "q04_rms_group" ->
      """SELECT user_id, round(sqrt(avg(value*value)), 4) AS rms
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q05_peak_group" ->
      """SELECT user_id, max(abs(value)) AS peak
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q06_peak_to_peak" ->
      """SELECT user_id, round(max(value) - min(value), 4) AS ptp
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q07_crest_factor" ->
      """SELECT user_id, round(max(abs(value)) / sqrt(avg(value*value)), 4) AS crest
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q08_kurtosis_group" ->
      """WITH m AS (SELECT event_type, avg(value) AS mu FROM events GROUP BY event_type)
        |SELECT e.event_type,
        |  round(avg(pow(e.value - m.mu, 4)) / pow(avg(pow(e.value - m.mu, 2)), 2) - 3, 4) AS kurt
        |FROM events e JOIN m ON e.event_type = m.event_type
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,

    "q09_outlier_zscore" ->
      """WITH s AS (SELECT avg(value) AS mu, stddev_pop(value) AS sigma FROM events)
        |SELECT e.event_id, e.value, round(abs(e.value - s.mu) / s.sigma, 4) AS zscore
        |FROM events e, s WHERE abs(e.value - s.mu) / s.sigma > 2
        |ORDER BY e.event_id""".stripMargin,

    "q10_inload_features" ->
      """WITH m AS (SELECT user_id, avg(value) AS mu FROM events GROUP BY user_id)
        |SELECT e.user_id,
        |  round(sqrt(avg(e.value*e.value)), 4) AS rms,
        |  max(abs(e.value)) AS peak,
        |  round(avg(pow(e.value - m.mu, 4)) / pow(avg(pow(e.value - m.mu, 2)), 2) - 3, 4) AS kurt
        |FROM events e JOIN m ON e.user_id = m.user_id
        |GROUP BY e.user_id ORDER BY e.user_id""".stripMargin,

    "q11_per_minute" ->
      """SELECT date_trunc('minute', ts) AS bucket_ts, count(*) AS n,
        |  round(avg(value), 4) AS avg_value
        |FROM events GROUP BY bucket_ts ORDER BY bucket_ts""".stripMargin,

    "q12_per_second_reduce" ->
      """SELECT date_trunc('second', ts) AS bucket_ts, user_id,
        |  round(sqrt(avg(value*value)), 4) AS rms, count(*) AS n
        |FROM events GROUP BY bucket_ts, user_id ORDER BY bucket_ts, user_id""".stripMargin,

    "q13_array_rms" ->
      """SELECT vec_id,
        |  round(sqrt(list_sum(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) / len(embedding)), 4) AS arr_rms
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "q14_array_peak" ->
      """SELECT vec_id,
        |  round(list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))), 4) AS arr_peak
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "q15_dedup" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY doc_id""".stripMargin,

    "q16_enrich_join" ->
      """SELECT event_id, c_name, c_mktsegment, value
        |FROM events JOIN customer ON user_id = c_custkey
        |ORDER BY event_id""".stripMargin,

    "q17_partitioned_write" ->
      """SELECT event_type, count(*) AS n FROM events
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q18_validity_split" ->
      """SELECT (value > 0 AND event_type <> 'error' AND props IS NOT NULL) AS is_valid,
        |  count(*) AS n, round(avg(value), 4) AS avg_value
        |FROM events GROUP BY is_valid ORDER BY is_valid""".stripMargin,

    "q19_completeness" ->
      """SELECT
        |  round(avg(CASE WHEN o_orderkey IS NULL THEN 0 ELSE 1 END), 4) AS o_orderkey_c,
        |  round(avg(CASE WHEN o_custkey IS NULL THEN 0 ELSE 1 END), 4) AS o_custkey_c,
        |  round(avg(CASE WHEN o_orderstatus IS NULL THEN 0 ELSE 1 END), 4) AS o_orderstatus_c,
        |  round(avg(CASE WHEN o_totalprice IS NULL THEN 0 ELSE 1 END), 4) AS o_totalprice_c,
        |  round(avg(CASE WHEN o_orderdate IS NULL THEN 0 ELSE 1 END), 4) AS o_orderdate_c
        |FROM orders""".stripMargin,

    "q20_cube_counts" ->
      """SELECT
        |  CASE WHEN GROUPING(lang) = 1 THEN 'ALL' ELSE coalesce(lang, 'NULL') END AS lang,
        |  CASE WHEN GROUPING(source) = 1 THEN 'ALL' ELSE coalesce(source, 'NULL') END AS source,
        |  count(*) AS n
        |FROM documents GROUP BY CUBE(lang, source)
        |ORDER BY lang, source""".stripMargin,

    "q21_distinct_users" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q22_multi_join_agg" ->
      """SELECT c_mktsegment,
        |  round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 4) AS revenue,
        |  count(*) AS n
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q23_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders)
        |ORDER BY c_custkey""".stripMargin,

    "q24_anti_join" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL)
        |ORDER BY c_custkey""".stripMargin,

    "q25_union_zones" ->
      """SELECT event_type, count(*) AS n,
        |  round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS total
        |FROM (SELECT * FROM events WHERE event_type = 'purchase'
        |      UNION ALL
        |      SELECT * FROM events WHERE event_type = 'click') u
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q26_topk_users" ->
      """SELECT user_id,
        |  round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS total
        |FROM events GROUP BY user_id
        |ORDER BY sum(CAST(value AS DECIMAL(18,6))) DESC, user_id LIMIT 10""".stripMargin,

    "q27_rank_window" ->
      """SELECT user_id, rn, event_id, value FROM (
        |  SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
        |  FROM events) t
        |WHERE rn <= 3 ORDER BY user_id, rn""".stripMargin,

    "q28_sessionize" ->
      """WITH x AS (
        |  SELECT user_id, event_id, ts,
        |    epoch(ts) - lag(epoch(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
        |  FROM events),
        |y AS (
        |  SELECT user_id, event_id, ts,
        |    CAST(sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM x)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(ts) AS start_ts, max(ts) AS end_ts
        |FROM y GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin,

    "q29_cosine_topk" ->
      """WITH p AS (SELECT embedding AS pe FROM embeddings WHERE vec_id = 0)
        |SELECT e.vec_id,
        |  round(
        |    list_sum(list_transform(range(1, len(e.embedding)+1),
        |      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(p.pe[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(p.pe, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))), 4) AS cosine
        |FROM embeddings e, p WHERE e.vec_id <> 0
        |ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin,

    "q30_token_wordcount" ->
      """SELECT word, count(*) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
        |GROUP BY word ORDER BY n DESC, word LIMIT 20""".stripMargin,

    "q31_doc_embed_join" ->
      """SELECT lang, count(*) AS n,
        |  round(avg(sqrt(list_sum(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) / len(embedding))), 4) AS avg_rms
        |FROM documents JOIN embeddings ON doc_id = vec_id
        |GROUP BY lang ORDER BY lang""".stripMargin
  )
}
