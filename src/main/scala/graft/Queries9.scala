package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-5 batch 4: product-analytics and lakehouse-maintenance ops.
  *
  *  - q124 cohort retention: users cohorted by first-seen day, alive
  *    fraction per day offset — the activation/retention matrix.
  *  - q125 prefix-filter set-similarity join: the AllPairs/PPJoin
  *    candidate generator (rare-tokens-first prefixes) + exact verify;
  *    the deterministic, recall-1.0 alternative to MinHash-LSH. The
  *    oracle is the BRUTE-FORCE token-Jaccard join, so the hash match
  *    proves prefix filtering loses no pair.
  *  - q126 session path mining: top-10 session-opening event-type
  *    paths (first 5 events per q28-session).
  *  - q127 one-pass data-profiling report (Deequ-style expectations
  *    input): null counts, distinct counts, ranges — the table-health
  *    snapshot every ingest gate starts from.
  *  - q128 CDC merge-upsert: latest-version-wins MERGE of a change
  *    batch into the corpus (the lakehouse compaction shape).
  *  - q129 per-group top-k: rank-window top-3 per language — the
  *    grouped twin of q26's global TakeOrdered.
  *
  * Every query is DuckDB-oracled (Oracle9) under the §7.4 conventions.
  */
object Queries9 {
  import Tables._

  /** q124 — COHORT RETENTION MATRIX. Cohort = a user's first active
    * day; cell (cohort, offset) = distinct users of that cohort active
    * `offset` days later, as count + fraction of cohort size.
    *
    * Scale: (user, day) distinct + per-user min are partial+final
    * aggregates on user_id; the join back is user-keyed equi-join; the
    * final aggregate lands on the (days × offsets)-sized matrix.
    * Nothing is ever per-event after the first distinct.
    */
  def q124(s: SparkSession, d: String): DataFrame = {
    val active = events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val first = active.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort"))
    val sizes = first.groupBy(col("cohort"))
      .agg(count(lit(1)).as("cohort_users"))
    active.join(first, Seq("user_id"))
      .groupBy(col("cohort"), datediff(col("day"), col("cohort")).as("offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(sizes, Seq("cohort"))
      .select(col("cohort"), col("offset"), col("n_active"),
        round(col("n_active").cast("double") / col("cohort_users"), 4)
          .as("retention"))
      .orderBy(col("cohort"), col("offset"))
  }

  /** q125 — PREFIX-FILTER SET-SIMILARITY JOIN (AllPairs/PPJoin shape,
    * Chaudhuri/Bayardo): distinct 3-gram shingles per doc ordered
    * rarest-first (global df, then shingle); a doc of n shingles
    * exposes only its first n − ceil(t·n) + 1 as join keys; two docs
    * with shingle-Jaccard ≥ t MUST collide on at least one prefix
    * shingle (the prefix-filter theorem), so candidates → exact-verify
    * loses nothing. The oracle is the unfiltered brute-force join
    * (q37's semantics) — the hash match IS the completeness proof on
    * this corpus.
    *
    * Scale: this is the recall-1.0 competitor to MinHash (q46): no
    * banding error, but candidate volume depends on df skew — which is
    * exactly what rare-first ordering bounds: a boilerplate shingle
    * never enters a prefix unless the doc is nearly all boilerplate.
    * Joins are shingle-keyed equi-joins; verify touches candidates
    * only.
    */
  def q125(s: SparkSession, d: String): DataFrame =
    // tokens ride as XXH64 hashes, not strings (round 12): every
    // downstream shuffle/sort/join key shrinks from a ~25-byte
    // 3-gram string to 8 bytes. PPJoin's prefix-completeness holds
    // under ANY consistent global token ordering — (df, hash) is as
    // valid as (df, string) — and the verify intersection stays exact
    // modulo 64-bit collisions (the q37/q46 disclaimer: ~|shingles|²
    // /2⁶⁵, far below the 4dp rounding threshold the oracle hashes).
    //
    // Round 13 (VERDICT r12 #1): the df-annotated posting chain (one
    // shingle pass + tok-window + doc-window) moved into the shared
    // LshStages.dfPostings materialization — q125's prefix pass AND
    // both exact-verify sides read that one stage, and q37/q90's
    // inverted-index arm derives from it too, instead of each query
    // paying its own shingle pass. The PPJoin pipeline itself is the
    // library operator Dedup.prefixJaccardPairs (t = 4/5), which also
    // hardened ceil(t·n) to exact integer arithmetic — see its
    // scaladoc for why the double form under-sized the prefix for
    // n ≡ 0 (mod 5).
    graft.operators.Dedup
      .prefixJaccardPairs(LshStages.dfPostings(s, d),
        LshStages.docShingleSets(s, d), tNum = 4, tDen = 5)
      .orderBy(col("a_id"), col("b_id"))
  // (q125 verified at t=0.8 over trigram shingle sets — the q37
  // semantics; unigram token sets are non-discriminative on this
  // near-dup-heavy corpus: >30k pairs even at 0.8.)

  /** q126 — SESSION PATH MINING. The 10 most common session-opening
    * paths (first ≤5 event types, µs+event_id ordered — the q89
    * convention) across q28-gap sessions. Path assembly sorts the
    * collected (rn, type) pairs INSIDE the row (rn is unique per
    * session), so no collect_list ordering nondeterminism survives.
    *
    * Scale: sessionize = per-user window; path build = per-session
    * aggregate carrying ≤5 tiny structs; top-10 via TakeOrdered on the
    * path-count aggregate. Never materializes full event sequences.
    */
  def q126(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")), col("event_id"))
    val sess = events(s, d)
      .withColumn("gap",
        unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("is_new",
        when(col("gap").isNull || col("gap") > 1800000000L, 1).otherwise(0))
      .withColumn("session_id",
        sum(col("is_new")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    val bySess = Window.partitionBy(col("user_id"), col("session_id"))
      .orderBy(unix_micros(col("ts")), col("event_id"))
    sess.withColumn("rn", row_number().over(bySess))
      .filter(col("rn") <= 5)
      .groupBy(col("user_id"), col("session_id"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("rn"), col("event_type")))),
        // coalesce (mirrored in the oracle): array_join SKIPS null
        // elements while string_agg DROPS null rows — agreeing on most
        // inputs but diverging when every slot is null ("" vs NULL);
        // the shared sentinel removes the asymmetry entirely
        x => coalesce(x.getField("event_type"), lit("∅"))), ">")
        .as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(10)
  }

  /** q127 — ONE-PASS PROFILING REPORT. The Deequ-style table-health
    * snapshot for events: row count, per-column null counts, distinct
    * cardinalities, value/time ranges — one aggregate, one row.
    *
    * Scale: count_distinct over two columns plans as an Expand (×2
    * rows in the map phase) + partial/final aggregate — the exact
    * form a profiler trades for exactness; the approx_count_distinct
    * twin (A6, PropertySpec) is the 100 TB default.
    */
  def q127(s: SparkSession, d: String): DataFrame =
    events(s, d).agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("props").isNull, 1L).otherwise(0L)).as("n_null_props"),
      sum(when(col("value").isNull, 1L).otherwise(0L)).as("n_null_value"),
      count_distinct(col("user_id")).as("n_users"),
      count_distinct(col("event_type")).as("n_types"),
      round(min(col("value")), 4).as("min_value"),
      round(max(col("value")), 4).as("max_value"),
      min(col("ts")).as("min_ts"),
      max(col("ts")).as("max_ts"))

  /** q128 — CDC MERGE-UPSERT. Latest-version-wins MERGE of a derived
    * change batch (updates for doc_id ≡ 0 mod 50, inserts keyed past
    * the corpus) into documents; emits the post-merge state as
    * (doc_id, version, md5 fingerprint). The change batch is DERIVED
    * deterministically from the corpus so both engines construct the
    * identical batch.
    *
    * Scale: union + one row_number window keyed on doc_id — the
    * standard lakehouse MERGE plan (Delta/Iceberg compile to the same
    * shape); one shuffle on the merge key, no driver state.
    */
  def q128(s: SparkSession, d: String): DataFrame = {
    val base = documents(s, d)
      .select(col("doc_id"), col("text"), lit(1L).as("version"))
    val updates = documents(s, d)
      .filter(col("doc_id") % 50 === 0)
      .select(col("doc_id"), concat(lit("v2 "), col("text")).as("text"),
        lit(2L).as("version"))
    val inserts = documents(s, d)
      .filter(col("doc_id") % 100 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(lit("new "), col("text")).as("text"), lit(2L).as("version"))
    val merged = base.unionByName(updates).unionByName(inserts)
    val byKey = Window.partitionBy(col("doc_id"))
      .orderBy(col("version").desc)
    merged.withColumn("rn", row_number().over(byKey))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("version"), md5(col("text")).as("fp"))
      .orderBy(col("doc_id"))
  }

  /** q129 — PER-GROUP TOP-K. Top-3 longest docs per language (rank by
    * n_chars desc, doc_id tiebreak) — the grouped twin of q26's global
    * top-k.
    *
    * Scale: rank window per lang partition over a NARROW projection
    * (3 columns); the filter drops everything past k before any
    * downstream touch. With bounded k this is the one window shape
    * that needs no salting — each group retains k rows.
    */
  def q129(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    documents(s, d)
      .select(col("lang"), col("doc_id"), col("n_chars"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      // asc_nulls_last = DuckDB's default NULL ordering (round-6
      // null-safety sweep; lang is nullable in the schema)
      .orderBy(col("lang").asc_nulls_last, col("rnk"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q124_cohort_retention" -> (q124 _),
    "q125_prefix_similarity_join" -> (q125 _),
    "q126_session_paths" -> (q126 _),
    "q127_profile_report" -> (q127 _),
    "q128_cdc_merge" -> (q128 _),
    "q129_group_topk" -> (q129 _))
}

/** DuckDB mirrors of Queries9 — same formulas, same decimal paths,
  * same rounding (§7.4).
  */
object Oracle9 {

  /** DuckDB mirror of Text.shingles(text, 3) (clamped-slice form,
    * same as Oracle5's).
    */
  private val shingles3 =
    "list_transform(range(1, greatest(len(toks)-2, 1) + 1), " +
      "i -> array_to_string(toks[i:i+2], ' '))"

  val sql: Map[String, String] = Map(
    "q124_cohort_retention" ->
      """WITH active AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        |    FROM events),
        |first AS (SELECT user_id, min(day) AS cohort FROM active
        |    GROUP BY user_id),
        |sizes AS (SELECT cohort, count(*) AS cohort_users FROM first
        |    GROUP BY cohort),
        |cell AS (SELECT f.cohort, a.day - f.cohort AS "offset",
        |    count(*) AS n_active
        |  FROM active a JOIN first f USING (user_id)
        |  GROUP BY 1, 2)
        |SELECT c.cohort, c."offset", c.n_active,
        |  round(CAST(c.n_active AS DOUBLE) / s.cohort_users, 4)
        |    AS retention
        |FROM cell c JOIN sizes s USING (cohort)
        |ORDER BY c.cohort, c."offset"""".stripMargin,

    // brute-force trigram-shingle Jaccard join — NO prefix filter.
    // Hash-matching the prefix-filtered Spark plan proves the filter
    // is lossless.
    "q125_prefix_similarity_join" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
         |    FROM documents),
         |post AS (SELECT DISTINCT doc_id, unnest(list_distinct(
         |    $shingles3)) AS tok FROM t),
         |sz AS (SELECT doc_id, count(*) AS n FROM post GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |    count(*) AS i
         |  FROM post a JOIN post b
         |    ON a.tok = b.tok AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT a_id, b_id,
         |  round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 4) AS jaccard
         |FROM inter
         |JOIN sz sa ON sa.doc_id = a_id
         |JOIN sz sb ON sb.doc_id = b_id
         |WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8
         |ORDER BY a_id, b_id""".stripMargin,

    "q126_session_paths" ->
      """WITH x AS (SELECT user_id, event_id, event_type,
        |    epoch_ns(ts) // 1000 AS us,
        |    epoch_ns(ts) // 1000 - lag(epoch_ns(ts) // 1000)
        |      OVER (PARTITION BY user_id
        |        ORDER BY epoch_ns(ts) // 1000, event_id) AS gap
        |  FROM events),
        |y AS (SELECT user_id, event_id, event_type, us,
        |    CAST(sum(CASE WHEN gap IS NULL OR gap > 1800000000
        |      THEN 1 ELSE 0 END) OVER (PARTITION BY user_id
        |        ORDER BY us, event_id ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS session_id
        |  FROM x),
        |z AS (SELECT user_id, session_id, event_type,
        |    row_number() OVER (PARTITION BY user_id, session_id
        |      ORDER BY us, event_id) AS rn
        |  FROM y),
        |p AS (SELECT user_id, session_id,
        |    string_agg(coalesce(event_type, '∅'), '>' ORDER BY rn) AS path
        |  FROM z WHERE rn <= 5 GROUP BY user_id, session_id)
        |SELECT path, count(*) AS n_sessions FROM p
        |GROUP BY path ORDER BY n_sessions DESC, path LIMIT 10""".stripMargin,

    "q127_profile_report" ->
      """SELECT count(*) AS n_rows,
        |  CAST(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_null_props,
        |  CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_null_value,
        |  count(DISTINCT user_id) AS n_users,
        |  count(DISTINCT event_type) AS n_types,
        |  round(min(value), 4) AS min_value,
        |  round(max(value), 4) AS max_value,
        |  min(ts) AS min_ts, max(ts) AS max_ts
        |FROM events""".stripMargin,

    "q128_cdc_merge" ->
      """WITH base AS (SELECT doc_id, text, 1 AS version FROM documents),
        |upd AS (SELECT doc_id, 'v2 ' || text AS text, 2 AS version
        |  FROM documents WHERE doc_id % 50 = 0),
        |ins AS (SELECT doc_id + 1000000 AS doc_id, 'new ' || text AS text,
        |    2 AS version
        |  FROM documents WHERE doc_id % 100 = 0),
        |m AS (SELECT * FROM base UNION ALL SELECT * FROM upd
        |  UNION ALL SELECT * FROM ins),
        |r AS (SELECT doc_id, CAST(version AS BIGINT) AS version,
        |    md5(text) AS fp,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY version DESC)
        |      AS rn
        |  FROM m)
        |SELECT doc_id, version, fp FROM r WHERE rn = 1
        |ORDER BY doc_id""".stripMargin,

    "q129_group_topk" ->
      """WITH r AS (SELECT lang, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY n_chars DESC, doc_id) AS rnk
        |  FROM documents)
        |SELECT lang, doc_id, n_chars, rnk FROM r WHERE rnk <= 3
        |ORDER BY lang, rnk""".stripMargin)
}
