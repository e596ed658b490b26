package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 batch 5: the product-analytics block — cohort retention,
  * behavioral transition matrix, trailing-window rollups — plus
  * neighborhood-blocked fuzzy entity matching.
  *
  *  - q168 cohort retention: the day-k retention grid every events
  *    warehouse serves; two narrow aggregates + one broadcast join,
  *    never a users×days cross product.
  *  - q169 Markov transition matrix: per-user next-event transitions
  *    via lag — one window scan, |types|² output.
  *  - q170 trailing 7-day rollup: RANGE-framed window over per-day
  *    aggregates — the daily table is tiny, so the frame never
  *    re-reads events.
  *  - q171 Hamming-1 entity pairs: SymSpell-style wildcard
  *    neighborhood blocking — linear fan-out (|name| variants/row),
  *    equi-join on (position, variant), provably recall-complete for
  *    single-substitution typos; the quadratic all-pairs levenshtein
  *    never materializes.
  */
object Queries21 {
  import Tables._

  /** q168 — COHORT RETENTION GRID. Cohort = each user's first signup
    * day; for k = 0..7, the fraction of the cohort active (any event)
    * exactly k days later.
    *
    * Scale: cohorts (one row per user) and daily-activity (one row
    * per user-day) are both narrow aggregates of the event scan; the
    * grid join is cohort-keyed and the cohort-size side is a tiny
    * broadcast. No users×days product, no window over raw events.
    */
  def q168(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).filter(col("user_id").isNotNull)
    val cohort = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("cohort_day"))
    val active = ev.select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val sizes = cohort.groupBy(col("cohort_day"))
      .agg(count(lit(1)).as("n_cohort"))
    cohort.join(active, Seq("user_id"))
      .select(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).as("k"), col("user_id"))
      .filter(col("k").between(0, 7))
      .groupBy(col("cohort_day"), col("k"))
      .agg(count_distinct(col("user_id")).as("n_active"))
      .join(broadcast(sizes), Seq("cohort_day"))
      .select(col("cohort_day"), col("k"), col("n_active"), col("n_cohort"),
        round(col("n_active").cast("double") /
          col("n_cohort").cast("double"), 4).as("retention"))
      .orderBy(col("cohort_day"), col("k"))
  }

  /** q169 — EVENT TRANSITION MATRIX (first-order Markov estimate of
    * user behavior). lag over (user, time) gives each event its
    * predecessor; the census of (from, to) pairs + per-from row
    * normalization is the transition-probability estimate.
    *
    * Scale: one window scan (linear per user partition), |types|²
    * output, probabilities off a broadcast-sized from-marginal.
    */
  def q169(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")), col("event_id"))
    val trans = events(s, d).filter(col("user_id").isNotNull)
      .withColumn("from_type", lag(col("event_type"), 1).over(byUser))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val marg = Window.partitionBy(col("from_type"))
    trans
      .withColumn("p", round(col("n").cast("double") /
        sum(col("n")).over(marg).cast("double"), 4))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** q170 — TRAILING 7-DAY ROLLUP (rolling DAU-style report): per
    * day, that day's events and users next to the trailing-7-day
    * event total and daily-average.
    *
    * Scale: the RANGE frame runs over the PER-DAY aggregate (≤ one
    * row per day — thousands of rows at any corpus size), never over
    * raw events; day arithmetic is integer (datediff from epoch).
    */
  def q170(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"),
        count_distinct(col("user_id")).as("n_users"))
      .withColumn("dayn", datediff(col("day"), lit("1970-01-01")))
    val w7 = Window.orderBy(col("dayn")).rangeBetween(-6, 0)
    daily
      .select(col("day"), col("n_events"), col("n_users"),
        sum(col("n_events")).over(w7).as("events_7d"),
        round(sum(col("n_events")).over(w7).cast("double") / 7.0, 4)
          .as("events_7d_avg"))
      .orderBy(col("day"))
  }

  /** q171 — HAMMING-1 ENTITY PAIRS via wildcard-neighborhood blocking
    * (the SymSpell/deletion-neighborhood move): each name emits
    * |name| variants with one position wildcarded; two names collide
    * on (position i, variant) IFF they agree everywhere except
    * possibly at i — so the equi-join finds EVERY single-substitution
    * pair (recall 1.0 by construction) and nothing else, and the
    * levenshtein == 1 verification the output carries is provable,
    * not sampled.
    *
    * Scale: fan-out is |name| rows per record (linear), candidates
    * come from ONE shuffle of the variants into (pos, variant)
    * buckets + an in-row i<j expansion (the q234 shape — a
    * variants⋈variants self-join re-ran the fan-out per side and
    * shuffled it twice; r10). A bucket's members all agree except at
    * the wildcard, so its size is bounded by the ALPHABET at that
    * position (≤10 for digit ids) — the expansion is constant per
    * bucket, and the all-pairs levenshtein matrix — the naive O(n²)
    * entity-resolution plan — never materializes. The report
    * aggregates to one row per differing position.
    */
  def q171(s: SparkSession, d: String): DataFrame = {
    val c = table(s, d, "customer").select(col("c_custkey"), col("c_name"))
    // bucket members agree at every position EXCEPT the wildcard, so
    // levenshtein(a, b) == 1 ⟺ their characters AT pos differ (equal
    // chars ⟹ identical names ⟹ distance 0) — carry the 1-char
    // column, not the whole name, and the verification stays provable
    val buckets = c.select(col("c_custkey"), col("c_name"),
        posexplode(graft.functions.Linkage.deletion_variants(col("c_name"))))
      .toDF("id", "name", "pos", "variant")
      .groupBy(col("pos"), col("variant"))
      .agg(sort_array(collect_list(struct(col("id"),
        expr("substring(name, pos + 1, 1)").as("ch")))).as("ms"))
      .filter(size(col("ms")) > 1)
    // member-pair expansion via the Combos kernel (round 12, the
    // q234/q279 rewrite): one tight loop per bucket row instead of an
    // interpreted lambda frame + sub-array copy per slice() step —
    // hot buckets pay C(n,2) either way, but without the HOF
    // interpretation overhead that inflates on throttled windows
    buckets.select(col("pos"), explode(
        graft.functions.TextExpressions.combos(col("ms"), 2)).as("p"))
      .select(col("pos"), col("p.a.id").as("a_id"), col("p.a.ch").as("a_ch"),
        col("p.b.id").as("b_id"), col("p.b.ch").as("b_ch"))
      .filter(col("a_ch") =!= col("b_ch"))
      .groupBy(col("pos"))
      .agg(count(lit(1)).as("n_pairs"),
        min(col("a_id")).as("min_a_id"), max(col("b_id")).as("max_b_id"))
      .orderBy(col("pos"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q168_cohort_retention" -> (q168 _),
    "q169_event_transitions" -> (q169 _),
    "q170_rolling_7day" -> (q170 _),
    "q171_hamming1_entity_pairs" -> (q171 _))
}

/** DuckDB mirrors of Queries21. */
object Oracle21 {

  val sql: Map[String, String] = Map(
    "q168_cohort_retention" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day, event_type
        |  FROM events WHERE user_id IS NOT NULL),
        |cohort AS (SELECT user_id, min(day) AS cohort_day FROM ev
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |active AS (SELECT DISTINCT user_id, day FROM ev),
        |sizes AS (SELECT cohort_day, count(*) AS n_cohort FROM cohort
        |  GROUP BY cohort_day),
        |grid AS (SELECT c.cohort_day, a.day - c.cohort_day AS k,
        |    count(DISTINCT c.user_id) AS n_active
        |  FROM cohort c JOIN active a USING (user_id)
        |  WHERE a.day - c.cohort_day BETWEEN 0 AND 7
        |  GROUP BY c.cohort_day, a.day - c.cohort_day)
        |SELECT g.cohort_day, CAST(k AS INTEGER) AS k, g.n_active,
        |  s.n_cohort,
        |  round(CAST(g.n_active AS DOUBLE) / CAST(s.n_cohort AS DOUBLE), 4)
        |    AS retention
        |FROM grid g JOIN sizes s USING (cohort_day)
        |ORDER BY g.cohort_day, k""".stripMargin,

    "q169_event_transitions" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ns(ts) // 1000 AS t,
        |    event_type
        |  FROM events WHERE user_id IS NOT NULL),
        |tr AS (SELECT lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY t, event_id) AS from_type,
        |    event_type AS to_type
        |  FROM e),
        |c AS (SELECT from_type, to_type, count(*) AS n FROM tr
        |  WHERE from_type IS NOT NULL GROUP BY from_type, to_type)
        |SELECT from_type, to_type, n,
        |  round(CAST(n AS DOUBLE) /
        |    CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE), 4) AS p
        |FROM c ORDER BY from_type, to_type""".stripMargin,

    "q170_rolling_7day" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS day,
        |    count(*) AS n_events, count(DISTINCT user_id) AS n_users,
        |    CAST(ts AS DATE) - DATE '1970-01-01' AS dayn
        |  FROM events GROUP BY CAST(ts AS DATE))
        |SELECT day, n_events, n_users,
        |  CAST(sum(n_events) OVER (ORDER BY dayn
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS events_7d,
        |  round(CAST(sum(n_events) OVER (ORDER BY dayn
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) / 7.0, 4)
        |    AS events_7d_avg
        |FROM daily ORDER BY day""".stripMargin,

    "q171_hamming1_entity_pairs" ->
      """WITH v AS (SELECT c_custkey, c_name, i AS pos,
        |    substr(c_name, 1, i) || chr(183) ||
        |      substr(c_name, i + 2, length(c_name)) AS variant
        |  FROM customer, LATERAL unnest(range(0, length(c_name))) AS r(i))
        |SELECT a.pos,
        |  count(*) AS n_pairs,
        |  min(a.c_custkey) AS min_a_id, max(b.c_custkey) AS max_b_id
        |FROM v a JOIN v b ON a.pos = b.pos AND a.variant = b.variant
        |  AND a.c_custkey < b.c_custkey
        |WHERE levenshtein(a.c_name, b.c_name) = 1
        |GROUP BY a.pos ORDER BY a.pos""".stripMargin)
}
