package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.{Text, TextExpressions}

/** Round-5 batch 3: pipeline-operations diagnostics and sketch ops.
  *
  *  - q118 heavy hitters: the skew diagnostic every partitioning
  *    decision starts from — which keys would stall a task at 100×.
  *  - q119 Markov transitions: per-user behavioral transition matrix
  *    (the sequence prior behind session-based features).
  *  - q120 boilerplate-removal retention: compose q88's corpus
  *    boilerplate set with a per-doc retention audit — the "what would
  *    boilerplate stripping delete" report run before committing to it.
  *  - q121 winsorized aggregation: percentile-clipped robust means —
  *    the outlier-tolerant twin of q04/q09.
  *  - q122 next-event training examples: sliding (3-gram context →
  *    label) example generation from event sequences — the
  *    supervised-dataset materialization step.
  *  - q123 count-min-sketch calibration: CMS token counts vs exact,
  *    over-count measured per heavy token — the bounded-memory
  *    frequency sketch a 100 TB token census would actually use,
  *    calibrated the AnnRecallSpec way (measured, not asserted).
  *
  * Every query is DuckDB-oracled (Oracle8) under the §7.4 conventions.
  */
object Queries8 {
  import Tables._

  /** q118 — HEAVY HITTERS. Top-10 users by event count with their
    * share of total traffic: the skew report that decides whether a
    * key needs salting (operators.Skew) before it stalls a 100×
    * shuffle.
    *
    * Scale: partial+final count on user_id, single-row total
    * broadcast back, TakeOrderedAndProject for the top-k (never a
    * global sort). The per-user aggregate is the only shuffle.
    */
  def q118(s: SparkSession, d: String): DataFrame = {
    val perUser = events(s, d).groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    val total = perUser.agg(sum(col("n_events")).as("total"))
    perUser.crossJoin(broadcast(total))
      .select(col("user_id"), col("n_events"),
        round(col("n_events").cast("double") / col("total"), 4).as("share"))
      .orderBy(col("n_events").desc, col("user_id"))
      .limit(10)
  }

  /** q119 — MARKOV TRANSITION MATRIX. (prev event type → event type)
    * counts and row-normalized probabilities from per-user sequences,
    * ordered by integer µs + event_id so both engines agree on every
    * tie (the q89 convention).
    *
    * Scale: one lag window per user partition, then an aggregate onto
    * the (|types|²)-row transition table; the probability window runs
    * over that tiny aggregate, not the events.
    */
  def q119(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")), col("event_id"))
    val tr = events(s, d)
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val byPrev = Window.partitionBy(col("prev_type"))
    tr.select(col("prev_type"), col("event_type"), col("n"),
        round(col("n").cast("double") / sum(col("n")).over(byPrev), 4)
          .as("p"))
      .orderBy(col("prev_type"), col("event_type"))
  }

  /** q120 — BOILERPLATE-REMOVAL RETENTION. Per-doc audit of what
    * stripping the corpus top-20 boilerplate 7-grams (q88's set, same
    * deterministic tie-break) would remove: distinct-shingle count,
    * boilerplate hits, retained fraction.
    *
    * Scale: the boilerplate set is top-k-bounded (20 rows) and
    * broadcast; the per-doc side is the distinct (doc, shingle)
    * postings list — one shuffle for distinct, one broadcast join, one
    * aggregate. Never joins postings to postings.
    */
  def q120(s: SparkSession, d: String): DataFrame = {
    val sh = documents(s, d)
      .select(col("doc_id"),
        explode(TextExpressions.shingle_strings(col("text"), 7))
          .as("shingle"))
      .distinct()
    val boiler = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("shingle")).limit(20)
      .select(col("shingle").as("b_shingle"))
    sh.join(broadcast(boiler), col("shingle") === col("b_shingle"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("b_shingle").isNotNull, 1L).otherwise(0L))
          .as("n_boiler"))
      .select(col("doc_id"), col("n_shingles"), col("n_boiler"),
        round(lit(1.0) -
          col("n_boiler").cast("double") / col("n_shingles"), 4)
          .as("retention"))
      .orderBy(col("doc_id"))
  }

  /** q121 — WINSORIZED AGGREGATION. Per-type p05/p95 exact
    * interpolated percentiles (q41's verified kernel), values clipped
    * to [lo, hi], then the robust mean + clip-rate report. Thresholds
    * are rounded to 4 dp BEFORE clipping on both engines, so a
    * last-ulp percentile difference cannot flip a boundary row's
    * clip decision.
    *
    * Scale: two passes over events (percentile aggregate, then clip +
    * aggregate) with the |types|-row threshold table broadcast between
    * them — the standard two-phase robust-stats shape; the mean goes
    * through DECIMAL(38,18) partial sums.
    */
  def q121(s: SparkSession, d: String): DataFrame = {
    val dec = DecimalType(38, 18)
    val e = events(s, d)
    val thr = e.groupBy(col("event_type"))
      .agg(round(percentile(col("value"), lit(0.05)), 4).as("lo"),
        round(percentile(col("value"), lit(0.95)), 4).as("hi"))
    e.join(broadcast(thr), Seq("event_type"))
      .select(col("event_type"), col("lo"), col("hi"),
        least(greatest(col("value"), col("lo")), col("hi")).as("clipped"),
        (col("value") < col("lo") || col("value") > col("hi"))
          .as("is_clipped"))
      .groupBy(col("event_type"))
      .agg(min(col("lo")).as("lo"), max(col("hi")).as("hi"),
        count(lit(1)).as("n"),
        sum(when(col("is_clipped"), 1L).otherwise(0L)).as("n_clipped"),
        round(sum(col("clipped").cast(dec)).cast("double") /
          count(lit(1)), 4).as("winsor_mean"))
      .orderBy(col("event_type"))
  }

  /** q122 — NEXT-EVENT TRAINING EXAMPLES. Sliding (3 previous event
    * types → next type) supervised examples per user — the
    * sequence-dataset materialization a behavioral model trains on.
    * Ordering is integer µs + event_id (exact on both engines).
    *
    * Scale: one lag window per user partition, per-row concat, no
    * joins; output is one example per event with ≥3 predecessors.
    */
  def q122(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")), col("event_id"))
    events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        lag(col("event_type"), 3).over(w).as("c1"),
        lag(col("event_type"), 2).over(w).as("c2"),
        lag(col("event_type"), 1).over(w).as("c3"))
      .filter(col("c1").isNotNull)
      .select(col("user_id"), col("event_id"),
        // concat (NOT concat_ws): NULL-propagating exactly like the
        // oracle's `||`, so a NULL event_type in the context window
        // yields NULL on both engines instead of silently shrinking
        // the Spark-side context string
        concat(col("c1"), lit(" "), col("c2"), lit(" "), col("c3"))
          .as("context"),
        col("event_type").as("label"))
      .orderBy(col("user_id"), col("event_id"))
  }

  private val CmsDepth = 4
  private val CmsWidth = 1024L

  /** The CMS probe row for one token: (j, cell_j) for each of the
    * depth hash rows, h_j(tok) = md5Long(j || tok) mod width — md5 so
    * the oracle computes the identical cells.
    */
  private def cmsCells(tok: org.apache.spark.sql.Column) =
    posexplode(array((0 until CmsDepth).map(j =>
      pmod(Text.md5LongSeeded(tok, j), lit(CmsWidth))): _*))

  /** q123 — COUNT-MIN-SKETCH CALIBRATION. Build a depth-4 × 1024 CMS
    * over corpus token frequencies, then report estimated vs exact
    * count and the over-count for the 20 heaviest tokens. CMS never
    * under-counts; the over-count column measures the collision error
    * this (d, w) would carry at the corpus' cardinality — measured,
    * not asserted, like AnnRecallSpec.
    *
    * Scale: the sketch IS the point — O(d·w) cells regardless of
    * corpus size, built with one partial+final aggregate (incrementing
    * per occurrence is associative, so building from per-token counts
    * is identical). The probe side is top-k-bounded and the 4096-row
    * sketch is broadcast to it.
    */
  def q123(s: SparkSession, d: String): DataFrame = {
    val exact = documents(s, d)
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n_exact"))
    val cells = exact.select(col("tok"), col("n_exact"),
      cmsCells(col("tok")).as(Seq("j", "cell")))
    val sketch = cells.groupBy(col("j"), col("cell"))
      .agg(sum(col("n_exact")).as("cnt"))
    val top = exact.orderBy(col("n_exact").desc, col("tok")).limit(20)
    top.select(col("tok"), col("n_exact"),
        cmsCells(col("tok")).as(Seq("j", "cell")))
      .join(broadcast(sketch), Seq("j", "cell"))
      .groupBy(col("tok"), col("n_exact"))
      .agg(min(col("cnt")).as("n_est"))
      .select(col("tok"), col("n_exact"), col("n_est"),
        (col("n_est") - col("n_exact")).as("overcount"))
      .orderBy(col("n_exact").desc, col("tok"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q118_heavy_hitters" -> (q118 _),
    "q119_markov_transitions" -> (q119 _),
    "q120_boilerplate_retention" -> (q120 _),
    "q121_winsorized_agg" -> (q121 _),
    "q122_next_event_examples" -> (q122 _),
    "q123_cms_calibration" -> (q123 _))
}

/** DuckDB mirrors of Queries8 — same formulas, same decimal paths,
  * same rounding (§7.4).
  */
object Oracle8 {

  private def md5long(e: String): String =
    s"CAST('0x' || substring(md5($e), 1, 15) AS BIGINT)"

  /** DuckDB mirror of Text.shingles(text, 7) (clamped-slice form). */
  private val shingles7 =
    "list_transform(range(1, greatest(len(toks)-6, 1) + 1), " +
      "i -> array_to_string(toks[i:i+6], ' '))"

  val sql: Map[String, String] = Map(
    "q118_heavy_hitters" ->
      """WITH u AS (SELECT user_id, count(*) AS n_events
        |    FROM events GROUP BY user_id),
        |t AS (SELECT CAST(SUM(n_events) AS DOUBLE) AS total FROM u)
        |SELECT user_id, n_events,
        |  round(CAST(n_events AS DOUBLE) / total, 4) AS share
        |FROM u, t ORDER BY n_events DESC, user_id LIMIT 10""".stripMargin,

    "q119_markov_transitions" ->
      """WITH x AS (SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_ns(ts) // 1000, event_id) AS prev_type
        |  FROM events),
        |tr AS (SELECT prev_type, event_type, count(*) AS n
        |  FROM x WHERE prev_type IS NOT NULL GROUP BY 1, 2)
        |SELECT prev_type, event_type, n,
        |  round(CAST(n AS DOUBLE) /
        |    SUM(n) OVER (PARTITION BY prev_type), 4) AS p
        |FROM tr ORDER BY prev_type, event_type""".stripMargin,

    "q120_boilerplate_retention" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
         |    FROM documents),
         |sh AS (SELECT DISTINCT doc_id, unnest($shingles7) AS shingle
         |    FROM t),
         |b AS (SELECT shingle FROM (
         |    SELECT shingle, count(*) AS df FROM sh
         |    GROUP BY shingle ORDER BY df DESC, shingle LIMIT 20)),
         |j AS (SELECT s.doc_id, (b.shingle IS NOT NULL) AS is_b
         |  FROM sh s LEFT JOIN b ON s.shingle = b.shingle)
         |SELECT doc_id, count(*) AS n_shingles,
         |  CAST(SUM(CASE WHEN is_b THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_boiler,
         |  round(1.0 - CAST(SUM(CASE WHEN is_b THEN 1 ELSE 0 END)
         |    AS DOUBLE) / count(*), 4) AS retention
         |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q121_winsorized_agg" ->
      """WITH thr AS (SELECT event_type,
        |    round(quantile_cont(value, 0.05), 4) AS lo,
        |    round(quantile_cont(value, 0.95), 4) AS hi
        |  FROM events GROUP BY event_type),
        |j AS (SELECT e.event_type, thr.lo, thr.hi,
        |    least(greatest(e.value, thr.lo), thr.hi) AS clipped,
        |    (e.value < thr.lo OR e.value > thr.hi) AS isc
        |  FROM events e JOIN thr USING (event_type))
        |SELECT event_type, min(lo) AS lo, max(hi) AS hi,
        |  count(*) AS n,
        |  CAST(SUM(CASE WHEN isc THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_clipped,
        |  round(CAST(SUM(CAST(clipped AS DECIMAL(38,18))) AS DOUBLE)
        |    / count(*), 4) AS winsor_mean
        |FROM j GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q122_next_event_examples" ->
      """WITH x AS (SELECT user_id, event_id, event_type,
        |    lag(event_type, 3) OVER w AS c1,
        |    lag(event_type, 2) OVER w AS c2,
        |    lag(event_type, 1) OVER w AS c3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id
        |    ORDER BY epoch_ns(ts) // 1000, event_id))
        |SELECT user_id, event_id,
        |  c1 || ' ' || c2 || ' ' || c3 AS context,
        |  event_type AS label
        |FROM x WHERE c1 IS NOT NULL
        |ORDER BY user_id, event_id""".stripMargin,

    "q123_cms_calibration" -> {
      val cell = md5long("CAST(j AS VARCHAR) || tok") + " % 1024"
      s"""WITH tk AS (SELECT unnest(string_split(text, ' ')) AS tok
         |    FROM documents),
         |exact AS (SELECT tok, count(*) AS n_exact FROM tk GROUP BY tok),
         |cells AS (SELECT tok, n_exact, j, $cell AS cell
         |  FROM exact, range(4) r(j)),
         |sk AS (SELECT j, cell, CAST(SUM(n_exact) AS BIGINT) AS cnt
         |  FROM cells GROUP BY j, cell),
         |top AS (SELECT tok, n_exact FROM exact
         |  ORDER BY n_exact DESC, tok LIMIT 20),
         |est AS (SELECT c.tok, c.n_exact, MIN(sk.cnt) AS n_est
         |  FROM cells c JOIN top USING (tok) JOIN sk USING (j, cell)
         |  GROUP BY c.tok, c.n_exact)
         |SELECT tok, n_exact, n_est,
         |  CAST(n_est - n_exact AS BIGINT) AS overcount
         |FROM est ORDER BY n_exact DESC, tok""".stripMargin
    })
}
