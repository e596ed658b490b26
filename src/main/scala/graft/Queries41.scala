package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 batch 5: trend forecasting, first-digit audit, and hybrid
  * retrieval fusion (SURVEY §2.8 X134-X136).
  */
object Queries41 {
  import Tables._

  /** q224 — HOLT LINEAR-TREND SMOOTHING (X134). Double exponential
    * smoothing over each event type's daily value totals:
    * l_t = α·x_t + (1−α)(l+b), b_t = β(l_t−l) + (1−β)b, initialized
    * l₀ = x₀, b₀ = 0, plus the 7-day-ahead forecast l + 7b — the
    * trend-aware successor to q68's EWMA (which cannot see slope).
    * α = 1/4 and β = 1/8 are EXACT binary fractions, and both engines
    * fold the same day-ordered list left-to-right, so every
    * intermediate double is bit-identical (§7.4).
    *
    * Scale: one partial+final daily aggregate, then one ordered fold
    * per key over a bounded day array — the recursion lives in a
    * size-|days| in-row HOF, never a per-row window chain; state is
    * (level, trend) per key.
    */
  def q224(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .filter(col("event_type").isNotNull)
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(round(sum(col("value").cast("decimal(38,10)")), 4)
        .cast("double").as("x"))
    daily.groupBy(col("event_type"))
      .agg(array_sort(collect_list(struct(col("day"), col("x"))))
        .as("series"))
      .withColumn("xs", expr("transform(series, e -> e.x)"))
      .withColumn("st", expr(
        """aggregate(slice(xs, 2, size(xs) - 1),
          |  named_struct('l', xs[0], 'b', CAST(0.0 AS DOUBLE)),
          |  (acc, x) -> named_struct(
          |    'l', 0.25D * x + 0.75D * (acc.l + acc.b),
          |    'b', 0.125D * ((0.25D * x + 0.75D * (acc.l + acc.b)) - acc.l)
          |       + 0.875D * acc.b))""".stripMargin))
      .select(col("event_type"), size(col("xs")).as("n_days"),
        round(col("st.l"), 4).as("level"),
        round(col("st.b"), 4).as("trend"),
        round(col("st.l") + lit(7.0) * col("st.b"), 4).as("forecast7"))
      .orderBy(col("event_type"))
  }

  /** q225 — BENFORD FIRST-DIGIT AUDIT (X135). Leading significant
    * digit distribution of order totals vs Benford's law
    * P(d) = log₁₀(1 + 1/d) — the classic fabricated-data screen.
    * The digit is taken from the INTEGER cents string (round(p·100)),
    * never from float formatting or log₁₀ bucketing, both of which
    * differ across engines at power-of-ten boundaries.
    *
    * Scale: one 9-bucket aggregate; shares via a 1-row broadcast
    * total.
    */
  def q225(s: SparkSession, d: String): DataFrame = {
    val digits = orders(s, d)
      .select(substring(
        round(col("o_totalprice") * 100).cast("long").cast("string"),
        1, 1).as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val total = digits.agg(sum(col("n")).cast("double").as("tot"))
    digits.crossJoin(broadcast(total))
      .select(col("digit"), col("n"),
        round(col("n") / col("tot"), 4).as("share"),
        round(log(10.0, lit(1.0) + lit(1.0) /
          col("digit").cast("double")), 4).as("benford"),
        round(round(col("n") / col("tot"), 4) - round(log(10.0,
          lit(1.0) + lit(1.0) / col("digit").cast("double")), 4), 4)
          .as("dev"))
      .orderBy(col("digit"))
  }

  /** q226 — RECIPROCAL-RANK FUSION (X136). Hybrid retrieval: fuse the
    * lexical arm (q131's exact BM25 top-20) with the vector arm
    * (cosine top-20 to probe embedding 0, the q29 anchor) by
    * RRF(d) = Σ_arms 1/(60 + rank_arm(d)) — the standard
    * hybrid-search combiner (Cormack 2009; every 2024-era RAG stack).
    * Ranks are positions in each arm's (rounded score desc, id)
    * total order, so fusion inputs are deterministic cross-engine;
    * the two reciprocals sum commutatively (two-double add), so no
    * decimal detour is needed.
    *
    * Scale: both arms are already top-k lists (TakeOrdered results);
    * fusion is a union of 2k tiny rows + one aggregate — cost lives
    * in the arms, and each arm is independently gate-checked (q131,
    * q29).
    */
  def q226(s: SparkSession, d: String): DataFrame = {
    val lex = Queries10.bm25Top20Cached(s, d)
      .withColumn("r", row_number().over(
        Window.orderBy(col("bm25").desc, col("doc_id"))))
      .select(col("doc_id"), col("r"))
    val vec = Queries.q29(s, d)
      .withColumn("r", row_number().over(
        Window.orderBy(col("cosine").desc, col("vec_id"))))
      .select(col("vec_id").as("doc_id"), col("r"))
    lex.unionAll(vec)
      .groupBy(col("doc_id"))
      .agg(round(sum(lit(1.0) / (lit(60.0) + col("r"))), 6).as("rrf"),
        count(lit(1)).as("n_arms"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(10)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q224_holt_trend" -> (q224 _),
    "q225_benford_audit" -> (q225 _),
    "q226_rrf_fusion" -> (q226 _))
}

/** DuckDB mirrors of Queries41. q224's fold runs as a recursive CTE
  * (see the inline note — DuckDB's struct-accumulator list_reduce is
  * unreliable). q226 splices the verbatim q131 BM25 CTE chain for its
  * lexical arm — one formula, two consumers.
  */
object Oracle41 {

  val sql: Map[String, String] = Map(
    // NOT list_reduce: DuckDB's struct-accumulator list_reduce
    // mis-binds acc fields when one output field references another
    // field the same lambda computes (measured: a 3-step fold where
    // 'b' reads acc.l returns acc.l's NEW value in later steps). The
    // recursive CTE evaluates plain SQL per step — same left fold,
    // same op order as the Spark aggregate() HOF.
    "q224_holt_trend" ->
      """WITH RECURSIVE daily AS (
        |  SELECT event_type,
        |    (epoch_ns(ts) // 1000) // 86400000000 AS day,
        |    CAST(round(sum(CAST("value" AS DECIMAL(38,10))), 4) AS DOUBLE) AS x
        |  FROM events WHERE event_type IS NOT NULL
        |  GROUP BY 1, 2),
        |idx AS (SELECT event_type, x,
        |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS i
        |  FROM daily),
        |nn AS (SELECT event_type, max(i) AS n FROM idx GROUP BY 1),
        |rec AS (
        |  SELECT event_type, CAST(1 AS BIGINT) AS i, x AS l,
        |    CAST(0.0 AS DOUBLE) AS b
        |  FROM idx WHERE i = 1
        |  UNION ALL
        |  SELECT r.event_type, r.i + 1,
        |    0.25 * ix.x + 0.75 * (r.l + r.b),
        |    0.125 * ((0.25 * ix.x + 0.75 * (r.l + r.b)) - r.l) + 0.875 * r.b
        |  FROM rec r JOIN idx ix
        |    ON ix.event_type = r.event_type AND ix.i = r.i + 1)
        |SELECT r.event_type, CAST(nn.n AS INTEGER) AS n_days,
        |  round(r.l, 4) AS level, round(r.b, 4) AS trend,
        |  round(r.l + 7.0 * r.b, 4) AS forecast7
        |FROM rec r JOIN nn USING (event_type) WHERE r.i = nn.n
        |ORDER BY event_type""".stripMargin,

    "q225_benford_audit" ->
      """WITH d AS (
        |  SELECT substring(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
        |    AS VARCHAR), 1, 1) AS digit, count(*) AS n
        |  FROM orders GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS DOUBLE) AS tot FROM d)
        |SELECT digit, n, round(n / tot, 4) AS share,
        |  round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 4) AS benford,
        |  round(round(n / tot, 4) - round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 4), 4) AS dev
        |FROM d, t ORDER BY digit""".stripMargin,

    "q226_rrf_fusion" ->
      """WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |    FROM documents),
        |lens AS (SELECT doc_id, count(*) AS len FROM tk GROUP BY doc_id),
        |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
        |    avg(len) AS avg_len FROM lens),
        |dfc AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tk
        |    GROUP BY tok),
        |q AS (SELECT tok, df FROM dfc ORDER BY df DESC, tok LIMIT 2),
        |tf AS (SELECT t.doc_id, t.tok, count(*) AS tf
        |  FROM tk t JOIN q USING (tok) GROUP BY t.doc_id, t.tok),
        |sc AS (SELECT tf.doc_id,
        |    ln((s.n_docs - q.df + 0.5) / (q.df + 0.5) + 1.0) *
        |      (tf.tf * 2.2) /
        |      (tf.tf + 1.2 * (1 - 0.75 + 0.75 * l.len / s.avg_len))
        |      AS term_score
        |  FROM tf JOIN q USING (tok) JOIN lens l USING (doc_id), stats s),
        |bm AS (SELECT doc_id, round(SUM(term_score), 4) AS bm25
        |  FROM sc GROUP BY doc_id
        |  ORDER BY bm25 DESC, doc_id LIMIT 20),
        |lex AS (SELECT doc_id,
        |    row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r FROM bm),
        |p AS (SELECT embedding AS pe FROM embeddings WHERE vec_id = 0),
        |cos AS (SELECT e.vec_id AS doc_id,
        |    round(
        |      list_sum(list_transform(range(1, len(e.embedding)+1),
        |        i -> CAST(e.embedding[i] AS DOUBLE) * CAST(p.pe[i] AS DOUBLE)))
        |      / (sqrt(list_sum(list_transform(e.embedding,
        |           x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
        |       * sqrt(list_sum(list_transform(p.pe,
        |           x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))), 4) AS cosine
        |  FROM embeddings e, p WHERE e.vec_id <> 0
        |  ORDER BY cosine DESC, doc_id LIMIT 10),
        |vec AS (SELECT doc_id,
        |    row_number() OVER (ORDER BY cosine DESC, doc_id) AS r FROM cos),
        |u AS (SELECT * FROM lex UNION ALL SELECT * FROM vec)
        |SELECT doc_id, round(sum(1.0 / (60.0 + r)), 6) AS rrf,
        |  count(*) AS n_arms
        |FROM u GROUP BY doc_id
        |ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin)
}
