package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-5 batch 5: graph ranking, retrieval scoring, and corpus
  * geometry.
  *
  *  - q130 fixed-iteration PageRank over the near-dup candidate graph
  *    (which documents anchor dup clusters) — iterative graph compute
  *    as edge-keyed joins, the Pregel-without-Pregel shape.
  *  - q131 BM25 relevance: score every doc against a deterministic
  *    2-term query (the corpus' two heaviest tokens) — the retrieval
  *    scoring kernel behind search-based curation.
  *  - q132 chunk-duplication rate: which 50-token chunks recur across
  *    docs, and what fraction of each doc is recycled — the
  *    sub-document dedup audit (q106's chunks composed with X1's
  *    fingerprint dedup).
  *  - q133 per-dimension embedding statistics: mean/std/range for each
  *    vector dimension — the whitening/normalization report run before
  *    any ANN index build.
  *  - q134 rolling 7-day active users: sliding count-distinct per day
  *    via the day×day range self-expansion (X44).
  *  - q135 token posting lists: capped inverted-index materialization
  *    with per-token df and positions (X45).
  *
  * Every query is DuckDB-oracled (Oracle10) under the §7.4
  * conventions.
  */
object Queries10 {
  import Tables._

  private val Damping = 0.85

  /** q130 — PAGERANK (parameterized iterations, d = 0.85; the declared
    * query keeps 2) on the undirected LSH candidate graph (LshStages,
    * shared with q46/q62/q112). Every float accumulation (neighbor
    * contributions) goes through DECIMAL(38,18) so partition order
    * cannot flip a digit; the node count rides a 1-row broadcast,
    * never a driver collect.
    *
    * Scale: each iteration is one edge-keyed equi-join + one aggregate
    * on the destination key — the textbook distributed PageRank step.
    * Beyond 2 rounds, `pr` is lazily localCheckpoint-ed between
    * iterations (the StarCC convention, Dedup.connectedComponentsStar)
    * so round N+1's plan starts from round N's ranks as a LogicalRDD
    * scan instead of a nested join tree — bounding plan depth and
    * replay-on-failure for the 20-iteration billion-edge run;
    * DiagnosticsSpec asserts the truncation (3-round plan carries no
    * join). At ≤2 rounds the chain is a single-consumer LINE — pr_1
    * feeds pr_2 exactly once, nothing recomputes — and the fused
    * static plan measured 2× faster than any checkpoint flavor
    * (1.1 s vs 2.0 s at sf0.1), so the declared query keeps it.
    */
  def pagerank(s: SparkSession, d: String, iterations: Int): DataFrame = {
    val dec = DecimalType(38, 18)
    val pairs = LshStages.candidatePairs(s, d)
    // undirected: both orientations. The loop-invariant subtrees
    // (edge+degree join, node universe) repeat identically across
    // rounds; within the one fused action Spark's ReusedExchange
    // covers them, so no persist is needed (an explicit persist was
    // measured a wash here — and a billion-edge run would persist
    // them OUTSIDE this function for reuse across queries, as
    // LshStages does for the pair stage).
    val edges = pairs.select(col("a_id").as("u"), col("b_id").as("v"))
      .unionByName(pairs.select(col("b_id").as("u"), col("a_id").as("v")))
    val deg = edges.groupBy(col("u")).agg(count(lit(1)).as("deg"))
    val edgeDeg = edges.join(deg, Seq("u"))
    val nodes = edges.select(col("u").as("doc_id")).distinct()
    val nRow = nodes.agg(count(lit(1)).cast("double").as("n"))
    var pr = nodes.crossJoin(broadcast(nRow))
      .select(col("doc_id"), (lit(1.0) / col("n")).as("pr"))
    for (i <- 1 to iterations) {
      val contrib = edgeDeg
        .join(pr.select(col("doc_id").as("u"), col("pr")), Seq("u"))
        .groupBy(col("v").as("doc_id"))
        .agg(sum((col("pr") / col("deg")).cast(dec)).cast("double")
          .as("in_pr"))
      pr = nodes.join(contrib, Seq("doc_id"), "left")
        .crossJoin(broadcast(nRow))
        .select(col("doc_id"),
          (lit(1.0 - Damping) / col("n") +
            lit(Damping) * coalesce(col("in_pr"), lit(0.0))).as("pr"))
      // Per-round LAZY checkpoint (truncates lineage with no extra
      // job; the chain materializes inside the final action, each
      // round cached as computed) — engaged beyond 2 rounds, where
      // plan depth and replay-on-failure actually grow. At ≤2 rounds
      // the chain is a SINGLE-CONSUMER line (pr_1 feeds pr_2 exactly
      // once — nothing is recomputed) and the fused static plan is
      // measured 2× faster than any checkpoint flavor (1.1 s vs
      // 2.0 s at sf0.1: the RDD boundary splits the one fused job),
      // so the declared 2-iteration query keeps it. DiagnosticsSpec
      // asserts the truncation at 3 rounds.
      if (iterations > 2) pr = pr.localCheckpoint(eager = false)
    }
    pr.select(col("doc_id"), round(col("pr"), 6).as("pagerank"))
      .orderBy(col("doc_id"))
  }

  def q130(s: SparkSession, d: String): DataFrame = pagerank(s, d, 2)

  private val Bm25K1 = 1.2
  private val Bm25B = 0.75

  /** q131 — BM25 SCORING. Every document scored against the 2-term
    * query formed by the corpus' two most frequent tokens (df desc,
    * token tiebreak — deterministic, so both engines derive the SAME
    * query). Standard Robertson idf = ln((N − df + 0.5)/(df + 0.5) + 1)
    * and tf saturation with k1 = 1.2, b = 0.75. Top-20 by rounded
    * score (4 dp), doc_id tiebreak.
    *
    * Scale: tf is a per-doc narrow aggregate; df/avglen/N are 2-row /
    * 1-row broadcasts; the score is per-row math; top-20 is
    * TakeOrdered. Exactly two summands per doc, so IEEE addition
    * commutativity makes the double sum order-free.
    */
  /** The q131 result, materialized once per (session, sf dir) for
    * its CONSUMERS (q226 RRF, q254 NDCG, q265 exposure) — each was
    * re-running the full BM25 chain (~0.9 s) per invocation.
    * localCheckpoint, NOT persist: a persisted entry registers q131's
    * canonicalized plan in the CacheManager, and Spark then
    * substitutes the cache into FRESH q131 invocations too (measured:
    * the PlanSpec TakeOrdered assertion saw an InMemoryTableScan) —
    * checkpoint truncation gives consumers a 20-row LogicalRDD while
    * q131's own plan stays untouched end-to-end.
    */
  private val bm25Cache = new SessionCache
  private[graft] def bm25Top20Cached(s: SparkSession, d: String): DataFrame =
    bm25Cache.getOrCompute(s, d)(Materialize.truncate(q131(s, d)))

  def q131(s: SparkSession, d: String): DataFrame = {
    val toks = documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val lens = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("len"))
    val stats = lens.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(col("len")).as("avg_len"))
    val df = toks.select(col("doc_id"), col("tok")).distinct()
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val query = df.orderBy(col("df").desc, col("tok")).limit(2)
      .select(col("tok"), col("df"))
    val tf = toks.join(broadcast(query.select(col("tok"))), Seq("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    tf.join(broadcast(query), Seq("tok"))
      .join(lens, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        (log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
          (col("tf") * (Bm25K1 + 1)) /
          (col("tf") + lit(Bm25K1) *
            (lit(1 - Bm25B) + lit(Bm25B) * col("len") / col("avg_len"))))
          .as("term_score"))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("term_score")), 4).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(20)
  }

  private val ChunkTokens = 50

  /** q132 — CHUNK-DUPLICATION RATE. Fixed 50-token non-overlapping
    * chunks, fingerprinted by md5; a chunk recurring in >1 document is
    * "recycled". Per-doc report: chunks, recycled chunks, recycled
    * fraction — the sub-document dedup audit that doc-level dedup
    * (q15) cannot see.
    *
    * Scale: chunking is a narrow sequence/slice fan-out (q106's
    * shape); the df side aggregates 16-byte fingerprints, never chunk
    * text; the join back is fingerprint-keyed. At 100 TB the
    * fingerprint table is the only shuffled payload.
    */
  def q132(s: SparkSession, d: String): DataFrame = {
    val chunks = documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"),
        explode(transform(
          sequence(lit(0),
            floor((size(col("toks")) - 1) / ChunkTokens).cast("int")),
          i => md5(array_join(
            slice(col("toks"), i * ChunkTokens + 1, lit(ChunkTokens)), " "))))
          .as("fp"))
    val docsPerFp = chunks.select(col("doc_id"), col("fp")).distinct()
      .groupBy(col("fp")).agg(count(lit(1)).as("n_docs"))
    chunks.join(docsPerFp, Seq("fp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("n_docs") > 1, 1L).otherwise(0L)).as("n_recycled"))
      .select(col("doc_id"), col("n_chunks"), col("n_recycled"),
        round(col("n_recycled").cast("double") / col("n_chunks"), 4)
          .as("recycled_frac"))
      .orderBy(col("doc_id"))
  }

  /** q133 — PER-DIMENSION EMBEDDING STATISTICS. Mean, population std,
    * min, max for every vector dimension — the whitening report that
    * decides normalization before an ANN index build (and the input
    * q50's PCA assumes centered). Moments via DECIMAL(38,18) partial
    * sums (§7.4).
    *
    * Scale: posexplode is a narrow ×dim fan-out of a 2-column scan;
    * one partial+final aggregate on the dimension key (bounded
    * cardinality = vector width). Nothing per-row survives the
    * aggregate.
    */
  def q133(s: SparkSession, d: String): DataFrame = {
    val dec = DecimalType(38, 18)
    embeddings(s, d)
      .select(posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("dim"), col("x").cast("double").as("x"))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast(dec)).cast("double").as("sx"),
        sum((col("x") * col("x")).cast(dec)).cast("double").as("sxx"),
        // + 0.0 canonicalizes IEEE -0.0 (q66 convention: DuckDB round()
        // preserves the sign, Spark's does not — bit at sf0.1 dim 9)
        (round(min(col("x")), 4) + lit(0.0)).as("min_x"),
        (round(max(col("x")), 4) + lit(0.0)).as("max_x"))
      .select(col("dim"), col("n"),
        (round(col("sx") / col("n"), 4) + lit(0.0)).as("mean"),
        round(sqrt(col("sxx") / col("n") -
          (col("sx") / col("n")) * (col("sx") / col("n"))), 4).as("std"),
        col("min_x"), col("max_x"))
      .orderBy(col("dim"))
  }

  /** q134 — ROLLING ACTIVE USERS (DAU/WAU). Per day: distinct users
    * that day and over the trailing 7 days — the engagement series
    * every product dashboard leads with.
    *
    * Scale: the only per-event shuffle is the (day, user) distinct;
    * the trailing window is a range join against the DAY dimension
    * (bounded: 365 rows/year — broadcast), then a distinct count per
    * day. Never a self-join of raw events.
    */
  def q134(s: SparkSession, d: String): DataFrame = {
    val au = events(s, d)
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
    val days = au.select(col("day")).distinct()
      .select(col("day").as("w_day"))
    val wau = broadcast(days)
      .join(au, col("day").between(date_sub(col("w_day"), 6), col("w_day")))
      .groupBy(col("w_day"))
      .agg(count_distinct(col("user_id")).as("wau"))
    au.groupBy(col("day")).agg(count(lit(1)).as("dau"))
      .join(wau, col("day") === col("w_day"))
      .select(col("day"), col("dau"), col("wau"))
      .orderBy(col("day"))
  }

  /** q135 — INVERTED-INDEX POSTING LISTS. The 10 rarest shared tokens
    * (df ≥ 2, ordered df asc then token) with their full sorted
    * posting lists — the index-build step behind q79/q110-style exact
    * membership joins, serialized as a comma-joined string so the
    * artifact is engine-neutral.
    *
    * Scale: postings are per-token aggregates of doc ids (never text);
    * in-row array_sort makes collect_list order-free; df-bounded
    * selection keeps list length tiny here (a production index shards
    * long lists by posting-block, same aggregate shape).
    */
  def q135(s: SparkSession, d: String): DataFrame = {
    val post = documents(s, d)
      .select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("tok"))
    post.groupBy(col("tok"))
      .agg(count(lit(1)).as("df"),
        array_join(array_sort(collect_list(col("doc_id"))), ",")
          .as("postings"))
      .filter(col("df") >= 2)
      .orderBy(col("df"), col("tok"))
      .limit(10)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q130_pagerank" -> (q130 _),
    "q131_bm25_score" -> (q131 _),
    "q132_chunk_dup_rate" -> (q132 _),
    "q133_embed_dim_stats" -> (q133 _),
    "q134_rolling_active_users" -> (q134 _),
    "q135_posting_lists" -> (q135 _))
}

/** DuckDB mirrors of Queries10 — same formulas, same decimal paths,
  * same rounding (§7.4).
  */
object Oracle10 {

  val sql: Map[String, String] = Map(
    "q130_pagerank" ->
      s"""WITH ${OracleExt.lshPairCtes},
         |e AS (SELECT a_id AS u, b_id AS v FROM pairs
         |  UNION ALL SELECT b_id AS u, a_id AS v FROM pairs),
         |nodes AS (SELECT DISTINCT u AS doc_id FROM e),
         |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
         |deg AS (SELECT u, count(*) AS deg FROM e GROUP BY u),
         |pr0 AS (SELECT doc_id, 1.0 / nn.n AS pr FROM nodes, nn),
         |c1 AS (SELECT e.v AS doc_id,
         |    CAST(SUM(CAST(p.pr / d.deg AS DECIMAL(38,18))) AS DOUBLE)
         |      AS in_pr
         |  FROM e JOIN deg d USING (u) JOIN pr0 p ON p.doc_id = e.u
         |  GROUP BY e.v),
         |pr1 AS (SELECT n.doc_id,
         |    0.15 / nn.n + 0.85 * COALESCE(c1.in_pr, 0.0) AS pr
         |  FROM nodes n LEFT JOIN c1 USING (doc_id), nn),
         |c2 AS (SELECT e.v AS doc_id,
         |    CAST(SUM(CAST(p.pr / d.deg AS DECIMAL(38,18))) AS DOUBLE)
         |      AS in_pr
         |  FROM e JOIN deg d USING (u) JOIN pr1 p ON p.doc_id = e.u
         |  GROUP BY e.v),
         |pr2 AS (SELECT n.doc_id,
         |    0.15 / nn.n + 0.85 * COALESCE(c2.in_pr, 0.0) AS pr
         |  FROM nodes n LEFT JOIN c2 USING (doc_id), nn)
         |SELECT doc_id, round(pr, 6) AS pagerank FROM pr2
         |ORDER BY doc_id""".stripMargin,

    "q131_bm25_score" ->
      """WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |    FROM documents),
        |lens AS (SELECT doc_id, count(*) AS len FROM tk GROUP BY doc_id),
        |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
        |    avg(len) AS avg_len FROM lens),
        |df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tk
        |    GROUP BY tok),
        |q AS (SELECT tok, df FROM df ORDER BY df DESC, tok LIMIT 2),
        |tf AS (SELECT t.doc_id, t.tok, count(*) AS tf
        |  FROM tk t JOIN q USING (tok) GROUP BY t.doc_id, t.tok),
        |sc AS (SELECT tf.doc_id,
        |    ln((s.n_docs - q.df + 0.5) / (q.df + 0.5) + 1.0) *
        |      (tf.tf * 2.2) /
        |      (tf.tf + 1.2 * (1 - 0.75 + 0.75 * l.len / s.avg_len))
        |      AS term_score
        |  FROM tf JOIN q USING (tok) JOIN lens l USING (doc_id), stats s)
        |SELECT doc_id, round(SUM(term_score), 4) AS bm25
        |FROM sc GROUP BY doc_id
        |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin,

    "q132_chunk_dup_rate" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |    FROM documents),
        |ch AS (SELECT doc_id,
        |    md5(array_to_string(toks[(i*50)+1:(i*50)+50], ' ')) AS fp
        |  FROM t, LATERAL unnest(range(0,
        |    ((len(toks) - 1) // 50) + 1)) AS r(i)),
        |dpf AS (SELECT fp, count(DISTINCT doc_id) AS n_docs FROM ch
        |    GROUP BY fp)
        |SELECT c.doc_id, count(*) AS n_chunks,
        |  CAST(SUM(CASE WHEN d.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_recycled,
        |  round(CAST(SUM(CASE WHEN d.n_docs > 1 THEN 1 ELSE 0 END)
        |    AS DOUBLE) / count(*), 4) AS recycled_frac
        |FROM ch c JOIN dpf d USING (fp)
        |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin,

    "q133_embed_dim_stats" ->
      """WITH x AS (SELECT r.i AS dim,
        |    CAST(embedding[CAST(r.i AS INT) + 1] AS DOUBLE) AS x
        |  FROM embeddings,
        |    LATERAL unnest(range(0, len(embedding))) AS r(i)),
        |m AS (SELECT dim, count(*) AS n,
        |    CAST(SUM(CAST(x AS DECIMAL(38,18))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(x * x AS DECIMAL(38,18))) AS DOUBLE) AS sxx,
        |    round(min(x), 4) + 0.0 AS min_x,
        |    round(max(x), 4) + 0.0 AS max_x
        |  FROM x GROUP BY dim)
        |SELECT dim, n, round(sx / n, 4) + 0.0 AS mean,
        |  round(sqrt(sxx / n - (sx / n) * (sx / n)), 4) AS std,
        |  min_x, max_x
        |FROM m ORDER BY dim""".stripMargin,

    "q134_rolling_active_users" ->
      """WITH au AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
        |    FROM events),
        |days AS (SELECT DISTINCT day AS w_day FROM au),
        |wau AS (SELECT d.w_day, count(DISTINCT a.user_id) AS wau
        |  FROM days d JOIN au a
        |    ON a.day BETWEEN d.w_day - 6 AND d.w_day
        |  GROUP BY d.w_day),
        |dau AS (SELECT day, count(*) AS dau FROM au GROUP BY day)
        |SELECT dau.day, dau.dau, wau.wau
        |FROM dau JOIN wau ON dau.day = wau.w_day
        |ORDER BY dau.day""".stripMargin,

    "q135_posting_lists" ->
      """WITH post AS (SELECT DISTINCT doc_id,
        |    unnest(list_distinct(string_split(text, ' '))) AS tok
        |  FROM documents),
        |l AS (SELECT tok, count(*) AS df,
        |    array_to_string(list_sort(list(doc_id)), ',') AS postings
        |  FROM post GROUP BY tok)
        |SELECT tok, df, postings FROM l WHERE df >= 2
        |ORDER BY df, tok LIMIT 10""".stripMargin)
}
