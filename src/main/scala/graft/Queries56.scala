package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Round-8 batch 20: duplication-aware sampling, retrieval exposure
  * fairness, and sequence-model evaluation (SURVEY §2.8 X174-X176).
  */
object Queries56 {
  import Tables._

  /** q264 — DUPLICATION-WEIGHTED SAMPLING (X174). Downsample the
    * corpus so each DUPLICATE CLUSTER contributes one expected copy:
    * doc kept iff its 60-bit md5 draw < 2⁶⁰ div cluster-size — the
    * standard curation move after dedup clustering (train on content,
    * not on how often it was crawled; cf. the "one copy per cluster"
    * dedup recipes). Clusters come from the SAME materialized LSH CC
    * stage q62/q77 ride; non-clustered docs are singletons (rate 1).
    * The keep rule is pure integer arithmetic — threshold by integer
    * division, no float probability anywhere.
    *
    * Scale: one broadcast-size cluster table joined back to docs;
    * the report aggregates by cluster size (bounded buckets).
    */
  def q264(s: SparkSession, d: String): DataFrame = {
    val sizes = LshStages.clusters(s, d)
      .groupBy(col("cluster_id")).agg(count(lit(1)).as("k"))
    val docs = documents(s, d).select(col("doc_id"))
      .join(LshStages.clusters(s, d), Seq("doc_id"), "left")
      .join(broadcast(sizes), Seq("cluster_id"), "left")
      .withColumn("k", coalesce(col("k"), lit(1L)))
      .withColumn("h", Text.md5Long(col("doc_id").cast("string")))
      .withColumn("kept", col("h") < expr("1152921504606846976L div k"))
    docs.groupBy(col("k").as("cluster_size"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        round(lit(1.0) / col("k"), 4).as("target_rate"))
      .withColumn("kept_rate",
        round(col("n_kept").cast("double") / col("n_docs"), 4))
      .orderBy(col("cluster_size"))
  }

  /** q265 — RETRIEVAL EXPOSURE FAIRNESS AUDIT (X175). Source-level
    * exposure share of the BM25 top-20 (position-weighted by the
    * NDCG discount 1/log₂(pos+1); Singh & Joachims 2018) against
    * each source's corpus share — disparity > 1 means the ranker
    * over-exposes that source relative to its footprint; the audit
    * every production ranker ships with. Exposure weights are
    * 6dp-rounded decimals summed exactly; shares are single float
    * divisions.
    *
    * Scale: the ranked list is the gate-checked q131 TakeOrdered
    * top-20; corpus shares are one documents aggregate; the audit is
    * ≤|sources|-row broadcast algebra.
    */
  def q265(s: SparkSession, d: String): DataFrame = {
    val ranked = Queries10.bm25Top20Cached(s, d)
      .withColumn("pos", row_number().over(
        Window.orderBy(col("bm25").desc, col("doc_id"))))
      .join(documents(s, d).select(col("doc_id"), col("source")),
        Seq("doc_id"))
      .withColumn("w",
        round(lit(1.0) / log(2.0, col("pos").cast("double") + 1.0), 6)
          .cast("decimal(18,6)"))
    val expBySrc = ranked.groupBy(col("source"))
      .agg(sum(col("w")).as("exp_w"), count(lit(1)).as("n_ranked"))
    val expTot = ranked.agg(sum(col("w")).as("exp_tot"))
    val corpus = documents(s, d).groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
    val corpusTot = documents(s, d).agg(count(lit(1)).as("n_total"))
    corpus.join(expBySrc, Seq("source"), "left")
      .crossJoin(broadcast(expTot))
      .crossJoin(broadcast(corpusTot))
      .select(col("source"), col("n_docs"),
        coalesce(col("n_ranked"), lit(0L)).as("n_ranked"),
        round(col("n_docs").cast("double") / col("n_total"), 4)
          .as("corpus_share"),
        round(coalesce(col("exp_w"), lit(0).cast("decimal(18,6)"))
          .cast("double") / col("exp_tot").cast("double"), 4)
          .as("exposure_share"),
        round(coalesce(col("exp_w"), lit(0).cast("decimal(18,6)"))
          .cast("double") / col("exp_tot").cast("double") /
          (col("n_docs").cast("double") / col("n_total")), 4)
          .as("disparity"))
      .orderBy(col("source"))
  }

  /** q266 — MARKOV NEXT-EVENT EVALUATION (X176). Held-out top-1
    * accuracy of the q119 transition matrix as a next-event
    * predictor: transitions whose source event hashes to folds 0-2
    * TRAIN the per-state argmax; fold 3 transitions are scored
    * against it, next to the marginal-mode baseline — the evaluation
    * harness q119's descriptive matrix was missing (an unevaluated
    * predictor is unfalsifiable, the q233 argument). Folds use the
    * q78 md5 convention on the source event id, so a user's
    * transitions split across folds — the unit under test is the
    * TRANSITION, declared.
    *
    * Scale: one user-ordered window pass builds transitions;
    * training counts aggregate to ≤|types|² rows; evaluation is one
    * broadcast join.
    */
  def q266(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val trans = events(s, d)
      .filter(col("event_type").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("cur"))
      .withColumn("nxt", lead(col("cur"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .withColumn("fold",
        pmod(Text.md5Long(col("event_id").cast("string")), lit(4L)))
      // three consumers (training counts, marginal baseline, held-out
      // scoring) — materialized so the user-ordered window pass + md5
      // fold runs once per execution, not three times (the q155
      // stage-table convention)
      .transform(Materialize.truncate)
    // ≤|types|²-row training matrix materialized once (round 16): the
    // marginal baseline is its nxt-rollup — sum(c) over cur — so the
    // old second full pass over the cached transition table is gone
    // and both model arms read the same tiny frame. Identical counts
    // (group-then-sum == direct count).
    val trainCnt = trans.filter(col("fold") <= 2)
      .groupBy(col("cur"), col("nxt")).agg(count(lit(1)).as("c"))
    val pred = trainCnt
      .withColumn("rk", row_number().over(Window.partitionBy(col("cur"))
        .orderBy(col("c").desc, col("nxt"))))
      .filter(col("rk") === 1)
      .select(col("cur"), col("nxt").as("pred_next"))
    val baseline = trainCnt
      .groupBy(col("nxt")).agg(sum(col("c")).as("c"))
      .orderBy(col("c").desc, col("nxt")).limit(1)
      .select(col("nxt").as("base_next"))
    trans.filter(col("fold") === 3)
      .join(broadcast(pred), Seq("cur"))
      .crossJoin(broadcast(baseline))
      .groupBy(col("cur"), col("pred_next"))
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("nxt") === col("pred_next"), 1L).otherwise(0L))
          .as("n_correct"),
        sum(when(col("nxt") === col("base_next"), 1L).otherwise(0L))
          .as("n_base_correct"))
      .select(col("cur"), col("pred_next"), col("n_test"),
        round(col("n_correct").cast("double") / col("n_test"), 4)
          .as("top1_acc"),
        round(col("n_base_correct").cast("double") / col("n_test"), 4)
          .as("baseline_acc"))
      .orderBy(col("cur"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q264_dup_weighted_sample" -> (q264 _),
    "q265_exposure_audit" -> (q265 _),
    "q266_markov_eval" -> (q266 _))
}

/** DuckDB mirrors of Queries56 — the recursive CC CTEs (q62's), the
  * q131 BM25 chain, the q78 md5 fold projection.
  */
object Oracle56 {

  val sql: Map[String, String] = Map(
    "q264_dup_weighted_sample" ->
      s"""WITH RECURSIVE ${OracleExt.lshPairCtes},
         |und AS (SELECT a_id AS src, b_id AS dst FROM pairs
         |        UNION ALL SELECT b_id, a_id FROM pairs),
         |nodes AS (SELECT DISTINCT src AS n FROM und),
         |walk(n, lbl) AS (
         |  SELECT n, n FROM nodes
         |  UNION
         |  SELECT und.dst, walk.lbl FROM walk JOIN und ON walk.n = und.src
         |  WHERE walk.lbl < und.dst
         |),
         |cl AS (SELECT n AS doc_id, min(lbl) AS cluster_id
         |  FROM walk GROUP BY n),
         |sz AS (SELECT cluster_id, count(*) AS k FROM cl GROUP BY 1),
         |dk AS (SELECT d.doc_id,
         |    coalesce(sz.k, 1) AS k,
         |    CAST('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 15)
         |      AS BIGINT) AS h
         |  FROM documents d
         |  LEFT JOIN cl ON cl.doc_id = d.doc_id
         |  LEFT JOIN sz ON sz.cluster_id = cl.cluster_id)
         |SELECT k AS cluster_size, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN h < 1152921504606846976 // k
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  round(1.0 / k, 4) AS target_rate,
         |  round(CAST(sum(CASE WHEN h < 1152921504606846976 // k
         |    THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) AS kept_rate
         |FROM dk GROUP BY k ORDER BY cluster_size""".stripMargin,

    "q265_exposure_audit" ->
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
        |ranked AS (SELECT b.doc_id, d.source,
        |    CAST(round(1.0 / log2(CAST(row_number() OVER
        |      (ORDER BY b.bm25 DESC, b.doc_id) AS DOUBLE) + 1.0), 6)
        |      AS DECIMAL(18,6)) AS w
        |  FROM bm b JOIN documents d USING (doc_id)),
        |ebs AS (SELECT source, sum(w) AS exp_w, count(*) AS n_ranked
        |  FROM ranked GROUP BY source),
        |et AS (SELECT sum(w) AS exp_tot FROM ranked),
        |cs AS (SELECT source, count(*) AS n_docs FROM documents
        |  GROUP BY source),
        |ct AS (SELECT count(*) AS n_total FROM documents)
        |SELECT cs.source, cs.n_docs,
        |  coalesce(ebs.n_ranked, 0) AS n_ranked,
        |  round(CAST(cs.n_docs AS DOUBLE) / ct.n_total, 4)
        |    AS corpus_share,
        |  round(CAST(coalesce(ebs.exp_w, 0) AS DOUBLE) /
        |    CAST(et.exp_tot AS DOUBLE), 4) AS exposure_share,
        |  round(CAST(coalesce(ebs.exp_w, 0) AS DOUBLE) /
        |    CAST(et.exp_tot AS DOUBLE) /
        |    (CAST(cs.n_docs AS DOUBLE) / ct.n_total), 4) AS disparity
        |FROM cs LEFT JOIN ebs USING (source)
        |CROSS JOIN et CROSS JOIN ct
        |ORDER BY cs.source""".stripMargin,

    "q266_markov_eval" ->
      """WITH seq AS (
        |  SELECT user_id, event_id, event_type AS cur,
        |    lead(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS nxt
        |  FROM events WHERE event_type IS NOT NULL),
        |trans AS (SELECT cur, nxt, event_id,
        |    CAST('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) % 4 AS fold
        |  FROM seq WHERE nxt IS NOT NULL),
        |tc AS (SELECT cur, nxt, count(*) AS c FROM trans
        |  WHERE fold <= 2 GROUP BY cur, nxt),
        |pred AS (SELECT cur, nxt AS pred_next FROM tc
        |  QUALIFY row_number() OVER (PARTITION BY cur
        |    ORDER BY c DESC, nxt) = 1),
        |base AS (SELECT nxt AS base_next FROM trans WHERE fold <= 2
        |  GROUP BY nxt ORDER BY count(*) DESC, nxt LIMIT 1)
        |SELECT t.cur, p.pred_next, count(*) AS n_test,
        |  round(CAST(sum(CASE WHEN t.nxt = p.pred_next THEN 1 ELSE 0 END)
        |    AS DOUBLE) / count(*), 4) AS top1_acc,
        |  round(CAST(sum(CASE WHEN t.nxt = b.base_next THEN 1 ELSE 0 END)
        |    AS DOUBLE) / count(*), 4) AS baseline_acc
        |FROM trans t JOIN pred p USING (cur) CROSS JOIN base b
        |WHERE t.fold = 3
        |GROUP BY t.cur, p.pred_next ORDER BY t.cur""".stripMargin)
}
