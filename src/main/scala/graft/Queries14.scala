package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-6 batch 3: corpus statistics the curation loop runs between
  * ingest and training — all DuckDB-oracled (Oracle14).
  *
  *  - q147 unigram-perplexity quality filter (the CCNet move): score
  *    every doc by mean negative log-likelihood under the corpus' own
  *    unigram model; high-NLL docs are gibberish/OOV-dense candidates
  *    for drop. Complements q33 (surface heuristics) and q66 (char
  *    entropy) with a MODEL-based signal.
  *  - q148 PMI collocation mining: pointwise mutual information over
  *    document co-occurrence for the corpus' head tokens — the
  *    phrase/topic probe run on a new crawl before mixing it in.
  *  - q149 temperature-resampling weights: per-source sampling weights
  *    p_i^0.5 / Σ p_j^0.5 — the standard temperature-based flattening
  *    of a multi-source training mixture (upweights small sources,
  *    T=2 ⇔ exponent 0.5), with effective per-epoch document counts.
  */
object Queries14 {
  import Tables._

  /** q147 — UNIGRAM-PERPLEXITY FILTER. p(tok) = corpus count / total
    * tokens; per doc nll = mean −ln p(tok); drop if nll exceeds the
    * fixed 7.0 gate (unrounded compare, same value both engines).
    *
    * Scale: vocab = one (token) aggregate; scoring = one shuffle
    * keyed on token (join toks→vocab) + one per-doc aggregate — the
    * TF-IDF cost envelope (q70), nothing quadratic. Totals ride 1-row
    * broadcasts. Per-doc Σ ln p goes through DECIMAL(38,18) (the q130
    * convention) so partition order cannot flip a digit.
    */
  def q147(s: SparkSession, d: String): DataFrame = {
    val dec = DecimalType(38, 18)
    // tokens from the shared TokenStages arm (VERDICT r10 #2): both
    // references (vocab census + scoring join) explode cached arrays
    // instead of each re-tokenizing the corpus from the raw scan
    val toks = TokenStages.docToks(s, d)
      .select(col("doc_id"), explode(col("toks")).as("tok"))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val total = vocab.agg(sum(col("c")).as("total"))
    toks.join(vocab, Seq("tok"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"),
        (-log(col("c").cast("double") / col("total"))).as("nl"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        (sum(col("nl").cast(dec)).cast("double") / count(lit(1)))
          .as("nll0"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("nll0"), 4).as("mean_nll"),
        (col("nll0") > 7.0).as("drop"))
      .orderBy(col("doc_id"))
  }

  /** q148 — PMI COLLOCATIONS. Head vocabulary = top-30 tokens by doc
    * frequency (df desc, token tiebreak — deterministic). For head
    * pairs co-occurring in ≥ 5 docs: pmi = ln(n_ab·N / (n_a·n_b))
    * over document counts; top-20 by pmi.
    *
    * Scale: postings are filtered to the BROADCAST 30-token head set
    * before the self-join, so per-doc pair fan-out is ≤ C(30,2) —
    * bounded by the head size, not the vocabulary; the join is
    * doc-keyed, never all-pairs. PMI itself is scalar math on
    * integers (no float aggregation at all). Top-20 is TakeOrdered.
    */
  def q148(s: SparkSession, d: String): DataFrame = {
    // per-doc distinct postings from the shared arm — in-row
    // array_distinct over cached arrays, zero extra shuffles
    val post = TokenStages.docToks(s, d)
      .select(col("doc_id"), explode(array_distinct(col("toks")))
        .as("tok"))
    // df census feeds ONLY the head selection now that hp carries df
    // through the broadcast join — the r10 truncate (then: three full
    // tokenize passes) is obsolete with post reading the shared arm;
    // the head postings stay materialized so the SELF-join's two
    // sides read blocks instead of re-running the explode+filter
    val head = post.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("tok")).limit(30)
    val hp = post.join(broadcast(head), Seq("tok"))
      .transform(Materialize.truncate)
    val nDocs = documents(s, d).agg(count(lit(1)).as("n_docs"))
    hp.select(col("doc_id"), col("tok").as("a_tok"), col("df").as("a_df"))
      .join(hp.select(col("doc_id"), col("tok").as("b_tok"),
        col("df").as("b_df")), Seq("doc_id"))
      .filter(col("a_tok") < col("b_tok"))
      .groupBy(col("a_tok"), col("b_tok"))
      .agg(count(lit(1)).as("n_ab"),
        max(col("a_df")).as("n_a"), max(col("b_df")).as("n_b"))
      .filter(col("n_ab") >= 5)
      .crossJoin(broadcast(nDocs))
      .select(col("a_tok"), col("b_tok"), col("n_ab"),
        round(log((col("n_ab") * col("n_docs")).cast("double") /
          (col("n_a") * col("n_b"))), 4).as("pmi"))
      .orderBy(col("pmi").desc, col("a_tok"), col("b_tok"))
      .limit(20)
  }

  /** q149 — TEMPERATURE-RESAMPLING WEIGHTS (T=2 ⇔ exponent 1/2,
    * computed as sqrt — IEEE-exact on BOTH engines, unlike pow).
    * weight_i = √p_i / Σ √p_j; eff_docs = weight · N is what an epoch
    * of the flattened mixture draws from source i.
    *
    * Scale: one partial+final aggregate to |sources| rows, then
    * arithmetic against two 1-row broadcasts; the Σ √p normalizer
    * goes through DECIMAL(38,18) so the (tiny but float) sum is
    * partition-order-free.
    */
  def q149(s: SparkSession, d: String): DataFrame = {
    val dec = DecimalType(38, 18)
    val bySrc = documents(s, d)
      .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val tot = bySrc.agg(sum(col("n_docs")).as("n_total"))
    val withP = bySrc.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"),
        sqrt(col("n_docs").cast("double") / col("n_total")).as("sp"),
        col("n_total"))
    val norm = withP.agg(sum(col("sp").cast(dec)).cast("double").as("z"))
    withP.crossJoin(broadcast(norm))
      .select(col("source"), col("n_docs"),
        round(col("sp") / col("z"), 4).as("weight"),
        round(col("sp") / col("z") * col("n_total"), 4).as("eff_docs"))
      // asc_nulls_last: DuckDB's default NULL ordering — a NULL source
      // (schema permits it) must not land in a different position
      .orderBy(col("source").asc_nulls_last)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q147_perplexity_filter" -> (q147 _),
    "q148_pmi_collocations" -> (q148 _),
    "q149_mixture_temperature" -> (q149 _))
}

object Oracle14 {

  val sql: Map[String, String] = Map(
    "q147_perplexity_filter" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |vocab AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM vocab),
        |nl AS (SELECT doc_id,
        |    -ln(CAST(c AS DOUBLE) / total) AS nl
        |  FROM toks JOIN vocab USING (tok), tot),
        |agg AS (SELECT doc_id, count(*) AS n_tokens,
        |    CAST(sum(CAST(nl AS DECIMAL(38,18))) AS DOUBLE) / count(*) AS nll0
        |  FROM nl GROUP BY doc_id)
        |SELECT doc_id, n_tokens, round(nll0, 4) AS mean_nll,
        |  nll0 > 7.0 AS drop
        |FROM agg ORDER BY doc_id""".stripMargin,

    "q148_pmi_collocations" ->
      """WITH post AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
        |  FROM documents),
        |dfq AS (SELECT tok, count(*) AS df FROM post GROUP BY tok),
        |head AS (SELECT tok, df FROM dfq ORDER BY df DESC, tok LIMIT 30),
        |hp AS (SELECT doc_id, tok, df FROM post JOIN head USING (tok)),
        |nd AS (SELECT count(*) AS n_docs FROM documents),
        |pairs AS (
        |  SELECT a.tok AS a_tok, b.tok AS b_tok, count(*) AS n_ab,
        |    max(a.df) AS n_a, max(b.df) AS n_b
        |  FROM hp a JOIN hp b ON a.doc_id = b.doc_id AND a.tok < b.tok
        |  GROUP BY a.tok, b.tok)
        |SELECT a_tok, b_tok, n_ab,
        |  round(ln(CAST(n_ab * n_docs AS DOUBLE) / (n_a * n_b)), 4) AS pmi
        |FROM pairs, nd WHERE n_ab >= 5
        |ORDER BY pmi DESC, a_tok, b_tok LIMIT 20""".stripMargin,

    "q149_mixture_temperature" ->
      """WITH s AS (SELECT source, count(*) AS n_docs FROM documents
        |  GROUP BY source),
        |t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total FROM s),
        |p AS (SELECT source, n_docs,
        |    sqrt(CAST(n_docs AS DOUBLE) / n_total) AS sp, n_total
        |  FROM s, t),
        |z AS (SELECT CAST(sum(CAST(sp AS DECIMAL(38,18))) AS DOUBLE) AS z
        |  FROM p)
        |SELECT source, n_docs, round(sp / z, 4) AS weight,
        |  round(sp / z * n_total, 4) AS eff_docs
        |FROM p, z ORDER BY source""".stripMargin)
}
