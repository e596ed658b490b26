package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.{Text, TextExpressions}

/** Round-2 training-data-pipeline extensions (SURVEY.md §2.8 widened):
  * the curation stages a 100 TB LLM-data pipeline runs after near-dup
  * detection — edit-distance verification of candidate pairs, cluster
  * representative selection, deterministic train/val/test splitting,
  * benchmark-contamination screening, and domain-mixture reweighting.
  *
  * Determinism conventions as everywhere (SURVEY.md §7.4): ORDER BY
  * unique keys, 4-dp rounding of derived floats, md5-derived hashes
  * for every cross-engine random-like decision (never RNG).
  */
object Queries3 {
  import Tables._

  /** Edit-distance near-dup pairs, LSH-recalled: same-language pairs
    * within 10 chars of each other's length whose Levenshtein distance
    * is ≤ 10 (planted near-dups sit at distance ~4), with candidates
    * proposed by the SAME minhash-LSH banding stage as q46/q62/q81
    * (LshStages.candidatePairs — one equi-join shuffle on
    * (band, bucket), whose cardinality GROWS with the corpus).
    *
    * Scale shape: the earlier (lang, 31-value length band) blocking
    * was an equi-join but its key cardinality was constant, so each
    * block's population — and the quadratic pair term inside it —
    * grew linearly with the corpus. Here the pair fan-out is bounded
    * by LSH bucket collisions (sub-quadratic, the q81 recall stage),
    * and lang/|Δlen| ≤ 10 are cheap post-filters on candidates. The
    * threshold form of `levenshtein` abandons the DP early once a row
    * exceeds 10, so rejected candidates cost O(len·10), not O(len²).
    * The oracle reproduces the identical banding CTEs
    * (OracleExt.lshPairCtes), so the recall stage is hash-verified;
    * TrainPipeSpec additionally proves this form ≡ the plain
    * (lang, Δlen)-blocked quadratic join intersected with the LSH
    * candidate set.
    */
  def q76(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
      .select(col("doc_id"), col("lang"), col("text"), col("n_chars"))
    val cand = LshStages.candidatePairs(s, d)
    cand
      .join(docs.select(col("doc_id").as("a_id"), col("lang"),
        col("text").as("a_text"), col("n_chars").as("a_chars")), Seq("a_id"))
      .join(docs.select(col("doc_id").as("b_id"), col("lang").as("lang_b"),
        col("text").as("b_text"), col("n_chars").as("b_chars")), Seq("b_id"))
      .filter(col("lang") === col("lang_b") &&
        abs(col("a_chars") - col("b_chars")) <= 10)
      .select(col("a_id"), col("b_id"),
        levenshtein(col("a_text"), col("b_text"), 10).as("dist"))
      .filter(col("dist") >= 0)
      .orderBy(col("a_id"), col("b_id"))
  }

  /** LSH-verified near-dup pairs — the open-scale (sub-quadratic)
    * composition: MinHash-LSH banding proposes candidates (q46's
    * operator, shuffles only (band, bucket) keys), then exact
    * threshold Levenshtein verifies each candidate — the classic
    * recall stage → precision stage pipeline. Pair fan-out is bounded
    * by bucket collisions, never |docs|²; the verification cost is
    * O(candidates · len · 30). Oracle reuses the SAME generated LSH
    * CTEs as q46/q62 plus DuckDB's levenshtein.
    */
  def q81(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val cand = LshStages.candidatePairs(s, d)
    val t = docs.select(col("doc_id"), col("text"))
    cand
      .join(t.select(col("doc_id").as("a_id"), col("text").as("a_text")), Seq("a_id"))
      .join(t.select(col("doc_id").as("b_id"), col("text").as("b_text")), Seq("b_id"))
      .select(col("a_id"), col("b_id"),
        levenshtein(col("a_text"), col("b_text"), 30).as("dist"))
      .filter(col("dist") >= 0)
      .orderBy(col("a_id"), col("b_id"))
  }

  /** Dedup-cluster representative selection: for every q62 cluster,
    * keep the highest-quality member (ties broken by min doc_id) —
    * the "which copy survives" decision of a dedup pipeline, driven
    * by the q33 quality score compared UNROUNDED so both engines
    * rank identically. One window pass over the (tiny) clustered
    * subset; the cluster assignment itself reuses the q62 operators.
    */
  def q77(s: SparkSession, d: String): DataFrame = {
    val cc = LshStages.clusters(s, d)
    val qual = documents(s, d)
      .select(col("doc_id"),
        TextExpressions.quality_stats(col("text")).getField("quality").as("q"))
    val w = Window.partitionBy(col("cluster_id"))
    cc.join(qual, Seq("doc_id"))
      .withColumn("rn", row_number().over(w.orderBy(col("q").desc, col("doc_id"))))
      .withColumn("n_docs", count(lit(1)).over(w))
      .filter(col("rn") === 1)
      .select(col("cluster_id"), col("doc_id").as("rep_doc_id"),
        col("n_docs"), round(col("q"), 4).as("rep_quality"))
      .orderBy(col("cluster_id"))
  }

  /** Deterministic train/val/test assignment: the md5-derived 60-bit
    * content hash mod 100 buckets every doc 80/10/10. Reproducible
    * across runs, engines, and re-shards (the hash is content-keyed,
    * not position-keyed); at 100 TB this is a narrow projection — no
    * shuffle, no RNG seed to coordinate across executors.
    */
  def q78(s: SparkSession, d: String): DataFrame = {
    val b = pmod(Text.md5Long(col("text")), lit(100L))
    documents(s, d)
      .select(col("doc_id"),
        when(b < 80, "train").when(b < 90, "val").otherwise("test").as("split"))
      .orderBy(col("doc_id"))
  }

  /** Benchmark-contamination screen: count, per train/val doc, the
    * distinct 7-gram shingles it shares with ANY test-split doc
    * (q78's buckets ≥ 90 are the held-out set). The test side's
    * distinct shingle hashes are a small relation — broadcast — so
    * the train side never shuffles; a doc sharing ≥ 1 seven-gram
    * with the benchmark is flagged. Shingle hashes come from the
    * single-pass Md5ShingleHashes kernel (bit-identical to
    * md5Long∘shingles, which the oracle mirrors).
    */
  def q79(s: SparkSession, d: String): DataFrame = {
    val h = documents(s, d)
      .select(col("doc_id"), pmod(Text.md5Long(col("text")), lit(100L)).as("b"),
        explode(TextExpressions.md5_shingle_hashes(col("text"), 7)).as("h"))
      .select(col("doc_id"), col("b"), col("h")).distinct()
    val bench = h.filter(col("b") >= 90).select(col("h").as("bh")).distinct()
    h.filter(col("b") < 90)
      .join(broadcast(bench), col("h") === col("bh"), "left")
      .groupBy(col("doc_id"))
      .agg(count(col("bh")).as("n_shared"))
      .select(col("doc_id"), col("n_shared"),
        (col("n_shared") >= 1).as("contaminated"))
      .orderBy(col("doc_id"))
  }

  /** Domain-mixture reweighting: resample each language toward a
    * uniform 1/5 target share. The per-language keep threshold is
    * EXACT integer arithmetic — `(10000·total) div (5·n_lang)` capped
    * at 10000 — and the keep decision is the content hash mod 10000
    * under that threshold, so the subsample is deterministic and both
    * engines agree on every boundary doc. The 5-row threshold table
    * broadcasts; the fact side is one narrow filtered aggregate.
    */
  def q80(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
      .select(col("lang"), Text.md5Long(col("text")).as("hl"))
    val total = docs.agg(count(lit(1)).as("total"))
    val per = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
      .crossJoin(broadcast(total))
      .select(col("lang"), col("n_docs"),
        least(lit(10000L), expr("(10000 * total) div (5 * n_docs)")).as("thresh"))
    val kept = docs.join(broadcast(per), Seq("lang"))
      .filter(pmod(col("hl"), lit(10000L)) < col("thresh"))
      .groupBy(col("lang")).agg(count(lit(1)).as("n_kept"))
    // NULLS FIRST on the oracle side mirrors Spark's asc default, so a
    // NULL lang group (future datagen) cannot break row-order parity
    per.join(kept, Seq("lang"), "left")
      .select(col("lang"), col("n_docs"), col("thresh"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
      .orderBy(col("lang"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q76_edit_distance_pairs" -> (q76 _),
    "q81_lsh_verified_pairs" -> (q81 _),
    "q77_cluster_rep" -> (q77 _),
    "q78_split_assign" -> (q78 _),
    "q79_contamination" -> (q79 _),
    "q80_mix_weights" -> (q80 _)
  )
}

/** DuckDB oracles for Queries3. The q77 cluster CTEs are the SAME
  * generated SQL the q62 oracle uses (OracleExt.lshPairCtes), so the
  * two queries cannot drift.
  */
object Oracle3 {

  private def md5long(e: String): String =
    s"CAST('0x' || substring(md5($e), 1, 15) AS BIGINT)"

  /** DuckDB mirror of Text.shingles(text, 7) (clamped-slice form). */
  private val shingles7 =
    "list_transform(range(1, greatest(len(toks)-6, 1) + 1), " +
      "i -> array_to_string(toks[i:i+6], ' '))"

  val sql: Map[String, String] = Map(
    "q76_edit_distance_pairs" ->
      s"""WITH ${OracleExt.lshPairCtes},
         |v AS (SELECT p.a_id, p.b_id,
         |    levenshtein(da.text, db.text) AS dist
         |  FROM pairs p
         |  JOIN documents da ON da.doc_id = p.a_id
         |  JOIN documents db ON db.doc_id = p.b_id
         |  WHERE da.lang = db.lang
         |    AND abs(da.n_chars - db.n_chars) <= 10)
         |SELECT a_id, b_id, dist FROM v
         |WHERE dist <= 10 ORDER BY a_id, b_id""".stripMargin,

    "q81_lsh_verified_pairs" ->
      s"""WITH ${OracleExt.lshPairCtes},
         |v AS (SELECT p.a_id, p.b_id,
         |    levenshtein(da.text, db.text) AS dist
         |  FROM pairs p
         |  JOIN documents da ON da.doc_id = p.a_id
         |  JOIN documents db ON db.doc_id = p.b_id)
         |SELECT a_id, b_id, dist FROM v
         |WHERE dist <= 30 ORDER BY a_id, b_id""".stripMargin,

    "q77_cluster_rep" ->
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
         |comp AS (SELECT n AS doc_id, min(lbl) AS cluster_id
         |         FROM walk GROUP BY n),
         |tq AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |qual AS (SELECT doc_id,
         |  (least(CAST(len(toks) AS DOUBLE) / 50.0, 1.0)
         |   + least(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
         |       / CAST(greatest(len(toks), 1) AS DOUBLE) / 5.0, 1.0)
         |   + least(CAST(len(list_filter(toks, x -> x IN
         |       (${OracleExt.allStopwordsIn}))) AS DOUBLE)
         |       / CAST(greatest(len(toks), 1) AS DOUBLE) * 5.0, 1.0)) / 3.0 AS q
         |  FROM tq),
         |ranked AS (SELECT c.cluster_id, c.doc_id, qual.q,
         |    row_number() OVER (PARTITION BY c.cluster_id
         |                       ORDER BY qual.q DESC, c.doc_id) AS rn,
         |    count(*) OVER (PARTITION BY c.cluster_id) AS n_docs
         |  FROM comp c JOIN qual ON c.doc_id = qual.doc_id)
         |SELECT cluster_id, doc_id AS rep_doc_id, n_docs,
         |  round(q, 4) AS rep_quality
         |FROM ranked WHERE rn = 1 ORDER BY cluster_id""".stripMargin,

    "q78_split_assign" ->
      s"""SELECT doc_id,
         |  CASE WHEN ${md5long("text")} % 100 < 80 THEN 'train'
         |       WHEN ${md5long("text")} % 100 < 90 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q79_contamination" ->
      s"""WITH s AS (SELECT doc_id, ${md5long("text")} % 100 AS b,
         |             string_split(text, ' ') AS toks FROM documents),
         |g AS (SELECT doc_id, b, unnest($shingles7) AS sh FROM s),
         |h AS (SELECT DISTINCT doc_id, b, ${md5long("sh")} AS h FROM g),
         |bench AS (SELECT DISTINCT h FROM h WHERE b >= 90),
         |tr AS (SELECT doc_id, h FROM h WHERE b < 90)
         |SELECT t.doc_id, count(bench.h) AS n_shared,
         |  count(bench.h) >= 1 AS contaminated
         |FROM tr t LEFT JOIN bench ON t.h = bench.h
         |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,

    "q80_mix_weights" ->
      s"""WITH n AS (SELECT count(*) AS total FROM documents),
         |per AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
         |thr AS (SELECT lang, n_docs,
         |  CAST(least(10000, (10000 * total) // (5 * n_docs)) AS BIGINT) AS thresh
         |  FROM per, n)
         |SELECT t.lang, t.n_docs, t.thresh,
         |  (SELECT count(*) FROM documents d
         |    WHERE d.lang = t.lang
         |      AND ${md5long("d.text")} % 10000 < t.thresh) AS n_kept
         |FROM thr t ORDER BY t.lang NULLS FIRST""".stripMargin
  )
}
