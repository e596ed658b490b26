package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-5 batch 7: corpus-health monitors and verifier-training prep.
  *
  *  - q139 pair-feature materialization: the feature vector a learned
  *    dedup verifier (reranker) trains on, computed for every LSH
  *    candidate pair — metadata agreement + edit-distance features.
  *  - q140 source-drift monitor: KL(lang|source ‖ lang) per source —
  *    the mixture-drift alarm run on every new crawl before it joins
  *    the corpus (q80's sibling: q80 fixes the mixture, q140 detects
  *    when a source moved it).
  *  - q141 Zipf-slope fit: least-squares slope of log-freq vs log-rank
  *    over the top-100 tokens — the corpus-health scalar that flags
  *    boilerplate floods (slope → 0) and template corpora (slope ≪ -1).
  *
  * Every query is DuckDB-oracled (Oracle12) under the §7.4
  * conventions.
  */
object Queries12 {
  import Tables._

  /** q139 — PAIR-FEATURE MATERIALIZATION. For each LSH candidate pair
    * (shared LshStages stage): language/source agreement, length
    * ratio, Levenshtein distance and normalized similarity — the
    * training-example features for a learned verify stage.
    *
    * Scale: candidates are the LSH output (corpus-sublinear); doc
    * metadata joins are id-keyed; text rides only into the bounded
    * candidate join (the q81/q93 shape — never all-pairs).
    */
  def q139(s: SparkSession, d: String): DataFrame = {
    val pairs = LshStages.candidatePairs(s, d)
    val meta = documents(s, d)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        col("text"))
    pairs
      .join(meta.select(col("doc_id").as("a_id"), col("lang").as("a_lang"),
        col("source").as("a_src"), col("n_chars").as("a_len"),
        col("text").as("a_text")), Seq("a_id"))
      .join(meta.select(col("doc_id").as("b_id"), col("lang").as("b_lang"),
        col("source").as("b_src"), col("n_chars").as("b_len"),
        col("text").as("b_text")), Seq("b_id"))
      .select(col("a_id"), col("b_id"),
        (col("a_lang") === col("b_lang")).as("same_lang"),
        (col("a_src") === col("b_src")).as("same_source"),
        round(least(col("a_len"), col("b_len")).cast("double") /
          greatest(col("a_len"), col("b_len")), 4).as("len_ratio"),
        levenshtein(col("a_text"), col("b_text")).as("lev_dist"),
        round(lit(1.0) - levenshtein(col("a_text"), col("b_text"))
          .cast("double") /
          greatest(length(col("a_text")), length(col("b_text"))), 4)
          .as("lev_sim"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** q140 — SOURCE-DRIFT MONITOR. KL(P(lang|source) ‖ P(lang)) per
    * source, from exact counts. The global distribution rides a
    * |langs|-row broadcast; the per-source KL is a sum over ≤|langs|
    * aggregate rows, each term p·ln(p/q) with p, q ratios of exact
    * integer counts (deterministic on both engines, the q66 ln
    * convention). Zero terms (lang absent from a source) contribute 0
    * by the KL limit convention.
    *
    * Scale: two partial+final aggregates on (source, lang) and (lang),
    * then arithmetic on the tiny joint table. Nothing per-document
    * survives the first aggregate.
    */
  def q140(s: SparkSession, d: String): DataFrame = {
    val dec = DecimalType(38, 18)
    val docs = documents(s, d)
    val bySrcLang = docs.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n"))
    val bySrc = Window.partitionBy(col("source"))
    val global = docs.groupBy(col("lang")).agg(count(lit(1)).as("gn"))
    val gtot = docs.agg(count(lit(1)).as("gt"))
    bySrcLang
      .withColumn("sn", sum(col("n")).over(bySrc))
      .join(broadcast(global), Seq("lang"))
      .crossJoin(broadcast(gtot))
      .select(col("source"), col("sn"),
        ((col("n").cast("double") / col("sn")) *
          log((col("n").cast("double") / col("sn")) /
            (col("gn").cast("double") / col("gt")))).as("term"))
      .groupBy(col("source"))
      .agg(min(col("sn")).as("n_docs"),
        round(sum(col("term").cast(dec)).cast("double"), 4)
          .as("kl_divergence"))
      .orderBy(col("source"))
  }

  /** q141 — ZIPF-SLOPE FIT. Least-squares line through
    * (ln rank, ln freq) for the top-100 tokens (freq desc, token
    * tiebreak): slope ≈ −1 is healthy natural text; the fit runs on a
    * 100-row aggregate with decimal-summed moments.
    *
    * Scale: the token census is one partial+final aggregate (the q30
    * shape); top-100 is TakeOrdered; the regression arithmetic is a
    * single tiny aggregate. At 100 TB the census would feed from the
    * q123 CMS instead — same downstream fit.
    */
  def q141(s: SparkSession, d: String): DataFrame = {
    val dec = DecimalType(38, 18)
    val top = documents(s, d)
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("tok")).limit(100)
    val xy = top
      .withColumn("rank", row_number().over(
        Window.orderBy(col("freq").desc, col("tok"))))
      .select(log(col("rank").cast("double")).as("x"),
        log(col("freq").cast("double")).as("y"))
    xy.agg(count(lit(1)).as("n_tokens"),
        sum(col("x").cast(dec)).cast("double").as("sx"),
        sum(col("y").cast(dec)).cast("double").as("sy"),
        sum((col("x") * col("y")).cast(dec)).cast("double").as("sxy"),
        sum((col("x") * col("x")).cast(dec)).cast("double").as("sxx"))
      .select(col("n_tokens"),
        round((col("n_tokens") * col("sxy") - col("sx") * col("sy")) /
          (col("n_tokens") * col("sxx") - col("sx") * col("sx")), 4)
          .as("zipf_slope"),
        round((col("sy") - ((col("n_tokens") * col("sxy") -
          col("sx") * col("sy")) /
          (col("n_tokens") * col("sxx") - col("sx") * col("sx"))) *
          col("sx")) / col("n_tokens"), 4).as("intercept"))
  }

  /** q142 — VARIANT EXTRACTION (Spark 4 semi-structured type). The
    * q03 JSONPath extraction re-expressed through parse_json →
    * VARIANT → variant_get: the open-schema ingestion path where the
    * payload shape is not declared up front (S8/S9's modern form).
    * The oracle is the plain JSON-path SQL, so the hash match proves
    * the variant encode/decode round-trip is lossless for the
    * extracted field.
    *
    * Scale: VARIANT parses once into a binary encoding; repeated
    * extractions skip re-parsing the JSON text (the reason the type
    * exists). Per-row math, no shuffles of its own.
    */
  def q142(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_id"), col("event_type"),
        expr("variant_get(parse_json(props), '$.k', 'int')").as("k_val"))
      .orderBy(col("event_id"))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q139_pair_features" -> (q139 _),
    "q140_source_drift" -> (q140 _),
    "q141_zipf_slope" -> (q141 _),
    "q142_variant_extract" -> (q142 _))
}

/** DuckDB mirrors of Queries12 — same formulas, same decimal paths,
  * same rounding (§7.4).
  */
object Oracle12 {

  val sql: Map[String, String] = Map(
    "q139_pair_features" ->
      s"""WITH ${OracleExt.lshPairCtes}
         |SELECT p.a_id, p.b_id,
         |  da.lang = db.lang AS same_lang,
         |  da.source = db.source AS same_source,
         |  round(CAST(least(da.n_chars, db.n_chars) AS DOUBLE)
         |    / greatest(da.n_chars, db.n_chars), 4) AS len_ratio,
         |  levenshtein(da.text, db.text) AS lev_dist,
         |  round(1.0 - CAST(levenshtein(da.text, db.text) AS DOUBLE)
         |    / greatest(length(da.text), length(db.text)), 4) AS lev_sim
         |FROM pairs p
         |JOIN documents da ON da.doc_id = p.a_id
         |JOIN documents db ON db.doc_id = p.b_id
         |ORDER BY p.a_id, p.b_id""".stripMargin,

    "q140_source_drift" ->
      """WITH sl AS (SELECT source, lang, count(*) AS n
        |    FROM documents GROUP BY source, lang),
        |s AS (SELECT source, SUM(n) AS sn FROM sl GROUP BY source),
        |g AS (SELECT lang, count(*) AS gn FROM documents GROUP BY lang),
        |t AS (SELECT count(*) AS gt FROM documents),
        |terms AS (SELECT sl.source, s.sn,
        |    (CAST(sl.n AS DOUBLE) / s.sn) *
        |      ln((CAST(sl.n AS DOUBLE) / s.sn) /
        |         (CAST(g.gn AS DOUBLE) / t.gt)) AS term
        |  FROM sl JOIN s USING (source) JOIN g USING (lang), t)
        |SELECT source, CAST(min(sn) AS BIGINT) AS n_docs,
        |  round(CAST(SUM(CAST(term AS DECIMAL(38,18))) AS DOUBLE), 4)
        |    AS kl_divergence
        |FROM terms GROUP BY source ORDER BY source""".stripMargin,

    "q141_zipf_slope" ->
      """WITH tk AS (SELECT unnest(string_split(text, ' ')) AS tok
        |    FROM documents),
        |f AS (SELECT tok, count(*) AS freq FROM tk GROUP BY tok
        |  ORDER BY freq DESC, tok LIMIT 100),
        |r AS (SELECT ln(CAST(row_number() OVER
        |      (ORDER BY freq DESC, tok) AS DOUBLE)) AS x,
        |    ln(CAST(freq AS DOUBLE)) AS y
        |  FROM f),
        |m AS (SELECT count(*) AS n_tokens,
        |    CAST(SUM(CAST(x AS DECIMAL(38,18))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(y AS DECIMAL(38,18))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(x * y AS DECIMAL(38,18))) AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(x * x AS DECIMAL(38,18))) AS DOUBLE) AS sxx
        |  FROM r)
        |SELECT n_tokens,
        |  round((n_tokens * sxy - sx * sy) /
        |    (n_tokens * sxx - sx * sx), 4) AS zipf_slope,
        |  round((sy - ((n_tokens * sxy - sx * sy) /
        |    (n_tokens * sxx - sx * sx)) * sx) / n_tokens, 4)
        |    AS intercept
        |FROM m""".stripMargin,

    // the plain JSON-path form — hash-matching the VARIANT plan proves
    // the binary variant round-trip is lossless for the field
    "q142_variant_extract" ->
      """SELECT event_id, event_type,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
        |FROM events ORDER BY event_id""".stripMargin)
}
