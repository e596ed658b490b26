package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.Vectors

/** Round-5 additions: training-data curation and data-layout operators
  * a 100 TB LLM pipeline runs daily, beyond the round-4 inventory.
  *
  *  - q103 sequence packing: assemble documents into fixed token-budget
  *    training sequences ("packs") per source shard.
  *  - q104 int8 embedding quantization audit: max-abs scalar
  *    quantization (the 4x memory lever for 100 TB vector stores) with
  *    per-label reconstruction-error and cosine-fidelity report.
  *  - q105 cross-source overlap matrix: which sources share near-dup
  *    content (contamination between crawls), via the SAME materialized
  *    MinHash-LSH candidate stage the dedup family uses.
  *  - q106 sliding-window chunking: overlapping context windows per
  *    document (RAG/pretrain chunking), pure narrow explode.
  *  - q107 Z-order layout key: Morton-interleaved (day, value-bucket)
  *    sort key + locality audit — the data-layout operator that buys
  *    multi-dimensional file skipping at rest.
  *  - q108 token-budget sampling: deterministic hash-ordered downsample
  *    of each language to a fixed token budget.
  *  - q109 label-centroid geometry: per-label embedding centroids and
  *    their pairwise cosine matrix (mixture/confusion geometry).
  *
  * Every query is DuckDB-oracled (Oracle6) under the §7.4 determinism
  * conventions (cast-to-double before IEEE math, decimal cross-partition
  * sums where float order would be nondeterministic, round(_, 4)).
  */
object Queries6 {
  import Tables._

  /** q103 — SEQUENCE PACKING. Documents are packed contiguously (by
    * doc_id) into 512-token bins per source; output is the per-pack
    * fill report. pack_id = floor(cum_tokens_before / 512): a document
    * belongs to the pack its first token lands in (the fixed-boundary
    * packing used when assembling pretraining batches).
    *
    * Scale: the only wide op is a per-source window — partition-local
    * after one shuffle on `source`. At 100 TB you pack per (source,
    * shard) exactly this way; there is NO global sort and no global
    * cumulative sum, which is what makes packing distributable. The
    * window is rows-based over a unique order key (doc_id), so the
    * cumsum is deterministic.
    */
  def q103(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d).select(col("doc_id"), col("source"),
      size(split(col("text"), " ")).cast("long").as("tok"))
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("cum_before", coalesce(sum(col("tok")).over(w), lit(0L)))
      .withColumn("pack_id",
        floor(col("cum_before") / lit(512.0)).cast("long"))
      .groupBy(col("source"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tok")).as("tokens"),
        round(sum(col("tok")) / lit(512.0), 4).as("fill_ratio"))
      .orderBy(col("source"), col("pack_id"))
  }

  /** q104 — INT8 QUANTIZATION AUDIT. Max-abs scalar quantization of
    * each embedding (q_i = floor(x_i/scale + 0.5), scale = max|x|/127 —
    * the symmetric int8 scheme vector stores use for 4x compression),
    * then the per-label fidelity report: mean squared reconstruction
    * error (x1e6) and mean cosine between original and dequantized.
    *
    * Scale: entirely per-row narrow math (higher-order functions +
    * the codegen'd dot/sumsq kernels) followed by one partial+final
    * aggregate on `label`. Per-row values are bit-identical to the
    * oracle (same cast-to-double, same left-to-right fold); the
    * cross-partition group sums use exact decimal so float ordering
    * cannot flip a rounded digit.
    */
  def q104(s: SparkSession, d: String): DataFrame = {
    val v = embeddings(s, d).select(col("vec_id"), col("label"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val per = v
      .withColumn("mx",
        aggregate(col("v"), lit(0.0), (acc, x) => greatest(acc, abs(x))))
      .filter(col("mx") > 0)
      .withColumn("qscale", col("mx") / lit(127.0))
      .withColumn("dq", transform(col("v"), x =>
        floor(x / col("qscale") + lit(0.5)) * col("qscale")))
      .withColumn("mse",
        aggregate(zip_with(col("v"), col("dq"), (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x) / size(col("v")))
      .withColumn("cosine", Vectors.cosine(col("v"), col("dq")))
    val dec = DecimalType(38, 18)
    per.groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("mse").cast(dec)).cast("double") / count(lit(1))
          * lit(1e6), 4).as("avg_mse_e6"),
        round(sum(col("cosine").cast(dec)).cast("double") / count(lit(1)),
          6).as("avg_cosine"))
      .orderBy(col("label"))
  }

  /** q105 — CROSS-SOURCE OVERLAP MATRIX. For every pair of sources,
    * how many MinHash-LSH candidate near-dup pairs straddle them (or
    * sit inside one source, the diagonal). This is the contamination
    * matrix a curation team reads before mixing crawls.
    *
    * Scale: reuses the LshStages materialized candidate stage (built
    * once per run, shared with q46/q62/q77/q81) — no new signature
    * pass. The source lookup is an equi-join of the (small) pair set
    * against a 2-column projection of the corpus; the aggregate output
    * is O(sources^2).
    */
  def q105(s: SparkSession, d: String): DataFrame = {
    val pairs = LshStages.candidatePairs(s, d)
    val src = documents(s, d).select(col("doc_id"), col("source"))
    pairs
      .join(src.select(col("doc_id").as("a_id"), col("source").as("sa")),
        Seq("a_id"))
      .join(src.select(col("doc_id").as("b_id"), col("source").as("sb")),
        Seq("b_id"))
      .select(least(col("sa"), col("sb")).as("src_a"),
        greatest(col("sa"), col("sb")).as("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("src_a"), col("src_b"))
  }

  /** q106 — SLIDING-WINDOW CHUNKING. Overlapping 200-char context
    * windows with stride 150 (50-char overlap) per document — the
    * chunking step of RAG indexing / long-doc pretraining. Emits one
    * row per chunk with its length and fingerprint.
    *
    * Scale: projection + `sequence`/`posexplode` only — a narrow map
    * with zero shuffles (the final orderBy is the §7.4 output
    * convention, not part of the operator). Fan-out is bounded by
    * ceil(n_chars/stride) per document.
    */
  def q106(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"),
        posexplode(sequence(lit(0L), col("n_chars") - 1, lit(150L)))
          .as(Seq("chunk_idx", "cstart")),
        col("text"))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        expr("substring(text, CAST(cstart AS INT) + 1, 200)").as("chunk"))
      .select(col("doc_id"), col("chunk_idx"),
        length(col("chunk")).as("chunk_len"),
        md5(col("chunk")).as("chunk_fp"))
      .orderBy(col("doc_id"), col("chunk_idx"))

  /** q107 — Z-ORDER LAYOUT KEY + LOCALITY AUDIT. Morton-interleaves
    * the bits of two bucketed dimensions of `events` (day-of-month,
    * value/32 bucket) into a 10-bit zkey, then audits locality per
    * 4-bit zkey prefix: each prefix must cover a narrow sub-rectangle
    * of BOTH dimensions — which is exactly why writing files sorted by
    * zkey lets min/max stats skip on either predicate.
    *
    * Scale: the key is pure per-row bit math (codegen'd); the audit is
    * one aggregate. In production you'd `repartitionByRange($"zkey")
    * .sortWithinPartitions($"zkey")` before the write — the same
    * total-order machinery as W1, applied to layout. ZorderSpec proves
    * the locality bound (every 16-cell prefix spans at most a quarter
    * of each dimension's bucket range).
    */
  def q107(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d).select(
      dayofmonth(col("ts")).cast("long").as("db"),
      floor(col("value") / 32.0).cast("long").as("vb"))
    val zkey = (0 until 5).map { b =>
      shiftleft(shiftright(col("db"), b).bitwiseAND(lit(1L)), 2 * b + 1) +
        shiftleft(shiftright(col("vb"), b).bitwiseAND(lit(1L)), 2 * b)
    }.reduce(_ + _)
    e.withColumn("zkey", zkey)
      .withColumn("zprefix", shiftright(col("zkey"), 6))
      .groupBy(col("zprefix"))
      .agg(count(lit(1)).as("n"),
        min(col("db")).as("min_day"), max(col("db")).as("max_day"),
        min(col("vb")).as("min_vb"), max(col("vb")).as("max_vb"))
      .orderBy(col("zprefix"))
  }

  /** q108 — TOKEN-BUDGET SAMPLING. Downsample each language to a
    * 2000-token budget: order docs by a deterministic per-doc hash
    * (md5 of doc_id — a stable shuffle, not a biased "first N"), keep
    * every doc that STARTS under the budget. The curation op for
    * "cap each language at k tokens in the mixture".
    *
    * Scale: one per-lang window over a unique hash order — the same
    * partition-local shape as q103; no global sort, no collect. At
    * 100 TB the budget is enforced per (lang, shard) with shard-level
    * budgets summing to the target.
    */
  def q108(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d).select(col("doc_id"), col("lang"),
      size(split(col("text"), " ")).cast("long").as("tok"),
      md5(col("doc_id").cast("string")).as("h"))
    val w = Window.partitionBy(col("lang")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("cum_before", coalesce(sum(col("tok")).over(w), lit(0L)))
      .filter(col("cum_before") < 2000L)
      .select(col("doc_id"), col("lang"), col("tok"), col("cum_before"))
      .orderBy(col("lang"), col("doc_id"))
  }

  /** q109 — LABEL-CENTROID GEOMETRY. Per-label embedding centroid
    * (positional mean) and the pairwise cosine between centroids — the
    * class-separation / mixture-geometry report run before using
    * labels as training strata.
    *
    * Scale: posexplode is a narrow x-dim fan-out; the centroid is one
    * partial+final aggregate on (label, pos) — never a collect of
    * vectors to the driver; the pairwise stage joins the O(labels x
    * dim) centroid table against itself on `pos`. Cross-partition
    * float sums use exact decimal (§7.4) so the rounded cosines are
    * order-independent.
    */
  def q109(s: SparkSession, d: String): DataFrame = {
    val dec = DecimalType(38, 18)
    val e = embeddings(s, d).select(col("label"),
      posexplode(col("embedding")).as(Seq("pos", "x")))
    val cent = e.groupBy(col("label"), col("pos"))
      .agg((sum(col("x").cast("double").cast(dec)) / count(lit(1)))
        .cast("double").as("c"))
    val a = cent.select(col("label").as("la"), col("pos"),
      col("c").as("ca"))
    val b = cent.select(col("label").as("lb"), col("pos"),
      col("c").as("cb"))
    a.join(b, Seq("pos")).filter(col("la") < col("lb"))
      .groupBy(col("la"), col("lb"))
      .agg(round(
        sum((col("ca") * col("cb")).cast(dec)).cast("double") /
          (sqrt(sum((col("ca") * col("ca")).cast(dec)).cast("double")) *
            sqrt(sum((col("cb") * col("cb")).cast(dec)).cast("double"))),
        4).as("cosine"))
      .orderBy(col("la"), col("lb"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q103_sequence_packing" -> (q103 _),
    "q104_embed_quantize" -> (q104 _),
    "q105_source_overlap" -> (q105 _),
    "q106_doc_chunks" -> (q106 _),
    "q107_zorder_layout" -> (q107 _),
    "q108_token_budget_sample" -> (q108 _),
    "q109_label_centroids" -> (q109 _))
}

/** DuckDB mirrors of Queries6 — same formulas, same fold orders, same
  * rounding (§7.4).
  */
object Oracle6 {

  /** The Morton bit-interleave of two 5-bit bucket columns, as SQL. */
  private def zkeySql(db: String, vb: String): String =
    (0 until 5).map { b =>
      s"((($db >> $b) & 1) << ${2 * b + 1}) + ((($vb >> $b) & 1) << ${2 * b})"
    }.mkString(" + ")

  val sql: Map[String, String] = Map(
    "q103_sequence_packing" ->
      """WITH t AS (SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
        |  FROM documents),
        |c AS (SELECT source, tok,
        |    COALESCE(SUM(tok) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cum_before
        |  FROM t)
        |SELECT source, CAST(floor(cum_before / 512.0) AS BIGINT) AS pack_id,
        |  count(*) AS n_docs, CAST(SUM(tok) AS BIGINT) AS tokens,
        |  round(SUM(tok) / 512.0, 4) AS fill_ratio
        |FROM c GROUP BY 1, 2 ORDER BY source, pack_id""".stripMargin,

    "q104_embed_quantize" ->
      """WITH v AS (SELECT vec_id, label,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |s AS (SELECT vec_id, label, v,
        |    list_max(list_transform(v, x -> abs(x))) / 127.0 AS qscale
        |  FROM v
        |  WHERE list_max(list_transform(v, x -> abs(x))) > 0),
        |dq AS (SELECT vec_id, label, v,
        |    list_transform(v, x -> floor(x / qscale + 0.5) * qscale) AS d
        |  FROM s),
        |per AS (SELECT label,
        |    list_sum(list_transform(range(1, len(v)+1),
        |      i -> (v[i] - d[i]) * (v[i] - d[i]))) / len(v) AS mse,
        |    list_sum(list_transform(range(1, len(v)+1), i -> v[i] * d[i]))
        |      / (sqrt(list_sum(list_transform(v, x -> x * x)))
        |         * sqrt(list_sum(list_transform(d, x -> x * x)))) AS cosine
        |  FROM dq)
        |SELECT label, count(*) AS n,
        |  round(SUM(mse) / count(*) * 1e6, 4) AS avg_mse_e6,
        |  round(SUM(cosine) / count(*), 6) AS avg_cosine
        |FROM per GROUP BY label ORDER BY label""".stripMargin,

    "q105_source_overlap" ->
      s"""WITH ${OracleExt.lshPairCtes},
         |lab AS (SELECT least(da.source, db.source) AS src_a,
         |    greatest(da.source, db.source) AS src_b
         |  FROM pairs
         |  JOIN documents da ON pairs.a_id = da.doc_id
         |  JOIN documents db ON pairs.b_id = db.doc_id)
         |SELECT src_a, src_b, count(*) AS n_pairs
         |FROM lab GROUP BY 1, 2 ORDER BY src_a, src_b""".stripMargin,

    "q106_doc_chunks" ->
      """WITH t AS (SELECT doc_id, text,
        |    unnest(range(0, CAST(ceil(n_chars / 150.0) AS BIGINT)))
        |      AS chunk_idx
        |  FROM documents)
        |SELECT doc_id, chunk_idx,
        |  length(substring(text, CAST(chunk_idx * 150 + 1 AS INT), 200))
        |    AS chunk_len,
        |  md5(substring(text, CAST(chunk_idx * 150 + 1 AS INT), 200))
        |    AS chunk_fp
        |FROM t ORDER BY doc_id, chunk_idx""".stripMargin,

    "q107_zorder_layout" -> {
      s"""WITH t AS (SELECT CAST(datepart('day', ts) AS BIGINT) AS db,
         |    CAST(floor(value / 32.0) AS BIGINT) AS vb
         |  FROM events),
         |z AS (SELECT db, vb, ${zkeySql("db", "vb")} AS zkey FROM t)
         |SELECT (zkey >> 6) AS zprefix, count(*) AS n,
         |  min(db) AS min_day, max(db) AS max_day,
         |  min(vb) AS min_vb, max(vb) AS max_vb
         |FROM z GROUP BY 1 ORDER BY zprefix""".stripMargin
    },

    "q108_token_budget_sample" ->
      """WITH t AS (SELECT doc_id, lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tok,
        |    md5(CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents),
        |c AS (SELECT doc_id, lang, tok,
        |    CAST(COALESCE(SUM(tok) OVER (PARTITION BY lang ORDER BY h
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS cum_before
        |  FROM t)
        |SELECT doc_id, lang, tok, cum_before
        |FROM c WHERE cum_before < 2000 ORDER BY lang, doc_id""".stripMargin,

    "q109_label_centroids" ->
      """WITH e0 AS (SELECT label, unnest(embedding) AS x,
        |    unnest(range(1, len(embedding) + 1)) AS pos
        |  FROM embeddings),
        |e AS (SELECT label, pos, CAST(x AS DOUBLE) AS x FROM e0),
        |cent AS (SELECT label, pos, SUM(x) / count(*) AS c
        |  FROM e GROUP BY label, pos)
        |SELECT a.label AS la, b.label AS lb,
        |  round(SUM(a.c * b.c) / (sqrt(SUM(a.c * a.c))
        |    * sqrt(SUM(b.c * b.c))), 4) AS cosine
        |FROM cent a JOIN cent b ON a.pos = b.pos AND a.label < b.label
        |GROUP BY 1, 2 ORDER BY la, lb""".stripMargin)
}
