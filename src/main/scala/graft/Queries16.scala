package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-6 batch 5: lakehouse maintenance + two more curation audits.
  *
  *  - q152 small-file compaction: the nightly OPTIMIZE every parquet
  *    lake runs — rewrite a fragmented table region into target-size
  *    files. Declared as a query whose OUTPUT is the post-compaction
  *    audit (rows, checksum, file count before/after), so the oracle
  *    (computed on the logical content) proves the rewrite changed
  *    the LAYOUT and nothing else.
  *  - q153 schema-evolution read: two writer generations (v2 adds a
  *    column) land in one dataset; `mergeSchema` unifies them with
  *    NULL back-fill. The oracle reproduces the unified view with an
  *    explicit NULL column over the originals — hash parity proves
  *    the evolved read is exactly "old rows get NULL", no silent
  *    coercion.
  *  - q154 packing-efficiency report: the per-seq-len padding-waste
  *    numbers that pick L before a q103 packing run.
  *  - q155 maximal recycled spans: contiguous chunk runs per doc pair
  *    (exact-substring dedup at chunk granularity, q132's sibling).
  */
object Queries16 {
  import Tables._

  private def wDir(tag: String, d: String): String =
    Tables.scratchDir(tag, d)

  /** q152 — SMALL-FILE COMPACTION. Fragment `orders` into 64 files
    * (the streaming-ingest pathology: one file per micro-batch per
    * partition), compact with a single repartition-by-range write
    * (range keeps min/max file statistics tight for later pruning),
    * and audit: row count + order-invariant checksum before/after,
    * file counts. At 100 TB the same job runs per partition-predicate
    * slice (only cold regions), target file size 128-512 MB.
    */
  def q152(s: SparkSession, d: String): DataFrame = {
    val dir = wDir("compact", d)
    val src = orders(s, d).select(col("o_orderkey"), col("o_custkey"),
      col("o_orderstatus"), col("o_totalprice"))
    src.repartition(64).write.mode("overwrite").parquet(s"$dir/frag")
    // layout is a FILESYSTEM property: count part-files by listing the
    // directory (what OPTIMIZE/VACUUM tooling does), not by scanning
    // every row for input_file_name + distinct — the scan-based count
    // cost two full reads + shuffles per call for a number the listing
    // already knows
    def files(p: String): Long =
      Option(new java.io.File(p).listFiles()).getOrElse(Array.empty)
        .count(f => f.getName.startsWith("part-") &&
          !f.getName.endsWith(".crc")).toLong
    val fragFiles = files(s"$dir/frag")
    val frag = s.read.parquet(s"$dir/frag")
    frag.repartitionByRange(2, col("o_orderkey"))
      .write.mode("overwrite").parquet(s"$dir/compact")
    val compFiles = files(s"$dir/compact")
    val comp = s.read.parquet(s"$dir/compact")
    // order-invariant content fingerprint over the non-float key
    // columns via the repo's shared 60-bit md5 projection (the oracle
    // rebuilds it — engine-native hashes like xxhash64 have no DuckDB
    // twin), plus the price total through the exact decimal path
    def audit(df: DataFrame, label: String) =
      df.agg(lit(label).as("stage"), count(lit(1)).as("n_rows"),
        sum(graft.functions.Text.md5Long(concat_ws("|",
          col("o_orderkey"), col("o_custkey"), col("o_orderstatus")))
          .cast(DecimalType(38, 0))).cast("string").as("content_sum"),
        round(sum(col("o_totalprice").cast(DecimalType(38, 6))), 4)
          .cast("double").as("total_price"))
    audit(frag, "fragmented")
      .withColumn("n_files", lit(fragFiles))
      .unionByName(audit(comp, "compacted")
        .withColumn("n_files", lit(compFiles)))
      .select(col("stage"), col("n_rows"), col("content_sum"),
        col("total_price"),
        // the audit row carries WHETHER compaction compacted (layout
        // is not content): many fragments in, few target files out
        when(col("stage") === "fragmented", col("n_files") > 2L)
          .otherwise(col("n_files") <= 2L).as("layout_ok"))
      .orderBy(col("stage"))
  }

  /** q153 — SCHEMA-EVOLUTION READ. Generation v1 writes (doc_id,
    * lang); generation v2 adds `quality`. `mergeSchema` unifies; old
    * rows read with NULL quality. Per-lang rollup over the unified
    * view, counting rows per generation via the NULL marker.
    */
  def q153(s: SparkSession, d: String): DataFrame = {
    val dir = wDir("evolve", d)
    val docs = documents(s, d)
    docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("lang"))
      .write.mode("overwrite").parquet(s"$dir/gen=1")
    docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("lang"),
        (col("n_chars").cast("double") / 1000.0).as("quality"))
      .write.mode("overwrite").parquet(s"$dir/gen=2")
    s.read.option("mergeSchema", "true").parquet(dir)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("quality").isNull, 1L).otherwise(0L)).as("n_v1"),
        round(sum(coalesce(col("quality"), lit(0.0))
          .cast(DecimalType(38, 18))), 4).cast("double").as("sum_quality"))
      // asc_nulls_last mirrors DuckDB's default NULL ordering
      .orderBy(col("lang").asc_nulls_last)
  }

  /** q154 — PACKING-EFFICIENCY REPORT. For each candidate training
    * sequence length L ∈ {512, 1024, 2048}: how many sequences the
    * corpus chunks into (ceil(n_tok/L) per doc) and what fraction of
    * the resulting token slots real tokens fill — the padding-waste
    * number that picks L before a packing run (q103 then does the
    * packing at the chosen L).
    *
    * Scale: ONE narrow pass computes per-doc token counts; the 3-row
    * L dimension explodes per doc (3× fan-out of a 1-int row, not of
    * text); integer sums all the way, one final division per L row.
    */
  def q154(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .filter(col("text").isNotNull)
      .select(size(split(col("text"), " ")).cast("long").as("n_tok"))
      .select(col("n_tok"), explode(typedLit(Seq(512L, 1024L, 2048L))).as("seq_len"))
      .groupBy(col("seq_len"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("total_tokens"),
        // integer `div`, not double `/` + cast: exact for ANY seq_len
        // (the double path only matched the oracle's `//` because
        // 512/1024/2048 are powers of two — binary-exact division)
        sum(expr("(n_tok + seq_len - 1) div seq_len")).as("n_seqs"))
      .select(col("seq_len"), col("n_docs"), col("total_tokens"), col("n_seqs"),
        round(col("total_tokens").cast("double") /
          (col("n_seqs") * col("seq_len")), 4).as("utilization"))
      .orderBy(col("seq_len"))

  /** q155 — MAXIMAL RECYCLED SPANS (exact-substring dedup,
    * Dedup.dupSpans). 20-token SLIDING windows (stride 1) make
    * detection shift-invariant — a copied passage is found wherever
    * it starts in either doc — and the reported
    * max_span_tokens = max_span_windows + 19 is the TRUE length of
    * the longest shared contiguous run (a run of L tokens yields
    * exactly L−19 consecutive window matches). Pairs sharing a run of
    * ≥ 40 contiguous tokens (≥ 21 windows) are reported.
    *
    * Scale: see operators/Dedup.dupSpans — fingerprint-keyed
    * equi-join (~|tokens| window rows per doc, the ngram-index
    * envelope), partition-local span windows, and a `maxDf` cap for
    * boilerplate mega-windows (off in the exact declared form, per
    * the q102/q143 convention).
    */
  def q155(s: SparkSession, d: String): DataFrame = {
    val wt = LshStages.WindowTokens
    val minRunTokens = LshStages.MinRunTokens
    graft.operators.Dedup.dupSpansFromWindows(LshStages.windowFps(s, d),
        minSpanWindows = minRunTokens - wt + 1)
      .select(col("a_id"), col("b_id"), col("n_aligned_windows"),
        col("max_span_windows"),
        (col("max_span_windows") + (wt - 1)).as("max_span_tokens"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** q156 — DEDUP CLUSTER-SIZE HISTOGRAM. The corpus-health report
    * over q62's near-dup clusters: how many clusters of each size,
    * how many docs they hold, and how many a keep-one-per-cluster
    * dedup would remove. The report every dedup run ends with (the
    * removal number IS the run's headline).
    *
    * Scale: rides the materialized LshStages cluster stage (shared
    * with q62/q77); two bounded aggregates on top — cluster count,
    * then |distinct sizes| rows. Nothing new shuffles text.
    */
  def q156(s: SparkSession, d: String): DataFrame =
    LshStages.clusters(s, d)
      .groupBy(col("cluster_id")).agg(count(lit(1)).as("sz"))
      .groupBy(col("sz").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"),
        sum(col("sz")).as("n_docs"),
        sum(col("sz") - 1).as("n_removable"))
      .orderBy(col("cluster_size"))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q152_compaction" -> (q152 _),
    "q153_schema_evolution" -> (q153 _),
    "q154_packing_efficiency" -> (q154 _),
    "q155_dup_spans" -> (q155 _),
    "q156_cluster_histogram" -> (q156 _))
}

object Oracle16 {

  val sql: Map[String, String] = Map(
    // the oracle computes the SAME audit from the logical content —
    // both stages must report identical rows/checksum (layout-only
    // rewrite), and layout_ok is true on both rows
    "q152_compaction" ->
      s"""WITH c AS (SELECT count(*) AS n_rows,
        |    CAST(sum(CAST(${OracleExt.md5long(
             "concat_ws('|', CAST(o_orderkey AS VARCHAR), " +
               "CAST(o_custkey AS VARCHAR), o_orderstatus)")}
        |      AS DECIMAL(38,0))) AS VARCHAR) AS content_sum,
        |    CAST(round(sum(CAST(o_totalprice AS DECIMAL(38,6))), 4)
        |      AS DOUBLE) AS total_price
        |  FROM orders)
        |SELECT 'compacted' AS stage, n_rows, content_sum, total_price,
        |  true AS layout_ok FROM c
        |UNION ALL
        |SELECT 'fragmented' AS stage, n_rows, content_sum, total_price,
        |  true AS layout_ok FROM c
        |ORDER BY stage""".stripMargin,

    "q153_schema_evolution" ->
      """WITH v1 AS (SELECT doc_id, lang, NULL::DOUBLE AS quality
        |  FROM documents WHERE doc_id % 2 = 0),
        |v2 AS (SELECT doc_id, lang, CAST(n_chars AS DOUBLE) / 1000.0 AS quality
        |  FROM documents WHERE doc_id % 2 = 1),
        |u AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN quality IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_v1,
        |  CAST(round(sum(CAST(coalesce(quality, 0.0) AS DECIMAL(38,18))), 4)
        |    AS DOUBLE) AS sum_quality
        |FROM u GROUP BY lang ORDER BY lang""".stripMargin,

    "q154_packing_efficiency" ->
      """WITH n AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents WHERE text IS NOT NULL),
        |x AS (SELECT n_tok, unnest([512, 1024, 2048]) AS seq_len FROM n),
        |g AS (SELECT CAST(seq_len AS BIGINT) AS seq_len,
        |    count(*) AS n_docs,
        |    CAST(sum(n_tok) AS BIGINT) AS total_tokens,
        |    CAST(sum((n_tok + seq_len - 1) // seq_len) AS BIGINT) AS n_seqs
        |  FROM x GROUP BY seq_len)
        |SELECT seq_len, n_docs, total_tokens, n_seqs,
        |  round(CAST(total_tokens AS DOUBLE) / (n_seqs * seq_len), 4)
        |    AS utilization
        |FROM g ORDER BY seq_len""".stripMargin,

    // stride-1 sliding windows (clamped for sub-window docs, the
    // Text.shingles convention); spans via gaps-and-islands per
    // (pair, diagonal); span + 19 = the TRUE maximal run length
    "q155_dup_spans" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |    FROM documents),
        |wn AS (SELECT doc_id, i AS pos,
        |    md5(array_to_string(toks[i+1:i+20], ' ')) AS fp
        |  FROM t, LATERAL unnest(range(0,
        |    greatest(len(toks) - 20, 0) + 1)) AS r(i)),
        |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.pos AS ai,
        |    b.pos - a.pos AS diag
        |  FROM wn a JOIN wn b ON a.fp = b.fp AND a.doc_id < b.doc_id),
        |isl AS (SELECT a_id, b_id, diag, ai,
        |    ai - row_number() OVER (PARTITION BY a_id, b_id, diag
        |      ORDER BY ai) AS grp
        |  FROM p),
        |sp AS (SELECT a_id, b_id, diag, grp, count(*) AS span_windows
        |  FROM isl GROUP BY a_id, b_id, diag, grp),
        |o AS (SELECT a_id, b_id,
        |    CAST(sum(span_windows) AS BIGINT) AS n_aligned_windows,
        |    CAST(max(span_windows) AS BIGINT) AS max_span_windows
        |  FROM sp GROUP BY a_id, b_id)
        |SELECT a_id, b_id, n_aligned_windows, max_span_windows,
        |  max_span_windows + 19 AS max_span_tokens
        |FROM o WHERE max_span_windows >= 21
        |ORDER BY a_id, b_id""".stripMargin,

    // q62's recursive-CTE connected components, histogrammed
    "q156_cluster_histogram" ->
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
         |cc AS (SELECT n, min(lbl) AS cluster_id FROM walk GROUP BY n),
         |cs AS (SELECT cluster_id, count(*) AS sz FROM cc
         |  GROUP BY cluster_id)
         |SELECT sz AS cluster_size, count(*) AS n_clusters,
         |  CAST(sum(sz) AS BIGINT) AS n_docs,
         |  CAST(sum(sz - 1) AS BIGINT) AS n_removable
         |FROM cs GROUP BY sz ORDER BY sz""".stripMargin)
}
