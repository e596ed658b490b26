package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-7 batch 2: the dedup run's ACTION stage and two corpus-ops
  * reports.
  *
  *  - q160 keep-best canonical selection: q156 counted what a
  *    keep-one-per-cluster dedup would remove; q160 decides WHICH copy
  *    survives — the longest (n_chars, doc_id tie-break), the standard
  *    keep-longest heuristic — and emits the per-cluster removal
  *    manifest a dedup job executes.
  *  - q161 cross-source duplication matrix: which sources copy from
  *    each other (crawl forensics / license-risk report) — the
  *    near-dup candidate pairs bucketed by unordered source pair.
  *  - q162 shard-balance audit: the pre-writer report for hash-
  *    sharded training shards — per-shard doc/token totals and the
  *    relative deviation from ideal, i.e. the number that says
  *    whether shard files will be even before burning a 100 TB write.
  */
object Queries18 {
  import Tables._

  /** q160 — KEEP-BEST CANONICAL SELECTION per near-dup cluster.
    * Survivor = longest copy (max n_chars, min doc_id tie-break);
    * output is the per-cluster manifest: size, survivor, chars kept
    * vs removed.
    *
    * Scale: rides the materialized LshStages cluster stage (shared
    * with q62/q77/q156); the ranking window partitions by cluster_id
    * — bounded groups (cluster sizes are capped by the q143
    * operating mode), never a global sort; text never moves, only
    * (doc_id, cluster_id, n_chars).
    */
  def q160(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    LshStages.clusters(s, d)
      .join(documents(s, d).select(col("doc_id"), col("n_chars")), Seq("doc_id"))
      .withColumn("rn", row_number().over(w))
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_docs"),
        max(when(col("rn") === 1, col("doc_id"))).as("kept_id"),
        max(when(col("rn") === 1, col("n_chars"))).as("kept_chars"),
        sum(when(col("rn") =!= 1, col("n_chars")).otherwise(0L))
          .as("removed_chars"))
      .select(col("cluster_id"), col("n_docs"), col("kept_id"),
        col("kept_chars"), (col("n_docs") - 1).as("n_removed"),
        col("removed_chars"))
      .orderBy(col("cluster_id"))
  }

  /** q161 — CROSS-SOURCE DUPLICATION MATRIX. Near-dup candidate
    * pairs (the LSH stage) bucketed by UNORDERED source pair: the
    * diagonal is within-source recycling, off-diagonal cells are
    * sources copying each other.
    *
    * Scale: pairs carry two longs; the doc→source attachment is two
    * joins against a projection of (doc_id, source) — at 100 TB a
    * broadcast-able dimension once doc→source is a dictionary, or a
    * co-partitioned join on doc_id (the pair table is already keyed
    * by it). The output is |sources|² rows.
    */
  def q161(s: SparkSession, d: String): DataFrame = {
    val src = documents(s, d).select(col("doc_id"), col("source"))
    LshStages.candidatePairs(s, d)
      .join(src.select(col("doc_id").as("a_id"), col("source").as("sa")), Seq("a_id"))
      .join(src.select(col("doc_id").as("b_id"), col("source").as("sb")), Seq("b_id"))
      .select(least(col("sa"), col("sb")).as("src_a"),
        greatest(col("sa"), col("sb")).as("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("src_a"), col("src_b"))
  }

  /** q162 — SHARD-BALANCE AUDIT. Training shards are assigned by
    * content-stable hash (md5 of doc_id, the q100 split convention) —
    * the assignment that works at ANY scale because it needs no
    * global ordering — and the audit reports per-shard doc/token
    * totals plus the relative deviation from the ideal equal share.
    * A |deviation| over a few percent at this shard count would flag
    * a broken hash or pathological doc-length skew BEFORE the write.
    *
    * Scale: one narrow pass (token count + hash), an 8-row aggregate,
    * and a 1-row grand-total broadcast for the ideal share.
    */
  def q162(s: SparkSession, d: String): DataFrame = {
    val NShards = 8
    val perShard = documents(s, d)
      .filter(col("text").isNotNull)
      .select((graft.functions.Text.md5Long(col("doc_id").cast("string"))
          % NShards).as("shard"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("total_tokens"))
    val grand = perShard.agg(
      sum(col("total_tokens")).cast("double").as("grand_tokens"))
    perShard.crossJoin(broadcast(grand))
      .select(col("shard"), col("n_docs"), col("total_tokens"),
        round(col("total_tokens").cast("double") /
          (col("grand_tokens") / NShards) - 1.0, 4).as("rel_dev"))
      .orderBy(col("shard"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q160_cluster_canonical" -> (q160 _),
    "q161_source_dup_matrix" -> (q161 _),
    "q162_shard_balance" -> (q162 _))
}

object Oracle18 {

  val sql: Map[String, String] = Map(
    // q156's recursive-CTE connected components + the keep-longest
    // ranking (n_chars DESC, doc_id ASC) per cluster
    "q160_cluster_canonical" ->
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
         |j AS (SELECT cc.cluster_id, d.doc_id, d.n_chars
         |  FROM cc JOIN documents d ON cc.n = d.doc_id),
         |r AS (SELECT cluster_id, doc_id, n_chars,
         |    row_number() OVER (PARTITION BY cluster_id
         |      ORDER BY n_chars DESC, doc_id) AS rn
         |  FROM j)
         |SELECT cluster_id,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(max(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT) AS kept_id,
         |  CAST(max(CASE WHEN rn = 1 THEN n_chars END) AS BIGINT) AS kept_chars,
         |  CAST(count(*) - 1 AS BIGINT) AS n_removed,
         |  CAST(sum(CASE WHEN rn <> 1 THEN n_chars ELSE 0 END) AS BIGINT)
         |    AS removed_chars
         |FROM r GROUP BY cluster_id ORDER BY cluster_id""".stripMargin,

    "q161_source_dup_matrix" ->
      s"""WITH ${OracleExt.lshPairCtes},
         |m AS (SELECT least(da.source, db.source) AS src_a,
         |    greatest(da.source, db.source) AS src_b
         |  FROM pairs
         |  JOIN documents da ON pairs.a_id = da.doc_id
         |  JOIN documents db ON pairs.b_id = db.doc_id)
         |SELECT src_a, src_b, count(*) AS n_pairs
         |FROM m GROUP BY src_a, src_b ORDER BY src_a, src_b""".stripMargin,

    "q162_shard_balance" -> {
      val shard = s"${OracleExt.md5long("CAST(doc_id AS VARCHAR)")} % 8"
      s"""WITH t AS (SELECT $shard AS shard,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
         |  FROM documents WHERE text IS NOT NULL),
         |p AS (SELECT shard, count(*) AS n_docs,
         |    CAST(sum(n_tok) AS BIGINT) AS total_tokens
         |  FROM t GROUP BY shard),
         |g AS (SELECT CAST(sum(total_tokens) AS DOUBLE) AS grand_tokens FROM p)
         |SELECT shard, n_docs, total_tokens,
         |  round(CAST(total_tokens AS DOUBLE) / (grand_tokens / 8) - 1.0, 4)
         |    AS rel_dev
         |FROM p, g ORDER BY shard""".stripMargin
    })
}
