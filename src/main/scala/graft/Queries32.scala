package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-7 batch 16: dedup-cluster quality and feature redundancy.
  *
  *  - q206 audits near-dup cluster PURITY: does each cluster stay
  *    within one source (template reuse inside a crawl) or span
  *    several (cross-source plagiarism / syndication)? The routing
  *    signal for q160's keep-policy choice.
  *  - q207 is the feature-redundancy screen: exact Pearson
  *    correlation between document features per language — the check
  *    run before both features are paid for at 100 TB.
  */
object Queries32 {
  import Tables._

  /** q206 — CLUSTER PURITY AUDIT. For every near-dup cluster (size
    * ≥ 2) from the shared LSH stage: size, distinct sources, the
    * dominant source (count desc, name asc) and its share. Pure
    * clusters (share = 1.0) are in-source template reuse — dedup
    * freely; mixed clusters are syndication and may need the
    * keep-per-source policy instead of q160's keep-longest.
    *
    * Scale: rides the materialized LshStages cluster stage (bounded
    * by construction — banding + cap, never all-pairs); the purity
    * math is a per-cluster aggregate over ≤|cluster| rows with an
    * arg-max window per cluster partition. Oracle rebuilds the same
    * clusters via the shared recursive-CTE pair pipeline (the q160
    * convention) so the two cannot drift.
    */
  def q206(s: SparkSession, d: String): DataFrame = {
    val bySrc = LshStages.clusters(s, d)
      .join(documents(s, d).select(col("doc_id"), col("source")),
        Seq("doc_id"))
      .groupBy(col("cluster_id"), col("source"))
      .agg(count(lit(1)).as("n"))
    val wTop = Window.partitionBy(col("cluster_id"))
      .orderBy(col("n").desc, col("source"))
    bySrc
      .withColumn("rk", row_number().over(wTop))
      .withColumn("n_docs",
        sum(col("n")).over(Window.partitionBy(col("cluster_id"))))
      .withColumn("n_sources",
        count(lit(1)).over(Window.partitionBy(col("cluster_id"))))
      .filter(col("rk") === 1)
      .select(col("cluster_id"), col("n_docs"), col("n_sources"),
        col("source").as("top_source"),
        round(col("n").cast("double") / col("n_docs").cast("double"), 4)
          .as("purity"))
      .orderBy(col("cluster_id"))
  }

  /** q207 — FEATURE CORRELATION SCREEN. Exact Pearson r between
    * n_chars and the whitespace token count, per language — near-1
    * correlation means the second feature buys nothing and should
    * not be computed at 100 TB. Every moment is an integer sum
    * (chars, tokens, and their products), so r's inputs are exact
    * and the only inexactness is the final correctly-rounded
    * sqrt/divide.
    *
    * Scale: one narrow partial+final aggregate per language —
    * five moment sums in the same pass, nothing per-document
    * survives.
    */
  def q207(s: SparkSession, d: String): DataFrame =
    documents(s, d).filter(col("text").isNotNull)
      .select(col("lang"), col("n_chars").as("x"),
        size(split(col("text"), " ")).cast("long").as("y"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        // moment products summed as DECIMAL(38,0): a LongType sum of
        // x*x wraps (or throws under ANSI) at big n_chars volumes,
        // while DuckDB's BIGINT sum promotes to HUGEINT — decimal
        // keeps the two engines exact-equal at any scale
        sum((col("x").cast(DecimalType(19, 0)) * col("x"))
          .cast(DecimalType(38, 0))).as("sxx"),
        sum((col("y").cast(DecimalType(19, 0)) * col("y"))
          .cast(DecimalType(38, 0))).as("syy"),
        sum((col("x").cast(DecimalType(19, 0)) * col("y"))
          .cast(DecimalType(38, 0))).as("sxy"))
      .select(col("lang"), col("n"),
        round((col("n").cast("double") * col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double")) /
          (sqrt(col("n").cast("double") * col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double")) *
           sqrt(col("n").cast("double") * col("syy").cast("double") -
            col("sy").cast("double") * col("sy").cast("double"))), 4)
          .as("pearson_r"))
      .orderBy(col("lang").asc_nulls_last)

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q206_cluster_purity" -> (q206 _),
    "q207_feature_correlation" -> (q207 _))
}

/** DuckDB mirrors of Queries32 — q206 splices the shared recursive
  * pair/CC pipeline (the q160 convention); q207 uses the same
  * integer moment sums.
  */
object Oracle32 {

  val sql: Map[String, String] = Map(
    "q206_cluster_purity" ->
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
         |bysrc AS (SELECT cc.cluster_id, d.source, count(*) AS n
         |  FROM cc JOIN documents d ON cc.n = d.doc_id
         |  GROUP BY cc.cluster_id, d.source),
         |w AS (SELECT *,
         |    row_number() OVER (PARTITION BY cluster_id
         |      ORDER BY n DESC, source) AS rk,
         |    CAST(sum(n) OVER (PARTITION BY cluster_id) AS BIGINT)
         |      AS n_docs,
         |    count(*) OVER (PARTITION BY cluster_id) AS n_sources
         |  FROM bysrc)
         |SELECT cluster_id, n_docs, n_sources, source AS top_source,
         |  round(CAST(n AS DOUBLE) / CAST(n_docs AS DOUBLE), 4)
         |    AS purity
         |FROM w WHERE rk = 1 ORDER BY cluster_id""".stripMargin,

    "q207_feature_correlation" ->
      """WITH f AS (SELECT lang, n_chars AS x,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS y
        |  FROM documents WHERE text IS NOT NULL),
        |m AS (SELECT lang, count(*) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(y * y) AS BIGINT) AS syy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy
        |  FROM f GROUP BY lang)
        |SELECT lang, n,
        |  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |    (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |     sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 4)
        |    AS pearson_r
        |FROM m ORDER BY lang""".stripMargin)
}
