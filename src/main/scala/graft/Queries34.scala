package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-7 batch 18: dedup-graph topology and threshold tuning.
  *
  *  - q210 is the degree distribution of the near-dup candidate
  *    graph — the topology health check that distinguishes scattered
  *    pairs (fine) from a forming giant component (a boilerplate
  *    flood the q143/q157 caps exist for).
  *  - q211 sweeps the Jaccard threshold over the SAME materialized
  *    pair statistics and reports pairs/docs affected per cutoff —
  *    the tuning table a dedup threshold is actually chosen from.
  */
object Queries34 {
  import Tables._

  /** q210 — DUP-GRAPH DEGREE DISTRIBUTION. Per-document degree in
    * the LSH candidate-pair graph, histogrammed, with the isolated
    * documents as an explicit degree-0 row. A heavy tail here is the
    * early warning the q144/q158 profiles quantify: one more crawl
    * of the same boilerplate and the giant component eats the
    * corpus.
    *
    * Scale: rides the materialized LshStages pair stage (banded +
    * capped — degree is bounded by construction, never all-pairs);
    * the histogram is two tiny aggregates and a 1-row broadcast for
    * the isolated count.
    */
  def q210(s: SparkSession, d: String): DataFrame = {
    // Round 17 (VERDICT r16 #1, guide §2.4): the old form consumed
    // `deg` twice — hist AND a second full union+groupBy(doc_id)
    // pass for the n_paired broadcast (column pruning made the two
    // aggregates non-canonical, so ReusedExchange could not dedup
    // them; the before-plan carries both chains plus a documents
    // count and a BroadcastNestedLoopJoin). One pass instead:
    // pair endpoints carry weight 1 (explode reads the cached pair
    // stage ONCE, not once per side), every document carries weight
    // 0, and sum(w) per doc_id IS the degree — isolated documents
    // fall out as the degree-0 histogram row with no join-back.
    // Equivalence: endpoints ⊆ documents (LSH pairs are built from
    // the corpus), doc_id is unique in documents, so sum(w) per doc
    // == the old endpoint count and |degree=0 docs| == n_total −
    // n_paired; the old always-emitted degree-0 row is non-empty on
    // any corpus with ≥1 isolated doc (true at every declared SF,
    // oracle-checked — a fully-paired corpus would be the q143/q157
    // flood the caps exist to prevent).
    val pairs = LshStages.candidatePairs(s, d)
    val endpoints = pairs.select(
      explode(array(col("a_id"), col("b_id"))).as("doc_id"),
      lit(1L).as("w"))
    val und = endpoints.unionAll(
      documents(s, d).select(col("doc_id"), lit(0L).as("w")))
    und.groupBy(col("doc_id")).agg(sum(col("w")).as("degree"))
      .groupBy(col("degree")).agg(count(lit(1)).as("n_docs"))
      .orderBy(col("degree"))
  }

  /** q211 — JACCARD THRESHOLD SWEEP. Candidate pairs and affected
    * documents at cutoffs 0.1 / 0.3 / 0.5 / 0.7 / 0.9, from ONE
    * materialized pair-statistics pass (the q37/q90 shared stage).
    * The table a production threshold is chosen from: too low melts
    * the cluster stage, too high leaves near-dups in the training
    * mix.
    *
    * Scale: the expensive part (the inverted-index pair stats) is
    * computed once and shared; the sweep is a 5-way conditional
    * aggregate over pair rows — thresholds cost nothing extra. The
    * unrounded jaccard doubles are integer-ratio exact on both
    * engines, so the threshold comparisons agree everywhere.
    */
  def q211(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val jac = LshStages.ngramStats(s, d)
      .withColumn("jaccard", col("inter").cast("double") /
        (col("na") + col("nb") - col("inter")).cast("double"))
    jac.crossJoin(broadcast(
        Seq(0.1, 0.3, 0.5, 0.7, 0.9).toDF("threshold")))
      .filter(col("jaccard") >= col("threshold"))
      .groupBy(col("threshold"))
      .agg(count(lit(1)).as("n_pairs"),
        count_distinct(col("a_id")).as("n_a_docs"))
      .orderBy(col("threshold"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q210_dup_graph_degrees" -> (q210 _),
    "q211_jaccard_sweep" -> (q211 _))
}

/** DuckDB mirrors of Queries34 — q210 splices the shared pair
  * pipeline, q211 the shared unrounded-jaccard chain.
  */
object Oracle34 {

  val sql: Map[String, String] = Map(
    "q210_dup_graph_degrees" ->
      s"""WITH ${OracleExt.lshPairCtes},
         |und AS (SELECT a_id AS doc_id FROM pairs
         |        UNION ALL SELECT b_id FROM pairs),
         |deg AS (SELECT doc_id, count(*) AS degree FROM und
         |  GROUP BY doc_id),
         |hist AS (SELECT degree, count(*) AS n_docs FROM deg
         |  GROUP BY degree),
         |iso AS (SELECT CAST(0 AS BIGINT) AS degree,
         |    (SELECT count(*) FROM documents)
         |      - (SELECT count(*) FROM deg) AS n_docs)
         |SELECT degree, CAST(n_docs AS BIGINT) AS n_docs FROM hist
         |UNION ALL SELECT degree, CAST(n_docs AS BIGINT) FROM iso
         |ORDER BY degree""".stripMargin,

    "q211_jaccard_sweep" ->
      s"""WITH ${OracleExt.ngramJacCtes},
         |th AS (SELECT unnest([0.1, 0.3, 0.5, 0.7, 0.9]) AS threshold)
         |SELECT CAST(th.threshold AS DOUBLE) AS threshold,
         |  count(*) AS n_pairs,
         |  count(DISTINCT jac.a_id) AS n_a_docs
         |FROM jac JOIN th ON jac.jaccard >= th.threshold
         |GROUP BY th.threshold ORDER BY threshold""".stripMargin)
}
