package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 batch 23: community quality and population estimation
  * (SURVEY §2.8 X181-X182).
  */
object Queries59 {
  import Tables._

  /** q271 — NEWMAN MODULARITY OF THE LPA COMMUNITIES (X181).
    * Q = Σ_c [ l_c/m − (d_c/2m)² ] over q222's 4-round LPA labeling
    * of the support-2 co-order graph (Newman & Girvan 2004) — the
    * quality score that says whether the communities q222 reports
    * are actually denser than chance (Q ≈ 0 means the partition is
    * noise); evaluates a clustering the way q261's silhouette
    * evaluates the embedding labels. In directed-count form every
    * input is an EXACT integer (within-edge count, degree sums,
    * 2m = |directed edges|); per-community terms are 8dp-rounded
    * into decimal and summed exactly, so Q is order-independent.
    *
    * Scale: reuses the persisted edge list AND the persisted LPA
    * label table (shared with q222 — the two queries cannot drift);
    * two broadcast label joins + a ≤|communities|-row aggregate.
    */
  def q271(s: SparkSession, d: String): DataFrame = {
    val ed = Queries40.coOrderEdges(s, d)
    val labels = Queries40.lpaLabels(s, d)
    val lu = labels.select(col("node").as("u"), col("lbl").as("lbl_u"))
    val lv = labels.select(col("node").as("v"), col("lbl").as("lbl_v"))
    val tagged = ed.join(broadcast(lu), Seq("u"))
      .join(broadcast(lv), Seq("v"))
    val mDir = tagged.agg(count(lit(1)).as("m_dir"))
    val within = tagged.filter(col("lbl_u") === col("lbl_v"))
      .groupBy(col("lbl_u").as("lbl"))
      .agg(count(lit(1)).as("l_dir"))
    val degSum = tagged.groupBy(col("lbl_u").as("lbl"))
      .agg(count(lit(1)).as("d_c"))
    val terms = degSum.join(within, Seq("lbl"), "left")
      .withColumn("l_dir", coalesce(col("l_dir"), lit(0L)))
      .crossJoin(broadcast(mDir))
      .withColumn("term",
        round(col("l_dir").cast("double") / col("m_dir") -
          (col("d_c").cast("double") / col("m_dir")) *
          (col("d_c").cast("double") / col("m_dir")), 8)
          .cast("decimal(18,8)"))
    val nNodes = labels.agg(count(lit(1)).as("n_nodes"))
    terms.agg(count(lit(1)).as("n_communities"),
        sum(col("term")).as("q_dec"),
        max(col("m_dir")).as("m_dir"))
      .crossJoin(broadcast(nNodes))
      .select(col("n_nodes"), expr("m_dir div 2").as("n_edges"),
        col("n_communities"),
        round(col("q_dec").cast("double"), 4).as("modularity"))
  }

  /** q272 — CAPTURE-RECAPTURE POPULATION ESTIMATE (X182). Chapman's
    * bias-corrected Lincoln-Petersen estimator over two 10-day
    * observation windows: N̂ = (n₁+1)(n₂+1)/(m+1) − 1, where m is
    * the users seen in BOTH windows — the ecology estimator data
    * teams reuse to size a population (true user base, total
    * duplicate mass) from overlapping partial observations without
    * scanning everything. All counts are exact distinct integers;
    * N̂ is one float expression, scored against the true distinct
    * total.
    *
    * Scale: two distinct-user aggregates + one semi-join for the
    * overlap; windows are calendar predicates pushed to the scan.
    */
  def q272(s: SparkSession, d: String): DataFrame = {
    val days = events(s, d)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
    val d0 = days.agg(min(col("day")).as("d0"))
    // ONE distinct-user pass computes every count the estimator needs
    // (round 16, guide §2.3 — aggregate before you shuffle): per user,
    // window-membership flags from a single groupBy, then n1/n2/m/N
    // fall out of one 1-row sum — the old two DISTINCTs + semi-join +
    // third DISTINCT shuffled the user set four times and re-ran the
    // fact scan per branch (12 AQE stage-jobs, 18 in-plan fact scans;
    // plans/r16/q272_capture_recapture_before.txt). Exact same
    // integers: max(flag) per user == set membership.
    val stats = days.crossJoin(broadcast(d0))
      .groupBy(col("user_id"))
      .agg(max(when(col("day") < col("d0") + 10, 1L).otherwise(0L))
          .as("in1"),
        max(when(col("day") >= col("d0") + 10 &&
          col("day") < col("d0") + 20, 1L).otherwise(0L)).as("in2"))
      .agg(sum(col("in1")).as("n1"), sum(col("in2")).as("n2"),
        sum(col("in1") * col("in2")).as("n_both"),
        count(lit(1)).as("n_total"))
    stats
      .select(col("n1"), col("n2"), col("n_both"), col("n_total"),
        round((col("n1") + 1).cast("double") * (col("n2") + 1) /
          (col("n_both") + 1) - 1.0, 2).as("n_hat"),
        round(abs((col("n1") + 1).cast("double") * (col("n2") + 1) /
          (col("n_both") + 1) - 1.0 - col("n_total")) /
          col("n_total"), 4).as("rel_err"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q271_modularity" -> (q271 _),
    "q272_capture_recapture" -> (q272 _))
}

/** DuckDB mirrors of Queries59 — the SAME lpaCtes label chain as
  * q222's oracle, exact distinct counts.
  */
object Oracle59 {

  val sql: Map[String, String] = Map(
    "q271_modularity" ->
      s"""WITH ${Oracle40.lpaCtes(4)},
         |tg AS (SELECT ed.u, ed.v, lu.lbl AS lbl_u, lv.lbl AS lbl_v
         |  FROM ed
         |  JOIN l4 lu ON lu.node = ed.u
         |  JOIN l4 lv ON lv.node = ed.v),
         |md AS (SELECT count(*) AS m_dir FROM tg),
         |wi AS (SELECT lbl_u AS lbl, count(*) AS l_dir FROM tg
         |  WHERE lbl_u = lbl_v GROUP BY 1),
         |ds AS (SELECT lbl_u AS lbl, count(*) AS d_c FROM tg GROUP BY 1),
         |terms AS (SELECT ds.lbl,
         |    CAST(round(CAST(coalesce(wi.l_dir, 0) AS DOUBLE) / md.m_dir -
         |      (CAST(ds.d_c AS DOUBLE) / md.m_dir) *
         |      (CAST(ds.d_c AS DOUBLE) / md.m_dir), 8) AS DECIMAL(18,8))
         |      AS term
         |  FROM ds LEFT JOIN wi USING (lbl) CROSS JOIN md),
         |nn AS (SELECT count(*) AS n_nodes FROM l4)
         |SELECT nn.n_nodes,
         |  CAST((SELECT m_dir FROM md) / 2 AS BIGINT) AS n_edges,
         |  count(*) AS n_communities,
         |  round(CAST(sum(terms.term) AS DOUBLE), 4) AS modularity
         |FROM terms, nn GROUP BY nn.n_nodes""".stripMargin,

    "q272_capture_recapture" ->
      """WITH days AS (
        |  SELECT user_id, (epoch_ns(ts) // 1000) // 86400000000 AS day
        |  FROM events),
        |d0 AS (SELECT min(day) AS d0 FROM days),
        |w1 AS (SELECT DISTINCT user_id FROM days, d0
        |  WHERE day < d0 + 10),
        |w2 AS (SELECT DISTINCT user_id FROM days, d0
        |  WHERE day >= d0 + 10 AND day < d0 + 20),
        |n1 AS (SELECT count(*) AS n1 FROM w1),
        |n2 AS (SELECT count(*) AS n2 FROM w2),
        |m AS (SELECT count(*) AS n_both FROM w1
        |  WHERE user_id IN (SELECT user_id FROM w2)),
        |tot AS (SELECT count(DISTINCT user_id) AS n_total FROM days)
        |SELECT n1, n2, n_both, n_total,
        |  round(CAST(n1 + 1 AS DOUBLE) * (n2 + 1) / (n_both + 1) - 1.0, 2)
        |    AS n_hat,
        |  round(abs(CAST(n1 + 1 AS DOUBLE) * (n2 + 1) / (n_both + 1)
        |    - 1.0 - n_total) / n_total, 4) AS rel_err
        |FROM n1, n2, m, tot""".stripMargin)
}
