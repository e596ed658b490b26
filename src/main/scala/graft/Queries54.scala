package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 batch 18: optimal 1-D segmentation, entity-resolution
  * blocking quality, and rolling cross-series correlation
  * (SURVEY §2.8 X168-X170).
  */
object Queries54 {
  import Tables._

  /** q258 — JENKS NATURAL BREAKS, k=3 (X168). The optimal 3-segment
    * partition of the 20-bin order-price histogram minimizing total
    * within-segment SSE (Fisher 1958; Jenks 1967) — the
    * goodness-of-fit answer to "where should the price tiers
    * actually cut?", vs q174's equal-count and q75's equal-width
    * bins. Segment SSE comes from EXACT decimal cumulative moments
    * ((Sxx_j−Sxx_i) − (Sx_j−Sx_i)²/(N_j−N_i), one float expression
    * per candidate); with 20 bins the candidate space is the FULL
    * C(19,2) = 171 break-pair grid, searched directly — no DP
    * recursion, so plan and oracle are plain joins. Argmin ranks the
    * 6dp-rounded total with the break pair as tiebreak.
    *
    * Scale: one orders pass into 20-bin moments; the search grid is
    * bin-bounded (171 rows), never data-bounded.
    */
  def q258(s: SparkSession, d: String): DataFrame = {
    val cum = orders(s, d)
      .select(floor(col("o_totalprice") / 25000).cast("long").as("bin"),
        col("o_totalprice").cast("decimal(18,2)").as("x"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum((col("x") * col("x")).cast("decimal(38,4)")).as("sxx"))
      .withColumn("cn", sum(col("n")).over(Window.orderBy(col("bin"))
        .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("csx", sum(col("sx")).over(Window.orderBy(col("bin"))
        .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("csxx", sum(col("sxx")).over(Window.orderBy(col("bin"))
        .rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("bin"), col("cn"), col("csx").cast("double").as("csx"),
        col("csxx").cast("double").as("csxx"))
    val maxBin = 19L
    // boundary row for the empty prefix
    val bounds = cum.select(col("bin"), col("cn"), col("csx"), col("csxx"))
      .unionAll(cum.sparkSession.range(1).select(lit(-1L).as("bin"),
        lit(0L).as("cn"), lit(0.0).as("csx"), lit(0.0).as("csxx")))
    def sse(iCol: String, jCol: String): DataFrame = {
      val i = bounds.select(col("bin").as(s"ib"), col("cn").as("icn"),
        col("csx").as("icsx"), col("csxx").as("icsxx"))
      val j = bounds.select(col("bin").as(s"jb"), col("cn").as("jcn"),
        col("csx").as("jcsx"), col("csxx").as("jcsxx"))
      i.join(j, col("ib") < col("jb"))
        .filter(col("jcn") > col("icn"))
        .select(col("ib").as(iCol), col("jb").as(jCol),
          ((col("jcsxx") - col("icsxx")) -
            (col("jcsx") - col("icsx")) * (col("jcsx") - col("icsx")) /
              (col("jcn") - col("icn")).cast("double")).as("sse"),
          (col("jcn") - col("icn")).as("seg_n"))
    }
    val s1 = sse("lo0", "b1").filter(col("lo0") === -1L)
      .select(col("b1"), col("sse").as("sse1"), col("seg_n").as("n1"))
    val s2 = sse("b1", "b2")
      .select(col("b1"), col("b2"), col("sse").as("sse2"),
        col("seg_n").as("n2"))
    val s3 = sse("b2", "hi")
      .filter(col("hi") === maxBin)
      .select(col("b2"), col("sse").as("sse3"), col("seg_n").as("n3"))
    // REPORTED values are per-row variances (≈1e9), where a 2dp round
    // sits far above double ulp; the raw ~1e13 SSE totals stay the
    // ARGMIN key (candidate gaps ≫ ulp) but must never be emitted
    // 4dp-rounded — at that magnitude round() IS the ulp and the two
    // engines' rounding paths visibly disagree (measured).
    val best = s1.join(s2, Seq("b1")).join(s3, Seq("b2"))
      .withColumn("total_sse", col("sse1") + col("sse2") + col("sse3"))
      .orderBy(col("total_sse"), col("b1"), col("b2"))
      .limit(1)
    best.select(
        explode(expr(
          """array(
            |  named_struct('segment', 1L, 'lo_bin', 0L, 'hi_bin', b1,
            |    'n', n1, 'within_var', round(sse1 / n1, 2)),
            |  named_struct('segment', 2L, 'lo_bin', b1 + 1, 'hi_bin', b2,
            |    'n', n2, 'within_var', round(sse2 / n2, 2)),
            |  named_struct('segment', 3L, 'lo_bin', b2 + 1, 'hi_bin', 19L,
            |    'n', n3, 'within_var', round(sse3 / n3, 2)))"""
            .stripMargin)).as("g"),
        round(col("total_sse") / (col("n1") + col("n2") + col("n3")), 2)
          .as("total_mse"))
      .select(col("g.segment").as("segment"), col("g.lo_bin").as("lo_bin"),
        col("g.hi_bin").as("hi_bin"), col("g.n").as("n"),
        col("g.within_var").as("within_var"), col("total_mse"))
      .orderBy(col("segment"))
  }

  /** q259 — BLOCKING QUALITY EVALUATION (X169). The two standard
    * entity-resolution blocking metrics (Christen 2012) for the LSH
    * candidate generator the dedup family rides: PAIR COMPLETENESS
    * against a blocking-INDEPENDENT truth set (docs sharing the md5
    * of their first 200 chars — exhaustive, hash-grouped, no
    * quadratic scan) and REDUCTION RATIO against the C(n,2) full
    * comparison space. The op that answers "is the q46 banding
    * recall-safe, and what did it save?" — measured, not assumed.
    *
    * Scale: truth pairs expand in-row per hash group (group-size
    * bounded); the intersection is one equi-join of two pair sets;
    * C(n,2) is computed from the 1-row count, never materialized.
    */
  def q259(s: SparkSession, d: String): DataFrame = {
    val cand = LshStages.candidatePairs(s, d)
      .select(col("a_id"), col("b_id"))
    val truth = documents(s, d)
      .select(col("doc_id"), md5(substring(col("text"), 1, 200)).as("h"))
      .groupBy(col("h"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) >= 2)
      .select(explode(expr(
        "flatten(transform(ids, (x, i) -> " +
          "transform(slice(ids, i + 2, size(ids)), y -> " +
          "struct(x AS a_id, y AS b_id))))")).as("p"))
      .select(col("p.a_id"), col("p.b_id"))
    val nDocs = documents(s, d).agg(count(lit(1)).as("n_docs"))
    val nCand = cand.agg(count(lit(1)).as("n_cand"))
    val nTruth = truth.agg(count(lit(1)).as("n_true"))
    val nFound = truth.join(cand, Seq("a_id", "b_id"), "left_semi")
      .agg(count(lit(1)).as("n_found"))
    nDocs.crossJoin(broadcast(nCand)).crossJoin(broadcast(nTruth))
      .crossJoin(broadcast(nFound))
      .select(col("n_docs"), col("n_cand"), col("n_true"), col("n_found"),
        round(col("n_found").cast("double") / col("n_true"), 4)
          .as("pair_completeness"),
        round(lit(1.0) - col("n_cand").cast("double") * 2 /
          (col("n_docs") * (col("n_docs") - 1)).cast("double"), 6)
          .as("reduction_ratio"))
  }

  /** q260 — ROLLING CROSS-SERIES CORRELATION (X170). 14-day rolling
    * Pearson correlation between the click and purchase daily count
    * series — the co-movement monitor that q230's rolling slope
    * (one series) and q207's static correlation screen (no window)
    * cannot express. All six windowed moments are EXACT integer
    * sums; r is one float expression per day, NULL below 3 points
    * (degenerate window) or zero variance.
    *
    * Scale: one fact pass into the daily two-column series; the
    * rolling windows run on ≤\|days\| rows.
    */
  def q260(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
        .as("x"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("y"))
    val w = Window.orderBy(col("day")).rowsBetween(-13, 0)
    daily
      .withColumn("nw", count(lit(1)).over(w))
      .withColumn("sx", sum(col("x")).over(w))
      .withColumn("sy", sum(col("y")).over(w))
      .withColumn("sxy", sum(col("x") * col("y")).over(w))
      .withColumn("sxx", sum(col("x") * col("x")).over(w))
      .withColumn("syy", sum(col("y") * col("y")).over(w))
      .select(col("day"), col("nw").as("n_win"),
        when(col("nw") >= 3 &&
          col("nw") * col("sxx") > col("sx") * col("sx") &&
          col("nw") * col("syy") > col("sy") * col("sy"),
          round((col("nw") * col("sxy") - col("sx") * col("sy"))
            .cast("double") /
            (sqrt((col("nw") * col("sxx") - col("sx") * col("sx"))
              .cast("double")) *
             sqrt((col("nw") * col("syy") - col("sy") * col("sy"))
               .cast("double"))), 4)).as("rolling_corr"))
      .orderBy(col("day"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q258_natural_breaks" -> (q258 _),
    "q259_blocking_quality" -> (q259 _),
    "q260_rolling_corr" -> (q260 _))
}

/** DuckDB mirrors of Queries54 — the same cumulative-moment SSE grid,
  * the OracleExt lshPairCtes candidates, identical integer windows.
  */
object Oracle54 {

  val sql: Map[String, String] = Map(
    "q258_natural_breaks" ->
      """WITH binned AS (
        |  SELECT CAST(floor(o_totalprice / 25000) AS BIGINT) AS bin,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS x
        |  FROM orders),
        |mom AS (SELECT bin, count(*) AS n, sum(x) AS sx,
        |    sum(CAST(x * x AS DECIMAL(38,4))) AS sxx
        |  FROM binned GROUP BY bin),
        |cum AS (SELECT bin,
        |    CAST(sum(n) OVER (ORDER BY bin
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cn,
        |    CAST(sum(sx) OVER (ORDER BY bin
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |      AS csx,
        |    CAST(sum(sxx) OVER (ORDER BY bin
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |      AS csxx
        |  FROM mom),
        |bounds AS (SELECT bin, cn, csx, csxx FROM cum
        |  UNION ALL SELECT -1, 0, 0.0, 0.0),
        |sse AS (SELECT i.bin AS ib, j.bin AS jb,
        |    (j.csxx - i.csxx) - (j.csx - i.csx) * (j.csx - i.csx) /
        |      CAST(j.cn - i.cn AS DOUBLE) AS sse,
        |    j.cn - i.cn AS seg_n
        |  FROM bounds i JOIN bounds j ON i.bin < j.bin
        |  WHERE j.cn > i.cn),
        |s1 AS (SELECT jb AS b1, sse AS sse1, seg_n AS n1 FROM sse
        |  WHERE ib = -1),
        |s2 AS (SELECT ib AS b1, jb AS b2, sse AS sse2, seg_n AS n2
        |  FROM sse),
        |s3 AS (SELECT ib AS b2, sse AS sse3, seg_n AS n3 FROM sse
        |  WHERE jb = 19),
        |best AS (SELECT s1.b1, s2.b2, s1.sse1, s2.sse2, s3.sse3,
        |    s1.n1, s2.n2, s3.n3,
        |    s1.sse1 + s2.sse2 + s3.sse3 AS total_sse
        |  FROM s1 JOIN s2 USING (b1) JOIN s3 USING (b2)
        |  ORDER BY total_sse, s1.b1, s2.b2 LIMIT 1)
        |SELECT seg.segment, seg.lo_bin, seg.hi_bin, seg.n, seg.within_var,
        |  round(b.total_sse / (b.n1 + b.n2 + b.n3), 2) AS total_mse
        |FROM best b, LATERAL (
        |  SELECT 1 AS segment, CAST(0 AS BIGINT) AS lo_bin, b.b1 AS hi_bin,
        |    CAST(b.n1 AS BIGINT) AS n, round(b.sse1 / b.n1, 2)
        |      AS within_var
        |  UNION ALL SELECT 2, b.b1 + 1, b.b2, CAST(b.n2 AS BIGINT),
        |    round(b.sse2 / b.n2, 2)
        |  UNION ALL SELECT 3, b.b2 + 1, CAST(19 AS BIGINT),
        |    CAST(b.n3 AS BIGINT), round(b.sse3 / b.n3, 2)) seg
        |ORDER BY seg.segment""".stripMargin,

    "q259_blocking_quality" ->
      s"""WITH ${OracleExt.lshPairCtes},
         |truth_g AS (SELECT md5(substring(text, 1, 200)) AS h,
         |    list_sort(list(doc_id)) AS ids
         |  FROM documents GROUP BY 1 HAVING count(*) >= 2),
         |tp AS (SELECT ids[i] AS a_id, ids[j] AS b_id
         |  FROM truth_g,
         |    LATERAL unnest(range(1, len(ids) + 1)) AS r1(i),
         |    LATERAL unnest(range(1, len(ids) + 1)) AS r2(j)
         |  WHERE i < j),
         |nd AS (SELECT count(*) AS n_docs FROM documents),
         |nc AS (SELECT count(*) AS n_cand FROM pairs),
         |nt AS (SELECT count(*) AS n_true FROM tp),
         |nf AS (SELECT count(*) AS n_found FROM tp
         |  JOIN pairs p ON p.a_id = tp.a_id AND p.b_id = tp.b_id)
         |SELECT nd.n_docs, nc.n_cand, nt.n_true, nf.n_found,
         |  round(CAST(nf.n_found AS DOUBLE) / nt.n_true, 4)
         |    AS pair_completeness,
         |  round(1.0 - CAST(nc.n_cand AS DOUBLE) * 2 /
         |    CAST(nd.n_docs * (nd.n_docs - 1) AS DOUBLE), 6)
         |    AS reduction_ratio
         |FROM nd, nc, nt, nf""".stripMargin,

    "q260_rolling_corr" ->
      """WITH daily AS (
        |  SELECT (epoch_ns(ts) // 1000) // 86400000000 AS day,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS y
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |  GROUP BY 1),
        |win AS (SELECT day,
        |    CAST(count(*) OVER w AS BIGINT) AS nw,
        |    CAST(sum(x) OVER w AS BIGINT) AS sx,
        |    CAST(sum(y) OVER w AS BIGINT) AS sy,
        |    CAST(sum(x * y) OVER w AS BIGINT) AS sxy,
        |    CAST(sum(x * x) OVER w AS BIGINT) AS sxx,
        |    CAST(sum(y * y) OVER w AS BIGINT) AS syy
        |  FROM daily
        |  WINDOW w AS (ORDER BY day ROWS BETWEEN 13 PRECEDING
        |    AND CURRENT ROW))
        |SELECT day, nw AS n_win,
        |  CASE WHEN nw >= 3 AND nw * sxx > sx * sx AND nw * syy > sy * sy
        |    THEN round(CAST(nw * sxy - sx * sy AS DOUBLE) /
        |      (sqrt(CAST(nw * sxx - sx * sx AS DOUBLE)) *
        |       sqrt(CAST(nw * syy - sy * sy AS DOUBLE))), 4)
        |  END AS rolling_corr
        |FROM win ORDER BY day""".stripMargin)
}
