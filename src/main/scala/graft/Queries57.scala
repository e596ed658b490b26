package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 batch 21: lexical burstiness, Pareto inventory classes,
  * and parametric gap-distribution fitting (SURVEY §2.8 X177-X179).
  */
object Queries57 {
  import Tables._

  /** q267 — TERM BURSTINESS (X177). Church-Gale burstiness for the
    * 20 highest-df terms: the variance-to-mean ratio of per-document
    * term counts (computed over ALL docs, zeros included, via the
    * identity Σ(c−c̄)² = Σc² − (Σc)²/N with zero docs contributing
    * only to N) — VMR ≈ 1 is Poisson scatter, VMR ≫ 1 marks topical
    * "bursty" terms; the lexical statistic TF-IDF and PMI (q70/q148)
    * summarize away. Σc and Σc² are EXACT integers; VMR is one float
    * expression.
    *
    * Scale: one tokenize pass into (term, doc) counts, a 20-term
    * broadcast head set, and a ≤20-row moment aggregate; the
    * zero-doc mass enters through N, never through materialized
    * zero rows.
    */
  def q267(s: SparkSession, d: String): DataFrame = {
    val tk = documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val tf = tk.groupBy(col("tok"), col("doc_id"))
      .agg(count(lit(1)).as("c"))
      // head selection AND scoring both read tf — materialized so the
      // tokenize+count pass runs once per execution, not twice
      .transform(Materialize.truncate)
    val head = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("tok")).limit(20)
    val nDocs = documents(s, d).agg(count(lit(1)).as("n_docs"))
    tf.join(broadcast(head), Seq("tok"))
      .groupBy(col("tok"), col("df"))
      .agg(sum(col("c")).as("sc"),
        sum(col("c") * col("c")).as("scc"))
      .crossJoin(broadcast(nDocs))
      .select(col("tok"), col("df"), col("sc").as("total_tf"),
        round(col("sc").cast("double") / col("n_docs"), 6).as("mean_tf"),
        // VMR = (Σc² − (Σc)²/N) / Σc  — population variance over all
        // N docs (zeros included) divided by the mean
        round((col("scc").cast("double") -
          col("sc").cast("double") * col("sc").cast("double") /
            col("n_docs")) / col("sc").cast("double"), 4)
          .as("burstiness"))
      .orderBy(col("burstiness").desc, col("tok"))
  }

  /** q268 — ABC INVENTORY CLASSIFICATION (X178). Pareto classes of
    * parts by lineitem revenue: A = the top parts covering 80% of
    * revenue, B = next 15%, C = the tail — the classic
    * inventory-control split (Pareto/Dixie 1950s ops practice).
    * Class boundaries compare EXACT decimal cumulative revenue
    * against decimal thresholds (cum·100 ≤ total·80 — integer-style
    * cross-multiplication in decimal, no float share anywhere);
    * revenue ranks break ties by part key.
    *
    * Scale: one lineitem pass into per-part revenue; ranking windows
    * run on the |parts| aggregate; the report is a 3-row rollup.
    */
  def q268(s: SparkSession, d: String): DataFrame = {
    val rev = lineitem(s, d)
      .groupBy(col("l_partkey"))
      .agg(round(sum((col("l_extendedprice") *
        (lit(1.0) - col("l_discount"))).cast("decimal(38,10)")), 4)
        .cast("decimal(28,4)").as("rev"))
    // Round 17 (VERDICT r16 #5): the running/total revenue windows
    // over |parts| rows planned single-partition WindowExecs
    // UNCONDITIONALLY — a fact-scale serialization point at 10^8+
    // parts. ScaleRank's adaptive cumsum twin keeps the window under
    // the 64 MB size estimate and distributes above it (disjoint
    // ordered ranges, per-range partial sums → broadcast offsets,
    // per-range local running sum). Decimal addition is exact and
    // associative, so every cum/tot digit is identical either way.
    val classed = ScaleRank.withGlobalCumsumAuto(rev, col("rev"),
        "cum", "tot", col("rev").desc, col("l_partkey"))
      .withColumn("cls",
        when(col("cum") * 100 <= col("tot") * 80, "A")
          .when(col("cum") * 100 <= col("tot") * 95, "B")
          .otherwise("C"))
    classed.groupBy(col("cls"))
      .agg(count(lit(1)).as("n_parts"),
        round(sum(col("rev")).cast("double"), 4).as("class_revenue"),
        round(sum(col("rev")).cast("double") /
          max(col("tot")).cast("double"), 4).as("revenue_share"))
      .orderBy(col("cls"))
  }

  /** q269 — EXPONENTIAL INTER-PURCHASE FIT (X179). Fits the
    * exponential distribution to per-user purchase gaps by MLE
    * (λ̂ = 1/mean gap — the one-parameter fit with a closed form)
    * and scores it with the one-sample KS distance at the observed
    * gap hours: D = max |ECDF(x) − (1 − e^(−λx))| — q238's
    * two-sample machinery turned parametric. ECDF ranks are exact
    * integers; the model CDF is one exp() per distinct hour, rounded
    * before the max so the argmax compares 6dp-stable values.
    *
    * Scale: one user-ordered window pass for gaps, an hour-bucketed
    * ECDF aggregate (grid-bounded), a 1-row broadcast λ.
    */
  def q269(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("t"), col("event_id"))
    val gaps = events(s, d)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(ts)").as("t"))
      .withColumn("prev", lag(col("t"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(expr("(t - prev) div 3600000000").as("gap_h"))
    val lam = gaps.agg(count(lit(1)).as("n"),
      sum(col("gap_h")).as("sg"))
      .select(col("n"),
        (col("n").cast("double") / col("sg").cast("double")).as("lambda"))
    val ecdf = gaps.groupBy(col("gap_h")).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(Window.orderBy(col("gap_h"))
        .rowsBetween(Window.unboundedPreceding, 0)))
    val scored = ecdf.crossJoin(broadcast(lam))
      .withColumn("ecdf", col("cum").cast("double") / col("n"))
      .withColumn("model",
        lit(1.0) - exp(-col("lambda") * (col("gap_h") + 1).cast("double")))
      .withColumn("gap_d", round(abs(col("ecdf") - col("model")), 6))
    scored.orderBy(col("gap_d").desc, col("gap_h")).limit(1)
      .select(col("n").as("n_gaps"),
        round(col("lambda"), 6).as("lambda_per_hour"),
        col("gap_h").as("at_hour"),
        col("gap_d").as("ks_distance"),
        round(lit(1.358) * sqrt(lit(2.0) / col("n").cast("double")), 6)
          .as("crit_05_two_sample_scale"),
        when(col("gap_d") >
          round(lit(1.358) * sqrt(lit(2.0) / col("n").cast("double")), 6),
          "poor_fit").otherwise("adequate_fit").as("verdict"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q267_term_burstiness" -> (q267 _),
    "q268_abc_classes" -> (q268 _),
    "q269_interpurchase_fit" -> (q269 _))
}

/** DuckDB mirrors of Queries57 — integer moment identities, decimal
  * cross-multiplied class boundaries, the same rounded KS argmax.
  */
object Oracle57 {

  val sql: Map[String, String] = Map(
    "q267_term_burstiness" ->
      """WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |tf AS (SELECT tok, doc_id, count(*) AS c FROM tk
        |  GROUP BY tok, doc_id),
        |head AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok
        |  ORDER BY df DESC, tok LIMIT 20),
        |nd AS (SELECT count(*) AS n_docs FROM documents),
        |m AS (SELECT tf.tok, h.df,
        |    CAST(sum(tf.c) AS BIGINT) AS sc,
        |    CAST(sum(tf.c * tf.c) AS BIGINT) AS scc
        |  FROM tf JOIN head h USING (tok)
        |  GROUP BY tf.tok, h.df)
        |SELECT tok, df, sc AS total_tf,
        |  round(CAST(sc AS DOUBLE) / nd.n_docs, 6) AS mean_tf,
        |  round((CAST(scc AS DOUBLE) -
        |    CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE) / nd.n_docs) /
        |    CAST(sc AS DOUBLE), 4) AS burstiness
        |FROM m, nd ORDER BY burstiness DESC, tok""".stripMargin,

    "q268_abc_classes" ->
      """WITH rev AS (
        |  SELECT l_partkey,
        |    CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount)
        |      AS DECIMAL(38,10))), 4) AS DECIMAL(28,4)) AS rev
        |  FROM lineitem GROUP BY l_partkey),
        |c AS (SELECT l_partkey, rev,
        |    sum(rev) OVER (ORDER BY rev DESC, l_partkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(rev) OVER () AS tot
        |  FROM rev),
        |k AS (SELECT *,
        |    CASE WHEN cum * 100 <= tot * 80 THEN 'A'
        |         WHEN cum * 100 <= tot * 95 THEN 'B'
        |         ELSE 'C' END AS cls
        |  FROM c)
        |SELECT cls, count(*) AS n_parts,
        |  round(CAST(sum(rev) AS DOUBLE), 4) AS class_revenue,
        |  round(CAST(sum(rev) AS DOUBLE) / CAST(max(tot) AS DOUBLE), 4)
        |    AS revenue_share
        |FROM k GROUP BY cls ORDER BY cls""".stripMargin,

    "q269_interpurchase_fit" ->
      """WITH p AS (
        |  SELECT user_id, event_id, epoch_ns(ts) // 1000 AS t
        |  FROM events WHERE event_type = 'purchase'),
        |g AS (SELECT (t - lag(t, 1) OVER (PARTITION BY user_id
        |    ORDER BY t, event_id)) // 3600000000 AS gap_h
        |  FROM p QUALIFY gap_h IS NOT NULL),
        |lam AS (SELECT count(*) AS n,
        |    CAST(count(*) AS DOUBLE) / CAST(sum(gap_h) AS DOUBLE)
        |      AS lambda
        |  FROM g),
        |e AS (SELECT gap_h, count(*) AS c FROM g GROUP BY gap_h),
        |cum AS (SELECT gap_h,
        |    CAST(sum(c) OVER (ORDER BY gap_h
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum
        |  FROM e),
        |sc AS (SELECT cum.gap_h, lam.n, lam.lambda,
        |    round(abs(CAST(cum.cum AS DOUBLE) / lam.n -
        |      (1.0 - exp(-lam.lambda * CAST(cum.gap_h + 1 AS DOUBLE)))),
        |      6) AS gap_d
        |  FROM cum CROSS JOIN lam
        |  ORDER BY gap_d DESC, gap_h LIMIT 1)
        |SELECT n AS n_gaps, round(lambda, 6) AS lambda_per_hour,
        |  gap_h AS at_hour, gap_d AS ks_distance,
        |  round(1.358 * sqrt(2.0 / CAST(n AS DOUBLE)), 6)
        |    AS crit_05_two_sample_scale,
        |  CASE WHEN gap_d > round(1.358 * sqrt(2.0 / CAST(n AS DOUBLE)), 6)
        |    THEN 'poor_fit' ELSE 'adequate_fit' END AS verdict
        |FROM sc""".stripMargin)
}
