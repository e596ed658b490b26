package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-8 batch 19: clustering quality, observational causal
  * adjustment, and econometric elasticity (SURVEY §2.8 X171-X173).
  */
object Queries55 {
  import Tables._

  /** q261 — CENTROID SILHOUETTE SCORE (X171). Cluster-quality
    * evaluation of the embedding labels: per vector,
    * a = ‖x − μ_own‖, b = min over other labels ‖x − μ_ℓ‖,
    * s = (b − a)/max(a, b) (Rousseeuw 1987, centroid form — the
    * full-pairwise form is O(n²) by definition; the centroid form is
    * the standard scalable surrogate). Per-dim squared deviations are
    * 8dp-rounded into decimal and summed EXACTLY, so the b-argmin
    * compares exact decimals BEFORE the sqrt (monotone ⇒ same
    * winner); per-label means sum 6dp-rounded s terms exactly.
    * Completes the clustering suite: q109 builds the centroids, q206
    * audits purity, this scores geometric separation.
    *
    * Scale: |labels|·|dims| centroid table broadcast; one
    * posexplode pass + a (vec × label) join bounded by the 10-label
    * dimension.
    */
  def q261(s: SparkSession, d: String): DataFrame = {
    val dec = DecimalType(38, 18)
    val xs = embeddings(s, d)
      .select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("dim", "xf")))
      .select(col("vec_id"), col("label"), col("dim"),
        col("xf").cast("double").as("x"))
    val centroids = xs.groupBy(col("label").as("c_label"), col("dim"))
      .agg((sum(col("x").cast(dec)).cast("double") / count(lit(1)))
        .as("mu"))
    val d2 = xs.join(broadcast(centroids), Seq("dim"))
      .withColumn("term",
        round((col("x") - col("mu")) * (col("x") - col("mu")), 8)
          .cast("decimal(20,8)"))
      .groupBy(col("vec_id"), col("label"), col("c_label"))
      .agg(sum(col("term")).as("d2"))
    val own = d2.filter(col("label") === col("c_label"))
      .select(col("vec_id"), col("label"), col("d2").as("a2"))
    val other = d2.filter(col("label") =!= col("c_label"))
      .groupBy(col("vec_id"))
      .agg(min(col("d2")).as("b2"))
    val sil = own.join(other, Seq("vec_id"))
      .withColumn("a", sqrt(col("a2").cast("double")))
      .withColumn("b", sqrt(col("b2").cast("double")))
      .withColumn("s",
        round((col("b") - col("a")) / greatest(col("a"), col("b")), 6)
          .cast("decimal(10,6)"))
    sil.groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("s")).cast("double") / count(lit(1)), 4)
          .as("mean_silhouette"),
        sum(when(col("s") < 0, 1L).otherwise(0L)).as("n_misplaced"))
      .orderBy(col("label"))
  }

  /** q262 — STRATIFIED ATT ESTIMATE (X172). Average treatment effect
    * on the treated, adjusted by exact stratification (Cochran 1968
    * subclassification — the non-parametric causal adjustment that
    * needs no fitted propensity model): treatment = user-id parity,
    * outcome = event value, strata = event type; ATT = Σ_s
    * (n_ts/n_t)(ȳ_ts − ȳ_cs). The observational complement to
    * q183/q257's randomized readouts — the op for when assignment
    * was NOT random and raw means are confounded. Stratum moments
    * are exact decimal sums; each mean is one float division, and
    * the ATT weights are integer ratios.
    *
    * Scale: one events pass into a (stratum × arm) aggregate;
    * everything after is ≤|strata|-row broadcast algebra.
    */
  def q262(s: SparkSession, d: String): DataFrame = {
    val byArm = events(s, d)
      .filter(col("event_type").isNotNull)
      .groupBy(col("event_type"),
        pmod(col("user_id"), lit(2L)).as("arm"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(38,10)")).as("sx"))
    val t = byArm.filter(col("arm") === 1)
      .select(col("event_type"), col("n").as("n_t"),
        (col("sx").cast("double") / col("n")).as("mean_t"))
    val c = byArm.filter(col("arm") === 0)
      .select(col("event_type"), col("n").as("n_c"),
        (col("sx").cast("double") / col("n")).as("mean_c"))
    val strata = t.join(c, Seq("event_type"))
      .withColumn("diff", col("mean_t") - col("mean_c"))
    val att = strata
      .agg((sum(round(col("diff"), 6).cast("decimal(18,6)") *
        col("n_t").cast("decimal(19,0)")).cast("double") /
        sum(col("n_t")).cast("double")).as("att_raw"))
    strata.crossJoin(broadcast(att))
      .select(col("event_type").as("stratum"), col("n_t"), col("n_c"),
        round(col("mean_t"), 4).as("mean_t"),
        round(col("mean_c"), 4).as("mean_c"),
        round(col("diff"), 4).as("diff"),
        round(col("att_raw"), 4).as("att"))
      .orderBy(col("stratum"))
  }

  /** q263 — LOG-LOG PRICE ELASTICITY (X173). OLS of ln(mean quantity)
    * on ln(1 − discount) over the 11 discount levels — the textbook
    * constant-elasticity demand fit (slope = elasticity): "does a
    * deeper discount move volume, and by what power law?". Discount
    * levels come from integer cents (never float bucketing); the 11
    * per-level (x, y) points are floats, so every OLS moment TERM is
    * 10dp-rounded into decimal and the four moment SUMS are exact —
    * order-independent; slope/intercept/r² are the only float tail.
    *
    * Scale: one lineitem pass into an 11-level aggregate; the fit is
    * an 11-row fold.
    */
  def q263(s: SparkSession, d: String): DataFrame = {
    val dec = DecimalType(28, 10)
    val levels = lineitem(s, d)
      .groupBy(round(col("l_discount") * 100).cast("long").as("dc"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(38,10)")).as("sq"))
      .select(col("dc"), col("n"),
        log(lit(1.0) - col("dc").cast("double") / 100.0).as("x"),
        log(col("sq").cast("double") / col("n")).as("y"))
    val moms = levels.agg(count(lit(1)).as("k"),
      sum(round(col("x"), 10).cast(dec)).cast("double").as("sx"),
      sum(round(col("y"), 10).cast(dec)).cast("double").as("sy"),
      sum(round(col("x") * col("y"), 10).cast(dec)).cast("double")
        .as("sxy"),
      sum(round(col("x") * col("x"), 10).cast(dec)).cast("double")
        .as("sxx"),
      sum(round(col("y") * col("y"), 10).cast(dec)).cast("double")
        .as("syy"))
    moms.select(col("k").as("n_levels"),
        round((col("k") * col("sxy") - col("sx") * col("sy")) /
          (col("k") * col("sxx") - col("sx") * col("sx")), 4)
          .as("elasticity"),
        round((col("sy") - (col("k") * col("sxy") - col("sx") * col("sy")) /
          (col("k") * col("sxx") - col("sx") * col("sx")) * col("sx")) /
          col("k"), 4).as("intercept"),
        // (k·sxy − sx·sy)² written as an explicit product — pow() is
        // not correctly rounded and is a cross-engine hash hazard
        // (PERF.md §4 convention)
        round((col("k") * col("sxy") - col("sx") * col("sy")) *
          (col("k") * col("sxy") - col("sx") * col("sy")) /
          ((col("k") * col("sxx") - col("sx") * col("sx")) *
           (col("k") * col("syy") - col("sy") * col("sy"))), 4).as("r2"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q261_silhouette" -> (q261 _),
    "q262_stratified_att" -> (q262 _),
    "q263_price_elasticity" -> (q263 _))
}

/** DuckDB mirrors of Queries55 — exact decimal distance/moment sums,
  * identical stratum algebra.
  */
object Oracle55 {

  val sql: Map[String, String] = Map(
    "q261_silhouette" ->
      """WITH x AS (SELECT vec_id, label, r.i AS dim,
        |    CAST(embedding[CAST(r.i AS INT) + 1] AS DOUBLE) AS x
        |  FROM embeddings,
        |    LATERAL unnest(range(0, len(embedding))) AS r(i)),
        |cent AS (SELECT label AS c_label, dim,
        |    CAST(SUM(CAST(x AS DECIMAL(38,18))) AS DOUBLE) / count(*)
        |      AS mu
        |  FROM x GROUP BY label, dim),
        |d2 AS (SELECT x.vec_id, x.label, c.c_label,
        |    sum(CAST(round((x.x - c.mu) * (x.x - c.mu), 8)
        |      AS DECIMAL(20,8))) AS d2
        |  FROM x JOIN cent c USING (dim)
        |  GROUP BY x.vec_id, x.label, c.c_label),
        |own AS (SELECT vec_id, label, d2 AS a2 FROM d2
        |  WHERE label = c_label),
        |oth AS (SELECT vec_id, min(d2) AS b2 FROM d2
        |  WHERE label <> c_label GROUP BY vec_id),
        |sil AS (SELECT o.vec_id, o.label,
        |    CAST(round((sqrt(CAST(t.b2 AS DOUBLE)) -
        |      sqrt(CAST(o.a2 AS DOUBLE))) /
        |      greatest(sqrt(CAST(o.a2 AS DOUBLE)),
        |        sqrt(CAST(t.b2 AS DOUBLE))), 6) AS DECIMAL(10,6)) AS s
        |  FROM own o JOIN oth t USING (vec_id))
        |SELECT label, count(*) AS n,
        |  round(CAST(sum(s) AS DOUBLE) / count(*), 4) AS mean_silhouette,
        |  CAST(sum(CASE WHEN s < 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_misplaced
        |FROM sil GROUP BY label ORDER BY label""".stripMargin,

    "q262_stratified_att" ->
      """WITH byarm AS (
        |  SELECT event_type, user_id % 2 AS arm, count(*) AS n,
        |    sum(CAST("value" AS DECIMAL(38,10))) AS sx
        |  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT event_type, n AS n_t,
        |    CAST(sx AS DOUBLE) / n AS mean_t
        |  FROM byarm WHERE arm = 1),
        |c AS (SELECT event_type, n AS n_c,
        |    CAST(sx AS DOUBLE) / n AS mean_c
        |  FROM byarm WHERE arm = 0),
        |st AS (SELECT t.event_type, t.n_t, c.n_c, t.mean_t, c.mean_c,
        |    t.mean_t - c.mean_c AS diff
        |  FROM t JOIN c USING (event_type)),
        |att AS (SELECT
        |    CAST(sum(CAST(round(diff, 6) AS DECIMAL(18,6)) *
        |      CAST(n_t AS DECIMAL(19,0))) AS DOUBLE) /
        |      CAST(sum(n_t) AS DOUBLE) AS att_raw
        |  FROM st)
        |SELECT st.event_type AS stratum, st.n_t, st.n_c,
        |  round(st.mean_t, 4) AS mean_t, round(st.mean_c, 4) AS mean_c,
        |  round(st.diff, 4) AS diff, round(att.att_raw, 4) AS att
        |FROM st CROSS JOIN att ORDER BY stratum""".stripMargin,

    "q263_price_elasticity" ->
      """WITH lv AS (
        |  SELECT CAST(round(l_discount * 100) AS BIGINT) AS dc,
        |    count(*) AS n,
        |    sum(CAST(l_quantity AS DECIMAL(38,10))) AS sq
        |  FROM lineitem GROUP BY 1),
        |pts AS (SELECT dc, n,
        |    ln(1.0 - CAST(dc AS DOUBLE) / 100.0) AS x,
        |    ln(CAST(sq AS DOUBLE) / n) AS y
        |  FROM lv),
        |m AS (SELECT count(*) AS k,
        |    CAST(sum(CAST(round(x, 10) AS DECIMAL(28,10))) AS DOUBLE)
        |      AS sx,
        |    CAST(sum(CAST(round(y, 10) AS DECIMAL(28,10))) AS DOUBLE)
        |      AS sy,
        |    CAST(sum(CAST(round(x * y, 10) AS DECIMAL(28,10))) AS DOUBLE)
        |      AS sxy,
        |    CAST(sum(CAST(round(x * x, 10) AS DECIMAL(28,10))) AS DOUBLE)
        |      AS sxx,
        |    CAST(sum(CAST(round(y * y, 10) AS DECIMAL(28,10))) AS DOUBLE)
        |      AS syy
        |  FROM pts)
        |SELECT k AS n_levels,
        |  round((k * sxy - sx * sy) / (k * sxx - sx * sx), 4)
        |    AS elasticity,
        |  round((sy - (k * sxy - sx * sy) / (k * sxx - sx * sx) * sx) / k,
        |    4) AS intercept,
        |  round((k * sxy - sx * sy) * (k * sxy - sx * sy) /
        |    ((k * sxx - sx * sx) * (k * syy - sy * sy)), 4) AS r2
        |FROM m""".stripMargin)
}
