package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Round-10 batch 3: five curation / evaluation operators (SURVEY
  * §2.8 X205–X209) — the intra-document repetition audit (the Gopher
  * rep-fraction filters), a lead–lag cross-correlation scan between
  * two daily series, the l-diversity privacy audit that extends
  * q184's k-anonymity, the Murphy decomposition of the Brier score
  * for the churn forecast, and one exact Lloyd k-means step over the
  * embedding table. All follow the §7.4 parity discipline: per-row /
  * per-bin float terms are 6–8dp-rounded decimals before any
  * cross-row sum, integer arithmetic decides every boundary, and
  * each final statistic is one double expression written identically
  * in both engines.
  */
object Queries66 {
  import Tables._

  /** q295 — INTRA-DOCUMENT REPETITION AUDIT (X205). The Gopher-style
    * within-doc repetition filter (Rae et al. 2021 §A1.1): per doc
    * the duplicate-bigram and duplicate-trigram fractions (1 −
    * distinct/total over the token n-grams), a repetition flag
    * decided by integer cross-multiplication (dup_bi·100 > 20·n_bi —
    * no float share at the boundary), and a per-source census of
    * flag rates and corpus-level duplicate mass. Complements q64
    * (Gopher length/symbol rules) and q120 (cross-doc boilerplate):
    * this one catches the looping/stuttering doc that is unique
    * corpus-wide yet worthless for training.
    *
    * Scale: pure per-row HOF scan (no shuffle before the ≤|sources|
    * aggregate); n-gram arrays live only inside the row.
    */
  /** The q295 per-doc stage on ANY documents-shaped frame (source,
    * text) — shared verbatim by the T16 streaming twin so the
    * differential compares the SAME expressions, not a re-derivation.
    */
  private[graft] def repPerDoc(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks",
        expr("filter(split(text, ' '), w -> length(w) > 0)"))
      .filter(size(col("toks")) >= 3)
      .withColumn("bigr", expr(
        "transform(sequence(0, size(toks) - 2), " +
          "i -> concat_ws(' ', toks[i], toks[i+1]))"))
      .withColumn("trigr", expr(
        "transform(sequence(0, size(toks) - 3), " +
          "i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"))
      .select(col("source"),
        size(col("bigr")).cast("long").as("n_bi"),
        (size(col("bigr")) - size(array_distinct(col("bigr"))))
          .cast("long").as("dup_bi"),
        size(col("trigr")).cast("long").as("n_tri"),
        (size(col("trigr")) - size(array_distinct(col("trigr"))))
          .cast("long").as("dup_tri"))
      .withColumn("flagged", col("dup_bi") * 100 > col("n_bi") * 20)
      .withColumn("f_bi",
        round(col("dup_bi").cast("double") / col("n_bi").cast("double"), 6)
          .cast("decimal(10,6)"))
      .withColumn("f_tri",
        round(col("dup_tri").cast("double") / col("n_tri").cast("double"), 6)
          .cast("decimal(10,6)"))

  /** The q295 census aggregate — every column a streaming-mergeable
    * sum/count (per-doc decimals summed order-free), so the SAME
    * expressions run under a streaming groupBy in StreamingSpec T16.
    */
  private[graft] def repCensus(perDoc: DataFrame): DataFrame =
    perDoc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("flagged"), 1L).otherwise(0L)).as("n_flagged"),
        round(sum(col("f_bi")).cast("double") / count(lit(1)), 4)
          .as("mean_dup_bigram"),
        round(sum(col("f_tri")).cast("double") / count(lit(1)), 4)
          .as("mean_dup_trigram"),
        sum(col("dup_bi")).as("dup_bigrams"),
        sum(col("n_bi")).as("total_bigrams"))
      .withColumn("dup_bigram_share",
        round(col("dup_bigrams").cast("double") /
          col("total_bigrams").cast("double"), 6))

  def q295(s: SparkSession, d: String): DataFrame =
    repCensus(repPerDoc(documents(s, d))).orderBy(col("source"))

  /** q296 — LEAD–LAG CROSS-CORRELATION SCAN (X206). Does click
    * volume LEAD purchase volume? Pearson r between daily clicks at
    * day t and daily purchases at day t+L for every lag L ∈ [0,7],
    * from exact integer moment sums over the day-pair join (the q260
    * windowed-correlation algebra, re-aimed at cross-series lags);
    * the best lag is flagged by rank over (r desc, lag asc) so ties
    * resolve to the shortest lag. The ops question behind attribution
    * windows (q117/q189): how many days apart are cause and effect?
    *
    * Scale: the fact table reduces to ONE ≤|days|-row daily frame;
    * the 8-lag scan is a broadcast join over that tiny frame —
    * adding lags never re-reads events.
    */
  def q296(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
        .as("x"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("y"))
      // NOTE deliberately NOT materialized: both join sides are the
      // same ≤|days|-row aggregate and a localCheckpoint measured
      // ~0.5 s — more than re-running the 1-pass events aggregate
    val lags = s.range(0, 8).select(col("id").as("lag"))
    val pairs = daily.select(col("day"), col("x"))
      .crossJoin(broadcast(lags))
      .join(daily.select(col("day").as("tday"), col("y")),
        col("tday") === col("day") + col("lag"))
    val mom = pairs.groupBy(col("lag"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .withColumn("r",
        when(col("n_days") >= 3 &&
          col("n_days") * col("sxx") > col("sx") * col("sx") &&
          col("n_days") * col("syy") > col("sy") * col("sy"),
          round((col("n_days") * col("sxy") - col("sx") * col("sy"))
            .cast("double") /
            (sqrt((col("n_days") * col("sxx") - col("sx") * col("sx"))
              .cast("double")) *
             sqrt((col("n_days") * col("syy") - col("sy") * col("sy"))
               .cast("double"))), 4)))
    mom
      .withColumn("rk", rank().over(
        Window.orderBy(col("r").desc_nulls_last, col("lag"))))
      .select(col("lag"), col("n_days"), col("r").as("lag_corr"),
        // is_best requires a non-null correlation (ADVICE r10): if
        // every lag's r is null (<3 overlapping days at all lags),
        // rank() would still crown lag 0 with a null lag_corr
        (col("rk") === 1 && col("r").isNotNull).as("is_best"))
      .orderBy(col("lag"))
  }

  /** q297 — L-DIVERSITY PRIVACY AUDIT (X207). The disclosure audit
    * k-anonymity misses (Machanavajjhala et al. 2007): a cell of 50
    * docs is 50-anonymous yet leaks its sensitive attribute if all
    * 50 share one value. Quasi-identifier = (source, length bucket),
    * sensitive attribute = lang; per cell distinct-l and the
    * recursive (c,l) check with c=2 (top sensitive count ≤ 2× the
    * rest — pure integer), reported as a histogram over l with cell
    * / doc masses and the c2-failure count. Completes the privacy
    * picture with q184 (k-anonymity) and q218 (DP release).
    *
    * Scale: two nested aggregates over the QI cells — the fact table
    * shuffles once on (QI, sensitive), everything after is
    * cell-bounded.
    */
  def q297(s: SparkSession, d: String): DataFrame = {
    val sv = documents(s, d)
      .filter(col("lang").isNotNull)
      .groupBy(col("source"), expr("n_chars div 500").as("len_bucket"),
        col("lang"))
      .agg(count(lit(1)).as("cnt"))
    val cells = sv.groupBy(col("source"), col("len_bucket"))
      .agg(sum(col("cnt")).as("n"), count(lit(1)).as("l"),
        max(col("cnt")).as("top"))
      .withColumn("c2_fail", col("top") > (col("n") - col("top")) * 2)
      // NOT materialized: the two consumers (total + histogram)
      // re-run a cheap 2-aggregate chain; checkpoint costs more
    val tot = cells.agg(sum(col("n")).as("n_docs_total"))
    cells.groupBy(col("l"))
      .agg(count(lit(1)).as("n_cells"), sum(col("n")).as("n_docs"),
        sum(when(col("c2_fail"), 1L).otherwise(0L)).as("n_c2_fail"))
      .crossJoin(broadcast(tot))
      .select(col("l"), col("n_cells"), col("n_docs"), col("n_c2_fail"),
        round(col("n_docs").cast("double") /
          col("n_docs_total").cast("double"), 4).as("docs_share"))
      .orderBy(col("l"))
  }

  /** q298 — BRIER SCORE MURPHY DECOMPOSITION (X208). Calibration
    * evaluation of the q213/q214 churn signal as a probability
    * forecast: users split by id parity into train/test, the
    * forecast for each capped-activity bin is the train-half churn
    * rate (6dp decimal — constant within bin, so Murphy 1973's
    * decomposition Brier = reliability − resolution + uncertainty
    * holds), scored on the test half. Per-bin Brier mass uses the
    * 0/1-label identity Σ(f−y)² = n·f² − 2·f·o + o as ONE double
    * expression, 6dp-rounded into decimal before the cross-bin sum
    * (the q236/q289 term discipline); reliability / resolution terms
    * likewise. `decomp_gap` audits the identity under the declared
    * rounding — deterministic in both engines. After q213 (ranking)
    * and q214 (lift): is the score CALIBRATED?
    *
    * Scale: one events pass into per-user aggregates (the shared
    * q197 snapshot shape), then ≤9-bin broadcast algebra.
    */
  def q298(s: SparkSession, d: String): DataFrame = {
    // ONE events pass and NO self-join: the train/test arms are
    // conditional sums of one groupBy(bin) aggregate — arithmetically
    // identical to the oracle's filter-then-join CTE form because
    // every cell value is an exact integer (and the derived forecast
    // the same 6dp decimal). Bins with an empty arm drop exactly as
    // the oracle's inner join drops them.
    val cells0 = Queries36.snapshot(s, d)
      .withColumn("bin", least(expr("n_pre div 10"), lit(8L)))
      .withColumn("arm", pmod(col("user_id"), lit(2L)))
      .groupBy(col("bin"))
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_tr"),
        sum(when(col("arm") === 0 && col("churned"), 1L).otherwise(0L))
          .as("o_tr"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_k"),
        sum(when(col("arm") === 1 && col("churned"), 1L).otherwise(0L))
          .as("o_k"))
      .filter(col("n_tr") > 0 && col("n_k") > 0)
      .withColumn("f",
        round(col("o_tr").cast("double") / col("n_tr").cast("double"), 6)
          .cast("decimal(10,6)"))
    // every per-bin term is ō-free — the resolution enters through
    // the variance identity Σn_k(r_k−ō)²/N = Σn_k r_k²/N − ō² (exact
    // because Σn_k r_k = Σo_k is an INTEGER) — so ONE aggregate over
    // the ≤9 joined bins yields sums and totals together: no
    // broadcast round-trips, three jobs total.
    val cells = cells0
      .withColumn("fb", col("f").cast("double"))
      .withColumn("nk", col("n_k").cast("double"))
      .withColumn("ok", col("o_k").cast("double"))
      .withColumn("brier_t",
        round(col("nk") * col("fb") * col("fb") -
          lit(2.0) * col("fb") * col("ok") + col("ok"), 6)
          .cast("decimal(18,6)"))
      .withColumn("rel_t",
        round(col("nk") * (col("fb") - col("ok") / col("nk")) *
          (col("fb") - col("ok") / col("nk")), 6).cast("decimal(18,6)"))
      .withColumn("r2_t",
        round(col("nk") * (col("ok") / col("nk")) *
          (col("ok") / col("nk")), 6).cast("decimal(18,6)"))
    cells.agg(count(lit(1)).as("n_bins"),
        sum(col("n_k")).as("n_test"), sum(col("o_k")).as("o_test"),
        sum(col("brier_t")).as("sb"), sum(col("rel_t")).as("sr"),
        sum(col("r2_t")).as("sr2"))
      .withColumn("obar",
        col("o_test").cast("double") / col("n_test").cast("double"))
      .select(col("n_bins"), col("n_test"),
        round(col("obar"), 6).as("base_rate"),
        round(col("sb").cast("double") / col("n_test").cast("double"), 6)
          .as("brier"),
        round(col("sr").cast("double") / col("n_test").cast("double"), 6)
          .as("reliability"),
        // + 0.0 canonicalizes IEEE -0.0 (q66/q133 convention)
        (round(col("sr2").cast("double") / col("n_test").cast("double") -
          col("obar") * col("obar"), 6) + lit(0.0)).as("resolution"),
        round(col("obar") * (lit(1.0) - col("obar")), 6).as("uncertainty"))
      .withColumn("decomp_gap",
        round(col("brier") -
          (col("reliability") - col("resolution") + col("uncertainty")), 6) +
          lit(0.0))
  }

  /** q299 — ONE EXACT LLOYD K-MEANS STEP (X209). The k-means
    * iteration as a first-class batch operator: k=4 seeds drawn
    * md5-deterministically from the corpus, every vector assigned to
    * its nearest seed by EXACT decimal squared distance (per-dim
    * terms 8dp-rounded into decimal and summed exactly — the q261
    * argmin convention, so the winner is decided on exact decimals
    * with seed-id tie-break), then the means recomputed; per cluster
    * the size, the inertia (Σ d² to the assigned seed), and the
    * centroid shift ‖μ_new − seed‖. One verifiable step IS the
    * distributed-k-means building block — a driver loop of these
    * converges, and each step stays an oracled dataframe.
    *
    * Scale: |vecs|·dims posexplode joined to a broadcast k·dims seed
    * frame (k bounded); no vector-vector pairs anywhere.
    */
  def q299(s: SparkSession, d: String): DataFrame = {
    val dec18 = "decimal(38,18)"
    val emb = embeddings(s, d).select(col("vec_id"), col("embedding"))
    // top-4 by (h, vec_id) via orderBy+limit (round 17, VERDICT r16
    // #5): row_number().over(Window.orderBy(…)) planned a
    // single-partition WindowExec over EVERY vector — a fact-scale
    // serialization point at 100 TB — when only the 4 smallest rows
    // of a total order are wanted. TakeOrdered keeps a 4-row heap
    // per partition + one 4-row driver merge; same total order, same
    // 4 seeds, no global sort of anything.
    val seedIds = emb
      .select(col("vec_id"),
        Text.md5Long(concat(lit("kmseed:"), col("vec_id").cast("string")))
          .as("h"))
      .orderBy(col("h"), col("vec_id"))
      .limit(4)
      .select(col("vec_id").as("seed"))
    val seeds4 = emb.join(broadcast(seedIds), col("vec_id") === col("seed"))
      .select(col("seed"), col("embedding").as("svec"))
    // the k seed vectors ride ONE broadcast array-of-structs row
    // (the q246 mv pattern) and the whole assign step happens IN-ROW:
    // d² to each seed folds per-dim floor((x−m)²·1e8) BIGINT fixed
    // point (the q278 JlAudit convention — the double product is
    // IEEE-identical in both engines, floor is exact, and the long
    // accumulator keeps the interpreted lambda free of BigDecimal
    // boxing); the argmin is array_min over (d2, seed) structs —
    // lexicographic struct order ⇒ smallest exact distance, seed-id
    // tie-break; identical to the oracle's min-join + min(seed)
    // form. Zero shuffles and zero joins before the mean-recompute
    // aggregate, and the 2k-row assign frame is cheap enough that
    // its two consumers just recompute it (a localCheckpoint here
    // measured ~0.5 s — more than the fold itself).
    val panel = seeds4
      .agg(array_sort(collect_list(struct(col("seed"), col("svec"))))
        .as("ks"))
    val asg = emb.crossJoin(broadcast(panel))
      .select(col("vec_id"),
        expr(
          """array_min(transform(ks, k -> named_struct(
            |  'd2', aggregate(
            |    zip_with(embedding, k.svec, (xe, me) -> cast(floor(
            |      (cast(xe as double) - cast(me as double)) *
            |      (cast(xe as double) - cast(me as double)) * 1e8)
            |      as bigint)),
            |    cast(0 as bigint),
            |    (acc, t) -> acc + t),
            |  'seed', k.seed)))""".stripMargin).as("a"))
      .select(col("vec_id"), col("a.seed").as("cluster"),
        col("a.d2").as("d2min"))
    // ONE downstream pass: carrying d2min through the posexplode
    // makes every (cluster, dim) group hold each member vector
    // exactly once, so n = count and Σd2min are CONSTANT across the
    // dims of a cluster — the cluster stats fall out of the same
    // aggregate that computes the per-dim means (max() just picks
    // the repeated value), and the assign fold runs once, not once
    // per consumer.
    val seedDims = seeds4
      .select(col("seed"), posexplode(col("svec")).as(Seq("dim", "mf")))
      .select(col("seed"), col("dim"), col("mf").cast("double").as("m"))
    val perDim = asg.join(emb, Seq("vec_id"))
      .select(col("cluster"), col("d2min"),
        posexplode(col("embedding")).as(Seq("dim", "xf")))
      .select(col("cluster"), col("d2min"), col("dim"),
        col("xf").cast("double").as("x"))
      .groupBy(col("cluster"), col("dim"))
      .agg(count(lit(1)).as("n"), sum(col("x").cast(dec18)).as("sx"),
        sum(col("d2min")).as("sd2"))
      .withColumn("mu", col("sx").cast("double") / col("n"))
    perDim.join(broadcast(seedDims),
        perDim("cluster") === seedDims("seed") &&
          perDim("dim") === seedDims("dim"))
      .withColumn("sterm",
        round((col("mu") - col("m")) * (col("mu") - col("m")), 8)
          .cast("decimal(20,8)"))
      .groupBy(col("cluster"))
      .agg(max(col("n")).as("n"), max(col("sd2")).as("inertia_d"),
        sum(col("sterm")).as("s2"))
      .select(col("cluster"), col("n"),
        round(col("inertia_d").cast("double") / lit(1e8), 4)
          .as("inertia"),
        round(sqrt(col("s2").cast("double")), 4).as("centroid_shift"))
      .orderBy(col("cluster"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q295_doc_repetition" -> (q295 _),
    "q296_lead_lag" -> (q296 _),
    "q297_l_diversity" -> (q297 _),
    "q298_brier_decomposition" -> (q298 _),
    "q299_lloyd_step" -> (q299 _))
}

/** DuckDB mirrors of Queries66 — identical n-gram constructions
  * (list_slice + array_to_string vs concat_ws over lookups — same
  * strings), identical integer boundaries, identical one-expression
  * doubles (§7.4).
  */
object Oracle66 {

  private def md5long(e: String): String =
    s"CAST('0x' || substring(md5($e), 1, 15) AS BIGINT)"

  /** Splices Oracle36.snapCtes (ONE snapshot definition for
    * q213/q214/q298 — the drift-proof convention) + bin/arm columns.
    */
  private val brierSnap =
    s"""${Oracle36.snapCtes},
       |sb AS (SELECT user_id, least(n_pre // 10, 8) AS bin,
       |    user_id % 2 AS arm,
       |    CASE WHEN churned THEN 1 ELSE 0 END AS churned_i
       |  FROM lab)""".stripMargin

  val sql: Map[String, String] = Map(
    "q295_doc_repetition" ->
      """WITH td AS (SELECT source,
        |    list_filter(string_split(text, ' '), w -> len(w) > 0) AS toks
        |  FROM documents),
        |gd AS (SELECT source,
        |    list_transform(range(0, len(toks) - 1), i ->
        |      array_to_string(list_slice(toks, CAST(i AS INT) + 1,
        |        CAST(i AS INT) + 2), ' ')) AS bigr,
        |    list_transform(range(0, len(toks) - 2), i ->
        |      array_to_string(list_slice(toks, CAST(i AS INT) + 1,
        |        CAST(i AS INT) + 3), ' ')) AS trigr
        |  FROM td WHERE len(toks) >= 3),
        |pd AS (SELECT source,
        |    CAST(len(bigr) AS BIGINT) AS n_bi,
        |    CAST(len(bigr) - len(list_distinct(bigr)) AS BIGINT) AS dup_bi,
        |    CAST(len(trigr) AS BIGINT) AS n_tri,
        |    CAST(len(trigr) - len(list_distinct(trigr)) AS BIGINT)
        |      AS dup_tri
        |  FROM gd),
        |pf AS (SELECT source, n_bi, dup_bi, n_tri, dup_tri,
        |    dup_bi * 100 > n_bi * 20 AS flagged,
        |    CAST(round(CAST(dup_bi AS DOUBLE) / CAST(n_bi AS DOUBLE), 6)
        |      AS DECIMAL(10,6)) AS f_bi,
        |    CAST(round(CAST(dup_tri AS DOUBLE) / CAST(n_tri AS DOUBLE), 6)
        |      AS DECIMAL(10,6)) AS f_tri
        |  FROM pd)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN flagged THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_flagged,
        |  round(CAST(sum(f_bi) AS DOUBLE) / count(*), 4)
        |    AS mean_dup_bigram,
        |  round(CAST(sum(f_tri) AS DOUBLE) / count(*), 4)
        |    AS mean_dup_trigram,
        |  CAST(sum(dup_bi) AS BIGINT) AS dup_bigrams,
        |  CAST(sum(n_bi) AS BIGINT) AS total_bigrams,
        |  round(CAST(sum(dup_bi) AS DOUBLE) / CAST(sum(n_bi) AS DOUBLE), 6)
        |    AS dup_bigram_share
        |FROM pf GROUP BY source ORDER BY source""".stripMargin,

    "q296_lead_lag" ->
      """WITH daily AS (SELECT
        |    (epoch_ns(ts) // 1000) // 86400000000 AS day,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS x,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |  GROUP BY 1),
        |lags AS (SELECT CAST(r.i AS BIGINT) AS lag
        |  FROM unnest(range(0, 8)) AS r(i)),
        |mom AS (SELECT l.lag, count(*) AS n_days,
        |    sum(a.x) AS sx, sum(b.y) AS sy, sum(a.x * b.y) AS sxy,
        |    sum(a.x * a.x) AS sxx, sum(b.y * b.y) AS syy
        |  FROM daily a CROSS JOIN lags l
        |  JOIN daily b ON b.day = a.day + l.lag
        |  GROUP BY 1),
        |r AS (SELECT lag, n_days,
        |    CASE WHEN n_days >= 3 AND n_days * sxx > sx * sx
        |        AND n_days * syy > sy * sy THEN
        |      round(CAST(n_days * sxy - sx * sy AS DOUBLE) /
        |        (sqrt(CAST(n_days * sxx - sx * sx AS DOUBLE)) *
        |         sqrt(CAST(n_days * syy - sy * sy AS DOUBLE))), 4)
        |    END AS lag_corr
        |  FROM mom)
        |SELECT lag, n_days, lag_corr,
        |  rank() OVER (ORDER BY lag_corr DESC NULLS LAST, lag) = 1
        |    AND lag_corr IS NOT NULL AS is_best
        |FROM r ORDER BY lag""".stripMargin,

    "q297_l_diversity" ->
      """WITH sv AS (SELECT source, n_chars // 500 AS len_bucket, lang,
        |    count(*) AS cnt
        |  FROM documents WHERE lang IS NOT NULL GROUP BY 1, 2, 3),
        |cells AS (SELECT source, len_bucket,
        |    CAST(sum(cnt) AS BIGINT) AS n, count(*) AS l,
        |    max(cnt) AS top
        |  FROM sv GROUP BY 1, 2),
        |cf AS (SELECT *, top > (n - top) * 2 AS c2_fail FROM cells),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_docs_total FROM cf)
        |SELECT l, count(*) AS n_cells,
        |  CAST(sum(n) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN c2_fail THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_c2_fail,
        |  round(CAST(sum(n) AS DOUBLE) /
        |    CAST(tot.n_docs_total AS DOUBLE), 4) AS docs_share
        |FROM cf, tot GROUP BY l, tot.n_docs_total ORDER BY l""".stripMargin,

    "q298_brier_decomposition" ->
      s"""WITH $brierSnap,
         |train AS (SELECT bin,
         |    CAST(round(CAST(sum(churned_i) AS DOUBLE) /
         |      CAST(count(*) AS DOUBLE), 6) AS DECIMAL(10,6)) AS f
         |  FROM sb WHERE arm = 0 GROUP BY bin),
         |test AS (SELECT bin, count(*) AS n_k,
         |    CAST(sum(churned_i) AS BIGINT) AS o_k
         |  FROM sb WHERE arm = 1 GROUP BY bin),
         |cells AS (SELECT t.bin, t.n_k, t.o_k, tr.f,
         |    CAST(round(CAST(n_k AS DOUBLE) * CAST(f AS DOUBLE) *
         |        CAST(f AS DOUBLE) - 2.0 * CAST(f AS DOUBLE) *
         |        CAST(o_k AS DOUBLE) + CAST(o_k AS DOUBLE), 6)
         |      AS DECIMAL(18,6)) AS brier_t,
         |    CAST(round(CAST(n_k AS DOUBLE) *
         |        (CAST(f AS DOUBLE) - CAST(o_k AS DOUBLE) /
         |          CAST(n_k AS DOUBLE)) *
         |        (CAST(f AS DOUBLE) - CAST(o_k AS DOUBLE) /
         |          CAST(n_k AS DOUBLE)), 6) AS DECIMAL(18,6)) AS rel_t,
         |    CAST(round(CAST(n_k AS DOUBLE) *
         |        (CAST(o_k AS DOUBLE) / CAST(n_k AS DOUBLE)) *
         |        (CAST(o_k AS DOUBLE) / CAST(n_k AS DOUBLE)), 6)
         |      AS DECIMAL(18,6)) AS r2_t
         |  FROM test t JOIN train tr USING (bin)),
         |agg AS (SELECT count(*) AS n_bins,
         |    CAST(sum(n_k) AS BIGINT) AS n_test,
         |    CAST(sum(o_k) AS BIGINT) AS o_test,
         |    sum(brier_t) AS sb_s, sum(rel_t) AS sr, sum(r2_t) AS sr2
         |  FROM cells),
         |fin AS (SELECT n_bins, n_test,
         |    CAST(o_test AS DOUBLE) / CAST(n_test AS DOUBLE) AS obar,
         |    round(CAST(o_test AS DOUBLE) / CAST(n_test AS DOUBLE), 6)
         |      AS base_rate,
         |    round(CAST(sb_s AS DOUBLE) / CAST(n_test AS DOUBLE), 6)
         |      AS brier,
         |    round(CAST(sr AS DOUBLE) / CAST(n_test AS DOUBLE), 6)
         |      AS reliability,
         |    round(CAST(sr2 AS DOUBLE) / CAST(n_test AS DOUBLE) -
         |      (CAST(o_test AS DOUBLE) / CAST(n_test AS DOUBLE)) *
         |      (CAST(o_test AS DOUBLE) / CAST(n_test AS DOUBLE)), 6) + 0.0
         |      AS resolution,
         |    round((CAST(o_test AS DOUBLE) / CAST(n_test AS DOUBLE)) *
         |      (1.0 - CAST(o_test AS DOUBLE) / CAST(n_test AS DOUBLE)), 6)
         |      AS uncertainty
         |  FROM agg)
         |SELECT n_bins, n_test, base_rate, brier, reliability,
         |  resolution, uncertainty,
         |  round(brier - (reliability - resolution + uncertainty), 6) + 0.0
         |    AS decomp_gap
         |FROM fin""".stripMargin,

    "q299_lloyd_step" ->
      s"""WITH x AS (SELECT vec_id, r.i AS dim,
         |    CAST(embedding[CAST(r.i AS INT) + 1] AS DOUBLE) AS x
         |  FROM embeddings,
         |    LATERAL unnest(range(0, len(embedding))) AS r(i)),
         |sid AS (SELECT vec_id AS seed FROM (
         |    SELECT vec_id, row_number() OVER (ORDER BY
         |        ${md5long("'kmseed:' || CAST(vec_id AS VARCHAR)")},
         |        vec_id) AS rk
         |    FROM embeddings) WHERE rk <= 4),
         |sd AS (SELECT s.seed, x.dim, x.x AS m
         |  FROM sid s JOIN x ON x.vec_id = s.seed),
         |d2 AS (SELECT x.vec_id, sd.seed,
         |    sum(CAST(floor((x.x - sd.m) * (x.x - sd.m) * 1e8)
         |      AS BIGINT)) AS d2
         |  FROM x JOIN sd USING (dim) GROUP BY 1, 2),
         |best AS (SELECT vec_id, min(d2) AS bd FROM d2 GROUP BY 1),
         |asg AS (SELECT d2.vec_id, min(d2.seed) AS cluster,
         |    min(d2.d2) AS d2min
         |  FROM d2 JOIN best ON d2.vec_id = best.vec_id
         |    AND d2.d2 = best.bd
         |  GROUP BY 1),
         |cs AS (SELECT cluster, count(*) AS n, sum(d2min) AS inertia_d
         |  FROM asg GROUP BY 1),
         |mu AS (SELECT a.cluster, x.dim,
         |    CAST(sum(CAST(x.x AS DECIMAL(38,18))) AS DOUBLE) / count(*)
         |      AS mu
         |  FROM asg a JOIN x ON x.vec_id = a.vec_id GROUP BY 1, 2),
         |sh AS (SELECT mu.cluster,
         |    sum(CAST(round((mu.mu - sd.m) * (mu.mu - sd.m), 8)
         |      AS DECIMAL(20,8))) AS s2
         |  FROM mu JOIN sd ON sd.seed = mu.cluster AND sd.dim = mu.dim
         |  GROUP BY 1)
         |SELECT cs.cluster, cs.n,
         |  round(CAST(cs.inertia_d AS DOUBLE) / 1e8, 4) AS inertia,
         |  round(sqrt(CAST(sh.s2 AS DOUBLE)), 4) AS centroid_shift
         |FROM cs JOIN sh USING (cluster) ORDER BY cs.cluster""".stripMargin)
}
