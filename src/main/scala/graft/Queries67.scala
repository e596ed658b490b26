package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 batch 4: five lake-layout / estimation / ranking
  * operators (SURVEY §2.8 X210–X214) — a zone-map skip-rate audit
  * that quantifies the layout choice q107's z-order serves, an
  * empirical-Bayes shrinkage of per-group means (the estimation
  * complement to q289's ANOVA test), a leave-one-cohort-out
  * jackknife for a ratio metric, a Simpson-diversity census
  * (integer-exact effective vocabulary), and rank-biased overlap
  * between two brand rankings on a Scala-literal weight grid. §7.4
  * discipline throughout: integers decide everything they can,
  * per-group float terms are rounded into decimals before any
  * cross-group sum, and every remaining float is one expression
  * written identically in both engines.
  */
object Queries67 {
  import Tables._

  private val dec0 = "decimal(38,0)"

  /** Rows per simulated file in the q300 layout audit. */
  private[graft] val fileRows = 4096L

  /** The q300 predicate grid: [lo, hi) micros ranges computed ONCE in
    * Scala and spliced into both engines (the q243 literal-grid
    * convention — no timestamp parsing in either plan).
    */
  private[graft] val predGrid: Seq[(String, Long, Long)] = {
    def us(d: String): Long =
      java.time.LocalDate.parse(d).atStartOfDay(java.time.ZoneOffset.UTC)
        .toInstant.toEpochMilli * 1000L
    Seq(
      ("y1996", us("1996-01-01"), us("1997-01-01")),
      ("h1_1998", us("1998-01-01"), us("1998-07-01")),
      ("y2000", us("2000-01-01"), us("2001-01-01")))
  }

  /** q300 — ZONE-MAP SKIP-RATE LAYOUT AUDIT (X210). The quantified
    * argument for sort/z-order keys: simulate 4096-row files under
    * (a) insert order (orderkey buckets) and (b) date-sorted order,
    * and for a literal grid of o_orderdate range predicates report
    * how many files a min/max zone map skips and the read
    * amplification rows_scanned/rows_selected. Insert-order zone maps
    * come from one (file → min/max/n) aggregate; the date-sorted
    * layout needs NO global sort — its files are equi-depth date
    * buckets, so the scanned-file span falls out of the date CDF
    * (rows before lo / before hi), exact because the file order
    * (date, orderkey) makes boundary ties contiguous. Completes
    * q107 (z-order key) and q162 (shard balance): this one measures
    * what the layout buys.
    *
    * Scale: two aggregates over orders (one per-file, one 3-predicate
    * conditional count) — no sort, no shuffle wider than |files|.
    */
  def q300(s: SparkSession, d: String): DataFrame = {
    // o_orderdate arrives TIMESTAMP_NTZ; the UTC-session cast
    // reinterprets it as an instant (the Tables.events convention),
    // matching the oracle's epoch_ns on the same naive value
    val o = orders(s, d)
      .select(col("o_orderkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("us"))
    val insFiles = o
      .groupBy(expr(s"o_orderkey div $fileRows").as("fid"))
      .agg(min(col("us")).as("mn"), max(col("us")).as("mx"),
        count(lit(1)).as("n"))
    val grid = predGrid.foldLeft(Option.empty[DataFrame]) { (acc, p) =>
      val row = s.range(1).select(lit(p._1).as("pred"),
        lit(p._2).as("lo"), lit(p._3).as("hi"))
      Some(acc.fold(row)(_.unionAll(row)))
    }.get
    // per-predicate exact row selectivity + the date CDF in one pass
    val sel = o.crossJoin(broadcast(grid))
      .groupBy(col("pred"), col("lo"), col("hi"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("us") >= col("lo") && col("us") < col("hi"), 1L)
          .otherwise(0L)).as("rows_selected"),
        sum(when(col("us") < col("lo"), 1L).otherwise(0L)).as("cnt_lo"),
        sum(when(col("us") < col("hi"), 1L).otherwise(0L)).as("cnt_hi"))
    val ins = insFiles.crossJoin(broadcast(grid))
      .groupBy(col("pred"))
      .agg(count(lit(1)).as("n_files"),
        sum(when(col("mx") < col("lo") || col("mn") >= col("hi"), 1L)
          .otherwise(0L)).as("n_skipped"),
        sum(when(col("mx") < col("lo") || col("mn") >= col("hi"), 0L)
          .otherwise(col("n"))).as("rows_scanned"))
      .withColumn("layout", lit("insert_order"))
      .join(sel.select(col("pred"), col("rows_selected")), Seq("pred"))
    val dt = sel
      .withColumn("n_files", expr(s"(n_rows + ${fileRows - 1}) div $fileRows"))
      .withColumn("first_f", expr(s"cnt_lo div $fileRows"))
      .withColumn("last_f", expr(s"(cnt_hi - 1) div $fileRows"))
      .withColumn("n_scanned",
        when(col("rows_selected") === 0L, 0L)
          .otherwise(col("last_f") - col("first_f") + 1L))
      .withColumn("rows_scanned",
        when(col("rows_selected") === 0L, 0L)
          .otherwise(least(col("n_scanned") * fileRows,
            col("n_rows") - col("first_f") * fileRows)))
      .select(col("pred"), col("n_files"),
        (col("n_files") - col("n_scanned")).as("n_skipped"),
        col("rows_scanned"), col("rows_selected"))
      .withColumn("layout", lit("date_sorted"))
    ins.select(col("layout"), col("pred"), col("n_files"), col("n_skipped"),
        col("rows_scanned"), col("rows_selected"))
      .unionAll(dt.select(col("layout"), col("pred"), col("n_files"),
        col("n_skipped"), col("rows_scanned"), col("rows_selected")))
      .withColumn("skip_rate",
        round(col("n_skipped").cast("double") / col("n_files").cast("double"),
          4))
      .withColumn("read_amplification",
        when(col("rows_selected") > 0L,
          round(col("rows_scanned").cast("double") /
            col("rows_selected").cast("double"), 4)))
      .orderBy(col("layout"), col("pred"))
  }

  /** q301 — EMPIRICAL-BAYES SHRUNK GROUP MEANS (X211). The estimation
    * complement to q289's ANOVA test: per-brand mean line value,
    * shrunk toward the grand mean by the one-way random-effects
    * method-of-moments weights B_g = τ²/(τ² + s²/n_g) (James-Stein /
    * Efron-Morris shape). Prices enter as floor(price·100) exact
    * cents (the q241 fixed-point convention), all moments are exact
    * integer/decimal sums, per-group float terms ((Σx)²/n and
    * n·(mean−m)²) are 6dp-rounded decimals before their cross-group
    * sums, and τ², s², and every B_g derive from those exact
    * ingredients via expressions written identically in both engines.
    *
    * Scale: ONE fact aggregate into a ≤|brands| frame; the 1-row
    * variance-component panel broadcasts back onto it.
    */
  def q301(s: SparkSession, d: String): DataFrame = {
    val g = lineitem(s, d)
      .join(broadcast(part(s, d).select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand").as("brand"),
        floor(col("l_extendedprice") * 100.0).as("cents"))
      .groupBy(col("brand"))
      .agg(count(lit(1)).as("ng"),
        sum(col("cents").cast(dec0)).as("sg"),
        // cents² ≤ 1e14 is an exact LONG product; the decimal cast
        // happens BEFORE the sum so the cross-row fold cannot overflow
        sum((col("cents") * col("cents")).cast(dec0)).as("ssg"))
      .withColumn("wterm",
        round(col("sg").cast("double") * col("sg").cast("double") /
          col("ng").cast("double"), 6).cast("decimal(38,6)"))
      .withColumn("n2", col("ng") * col("ng"))
    // the variance-component panel rides WINDOW sums over the ≤25-row
    // group frame (ONE fact aggregate total — a tot-aggregate +
    // crossJoin would re-run the lineitem join per derived frame);
    // every ingredient is an exact integer/decimal, so the per-row
    // panel doubles are identical to the oracle's 1-row CTE form
    val all = Window.partitionBy(lit(1))
    g.withColumn("k", count(lit(1)).over(all))
      .withColumn("n_total", sum(col("ng")).over(all))
      .withColumn("s_all", sum(col("sg")).over(all))
      .withColumn("ss_all", sum(col("ssg")).over(all))
      .withColumn("c", sum(col("wterm")).over(all))
      .withColumn("sn2", sum(col("n2")).over(all))
      .withColumn("m",
        col("s_all").cast("double") / col("n_total").cast("double"))
      // pooled within-group variance from the same pass (q289's SSW)
      .withColumn("s2w",
        (col("ss_all").cast("double") - col("c").cast("double")) /
          (col("n_total") - col("k")).cast("double"))
      // SSB in its moment form C − S²/N (exact ingredients, one expr)
      .withColumn("ssb",
        col("c").cast("double") -
          col("s_all").cast("double") * col("s_all").cast("double") /
            col("n_total").cast("double"))
      // Cochran n0 = (N − Σn_g²/N)/(k−1); τ² = max(0,(SSB/(k−1)−s²)/n0)
      .withColumn("n0",
        (col("n_total").cast("double") -
          col("sn2").cast("double") / col("n_total").cast("double")) /
          (col("k") - 1).cast("double"))
      .withColumn("tau2",
        greatest(lit(0.0),
          (col("ssb") / (col("k") - 1).cast("double") - col("s2w")) /
            col("n0")))
      .withColumn("mean_g", col("sg").cast("double") / col("ng").cast("double"))
      .withColumn("b",
        col("tau2") / (col("tau2") + col("s2w") / col("ng").cast("double")))
      .select(col("brand"), col("ng").as("n"),
        round(col("mean_g") / 100.0, 4).as("raw_mean"),
        round(col("b"), 6).as("shrink_weight"),
        round((col("m") + col("b") * (col("mean_g") - col("m"))) / 100.0, 4)
          .as("shrunk_mean"))
      .orderBy(col("brand"))
  }

  /** q302 — JACKKNIFE SE OF A RATIO METRIC (X212). The
    * delete-one-group jackknife for purchases-per-click: users split
    * into 10 md5-free cohorts by user_id mod 10, leave-one-cohort-out
    * ratios r_(g) = (P−p_g)/(C−c_g) are 8dp-decimal by definition
    * (documented — the statistic is DEFINED over the rounded LOO
    * grid, making every cross-cohort sum order-free), and the
    * jackknife mean/SE/bias and a ±1.96·SE interval come out of one
    * 10-row aggregate. The grouped-jackknife answer to "what error
    * bar goes on this ratio?" — the resampling complement to q240's
    * bootstrap (which draws replicates) and q183's CLT z-test.
    *
    * Scale: one conditional-count aggregate over events into 10 rows;
    * everything after is broadcast scalar algebra.
    */
  def q302(s: SparkSession, d: String): DataFrame = {
    // ONE events pass: totals, LOO ratios, the jackknife mean, and
    // the deviation terms all come from windows over the 10-row
    // cohort frame downstream of the single shuffle — the lazy
    // crossJoin(tot)/join(base) form re-scanned the fact table once
    // per derived frame (the cost class the perf ledger names first)
    val all = Window.partitionBy(lit(1))
    events(s, d)
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy(pmod(col("user_id"), lit(10L)).as("cohort"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
        .as("cg"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("pg"))
      .withColumn("c_all", sum(col("cg")).over(all))
      .withColumn("p_all", sum(col("pg")).over(all))
      .filter(col("c_all") - col("cg") > 0L)
      .withColumn("rg",
        round((col("p_all") - col("pg")).cast("double") /
          (col("c_all") - col("cg")).cast("double"), 8)
          .cast("decimal(20,8)"))
      .withColumn("gk", count(lit(1)).over(all))
      .withColumn("rbar",
        sum(col("rg")).over(all).cast("double") / col("gk").cast("double"))
      .withColumn("dev2",
        round((col("rg").cast("double") - col("rbar")) *
          (col("rg").cast("double") - col("rbar")), 10)
          .cast("decimal(22,10)"))
      .groupBy(col("c_all"), col("p_all"), col("gk"), col("rbar"))
      .agg(sum(col("dev2")).as("sdev2"))
      .withColumn("ratio",
        col("p_all").cast("double") / col("c_all").cast("double"))
      .withColumn("se",
        sqrt((col("gk") - 1).cast("double") / col("gk").cast("double") *
          col("sdev2").cast("double")))
      .select(col("gk").as("n_cohorts"), col("c_all").as("clicks"),
        col("p_all").as("purchases"),
        round(col("ratio"), 6).as("ratio"),
        round(col("rbar"), 6).as("jk_mean"),
        round(col("se"), 6).as("jk_se"),
        (round((col("gk") - 1).cast("double") * (col("rbar") - col("ratio")),
          8) + lit(0.0)).as("jk_bias"),
        round(col("ratio") - lit(1.96) * col("se"), 6).as("ci_lo"),
        round(col("ratio") + lit(1.96) * col("se"), 6).as("ci_hi"))
  }

  /** q303 — SIMPSON DIVERSITY CENSUS (X213). Per-source token
    * diversity via the unbiased Simpson concentration
    * λ = Σ n_i(n_i−1) / (N(N−1)) and its inverse (the "effective
    * vocabulary" — how many equally-common tokens would look this
    * concentrated). INTEGER-EXACT until the single final division —
    * the entropy-flavored diversity metric that needs no logarithm
    * (the libm-divergence class q294 documents), so it is immune to
    * the cross-engine transcendental hazard by construction.
    * Complements q66 (char entropy), q141 (Zipf slope), q200 (hapax
    * tail): same census shuffle, orthogonal statistic.
    *
    * Scale: one (source, token) census aggregate, vocab-bounded
    * groups; the per-source reduce is ≤|sources| rows.
    */
  def q303(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("source"),
        explode(expr("filter(split(text, ' '), w -> length(w) > 0)"))
          .as("tok"))
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("ni"))
      .groupBy(col("source"))
      .agg(sum(col("ni")).as("n_tokens"),
        count(lit(1)).as("vocab"),
        sum(col("ni") * (col("ni") - 1L)).as("pair2"))
      .withColumn("simpson",
        round(col("pair2").cast("double") /
          (col("n_tokens").cast("double") *
            (col("n_tokens") - 1L).cast("double")), 8))
      .withColumn("effective_vocab",
        when(col("pair2") > 0L,
          round((col("n_tokens").cast("double") *
            (col("n_tokens") - 1L).cast("double")) /
            col("pair2").cast("double"), 4)))
      .select(col("source"), col("n_tokens"), col("vocab"),
        col("simpson"), col("effective_vocab"))
      .orderBy(col("source"))

  /** Depth bound and p for the q304 RBO grid. */
  private[graft] val rboDepth = 10
  private[graft] val rboP = 0.9

  /** ⌊round((1−p)·p^(d−1)/d · 10⁸)⌉ for d = 1..rboDepth — ONE Scala
    * computation spliced into both engines (q243 convention): no pow
    * in either plan, and the weighted sum is an exact integer dot
    * product.
    */
  private[graft] val rboWeightE8: IndexedSeq[Long] =
    (1 to rboDepth).map { dd =>
      BigDecimal((1.0 - rboP) * math.pow(rboP, (dd - 1).toDouble) / dd)
        .setScale(8, BigDecimal.RoundingMode.HALF_UP)
        .*(BigDecimal(100000000L)).toLongExact
    }

  /** q304 — RANK-BIASED OVERLAP OF TWO RANKINGS (X214). How much do
    * the revenue ranking and the quantity ranking of brands agree?
    * Webber et al. 2010's top-weighted RBO@10 with p = 0.9: per depth
    * d the overlap |top_d(A) ∩ top_d(B)| (pure integers from the two
    * row_number ranks), agreement overlap/d, and the cumulative
    * RBO Σ w_d·overlap_d on the literal weight grid. The
    * ranking-SIMILARITY measure beside q226 (fusion) and q254
    * (relevance eval) — the ops question is "did the new scoring
    * change the top of the list?".
    *
    * Scale: one fact aggregate into the ≤|brands| frame; both ranks
    * are windows over those ≤25 rows; the depth scan is a broadcast
    * grid join. Exact integer cents (q241 convention) make both sort
    * keys engine-identical.
    */
  def q304(s: SparkSession, d: String): DataFrame = {
    val m = lineitem(s, d)
      .join(broadcast(part(s, d).select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand").as("brand"),
        floor(col("l_extendedprice") * 100.0).as("cents"),
        floor(col("l_quantity") * 100.0).as("qty100"))
      .groupBy(col("brand"))
      .agg(sum(col("cents")).as("revenue_c"), sum(col("qty100")).as("qty_c"))
      .withColumn("ra", row_number().over(
        Window.orderBy(col("revenue_c").desc, col("brand"))))
      .withColumn("rb", row_number().over(
        Window.orderBy(col("qty_c").desc, col("brand"))))
    val wgrid = {
      val rows = (1 to rboDepth).map(dd =>
        (dd.toLong, rboWeightE8(dd - 1)))
      import s.implicits._
      rows.toDF("depth", "w_e8")
    }
    m.crossJoin(broadcast(wgrid))
      .groupBy(col("depth"), col("w_e8"))
      .agg(sum(when(col("ra") <= col("depth") && col("rb") <= col("depth"),
        1L).otherwise(0L)).as("overlap"))
      .withColumn("rbo_cum_e8",
        sum(col("w_e8") * col("overlap")).over(
          Window.orderBy(col("depth"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("depth"), col("overlap"),
        round(col("overlap").cast("double") / col("depth").cast("double"), 4)
          .as("agreement"),
        round(col("rbo_cum_e8").cast("double") / 1e8, 6).as("rbo_at_depth"))
      .orderBy(col("depth"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q300_layout_skip" -> (q300 _),
    "q301_eb_shrinkage" -> (q301 _),
    "q302_jackknife_ratio" -> (q302 _),
    "q303_simpson_diversity" -> (q303 _),
    "q304_rbo_rankings" -> (q304 _))
}

/** DuckDB mirrors of Queries67 — identical integer boundaries,
  * identical literal grids (spliced from the SAME Scala values),
  * identical one-expression doubles (§7.4).
  */
object Oracle67 {

  private val fr = Queries67.fileRows

  private val predValues = Queries67.predGrid
    .map(p => s"('${p._1}', ${p._2}, ${p._3})").mkString(", ")

  private val rboValues = (1 to Queries67.rboDepth)
    .map(dd => s"($dd, ${Queries67.rboWeightE8(dd - 1)})").mkString(", ")

  val sql: Map[String, String] = Map(
    "q300_layout_skip" ->
      s"""WITH o AS (SELECT o_orderkey, epoch_ns(o_orderdate) // 1000 AS us
         |  FROM orders),
         |grid(pred, lo, hi) AS (VALUES $predValues),
         |insf AS (SELECT o_orderkey // $fr AS fid, min(us) AS mn,
         |    max(us) AS mx, count(*) AS n
         |  FROM o GROUP BY 1),
         |sel AS (SELECT pred, lo, hi, count(*) AS n_rows,
         |    CAST(sum(CASE WHEN us >= lo AND us < hi THEN 1 ELSE 0 END)
         |      AS BIGINT) AS rows_selected,
         |    CAST(sum(CASE WHEN us < lo THEN 1 ELSE 0 END) AS BIGINT)
         |      AS cnt_lo,
         |    CAST(sum(CASE WHEN us < hi THEN 1 ELSE 0 END) AS BIGINT)
         |      AS cnt_hi
         |  FROM o CROSS JOIN grid GROUP BY 1, 2, 3),
         |ins AS (SELECT 'insert_order' AS layout, g.pred,
         |    count(*) AS n_files,
         |    CAST(sum(CASE WHEN f.mx < g.lo OR f.mn >= g.hi THEN 1 ELSE 0
         |      END) AS BIGINT) AS n_skipped,
         |    CAST(sum(CASE WHEN f.mx < g.lo OR f.mn >= g.hi THEN 0 ELSE f.n
         |      END) AS BIGINT) AS rows_scanned
         |  FROM insf f CROSS JOIN grid g GROUP BY 1, 2),
         |insj AS (SELECT i.layout, i.pred, i.n_files, i.n_skipped,
         |    i.rows_scanned, s.rows_selected
         |  FROM ins i JOIN sel s USING (pred)),
         |dt AS (SELECT 'date_sorted' AS layout, pred,
         |    (n_rows + ${fr - 1}) // $fr AS n_files,
         |    CASE WHEN rows_selected = 0 THEN 0
         |      ELSE (cnt_hi - 1) // $fr - cnt_lo // $fr + 1 END AS n_scanned,
         |    cnt_lo // $fr AS first_f, n_rows, rows_selected
         |  FROM sel),
         |dtj AS (SELECT layout, pred, n_files,
         |    n_files - n_scanned AS n_skipped,
         |    CASE WHEN rows_selected = 0 THEN 0
         |      ELSE least(n_scanned * $fr, n_rows - first_f * $fr) END
         |      AS rows_scanned,
         |    rows_selected
         |  FROM dt),
         |u AS (SELECT * FROM insj UNION ALL SELECT * FROM dtj)
         |SELECT layout, pred, n_files, n_skipped, rows_scanned,
         |  rows_selected,
         |  round(CAST(n_skipped AS DOUBLE) / CAST(n_files AS DOUBLE), 4)
         |    AS skip_rate,
         |  CASE WHEN rows_selected > 0 THEN
         |    round(CAST(rows_scanned AS DOUBLE) /
         |      CAST(rows_selected AS DOUBLE), 4) END AS read_amplification
         |FROM u ORDER BY layout, pred""".stripMargin,

    "q301_eb_shrinkage" ->
      """WITH g AS (SELECT p.p_brand AS brand,
        |    count(*) AS ng,
        |    sum(CAST(floor(l.l_extendedprice * 100.0) AS BIGINT)) AS sg,
        |    sum(CAST(floor(l.l_extendedprice * 100.0) AS BIGINT) *
        |        CAST(floor(l.l_extendedprice * 100.0) AS BIGINT)) AS ssg
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  GROUP BY 1),
        |gt AS (SELECT brand, ng, sg, ssg,
        |    CAST(round(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) /
        |      CAST(ng AS DOUBLE), 6) AS DECIMAL(38,6)) AS wterm,
        |    ng * ng AS n2
        |  FROM g),
        |tot AS (SELECT count(*) AS k, CAST(sum(ng) AS BIGINT) AS n_total,
        |    sum(sg) AS s_all, sum(ssg) AS ss_all, sum(wterm) AS c,
        |    sum(n2) AS sn2
        |  FROM gt),
        |pan AS (SELECT
        |    CAST(s_all AS DOUBLE) / CAST(n_total AS DOUBLE) AS m,
        |    (CAST(ss_all AS DOUBLE) - CAST(c AS DOUBLE)) /
        |      CAST(n_total - k AS DOUBLE) AS s2w,
        |    CAST(c AS DOUBLE) - CAST(s_all AS DOUBLE) *
        |      CAST(s_all AS DOUBLE) / CAST(n_total AS DOUBLE) AS ssb,
        |    (CAST(n_total AS DOUBLE) - CAST(sn2 AS DOUBLE) /
        |      CAST(n_total AS DOUBLE)) / CAST(k - 1 AS DOUBLE) AS n0,
        |    k
        |  FROM tot),
        |pan2 AS (SELECT m, s2w,
        |    greatest(0.0, (ssb / CAST(k - 1 AS DOUBLE) - s2w) / n0) AS tau2
        |  FROM pan)
        |SELECT gt.brand, gt.ng AS n,
        |  round(CAST(gt.sg AS DOUBLE) / CAST(gt.ng AS DOUBLE) / 100.0, 4)
        |    AS raw_mean,
        |  round(p.tau2 / (p.tau2 + p.s2w / CAST(gt.ng AS DOUBLE)), 6)
        |    AS shrink_weight,
        |  round((p.m + p.tau2 / (p.tau2 + p.s2w / CAST(gt.ng AS DOUBLE)) *
        |    (CAST(gt.sg AS DOUBLE) / CAST(gt.ng AS DOUBLE) - p.m)) / 100.0,
        |    4) AS shrunk_mean
        |FROM gt, pan2 p ORDER BY gt.brand""".stripMargin,

    "q302_jackknife_ratio" ->
      """WITH coh AS (SELECT user_id % 10 AS cohort,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS cg,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS pg
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |  GROUP BY 1),
        |tot AS (SELECT CAST(sum(cg) AS BIGINT) AS c_all,
        |    CAST(sum(pg) AS BIGINT) AS p_all FROM coh),
        |loo AS (SELECT c_all, p_all,
        |    CAST(round(CAST(p_all - pg AS DOUBLE) /
        |      CAST(c_all - cg AS DOUBLE), 8) AS DECIMAL(20,8)) AS rg
        |  FROM coh, tot WHERE c_all - cg > 0),
        |base AS (SELECT c_all, p_all, count(*) AS gk, sum(rg) AS srg
        |  FROM loo GROUP BY 1, 2),
        |baser AS (SELECT c_all, p_all, gk,
        |    CAST(srg AS DOUBLE) / CAST(gk AS DOUBLE) AS rbar FROM base),
        |dev AS (SELECT l.c_all, b.p_all, b.gk, b.rbar,
        |    CAST(round((CAST(l.rg AS DOUBLE) - b.rbar) *
        |      (CAST(l.rg AS DOUBLE) - b.rbar), 10) AS DECIMAL(22,10))
        |      AS dev2
        |  FROM loo l JOIN baser b USING (c_all)),
        |agg AS (SELECT c_all, p_all, gk, rbar, sum(dev2) AS sdev2
        |  FROM dev GROUP BY 1, 2, 3, 4),
        |fin AS (SELECT gk, c_all, p_all, rbar,
        |    CAST(p_all AS DOUBLE) / CAST(c_all AS DOUBLE) AS ratio,
        |    sqrt(CAST(gk - 1 AS DOUBLE) / CAST(gk AS DOUBLE) *
        |      CAST(sdev2 AS DOUBLE)) AS se
        |  FROM agg)
        |SELECT gk AS n_cohorts, c_all AS clicks, p_all AS purchases,
        |  round(ratio, 6) AS ratio, round(rbar, 6) AS jk_mean,
        |  round(se, 6) AS jk_se,
        |  round(CAST(gk - 1 AS DOUBLE) * (rbar - ratio), 8) + 0.0
        |    AS jk_bias,
        |  round(ratio - 1.96 * se, 6) AS ci_lo,
        |  round(ratio + 1.96 * se, 6) AS ci_hi
        |FROM fin""".stripMargin,

    "q303_simpson_diversity" ->
      """WITH tok AS (SELECT source,
        |    unnest(list_filter(string_split(text, ' '), w -> len(w) > 0))
        |      AS tok
        |  FROM documents),
        |c AS (SELECT source, tok, count(*) AS ni FROM tok GROUP BY 1, 2),
        |g AS (SELECT source, CAST(sum(ni) AS BIGINT) AS n_tokens,
        |    count(*) AS vocab,
        |    CAST(sum(ni * (ni - 1)) AS BIGINT) AS pair2
        |  FROM c GROUP BY 1)
        |SELECT source, n_tokens, vocab,
        |  round(CAST(pair2 AS DOUBLE) / (CAST(n_tokens AS DOUBLE) *
        |    CAST(n_tokens - 1 AS DOUBLE)), 8) AS simpson,
        |  CASE WHEN pair2 > 0 THEN
        |    round((CAST(n_tokens AS DOUBLE) *
        |      CAST(n_tokens - 1 AS DOUBLE)) / CAST(pair2 AS DOUBLE), 4)
        |  END AS effective_vocab
        |FROM g ORDER BY source""".stripMargin,

    "q304_rbo_rankings" ->
      s"""WITH m AS (SELECT p.p_brand AS brand,
         |    CAST(sum(CAST(floor(l.l_extendedprice * 100.0) AS BIGINT))
         |      AS BIGINT) AS revenue_c,
         |    CAST(sum(CAST(floor(l.l_quantity * 100.0) AS BIGINT))
         |      AS BIGINT) AS qty_c
         |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         |  GROUP BY 1),
         |r AS (SELECT brand,
         |    row_number() OVER (ORDER BY revenue_c DESC, brand) AS ra,
         |    row_number() OVER (ORDER BY qty_c DESC, brand) AS rb
         |  FROM m),
         |wg(depth, w_e8) AS (VALUES $rboValues),
         |ov AS (SELECT wg.depth, wg.w_e8,
         |    CAST(sum(CASE WHEN r.ra <= wg.depth AND r.rb <= wg.depth
         |      THEN 1 ELSE 0 END) AS BIGINT) AS overlap
         |  FROM r CROSS JOIN wg GROUP BY 1, 2)
         |SELECT depth, overlap,
         |  round(CAST(overlap AS DOUBLE) / CAST(depth AS DOUBLE), 4)
         |    AS agreement,
         |  round(CAST(sum(w_e8 * overlap) OVER (ORDER BY depth
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         |    / 1e8, 6) AS rbo_at_depth
         |FROM ov ORDER BY depth""".stripMargin)
}
