package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.{Signal, Text, Vectors}
import graft.operators.AsOf

/** Round-2 relational extensions (SURVEY.md §2.5/§2.6 widened): as-of
  * join surfaced as an oracled query (DuckDB ASOF JOIN), broadcast
  * interval/range join, correlated + EXISTS subqueries through the
  * spark.sql surface (Catalyst decorrelation), pivot/unpivot, and the
  * remaining analytic window functions.
  *
  * Determinism conventions as everywhere (SURVEY.md §7.4): ORDER BY
  * unique keys, 4-dp rounding of derived floats, decimal sums for
  * order-independent aggregation.
  */
object Queries2 {
  import Tables._

  /** J5 as an oracled query: for every purchase event, the most recent
    * click at-or-before it by the same user (operators.AsOf — tag +
    * union + one window ⇒ ONE shuffle on user_id; no range explosion).
    * Right side pre-deduped on (user_id, ts) per the AsOf tie contract.
    * DuckDB side is a native ASOF LEFT JOIN — identical semantics.
    */
  def q55(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
    val clicks = e.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("value")).as("click_value"))
    AsOf.join(purchases, clicks, "user_id", "ts", "ts", Seq("click_value"))
      .select(col("user_id"), col("event_id"), col("ts"), col("value"),
        col("matched_ts"), col("click_value"))
      .orderBy(col("event_id"))
  }

  /** Interval/range join: facts against a small interval dimension.
    * The scale shape — the interval table broadcasts (inner BNLJ,
    * build = tiny side) and the fact side streams through unshuffled;
    * the left-completion join afterwards touches only |intervals|
    * rows. Never a fact×fact inequality join.
    */
  def q56(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val years = (1995 to 2000).map(y => (y.toString, s"$y-01-01", s"${y + 1}-01-01"))
      .toDF("yname", "ystart_s", "yend_s")
      .select(col("yname"), to_timestamp(col("ystart_s")).as("ystart"),
        to_timestamp(col("yend_s")).as("yend"))
    val agg = orders(s, d)
      .join(broadcast(years),
        col("o_orderdate") >= col("ystart") && col("o_orderdate") < col("yend"))
      .groupBy(col("yname"))
      .agg(count(col("o_orderkey")).as("n"),
        Signal.exactSumD(col("o_totalprice")).as("total"))
    years.select(col("yname")).join(agg, Seq("yname"), "left")
      .select(col("yname"), coalesce(col("n"), lit(0L)).as("n"), col("total"))
      .orderBy(col("yname"))
  }

  /** Correlated scalar subqueries via the spark.sql surface: customers
    * above their nation's average balance. Catalyst decorrelates both
    * subqueries into aggregate+join — no per-row re-execution. Exact
    * decimal arithmetic (balance × count > sum) so both engines decide
    * boundary rows identically.
    */
  def q57(s: SparkSession, d: String): DataFrame = {
    customer(s, d).createOrReplaceTempView("customer_v57")
    s.sql(
      """SELECT c_custkey, c_name, c_acctbal FROM customer_v57 c
        |WHERE CAST(c_acctbal AS DECIMAL(18,6)) *
        |    (SELECT count(*) FROM customer_v57 c2
        |     WHERE c2.c_nationkey = c.c_nationkey) >
        |  (SELECT sum(CAST(c3.c_acctbal AS DECIMAL(18,6))) FROM customer_v57 c3
        |   WHERE c3.c_nationkey = c.c_nationkey)
        |ORDER BY c_custkey""".stripMargin)
  }

  /** EXISTS subquery (TPC-H Q4 shape): orders having a discounted
    * lineitem. Plans as a left-semi join — no payload duplication.
    */
  def q58(s: SparkSession, d: String): DataFrame = {
    orders(s, d).createOrReplaceTempView("orders_v58")
    lineitem(s, d).createOrReplaceTempView("lineitem_v58")
    s.sql(
      """SELECT o_orderstatus, count(*) AS n FROM orders_v58 o
        |WHERE EXISTS (SELECT 1 FROM lineitem_v58 l
        |  WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.05)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
  }

  /** Pivot with an EXPLICIT value list (never the collect-distinct
    * form — at 100 TB the value scan would be a full extra pass).
    * One partial+final hash aggregate; missing cells coalesced to 0.
    */
  def q59(s: SparkSession, d: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    events(s, d)
      .groupBy(col("user_id"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .select(col("user_id") +:
        types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
      .orderBy(col("user_id"))
  }

  /** Unpivot/melt (wide → long) + re-aggregate: per-metric mean over
    * lineitem measures. Unpivot is a narrow generator (4 rows out per
    * row in, no shuffle); the aggregate shuffles 4 keys.
    */
  def q60(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax")),
        "metric", "v")
      .groupBy(col("metric"))
      .agg(
        round(Signal.exactSum(col("v")).cast("double") / count(lit(1)), 4)
          .as("avg_value"),
        count(lit(1)).as("n"))
      .orderBy(col("metric"))

  /** W3/W4 completion: ntile / percent_rank / cume_dist / lead /
    * first_value in one partition-local window pass.
    */
  def q61(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("value").desc, col("event_id"))
    events(s, d)
      .select(col("event_id"),
        ntile(4).over(w).as("nt"),
        round(percent_rank().over(w), 4).as("pr"),
        round(cume_dist().over(w), 4).as("cd"),
        lead(col("event_id"), 1).over(w).as("next_id"),
        first(col("event_id")).over(w).as("first_id"))
      .orderBy(col("event_id"))
  }

  // ---- training-data pipeline extensions (round 2) ---------------------

  /** X1b completion: candidate PAIRS → dedup CLUSTERS. Connected
    * components over the q46 LSH candidate edges (min-label
    * propagation, O(diameter) shuffle rounds — see
    * Dedup.connectedComponents); cluster id = min doc_id, i.e. the
    * kept representative. Oracle: recursive CTE over the identical
    * pair set.
    */
  def q62(s: SparkSession, d: String): DataFrame =
    // candidate pairs + CC come from the materialized-once LSH stage
    // (LshStages) shared with q46/q77/q81 — same values, computed once
    LshStages.clusters(s, d).orderBy(col("doc_id"))

  /** Normalization-then-exact dedup: strip digits, collapse runs of
    * spaces, trim; canonical doc = min doc_id per normalized
    * fingerprint. The md5 keys the shuffle (16 bytes/row), per X1.
    */
  def q63(s: SparkSession, d: String): DataFrame = {
    val norm = trim(regexp_replace(
      regexp_replace(col("text"), "[0-9]+", ""), " +", " "))
    documents(s, d)
      .select(col("doc_id"), md5(norm).as("norm_md5"))
      .withColumn("is_canonical",
        col("doc_id") === min(col("doc_id"))
          .over(Window.partitionBy(col("norm_md5"))))
      .orderBy(col("doc_id"))
  }

  /** Gopher-style quality rules (Rae et al. 2021 §A1.1 shape): token
    * count bounds, mean word length in [3,10], fraction of tokens
    * containing an alphabetic char. Pure narrow column math; the keep
    * decision uses UNROUNDED doubles on both engines so boundary docs
    * agree.
    */
  def q64(s: SparkSession, d: String): DataFrame = {
    val st = graft.functions.TextExpressions.quality_stats(col("text"))
    val nTok = st.getField("n_tok")
    val meanWlen = st.getField("mean_tok_len")
    val alphaFrac = st.getField("alpha_frac")
    documents(s, d).select(
      col("doc_id"),
      nTok.as("n_tok"),
      round(meanWlen, 4).as("mean_wlen"),
      round(alphaFrac, 4).as("alpha_frac"),
      (nTok.between(50, 100000) && meanWlen.between(3.0, 10.0) &&
        alphaFrac >= 0.8).as("keep"))
      .orderBy(col("doc_id"))
  }

  /** Stopword removal + top content words — the vocabulary pass after
    * filtering the all-language stoplist.
    */
  def q65(s: SparkSession, d: String): DataFrame = {
    val stop = Text.stopwords.values.flatten.toSeq
    documents(s, d)
      .select(explode(filter(Text.tokens(col("text")),
        t => !t.isInCollection(stop))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(30)
  }

  /** Character-level Shannon entropy per document (a gibberish /
    * compression-quality signal): explode chars → per-doc counts →
    * −Σ p ln p. Two partial+final aggregates, shuffles keyed on
    * (doc, char) then doc.
    */
  def q66(s: SparkSession, d: String): DataFrame = {
    val cnt = documents(s, d)
      .select(col("doc_id"),
        explode(regexp_extract_all(col("text"), lit("."), lit(0))).as("c"))
      .groupBy(col("doc_id"), col("c")).agg(count(lit(1)).as("n"))
      .withColumn("tot", sum(col("n")).over(Window.partitionBy(col("doc_id"))))
    val p = col("n").cast("double") / col("tot").cast("double")
    // + 0.0 canonicalizes IEEE -0.0 (a uniform-char doc yields -0.0
    // from -sum; DuckDB round() preserves the sign, Spark's does not)
    cnt.groupBy(col("doc_id"))
      .agg((round(-sum(p * log(p)), 4) + lit(0.0)).as("char_entropy"))
      .orderBy(col("doc_id"))
  }

  /** k-NN join (every vector is a query): top-3 cosine neighbors
    * within the (label × LSH-bucket) block with depth-1 bit-flip
    * multi-probe — the same literal hyperplane codebook as q82/q84
    * (Ann.codebook via Queries4.Hps) and the same probe ladder as
    * lshTopK (Ann.probeVariants), so the oracle reproduces the
    * Hamming ≤ 1 neighborhood exactly. The composed key grows with
    * the corpus (add hyperplanes → 2^n buckets), bounding per-block
    * population where a bare `label` key's blocks grow linearly, and
    * recall is tuned by probe depth; q84 is the corpus-wide depth-0
    * twin. Norms and bucket precomputed narrow; per-query ranking is
    * a partition-local window, never a global sort.
    */
  def q67(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
      .withColumn("bucket", operators.Ann.lshBucket(col("embedding"), Queries4.Hps))
      .withColumn("nrm", Vectors.norm(col("embedding")))
    val a = e.select(col("vec_id").as("q_id"), col("label"), col("bucket"),
      col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    val b = e.select(col("vec_id").as("n_id"), col("label").as("label_b"),
      explode(operators.Ann.probeVariants(col("bucket"), Queries4.Hps.length, 1))
        .as("bucket_b"),
      col("embedding").as("n_emb"), col("nrm").as("n_nrm"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("n_id"))
    a.join(b, col("label") === col("label_b") &&
        col("bucket") === col("bucket_b") && col("q_id") =!= col("n_id"))
      .withColumn("cos",
        Vectors.dot(col("q_emb"), col("n_emb")) / (col("q_nrm") * col("n_nrm")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("q_id"), col("rk"), col("n_id"), round(col("cos"), 4).as("cosine"))
      .orderBy(col("q_id"), col("rk"))
  }

  private[graft] val EwmaAlpha = 0.2
  private[graft] val EwmaK = 20
  /** Truncated-EWMA weights (1−α)^j as Scala-computed literals — the
    * SAME doubles are spliced into the DuckDB oracle, so no
    * cross-engine pow() drift can exist.
    */
  private[graft] val ewmaW: IndexedSeq[Double] =
    (0 until EwmaK).map(j => math.pow(1 - EwmaAlpha, j))
  private[graft] val ewmaCum: IndexedSeq[Double] =
    (1 to EwmaK).map(m => ewmaW.take(m).sum)

  /** Windowed exponential smoothing (EWMA truncated at 20 lags,
    * α=0.2) per user over event time — the time-series smoothing pass.
    * A fixed lag stencil (20 codegen'd lag() reads in ONE window pass)
    * rather than a recursive state: deterministic, partition-local,
    * and identical on both engines.
    */
  def q68(s: SparkSession, d: String): DataFrame = {
    val w0 = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val num = (0 until EwmaK).map(j =>
      lit(ewmaW(j)) * coalesce(lag(col("value"), j).over(w0), lit(0.0)))
      .reduce(_ + _)
    val rn = row_number().over(w0)
    val den = (1 until EwmaK).foldRight(lit(ewmaCum(EwmaK - 1)): Column) {
      (m, acc) => when(rn === m, lit(ewmaCum(m - 1))).otherwise(acc)
    }
    events(s, d)
      .select(col("event_id"), col("user_id"), col("value"),
        round(num / den, 4).as("ewma"))
      .orderBy(col("event_id"))
  }

  /** Time-series gap fill + forward fill: per-user hourly grid
    * (sequence + explode — a narrow generator), left join of observed
    * hourly aggregates, last(ignoreNulls) carry-forward, then per-user
    * rollup. Decimal hourly sums keep the forward-filled aggregate
    * exact under any partial-agg order.
    */
  def q69(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val hourly = e.groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
      .agg(Signal.exactSum(col("value")).as("hv"), count(lit(1)).as("hn"))
    val slots = e.groupBy(col("user_id"))
      .agg(date_trunc("hour", min(col("ts"))).as("t0"),
        date_trunc("hour", max(col("ts"))).as("t1"))
      .select(col("user_id"),
        explode(expr("sequence(t0, t1, interval 1 hour)")).as("h"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    slots.join(hourly, Seq("user_id", "h"), "left")
      .withColumn("fv", last(col("hv"), ignoreNulls = true).over(w))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_slots"),
        count(when(col("hn") > 0, lit(1))).as("n_observed"),
        round(sum(col("fv")).cast("double") / count(lit(1)), 4).as("avg_filled"))
      .orderBy(col("user_id"))
  }

  /** TF-IDF top terms per document: tf × ln(N/df), ranked per doc on
    * the ROUNDED score (identical on both engines) with term
    * tie-break. df table shuffles on the term; N is a 1-row broadcast.
    */
  def q70(s: SparkSession, d: String): DataFrame = {
    // N via a broadcast 1-row aggregate (q75/q80 house shape — no
    // driver-side action, no extra job; docs with text — every such doc
    // yields ≥1 token, so this equals the oracle's distinct-doc count);
    // df via a window over the (doc, term) aggregate. ONE tokenize+
    // explode pass total — a tf⋈df join would re-run it per consumer.
    val nd = documents(s, d).filter(col("text").isNotNull)
      .agg(count(lit(1)).as("nd"))
    val tf = documents(s, d)
      .select(col("doc_id"), explode(Text.tokens(col("text"))).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
    val w0 = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("w"))
    tf.crossJoin(broadcast(nd))
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("w"))))
      .withColumn("tfidf",
        round(col("tf") * log(col("nd").cast("double") / col("df")), 4))
      .withColumn("rk", row_number().over(w0))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("rk"), col("w").as("term"), col("tfidf"))
      .orderBy(col("doc_id"), col("rk"))
  }

  /** J6 surfaced in the harness: two-phase salted aggregation
    * (operators.Skew). The salt spreads a hot key over 8 partial
    * tasks; re-combining per key restores exact results — the oracle
    * is the PLAIN aggregate, proving salting is semantically
    * invisible. Decimal value sums keep the two-phase combine exact.
    */
  def q71(s: SparkSession, d: String): DataFrame =
    graft.operators.Skew.saltedStats(events(s, d), col("event_type"),
      col("event_id"), col("value").cast(org.apache.spark.sql.types.DecimalType(18, 6)),
      salts = 8)
      .select(col("key").as("event_type"), col("n"),
        round(col("sum").cast("double"), 4).as("total"),
        round(col("min").cast("double"), 4).as("min_v"),
        round(col("max").cast("double"), 4).as("max_v"))
      .orderBy(col("event_type"))

  /** Star-schema rollup (TPC-H Q5 shape): region ⋈ nation ⋈ customer
    * ⋈ orders, revenue per region. All three dims broadcast; the fact
    * table never shuffles for the joins — one exchange for the final
    * 5-key aggregate.
    */
  def q72(s: SparkSession, d: String): DataFrame =
    region(s, d)
      .join(nation(s, d), col("r_regionkey") === col("n_regionkey"))
      .join(customer(s, d), col("n_nationkey") === col("c_nationkey"))
      .join(orders(s, d), col("c_custkey") === col("o_custkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n"), Signal.exactSumD(col("o_totalprice")).as("revenue"))
      .orderBy(col("r_name"))

  /** Aggregate-then-window: monthly order counts with month-over-month
    * growth. The lag window runs on the AGGREGATED series (≤ 1 row per
    * month — driver-scale), so the unpartitioned window is safe at any
    * fact-table size.
    */
  def q73(s: SparkSession, d: String): DataFrame = {
    val w = Window.orderBy(col("month"))
    orders(s, d)
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(count(lit(1)).as("n"))
      .withColumn("mom_growth",
        round((col("n").cast("double") - lag(col("n"), 1).over(w)) /
          lag(col("n"), 1).over(w), 4))
      .orderBy(col("month"))
  }

  /** Data-quality consistency check (F9 family): the numeric id
    * embedded in c_name must equal c_custkey. Narrow regexp + compare,
    * counts per outcome.
    */
  def q74(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      // coalesce(false): a digit-free name parses to NULL ≠ key →
      // semantically "not ok", and no NULL group (whose sort position
      // differs between engines) can appear
      .groupBy(coalesce(regexp_extract(col("c_name"), "[0-9]+", 0).cast("long") ===
        col("c_custkey"), lit(false)).as("ok"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("ok"))

  /** Histogram: 20 equi-width buckets over the global value range.
    * The 1-row min/max aggregate broadcasts (q09 shape); bucketing is
    * narrow; the final aggregate shuffles ≤ 20 keys.
    */
  def q75(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val st = e.agg(min(col("value")).as("mn"), max(col("value")).as("mx"))
    // greatest(width, tiny): a degenerate all-equal column makes the
    // width 0 and 0/0 → NaN, where Spark's int cast and DuckDB's
    // diverge (error vs value); the floor guard keeps bucket 0 on both
    e.crossJoin(broadcast(st))
      .select(least(floor((col("value") - col("mn")) /
        greatest((col("mx") - col("mn")) / lit(20.0), lit(1e-300))),
        lit(19.0)).cast("int").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
      .orderBy(col("bucket"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q55_asof_join" -> (q55 _),
    "q56_range_join" -> (q56 _),
    "q57_scalar_subquery" -> (q57 _),
    "q58_exists_subquery" -> (q58 _),
    "q59_pivot" -> (q59 _),
    "q60_unpivot" -> (q60 _),
    "q61_window_extras" -> (q61 _),
    "q62_dedup_clusters" -> (q62 _),
    "q63_normalized_dedup" -> (q63 _),
    "q64_gopher_rules" -> (q64 _),
    "q65_content_words" -> (q65 _),
    "q66_char_entropy" -> (q66 _),
    "q67_knn_join" -> (q67 _),
    "q68_ewma_smooth" -> (q68 _),
    "q69_gap_fill" -> (q69 _),
    "q70_tfidf" -> (q70 _),
    "q71_salted_agg" -> (q71 _),
    "q72_star_join" -> (q72 _),
    "q73_mom_growth" -> (q73 _),
    "q74_consistency_check" -> (q74 _),
    "q75_histogram" -> (q75 _)
  )
}

/** DuckDB oracles for Queries2. Formula-bearing SQL is generated from
  * the same Scala constants as the Spark side (EWMA weights, stopword
  * lists, the q46 LSH pair CTEs) so no cross-engine formula drift can
  * exist.
  */
object Oracle2 {

  private def inList(words: Seq[String]): String =
    words.map(w => s"'${w.replace("'", "''")}'").mkString(", ")

  val sql: Map[String, String] = Map(
    "q55_asof_join" ->
      """SELECT p.user_id, p.event_id, p.ts, p.value,
        |  c.ts AS matched_ts, c.click_value
        |FROM (SELECT user_id, event_id, ts, value FROM events
        |      WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT user_id, ts, max(value) AS click_value
        |      FROM events WHERE event_type = 'click'
        |      GROUP BY user_id, ts) c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin,

    "q56_range_join" ->
      """WITH y(yname, ystart, yend) AS (VALUES
        |  ('1995', TIMESTAMP '1995-01-01', TIMESTAMP '1996-01-01'),
        |  ('1996', TIMESTAMP '1996-01-01', TIMESTAMP '1997-01-01'),
        |  ('1997', TIMESTAMP '1997-01-01', TIMESTAMP '1998-01-01'),
        |  ('1998', TIMESTAMP '1998-01-01', TIMESTAMP '1999-01-01'),
        |  ('1999', TIMESTAMP '1999-01-01', TIMESTAMP '2000-01-01'),
        |  ('2000', TIMESTAMP '2000-01-01', TIMESTAMP '2001-01-01'))
        |SELECT y.yname, count(o.o_orderkey) AS n,
        |  round(CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 4) AS total
        |FROM y LEFT JOIN orders o
        |  ON o.o_orderdate >= y.ystart AND o.o_orderdate < y.yend
        |GROUP BY y.yname ORDER BY y.yname""".stripMargin,

    "q57_scalar_subquery" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer c
        |WHERE CAST(c_acctbal AS DECIMAL(18,6)) *
        |    (SELECT count(*) FROM customer c2
        |     WHERE c2.c_nationkey = c.c_nationkey) >
        |  (SELECT sum(CAST(c3.c_acctbal AS DECIMAL(18,6))) FROM customer c3
        |   WHERE c3.c_nationkey = c.c_nationkey)
        |ORDER BY c_custkey""".stripMargin,

    "q58_exists_subquery" ->
      """SELECT o_orderstatus, count(*) AS n FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.05)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q59_pivot" ->
      """SELECT user_id,
        |  count(*) FILTER (WHERE event_type='click') AS click,
        |  count(*) FILTER (WHERE event_type='error') AS error,
        |  count(*) FILTER (WHERE event_type='purchase') AS purchase,
        |  count(*) FILTER (WHERE event_type='signup') AS signup,
        |  count(*) FILTER (WHERE event_type='view') AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q60_unpivot" ->
      """SELECT metric,
        |  round(CAST(sum(CAST(v AS DECIMAL(18,6))) AS DOUBLE) / count(*), 4) AS avg_value,
        |  count(*) AS n
        |FROM (
        |  SELECT 'l_quantity' AS metric, l_quantity AS v FROM lineitem
        |  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
        |  UNION ALL SELECT 'l_tax', l_tax FROM lineitem)
        |GROUP BY metric ORDER BY metric""".stripMargin,

    "q61_window_extras" ->
      """SELECT event_id,
        |  ntile(4) OVER w AS nt,
        |  round(percent_rank() OVER w, 4) AS pr,
        |  round(cume_dist() OVER w, 4) AS cd,
        |  lead(event_id) OVER w AS next_id,
        |  first_value(event_id) OVER w AS first_id
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY value DESC, event_id)
        |ORDER BY event_id""".stripMargin,

    "q62_dedup_clusters" ->
      s"""WITH RECURSIVE ${OracleExt.lshPairCtes},
         |und AS (SELECT a_id AS src, b_id AS dst FROM pairs
         |        UNION ALL SELECT b_id, a_id FROM pairs),
         |nodes AS (SELECT DISTINCT src AS n FROM und),
         |walk(n, lbl) AS (
         |  SELECT n, n FROM nodes
         |  UNION
         |  SELECT und.dst, walk.lbl FROM walk JOIN und ON walk.n = und.src
         |  WHERE walk.lbl < und.dst
         |)
         |SELECT n AS doc_id, min(lbl) AS cluster_id
         |FROM walk GROUP BY n ORDER BY doc_id""".stripMargin,

    "q63_normalized_dedup" ->
      """WITH n AS (SELECT doc_id,
        |  md5(trim(regexp_replace(regexp_replace(text, '[0-9]+', '', 'g'),
        |    ' +', ' ', 'g'))) AS norm_md5
        |FROM documents)
        |SELECT doc_id, norm_md5,
        |  doc_id = min(doc_id) OVER (PARTITION BY norm_md5) AS is_canonical
        |FROM n ORDER BY doc_id""".stripMargin,

    "q64_gopher_rules" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |m AS (SELECT doc_id, len(toks) AS n_tok,
        |  CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
        |    / CAST(greatest(len(toks), 1) AS DOUBLE) AS mwl,
        |  CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
        |    / CAST(greatest(len(toks), 1) AS DOUBLE) AS af
        |FROM t)
        |SELECT doc_id, n_tok, round(mwl, 4) AS mean_wlen,
        |  round(af, 4) AS alpha_frac,
        |  (n_tok BETWEEN 50 AND 100000) AND (mwl BETWEEN 3.0 AND 10.0)
        |    AND af >= 0.8 AS keep
        |FROM m ORDER BY doc_id""".stripMargin,

    "q65_content_words" -> {
      val stop = inList(Text.stopwords.values.flatten.toSeq)
      s"""WITH tok AS (SELECT unnest(list_filter(string_split(text, ' '),
         |  w -> w NOT IN ($stop))) AS word FROM documents)
         |SELECT word, count(*) AS n FROM tok
         |GROUP BY word ORDER BY n DESC, word LIMIT 30""".stripMargin
    },

    "q66_char_entropy" ->
      """WITH ch AS (SELECT doc_id, unnest(regexp_extract_all(text, '.')) AS c
        |  FROM documents),
        |cnt AS (SELECT doc_id, c, count(*) AS n FROM ch GROUP BY doc_id, c),
        |w AS (SELECT doc_id, n,
        |  sum(n) OVER (PARTITION BY doc_id) AS tot FROM cnt)
        |SELECT doc_id,
        |  round(-sum((CAST(n AS DOUBLE) / tot) * ln(CAST(n AS DOUBLE) / tot)), 4)
        |    + 0.0 AS char_entropy
        |FROM w GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q67_knn_join" ->
      s"""WITH bk AS (SELECT vec_id, label, embedding,
        |    ${Oracle4.bucketSql("embedding")} AS bucket
        |  FROM embeddings),
        |p AS (
        |  SELECT a.vec_id AS q_id, b.vec_id AS n_id,
        |    list_sum(list_transform(range(1, len(a.embedding)+1),
        |      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(a.embedding,
        |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(b.embedding,
        |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos
        |  FROM bk a JOIN bk b
        |    ON a.label = b.label AND a.vec_id <> b.vec_id
        |  WHERE (${OracleExt.hammingSql("a.bucket", "b.bucket", 4)}) <= 1),
        |rk AS (SELECT q_id, n_id, cos,
        |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rk
        |FROM p)
        |SELECT q_id, rk, n_id, round(cos, 4) AS cosine
        |FROM rk WHERE rk <= 3 ORDER BY q_id, rk""".stripMargin,

    "q68_ewma_smooth" -> {
      import Queries2.{EwmaK, ewmaW, ewmaCum}
      val num = (0 until EwmaK).map(j =>
        s"${ewmaW(j)} * coalesce(lag(value, $j) OVER w0, 0.0)")
        .mkString("\n    + ")
      val den = (1 until EwmaK).map(m =>
        s"WHEN rn = $m THEN ${ewmaCum(m - 1)}").mkString(" ")
      s"""WITH x AS (SELECT event_id, user_id, value,
         |  row_number() OVER w0 AS rn,
         |  ($num) AS num
         |FROM events
         |WINDOW w0 AS (PARTITION BY user_id ORDER BY ts, event_id))
         |SELECT event_id, user_id, value,
         |  round(num / (CASE $den ELSE ${ewmaCum(EwmaK - 1)} END), 4) AS ewma
         |FROM x ORDER BY event_id""".stripMargin
    },

    "q69_gap_fill" ->
      """WITH span AS (SELECT user_id, date_trunc('hour', min(ts)) AS t0,
        |    date_trunc('hour', max(ts)) AS t1 FROM events GROUP BY user_id),
        |slots AS (SELECT user_id,
        |  unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS h FROM span),
        |hourly AS (SELECT user_id AS hu, date_trunc('hour', ts) AS hh,
        |    sum(CAST(value AS DECIMAL(18,6))) AS hv, count(*) AS hn
        |  FROM events GROUP BY 1, 2),
        |j AS (SELECT s.user_id, s.h, hv, coalesce(hn, 0) AS hn
        |  FROM slots s LEFT JOIN hourly ON s.user_id = hu AND s.h = hh),
        |f AS (SELECT user_id, hn,
        |  last_value(hv IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY h
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fv
        |FROM j)
        |SELECT user_id, count(*) AS n_slots,
        |  count(*) FILTER (WHERE hn > 0) AS n_observed,
        |  round(CAST(sum(fv) AS DOUBLE) / count(*), 4) AS avg_filled
        |FROM f GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q70_tfidf" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |tf AS (SELECT doc_id, w, count(*) AS tf FROM tok GROUP BY doc_id, w),
        |df AS (SELECT w AS dw, count(DISTINCT doc_id) AS df FROM tok GROUP BY w),
        |nd AS (SELECT count(DISTINCT doc_id) AS n FROM tok),
        |sc AS (SELECT doc_id, w,
        |  round(tf * ln(CAST(n AS DOUBLE) / df), 4) AS tfidf
        |  FROM tf JOIN df ON w = dw CROSS JOIN nd),
        |rk AS (SELECT doc_id, w, tfidf,
        |  row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, w) AS rk
        |FROM sc)
        |SELECT doc_id, rk, w AS term, tfidf
        |FROM rk WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,

    // the salted two-phase aggregate must equal the PLAIN aggregate —
    // that equality is exactly what the oracle checks
    "q71_salted_agg" ->
      """SELECT event_type, count(*) AS n,
        |  round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS total,
        |  round(min(value), 4) AS min_v, round(max(value), 4) AS max_v
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q72_star_join" ->
      """SELECT r_name, count(*) AS n,
        |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 4) AS revenue
        |FROM region JOIN nation ON r_regionkey = n_regionkey
        |JOIN customer ON n_nationkey = c_nationkey
        |JOIN orders ON c_custkey = o_custkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "q73_mom_growth" ->
      """WITH m AS (SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
        |    count(*) AS n
        |  FROM orders GROUP BY 1)
        |SELECT month, n,
        |  round((CAST(n AS DOUBLE) - lag(n) OVER (ORDER BY month))
        |    / lag(n) OVER (ORDER BY month), 4) AS mom_growth
        |FROM m ORDER BY month""".stripMargin,

    "q74_consistency_check" ->
      """SELECT coalesce(TRY_CAST(regexp_extract(c_name, '[0-9]+') AS BIGINT)
        |    = c_custkey, FALSE) AS ok,
        |  count(*) AS n
        |FROM customer GROUP BY ok ORDER BY ok""".stripMargin,

    "q75_histogram" ->
      """WITH st AS (SELECT min(value) AS mn, max(value) AS mx FROM events)
        |SELECT CAST(least(floor((value - mn) / greatest((mx - mn) / 20.0, 1e-300)), 19)
        |    AS INTEGER) AS bucket,
        |  count(*) AS n
        |FROM events, st GROUP BY bucket ORDER BY bucket""".stripMargin
  )
}
