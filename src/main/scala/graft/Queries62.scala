package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-9 batch 3: higher-order basket mining, offline changepoint
  * localization, and vocabulary mass estimation
  * (SURVEY §2.8 X189-X191).
  */
object Queries62 {
  import Tables._

  /** q279 — FREQUENT BRAND TRIPLES (X189). Extends q234's pair rules
    * to 3-itemsets: support counts of brand triples co-occurring in
    * an order basket, min-support 5 absolute, with the 3-way lift
    * N²·n_abc/(n_a·n_b·n_c) against full independence. Triple
    * generation is the q222/q234 in-row expansion — ONE shuffle to
    * per-order sorted brand sets, then i<j<k slicing, never a 3-way
    * fact self-join. Counts are exact; support/lift are single float
    * expressions.
    *
    * Scale: fanout C(brands-per-order, 3) is bounded by the 25-brand
    * dimension (≤2300/order; typical baskets ≲10 brands → ≤120). At
    * a high-cardinality item dimension the standard guard is the
    * q143 cap: restrict to the top-k items by support before
    * expansion — documented, not needed at the brand dimension.
    * The basket frame is [[Queries45.baskets]] — the SAME persisted
    * (orderkey, brand) stage q234/q235 mine (r9 verdict: rebuilding
    * it here cost a redundant fact join + distinct).
    */
  def q279(s: SparkSession, d: String): DataFrame = {
    val b = Queries45.baskets(s, d)
    val n = Queries45.basketSets(s, d).agg(count(lit(1)).as("n_orders"))
    val itemN = b.groupBy(col("brand")).agg(count(lit(1)).as("n_item"))
    // in-row i<j<k expansion over the persisted sets — measured
    // AGAINST a codegen'd 3-way orderkey self-join (r10): ~0.8 s vs
    // ~1.7 s exec. The q235 join-beats-HOF lesson is FANOUT-bounded:
    // customers hold ~20 brands (C(20,2)≈190 lambda steps/row — join
    // wins) while orders hold ~3 (C(3,3)≈1-4 steps/row — the join's
    // two extra 520k-row shuffles dominate, HOF wins).
    // triple expansion via the Combos kernel (round 12): the r10
    // index-sequence HOF form still interpreted ~3-5 boxed lambda
    // frames per triple (1.1M triples at sf0.1) — exactly the CPU
    // class that inflated 2-7x on throttled driver windows (r11
    // passes 1.6/6.5/11.2 s on identical code). One tight loop per
    // basket row emits the same structs; C(n<3, 3) = 0 rows makes the
    // old size>=3 guard a plain pruning filter rather than a
    // correctness guard (sequence()'s descending-range hazard is gone
    // with the HOFs).
    val triples = Queries45.basketSets(s, d)
      .filter(size(col("bs")) >= 3)
      .select(explode(
        graft.functions.TextExpressions.combos(col("bs"), 3)).as("t"))
      .groupBy(col("t.a"), col("t.b"), col("t.c"))
      .agg(count(lit(1)).as("n_abc"))
      .filter(col("n_abc") >= 5)
    triples
      .join(broadcast(itemN.select(col("brand").as("a"),
        col("n_item").as("na"))), Seq("a"))
      .join(broadcast(itemN.select(col("brand").as("b"),
        col("n_item").as("nb"))), Seq("b"))
      .join(broadcast(itemN.select(col("brand").as("c"),
        col("n_item").as("nc"))), Seq("c"))
      .crossJoin(broadcast(n))
      .select(col("a").as("brand_a"), col("b").as("brand_b"),
        col("c").as("brand_c"), col("n_abc"),
        round(col("n_abc").cast("double") / col("n_orders").cast("double"), 6)
          .as("support"),
        round(col("n_abc").cast("double") *
          col("n_orders").cast("double") * col("n_orders").cast("double") /
          (col("na").cast("double") * col("nb").cast("double") *
            col("nc").cast("double")), 4).as("lift3"))
      .orderBy(col("n_abc").desc, col("brand_a"), col("brand_b"),
        col("brand_c"))
      .limit(25)
  }

  /** q280 — BINARY-SEGMENTATION CHANGEPOINT (X190). The first split
    * of daily order revenue: t* = argmax over split days of the
    * between-segment SSE reduction, in its cross-multiplied form
    * gain(t) = (nR·SL − nL·SR)² / (nL·nR·n) — prefix sums SL/SR are
    * EXACT e4-scaled BIGINTs (decimal-exact daily totals ×10⁴), so
    * both engines feed identical integers to the one double
    * expression, ranked on its 6dp rounding with the day tiebreak
    * (round-9 convention). The offline complement to q229's online
    * CUSUM — "did the level shift, and when?".
    *
    * Scale: one fact pass to the calendar-bounded day table; prefix
    * windows + argmax on ≤|days| rows; TakeOrdered(1) tail.
    */
  def q280(s: SparkSession, d: String): DataFrame = {
    val daily = orders(s, d)
      .groupBy(expr(
        "unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
        .as("day"))
      .agg((round(sum(col("o_totalprice").cast("decimal(38,10)")), 4) *
        10000).cast("long").as("rev_e4"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val whole = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    daily
      .withColumn("nl", count(lit(1)).over(w))
      .withColumn("sl", sum(col("rev_e4")).over(w))
      .withColumn("n", count(lit(1)).over(whole))
      .withColumn("st", sum(col("rev_e4")).over(whole))
      .filter(col("nl") < col("n"))
      .withColumn("nr", col("n") - col("nl"))
      .withColumn("sr", col("st") - col("sl"))
      .withColumn("gain", round(
        (col("nr") * col("sl") - col("nl") * col("sr")).cast("double") *
          (col("nr") * col("sl") - col("nl") * col("sr")).cast("double") /
          (col("nl") * col("nr") * col("n")).cast("double") / lit(1e8), 6))
      .orderBy(col("gain").desc, col("day"))
      .limit(1)
      .select(col("day").as("split_day"), col("nl").as("n_left"),
        col("nr").as("n_right"), col("gain").as("gain_sq"),
        round(col("sl").cast("double") / col("nl").cast("double") / 1e4, 4)
          .as("mean_left"),
        round(col("sr").cast("double") / col("nr").cast("double") / 1e4, 4)
          .as("mean_right"))
  }

  /** q281 — GOOD-TURING MASS OVER TOKEN 5-GRAMS (X191). Frequency-
    * of-frequencies over the token 5-gram census: unseen-mass
    * estimate p₀ = N₁/N and the smoothed counts
    * r* = (r+1)·N_{r+1}/N_r for r = 1..5 (Good 1953) — the held-out
    * mass behind every Katz-backoff / n-gram-smoothing decision.
    * 5-grams are the right census here: the word VOCABULARY of the
    * corpus is 31 types, all frequent (no tail — measured), while
    * 5-gram contexts are combinatorially sparse, which is exactly
    * the regime Good-Turing exists for; complements q141 Zipf slope
    * and q200 hapax health. All N_r are exact integers; p₀ and r*
    * are single float divisions.
    *
    * Scale: in-row 5-gram generation (no self-join) → one census
    * shuffle → ≤max-count-row freq-of-freqs aggregate → 5 rows.
    */
  def q281(s: SparkSession, d: String): DataFrame = {
    // 5-grams ride as per-occurrence XXH64 hashes (NgramHashes kernel,
    // round 13): the interpreted transform-lambda that built each
    // ~30-byte gram string — and shuffled it as the census key — is
    // replaced by one kernel pass emitting 8-byte longs. The
    // frequency-of-frequencies table N_r is identical modulo 64-bit
    // collisions (~|grams|²/2⁶⁵, the q125/q37 disclaimer — far below
    // any N_r integer boundary on these corpora). Docs with < 5
    // tokens emit zero grams either way (kernel convention matches
    // the old size(toks) >= 5 filter).
    val counts = documents(s, d).filter(col("text").isNotNull)
      .select(explode(
        graft.functions.TextExpressions.ngram_hashes(col("text"), 5)).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("r"))
    // the freq-of-freqs table is ≤max-count rows — materialize it so
    // its four consumers (rows, shifted join, N₁ probe, totals) run
    // the 5-gram census ONCE, not once each; totals are derivable
    // from it exactly (N = Σ r·N_r, |vocab| = Σ N_r)
    val fof = counts.groupBy(col("r")).agg(count(lit(1)).as("nr"))
      .transform(Materialize.truncate)
    val tot = fof.agg(sum(col("r") * col("nr")).as("n_tokens"),
      sum(col("nr")).as("vocab"))
    val n1 = fof.filter(col("r") === 1).select(col("nr").as("nr1"))
    val nxt = fof.select((col("r") - 1).as("r"), col("nr").as("nr_next"))
    fof.filter(col("r").between(1, 5))
      .join(nxt, Seq("r"), "left")
      .crossJoin(broadcast(tot))
      .crossJoin(broadcast(n1))
      .select(col("r"), col("nr"),
        coalesce(col("nr_next"), lit(0L)).as("nr_next"),
        round((col("r") + 1).cast("double") *
          coalesce(col("nr_next"), lit(0L)).cast("double") /
          col("nr").cast("double"), 4).as("r_star"),
        col("n_tokens"), col("vocab"),
        round(col("nr1").cast("double") / col("n_tokens").cast("double"), 6)
          .as("p0_unseen"))
      .orderBy(col("r"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q279_brand_triples" -> (q279 _),
    "q280_binary_segmentation" -> (q280 _),
    "q281_good_turing" -> (q281 _))
}

/** DuckDB mirrors of Queries62 — triple self-join equivalence to the
  * in-row expansion, identical e4 prefix algebra, exact censuses.
  */
object Oracle62 {

  val sql: Map[String, String] = Map(
    "q279_brand_triples" ->
      """WITH b AS (
        |  SELECT DISTINCT l_orderkey, p_brand AS brand
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM b),
        |it AS (SELECT brand, count(*) AS n_item FROM b GROUP BY brand),
        |tr AS (SELECT b1.brand AS a, b2.brand AS bb, b3.brand AS c,
        |    count(*) AS n_abc
        |  FROM b b1
        |  JOIN b b2 ON b1.l_orderkey = b2.l_orderkey
        |    AND b1.brand < b2.brand
        |  JOIN b b3 ON b1.l_orderkey = b3.l_orderkey
        |    AND b2.brand < b3.brand
        |  GROUP BY 1, 2, 3 HAVING count(*) >= 5)
        |SELECT tr.a AS brand_a, tr.bb AS brand_b, tr.c AS brand_c,
        |  tr.n_abc,
        |  round(CAST(tr.n_abc AS DOUBLE) / CAST(n.n_orders AS DOUBLE), 6)
        |    AS support,
        |  round(CAST(tr.n_abc AS DOUBLE) *
        |    CAST(n.n_orders AS DOUBLE) * CAST(n.n_orders AS DOUBLE) /
        |    (CAST(ia.n_item AS DOUBLE) * CAST(ib.n_item AS DOUBLE) *
        |     CAST(ic.n_item AS DOUBLE)), 4) AS lift3
        |FROM tr
        |JOIN it ia ON ia.brand = tr.a
        |JOIN it ib ON ib.brand = tr.bb
        |JOIN it ic ON ic.brand = tr.c
        |CROSS JOIN n
        |ORDER BY tr.n_abc DESC, brand_a, brand_b, brand_c
        |LIMIT 25""".stripMargin,

    "q280_binary_segmentation" ->
      """WITH daily AS (
        |  SELECT (epoch_ns(o_orderdate) // 1000) // 86400000000 AS day,
        |    CAST(round(sum(CAST(o_totalprice AS DECIMAL(38,10))), 4) *
        |      10000 AS BIGINT) AS rev_e4
        |  FROM orders GROUP BY 1),
        |c AS (SELECT day,
        |    count(*) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nl,
        |    CAST(sum(rev_e4) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS sl,
        |    count(*) OVER () AS n,
        |    CAST(sum(rev_e4) OVER () AS BIGINT) AS st
        |  FROM daily),
        |g AS (SELECT day, nl, n - nl AS nr, sl, st - sl AS sr, n,
        |    round(CAST((n - nl) * sl - nl * (st - sl) AS DOUBLE) *
        |      CAST((n - nl) * sl - nl * (st - sl) AS DOUBLE) /
        |      CAST(nl * (n - nl) * n AS DOUBLE) / 1e8, 6) AS gain
        |  FROM c WHERE nl < n)
        |SELECT day AS split_day, nl AS n_left, nr AS n_right,
        |  gain AS gain_sq,
        |  round(CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE) / 1e4, 4)
        |    AS mean_left,
        |  round(CAST(sr AS DOUBLE) / CAST(nr AS DOUBLE) / 1e4, 4)
        |    AS mean_right
        |FROM g ORDER BY gain DESC, day LIMIT 1""".stripMargin,

    "q281_good_turing" ->
      """WITH tt AS (SELECT string_split(text, ' ') AS toks
        |    FROM documents WHERE len(string_split(text, ' ')) >= 5),
        |tk AS (SELECT unnest(list_transform(
        |    range(0, len(toks) - 4),
        |    i -> array_to_string(list_slice(toks, CAST(i AS INT) + 1,
        |      CAST(i AS INT) + 5), ' '))) AS tok
        |  FROM tt),
        |cnt AS (SELECT tok, count(*) AS r FROM tk GROUP BY tok),
        |fof AS (SELECT r, count(*) AS nr FROM cnt GROUP BY r),
        |tot AS (SELECT CAST(sum(r) AS BIGINT) AS n_tokens,
        |    count(*) AS vocab FROM cnt),
        |n1 AS (SELECT nr AS nr1 FROM fof WHERE r = 1)
        |SELECT f.r, f.nr,
        |  CAST(coalesce(nx.nr, 0) AS BIGINT) AS nr_next,
        |  round(CAST(f.r + 1 AS DOUBLE) * CAST(coalesce(nx.nr, 0) AS DOUBLE)
        |    / CAST(f.nr AS DOUBLE), 4) AS r_star,
        |  tot.n_tokens, tot.vocab,
        |  round(CAST(n1.nr1 AS DOUBLE) / CAST(tot.n_tokens AS DOUBLE), 6)
        |    AS p0_unseen
        |FROM fof f
        |LEFT JOIN fof nx ON nx.r = f.r + 1
        |CROSS JOIN tot CROSS JOIN n1
        |WHERE f.r BETWEEN 1 AND 5
        |ORDER BY f.r""".stripMargin)
}
