package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Round-8 batch 9: market-basket association rules, item-item
  * collaborative filtering, and a chi-square independence test
  * (SURVEY §2.8 X144-X146).
  */
object Queries45 {
  import Tables._

  /** Distinct (orderkey, brand) basket rows — lineitem joined to the
    * broadcast part dimension, deduped once and PERSISTED per
    * (session, sf dir): q234 reads this shape three times (N total,
    * item counts, pair expansion) and lazy lineage re-ran the join +
    * distinct per reference. Package-private: q279's triple mining
    * consumes the SAME frame (r9 verdict — it rebuilt a byte-identical
    * copy from the fact table, 2.3 s of redundant join+distinct).
    */
  private val basketCache = new SessionCache
  private[graft] def baskets(s: SparkSession, d: String): DataFrame =
    basketCache.getOrCompute(s, d) {
      val b = lineitem(s, d).select(col("l_orderkey"), col("l_partkey"))
        .join(broadcast(part(s, d).select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey"), col("p_brand").as("brand"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      b.count()
      b
    }

  /** Per-order sorted brand sets — the (orderkey, bs) frame BOTH
    * q234's pair expansion and q279's triple expansion explode.
    * Persisted once per (session, sf dir): the groupBy+collect_set
    * shuffle over the basket frame is the expansions' shared
    * dominant stage (r10 — q234 and q279 each re-ran it per action).
    */
  private val basketSetsCache = new SessionCache
  private[graft] def basketSets(s: SparkSession, d: String): DataFrame =
    basketSetsCache.getOrCompute(s, d) {
      val bs = baskets(s, d).groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("brand"))).as("bs"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      bs.count()
      bs
    }

  /** Distinct (customer, brand) matrix for q235 — same rationale:
    * read twice (item counts + pair expansion), persisted once.
    */
  private val cbCache = new SessionCache
  private def custBrands(s: SparkSession, d: String): DataFrame =
    cbCache.getOrCompute(s, d) {
      val cb = lineitem(s, d).select(col("l_orderkey"), col("l_partkey"))
        .join(broadcast(part(s, d).select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        // orders is a 2-long-column projection (~2 MB at sf0.1) — far
        // under the broadcast threshold, but the planner sees the full
        // table stats and picks SMJ (measured 2.96 s); the explicit
        // broadcast keeps the fact table to ONE shuffle (the distinct)
        .join(broadcast(orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"))),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey"), col("p_brand").as("brand"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      cb.count()
      cb
    }

  /** q234 — MARKET-BASKET ASSOCIATION RULES (X144). Directed rules
    * brand_a → brand_b over order baskets with relative support
    * ≥ 2%: support, confidence = n_ab/n_a, lift = N·n_ab/(n_a·n_b)
    * (Agrawal & Srikant, VLDB'94). All counts are exact integers;
    * the three ratios are single float divisions rounded 4dp.
    *
    * Scale: pair generation is ONE shuffle to per-order sorted brand
    * sets then in-row i<j expansion (the q222 edge shape) — fanout
    * is C(brands-per-order, 2), bounded by the 25-brand dimension,
    * never |orders|². Item counts and the 1-row N total are
    * broadcast back onto the ≤C(25,2) undirected pair rows.
    */
  def q234(s: SparkSession, d: String): DataFrame = {
    val b = baskets(s, d)
    // one basket-set row per order, so n_orders is a plain count of
    // the persisted sets — no countDistinct expand over the fact rows
    val nOrders = basketSets(s, d).agg(count(lit(1)).as("n_orders"))
    val itemCnt = b.groupBy(col("brand")).agg(count(lit(1)).as("n_item"))
    // pair expansion via the Combos kernel (one tight loop per basket
    // row) — the nested transform/slice HOF form interpreted a lambda
    // frame per step AND copied a sub-array per i (round 12; q279's
    // triple form measured the HOF class 2-7x worse on throttled
    // windows)
    val pairCnt = basketSets(s, d)
      .select(explode(
        graft.functions.TextExpressions.combos(col("bs"), 2)).as("p"))
      .groupBy(col("p.a"), col("p.b")).agg(count(lit(1)).as("n_ab"))
    // in-row flip: a union of pairCnt with its mirror re-runs the
    // whole expansion per reference (r10 — it was the query's
    // dominant residual); exploding a 2-struct array evaluates once
    val directed = pairCnt.select(explode(array(
        struct(col("a"), col("b"), col("n_ab")),
        struct(col("b").as("a"), col("a").as("b"), col("n_ab")))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"), col("p.n_ab").as("n_ab"))
    directed
      .join(broadcast(itemCnt.withColumnRenamed("brand", "a")
        .withColumnRenamed("n_item", "n_a")), Seq("a"))
      .join(broadcast(itemCnt.withColumnRenamed("brand", "b")
        .withColumnRenamed("n_item", "n_b")), Seq("b"))
      .crossJoin(broadcast(nOrders))
      .filter(col("n_ab").cast("double") >= lit(0.02) * col("n_orders"))
      .select(col("a").as("antecedent"), col("b").as("consequent"),
        col("n_ab"),
        round(col("n_ab").cast("double") / col("n_orders"), 4).as("support"),
        round(col("n_ab").cast("double") / col("n_a"), 4).as("confidence"),
        round(col("n_ab").cast("double") * col("n_orders") /
          (col("n_a") * col("n_b")), 4).as("lift"))
      .orderBy(col("lift").desc, col("antecedent"), col("consequent"))
  }

  /** q235 — ITEM-ITEM COLLABORATIVE FILTERING (X145). Top-3 nearest
    * brands per brand by binary cosine over the customer×brand
    * purchase matrix: sim(a,b) = |A∩B| / √(|A|·|B|) (Sarwar et al.,
    * WWW'01 item-based CF). Co-counts and item counts are exact
    * integers; the cosine is one float divide by one √ — bit-equal
    * cross-engine, so ranking on the raw double with a name
    * tiebreak is deterministic.
    *
    * Scale: per-customer brand sets expand in-row (≤C(25,2) pairs
    * per customer — bounded by the brand dimension, not the fact
    * table); the ranking window runs over ≤25·24 directed rows.
    */
  def q235(s: SparkSession, d: String): DataFrame = {
    val cb = custBrands(s, d)
    val itemCnt = cb.groupBy(col("brand")).agg(count(lit(1)).as("n_item"))
    // codegen'd self-join, NOT the in-row set expansion q234 uses:
    // customers hold ~20 of the 25 brands (orders hold ~3), so this
    // expansion is ~190 pairs × |customers| — at that fanout the
    // interpreted nested-transform lambdas measured 2.3 s while the
    // equi-join's generated loop stays inside whole-stage codegen
    // with map-side partial aggregation to ≤C(25,2) pair rows.
    // Re-measured round 12 with the Combos KERNEL (groupBy-custkey
    // collect_set + tight C(n,2) loop): 1.17 vs 0.86 s same-window —
    // the set-collect shuffle + per-pair struct allocation still
    // loses to the join's alloc-free generated loop at 190
    // pairs/row. The join stays.
    // Round 17: HarnessConf's AQE cached-plan coalescing sizes the
    // persisted basket frame by BYTES — right for its pure cache-read
    // consumers (q234 improved), wrong as the PARALLELISM source for
    // this query's ~190-pairs-per-customer expansion loop, whose CPU
    // work is ~20× its input bytes (the bench measured the expansion
    // serialized onto the coalesced blocks: steady-state min
    // 0.44 → 0.78 s). Re-key the stream side by custkey so the
    // generated expansion + map-side partial aggregation parallelize
    // at spark.sql.shuffle.partitions — the same knob that sizes
    // every other compute stage — independent of the cached layout;
    // one narrow-frame hash exchange, values unchanged. The count is
    // EXPLICIT because AQE coalesces a bare repartition(col) by its
    // input bytes — the very sizing that under-parallelizes a stage
    // whose work is 20× its bytes (measured: the bare form coalesced
    // back to the cached block count).
    val nPar = s.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val co = cb.repartition(nPar, col("o_custkey"))
      .join(cb.select(col("o_custkey"), col("brand").as("b")),
        Seq("o_custkey"))
      .filter(col("brand") < col("b"))
      .groupBy(col("brand").as("a"), col("b"))
      .agg(count(lit(1)).as("n_co"))
    // in-row flip, not union-with-mirror — the union re-ran the whole
    // per-customer expansion per reference (the q234 r10 fix)
    val directed = co.select(explode(array(
        struct(col("a"), col("b"), col("n_co")),
        struct(col("b").as("a"), col("a").as("b"), col("n_co")))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"), col("p.n_co").as("n_co"))
      .join(broadcast(itemCnt.withColumnRenamed("brand", "a")
        .withColumnRenamed("n_item", "n_a")), Seq("a"))
      .join(broadcast(itemCnt.withColumnRenamed("brand", "b")
        .withColumnRenamed("n_item", "n_b")), Seq("b"))
      .withColumn("cosine",
        col("n_co").cast("double") /
          sqrt((col("n_a") * col("n_b")).cast("double")))
    val w = Window.partitionBy(col("a"))
      .orderBy(col("cosine").desc, col("b"))
    directed.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("a").as("brand"), col("rk"), col("b").as("neighbor"),
        col("n_co"), round(col("cosine"), 4).as("cosine"))
      .orderBy(col("brand"), col("rk"))
  }

  /** q236 — CHI-SQUARE INDEPENDENCE TEST (X146). Pearson χ² of
    * event_type × day-of-week over the events table. Per cell the
    * statistic is computed from EXACT integers — (O·N − rt·ct)² /
    * (N·rt·ct) with the numerator in decimal(38,0) so sf0.1-scale
    * products can't overflow a long — rounded to 6dp decimal and
    * summed EXACTLY, so the total is order-independent. Day-of-week
    * is epoch-day mod 7 (identical integer arithmetic in both
    * engines — no locale-dependent dayofweek()).
    *
    * Scale: one pass over the fact table into a ≤|types|·7-cell
    * contingency aggregate; everything after is ONE single-row
    * higher-order-function pass over the collected cell array — the
    * relational form (three marginal broadcasts + two joins + two
    * groupBys + two crossJoins) scheduled 8 more stage-jobs to move
    * ≤35 rows between them (round-16 census: 12 → 4 jobs). Same exact
    * algebra: per-cell num = o·N − rt·ct in decimal(38,0) (operands
    * cast BEFORE the products — long o·n / rt·ct would wrap silently
    * past ~3e9 events where DuckDB raises, ADVICE r8), term =
    * round(num²_as_double / (N·rt·ct as doubles), 6) in decimal(18,6)
    * summed exactly in decimal(28,6) — order-independent, so the HOF
    * fold equals the relational sum() bit for bit. Null-dow cells (a
    * null ts) mirror the relational inner-join semantics: they count
    * toward N and the row totals but produce no term and no per-type
    * output row, and n_dows excludes null — cells with a non-null dow
    * everywhere on the test fixtures, where the two forms coincide.
    */
  def q236(s: SparkSession, d: String): DataFrame = {
    val cells = events(s, d)
      .filter(col("event_type").isNotNull)
      .groupBy(col("event_type"),
        expr("(unix_micros(ts) div 86400000000) % 7").as("dow"))
      .agg(count(lit(1)).as("o"))
    cells
      .agg(collect_list(struct(col("event_type"), col("dow"), col("o")))
        .as("cs"))
      .withColumn("n", expr("aggregate(cs, 0L, (a, x) -> a + x.o)"))
      .withColumn("dof", expr(
        """(cast(size(array_distinct(transform(cs, x -> x.event_type)))
          |    as bigint) - 1) *
          |(cast(size(filter(array_distinct(transform(cs, x -> x.dow)),
          |    d -> d is not null)) as bigint) - 1)""".stripMargin))
      // three staged transforms so each intermediate (rt, ct, num) is
      // written ONCE and the arithmetic replicates the relational form
      // exactly: num and num·num in decimal(38,0), THEN the double cast
      .withColumn("terms", expr(
        """transform(
          |  transform(
          |    transform(filter(cs, x -> x.dow is not null), x -> struct(
          |      x.event_type as event_type, x.o as o,
          |      aggregate(filter(cs, c -> c.event_type = x.event_type),
          |        0L, (a, c) -> a + c.o) as rt,
          |      aggregate(filter(cs, c -> c.dow = x.dow),
          |        0L, (a, c) -> a + c.o) as ct)),
          |    x -> struct(x.event_type as event_type, x.o as o,
          |      x.rt as rt, x.ct as ct,
          |      cast(x.o as decimal(38,0)) * cast(n as decimal(38,0)) -
          |        cast(x.rt as decimal(38,0)) * cast(x.ct as decimal(38,0))
          |        as num)),
          |  x -> struct(x.event_type as event_type, x.o as o,
          |    cast(round(cast(x.num * x.num as double) /
          |      (cast(n as double) * cast(x.rt as double) *
          |        cast(x.ct as double)), 6) as decimal(18,6)) as term))"""
          .stripMargin))
      .withColumn("chi2_total", expr(
        """round(cast(aggregate(terms, cast(0 as decimal(28,6)),
          |  (a, t) -> cast(a + t.term as decimal(28,6))) as double), 4)"""
          .stripMargin))
      .select(explode(expr(
        """transform(
          |  array_sort(array_distinct(transform(terms,
          |    t -> t.event_type))),
          |  et -> struct(
          |    et as event_type,
          |    aggregate(filter(terms, t -> t.event_type = et), 0L,
          |      (a, t) -> a + t.o) as n_events,
          |    round(cast(aggregate(filter(terms,
          |        t -> t.event_type = et), cast(0 as decimal(28,6)),
          |      (a, t) -> cast(a + t.term as decimal(28,6)))
          |      as double), 4) as chi2_part))""".stripMargin)).as("r"),
        col("chi2_total"), col("dof"))
      .select(col("r.event_type"), col("r.n_events"), col("r.chi2_part"),
        col("chi2_total"), col("dof"),
        // 36.415 = χ²₀.₀₅ critical value at dof 24 (5 types × 7 days);
        // any other shape reports 'check' rather than a wrong verdict
        when(col("dof") === 24 && col("chi2_total") > 36.415, "dependent")
          .when(col("dof") === 24, "independent")
          .otherwise("check").as("verdict"))
      .orderBy(col("event_type"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q234_assoc_rules" -> (q234 _),
    "q235_item_cf" -> (q235 _),
    "q236_chi2_independence" -> (q236 _))
}

/** DuckDB mirrors of Queries45 — identical integer counts, the same
  * single-float-division tails, epoch-day mod-7 dow.
  */
object Oracle45 {

  val sql: Map[String, String] = Map(
    "q234_assoc_rules" ->
      """WITH b AS (
        |  SELECT DISTINCT l_orderkey, p_brand AS brand
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM b),
        |ic AS (SELECT brand, count(*) AS n_item FROM b GROUP BY brand),
        |pc AS (SELECT x.brand AS a, y.brand AS b, count(*) AS n_ab
        |  FROM b x JOIN b y
        |    ON x.l_orderkey = y.l_orderkey AND x.brand < y.brand
        |  GROUP BY 1, 2),
        |dir AS (SELECT a, b, n_ab FROM pc
        |  UNION ALL SELECT b, a, n_ab FROM pc)
        |SELECT dir.a AS antecedent, dir.b AS consequent, n_ab,
        |  round(CAST(n_ab AS DOUBLE) / n_orders, 4) AS support,
        |  round(CAST(n_ab AS DOUBLE) / ia.n_item, 4) AS confidence,
        |  round(CAST(n_ab AS DOUBLE) * n_orders /
        |    (ia.n_item * ib.n_item), 4) AS lift
        |FROM dir
        |JOIN ic ia ON ia.brand = dir.a
        |JOIN ic ib ON ib.brand = dir.b
        |CROSS JOIN n
        |WHERE CAST(n_ab AS DOUBLE) >= 0.02 * n_orders
        |ORDER BY lift DESC, antecedent, consequent""".stripMargin,

    "q235_item_cf" ->
      """WITH cb AS (
        |  SELECT DISTINCT o_custkey, p_brand AS brand
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN orders ON l_orderkey = o_orderkey),
        |ic AS (SELECT brand, count(*) AS n_item FROM cb GROUP BY brand),
        |co AS (SELECT x.brand AS a, y.brand AS b, count(*) AS n_co
        |  FROM cb x JOIN cb y
        |    ON x.o_custkey = y.o_custkey AND x.brand < y.brand
        |  GROUP BY 1, 2),
        |dir AS (SELECT a, b, n_co FROM co
        |  UNION ALL SELECT b, a, n_co FROM co),
        |sim AS (SELECT dir.a, dir.b, n_co,
        |    CAST(n_co AS DOUBLE) /
        |      sqrt(CAST(ia.n_item * ib.n_item AS DOUBLE)) AS cosine
        |  FROM dir
        |  JOIN ic ia ON ia.brand = dir.a
        |  JOIN ic ib ON ib.brand = dir.b),
        |rk AS (SELECT *, row_number() OVER
        |    (PARTITION BY a ORDER BY cosine DESC, b) AS rk
        |  FROM sim)
        |SELECT a AS brand, rk, b AS neighbor, n_co,
        |  round(cosine, 4) AS cosine
        |FROM rk WHERE rk <= 3 ORDER BY brand, rk""".stripMargin,

    "q236_chi2_independence" ->
      """WITH cells AS (
        |  SELECT event_type,
        |    ((epoch_ns(ts) // 1000) // 86400000000) % 7 AS dow,
        |    count(*) AS o
        |  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
        |rt AS (SELECT event_type, sum(o) AS rt FROM cells GROUP BY 1),
        |ct AS (SELECT dow, sum(o) AS ct FROM cells GROUP BY 1),
        |n AS (SELECT sum(o) AS n, count(DISTINCT event_type) AS n_types,
        |    count(DISTINCT dow) AS n_dows
        |  FROM cells),
        |terms AS (SELECT cells.event_type, cells.o,
        |    CAST(round(
        |      CAST((CAST(cells.o AS DECIMAL(38,0)) * CAST(n.n AS DECIMAL(38,0))
        |            - CAST(rt.rt AS DECIMAL(38,0)) * CAST(ct.ct AS DECIMAL(38,0))) *
        |           (CAST(cells.o AS DECIMAL(38,0)) * CAST(n.n AS DECIMAL(38,0))
        |            - CAST(rt.rt AS DECIMAL(38,0)) * CAST(ct.ct AS DECIMAL(38,0)))
        |        AS DOUBLE) /
        |      (CAST(n.n AS DOUBLE) * CAST(rt.rt AS DOUBLE) *
        |       CAST(ct.ct AS DOUBLE)), 6) AS DECIMAL(18,6))
        |      AS term
        |  FROM cells
        |  JOIN rt USING (event_type)
        |  JOIN ct USING (dow)
        |  CROSS JOIN n),
        |pt AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS n_events,
        |    round(CAST(sum(term) AS DOUBLE), 4) AS chi2_part
        |  FROM terms GROUP BY 1),
        |tot AS (SELECT round(CAST(sum(term) AS DOUBLE), 4) AS chi2_total
        |  FROM terms),
        |dof AS (SELECT (n_types - 1) * (n_dows - 1) AS dof FROM n)
        |SELECT event_type, n_events, chi2_part, chi2_total, dof,
        |  CASE WHEN dof = 24 AND chi2_total > 36.415 THEN 'dependent'
        |       WHEN dof = 24 THEN 'independent'
        |       ELSE 'check' END AS verdict
        |FROM pt CROSS JOIN tot CROSS JOIN dof
        |ORDER BY event_type""".stripMargin)
}
