package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Text

/** Round-5 batch 2: pipeline I/O formats, time-series diagnostics, and
  * the curation sampling/attribution ops beyond the q103-q109 set.
  *
  *  - q111 lag-1 autocorrelation of the per-minute signal mean — the
  *    time-series health diagnostic run before windowed feature
  *    extraction (is the signal trending or white?).
  *  - q114 importance-weighted sampling: per-doc keep probability
  *    proportional to token count (longer docs carry more training
  *    signal), decided by a deterministic content hash — the weighted
  *    twin of q52/q80.
  *  - q115 CSV source round-trip: dims written as header CSV and read
  *    back under an explicit StructType (schema-on-read discipline for
  *    the interchange format every upstream team still ships).
  *  - q116 JSON-lines source round-trip: same for the JSONL landing
  *    zone format, typed timestamps re-parsed on read.
  *  - q117 click attribution: self-interval-join of the event stream
  *    (view → click within 60 s, same user) — the sessionless
  *    attribution join; its streaming twin (stream-stream join with
  *    watermarks) is differential-proved in StreamingSpec.
  *
  * Every query is DuckDB-oracled (Oracle7) under the §7.4 conventions.
  */
object Queries7 {
  import Tables._

  /** q111 — LAG-1 AUTOCORRELATION of the per-minute mean value, per
    * event type. Two-level: (type, minute) mean via exact decimal
    * sums, then the Pearson correlation of (x_t, x_{t-1}) from
    * explicit moments — every cross-partition float sum goes through
    * DECIMAL(38,18) so the rounded digit cannot flip with partition
    * order.
    *
    * Scale: level 1 is a partial+final aggregate on (type, minute);
    * level 2 is a per-type window lag over the (small) minute series
    * plus one more aggregate. Nothing is per-event after level 1 —
    * at 100 TB the minute table is ~525k rows/type/year.
    */
  def q111(s: SparkSession, d: String): DataFrame = {
    val dec = DecimalType(38, 18)
    val perMin = events(s, d)
      .groupBy(col("event_type"),
        date_trunc("minute", col("ts")).as("minute"))
      .agg((sum(col("value").cast(dec)).cast("double") /
        count(lit(1))).as("x"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("minute"))
    val lagged = perMin
      .withColumn("y", lag(col("x"), 1).over(w))
      .filter(col("y").isNotNull)
    lagged.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("x").cast(dec)).cast("double").as("sx"),
        sum(col("y").cast(dec)).cast("double").as("sy"),
        sum((col("x") * col("y")).cast(dec)).cast("double").as("sxy"),
        sum((col("x") * col("x")).cast(dec)).cast("double").as("sxx"),
        sum((col("y") * col("y")).cast(dec)).cast("double").as("syy"))
      .select(col("event_type"), col("n_pairs"),
        round((col("n_pairs") * col("sxy") - col("sx") * col("sy")) /
          (sqrt(col("n_pairs") * col("sxx") - col("sx") * col("sx")) *
            sqrt(col("n_pairs") * col("syy") - col("sy") * col("sy"))),
          4).as("autocorr_lag1"))
      .orderBy(col("event_type"))
  }

  /** q114 — IMPORTANCE-WEIGHTED SAMPLING. Keep probability grows with
    * token count (p = min(1, tok/64)); the keep decision is EXACT
    * integer arithmetic on a content hash — `md5 % 10000 <
    * (tok*10000) div 64` — so both engines agree on every boundary
    * doc. Reports per-language doc and token mass before/after: the
    * audit that shows what the weighting did to the mixture.
    *
    * Scale: pure per-row math + one partial+final aggregate on lang.
    * No joins, no windows, no driver state.
    */
  def q114(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d).select(col("lang"),
      size(split(col("text"), " ")).cast("long").as("tok"),
      pmod(Text.md5Long(col("text")), lit(10000L)).as("hm"))
    docs
      .withColumn("keep",
        col("hm") < least(lit(10000L), expr("(tok * 10000) div 64")))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(col("tok")).as("tok_total"),
        sum(when(col("keep"), col("tok")).otherwise(0L)).as("tok_kept"))
      .orderBy(col("lang"))
  }

  /** pid-scoped round-trip scratch dir: writer and reader are the same
    * JVM, so no publish/rename handshake is needed (unlike
    * Tables.events); concurrent suites land on different pids.
    */
  private def rtDir(fmt: String, d: String): String =
    Tables.scratchDir(fmt, d)

  /** q115 — CSV SOURCE. Dims exported as header CSV, read back under
    * an explicit StructType (no inference — schema-on-read is
    * declared, as S1's parquet contract), then the nation-per-region
    * rollup on the round-tripped rows. Oracle runs on the original
    * parquet, so the hash match proves the CSV path is lossless for
    * the int/string payload.
    *
    * Scale: CSV is the interchange format of last resort — splittable
    * when uncompressed, schema-fragile; this query pins the read
    * discipline (explicit schema, FAILFAST) rather than recommending
    * the format.
    */
  def q115(s: SparkSession, d: String): DataFrame = {
    val dir = rtDir("csv", d)
    nation(s, d).write.mode("overwrite").option("header", "true")
      .csv(s"$dir/nation")
    region(s, d).write.mode("overwrite").option("header", "true")
      .csv(s"$dir/region")
    val nSchema = StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType)))
    val rSchema = StructType(Seq(
      StructField("r_regionkey", IntegerType),
      StructField("r_name", StringType)))
    val n = s.read.schema(nSchema).option("header", "true")
      .option("mode", "FAILFAST").csv(s"$dir/nation")
    val r = s.read.schema(rSchema).option("header", "true")
      .option("mode", "FAILFAST").csv(s"$dir/region")
    n.join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_nations"),
        min(col("n_name")).as("first_nation"),
        max(col("n_name")).as("last_nation"))
      .orderBy(col("r_name"))
  }

  /** q116 — JSON-LINES SOURCE. Orders exported as JSONL (dates as ISO
    * strings — the portable wire form), read back under an explicit
    * schema, then the per-status order rollup. Doubles survive the
    * text round-trip because Spark writes shortest-round-trip decimal
    * forms; the money sum still goes through DECIMAL per §7.4.
    *
    * Scale: JSONL is the landing-zone format; the declared schema +
    * FAILFAST read is what keeps a 100 TB backfill from silently
    * null-ing a renamed field.
    */
  def q116(s: SparkSession, d: String): DataFrame = {
    val dir = rtDir("jsonl", d)
    orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"))
      .write.mode("overwrite").json(dir)
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType),
      StructField("o_date", StringType)))
    val o = s.read.schema(schema).option("mode", "FAILFAST").json(dir)
    val dec = DecimalType(38, 6)
    o.groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice").cast(dec)), 4)
          .cast("double").as("total_price"),
        min(col("o_date")).as("first_date"),
        max(col("o_date")).as("last_date"))
      .orderBy(col("o_orderstatus"))
  }

  /** q117 — CLICK ATTRIBUTION. Every (view → click) pair of the same
    * user within 1 h: the sessionless attribution join. Per-user
    * report of attributed pairs and mean view→click delay. (The test
    * events table is sparse — ~1 event/user/half-hour — so the window
    * is an hour; production would use minutes, same plan.)
    *
    * Scale: an equi-join on user_id with a range residual — shuffles
    * both sides on the key once, never a cartesian (PlanSpec asserts
    * the join keys). The streaming twin joins two watermarked streams
    * with the same time-range condition and is proved equal to this
    * batch form in StreamingSpec — the state-bounded shape Structured
    * Streaming runs continuously.
    */
  def q117(s: SparkSession, d: String): DataFrame = {
    val dec = DecimalType(38, 18)
    val e = events(s, d)
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("vts"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("cts"))
    views.join(clicks,
        col("user_id") === col("c_user") &&
          col("vts") < col("cts") &&
          col("cts") <= col("vts") + expr("INTERVAL 1 HOUR"))
      .select(col("user_id"),
        (col("cts").cast("double") - col("vts").cast("double"))
          .as("delay_s"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_attributed"),
        round(sum(col("delay_s").cast(dec)).cast("double") /
          count(lit(1)), 4).as("avg_delay_s"))
      .orderBy(col("user_id"))
  }

  /** q110 — BLOOM-PREFILTERED DECONTAMINATION. q79's benchmark screen
    * re-planned for the regime where even the DISTINCT benchmark
    * shingle set is too big to broadcast exactly: build a fixed-size
    * Bloom bitset (16 Kbit, 3 probes) over benchmark 7-gram hashes
    * with one aggregate, broadcast the single-row bitset, prefilter
    * the train side per-row, and run the exact verify join only on
    * might-contain survivors. Bloom filters have NO false negatives,
    * and the verify join removes the false positives — so the result
    * is bit-identical to the exact inner join, which is what the
    * oracle computes (the approximation is invisible in the answer,
    * only in the shuffle volume).
    *
    * Scale: the bitset is O(1) regardless of corpus size (tune m/k to
    * the benchmark cardinality; 100 TB would use ~1 Gbit, still one
    * broadcast). The verify join is deliberately NOT broadcast-hinted:
    * at scale it shuffles only the ~FP-rate fraction of train
    * postings. All bit math is built-in codegen'd expressions.
    */
  def q110(s: SparkSession, d: String): DataFrame = {
    val mBits = 1L << 14
    val probes = 3
    // within-doc dedup happens IN-ROW (array_distinct before the
    // explode): doc_id is part of the key, so this is exactly the
    // global DISTINCT (doc_id, b, h) — without shuffling the exploded
    // 7-gram table, twice, to discover it
    val h = documents(s, d)
      .select(col("doc_id"),
        pmod(Text.md5Long(col("text")), lit(100L)).as("b"),
        explode(array_distinct(graft.functions.TextExpressions
          .md5_shingle_hashes(col("text"), 7))).as("h"))
    val bench = h.filter(col("b") >= 90).select(col("h").as("bh")).distinct()
    def probeBit(c: org.apache.spark.sql.Column, j: Int) =
      pmod(xxhash64(c, lit(j)), lit(mBits))
    val bloomRow = bench
      .select(explode(array((0 until probes).map(j =>
        probeBit(col("bh"), j)): _*)).as("bit"))
      .select(expr("CAST(bit DIV 64 AS INT)").as("w"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(bit % 64 AS INT))")
          .as("mask"))
      .groupBy(col("w")).agg(expr("bit_or(mask)").as("bits"))
      .agg(map_from_entries(collect_list(struct(col("w"), col("bits"))))
        .as("bloom"))
    val train = (0 until probes).foldLeft(
      h.filter(col("b") < 90).select(col("doc_id"), col("h"))
        .crossJoin(broadcast(bloomRow))) { (df, j) =>
      df.withColumn(s"bit$j", probeBit(col("h"), j))
    }
    val mightContain = (0 until probes).map(j =>
      expr(s"(coalesce(try_element_at(bloom, CAST(bit$j DIV 64 AS INT)), " +
        s"CAST(0 AS BIGINT)) & " +
        s"shiftleft(CAST(1 AS BIGINT), CAST(bit$j % 64 AS INT))) != 0"))
      .reduce(_ && _)
    train.filter(mightContain)
      .select(col("doc_id"), col("h"))
      .join(bench, col("h") === col("bh"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
      .orderBy(col("doc_id"))
  }

  /** q112 — TRIANGLE COUNT on the near-dup candidate graph. Per-doc
    * count of triangles (mutual near-dup triples) — the graph-quality
    * audit that distinguishes tight dup clusters (triangle-dense) from
    * chains of borderline pairs (triangle-free) before trusting
    * cluster representatives.
    *
    * Scale: edges are oriented a<b, so each triangle is enumerated
    * exactly once as (a<b<c) — two equi-joins of the edge list with
    * itself, never a cartesian. The candidate edge set is orders of
    * magnitude smaller than the corpus (it's the LSH output, shared
    * via LshStages), and the joins shuffle on edge endpoints.
    */
  def q112(s: SparkSession, d: String): DataFrame = {
    val e = LshStages.candidatePairs(s, d)
    val e1 = e.select(col("a_id").as("a"), col("b_id").as("b"))
    val e2 = e.select(col("a_id").as("b"), col("b_id").as("c"))
    val e3 = e.select(col("a_id").as("a3"), col("b_id").as("c3"))
    e1.join(e2, Seq("b"))
      .join(e3, col("a") === col("a3") && col("c") === col("c3"))
      .select(explode(array(col("a"), col("b"), col("c"))).as("doc_id"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_triangles"))
      .orderBy(col("doc_id"))
  }

  /** q113 — MINHASH ESTIMATOR CALIBRATION. For every LSH candidate
    * pair: the minhash-estimated Jaccard (fraction of the 8 families
    * agreeing) against the EXACT trigram Jaccard, plus the absolute
    * error — the calibration report that justifies the banding
    * thresholds the dedup family runs with.
    *
    * Scale: signatures and candidate pairs are the already-materialized
    * LSH stages; the exact-Jaccard arm joins distinct (doc, shingle
    * hash) postings to the (small) pair list on doc ids — at 100 TB
    * this is the standard "verify candidates only" shape, never
    * all-pairs.
    */
  def q113(s: SparkSession, d: String): DataFrame = {
    val pairs = LshStages.candidatePairs(s, d)
    val sig = operators.Dedup.minhashSignature(
      documents(s, d), col("text"), col("doc_id"),
      LshStages.ShingleN, LshStages.Bands * LshStages.RowsPerBand)
    val k = LshStages.Bands * LshStages.RowsPerBand
    val sa = sig.select(col("doc_id").as("a_id") +:
      (0 until k).map(i => col(s"s$i").as(s"a$i")): _*)
    val sb = sig.select(col("doc_id").as("b_id") +:
      (0 until k).map(i => col(s"s$i").as(s"b$i")): _*)
    val est = pairs.join(sa, Seq("a_id")).join(sb, Seq("b_id"))
      .select(col("a_id"), col("b_id"),
        ((0 until k).map(i =>
          when(col(s"a$i") === col(s"b$i"), 1).otherwise(0))
          .reduce(_ + _).cast("double") / lit(k.toDouble)).as("est"))
    val hd = documents(s, d)
      .select(col("doc_id"), explode(graft.functions.TextExpressions
        .md5_shingle_hashes(col("text"), LshStages.ShingleN)).as("h"))
      .distinct()
    val sz = hd.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = pairs
      .join(hd.select(col("doc_id").as("a_id"), col("h")), Seq("a_id"))
      .join(hd.select(col("doc_id").as("b_id"), col("h")),
        Seq("b_id", "h"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("i"))
    est.join(inter, Seq("a_id", "b_id"), "left")
      .join(sz.select(col("doc_id").as("a_id"), col("n").as("na")),
        Seq("a_id"))
      .join(sz.select(col("doc_id").as("b_id"), col("n").as("nb")),
        Seq("b_id"))
      .select(col("a_id"), col("b_id"),
        round(col("est"), 4).as("est_jaccard"),
        round(coalesce(col("i"), lit(0L)).cast("double") /
          (col("na") + col("nb") - coalesce(col("i"), lit(0L))), 4)
          .as("exact_jaccard"),
        round(abs(col("est") -
          coalesce(col("i"), lit(0L)).cast("double") /
            (col("na") + col("nb") - coalesce(col("i"), lit(0L)))), 4)
          .as("abs_err"))
      .orderBy(col("a_id"), col("b_id"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q110_bloom_contamination" -> (q110 _),
    "q111_lag_autocorr" -> (q111 _),
    "q112_graph_triangles" -> (q112 _),
    "q113_minhash_calibration" -> (q113 _),
    "q114_importance_sample" -> (q114 _),
    "q115_csv_roundtrip" -> (q115 _),
    "q116_jsonl_roundtrip" -> (q116 _),
    "q117_click_attribution" -> (q117 _))
}

/** DuckDB mirrors of Queries7 — same formulas, same decimal paths,
  * same rounding (§7.4).
  */
object Oracle7 {

  private def md5long(e: String): String =
    s"CAST('0x' || substring(md5($e), 1, 15) AS BIGINT)"

  /** DuckDB mirror of Text.shingles(text, 7) (clamped-slice form,
    * same as Oracle3's).
    */
  private val shingles7 =
    "list_transform(range(1, greatest(len(toks)-6, 1) + 1), " +
      "i -> array_to_string(toks[i:i+6], ' '))"

  val sql: Map[String, String] = Map(
    // The Bloom prefilter is answer-invisible (no false negatives;
    // the verify join removes false positives), so the oracle is the
    // EXACT inner contamination join — a hash match proves the
    // approximate path lost nothing.
    "q110_bloom_contamination" ->
      s"""WITH s AS (SELECT doc_id, ${md5long("text")} % 100 AS b,
         |             string_split(text, ' ') AS toks FROM documents),
         |g AS (SELECT doc_id, b, unnest($shingles7) AS sh FROM s),
         |h AS (SELECT DISTINCT doc_id, b, ${md5long("sh")} AS h FROM g),
         |bench AS (SELECT DISTINCT h FROM h WHERE b >= 90),
         |tr AS (SELECT doc_id, h FROM h WHERE b < 90)
         |SELECT t.doc_id, count(*) AS n_shared
         |FROM tr t JOIN bench USING (h)
         |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,

    "q112_graph_triangles" ->
      s"""WITH ${OracleExt.lshPairCtes},
         |tri AS (SELECT e1.a_id AS a, e1.b_id AS b, e2.b_id AS c
         |  FROM pairs e1 JOIN pairs e2 ON e1.b_id = e2.a_id
         |  JOIN pairs e3 ON e3.a_id = e1.a_id AND e3.b_id = e2.b_id),
         |n AS (SELECT unnest([a, b, c]) AS doc_id FROM tri)
         |SELECT doc_id, count(*) AS n_triangles
         |FROM n GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q113_minhash_calibration" -> {
      val estSum = (0 until 8).map(i =>
        s"CAST(sa.s$i = sb.s$i AS INT)").mkString(" + ")
      s"""WITH ${OracleExt.lshPairCtes},
         |hd AS (SELECT DISTINCT doc_id, unnest(hl) AS h FROM hs),
         |sz AS (SELECT doc_id, count(*) AS n FROM hd GROUP BY doc_id),
         |inter AS (SELECT p.a_id, p.b_id, count(*) AS i
         |  FROM pairs p
         |  JOIN hd a ON a.doc_id = p.a_id
         |  JOIN hd b ON b.doc_id = p.b_id AND b.h = a.h
         |  GROUP BY p.a_id, p.b_id),
         |est AS (SELECT p.a_id, p.b_id,
         |    CAST($estSum AS DOUBLE) / 8.0 AS est
         |  FROM pairs p
         |  JOIN sig sa ON sa.doc_id = p.a_id
         |  JOIN sig sb ON sb.doc_id = p.b_id)
         |SELECT e.a_id, e.b_id, round(e.est, 4) AS est_jaccard,
         |  round(CAST(COALESCE(i.i, 0) AS DOUBLE)
         |    / (za.n + zb.n - COALESCE(i.i, 0)), 4) AS exact_jaccard,
         |  round(abs(e.est - CAST(COALESCE(i.i, 0) AS DOUBLE)
         |    / (za.n + zb.n - COALESCE(i.i, 0))), 4) AS abs_err
         |FROM est e
         |LEFT JOIN inter i ON i.a_id = e.a_id AND i.b_id = e.b_id
         |JOIN sz za ON za.doc_id = e.a_id
         |JOIN sz zb ON zb.doc_id = e.b_id
         |ORDER BY e.a_id, e.b_id""".stripMargin
    },

    "q111_lag_autocorr" ->
      """WITH m AS (SELECT event_type, date_trunc('minute', ts) AS minute,
        |    CAST(SUM(CAST(value AS DECIMAL(38,18))) AS DOUBLE) / count(*)
        |      AS x
        |  FROM events GROUP BY 1, 2),
        |l AS (SELECT event_type, x,
        |    lag(x, 1) OVER (PARTITION BY event_type ORDER BY minute) AS y
        |  FROM m),
        |p AS (SELECT event_type, x, y FROM l WHERE y IS NOT NULL),
        |mo AS (SELECT event_type, count(*) AS n_pairs,
        |    CAST(SUM(CAST(x AS DECIMAL(38,18))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(y AS DECIMAL(38,18))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(x * y AS DECIMAL(38,18))) AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(x * x AS DECIMAL(38,18))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(y * y AS DECIMAL(38,18))) AS DOUBLE) AS syy
        |  FROM p GROUP BY event_type)
        |SELECT event_type, n_pairs,
        |  round((n_pairs * sxy - sx * sy) /
        |    (sqrt(n_pairs * sxx - sx * sx) * sqrt(n_pairs * syy - sy * sy)),
        |    4) AS autocorr_lag1
        |FROM mo ORDER BY event_type""".stripMargin,

    "q114_importance_sample" ->
      s"""WITH t AS (SELECT lang,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tok,
         |    ${md5long("text")} % 10000 AS hm
         |  FROM documents),
         |k AS (SELECT lang, tok,
         |    hm < least(10000, (tok * 10000) // 64) AS keep
         |  FROM t)
         |SELECT lang, count(*) AS n_docs,
         |  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST(SUM(tok) AS BIGINT) AS tok_total,
         |  CAST(SUM(CASE WHEN keep THEN tok ELSE 0 END) AS BIGINT)
         |    AS tok_kept
         |FROM k GROUP BY lang ORDER BY lang""".stripMargin,

    "q115_csv_roundtrip" ->
      """SELECT r_name, count(*) AS n_nations,
        |  min(n_name) AS first_nation, max(n_name) AS last_nation
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "q116_jsonl_roundtrip" ->
      """WITH t AS (SELECT o_orderstatus, o_totalprice,
        |    strftime(o_orderdate, '%Y-%m-%d') AS o_date
        |  FROM orders)
        |SELECT o_orderstatus, count(*) AS n_orders,
        |  CAST(round(SUM(CAST(o_totalprice AS DECIMAL(38,6))), 4)
        |    AS DOUBLE) AS total_price,
        |  min(o_date) AS first_date, max(o_date) AS last_date
        |FROM t GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q117_click_attribution" ->
      """WITH v AS (SELECT user_id, ts AS vts FROM events
        |    WHERE event_type = 'view'),
        |c AS (SELECT user_id, ts AS cts FROM events
        |    WHERE event_type = 'click'),
        |p AS (SELECT v.user_id, epoch(cts) - epoch(vts) AS delay_s
        |  FROM v JOIN c ON v.user_id = c.user_id
        |    AND vts < cts AND cts <= vts + INTERVAL 1 HOUR)
        |SELECT user_id, count(*) AS n_attributed,
        |  round(CAST(SUM(CAST(delay_s AS DECIMAL(38,18))) AS DOUBLE)
        |    / count(*), 4) AS avg_delay_s
        |FROM p GROUP BY user_id ORDER BY user_id""".stripMargin)
}
