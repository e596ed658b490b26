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
    s"/root/repo/target/roundtrip/${fmt}_" +
      d.replaceAll("[^A-Za-z0-9]", "_") + "_p" +
      ProcessHandle.current().pid()

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

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q111_lag_autocorr" -> (q111 _),
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

  val sql: Map[String, String] = Map(
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
