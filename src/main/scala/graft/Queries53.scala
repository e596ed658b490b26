package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 batch 17: fixed-width mainframe-style ingestion and group
  * sequential experiment monitoring (SURVEY §2.8 X166-X167).
  */
object Queries53 {
  import Tables._

  /** q256 — FIXED-WIDTH FILE SOURCE ROUND-TRIP (X166). Orders
    * serialized to 48-char fixed-width records (zero-padded key /
    * custkey / integer cents, 1-char priority code, yyyyMMdd date) via
    * spark.write.text, re-ingested with spark.read.text + substring
    * parsing under a declared layout — the mainframe/EBCDIC-era
    * ingestion shape every enterprise lake still needs, completing
    * the source family (S1 parquet, X25 CSV, X26 JSONL, X60 ORC).
    * The oracle computes the same rollup from the ORIGINAL parquet,
    * so the hash match proves format→parse is lossless: every field
    * is integer or single-char, no float ever touches the file.
    *
    * Scale: one text write + one text scan; substring parsing is
    * whole-stage-codegen string slicing, and the layout is columnar
    * offsets — exactly how COBOL copybook readers batch-parse.
    */
  def q256(s: SparkSession, d: String): DataFrame = {
    val dir = Tables.scratchDir("fw", d)
    orders(s, d).select(concat(
        lpad(col("o_orderkey").cast("string"), 12, "0"),
        lpad(col("o_custkey").cast("string"), 12, "0"),
        lpad(round(col("o_totalprice") * 100).cast("long").cast("string"),
          15, "0"),
        substring(col("o_orderpriority"), 1, 1),
        date_format(col("o_orderdate").cast("timestamp"), "yyyyMMdd"))
        .as("value"))
      .write.mode("overwrite").text(s"$dir/orders_fw")
    val parsed = s.read.text(s"$dir/orders_fw").select(
      substring(col("value"), 1, 12).cast("long").as("orderkey"),
      substring(col("value"), 13, 12).cast("long").as("custkey"),
      substring(col("value"), 25, 15).cast("long").as("cents"),
      substring(col("value"), 40, 1).as("pcode"),
      substring(col("value"), 41, 8).cast("int").as("date_int"))
    parsed.groupBy(col("pcode"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("cents").cast("decimal(38,0)")).cast("long")
          .as("total_cents"),
        countDistinct(col("custkey")).as("n_customers"),
        min(col("date_int")).as("min_date"),
        max(col("date_int")).as("max_date"))
      .orderBy(col("pcode"))
  }

  /** q257 — GROUP SEQUENTIAL EXPERIMENT MONITOR (X167). Four interim
    * looks at a running A/B test (arms = user-id parity) with
    * O'Brien-Fleming two-sided 5% boundaries (4.049 / 2.863 / 2.337 /
    * 2.024 — the spending schedule that makes early peeking honest;
    * Pocock 1977, O'Brien & Fleming 1979): at look k the z statistic
    * of the mean-value difference over all events through week k is
    * compared to boundary b_k. The sequential complement to q183's
    * fixed-horizon readout — the op that answers "can we stop the
    * experiment early?". All moments are EXACT decimal sums; z is
    * one float expression per look.
    *
    * Scale: one events pass into per-(arm, week) moments; the looks
    * grid is 4 broadcast rows joined to ≤5 week rows per arm.
    */
  def q257(s: SparkSession, d: String): DataFrame = {
    val dayCol = expr("unix_micros(ts) div 86400000000")
    val minDay = events(s, d).agg(min(dayCol).as("d0"))
    val byWeek = events(s, d)
      .filter(col("event_type").isNotNull)
      .crossJoin(broadcast(minDay))
      .groupBy(pmod(col("user_id"), lit(2L)).as("arm"),
        expr("(unix_micros(ts) div 86400000000 - d0) div 7").as("week"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(38,10)")).as("sx"),
        sum((col("value") * col("value")).cast("decimal(38,10)"))
          .as("sxx"))
    val looks = broadcast(s.range(0, 4).toDF("look"))
    val cumByArm = byWeek.join(looks, col("week") <= col("look"))
      .groupBy(col("look"), col("arm"))
      .agg(sum(col("n")).as("n"),
        sum(col("sx")).cast("double").as("sx"),
        sum(col("sxx")).cast("double").as("sxx"))
      .withColumn("mean", col("sx") / col("n"))
      .withColumn("v", col("sxx") / col("n") - col("mean") * col("mean"))
    val t = cumByArm.filter(col("arm") === 1)
      .select(col("look"), col("n").as("n_t"), col("mean").as("m_t"),
        col("v").as("v_t"))
    val c = cumByArm.filter(col("arm") === 0)
      .select(col("look"), col("n").as("n_c"), col("mean").as("m_c"),
        col("v").as("v_c"))
    t.join(c, Seq("look"))
      .withColumn("z", round((col("m_t") - col("m_c")) /
        sqrt(col("v_t") / col("n_t") + col("v_c") / col("n_c")), 4))
      .withColumn("boundary",
        when(col("look") === 0, 4.049).when(col("look") === 1, 2.863)
          .when(col("look") === 2, 2.337).otherwise(2.024))
      .select(col("look"), col("n_t"), col("n_c"), col("z"),
        col("boundary"),
        (abs(col("z")) > col("boundary")).as("crossed"))
      .orderBy(col("look"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q256_fixed_width_roundtrip" -> (q256 _),
    "q257_sequential_monitor" -> (q257 _))
}

/** DuckDB mirrors of Queries53 — q256 recomputes the rollup from the
  * ORIGINAL parquet (the round-trip identity proof), q257 shares the
  * exact decimal moment algebra.
  */
object Oracle53 {

  val sql: Map[String, String] = Map(
    "q256_fixed_width_roundtrip" ->
      """WITH src AS (
        |  SELECT o_orderkey, o_custkey,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |    substring(o_orderpriority, 1, 1) AS pcode,
        |    CAST(strftime(o_orderdate, '%Y%m%d') AS INT) AS date_int
        |  FROM orders)
        |SELECT pcode, count(*) AS n_orders,
        |  CAST(sum(CAST(cents AS DECIMAL(38,0))) AS BIGINT) AS total_cents,
        |  count(DISTINCT o_custkey) AS n_customers,
        |  min(date_int) AS min_date, max(date_int) AS max_date
        |FROM src GROUP BY pcode ORDER BY pcode""".stripMargin,

    "q257_sequential_monitor" ->
      """WITH d0 AS (
        |  SELECT min((epoch_ns(ts) // 1000) // 86400000000) AS d0
        |  FROM events),
        |byweek AS (SELECT user_id % 2 AS arm,
        |    (((epoch_ns(ts) // 1000) // 86400000000) -
        |      (SELECT d0 FROM d0)) // 7 AS week,
        |    count(*) AS n,
        |    sum(CAST("value" AS DECIMAL(38,10))) AS sx,
        |    sum(CAST("value" * "value" AS DECIMAL(38,10))) AS sxx
        |  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
        |looks AS (SELECT unnest(range(0, 4)) AS look),
        |cum AS (SELECT l.look, w.arm,
        |    CAST(sum(w.n) AS BIGINT) AS n,
        |    CAST(sum(w.sx) AS DOUBLE) AS sx,
        |    CAST(sum(w.sxx) AS DOUBLE) AS sxx
        |  FROM byweek w JOIN looks l ON w.week <= l.look
        |  GROUP BY l.look, w.arm),
        |mv AS (SELECT look, arm, n, sx / n AS mean,
        |    sxx / n - (sx / n) * (sx / n) AS v
        |  FROM cum),
        |t AS (SELECT look, n AS n_t, mean AS m_t, v AS v_t FROM mv
        |  WHERE arm = 1),
        |c AS (SELECT look, n AS n_c, mean AS m_c, v AS v_c FROM mv
        |  WHERE arm = 0)
        |SELECT t.look, t.n_t, c.n_c,
        |  round((t.m_t - c.m_c) /
        |    sqrt(t.v_t / t.n_t + c.v_c / c.n_c), 4) AS z,
        |  CAST(CASE t.look WHEN 0 THEN 4.049 WHEN 1 THEN 2.863
        |    WHEN 2 THEN 2.337 ELSE 2.024 END AS DOUBLE) AS boundary,
        |  abs(round((t.m_t - c.m_c) /
        |    sqrt(t.v_t / t.n_t + c.v_c / c.n_c), 4)) >
        |    CASE t.look WHEN 0 THEN 4.049 WHEN 1 THEN 2.863
        |      WHEN 2 THEN 2.337 ELSE 2.024 END AS crossed
        |FROM t JOIN c USING (look) ORDER BY t.look""".stripMargin)
}
