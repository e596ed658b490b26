package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-7 batch 3: sketch ALGEBRA and the tokenizer-training census.
  *
  *  - q163 returning-audience curve via HLL register algebra: q145
  *    proved the HLL estimate; q163 proves the reason sketches beat
  *    exact distinct at 100 TB — MERGEABILITY. Per-day register files
  *    (256 ints each) are computed in ONE pass over the events, and
  *    every day-over-day union/intersection after that is arithmetic
  *    on the 30-row state table: union = elementwise max (`zip_with
  *    greatest` — bit-identical to the aggregate's own merge),
  *    intersection = inclusion-exclusion. The exact twins ride along
  *    for calibration, so the whole algebra is hash-verified.
  *  - q164 BPE merge census: the first step of byte-pair-encoding
  *    tokenizer training — the global adjacent-token-pair frequency
  *    table and its top merge candidates.
  */
object Queries19 {
  import Tables._

  /** HLL precision for q163 (shared with the Oracle19 SQL rebuild). */
  val HllP = 8

  /** The HLL estimator over a register-file column, in the SAME
    * left-to-right IEEE order as SketchAggregates.HllEstimate.eval and
    * the Oracle13/Oracle19 SQL: raw = 0.7213/(1+1.079/m)·m·m·2^s / S
    * with the integer S = Σ 2^(scale−M_j) (exact in a long), linear
    * counting below 2.5m with empty registers.
    */
  private[graft] def hllEstFromRegs(regsCol: String, p: Int): Column = {
    val m = 1 << p
    val scale = 60 - p + 1
    val s = expr(s"aggregate($regsCol, CAST(0 AS BIGINT), " +
      s"(acc, x) -> acc + shiftleft(CAST(1 AS BIGINT), $scale - x))")
    val zeros = expr(s"size(filter($regsCol, x -> x = 0))")
    val md = lit(m.toDouble)
    val raw = lit(0.7213) / (lit(1.0) + lit(1.079) / md) * md * md *
      lit(math.pow(2.0, scale)) / s.cast("double")
    when(raw <= lit(2.5) * md && zeros > lit(0),
      md * log(md / zeros.cast("double"))).otherwise(raw)
  }

  /** q163 — RETURNING-AUDIENCE CURVE via HLL register algebra. For
    * each consecutive day pair (d, d+1): union and intersection of
    * the two daily user audiences, estimated purely from the per-day
    * register files, next to the exact values.
    *
    * Scale: the ONLY pass over the events computes |days| register
    * files (256 B each) through a normal partial+final aggregate;
    * every set operation after that is arithmetic on the tiny state
    * table — no rescan, no pair-keyed row amplification. That is the
    * sketch-algebra contract: at 100 TB the per-day (or per-source,
    * per-shard) state is kilobytes, and ANY union over day ranges or
    * source combinations is a fold of elementwise max. The exact
    * columns (the expensive path the sketch replaces) are computed
    * once here as the calibration twin.
    */
  def q163(s: SparkSession, d: String): DataFrame = {
    val au = events(s, d).filter(col("user_id").isNotNull)
      .select(to_date(col("ts")).as("day"),
        col("user_id").cast("string").as("uid"))
      .distinct()
    val perDay = au.groupBy(col("day"))
      .agg(graft.functions.SketchAggregates.hll_registers(col("uid"), HllP)
          .as("regs"),
        count_distinct(col("uid")).as("n_ex"))
    val a = perDay.select(col("day").as("day_a"), col("regs").as("regs_a"),
      col("n_ex").as("n_a_exact"))
    val b = perDay.select(col("day").as("day_b"), col("regs").as("regs_b"),
      col("n_ex").as("n_b_exact"))
    // regs(A ∪ B) = elementwise max — exactly HllCore.merge, in Column code
    val joined = a.join(b, date_add(col("day_a"), 1) === col("day_b"))
      .withColumn("u_regs", expr("zip_with(regs_a, regs_b, (x, y) -> greatest(x, y))"))
    val inter = au.as("x").join(au.as("y"),
        col("x.uid") === col("y.uid") &&
          col("y.day") === date_add(col("x.day"), 1))
      .groupBy(col("x.day").as("day_a"))
      .agg(count(lit(1)).as("n_int"))
    joined.join(inter, Seq("day_a"), "left")
      .select(col("day_a"), col("day_b"),
        (col("n_a_exact") + col("n_b_exact")
          - coalesce(col("n_int"), lit(0L))).as("n_union_exact"),
        round(hllEstFromRegs("u_regs", HllP), 4).as("n_union_hll"),
        coalesce(col("n_int"), lit(0L)).as("n_inter_exact"),
        round(hllEstFromRegs("regs_a", HllP) + hllEstFromRegs("regs_b", HllP)
          - hllEstFromRegs("u_regs", HllP), 4).as("n_inter_hll"))
      .orderBy(col("day_a"))
  }

  /** q164 — BPE MERGE CENSUS: global adjacent-token-pair frequencies,
    * top 30 merge candidates (count DESC, pair ASC tie-break) — the
    * statistic one iteration of byte-pair-encoding tokenizer training
    * is greedy over (Sennrich, Haddow, Birch 2016 applied at corpus
    * scale; space-tokenized per the repo's q30 convention).
    *
    * Scale: per-doc fan-out is |tokens|−1 rows carrying ONLY the two
    * adjacent tokens (the text itself never leaves the scan); the
    * census is a map-side-combinable aggregate; the top-30 is
    * TakeOrdered, never a global sort.
    */
  def q164(s: SparkSession, d: String): DataFrame =
    // the adjacent-pair occurrence frame is the shared TokenStages
    // bigram arm (q212 scores the same rows); aggregating it over
    // source is exactly the previous sourceless census
    TokenStages.bigramOcc(s, d)
      .groupBy(col("l"), col("r"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("l"), col("r"))
      .limit(30)

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q163_audience_overlap" -> (q163 _),
    "q164_bpe_merge_census" -> (q164 _))
}

/** DuckDB mirrors of Queries19 — the q163 oracle rebuilds the per-day
  * AND per-pair register files from the shared md5Long projection
  * (max over the union's rows ≡ elementwise max of the two files, the
  * same associativity the Spark side exploits), then runs the
  * identical estimator arithmetic.
  */
object Oracle19 {

  private val estCtes =
    """agg AS (SELECT day, CAST(sum(1::BIGINT << (53 - mj)) AS BIGINT)
      |    + (256 - count(*)) * (1::BIGINT << 53) AS s,
      |    256 - count(*) AS zeros
      |  FROM reg GROUP BY day),
      |est AS (SELECT day, zeros,
      |    0.7213 / (1.0 + 1.079 / 256.0) * 256.0 * 256.0
      |      * 9007199254740992.0 / CAST(s AS DOUBLE) AS raw
      |  FROM agg),
      |fin AS (SELECT day,
      |    CASE WHEN raw <= 2.5 * 256.0 AND zeros > 0
      |      THEN 256.0 * ln(256.0 / CAST(zeros AS DOUBLE)) ELSE raw END AS est
      |  FROM est)""".stripMargin

  val sql: Map[String, String] = Map(
    "q163_audience_overlap" ->
      s"""WITH au AS (SELECT DISTINCT CAST(ts AS DATE) AS day,
         |    CAST(user_id AS VARCHAR) AS uid
         |  FROM events WHERE user_id IS NOT NULL),
         |h AS (SELECT day, ${OracleExt.md5long("uid")} AS h FROM au),
         |r AS (SELECT day, h % 256 AS idx, h // 256 AS w FROM h),
         |reg AS (SELECT day, idx,
         |    max(CASE WHEN w = 0 THEN 53
         |        ELSE 53 - length(format('{:b}', w)) END) AS mj
         |  FROM r GROUP BY day, idx),
         |$estCtes,
         |days AS (SELECT DISTINCT day FROM au),
         |prs AS (SELECT a.day AS day_a, b.day AS day_b
         |  FROM days a JOIN days b ON b.day = a.day + 1),
         |ureg AS (SELECT p.day_a AS day, r.idx, max(r.mj) AS mj
         |  FROM prs p JOIN reg r ON r.day = p.day_a OR r.day = p.day_b
         |  GROUP BY p.day_a, r.idx),
         |uagg AS (SELECT day, CAST(sum(1::BIGINT << (53 - mj)) AS BIGINT)
         |    + (256 - count(*)) * (1::BIGINT << 53) AS s,
         |    256 - count(*) AS zeros
         |  FROM ureg GROUP BY day),
         |uest AS (SELECT day, zeros,
         |    0.7213 / (1.0 + 1.079 / 256.0) * 256.0 * 256.0
         |      * 9007199254740992.0 / CAST(s AS DOUBLE) AS raw
         |  FROM uagg),
         |ufin AS (SELECT day,
         |    CASE WHEN raw <= 2.5 * 256.0 AND zeros > 0
         |      THEN 256.0 * ln(256.0 / CAST(zeros AS DOUBLE)) ELSE raw END AS est
         |  FROM uest),
         |ex AS (SELECT day, count(DISTINCT uid) AS n_ex FROM au GROUP BY day),
         |inter AS (SELECT x.day AS day_a, count(*) AS n_int
         |  FROM au x JOIN au y ON x.uid = y.uid AND y.day = x.day + 1
         |  GROUP BY x.day)
         |SELECT p.day_a, p.day_b,
         |  ea.n_ex + eb.n_ex - coalesce(i.n_int, 0) AS n_union_exact,
         |  round(fu.est, 4) AS n_union_hll,
         |  CAST(coalesce(i.n_int, 0) AS BIGINT) AS n_inter_exact,
         |  round(fa.est + fb.est - fu.est, 4) AS n_inter_hll
         |FROM prs p
         |JOIN ex ea ON ea.day = p.day_a
         |JOIN ex eb ON eb.day = p.day_b
         |JOIN fin fa ON fa.day = p.day_a
         |JOIN fin fb ON fb.day = p.day_b
         |JOIN ufin fu ON fu.day = p.day_a
         |LEFT JOIN inter i ON i.day_a = p.day_a
         |ORDER BY p.day_a""".stripMargin,

    "q164_bpe_merge_census" ->
      """WITH t AS (SELECT string_split(text, ' ') AS ts
        |  FROM documents WHERE text IS NOT NULL AND len(string_split(text, ' ')) >= 2),
        |i AS (SELECT ts, unnest(range(1, len(ts))) AS i FROM t),
        |p AS (SELECT ts[i] AS l, ts[i + 1] AS r FROM i)
        |SELECT l, r, count(*) AS n FROM p
        |WHERE l <> '' AND r <> ''
        |GROUP BY l, r ORDER BY n DESC, l, r LIMIT 30""".stripMargin)
}
