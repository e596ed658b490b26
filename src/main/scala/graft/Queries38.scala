package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Linkage

/** Round-8 batch 2: record-linkage, privacy release, and skyline
  * operators (SURVEY §2.8 X127-X129).
  */
object Queries38 {
  import Tables._

  /** q217 — BLOCKED FUZZY RECORD LINKAGE (X127; Jaro-Winkler). The
    * classic entity-resolution shape: block on cheap exact keys
    * (p_brand × first letter of the name) so the quadratic comparator
    * only ever runs inside a block, then score candidate pairs with a
    * native Jaro-Winkler expression (Linkage.scala — Spark has
    * levenshtein built in but no JW) and keep near-matches of
    * DISTINCT names at rounded similarity ≥ 0.88 (chosen so even the sf0.001 smoke corpus yields pairs). Both engines round
    * to 4 decimals BEFORE thresholding, so a last-ulp disagreement in
    * the double math cannot flip a pair across the cut.
    *
    * Scale: the block key bounds fan-out exactly like the dedup
    * family's LSH buckets — comparisons are Σ_blocks C(|block|,2),
    * never C(n,2); the join shuffles on the block key and the
    * comparator is a per-pair scalar kernel inside the join's
    * output projection. Skewed blocks would get the q143 cap
    * treatment; at these SFs the measured max block is ~100 rows.
    */
  def q217(s: SparkSession, d: String): DataFrame = {
    val p = part(s, d).select(col("p_partkey"), col("p_brand"),
      col("p_name"), substring(col("p_name"), 1, 1).as("blk"))
    val a = p.select(col("p_brand"), col("blk"),
      col("p_partkey").as("k1"), col("p_name").as("name1"))
    val b = p.select(col("p_brand"), col("blk"),
      col("p_partkey").as("k2"), col("p_name").as("name2"))
    a.join(b, Seq("p_brand", "blk"))
      .filter(col("k1") < col("k2") && col("name1") =!= col("name2"))
      .withColumn("jw",
        round(Linkage.jaro_winkler(col("name1"), col("name2")), 4))
      .filter(col("jw") >= 0.88)
      .select(col("p_brand"), col("k1"), col("k2"),
        col("name1"), col("name2"), col("jw"))
      .orderBy(col("p_brand"), col("k1"), col("k2"))
  }

  /** q218 — DIFFERENTIALLY-PRIVATE HISTOGRAM RELEASE (X128). Laplace
    * mechanism over the (event_type, day-of-week) count histogram:
    * noise b·sign(z)·(−ln(1−2|z|)) with b = 1/ε = 2 and z = u − 0.5,
    * u drawn from the same dyadic md5 grid as q166's weighted sample
    * — u = (md5-52-bits + 0.5)/2⁵², so u can NEVER equal 0.5 exactly
    * and ln(0) is unreachable by construction. Cells whose noisy
    * count falls below the k=10 release threshold are suppressed to
    * NULL (count released as absent, the key itself stays — standard
    * contingency-table suppression, completing q184's k-anonymity
    * audit with an actual private release).
    *
    * The seed is deterministic here so DuckDB can replay the draw —
    * a production release would draw real randomness; the MECHANISM
    * (sensitivity-1 count + Laplace(1/ε) + threshold) is the operator
    * under test. Scale: one partial+final aggregate; noise is a
    * per-group scalar afterthought.
    */
  def q218(s: SparkSession, d: String): DataFrame = {
    val eps = 0.5
    val b = 1.0 / eps
    val grid = lit(4503599627370496.0) // 2^52
    val u = (graft.functions.Text.md5Long(
      concat(lit("dp|"), col("event_type"), lit("|"), col("dow")))
      .bitwiseAND(lit((1L << 52) - 1)).cast("double") + lit(0.5)) / grid
    val z = u - lit(0.5)
    val lap = lit(b) * signum(z) * -log(lit(1.0) - lit(2.0) * abs(z))
    events(s, d)
      .filter(col("event_type").isNotNull)
      .select(col("event_type"),
        // q188's engine-neutral integer dow (0 = Sunday)
        expr("((unix_micros(ts) div 86400000000) + 4) % 7").as("dow"))
      .groupBy(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("n_true"))
      .withColumn("noisy", round(col("n_true") + lap, 4))
      .select(col("event_type"), col("dow"),
        when(col("noisy") >= 10.0, col("noisy")).as("released"))
      .orderBy(col("event_type"), col("dow"))
  }

  /** q219 — PARETO FRONTIER / SKYLINE (X129). Parts minimizing
    * (p_retailprice, p_size): a part is dominated iff some part is ≤
    * on both axes and strictly better on one. For the 2-D skyline the
    * quadratic NOT-EXISTS (the oracle's formulation) collapses to
    * sorted running minima: collapse to one row per distinct price
    * carrying the group's min size, sort by price, and a part is
    * dominated iff a STRICTLY cheaper price group has min size ≤ its
    * size, or its own price group holds a strictly smaller size.
    *
    * Scale: one |distinct prices| aggregate + one ordered window over
    * it + an equi-join back — O(n log n) where the naive skyline is
    * O(n²); the price-group table is orders of magnitude smaller than
    * the fact table and broadcastable.
    */
  def q219(s: SparkSession, d: String): DataFrame = {
    val p = part(s, d)
    val groups = p.groupBy(col("p_retailprice"))
      .agg(min(col("p_size")).as("gmin"))
      .withColumn("run_prev",
        min(col("gmin")).over(Window.orderBy(col("p_retailprice"))
          .rowsBetween(Window.unboundedPreceding, -1)))
    p.join(broadcast(groups), Seq("p_retailprice"))
      .filter(!(coalesce(col("run_prev") <= col("p_size"), lit(false)) ||
        col("gmin") < col("p_size")))
      .select(col("p_partkey"), col("p_name"),
        col("p_retailprice"), col("p_size"))
      .orderBy(col("p_retailprice"), col("p_size"), col("p_partkey"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q217_jw_linkage" -> (q217 _),
    "q218_dp_histogram" -> (q218 _),
    "q219_pareto_frontier" -> (q219 _))
}

/** DuckDB mirrors of Queries38. q217 leans on DuckDB's built-in
  * jaro_winkler_similarity — an INDEPENDENT implementation of the
  * same published metric (prefix cap 4, scale 0.1, boost threshold
  * 0.7), so hash parity cross-validates Linkage.scala char by char.
  * q219's oracle is the textbook quadratic NOT EXISTS, deliberately
  * a DIFFERENT algorithm from the Spark side's sorted running-minima
  * plan — agreement proves the rewrite.
  */
object Oracle38 {

  private def md5long(e: String): String =
    s"CAST('0x' || substring(md5($e), 1, 15) AS BIGINT)"

  val sql: Map[String, String] = Map(
    "q217_jw_linkage" ->
      """WITH p AS (SELECT p_partkey, p_brand, p_name,
        |    substring(p_name, 1, 1) AS blk FROM part)
        |SELECT a.p_brand, a.p_partkey AS k1, b.p_partkey AS k2,
        |  a.p_name AS name1, b.p_name AS name2,
        |  round(jaro_winkler_similarity(a.p_name, b.p_name), 4) AS jw
        |FROM p a JOIN p b
        |  ON a.p_brand = b.p_brand AND a.blk = b.blk
        |  AND a.p_partkey < b.p_partkey AND a.p_name <> b.p_name
        |WHERE round(jaro_winkler_similarity(a.p_name, b.p_name), 4) >= 0.88
        |ORDER BY a.p_brand, k1, k2""".stripMargin,

    "q218_dp_histogram" -> {
      val u = s"(CAST(${md5long("'dp|' || event_type || '|' || dow")} " +
        "& 4503599627370495 AS DOUBLE) + 0.5) / 4503599627370496.0"
      s"""WITH h AS (
         |  SELECT event_type,
         |    ((epoch_ns(ts) // 1000) // 86400000000 + 4) % 7 AS dow,
         |    count(*) AS n_true
         |  FROM events WHERE event_type IS NOT NULL
         |  GROUP BY 1, 2),
         |n AS (SELECT event_type, dow,
         |    round(n_true + 2.0 * sign(($u) - 0.5) *
         |      -ln(1.0 - 2.0 * abs(($u) - 0.5)), 4) AS noisy
         |  FROM h)
         |SELECT event_type, dow,
         |  CASE WHEN noisy >= 10.0 THEN noisy END AS released
         |FROM n ORDER BY event_type, dow""".stripMargin
    },

    "q219_pareto_frontier" ->
      """SELECT p.p_partkey, p.p_name, p.p_retailprice, p.p_size
        |FROM part p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part q
        |  WHERE q.p_retailprice <= p.p_retailprice
        |    AND q.p_size <= p.p_size
        |    AND (q.p_retailprice < p.p_retailprice OR q.p_size < p.p_size))
        |ORDER BY p.p_retailprice, p.p_size, p.p_partkey""".stripMargin)
}
