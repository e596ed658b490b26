package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-7 batch 8: model-ish corpus comparison, warehouse history
  * tracking, decayed engagement, and experiment readout.
  *
  *  - q180 is token-space KL divergence per source against the corpus
  *    unigram LM over a broadcast top-vocab — the vocabulary-level
  *    drift monitor (q140 is its lang-distribution sibling; this one
  *    catches machine-generated/boilerplate sources whose LANG looks
  *    fine but whose word distribution doesn't).
  *  - q181 builds SCD Type-2 validity intervals from an event stream —
  *    the warehouse dimension-history op (q128's CDC merge keeps only
  *    latest state; this keeps the full history with valid_from/to).
  *  - q182 is a time-decayed engagement score with a DYADIC-exact
  *    decay (1/2^days) so the ranking is bit-reproducible cross-engine
  *    without trusting libm's pow/exp.
  *  - q183 is a deterministic A/B readout: md5-assigned arms + a
  *    two-proportion z-test on conversion.
  */
object Queries24 {
  import Tables._

  private val dec = DecimalType(38, 18)

  /** q180 — VOCABULARY KL DRIFT. KL(P(token|source) ‖ P(token)) per
    * source over the global top-50 vocabulary plus an OOV bucket,
    * Laplace(+1)-smoothed over the 51 cells so an absent token cannot
    * blow up the log. Terms are round(,4)-pinned and decimal-summed
    * (the q179 convention) so partitioning cannot change the headline.
    *
    * Scale: one token census (partial+final, the q30 shape) → top-50
    * is TakeOrdered → the vocab rides a 51-row BROADCAST into the
    * exploded token pass (map-side mapping to vocab-or-OOV, no
    * shuffle fan-out); everything after the (source, vtok) aggregate
    * is arithmetic on ≤ |sources|×51 rows. The dense cell grid comes
    * from a broadcast cross of two tiny frames, never from data.
    */
  def q180(s: SparkSession, d: String): DataFrame = {
    val toks = documents(s, d)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("gn"))
      .orderBy(col("gn").desc, col("tok")).limit(50)
    val mapped = toks.join(broadcast(vocab.select(col("tok"),
        lit(true).as("in_v"))), Seq("tok"), "left")
      .select(col("source"),
        when(col("in_v"), col("tok")).otherwise(lit("<oov>")).as("vtok"))
    val cells = mapped.groupBy(col("source"), col("vtok"))
      .agg(count(lit(1)).as("n"))
    // dense (source × 51) grid: KL's smoothed zero cells must exist
    val grid = cells.select(col("source")).distinct()
      .crossJoin(broadcast(
        vocab.select(col("tok").as("vtok"))
          .unionByName(vocab.sparkSession
            .range(1).select(lit("<oov>").as("vtok")))))
    val dense = grid.join(cells, Seq("source", "vtok"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
    val global = dense.groupBy(col("vtok")).agg(sum(col("n")).as("gn"))
    val gtot = global.agg(sum(col("gn")).as("gt"))
    val bySrc = Window.partitionBy(col("source"))
    dense
      .withColumn("sn", sum(col("n")).over(bySrc))
      .join(broadcast(global), Seq("vtok"))
      .crossJoin(broadcast(gtot))
      .withColumn("p", (col("n") + lit(1)).cast("double") /
        (col("sn") + lit(51)).cast("double"))
      .withColumn("q", (col("gn") + lit(1)).cast("double") /
        (col("gt") + lit(51)).cast("double"))
      .withColumn("term", round(col("p") * log(col("p") / col("q")), 4))
      .groupBy(col("source"))
      .agg(min(col("sn")).as("n_tokens"),
        round((sum(when(col("vtok") === "<oov>", col("n"))
            .otherwise(lit(0L))).cast("double") /
          min(col("sn")).cast("double")), 4).as("oov_share"),
        round(sum(col("term").cast(dec)).cast("double"), 4)
          .as("kl_vocab"))
      .orderBy(col("source"))
  }

  /** q181 — SCD TYPE-2 INTERVALS. Dimension-history build from the
    * event stream: per user (sampled cohort user_id % 10 = 0, to keep
    * the declared output a report rather than a full dump), each
    * event_type CHANGE opens a new version row with
    * [valid_from_us, valid_to_us) and the open row carries a NULL
    * valid_to (is_current). The q128 CDC merge keeps latest-state
    * only; this is the history-keeping twin every warehouse pairs
    * with it.
    *
    * Scale: two linear window passes per user partition (lag to
    * detect changes — which drops the non-change rows BEFORE the
    * second pass — then lead/row_number on the survivors). No
    * self-join, no time-range join; ties broken by event_id so the
    * build is deterministic under any partitioning.
    */
  def q181(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("t"), col("event_id"))
    val changes = events(s, d)
      .filter(col("user_id") % 10 === 0)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("t"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
    changes
      .withColumn("version", row_number().over(w))
      .withColumn("valid_from_us", col("t"))
      .withColumn("valid_to_us", lead(col("t"), 1).over(w))
      .select(col("user_id"), col("version"), col("event_type"),
        col("valid_from_us"), col("valid_to_us"),
        col("valid_to_us").isNull.as("is_current"))
      .orderBy(col("user_id"), col("version"))
  }

  /** q182 — DECAYED ENGAGEMENT SCORE. Per-user recency-weighted value
    * sum with a one-day half-life, computed as value / 2^age_days —
    * the power of two is an exact integer (shiftleft) and the weight
    * application is ONE correctly-rounded IEEE division, so the score
    * is bit-reproducible cross-engine (the q166 no-libm-in-the-key
    * discipline; pow/exp would not be). Terms are decimal-summed
    * UNROUNDED — a dyadic term like value/2 lands exactly on .00005
    * boundaries where the two engines' round() disagree, so the pin
    * that protects q179's ln() terms would here INJECT mismatches;
    * the exact-dyadic doubles need no pin, and the single final
    * round(,4) masks any sub-ulp cast drift. Top-20 by (score desc,
    * user_id).
    *
    * Scale: the reference instant is a 1-row broadcast (max ts); the
    * weighting is per-row scalar math; one partial+final aggregate on
    * user_id; top-20 is TakeOrdered, never a global sort. age is
    * capped at 62 days so the shift stays in Long range — weights
    * below 2^-62 are zero at double precision anyway.
    */
  def q182(s: SparkSession, d: String): DataFrame = {
    val ref = events(s, d).agg(max(unix_micros(col("ts"))).as("ref_us"))
    events(s, d)
      .select(col("user_id"), col("value"), unix_micros(col("ts")).as("t"))
      .crossJoin(broadcast(ref))
      .withColumn("age_d",
        least(expr("(ref_us - t) div 86400000000"), lit(62L)))
      .withColumn("term",
        col("value") /
          expr("shiftleft(cast(1 as bigint), cast(age_d as int))"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("term").cast(dec)).cast("double"), 4)
          .as("decayed_score"))
      .orderBy(col("decayed_score").desc, col("user_id"))
      .limit(20)
  }

  /** q183 — A/B CONVERSION READOUT. Users deterministically assigned
    * to arms by md5 parity (Text.md5Long — the split survives
    * restarts and re-shards, unlike Bernoulli sampling), conversion =
    * a purchase within 24 h of the user's FIRST event (the
    * time-bounded activation metric; lifetime-ever saturates to 100%
    * on an active population and zeroes the pooled variance), then
    * the two-proportion z-test on the arm rates. All time math is
    * integer µs; sqrt is IEEE correctly-rounded so the statistic
    * hashes identically on both engines; rates and z are
    * round(,4)-pinned for display.
    *
    * Scale: t0 rides a per-user window over the user-partitioned
    * scan, the flag collapses in the same user-keyed aggregate (one
    * shuffle total); the arm table is 2 rows; the z arithmetic is a
    * 1-row broadcast joined back. Nothing per-event survives the
    * first aggregate.
    */
  def q183(s: SparkSession, d: String): DataFrame = {
    val wu = Window.partitionBy(col("user_id"))
    val users = events(s, d)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("t"))
      .withColumn("t0", min(col("t")).over(wu))
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase" &&
          col("t") <= col("t0") + lit(86400000000L), 1).otherwise(0))
        .as("converted"))
      .withColumn("arm",
        when(graft.functions.Text.md5Long(col("user_id").cast("string")) % 2 === 0,
          lit("A")).otherwise(lit("B")))
    val arms = users.groupBy(col("arm"))
      .agg(count(lit(1)).as("n_users"), sum(col("converted")).as("n_conv"))
    val z = arms.agg(
        sum(when(col("arm") === "A", col("n_users"))).as("na"),
        sum(when(col("arm") === "A", col("n_conv"))).as("ca"),
        sum(when(col("arm") === "B", col("n_users"))).as("nb"),
        sum(when(col("arm") === "B", col("n_conv"))).as("cb"))
      .withColumn("pa", col("ca").cast("double") / col("na").cast("double"))
      .withColumn("pb", col("cb").cast("double") / col("nb").cast("double"))
      .withColumn("pp", (col("ca") + col("cb")).cast("double") /
        (col("na") + col("nb")).cast("double"))
      .select(round((col("pa") - col("pb")) /
        sqrt(col("pp") * (lit(1.0) - col("pp")) *
          (lit(1.0) / col("na").cast("double") +
            lit(1.0) / col("nb").cast("double"))), 4).as("z_ab"))
    arms
      .crossJoin(broadcast(z))
      .select(col("arm"), col("n_users"), col("n_conv"),
        round(col("n_conv").cast("double") / col("n_users").cast("double"),
          4).as("conv_rate"),
        col("z_ab"), (abs(col("z_ab")) > 1.96).as("significant"))
      .orderBy(col("arm"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q180_vocab_kl" -> (q180 _),
    "q181_scd2_intervals" -> (q181 _),
    "q182_decayed_engagement" -> (q182 _),
    "q183_ab_conversion" -> (q183 _))
}

/** DuckDB mirrors of Queries24 — same formulas, same smoothing
  * constants, same round(,4) pins and DECIMAL(38,18) sums (§7.4).
  */
object Oracle24 {

  val sql: Map[String, String] = Map(
    "q180_vocab_kl" ->
      """WITH toks AS (SELECT source,
        |    unnest(string_split(text, ' ')) AS tok FROM documents),
        |vocab AS (SELECT tok, count(*) AS gn FROM toks GROUP BY tok
        |  ORDER BY gn DESC, tok LIMIT 50),
        |mapped AS (SELECT t.source,
        |    CASE WHEN v.tok IS NULL THEN '<oov>' ELSE t.tok END AS vtok
        |  FROM toks t LEFT JOIN vocab v ON t.tok = v.tok),
        |cells AS (SELECT source, vtok, count(*) AS n FROM mapped
        |  GROUP BY source, vtok),
        |vgrid AS (SELECT tok AS vtok FROM vocab
        |  UNION ALL SELECT '<oov>'),
        |grid AS (SELECT s.source, g.vtok
        |  FROM (SELECT DISTINCT source FROM cells) s, vgrid g),
        |dense AS (SELECT g.source, g.vtok, coalesce(c.n, 0) AS n
        |  FROM grid g LEFT JOIN cells c
        |    ON g.source = c.source AND g.vtok = c.vtok),
        |gstats AS (SELECT vtok, sum(n) AS gn FROM dense GROUP BY vtok),
        |gt AS (SELECT sum(gn) AS gt FROM gstats),
        |terms AS (SELECT d.source, d.vtok, d.n,
        |    sum(d.n) OVER (PARTITION BY d.source) AS sn,
        |    g.gn, gt.gt
        |  FROM dense d JOIN gstats g ON d.vtok = g.vtok, gt),
        |km AS (SELECT source, vtok, n, sn,
        |    round((CAST(n + 1 AS DOUBLE) / CAST(sn + 51 AS DOUBLE)) *
        |      ln((CAST(n + 1 AS DOUBLE) / CAST(sn + 51 AS DOUBLE)) /
        |        (CAST(gn + 1 AS DOUBLE) / CAST(gt + 51 AS DOUBLE))), 4)
        |      AS term
        |  FROM terms)
        |SELECT source, CAST(min(sn) AS BIGINT) AS n_tokens,
        |  round(CAST(sum(CASE WHEN vtok = '<oov>' THEN n ELSE 0 END)
        |      AS DOUBLE) / CAST(min(sn) AS DOUBLE), 4) AS oov_share,
        |  round(CAST(sum(CAST(term AS DECIMAL(38,18))) AS DOUBLE), 4)
        |    AS kl_vocab
        |FROM km GROUP BY source ORDER BY source""".stripMargin,

    "q181_scd2_intervals" ->
      """WITH e AS (SELECT user_id, event_type, event_id,
        |    epoch_ns(ts) // 1000 AS t
        |  FROM events WHERE user_id % 10 = 0),
        |ch AS (SELECT *,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY t, event_id) AS prev
        |  FROM e),
        |keep AS (SELECT * FROM ch
        |  WHERE prev IS NULL OR prev <> event_type)
        |SELECT user_id,
        |  CAST(row_number() OVER w AS INTEGER) AS version, event_type,
        |  t AS valid_from_us,
        |  lead(t) OVER w AS valid_to_us,
        |  (lead(t) OVER w) IS NULL AS is_current
        |FROM keep
        |WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
        |ORDER BY user_id, version""".stripMargin,

    "q182_decayed_engagement" ->
      """WITH r AS (SELECT max(epoch_ns(ts) // 1000) AS ref_us
        |  FROM events),
        |t AS (SELECT user_id,
        |    value / (CAST(1 AS BIGINT) << CAST(least(
        |      (r.ref_us - epoch_ns(ts) // 1000) // 86400000000, 62)
        |      AS INTEGER)) AS term
        |  FROM events, r)
        |SELECT user_id, count(*) AS n_events,
        |  round(CAST(sum(CAST(term AS DECIMAL(38,18))) AS DOUBLE), 4)
        |    AS decayed_score
        |FROM t GROUP BY user_id
        |ORDER BY decayed_score DESC, user_id LIMIT 20""".stripMargin,

    "q183_ab_conversion" ->
      """WITH ev AS (SELECT user_id, event_type,
        |    epoch_ns(ts) // 1000 AS t,
        |    min(epoch_ns(ts) // 1000) OVER (PARTITION BY user_id) AS t0
        |  FROM events),
        |u AS (SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase'
        |        AND t <= t0 + 86400000000 THEN 1 ELSE 0 END)
        |      AS converted
        |  FROM ev GROUP BY user_id),
        |a AS (SELECT CASE WHEN
        |      CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15)
        |        AS BIGINT) % 2 = 0
        |    THEN 'A' ELSE 'B' END AS arm, converted FROM u),
        |arms AS (SELECT arm, count(*) AS n_users,
        |    CAST(sum(converted) AS BIGINT) AS n_conv
        |  FROM a GROUP BY arm),
        |z AS (SELECT round(
        |    (CAST(ca AS DOUBLE) / na - CAST(cb AS DOUBLE) / nb) /
        |    sqrt(pp * (1 - pp) * (1.0 / na + 1.0 / nb)), 4) AS z_ab
        |  FROM (SELECT
        |      sum(CASE WHEN arm = 'A' THEN n_users END) AS na,
        |      sum(CASE WHEN arm = 'A' THEN n_conv END) AS ca,
        |      sum(CASE WHEN arm = 'B' THEN n_users END) AS nb,
        |      sum(CASE WHEN arm = 'B' THEN n_conv END) AS cb,
        |      CAST(sum(n_conv) AS DOUBLE) / sum(n_users) AS pp
        |    FROM arms))
        |SELECT arm, n_users, n_conv,
        |  round(CAST(n_conv AS DOUBLE) / n_users, 4) AS conv_rate,
        |  z.z_ab, abs(z.z_ab) > 1.96 AS significant
        |FROM arms, z ORDER BY arm""".stripMargin)
}
