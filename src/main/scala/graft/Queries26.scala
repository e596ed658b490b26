package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-7 batch 10: temporal seasonality, conversion latency, ANN
  * threshold calibration, and traffic-concentration auditing.
  *
  *  - q188 profiles day-of-week seasonality per event type with an
  *    integer-math dow (no engine-specific weekday numbering).
  *  - q189 measures activation LATENCY (first event → first purchase)
  *    as a distribution — q183 counts conversions, this times them.
  *  - q190 calibrates similarity thresholds from a hash-bucketed
  *    random-pair sample of the embedding space — the measurement
  *    q38/q39's cosine cutoffs are chosen from, without an all-pairs
  *    join.
  *  - q191 is the Lorenz/Gini concentration audit of events per user
  *    — exact integer/rational arithmetic end-to-end.
  */
object Queries26 {
  import Tables._

  private val dec = DecimalType(38, 18)

  /** q188 — DAY-OF-WEEK SEASONALITY. Per (dow, event_type) volumes
    * with each cell's share of its type and the seasonality index
    * (share × 7 — 1.0 = flat). dow is pure integer math on the µs
    * epoch ((days + 4) mod 7, 0 = Sunday) — engines disagree on
    * weekday numbering (Spark 1=Sunday, DuckDB 0=Sunday), integer
    * arithmetic doesn't.
    *
    * Scale: one partial+final aggregate bounded by 7×|types|; shares
    * via a window over ≤7 rows per type partition. Nothing per-event
    * survives the aggregate.
    */
  def q188(s: SparkSession, d: String): DataFrame = {
    val byType = Window.partitionBy(col("event_type"))
    events(s, d)
      .select(col("event_type"),
        expr("((unix_micros(ts) div 86400000000) + 4) % 7").as("dow"))
      .groupBy(col("dow"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("share", round(col("n").cast("double") /
        sum(col("n")).over(byType).cast("double"), 4))
      .withColumn("season_idx", round(col("n").cast("double") * 7.0 /
        sum(col("n")).over(byType).cast("double"), 4))
      .orderBy(col("event_type"), col("dow"))
  }

  /** q189 — CONVERSION-LAG DISTRIBUTION. Among users who purchase,
    * the latency from their FIRST event to their FIRST purchase:
    * converter count, exact p50/p90 (interpolated percentile, the
    * q179 edge convention) and a decimal-summed mean, in seconds
    * (one IEEE division by 10^6 per value).
    *
    * Scale: two min-aggregates collapse per user in ONE user-keyed
    * partial+final pass (min and conditional-min together); the
    * percentile runs over the |converters| aggregate rows, not
    * events. At 10^9 users the p50/p90 would come from the X75
    * quantile sketch — this is its exact calibration form.
    */
  def q189(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("t"))
      .groupBy(col("user_id"))
      .agg(min(col("t")).as("t0"),
        min(when(col("event_type") === "purchase", col("t"))).as("tp"))
      .filter(col("tp").isNotNull)
      .select(((col("tp") - col("t0")).cast("double") / lit(1000000.0))
        .as("lag_s"))
      .agg(count(lit(1)).as("n_converted"),
        round(percentile(col("lag_s"), lit(0.5)), 4).as("p50_lag_s"),
        round(percentile(col("lag_s"), lit(0.9)), 4).as("p90_lag_s"),
        round((sum(col("lag_s").cast(dec)) / count(lit(1)))
          .cast("double"), 4).as("mean_lag_s"))

  /** q190 — SAMPLED-PAIR COSINE CALIBRATION. The distribution of
    * cosine similarity over RANDOM pairs of embeddings — the
    * measurement q38/q39's near-dup thresholds are chosen from.
    * Pairs are drawn by hashing each vector into one of G=25 md5
    * buckets and pairing only within a bucket: expected pairs =
    * n²/(2G) and G scales with n, so the sample stays linear while
    * all-pairs would be quadratic — the same cap-the-fanout move as
    * q143's banding. Cosines bin into 10 equal [-1,1] buckets.
    *
    * Scale: the pair join is bucket-keyed (never a cross join);
    * per-pair math is the codegen DotProduct/SumSq kernel pair; the
    * report is a ≤10-row aggregate.
    */
  def q190(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d).select(col("vec_id"),
      graft.functions.Text.md5Long(col("vec_id").cast("string"))
        .mod(25).as("bkt"),
      col("embedding"))
    val a = e.select(col("bkt"), col("vec_id").as("ia"),
      col("embedding").as("va"))
    val b = e.select(col("bkt"), col("vec_id").as("ib"),
      col("embedding").as("vb"))
    val pairs = a.join(b, Seq("bkt")).filter(col("ia") < col("ib"))
      .select(graft.functions.Vectors
        .cosine(col("va"), col("vb")).as("cos"))
    val tot = pairs.agg(count(lit(1)).as("n_pairs"))
    pairs
      .withColumn("bin",
        least(greatest(floor((col("cos") + 1.0) * 5.0), lit(0.0)),
          lit(9.0)).cast("long"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(tot))
      .select(col("bin"),
        round(lit(-1.0) + col("bin") * 0.2, 1).as("bin_lo"),
        col("n"), col("n_pairs"),
        round(col("n").cast("double") / col("n_pairs").cast("double"), 4)
          .as("share"))
      .orderBy(col("bin"))
  }

  /** q191 — USER-CONCENTRATION AUDIT (Lorenz/Gini). How concentrated
    * is event volume across users: exact Gini from the rank-sum
    * formula G = 2·Σ(i·nᵢ)/(N·Σnᵢ) − (N+1)/N over users ranked by
    * volume, plus top-1 and top-10 user shares. Every input to the
    * formula is an integer sum — the divisions at the end are the
    * only float ops, so the audit is exact cross-engine.
    *
    * Scale: per-user counts are one partial+final aggregate; the
    * rank window runs over |users| AGGREGATE rows (not events). At
    * 10^9 users the ranked pass would ride the X75 sketch's
    * equi-depth buckets instead; the top-k shares are TakeOrdered
    * either way.
    */
  def q191(s: SparkSession, d: String): DataFrame = {
    val perUser = events(s, d).groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"))
    // Round 17 (VERDICT r16 #5): the two row_number windows over
    // |users| rows planned single-partition WindowExecs — fact-scale
    // serialization points at 10^9 users. Every output is a rank-SUM
    // statistic, and rank sums are closed forms of the volume
    // HISTOGRAM: users sharing volume v occupy the consecutive
    // ascending-rank run (cum−cnt, cum] (the user_id tiebreak only
    // permutes ranks WITHIN the run, invisible to any sum), so
    //   Σ i·v over the run = v · (run-length × run-midpoint), and
    //   top-k share = Σ v · |descending-run ∩ [1,k]| with the
    // descending run = [N−cum+1, N−cum+cnt]. All integer algebra —
    // one of cnt and (2·cum−cnt+1) is always even, so the midpoint
    // product halves exactly. The residual cumsum window runs over
    // the volume VALUE domain (the q22/q290 aggregate-frame class),
    // never over users.
    val hist = perUser.groupBy(col("n")).agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy(col("n"))
    val cummed = hist
      .withColumn("cum", sum(col("cnt")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("nu", sum(col("cnt")).over(
        w.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
    // rank·count products summed as DECIMAL(38,0): a LongType sum of
    // i*n wraps at ~10^9 users × big volumes, while DuckDB promotes
    // BIGINT sums to HUGEINT — decimal keeps cross-engine parity
    val term = expr(
      """CAST(n AS DECIMAL(19,0)) * (CASE WHEN cnt % 2 = 0
        |  THEN CAST(cnt div 2 AS DECIMAL(19,0)) *
        |       CAST(2 * cum - cnt + 1 AS DECIMAL(19,0))
        |  ELSE CAST(cnt AS DECIMAL(19,0)) *
        |       CAST((2 * cum - cnt + 1) div 2 AS DECIMAL(19,0))
        |  END)""".stripMargin).cast(DecimalType(38, 0))
    def ov(k: Int) = greatest(lit(0L),
      least(col("nu") - col("cum") + col("cnt"), lit(k.toLong)) -
        (col("nu") - col("cum")))
    cummed.agg(coalesce(max(col("nu")), lit(0L)).as("n_users"),
        sum(col("n") * col("cnt")).as("n_events"),
        sum(term).as("ws"),
        sum(col("n") * ov(1)).as("top1"),
        sum(col("n") * ov(10)).as("top10"))
      .select(col("n_users"), col("n_events"),
        round(lit(2.0) * col("ws").cast("double") /
          (col("n_users").cast("double") * col("n_events").cast("double")) -
          (col("n_users") + lit(1)).cast("double") /
            col("n_users").cast("double"), 4).as("gini"),
        round(col("top1").cast("double") / col("n_events").cast("double"),
          4).as("top1_share"),
        round(col("top10").cast("double") / col("n_events").cast("double"),
          4).as("top10_share"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q188_dow_seasonality" -> (q188 _),
    "q189_conversion_lag" -> (q189 _),
    "q190_pair_cosine_sample" -> (q190 _),
    "q191_user_concentration" -> (q191 _))
}

/** DuckDB mirrors of Queries26 — same integer dow, same bucket
  * sampling, same rank-sum Gini, same rounding (§7.4).
  */
object Oracle26 {

  private val md5l = "CAST('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT)"

  val sql: Map[String, String] = Map(
    "q188_dow_seasonality" ->
      """WITH e AS (SELECT event_type,
        |    ((epoch_ns(ts) // 1000 // 86400000000) + 4) % 7 AS dow
        |  FROM events),
        |c AS (SELECT dow, event_type, count(*) AS n FROM e
        |  GROUP BY dow, event_type)
        |SELECT dow, event_type, n,
        |  round(CAST(n AS DOUBLE) /
        |    CAST(sum(n) OVER (PARTITION BY event_type) AS DOUBLE), 4)
        |    AS share,
        |  round(CAST(n AS DOUBLE) * 7.0 /
        |    CAST(sum(n) OVER (PARTITION BY event_type) AS DOUBLE), 4)
        |    AS season_idx
        |FROM c ORDER BY event_type, dow""".stripMargin,

    "q189_conversion_lag" ->
      """WITH u AS (SELECT user_id,
        |    min(epoch_ns(ts) // 1000) AS t0,
        |    min(CASE WHEN event_type = 'purchase'
        |      THEN epoch_ns(ts) // 1000 END) AS tp
        |  FROM events GROUP BY user_id),
        |l AS (SELECT CAST(tp - t0 AS DOUBLE) / 1000000.0 AS lag_s
        |  FROM u WHERE tp IS NOT NULL)
        |SELECT count(*) AS n_converted,
        |  round(quantile_cont(lag_s, 0.5), 4) AS p50_lag_s,
        |  round(quantile_cont(lag_s, 0.9), 4) AS p90_lag_s,
        |  round(CAST(sum(CAST(lag_s AS DECIMAL(38,18))) AS DOUBLE)
        |    / count(*), 4) AS mean_lag_s
        |FROM l""".stripMargin,

    "q190_pair_cosine_sample" ->
      s"""WITH e AS (SELECT vec_id, $md5l % 25 AS bkt,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |p AS (SELECT
         |    list_sum(list_transform(range(1, len(a.v) + 1),
         |      i -> a.v[i] * b.v[i])) /
         |    (sqrt(list_sum(list_transform(a.v, x -> x * x))) *
         |     sqrt(list_sum(list_transform(b.v, x -> x * x)))) AS cos
         |  FROM e a JOIN e b ON a.bkt = b.bkt AND a.vec_id < b.vec_id),
         |binned AS (SELECT CAST(least(greatest(
         |      floor((cos + 1.0) * 5.0), 0.0), 9.0) AS BIGINT) AS bin
         |  FROM p),
         |c AS (SELECT bin, count(*) AS n FROM binned GROUP BY bin),
         |t AS (SELECT CAST(sum(n) AS BIGINT) AS n_pairs FROM c)
         |SELECT bin,
         |  round(CAST(-1.0 + bin * 0.2 AS DOUBLE), 1) AS bin_lo,
         |  n, t.n_pairs,
         |  round(CAST(n AS DOUBLE) / CAST(t.n_pairs AS DOUBLE), 4)
         |    AS share
         |FROM c, t ORDER BY bin""".stripMargin,

    "q191_user_concentration" ->
      """WITH pu AS (SELECT user_id, count(*) AS n FROM events
        |  GROUP BY user_id),
        |rk AS (SELECT n, row_number() OVER (ORDER BY n, user_id) AS i
        |  FROM pu),
        |tp AS (SELECT n, row_number() OVER (ORDER BY n DESC, user_id)
        |    AS r FROM pu),
        |tops AS (SELECT
        |    CAST(sum(CASE WHEN r = 1 THEN n ELSE 0 END) AS BIGINT)
        |      AS top1,
        |    CAST(sum(CASE WHEN r <= 10 THEN n ELSE 0 END) AS BIGINT)
        |      AS top10
        |  FROM tp),
        |g AS (SELECT count(*) AS n_users,
        |    CAST(sum(n) AS BIGINT) AS n_events,
        |    CAST(sum(i * n) AS BIGINT) AS ws
        |  FROM rk)
        |SELECT g.n_users, g.n_events,
        |  round(2.0 * CAST(ws AS DOUBLE) /
        |    (CAST(n_users AS DOUBLE) * CAST(n_events AS DOUBLE)) -
        |    CAST(n_users + 1 AS DOUBLE) / CAST(n_users AS DOUBLE), 4)
        |    AS gini,
        |  round(CAST(top1 AS DOUBLE) / CAST(n_events AS DOUBLE), 4)
        |    AS top1_share,
        |  round(CAST(top10 AS DOUBLE) / CAST(n_events AS DOUBLE), 4)
        |    AS top10_share
        |FROM g, tops""".stripMargin)
}
