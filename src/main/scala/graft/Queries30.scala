package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-7 batch 14: the TPC-H Q7 shape, mergeable-moments algebra,
  * and an anomaly-detector ensemble.
  *
  *  - q201 is bilateral nation-pair trade volume — the OR'd pair
  *    predicate kept OUT of the join keys (equi-joins + a tiny
  *    post-join filter), the classic Q7 planning trap.
  *  - q202 proves the mergeable-moments algebra: per-shard
  *    (n, Σx, Σx²) decimal states merged relationally equal the
  *    direct single-pass moments EXACTLY — the X73/X75 register
  *    treatment applied to mean/variance, the statistic every
  *    distributed profiler ships.
  *  - q203 is consensus anomaly detection: z-score, MAD and
  *    IQR-fence detectors vote per value; the report counts each
  *    detector's flags and the 2-of-3 consensus per event type —
  *    integer outputs end-to-end.
  */
object Queries30 {
  import Tables._

  private val dec = DecimalType(38, 18)

  /** q201 — NATION-PAIR TRADE (the TPC-H Q7 shape). Line-item revenue
    * between NATION_18 and NATION_19 in both directions (a pair populated in both directions at every test SF, so the driver's rows>0 smoke check holds at sf0.001), by ship year.
    * The (n1,n2)|(n2,n1) OR predicate stays a POST-JOIN filter on two
    * broadcast dimension names — folding it into join keys would
    * break the equi-join (the classic Q7 trap); all five joins remain
    * equi with broadcast dims.
    *
    * Scale: supplier/customer/nation broadcast; orders⋈lineitem is
    * the one big SMJ on its natural key; the pair filter reduces to
    * two string equalities per joined row. Revenue through
    * DECIMAL(38,18) (§7.4).
    */
  def q201(s: SparkSession, d: String): DataFrame = {
    val n1 = nation(s, d).select(col("n_nationkey").as("sk"),
      col("n_name").as("supp_nation"))
    val n2 = nation(s, d).select(col("n_nationkey").as("ck"),
      col("n_name").as("cust_nation"))
    lineitem(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supplier(s, d)),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("sk"))
      .join(broadcast(n2), col("c_nationkey") === col("ck"))
      .filter((col("supp_nation") === "NATION_18" &&
          col("cust_nation") === "NATION_19") ||
        (col("supp_nation") === "NATION_19" &&
          col("cust_nation") === "NATION_18"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(count(lit(1)).as("n_items"),
        round(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(dec)).cast("double"), 4).as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** q202 — MERGEABLE-MOMENTS SHARD ALGEBRA. Events are hash-split
    * into 8 shards; each shard's state is (n, Σx, Σx²) with the sums
    * in exact decimal. The shard states merge RELATIONALLY (a 8-row
    * sum) and the merged mean/variance are emitted NEXT TO the
    * direct single-pass computation — hash equality proves
    * Σ_shard state(shard) = state(all) exactly, the associativity
    * that makes distributed profiling correct at any partitioning
    * (the X73/X75 register algebra applied to moments).
    *
    * Scale: one pass builds all shard states (map-side combinable);
    * the merge is arithmetic on 8 rows. Variance = S2/n − (S1/n)²
    * from the SAME decimal sums on both paths, so the equality is
    * structural, not numerical luck.
    */
  def q202(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d).select(col("value"),
      graft.functions.Text.md5Long(col("event_id").cast("string"))
        .mod(8).as("shard"))
    val shards = e.groupBy(col("shard"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(dec)).as("s1"),
        sum((col("value") * col("value")).cast(dec)).as("s2"))
    val merged = shards.agg(sum(col("n")).as("n"),
        sum(col("s1")).as("s1"), sum(col("s2")).as("s2"))
      .select(col("n"),
        round(col("s1").cast("double") / col("n").cast("double"), 4)
          .as("mean_merged"),
        round(col("s2").cast("double") / col("n").cast("double") -
          (col("s1").cast("double") / col("n").cast("double")) *
          (col("s1").cast("double") / col("n").cast("double")), 4)
          .as("var_merged"))
    val direct = e.agg(count(lit(1)).as("n_d"),
        sum(col("value").cast(dec)).as("d1"),
        sum((col("value") * col("value")).cast(dec)).as("d2"))
      .select(round(col("d1").cast("double") / col("n_d").cast("double"),
          4).as("mean_direct"),
        round(col("d2").cast("double") / col("n_d").cast("double") -
          (col("d1").cast("double") / col("n_d").cast("double")) *
          (col("d1").cast("double") / col("n_d").cast("double")), 4)
          .as("var_direct"))
    merged.crossJoin(broadcast(direct))
      .select(col("n"), col("mean_merged"), col("var_merged"),
        col("mean_direct"), col("var_direct"),
        (col("mean_merged") === col("mean_direct") &&
          col("var_merged") === col("var_direct")).as("identical"))
  }

  /** q203 — ANOMALY-DETECTOR CONSENSUS. Three detectors vote on each
    * event value within its type: z-score (|x−µ| > 3σ, population
    * moments), MAD (|x−median| > 3·MAD, the q173 robust form) and
    * IQR fences (outside [q1−1.5·IQR, q3+1.5·IQR]). The report
    * counts per-detector flags and the 2-of-3 consensus — the
    * ensemble a monitoring pipeline pages on, since each detector
    * has a known failure mode (z on heavy tails, MAD on discrete
    * values, IQR on small groups).
    *
    * Scale: per-type stats are ONE grouped aggregate riding a
    * broadcast back onto the row pass; every output is an integer
    * count, so the query is exact cross-engine with no rounding
    * convention at all.
    */
  def q203(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d).select(col("event_type"), col("value"))
    val stats = e.groupBy(col("event_type")).agg(
      (sum(col("value").cast(dec)).cast("double") /
        count(lit(1)).cast("double")).as("mu"),
      sqrt(sum((col("value") * col("value")).cast(dec)).cast("double") /
        count(lit(1)).cast("double") -
        (sum(col("value").cast(dec)).cast("double") /
          count(lit(1)).cast("double")) *
        (sum(col("value").cast(dec)).cast("double") /
          count(lit(1)).cast("double"))).as("sigma"),
      percentile(col("value"), lit(0.5)).as("med"),
      percentile(col("value"), lit(0.25)).as("q1"),
      percentile(col("value"), lit(0.75)).as("q3"))
    val mad = e.join(broadcast(stats.select(col("event_type"), col("med"))),
        Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(percentile(abs(col("value") - col("med")), lit(0.5)).as("mad"))
    e.join(broadcast(stats), Seq("event_type"))
      .join(broadcast(mad), Seq("event_type"))
      .withColumn("f_z", abs(col("value") - col("mu")) >
        lit(3.0) * col("sigma"))
      .withColumn("f_mad", abs(col("value") - col("med")) >
        lit(3.0) * col("mad"))
      .withColumn("f_iqr",
        col("value") < col("q1") - lit(1.5) * (col("q3") - col("q1")) ||
        col("value") > col("q3") + lit(1.5) * (col("q3") - col("q1")))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("f_z"), 1L).otherwise(0L)).as("n_z"),
        sum(when(col("f_mad"), 1L).otherwise(0L)).as("n_mad"),
        sum(when(col("f_iqr"), 1L).otherwise(0L)).as("n_iqr"),
        sum(when(
          (when(col("f_z"), 1).otherwise(0) +
            when(col("f_mad"), 1).otherwise(0) +
            when(col("f_iqr"), 1).otherwise(0)) >= 2, 1L).otherwise(0L))
          .as("n_consensus2"))
      .orderBy(col("event_type"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q201_nation_pair_trade" -> (q201 _),
    "q202_moment_shard_merge" -> (q202 _),
    "q203_anomaly_consensus" -> (q203 _))
}

/** DuckDB mirrors of Queries30 — same join-then-filter shape, same
  * decimal moment sums, same detector thresholds (§7.4).
  */
object Oracle30 {

  val sql: Map[String, String] = Map(
    "q201_nation_pair_trade" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS INTEGER) AS l_year,
        |  count(*) AS n_items,
        |  round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
        |    AS DECIMAL(38,18))) AS DOUBLE), 4) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE (n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
        |   OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18')
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    "q202_moment_shard_merge" ->
      """WITH e AS (SELECT value,
        |    CAST('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) % 8 AS shard
        |  FROM events),
        |sh AS (SELECT shard, count(*) AS n,
        |    sum(CAST(value AS DECIMAL(38,18))) AS s1,
        |    sum(CAST(value * value AS DECIMAL(38,18))) AS s2
        |  FROM e GROUP BY shard),
        |m AS (SELECT CAST(sum(n) AS BIGINT) AS n,
        |    sum(s1) AS s1, sum(s2) AS s2 FROM sh),
        |mm AS (SELECT n,
        |    round(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE), 4)
        |      AS mean_merged,
        |    round(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
        |      - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
        |        * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)), 4)
        |      AS var_merged
        |  FROM m),
        |dd AS (SELECT count(*) AS n_d,
        |    sum(CAST(value AS DECIMAL(38,18))) AS d1,
        |    sum(CAST(value * value AS DECIMAL(38,18))) AS d2
        |  FROM e),
        |dm AS (SELECT
        |    round(CAST(d1 AS DOUBLE) / CAST(n_d AS DOUBLE), 4)
        |      AS mean_direct,
        |    round(CAST(d2 AS DOUBLE) / CAST(n_d AS DOUBLE)
        |      - (CAST(d1 AS DOUBLE) / CAST(n_d AS DOUBLE))
        |        * (CAST(d1 AS DOUBLE) / CAST(n_d AS DOUBLE)), 4)
        |      AS var_direct
        |  FROM dd)
        |SELECT n, mean_merged, var_merged, mean_direct, var_direct,
        |  mean_merged = mean_direct AND var_merged = var_direct
        |    AS identical
        |FROM mm, dm""".stripMargin,

    "q203_anomaly_consensus" ->
      """WITH e AS (SELECT event_type, value FROM events),
        |st AS (SELECT event_type,
        |    CAST(sum(CAST(value AS DECIMAL(38,18))) AS DOUBLE)
        |      / CAST(count(*) AS DOUBLE) AS mu,
        |    sqrt(CAST(sum(CAST(value * value AS DECIMAL(38,18)))
        |        AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |      - (CAST(sum(CAST(value AS DECIMAL(38,18))) AS DOUBLE)
        |          / CAST(count(*) AS DOUBLE))
        |        * (CAST(sum(CAST(value AS DECIMAL(38,18))) AS DOUBLE)
        |          / CAST(count(*) AS DOUBLE))) AS sigma,
        |    quantile_cont(value, 0.5) AS med,
        |    quantile_cont(value, 0.25) AS q1,
        |    quantile_cont(value, 0.75) AS q3
        |  FROM e GROUP BY event_type),
        |md AS (SELECT e.event_type,
        |    quantile_cont(abs(e.value - st.med), 0.5) AS mad
        |  FROM e JOIN st ON e.event_type = st.event_type
        |  GROUP BY e.event_type),
        |f AS (SELECT e.event_type,
        |    abs(e.value - st.mu) > 3.0 * st.sigma AS f_z,
        |    abs(e.value - st.med) > 3.0 * md.mad AS f_mad,
        |    e.value < st.q1 - 1.5 * (st.q3 - st.q1)
        |      OR e.value > st.q3 + 1.5 * (st.q3 - st.q1) AS f_iqr
        |  FROM e JOIN st ON e.event_type = st.event_type
        |  JOIN md ON e.event_type = md.event_type)
        |SELECT event_type, count(*) AS n,
        |  CAST(sum(CASE WHEN f_z THEN 1 ELSE 0 END) AS BIGINT) AS n_z,
        |  CAST(sum(CASE WHEN f_mad THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_mad,
        |  CAST(sum(CASE WHEN f_iqr THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_iqr,
        |  CAST(sum(CASE WHEN (CASE WHEN f_z THEN 1 ELSE 0 END)
        |    + (CASE WHEN f_mad THEN 1 ELSE 0 END)
        |    + (CASE WHEN f_iqr THEN 1 ELSE 0 END) >= 2
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_consensus2
        |FROM f GROUP BY event_type ORDER BY event_type""".stripMargin)
}
