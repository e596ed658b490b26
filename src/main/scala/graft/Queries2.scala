package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Signal
import graft.operators.AsOf

/** Round-2 relational extensions (SURVEY.md §2.5/§2.6 widened): as-of
  * join surfaced as an oracled query (DuckDB ASOF JOIN), broadcast
  * interval/range join, correlated + EXISTS subqueries through the
  * spark.sql surface (Catalyst decorrelation), pivot/unpivot, and the
  * remaining analytic window functions.
  *
  * Determinism conventions as everywhere (SURVEY.md §7.4): ORDER BY
  * unique keys, 4-dp rounding of derived floats, decimal sums for
  * order-independent aggregation.
  */
object Queries2 {
  import Tables._

  /** J5 as an oracled query: for every purchase event, the most recent
    * click at-or-before it by the same user (operators.AsOf — tag +
    * union + one window ⇒ ONE shuffle on user_id; no range explosion).
    * Right side pre-deduped on (user_id, ts) per the AsOf tie contract.
    * DuckDB side is a native ASOF LEFT JOIN — identical semantics.
    */
  def q55(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
    val clicks = e.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("value")).as("click_value"))
    AsOf.join(purchases, clicks, "user_id", "ts", "ts", Seq("click_value"))
      .select(col("user_id"), col("event_id"), col("ts"), col("value"),
        col("matched_ts"), col("click_value"))
      .orderBy(col("event_id"))
  }

  /** Interval/range join: facts against a small interval dimension.
    * The scale shape — the interval table broadcasts (inner BNLJ,
    * build = tiny side) and the fact side streams through unshuffled;
    * the left-completion join afterwards touches only |intervals|
    * rows. Never a fact×fact inequality join.
    */
  def q56(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val years = (1995 to 2000).map(y => (y.toString, s"$y-01-01", s"${y + 1}-01-01"))
      .toDF("yname", "ystart_s", "yend_s")
      .select(col("yname"), to_timestamp(col("ystart_s")).as("ystart"),
        to_timestamp(col("yend_s")).as("yend"))
    val agg = orders(s, d)
      .join(broadcast(years),
        col("o_orderdate") >= col("ystart") && col("o_orderdate") < col("yend"))
      .groupBy(col("yname"))
      .agg(count(col("o_orderkey")).as("n"),
        Signal.exactSumD(col("o_totalprice")).as("total"))
    years.select(col("yname")).join(agg, Seq("yname"), "left")
      .select(col("yname"), coalesce(col("n"), lit(0L)).as("n"), col("total"))
      .orderBy(col("yname"))
  }

  /** Correlated scalar subqueries via the spark.sql surface: customers
    * above their nation's average balance. Catalyst decorrelates both
    * subqueries into aggregate+join — no per-row re-execution. Exact
    * decimal arithmetic (balance × count > sum) so both engines decide
    * boundary rows identically.
    */
  def q57(s: SparkSession, d: String): DataFrame = {
    customer(s, d).createOrReplaceTempView("customer_v57")
    s.sql(
      """SELECT c_custkey, c_name, c_acctbal FROM customer_v57 c
        |WHERE CAST(c_acctbal AS DECIMAL(18,6)) *
        |    (SELECT count(*) FROM customer_v57 c2
        |     WHERE c2.c_nationkey = c.c_nationkey) >
        |  (SELECT sum(CAST(c3.c_acctbal AS DECIMAL(18,6))) FROM customer_v57 c3
        |   WHERE c3.c_nationkey = c.c_nationkey)
        |ORDER BY c_custkey""".stripMargin)
  }

  /** EXISTS subquery (TPC-H Q4 shape): orders having a discounted
    * lineitem. Plans as a left-semi join — no payload duplication.
    */
  def q58(s: SparkSession, d: String): DataFrame = {
    orders(s, d).createOrReplaceTempView("orders_v58")
    lineitem(s, d).createOrReplaceTempView("lineitem_v58")
    s.sql(
      """SELECT o_orderstatus, count(*) AS n FROM orders_v58 o
        |WHERE EXISTS (SELECT 1 FROM lineitem_v58 l
        |  WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.05)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
  }

  /** Pivot with an EXPLICIT value list (never the collect-distinct
    * form — at 100 TB the value scan would be a full extra pass).
    * One partial+final hash aggregate; missing cells coalesced to 0.
    */
  def q59(s: SparkSession, d: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    events(s, d)
      .groupBy(col("user_id"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .select(col("user_id") +:
        types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
      .orderBy(col("user_id"))
  }

  /** Unpivot/melt (wide → long) + re-aggregate: per-metric mean over
    * lineitem measures. Unpivot is a narrow generator (4 rows out per
    * row in, no shuffle); the aggregate shuffles 4 keys.
    */
  def q60(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax")),
        "metric", "v")
      .groupBy(col("metric"))
      .agg(
        round(Signal.exactSum(col("v")).cast("double") / count(lit(1)), 4)
          .as("avg_value"),
        count(lit(1)).as("n"))
      .orderBy(col("metric"))

  /** W3/W4 completion: ntile / percent_rank / cume_dist / lead /
    * first_value in one partition-local window pass.
    */
  def q61(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("value").desc, col("event_id"))
    events(s, d)
      .select(col("event_id"),
        ntile(4).over(w).as("nt"),
        round(percent_rank().over(w), 4).as("pr"),
        round(cume_dist().over(w), 4).as("cd"),
        lead(col("event_id"), 1).over(w).as("next_id"),
        first(col("event_id")).over(w).as("first_id"))
      .orderBy(col("event_id"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q55_asof_join" -> (q55 _),
    "q56_range_join" -> (q56 _),
    "q57_scalar_subquery" -> (q57 _),
    "q58_exists_subquery" -> (q58 _),
    "q59_pivot" -> (q59 _),
    "q60_unpivot" -> (q60 _),
    "q61_window_extras" -> (q61 _)
  )
}

/** DuckDB oracles for Queries2. */
object Oracle2 {
  val sql: Map[String, String] = Map(
    "q55_asof_join" ->
      """SELECT p.user_id, p.event_id, p.ts, p.value,
        |  c.ts AS matched_ts, c.click_value
        |FROM (SELECT user_id, event_id, ts, value FROM events
        |      WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT user_id, ts, max(value) AS click_value
        |      FROM events WHERE event_type = 'click'
        |      GROUP BY user_id, ts) c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin,

    "q56_range_join" ->
      """WITH y(yname, ystart, yend) AS (VALUES
        |  ('1995', TIMESTAMP '1995-01-01', TIMESTAMP '1996-01-01'),
        |  ('1996', TIMESTAMP '1996-01-01', TIMESTAMP '1997-01-01'),
        |  ('1997', TIMESTAMP '1997-01-01', TIMESTAMP '1998-01-01'),
        |  ('1998', TIMESTAMP '1998-01-01', TIMESTAMP '1999-01-01'),
        |  ('1999', TIMESTAMP '1999-01-01', TIMESTAMP '2000-01-01'),
        |  ('2000', TIMESTAMP '2000-01-01', TIMESTAMP '2001-01-01'))
        |SELECT y.yname, count(o.o_orderkey) AS n,
        |  round(CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 4) AS total
        |FROM y LEFT JOIN orders o
        |  ON o.o_orderdate >= y.ystart AND o.o_orderdate < y.yend
        |GROUP BY y.yname ORDER BY y.yname""".stripMargin,

    "q57_scalar_subquery" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer c
        |WHERE CAST(c_acctbal AS DECIMAL(18,6)) *
        |    (SELECT count(*) FROM customer c2
        |     WHERE c2.c_nationkey = c.c_nationkey) >
        |  (SELECT sum(CAST(c3.c_acctbal AS DECIMAL(18,6))) FROM customer c3
        |   WHERE c3.c_nationkey = c.c_nationkey)
        |ORDER BY c_custkey""".stripMargin,

    "q58_exists_subquery" ->
      """SELECT o_orderstatus, count(*) AS n FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.05)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q59_pivot" ->
      """SELECT user_id,
        |  count(*) FILTER (WHERE event_type='click') AS click,
        |  count(*) FILTER (WHERE event_type='error') AS error,
        |  count(*) FILTER (WHERE event_type='purchase') AS purchase,
        |  count(*) FILTER (WHERE event_type='signup') AS signup,
        |  count(*) FILTER (WHERE event_type='view') AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q60_unpivot" ->
      """SELECT metric,
        |  round(CAST(sum(CAST(v AS DECIMAL(18,6))) AS DOUBLE) / count(*), 4) AS avg_value,
        |  count(*) AS n
        |FROM (
        |  SELECT 'l_quantity' AS metric, l_quantity AS v FROM lineitem
        |  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
        |  UNION ALL SELECT 'l_tax', l_tax FROM lineitem)
        |GROUP BY metric ORDER BY metric""".stripMargin,

    "q61_window_extras" ->
      """SELECT event_id,
        |  ntile(4) OVER w AS nt,
        |  round(percent_rank() OVER w, 4) AS pr,
        |  round(cume_dist() OVER w, 4) AS cd,
        |  lead(event_id) OVER w AS next_id,
        |  first_value(event_id) OVER w AS first_id
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY value DESC, event_id)
        |ORDER BY event_id""".stripMargin
  )
}
