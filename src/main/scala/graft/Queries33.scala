package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 batch 17: embedding-space label evaluation and the SQL
  * front door.
  *
  *  - q208 evaluates a 5-NN majority-vote classifier on the labeled
  *    embeddings over the q199 probe panel — the vector-space twin
  *    of q187's confusion-matrix eval.
  *  - q209 executes ONE shared ANSI SQL text through `spark.sql` —
  *    and the oracle IS the same string run by DuckDB. Beyond the
  *    DataFrame surface, this pins the SQL-API front door: a user
  *    porting warehouse SQL runs it verbatim.
  */
object Queries33 {
  import Tables._

  /** q208 — 5-NN LABEL EVALUATION. For the vec_id % 25 probe panel:
    * exact top-5 cosine neighbors (leave-self-out), majority label
    * (ties → smaller label), scored against the probe's own label.
    * The embedding-space health check: if 5-NN can't recover the
    * label, the space won't cluster, search, or dedup well either.
    *
    * Scale: the panel rides a BROADCAST into the corpus scan; the
    * exact neighbor side is |panel|×|corpus| by definition (the
    * declared brute-force anchor, as in q199/q29/q146 — the
    * production path would swap in the IVF/LSH candidates from the
    * same module). Ranks are row_number over bit-identical cosine
    * doubles, so the neighbor sets match cross-engine.
    */
  def q208(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
    val probes = e.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("pid"), col("embedding").as("pemb"),
        col("label").as("own_label"))
    val wRank = Window.partitionBy(col("pid"))
      .orderBy(col("cos").desc, col("vec_id"))
    val top5 = e.join(broadcast(probes), col("vec_id") =!= col("pid"))
      .withColumn("cos",
        graft.functions.Vectors.cosine(col("embedding"), col("pemb")))
      .withColumn("rk", row_number().over(wRank))
      .filter(col("rk") <= 5)
    val wVote = Window.partitionBy(col("pid"))
      .orderBy(col("votes").desc, col("label"))
    top5.groupBy(col("pid"), col("own_label"), col("label"))
      .agg(count(lit(1)).as("votes"))
      .withColumn("vrk", row_number().over(wVote))
      .filter(col("vrk") === 1)
      .agg(count(lit(1)).as("n_probes"),
        sum(when(col("label") === col("own_label"), 1L).otherwise(0L))
          .as("n_correct"),
        round(sum(when(col("label") === col("own_label"), 1L)
          .otherwise(0L)).cast("double") / count(lit(1)).cast("double"),
          4).as("knn_accuracy"))
  }

  /** The ONE SQL text q209 runs on BOTH engines — ANSI subset only
    * (CTEs, window, date_trunc, DECIMAL sums, round), no
    * engine-specific functions. Monthly revenue by order priority
    * with the top-2 priorities per month by revenue.
    */
  private[graft] val sharedSql: String =
    """WITH mo AS (
      |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
      |    o_orderpriority AS prio, count(*) AS n_orders,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
      |      AS rev
      |  FROM orders GROUP BY 1, 2),
      |r AS (
      |  SELECT month, prio, n_orders, rev,
      |    row_number() OVER (PARTITION BY month
      |      ORDER BY rev DESC, prio) AS rk
      |  FROM mo)
      |SELECT month, prio, n_orders, round(rev, 4) AS revenue, rk
      |FROM r WHERE rk <= 2 ORDER BY month, rk""".stripMargin

  /** q209 — SQL FRONT DOOR. The shared ANSI text above executed via
    * `spark.sql` over a registered view; the oracle is the SAME
    * string handed to DuckDB — one source of truth, zero
    * translation. Proves the engine's SQL surface (parser → Catalyst
    * → same physical plans as the DataFrame API) agrees with an
    * independent engine on identical text.
    *
    * Scale: the plan is what Catalyst makes of it — one partial+final
    * aggregate on (month, prio), a rank window over ≤|priorities|
    * rows per month partition. Same shape the DataFrame twin gets.
    */
  def q209(s: SparkSession, d: String): DataFrame = {
    orders(s, d).createOrReplaceTempView("orders")
    s.sql(sharedSql)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q208_knn_label_eval" -> (q208 _),
    "q209_sql_frontdoor" -> (q209 _))
}

/** DuckDB mirrors of Queries33 — q209's oracle IS Queries33.sharedSql
  * verbatim (the whole point); q208 splices the shared cosine
  * formula.
  */
object Oracle33 {
  import OracleExt.cosine

  val sql: Map[String, String] = Map(
    "q208_knn_label_eval" ->
      s"""WITH probes AS (SELECT vec_id AS pid, embedding AS pemb,
         |    label AS own_label
         |  FROM embeddings WHERE vec_id % 25 = 0),
         |t5 AS (SELECT p.pid, p.own_label, e.label,
         |    row_number() OVER (PARTITION BY p.pid
         |      ORDER BY ${cosine("e.embedding", "p.pemb")} DESC,
         |        e.vec_id) AS rk
         |  FROM embeddings e JOIN probes p ON e.vec_id <> p.pid),
         |votes AS (SELECT pid, own_label, label, count(*) AS votes
         |  FROM t5 WHERE rk <= 5 GROUP BY pid, own_label, label),
         |win AS (SELECT *,
         |    row_number() OVER (PARTITION BY pid
         |      ORDER BY votes DESC, label) AS vrk
         |  FROM votes)
         |SELECT count(*) AS n_probes,
         |  CAST(sum(CASE WHEN label = own_label THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_correct,
         |  round(CAST(sum(CASE WHEN label = own_label THEN 1 ELSE 0
         |    END) AS DOUBLE) / count(*), 4) AS knn_accuracy
         |FROM win WHERE vrk = 1""".stripMargin,

    "q209_sql_frontdoor" -> Queries33.sharedSql)
}
