package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-7 batch 9: privacy audit, snapshot diffing, the classic
  * local-supplier revenue rollup, and classifier evaluation.
  *
  *  - q184 is a k-anonymity audit over quasi-identifier cells — the
  *    privacy gate a curation pipeline runs before releasing
  *    per-group statistics.
  *  - q185 is a snapshot DIFF report (added/removed/changed rows
  *    between two crawl generations) — the audit twin of q128's CDC
  *    merge, which keeps latest state but never reports what moved.
  *  - q186 is the TPC-H Q5 shape: a six-table join with the
  *    local-supplier equality constraint — the canonical test of join
  *    ordering + broadcast choice on a star-with-two-facts topology.
  *  - q187 evaluates the q32 langid heuristic against the labeled
  *    lang column as a confusion matrix — the eval loop any
  *    classifier-driven curation step needs.
  */
object Queries25 {
  import Tables._

  private val dec = DecimalType(38, 18)

  /** q184 — K-ANONYMITY AUDIT. Quasi-identifier cells (lang, source,
    * 500-char length bucket) with fewer than k=5 documents — each is
    * a re-identification risk if per-cell stats are released. NULLs
    * are legitimate QI values (a NULL lang still narrows a join
    * attack) so they group like any other value. The risky-cell rows
    * carry the global exposure (risk_share) q178-style.
    *
    * Scale: one partial+final aggregate on the QI triple; the risky
    * filter drops everything released-safe before output; totals ride
    * a 1-row broadcast. Nothing per-document survives the aggregate.
    */
  def q184(s: SparkSession, d: String): DataFrame = {
    val cells = documents(s, d)
      .select(col("lang"), col("source"),
        expr("n_chars div 500").as("len_bucket"))
      .groupBy(col("lang"), col("source"), col("len_bucket"))
      .agg(count(lit(1)).as("group_n"))
    val tot = cells.agg(sum(col("group_n")).as("n_docs"),
      sum(when(col("group_n") < 5, col("group_n")).otherwise(lit(0L)))
        .as("docs_at_risk"))
    cells.filter(col("group_n") < 5)
      .crossJoin(broadcast(tot))
      .select(col("lang"), col("source"), col("len_bucket"),
        col("group_n"), col("docs_at_risk"),
        round(col("docs_at_risk").cast("double") /
          col("n_docs").cast("double"), 4).as("risk_share"))
      .orderBy(col("lang").asc_nulls_last, col("source"),
        col("len_bucket").asc_nulls_last)
  }

  /** q185 — SNAPSHOT DIFF AUDIT. Two crawl generations diffed by
    * content hash: generation B is derived deterministically from the
    * base (the q128 CDC-construction convention — drop %17 keys,
    * revise %13 texts, add %29 new keys) and the report counts
    * added / removed / changed / unchanged rows with their char
    * volumes. The merge (q128) keeps latest state; THIS is the
    * `table_changes` readout a lakehouse emits per commit.
    *
    * Scale: the diff is a single full-outer equi-join on the key
    * carrying (md5, n_chars) — 16-byte fingerprints shuffle, text
    * never does; the report is a 4-row aggregate of the join.
    */
  def q185(s: SparkSession, d: String): DataFrame = {
    val base = documents(s, d)
      .select(col("doc_id"), md5(col("text")).as("fp_a"),
        col("n_chars").as("ch_a"))
    val mods = documents(s, d)
      .filter(col("doc_id") % 17 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 13 === 0, concat(lit("rev2 "), col("text")))
          .otherwise(col("text")).as("text2"),
        (col("n_chars") + when(col("doc_id") % 13 === 0, lit(5L))
          .otherwise(lit(0L))).as("ch_b"))
    val adds = documents(s, d).filter(col("doc_id") % 29 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        col("text").as("text2"), col("n_chars").as("ch_b"))
    val next = mods.unionByName(adds)
      .select(col("doc_id"), md5(col("text2")).as("fp_b"), col("ch_b"))
    base.join(next, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("fp_a").isNull, lit("added"))
          .when(col("fp_b").isNull, lit("removed"))
          .when(col("fp_a") =!= col("fp_b"), lit("changed"))
          .otherwise(lit("unchanged")))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("ch_a"), lit(0L))).as("chars_before"),
        sum(coalesce(col("ch_b"), lit(0L))).as("chars_after"))
      .orderBy(col("status"))
  }

  /** q186 — LOCAL-SUPPLIER REVENUE (the TPC-H Q5 shape). Revenue by
    * nation for ASIA-region customers in 1996, counting only line
    * items shipped by a supplier in the CUSTOMER's own nation — the
    * six-table join whose local-supplier equality is the classic join
    * order / broadcast-choice stressor. Revenue sums
    * price·(1−discount) through DECIMAL(38,18) (§7.4) so the rollup
    * is partition-order-free.
    *
    * Scale: region, nation and supplier are broadcast dims (supplier
    * is 10^-4 of lineitem); orders⋈lineitem is the one big SMJ, on
    * the natural o/l_orderkey, with the year filter expressed as a
    * RANGE (not `year(col)=...`, which wraps the column and defeats
    * parquet row-group pruning — PlanSpec asserts the pushdown); the
    * s_nationkey = c_nationkey constraint applies at the
    * already-joined row (no extra shuffle). AQE would re-plan the
    * post-filter orders side to broadcast at small SFs — both shapes
    * are correct; the joins stay equi throughout.
    */
  def q186(s: SparkSession, d: String): DataFrame =
    broadcast(region(s, d).filter(col("r_name") === "ASIA"))
      .join(broadcast(nation(s, d)),
        col("r_regionkey") === col("n_regionkey"))
      .join(customer(s, d), col("n_nationkey") === col("c_nationkey"))
      .join(orders(s, d).filter(
          col("o_orderdate") >= to_timestamp_ntz(lit("1996-01-01")) &&
          col("o_orderdate") < to_timestamp_ntz(lit("1997-01-01"))),
        col("c_custkey") === col("o_custkey"))
      .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(supplier(s, d)),
        col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_items"),
        round(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(dec)).cast("double"), 4).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))

  /** q187 — LANGID CONFUSION MATRIX. The q32 stopword-argmax
    * predictor evaluated against the labeled lang column: per
    * (true, predicted) cell counts, per-true-lang recall, and the
    * global micro-accuracy on every row — the eval report any
    * heuristic-classifier curation gate ships with.
    *
    * Scale: prediction is per-row scalar math on the scan; the
    * matrix is one partial+final aggregate bounded by |langs|²;
    * recall is a window over ≤|langs| rows per partition and
    * accuracy rides a 1-row broadcast.
    */
  def q187(s: SparkSession, d: String): DataFrame = {
    val preds = documents(s, d)
      .select(col("lang"), graft.functions.Text.langId(col("text"))
        .as("pred_lang"))
    val cm = preds.groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
    val acc = cm.agg((sum(when(col("lang") === col("pred_lang"), col("n"))
        .otherwise(lit(0L))).cast("double") /
      sum(col("n")).cast("double")).as("acc"))
    val byTrue = Window.partitionBy(col("lang"))
    cm.withColumn("recall",
        round(col("n").cast("double") /
          sum(col("n")).over(byTrue).cast("double"), 4))
      .crossJoin(broadcast(acc))
      .select(col("lang"), col("pred_lang"), col("n"), col("recall"),
        round(col("acc"), 4).as("micro_accuracy"))
      .orderBy(col("lang").asc_nulls_last, col("pred_lang"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q184_k_anonymity" -> (q184 _),
    "q185_snapshot_diff" -> (q185 _),
    "q186_local_revenue" -> (q186 _),
    "q187_langid_confusion" -> (q187 _))
}

/** DuckDB mirrors of Queries25 — same derivation rules, same decimal
  * sums, same rounding (§7.4). q187 splices OracleExt.langidPredCtes
  * so the predictor formula exists exactly once.
  */
object Oracle25 {

  val sql: Map[String, String] = Map(
    "q184_k_anonymity" ->
      """WITH cells AS (SELECT lang, source, n_chars // 500 AS len_bucket,
        |    count(*) AS group_n
        |  FROM documents GROUP BY lang, source, len_bucket),
        |tot AS (SELECT CAST(sum(group_n) AS BIGINT) AS n_docs,
        |    CAST(sum(CASE WHEN group_n < 5 THEN group_n ELSE 0 END)
        |      AS BIGINT) AS docs_at_risk
        |  FROM cells)
        |SELECT lang, source, len_bucket, group_n, tot.docs_at_risk,
        |  round(CAST(tot.docs_at_risk AS DOUBLE) /
        |    CAST(tot.n_docs AS DOUBLE), 4) AS risk_share
        |FROM cells, tot WHERE group_n < 5
        |ORDER BY lang, source, len_bucket""".stripMargin,

    "q185_snapshot_diff" ->
      """WITH base AS (SELECT doc_id, md5(text) AS fp_a,
        |    n_chars AS ch_a FROM documents),
        |nxt AS (
        |  SELECT doc_id, md5(CASE WHEN doc_id % 13 = 0
        |      THEN 'rev2 ' || text ELSE text END) AS fp_b,
        |    n_chars + CASE WHEN doc_id % 13 = 0 THEN 5 ELSE 0 END AS ch_b
        |  FROM documents WHERE doc_id % 17 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, md5(text) AS fp_b,
        |    n_chars AS ch_b
        |  FROM documents WHERE doc_id % 29 = 0),
        |d AS (SELECT coalesce(b.doc_id, n.doc_id) AS doc_id,
        |    b.fp_a, n.fp_b, b.ch_a, n.ch_b
        |  FROM base b FULL OUTER JOIN nxt n ON b.doc_id = n.doc_id)
        |SELECT CASE WHEN fp_a IS NULL THEN 'added'
        |    WHEN fp_b IS NULL THEN 'removed'
        |    WHEN fp_a <> fp_b THEN 'changed'
        |    ELSE 'unchanged' END AS status,
        |  count(*) AS n_docs,
        |  CAST(sum(coalesce(ch_a, 0)) AS BIGINT) AS chars_before,
        |  CAST(sum(coalesce(ch_b, 0)) AS BIGINT) AS chars_after
        |FROM d GROUP BY status ORDER BY status""".stripMargin,

    "q186_local_revenue" ->
      """SELECT n_name, count(*) AS n_items,
        |  round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
        |    AS DECIMAL(38,18))) AS DOUBLE), 4) AS revenue
        |FROM region
        |JOIN nation ON r_regionkey = n_regionkey
        |JOIN customer ON n_nationkey = c_nationkey
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |  AND s_nationkey = c_nationkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "q187_langid_confusion" ->
      s"""WITH ${OracleExt.langidPredCtes},
         |cm AS (SELECT d.lang, p.pred_lang, count(*) AS n
         |  FROM documents d JOIN pred p ON d.doc_id = p.doc_id
         |  GROUP BY d.lang, p.pred_lang),
         |acc AS (SELECT CAST(sum(CASE WHEN lang = pred_lang THEN n
         |      ELSE 0 END) AS DOUBLE) / CAST(sum(n) AS DOUBLE) AS acc
         |  FROM cm)
         |SELECT cm.lang, cm.pred_lang, cm.n,
         |  round(CAST(cm.n AS DOUBLE) /
         |    CAST(sum(cm.n) OVER (PARTITION BY cm.lang) AS DOUBLE), 4)
         |    AS recall,
         |  round(acc.acc, 4) AS micro_accuracy
         |FROM cm, acc ORDER BY cm.lang, cm.pred_lang""".stripMargin)
}
