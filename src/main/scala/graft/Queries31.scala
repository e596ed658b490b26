package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-7 batch 15: versioned-snapshot time travel and per-key rate
  * capping.
  *
  *  - q204 is lakehouse time travel in its portable form: two
  *    versioned snapshot directories; reading version 1 AFTER
  *    version 2 was written returns exactly the original content —
  *    proved by checksums the oracle recomputes from the derivation
  *    rules, never from the files.
  *  - q205 is the per-key ingest cap: at most K events per user kept
  *    by deterministic md5 priority — the hot-key bound applied as a
  *    standalone declared operator (the q143/q157 move for raw
  *    ingest).
  */
object Queries31 {
  import Tables._

  // q204's scratch dir must be unique PER INVOCATION, not just per
  // process: two concurrent q204 runs in one JVM (parallel suites,
  // the AQE twin) would otherwise race on the v=1/v=2 overwrites
  // between v2's write and the post-write v1 read, breaking the very
  // isolation the query audits.
  private val invocation = new java.util.concurrent.atomic.AtomicLong(0L)

  /** q204 — VERSIONED-SNAPSHOT TIME TRAVEL. Snapshot v1 is the base
    * corpus (doc_id, lang, content fp); snapshot v2 applies the
    * q185 crawl-generation derivation (drop %17, revise %13, add
    * %29). Both land as versioned directories; the query then reads
    * EACH VERSION's directory and audits (rows, order-invariant
    * content checksum, char volume). The oracle computes the same
    * audits from the derivation rules over the raw table — hash
    * parity proves reading v=1 after v=2's commit returns the
    * original snapshot bit-for-bit (version isolation, the
    * time-travel contract), not some merged or clobbered state.
    *
    * Scale: snapshots write once and are immutable (the lakehouse
    * commit model); the audit is one aggregate per version over a
    * narrow projection. At 100 TB versions share unchanged files via
    * a manifest instead of full copies — the read contract audited
    * here is identical.
    */
  def q204(s: SparkSession, d: String): DataFrame = {
    val dir = Tables.scratchDir("timetravel", d) +
      "_i" + invocation.incrementAndGet()
    val base = documents(s, d)
      .select(col("doc_id"), col("lang"), col("text"), col("n_chars"))
    val mods = base.filter(col("doc_id") % 17 =!= 0)
      .select(col("doc_id"), col("lang"),
        md5(when(col("doc_id") % 13 === 0,
          concat(lit("rev2 "), col("text"))).otherwise(col("text")))
          .as("fp"),
        (col("n_chars") + when(col("doc_id") % 13 === 0, lit(5L))
          .otherwise(lit(0L))).as("n_chars"))
    val adds = base.filter(col("doc_id") % 29 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("lang"),
        md5(col("text")).as("fp"), col("n_chars"))
    // The two version commits are INDEPENDENT jobs (distinct v=k
    // dirs, each derived from the base corpus alone) — overlapped
    // per guide §2.6, the q215 convention, instead of paying two
    // sequential write latencies. The time-travel contract only
    // constrains the READS: both audits below run strictly after
    // BOTH commits complete, so v1 is still read after v2's write.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    Await.result(Future.sequence(Seq(
      Future {
        base.select(col("doc_id"), col("lang"),
            md5(col("text")).as("fp"), col("n_chars"))
          .write.mode("overwrite").parquet(s"$dir/v=1")
      },
      Future {
        mods.unionByName(adds)
          .write.mode("overwrite").parquet(s"$dir/v=2")
      })), Duration.Inf)
    def audit(version: Int): DataFrame =
      s.read.parquet(s"$dir/v=$version")
        .agg(lit(version).as("version"), count(lit(1)).as("n_docs"),
          sum(graft.functions.Text.md5Long(concat_ws("|",
            col("doc_id"), col("fp"))).cast(DecimalType(38, 0)))
            .cast("string").as("content_sum"),
          sum(col("n_chars")).as("n_chars"))
    // v1 is read AFTER v2's write — the isolation under audit
    audit(1).unionByName(audit(2)).orderBy(col("version"))
  }

  /** q205 — PER-KEY RATE CAP. At most K=30 events kept per user,
    * chosen by deterministic md5 priority (survives restarts and
    * re-shards, unlike "first K seen"); the report shows kept /
    * dropped per event type. This is the hot-key bound as a
    * standalone ingest operator — the q143/q157 cap discipline
    * applied BEFORE any downstream shuffle can melt on a runaway
    * key.
    *
    * Scale: one rank window per user partition over a narrow
    * projection, then a |types|-row aggregate. The cap turns any
    * per-key volume distribution into a bounded one — downstream
    * joins and windows inherit the bound.
    */
  def q205(s: SparkSession, d: String): DataFrame = {
    // the keep-side logic is Skew.rateCap (the standalone operator,
    // ScaleOpsSpec-proved on a planted hot key); the REPORT needs the
    // dropped rows too, so it keeps the rank in-line — one window
    // pass, no join back
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("prio"), col("event_id"))
    events(s, d)
      .select(col("user_id"), col("event_type"), col("event_id"),
        graft.functions.Text.md5Long(col("event_id").cast("string"))
          .as("prio"))
      .withColumn("rk", row_number().over(w))
      .withColumn("kept", col("rk") <= 30)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("kept"), 0L).otherwise(1L)).as("n_dropped"),
        round(sum(when(col("kept"), 1L).otherwise(0L)).cast("double") /
          count(lit(1)).cast("double"), 4).as("kept_share"))
      .orderBy(col("event_type"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q204_time_travel" -> (q204 _),
    "q205_rate_cap" -> (q205 _))
}

/** DuckDB mirrors of Queries31 — q204's audits are recomputed from
  * the derivation rules over the raw table (never from the snapshot
  * files), so hash parity proves the files carry exactly the
  * derived content.
  */
object Oracle31 {

  private def md5l(e: String): String =
    s"CAST('0x' || substring(md5($e), 1, 15) AS BIGINT)"

  val sql: Map[String, String] = Map(
    "q204_time_travel" -> {
      s"""WITH v1 AS (SELECT doc_id, md5(text) AS fp, n_chars
         |  FROM documents),
         |v2 AS (
         |  SELECT doc_id, md5(CASE WHEN doc_id % 13 = 0
         |      THEN 'rev2 ' || text ELSE text END) AS fp,
         |    n_chars + CASE WHEN doc_id % 13 = 0 THEN 5 ELSE 0 END
         |      AS n_chars
         |  FROM documents WHERE doc_id % 17 <> 0
         |  UNION ALL
         |  SELECT doc_id + 1000000 AS doc_id, md5(text) AS fp, n_chars
         |  FROM documents WHERE doc_id % 29 = 0),
         |a1 AS (SELECT 1 AS version, count(*) AS n_docs,
         |    CAST(sum(CAST(${md5l("doc_id || '|' || fp")}
         |      AS DECIMAL(38,0))) AS VARCHAR) AS content_sum,
         |    CAST(sum(n_chars) AS BIGINT) AS n_chars
         |  FROM v1),
         |a2 AS (SELECT 2 AS version, count(*) AS n_docs,
         |    CAST(sum(CAST(${md5l("doc_id || '|' || fp")}
         |      AS DECIMAL(38,0))) AS VARCHAR) AS content_sum,
         |    CAST(sum(n_chars) AS BIGINT) AS n_chars
         |  FROM v2)
         |SELECT * FROM a1 UNION ALL SELECT * FROM a2
         |ORDER BY version""".stripMargin
    },

    "q205_rate_cap" ->
      s"""WITH p AS (SELECT user_id, event_type, event_id,
         |    ${md5l("CAST(event_id AS VARCHAR)")} AS prio
         |  FROM events),
         |r AS (SELECT *,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY prio, event_id) AS rk
         |  FROM p)
         |SELECT event_type, count(*) AS n_total,
         |  CAST(sum(CASE WHEN rk <= 30 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_kept,
         |  CAST(sum(CASE WHEN rk <= 30 THEN 0 ELSE 1 END) AS BIGINT)
         |    AS n_dropped,
         |  round(CAST(sum(CASE WHEN rk <= 30 THEN 1 ELSE 0 END)
         |    AS DOUBLE) / count(*), 4) AS kept_share
         |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin)
}
