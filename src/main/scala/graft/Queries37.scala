package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Snapshots

/** Round-8 batch 1: snapshot retention / VACUUM — the expiry half of
  * the lakehouse time-travel contract (q204 proved old versions stay
  * readable; q215 proves expiring them is surgical).
  */
object Queries37 {
  import Tables._

  // per-invocation scratch isolation, same reasoning as q204
  private val invocation = new java.util.concurrent.atomic.AtomicLong(0L)

  /** q215 — SNAPSHOT RETENTION / VACUUM AUDIT (X125). Four snapshot
    * versions land with commit days 1..4 (each a deterministic
    * filter+revision of the base corpus — Snapshots.versionDf, so the
    * oracle rebuilds every version from the raw table); retention
    * keeps commit days inside a 2-day horizon of the newest commit
    * (plus the latest unconditionally) → v3/v4 kept, v1/v2 expired.
    * VACUUM physically deletes the expired directories; the audit
    * then (a) REQUIRES the expired dirs to be gone, (b) re-reads the
    * kept versions from disk and checksums them — hash parity with
    * the oracle's derivation-rule rebuild proves VACUUM deleted
    * exactly the expired snapshots and corrupted nothing, while the
    * manifest's commit-time stats survive for the expired ones
    * (metadata outlives data).
    *
    * Scale: VACUUM is a |versions|-row metadata decision + bulk
    * deletes (no data read); the audit reads only surviving versions,
    * one narrow aggregate each — see Snapshots.scala.
    */
  def q215(s: SparkSession, d: String): DataFrame = {
    val dir = Tables.scratchDir("vacuum", d) +
      "_i" + invocation.incrementAndGet()
    val base = documents(s, d)
      .select(col("doc_id"), col("text"), col("n_chars"))
    // The four version commits are INDEPENDENT jobs (distinct v=k
    // dirs, each derived from the base corpus alone), so they run
    // concurrently from a small pool (guide §2.6 — overlap
    // independent jobs so one commit's task tail back-fills with the
    // next commit's tasks) instead of paying four sequential write
    // latencies. Future.sequence keeps the manifest log in version
    // order; determinism and every written byte are unchanged. The
    // same overlap is the right posture at 100 TB, where the four
    // commits would otherwise serialize four object-store round
    // trips.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val manifests = Await.result(
      Future.sequence((1 to 4).map(k =>
        Future(Snapshots.writeVersion(base, dir, k)))), Duration.Inf)
    val (kept, expired) = Snapshots.vacuum(dir, manifests, keepDays = 2)
    require(kept == Set(3, 4) && expired == Set(1, 2),
      s"retention rule drifted: kept=$kept expired=$expired")
    Snapshots.audit(s, dir, manifests, kept)
  }

  /** q216 — PRODUCT-QUANTIZATION ANN (X126; Ann.pqTopK). The declared
    * configuration reranks a shortlist covering the WHOLE corpus
    * (shortlist=100000 ≥ any sf here), which makes the result
    * PROVABLY equal to brute-force cosine top-k — the exact rerank
    * sees every vector no matter what the per-subspace KMeans
    * codebooks learned — so the brute-force SQL is a sound oracle
    * even though the PQ training isn't SQL-expressible. The at-scale
    * mode (shortlist ≪ corpus: scan m one-byte codes via the ADC
    * table, fetch originals only for the shortlist) is the SAME code
    * path; its recall-vs-shortlist ladder is measured in
    * AnnRecallSpec.
    */
  def q216(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
    val probe = e.filter(col("vec_id") === 11)
      .select(col("embedding").as("probe_emb"))
    graft.operators.Ann.pqTopK(e.filter(col("vec_id") =!= 11),
      "vec_id", "embedding", probe, k = 10, m = 4, ksub = 16,
      shortlist = 100000)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q215_vacuum_audit" -> (q215 _),
    "q216_pq_ann" -> (q216 _))
}

/** DuckDB mirror of Queries37 — every version is rebuilt from the
  * derivation rules over the raw table (drop %(13+k), revise %7==k),
  * never from the snapshot files; the retention rule (commit day >
  * max−2, latest always) reduces to version > 2 for commit days 1..4.
  */
object Oracle37 {

  private def md5l(e: String): String =
    s"CAST('0x' || substring(md5($e), 1, 15) AS BIGINT)"

  val sql: Map[String, String] = Map(
    "q215_vacuum_audit" -> {
      val fp = "CASE WHEN doc_id % 7 = v.version THEN md5('v' || v.version || ' ' || text) ELSE md5(text) END"
      s"""WITH v AS (SELECT CAST(unnest(range(1, 5)) AS INTEGER) AS version),
         |per AS (
         |  -- LEFT join + count(doc_id) + coalesce mirror the engine
         |  -- audit's kept-version left join (ADVICE r14): an EMPTY
         |  -- version surfaces as (n_docs=0, n_chars=0, NULL checksum)
         |  -- on both surfaces instead of diverging (no row here vs a
         |  -- zero row there). Unreachable on this fixture (versions
         |  -- are never empty) but the two SQLs now define the same
         |  -- function on the full domain.
         |  SELECT v.version, count(doc_id) AS n_docs,
         |    CAST(coalesce(sum(n_chars + CASE WHEN doc_id % 7 = v.version
         |      THEN v.version ELSE 0 END), 0) AS BIGINT) AS n_chars,
         |    CAST(sum(CAST(${md5l(s"doc_id || '|' || $fp")}
         |      AS DECIMAL(38,0))) AS VARCHAR) AS content_sum
         |  FROM v LEFT JOIN documents ON doc_id % (13 + v.version) <> 0
         |  GROUP BY v.version)
         |SELECT version,
         |  CASE WHEN version > 2 THEN 'kept' ELSE 'expired' END AS status,
         |  n_docs, n_chars,
         |  CASE WHEN version > 2 THEN content_sum ELSE NULL END AS content_sum
         |FROM per ORDER BY version""".stripMargin
    },

    // brute force IS the oracle: the full-corpus shortlist makes the
    // exact rerank scan every vector, so the PQ codebooks are
    // answer-invisible (same soundness argument as q146's full probe)
    "q216_pq_ann" ->
      """WITH p AS (SELECT embedding AS pe FROM embeddings WHERE vec_id = 11)
        |SELECT e.vec_id,
        |  round(
        |    list_sum(list_transform(range(1, len(e.embedding)+1),
        |      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(p.pe[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(p.pe, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))), 4) AS cosine
        |FROM embeddings e, p WHERE e.vec_id <> 11
        |ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin)
}
