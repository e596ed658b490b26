package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Round-6 batch 1: the at-100× configuration of the minhash-LSH band
  * path — closing the round-5 verdict's single remaining
  * scale-hardening gap (uncapped band buckets).
  *
  *  - q143: q46's LSH candidate pairs with the band-bucket cap
  *    (Dedup.lshCandidates maxBucket = 32) — the 100 TB mode that
  *    bounds a boilerplate mega-cluster's bucket BEFORE the O(k²)
  *    in-bucket pair explosion, exactly as q102's maxDf bounds the
  *    trigram inverted index. The oracle applies the same cap, so the
  *    at-scale configuration is itself hash-verified; at sf0.01/sf0.1
  *    no bucket reaches the cap (TextVectorsSpec proves invariance
  *    in-engine), so q143's rows equal q46's — which is the point: the
  *    cap is answer-invisible until a degenerate bucket appears, and
  *    then it bounds the task instead of letting it explode.
  *  - q144: the band-bucket population profile
  *    (Dedup.lshBucketProfile) — per band: bucket count, hottest
  *    bucket, pair-generating buckets, and how many the cap would
  *    drop. This is the dropped-bucket measurement the cap decision is
  *    made from at scale; declared + oracled so the measurement itself
  *    is hash-verified.
  */
object Queries13 {
  import Tables._

  /** The declared band-bucket cap: far above any bucket at test scale
    * (hottest sf0.1 bucket is single digits — q144 measures it), far
    * below the thousands-deep boilerplate bucket it exists to bound.
    */
  val MaxBucket = 32

  /** q143 — CAPPED MINHASH-LSH CANDIDATE PAIRS (the q46 pipeline with
    * maxBucket, same 3-gram/4×2 parameterization as LshStages).
    */
  def q143(s: SparkSession, d: String): DataFrame =
    Dedup.lshCandidates(documents(s, d), col("text"), col("doc_id"),
        n = LshStages.ShingleN, bands = LshStages.Bands,
        rowsPerBand = LshStages.RowsPerBand, maxBucket = MaxBucket)
      .orderBy(col("a_id"), col("b_id"))

  /** q144 — LSH BUCKET PROFILE: the measurement q143's cap is chosen
    * from. One aggregate over the banding shuffle; nothing quadratic.
    */
  def q144(s: SparkSession, d: String): DataFrame =
    Dedup.lshBucketProfile(documents(s, d), col("text"), col("doc_id"),
        n = LshStages.ShingleN, bands = LshStages.Bands,
        rowsPerBand = LshStages.RowsPerBand, maxBucket = MaxBucket)
      .orderBy(col("band"))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q143_capped_lsh_pairs" -> (q143 _),
    "q144_lsh_bucket_profile" -> (q144 _))
}

object Oracle13 {
  import Queries13.MaxBucket

  val sql: Map[String, String] = Map(
    // q46's banding CTEs + a bucket-size gate: pairs may only come
    // from buckets holding <= MaxBucket docs (the same population the
    // Spark side's collect_list size() filter sees)
    "q143_capped_lsh_pairs" ->
      s"""WITH ${OracleExt.lshBandCtes},
         |bsz AS (SELECT band, bucket, count(*) AS bn FROM bands
         |  GROUP BY band, bucket),
         |pairs AS (
         |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
         |  JOIN bsz ON a.band = bsz.band AND a.bucket = bsz.bucket
         |  WHERE bsz.bn <= $MaxBucket
         |)
         |SELECT a_id, b_id FROM pairs
         |ORDER BY a_id, b_id""".stripMargin,

    "q144_lsh_bucket_profile" ->
      s"""WITH ${OracleExt.lshBandCtes},
         |bsz AS (SELECT band, bucket, count(*) AS bn FROM bands
         |  GROUP BY band, bucket)
         |SELECT band, count(*) AS n_buckets, max(bn) AS max_bucket,
         |  CAST(sum(CASE WHEN bn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pair_buckets,
         |  CAST(sum(CASE WHEN bn > $MaxBucket THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
         |FROM bsz GROUP BY band ORDER BY band""".stripMargin)
}
