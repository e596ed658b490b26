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

  /** q145 — HLL SKETCH CALIBRATION (the TypedImperativeAggregate
    * escape hatch, SketchAggregates.HllEstimate). Per event_type:
    * exact distinct users vs the p=8 HLL estimate. The oracle rebuilds
    * the register file and estimator in SQL from the shared md5Long
    * hash, so the custom aggregate's buffer/merge/eval path is
    * HASH-verified against an independent implementation of the same
    * published math — the q123 CMS treatment applied to per-group
    * state. PropertySpec additionally proves merge associativity
    * (partitioning invariance) and the error bound corpus-wide.
    *
    * Scale: the POINT of the operator — a per-group distinct count at
    * 100 TB carries 256 bytes per group through a normal partial+final
    * aggregate instead of shuffling every distinct value (the
    * count_distinct Expand) or collecting raw sets.
    */
  def q145(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("event_type"))
      .agg(count_distinct(col("user_id")).as("n_exact"),
        round(graft.functions.SketchAggregates.hll_estimate(
          col("user_id").cast("string"), 8), 4).as("n_hll"))
      // asc_nulls_last = DuckDB's default (the oracle's NULL-safe
      // join keeps a NULL event_type group; it must sort identically)
      .orderBy(col("event_type").asc_nulls_last)

  /** q146 — IVF ANN (Ann.ivfTopK, previously library+spec only). The
    * declared configuration probes ALL centroids (nProbe = nCentroids
    * = 8), which makes the result PROVABLY equal to brute-force
    * cosine top-k — every vector is scanned whatever partition KMeans
    * put it in — so the brute-force SQL is a sound oracle even though
    * the coarse quantizer itself (driver-side seeded k-means++ on a
    * capped sample, Ann.lloyd) is not SQL-expressible. The at-scale mode (nProbe < nCentroids, a query
    * touches nProbe partitions of the corpus) is the SAME code path
    * with a smaller centroid set; its recall curve is measured in
    * AnnRecallSpec ("IVF: recall@10 grows with nProbe").
    */
  def q146(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
    val probe = e.filter(col("vec_id") === 7)
      .select(col("embedding").as("probe_emb"))
    graft.operators.Ann.ivfTopK(e.filter(col("vec_id") =!= 7),
      "vec_id", "embedding", probe, k = 10, nCentroids = 8, nProbe = 8)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q143_capped_lsh_pairs" -> (q143 _),
    "q144_lsh_bucket_profile" -> (q144 _),
    "q145_hll_calibration" -> (q145 _),
    "q146_ivf_ann" -> (q146 _))
}

object Oracle13 {
  import Queries13.MaxBucket

  val sql: Map[String, String] = Map(
    // q46's banding CTEs + a bucket-size gate: pairs may only come
    // from buckets holding <= MaxBucket docs (the same population the
    // Spark side's collect_list size() filter sees)
    // `bucket IS NOT NULL` mirrors the Spark side's
    // filter(s0.isNotNull): a doc with NULL text (no shingles) has a
    // NULL bucket in the SQL banding and must not form a counted
    // group (q143's equi-join already excludes it; q144's profile
    // would otherwise count one phantom bucket per band)
    "q143_capped_lsh_pairs" ->
      s"""WITH ${OracleExt.lshBandCtes},
         |bsz AS (SELECT band, bucket, count(*) AS bn FROM bands
         |  WHERE bucket IS NOT NULL
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
         |  WHERE bucket IS NOT NULL
         |  GROUP BY band, bucket)
         |SELECT band, count(*) AS n_buckets, max(bn) AS max_bucket,
         |  CAST(sum(CASE WHEN bn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pair_buckets,
         |  CAST(sum(CASE WHEN bn > $MaxBucket THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
         |FROM bsz GROUP BY band ORDER BY band""".stripMargin,

    // the HLL register file and estimator, rebuilt in SQL: same 60-bit
    // md5 hash, low-8-bit index, leading-zero rank, integer harmonic
    // sum S = Σ 2^(53 − M_j) (exact in BIGINT — no float summation
    // order anywhere), and the SAME left-to-right double arithmetic as
    // HllEstimate.eval
    "q145_hll_calibration" ->
      s"""WITH v AS (SELECT DISTINCT event_type, user_id FROM events
         |  WHERE user_id IS NOT NULL),
         |h AS (SELECT event_type,
         |    ${OracleExt.md5long("CAST(user_id AS VARCHAR)")} AS h
         |  FROM v),
         |r AS (SELECT event_type, h % 256 AS idx, h // 256 AS w FROM h),
         |reg AS (SELECT event_type, idx,
         |    max(CASE WHEN w = 0 THEN 53
         |        ELSE 53 - length(format('{:b}', w)) END) AS mj
         |  FROM r GROUP BY event_type, idx),
         |agg AS (SELECT event_type,
         |    CAST(sum(1::BIGINT << (53 - mj)) AS BIGINT)
         |      + (256 - count(*)) * (1::BIGINT << 53) AS s,
         |    256 - count(*) AS zeros
         |  FROM reg GROUP BY event_type),
         |est AS (SELECT event_type, zeros,
         |    0.7213 / (1.0 + 1.079 / 256.0) * 256.0 * 256.0
         |      * 9007199254740992.0 / CAST(s AS DOUBLE) AS raw
         |  FROM agg),
         |fin AS (SELECT event_type,
         |    CASE WHEN raw <= 2.5 * 256.0 AND zeros > 0
         |      THEN 256.0 * ln(256.0 / CAST(zeros AS DOUBLE)) ELSE raw END AS est
         |  FROM est),
         |ex AS (SELECT event_type, count(DISTINCT user_id) AS n_exact
         |  FROM events GROUP BY event_type)
         |SELECT ex.event_type, n_exact,
         |  round(coalesce(est, 0.0), 4) AS n_hll
         |FROM ex LEFT JOIN fin
         |  ON ex.event_type IS NOT DISTINCT FROM fin.event_type
         |ORDER BY ex.event_type""".stripMargin,

    // q48 oracle (backfilled round 5→6, REAL-decode form since round
    // 8): image payloads are genuine PNGs whose grayscale grid is the
    // deterministic formula below — PNG is lossless, so the DECODED
    // samples equal the formula and the whole histogram/mean/entropy
    // pipeline stays SQL-expressible. Audio is raw 8-bit PCM (n =
    // plen samples); images decode w*h pixels. Pixel sums are
    // integer-valued doubles (exact in any order); the entropy sum
    // walks the histogram in bucket order on both engines
    // (list(c ORDER BY b) mirrors the Scala hist-array iteration).
    "q48_multimodal_features" ->
      """WITH ids AS (SELECT unnest(range(200)) AS id),
        |m AS (SELECT id, CASE WHEN id % 3 = 2 THEN 'audio' ELSE 'image' END AS kind,
        |    8 + id % 5 AS w, 8 + id % 3 AS h, 64 + (id % 17) * 7 AS plen FROM ids),
        |d AS (SELECT id, kind, plen,
        |    CASE WHEN kind = 'image' THEN w * h ELSE plen END AS n FROM m),
        |px AS (SELECT id, kind, n, plen, unnest(range(n)) AS j FROM d),
        |pv AS (SELECT id, kind, n, plen,
        |    (id * 131 + (j % plen) * 31 + 7) % 251 AS p FROM px),
        |mean AS (SELECT id, CAST(sum(p) AS DOUBLE) / n AS byte_mean
        |  FROM pv GROUP BY id, n),
        |hist AS (SELECT id, kind, n, plen, p // 16 AS b, count(*) AS c
        |  FROM pv GROUP BY ALL),
        |hl AS (SELECT id, kind, n, plen, list(c ORDER BY b) AS cs
        |  FROM hist GROUP BY ALL),
        |ent AS (SELECT id, kind, n, plen,
        |    -list_sum(list_transform(cs,
        |      c -> (CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n)))
        |      AS byte_entropy
        |  FROM hl)
        |SELECT ent.id AS media_id, kind, CAST(n AS INTEGER) AS n_px,
        |  round(byte_mean, 4) AS byte_mean,
        |  round(byte_entropy, 4) AS byte_entropy, e.label
        |FROM ent JOIN mean USING (id) JOIN embeddings e ON ent.id = e.vec_id
        |ORDER BY media_id""".stripMargin,

    // brute force IS the oracle: full-probe IVF (nProbe = nCentroids)
    // scans every cluster, so the KMeans partition is answer-invisible
    "q146_ivf_ann" ->
      """WITH p AS (SELECT embedding AS pe FROM embeddings WHERE vec_id = 7)
        |SELECT e.vec_id,
        |  round(
        |    list_sum(list_transform(range(1, len(e.embedding)+1),
        |      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(p.pe[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(p.pe, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))), 4) AS cosine
        |FROM embeddings e, p WHERE e.vec_id <> 7
        |ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin)
}
