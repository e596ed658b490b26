package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Vectors

/** Approximate-nearest-neighbor search over an embedding column
  * (north-star X2).
  *
  *  - bruteForceTopK: exact baseline — scan side is embarrassingly
  *    parallel, probe is a 1-row broadcast, result via
  *    TakeOrderedAndProject (no global sort).
  *  - Random-hyperplane LSH (Charikar 2002): bucket every vector by
  *    the sign pattern of dot products with a small fixed codebook of
  *    hyperplanes; search only the probe's bucket. At 100 TB the
  *    bucket id becomes the partition key, so a query touches one
  *    partition instead of the full corpus. Multi-probe (flipping one
  *    bit) trades recall for fan-out.
  */
object Ann {

  /** Exact cosine top-k against a single probe vector. */
  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String,
      probe: DataFrame, k: Int): DataFrame =
    emb.crossJoin(broadcast(probe))
      .select(col(idCol),
        round(Vectors.cosine(col(vecCol), col("probe_emb")), 4).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)

  /** Sign-pattern bucket id for a vector against a fixed codebook of
    * hyperplanes (deterministic literal vectors → broadcast in plan).
    */
  def lshBucket(vec: Column, hyperplanes: Seq[Seq[Double]]): Column =
    concat(hyperplanes.map { hp =>
      val dot = Vectors.dot(vec, typedLit(hp))
      when(dot > 0, lit("1")).otherwise(lit("0"))
    }: _*)

  /** LSH-bucketed ANN: restrict the scan to vectors in the probe's
    * bucket, then exact cosine top-k inside it.
    */
  def lshTopK(emb: DataFrame, idCol: String, vecCol: String,
      probe: DataFrame, hyperplanes: Seq[Seq[Double]], k: Int): DataFrame = {
    val bucketed = emb.withColumn("bucket", lshBucket(col(vecCol), hyperplanes))
    val probeB = probe.withColumn("probe_bucket",
      lshBucket(col("probe_emb"), hyperplanes))
    bucketed.join(broadcast(probeB), col("bucket") === col("probe_bucket"))
      .select(col(idCol),
        round(Vectors.cosine(col(vecCol), col("probe_emb")), 4).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }
}
