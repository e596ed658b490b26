package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.{Signal, Vectors}
import graft.operators.Ann

/** Round-3 scale-shape upgrades: the pair-generating queries re-blocked
  * on keys whose cardinality GROWS with the corpus.
  *
  * q38/q67 block on `label` — an equi-join, but with fixed key
  * cardinality the per-block population grows linearly with the corpus,
  * so pair fan-out is still quadratic at open scale. q82/q84 are the
  * same semantics blocked on a random-hyperplane LSH bucket
  * (Ann.codebook/lshBucket): the codebook is a literal — DuckDB gets
  * the SAME doubles spliced into its SQL, so the oracle reproduces the
  * bucketing bit-for-bit — and at 100× you add hyperplanes, growing
  * 2^n buckets with the corpus and keeping per-bucket population
  * bounded. q83 locks in the parquet-pushdown win of the µs-normalized
  * events table (Tables.events): a timestamp range scan that prunes at
  * the file/row-group level.
  */
object Queries4 {
  import Tables._

  /** The q82/q84 codebook: 4 hyperplanes over the 64-dim embedding
    * space → 16 sign-pattern buckets at sf scale.
    */
  private[graft] val Hps: Seq[Seq[Double]] = Ann.codebook(4, 64)

  /** X1e at scale: embedding-cosine near-dup pairs blocked on the LSH
    * bucket (not `label`): norms precomputed narrow, one equi-join
    * shuffle on the bucket string, exact cosine inside the bucket.
    */
  def q82(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
      .withColumn("bucket", Ann.lshBucket(col("embedding"), Hps))
      .withColumn("nrm", Vectors.norm(col("embedding")))
    val a = e.select(col("vec_id").as("a_id"), col("bucket"),
      col("embedding").as("a_emb"), col("nrm").as("a_nrm"))
    val b = e.select(col("vec_id").as("b_id"), col("bucket").as("bucket_b"),
      col("embedding").as("b_emb"), col("nrm").as("b_nrm"))
    a.join(b, col("bucket") === col("bucket_b") && col("a_id") < col("b_id"))
      .withColumn("cos",
        Vectors.dot(col("a_emb"), col("b_emb")) / (col("a_nrm") * col("b_nrm")))
      .filter(col("cos") >= 0.4)
      .select(col("a_id"), col("b_id"), round(col("cos"), 4).as("cosine"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** Timestamp range slice over the µs-normalized events table — the
    * predicate reaches the parquet scan (PlanSpec asserts PushedFilters
    * on ts), so at 100 TB the scan prunes row groups/files instead of
    * reading a month to keep a week.
    */
  def q83(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .filter(col("ts") >= lit("2024-01-10 00:00:00").cast("timestamp") &&
        col("ts") < lit("2024-01-17 00:00:00").cast("timestamp"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(Signal.exactSum(col("value")).cast("double"), 4).as("total"))
      .orderBy(col("event_type"))

  /** X2b at scale: k-NN join blocked on the LSH bucket (not `label`) —
    * top-3 cosine neighbors within each query's bucket, ranked by a
    * partition-local window. Same join shape as q82; the window never
    * sees more than one bucket's population.
    */
  def q84(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
      .withColumn("bucket", Ann.lshBucket(col("embedding"), Hps))
      .withColumn("nrm", Vectors.norm(col("embedding")))
    val a = e.select(col("vec_id").as("q_id"), col("bucket"),
      col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    val b = e.select(col("vec_id").as("n_id"), col("bucket").as("bucket_b"),
      col("embedding").as("n_emb"), col("nrm").as("n_nrm"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("n_id"))
    a.join(b, col("bucket") === col("bucket_b") && col("q_id") =!= col("n_id"))
      .withColumn("cos",
        Vectors.dot(col("q_emb"), col("n_emb")) / (col("q_nrm") * col("n_nrm")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("q_id"), col("rk"), col("n_id"), round(col("cos"), 4).as("cosine"))
      .orderBy(col("q_id"), col("rk"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q82_embed_neardup_lsh" -> (q82 _),
    "q83_time_slice" -> (q83 _),
    "q84_knn_join_lsh" -> (q84 _)
  )
}

/** DuckDB oracles for Queries4. The hyperplane codebook is spliced
  * from the SAME Scala doubles the Spark side uses (Queries4.Hps), so
  * the bucketing cannot drift between engines.
  */
object Oracle4 {

  private def lits(hp: Seq[Double]): String =
    hp.mkString("[", ", ", "]")

  private def dotLit(e: String, hp: Seq[Double]): String =
    s"list_sum(list_transform(range(1, 65), " +
      s"k -> CAST($e[k] AS DOUBLE) * (${lits(hp)})[k]))"

  private def bucketSql(e: String): String =
    Queries4.Hps.map(hp =>
      s"CASE WHEN ${dotLit(e, hp)} > 0 THEN '1' ELSE '0' END")
      .mkString(" || ")

  private def dot(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a)+1), " +
      s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"

  private def sumsq(a: String): String =
    s"list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"

  private def cosine(a: String, b: String): String =
    s"${dot(a, b)} / (sqrt(${sumsq(a)}) * sqrt(${sumsq(b)}))"

  val sql: Map[String, String] = Map(
    "q82_embed_neardup_lsh" ->
      s"""WITH b AS (SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket
         |  FROM embeddings)
         |SELECT a.vec_id AS a_id, b2.vec_id AS b_id,
         |  round(${cosine("a.embedding", "b2.embedding")}, 4) AS cosine
         |FROM b a JOIN b b2
         |  ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
         |WHERE ${cosine("a.embedding", "b2.embedding")} >= 0.4
         |ORDER BY a_id, b_id""".stripMargin,

    "q83_time_slice" ->
      """SELECT event_type, count(*) AS n,
        |  round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS total
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-17 00:00:00'
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q84_knn_join_lsh" ->
      s"""WITH b AS (SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket
         |  FROM embeddings),
         |p AS (SELECT a.vec_id AS q_id, b2.vec_id AS n_id,
         |    ${cosine("a.embedding", "b2.embedding")} AS cos
         |  FROM b a JOIN b b2
         |    ON a.bucket = b2.bucket AND a.vec_id <> b2.vec_id),
         |rk AS (SELECT q_id, n_id, cos,
         |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rk
         |FROM p)
         |SELECT q_id, rk, n_id, round(cos, 4) AS cosine
         |FROM rk WHERE rk <= 3 ORDER BY q_id, rk""".stripMargin
  )
}
