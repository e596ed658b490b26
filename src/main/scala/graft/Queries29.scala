package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-7 batch 13: an ORACLED ANN recall curve and vocabulary-tail
  * health.
  *
  *  - q199 measures hyperplane-LSH recall@5 against brute force over
  *    a deterministic probe panel — the recall metric AnnRecallSpec
  *    asserts in scalatest, promoted to a hash-gated query so the
  *    quality claim is machine-checked next to the correctness ones.
  *  - q200 reports the hapax (singleton-token) tail per source — the
  *    vocabulary-health signal that pairs with q141's Zipf slope.
  */
object Queries29 {
  import Tables._

  private val dec = DecimalType(38, 18)

  /** q199 — LSH RECALL CURVE (oracled). For a vec_id % 25 = 0 probe
    * panel: exact top-5 neighbors by cosine vs the 4-hyperplane
    * bucket's top-5 (the q39 codebook, vectors 1..4); per-probe hit
    * counts aggregate to mean recall@5 and the mean candidate share
    * (what fraction of the corpus a bucket probe actually touches —
    * the speedup the recall is traded for).
    *
    * Scale: the probe panel is bounded and rides a BROADCAST into
    * both sides. The exact side is |panel|×|corpus| BY DEFINITION
    * (it is the brute-force anchor, same as q29/q146's proofs); the
    * LSH side is the production path — bucket-keyed join touching
    * 1/2^h of the corpus per probe. Ranks are row_number over
    * (cosine desc, vec_id): cosines are identical doubles on both
    * engines, so the rank sets match exactly.
    */
  def q199(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
    val hps: Seq[Seq[Double]] = e.filter(col("vec_id").between(1, 4))
      .orderBy(col("vec_id")).select(col("embedding"))
      .collect().toSeq.map(_.getSeq[Float](0).map(_.toDouble))
    // fail loudly on a bad fixture: a missing hyperplane would silently
    // shorten every bucket string and make the recall query vacuous
    require(hps.size == 4, s"q199 expects hyperplanes vec_id 1..4, got ${hps.size}")
    val corpus = e.select(col("vec_id"), col("embedding"),
      operators.Ann.lshBucket(col("embedding"), hps).as("bucket"))
    val probes = e.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("pid"), col("embedding").as("pemb"),
        operators.Ann.lshBucket(col("embedding"), hps).as("pbucket"))
    val wRank = Window.partitionBy(col("pid"))
      .orderBy(col("cos").desc, col("vec_id"))
    val exact5 = corpus.join(broadcast(probes.select(col("pid"), col("pemb"))),
        col("vec_id") =!= col("pid"))
      .withColumn("cos",
        graft.functions.Vectors.cosine(col("embedding"), col("pemb")))
      .withColumn("rk", row_number().over(wRank))
      .filter(col("rk") <= 5)
      .select(col("pid"), col("vec_id"))
    val lshCand = corpus.join(broadcast(probes),
      col("bucket") === col("pbucket") && col("vec_id") =!= col("pid"))
    val lsh5 = lshCand
      .withColumn("cos",
        graft.functions.Vectors.cosine(col("embedding"), col("pemb")))
      .withColumn("rk", row_number().over(wRank))
      .filter(col("rk") <= 5)
      .select(col("pid"), col("vec_id"))
    val cand = lshCand.groupBy(col("pid")).agg(count(lit(1)).as("n_cand"))
    val hits = exact5.join(lsh5, Seq("pid", "vec_id"))
      .groupBy(col("pid")).agg(count(lit(1)).as("hits"))
    val tot = e.agg(count(lit(1)).as("n_corpus"))
    probes.select(col("pid"))
      .join(cand, Seq("pid"), "left")
      .join(hits, Seq("pid"), "left")
      .crossJoin(broadcast(tot))
      .select(col("pid"),
        (coalesce(col("hits"), lit(0L)).cast("double") / 5.0).as("recall"),
        (coalesce(col("n_cand"), lit(0L)).cast("double") /
          (col("n_corpus") - 1).cast("double")).as("cand_share"))
      .agg(count(lit(1)).as("n_probes"),
        round((sum(col("recall").cast(dec)) / count(lit(1)))
          .cast("double"), 4).as("avg_recall_at5"),
        round((sum(col("cand_share").cast(dec)) / count(lit(1)))
          .cast("double"), 4).as("avg_cand_share"))
  }

  /** q200 — HAPAX TAIL PER SOURCE. Vocabulary-tail health: per
    * source, the count of token TYPES, the share of types seen
    * exactly once in that source (hapax rate — natural text sits
    * near 0.4-0.6; templated/generated text collapses toward 0), and
    * token volume. Pairs with q141's Zipf slope as the two cheap
    * vocabulary-health monitors.
    *
    * Scale: one (source, token) census (partial+final, map-side
    * combinable) then a |sources|-row aggregate of type counts.
    * Nothing per-token survives the census.
    */
  def q200(s: SparkSession, d: String): DataFrame =
    documents(s, d).filter(col("text").isNotNull)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("n"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_types"),
        sum(col("n")).as("n_tokens"),
        sum(when(col("n") === 1, 1L).otherwise(0L)).as("n_hapax"),
        round(sum(when(col("n") === 1, 1L).otherwise(0L)).cast("double") /
          count(lit(1)).cast("double"), 4).as("hapax_rate"))
      .orderBy(col("source"))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q199_lsh_recall" -> (q199 _),
    "q200_hapax_rate" -> (q200 _))
}

/** DuckDB mirrors of Queries29 — q199 splices OracleExt's shared
  * dot/cosine formulas (the q39 bucket construction) so the LSH
  * geometry exists once.
  */
object Oracle29 {
  import OracleExt.{cosine, dot}

  val sql: Map[String, String] = Map(
    "q199_lsh_recall" -> {
      val bucketE = (1 to 4).map(i =>
        s"CASE WHEN ${dot("e.embedding", s"h$i.he")} > 0 THEN '1' ELSE '0' END")
        .mkString(" || ")
      val hCtes = (1 to 4).map(i =>
        s"h$i AS (SELECT embedding AS he FROM embeddings WHERE vec_id = $i)")
        .mkString(",\n")
      s"""WITH $hCtes,
         |corpus AS (SELECT e.vec_id, e.embedding, $bucketE AS bucket
         |  FROM embeddings e, h1, h2, h3, h4),
         |probes AS (SELECT vec_id AS pid, embedding AS pemb, bucket
         |    AS pbucket
         |  FROM corpus WHERE vec_id % 25 = 0),
         |ex AS (SELECT p.pid, c.vec_id,
         |    row_number() OVER (PARTITION BY p.pid
         |      ORDER BY ${cosine("c.embedding", "p.pemb")} DESC,
         |        c.vec_id) AS rk
         |  FROM corpus c JOIN probes p ON c.vec_id <> p.pid),
         |ex5 AS (SELECT pid, vec_id FROM ex WHERE rk <= 5),
         |lc AS (SELECT p.pid, c.vec_id, c.embedding, p.pemb
         |  FROM corpus c JOIN probes p
         |    ON c.bucket = p.pbucket AND c.vec_id <> p.pid),
         |ls AS (SELECT pid, vec_id,
         |    row_number() OVER (PARTITION BY pid
         |      ORDER BY ${cosine("embedding", "pemb")} DESC, vec_id)
         |      AS rk
         |  FROM lc),
         |ls5 AS (SELECT pid, vec_id FROM ls WHERE rk <= 5),
         |cand AS (SELECT pid, count(*) AS n_cand FROM lc GROUP BY pid),
         |hits AS (SELECT e5.pid, count(*) AS hits
         |  FROM ex5 e5 JOIN ls5 ON e5.pid = ls5.pid
         |    AND e5.vec_id = ls5.vec_id
         |  GROUP BY e5.pid),
         |tot AS (SELECT count(*) AS n_corpus FROM corpus),
         |per AS (SELECT p.pid,
         |    CAST(coalesce(h.hits, 0) AS DOUBLE) / 5.0 AS recall,
         |    CAST(coalesce(c.n_cand, 0) AS DOUBLE) /
         |      CAST(tot.n_corpus - 1 AS DOUBLE) AS cand_share
         |  FROM probes p
         |  LEFT JOIN cand c ON p.pid = c.pid
         |  LEFT JOIN hits h ON p.pid = h.pid, tot)
         |SELECT count(*) AS n_probes,
         |  round(CAST(sum(CAST(recall AS DECIMAL(38,18))) AS DOUBLE)
         |    / count(*), 4) AS avg_recall_at5,
         |  round(CAST(sum(CAST(cand_share AS DECIMAL(38,18))) AS DOUBLE)
         |    / count(*), 4) AS avg_cand_share
         |FROM per""".stripMargin
    },

    "q200_hapax_rate" ->
      """WITH toks AS (SELECT source,
        |    unnest(string_split(text, ' ')) AS tok
        |  FROM documents WHERE text IS NOT NULL),
        |c AS (SELECT source, tok, count(*) AS n FROM toks
        |  WHERE tok <> '' GROUP BY source, tok)
        |SELECT source, count(*) AS n_types,
        |  CAST(sum(n) AS BIGINT) AS n_tokens,
        |  CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_hapax,
        |  round(CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*), 4) AS hapax_rate
        |FROM c GROUP BY source ORDER BY source""".stripMargin)
}
