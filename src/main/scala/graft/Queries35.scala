package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-7 batch 19: sequence-model text scoring.
  *
  *  - q212 scores each source's text under the corpus BIGRAM model
  *    (conditional surprisal −ln P(r|l)) — the sequence-aware
  *    companion to q147's unigram perplexity: templated/boilerplate
  *    sources collapse toward low surprisal even when their unigram
  *    mix looks normal.
  */
object Queries35 {
  import Tables._

  private val dec = DecimalType(38, 18)

  /** q212 — BIGRAM SURPRISAL PER SOURCE. Every adjacent token pair
    * is scored −ln(c(l,r)/c(l·)) under the global bigram census
    * (conditional probability from the census marginal, so the model
    * is self-consistent and zero-free by construction); per-source
    * mean surprisal with round(,4)-pinned terms and a decimal sum
    * (the q179 ln convention). Low mean = predictable sequences
    * (templates, generated text); the unigram q147 cannot see this.
    *
    * Scale: the census is one map-side-combinable aggregate (the
    * q164 shape); scoring is TWO token-keyed equi-joins (pair + its
    * marginal) — 16-byte-ish keys shuffle, text never does; the
    * report is a |sources|-row aggregate.
    */
  def q212(s: SparkSession, d: String): DataFrame = {
    // the bigram frame feeds the census AND the scoring join — it IS
    // the shared TokenStages arm (q164 censuses the same rows), so
    // the tokenize+expand pass runs once per SESSION, not per query
    val occ = TokenStages.bigramOcc(s, d)
    val census = occ.groupBy(col("l"), col("r")).agg(count(lit(1)).as("n_lr"))
    val marginal = census.groupBy(col("l")).agg(sum(col("n_lr")).as("n_l"))
    occ.join(census, Seq("l", "r"))
      .join(marginal, Seq("l"))
      .withColumn("term",
        round(-log(col("n_lr").cast("double") / col("n_l").cast("double")),
          4))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_bigrams"),
        round((sum(col("term").cast(dec)) / count(lit(1)))
          .cast("double"), 4).as("avg_surprisal"))
      .orderBy(col("source"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q212_bigram_surprisal" -> (q212 _))
}

/** DuckDB mirror of Queries35 — the same census, marginal, ln pins
  * and decimal mean (§7.4).
  */
object Oracle35 {

  val sql: Map[String, String] = Map(
    "q212_bigram_surprisal" ->
      """WITH t AS (SELECT source, string_split(text, ' ') AS ts
        |  FROM documents WHERE text IS NOT NULL
        |    AND len(string_split(text, ' ')) >= 2),
        |i AS (SELECT source, ts, unnest(range(1, len(ts))) AS i FROM t),
        |occ AS (SELECT source, ts[i] AS l, ts[i + 1] AS r FROM i
        |  ),
        |o2 AS (SELECT * FROM occ WHERE l <> '' AND r <> ''),
        |census AS (SELECT l, r, count(*) AS n_lr FROM o2 GROUP BY l, r),
        |marginal AS (SELECT l, CAST(sum(n_lr) AS BIGINT) AS n_l
        |  FROM census GROUP BY l),
        |sc AS (SELECT o2.source,
        |    round(-ln(CAST(c.n_lr AS DOUBLE) / CAST(m.n_l AS DOUBLE)),
        |      4) AS term
        |  FROM o2 JOIN census c ON o2.l = c.l AND o2.r = c.r
        |  JOIN marginal m ON o2.l = m.l)
        |SELECT source, count(*) AS n_bigrams,
        |  round(CAST(sum(CAST(term AS DECIMAL(38,18))) AS DOUBLE)
        |    / count(*), 4) AS avg_surprisal
        |FROM sc GROUP BY source ORDER BY source""".stripMargin)
}
