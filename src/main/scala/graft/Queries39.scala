package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Vectors

/** Round-8 batch 3: greedy corpus-selection operators (SURVEY §2.8
  * X130-X131) — set-cover vocabulary selection and MMR diverse top-k.
  * Both are inherently sequential greedy loops (k data-dependent
  * argmax steps); the Spark shape is k BOUNDED driver steps, each a
  * full distributed aggregate, with only the k winners (ids + tiny
  * state) ever crossing to the driver — the q146/q220 pattern for
  * "iterate a few times, never collect the data".
  */
object Queries39 {
  import Tables._

  /** q220 — GREEDY SET-COVER CORPUS SELECTION (X130, k=3). Pick the
    * document covering the most distinct tokens; then twice more the
    * document adding the most NOT-yet-covered tokens (ties → min
    * doc_id). The curation use: choose a minimal seed corpus
    * maximizing vocabulary coverage (facility-location/submodular
    * selection, the simplest member of the data-selection family).
    *
    * Each step is one anti-join of the token table against the
    * covered set + one per-doc count + a TakeOrdered(1); the covered
    * set is derived from ≤ k selected doc ids, so the anti-join's
    * build side stays a broadcastable sliver no matter the corpus
    * size. Driver state: 3 (doc_id, gain, covered) triples — bounded
    * by k, never by data.
    *
    * The oracle unrolls the same 3 steps as chained CTEs — fixed k
    * makes greedy SQL-expressible without recursion.
    */
  def q220(s: SparkSession, d: String): DataFrame = {
    // cover units are word BIGRAMS (one-pass ShingleStrings, n=2):
    // the corpus' word vocabulary is ~31 tokens and a single doc can
    // cover it all, which would make greedy degenerate after one
    // step; the bigram space is combinatorial, so coverage keeps
    // growing. The token table is built ONCE and persisted for the
    // loop's 3 scans (each step reads it twice: covered set + gains)
    // — re-shingling the corpus per step would multiply the dominant
    // cost by 2k.
    val toks = documents(s, d)
      .select(col("doc_id"),
        explode(array_distinct(
          graft.functions.TextExpressions.shingle_strings(
            col("text"), 2))).as("tok"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // INCREMENTAL uncovered frame (VERDICT r13 #1b): the previous form
    // re-derived "remaining minus covered" from the FULL token table
    // at every step — two extra cached full scans per step (the
    // covered-set distinct + the re-filter). The greedy invariant
    // makes that redundant: after winner w is picked, the tokens w
    // still had in the CURRENT uncovered frame are exactly the new
    // units it covers, so uncovered_{k+1} = uncovered_k minus w's
    // rows minus w's remaining tokens — one shrinking persisted frame
    // per step, each step ONE aggregate over it plus a broadcast anti
    // of the winner's sliver. Gains and tiebreaks are unchanged
    // (oracle-pinned: the DuckDB CTE chain recomputes every argmax
    // from the raw table).
    val scratch = scala.collection.mutable.ListBuffer[DataFrame](toks)
    try {
      var uncovered = toks
      var picks = List.empty[(Int, Long, Long, Long)]
      var total = 0L
      var step = 1
      while (step <= 3) {
        val pick = uncovered
          .groupBy(col("doc_id")).agg(count(lit(1)).as("gain"))
          .orderBy(col("gain").desc, col("doc_id"))
          .limit(1).collect() // exactly one winner row per step — bounded by k
        val (id, gain) = (pick(0).getLong(0), pick(0).getLong(1))
        // each gain counts exactly the NEW units, so the covered total
        // is the running sum — no extra distinct-count job per step
        total += gain
        picks = picks :+ ((step, id, gain, total))
        if (step < 3) {
          val next = uncovered.filter(col("doc_id") =!= id)
            .join(broadcast(uncovered.filter(col("doc_id") === id)
              .select(col("tok"))), Seq("tok"), "left_anti")
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          scratch += next
          uncovered = next
        }
        step += 1
      }
      import s.implicits._
      picks.toDF("step", "doc_id", "gain", "covered_total")
        .orderBy(col("step"))
    } finally scratch.foreach(_.unpersist(blocking = false))
  }

  /** q221 — MMR DIVERSE TOP-K (X131, k=3, λ=0.7). Maximal Marginal
    * Relevance over the embedding corpus: step 1 takes the candidate
    * most similar to the probe; steps 2-3 take
    * argmax λ·cos(v,probe) − (1−λ)·max_{s∈selected} cos(v,s) — the
    * standard diversity-aware retrieval re-ranker (dedup-at-serve
    * time for RAG/search results). All cosines round to 4 decimals
    * BEFORE the argmax (tie → min vec_id) so the winner is identical
    * across engines.
    *
    * Scale: each step is one scan of the candidate set with ≤ k−1
    * broadcast 64-float vectors in the penalty term — the corpus
    * never pairs with itself (contrast q38's all-pairs: MMR is
    * O(k·n), not O(n²)).
    */
  def q221(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
    val probeVec = e.filter(col("vec_id") === 23)
      .select(col("embedding")).collect()(0).getSeq[Float](0)
    require(probeVec.nonEmpty, "probe vec_id=23 missing from fixture")
    val cand = e.filter(col("vec_id") % 3 === 1 && col("vec_id") =!= 23)
      .select(col("vec_id"), col("embedding"),
        round(Vectors.cosine(col("embedding"),
          typedLit(probeVec.toArray)), 4).as("rel"))
    var sel = List.empty[(Long, Seq[Float])]
    var out = List.empty[(Int, Long, Double, Double)]
    var step = 1
    while (step <= 3) {
      val penalty: org.apache.spark.sql.Column =
        if (sel.isEmpty) lit(0.0)
        else sel.map(sv =>
          round(Vectors.cosine(col("embedding"),
            typedLit(sv._2.toArray)), 4))
          .reduce((a, b) => greatest(a, b))
      // λ·rel − (1−λ)·pen in EXACT decimal over the 4dp-rounded
      // inputs: the float mix can land exactly on a .00005 boundary
      // where Spark and DuckDB round the scaled double apart (§7.4);
      // decimal(18,4) × decimal(1,1) arithmetic is exact, so HALF_UP
      // at 4dp agrees bit-for-bit across engines
      val scored = cand
        .filter(!col("vec_id").isin(sel.map(_._1): _*))
        .withColumn("score",
          round(col("rel").cast("decimal(18,4)") * lit(BigDecimal("0.7"))
            - lit(BigDecimal("0.3")) * penalty.cast("decimal(18,4)"), 4)
            .cast("double"))
        .orderBy(col("score").desc, col("vec_id"))
        .limit(1).collect() // one winner per step; k=3 total
      val row = scored(0)
      sel = sel :+ ((row.getLong(0), row.getSeq[Float](1)))
      out = out :+ ((step, row.getLong(0),
        row.getDouble(2), row.getAs[Double]("score")))
      step += 1
    }
    import s.implicits._
    out.toDF("step", "vec_id", "rel", "score").orderBy(col("step"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q220_greedy_cover" -> (q220 _),
    "q221_mmr_select" -> (q221 _))
}

/** DuckDB mirrors of Queries39 — both greedy loops unrolled to fixed
  * k=3 chained CTEs (greedy is SQL-expressible exactly because k is a
  * constant). The oracle recomputes every argmax from the raw tables.
  */
object Oracle39 {

  /** Cosine similarity between a list column expr and another. */
  private def cosSql(a: String, b: String): String =
    s"""(list_sum(list_transform(range(1, len($a)+1),
       |    i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))
       |  / (sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
       |   * sqrt(list_sum(list_transform($b, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))))""".stripMargin

  val sql: Map[String, String] = Map(
    "q220_greedy_cover" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM documents),
        |toks AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    list_transform(range(1, greatest(len(toks)-1, 1) + 1),
        |      i -> array_to_string(toks[i:i+1], ' ')))) AS tok
        |  FROM t),
        |s1 AS (SELECT doc_id, count(*) AS gain FROM toks
        |  GROUP BY doc_id ORDER BY gain DESC, doc_id LIMIT 1),
        |c1 AS (SELECT DISTINCT tok FROM toks
        |  WHERE doc_id IN (SELECT doc_id FROM s1)),
        |s2 AS (SELECT t.doc_id, count(*) AS gain FROM toks t
        |  WHERE t.tok NOT IN (SELECT tok FROM c1)
        |    AND t.doc_id NOT IN (SELECT doc_id FROM s1)
        |  GROUP BY t.doc_id ORDER BY gain DESC, doc_id LIMIT 1),
        |c2 AS (SELECT DISTINCT tok FROM toks
        |  WHERE doc_id IN (SELECT doc_id FROM s1 UNION SELECT doc_id FROM s2)),
        |s3 AS (SELECT t.doc_id, count(*) AS gain FROM toks t
        |  WHERE t.tok NOT IN (SELECT tok FROM c2)
        |    AND t.doc_id NOT IN
        |      (SELECT doc_id FROM s1 UNION SELECT doc_id FROM s2)
        |  GROUP BY t.doc_id ORDER BY gain DESC, doc_id LIMIT 1),
        |c3 AS (SELECT DISTINCT tok FROM toks WHERE doc_id IN
        |  (SELECT doc_id FROM s1 UNION SELECT doc_id FROM s2
        |   UNION SELECT doc_id FROM s3))
        |SELECT 1 AS step, doc_id, gain,
        |  (SELECT count(*) FROM c1) AS covered_total FROM s1
        |UNION ALL
        |SELECT 2, doc_id, gain, (SELECT count(*) FROM c2) FROM s2
        |UNION ALL
        |SELECT 3, doc_id, gain, (SELECT count(*) FROM c3) FROM s3
        |ORDER BY step""".stripMargin,

    "q221_mmr_select" -> {
      val relExpr = cosSql("c.embedding", "p.pe")
      s"""WITH p AS (SELECT embedding AS pe FROM embeddings WHERE vec_id = 23),
         |cand AS (SELECT c.vec_id, c.embedding,
         |    round($relExpr, 4) AS rel
         |  FROM embeddings c, p
         |  WHERE c.vec_id % 3 = 1 AND c.vec_id <> 23),
         |s1 AS (SELECT vec_id, embedding, rel,
         |    CAST(round(CAST(rel AS DECIMAL(18,4)) * 0.7
         |      - 0.3 * CAST(0.0 AS DECIMAL(18,4)), 4) AS DOUBLE) AS score
         |  FROM cand ORDER BY score DESC, vec_id LIMIT 1),
         |s2 AS (SELECT c.vec_id, c.embedding, c.rel,
         |    CAST(round(CAST(c.rel AS DECIMAL(18,4)) * 0.7 - 0.3 *
         |      CAST(round(${cosSql("c.embedding", "s1.embedding")}, 4)
         |        AS DECIMAL(18,4)), 4) AS DOUBLE) AS score
         |  FROM cand c, s1 WHERE c.vec_id <> s1.vec_id
         |  ORDER BY score DESC, c.vec_id LIMIT 1),
         |s3 AS (SELECT c.vec_id, c.embedding, c.rel,
         |    CAST(round(CAST(c.rel AS DECIMAL(18,4)) * 0.7 - 0.3 *
         |      CAST(greatest(
         |        round(${cosSql("c.embedding", "s1.embedding")}, 4),
         |        round(${cosSql("c.embedding", "s2.embedding")}, 4))
         |        AS DECIMAL(18,4)), 4) AS DOUBLE) AS score
         |  FROM cand c, s1, s2
         |  WHERE c.vec_id <> s1.vec_id AND c.vec_id <> s2.vec_id
         |  ORDER BY score DESC, c.vec_id LIMIT 1)
         |SELECT 1 AS step, vec_id, rel, score FROM s1
         |UNION ALL SELECT 2, vec_id, rel, score FROM s2
         |UNION ALL SELECT 3, vec_id, rel, score FROM s3
         |ORDER BY step""".stripMargin
    })
}
