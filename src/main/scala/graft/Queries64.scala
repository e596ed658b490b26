package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.{Text, Vectors}
import graft.operators.Ann

/** Round-10 batch 1: four LLM-corpus curation operators (SURVEY §2.8
  * X195-X198) — content-blocklist filtering audit, leakage-safe
  * cluster-level train/val/test split, contrastive triplet mining
  * over the ANN candidate pairs, and Kneser-Ney continuation-count
  * statistics for the language-model smoothing pipeline.
  */
object Queries64 {
  import Tables._

  /** The shared content blocklist, spliced as literals into BOTH
    * engines (the q243/q68 literal-grid convention). A real pipeline
    * loads this from a policy file; the semantics under test are the
    * per-token membership scan + cross-multiplied threshold.
    */
  private[graft] val Blocklist = Seq("hash", "vector", "stream")

  /** Flag threshold: a doc is dropped when blocklist tokens exceed
    * 12% of its tokens (hits*100 > 12*n — integer cross-multiply, no
    * float share anywhere).
    */
  private[graft] val BlockPctThreshold = 12

  /** q285 — CONTENT-BLOCKLIST FILTER AUDIT (X195). The policy-filter
    * stage every production corpus runs before training: count
    * blocklisted tokens per doc (exact token membership, not
    * substring), flag docs whose blocklist share exceeds the
    * threshold, and report per source the doc/flag counts, the token
    * masses, and what fraction of the corpus the filter removes.
    * The flag decision is pure integer arithmetic (hits*100 > 12*n),
    * so both engines agree on every boundary doc.
    *
    * Scale: per-row HOF scan (no shuffle) into one partial+final
    * aggregate on source — the same census shape as q33/q64.
    */
  def q285(s: SparkSession, d: String): DataFrame = {
    val inList = Blocklist.map(w => s"'$w'").mkString(", ")
    documents(s, d)
      .withColumn("toks", expr("filter(split(text, ' '), w -> length(w) > 0)"))
      .withColumn("n_toks", size(col("toks")).cast("long"))
      .withColumn("hits",
        size(expr(s"filter(toks, w -> w IN ($inList))")).cast("long"))
      .withColumn("flagged",
        col("hits") * 100L > lit(BlockPctThreshold.toLong) * col("n_toks"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("flagged"), 1L).otherwise(0L)).as("n_flagged"),
        sum(col("n_toks")).as("total_tokens"),
        sum(col("hits")).as("blocklist_tokens"),
        sum(when(!col("flagged"), col("n_toks")).otherwise(0L))
          .as("surviving_tokens"),
        round(sum(when(col("flagged"), col("n_toks")).otherwise(0L))
          .cast("double") / sum(col("n_toks")).cast("double"), 4)
          .as("removed_token_share"))
      .orderBy(col("source"))
  }

  private def splitOf(bucket: Column): Column =
    when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")

  /** q286 — LEAKAGE-SAFE CLUSTER-LEVEL SPLIT (X196). Near-duplicate
    * documents MUST NOT straddle a train/test boundary — doc-level
    * hashing (q78) leaks every near-dup pair whose members hash to
    * different splits. This op assigns splits at the DEDUP-CLUSTER
    * level (md5 of the connected-component id from the LSH candidate
    * graph; singletons key on their own doc_id) and audits both
    * schemes side by side: per (scheme, split) doc counts, char
    * mass, and the number of LSH candidate pairs leaking OUT of that
    * split (attributed to the a-side's split). Cluster-level leakage
    * is zero BY CONSTRUCTION — both cluster members share the key —
    * and the audit proves it against the same pair set that convicts
    * the doc-level scheme.
    *
    * Scale: reuses the materialized LshStages clusters/pairs arms;
    * the split maps are one narrow projection + two broadcast-sized
    * joins of the pair table. Doc-level split IS q78's assignment
    * (same md5 formula), so the two queries cannot drift.
    */
  def q286(s: SparkSession, d: String): DataFrame = {
    val keyed = documents(s, d).select(col("doc_id"), col("n_chars"), col("text"))
      .join(LshStages.clusters(s, d), Seq("doc_id"), "left")
      .withColumn("ckey", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("csplit", splitOf(
        pmod(Text.md5Long(concat(lit("split:"), col("ckey").cast("string"))),
          lit(100L))))
      .withColumn("dsplit", splitOf(pmod(Text.md5Long(col("text")), lit(100L))))
      .select(col("doc_id"), col("n_chars"), col("csplit"), col("dsplit"))
    val pairs = LshStages.candidatePairs(s, d).select(col("a_id"), col("b_id"))
    def scheme(splitCol: String, name: String): DataFrame = {
      val leaks = pairs
        .join(keyed.select(col("doc_id").as("a_id"), col(splitCol).as("sa")),
          Seq("a_id"))
        .join(keyed.select(col("doc_id").as("b_id"), col(splitCol).as("sb")),
          Seq("b_id"))
        .filter(col("sa") =!= col("sb"))
        .groupBy(col("sa").as("split"))
        .agg(count(lit(1)).as("n_leaking_pairs"))
      keyed.groupBy(col(splitCol).as("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("char_mass"))
        .join(leaks, Seq("split"), "left")
        .select(lit(name).as("scheme"), col("split"), col("n_docs"),
          col("char_mass"),
          coalesce(col("n_leaking_pairs"), lit(0L)).as("n_leaking_pairs"))
    }
    scheme("csplit", "cluster").unionByName(scheme("dsplit", "doc"))
      .orderBy(col("scheme"), col("split"))
  }

  /** q287 — CONTRASTIVE TRIPLET MINING (X197). Builds the
    * (anchor, positive, negative) training triplets an embedding
    * fine-tune consumes: positives are same-label pairs in the SAME
    * LSH bucket with cosine ≥ 0.30 (q38's family with exact-bucket
    * blocking — the miner needs precision, not q38's probe-expanded
    * recall, and exact blocking avoids the 5× variant explosion);
    * the negative for each pair is drawn md5-deterministically from
    * the corpus — h = md5("trip:a_b"), candidates (h+k) mod N for
    * k=0,1,2, first one outside {a,b} (three consecutive residues
    * cannot all collide with a 2-element set). Reports, per anchor
    * label: triplet count, mean positive/negative cosine, mean
    * margin, and how many triplets already rank the positive above
    * the negative. Cosines are 6dp-decimal-summed so the means are
    * order-free exact.
    *
    * Scale: the pair generator is the bucketed q38 shape (never
    * all-pairs); negatives are one narrow join back to the
    * embeddings table on the derived id. N = corpus size enters as a
    * 1-row broadcast, not a literal.
    */
  def q287(s: SparkSession, d: String): DataFrame = {
    val dec = DecimalType(18, 6)
    // Positive-pair threshold: looser than q38's 0.4 near-dup bar —
    // a contrastive positive only needs to be semantically close, and
    // 0.30 keeps the per-label triplet panel populated at small sf.
    val PosCosThreshold = 0.30
    val e = embeddings(s, d)
      .withColumn("bucket", Ann.lshBucket(col("embedding"), Queries4.Hps))
      .withColumn("nrm", Vectors.norm(col("embedding")))
    val nVecs = e.agg(count(lit(1)).as("n_vecs"))
    val a = e.select(col("vec_id").as("a_id"), col("label"), col("bucket"),
      col("embedding").as("a_emb"), col("nrm").as("a_nrm"))
    val b = e.select(col("vec_id").as("b_id"), col("label").as("label_b"),
      col("bucket").as("bucket_b"),
      col("embedding").as("b_emb"), col("nrm").as("b_nrm"))
    val pos = a.join(b, col("label") === col("label_b") &&
        col("bucket") === col("bucket_b") && col("a_id") < col("b_id"))
      .withColumn("cos_raw",
        Vectors.dot(col("a_emb"), col("b_emb")) / (col("a_nrm") * col("b_nrm")))
      .filter(col("cos_raw") >= PosCosThreshold)
      .select(col("a_id"), col("b_id"), col("label"),
        col("a_emb"), col("a_nrm"),
        round(col("cos_raw"), 6).cast(dec).as("cos_ap"))
    // INVARIANT (ADVICE r10): neg_id = (h+k) mod n_vecs is joined back
    // to embeddings with an INNER join, so the id space must be
    // contiguous [0, n_vecs) — a gap would silently drop triplets, and
    // identically on both engines, so the oracle could not catch it.
    // Round11Spec pins max(vec_id)+1 == count(*) == countDistinct at
    // both test sfs so a sparse-id regression fails loudly in-suite.
    val withNeg = pos.crossJoin(broadcast(nVecs))
      .withColumn("h", Text.md5Long(
        concat(lit("trip:"), col("a_id"), lit("_"), col("b_id"))))
      .withColumn("c0", pmod(col("h"), col("n_vecs")))
      .withColumn("c1", pmod(col("h") + 1L, col("n_vecs")))
      .withColumn("c2", pmod(col("h") + 2L, col("n_vecs")))
      .withColumn("neg_id",
        when(col("c0") =!= col("a_id") && col("c0") =!= col("b_id"), col("c0"))
          .when(col("c1") =!= col("a_id") && col("c1") =!= col("b_id"),
            col("c1"))
          .otherwise(col("c2")))
    val scored = withNeg.join(
        e.select(col("vec_id").as("neg_id"), col("embedding").as("n_emb"),
          col("nrm").as("n_nrm")),
        Seq("neg_id"))
      .withColumn("cos_an",
        round(Vectors.dot(col("a_emb"), col("n_emb")) /
          (col("a_nrm") * col("n_nrm")), 6).cast(dec))
    scored.groupBy(col("label"))
      .agg(
        count(lit(1)).as("n_triplets"),
        round(sum(col("cos_ap")).cast("double") / count(lit(1)), 4)
          .as("avg_pos_cos"),
        round(sum(col("cos_an")).cast("double") / count(lit(1)), 4)
          .as("avg_neg_cos"),
        round((sum(col("cos_ap")) - sum(col("cos_an"))).cast("double") /
          count(lit(1)), 4).as("avg_margin"),
        sum(when(col("cos_ap") > col("cos_an"), 1L).otherwise(0L))
          .as("n_margin_positive"))
      .orderBy(col("label"))
  }

  /** q288 — KNESER-NEY CONTINUATION COUNTS (X198). The statistic KN
    * smoothing is built on: for each word, in how many DISTINCT
    * bigram contexts (distinct left neighbors) does it appear —
    * continuation probability p_cont(w) = |{prev : (prev,w) seen}| /
    * |distinct bigram types|. High-frequency words with few contexts
    * (collocation-bound) get LESS smoothed mass than their raw
    * counts suggest; this census is the corpus-side input. Top-20 by
    * context count (integer sort key; the rounded probability is
    * derived, never ordered on).
    *
    * Scale: in-row bigram expansion (no per-token shuffle of text —
    * bigram strings key the one distinct-shuffle), then a vocabulary-
    * bounded aggregate. The bigram-type total is the SUM of the
    * census counts (every distinct bigram lands in exactly one word
    * bucket), so the distinct frame is evaluated once, not twice.
    */
  def q288(s: SparkSession, d: String): DataFrame = {
    val cc = TokenStages.docToks(s, d)
      .select(expr("filter(toks, w -> length(w) > 0)").as("t"))
      .filter(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(2, size(t)), j -> concat_ws(' ', t[j-2], t[j-1]))"))
        .as("bg"))
      .distinct()
      .select(element_at(split(col("bg"), " "), 2).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n_contexts"))
    // tot via a broadcast 1-row aggregate of the census, NOT a
    // whole-frame window: the single-partition Window stage measured
    // ~0.4s slower than the broadcast nested-loop join here
    val tot = cc.agg(sum(col("n_contexts")).as("n_bigram_types"))
    cc.crossJoin(broadcast(tot))
      .select(col("word"), col("n_contexts"), col("n_bigram_types"),
        round(col("n_contexts").cast("double") /
          col("n_bigram_types").cast("double"), 6).as("p_continuation"))
      .orderBy(col("n_contexts").desc, col("word"))
      .limit(20)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q285_blocklist_audit" -> (q285 _),
    "q286_cluster_split" -> (q286 _),
    "q287_triplet_mining" -> (q287 _),
    "q288_kn_continuation" -> (q288 _))
}

/** DuckDB mirrors of Queries64. q286 splices the SAME generated
  * cluster CTEs as the q62/q77 oracles (OracleExt.lshPairCtes + the
  * recursive min-label walk) and q78's doc-split formula; q287
  * splices the q38 oracle's bucket/cosine helpers — none of the
  * shared stages can drift between queries.
  */
object Oracle64 {

  private val inList = Queries64.Blocklist.map(w => s"'$w'").mkString(", ")

  val sql: Map[String, String] = Map(
    "q285_blocklist_audit" ->
      s"""WITH t AS (SELECT source,
         |    list_filter(string_split(text, ' '), w -> length(w) > 0) AS toks
         |  FROM documents),
         |h AS (SELECT source, len(toks) AS n_toks,
         |    len(list_filter(toks, w -> w IN ($inList))) AS hits
         |  FROM t),
         |f AS (SELECT source, n_toks, hits,
         |    (hits * 100 > ${Queries64.BlockPctThreshold} * n_toks) AS flagged
         |  FROM h)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN flagged THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_flagged,
         |  CAST(sum(n_toks) AS BIGINT) AS total_tokens,
         |  CAST(sum(hits) AS BIGINT) AS blocklist_tokens,
         |  CAST(sum(CASE WHEN NOT flagged THEN n_toks ELSE 0 END) AS BIGINT)
         |    AS surviving_tokens,
         |  round(CAST(sum(CASE WHEN flagged THEN n_toks ELSE 0 END) AS DOUBLE)
         |    / CAST(sum(n_toks) AS DOUBLE), 4) AS removed_token_share
         |FROM f GROUP BY source ORDER BY source""".stripMargin,

    "q286_cluster_split" ->
      s"""WITH RECURSIVE ${OracleExt.lshPairCtes},
         |und AS (SELECT a_id AS src, b_id AS dst FROM pairs
         |        UNION ALL SELECT b_id, a_id FROM pairs),
         |nodes AS (SELECT DISTINCT src AS n FROM und),
         |walk(n, lbl) AS (
         |  SELECT n, n FROM nodes
         |  UNION
         |  SELECT und.dst, walk.lbl FROM walk JOIN und ON walk.n = und.src
         |  WHERE walk.lbl < und.dst
         |),
         |clu AS (SELECT n AS doc_id, min(lbl) AS cluster_id
         |  FROM walk GROUP BY n),
         |keyed AS (SELECT d.doc_id, d.n_chars,
         |    CASE WHEN ${OracleExt.md5long(
               "'split:' || CAST(coalesce(c.cluster_id, d.doc_id) AS VARCHAR)")}
         |        % 100 < 80 THEN 'train'
         |      WHEN ${OracleExt.md5long(
               "'split:' || CAST(coalesce(c.cluster_id, d.doc_id) AS VARCHAR)")}
         |        % 100 < 90 THEN 'val' ELSE 'test' END AS csplit,
         |    CASE WHEN ${OracleExt.md5long("d.text")} % 100 < 80 THEN 'train'
         |      WHEN ${OracleExt.md5long("d.text")} % 100 < 90 THEN 'val'
         |      ELSE 'test' END AS dsplit
         |  FROM documents d LEFT JOIN clu c ON d.doc_id = c.doc_id),
         |cleak AS (SELECT ka.csplit AS split, count(*) AS n_leaking_pairs
         |  FROM pairs p
         |  JOIN keyed ka ON p.a_id = ka.doc_id
         |  JOIN keyed kb ON p.b_id = kb.doc_id
         |  WHERE ka.csplit <> kb.csplit GROUP BY 1),
         |dleak AS (SELECT ka.dsplit AS split, count(*) AS n_leaking_pairs
         |  FROM pairs p
         |  JOIN keyed ka ON p.a_id = ka.doc_id
         |  JOIN keyed kb ON p.b_id = kb.doc_id
         |  WHERE ka.dsplit <> kb.dsplit GROUP BY 1),
         |cl AS (SELECT 'cluster' AS scheme, csplit AS split,
         |    count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS char_mass
         |  FROM keyed GROUP BY 2),
         |dl AS (SELECT 'doc' AS scheme, dsplit AS split,
         |    count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS char_mass
         |  FROM keyed GROUP BY 2)
         |SELECT cl.scheme, cl.split, cl.n_docs, cl.char_mass,
         |  CAST(coalesce(cleak.n_leaking_pairs, 0) AS BIGINT)
         |    AS n_leaking_pairs
         |FROM cl LEFT JOIN cleak ON cl.split = cleak.split
         |UNION ALL
         |SELECT dl.scheme, dl.split, dl.n_docs, dl.char_mass,
         |  CAST(coalesce(dleak.n_leaking_pairs, 0) AS BIGINT)
         |    AS n_leaking_pairs
         |FROM dl LEFT JOIN dleak ON dl.split = dleak.split
         |ORDER BY scheme, split""".stripMargin,

    "q287_triplet_mining" ->
      s"""WITH bk AS (SELECT vec_id, label, embedding,
         |    ${Oracle4.bucketSql("embedding")} AS bucket
         |  FROM embeddings),
         |nv AS (SELECT count(*) AS n_vecs FROM embeddings),
         |pos AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id, a.label,
         |    a.embedding AS a_emb,
         |    CAST(round(${OracleExt.cosine("a.embedding", "b.embedding")}, 6)
         |      AS DECIMAL(18,6)) AS cos_ap
         |  FROM bk a JOIN bk b
         |    ON a.label = b.label AND a.bucket = b.bucket
         |    AND a.vec_id < b.vec_id
         |  WHERE ${OracleExt.cosine("a.embedding", "b.embedding")} >= 0.30),
         |neg AS (SELECT pos.*, n_vecs,
         |    ${OracleExt.md5long("'trip:' || a_id || '_' || b_id")} AS h
         |  FROM pos, nv),
         |pick AS (SELECT a_id, b_id, label, a_emb, cos_ap,
         |    CASE WHEN h % n_vecs NOT IN (a_id, b_id) THEN h % n_vecs
         |      WHEN (h + 1) % n_vecs NOT IN (a_id, b_id) THEN (h + 1) % n_vecs
         |      ELSE (h + 2) % n_vecs END AS neg_id
         |  FROM neg),
         |scored AS (SELECT p.label, p.cos_ap,
         |    CAST(round(${OracleExt.cosine("p.a_emb", "e.embedding")}, 6)
         |      AS DECIMAL(18,6)) AS cos_an
         |  FROM pick p JOIN embeddings e ON e.vec_id = p.neg_id)
         |SELECT label, count(*) AS n_triplets,
         |  round(CAST(sum(cos_ap) AS DOUBLE) / count(*), 4) AS avg_pos_cos,
         |  round(CAST(sum(cos_an) AS DOUBLE) / count(*), 4) AS avg_neg_cos,
         |  round(CAST(sum(cos_ap) - sum(cos_an) AS DOUBLE) / count(*), 4)
         |    AS avg_margin,
         |  CAST(sum(CASE WHEN cos_ap > cos_an THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_margin_positive
         |FROM scored GROUP BY label ORDER BY label""".stripMargin,

    "q288_kn_continuation" ->
      """WITH t AS (SELECT
        |    list_filter(string_split(text, ' '), w -> length(w) > 0) AS t
        |  FROM documents),
        |bg AS (SELECT DISTINCT unnest(list_transform(range(2, len(t) + 1),
        |    i -> t[i-1] || ' ' || t[i])) AS bg
        |  FROM t WHERE len(t) >= 2),
        |cc AS (SELECT string_split(bg, ' ')[2] AS word,
        |    count(*) AS n_contexts
        |  FROM bg GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_contexts) AS BIGINT) AS n_bigram_types
        |  FROM cc)
        |SELECT word, n_contexts, n_bigram_types,
        |  round(CAST(n_contexts AS DOUBLE) / CAST(n_bigram_types AS DOUBLE),
        |    6) AS p_continuation
        |FROM cc, tot
        |ORDER BY n_contexts DESC, word LIMIT 20""".stripMargin)
}
