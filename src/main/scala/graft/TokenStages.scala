package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Shared materialization of the text-census family's common prefix
  * (VERDICT r10 #2, the LshStages convention).
  *
  * q147 (unigram perplexity), q148 (PMI), q164 (BPE pair census),
  * q212 (bigram surprisal), q282 (BPE merge step)
  * and q288 (KN continuation) each started from the SAME corpus
  * (q281's Good-Turing census left this stage in round 13 for the
  * NgramHashes kernel — its 5-gram key never needs the token ARRAY,
  * only occurrence hashes, so the kernel pass beats the cached-array
  * detour)
  * tokenization (`split(text, ' ')` over `documents` — the repo's q30
  * convention), re-running it from the raw scan once per execution —
  * ~5.5 s summed on the round-10 driver window. A production pipeline
  * materializes the tokenized view once and fans the censuses out
  * from it; at 100 TB this is a written table (the ingest hop every
  * corpus-analytics stack pays once), here it is a per-(session, sf)
  * persisted stage like LshStages' candidate pairs.
  *
  * Equivalence stated per consumer at the call sites; Round11Spec
  * pins the arms against their from-scratch definitions.
  */
object TokenStages {

  private val toksCache = new SessionCache
  private val bigramCache = new SessionCache

  /** (doc_id, source, toks) — raw space-split token arrays, one row
    * per non-null-text document. Null-text docs contribute zero rows
    * to every consumer either way (explode/size of a null array), so
    * the upstream filter is consumer-invisible. Empty tokens are
    * KEPT: q147's vocabulary counts them, and each consumer applies
    * its own emptiness discipline exactly as before.
    */
  def docToks(s: SparkSession, d: String): DataFrame =
    toksCache.getOrCompute(s, d) {
      // `source` is required, not defaulted (ADVICE r11): a corpus
      // missing it must fail analysis loudly here — a silent
      // null-literal substitute would let q212/q164 aggregate the
      // whole corpus under one null source, plausible-but-wrong
      Tables.documents(s, d).filter(col("text").isNotNull)
        .select(col("doc_id"), col("source"),
          split(col("text"), " ").as("toks"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    }

  /** (source, l, r) — adjacent non-empty token pairs, the occurrence
    * frame q212 scores and q164 censuses (q164 aggregates over source,
    * so sharing the source-carrying frame is aggregation-invisible).
    * Docs with < 2 tokens contribute no pairs, as before.
    */
  def bigramOcc(s: SparkSession, d: String): DataFrame =
    bigramCache.getOrCompute(s, d) {
      docToks(s, d).filter(size(col("toks")) >= 2)
        .select(col("source"), explode(expr(
          "transform(slice(toks, 1, size(toks) - 1), " +
            "(x, i) -> struct(x AS l, element_at(toks, i + 2) AS r))"))
          .as("pr"))
        .select(col("source"), col("pr.l").as("l"), col("pr.r").as("r"))
        .filter(col("l") =!= "" && col("r") =!= "")
        .persist(StorageLevel.MEMORY_AND_DISK)
    }
}
