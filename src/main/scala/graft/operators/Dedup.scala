package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Deduplication operators for the large-scale training-data pipeline
  * surface (north-star X1): exact, MinHash+LSH, SimHash, n-gram
  * Jaccard. All are pure DataFrame programs — no driver-side loops —
  * so they scale with partitioning:
  *
  *  - exact: shuffle keyed on a 16-byte md5 fingerprint, never the body
  *  - minhash/LSH: per-row signature (narrow) + explode-by-band join;
  *    band buckets are the shuffle key, so only same-bucket docs meet
  *  - ngram-jaccard: inverted shingle index self-join; candidate pairs
  *    bounded by shingle co-occurrence, not |docs|^2
  */
object Dedup {

  /** Exact dedup: one representative (min id) + multiplicity per
    * distinct text. Groups by md5 fingerprint so the 100 TB shuffle
    * carries 16 bytes + id per row.
    */
  def exact(df: DataFrame, text: Column, id: Column): DataFrame =
    df.groupBy(Text.fingerprint(text).as("fp"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Per-document MinHash signature columns s0..s{k-1} over word
    * n-gram shingles.
    */
  def minhashSignature(df: DataFrame, text: Column, id: Column,
      n: Int, k: Int): DataFrame = {
    val sig = Text.minhashSignature(Text.shingles(text, n), k)
    val cols = (0 until k).map(i => element_at(col("sig"), i + 1).as(s"s$i"))
    df.select(id.as("doc_id"), sig.as("sig")).select(col("doc_id") +: cols: _*)
  }

  /** LSH banding: docs sharing any band bucket are candidate pairs.
    * k = bands * rowsPerBand hash families. Returns (a_id, b_id)
    * candidate pairs (a < b), deduped across bands.
    */
  def lshCandidates(df: DataFrame, text: Column, id: Column,
      n: Int, bands: Int, rowsPerBand: Int): DataFrame = {
    val k = bands * rowsPerBand
    val sigDf = df.select(id.as("doc_id"),
      Text.minhashSignature(Text.shingles(text, n), k).as("sig"))
    // band key = the slice of the signature owned by that band
    val banded = sigDf.select(col("doc_id"),
      posexplode(array((0 until bands).map(b =>
        array_join(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand), "_")): _*))
        .as(Seq("band", "bucket")))
    val a = banded.as("a"); val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
  }

  /** Exact n-gram Jaccard similarity for all pairs sharing at least one
    * shingle (inverted-index join), filtered at `minJaccard`.
    * |A∩B| from the join, |A| and |B| from per-doc distinct counts.
    */
  def ngramJaccardPairs(df: DataFrame, text: Column, id: Column,
      n: Int, minJaccard: Double): DataFrame = {
    val sh = df.select(id.as("doc_id"),
        explode(array_distinct(Text.shingles(text, n))).as("shingle"))
    val szs = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val inter = sh.as("a")
      .join(sh.as("b"), col("a.shingle") === col("b.shingle") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(szs.as("sa"), col("a_id") === col("sa.doc_id"))
      .join(szs.as("sb"), col("b_id") === col("sb.doc_id"))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("sa.n_sh") + col("sb.n_sh") - col("inter")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("a_id"), col("b_id"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Per-document SimHash bit fingerprint (as a bit string of length
    * `bits`). Near-dups differ in few bits; pair generation at scale
    * buckets on bit-band substrings exactly like minhash LSH.
    */
  def simhash(df: DataFrame, text: Column, id: Column, bits: Int): DataFrame =
    df.select(id.as("doc_id"),
      Text.simhashBits(Text.tokens(text), bits).as("simhash"))
}
