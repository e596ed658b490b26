package graft

import org.apache.spark.sql.functions._

/** Properties of the round-5 curation/layout operators (Queries6) that
  * the DuckDB hash match can't express: the Z-order locality bound,
  * the int8 quantization error bound, packing conservation, and
  * budget-sample maximality.
  */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  test("q107 z-order: every 4-bit prefix bucket spans at most a quarter " +
    "of each dimension's bucket range") {
    val rows = Queries6.q107(spark, sf).collect()
    assert(rows.nonEmpty)
    // 5-bit dims interleaved to a 10-bit key; dropping the low 6 bits
    // keeps the top 2 bits of EACH dim, so a prefix cell is an
    // 8x8 sub-rectangle: max-min <= 7 in both dimensions.
    rows.foreach { r =>
      val daySpan = r.getAs[Long]("max_day") - r.getAs[Long]("min_day")
      val vbSpan = r.getAs[Long]("max_vb") - r.getAs[Long]("min_vb")
      assert(daySpan <= 7, s"day span $daySpan in prefix ${r.get(0)}")
      assert(vbSpan <= 7, s"vb span $vbSpan in prefix ${r.get(0)}")
    }
  }

  test("q104 quantization: per-element error <= scale/2 and cosine ~ 1") {
    val per = Tables.embeddings(spark, sf).select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("mx",
        aggregate(col("v"), lit(0.0), (acc, x) => greatest(acc, abs(x))))
      .filter(col("mx") > 0)
      .withColumn("qscale", col("mx") / lit(127.0))
      .withColumn("maxerr", aggregate(
        zip_with(col("v"),
          transform(col("v"), x =>
            floor(x / col("qscale") + lit(0.5)) * col("qscale")),
          (a, b) => abs(a - b)),
        lit(0.0), (acc, x) => greatest(acc, x)))
      .select(max(col("maxerr") / col("qscale")).as("worst"))
      .head()
    // floor(x+0.5) rounds to nearest: error at most scale/2 (+ eps)
    assert(per.getAs[Double]("worst") <= 0.5 + 1e-9)

    val cosines = Queries6.q104(spark, sf).collect()
    assert(cosines.nonEmpty)
    cosines.foreach { r =>
      assert(r.getAs[Double]("avg_cosine") > 0.999,
        s"label ${r.get(0)} cosine ${r.getAs[Double]("avg_cosine")}")
    }
  }

  test("q103 packing conserves tokens and never splits a document") {
    val packs = Queries6.q103(spark, sf)
    val total = packs.agg(sum(col("tokens"))).head().getLong(0)
    val docsTotal = Tables.documents(spark, sf)
      .agg(sum(size(split(col("text"), " ")).cast("long"))).head().getLong(0)
    assert(total == docsTotal, "packed token total != corpus token total")
    val docsPacked = packs.agg(sum(col("n_docs"))).head().getLong(0)
    val nDocs = Tables.documents(spark, sf).count()
    assert(docsPacked == nDocs, "every document lands in exactly one pack")
  }

  test("q108 budget sample is maximal: kept docs start under budget, " +
    "and the first excluded doc per lang would not") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("lang"),
      size(split(col("text"), " ")).cast("long").as("tok"),
      md5(col("doc_id").cast("string")).as("h"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("h"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val all = docs.withColumn("cum_before",
      coalesce(sum(col("tok")).over(w), lit(0L)))
    val kept = Queries6.q108(spark, sf)
    // every kept row starts under budget; every excluded row at/over it
    assert(kept.filter(col("cum_before") >= 2000L).isEmpty)
    val excludedUnder = all.join(kept.select(col("doc_id")), Seq("doc_id"),
      "left_anti").filter(col("cum_before") < 2000L)
    assert(excludedUnder.isEmpty, "a doc under budget was excluded")
  }

  test("q106 chunking covers each document exactly: stride-aligned " +
    "chunk count and full tail") {
    val chunks = Queries6.q106(spark, sf)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_chunks"),
        max(col("chunk_idx")).as("last_idx"), max(col("chunk_len")).as("max_len"))
    val joined = Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars")).join(chunks, Seq("doc_id"))
    val bad = joined.filter(
      col("n_chunks") =!= ceil(col("n_chars") / lit(150.0)).cast("long") ||
        col("last_idx") =!= col("n_chunks") - 1 ||
        col("max_len") > 200)
    assert(bad.isEmpty)
  }

  test("q105 overlap matrix row total equals the candidate pair count") {
    val pairs = LshStages.candidatePairs(spark, sf).count()
    val matrixTotal = Queries6.q105(spark, sf)
      .agg(sum(col("n_pairs"))).head().getLong(0)
    assert(matrixTotal == pairs)
  }

  test("q109 centroid cosines are within [-1, 1] and cover all label pairs") {
    val rows = Queries6.q109(spark, sf).collect()
    val nLabels = Tables.embeddings(spark, sf)
      .select(col("label")).distinct().count()
    assert(rows.length == nLabels * (nLabels - 1) / 2)
    rows.foreach { r =>
      val c = r.getAs[Double]("cosine")
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
    }
  }

  test("q110 bloom prefilter is answer-invisible: equals the exact " +
    "contamination join with no bloom in the plan") {
    import graft.functions.{Text, TextExpressions}
    val got = Queries7.q110(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // the same screen with NO bloom: plain exact inner join
    val h = Tables.documents(spark, sf)
      .select(col("doc_id"),
        pmod(Text.md5Long(col("text")), lit(100L)).as("b"),
        explode(TextExpressions.md5_shingle_hashes(col("text"), 7)).as("h"))
      .distinct()
    val bench = h.filter(col("b") >= 90).select(col("h").as("bh")).distinct()
    val exact = h.filter(col("b") < 90).select(col("doc_id"), col("h"))
      .join(bench, col("h") === col("bh"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == exact, s"bloom=${got.take(5)} exact=${exact.take(5)}")
  }

  test("q113 calibration: estimator error is bounded by the 8-family " +
    "resolution on every candidate pair") {
    val rows = Queries7.q113(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Double]("est_jaccard")
      assert(est >= 0.0 && est <= 1.0)
      // 8 families quantize the estimate to eighths
      assert(math.abs(est * 8 - math.round(est * 8)) < 1e-9, est.toString)
      val ex = r.getAs[Double]("exact_jaccard")
      assert(ex >= 0.0 && ex <= 1.0)
    }
  }
}
