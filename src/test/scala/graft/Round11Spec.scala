package graft

import org.apache.spark.sql.functions._

/** Round-11 pins: the TokenStages shared-census arm equals its
  * from-scratch definition (the LshStages-style equivalence every
  * shared-arm speedup rests on), and the q287 contiguous-id invariant
  * the DuckDB oracle cannot see (ADVICE r10 — both engines would drop
  * the same triplets on a sparse id space, so only an in-suite
  * assertion fails loudly).
  */
class Round11Spec extends SparkSpec {

  test("q287 invariant: embeddings vec_id is contiguous [0, n)") {
    for (dir <- Seq(sf, "/root/testdata/sf0.01")) {
      val r = Tables.embeddings(spark, dir)
        .agg(count(lit(1)).as("n"),
          count_distinct(col("vec_id")).as("nd"),
          min(col("vec_id")).as("lo"),
          max(col("vec_id")).as("hi"))
        .collect().head
      assert(r.getLong(0) == r.getLong(1) && r.getLong(2) == 0L &&
        r.getLong(3) == r.getLong(0) - 1,
        s"$dir: vec_id not contiguous [0, n): n=${r.getLong(0)} " +
          s"distinct=${r.getLong(1)} min=${r.getLong(2)} max=${r.getLong(3)}")
    }
  }

  test("TokenStages.docToks == raw split over non-null-text documents") {
    val arm = TokenStages.docToks(spark, sf)
    val fresh = Tables.documents(spark, sf).filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("toks"))
    assert(arm.count() == fresh.count())
    assert(arm.exceptAll(fresh).isEmpty && fresh.exceptAll(arm).isEmpty)
  }

  test("TokenStages.bigramOcc == the from-scratch q212 occurrence frame") {
    val arm = TokenStages.bigramOcc(spark, sf)
    val fresh = Tables.documents(spark, sf).filter(col("text").isNotNull)
      .select(col("source"), graft.functions.Text.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("source"), explode(expr(
        "transform(slice(t, 1, size(t) - 1), " +
          "(x, i) -> struct(x AS l, element_at(t, i + 2) AS r))")).as("pr"))
      .select(col("source"), col("pr.l").as("l"), col("pr.r").as("r"))
      .filter(col("l") =!= "" && col("r") =!= "")
    assert(arm.count() == fresh.count())
    // multiset equality (occurrence rows repeat): exceptAll both ways
    assert(arm.exceptAll(fresh).isEmpty && fresh.exceptAll(arm).isEmpty)
  }

  test("q164 census over the shared arm == the sourceless from-scratch census") {
    val viaArm = TokenStages.bigramOcc(spark, sf)
      .groupBy(col("l"), col("r")).agg(count(lit(1)).as("n"))
    val fresh = Tables.documents(spark, sf).filter(col("text").isNotNull)
      .select(graft.functions.Text.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(slice(t, 1, size(t) - 1), " +
          "(x, i) -> struct(x AS l, element_at(t, i + 2) AS r))")).as("pr"))
      .select(col("pr.l").as("l"), col("pr.r").as("r"))
      .filter(col("l") =!= "" && col("r") =!= "")
      .groupBy(col("l"), col("r")).agg(count(lit(1)).as("n"))
    assert(viaArm.exceptAll(fresh).isEmpty && fresh.exceptAll(viaArm).isEmpty)
  }
}
