package graft

/** Smoke + shape checks for every declared query at sf0.001. Value
  * correctness is the DuckDB oracle gate (tools/check_oracle.py); here
  * we pin row-count sanity and schema stability so regressions surface
  * in `sbt test` without the oracle round-trip.
  */
class QueriesSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs at sf0.001 and yields a stable schema") {
    val expectedCols = Map(
      "q01_scan_projection" -> Seq("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"),
      "q04_rms_group" -> Seq("user_id", "rms"),
      "q10_inload_features" -> Seq("user_id", "rms", "peak", "kurt"),
      "q22_multi_join_agg" -> Seq("c_mktsegment", "revenue", "n"),
      "q26_topk_users" -> Seq("user_id", "total"),
      "q29_cosine_topk" -> Seq("vec_id", "cosine")
    )
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      val n = df.count()
      // q24 (anti join) is legitimately empty on this fixture
      if (name != "q24_anti_join") assert(n > 0, s"$name returned 0 rows")
      expectedCols.get(name).foreach { cols =>
        assert(df.columns.toSeq == cols, s"$name schema drift")
      }
    }
  }

  test("every query has an oracle or is explicitly exempt") {
    // no-oracle entries (binary decode / FFT / SVD are not
    // DuckDB-expressible — SparkEntry.scala contract allows omission;
    // driver records a rows-only check)
    val exempt = Set("q48_multimodal_features", "q49_fft_features",
      "q50_pca_components")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- exempt
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  test("oracle keys all correspond to queries") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }

  test("q26 top-k is correctly ordered") {
    val totals = Queries.q26(spark, sf).collect().map(_.getDouble(1))
    assert(totals.sameElements(totals.sortBy(-_.toDouble)))
  }

  test("q28 sessionization: session ids start at 1 and increase") {
    val rows = Queries.q28(spark, sf).collect()
    val byUser = rows.groupBy(_.getLong(0))
    byUser.foreach { case (_, rs) =>
      val ids = rs.map(_.getLong(1)).sorted
      assert(ids.head == 1 && ids.last == ids.length, "session ids not 1..n")
    }
  }
}
