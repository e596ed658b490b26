package graft

class RegisterSpec extends SparkSpec {

  test("custom kernels are callable from spark.sql") {
    Register.all(spark)
    val r = spark.sql(
      """SELECT
        |  graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dot,
        |  graft_sumsq(array(3.0D, 4.0D)) AS ss,
        |  size(graft_shingle_hashes('a b c d', 3)) AS n_sh,
        |  graft_spectral_energy(array(1.0D, 2.0D)) AS se,
        |  size(graft_md5_shingle_hashes('a b c d', 3)) AS n_mh,
        |  graft_shingle_strings('a b c d', 3) AS shs,
        |  graft_simhash('hello world', 16) AS sh
        |""".stripMargin).head()
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 25.0)
    assert(r.getInt(2) == 2)
    assert(math.abs(r.getDouble(3) - 5.0) < 1e-9)
    assert(r.getInt(4) == 2)
    assert(r.getSeq[String](5) == Seq("a b c", "b c d"))
    assert(r.getLong(6) >= 0L && r.getLong(6) < (1L << 16))
  }

  test("SQL query over a table using registered kernels") {
    Register.all(spark)
    Tables.embeddings(spark, sf).createOrReplaceTempView("emb")
    val top = spark.sql(
      """SELECT e.vec_id,
        |  graft_dot(e.embedding, p.embedding)
        |    / (sqrt(graft_sumsq(e.embedding)) * sqrt(graft_sumsq(p.embedding))) AS cos
        |FROM emb e JOIN emb p ON p.vec_id = 0 AND e.vec_id <> 0
        |ORDER BY cos DESC LIMIT 3""".stripMargin)
    assert(top.count() == 3)
    val cols = top.collect().map(_.getDouble(1))
    assert(cols.sameElements(cols.sortBy(-_)))
  }

  test("graft_hll aggregate: SQL form == Column form, near the exact count") {
    Register.all(spark)
    Tables.events(spark, sf).createOrReplaceTempView("ev_hll")
    val viaSql = spark.sql(
      """SELECT event_type, graft_hll(CAST(user_id AS STRING), 8) AS est
        |FROM ev_hll GROUP BY event_type ORDER BY event_type""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val viaCol = Tables.events(spark, sf)
      .groupBy(org.apache.spark.sql.functions.col("event_type"))
      .agg(graft.functions.SketchAggregates.hll_estimate(
        org.apache.spark.sql.functions.col("user_id").cast("string"), 8)
        .as("est"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(viaSql == viaCol)
    val exact = Tables.events(spark, sf)
      .groupBy(org.apache.spark.sql.functions.col("event_type"))
      .agg(org.apache.spark.sql.functions.count_distinct(
        org.apache.spark.sql.functions.col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    viaSql.foreach { case (k, est) =>
      assert(math.abs(est - exact(k)) / exact(k) < 0.195, s"$k: $est vs ${exact(k)}")
    }
  }

  test("graft_qsketch aggregate: SQL form == Column form, within the 2^-s bound") {
    import org.apache.spark.sql.functions.{col => c}
    Register.all(spark)
    Tables.documents(spark, sf).createOrReplaceTempView("docs_qs")
    val viaSql = spark.sql(
      """SELECT lang, graft_qsketch(CAST(n_chars AS BIGINT), 0.5, 5) AS p50
        |FROM docs_qs GROUP BY lang ORDER BY lang""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaCol = Tables.documents(spark, sf)
      .groupBy(c("lang"))
      .agg(graft.functions.SketchAggregates.qsketch_quantile(
        c("n_chars").cast("long"), 0.5, 5).as("p50"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaSql == viaCol)
    // sanity vs the interpolated median: the lower-edge decode sits
    // at or below it (the tight 2^-s bound vs the RANK element is
    // proven in PropertySpec; here the point is SQL-surface parity)
    val exact = Tables.documents(spark, sf)
      .groupBy(c("lang"))
      .agg(org.apache.spark.sql.functions.percentile(
        c("n_chars"), org.apache.spark.sql.functions.lit(0.5)).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    viaSql.foreach { case (k, est) =>
      assert(est > 0 && est <= exact(k) + 1, s"$k: $est vs exact ${exact(k)}")
    }
  }
}
