package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (round 16, VERDICT r15 #6): decompose q125's wall time —
  * candidate generation vs verify-join vs full pipeline — in the
  * Bench session shape, after the shared LshStages are materialized,
  * min-of-5 per phase. Identifies which stage still owns the ~1.8 s
  * before any further tuning is attempted.
  */
object P125 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.HarnessConf(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm the shared stages + codegen
    graft.SparkEntry.queries("q125_prefix_similarity_join")(spark, sfDir).count()
    val posted = graft.LshStages.dfPostings(spark, sfDir)
    val sets = graft.LshStages.docShingleSets(spark, sfDir)
    def time(label: String)(f: => Long): Unit = {
      (1 to 2).foreach(_ => f)
      var rows = 0L
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); rows = f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-46s ${ts.min}%.3f s  ($rows rows)")
    }
    val tNum = 4; val tDen = 5
    val need = col("n") -
      floor((col("n") * lit(tNum) + lit(tDen - 1)) / lit(tDen)) + 1
    val prefix = posted.filter(col("pos") <= need)
    time("prefix postings (filter over cached stage)")(prefix.count())
    val cand = graft.operators.Dedup.pairStatsFromPostings(prefix)
      .filter(col("nb") * tDen >= col("na") * tNum &&
        col("na") * tDen >= col("nb") * tNum)
      .select(col("a_id"), col("b_id"), col("na"), col("nb"))
    time("candidates (pairStats + length rule)")(cand.count())
    // flood-branch overhead isolation: the collect_list bucket
    // aggregate once, the small-bucket pairs branch alone, and the
    // full two-branch union — the deltas attribute the candidate
    // stage's cost between the aggregate itself, Combos expansion,
    // and the (empty-on-this-corpus) flood fallback's extra
    // aggregates + self-join
    val sh = prefix.select(
      struct(col("doc_id"), col("n").as("n_sh")).as("dn"),
      col("tok").as("h"))
    val buckets0 = sh.groupBy(col("h"))
      .agg(sort_array(collect_list(col("dn"))).as("ds"))
      .filter(size(col("ds")) > 1)
    time("bucket aggregate alone (1x collect_list)")(buckets0.count())
    val pairsOnly = buckets0.filter(size(col("ds")) <= 8192).select(explode(
        graft.functions.TextExpressions.combos(col("ds"), 2)).as("p"))
      .groupBy(col("p.a.doc_id").as("a_id"), col("p.b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("inter"),
        max(col("p.a.n_sh")).as("na"), max(col("p.b.n_sh")).as("nb"))
    time("pairs branch only (no flood union)")(pairsOnly.count())
    val joined = cand
      .join(sets.select(col("doc_id").as("a_id"), col("shs").as("shs_a")),
        Seq("a_id"))
      .join(sets.select(col("doc_id").as("b_id"), col("shs").as("shs_b")),
        Seq("b_id"))
    time("verify joins only (no intersect)")(joined.count())
    time("verify joins + intersect + filter (full tail)")(
      joined.select(col("a_id"), col("b_id"),
          graft.functions.VectorExpressions
            .intersect_size(col("shs_a"), col("shs_b")).as("i"),
          col("na"), col("nb"))
        .filter(col("i").cast("double") / (col("na") + col("nb") - col("i"))
          >= lit(tNum.toDouble / tDen)).count())
    time("full q125 (registered query incl. orderBy)")(
      graft.SparkEntry.queries("q125_prefix_similarity_join")(spark, sfDir)
        .count())
    spark.stop()
  }
}
