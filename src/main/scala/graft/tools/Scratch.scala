package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Text
import graft.operators.Dedup

/** Dev scratchpad main for quick behavior probes (not part of the
  * library surface).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$d/documents.parquet")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    time("warm")(docs.count())
    val cur = Dedup.ngramJaccardPairs(docs, col("text"), col("doc_id"), 3, 0.12)
    time("join version r1")(cur.count())
    time("join version r2")(cur.count())

    // bucket-collect variant: one shuffle on shingle hash, pairs
    // generated inside each bucket, then one shuffle on the pair
    val base = docs.select(col("doc_id"),
      array_distinct(Text.shingles(col("text"), 3)).as("shs"))
    val sh = base.select(col("doc_id"), size(col("shs")).as("n_sh"),
      explode(col("shs")).as("s"))
      .select(struct(col("doc_id"), col("n_sh")).as("dn"), xxhash64(col("s")).as("h"))
    val buckets = sh.groupBy(col("h")).agg(collect_list(col("dn")).as("ds"))
      .filter(size(col("ds")) > 1)
    val pairs = buckets.select(explode(flatten(
      transform(col("ds"), (a, i) =>
        transform(slice(col("ds"), i + 2, size(col("ds"))), b =>
          when(a.getField("doc_id") < b.getField("doc_id"), struct(a.as("a"), b.as("b")))
            .otherwise(struct(b.as("a"), a.as("b"))))))).as("p"))
    val agg = pairs.groupBy(col("p.a.doc_id").as("a_id"), col("p.b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("inter"),
        max(col("p.a.n_sh")).as("na"), max(col("p.b.n_sh")).as("nb"))
      .withColumn("jaccard", col("inter").cast("double") /
        (col("na") + col("nb") - col("inter")).cast("double"))
      .filter(col("jaccard") >= 0.12)
    time("bucket version r1")(agg.count())
    time("bucket version r2")(agg.count())
    println("counts equal: " + (cur.count() == agg.count()))
    spark.stop()
  }
}
