package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Ann

/** Dev scratchpad main for quick behavior probes (not part of the
  * library surface).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val emb = Tables.embeddings(spark, d)
    val probe = emb.filter(col("vec_id") === 0).select(col("embedding").as("probe_emb"))
    val scan = emb.filter(col("vec_id") =!= 0)
    println("== brute force top-5 ==")
    Ann.bruteForceTopK(scan, "vec_id", "embedding", probe, 5).show(false)
    println("== IVF nProbe=2/8 top-5 ==")
    Ann.ivfTopK(scan, "vec_id", "embedding", probe, 5, 8, 2).show(false)
    spark.stop()
  }
}
