package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{AsOf, Skew}

/** Dev scratchpad main for quick behavior probes (not part of the
  * library surface).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    // as-of: enrich each event with the latest PRIOR order of the same key
    val ev = Tables.events(spark, d).select(col("user_id"), col("ts"), col("value"))
    val ord = Tables.orders(spark, d)
      .select(col("o_custkey").as("user_id"), col("o_orderdate"), col("o_totalprice"))
    val enriched = AsOf.join(ev, ord, "user_id", "ts", "o_orderdate",
      Seq("o_totalprice"))
    println("asof rows: " + enriched.count())
    enriched.filter(col("o_totalprice").isNotNull)
      .orderBy("user_id", "ts").show(3, false)
    val stats = Skew.saltedStats(Tables.events(spark, d),
      col("event_type"), col("event_id"), col("value"), 8)
    stats.orderBy("key").show(false)
    spark.stop()
  }
}
