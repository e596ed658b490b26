package graft.tools
import org.apache.spark.sql.SparkSession
object TimeQ {
  def main(args: Array[String]): Unit = {
    // mirror the Bench session confs (64 MB broadcast threshold,
    // surface-sized codegen cache) so a TimeQ reading predicts the
    // bench plan, not a differently-configured twin
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "67108864")
      .config("spark.sql.codegen.cache.maxEntries", "8192")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = args.toSeq
    names.foreach { n => graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count() }
    (1 to 3).foreach { p =>
      names.foreach { n =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.1").count()
        println(f"pass$p $n ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
