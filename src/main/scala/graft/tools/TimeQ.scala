package graft.tools
import org.apache.spark.sql.SparkSession
object TimeQ {
  def main(args: Array[String]): Unit = {
    // Bench session shape via HarnessConf (VERDICT r15 #4) so a TimeQ
    // reading predicts the bench plan, not a differently-configured twin
    val spark = graft.HarnessConf(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")).getOrCreate()
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
