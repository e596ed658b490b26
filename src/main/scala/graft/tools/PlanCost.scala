package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: per query, split wall time into plan-side
  * (analyze+optimize+physical-plan of the FINAL frame) vs total
  * execution, over 3 passes at SPARK_GRAFT_SF_DIR.
  */
object PlanCost {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { n =>
      graft.SparkEntry.queries(n)(spark, sfDir).count() // warm caches/arms
      (1 to 3).foreach { p =>
        val t0 = System.nanoTime()
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        val tBuild = System.nanoTime()
        df.queryExecution.executedPlan // force analysis+optimization+planning
        val tPlan = System.nanoTime()
        df.count()
        val tEnd = System.nanoTime()
        println(f"$n pass$p build ${(tBuild - t0) / 1e9}%.2f plan ${(tPlan - tBuild) / 1e9}%.2f exec ${(tEnd - tPlan) / 1e9}%.2f total ${(tEnd - t0) / 1e9}%.2f")
      }
    }
    spark.stop()
  }
}
