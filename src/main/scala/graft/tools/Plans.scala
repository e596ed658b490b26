package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Prints formatted physical plans for the query inventory — the
  * explain-and-iterate loop (PushedFilters / ReadSchema / join
  * strategy / WholeStageCodegen spans).
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val only = args.toSet
    // HarnessConf (VERDICT r15 #4): join strategies in the printed
    // plans must reflect the bench session's 64 MB broadcast
    // threshold, not the 10 MB default
    val spark = graft.HarnessConf(SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.isEmpty || only.contains(name)) {
        println(s"\n========== $name ==========")
        try println(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        catch { case e: Throwable => println(s"explain failed: $e") }
      }
    }
    spark.stop()
  }
}
