package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratchpad main for quick behavior probes (not part of the
  * library surface).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    // simulate the driver's smoke check: vanilla session, entry() rows>0
    val spark = SparkSession.builder().master("local[2]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"entry rows: $n (>0: ${n > 0})")
    // and every query parses+runs at sf0.001 under the same session
    val bad = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, "/root/testdata/sf0.001").count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(80)}") }
    }
    println(if (bad.isEmpty) "all 54 queries OK under vanilla session"
      else s"FAILURES:\n${bad.mkString("\n")}")
    spark.stop()
  }
}
