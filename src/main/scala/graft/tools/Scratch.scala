package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratchpad main for quick behavior probes (not part of the
  * library surface). Usage: runMain graft.tools.Scratch [queryName ...]
  * — times the named queries at SPARK_GRAFT_SF_DIR (default sf0.1)
  * under the Bench session shape; with no args it replays the driver
  * smoke check (vanilla session, every query at sf0.001).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    if (args.nonEmpty) {
      val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
      val spark = SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      args.foreach { name =>
        val fn = graft.SparkEntry.queries(name)
        (1 to 2).foreach { pass =>
          val t0 = System.nanoTime()
          val n = fn(spark, sfDir).count()
          println(f"$name pass $pass: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
        }
      }
      spark.stop()
      return
    }
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
    println(if (bad.isEmpty) s"all ${graft.SparkEntry.queries.size} queries OK under vanilla session"
      else s"FAILURES:\n${bad.mkString("\n")}")
    spark.stop()
  }
}
