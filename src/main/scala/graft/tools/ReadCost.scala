package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: how much does a repeated spark.read.parquet of the same
  * file cost (file listing + schema inference per call), vs reusing a
  * memoized DataFrame? Quantifies the per-query "build" floor that
  * PlanCost shows as ~0.09-0.11 s on every bench query.
  */
object ReadCost {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tables = Seq("lineitem", "documents", "events", "orders", "customer")
    // warm
    tables.foreach(t => spark.read.parquet(s"$sfDir/$t.parquet"))
    tables.foreach { t =>
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        spark.read.parquet(s"$sfDir/$t.parquet")
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$t read.parquet per call: ${times.min}%.4f s (min of 5)")
    }
    // memoized reuse: transformation on an existing frame
    val df = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val times = (1 to 5).map { _ =>
      val t0 = System.nanoTime()
      df.select("l_orderkey")
      (System.nanoTime() - t0) / 1e9
    }
    println(f"reuse+select per call: ${times.min}%.4f s (min of 5)")
    spark.stop()
  }
}
