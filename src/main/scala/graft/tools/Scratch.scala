package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming.Pipeline

/** Dev scratchpad main for quick behavior probes (not part of the
  * library surface).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_pipe_drive_").toString
    val rows = (0 until 120).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(
        f"2024-01-01 00:${i / 4}%02d:${(i % 4) * 15}%02d"),
        if (i % 2 == 0) "M01" else "M02", "Good",
        Seq(10.0 + i, 11.0 + i, 9.0 + i, 20.0 + 2 * i))
    }
    rows.toDF("id", "ts", "machine", "status", "signal")
      .repartitionByRange(8, $"ts").write.parquet(s"$dir/src")
    val schema = spark.read.parquet(s"$dir/src").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/src")
    Pipeline.start(stream, s"$dir/lake", s"$dir/features", s"$dir/cp").awaitAll()
    println("lake rows: " + spark.read.parquet(s"$dir/lake").count())
    spark.read.parquet(s"$dir/lake")
      .select($"id", $"machine", $"day", $"outlier_check.is_valid",
        round($"features.time_domain.rms", 2).as("rms")).orderBy("id").show(3)
    println("feature windows:")
    spark.read.parquet(s"$dir/features").orderBy("window_start", "machine").show(6)
    spark.stop()
  }
}
