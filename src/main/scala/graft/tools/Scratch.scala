package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Enrich, Multimodal}
import graft.streaming.Streaming

/** Dev scratchpad main for quick behavior probes (not part of the
  * library surface).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // Library-surface drive: enrichment over a file-backed stream with
    // checkpoint restart (T1), exactly-once counts observed.
    val dir = Files.createTempDirectory("graft_drive_").toString
    val src = s"$dir/src"
    Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "Good",
        Seq(9.0, 19.0, -68.0, -29.0, 27.0, 74.0, -35.0, -11.0, 23.0, 3.0)),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:00:30"), "Bad",
        Seq(1.0, 2.0, 1.0, 2.0))
    ).toDF("id", "ts", "status", "signal").write.parquet(src)
    val schema = spark.read.parquet(src).schema

    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(src)
      val enriched = Enrich.pipeline(stream, "signal", "ts", "status")
        .select($"id", $"ts", $"outlier_check.is_valid",
          $"features.time_domain.rms", $"quality_metrics.data_quality_score")
      Streaming.runToParquet(enriched, s"$dir/out", s"$dir/cp").awaitTermination()
    }
    runOnce()
    println("after run1: " + spark.read.parquet(s"$dir/out").count())
    runOnce()
    println("after restart (exactly-once expected, still 2): " +
      spark.read.parquet(s"$dir/out").count())
    spark.read.parquet(s"$dir/out").orderBy("id").show(false)

    // Multimodal drive through the public API
    val feats = Multimodal.extractFeatures(Multimodal.synthMedia(spark, 10))
    feats.toDF().select($"media_id", $"kind", $"n_bytes", round($"byte_entropy", 3))
      .orderBy("media_id").show(5, false)
    spark.stop()
  }
}
