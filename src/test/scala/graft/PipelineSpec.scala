package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.Pipeline

/** End-to-end reference topology (SURVEY.md §3): file-backed telemetry
  * stream → enrichment → lake zone + windowed feature rows, both
  * checkpointed.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("full pipeline lands lake records and per-minute features") {
    val dir = Files.createTempDirectory("graft_pipe_").toString
    val src = s"$dir/src"
    val mkRow = (id: Long, t: String, m: String, base: Double) =>
      (id, ts(t), m, "Good", Seq(base, base + 1, base - 1, base * 2))
    // two machines over 30 minutes so early windows pass the 5-minute
    // watermark; several input files + maxFilesPerTrigger=1 gives
    // AvailableNow multiple micro-batches (append-mode windows flush
    // only when a LATER batch advances the watermark)
    val rows = (0 until 120).map { i =>
      mkRow(i.toLong, f"2024-01-01 00:${i / 4}%02d:${(i % 4) * 15}%02d",
        if (i % 2 == 0) "M01" else "M02", 10.0 + i)
    }
    rows.toDF("id", "ts", "machine", "status", "signal")
      .repartitionByRange(8, $"ts").write.parquet(src)
    val schema = spark.read.parquet(src).schema

    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    val running = Pipeline.start(stream, s"$dir/lake", s"$dir/features",
      s"$dir/cp")
    running.awaitAll()

    // lake zone: every record enriched, partitioned machine/day
    val lake = spark.read.parquet(s"$dir/lake")
    assert(lake.count() == 120)
    assert(lake.columns.contains("outlier_check")
      && lake.columns.contains("features") && lake.columns.contains("machine"))
    assert(lake.select($"machine").distinct().count() == 2)
    val one = lake.filter($"id" === 0).head()
    assert(!one.isNullAt(one.fieldIndex("quality_metrics")))

    // feature store: finalized 1-minute windows per machine (the last
    // windows stay open — watermark semantics — so strictly fewer
    // windows than minutes)
    val feats = spark.read.parquet(s"$dir/features")
    assert(feats.columns.toSet ==
      Set("window_start", "machine", "rms", "peak", "kurtosis", "n"))
    assert(feats.count() > 0)
    assert(feats.filter($"rms".isNull || $"rms" <= 0).count() == 0)

    // restart with no new input: exactly-once (nothing re-emitted)
    val again = Pipeline.start(
      spark.readStream.schema(schema).parquet(src),
      s"$dir/lake", s"$dir/features", s"$dir/cp")
    again.awaitAll()
    assert(spark.read.parquet(s"$dir/lake").count() == 120)
    assert(spark.read.parquet(s"$dir/features").count() == feats.count())
  }
}
