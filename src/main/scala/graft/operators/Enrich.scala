package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Signal
import graft.ml.Fft

/** The reference's record-enrichment pipeline (§3.1): four chained
  * stages, each appending a struct to the payload — outlier check →
  * time/frequency features → quality metrics — producing the
  * fully-processed nested record of README.md:501-539 (FIXTURES.md §B4
  * schema golden).
  *
  * One narrow Spark pipeline: no shuffle, whole plan fuses into a
  * single WholeStageCodegen span (plus the one UDF for FFT). The same
  * code runs on batch DataFrames and Structured Streaming frames —
  * that is the point of declaring it on the DataFrame API.
  *
  * Expected input columns: an ArrayType(Double) signal column, an
  * event-time timestamp column, and a status string column.
  */
object Enrich {

  val ProcessingVersion = "1.0"

  /** Stage 1 — outlier check (README.md:434-449): z-score of the
    * signal's extremes against its own mean/stddev; is_valid mirrors
    * the reference's `return null` drop semantics (filter downstream).
    * outlier_score = fraction-like score in [0,1] from the max |z|.
    */
  def outlierCheck(signal: Column): Column = {
    val n = size(signal).cast("double")
    val mean = aggregate(signal, lit(0.0), (a, v) => a + v) / n
    val varr = aggregate(transform(signal, x => (x - mean) * (x - mean)),
      lit(0.0), (a, v) => a + v) / n
    val sd = sqrt(varr)
    val maxAbsZ = when(sd > 0,
      array_max(transform(signal, x => abs(x - mean))) / sd).otherwise(lit(0.0))
    struct(
      (maxAbsZ <= 4.0).as("is_valid"),
      round(least(maxAbsZ / lit(10.0), lit(1.0)), 4).as("outlier_score"))
  }

  /** Stage 2 — signal features (README.md:451-470): time-domain
    * rms/peak/peak-to-peak/crest + frequency-domain dominant_freq and
    * spectral_energy.
    */
  def features(signal: Column, sampleRateHz: Double): Column = {
    val rms = sqrt(Signal.arraySumSq(signal) / size(signal))
    val peak = array_max(transform(signal, x => abs(x)))
    val ptp = array_max(signal) - array_min(signal)
    struct(
      struct(
        rms.as("rms"),
        peak.as("peak"),
        ptp.as("peak_to_peak"),
        (peak / rms).as("crest_factor")).as("time_domain"),
      struct(
        Fft.dominant_freq(signal, lit(sampleRateHz)).as("dominant_freq"),
        Fft.spectral_energy(signal).as("spectral_energy")).as("frequency_domain"))
  }

  /** Stage 4 — quality metrics (README.md:485-499): completeness =
    * fraction of required fields present, consistency flag, version +
    * processing timestamp stamps.
    */
  def qualityMetrics(requiredCols: Seq[Column], consistency: Column): Column = {
    val present = requiredCols.map(c => when(c.isNull, 0.0).otherwise(1.0))
    val completeness = present.reduce(_ + _) / lit(requiredCols.size.toDouble)
    struct(
      round(completeness, 4).as("completeness"),
      consistency.as("consistency"),
      round((completeness + consistency.cast("double")) / 2.0, 4)
        .as("data_quality_score"),
      lit(ProcessingVersion).as("processing_version"),
      current_timestamp().as("processing_timestamp"))
  }

  /** Full pipeline: raw frame + signal column → enriched nested record
    * (raw fields preserved under `raw_data`, per README.md:503-511).
    * Invalid rows are KEPT with is_valid=false; callers route them
    * (Streaming.dlqSplit) or drop them — matching the reference's
    * filter-first stage order without losing the DLQ path.
    */
  def pipeline(df: DataFrame, signalCol: String, tsCol: String,
      statusCol: String, sampleRateHz: Double = 2000.0): DataFrame = {
    val sig = col(signalCol)
    df.withColumn("outlier_check", outlierCheck(sig))
      .withColumn("features", features(sig, sampleRateHz))
      .withColumn("quality_metrics", qualityMetrics(
        Seq(sig, col(tsCol), col(statusCol)),
        col(statusCol) === "Good"))
  }
}
