package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Kafka source/sink wiring (reference S3/S4: consumer groups, offset
  * control, keyed JSON messages — README.md:197-209, 265-270;
  * FeatureEngineeringApproaches.md:126-152 routine-load source).
  *
  * The message-level transforms (envelope → typed columns via
  * from_json with an EXPLICIT schema, malformed → DLQ, typed →
  * envelope via to_json) are plain DataFrame programs, testable
  * without a broker. The broker hookup is isolated in `source`/`sink`
  * (this image ships no kafka connector jar; on a real cluster the
  * same code runs unchanged with spark-sql-kafka on the classpath).
  */
object Kafka {

  /** Matches the reference consumer config: explicit offsets, bounded
    * per-trigger batches (README.md:197-204, maxOffsetsPerTrigger ↔
    * BATCH_SIZE at README.md:325).
    */
  def sourceOptions(bootstrap: String, topic: String,
      startingOffsets: String = "earliest",
      maxOffsetsPerTrigger: Long = 10000L): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrap,
    "subscribe" -> topic,
    "startingOffsets" -> startingOffsets,
    "maxOffsetsPerTrigger" -> maxOffsetsPerTrigger.toString,
    "failOnDataLoss" -> "false")

  def source(spark: SparkSession, bootstrap: String, topic: String): DataFrame =
    sourceOptions(bootstrap, topic).foldLeft(
      spark.readStream.format("kafka"))((r, kv) => r.option(kv._1, kv._2))
      .load()

  /** Kafka envelope (key/value binary) → typed columns. Schema is
    * pinned explicitly (never inferred — the jsonpath discipline,
    * FeatureEngineeringApproaches.md:134-147). from_json is PERMISSIVE
    * (malformed → all-null struct), so validity = at least one pinned
    * field materialized; rows with none route to the DLQ split.
    */
  def parseJsonMessages(envelope: DataFrame, schema: StructType): DataFrame = {
    val parsed = from_json(col("value").cast("string"), schema)
    val anyField = schema.fieldNames
      .map(f => col("parsed").getField(f).isNotNull)
      .reduce(_ || _)
    envelope
      .withColumn("key_str", col("key").cast("string"))
      .withColumn("parsed", parsed)
      .withColumn("__json_ok", col("parsed").isNotNull && anyField)
  }

  /** The malformed-message split (→ retry/DLQ path, README.md:372-391). */
  def invalidJson(parsed: DataFrame): DataFrame =
    parsed.filter(!col("__json_ok"))

  def validRecords(parsed: DataFrame): DataFrame =
    parsed.filter(col("__json_ok"))
      .select(col("key_str").as("key"), col("parsed.*"))

  /** Typed rows → keyed JSON envelope (README.md:265-270: producer
    * keyed by record id so one key lands in one partition).
    */
  def toEnvelope(df: DataFrame, keyCol: String): DataFrame =
    df.select(
      col(keyCol).cast("string").as("key"),
      to_json(struct(df.columns.map(col): _*)).as("value"))

  /** Sink options. Default delivery is at-least-once (Spark's Kafka
    * sink may reproduce a batch after a retry); `transactionalId`
    * upgrades the producer to Kafka transactions + idempotence, which
    * with `isolation.level=read_committed` consumers gives end-to-end
    * exactly-once — the guarantee the reference CLAIMS (README.md:66,
    * 124) but its commit-after-produce loop cannot deliver
    * (README.md:265-273). The lake path (streaming.Pipeline) is
    * exactly-once by construction (checkpoint + idempotent files,
    * PipelineSpec); this option extends the story to Kafka-to-Kafka
    * topologies. Broker-less container: wiring is config-only, covered
    * by KafkaEnvelopeSpec's option assertions.
    */
  def sinkOptions(bootstrap: String, topic: String,
      transactionalId: Option[String] = None): Map[String, String] = {
    val base = Map(
      "kafka.bootstrap.servers" -> bootstrap,
      "topic" -> topic)
    transactionalId.fold(base)(tid => base ++ Map(
      "kafka.transactional.id" -> tid,
      "kafka.enable.idempotence" -> "true",
      // transactions must outlive the longest micro-batch retry
      "kafka.transaction.timeout.ms" -> "900000"))
  }
}
