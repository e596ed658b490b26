package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.streaming.Kafka

/** Kafka message-envelope transforms (S3/S4/S8), tested broker-free on
  * binary key/value frames shaped like the connector's output.
  */
class KafkaEnvelopeSpec extends SparkSpec {
  import spark.implicits._

  val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", DoubleType),
    StructField("status", StringType)))

  private def envelope(rows: (String, String)*) =
    rows.toDF("k", "j").select(
      $"k".cast("binary").as("key"), $"j".cast("binary").as("value"))

  test("valid JSON parses into typed columns with the pinned schema") {
    val env = envelope(("1", """{"id":1,"v":2.5,"status":"Good"}"""))
    val out = Kafka.validRecords(Kafka.parseJsonMessages(env, schema))
    val r = out.head()
    assert(out.columns.toSeq == Seq("key", "id", "v", "status"))
    assert(r.getString(0) == "1" && r.getLong(1) == 1L && r.getDouble(2) == 2.5)
  }

  test("malformed JSON routes to the invalid split, not an exception") {
    val env = envelope(("1", """{"id":1,"v":2.5,"status":"Good"}"""),
      ("2", """{not json at all"""))
    val parsed = Kafka.parseJsonMessages(env, schema)
    assert(Kafka.validRecords(parsed).count() == 1)
    assert(Kafka.invalidJson(parsed).count() == 1)
    assert(Kafka.invalidJson(parsed).select($"key_str").as[String].head() == "2")
  }

  test("toEnvelope round-trips through parse") {
    val typed = Seq((7L, 1.5, "Good")).toDF("id", "v", "status")
    val env = Kafka.toEnvelope(typed, "id")
    assert(env.columns.toSeq == Seq("key", "value"))
    val back = Kafka.validRecords(Kafka.parseJsonMessages(
      env.select($"key".cast("binary").as("key"),
        $"value".cast("binary").as("value")), schema))
    val r = back.head()
    assert(r.getString(0) == "7" && r.getLong(1) == 7L
      && r.getDouble(2) == 1.5 && r.getString(3) == "Good")
  }

  test("source/sink option maps carry the reference's config") {
    val src = Kafka.sourceOptions("broker:9092", "cnc.raw",
      startingOffsets = "earliest", maxOffsetsPerTrigger = 100)
    assert(src("subscribe") == "cnc.raw")
    assert(src("maxOffsetsPerTrigger") == "100")
    assert(Kafka.sinkOptions("broker:9092", "cnc.processed")("topic") == "cnc.processed")
  }

  test("idempotent sink option hardens delivery without breaking the sink model") {
    val plain = Kafka.sinkOptions("b:9092", "t")
    assert(!plain.contains("kafka.enable.idempotence"), "default is plain at-least-once")
    val idem = Kafka.sinkOptions("b:9092", "t", idempotent = true)
    assert(idem("kafka.enable.idempotence") == "true")
    assert(idem("kafka.acks") == "all")
    // Spark's sink never drives the transaction API — a transactional.id
    // would break the first send, so it must never be emitted
    assert(!idem.contains("kafka.transactional.id"))
  }

  test("transactional producer conf carries the full exactly-once contract") {
    val conf = Kafka.transactionalProducerConf("b:9092", "graft-agg-0")
    // the three settings Kafka REQUIRES of a transactional producer
    assert(conf("transactional.id") == "graft-agg-0")
    assert(conf("enable.idempotence") == "true")
    assert(conf("acks") == "all")
    assert(conf("retries").toLong > 0)
    // raw kafka-clients keys for the foreachBatch-owned producer —
    // none of the Spark-sink "kafka." prefixes may leak in
    assert(conf.keys.forall(!_.startsWith("kafka.")), conf.keys.mkString(","))
    // distinct writers must be able to carry distinct fencing ids
    assert(Kafka.transactionalProducerConf("b:9092", "graft-agg-1")("transactional.id")
      != conf("transactional.id"))
  }

  test("read_committed source option completes the exactly-once hop") {
    val plain = Kafka.sourceOptions("b:9092", "t")
    assert(!plain.contains("kafka.isolation.level"),
      "default consumer stays read_uncommitted")
    val rc = Kafka.sourceOptions("b:9092", "t", readCommitted = true)
    assert(rc("kafka.isolation.level") == "read_committed")
    // the rest of the consumer contract is unchanged by the flag
    assert(rc("subscribe") == "t" && rc("failOnDataLoss") == "false")
  }
}
