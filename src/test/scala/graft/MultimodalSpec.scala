package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.operators.Multimodal.FakeCodec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("synthetic media table has binary payloads + typed metadata") {
    val media = Multimodal.synthMedia(spark, 50)
    val schema = media.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
    val kinds = media.select($"meta.kind").distinct().as[String].collect().toSet
    assert(kinds == Set("image", "audio"))
  }

  test("feature extraction is deterministic, fixed-width, and distributed") {
    val media = Multimodal.synthMedia(spark, 100).repartition(7)
    val feats = Multimodal.extractFeatures(media)
    val rows = feats.collect()
    assert(rows.length == 100)
    assert(rows.forall(_.histogram.length == 16))
    // histogram is a distribution
    assert(rows.forall(r => math.abs(r.histogram.sum - 1.0) < 1e-9))
    // determinism across runs / partitionings
    val again = Multimodal.extractFeatures(Multimodal.synthMedia(spark, 100))
      .collect().map(r => r.media_id -> r.byte_entropy).toMap
    assert(rows.forall(r => math.abs(again(r.media_id) - r.byte_entropy) < 1e-12))
  }

  test("decode stub is shape-correct") {
    val meta = Multimodal.MediaMeta("image", 8, 4, 3, 0)
    val px = FakeCodec.decode(meta, Array[Byte](1, 2, 3))
    assert(px.length == 32)
    assert(px.forall(p => p >= 0 && p <= 255))
  }

  test("resize stub maps the grid") {
    val px = Array.tabulate(16)(identity) // 4x4
    val out = FakeCodec.resize(px, 4, 4, 2, 2)
    assert(out.toList == List(0, 2, 8, 10))
  }

  test("frame sampling stub") {
    assert(FakeCodec.sampleFrames(new Array[Byte](100), 10, 2).toList ==
      List(0, 20, 40, 60, 80))
  }

  test("multimodal join prunes payloads and joins on id") {
    val media = Multimodal.synthMedia(spark, 20)
    val feats = Multimodal.extractFeatures(media).toDF()
    val emb = Tables.embeddings(spark, sf)
    val joined = Multimodal.joinWithEmbeddings(feats, emb)
    assert(joined.count() == 20)
    assert(!joined.columns.contains("payload"))
    assert(joined.columns.contains("embedding") && joined.columns.contains("kind"))
  }
}
