package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.operators.Multimodal.Codec

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

  test("image payloads are genuine PNG containers") {
    val pngMagic = Array(0x89, 0x50, 0x4e, 0x47).map(_.toByte)
    val imgs = Multimodal.synthMedia(spark, 30)
      .filter($"meta.kind" === "image").collect()
    assert(imgs.nonEmpty)
    assert(imgs.forall(_.payload.take(4).sameElements(pngMagic)))
  }

  test("PNG encode -> ImageIO decode round-trip is bit-exact") {
    val (w, h) = (11, 7)
    val pixels = Array.tabulate(w * h)(j => (j * 37 + 5) % 256)
    val png = Codec.encodePng(w, h, pixels)
    assert(Codec.decodeImage(png).toList == pixels.toList)
  }

  test("feature extraction decodes real pixels, deterministic, fixed-width, distributed") {
    val media = Multimodal.synthMedia(spark, 100).repartition(7)
    val feats = Multimodal.extractFeatures(media)
    val rows = feats.collect()
    assert(rows.length == 100)
    assert(rows.forall(_.histogram.length == 16))
    // histogram is a distribution
    assert(rows.forall(r => math.abs(r.histogram.sum - 1.0) < 1e-9))
    // decoded counts: image = w*h pixels, audio = plen samples; the
    // PNG container is larger than zero and != the pixel count
    rows.foreach { r =>
      val id = r.media_id
      val (w, h, plen) = (8 + (id % 5).toInt, 8 + (id % 3).toInt,
        64 + (id % 17).toInt * 7)
      if (r.kind == "image") {
        assert(r.n_px == w * h)
        assert(r.n_bytes > 0) // real container size
      } else assert(r.n_px == plen && r.n_bytes == plen)
      // decoded content equals the generation formula (PNG lossless)
      val want = (0 until r.n_px)
        .map(j => ((id * 131 + (j % plen) * 31 + 7) % 251).toDouble)
      assert(math.abs(r.byte_mean - want.sum / r.n_px) < 1e-9)
    }
    // determinism across runs / partitionings
    val again = Multimodal.extractFeatures(Multimodal.synthMedia(spark, 100))
      .collect().map(r => r.media_id -> r.byte_entropy).toMap
    assert(rows.forall(r => math.abs(again(r.media_id) - r.byte_entropy) < 1e-12))
  }

  test("resize maps the grid") {
    val px = Array.tabulate(16)(identity) // 4x4
    val out = Codec.resize(px, 4, 4, 2, 2)
    assert(out.toList == List(0, 2, 8, 10))
  }

  test("frame sampling") {
    assert(Codec.sampleFrames(new Array[Byte](100), 10, 2).toList ==
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
