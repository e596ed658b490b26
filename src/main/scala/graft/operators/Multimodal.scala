package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns (north-star X4): image/audio/video as opaque
  * `binary` columns with typed metadata structs, processed per
  * partition in batches.
  *
  * The container has no media codecs, so the DECODE KERNEL is a
  * clearly-marked deterministic fake (`FakeCodec`) — everything around
  * it is the real 100 TB plumbing and is tested: explicit schema with
  * a binary payload + metadata struct, `mapPartitions` batch shape
  * (one decoder init per partition, the expensive part amortized —
  * exactly how a JNI/FFmpeg decoder would be held), fixed-width
  * feature vectors out, and partition sizing notes.
  *
  * Scale notes: payload bytes dominate row size → keep
  * `spark.sql.files.maxPartitionBytes` at/below 128 MB so a partition
  * of decoded frames fits executor memory; feature extraction is
  * narrow (no shuffle); downstream similarity joins operate on the
  * small feature vectors, never the payloads (project payloads away
  * before any wide operation).
  */
object Multimodal {

  case class MediaMeta(kind: String, width: Int, height: Int,
      channels: Int, sampleRateHz: Int)
  case class MediaRow(media_id: Long, meta: MediaMeta, payload: Array[Byte])
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
      byte_mean: Double, byte_entropy: Double, histogram: Array[Double])

  /** STUB decoder — deterministic fake standing in for a real codec
    * (??? in spirit; deterministic so tests can assert). A real
    * deployment swaps `decode` for an FFmpeg/libjpeg call; the
    * signature (bytes + meta → fixed-shape frame) and the
    * one-init-per-partition usage below are the contract.
    */
  object FakeCodec {
    /** "Decode" payload into meta.width × meta.height "pixels" by
      * cycling the payload bytes — shape-correct, content fake.
      */
    def decode(meta: MediaMeta, payload: Array[Byte]): Array[Int] = {
      val n = math.max(meta.width * meta.height, 1)
      if (payload.isEmpty) new Array[Int](n) // zero-byte object → black frame
      else Array.tabulate(n)(i => payload(i % payload.length) & 0xff)
    }

    /** Frame sampling stub: every k-th "frame" offset of a video
      * payload (returns frame start offsets — shape only).
      */
    def sampleFrames(payload: Array[Byte], frameBytes: Int, everyK: Int): Seq[Int] =
      if (frameBytes <= 0 || everyK <= 0) Seq.empty
      else (0 until payload.length by frameBytes * everyK)

    /** Resize stub: nearest-neighbor index mapping on the fake pixel
      * grid (real arithmetic, fake pixels).
      */
    def resize(pixels: Array[Int], w: Int, h: Int, w2: Int, h2: Int): Array[Int] =
      Array.tabulate(math.max(w2 * h2, 0)) { i =>
        val (x2, y2) = (i % w2, i / w2)
        val x = math.min(x2 * w / math.max(w2, 1), w - 1)
        val y = math.min(y2 * h / math.max(h2, 1), h - 1)
        pixels(y * w + x)
      }
  }

  /** Deterministic synthetic media table (no codecs in the container):
    * payload bytes derived from the id, metadata typed. Mirrors how a
    * real ingest would land `binary` + metadata columns from object
    * storage manifests.
    */
  def synthMedia(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).map { id =>
      val kind = if (id % 3 == 2) "audio" else "image"
      val w = 8 + (id % 5).toInt; val h = 8 + (id % 3).toInt
      val payloadLen = 64 + (id % 17).toInt * 7
      val payload = Array.tabulate(payloadLen)(i =>
        ((id * 131 + i * 31 + 7) % 251).toByte)
      MediaRow(id, MediaMeta(kind, w, h,
        if (kind == "image") 3 else 1,
        if (kind == "audio") 16000 else 0), payload)
    }
  }

  /** Per-partition batched decode + feature extraction: one codec
    * handle per partition (the init cost a real decoder amortizes),
    * fixed-width outputs (16-bin byte histogram, mean, entropy).
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real codec: init native decoder handle here, once per partition
      val codec = FakeCodec
      rows.map { r =>
        val pixels = codec.decode(r.meta, r.payload)
        val hist = new Array[Double](16)
        var s = 0.0
        pixels.foreach { p => hist(p / 16) += 1.0; s += p }
        val n = pixels.length.toDouble
        var ent = 0.0
        hist.foreach { c =>
          if (c > 0) { val p = c / n; ent -= p * math.log(p) }
        }
        MediaFeatures(r.media_id, r.meta.kind, r.payload.length,
          s / n, ent, hist.map(_ / n))
      }
    }
  }

  /** Media features joined with an embedding table — the multimodal
    * join shape (payloads pruned before the shuffle).
    */
  def joinWithEmbeddings(features: DataFrame, embeddings: DataFrame): DataFrame =
    features.join(embeddings, col("media_id") === col("vec_id"))
      .drop("vec_id")
}
