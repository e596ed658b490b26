package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO
import javax.imageio.stream.MemoryCacheImageInputStream

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns (north-star X4): image/audio/video as opaque
  * `binary` columns with typed metadata structs, processed per
  * partition in batches.
  *
  * Since round 8 the image arm is a REAL codec: payloads are genuine
  * PNG bytes and decode goes through `javax.imageio` (in the JDK
  * itself — zero new dependencies). The audio arm is raw unsigned
  * 8-bit PCM, decoded by definition. The plumbing is the 100 TB
  * shape throughout: explicit schema with a binary payload + metadata
  * struct, `mapPartitions` batch decode (ONE ImageReader per
  * partition — the init cost a JNI/FFmpeg decoder would amortize the
  * same way), fixed-width feature vectors out.
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
      n_px: Int, byte_mean: Double, byte_entropy: Double,
      histogram: Array[Double])

  /** Real media kernels over JDK-native formats: PNG via
    * `javax.imageio` (lossless 8-bit grayscale — decoded samples are
    * bit-exact, which is what lets q48 keep a DuckDB oracle), raw
    * 8-bit PCM for audio. `resize`/`sampleFrames` operate on the
    * decoded grids/streams.
    */
  object Codec {
    // never spill ImageIO scratch to tmp files on executors
    ImageIO.setUseCache(false)

    /** Encode an 8-bit grayscale pixel grid (row-major, values
      * 0..255) as real PNG bytes.
      */
    def encodePng(w: Int, h: Int, pixels: Array[Int]): Array[Byte] = {
      require(pixels.length == w * h, s"need $w*$h pixels, got ${pixels.length}")
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var j = 0
      while (j < pixels.length) {
        raster.setSample(j % w, j / w, 0, pixels(j)); j += 1
      }
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Decode PNG bytes to the row-major grayscale sample grid —
      * raster samples read directly (no color-space transform), so
      * the encode→decode round-trip is bit-exact.
      */
    def decodeImage(payload: Array[Byte]): Array[Int] = {
      val img = ImageIO.read(new ByteArrayInputStream(payload))
      require(img != null, "payload is not a decodable image")
      decodedSamples(img)
    }

    private[operators] def decodedSamples(img: BufferedImage): Array[Int] = {
      val (w, h) = (img.getWidth, img.getHeight)
      val raster = img.getRaster
      Array.tabulate(w * h)(j => raster.getSample(j % w, j / w, 0))
    }

    /** Audio arm: raw unsigned 8-bit PCM — one sample per byte. */
    def decodeAudio(payload: Array[Byte]): Array[Int] =
      payload.map(_ & 0xff)

    /** Frame sampling: every k-th frame start offset of a raw video
      * payload laid out as fixed-size frames.
      */
    def sampleFrames(payload: Array[Byte], frameBytes: Int, everyK: Int): Seq[Int] =
      if (frameBytes <= 0 || everyK <= 0) Seq.empty
      else (0 until payload.length by frameBytes * everyK)

    /** Nearest-neighbor resize on a decoded row-major pixel grid. */
    def resize(pixels: Array[Int], w: Int, h: Int, w2: Int, h2: Int): Array[Int] =
      Array.tabulate(math.max(w2 * h2, 0)) { i =>
        val (x2, y2) = (i % w2, i / w2)
        val x = math.min(x2 * w / math.max(w2, 1), w - 1)
        val y = math.min(y2 * h / math.max(h2, 1), h - 1)
        pixels(y * w + x)
      }
  }

  /** Deterministic synthetic media table: image payloads are REAL PNG
    * bytes encoding the formula-derived grayscale grid
    * `(id·131 + (j mod plen)·31 + 7) mod 251`; audio payloads are the
    * same byte formula as raw PCM. Pixel CONTENT is deterministic
    * integer arithmetic (so the DuckDB oracle recomputes it from the
    * formula), while the image container is a genuine PNG the decoder
    * must actually parse. Mirrors how a real ingest lands `binary` +
    * metadata columns from object-storage manifests.
    */
  def synthMedia(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).map { id =>
      val kind = if (id % 3 == 2) "audio" else "image"
      val w = 8 + (id % 5).toInt; val h = 8 + (id % 3).toInt
      val plen = 64 + (id % 17).toInt * 7
      def v(i: Int): Int = ((id * 131 + i * 31 + 7) % 251).toInt
      val payload =
        if (kind == "image")
          Codec.encodePng(w, h, Array.tabulate(w * h)(j => v(j % plen)))
        else Array.tabulate(plen)(i => v(i).toByte)
      MediaRow(id, MediaMeta(kind, w, h, 1, // 8-bit gray / mono PCM
        if (kind == "audio") 16000 else 0), payload)
    }
  }

  /** Per-partition batched decode + feature extraction: ONE PNG
    * ImageReader per partition (the init cost a native decoder
    * amortizes the same way), fixed-width outputs (16-bin value
    * histogram, mean, entropy over decoded samples). `n_bytes` is the
    * real container size (PNG bytes / PCM bytes); `n_px` the decoded
    * sample count.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // one decoder handle per partition — reused across the batch
      val readers = ImageIO.getImageReadersByFormatName("png")
      require(readers.hasNext, "JDK PNG ImageReader missing")
      val reader = readers.next()
      rows.map { r =>
        val vals: Array[Int] = r.meta.kind match {
          case "image" =>
            val iis = new MemoryCacheImageInputStream(
              new ByteArrayInputStream(r.payload))
            reader.setInput(iis, true, true)
            val img = reader.read(0)
            iis.close()
            Codec.decodedSamples(img)
          case _ => Codec.decodeAudio(r.payload)
        }
        val hist = new Array[Double](16)
        var s = 0.0
        vals.foreach { p => hist(p / 16) += 1.0; s += p }
        val n = math.max(vals.length, 1).toDouble
        var ent = 0.0
        hist.foreach { c =>
          if (c > 0) { val p = c / n; ent -= p * math.log(p) }
        }
        MediaFeatures(r.media_id, r.meta.kind, r.payload.length,
          vals.length, s / n, ent, hist.map(_ / n))
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
