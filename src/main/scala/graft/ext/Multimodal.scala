package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video payloads are opaque
  * `binary` columns with a typed metadata struct travelling alongside.
  * The Spark-side plumbing (schema, batch shape, partition-local decode,
  * feature extraction signature) is the `mapInPandas`-style batch shape a
  * real pipeline uses.
  *
  * Codecs: REAL for the formats the JVM can decode without external
  * libraries — PNG/JPEG/BMP/GIF through `javax.imageio`, WAV/PCM through
  * `javax.sound.sampled` ([[MultimodalCodecs]]); payloads in formats with
  * no in-JVM codec (video, mp3, …) fall back to the clearly-marked
  * deterministic stand-ins in [[MultimodalStubs]] so the dataflow is
  * total. Swapping in further codecs (JNI/javacpp) touches only
  * [[MultimodalCodecs]], not the dataflow.
  */
object Multimodal {

  /** Typed sidecar metadata for a binary payload. */
  case class MediaMeta(modality: String, byteLen: Long, sha256: String,
      width: Int, height: Int, sampleRateHz: Int)

  case class MediaRow(doc_id: Long, payload: Array[Byte], meta: MediaMeta)

  case class FeatureRow(doc_id: Long, modality: String, features: Array[Float])

  /** Wrap a text/bytes source as a multimodal frame: payload binary +
    * metadata struct. `modality` derived from a tag column. Pure native
    * expressions (encode/sha2/length) — this is the ingest path a real
    * pipeline uses before handing batches to a decoder. */
  def asMedia(df: DataFrame, idCol: String, bytesCol: String,
      modalityCol: String): DataFrame =
    mediaFrame(df, idCol, encode(col(bytesCol), "UTF-8"), col(modalityCol))

  /** Binary-column ingest (actual media payloads, e.g. a parquet `binary`
    * column of PNG/WAV blobs). */
  def asMediaBinary(df: DataFrame, idCol: String, binCol: String,
      modalityCol: String): DataFrame =
    mediaFrame(df, idCol, col(binCol), col(modalityCol))

  private def mediaFrame(df: DataFrame, idCol: String,
      payload: org.apache.spark.sql.Column,
      modality: org.apache.spark.sql.Column): DataFrame =
    df.select(
      col(idCol).cast("long").as("doc_id"),
      payload.as("payload"),
      struct(
        modality.as("modality"),
        octet_length(payload).cast("long").as("byteLen"),
        sha2(payload, 256).as("sha256"),
        lit(0).as("width"), lit(0).as("height"),
        lit(0).as("sampleRateHz")).as("meta"))

  /** Partition-local decode: batches stream through `mapPartitions` so
    * codec state amortizes per partition. Image payloads get their REAL
    * pixel dimensions, WAV payloads their real sample rate; undecodable
    * formats fall back to the deterministic stub. */
  def decode(ds: Dataset[MediaRow])(implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        MultimodalCodecs.decodeMeta(r.payload) match {
          case Some((modality, w, h, rate)) =>
            r.copy(meta = r.meta.copy(modality = modality, width = w,
              height = h, sampleRateHz = rate))
          case None => MultimodalStubs.decodeStub(r)
        }
      }
    }
  }

  /** Feature extraction: fixed-width float vector per payload,
    * partition-local. Images: grid mean-pooled luminance; WAV: per-window
    * RMS energy; undecodable payloads: deterministic byte-hash stub. */
  def extractFeatures(ds: Dataset[MediaRow], dims: Int = 16)
      (implicit spark: SparkSession): Dataset[FeatureRow] = {
    import spark.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        val feats = MultimodalCodecs.features(r.payload, dims)
          .getOrElse(MultimodalStubs.featureStub(r.payload, dims))
        FeatureRow(r.doc_id, r.meta.modality, feats)
      }
    }
  }

  /** Resize: image payloads are ACTUALLY re-encoded at (w, h) (bilinear
    * scale + PNG re-encode); non-image payloads keep their bytes and only
    * the target metadata is recorded (the stub contract). Row count and
    * schema preserved either way. */
  def resize(ds: Dataset[MediaRow], w: Int, h: Int)
      (implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        MultimodalCodecs.resizeImage(r.payload, w, h) match {
          case Some(bytes) =>
            r.copy(payload = bytes,
              meta = r.meta.copy(width = w, height = h,
                byteLen = bytes.length.toLong))
          case None => r.copy(meta = r.meta.copy(width = w, height = h))
        }
      }
    }
  }

  case class FrameRow(doc_id: Long, frame_idx: Int, offset_ms: Long,
      frame: Array[Byte], meta: MediaMeta)

  /** Video frame sampling: one payload row explodes to its sampled
    * frames — one every `everyMs` milliseconds of the (stub-derived)
    * duration, capped at `maxFrames`. The Spark-side shape is the real
    * contract: a partition-local flatMap with CONSTANT memory per input
    * row (frames stream out of the iterator — the whole video is never
    * held decoded), each frame keyed (doc_id, frame_idx, offset_ms) so
    * the downstream image ops (decode/resize/extractFeatures) apply to
    * frames unchanged. No JVM video codec exists in this container, so
    * duration and frame EXTRACTION are the clearly-marked deterministic
    * stand-ins in [[MultimodalStubs]]; an ffmpeg/JavaCV binding slots
    * into [[MultimodalCodecs]] without touching this dataflow. */
  def sampleFrames(ds: Dataset[MediaRow], everyMs: Long = 1000L,
      maxFrames: Int = 8)(implicit spark: SparkSession): Dataset[FrameRow] = {
    import spark.implicits._
    require(everyMs > 0 && maxFrames > 0, "everyMs and maxFrames must be positive")
    ds.mapPartitions { rows =>
      rows.flatMap { r =>
        val durMs = MultimodalStubs.durationMsStub(r)
        val n = math.min(maxFrames.toLong,
          math.max(1L, durMs / everyMs)).toInt
        (0 until n).iterator.map { i =>
          FrameRow(r.doc_id, i, i * everyMs,
            MultimodalStubs.frameStub(r.payload, i), r.meta)
        }
      }
    }
  }
}

/** Real in-JVM codecs: `javax.imageio` (PNG/JPEG/BMP/GIF) and
  * `javax.sound.sampled` (WAV/PCM). Format sniffing is magic-byte based so
  * undecodable payloads cost one header check, not a thrown exception. */
object MultimodalCodecs {

  /** Magic-byte sniff → media kind, or None for unknown formats. */
  def sniff(b: Array[Byte]): Option[String] = {
    def at(i: Int, v: Int) = i < b.length && (b(i) & 0xff) == v
    if (at(0, 0x89) && at(1, 'P') && at(2, 'N') && at(3, 'G')) Some("image/png")
    else if (at(0, 0xff) && at(1, 0xd8) && at(2, 0xff)) Some("image/jpeg")
    else if (at(0, 'B') && at(1, 'M')) Some("image/bmp")
    else if (at(0, 'G') && at(1, 'I') && at(2, 'F')) Some("image/gif")
    else if (at(0, 'R') && at(1, 'I') && at(2, 'F') && at(3, 'F') &&
      at(8, 'W') && at(9, 'A') && at(10, 'V') && at(11, 'E')) Some("audio/wav")
    else None
  }

  private def readImage(b: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b)))
    catch { case _: Exception => None }

  /** (modality, width, height, sampleRateHz) for decodable payloads. */
  def decodeMeta(b: Array[Byte]): Option[(String, Int, Int, Int)] =
    sniff(b).flatMap {
      case m if m.startsWith("image/") =>
        readImage(b).map(img => (m, img.getWidth, img.getHeight, 0))
      case m @ "audio/wav" =>
        try {
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(b))
          val rate = in.getFormat.getSampleRate.toInt
          in.close()
          Some((m, 0, 0, rate))
        } catch { case _: Exception => None }
      case _ => None
    }

  /** Bilinear-scaled PNG re-encode for image payloads. */
  def resizeImage(b: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
    sniff(b).filter(_.startsWith("image/")).flatMap(_ => readImage(b)).map { img =>
      val out = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, w, h, null)
      g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      bos.toByteArray
    }

  /** Real features: images → `dims` grid-mean-pooled luminance cells
    * (row-major over a near-square grid); WAV → per-window RMS energy of
    * the PCM samples. None for undecodable payloads. */
  def features(b: Array[Byte], dims: Int): Option[Array[Float]] =
    sniff(b).flatMap {
      case m if m.startsWith("image/") => readImage(b).map(imageFeatures(_, dims))
      case "audio/wav" => wavSamples(b).map(rmsWindows(_, dims))
      case _ => None
    }

  private def imageFeatures(img: java.awt.image.BufferedImage,
      dims: Int): Array[Float] = {
    val gx = math.max(1, math.sqrt(dims.toDouble).toInt)
    val gy = math.max(1, (dims + gx - 1) / gx)
    val out = new Array[Float](dims)
    val counts = new Array[Int](dims)
    val (w, h) = (img.getWidth, img.getHeight)
    var y = 0
    while (y < h) {
      val cy = math.min(gy - 1, y * gy / h)
      var x = 0
      while (x < w) {
        val cx = math.min(gx - 1, x * gx / w)
        val cell = cy * gx + cx
        if (cell < dims) {
          val rgb = img.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000.0f
          out(cell) += lum
          counts(cell) += 1
        }
        x += 1
      }
      y += 1
    }
    var i = 0
    while (i < dims) { if (counts(i) > 0) out(i) /= counts(i); i += 1 }
    out
  }

  private def wavSamples(b: Array[Byte]): Option[Array[Float]] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(b))
      val fmt = in.getFormat
      val bytes = in.readAllBytes()
      in.close()
      if (fmt.getSampleSizeInBits != 16) None
      else {
        val order = if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
          else java.nio.ByteOrder.LITTLE_ENDIAN
        val sb = java.nio.ByteBuffer.wrap(bytes).order(order).asShortBuffer()
        val out = new Array[Float](sb.remaining())
        var i = 0
        while (sb.hasRemaining) { out(i) = sb.get() / 32768.0f; i += 1 }
        Some(out)
      }
    } catch { case _: Exception => None }

  private def rmsWindows(samples: Array[Float], dims: Int): Array[Float] = {
    val out = new Array[Float](dims)
    if (samples.isEmpty) return out
    val win = math.max(1, samples.length / dims)
    var d = 0
    while (d < dims) {
      val from = d * win
      val to = if (d == dims - 1) samples.length else math.min(samples.length, from + win)
      var acc = 0.0
      var i = from
      while (i < to) { acc += samples(i) * samples(i); i += 1 }
      out(d) = if (to > from) math.sqrt(acc / (to - from)).toFloat else 0.0f
      d += 1
    }
    out
  }
}

/** Clearly-marked deterministic stand-ins for formats with no in-JVM
  * codec (video, compressed audio). Deterministic so tests are stable. */
object MultimodalStubs {
  import Multimodal._

  /** STUB: pretends to decode a payload; derives fake dimensions from a
    * byte checksum. Replace with a real decoder via [[MultimodalCodecs]]. */
  def decodeStub(r: MediaRow): MediaRow = {
    var acc = 0L
    var i = 0
    while (i < r.payload.length) { acc = acc * 31 + (r.payload(i) & 0xff); i += 1 }
    val w = 64 + math.floorMod(acc, 193L).toInt
    val h = 64 + math.floorMod(acc / 193L, 157L).toInt
    r.copy(meta = r.meta.copy(width = w, height = h,
      sampleRateHz = 8000 + math.floorMod(acc, 8L).toInt * 1000))
  }

  /** STUB: pseudo-duration (ms) from the payload size — stands in for
    * container-header parsing (a real binding reads the header). */
  def durationMsStub(r: MediaRow): Long = math.max(1L, r.meta.byteLen * 4L)

  /** STUB: deterministic pseudo-frame bytes for (payload, frameIdx) —
    * stands in for an actual decoded frame. */
  def frameStub(payload: Array[Byte], frameIdx: Int): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.update(payload)
    md.update(Array[Byte](
      (frameIdx >> 24).toByte, (frameIdx >> 16).toByte,
      (frameIdx >> 8).toByte, frameIdx.toByte))
    md.digest()
  }

  /** STUB: deterministic fake feature vector from payload bytes. */
  def featureStub(payload: Array[Byte], dims: Int): Array[Float] = {
    val out = new Array[Float](dims)
    var acc = 1469598103934665603L // FNV offset basis
    var i = 0
    while (i < payload.length) {
      acc = (acc ^ (payload(i) & 0xff)) * 1099511628211L
      out(math.floorMod(i, dims)) += ((acc % 1000L) / 1000.0f)
      i += 1
    }
    out
  }
}
