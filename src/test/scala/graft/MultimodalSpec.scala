package graft

import graft.ext.{Multimodal, MultimodalCodecs}

/** Real-codec multimodal path: PNG/WAV payloads decoded, resized, and
  * featurized with the in-JVM codecs (javax.imageio / javax.sound);
  * undecodable formats fall back to the deterministic stubs through the
  * same mapPartitions seam. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._
  implicit val s: org.apache.spark.sql.SparkSession = spark

  private def pngBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def wavBytes(rate: Float, samples: Array[Short]): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val bb = java.nio.ByteBuffer.allocate(samples.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    samples.foreach(bb.putShort)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bb.array()), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private def media(rows: (Long, Array[Byte], String)*) =
    Multimodal.asMediaBinary(rows.toSeq.toDF("doc_id", "payload", "modality"),
      "doc_id", "payload", "modality").as[Multimodal.MediaRow]

  test("image payloads decode to real dimensions, resize rewrites the payload, features are grid luminance") {
    val png = pngBytes(32, 20, 0x808080) // constant mid-gray
    val m = media((1L, png, "image"))
    val dec = Multimodal.decode(m).collect().head
    assert(dec.meta.modality == "image/png")
    assert(dec.meta.width == 32 && dec.meta.height == 20)
    // resize genuinely re-encodes: re-decoding the new payload shows 16×10
    val resized = Multimodal.resize(Multimodal.decode(m), 16, 10).collect().head
    val Some((_, rw, rh, _)) = MultimodalCodecs.decodeMeta(resized.payload)
    assert(rw == 16 && rh == 10)
    assert(resized.meta.byteLen == resized.payload.length.toLong)
    // constant gray 128 → every pooled cell's luminance is exactly 128
    val feats = Multimodal.extractFeatures(Multimodal.decode(m), dims = 4)
      .collect().head
    assert(feats.features.length == 4)
    assert(feats.features.forall(f => math.abs(f - 128.0f) < 0.5f))
  }

  test("wav payloads decode to the real sample rate with RMS-energy features") {
    val tone = Array.tabulate[Short](8000)(i => (math.sin(i * 0.1) * 16384).toShort)
    val wav = wavBytes(8000f, tone)
    val m = media((1L, wav, "audio"))
    val dec = Multimodal.decode(m).collect().head
    assert(dec.meta.modality == "audio/wav")
    assert(dec.meta.sampleRateHz == 8000)
    val feats = Multimodal.extractFeatures(Multimodal.decode(m), dims = 8)
      .collect().head
    // sine at amplitude 0.5 → window RMS ≈ 0.5/√2
    val expect = 0.5f / math.sqrt(2.0).toFloat
    assert(feats.features.length == 8)
    assert(feats.features.forall(f => math.abs(f - expect) < 0.02f))
  }

  test("undecodable payloads fall back to the deterministic stub without breaking the flow") {
    val junk = Array[Byte](1, 2, 3, 4, 5, 6, 7)
    val m = media((9L, junk, "video"))
    val dec = Multimodal.decode(m).collect().head
    // stub keeps the declared modality and synthesizes plausible dims
    assert(dec.meta.modality == "video")
    assert(dec.meta.width >= 64 && dec.meta.height >= 64)
    val feats = Multimodal.extractFeatures(m, dims = 6).collect().head
    assert(feats.features.length == 6)
    // mixed batch: one decodable + one not, row count preserved
    val mixed = media((1L, pngBytes(8, 8, 0xffffff), "image"), (2L, junk, "video"))
    assert(Multimodal.decode(mixed).collect().length == 2)
  }

  test("frame sampling explodes a video payload into capped, keyed frames") {
    val payload = Array.tabulate[Byte](400)(i => (i % 97).toByte) // dur stub 1600ms
    val m = media((5L, payload, "video"))
    val frames = Multimodal.sampleFrames(m, everyMs = 500L, maxFrames = 8)
      .collect().sortBy(_.frame_idx)
    assert(frames.length == 3) // 1600ms / 500ms
    assert(frames.map(_.offset_ms).toSeq == Seq(0L, 500L, 1000L))
    assert(frames.forall(_.doc_id == 5L))
    // frames are distinct per index but deterministic per (payload, idx)
    assert(frames.map(_.frame.toSeq).distinct.length == 3)
    val again = Multimodal.sampleFrames(m, everyMs = 500L, maxFrames = 8)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame.toSeq) sameElements again.map(_.frame.toSeq))
    // maxFrames caps long payloads; every payload yields at least 1 frame
    assert(Multimodal.sampleFrames(m, everyMs = 100L, maxFrames = 4)
      .collect().length == 4)
    assert(Multimodal.sampleFrames(media((6L, Array[Byte](1), "video")),
      everyMs = 60000L, maxFrames = 8).collect().length == 1)
    // partition-count invariance of the exploded frame set
    val many = media((0 until 20).map(i =>
      (i.toLong, Array.tabulate[Byte](300)(j => ((i + j) % 83).toByte),
        "video")): _*)
    val a = Multimodal.sampleFrames(many.repartition(1), 250L, 5)
      .collect().map(f => (f.doc_id, f.frame_idx, f.frame.toSeq)).toSet
    val b = Multimodal.sampleFrames(many.repartition(7), 250L, 5)
      .collect().map(f => (f.doc_id, f.frame_idx, f.frame.toSeq)).toSet
    assert(a == b)
  }
}
