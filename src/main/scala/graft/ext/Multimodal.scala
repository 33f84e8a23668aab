package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video payloads are opaque
  * `binary` columns with a typed metadata struct travelling alongside.
  * The Spark-side plumbing (schema, batch shape, partition-local decode,
  * feature extraction signature) is real and tested; the actual
  * codec work is STUBBED with a deterministic fake because no image/audio
  * libraries ship in this environment — swap [[MultimodalStubs.decodeStub]]
  * for a real decoder (JNI/javacpp) without touching the dataflow.
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
      modalityCol: String): DataFrame = {
    val payload = encode(col(bytesCol), "UTF-8")
    df.select(
      col(idCol).cast("long").as("doc_id"),
      payload.as("payload"),
      struct(
        col(modalityCol).as("modality"),
        octet_length(payload).cast("long").as("byteLen"),
        sha2(payload, 256).as("sha256"),
        lit(0).as("width"), lit(0).as("height"),
        lit(0).as("sampleRateHz")).as("meta"))
  }

  /** Partition-local decode: batches stream through `mapPartitions` so a
    * real decoder amortizes codec init per partition (the Scala analogue
    * of `mapInPandas` batch shape). Decode itself is a stub. */
  def decode(ds: Dataset[MediaRow])(implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    ds.mapPartitions { it =>
      // real impl: init codec once per partition here
      it.map(MultimodalStubs.decodeStub)
    }
  }

  /** Feature extraction: fixed-width float vector per payload,
    * partition-local. Stubbed deterministically from payload bytes. */
  def extractFeatures(ds: Dataset[MediaRow], dims: Int = 16)
      (implicit spark: SparkSession): Dataset[FeatureRow] = {
    import spark.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        FeatureRow(r.doc_id, r.meta.modality,
          MultimodalStubs.featureStub(r.payload, dims))
      }
    }
  }

  /** "Resize"/re-sample: metadata transform only in the stub (a real
    * impl rewrites the payload). Keeps the contract: payload + meta in,
    * payload + meta out, row count preserved. */
  def resize(ds: Dataset[MediaRow], w: Int, h: Int)
      (implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    ds.map(r => r.copy(meta = r.meta.copy(width = w, height = h)))
  }
}

/** Clearly-marked deterministic stand-ins for codec work (no media
  * libraries in this container). Deterministic so tests are stable. */
object MultimodalStubs {
  import Multimodal._

  /** STUB: pretends to decode a payload; derives fake dimensions from a
    * byte checksum. Replace with a real image/audio decoder. */
  def decodeStub(r: MediaRow): MediaRow = {
    var acc = 0L
    var i = 0
    while (i < r.payload.length) { acc = acc * 31 + (r.payload(i) & 0xff); i += 1 }
    val w = 64 + math.floorMod(acc, 193L).toInt
    val h = 64 + math.floorMod(acc / 193L, 157L).toInt
    r.copy(meta = r.meta.copy(width = w, height = h,
      sampleRateHz = 8000 + math.floorMod(acc, 8L).toInt * 1000))
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
