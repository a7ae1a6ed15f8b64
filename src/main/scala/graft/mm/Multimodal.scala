package graft.mm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media treated as opaque `binary` payloads
  * with typed metadata, decoded by a batched per-partition extractor.
  *
  * The decode step is a clearly-marked STUB (no image/audio codecs in this
  * container): [[StubDecoder.decode]] derives deterministic fake features
  * from the payload bytes. Everything around it — the binary column schema,
  * the partition-batched iterator shape (one decoder instance per
  * partition, streaming over rows), the typed output — is the real
  * production plumbing a codec would drop into.
  */
object Multimodal {

  /** A media row: opaque bytes + source metadata. */
  case class MediaRow(doc_id: Long, payload: Array[Byte], media_type: String)

  /** Extracted features (deterministic stub values). */
  case class MediaFeatures(doc_id: Long, n_bytes: Int, width: Int,
      height: Int, frames: Int)

  /** STUB decoder: stands in for an image/audio codec. Deterministic pure
    * arithmetic over byte length so tests (and the SQL oracle) can verify
    * the plumbing end to end; swap `decode` for a real codec in
    * production.
    */
  object StubDecoder {
    def decode(payload: Array[Byte]): (Int, Int, Int) = {
      val n = payload.length
      (n % 640 + 1, (n * 31) % 480 + 1, n % 16 + 1)
    }
  }

  /** documents.text encoded as a binary payload column — the ingestion
    * shape for opaque media.
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"),
        lit("text/plain").as("media_type"))

  /** Binary metadata extraction with built-in expressions only (byte count
    * + leading-bytes magic) — the cheap, codegen'd path.
    */
  def binaryMeta(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select(col("doc_id"),
        length(col("payload")).as("n_bytes"),
        // hex only the 4 leading bytes, not the whole payload
        hex(substring(col("payload"), 1, 4)).as("head_hex"),
        col("media_type"))
      .orderBy("doc_id")

  /** Feature extraction through the batched per-partition decoder — the
    * plumbing a real codec UDF would use (decoder initialized once per
    * partition, rows streamed through it).
    */
  def decodeFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media: Dataset[MediaRow] = mediaTable(spark, dir).as[MediaRow]
    media.mapPartitions { rows =>
      // per-partition decoder init happens here (stub has no state)
      rows.map { m =>
        val (w, h, f) = StubDecoder.decode(m.payload)
        MediaFeatures(m.doc_id, m.payload.length, w, h, f)
      }
    }.toDF().orderBy("doc_id")
  }

  /** A resized media row: the transcoded payload plus before/after shape.
    * The payload is REAL plumbing (a fresh byte array of the target size);
    * the oracle verifies the metadata, the spec path the bytes.
    */
  case class ResizedMedia(doc_id: Long, payload: Array[Byte], width: Int,
      height: Int, n_bytes_in: Int, n_bytes_out: Int)

  /** Media resize through the per-partition decoder: each payload is
    * "transcoded" to the target resolution — the stub scales the byte
    * length by pixel ratio (never upscales) and truncates/copies the
    * bytes; a real image codec drops into the same seam. All integer
    * arithmetic, so the SQL oracle reproduces the output shape exactly.
    */
  def resizeMedia(spark: SparkSession, dir: String,
      targetW: Int = 320, targetH: Int = 240): DataFrame = {
    import spark.implicits._
    val media: Dataset[MediaRow] = mediaTable(spark, dir).as[MediaRow]
    media.mapPartitions { rows =>
      rows.map { m =>
        val n = m.payload.length
        val (w, h, _) = StubDecoder.decode(m.payload)
        val outLen = math.max(1, math.min(n.toLong,
          n.toLong * (targetW.toLong * targetH) / (w.toLong * h))).toInt
        ResizedMedia(m.doc_id, java.util.Arrays.copyOf(m.payload, outLen),
          math.min(w, targetW), math.min(h, targetH), n, outLen)
      }
    }.toDF().orderBy("doc_id")
  }

  /** One sampled frame of a media row. */
  case class FrameSample(doc_id: Long, frame_idx: Int, ts_ms: Long)

  /** Frame sampling: decode each payload's frame count and emit every
    * `everyK`-th frame index with its timestamp at the stub's fixed 4 fps.
    * The 100 TB shape: the decoder streams frames inside the partition
    * iterator and only the SAMPLED frames ever materialize — the full
    * frame set is never a row set.
    */
  def frameSamples(spark: SparkSession, dir: String,
      everyK: Int = 4): DataFrame = {
    import spark.implicits._
    val media: Dataset[MediaRow] = mediaTable(spark, dir).as[MediaRow]
    media.mapPartitions { rows =>
      rows.flatMap { m =>
        val (_, _, frames) = StubDecoder.decode(m.payload)
        (0 until frames by everyK).iterator
          .map(i => FrameSample(m.doc_id, i, i * 250L)) // 4 fps -> 250ms
      }
    }.toDF().orderBy("doc_id", "frame_idx")
  }
}
