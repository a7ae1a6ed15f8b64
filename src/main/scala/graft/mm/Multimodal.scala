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
}
