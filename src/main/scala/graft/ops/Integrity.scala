package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Payload integrity checking — the reference validates a CRC32 over every
  * inbound message set and rejects corrupted ones back to the client
  * (MessageSetProcessor.java:125-182 `checkCRC`, returning CRC_CORRUPTED).
  * Here the checksum travels as a `_crc` column next to the payload and
  * validation is a codegen'd predicate; failures divert to a quarantine
  * frame (never silently dropped — suro counts them, we keep them
  * inspectable).
  */
object Integrity {

  val crcColumn = "_crc"

  /** Stamp rows with the CRC of their text payload (producer side). */
  def withCrc(df: DataFrame): DataFrame =
    df.withColumn(crcColumn, crc32(col("text").cast("binary")))

  /** Split a stamped stream into (valid, rejected). Null-safe: a row whose
    * predicate evaluates to NULL (null text or missing CRC) is REJECTED,
    * never silently dropped from both sides by three-valued logic.
    */
  def validate(df: DataFrame): (DataFrame, DataFrame) = {
    val ok = coalesce(
      crc32(col("text").cast("binary")) === col(crcColumn), lit(false))
    (df.filter(ok).drop(crcColumn), df.filter(!ok))
  }
}
