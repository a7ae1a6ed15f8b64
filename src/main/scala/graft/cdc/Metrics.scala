package graft.cdc

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.types._

import java.nio.file.{Files, Paths, StandardOpenOption}

/** One operational metrics record per applied micro-batch/epoch — the
  * engine's live-stats surface. The reference exposes per-sink rates and
  * health over REST (`/surosinkstat`: SinkStat.java:29-41,
  * StatusServer.java:46-56, backed by Servo meters, QueuedSink.java:45);
  * here the same numbers land as an append-only JSONL ledger next to the
  * table, queryable as a DataFrame alongside lineage. Writes are
  * driver-side appends of one small line per batch — never a Spark job.
  */
case class MetricEvent(
    source: String,
    epoch: Long,
    tsMs: Long,
    rows: Long,
    sec: Double,
    upserts: Long,
    deletes: Long,
    mode: String)

object Metrics {

  private val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m
  }

  val schema: StructType = StructType(Seq(
    StructField("source", StringType), StructField("epoch", LongType),
    StructField("tsMs", LongType), StructField("rows", LongType),
    StructField("sec", DoubleType), StructField("upserts", LongType),
    StructField("deletes", LongType), StructField("mode", StringType)))

  def file(dir: String): java.nio.file.Path = Paths.get(dir, "events.jsonl")

  def append(dir: String, e: MetricEvent): Unit = synchronized {
    val p = file(dir)
    if (!Files.exists(p.getParent)) Files.createDirectories(p.getParent)
    Files.writeString(p, mapper.writeValueAsString(e) + "\n",
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  /** The metrics ledger as a DataFrame (explicit schema — no inference scan). */
  def view(spark: SparkSession, dir: String): DataFrame =
    if (!Files.exists(file(dir)))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).json(file(dir).toString)

  /** Per-mode operational rates over the LAST `lastK` recorded
    * batches/epochs — the numbers the reference serves live from
    * `/surosinkstat` (message count, rates per sink: SinkStat.java:29-41),
    * computed from the ledger so they need no running server. Used by
    * `RunCdc stats`.
    */
  def rates(spark: SparkSession, dir: String, lastK: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy(col("mode"))
      .orderBy(col("tsMs").desc, col("epoch").desc)
    view(spark, dir)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= lastK).drop("__rn")
      .groupBy("mode").agg(
        count(lit(1)).as("batches"),
        sum("rows").as("rows"),
        when(sum("sec") > 0, round(sum(col("rows")) / sum(col("sec")), 1))
          .as("rows_per_sec"),
        round(avg("sec"), 3).as("avg_sec"),
        max("tsMs").as("last_ts_ms"))
      .orderBy("mode")
  }

  /** Per-mode summary of recent ledger events (see [[recentRates]]). */
  case class RateSummary(
      batches: Int, rows: Long, rowsPerSec: Option[Double], lastTsMs: Long)

  /** Driver-side fold of the ledger TAIL: per-mode rates over the last
    * `lastK` events of each mode, reading only the final `maxTailBytes`
    * of the file. The ledger grows one line per applied batch forever, so
    * a status poll must cost O(tail), not O(all batches ever) — a
    * monitoring system polls this every few seconds against a drain that
    * may have applied millions of micro-batches. A mode whose last event
    * fell out of the tail window is simply absent (it is not "recent").
    * The HTTP status surface ([[StatusServer]]) serves exactly this fold;
    * [[rates]] is the same numbers as a queryable DataFrame.
    */
  def recentRates(dir: String, lastK: Int = 20,
      maxTailBytes: Int = 1 << 20): Map[String, RateSummary] = {
    val p = file(dir)
    if (!Files.exists(p)) return Map.empty
    val size = Files.size(p)
    val start = math.max(0L, size - maxTailBytes)
    val bytes = {
      val ch = java.nio.channels.FileChannel.open(p,
        StandardOpenOption.READ)
      try {
        val buf = java.nio.ByteBuffer.allocate((size - start).toInt)
        ch.position(start)
        while (buf.hasRemaining && ch.read(buf) >= 0) {}
        buf.array()
      } finally ch.close()
    }
    val text = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    val lines0 = text.split('\n').iterator.filter(_.nonEmpty).toSeq
    // a mid-file start lands inside a line: drop the partial first one
    val lines = if (start > 0) lines0.drop(1) else lines0
    val events = lines.flatMap { l =>
      try Some(mapper.readValue(l, classOf[MetricEvent]))
      catch { case _: Exception => None } // torn concurrent append: skip
    }
    events.groupBy(_.mode).map { case (mode, es) =>
      val recent = es.sortBy(e => (-e.tsMs, -e.epoch)).take(lastK)
      val rows = recent.map(_.rows).sum
      val sec = recent.map(_.sec).sum
      mode -> RateSummary(recent.size, rows,
        if (sec > 0) Some(math.round(rows / sec * 10.0) / 10.0) else None,
        recent.map(_.tsMs).max)
    }
  }

  /** StreamingQueryListener recording one metrics line per epoch of the
    * named query — the Structured Streaming half of the surface (progress
    * events carry input rows and trigger durations; the foreachBatch side
    * records merge-level upsert/delete counts separately).
    */
  class EpochListener(queryName: String, dir: String) extends StreamingQueryListener {
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
      if (e.progress.name == queryName) {
        val sec = Option(e.progress.durationMs.get("triggerExecution"))
          .map(_.toDouble / 1000).getOrElse(0.0)
        append(dir, MetricEvent(queryName, e.progress.batchId,
          System.currentTimeMillis(), e.progress.numInputRows, sec,
          -1L, -1L, "stream-progress"))
      }
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
  }
}
