package graft.tools

import graft.cdc.{CdcPipeline, PipelineConfig}
import graft.source.{BinlogConfig, BinlogGenerator}
import graft.util.Scratch
import org.apache.spark.sql.SparkSession

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Parquet-codec A/B on the full engine replay — the measurement behind the
  * `GRAFT_PARQUET_CODEC` knob (util.Sessions.tuneForEngine). At IO-bound
  * parallelism the drain's write phase is limited by BYTES flushed, not
  * CPU (BENCH.md round 5: the forced 2→8 rung's write phase scaled 2.6×
  * vs prepare's 3.2×), so a denser codec trades spare compute for
  * bandwidth. This main quantifies that trade on the engine's own
  * transcript payloads: same binlog, same thread count, one fresh session
  * per (codec, trial), min-of-2 per codec; reports replay seconds,
  * per-phase seconds of the best trial, and table bytes on disk.
  *
  * Env: SPARK_GRAFT_CODEC_EVENTS (default 16e6), SPARK_GRAFT_CODEC_THREADS
  * (default 8 — the parallelism where the write phase stops scaling on
  * this host), SPARK_GRAFT_CODECS (default "snappy,zstd,lz4").
  */
object CodecBench {

  private def session(threads: Int, codec: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$threads]")
      .appName(s"graft-codec-$codec")
      .config("spark.sql.shuffle.partitions", threads)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.parquet.compression.codec", codec)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", Scratch.shmTemp("graft-codec-scratch"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def treeBytes(dir: String): Long =
    Files.walk(Paths.get(dir)).iterator().asScala
      .filter(Files.isRegularFile(_)).map(Files.size).sum

  /** One replay; returns (seconds, tableBytes, phaseSeconds). */
  private def replay(spark: SparkSession, binlogDir: String): (Double, Long, Map[String, Double]) = {
    val tableRoot = Scratch.shmTemp("graft-codec-table")
    val p = new CdcPipeline(PipelineConfig(binlogDir, tableRoot,
      segmentsPerBatch = 1, numBuckets = 32, saltBuckets = 0))
    graft.ops.MergeInto.drainPhaseSeconds() // reset accumulator
    val t0 = System.nanoTime()
    p.runAllPipelined(spark)
    val sec = (System.nanoTime() - t0) / 1e9
    val bytes = treeBytes(tableRoot)
    Scratch.rmTree(tableRoot)
    (sec, bytes, graft.ops.MergeInto.drainPhaseSeconds())
  }

  def main(args: Array[String]): Unit = {
    val events = sys.env.getOrElse("SPARK_GRAFT_CODEC_EVENTS", "16000000").toLong
    val threads = sys.env.getOrElse("SPARK_GRAFT_CODEC_THREADS", "8").toInt
    val codecs = sys.env.getOrElse("SPARK_GRAFT_CODECS", "snappy,zstd,lz4")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val trials = sys.env.getOrElse("SPARK_GRAFT_CODEC_TRIALS", "2").toInt

    // Shared input: same generator shape as the scaling bench (4 large
    // micro-batches, Zipf hot keys, mid-stream widening), written once with
    // the DEFAULT codec — the input bytes are identical for every codec, so
    // only the engine's own writes differ.
    val binlogDir = Scratch.shmTemp("graft-codec-binlog")
    val warmDir = Scratch.shmTemp("graft-codec-warm")
    val boot = session(threads, "snappy")
    BinlogGenerator.writeSegments(boot, BinlogConfig(numEvents = events,
      numConversations = math.max(64, (events / 640).toInt), maxTurns = 32,
      segmentSize = events / 4, dupPct = 1, evolveAtLsn = events / 2,
      filesPerSegment = 32), binlogDir)
    val warmEvents = 200000L
    BinlogGenerator.writeSegments(boot, BinlogConfig(numEvents = warmEvents,
      numConversations = 500, maxTurns = 32, segmentSize = warmEvents / 2,
      dupPct = 1, filesPerSegment = 8), warmDir)
    boot.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()

    case class Run(sec: Double, bytes: Long, phases: Map[String, Double])
    val rows = codecs.map { codec =>
      val runs = (1 to trials).map { _ =>
        val s = session(threads, codec)
        try {
          replay(s, warmDir) // untimed: janino + JIT warmup
          val (sec, bytes, ph) = replay(s, binlogDir)
          Run(sec, bytes, ph)
        } finally {
          s.stop()
          SparkSession.clearActiveSession()
          SparkSession.clearDefaultSession()
        }
      }
      val best = runs.minBy(_.sec)
      val all = runs.map(r => f"${r.sec}%.2f").mkString("[", ",", "]")
      val ph = best.phases.toSeq.sortBy(_._1)
        .map { case (k, v) => f""""$k":$v%.2f""" }.mkString("{", ",", "}")
      f""""$codec":{"sec":${best.sec}%.2f,"events_per_sec":${(events / best.sec).toLong},"table_bytes":${best.bytes},"trials":$all,"phases":$ph}"""
    }
    Scratch.rmTree(binlogDir)
    Scratch.rmTree(warmDir)
    println(s"""{"metric":"codec_ab","events":$events,"threads":$threads,"codecs":{${rows.mkString(",")}}}""")
  }
}
