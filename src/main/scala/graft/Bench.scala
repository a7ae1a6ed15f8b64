package graft

import graft.cdc.{CdcPipeline, PipelineConfig}
import graft.source.{BinlogConfig, BinlogGenerator}
import org.apache.spark.sql.SparkSession

/** Benchmark main. Prints ONE JSON line:
  * {"metric":"total","value":<sec>,"unit":"sec","queries":{...},"sf":...,
  *  "cdc": {"events": N, "events_per_sec_8": ..., "events_per_sec_32": ...,
  *          "scaling_efficiency": ...}}
  *
  * Two parts:
  *  1. every SparkEntry query timed on SPARK_GRAFT_SF_DIR at
  *     local[SPARK_GRAFT_CPUS];
  *  2. the CDC replay throughput protocol from BASELINE.md: the same
  *     deterministic binlog replayed at local[8] and local[32], reporting
  *     events/sec at both and the scaling efficiency
  *     (throughput_32 / throughput_8) / 4 — the sandbox stand-in for the
  *     north rule's N vs 4N executor requirement. Disable with
  *     SPARK_GRAFT_SKIP_SCALING=1.
  */
object Bench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Replay `events` change events through the full engine, return seconds. */
  private def cdcReplay(spark: SparkSession, binlogDir: String,
      numEvents: Long): Double = {
    val tableRoot = java.nio.file.Files
      .createTempDirectory("graft-bench-table").toString
    val p = new CdcPipeline(PipelineConfig(binlogDir, tableRoot,
      segmentsPerBatch = 1, numBuckets = 32, saltBuckets = 0))
    val t0 = System.nanoTime()
    p.runAll(spark)
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val numEvents = sys.env.getOrElse("SPARK_GRAFT_BENCH_EVENTS", "8000000").toLong
    val skipScaling = sys.env.get("SPARK_GRAFT_SKIP_SCALING").contains("1")

    // part 1: query timings
    val spark0 = session(cpus)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark0, sfDir).count() } catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }

    // part 2: CDC replay scaling protocol (one shared binlog, two sessions)
    var cdcJson = ""
    if (!skipScaling) {
      val binlogDir = java.nio.file.Files
        .createTempDirectory("graft-bench-binlog").toString
      val cfg = BinlogConfig(numEvents = numEvents,
        numConversations = math.max(64, (numEvents / 100).toInt),
        maxTurns = 32, segmentSize = numEvents / 8, dupPct = 1,
        evolveAtLsn = numEvents / 2, filesPerSegment = 32)
      BinlogGenerator.writeSegments(spark0, cfg, binlogDir)
      spark0.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()

      val spark8 = session(8)
      val sec8 = cdcReplay(spark8, binlogDir, numEvents)
      spark8.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()

      val spark32 = session(32)
      val sec32 = cdcReplay(spark32, binlogDir, numEvents)
      spark32.stop()

      val tp8 = numEvents / sec8
      val tp32 = numEvents / sec32
      val eff = (tp32 / tp8) / 4.0
      cdcJson = f""","cdc":{"events":$numEvents,"sec_8":$sec8%.2f,"sec_32":$sec32%.2f,"events_per_sec_8":${tp8.toLong},"events_per_sec_32":${tp32.toLong},"scaling_efficiency":$eff%.3f}"""
    } else spark0.stop()

    val qs = results.map { case (k, v) => f""""$k":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.2f,"unit":"sec","queries":$qs,"sf":"$sfDir"$cdcJson}""")
  }
}
