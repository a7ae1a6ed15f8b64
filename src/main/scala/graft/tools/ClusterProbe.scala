package graft.tools

import graft.cdc.{CdcPipeline, PipelineConfig}
import graft.source.{BinlogConfig, BinlogGenerator}
import org.apache.spark.sql.SparkSession

/** Isolation probe for the local-cluster bench mode: replays the SAME
  * tmpfs binlog through the real engine at cluster lo/hi (1 vs 4
  * fixed-size executors) AND thread lo/hi (local[2] vs local[8]) in one
  * window, printing per-phase seconds — separates "cluster mode doesn't
  * scale" from "this window doesn't scale". Dev-only tool, not part of
  * the bench artifact.
  */
object ClusterProbe {
  private def session(master: String): SparkSession = {
    val mult = sys.env.getOrElse("PROBE_PARTS_MULT", "1").toInt
    val shuffleParts = master match {
      case m if m.startsWith("local-cluster") =>
        """local-cluster\[(\d+),(\d+),\d+\]""".r.findFirstMatchIn(m)
          .map(g => g.group(1).toInt * g.group(2).toInt * mult).getOrElse(4)
      case m => """local\[(\d+)\]""".r.findFirstMatchIn(m)
        .map(_.group(1).toInt).getOrElse(4)
    }
    val b = graft.util.Sessions.tuneForMaster(
        SparkSession.builder().master(master), master)
      .config("spark.executor.memory", "7168m")
      .config("spark.locality.wait", "0")
      .config("spark.sql.shuffle.partitions", shuffleParts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-bench-scratch")
      .appName(s"probe-$master")
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val events = sys.env.getOrElse("PROBE_EVENTS", "8000000").toLong
    val binlog = graft.util.Scratch.shmTemp("probe-binlog")
    val gen = session("local[16]")
    BinlogGenerator.writeSegments(gen, BinlogConfig(numEvents = events,
      numConversations = math.max(64, (events / 640).toInt), maxTurns = 32,
      segmentSize = events / 4, dupPct = 1, evolveAtLsn = events / 2,
      filesPerSegment = 32), binlog)
    gen.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()

    val masters = sys.env.get("PROBE_MASTERS")
      .map(_.split(';').toSeq)
      .getOrElse(Seq(
        "local-cluster[1,2,7168]", "local-cluster[4,2,7168]",
        "local[2]", "local[8]",
        "local-cluster[1,2,7168]", "local-cluster[4,2,7168]",
        "local[2]", "local[8]"))
    masters.foreach { m =>
      val s = session(m)
      try {
        val tableRoot = graft.util.Scratch.shmTemp("probe-table")
        graft.ops.MergeInto.drainPhaseSeconds() // reset
        val p = new CdcPipeline(PipelineConfig(binlog, tableRoot,
          segmentsPerBatch = 1, numBuckets = 32, saltBuckets = 0))
        val t0 = System.nanoTime()
        p.runAllPipelined(s)
        val sec = (System.nanoTime() - t0) / 1e9
        val phases = graft.ops.MergeInto.drainPhaseSeconds()
          .toSeq.sortBy(_._1).map { case (k, v) => f"$k=$v%.1f" }.mkString(" ")
        println(f"PROBE master=$m sec=$sec%.2f $phases")
        rmTree(tableRoot)
      } finally {
        s.stop()
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
      }
    }
    rmTree(binlog)
  }

  private def rmTree(dir: String): Unit = graft.util.Scratch.rmTree(dir)
}
