package graft.tools

import graft.model.Model
import graft.ops.Dedup
import graft.source.{BinlogConfig, BinlogGenerator}
import org.apache.spark.sql.SparkSession

/** Micro-benchmark for the dedup phase (VERDICT round-1 item 7): times the
  * max_by SortAggregate plan against the two-pass hash-aggregate plan at
  * two parallelism levels over the same generated batch, printing one JSON
  * line per (strategy, cores) with the 4->16 efficiency per strategy.
  *
  * Usage: sbt -batch "runMain graft.tools.DedupBench [numEvents]"
  */
object DedupBench {

  private def session(cores: Int): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"dedup-bench-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get("/dev/shm")))
      b.config("spark.local.dir", "/dev/shm/graft-dedup-bench")
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val numEvents = if (args.nonEmpty) args(0).toLong else 8000000L
    val dir = java.nio.file.Files.createTempDirectory("dedup-bench").toString

    val gen = session(16)
    val cfg = BinlogConfig(numEvents = numEvents,
      numConversations = math.max(64, (numEvents / 640).toInt),
      maxTurns = 32, segmentSize = numEvents, dupPct = 1, filesPerSegment = 64)
    BinlogGenerator.writeSegments(gen, cfg, dir)
    gen.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()

    def run(cores: Int, strategy: String, trials: Int = 2): Double = {
      val s = session(cores)
      try {
        import org.apache.spark.sql.functions._
        val times = (1 to trials).map { _ =>
          val df = s.read.schema(Model.changeSchema).parquet(s"$dir/segment=0")
          val t0 = System.nanoTime()
          val out = strategy match {
            case "maxby" => Dedup.latestByKey(df, Model.keyColumns, "lsn")
            case "join" => Dedup.latestByKeyJoin(df, Model.keyColumns, "lsn")
            case "window" => Dedup.latestByKeyWindow(df, Model.keyColumns, "lsn")
          }
          // checksum over the full payload so Catalyst cannot prune the
          // payload columns out of the dedup (a bare count() would, and
          // would then measure a far cheaper plan than the engine runs)
          out.agg(bit_xor(xxhash64(col("conv_id"), col("turn_idx"),
            col("text"), col("role")))).collect()
          (System.nanoTime() - t0) / 1e9
        }
        times.min
      } finally {
        s.stop()
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
      }
    }

    Seq("maxby", "join", "window").foreach { strat =>
      val lo = run(4, strat)
      val hi = run(16, strat)
      val eff = (numEvents / hi) / (numEvents / lo) / 4.0
      println(f"""{"strategy":"$strat","sec_4":$lo%.2f,"sec_16":$hi%.2f,"events_per_sec_16":${(numEvents / hi).toLong},"scaling_efficiency":$eff%.3f}""")
    }
  }
}
