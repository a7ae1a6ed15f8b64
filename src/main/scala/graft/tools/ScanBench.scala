package graft.tools

import graft.model.Model
import org.apache.spark.sql.SparkSession

/** Isolates the parallel-scaling ceiling of the host: times (a) a pure
  * column scan+hash and (b) the dedup aggregate over the same parquet
  * input at two core counts. If even the embarrassingly-parallel scan
  * stops scaling past N threads, the machine (memory bandwidth / SMT /
  * co-tenants) caps efficiency regardless of plan shape.
  *
  * Usage: runMain graft.tools.ScanBench <binlogSegmentDir> [cores...]
  */
object ScanBench {

  private def session(cores: Int): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"scan-bench-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get("/dev/shm")))
      b.config("spark.local.dir", "/dev/shm/graft-scan-bench")
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cores = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(4, 16)
    cores.foreach { c =>
      val s = session(c)
      try {
        import org.apache.spark.sql.functions._
        def df = s.read.schema(Model.changeSchema).parquet(dir)
        // warm
        df.agg(count(lit(1))).collect()
        def time(f: => Unit): Double = {
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        val scan = (1 to 2).map(_ => time {
          df.agg(bit_xor(xxhash64(col("conv_id"), col("turn_idx"), col("lsn")))).collect()
        }).min
        val dedup = (1 to 2).map(_ => time {
          graft.ops.Dedup.latestByKey(df, Model.keyColumns, "lsn")
            .agg(count(lit(1))).collect()
        }).min
        println(f"""{"cores":$c,"scan_sec":$scan%.2f,"dedup_sec":$dedup%.2f}""")
      } finally {
        s.stop()
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
      }
    }
  }
}
