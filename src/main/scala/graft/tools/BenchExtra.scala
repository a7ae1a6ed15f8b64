package graft.tools

import org.apache.spark.sql.SparkSession

/** Focused per-query timing for optimization work (guide §1): times a
  * subset of SparkEntry.queries with the SAME session shape and
  * methodology as the frozen [[graft.Bench]] part 1 (count() action,
  * min-of-2 with the replay memo cleared between passes), without the
  * scaling ladder. The headline bench artifact stays `graft.Bench`; this
  * main exists so a single operator can be re-measured in seconds while
  * iterating.
  *
  * Usage: runMain graft.tools.BenchExtra [query ...]
  *   env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *        SPARK_GRAFT_CPUS (default 32),
  *        SPARK_GRAFT_EXTRA_PASSES (default 2).
  * No args = every query, alphabetically (Bench order).
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val passes = sys.env.getOrElse("SPARK_GRAFT_EXTRA_PASSES", "2").toInt
    val spark = graft.util.Sessions.tuneForEngine(
      SparkSession.builder()
        .master(s"local[$cpus]").appName("graft-bench-extra"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names =
      if (args.nonEmpty) args.toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    def timeQuery(name: String): Double = {
      spark.sparkContext.setJobDescription(s"bench-extra: $name")
      val t0 = System.nanoTime()
      try { graft.SparkEntry.queries(name)(spark, sfDir).count() }
      catch { case e: Throwable =>
        System.err.println(s"[extra] $name failed: ${e.getMessage}") }
      (System.nanoTime() - t0) / 1e9
    }
    val phases = sys.env.get("SPARK_GRAFT_EXTRA_PHASES").contains("1")
    val rows = names.map { n =>
      val ts = (1 to passes).map { i =>
        if (i > 1) graft.queries.CdcQueries.clearReplayCache()
        if (phases) graft.ops.MergeInto.drainPhaseSeconds() // reset
        val t = timeQuery(n)
        if (phases) {
          val p = graft.ops.MergeInto.drainPhaseSeconds().toSeq.sortBy(_._1)
            .map { case (k, v) => f"$k=$v%.2f" }.mkString(" ")
          println(f"  pass$i $t%.3fs  merge-phases: $p")
        }
        t
      }
      println(f"$n%-28s min=${ts.min}%7.3f  passes=${ts.map(t => f"$t%.3f").mkString(",")}")
      n -> ts.min
    }
    println(f"TOTAL(min) ${rows.map(_._2).sum}%.2f over ${rows.size} queries")
    spark.stop()
  }
}
