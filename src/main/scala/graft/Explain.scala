package graft

import org.apache.spark.sql.SparkSession

/** Dump `explain("formatted")` for selected queries — the plan-review tool
  * used to keep scans pruned, joins broadcast and codegen spans wide.
  * Usage: runMain graft.Explain [sfDir] [queryName...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names =
      if (args.length > 1) args.tail.toSeq
      else Seq("cdc_dedup_latest", "q3_top_revenue", "q1_pricing_summary",
        "dedup_ngram_jaccard", "ann_brute_topk", "cdc_hwm_anti")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n======================= $n =======================")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
