package graft

import graft.cdc.{CdcPipeline, PipelineConfig}
import graft.ops.MergeInto
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ChronicleFileIndex: Catalyst-pushed filters over a plain
  * `ChronicleTable.read` (or SQL over a registered view) prune data files
  * at the MANIFEST during planning — the lakehouse-format integration
  * point. Asserted through the executed plan's `numFiles` scan metric,
  * which counts the files the scan actually planned over.
  */
class FileIndexSpec extends SparkSpec {

  import spark.implicits._

  /** Files the (possibly adaptive) executed plan's parquet scans touched. */
  private def scanFileCount(df: DataFrame): Long = {
    df.collect()
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def unwrap(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    unwrap(df.queryExecution.executedPlan)
      .collect { case s: FileSourceScanExec => s.metrics("numFiles").value }
      .sum
  }

  private def dayMs(d: Int) = 1704067200000L + d.toLong * 86400000L

  /** One bucket, three commits with disjoint key ranges and disjoint days:
    * no rewrites, so each commit's single file keeps its own key/ts/lsn
    * bounds — a pruned read must plan exactly one of the three.
    */
  private lazy val daysTable: graft.table.ChronicleTable = {
    val p = new CdcPipeline(PipelineConfig("", tmpDir("fidx-days"), numBuckets = 1))
    p.ensureTable()
    (0 until 3).foreach { d =>
      val batch = (0 until 10).map { k =>
        (d * 100L + k, "I", f"conv-$d-$k%03d", 0, "user", s"text $d $k",
          None: Option[String], new java.sql.Timestamp(dayMs(d) + k * 1000L))
      }.toDF("lsn", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts")
      MergeInto(spark, p.table, batch, s"day#$d", "t")
    }
    p.table
  }

  test("key, ts and lsn filters on a plain read prune files at the manifest") {
    val t = daysTable
    val snap = t.loadCurrent()
    val files = t.filesOf(snap)
    val total = files.size.toLong
    val full = t.read(spark)
    assert(scanFileCount(full) == total)

    // expectations derived from the manifest bounds themselves (each
    // commit hash-splits into >1 file, so counts are not hardcoded)
    val k = "conv-1-005"
    val keyFiles = files.count(f => f.minKey <= k && f.maxKey >= k).toLong
    assert(keyFiles < total)
    val byKey = t.read(spark).filter(col("conv_id") === k)
    assert(scanFileCount(byKey) == keyFiles,
      s"key equality must plan $keyFiles of $total files")
    assert(byKey.count() == 1)

    val tsFiles = files.count(f =>
      f.minTsMs <= dayMs(2) - 1 && f.maxTsMs >= dayMs(1)).toLong
    assert(tsFiles < total)
    val byTs = t.read(spark).filter(
      col("ts") >= to_timestamp(lit(new java.sql.Timestamp(dayMs(1)))) &&
        col("ts") < to_timestamp(lit(new java.sql.Timestamp(dayMs(2)))))
    assert(scanFileCount(byTs) == tsFiles,
      s"ts range must plan $tsFiles of $total files")
    assert(byTs.count() == 10)

    val lsnFiles = files.count(_.maxLsn > 199L).toLong
    assert(lsnFiles < total)
    val byLsn = t.read(spark).filter(col("_lsn") > 199L)
    assert(scanFileCount(byLsn) == lsnFiles,
      s"_lsn lower bound must plan $lsnFiles of $total files")
    assert(byLsn.count() == 10)

    // the pruned plans return exactly what an unpruned filter would
    assert(byTs.collect().toSet ==
      full.filter(unix_millis(col("ts")).between(dayMs(1), dayMs(2) - 1))
        .collect().toSet)
  }

  test("SQL over a registered view gets the same manifest pruning") {
    daysTable.read(spark).createOrReplaceTempView("fidx_conversations")
    val q = spark.sql(
      "SELECT conv_id, text FROM fidx_conversations WHERE conv_id = 'conv-2-003'")
    assert(scanFileCount(q) == 1L, "SQL key filter must plan one file")
    assert(q.collect().map(_.getString(0)).toSeq == Seq("conv-2-003"))
  }

  test("a key filter pushes through the merge-on-read LWW window and prunes") {
    val p = new CdcPipeline(PipelineConfig("", tmpDir("fidx-mor"), numBuckets = 4))
    p.ensureTable()
    def batch(lo: Long, n: Int) = (0 until n).map { i =>
      (lo + i, "I", s"conv-${(lo + i) % 16}", ((lo + i) / 16).toInt, "user",
        s"text ${lo + i}", None: Option[String],
        new java.sql.Timestamp(1704067200000L + (lo + i) * 1000L))
    }.toDF("lsn", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts")
    MergeInto(spark, p.table, batch(0, 64), "m#0", "t", mergeOnRead = true)
    MergeInto(spark, p.table, batch(64, 64), "m#1", "t", mergeOnRead = true)
    val total = p.table.loadCurrent().numFiles

    val one = p.table.read(spark).filter(col("conv_id") === "conv-3")
    val scanned = scanFileCount(one)
    assert(scanned < total,
      s"key filter did not push below the LWW merge ($scanned of $total files)")
    // and the merged result is right: LWW over base+deltas for that key only
    val expect = p.table.read(spark).collect()
      .filter(_.getAs[String]("conv_id") == "conv-3").toSet
    assert(one.collect().toSet == expect)
  }
}
