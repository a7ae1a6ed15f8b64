package graft

import graft.cdc.{CdcPipeline, PipelineConfig}
import graft.source.{BinlogConfig, BinlogGenerator}
import org.apache.spark.sql.{Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** The same replay-equals-oracle contract as CdcPipelineSpec, but on a
  * `local-cluster` master: REAL executor JVMs (serialization across
  * process boundaries, netty shuffle, per-executor heaps). `local[n]`
  * silently tolerates closures and task state that only live in the
  * driver; the rule's deployment shape (spark-submit on a multi-executor
  * cluster) does not — this suite is the spec-level proof that every
  * drain path survives it.
  *
  * Forked into its OWN test JVM (build.sbt testGrouping): Spark allows
  * one SparkContext per JVM and every other suite shares the local[4]
  * session.
  */
class ClusterModeSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val master = "local-cluster[2,2,1536]"
    val s = graft.util.Sessions.tuneForMaster(
        SparkSession.builder().master(master), master)
      .config("spark.executor.memory", "1536m")
      .config("spark.locality.wait", "0")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-cluster-test")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def oracleRows(cfg: BinlogConfig): Seq[(String, Int, String, String, Option[String])] =
    BinlogGenerator.referenceReduction(cfg).values.toSeq
      .sortBy(e => (e.conv_id, e.turn_idx))
      .map(e => (e.conv_id, e.turn_idx, e.role, e.text, e.tool))

  private def tableRows(p: CdcPipeline): Seq[(String, Int, String, String, Option[String])] =
    p.currentState(spark).collect().toSeq.map { r: Row =>
      (r.getAs[String]("conv_id"), r.getAs[Int]("turn_idx"),
        r.getAs[String]("role"), r.getAs[String]("text"),
        Option(r.getAs[String]("tool")))
    }

  test("pipelined drain on real executors equals the oracle (CoW + salt + evolution)") {
    val cfg = BinlogConfig(numEvents = 20000, numConversations = 50,
      maxTurns = 16, segmentSize = 4000, dupPct = 5, evolveAtLsn = 10000,
      zipfS = 1.1)
    val src = SparkSpec.tmpDir("cluster-binlog")
    val tbl = SparkSpec.tmpDir("cluster-table")
    BinlogGenerator.writeSegments(spark, cfg, src)
    val p = new CdcPipeline(PipelineConfig(src, tbl, segmentsPerBatch = 2,
      numBuckets = 8, saltBuckets = 4))
    val batches = p.runAllPipelined(spark)
    assert(batches == 3)
    assert(tableRows(p) == oracleRows(cfg))
  }

  test("merge-on-read + compaction on real executors equals the oracle") {
    val cfg = BinlogConfig(numEvents = 12000, numConversations = 40,
      maxTurns = 16, segmentSize = 3000, dupPct = 5)
    val src = SparkSpec.tmpDir("cluster-binlog-mor")
    val tbl = SparkSpec.tmpDir("cluster-table-mor")
    BinlogGenerator.writeSegments(spark, cfg, src)
    val p = new CdcPipeline(PipelineConfig(src, tbl, segmentsPerBatch = 1,
      numBuckets = 8, mergeOnRead = true))
    p.runAllPipelined(spark)
    val snap = p.table.loadCurrent()
    graft.ops.Compaction(spark, p.table, maxFilesPerBucket = 0,
      tombstoneHorizonLsn = snap.tombstoneHorizon)
    assert(tableRows(p) == oracleRows(cfg))
  }

  test("structured-streaming epochs on real executors equal the oracle") {
    val cfg = BinlogConfig(numEvents = 8000, numConversations = 30,
      maxTurns = 16, segmentSize = 2000, dupPct = 5)
    val src = SparkSpec.tmpDir("cluster-binlog-ss")
    val tbl = SparkSpec.tmpDir("cluster-table-ss")
    val ckpt = SparkSpec.tmpDir("cluster-ckpt")
    BinlogGenerator.writeSegments(spark, cfg, src)
    val p = new CdcPipeline(PipelineConfig(src, tbl, numBuckets = 8))
    val q = p.startStream(spark, ckpt, maxFilesPerTrigger = 4)
    q.awaitTermination(180000)
    assert(tableRows(p) == oracleRows(cfg))
  }
}
