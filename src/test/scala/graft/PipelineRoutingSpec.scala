package graft

import graft.cdc.{CdcPipeline, PipelineConfig}
import graft.source.{BinlogConfig, BinlogGenerator}
import org.apache.spark.sql.functions._

/** Routing wired into the apply path: hot-reloaded DSL route filter and
  * quarantine of invalid events.
  */
class PipelineRoutingSpec extends SparkSpec {
  import spark.implicits._

  test("route filter gates the merge and hot-swaps between batches") {
    val cfg = BinlogConfig(numEvents = 800, numConversations = 6, segmentSize = 200)
    val src = tmpDir("binlog-route")
    val tbl = tmpDir("table-route")
    BinlogGenerator.writeSegments(spark, cfg, src)

    val filterFile = java.nio.file.Paths.get(tmpDir("routes"), "filter.dsl")
    // batch 0+1: only tool-role turns pass
    java.nio.file.Files.writeString(filterFile, """xpath("role") = "tool"""")
    val p = new CdcPipeline(PipelineConfig(src, tbl, segmentsPerBatch = 1,
      numBuckets = 2, routeFilterFile = Some(filterFile.toString)))
    p.runOnce(spark); p.runOnce(spark)
    val rolesAfter2 = p.currentState(spark).select("role").distinct()
      .as[String].collect().toSet
    assert(rolesAfter2 == Set("tool"))

    // hot reload: widen the route without restarting the pipeline
    java.nio.file.Files.writeString(filterFile, "true")
    p.runAll(spark)
    val rolesFinal = p.currentState(spark).select("role").distinct()
      .as[String].collect().toSet
    assert(rolesFinal.size > 1)
    // earlier-batch events that the old route dropped stay dropped (they
    // were consumed); later batches flow fully — count must exceed the
    // tool-only subset
    val toolOnly = p.currentState(spark).filter(col("role") === "tool").count()
    assert(p.currentState(spark).count() > toolOnly)
  }

  test("invalid events divert to quarantine parquet, valid ones merge") {
    val tbl = tmpDir("table-q")
    val src = tmpDir("binlog-q")
    // hand-built segment with two invalid rows (empty key, negative turn)
    val rows = Seq(
      (0L, "I", "conv-a", 0, "user", "ok0", None: Option[String], ts(0)),
      (1L, "I", "", 1, "user", "bad-key", None: Option[String], ts(1)),
      (2L, "I", "conv-b", -3, "user", "bad-turn", None: Option[String], ts(2)),
      (3L, "I", "conv-a", 1, "user", "ok1", None: Option[String], ts(3)))
      .toDF("lsn", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts")
    rows.withColumn("segment", lit(0))
      .write.partitionBy("segment").mode("overwrite").parquet(src)

    val p = new CdcPipeline(PipelineConfig(src, tbl, segmentsPerBatch = 1,
      numBuckets = 2, quarantine = true))
    p.runAll(spark)
    assert(p.currentState(spark).select("text").as[String].collect().sorted.toSeq
      == Seq("ok0", "ok1"))
    val q = spark.read.parquet(s"$tbl/quarantine/batch=0")
    assert(q.select("text").as[String].collect().sorted.toSeq
      == Seq("bad-key", "bad-turn"))
  }

  private def ts(i: Long) = new java.sql.Timestamp(i * 1000)
}
