package graft

import graft.cdc.{CdcPipeline, Chain, PipelineConfig}
import graft.model.Model
import graft.source.{BinlogConfig, BinlogGenerator}
import org.apache.spark.sql.functions._

/** Pipeline chaining (the reference's SuroSink server-to-server forward,
  * SuroSink.java:15-38): a downstream ChronicleTable tails an upstream one
  * through the incremental changelog, exactly-once, per-source marks
  * preserved.
  */
class ChainSpec extends SparkSpec {

  private def visible(t: graft.table.ChronicleTable) =
    t.read(spark).filter(!col(Model.deletedColumn))
      .select("conv_id", "turn_idx", "text")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet

  test("downstream table converges to a TWO-SOURCE upstream via incremental polls") {
    // delete-free log: an ordered CoW upstream's changelog is upsert-only
    // by contract (deletes are physically erased — the MOR test below is
    // the delete-propagating mode)
    val cfgA = BinlogConfig(numEvents = 800, numConversations = 6,
      segmentSize = 200, dupPct = 5, pDelete = 0.0)
    val cfgB = BinlogConfig(numEvents = 400, numConversations = 4,
      segmentSize = 200, dupPct = 5, pDelete = 0.0)
    val srcA = tmpDir("chain-bl-a")
    BinlogGenerator.writeSegments(spark, cfgA, srcA)
    val rawB = tmpDir("chain-bl-braw")
    val srcB = tmpDir("chain-bl-b")
    BinlogGenerator.writeSegments(spark, cfgB, rawB)
    spark.read.parquet(rawB)
      .withColumn("conv_id", concat(lit("b-"), col("conv_id")))
      .write.partitionBy("segment").mode("overwrite").parquet(srcB)

    val up = tmpDir("chain-up")
    val down = new graft.table.ChronicleTable(tmpDir("chain-down"))
    val pA = new CdcPipeline(PipelineConfig(srcA, up, sourceId = "srcA",
      segmentsPerBatch = 2, numBuckets = 4))
    pA.runAll(spark)

    // poll 1: bootstrap (full visible state of source A)
    val r1 = Chain.pollOnce(spark, pA.table, down, numBuckets = 4)
    assert(r1.exists(_.sources == Seq("srcA")))
    assert(visible(down) == visible(pA.table))

    // source B lands upstream with LSNs entirely BELOW srcA's mark; the
    // chain's per-source changelog must still ship every B row
    val pB = new CdcPipeline(PipelineConfig(srcB, up, sourceId = "srcB",
      segmentsPerBatch = 2, numBuckets = 4))
    pB.runAll(spark)
    val r2 = Chain.pollOnce(spark, pA.table, down, numBuckets = 4)
    assert(r2.exists(_.sources.contains("srcB")))
    assert(visible(down) == visible(pA.table))
    // downstream marks mirror the upstream's per source (chainable further)
    val upSnap = pA.table.loadCurrent()
    val downSnap = down.loadCurrent()
    assert(downSnap.hwms("srcA") == upSnap.hwms("srcA"))
    assert(downSnap.hwms("srcB") == upSnap.hwms("srcB"))

    // caught up -> no-op; replaying the SAME poll is idempotent
    assert(Chain.pollOnce(spark, pA.table, down, numBuckets = 4).isEmpty)
    assert(visible(down) == visible(pA.table))

    // quiet source: only srcA advances upstream; the poll still tiles a
    // range key for srcB (empty commit) so the ledger floor keeps folding
    val more = tmpDir("chain-bl-a2")
    BinlogGenerator.writeSegments(spark, cfgA.copy(numEvents = 1000), more)
    (4 to 4).foreach { s =>
      java.nio.file.Files.move(
        java.nio.file.Paths.get(more, s"segment=$s"),
        java.nio.file.Paths.get(srcA, s"segment=$s"))
    }
    pA.runAll(spark)
    val r3 = Chain.pollOnce(spark, pA.table, down, numBuckets = 4)
    assert(r3.exists(_.sources.toSet == Set("srcA", "srcB")))
    assert(visible(down) == visible(pA.table))
    val d3 = down.loadCurrent()
    assert(d3.committedBatches.isEmpty,
      s"chain ledger must fold to floors, found ${d3.committedBatches.keySet}")
  }

  test("feed modes are exclusive; unordered upstreams refuse at bootstrap") {
    import graft.table.{ChronicleTable, LineageEntry, PendingCommit}
    val cfg = BinlogConfig(numEvents = 400, numConversations = 4,
      segmentSize = 200, dupPct = 0, pDelete = 0.0)
    val src = tmpDir("chain-x-bl")
    BinlogGenerator.writeSegments(spark, cfg, src)
    val p = new CdcPipeline(PipelineConfig(src, tmpDir("chain-x-up"),
      segmentsPerBatch = 2, numBuckets = 4))
    p.runAll(spark)
    val down = new ChronicleTable(tmpDir("chain-x-down"))
    Chain.drain(spark, p.table, down, numBuckets = 4)

    // a chain's version-range ledger keys and a pipeline's batch-index keys
    // share the source prefix — folding both into one floor silently skips
    // un-applied batches, so each direction refuses the other's table
    val intoPipelineFed = intercept[IllegalArgumentException] {
      Chain.pollOnce(spark, p.table, p.table, numBuckets = 4)
    }
    assert(intoPipelineFed.getMessage.contains("pipeline-fed"))
    val intoChainFed = intercept[IllegalArgumentException] {
      new CdcPipeline(PipelineConfig(src, down.root,
        segmentsPerBatch = 2, numBuckets = 4)).runAll(spark)
    }
    assert(intoChainFed.getMessage.contains("chain-fed"))

    // an unordered upstream can never be tailed: refuse BEFORE the
    // bootstrap ships state that poll 2 could not follow up on
    val ss = new ChronicleTable(tmpDir("chain-x-ss"))
    ss.create(Model.physicalSchemaV1, 2)
    ss.commit(ss.loadCurrent(), PendingCommit("ss#0", Nil, Nil, None,
      LineageEntry("ss#0", "epoch", -1L, -1L, 0, 0, 0, 0L, Map.empty, -1L),
      ordered = false))
    val unord = intercept[IllegalArgumentException] {
      Chain.pollOnce(spark, ss, new ChronicleTable(tmpDir("chain-x-down2")),
        numBuckets = 4)
    }
    assert(unord.getMessage.contains("unordered"))
  }

  test("MOR upstream ships tombstones: deletes propagate to the downstream table") {
    val cfg = BinlogConfig(numEvents = 1200, numConversations = 10,
      segmentSize = 300, dupPct = 5, pDelete = 0.25)
    val src = tmpDir("chain-mor-bl")
    BinlogGenerator.writeSegments(spark, cfg, src)
    val p = new CdcPipeline(PipelineConfig(src, tmpDir("chain-mor-up"),
      segmentsPerBatch = 2, numBuckets = 4, mergeOnRead = true))
    val down = new graft.table.ChronicleTable(tmpDir("chain-mor-down"))

    p.runAll(spark, maxBatches = 1)
    Chain.pollOnce(spark, p.table, down, numBuckets = 4)
    assert(visible(down) == visible(p.table))
    p.runAll(spark) // the rest, including deletes of keys shipped in poll 1
    Chain.pollOnce(spark, p.table, down, numBuckets = 4)
    // a key deleted upstream AFTER being shipped must disappear downstream
    assert(visible(down) == visible(p.table))
    val oracle = BinlogGenerator.referenceReduction(cfg)
      .values.map(e => (e.conv_id, e.turn_idx, e.text)).toSet
    assert(visible(down) == oracle)
  }
}
