package graft

import graft.cdc.MultiSourcePipeline
import graft.model.Model
import graft.source.{BinlogConfig, BinlogGenerator}
import org.apache.spark.sql.functions._

/** Source hot-add/remove mid-drain (the reference's InputManager.set,
  * InputManager.java:36-56): the source SET lives in a JSON file re-read
  * per drain cycle; adding an entry backfills it through its own cursor,
  * removing one freezes its position, re-adding resumes exactly-once.
  */
class MultiSourceSpec extends SparkSpec {

  private def visible(t: graft.table.ChronicleTable) =
    t.read(spark).filter(!col(Model.deletedColumn))
      .select("conv_id", "turn_idx", "text")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet

  private def writeSources(file: String, entries: (String, String)*): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(file),
      entries.map { case (id, dir) => s"""{"id":"$id","dir":"$dir"}""" }
        .mkString("[", ",", "]"))

  test("sources hot-add, hot-remove and re-add mid-drain, exactly-once") {
    // two delete-free binlogs with DISJOINT conversations (B's keys are
    // b- prefixed) so the expected union is checkable per source
    val cfgA = BinlogConfig(numEvents = 800, numConversations = 6,
      segmentSize = 200, dupPct = 5, pDelete = 0.0)
    val cfgB = BinlogConfig(numEvents = 600, numConversations = 4,
      segmentSize = 200, dupPct = 5, pDelete = 0.0)
    val srcA = tmpDir("ms-bl-a")
    BinlogGenerator.writeSegments(spark, cfgA, srcA)
    val rawB = tmpDir("ms-bl-braw")
    val srcB = tmpDir("ms-bl-b")
    BinlogGenerator.writeSegments(spark, cfgB, rawB)
    spark.read.parquet(rawB)
      .withColumn("conv_id", concat(lit("b-"), col("conv_id")))
      .write.partitionBy("segment").mode("overwrite").parquet(srcB)

    def oracleA = BinlogGenerator.referenceReduction(cfgA).values
      .map(e => (e.conv_id, e.turn_idx, e.text)).toSet
    def oracleB = BinlogGenerator.referenceReduction(cfgB).values
      .map(e => ("b-" + e.conv_id, e.turn_idx, e.text)).toSet

    val srcsFile = s"${tmpDir("ms-conf")}/sources.json"
    val p = new MultiSourcePipeline(tmpDir("ms-table"), srcsFile,
      segmentsPerBatch = 1, numBuckets = 4)

    // start with A only
    writeSources(srcsFile, "srcA" -> srcA)
    assert(p.runAll(spark) > 0)
    assert(visible(p.table) == oracleA)

    // HOT-ADD B: next cycles pick it up and backfill the whole source;
    // A stays caught up (cursor-driven no-ops)
    writeSources(srcsFile, "srcA" -> srcA, "srcB" -> srcB)
    assert(p.runAll(spark) > 0)
    assert(visible(p.table) == (oracleA ++ oracleB))
    val snap = p.table.loadCurrent()
    assert(snap.cursors.contains("srcA") && snap.cursors.contains("srcB"))
    assert(snap.hwms.contains("srcA") && snap.hwms.contains("srcB"))

    // HOT-REMOVE A, then new A segments arrive: they must NOT drain (the
    // cursor freezes), while the set keeps converging on B alone
    writeSources(srcsFile, "srcB" -> srcB)
    val moreA = tmpDir("ms-bl-a2")
    val cfgA2 = cfgA.copy(numEvents = 1200)
    BinlogGenerator.writeSegments(spark, cfgA2, moreA)
    (4 to 5).foreach { s =>
      java.nio.file.Files.move(
        java.nio.file.Paths.get(moreA, s"segment=$s"),
        java.nio.file.Paths.get(srcA, s"segment=$s"))
    }
    assert(p.runAll(spark) == 0) // B caught up; A not driven
    assert(visible(p.table) == (oracleA ++ oracleB))

    // RE-ADD A: resumes from the frozen cursor, drains ONLY the new
    // segments, converges to the grown oracle
    writeSources(srcsFile, "srcA" -> srcA, "srcB" -> srcB)
    val applied = p.runAll(spark)
    assert(applied == 2, s"re-added source must drain exactly the 2 new " +
      s"segments, applied $applied batches")
    val oracleA2 = BinlogGenerator.referenceReduction(cfgA2).values
      .map(e => (e.conv_id, e.turn_idx, e.text)).toSet
    assert(visible(p.table) == (oracleA2 ++ oracleB))
    // no duplicate keys: every hot transition stayed exactly-once
    val dup = p.table.read(spark).filter(!col(Model.deletedColumn))
      .groupBy("conv_id", "turn_idx").count().filter(col("count") > 1).count()
    assert(dup == 0L)

    // re-pointing an EXISTING id at a different feed refuses (its cursor
    // must not be replayed against a different segment numbering)
    writeSources(srcsFile, "srcA" -> srcB)
    val err = intercept[IllegalArgumentException] { p.runOnce(spark) }
    assert(err.getMessage.contains("re-pointed"))
  }
}
