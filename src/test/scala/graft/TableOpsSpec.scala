package graft

import graft.cdc.{CdcPipeline, PipelineConfig}
import graft.ops.{Compaction, Integrity, MergeInto}
import graft.source.{BinlogConfig, BinlogGenerator}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Table maintenance, integrity and pruning behavior. */
class TableOpsSpec extends SparkSpec {
  import spark.implicits._

  test("compaction shrinks file count, preserves state, keeps old snapshots readable") {
    // Broad batches self-compact (COW rewrites the touched bucket), so file
    // accumulation needs DISJOINT key ranges: each merge lands in the same
    // bucket but outside every existing file's range, so pruning keeps the
    // old files and a new file is appended per merge.
    val tbl = tmpDir("table-compact")
    val p = new CdcPipeline(PipelineConfig("", tbl, numBuckets = 1))
    p.ensureTable()
    (0 until 10).foreach { i =>
      val batch = (0 until 20).map { k =>
        (i * 100L + k, "I", f"conv-$i%02d-$k%04d", 0, "user", s"text $i $k",
          None: Option[String], new java.sql.Timestamp(0L))
      }.toDF("lsn", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts")
      MergeInto(spark, p.table, batch, s"disjoint#$i", "t")
    }
    val before = p.table.loadCurrent()
    assert(before.files.size >= 8, s"expected file accumulation, got ${before.files.size}")
    val stateBefore = p.currentState(spark).collect().toSeq

    val r = Compaction(spark, p.table, maxFilesPerBucket = 2)
    assert(r.compactedBuckets > 0)
    assert(r.snapshot.files.size < before.files.size)
    assert(p.currentState(spark).collect().toSeq == stateBefore)
    // time travel to the pre-compaction snapshot still works
    assert(p.table.read(spark, p.table.loadVersion(before.version)).count() ==
      before.totalRows)
    // idempotence: second compaction run at same version threshold is a no-op
    val r2 = Compaction(spark, p.table, maxFilesPerBucket = 100)
    assert(r2.compactedBuckets == 0)
  }

  test("compaction GCs tombstones older than the horizon") {
    val src = tmpDir("binlog-ts")
    val tbl = tmpDir("table-ts")
    val cfg = BinlogConfig(numEvents = 1000, numConversations = 10,
      segmentSize = 100, pDelete = 0.3)
    BinlogGenerator.writeSegments(spark, cfg, src)
    val p = new CdcPipeline(PipelineConfig(src, tbl, segmentsPerBatch = 1, numBuckets = 2))
    p.ensureTable()
    // unordered mode writes tombstones
    (0 until 10).foreach { b =>
      MergeInto(spark, p.table, p.readBatch(spark, Seq(s"segment=$b")),
        s"u#$b", "t", orderedSource = false)
    }
    val withTombs = p.table.read(spark)
      .filter(col(graft.model.Model.deletedColumn)).count()
    assert(withTombs > 0)
    val state = p.currentState(spark).collect().toSeq
    val r = Compaction(spark, p.table, maxFilesPerBucket = 0,
      tombstoneHorizonLsn = Long.MaxValue)
    assert(r.droppedTombstones == withTombs)
    assert(p.table.read(spark).filter(col(graft.model.Model.deletedColumn)).count() == 0)
    assert(p.currentState(spark).collect().toSeq == state)
  }

  test("merge prunes files: a narrow batch rewrites only intersecting buckets") {
    val src = tmpDir("binlog-prune")
    val tbl = tmpDir("table-prune")
    val cfg = BinlogConfig(numEvents = 4000, numConversations = 200, segmentSize = 2000)
    BinlogGenerator.writeSegments(spark, cfg, src)
    val p = new CdcPipeline(PipelineConfig(src, tbl, segmentsPerBatch = 2, numBuckets = 16))
    p.runAll(spark)
    val files = p.table.loadCurrent().files.size
    // single-key batch: must touch at most the files of ONE bucket
    val one = Seq((999999L, "U", "conv-00000001", 0, "user", "patched", None: Option[String],
      new java.sql.Timestamp(0L)))
      .toDF("lsn", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts")
    val res = MergeInto(spark, p.table, one, "narrow#1", "t")
    assert(res.rewrittenFiles < files / 4,
      s"rewrote ${res.rewrittenFiles} of $files files - pruning ineffective")
  }

  test("ledger floor: out-of-order batch keys compact to max-contiguous + window") {
    import graft.table._
    val tbl = new ChronicleTable(tmpDir("table-ledger"))
    def pc(key: String) = PendingCommit(key, Nil, Nil, None,
      LineageEntry(key, "t", -1, -1, 0, 0, 0, 0L, Map.empty, -1L))
    var s = tbl.create(graft.model.Model.physicalSchemaV1, 1)
    s = tbl.commit(s, pc("x#0"))
    s = tbl.commit(s, pc("x#2")) // gap: 1 missing
    assert(s.floors == Map("x" -> 0L))
    assert(s.committedBatches.keySet.filter(_.startsWith("x#")) == Set("x#2"))
    s = tbl.commit(s, pc("x#1")) // gap closes -> floor jumps to 2, window drains
    assert(s.floors == Map("x" -> 2L))
    assert(!s.committedBatches.keySet.exists(_.startsWith("x#")))
    Seq("x#0", "x#1", "x#2").foreach(k => assert(ChronicleTable.isCommitted(s, k)))
    assert(!ChronicleTable.isCommitted(s, "x#3"))
    // replaying a floor-covered batch is refused by commit (caller skips)
    intercept[IllegalArgumentException] { tbl.commit(s, pc("x#1")) }
    // non-numbered keys stay explicit and idempotent
    s = tbl.commit(s, pc("compact#vA"))
    assert(s.committedBatches.contains("compact#vA"))
    assert(ChronicleTable.isCommitted(s, "compact#vA"))
  }

  test("ledger floor: segment-range batch keys (multi-sink shape) compact too") {
    import graft.table._
    val tbl = new ChronicleTable(tmpDir("table-ledger-range"))
    def pc(key: String) = PendingCommit(key, Nil, Nil, None,
      LineageEntry(key, "t", -1, -1, 0, 0, 0, 0L, Map.empty, -1L))
    var s = tbl.create(graft.model.Model.physicalSchemaV1, 1)
    s = tbl.commit(s, pc("r#0-3"))
    s = tbl.commit(s, pc("r#4-7")) // contiguous -> floor advances to 7
    assert(s.floors == Map("r" -> 7L))
    assert(!s.committedBatches.keySet.exists(_.startsWith("r#")))
    // a gap (segments 8-11 missing) keeps the later range explicit
    s = tbl.commit(s, pc("r#12-15"))
    assert(s.floors == Map("r" -> 7L))
    assert(s.committedBatches.keySet.filter(_.startsWith("r#")) == Set("r#12-15"))
    // the gap closes -> floor jumps over both, window drains
    s = tbl.commit(s, pc("r#8-11"))
    assert(s.floors == Map("r" -> 15L))
    assert(!s.committedBatches.keySet.exists(_.startsWith("r#")))
    Seq("r#0-3", "r#4-7", "r#8-11", "r#12-15").foreach(k =>
      assert(ChronicleTable.isCommitted(s, k), k))
    assert(!ChronicleTable.isCommitted(s, "r#16-19"))
    intercept[IllegalArgumentException] { tbl.commit(s, pc("r#4-7")) }
  }

  test("200-commit replay: manifest size stays O(live files), not O(history)") {
    import graft.table._
    val root = tmpDir("table-bounded")
    val tbl = new ChronicleTable(root)
    def pc(i: Int) = PendingCommit(s"src#$i", Nil, Nil, None,
      LineageEntry(s"src#$i", "t", i, i, 1, 0, 1, 0L, Map.empty, -1L),
      cursor = Some("src" -> i.toLong))
    var s = tbl.create(graft.model.Model.physicalSchemaV1, 4)
    (0 until 200).foreach(i => s = tbl.commit(s, pc(i)))
    assert(s.floors == Map("src" -> 199L))
    assert(s.committedBatches.isEmpty) // fully contiguous -> all compacted
    assert(s.cursors == Map("src" -> 199L))
    def manifestSize(v: Long) =
      java.nio.file.Files.size(java.nio.file.Paths.get(root, "meta", f"v$v%09d.json"))
    // manifest byte size must be flat across the replay (no embedded history)
    assert(manifestSize(200L) <= manifestSize(10L) + 64,
      s"manifest grew: v10=${manifestSize(10L)}B v200=${manifestSize(200L)}B")
  }

  test("snapshot expiry deletes old manifests + only-expired data files; current state intact") {
    val src = tmpDir("binlog-expire")
    val tbl = tmpDir("table-expire")
    val cfg = BinlogConfig(numEvents = 1000, numConversations = 10, segmentSize = 100)
    BinlogGenerator.writeSegments(spark, cfg, src)
    val p = new CdcPipeline(PipelineConfig(src, tbl, segmentsPerBatch = 1, numBuckets = 2))
    p.runAll(spark) // 10 commits -> versions 0..10
    val before = p.table.loadCurrent()
    val state = p.currentState(spark).collect().toSeq
    val allFilesEver = p.table.versions
      .flatMap(v => p.table.loadVersion(v).files.map(_.path)).distinct

    val (expired, deleted) = p.table.expireSnapshots(keepLast = 3)
    assert(expired.nonEmpty && deleted.nonEmpty)
    assert(p.table.versions.size == 3)
    // expired version reads fail cleanly
    intercept[NoSuchElementException] { p.table.loadVersion(expired.head) }
    // current snapshot is untouched: same version, same rows, files on disk
    val after = p.table.loadCurrent()
    assert(after.version == before.version)
    assert(p.currentState(spark).collect().toSeq == state)
    after.files.foreach(f =>
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(f.path))))
    // deleted = exactly the files referenced by no retained version
    val live = p.table.versions.flatMap(v => p.table.loadVersion(v).files.map(_.path)).toSet
    assert(deleted.toSet == allFilesEver.filterNot(live).toSet)
    // resume still works after expiry (ledger floor + cursor survive)
    assert(p.runOnce(spark).isEmpty) // nothing pending
  }

  test("time-sliced read prunes untouched days' files at the manifest level") {
    val tbl = tmpDir("table-timeslice")
    val p = new CdcPipeline(PipelineConfig("", tbl, numBuckets = 1))
    p.ensureTable()
    def dayMs(d: Int) = 1704067200000L + d.toLong * 86400000L
    // three commits with disjoint key ranges (no rewrite) and disjoint days
    (0 until 3).foreach { d =>
      val batch = (0 until 10).map { k =>
        (d * 100L + k, "I", f"conv-$d-$k%03d", 0, "user", s"text $d $k",
          None: Option[String], new java.sql.Timestamp(dayMs(d) + k * 1000L))
      }.toDF("lsn", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts")
      MergeInto(spark, p.table, batch, s"day#$d", "t")
    }
    val snap = p.table.loadCurrent()
    // per-file ts stats recorded
    assert(snap.files.forall(f => f.minTsMs > 0 && f.maxTsMs >= f.minTsMs))
    val day1 = snap.files.filter(f =>
      f.minTsMs >= dayMs(1) && f.maxTsMs < dayMs(2)).map(_.path).toSet
    assert(day1.nonEmpty)
    // manifest-level pruning selects exactly day 1's files
    val pruned = p.table.pruneFilesByTime(snap, dayMs(1), dayMs(2) - 1)
    assert(pruned.map(_.path).toSet == day1)
    // the physical scan lists ONLY those files — untouched days never reach it
    val slice = p.table.readSlice(spark, dayMs(1), dayMs(2) - 1)
    val scanned = slice.inputFiles.map(f =>
      java.nio.file.Paths.get(new java.net.URI(f)).toString).toSet
    assert(scanned == day1, s"scanned $scanned, expected $day1")
    assert(slice.count() == 10)
    // stat-less files (pre-upgrade manifests) are conservatively kept
    val legacy = snap.files.head.copy(minTsMs = 0L, maxTsMs = 0L)
    val withLegacy = snap.copy(files = legacy +: snap.files.tail)
    assert(p.table.pruneFilesByTime(withLegacy, dayMs(1), dayMs(2) - 1)
      .exists(_.path == legacy.path))
  }

  test("CRC integrity: corrupted payloads divert to quarantine, valid rows pass") {
    val clean = Seq((1L, "a", "hello"), (2L, "b", "world"), (3L, "c", "spark"))
      .toDF("lsn", "conv_id", "text")
    val stamped = Integrity.withCrc(clean)
    // corrupt row 2's text after stamping (bit-rot in transit)
    val corrupted = stamped.withColumn("text",
      when(col("lsn") === 2L, lit("w0rld")).otherwise(col("text")))
    val (valid, rejected) = Integrity.validate(corrupted)
    assert(valid.select("lsn").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    assert(rejected.select("lsn").as[Long].collect().toSeq == Seq(2L))
    // untouched stream validates fully
    val (v2, r2) = Integrity.validate(stamped)
    assert(v2.count() == 3 && r2.count() == 0)
  }

  test("streaming windowed aggregation with watermark over the change stream") {
    val src = tmpDir("binlog-wm")
    val cfg = BinlogConfig(numEvents = 2000, numConversations = 10, segmentSize = 500)
    BinlogGenerator.writeSegments(spark, cfg, src)
    val stream = spark.readStream
      .schema(graft.model.Model.changeSchema)
      .option("maxFilesPerTrigger", 16)
      .parquet(s"$src/segment=*")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("op"))
      .agg(count(lit(1)).as("n"))
    val q = stream.writeStream
      .format("memory").queryName("wm_counts")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("ckpt-wm"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // closed windows emitted in append mode; totals bounded by event count
    val emitted = spark.sql("select sum(n) from wm_counts").as[Long].collect()(0)
    assert(emitted > 0 && emitted <= 2000 + cfg.numEvents / 100)
  }
}
