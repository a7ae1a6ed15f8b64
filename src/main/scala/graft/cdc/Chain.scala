package graft.cdc

import graft.model.Model
import graft.ops.{MergeInto, MergeResult}
import graft.table.ChronicleTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pipeline chaining: a downstream ChronicleTable TAILS an upstream one
  * through the incremental changelog — the reference forwards a server's
  * traffic into another suro server via SuroSink/SuroClient
  * (SuroSink.java:15-38), re-expressed as table-to-table change shipping
  * with exactly-once, per-source marks intact.
  *
  * Protocol per poll:
  *   1. the last consumed upstream VERSION rides the downstream table's
  *      own cursor ledger (`cursors("chain<-" + srcRoot)`), so the chain
  *      has no side checkpoint to fall out of sync with the data;
  *   2. `src.readChanges(lastV)` yields the net changes — each row filtered
  *      against ITS OWN source's high-water mark (multi-source correct);
  *   3. changes are re-shaped into change events (tombstone -> D, live row
  *      -> U with its original `_lsn`) and MERGEd into the downstream table
  *      PER SOURCE, with batchKey prefix = the original source prefix —
  *      the downstream table's per-source marks mirror the upstream's, so
  *      it can itself be chained further;
  *   4. the cursor advance rides ONLY the last source's commit: a crash
  *      mid-poll leaves the cursor at the old version, the replayed poll
  *      re-reads the same deterministic range, and already-committed
  *      sources skip via their batchKey ledgers (the same
  *      replay-then-dedup loop as the reference's notice consumer,
  *      S3Consumer.java:226-290).
  *
  * Delete visibility follows the upstream table's changelog contract
  * ([[ChronicleTable.readChanges]]): a merge-on-read upstream ships
  * tombstones (deletes propagate); an ordered CoW upstream erases deletes
  * physically, so its chain is upsert-only.
  *
  * At 100 TB the poll is metadata + O(new files) per tail (manifest `_lsn`
  * bounds prune pre-cursor files), which is exactly the reference's
  * notice-queue property: consumers receive the new files, never a
  * listing of the table.
  */
object Chain {

  /** Namespace of chain cursor keys in the downstream table's cursor map. */
  val cursorPrefix: String = "chain<-"

  /** Namespace of STREAM-chain cursor keys ([[followStream]] — position is
    * the stream's batch id; the authoritative cursor is the streaming
    * checkpoint, this marker claims the feed mode and shows progress).
    */
  val streamCursorPrefix: String = "chainstream<-"

  /** The downstream cursor key for an upstream root. */
  def cursorKey(srcRoot: String): String = s"$cursorPrefix$srcRoot"

  /** Record one metrics-ledger line per applied poll/stream batch on the
    * DOWNSTREAM table (`<dst>/metrics`, the same ledger the pipeline
    * writes), so `/stats` on a chain-fed table serves live per-mode rates
    * — without this the status surface showed ledger state but no rates
    * for chained drains. One driver-side JSONL append per poll; set false
    * to silence (benchmarks isolating IO).
    */
  @volatile var recordMetrics: Boolean = true

  private def recordMetric(dst: ChronicleTable, srcRoot: String,
      epoch: Long, merges: Seq[MergeResult], sec: Double,
      mode: String): Unit =
    if (recordMetrics) {
      val up = merges.map(_.upserts).sum
      val del = merges.map(_.deletes).sum
      Metrics.append(s"${dst.root}/metrics", MetricEvent(srcRoot, epoch,
        System.currentTimeMillis(), up + del, sec, up, del, mode))
    }

  private def isChainCursor(k: String): Boolean =
    k.startsWith(cursorPrefix) || k.startsWith(streamCursorPrefix)

  /** A table is either CHAIN-FED or PIPELINE-FED, never both. A chain's
    * ledger keys reuse the upstream source's own prefix with snapshot-
    * VERSION ranges (`binlog#2-5`); a direct pipeline's keys use the same
    * prefix with BATCH indexes (`binlog#3`). Folding both unit semantics
    * into one contiguous floor silently marks un-applied direct batches as
    * committed (data loss), so the two feed modes are mutually exclusive
    * per table, detected through the cursor namespace: chains record
    * `chain<-<root>` cursors, pipelines record `<sourceId>` segment
    * cursors. Multi-chain and multi-source-pipeline tables stay legal.
    */
  def requireNotChainFed(t: ChronicleTable, who: String): Unit =
    if (t.exists) {
      val chains = t.loadCurrent().cursors.keys.filter(isChainCursor)
      require(chains.isEmpty,
        s"table ${t.root} is chain-fed (${chains.mkString(",")}): $who would " +
          "collide with the chain's ledger floors (version-range keys vs " +
          "batch-index keys under one prefix) — drain into a separate table " +
          "and chain it, or drop the chain first")
    }

  case class ChainResult(
      fromVersion: Long,
      toVersion: Long,
      sources: Seq[String],
      merges: Seq[MergeResult])

  /** Default bootstrap slice size (bytes of upstream data per slice).
    * The first poll of a fresh downstream ships the upstream's FULL
    * visible state; at 100 TB one merge carrying the whole table would
    * exhaust shuffle/disk long before the incremental regime begins, so
    * the bootstrap is CHUNKED into ceil(bytes / this) exactly-once
    * lsn-interval slices (see [[pollOnce]]). Larger = fewer commits,
    * bigger per-slice merges; the default trades ~6k slices for a 100 TB
    * table against merge batches a large cluster digests comfortably.
    */
  val DefaultBootstrapSliceBytes: Long = 16L << 30

  /** Ship all changes committed upstream since the last poll. None = the
    * downstream table is already caught up.
    *
    * `mergeOnRead` selects the DOWNSTREAM write mode: merge-on-read keeps
    * shipped tombstones (up to the GC horizon), so the downstream can
    * itself be chained further WITH delete propagation — a copy-on-write
    * downstream erases deletes physically and tails on as upsert-only,
    * exactly like a CoW upstream.
    *
    * BOOTSTRAP (first poll) is CHUNKED: the upstream's visible state is
    * sliced into K disjoint `_lsn` intervals (K = ceil(manifest bytes /
    * `bootstrapSliceBytes`), capped at upstream version+1 so slice keys
    * can tile version units), each slice shipped as its own exactly-once
    * unit — per source, a slice's ledger key claims a version-unit
    * subrange, so the floor folds them like ordinary polls and a crash
    * between slices resumes at the next one (already-committed slices
    * skip by key; re-read rows at-or-below a source's advanced mark drop
    * in the HWM filter). Slices ship in INCREASING lsn order, which is
    * what keeps the per-source high-water marks sound mid-bootstrap:
    * every later slice's rows strictly exceed the marks the earlier
    * slices advanced. Slice scans prune at the manifest by lsn bounds
    * (O(files-in-interval) IO each) and ship RAW changelog rows
    * (superseded MOR versions and retained tombstones included) — the
    * downstream merge LWWs them per key exactly as it does for live
    * polls. An upstream whose manifests carry no lsn stats (pre-upgrade)
    * has no slicing axis and falls back to a single-batch bootstrap.
    */
  def pollOnce(spark: SparkSession, src: ChronicleTable,
      dst: ChronicleTable, numBuckets: Int = 16,
      mergeOnRead: Boolean = false,
      bootstrapSliceBytes: Long = DefaultBootstrapSliceBytes,
      /** Row-level DERIVATION applied to every shipped change set before
        * the downstream merge — the chain's map hook. The function must
        * PRESERVE the system columns (`_lsn`, `_deleted`, `_source`: each
        * output row keeps the lsn/source of the input row that derived it,
        * and derives tombstones from tombstones) so exactly-once, ledger
        * tiling and per-source marks work untouched; the payload columns
        * may change entirely (the downstream table's schema evolves to
        * them). This is how a MAINTAINED DERIVED TABLE rides the chain —
        * e.g. [[graft.dedup.SignatureIndex]] keeps a MinHash/LSH index in
        * lockstep with a document table's changelog.
        */
      transform: DataFrame => DataFrame = identity): Option[ChainResult] = {
    val cur = src.loadCurrent()
    // fail BEFORE the bootstrap, not on poll 2: an unordered upstream can
    // never be tailed (readChanges would refuse), so shipping its full
    // state first would strand a half-initialized downstream
    require(cur.unordered.isEmpty,
      s"upstream ${src.root} has unordered sources " +
        s"${cur.unordered.mkString(",")} — its changelog cannot be tailed " +
        "(no mark bounds their redelivery), so it cannot be chained")
    if (!dst.exists) dst.create(Model.physicalSchemaV1, numBuckets)
    val dstCursors = dst.loadCurrent().cursors
    val streamFed = dstCursors.keys.filter(_.startsWith(streamCursorPrefix))
    require(streamFed.isEmpty,
      s"table ${dst.root} is stream-chain-fed (${streamFed.mkString(",")}): " +
        "poll-mode chaining would interleave a second ledger-key scheme " +
        "with the stream's batch-id keys — keep tailing via followStream")
    val direct = dstCursors.keys.filterNot(isChainCursor)
    require(direct.isEmpty,
      s"table ${dst.root} is pipeline-fed (cursors ${direct.mkString(",")})" +
        ": chaining into it would collide with the pipeline's batch-index " +
        "ledger keys — see Chain.requireNotChainFed")
    val key = cursorKey(src.root)
    val lastV = dstCursors.getOrElse(key, -1L)
    if (lastV >= cur.version) return None
    val t0 = System.nanoTime()
    var known = knownPrefixes(dst.loadCurrent())
    var shipped = Set.empty[String]

    // Ship one change set as one merge per ORIGINAL source, in
    // deterministic order, so the downstream marks stay per-source; rows
    // written before the _source column existed (null) ship under a
    // dedicated legacy prefix. A KNOWN source with NO rows in this set
    // still gets a (metadata-only) empty commit: every prefix's range
    // keys then tile contiguously across polls/slices and the ledger
    // floor folds them away — without this, one quiet poll would leave a
    // permanent gap and the explicit window would grow by one key per
    // prefix per later poll. A prefix's FIRST range anchors at version
    // unit 0 (nothing was ever shipped for it before, so the wider claim
    // is vacuous) — a source joining mid-stream then tiles from 0 and
    // its floor folds immediately instead of leaving a permanent
    // pre-join gap.
    def shipRange(changes0: DataFrame, unitLo: Long, unitHi: Long,
        last: Boolean, what: String): Seq[MergeResult] = {
      val changes = transform(changes0)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val payload = payloadOf(changes.schema)
        val srcCol = col(Model.sourceColumn)
        val tagged = changes.select(coalesce(srcCol, lit("_legacy")).as("__src"))
          .distinct().collect().map(_.getString(0)).toSet
        val prefixes = (tagged ++ known).toSeq.sorted match {
          case Nil => Seq("_chain") // empty set on a fresh table: cursor-only
          case ps => ps
        }
        val ms = prefixes.zipWithIndex.map { case (s, i) =>
          val rows = changes.filter(coalesce(srcCol, lit("_legacy")) === s)
          val lo = if (known.contains(s)) unitLo else 0L
          MergeInto(spark, dst, asEvents(rows, payload),
            batchKey = s"$s#$lo-$unitHi",
            source = what,
            cursor = if (last && i == prefixes.size - 1)
                       Some(key -> cur.version)
                     else None,
            mergeOnRead = mergeOnRead)
        }
        known ++= prefixes.filterNot(_ == "_chain")
        shipped ++= prefixes
        ms
      } finally { changes.unpersist(); () }
    }

    val merges: Seq[MergeResult] =
      if (lastV >= 0)
        // incremental poll: the pruned changelog, one version-unit range
        shipRange(src.readChanges(spark, lastV), lastV + 1, cur.version,
          last = true, s"chain ${src.root} v$lastV->v${cur.version}")
      else {
        val k = bootstrapSliceCount(src, cur, bootstrapSliceBytes)
        if (k <= 1)
          // small (or lsn-statless) upstream: one-batch bootstrap of the
          // COLLAPSED visible state, as before
          shipRange(src.read(spark, cur), 0L, cur.version, last = true,
            s"chain ${src.root} bootstrap v${cur.version}")
        else {
          val (gMin, gMax) = src.lsnBounds(cur)
          val units = BigInt(cur.version) + 1
          (0 until k).flatMap { i =>
            val (lsnLo, lsnHi) = ChronicleTable.lsnSliceInterval(gMin, gMax, i, k)
            val unitLo = (units * i / k).toLong
            val unitHi = (units * (i + 1) / k).toLong - 1
            shipRange(src.scanLsnInterval(spark, cur, lsnLo, lsnHi),
              unitLo, unitHi, last = i == k - 1,
              s"chain ${src.root} bootstrap v${cur.version} " +
                s"slice ${i + 1}/$k")
          }
        }
      }
    recordMetric(dst, src.root, cur.version, merges,
      (System.nanoTime() - t0) / 1e9, "chain-poll")
    Some(ChainResult(lastV, cur.version, shipped.toSeq.sorted, merges))
  }

  /** Bootstrap slice count for an upstream snapshot: bytes-driven, capped
    * by version-unit tiling (at most version+1 slice keys can tile the
    * unit space), by the FILE count (a file is the atomic scan unit —
    * finer slicing just multiplies near-empty merges) and by the lsn
    * width; 1 when the manifests carry no lsn bounds (no slicing axis —
    * pre-upgrade tables).
    */
  private def bootstrapSliceCount(src: ChronicleTable,
      cur: graft.table.Snapshot, sliceBytes: Long): Int = {
    if (sliceBytes <= 0L) return 1
    val (gMin, gMax) = src.lsnBounds(cur)
    if (gMin < 0L || gMax <= gMin) return 1
    val files = src.filesOf(cur)
    val bytes = files.map(_.bytes.max(0L)).sum
    val wanted = 1L + (bytes - 1L).max(0L) / sliceBytes
    math.min(math.min(wanted, cur.version + 1),
      math.min(files.size.toLong.max(1L),
        math.min(gMax - gMin + 1, Int.MaxValue.toLong))).toInt.max(1)
  }

  /** Poll until caught up (each poll sees the version the previous one
    * left); returns polls performed. `maintainEveryPolls > 0` runs
    * [[maintain]] on the downstream after every Nth applying poll.
    */
  def drain(spark: SparkSession, src: ChronicleTable, dst: ChronicleTable,
      numBuckets: Int = 16, maxPolls: Int = Int.MaxValue,
      mergeOnRead: Boolean = false, maintainEveryPolls: Int = 0,
      bootstrapSliceBytes: Long = DefaultBootstrapSliceBytes,
      transform: DataFrame => DataFrame = identity): Int = {
    var n = 0
    while (n < maxPolls &&
        pollOnce(spark, src, dst, numBuckets, mergeOnRead,
          bootstrapSliceBytes, transform).isDefined) {
      n += 1
      if (maintainEveryPolls > 0 && n % maintainEveryPolls == 0)
        maintain(spark, dst, mergeOnRead)
    }
    n
  }

  /** Downstream housekeeping for a long-lived chain — the pipeline drain
    * runs this every N batches ([[CdcPipeline]] `maintenanceEveryBatches`),
    * but a CHAIN-fed table has no pipeline: without it an always-on
    * [[follow]] accumulates a snapshot per poll forever and, under
    * merge-on-read, delta files between manual compactions. Same recipe as
    * the pipeline's: fold deltas up to the SAFE tombstone horizon (the
    * minimum mark across the downstream's mirrored sources; MinValue — no
    * GC — when any is unordered/unmarked), expire old snapshots, GC aged
    * orphans.
    *
    * Retention caveat for CASCADES: a further-downstream tail holds this
    * table's VERSION as its cursor — `retainSnapshots` must cover the
    * slowest such tail or its next poll fails with the expired-cursor
    * error (the same contract as log retention vs. consumer lag).
    */
  def maintain(spark: SparkSession, dst: ChronicleTable,
      mergeOnRead: Boolean = false, maxFilesPerBucket: Int = 8,
      retainSnapshots: Int = 10): Unit = {
    val horizon =
      if (mergeOnRead) dst.loadCurrent().tombstoneHorizon else Long.MinValue
    graft.ops.Compaction(spark, dst, maxFilesPerBucket,
      tombstoneHorizonLsn = horizon)
    dst.expireSnapshots(retainSnapshots)
    dst.gcOrphans()
  }

  /** Payload (non-system) column names of a chained schema. */
  private def payloadOf(schema: org.apache.spark.sql.types.StructType): Seq[String] =
    schema.fieldNames.filterNot(Model.systemColumns.contains).toSeq

  /** Re-shape changelog rows into change events: tombstone -> D, live row
    * -> U, each keeping its ORIGINAL `_lsn` as the event order — the
    * downstream merge then reproduces the upstream's per-source marks.
    */
  private def asEvents(rows: DataFrame, payload: Seq[String]): DataFrame =
    rows.select(
      col(Model.lsnColumn).as(Model.ordColumn) +:
        when(col(Model.deletedColumn), "D").otherwise("U").as("op") +:
        payload.map(col): _*)

  /** Source prefixes the downstream table has already seen (maintenance
    * and placeholder prefixes are not sources).
    */
  private def knownPrefixes(snap: graft.table.Snapshot): Set[String] =
    (snap.floors.keys ++ snap.hwms.keys)
      .filterNot(p => p == "compact" || p == "rescale" || p == "_chain")
      .toSet

  /** Continuous tail: a Structured Streaming query whose every trigger
    * drains the upstream changelog — the always-on form of [[drain]] (the
    * reference's SuroSink forwards continuously as traffic arrives,
    * SuroSink.java:15-38). The rate source is a one-row metronome; the
    * real work runs driver-side in foreachBatch through the same
    * exactly-once [[pollOnce]], so the query's own checkpoint carries no
    * state that matters — a crash loses nothing (the chain cursor rides
    * the downstream table's ledger) and a restart resumes mid-stream.
    */
  def follow(spark: SparkSession, src: ChronicleTable, dst: ChronicleTable,
      numBuckets: Int = 16, intervalMs: Long = 1000L,
      mergeOnRead: Boolean = false,
      maintainEveryTriggers: Int = 0): org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.format("rate").option("rowsPerSecond", 1).load()
      .writeStream
      .queryName(s"graft-chain-${dst.root.hashCode.toHexString}")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(intervalMs))
      .option("checkpointLocation", s"${dst.root}/_follow_checkpoint")
      .foreachBatch { (_: DataFrame, batchId: Long) =>
        drain(spark, src, dst, numBuckets, mergeOnRead = mergeOnRead): Unit
        if (maintainEveryTriggers > 0 && batchId > 0 &&
            batchId % maintainEveryTriggers == 0)
          maintain(spark, dst, mergeOnRead)
      }
      .start()

  /** Continuous tail driven by the NATIVE change-stream source
    * ([[graft.changes.DefaultSource]], `format("graft.changes")`) instead
    * of the metronome: the source plans each micro-batch as the
    * manifest-pruned net changes of a version range, Spark's own offset
    * log carries the cursor, and the foreachBatch sink applies the batch
    * idempotently — the north star's "foreachBatch idempotent-commit
    * sink" verbatim. Versus [[follow]]: position lives in the streaming
    * checkpoint (offset WAL) rather than the downstream ledger, so the
    * batch contents are replay-stable by OFFSET (a restarted batch N
    * re-reads the same version range and its ledger keys `<src>#N` skip),
    * and the pipeline composes with stream-native rate limiting
    * (`maxVersionsPerTrigger`) and monitoring. The bootstrap ships the
    * upstream state CHUNKED into `bootstrapSliceBytes`-sized lsn-interval
    * micro-batches (never one table-sized batch), like [[pollOnce]]'s
    * sliced first poll; the slice plan rides the offset WAL, so a crash
    * mid-bootstrap resumes at the next slice.
    *
    * A stream-chained table is its own feed mode: [[pollOnce]] refuses
    * stream-chain-fed tables and vice versa (batch-id keys and
    * version-range keys under one prefix would mis-fold the ledger).
    */
  def followStream(spark: SparkSession, src: ChronicleTable,
      dst: ChronicleTable, numBuckets: Int = 16, intervalMs: Long = 1000L,
      mergeOnRead: Boolean = false,
      maxVersionsPerTrigger: Long = Long.MaxValue,
      trigger: org.apache.spark.sql.streaming.Trigger = null,
      maintainEveryTriggers: Int = 0,
      bootstrapSliceBytes: Long = DefaultBootstrapSliceBytes,
      bootstrapSlices: Int = 0): org.apache.spark.sql.streaming.StreamingQuery = {
    val trig = Option(trigger).getOrElse(
      org.apache.spark.sql.streaming.Trigger.ProcessingTime(intervalMs))
    val cur = src.loadCurrent()
    require(cur.unordered.isEmpty,
      s"upstream ${src.root} has unordered sources " +
        s"${cur.unordered.mkString(",")} — its changelog cannot be tailed " +
        "(no mark bounds their redelivery), so it cannot be chained")
    if (!dst.exists) dst.create(Model.physicalSchemaV1, numBuckets)
    val dstCursors = dst.loadCurrent().cursors
    val pollFed = dstCursors.keys.filter(_.startsWith(cursorPrefix))
    require(pollFed.isEmpty,
      s"table ${dst.root} is poll-chain-fed (${pollFed.mkString(",")}): " +
        "stream chaining would interleave batch-id ledger keys with the " +
        "poll chain's version-range keys — keep tailing via pollOnce/follow")
    val direct = dstCursors.keys.filterNot(isChainCursor)
    require(direct.isEmpty,
      s"table ${dst.root} is pipeline-fed (cursors ${direct.mkString(",")})" +
        ": chaining into it would collide with the pipeline's batch-index " +
        "ledger keys — see Chain.requireNotChainFed")
    val markerKey = s"$streamCursorPrefix${src.root}"
    src.readChangeStream(spark, startingVersion = "bootstrap",
        maxVersionsPerTrigger = maxVersionsPerTrigger,
        bootstrapSliceBytes = bootstrapSliceBytes,
        bootstrapSlices = bootstrapSlices)
      .writeStream
      .queryName(s"graft-chainstream-${dst.root.hashCode.toHexString}")
      .trigger(trig)
      .option("checkpointLocation", s"${dst.root}/_followstream_checkpoint")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val t0 = System.nanoTime()
        val ms = shipStreamBatch(dst, batch, batchId, markerKey, mergeOnRead)
        recordMetric(dst, src.root, batchId, ms,
          (System.nanoTime() - t0) / 1e9, "chain-stream")
        // same housekeeping as [[follow]]'s — batch ids are contiguous
        // across restarts, so the cadence survives a resume
        if (maintainEveryTriggers > 0 && batchId > 0 &&
            batchId % maintainEveryTriggers == 0)
          maintain(batch.sparkSession, dst, mergeOnRead)
      }
      .start()
  }

  /** One-shot catch-up through the change-stream source: runs a
    * Trigger.AvailableNow [[followStream]] to completion (drains every
    * version committed before the call, then terminates) — the
    * stream-native form of [[drain]], sharing its checkpoint with
    * [[followStream]] so the two can alternate on one downstream table.
    */
  def syncStream(spark: SparkSession, src: ChronicleTable,
      dst: ChronicleTable, numBuckets: Int = 16,
      mergeOnRead: Boolean = false, maintainEveryTriggers: Int = 0,
      bootstrapSliceBytes: Long = DefaultBootstrapSliceBytes,
      bootstrapSlices: Int = 0): Unit =
    followStream(spark, src, dst, numBuckets, mergeOnRead = mergeOnRead,
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow(),
      maintainEveryTriggers = maintainEveryTriggers,
      bootstrapSliceBytes = bootstrapSliceBytes,
      bootstrapSlices = bootstrapSlices)
      .awaitTermination()

  /** Apply one change-stream micro-batch downstream, exactly-once: one
    * merge per ORIGINAL source (downstream marks mirror the upstream's),
    * ledger keys `<src>#<batchId>` — batch ids are contiguous across
    * restarts (the offset WAL), so the ledger floor folds them and a
    * replayed batch skips. A prefix first seen at batch N anchors with the
    * range key `<src>#0-N` (the pre-join claim is vacuous — nothing was
    * ever shipped for it), so its keys fold immediately instead of
    * leaving a permanent 0..N-1 gap; a known prefix with no rows this
    * batch still commits (metadata-only) to keep its tiling contiguous —
    * both invariants inherited from [[pollOnce]].
    */
  private[cdc] def shipStreamBatch(dst: ChronicleTable,
      batch: DataFrame, batchId: Long, markerKey: String,
      mergeOnRead: Boolean): Seq[MergeResult] = {
    // All work rides the BATCH's (cloned micro-batch) session — see the
    // session note in MergeInto.apply.
    val spark = batch.sparkSession
    val changes = batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val payload = payloadOf(batch.schema)
      val srcCol = col(Model.sourceColumn)
      val tagged = changes.select(coalesce(srcCol, lit("_legacy")).as("__src"))
        .distinct().collect().map(_.getString(0)).toSet
      val known = knownPrefixes(dst.loadCurrent())
      val prefixes = (tagged ++ known).toSeq.sorted match {
        case Nil => Seq("_chain") // quiet batch on a fresh table
        case ps => ps
      }
      prefixes.zipWithIndex.map { case (s, i) =>
        val rows = changes.filter(coalesce(srcCol, lit("_legacy")) === s)
        val lo = if (known.contains(s)) batchId else 0L
        val key = if (lo >= batchId) s"$s#$batchId" else s"$s#$lo-$batchId"
        MergeInto(spark, dst, asEvents(rows, payload),
          batchKey = key,
          source = s"chainstream $markerKey batch $batchId",
          cursor = if (i == prefixes.size - 1) Some(markerKey -> batchId)
                   else None,
          mergeOnRead = mergeOnRead)
      }
    } finally { changes.unpersist(); () }
  }
}
