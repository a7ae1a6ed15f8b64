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

  /** Ship all changes committed upstream since the last poll. None = the
    * downstream table is already caught up.
    *
    * `mergeOnRead` selects the DOWNSTREAM write mode: merge-on-read keeps
    * shipped tombstones (up to the GC horizon), so the downstream can
    * itself be chained further WITH delete propagation — a copy-on-write
    * downstream erases deletes physically and tails on as upsert-only,
    * exactly like a CoW upstream.
    */
  def pollOnce(spark: SparkSession, src: ChronicleTable,
      dst: ChronicleTable, numBuckets: Int = 16,
      mergeOnRead: Boolean = false): Option[ChainResult] = {
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

    // first poll bootstraps from the full visible state (tombstones too,
    // where retained); later polls read the pruned changelog
    val changes =
      (if (lastV < 0) src.read(spark, cur)
       else src.readChanges(spark, lastV))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val payload = payloadOf(cur.schema)

      // one merge per ORIGINAL source, in deterministic order, so the
      // downstream marks stay per-source; rows written before the _source
      // column existed (null) ship under a dedicated legacy prefix. A
      // source with NO rows in this delta still gets a (metadata-only)
      // empty commit: every prefix's range keys then tile contiguously
      // across polls and the ledger floor folds them away — without this,
      // one quiet poll would leave a permanent gap and the explicit
      // window would grow by one key per prefix per later poll.
      val srcCol = col(Model.sourceColumn)
      val tagged = changes.select(coalesce(srcCol, lit("_legacy")).as("__src"))
        .distinct().collect().map(_.getString(0)).toSet
      val known = knownPrefixes(dst.loadCurrent())
      val prefixes = (tagged ++ known).toSeq.sorted match {
        case Nil => Seq("_chain") // empty first poll: cursor-only commit
        case ps => ps
      }
      val merges = prefixes.zipWithIndex.map { case (s, i) =>
        val rows = changes.filter(coalesce(srcCol, lit("_legacy")) === s)
        val last = i == prefixes.size - 1
        // a prefix's FIRST range anchors at version 0 (nothing was ever
        // shipped for it before, so the wider claim is vacuous) — a source
        // joining mid-stream then tiles from 0 and its floor folds
        // immediately instead of leaving a permanent pre-join gap
        val lo = if (known.contains(s)) lastV + 1 else 0L
        MergeInto(spark, dst, asEvents(rows, payload),
          batchKey = s"$s#$lo-${cur.version}",
          source = s"chain ${src.root} v$lastV->v${cur.version}",
          cursor = if (last) Some(key -> cur.version) else None,
          mergeOnRead = mergeOnRead)
      }
      Some(ChainResult(lastV, cur.version, prefixes, merges))
    } finally changes.unpersist()
  }

  /** Poll until caught up (each poll sees the version the previous one
    * left); returns polls performed. `maintainEveryPolls > 0` runs
    * [[maintain]] on the downstream after every Nth applying poll.
    */
  def drain(spark: SparkSession, src: ChronicleTable, dst: ChronicleTable,
      numBuckets: Int = 16, maxPolls: Int = Int.MaxValue,
      mergeOnRead: Boolean = false, maintainEveryPolls: Int = 0): Int = {
    var n = 0
    while (n < maxPolls &&
        pollOnce(spark, src, dst, numBuckets, mergeOnRead).isDefined) {
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
    * (`maxVersionsPerTrigger`) and monitoring. The first batch bootstraps
    * the full upstream state, like [[pollOnce]]'s first poll.
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
      maintainEveryTriggers: Int = 0): org.apache.spark.sql.streaming.StreamingQuery = {
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
        maxVersionsPerTrigger = maxVersionsPerTrigger)
      .writeStream
      .queryName(s"graft-chainstream-${dst.root.hashCode.toHexString}")
      .trigger(trig)
      .option("checkpointLocation", s"${dst.root}/_followstream_checkpoint")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        shipStreamBatch(dst, batch, batchId, markerKey, mergeOnRead): Unit
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
      mergeOnRead: Boolean = false, maintainEveryTriggers: Int = 0): Unit =
    followStream(spark, src, dst, numBuckets, mergeOnRead = mergeOnRead,
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow(),
      maintainEveryTriggers = maintainEveryTriggers)
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
