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

  /** The downstream cursor key for an upstream root. */
  def cursorKey(srcRoot: String): String = s"$cursorPrefix$srcRoot"

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
      val chains = t.loadCurrent().cursors.keys.filter(_.startsWith(cursorPrefix))
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
    val direct = dstCursors.keys.filterNot(_.startsWith(cursorPrefix))
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
      val payload = cur.schema.fieldNames
        .filterNot(Model.systemColumns.contains).toSeq
      def asEvents(rows: DataFrame): DataFrame = rows.select(
        col(Model.lsnColumn).as(Model.ordColumn) +:
          when(col(Model.deletedColumn), "D").otherwise("U").as("op") +:
          payload.map(col): _*)

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
      val dstSnap = dst.loadCurrent()
      val known = (dstSnap.floors.keys ++ dstSnap.hwms.keys)
        .filterNot(p => p == "compact" || p == "rescale" || p == "_chain")
        .toSet
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
        MergeInto(spark, dst, asEvents(rows),
          batchKey = s"$s#$lo-${cur.version}",
          source = s"chain ${src.root} v$lastV->v${cur.version}",
          cursor = if (last) Some(key -> cur.version) else None,
          mergeOnRead = mergeOnRead)
      }
      Some(ChainResult(lastV, cur.version, prefixes, merges))
    } finally changes.unpersist()
  }

  /** Poll until caught up (each poll sees the version the previous one
    * left); returns polls performed.
    */
  def drain(spark: SparkSession, src: ChronicleTable, dst: ChronicleTable,
      numBuckets: Int = 16, maxPolls: Int = Int.MaxValue,
      mergeOnRead: Boolean = false): Int = {
    var n = 0
    while (n < maxPolls &&
        pollOnce(spark, src, dst, numBuckets, mergeOnRead).isDefined)
      n += 1
    n
  }

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
      mergeOnRead: Boolean = false): org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.format("rate").option("rowsPerSecond", 1).load()
      .writeStream
      .queryName(s"graft-chain-${dst.root.hashCode.toHexString}")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(intervalMs))
      .option("checkpointLocation", s"${dst.root}/_follow_checkpoint")
      .foreachBatch { (_: DataFrame, _: Long) =>
        drain(spark, src, dst, numBuckets, mergeOnRead = mergeOnRead): Unit
      }
      .start()
}
