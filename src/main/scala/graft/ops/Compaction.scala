package graft.ops

import graft.model.Model
import graft.table._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Table maintenance: small-file compaction and tombstone GC.
  *
  * Every micro-batch commit adds a file per touched bucket, so a long
  * replay accretes many small files (the reference rotates and uploads
  * small files continuously and relies on downstream batching,
  * LocalFileSink.java:183-252; a lakehouse table must compact instead).
  * Compaction rewrites the buckets whose file count exceeds a threshold
  * and drops tombstones older than `tombstoneHorizonLsn` (a tombstone only
  * needs to outlive the maximum redelivery window of the source).
  *
  * The rewrite is a SORT-ORDERED, SIZE-BOUNDED split (Iceberg's bin-pack +
  * sort rewrite): rows range-partition on (bucket, conv_id) into
  * ~`targetRowsPerFile` slices, so a compacted bucket becomes N files with
  * PAIRWISE-DISJOINT key ranges instead of one monolithic file (a 100 TB
  * table's bucket is TBs — it must split) — and because the manifest's
  * per-file key bounds are then genuinely selective, a point lookup
  * ([[graft.table.ChronicleTable.readKey]]) or key-range scan prunes to a
  * single file per bucket. Range partitioning's sampling pass over the
  * victims is acceptable HERE because compaction is periodic maintenance;
  * the per-batch merge write stays hash-split exactly to avoid that
  * second pass on the hot path (MergeInto.writeStaged).
  *
  * Runs through the same atomic commit protocol as MERGE, so readers always
  * see either the old or the new file set, and a crash mid-compaction
  * leaves only GC-able orphans.
  */
object Compaction {

  /** The maintenance rewrite both compaction and rescale share: rows
    * range-partition on (bucket, conv_id) into ~`targetRowsPerFile` slices
    * (partition count sized from `victimRows`, the manifests' pre-rewrite
    * row count — free, no extra job; capped so a mis-sized target cannot
    * explode the shuffle), sort within partitions, and land under
    * `staging/bucket=N/` — every produced file covers a contiguous,
    * disjoint key range WITHIN its bucket, so manifest key bounds stay
    * selective (point lookups prune to one file per bucket).
    */
  private[ops] def rangeSplitWrite(spark: SparkSession,
      rows: org.apache.spark.sql.DataFrame, numBuckets: Int,
      victimRows: Long, targetRowsPerFile: Long, staging: String): Unit = {
    val parts = math.max(1,
      math.min((victimRows / math.max(1L, targetRowsPerFile) + 1).toInt,
        1 << 15))
    MergeInto.withMicrosTimestamps(spark)(rows
      .withColumn("bucket", ChronicleTable.bucketExpr("conv_id", numBuckets))
      .repartitionByRange(parts, col("bucket"), col("conv_id"))
      .sortWithinPartitions("bucket", "conv_id", "turn_idx")
      .write.partitionBy("bucket").mode("overwrite").parquet(staging))
  }

  case class CompactionResult(
      snapshot: Snapshot,
      compactedBuckets: Int,
      removedFiles: Int,
      addedFiles: Int,
      /** Rows removed by the rewrite: horizon-GC'd tombstones plus — when
        * merge-on-read deltas were folded — superseded key versions the
        * LWW merge collapsed.
        */
      droppedRows: Long)

  def apply(spark: SparkSession, table: ChronicleTable,
      maxFilesPerBucket: Int = 4,
      tombstoneHorizonLsn: Long = Long.MinValue,
      /** Target rows per rewritten file. The pre-GC victim row count from
        * the manifest (free) sizes the range-partition count; the default
        * keeps small tables at one file per bucket while bounding file
        * size on large ones.
        */
      targetRowsPerFile: Long = 4000000L): CompactionResult = {
    val base = table.loadCurrent()
    val byBucket = table.filesOf(base).groupBy(_.bucket)
    // a bucket holding ANY merge-on-read delta is always a target: folding
    // deltas back into key-unique base files is what bounds the read-time
    // merge cost of the MOR write path
    val targets = byBucket.filter { case (_, fs) =>
      fs.size > maxFilesPerBucket || fs.exists(_.delta)
    }
    if (targets.isEmpty)
      return CompactionResult(base, 0, 0, 0, 0)

    val schema = base.schema
    val victims = targets.values.flatten.toSeq
    val src = spark.read.schema(schema).parquet(victims.map(_.path): _*)
    // LWW-collapse base+delta versions per key BEFORE the tombstone horizon
    // filter: dropping an old tombstone pre-merge would let the even-older
    // base row it masks win the merge and resurrect a deleted key
    val merged =
      if (victims.exists(_.delta)) ChronicleTable.mergeDeltas(src, schema)
      else src
    val horizonDrop = col(Model.deletedColumn) &&
      col(Model.lsnColumn) <= lit(tombstoneHorizonLsn)
    val kept = merged.filter(!horizonDrop)

    val staging = table.newStagingDir()
    // victim row count is the pre-GC upper bound on the output
    rangeSplitWrite(spark, kept, base.numBuckets,
      victims.map(_.rows).sum, targetRowsPerFile, staging)

    val added = MergeInto.collectStats(spark, staging)
    val dropped = victims.map(_.rows).sum - added.map(_.rows).sum
    // Range-shaped key "compact#<prevFloor+1>-<version>": unique per run
    // (the version always advances), and the contiguous-floor ledger
    // compaction folds it away — a periodically-maintained table must not
    // accrete one explicit ledger key per maintenance run.
    val key = s"compact#${base.floors.getOrElse("compact", -1L) + 1}-${base.version}"
    val lineage = LineageEntry(key, "compaction",
      -1L, -1L, 0, 0, added.map(_.rows).sum, 0L,
      added.groupBy(_.bucket.toString).map { case (b, fs) => b -> fs.map(_.rows).sum },
      -1L)
    val next = table.commit(base, PendingCommit(key,
      victims.map(_.path), added, None, lineage))
    CompactionResult(next, targets.size, victims.size, added.size, dropped)
  }
}
