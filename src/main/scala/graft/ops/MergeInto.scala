package graft.ops

import graft.model.Model
import graft.table._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, LongType, StringType, StructField, StructType}

import scala.jdk.CollectionConverters._

/** Result of one merge attempt. */
case class MergeResult(
    snapshot: Snapshot,
    skipped: Boolean,
    upserts: Long,
    deletes: Long,
    rewrittenFiles: Int,
    addedFiles: Int)

/** Hand-rolled MERGE INTO (copy-on-write) against a [[ChronicleTable]].
  *
  * Semantics: for each key (conv_id, turn_idx), the highest-LSN change wins
  * — within the batch, across batches, and across replays. `I`/`U` both
  * upsert (insert-or-replace, so redelivery is idempotent — the reference's
  * create-vs-index ES tolerance, DefaultIndexInfoBuilder.java:135-173), `D`
  * removes the key.
  *
  * Exactly-once is layered:
  *   - batchKey ledger: a whole replayed batch is skipped (suro's
  *     `processingFileSet` upload dedup, RemoteFileSink.java:159-216);
  *   - LSN high-water mark: events at-or-below the snapshot's hwm are
  *     already applied and are dropped before dedup (the north star's
  *     "dedup per key using LSN/offset high-water marks") — this is also
  *     what makes a delete final against a later redelivery of an older
  *     insert (tombstone-free);
  *   - per-key `_lsn` guard: each table row stores the LSN that wrote it;
  *     a batch change only displaces a row it strictly beats. In-order
  *     replay never triggers this, but it keeps update reordering across
  *     epochs from regressing row content.
  *
  * Physical plan, designed for 100 TB:
  *   1. dedup the batch (map-side combine + optional salt — [[Dedup]]);
  *   2. ONE metadata aggregate over the deduped batch yields lsn range, key
  *      range, affected bucket set, op counts and the lineage checksum;
  *   3. file pruning is metadata-only: only files in affected buckets whose
  *      conv_id range intersects the batch's are rewritten — untouched files
  *      carry forward in the manifest without any IO;
  *   4. the existing-LSN guard reads ONLY (conv_id, turn_idx, _lsn) of
  *      touched files (column-pruned parquet scan) and semi-joins a
  *      broadcast of the batch keys — result is at most batch-sized;
  *   5. survivors = touched-files LEFT ANTI JOIN broadcast(winner keys):
  *      table data never shuffles, it streams through whole-stage codegen;
  *   6. new files are hash-split within each bucket and sorted by
  *      (bucket, conv_id, turn_idx) inside every file, so parquet row-group
  *      stats stay tight; pruning granularity for the NEXT merge is the
  *      bucket (per-file conv_id bounds inside a bucket are near-full by
  *      construction of the hash split — the single write pass is worth more
  *      than narrow per-file ranges, which would need a second
  *      sampling/range pass);
  *   7. commit is a metadata-only atomic pointer flip recording the batchKey.
  */
object MergeInto {

  /** Broadcast the anti-join key side when the deduped batch has fewer keys
    * than this; larger batches use a shuffled join instead. Building a
    * multi-million-entry broadcast hash relation is SERIAL driver work per
    * micro-batch — measured to cap cluster scaling long before the shuffle
    * would — so the cutoff stays modest (typical CDC micro-batches are far
    * below it; a bulk backfill is exactly the case where the shuffled join
    * is right).
    */
  @volatile var broadcastKeyLimit: Long =
    sys.env.getOrElse("GRAFT_BROADCAST_KEY_LIMIT", "1000000").toLong

  /** Broadcast-hint a batch-derived join side only under the key cutoff
    * (above it the hint is omitted and the join shuffles / AQE decides).
    */
  private[graft] def maybeBroadcastDf(df: DataFrame, keyCount: Long): DataFrame =
    if (keyCount <= broadcastKeyLimit) broadcast(df) else df

  /** Phase-timing log for profiling runs. */
  @volatile var profile: Boolean = false

  /** Floor on the estimated bytes a single staged-write task should own
    * (guide §2.5/§6: derive partitioning from input size, keep output
    * files from fragmenting). Only ever REDUCES the write's task count —
    * the shuffle-partition/bucket cap still bounds it above — so cluster-
    * scale merges plan exactly as before while micro-batches stop paying
    * a fleet of near-empty write tasks. Production would set this toward
    * a full target file size (128M+); the default stays modest so the
    * local bench's mid-size merges keep their parallelism.
    */
  @volatile var minWritePartitionBytes: Long =
    sys.env.getOrElse("GRAFT_WRITE_MIN_PART_BYTES", (16L << 20).toString).toLong

  // Cumulative per-phase wall nanos since the last drain — always recorded
  // (two clock reads + one adder bump per phase) so the bench can report a
  // per-phase scaling breakdown without a special profiling mode. Phases
  // overlap wall-clock in the pipelined drain (prepare runs concurrently
  // with the predecessor's write), so these sum to MORE than elapsed time;
  // the per-phase lo/hi RATIO is the meaningful signal.
  private val phaseNanos =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.LongAdder]()

  private def tick[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    val dt = System.nanoTime() - t0
    phaseNanos.computeIfAbsent(name,
      _ => new java.util.concurrent.atomic.LongAdder).add(dt)
    if (profile) println(f"[merge] $name ${dt / 1e9}%.2fs")
    r
  }

  /** Per-phase cumulative seconds since the previous drain, then reset —
    * the bench snapshots this around each replay trial.
    */
  def drainPhaseSeconds(): Map[String, Double] = {
    val out = phaseNanos.asScala.map { case (k, v) => k -> v.sum / 1e9 }.toMap
    phaseNanos.clear()
    out
  }

  /** A prepared (deduped, cached) batch plus the slim planning stats the
    * apply phase needs BEFORE writing: key range + bucket set (file
    * pruning), row count (broadcast sizing, empty-batch exit) and max LSN
    * (fully-stale-batch exit). Computed over the PRE-HWM dedup result —
    * for pruning that is a safe superset; correctness of redelivery
    * handling stays with the HWM filter at apply time.
    */
  case class Prepared(df: DataFrame, minKey: String, maxKey: String,
      n: Long, maxLsn: Long, buckets: Set[Int],
      /** The bucket count `buckets` (and the cached `__bucket` column) were
        * computed under. The apply phase reloads the snapshot LATER; if an
        * online rescale committed in between, apply recomputes the bucket
        * set under the current count instead of pruning with stale ids
        * (which would miss touched files and break base-file key
        * uniqueness).
        */
      numBuckets: Int) {
    def unpersist(): Unit = df.unpersist()
  }

  /** The table-independent heavy phase: LWW dedup of a raw batch, bucket
    * assignment, persisted — with the slim planning aggregate as the
    * materializing action (one job does both; a separate apply-side stats
    * job was measured stalling ~seconds per batch behind the in-flight
    * next-batch prepare under the pipelined drain's FIFO scheduling).
    * Safe to run CONCURRENTLY with the previous batch's apply (it reads no
    * table state) — the exact high-water-mark redelivery filter happens at
    * apply time over the (small) cached result, so preparing against a
    * not-yet-committed predecessor cannot resurrect deleted rows.
    */
  def prepare(spark: SparkSession, batch: DataFrame, numBuckets: Int,
      saltBuckets: Int = 0): Prepared = tick("prepare") {
    val d = dedupOnly(batch, numBuckets, saltBuckets).cache()
    val s = (d.agg(
      min("conv_id").as("minKey"), max("conv_id").as("maxKey"),
      count(lit(1)).as("n"), max(col(Model.ordColumn)).as("maxLsn"),
      collect_set("__bucket").as("buckets")).collect()(0))
    val n = s.getAs[Long]("n")
    Prepared(d, s.getAs[String]("minKey"), s.getAs[String]("maxKey"), n,
      if (n == 0) -1L else s.getAs[Long]("maxLsn"),
      s.getSeq[Int](s.fieldIndex("buckets")).toSet, numBuckets)
  }

  private def dedupOnly(batch: DataFrame, numBuckets: Int,
      saltBuckets: Int): DataFrame = {
    // Window dedup by default: one hash shuffle + one reduce-side sort.
    // In the common CDC shape (keyspace >> per-task events) max_by's
    // map-side combine reduces nothing, so its extra map-side sort of the
    // full batch costs ~40% of the dedup phase (measured in DedupBench:
    // 4.2M vs 2.9M events/s at 16 cores, and better 4->16 scaling).
    // Salted max_by remains the explicit hot-key path.
    val deduped0 =
      if (saltBuckets > 1)
        Dedup.saltedLatest(batch, Model.keyColumns, Model.ordColumn, saltBuckets)
      else Dedup.latestByKeyWindow(batch, Model.keyColumns, Model.ordColumn)
    deduped0.withColumn("__bucket",
      ChronicleTable.bucketExpr("conv_id", numBuckets))
  }

  def apply(spark: SparkSession, table: ChronicleTable, batch: DataFrame,
      batchKey: String, source: String, saltBuckets: Int = 0,
      orderedSource: Boolean = true,
      cursor: Option[(String, Long)] = None,
      prepared: Option[Prepared] = None,
      /** Merge-on-read mode: the batch's winners (upserts AND delete
        * tombstones) are written as DELTA files overlaying the table —
        * write IO is O(batch) with NO table reads, where copy-on-write
        * reads and rewrites every touched file. Readers pay a per-key LWW
        * merge ([[ChronicleTable.mergeDeltas]]) until compaction folds the
        * deltas into base files; the per-key `_lsn` comparison that the
        * CoW guard join performs at write time happens there at read time,
        * so unordered sources need no guard scan either. The
        * write-amplification arm of the LSM trade — right when batches are
        * small relative to the touched working set (the 100 TB steady
        * state); CoW stays right when reads dominate commits.
        */
      mergeOnRead: Boolean = false): MergeResult = {
    // A foreachBatch batch DataFrame rides the micro-batch's CLONED
    // session, not the caller's. Every internal scan and the staged write
    // must run on the BATCH's session: the final action executes under the
    // plan root's session, and the write-riding Observation only hears
    // execution-end events from the session it registered on
    // (ExecutionListenerBus filters by session UUID) — a mixed-session
    // union leaves commitFiles waiting on the observation forever.
    val sess = batch.sparkSession
    val base = table.loadCurrent()
    if (ChronicleTable.isCommitted(base, batchKey)) {
      // Exactly-once: replay of an already-applied batch is a no-op.
      prepared.foreach(_.unpersist())
      return MergeResult(base, skipped = true, 0, 0, 0, 0)
    }

    // --- schema evolution ------------------------------------------------
    val systemCols = Model.systemColumns.toSet
    val batchPayload = StructType(batch.schema.fields.filterNot(f =>
      f.name == Model.ordColumn || f.name == "op"))
    val tablePayload = StructType(
      base.schema.fields.filterNot(f => systemCols.contains(f.name)))
    val mergedPayload = ChronicleTable.mergeSchemas(tablePayload, batchPayload)
    val physicalSchema = StructType(mergedPayload.fields ++ Seq(
      StructField(Model.lsnColumn, LongType, nullable = false),
      StructField(Model.deletedColumn, BooleanType, nullable = false),
      StructField(Model.sourceColumn, StringType, nullable = true)))
    // also true for a pre-`_source` table (first merge adds the system
    // column; older files read as null) and for a TYPE WIDENING (same
    // names, wider type — name comparison alone would silently drop the
    // widened schema from the commit)
    def sig(s: StructType) = s.fields.map(f => (f.name, f.dataType)).toSeq
    val evolved = sig(physicalSchema) != sig(base.schema)
    val srcPrefix = batchKey.takeWhile(_ != '#')

    val prep0 = prepared.getOrElse(
      prepare(spark, batch, base.numBuckets, saltBuckets))
    // An online rescale may have committed between a pipelined prepare and
    // this apply: the cached dedup result is still valid (table-independent)
    // but its bucket set was computed under the OLD count — recompute it
    // over the (small, cached) result so file pruning sees the real layout.
    val prep =
      if (prep0.numBuckets == base.numBuckets) prep0
      else prep0.copy(numBuckets = base.numBuckets,
        buckets = prep0.df
          .select(ChronicleTable.bucketExpr("conv_id", base.numBuckets).as("__b"))
          .distinct().collect().map(_.getInt(0)).toSet)
    val dedupedAll = prep.df
    // --- high-water-mark redelivery filter (ordered sources) -------------
    // Applied AFTER dedup, over the small cached result: per key the
    // winner's LSN is the batch maximum, so a winner at-or-below the
    // applied high-water mark means every event for that key is a
    // redelivery — dropping it is exactly the pre-dedup filter's effect
    // (this ordering is what lets `prepare` run table-independently; it
    // also keeps a late redelivery of a pre-delete insert from winning:
    // its LSN cannot exceed the hwm that covered the delete).
    // The mark is PER SOURCE (batch-key prefix): LSN sequences of distinct
    // sources (Kafka partitions, binlog shards) are independent, so a
    // global mark would silently drop a second source whose sequence runs
    // below the first's.
    val deduped =
      if (orderedSource)
        dedupedAll.filter(col(Model.ordColumn) > lit(base.hwmFor(srcPrefix)))
      else dedupedAll

    try {
      // Write planning runs off the stats the PREPARE pass already
      // computed with its materializing action (key range + bucket set are
      // a safe superset of the post-HWM batch; broadcast sizing needs only
      // the order of magnitude). The expensive lineage stats (LSN range,
      // delete count, payload checksum over the full text column) ride the
      // WRITE job as observed metrics — no apply-side aggregate job at
      // all, which under the pipelined drain's FIFO scheduling used to
      // stall behind the in-flight next-batch prepare.
      val n = prep.n
      // empty batch, or an ordered batch that is redeliveries end-to-end
      // (its max LSN at-or-below this source's mark): ledger the batchKey
      // and advance the cursor without touching data
      if (n == 0 ||
          (orderedSource && prep.maxLsn <= base.hwmFor(srcPrefix))) {
        val lineage = LineageEntry(batchKey, source, -1L, -1L, 0, 0, 0, 0L, Map.empty, -1L)
        val next = table.commit(base, PendingCommit(batchKey, Nil, Nil, None,
          lineage, cursor, ordered = orderedSource))
        return MergeResult(next, skipped = false, 0, 0, 0, 0)
      }
      val minKey = prep.minKey
      val maxKey = prep.maxKey
      val buckets = prep.buckets

      // Lineage metrics collected by the write job. The CollectMetrics
      // node must sit on a branch the write plan executes EXACTLY ONCE
      // (the upsert side of the union, below the ordered-mode tombstone
      // drop) — on a shared subplan like `deduped` it would execute once
      // per branch and the bit_xor checksum would self-cancel.
      val obs = org.apache.spark.sql.Observation()
      // lineage checksum columns: keys + text for transcript tables (the
      // per-turn text equality invariant), keys + full payload for derived
      // tables without a text column (e.g. a maintained signature index)
      val checksumCols = (Model.keyColumns ++
        (if (mergedPayload.fieldNames.contains("text")) Seq("text")
         else mergedPayload.fieldNames.toSeq
           .filterNot(Model.keyColumns.contains))).map(col)
      val metricExprs = Seq(
        coalesce(min(col(Model.ordColumn)), lit(-1L)).as("minLsn"),
        coalesce(max(col(Model.ordColumn)), lit(-1L)).as("maxLsn"),
        coalesce(sum(when(col("op") === "D", 1L).otherwise(0L)), lit(0L))
          .as("deletes"),
        coalesce(sum(when(col("op") =!= "D", 1L).otherwise(0L)), lit(0L))
          .as("upserts"),
        coalesce(bit_xor(when(col("op") =!= "D",
          xxhash64(checksumCols: _*))), lit(0L))
          .as("checksum"))
      var obsInput: DataFrame = null
      def observed(rows: DataFrame): DataFrame = {
        obsInput = rows
        rows.observe(obs, metricExprs.head, metricExprs.tail: _*)
      }

      // hash-split sorted write of the new files + distributed footer stats
      // (shared by both modes). `bytesHint` is the manifest-derived
      // estimate of the staged output (touched bytes + batch estimate):
      // the split count derives from DATA SIZE, floored so no write task
      // owns less than ~minWritePartitionBytes — a core-count constant
      // here produced 32 near-empty files (and 32 footer reads, and a
      // 32-entry commit) for an 800-row micro-batch, pure fixed overhead
      // that shrinks at neither cluster size nor data size. At scale the
      // size-derived count saturates the same shuffle-partition cap as
      // before, so large merges are unchanged.
      def writeStaged(newData: DataFrame, bytesHint: Long): Seq[DataFileMeta] = {
        val staging = table.newStagingDir()
        val cap = math.max(1, math.min(
          sess.conf.get("spark.sql.shuffle.partitions").toInt, buckets.size * 4))
        val parts = math.max(1L, math.min(cap.toLong,
          (bytesHint + minWritePartitionBytes - 1) / minWritePartitionBytes))
          .toInt
        val splitsPerBucket = math.max(1, parts / math.max(1, buckets.size))
        tick("write")(withMicrosTimestamps(sess)(newData
          .withColumn("bucket", ChronicleTable.bucketExpr("conv_id", base.numBuckets))
          .withColumn("__split",
            pmod(xxhash64(col("conv_id"), lit(1)), lit(splitsPerBucket)))
          .repartition(parts, col("bucket"), col("__split"))
          .drop("__split")
          .sortWithinPartitions("bucket", "conv_id", "turn_idx")
          .write.partitionBy("bucket").mode("overwrite").parquet(staging)))
        tick("stats-job")(collectFileStats(sess, staging))
      }

      // (reads obs — call only after writeStaged's action completed)
      def commitFiles(removed: Seq[String], added: Seq[DataFileMeta]): (Snapshot, Long, Long) = {
        // When the staged write lands ZERO rows end-to-end (a pure-delete
        // batch displacing every touched row), AQE's empty-relation
        // propagation re-plans the finished map stage away and the
        // CollectMetrics node vanishes from the final plan — the
        // observation then completes with an EMPTY row. Recompute the same
        // aggregates directly over the observed input (cached, and tiny in
        // exactly this case) instead of committing bogus lineage.
        val m0 = obs.get
        val m =
          if (m0.nonEmpty) m0
          else {
            val r = obsInput.agg(metricExprs.head, metricExprs.tail: _*)
              .collect()(0)
            r.schema.fieldNames.map(f => f -> r.getAs[Any](f)).toMap
          }
        val upserts = m("upserts").asInstanceOf[Long]
        val deletes = m("deletes").asInstanceOf[Long]
        val lineage = LineageEntry(batchKey, source,
          m("minLsn").asInstanceOf[Long], m("maxLsn").asInstanceOf[Long],
          upserts, deletes, added.map(_.rows).sum,
          m("checksum").asInstanceOf[Long],
          added.groupBy(_.bucket.toString).map { case (b, fs) => b -> fs.map(_.rows).sum },
          -1L)
        val pending = PendingCommit(batchKey, removed, added,
          if (evolved) Some(physicalSchema) else None, lineage, cursor,
          ordered = orderedSource)
        (tick("commit")(table.commit(base, pending)), upserts, deletes)
      }

      if (mergeOnRead) {
        // --- merge-on-read: the batch IS the write — no table reads --------
        // Tombstones persist unconditionally (ordered or not): read-time
        // LWW needs them to mask the base rows they delete.
        val deltaRows = conform(
          observed(deduped
            .withColumn(Model.lsnColumn, col(Model.ordColumn))
            .withColumn(Model.deletedColumn, col("op") === "D")
            .withColumn(Model.sourceColumn, lit(srcPrefix))),
          physicalSchema)
        val added = writeStaged(deltaRows, bytesHint = n * 256L)
          .map(_.copy(delta = true))
        val (next, upserts, deletes) = commitFiles(Nil, added)
        return MergeResult(next, skipped = false, upserts, deletes, 0, added.size)
      }

      // --- metadata-only file pruning --------------------------------------
      val touched = table.pruneFiles(base, buckets, minKey, maxKey)
      val touchedPaths = touched.map(_.path)
      val touchedRows = touched.map(_.rows).sum
      // Touched delta files fold into this rewrite: a key may then appear
      // several times across the touched set (base + newer delta versions),
      // so the guard and survivor scans must LWW-collapse it first.
      val touchedHasDeltas = touched.exists(_.delta)

      // Broadcast the batch-key side only when the table side dwarfs it:
      // building a broadcast hash relation is SERIAL driver work (collect +
      // hash build), measured ~2s for a 500k-key batch — pure Amdahl loss
      // when the touched table side is batch-sized anyway. The row counts
      // come free from the manifest.
      def maybeBroadcast(df: DataFrame): DataFrame =
        if (n * 8 <= touchedRows) maybeBroadcastDf(df, n) else df

      // --- per-key existing-LSN guard (column-pruned scan of touched files)
      // For an ordered source the HWM filter already guarantees every batch
      // event is strictly newer than anything applied, so the guard is
      // skipped — one fewer scan+join per micro-batch.
      val winners: DataFrame =
        if (touched.isEmpty || orderedSource) deduped
        else {
          val keyLsnSchema = StructType(physicalSchema.fields.filter(f =>
            Model.keyColumns.contains(f.name) || f.name == Model.lsnColumn))
          // max per key: exact in pure-CoW (keys unique across base files,
          // the agg is a no-op) and REQUIRED once touched deltas can carry
          // several versions of one key
          val contested = sess.read.schema(keyLsnSchema).parquet(touchedPaths: _*)
            .join(maybeBroadcast(deduped.select(Model.keyColumns.map(col): _*)),
              Model.keyColumns, "left_semi")
            .groupBy(Model.keyColumns.map(col): _*)
            .agg(max(col(Model.lsnColumn)).as("__existing_lsn"))
          // contested is at most batch-sized, which a bulk unordered backfill
          // can push past the broadcast cutoff — gate it like every other
          // batch-derived side (AQE falls back to a shuffled join).
          deduped.join(maybeBroadcast(contested), Model.keyColumns, "left")
            .filter(col("__existing_lsn").isNull ||
              col(Model.ordColumn) > col("__existing_lsn"))
            .drop("__existing_lsn")
        }

      // --- survivors: touched rows whose key is NOT displaced --------------
      val winnerKeys = winners.select(Model.keyColumns.map(col): _*)
      val survivors: Option[DataFrame] =
        if (touched.isEmpty) None
        else {
          val scan = sess.read.schema(physicalSchema).parquet(touchedPaths: _*)
          // collapse base+delta versions of a key before the rewrite — the
          // new base files must be key-unique (pure-CoW scans already are,
          // and skip the aggregate)
          val collapsed =
            if (touchedHasDeltas) ChronicleTable.mergeDeltas(scan, physicalSchema)
            else scan
          Some(collapsed.join(maybeBroadcast(winnerKeys), Model.keyColumns, "left_anti"))
        }

      // Winning deletes persist as tombstones (payload nulled), so a later
      // redelivery of an older change for the key loses the LSN comparison
      // instead of resurrecting the row. An ordered source needs no
      // tombstones — the HWM filter already makes deletes final — so they
      // are dropped there ABOVE the metrics node (the delete count and LSN
      // range must still see them).
      val upsertRows = conform({
        val o = observed(winners
          .withColumn(Model.lsnColumn, col(Model.ordColumn))
          .withColumn(Model.deletedColumn, col("op") === "D")
          .withColumn(Model.sourceColumn, lit(srcPrefix)))
        if (orderedSource) o.filter(col("op") =!= "D") else o
      }, physicalSchema)
      val newData = survivors match {
        case Some(s) => s.unionByName(upsertRows)
        case None => upsertRows
      }

      // --- write new files, sorted within each bucket split -----------------
      // Hash repartition on (bucket, sub-split), NOT repartitionByRange:
      // range partitioning runs a sampling job that would execute the whole
      // merge pipeline a second time — at scale that doubles the pass over
      // the touched data. The deterministic hash split keeps hot buckets
      // from serializing into one writer; files stay sorted by key so
      // row-group stats and the footer min/max remain useful.
      val touchedBytes = touched.map(_.bytes).sum
      val avgRowBytes =
        if (touchedRows > 0 && touchedBytes > 0)
          math.max(64L, touchedBytes / touchedRows)
        else 256L
      val added = writeStaged(newData,
        bytesHint = touchedBytes + n * avgRowBytes)
      val (next, upserts, deletes) = commitFiles(touchedPaths, added)
      MergeResult(next, skipped = false, upserts, deletes, touched.size, added.size)
    } finally dedupedAll.unpersist()
  }

  /** Project `df` onto `schema`: shared columns pass through, columns the
    * frame lacks become typed nulls (schema-on-read fill for pre-evolution
    * data).
    */
  def conform(df: DataFrame, schema: StructType): DataFrame = {
    val have = df.columns.toSet
    df.select(schema.fields.toSeq.map { f =>
      if (have(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
  }

  /** Per-file manifest stats (row count, conv_id min/max, ts min/max) from
    * the parquet FOOTERS, read by a tiny DISTRIBUTED job over the file list
    * — metadata-only (no column data is scanned) and no driver-side per-
    * file IO. A commit adds O(shuffle partitions) files; opening every
    * footer on the driver would be O(files) serial driver work per commit,
    * the kind that caps commit rate at 100× (Iceberg collects these stats
    * from write-task results for the same reason).
    *
    * Listing goes through the Hadoop FileSystem API (not java.nio), so the
    * staging directory can live on any configured filesystem (S3A, HDFS);
    * the footer reads on executors carry the SESSION's Hadoop configuration
    * (spark.hadoop.* credentials/endpoints), not a default one.
    */
  private[ops] def collectStats(spark: SparkSession, staging: String): Seq[DataFileMeta] =
    collectFileStats(spark, staging)

  /** Commits at-or-below this many files read their footers with a driver-
    * side THREAD POOL instead of a Spark job: a micro-batch commit adds
    * O(shuffle partitions) files, and the distributed job's cost there is
    * pure scheduling latency (~0.5s measured — a fixed per-batch term that
    * caps scaling efficiency, since it shrinks at neither cluster size).
    * The parallel pool keeps the reads concurrent (never the round-1
    * serial-driver-IO hazard), and commits larger than the threshold —
    * compactions, rescales, bulk backfills at 100x — still use the
    * distributed job, which is the shape that scales with the cluster.
    */
  @volatile var driverFooterThreshold: Int =
    sys.env.getOrElse("GRAFT_DRIVER_FOOTER_MAX", "256").toInt

  private def collectFileStats(spark: SparkSession, staging: String): Seq[DataFileMeta] = {
    import org.apache.hadoop.fs.{Path => HPath}
    val hadoopConf = spark.sessionState.newHadoopConf()
    val stagingPath = new HPath(staging)
    val fs = stagingPath.getFileSystem(hadoopConf)
    if (!fs.exists(stagingPath)) return Nil
    // one recursive LIST call (object stores serve this as a flat prefix
    // listing — no per-directory walk), returning paths WITH sizes; only
    // the footer decode is shipped to executors
    val it = fs.listFiles(stagingPath, true)
    val paths = Iterator.continually(it)
      .takeWhile(_.hasNext).map(_.next())
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toUri.getPath).toSeq.sorted
    if (paths.isEmpty) return Nil
    val metas =
      if (paths.size <= driverFooterThreshold) {
        // footer decode is O(KB) metadata IO per file: a bounded driver
        // pool beats a Spark job's scheduling latency for batch-sized
        // commits
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          math.min(16, paths.size))
        try {
          paths.map(p => pool.submit(
            new java.util.concurrent.Callable[DataFileMeta] {
              def call(): DataFileMeta = readFooterStats(p, hadoopConf)
            })).map(_.get())
        } finally pool.shutdown()
      } else {
        import spark.implicits._
        val serConf = new org.apache.spark.util.SerializableConfiguration(hadoopConf)
        val parallelism = math.max(1, math.min(paths.size,
          spark.sparkContext.defaultParallelism))
        spark.createDataset(paths)
          .repartition(parallelism)
          .mapPartitions(it => it.map(p => readFooterStats(p, serConf.value)))
          .collect().toSeq
      }
    metas.filter(_.rows > 0).sortBy(_.path)
  }

  /** Run `body` with parquet timestamps written as INT64 micros: Spark's
    * INT96 default writes NO usable column statistics, which would blind
    * the footer-based manifest stats (and every engine's row-group
    * pruning) for the ts column. Readers handle both encodings.
    *
    * The conf is set WITHOUT restore: every engine write path wants MICROS,
    * the set is idempotent, and a set/restore pair is a RACE under
    * concurrent same-session sink merges (MultiSinkPipeline.applyAll) — one
    * thread's restore landing while another thread's write is planning
    * would produce INT96 files with no usable ts stats, silently degrading
    * time pruning to keep-everything. Engine sessions set it at
    * construction anyway ([[graft.util.Sessions]]); this is the belt for
    * externally-built sessions.
    */
  private[graft] def withMicrosTimestamps[T](spark: SparkSession)(body: => T): T = {
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    body
  }

  /** Executor-side footer read for one data file, under the session's
    * Hadoop configuration (a default `new Configuration()` here would drop
    * spark.hadoop.* credentials and break on any non-default filesystem).
    */
  private def readFooterStats(f: String,
      conf: org.apache.hadoop.conf.Configuration): DataFileMeta = {
    import org.apache.hadoop.fs.{Path => HPath}
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val bucketRe = ".*/bucket=(\\d+)/[^/]+$".r
    val inputFile = HadoopInputFile.fromPath(new HPath(f), conf)
    val reader = ParquetFileReader.open(inputFile)
    try {
      val blocks = reader.getFooter.getBlocks.asScala
      val rows = blocks.map(_.getRowCount).sum
      def colStats(name: String) = blocks.flatMap(_.getColumns.asScala
        .filter(_.getPath.toDotString == name).map(_.getStatistics))
      val keyStats = colStats("conv_id").collect {
        case s: org.apache.parquet.column.statistics.BinaryStatistics if !s.isEmpty =>
          (s.genericGetMin.toStringUsingUTF8, s.genericGetMax.toStringUsingUTF8)
      }
      // TimestampType is physically INT64 micros; manifest stores millis
      val tsStats = colStats("ts").collect {
        case s: org.apache.parquet.column.statistics.LongStatistics if !s.isEmpty =>
          (s.genericGetMin / 1000L, s.genericGetMax / 1000L)
      }
      // `_lsn` bounds feed the changelog's manifest-level pruning
      val lsnStats = colStats(Model.lsnColumn).collect {
        case s: org.apache.parquet.column.statistics.LongStatistics if !s.isEmpty =>
          (s.genericGetMin, s.genericGetMax)
      }
      val bucket = f match {
        case bucketRe(b) => b.toInt
        case _ => -1
      }
      DataFileMeta(f, rows, bucket,
        if (keyStats.isEmpty) "" else keyStats.map(_._1).min,
        if (keyStats.isEmpty) "￿" else keyStats.map(_._2).max,
        if (tsStats.isEmpty) 0L else tsStats.map(_._1).min,
        if (tsStats.isEmpty) 0L else tsStats.map(_._2).max,
        minLsn = if (lsnStats.isEmpty) -1L else lsnStats.map(_._1).min,
        maxLsn = if (lsnStats.isEmpty) -1L else lsnStats.map(_._2).max,
        bytes = inputFile.getLength)
    } finally reader.close()
  }

  /** Canonical change-event projection (lsn, op, payload...). */
  def changeColumns: Seq[Column] =
    (Seq(Model.ordColumn, "op") ++ Model.payloadColumns).map(col)
}
