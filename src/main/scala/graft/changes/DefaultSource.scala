package graft.changes

import graft.table.{ChronicleTable, DataFileMeta, Snapshot}
import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.datasources.{FileFormat, PartitionedFile}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import scala.jdk.CollectionConverters._

/** `spark.readStream.format("graft.changes")` — the table's incremental
  * changelog as a first-class Structured Streaming SOURCE (DataSource v2
  * micro-batch stream), the always-on form of
  * [[graft.table.ChronicleTable.readChanges]]: offsets are snapshot
  * VERSIONS, each micro-batch is the net row changes committed in a
  * version range, planned from manifest metadata (per-file `_lsn` bounds
  * prune pre-cursor files at the LIST), and the stream's own checkpoint
  * carries the cursor — watermarks, stateful operators, and `foreachBatch`
  * sinks all compose downstream. This is the reference's continuous
  * notice-consumer loop (S3Consumer.java:98-158 polls the queue, receives
  * exactly the new files, replays them) re-expressed as the engine's
  * native streaming surface; Delta's `readChangeFeed` / Iceberg's
  * incremental streaming read play the same role.
  *
  * Options:
  *  - `path` (required): table root.
  *  - `startingVersion`: `"latest"` (default — tail only commits made
  *    after the stream starts), `"bootstrap"` (first batch = the full
  *    visible state, then tail; how [[graft.cdc.Chain.followStream]]
  *    initializes a downstream replica), a retained version number
  *    (resume a cursor handed over from batch [[ChronicleTable.readChanges]]),
  *    or `"@<epoch-millis|ISO-instant>"` — start from the snapshot live
  *    at that instant ([[ChronicleTable.versionAsOf]]).
  *  - `maxVersionsPerTrigger`: bound how many upstream COMMITS one
  *    micro-batch may cover (admission control — the reference's
  *    pause-aware batch draining, QueuedSink.java:96-153). Default
  *    unbounded.
  *  - `bootstrapSliceBytes` (default 16 GiB) / `bootstrapSlices`
  *    (explicit count override): a `bootstrap` start is CHUNKED into
  *    ceil(bytes / sliceBytes) disjoint `_lsn`-interval slices, one
  *    micro-batch each, so tailing a huge table never plans one
  *    table-sized batch. The pinned snapshot version, slice count and
  *    lsn bounds ride in the offsets — a crash between slices restarts
  *    at the next slice with identical intervals, exactly-once end to
  *    end. Tables without manifest lsn stats ship as one batch (no
  *    slicing axis).
  *  - `columns`: comma-separated data columns to carry (default all).
  *    The v2 STREAMING contract has no optimizer pushdown — unlike batch
  *    relations, `MicroBatchExecution` builds the scan once at stream
  *    start and `V2ScanRelationPushDown` never visits it (verified
  *    against the Spark 4.1 planner) — so a downstream `.select` cannot
  *    prune the parquet read. This option IS the projection: a tail that
  *    wants two columns of a wide transcript table reads two column
  *    chunks, not the `text` blobs. System columns (`_lsn`, `_deleted`,
  *    `_source`) always ride along — they are the change metadata and
  *    the mark filter needs them.
  *
  * Batch (fromV, toV] semantics mirror `readChanges(fromV)` evaluated at
  * `toV`: every row LIVE at `toV` whose `_lsn` exceeds ITS OWN source's
  * high-water mark in the `fromV` snapshot. Each surviving row version is
  * emitted exactly once across the stream's lifetime (later batches raise
  * the marks past it; copy-on-write rewrites and compactions re-add files
  * but never un-mark rows), tombstones ride along as `_deleted = true`
  * rows where the table retains them (merge-on-read mode — the delete-
  * propagation contract of [[ChronicleTable.readChanges]]), and
  * merge-on-read SUPERSEDED versions within one range are NOT collapsed
  * (the batch is a raw changelog; downstream appliers LWW on `_lsn`, which
  * [[graft.ops.MergeInto]] does per batch anyway). System columns
  * (`_lsn`, `_deleted`, `_source`) are part of the stream schema — they
  * ARE the change metadata.
  *
  * Scale shape: per trigger the driver reads the manifest list, prunes by
  * aggregate `maxLsn`, and plans one input partition per surviving file —
  * metadata + O(new files), independent of table size. Executors scan
  * parquet through Spark's own codegen'd reader (the same
  * [[ParquetFileFormat]] the batch path plans through) with an exact
  * per-source mark filter on top; no driver-side row movement.
  *
  * Schema is FIXED at stream start (the v2 contract): upstream ADDED
  * columns are simply not read until the stream restarts; upstream type
  * WIDENING (int→long) changes the parquet physical type, so planning
  * detects it and fails with a restart instruction rather than mis-read.
  * An upstream with UNORDERED sources cannot be tailed at all (no mark
  * bounds redelivery — same rule as `readChanges`).
  */
class DefaultSource extends TableProvider {

  private def pathOf(options: CaseInsensitiveStringMap): String =
    Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graft.changes requires option 'path' (the table root)"))

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val full = new ChronicleTable(pathOf(options)).loadCurrent().schema
    DefaultSource.projectColumns(full, Option(options.get("columns")))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new ChangesTable(schema,
      pathOf(new CaseInsensitiveStringMap(properties)), properties)
}

private[graft] object DefaultSource {

  /** The stream schema under a `columns` projection: the requested data
    * columns in TABLE order, plus the system columns (always — they are
    * the change metadata). Unknown names fail at stream construction,
    * not as an empty column mid-run.
    */
  def projectColumns(full: StructType, columns: Option[String]): StructType =
    columns.map(_.trim).filter(_.nonEmpty) match {
      case None => full
      case Some(spec) =>
        val want = spec.split(",").map(_.trim).filter(_.nonEmpty)
        val known = full.fieldNames.toSet
        val missing = want.filterNot(known.contains)
        require(missing.isEmpty,
          s"columns option names fields not in the table: " +
            s"${missing.mkString(",")} (have ${full.fieldNames.mkString(",")})")
        val keep = want.toSet ++ graft.model.Model.systemColumns
        StructType(full.fields.filter(f => keep.contains(f.name)))
    }

  /** Factory for the unified catalog/path table ([[graft.sql.GraftTable]]):
    * `readStream.format("graft")` and `readStream.table("cat.t")` serve
    * the SAME micro-batch change stream as `format("graft.changes")` —
    * one table object for batch read, batch write, stream read and stream
    * write. (The `columns` projection stays exclusive to the dedicated
    * changes source: a catalog table's stream must carry the table
    * schema.)
    */
  private[graft] def microBatchStream(schema: StructType, root: String,
      options: CaseInsensitiveStringMap): MicroBatchStream =
    new ChangesMicroBatchStream(schema, root, options)
}

private[changes] class ChangesTable(schema0: StructType, root: String,
    properties: java.util.Map[String, String]) extends Table with SupportsRead {

  override def name(): String = s"graft.changes($root)"
  override def schema(): StructType = schema0
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // table properties carry the reader options; scan options override
    val merged = new java.util.HashMap[String, String](properties)
    merged.putAll(options.asCaseSensitiveMap())
    new ScanBuilder {
      override def build(): Scan =
        new ChangesScan(schema0, root, new CaseInsensitiveStringMap(merged))
    }
  }
}

private[changes] class ChangesScan(schema0: StructType, root: String,
    options: CaseInsensitiveStringMap) extends Scan {
  override def readSchema(): StructType = schema0
  override def description(): String = s"graft.changes($root)"
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new ChangesMicroBatchStream(schema0, root, options)
}

/** Stream offset = table snapshot version (the changelog cursor), plus —
  * during a CHUNKED bootstrap — the slice position and the slicing inputs
  * (count + lsn bounds of the pinned bootstrap snapshot). The inputs ride
  * IN the offset so a restarted query replays identical slice intervals
  * from the WAL even after the table advanced: `slice = i` means slices
  * 0..i of `slices` have been emitted; `slice = slices-1` hands over to
  * the plain tail regime at `version`. A plain offset has `slices = 0`.
  */
private[changes] case class VersionOffset(version: Long,
    slice: Int = -1, slices: Int = 0,
    lsnMin: Long = -1L, lsnMax: Long = -1L) extends Offset {
  def inBootstrap: Boolean = slices > 0
  def bootstrapDone: Boolean = slices > 0 && slice >= slices - 1
  override def json(): String =
    if (!inBootstrap) s"""{"version":$version}"""
    else s"""{"version":$version,"slice":$slice,"slices":$slices,""" +
      s""""lsnMin":$lsnMin,"lsnMax":$lsnMax}"""
}

private[changes] object VersionOffset {
  def fromJson(s: String): VersionOffset =
    try {
      val n = graft.table.ChronicleTable.mapper.readTree(s)
      require(n.has("version"))
      VersionOffset(n.get("version").asLong(),
        slice = if (n.has("slice")) n.get("slice").asInt() else -1,
        slices = if (n.has("slices")) n.get("slices").asInt() else 0,
        lsnMin = if (n.has("lsnMin")) n.get("lsnMin").asLong() else -1L,
        lsnMax = if (n.has("lsnMax")) n.get("lsnMax").asLong() else -1L)
    } catch {
      case _: Exception => throw new IllegalArgumentException(
        s"not a graft.changes offset: $s")
    }
}

/** One pruned data file of the batch's version range, with the per-source
  * marks its rows must clear (marks travel IN the partition so each batch
  * is self-contained — the factory is static across batches).
  */
private[changes] case class ChangeFilePartition(
    path: String,
    fileSize: Long,
    marks: Map[String, Long],
    globalMark: Long,
    /** false = bootstrap batch: every row ships, no mark filter. */
    filtered: Boolean,
    /** Bootstrap-slice `_lsn` interval (inclusive); (MinValue, MaxValue)
      * = unsliced. Applied only when `filtered` is false — a sliced
      * bootstrap ships each row in exactly the one slice whose interval
      * holds its lsn.
      */
    lsnLo: Long = Long.MinValue,
    lsnHi: Long = Long.MaxValue) extends InputPartition

private[changes] class ChangesMicroBatchStream(schema0: StructType,
    root: String, options: CaseInsensitiveStringMap)
  extends MicroBatchStream with SupportsAdmissionControl
  with SupportsTriggerAvailableNow {

  private val table = new ChronicleTable(root)
  private def spark = SparkSession.active

  private val maxVersionsPerTrigger: Long = {
    val v = options.getLong("maxVersionsPerTrigger", Long.MaxValue)
    require(v > 0, s"maxVersionsPerTrigger must be positive, got $v")
    v
  }

  /** Chunked-bootstrap sizing: `startingVersion=bootstrap` ships the full
    * state as ceil(bytes / bootstrapSliceBytes) lsn-interval slices, ONE
    * PER MICRO-BATCH, instead of planning one table-sized batch
    * (`bootstrapSlices` overrides the count directly; a table without
    * manifest lsn stats has no slicing axis and ships as one batch). The
    * slice intervals are pinned in the offsets, so a crash between slices
    * restarts exactly at the next slice from the WAL.
    */
  private val bootstrapSliceBytes: Long = {
    val v = options.getLong("bootstrapSliceBytes", 16L << 30)
    require(v > 0, s"bootstrapSliceBytes must be positive, got $v")
    v
  }
  private val bootstrapSlicesOverride: Int =
    options.getInt("bootstrapSlices", 0)

  /** Trigger.AvailableNow bound: set once at query start, so the run
    * drains to a fixed target and terminates even while writers commit.
    */
  @volatile private var availableNowTarget: Option[Long] = None

  /** The CURRENT batch's conservative lsn bounds (exclusive floor,
    * inclusive ceiling), stashed by [[planInputPartitions]] for
    * [[createReaderFactory]] to push into the parquet reader as data
    * filters — row groups and pages whose `_lsn` stats sit wholly outside
    * are skipped inside files that survived manifest pruning (a
    * rewritten/compacted file is mostly pre-cursor rows). Tail batches
    * push the minimum per-source mark as the floor (sound under the exact
    * per-source filter on top: every row's own mark is >= the minimum, so
    * a row the floor removes could never pass); bootstrap slices push
    * their interval's two bounds exactly. Micro-batches execute strictly
    * sequentially (plan -> execute -> commit), so one slot suffices.
    */
  @volatile private var batchLsnRange: (Option[Long], Option[Long]) = (None, None)

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(table.loadCurrent().version)

  override def initialOffset(): Offset = {
    val cur = table.loadCurrent()
    requireTailable(cur)
    options.getOrDefault("startingVersion", "latest") match {
      case "latest" => VersionOffset(cur.version)
      case "bootstrap" =>
        // pin the bootstrap snapshot, slice count and lsn bounds NOW —
        // they ride in every bootstrap offset, so the WAL alone
        // reconstructs each slice's interval on restart
        val (gMin, gMax) = table.lsnBounds(cur)
        val k =
          if (gMin < 0L || gMax <= gMin) 1
          else if (bootstrapSlicesOverride > 0) bootstrapSlicesOverride
          else {
            val files = table.filesOf(cur)
            val bytes = files.map(_.bytes.max(0L)).sum
            val wanted = 1L + (bytes - 1L).max(0L) / bootstrapSliceBytes
            // slices finer than one FILE cannot reduce any batch's IO
            // further (a file is the atomic scan unit) — cap there, so a
            // pathological byte budget can't plan thousands of
            // near-empty micro-batches
            math.min(math.min(wanted, files.size.toLong.max(1L)),
                math.min(gMax - gMin + 1, Int.MaxValue.toLong))
              .toInt.max(1)
          }
        VersionOffset(cur.version, slice = -1, slices = k,
          lsnMin = gMin, lsnMax = gMax)
      case at if at.startsWith("@") =>
        // timestamp cursor: the snapshot live at that instant (fails
        // clearly when the instant predates the oldest retained version)
        val spec = at.drop(1)
        val ts = try spec.toLong catch {
          case _: NumberFormatException =>
            try java.time.Instant.parse(spec).toEpochMilli catch {
              case _: java.time.format.DateTimeParseException =>
                throw new IllegalArgumentException(
                  s"startingVersion '@…' takes epoch millis or an ISO-8601 " +
                    s"instant, got '$at'")
            }
        }
        VersionOffset(table.versionAsOf(ts))
      case v =>
        val ver = try v.toLong catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"startingVersion must be 'latest', 'bootstrap', '@<instant>' " +
              s"or a version number, got '$v'")
        }
        table.loadVersion(ver) // fails clearly when expired
        VersionOffset(ver)
    }
  }

  // Always allAvailable: the version cap is applied INTERNALLY by
  // latestOffset(start, limit) below (offsets are snapshot versions, and
  // no stock ReadLimit has that unit — maxFiles would mislabel it anywhere
  // Spark surfaces or composes the limit).
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[VersionOffset]
    // mid-bootstrap: emit the NEXT slice, one per micro-batch (each slice
    // is already byte-sized admission; maxVersionsPerTrigger governs the
    // tail regime that follows)
    if (s.inBootstrap && !s.bootstrapDone) return s.copy(slice = s.slice + 1)
    val cur = availableNowTarget.getOrElse(table.loadCurrent().version)
    val from = s.version
    // idle (nothing past the bootstrap target yet): return `start`
    // UNCHANGED — a plain re-encoding of the same version would differ in
    // json from a bootstrap-form offset and spin empty batches forever
    if (cur <= from) return s
    val capped =
      if (maxVersionsPerTrigger == Long.MaxValue) cur
      else math.min(cur, math.max(from, -1L) + maxVersionsPerTrigger)
    VersionOffset(math.max(capped, from))
  }

  override def reportLatestOffset(): Offset =
    VersionOffset(table.loadCurrent().version)

  override def deserializeOffset(json: String): Offset =
    VersionOffset.fromJson(json)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  private def requireTailable(snap: Snapshot): Unit = {
    require(snap.unordered.isEmpty,
      s"table $root has unordered sources ${snap.unordered.mkString(",")}: " +
        "their high-water marks do not bound redelivery, so a mark-based " +
        "change stream would be wrong — tail the source directly instead")
    // mirror of readChanges' legacy guard: rows without a _source tag can
    // only be filtered against the GLOBAL mark, which is sound solely for
    // single-source tables — a pre-upgrade multi-source table would
    // silently drop rows of a source whose LSN sequence runs below it
    if (!snap.schema.fieldNames.contains(graft.model.Model.sourceColumn))
      require(snap.hwms.size <= 1,
        s"table $root is multi-source (${snap.hwms.keys.mkString(",")}) but " +
          "its rows carry no _source tag (written pre-upgrade) — " +
          "per-source change-stream filtering is impossible; " +
          "compact/rewrite the table to stamp the tag")
  }

  /** The stream schema is pinned at start; a file written after an
    * upstream type WIDENING has a different parquet physical type, which
    * the pinned reader would mis-read — fail with the restart instruction
    * instead. ADDED columns are fine (not read until restart).
    */
  private def requireSchemaCompatible(to: Snapshot): Unit = {
    val now = to.schema.fields.map(f => f.name -> f.dataType).toMap
    val drifted = schema0.fields.filter(f => !now.get(f.name).contains(f.dataType))
    require(drifted.isEmpty,
      s"table $root schema evolved incompatibly under a running change " +
        s"stream (fields ${drifted.map(_.name).mkString(",")} changed type " +
        "or vanished) — restart the stream to adopt the new schema")
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val so = start.asInstanceOf[VersionOffset]
    val eo = end.asInstanceOf[VersionOffset]

    // bootstrap SLICE batch: files of the pinned snapshot intersecting the
    // slice's lsn interval (manifest-pruned), exact interval filter on rows
    if (eo.inBootstrap && eo.slice >= 0) {
      val to = table.loadVersion(eo.version)
      requireTailable(to)
      requireSchemaCompatible(to)
      val (lo, hi) = ChronicleTable.lsnSliceInterval(
        eo.lsnMin, eo.lsnMax, eo.slice, eo.slices)
      batchLsnRange = (
        if (lo == Long.MinValue) None else Some(lo - 1L),
        if (hi == Long.MaxValue) None else Some(hi))
      return table.filesOf(to)
        .filter(f => f.minLsn < 0L || f.maxLsn < 0L ||
          (f.minLsn <= hi && f.maxLsn >= lo))
        .map { f =>
          ChangeFilePartition(f.path, sizeOf(f), Map.empty, -1L,
            filtered = false, lsnLo = lo, lsnHi = hi): InputPartition
        }.toArray
    }

    val fromV = so.version
    val toV = eo.version
    if (toV <= fromV) return Array.empty
    val to = table.loadVersion(toV)
    requireTailable(to)
    requireSchemaCompatible(to)

    val (files, marks, globalMark, filtered) =
      if (fromV < 0L) {
        // legacy (pre-sliced-checkpoint) single-batch bootstrap
        batchLsnRange = (None, None)
        (table.filesOf(to), Map.empty[String, Long], -1L, false)
      } else {
        val since = table.loadVersion(fromV)
        val m = to.hwms.map { case (s, _) => s -> since.hwmFor(s) }
        val thr = if (m.nonEmpty) m.values.min else since.hwmLsn
        batchLsnRange = (Some(thr), None)
        val kept = to.manifestList
          .filter(mf => mf.maxLsn < 0L || mf.maxLsn > thr)
          .flatMap(mf => table.loadManifest(mf.path))
          .filter(f => f.maxLsn < 0L || f.maxLsn > thr)
        (kept, m, since.hwmLsn, true)
      }
    files.map { f =>
      ChangeFilePartition(f.path, sizeOf(f), marks, globalMark, filtered)
        : InputPartition
    }.toArray
  }

  /** Manifest byte counts plan the split; a pre-upgrade entry without one
    * is statted once, driver-side, for surviving files only.
    */
  private def sizeOf(f: DataFileMeta): Long =
    if (f.bytes > 0L) f.bytes
    else {
      val p = new org.apache.hadoop.fs.Path(f.path)
      p.getFileSystem(spark.sessionState.newHadoopConf()).getFileStatus(p).getLen
    }

  override def createReaderFactory(): PartitionReaderFactory = {
    // Spark's own codegen'd parquet reader, planned once on the driver and
    // shipped (it broadcasts its hadoop conf internally); row-based output
    // so the mark filter below sees InternalRows. The conservative lsn
    // floor rides along as a parquet data filter (row-group/page pruning
    // inside kept files); the exact per-source filter still runs on top.
    val (floor, ceil) = batchLsnRange
    val pushed =
      floor.toSeq.map(thr =>
        org.apache.spark.sql.sources.GreaterThan(graft.model.Model.lsnColumn, thr)
          : org.apache.spark.sql.sources.Filter) ++
      ceil.toSeq.map(hi =>
        org.apache.spark.sql.sources.LessThanOrEqual(graft.model.Model.lsnColumn, hi)
          : org.apache.spark.sql.sources.Filter)
    val readFunc = new ParquetFileFormat().buildReaderWithPartitionValues(
      sparkSession = spark,
      dataSchema = schema0,
      partitionSchema = new StructType(),
      requiredSchema = schema0,
      filters = pushed,
      options = Map(FileFormat.OPTION_RETURNING_BATCH -> "false"),
      hadoopConf = spark.sessionState.newHadoopConf())
    val lsnIdx = schema0.fieldIndex(graft.model.Model.lsnColumn)
    val srcIdx = schema0.fieldNames.indexOf(graft.model.Model.sourceColumn)
    new ChangesReaderFactory(readFunc, lsnIdx, srcIdx)
  }
}

private[changes] class ChangesReaderFactory(
    readFunc: PartitionedFile => Iterator[InternalRow],
    lsnIdx: Int, srcIdx: Int) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ChangeFilePartition]
    val file = PartitionedFile(InternalRow.empty,
      SparkPath.fromPathString(p.path), 0L, p.fileSize,
      Array.empty[String], 0L, p.fileSize)
    // exact per-source mark filter (the readChanges row filter, evaluated
    // executor-side): a row passes when its _lsn exceeds ITS OWN source's
    // mark in the from-snapshot; untagged rows compare against the global
    // mark, a source the from-snapshot never saw has mark -1 (all rows new)
    val rows = readFunc(file)
    val it =
      if (!p.filtered) {
        // bootstrap: no mark filter; a SLICED bootstrap ships each row in
        // exactly the one slice whose lsn interval holds it
        if (p.lsnLo == Long.MinValue && p.lsnHi == Long.MaxValue) rows
        else rows.filter { r =>
          val lsn = r.getLong(lsnIdx)
          lsn >= p.lsnLo && lsn <= p.lsnHi
        }
      } else rows.filter { r =>
        val lsn = r.getLong(lsnIdx)
        val mark =
          if (srcIdx < 0 || r.isNullAt(srcIdx)) p.globalMark
          else p.marks.getOrElse(r.getUTF8String(srcIdx).toString, -1L)
        lsn > mark
      }
    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) { cur = it.next(); true } else false
      override def get(): InternalRow = cur
      // the parquet record reader registers its own task-completion close
      override def close(): Unit = ()
    }
  }
}
