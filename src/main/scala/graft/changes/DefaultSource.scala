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

private[changes] object DefaultSource {

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

/** Stream offset = table snapshot version (the changelog cursor). */
private[changes] case class VersionOffset(version: Long) extends Offset {
  override def json(): String = s"""{"version":$version}"""
}

private[changes] object VersionOffset {
  private val R = """\{\s*"version"\s*:\s*(-?\d+)\s*\}""".r
  def fromJson(s: String): VersionOffset = s.trim match {
    case R(v) => VersionOffset(v.toLong)
    case other => throw new IllegalArgumentException(
      s"not a graft.changes offset: $other")
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
    /** false = bootstrap batch: every live row ships, no mark filter. */
    filtered: Boolean) extends InputPartition

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

  /** Trigger.AvailableNow bound: set once at query start, so the run
    * drains to a fixed target and terminates even while writers commit.
    */
  @volatile private var availableNowTarget: Option[Long] = None

  /** The CURRENT batch's conservative lsn floor (the minimum per-source
    * mark), stashed by [[planInputPartitions]] for [[createReaderFactory]]
    * to push into the parquet reader as a data filter — row groups and
    * pages whose `_lsn` stats sit wholly at-or-below the floor are skipped
    * inside files that survived manifest pruning (a rewritten/compacted
    * file is mostly pre-cursor rows). Sound under the exact per-source
    * filter on top: every row's own mark is >= the minimum, so a row the
    * floor removes could never pass. Micro-batches execute strictly
    * sequentially (plan -> execute -> commit), so one slot suffices.
    */
  @volatile private var batchLsnFloor: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(table.loadCurrent().version)

  override def initialOffset(): Offset = {
    val cur = table.loadCurrent()
    requireTailable(cur)
    options.getOrDefault("startingVersion", "latest") match {
      case "latest" => VersionOffset(cur.version)
      case "bootstrap" => VersionOffset(-1L)
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

  override def getDefaultReadLimit: ReadLimit =
    if (maxVersionsPerTrigger == Long.MaxValue) ReadLimit.allAvailable()
    else ReadLimit.maxFiles(math.min(maxVersionsPerTrigger, Int.MaxValue).toInt)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val cur = availableNowTarget.getOrElse(table.loadCurrent().version)
    val from = start.asInstanceOf[VersionOffset].version
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

  private def requireTailable(snap: Snapshot): Unit =
    require(snap.unordered.isEmpty,
      s"table $root has unordered sources ${snap.unordered.mkString(",")}: " +
        "their high-water marks do not bound redelivery, so a mark-based " +
        "change stream would be wrong — tail the source directly instead")

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
    val fromV = start.asInstanceOf[VersionOffset].version
    val toV = end.asInstanceOf[VersionOffset].version
    if (toV <= fromV) return Array.empty
    val to = table.loadVersion(toV)
    requireTailable(to)
    requireSchemaCompatible(to)

    val (files, marks, globalMark, filtered) =
      if (fromV < 0L) {
        batchLsnFloor = None
        (table.filesOf(to), Map.empty[String, Long], -1L, false)
      } else {
        val since = table.loadVersion(fromV)
        val m = to.hwms.map { case (s, _) => s -> since.hwmFor(s) }
        val thr = if (m.nonEmpty) m.values.min else since.hwmLsn
        batchLsnFloor = Some(thr)
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
    val pushed = batchLsnFloor.toSeq.map(thr =>
      org.apache.spark.sql.sources.GreaterThan(graft.model.Model.lsnColumn, thr))
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
      if (!p.filtered) rows
      else rows.filter { r =>
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
