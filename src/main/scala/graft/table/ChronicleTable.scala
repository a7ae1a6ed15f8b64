package graft.table

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructField, StructType}

import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}
import java.util.UUID
import scala.jdk.CollectionConverters._

/** Statistics and identity of one immutable parquet data file of the table.
  *
  * `bucket` is the hash bucket of `conv_id` the file belongs to (all rows in
  * a file share a bucket), enabling co-partitioned, shuffle-pruned MERGE.
  * `minKey`/`maxKey` are conv_id bounds inside the bucket for second-level
  * file pruning (the Spark-native analogue of Iceberg manifest column
  * bounds).
  */
case class DataFileMeta(
    path: String,
    rows: Long,
    bucket: Int,
    minKey: String,
    maxKey: String,
    /** Event-time bounds (epoch millis) of rows in the file — the
      * second-level partition value for time-ranged reads and retention
      * scans (the reference's date-suffixed outputs:
      * IndexSuffixFormatter.java:27-41, DynamicRemotePrefixFormatter.java:16-50).
      * (0, 0) = stats unknown (pre-upgrade manifest) → never pruned.
      */
    minTsMs: Long = 0L,
    maxTsMs: Long = 0L)

/** Per-commit lineage: the Spark-native version of the reference's upload
  * notice JSON `{bucket, filePath, size, collector}` plus CRC
  * (suro-s3/.../S3FileSink.java:144-154; MessageSetBuilder.java:132-136).
  * One record per committed micro-batch; `checksum` is
  * bit_xor(xxhash64(conv_id, turn_idx, text)) over the rows applied by the
  * batch, `rowsByBucket` the per-partition row counts.
  */
case class LineageEntry(
    batchKey: String,
    source: String,
    startLsn: Long,
    endLsn: Long,
    upserts: Long,
    deletes: Long,
    rowCount: Long,
    checksum: Long,
    rowsByBucket: Map[String, Long],
    snapshotVersion: Long)

/** One immutable snapshot (version) of the table. */
case class Snapshot(
    version: Long,
    schemaJson: String,
    numBuckets: Int,
    files: Seq[DataFileMeta],
    /** batchKey -> version that committed it; the idempotent-commit ledger
      * (the reference's `processingFileSet` upload dedup,
      * RemoteFileSink.java:159-216, made durable). BOUNDED: keys of the form
      * `prefix#n` whose n is at-or-below `ledgerFloors(prefix)` are dropped
      * at commit time — only the recent non-contiguous window stays explicit,
      * so manifest size is O(live files + window), not O(all batches ever)
      * (the reference's persisted queue keeps a front index, not history:
      * FileBlockingQueue.java:143-150).
      */
    committedBatches: Map[String, Long],
    /** prefix -> highest n such that ALL batch keys `prefix#0..n` have been
      * committed (max-contiguous floor). Membership = n <= floor OR explicit
      * key — see [[ChronicleTable.isCommitted]].
      */
    ledgerFloors: Map[String, Long] = Map.empty,
    /** High-water mark of applied LSNs (monotone; diagnostics only —
      * correctness comes from committedBatches + last-writer-wins dedup).
      */
    hwmLsn: Long,
    /** Per-source consumption cursor: sourceId -> highest consumed segment
      * number. Resume slices the segment list by NUMBER past this cursor,
      * never by list index, so a committed partial trailing batch (e.g. one
      * segment when segmentsPerBatch=4) cannot cause later-arriving segments
      * to be skipped — the persisted consumer front-index of the reference's
      * disk queue (FileBlockingQueue.java:143-150), keyed per source.
      */
    sourceCursors: Map[String, Long] = Map.empty,
    /** Lineage of the commits made AT this version only (usually one entry).
      * The full ledger is the concatenation across versions
      * ([[ChronicleTable.fullLineage]]) — embedding history in every
      * manifest would make manifest IO quadratic over a long replay.
      */
    lineage: Seq[LineageEntry]) {
  def schema: StructType = DataType.fromJson(schemaJson).asInstanceOf[StructType]
  def totalRows: Long = files.map(_.rows).sum
  /** Null-safe cursor view (manifests written before the field existed
    * deserialize it as null; Jackson also erases Long map values to Integer
    * for small numbers, so coerce through Number).
    */
  def cursors: Map[String, Long] = Snapshot.longMap(sourceCursors)
  def floors: Map[String, Long] = Snapshot.longMap(ledgerFloors)
}

object Snapshot {
  /** Null-safe Long-map view: Jackson deserializes a missing field as null
    * and erases small Long values to Integer.
    */
  private[table] def longMap(m: Map[String, Long]): Map[String, Long] =
    Option(m).map(_.asInstanceOf[Map[String, Any]])
      .getOrElse(Map.empty)
      .map { case (k, v) => k -> v.asInstanceOf[Number].longValue }
}

/** What a merge hands to the table for publication. */
case class PendingCommit(
    batchKey: String,
    removedFiles: Seq[String],
    addedFiles: Seq[DataFileMeta],
    newSchema: Option[StructType],
    lineage: LineageEntry,
    /** Optional (sourceId, highest consumed segment number) cursor advance. */
    cursor: Option[(String, Long)] = None)

/** ChronicleTable — a from-scratch Iceberg-style table format.
  *
  * Layout:
  * {{{
  *   <root>/data/<uuid>/bucket=N/part-*.parquet   immutable data files
  *   <root>/meta/v%09d.json                       snapshot manifests
  *   <root>/meta/_CURRENT                         pointer file: "v%09d"
  * }}}
  *
  * Commit protocol (two-phase, mirrors the reference's
  * rotate -> .done -> notice -> upload -> dedup pipeline, SURVEY.md §2.5):
  *  1. data files are fully written under data/ (the "stage" phase; a crash
  *     here leaves orphans that no manifest references — harmless, GC-able);
  *  2. the new manifest v(N+1).json is created with CREATE_NEW (fails if a
  *     concurrent writer won the version — optimistic concurrency);
  *  3. _CURRENT is flipped via write-temp + atomic rename. A crash between
  *     (2) and (3) is healed on next load: loadCurrent() takes the highest
  *     manifest version present, not the pointer, when the pointer lags.
  *
  * Idempotence: each commit carries a `batchKey`; a batchKey already present
  * in `committedBatches` is skipped by callers, so source replays after a
  * kill-resume cannot double-apply (exactly-once over at-least-once
  * delivery — the reference's notice-remove-after-success loop,
  * S3Consumer.java:226-290, with the cursor and the data made atomic by
  * sharing one ledger).
  *
  * Scale notes (100 TB): manifests list files with per-file key bounds, so
  * MERGE planning is metadata-only; at production scale the JSON manifest
  * becomes a manifest *list* + per-bucket manifest files (same schema,
  * split), and file stats come from parquet footers instead of a stats
  * pass — both are mechanical extensions of this layout.
  */
class ChronicleTable(val root: String) {
  import ChronicleTable._

  private val metaDir: Path = Paths.get(root, "meta")
  private val dataDir: Path = Paths.get(root, "data")

  def exists: Boolean = Files.exists(metaDir) && listVersions.nonEmpty

  /** Create an empty table with the given initial schema. */
  def create(schema: StructType, numBuckets: Int): Snapshot = {
    Files.createDirectories(metaDir)
    Files.createDirectories(dataDir)
    val s0 = Snapshot(version = 0L, schemaJson = schema.json,
      numBuckets = numBuckets, files = Nil, committedBatches = Map.empty,
      ledgerFloors = Map.empty, hwmLsn = -1L, sourceCursors = Map.empty,
      lineage = Nil)
    writeManifest(s0)
    flipPointer(0L)
    s0
  }

  private def listVersions: Seq[Long] =
    if (!Files.exists(metaDir)) Nil
    else Files.list(metaDir).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case ManifestName(v) => v.toLong }
      .toSeq.sorted

  /** Load the current snapshot. Self-healing: if a crash happened between
    * manifest create and pointer flip, the highest manifest wins and the
    * pointer is repaired.
    */
  def loadCurrent(): Snapshot = {
    val latest = listVersions.lastOption.getOrElse(
      throw new IllegalStateException(s"no snapshots under $root"))
    val pointer = readPointer()
    if (pointer != latest) flipPointer(latest)
    loadVersion(latest)
  }

  /** Time travel: load a specific snapshot version. Fails with a clear
    * error if the version was expired by [[expireSnapshots]].
    */
  def loadVersion(version: Long): Snapshot = {
    val p = metaDir.resolve(f"v$version%09d.json")
    if (!Files.exists(p))
      throw new NoSuchElementException(
        s"snapshot v$version of $root does not exist (expired or never written); " +
          s"available: ${listVersions.mkString(",")}")
    mapper.readValue(Files.readString(p), classOf[Snapshot])
  }

  def versions: Seq[Long] = listVersions

  private def readPointer(): Long = {
    val p = metaDir.resolve("_CURRENT")
    if (!Files.exists(p)) -1L
    else Files.readString(p).trim.stripPrefix("v").toLong
  }

  /** Allocate a unique staging directory for a writer to put data files in. */
  def newStagingDir(): String =
    dataDir.resolve(UUID.randomUUID().toString).toString

  /** Test hook: invoked after data files are durable but before the snapshot
    * pointer advances — the crash window the kill-resume fixture targets
    * (FIXTURES.md §4; the reference's S3Consumer crash-before-notice-remove,
    * SURVEY.md §3.3).
    */
  @volatile var beforePublishHook: Snapshot => Unit = _ => ()

  /** Atomically publish a commit on top of `base`. Returns the new snapshot.
    * Throws if the version was taken by a concurrent writer (caller may
    * reload and retry).
    */
  def commit(base: Snapshot, pending: PendingCommit): Snapshot = {
    require(!ChronicleTable.isCommitted(base, pending.batchKey),
      s"batch ${pending.batchKey} already committed — caller must skip")
    val removed = pending.removedFiles.toSet
    val (floors, window) = ChronicleTable.compactLedger(base.floors,
      base.committedBatches + (pending.batchKey -> (base.version + 1)))
    val next = Snapshot(
      version = base.version + 1,
      schemaJson = pending.newSchema.map(_.json).getOrElse(base.schemaJson),
      numBuckets = base.numBuckets,
      files = base.files.filterNot(f => removed(f.path)) ++ pending.addedFiles,
      committedBatches = window,
      ledgerFloors = floors,
      hwmLsn = math.max(base.hwmLsn, pending.lineage.endLsn),
      sourceCursors = base.cursors ++ pending.cursor.map { case (src, seg) =>
        src -> math.max(seg, base.cursors.getOrElse(src, -1L))
      },
      lineage = Seq(pending.lineage.copy(snapshotVersion = base.version + 1)))
    beforePublishHook(next)
    writeManifest(next) // CREATE_NEW: optimistic-concurrency barrier
    flipPointer(next.version)
    next
  }

  /** Expire all but the newest `keepLast` snapshots: their manifests are
    * deleted, and any data file referenced ONLY by expired versions is
    * deleted from disk. COW + time travel otherwise pins every rewritten
    * generation of every bucket forever — at 10^10 events a replay would
    * retain ~every file ever written. The reference deletes local files
    * aggressively after upload (RemoteFileSink.java:151-216) and caps the
    * disk queue (FileBlockingQueue.java:83-150); this is the table-format
    * equivalent (Iceberg's expire_snapshots).
    *
    * Returns (expired versions, deleted data files). Time-travel reads of
    * expired versions fail with a clear error afterwards.
    */
  def expireSnapshots(keepLast: Int): (Seq[Long], Seq[String]) = {
    require(keepLast >= 1, "must keep at least the current snapshot")
    val vs = listVersions
    val expired = vs.dropRight(keepLast)
    if (expired.isEmpty) return (Nil, Nil)
    val retained = vs.takeRight(keepLast)
    val live: Set[String] =
      retained.flatMap(v => loadVersion(v).files.map(_.path)).toSet
    val dead = expired.flatMap(v => loadVersion(v).files.map(_.path))
      .distinct.filterNot(live)
    // delete manifests first: a crash mid-way leaves only unreferenced data
    // files, which gcOrphans reclaims — never a manifest pointing at
    // deleted data
    expired.foreach(v => Files.deleteIfExists(metaDir.resolve(f"v$v%09d.json")))
    dead.foreach(p => Files.deleteIfExists(Paths.get(p)))
    (expired, dead)
  }

  private def writeManifest(s: Snapshot): Unit = {
    val p = metaDir.resolve(f"v${s.version}%09d.json")
    Files.write(p, mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(s),
      StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
  }

  private def flipPointer(version: Long): Unit = {
    val tmp = metaDir.resolve(s"_CURRENT.tmp.${UUID.randomUUID()}")
    Files.writeString(tmp, f"v$version%09d")
    Files.move(tmp, metaDir.resolve("_CURRENT"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Read a snapshot as a DataFrame. Missing columns in older files (written
    * before a schema evolution) surface as nulls: the reader is driven by
    * the snapshot schema, not the file schemas (Iceberg-style schema-on-read;
    * the reference's implicit new-JSON-field appearance, SURVEY.md §1.3,
    * made explicit).
    */
  def read(spark: SparkSession, snapshot: Snapshot): DataFrame = {
    val schema = snapshot.schema
    if (snapshot.files.isEmpty) {
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    } else {
      spark.read.schema(schema).parquet(snapshot.files.map(_.path): _*)
    }
  }

  def read(spark: SparkSession): DataFrame = read(spark, loadCurrent())

  /** Files whose bucket is in `buckets` and whose conv_id range intersects
    * [minKey, maxKey] — the metadata-only MERGE planning step.
    */
  def pruneFiles(snapshot: Snapshot, buckets: Set[Int],
      minKey: String, maxKey: String): Seq[DataFileMeta] =
    snapshot.files.filter(f =>
      buckets.contains(f.bucket) && f.minKey <= maxKey && f.maxKey >= minKey)

  /** Files whose event-time range intersects [fromMs, toMs] (epoch millis,
    * inclusive). Files without ts stats — written before the stats existed,
    * marked (0,0) — are conservatively kept. The second-level partition
    * pruning of the table: the Spark-native analogue of the reference's
    * date-suffixed sink partitioning (IndexSuffixFormatter.java:27-41;
    * S3 `date(yyyyMMdd)` prefixes, DynamicRemotePrefixFormatter.java:16-50).
    */
  def pruneFilesByTime(snapshot: Snapshot, fromMs: Long, toMs: Long): Seq[DataFileMeta] =
    snapshot.files.filter(f =>
      (f.minTsMs == 0L && f.maxTsMs == 0L) ||
        (f.minTsMs <= toMs && f.maxTsMs >= fromMs))

  /** Time-sliced read: lists/scans ONLY the files whose ts bounds intersect
    * the range (manifest-level pruning — untouched days' files never reach
    * the scan), then applies the exact residual predicate.
    */
  def readSlice(spark: SparkSession, fromMs: Long, toMs: Long): DataFrame = {
    val snap = loadCurrent()
    val files = pruneFilesByTime(snap, fromMs, toMs)
    val schema = snap.schema
    val base =
      if (files.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else spark.read.schema(schema).parquet(files.map(_.path): _*)
    base.filter(unix_millis(col("ts")).between(fromMs, toMs))
  }

  /** The complete lineage ledger: every commit's entry across all
    * RETAINED snapshot versions, in commit order (expiry drops the history
    * of expired versions along with their manifests).
    */
  def fullLineage(): Seq[LineageEntry] =
    listVersions.flatMap(v => loadVersion(v).lineage)

  /** Delete data files no manifest references (crash leftovers from the
    * stage phase). Returns deleted paths. Mirrors the reference's
    * LocalFileSink.cleanUp recovery of improperly-closed files
    * (LocalFileSink.java:313-353).
    */
  def gcOrphans(): Seq[String] = {
    val live: Set[String] =
      listVersions.flatMap(v => loadVersion(v).files.map(_.path)).toSet
    if (!Files.exists(dataDir)) return Nil
    val all = Files.walk(dataDir).iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
      .map(_.toString).toSeq
    val orphans = all.filterNot(live)
    orphans.foreach(p => Files.deleteIfExists(Paths.get(p)))
    orphans
  }
}

object ChronicleTable {
  private val ManifestName = """v(\d+)\.json""".r
  private val NumberedKey = """(.+)#(\d+)""".r
  private val RangeKey = """(.+)#(\d+)-(\d+)""".r

  /** The unit range a batch key covers: `p#n` covers [n, n] (one batch
    * index), `p#lo-hi` covers [lo, hi] (a segment range — the
    * MultiSinkPipeline's deterministic batch identity). Keys of neither
    * shape have no range and always stay explicit in the ledger.
    */
  private def keyRange(k: String): Option[(String, Long, Long)] = k match {
    case RangeKey(p, lo, hi) => Some((p, lo.toLong, hi.toLong))
    case NumberedKey(p, n) => Some((p, n.toLong, n.toLong))
    case _ => None
  }

  /** Has `batchKey` been committed into `snap`? Either fully covered by the
    * max-contiguous floor of its prefix, or in the explicit recent window.
    */
  def isCommitted(snap: Snapshot, batchKey: String): Boolean =
    snap.committedBatches.contains(batchKey) || keyRange(batchKey).exists {
      case (prefix, _, hi) => snap.floors.get(prefix).exists(_ >= hi)
    }

  /** Advance per-prefix contiguous floors and drop the keys they cover.
    * A floor f means units 0..f of the prefix are all committed; it
    * advances over ranges that tile contiguously from f+1 (sorted by lo),
    * so both one-unit batch keys and segment-range keys stay O(window) in
    * the manifest instead of O(all batches ever).
    */
  private[table] def compactLedger(floors: Map[String, Long],
      ledger: Map[String, Long]): (Map[String, Long], Map[String, Long]) = {
    val ranged = ledger.keys.flatMap(keyRange)
    val byPrefix = ranged.groupBy(_._1)
    val newFloors = floors ++ byPrefix.map { case (prefix, ks) =>
      val byLo = ks.toSeq.sortBy(_._2)
      var floor = floors.getOrElse(prefix, -1L)
      byLo.foreach { case (_, lo, hi) =>
        if (lo <= floor + 1 && hi > floor) floor = hi
      }
      prefix -> floor
    }.filter(_._2 >= 0)
    val window = ledger.filter { case (k, _) =>
      keyRange(k) match {
        case Some((p, _, hi)) => newFloors.getOrElse(p, -1L) < hi
        case None => true
      }
    }
    (newFloors, window)
  }

  private[table] val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m.configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    m
  }

  /** Merge table schema with an incoming batch schema: existing columns keep
    * their position and type; genuinely new columns append (nullable).
    * Type conflicts are rejected — the engine does not silently coerce.
    */
  def mergeSchemas(table: StructType, batch: StructType): StructType = {
    val existing = table.fieldNames.toSet
    val conflicts = batch.fields.filter(f =>
      existing.contains(f.name) && table(f.name).dataType != f.dataType)
    require(conflicts.isEmpty,
      s"incompatible schema change for ${conflicts.map(_.name).mkString(",")}")
    val added = batch.fields.filterNot(f => existing.contains(f.name))
      .map(f => StructField(f.name, f.dataType, nullable = true))
    StructType(table.fields ++ added)
  }

  /** Bucket assignment expression — the table's partition transform.
    * Deterministic across sessions (xxhash64 with fixed seed 42).
    */
  def bucketExpr(keyCol: String, numBuckets: Int): org.apache.spark.sql.Column =
    pmod(xxhash64(col(keyCol)), lit(numBuckets)).cast("int")
}
