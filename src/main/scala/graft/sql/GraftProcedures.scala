package graft.sql

import graft.ops.{Compaction, Rescale}
import graft.table.ChronicleTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The engine's maintenance operations as DSv2 stored procedures, so a
  * warehouse user runs them from SQL exactly like the lakehouse formats
  * they know:
  *
  * {{{
  *   CALL graft_cat.compact(table => 't', horizon_lsn => 1000)
  *   CALL graft_cat.expire_snapshots(table => 't', keep_last => 3)
  *   CALL graft_cat.rescale(table => 't', buckets => 32)
  *   CALL graft_cat.gc_orphans(table => 't')
  * }}}
  *
  * Each procedure is a thin SQL binding over the library operation — the
  * distributed work (LWW folds, range-split rewrites) is the operation's;
  * the procedure only resolves the table under the catalog root and
  * returns a one-row summary. `isDeterministic` is false: they mutate
  * table state.
  */
private[sql] object GraftProcedures {

  val names: Seq[String] =
    Seq("compact", "expire_snapshots", "rescale", "gc_orphans", "history")

  def load(root: String, ident: Identifier): UnboundProcedure = {
    require(ident.namespace().isEmpty,
      s"graft procedures live at the catalog top level: CALL <cat>.${ident.name()}")
    ident.name() match {
      case "compact" => new CompactProcedure(root)
      case "expire_snapshots" => new ExpireProcedure(root)
      case "rescale" => new RescaleProcedure(root)
      case "gc_orphans" => new GcOrphansProcedure(root)
      case "history" => new HistoryProcedure(root)
      case other => throw new UnsupportedOperationException(
        s"unknown procedure $other; available: ${names.mkString(", ")}")
    }
  }
}

/** Shared scaffolding: a procedure is its own bound form (binding is
  * identity — parameters are statically typed), resolves parameter 0 as
  * the table name under the catalog root, and returns one summary row.
  */
private[sql] abstract class GraftProcedure(root: String)
  extends UnboundProcedure with BoundProcedure {

  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false

  protected def tableParam: ProcedureParameter =
    ProcedureParameter.in("table", StringType)
      .comment("table name (or ns.table) under the catalog root").build()

  protected def chronicle(input: InternalRow): ChronicleTable = {
    val name = input.getUTF8String(0).toString
    val t = new ChronicleTable(
      (root +: name.split('.').toSeq).mkString("/"))
    if (!t.exists)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        name.split('.').toSeq)
    t
  }

  protected def row(values: Any*): InternalRow =
    new GenericInternalRow(values.map {
      case s: String => UTF8String.fromString(s)
      case v => v
    }.toArray)

  protected def result(schema: StructType, rows: InternalRow*)
      : java.util.Iterator[Scan] =
    java.util.List.of[Scan](new GraftProcedureResult(schema, rows.toArray))
      .iterator()
}

/** A procedure's result set: a handful of driver-local summary rows. */
private[sql] class GraftProcedureResult(schema: StructType,
    out: Array[InternalRow]) extends LocalScan {
  override def rows(): Array[InternalRow] = out
  override def readSchema(): StructType = schema
  override def description(): String = "graft procedure result"
}

private[sql] class CompactProcedure(root: String) extends GraftProcedure(root) {
  override def name(): String = "compact"
  override def description(): String =
    "fold merge-on-read deltas and small files into sorted base files; " +
      "GC tombstones at or below horizon_lsn"
  override def parameters(): Array[ProcedureParameter] = Array(
    tableParam,
    ProcedureParameter.in("max_files_per_bucket", IntegerType)
      .defaultValue("4").build(),
    ProcedureParameter.in("horizon_lsn", LongType)
      .defaultValue(Long.MinValue.toString)
      .comment("GC delete tombstones with _lsn <= this (beyond the " +
        "redelivery window); default keeps all").build(),
    ProcedureParameter.in("target_rows_per_file", LongType)
      .defaultValue("4000000").build())
  private val out = StructType(Seq(
    StructField("compacted_buckets", IntegerType, nullable = false),
    StructField("removed_files", IntegerType, nullable = false),
    StructField("added_files", IntegerType, nullable = false),
    StructField("version", LongType, nullable = false)))
  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val r = Compaction(SparkSession.active, chronicle(input),
      maxFilesPerBucket = input.getInt(1),
      tombstoneHorizonLsn = input.getLong(2),
      targetRowsPerFile = input.getLong(3))
    result(out, row(r.compactedBuckets, r.removedFiles, r.addedFiles,
      r.snapshot.version))
  }
}

private[sql] class ExpireProcedure(root: String) extends GraftProcedure(root) {
  override def name(): String = "expire_snapshots"
  override def description(): String =
    "drop snapshots beyond the newest keep_last and delete files only " +
      "they referenced"
  override def parameters(): Array[ProcedureParameter] = Array(
    tableParam,
    ProcedureParameter.in("keep_last", IntegerType).defaultValue("2").build())
  private val out = StructType(Seq(
    StructField("expired_snapshots", IntegerType, nullable = false),
    StructField("deleted_files", IntegerType, nullable = false)))
  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val (versions, files) = chronicle(input).expireSnapshots(input.getInt(1))
    result(out, row(versions.size, files.size))
  }
}

private[sql] class RescaleProcedure(root: String) extends GraftProcedure(root) {
  override def name(): String = "rescale"
  override def description(): String =
    "rewrite the table under a new hash-bucket count (online: concurrent " +
      "merges rebase or re-derive their bucket sets)"
  override def parameters(): Array[ProcedureParameter] = Array(
    tableParam,
    ProcedureParameter.in("buckets", IntegerType).build(),
    ProcedureParameter.in("target_rows_per_file", LongType)
      .defaultValue("4000000").build())
  private val out = StructType(Seq(
    StructField("old_buckets", IntegerType, nullable = false),
    StructField("new_buckets", IntegerType, nullable = false),
    StructField("removed_files", IntegerType, nullable = false),
    StructField("added_files", IntegerType, nullable = false),
    StructField("version", LongType, nullable = false)))
  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val r = Rescale(SparkSession.active, chronicle(input),
      newNumBuckets = input.getInt(1), targetRowsPerFile = input.getLong(2))
    result(out, row(r.oldNumBuckets, r.newNumBuckets, r.removedFiles,
      r.addedFiles, r.snapshot.version))
  }
}

private[sql] class HistoryProcedure(root: String) extends GraftProcedure(root) {
  override def name(): String = "history"
  override def description(): String =
    "the retained snapshot log: one row per version with commit time, " +
      "row/file counts and delta presence (time-travel targets)"
  override def parameters(): Array[ProcedureParameter] = Array(tableParam)
  private val out = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("commit_time_ms", LongType, nullable = false),
    StructField("rows", LongType, nullable = false),
    StructField("files", IntegerType, nullable = false),
    StructField("has_deltas", BooleanType, nullable = false)))
  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val t = chronicle(input)
    val rows = t.versions.sorted.map { v =>
      val s = t.loadVersion(v)
      row(v, s.commitTimeMs, s.totalRows, s.numFiles, t.hasDeltas(s))
    }
    result(out, rows: _*)
  }
}

private[sql] class GcOrphansProcedure(root: String) extends GraftProcedure(root) {
  override def name(): String = "gc_orphans"
  override def description(): String =
    "delete staged files no snapshot references, older than min_age_ms " +
      "(age guard protects concurrent in-flight writers)"
  override def parameters(): Array[ProcedureParameter] = Array(
    tableParam,
    ProcedureParameter.in("min_age_ms", LongType)
      .defaultValue("3600000").build())
  private val out = StructType(Seq(
    StructField("deleted_files", IntegerType, nullable = false)))
  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val deleted = chronicle(input).gcOrphans(input.getLong(1))
    result(out, row(deleted.size))
  }
}
