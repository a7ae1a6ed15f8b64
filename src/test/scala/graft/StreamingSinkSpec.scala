package graft

import graft.model.Model
import graft.table.ChronicleTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The native streaming sink: `writeStream.format("graft")` applies each
  * micro-batch through the exactly-once MERGE — Spark's checkpoint and
  * the table ledger compose across restarts and replays.
  */
class StreamingSinkSpec extends SparkSpec {

  import spark.implicits._

  private def writeSegment(dir: String, seg: Int, rows: Seq[(Long, String, String, Int, String)]): Unit =
    rows.toDF("lsn", "op", "conv_id", "turn_idx", "text")
      .withColumn("role", lit("user"))
      .withColumn("tool", lit(null).cast("string"))
      .withColumn("ts", lit(new java.sql.Timestamp(1704067200000L)))
      .select("lsn", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts")
      .coalesce(1).write.parquet(s"$dir/seg=$seg")

  private def startSink(srcDir: String, root: String, ckpt: String) = {
    val schema = spark.read.parquet(s"$srcDir/seg=0").schema
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$srcDir/seg=*")
      .writeStream.format("graft")
      .option("path", root)
      .option("checkpointLocation", ckpt)
      .option("buckets", "4")
      .trigger(Trigger.AvailableNow())
      .start()
  }

  test("writeStream into a graft table: create-on-first-epoch, LWW, deletes, restart exactly-once") {
    val src = tmpDir("wsink-src")
    val root = s"${tmpDir("wsink")}/t"
    val ckpt = tmpDir("wsink-ckpt")
    writeSegment(src, 0, (0 until 8).map(i => (i.toLong, "I", s"c-$i", 0, s"v0-$i")))
    writeSegment(src, 1, Seq((100L, "U", "c-0", 0, "v1-0"), (101L, "D", "c-1", 0, "")))

    startSink(src, root, ckpt).awaitTermination()
    val t = new ChronicleTable(root)
    assert(t.exists && t.loadCurrent().numBuckets == 4)
    def visible(): Map[(String, Int), String] =
      t.read(spark).filter(!col(Model.deletedColumn))
        .select("conv_id", "turn_idx", "text").collect()
        .map(r => (r.getString(0), r.getInt(1)) -> r.getString(2)).toMap
    val v1 = visible()
    assert(v1.size == 7, s"8 inserts - 1 delete, got ${v1.size}")
    assert(v1(("c-0", 0)) == "v1-0", "the update epoch must displace by LWW")

    // restart the SAME stream with one more segment: only the new epoch
    // applies (checkpoint skips consumed files; ledger would skip replays)
    writeSegment(src, 2, Seq((200L, "U", "c-2", 0, "v2-2")))
    startSink(src, root, ckpt).awaitTermination()
    val v2 = visible()
    assert(v2(("c-2", 0)) == "v2-2" && v2.size == 7)

    // a FRESH checkpoint replays every segment: the batch-key ledger must
    // make the replayed epochs no-ops where they already applied
    val versBefore = t.loadCurrent().version
    startSink(src, root, tmpDir("wsink-ckpt2")).awaitTermination()
    assert(visible() == v2, "full replay under a new checkpoint must converge")
    // replay epochs carry different batch ids under the fresh checkpoint;
    // per-key LSN guards (unordered source) make them harmless
    assert(t.read(spark).filter(!col(Model.deletedColumn)).count() == 7)
    assert(t.loadCurrent().version >= versBefore)
  }

  test("SQL-shape change rows (_lsn/_deleted) stream through the same sink") {
    val src = tmpDir("wsink2-src")
    val root = s"${tmpDir("wsink2")}/t"
    Seq((1L, false, "c-1", 0, "hello"), (2L, true, "c-2", 0, ""))
      .toDF("_lsn", "_deleted", "conv_id", "turn_idx", "text")
      .coalesce(1).write.parquet(s"$src/seg=0")
    val schema = spark.read.parquet(s"$src/seg=0").schema
    spark.readStream.schema(schema).parquet(s"$src/seg=*")
      .writeStream.format("graft")
      .option("path", root).option("checkpointLocation", tmpDir("wsink2-ckpt"))
      .option("buckets", "2").option("source", "sqlshape")
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    val t = new ChronicleTable(root)
    val rows = t.read(spark).filter(!col(Model.deletedColumn))
      .select("conv_id", "text").collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq == Seq(("c-1", "hello")),
      "tombstone row must hide c-2; payload text must land")
  }

  test("mor epochs land as deltas; Complete mode and reads of missing tables refuse") {
    val src = tmpDir("wsink3-src")
    val root = s"${tmpDir("wsink3")}/t"
    writeSegment(src, 0, (0 until 4).map(i => (i.toLong, "I", s"c-$i", 0, s"x$i")))
    val schema = spark.read.parquet(s"$src/seg=0").schema
    spark.readStream.schema(schema).parquet(s"$src/seg=*")
      .writeStream.format("graft")
      .option("path", root).option("checkpointLocation", tmpDir("wsink3-ckpt"))
      .option("mor", "true").option("buckets", "2")
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    val t = new ChronicleTable(root)
    assert(t.hasDeltas(t.loadCurrent()), "mor=true epochs must land as deltas")
    assert(t.read(spark).filter(!col(Model.deletedColumn)).count() == 4)

    intercept[Exception] {
      spark.readStream.schema(schema).parquet(s"$src/seg=*")
        .groupBy("conv_id").agg(max("lsn"))
        .writeStream.format("graft")
        .option("path", root).option("checkpointLocation", tmpDir("wsink3-c2"))
        .outputMode("complete")
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    val missing = intercept[Exception] {
      spark.read.format("graft").load(s"${tmpDir("wsink3-none")}/absent").collect()
    }
    assert(missing.getMessage.toLowerCase.contains("table"),
      s"missing-table read must fail loudly, got: ${missing.getMessage}")
  }
}
