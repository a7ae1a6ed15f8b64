package graft

import graft.cdc.{CdcPipeline, IngestConfig, IngestServer, PipelineConfig}

import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.zip.CRC32

/** The network intake: POST /ingest JSON-lines with a message-set CRC land
  * as atomic JSONL segments a pipeline drains — the reference's Thrift
  * ingest endpoint semantics (CRC verify + reject whole set, idempotent
  * client retry, queue-full pause) on loopback HTTP
  * (ThriftServer.java:62-104, MessageSetProcessor.java:125-182).
  */
class IngestServerSpec extends SparkSpec {

  private def crcOf(body: Array[Byte]): Long = {
    val c = new CRC32(); c.update(body); c.getValue
  }

  private def post(port: Int, path: String, body: String = "",
      crc: Option[Long] = None, batch: Option[String] = None): (Int, String) = {
    val conn = new URL(s"http://127.0.0.1:$port$path")
      .openConnection().asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(5000); conn.setReadTimeout(5000)
    conn.setRequestMethod("POST")
    crc.foreach(v => conn.setRequestProperty("X-Graft-Crc32", v.toString))
    batch.foreach(k => conn.setRequestProperty("X-Graft-Batch", k))
    conn.setDoOutput(true)
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    conn.getOutputStream.write(bytes)
    val code = conn.getResponseCode
    val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val resp = new String(is.readAllBytes(), StandardCharsets.UTF_8)
    conn.disconnect()
    (code, resp)
  }

  private def event(lsn: Long, op: String, conv: String, turn: Int,
      text: String): String =
    s"""{"lsn":$lsn,"op":"$op","conv_id":"$conv","turn_idx":$turn,""" +
      s""""role":"user","text":"$text","tool":null,""" +
      s""""ts":"2024-01-01T00:00:${f"${lsn % 60}%02d"}.000Z"}"""

  test("posted sets become atomic JSONL segments a pipeline drains exactly once") {
    val src = tmpDir("ingest-src")
    val tbl = tmpDir("ingest-tbl")
    val srv = IngestServer.start(IngestConfig(src, segmentEvents = 3), port = 0)
    try {
      // set 1: three inserts -> rolls at the threshold
      val s1 = Seq(event(1, "I", "c1", 0, "a"), event(2, "I", "c1", 1, "b"),
        event(3, "I", "c2", 0, "c")).mkString("\n")
      val (c1, r1) = post(srv.port, "/ingest", s1,
        crc = Some(crcOf(s1.getBytes(StandardCharsets.UTF_8))), batch = Some("cli#0"))
      assert(c1 == 200 && r1.contains("\"rolledSegment\":0"), r1)

      // set 2: an update and a delete; staged until forced roll
      val s2 = Seq(event(4, "U", "c1", 0, "a2"), event(5, "D", "c2", 0, "c"))
        .mkString("\n")
      val (c2, _) = post(srv.port, "/ingest", s2,
        crc = Some(crcOf(s2.getBytes(StandardCharsets.UTF_8))), batch = Some("cli#1"))
      assert(c2 == 200)
      // staging is INVISIBLE to a tailer until rolled
      val p = new CdcPipeline(PipelineConfig(src, tbl, segmentsPerBatch = 1,
        numBuckets = 2))
      assert(p.listSegments() == Seq("segment=0"))
      val (c3, r3) = post(srv.port, "/roll")
      assert(c3 == 200 && r3.contains("\"rolledSegment\":1"), r3)

      assert(p.runAll(spark) == 2)
      val rows = p.currentState(spark)
        .selectExpr("conv_id", "turn_idx", "text").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
      // LWW: c1/0 updated to a2, c2/0 deleted, c1/1 intact
      assert(rows == Set(("c1", 0, "a2"), ("c1", 1, "b")))

      // re-drain applies nothing (exactly-once against the table ledger)
      assert(p.runAll(spark) == 0)
    } finally srv.stop()
  }

  test("CRC mismatch and malformed JSON reject the WHOLE set, payload preserved") {
    val src = tmpDir("ingest-rej")
    val srv = IngestServer.start(IngestConfig(src, segmentEvents = 100), port = 0)
    try {
      val good = event(1, "I", "c1", 0, "x")
      val (c1, r1) = post(srv.port, "/ingest", good, crc = Some(12345L))
      assert(c1 == 400 && r1.contains("CRC_CORRUPTED"), r1)
      val (c2, r2) = post(srv.port, "/ingest", good, crc = None)
      assert(c2 == 400 && r2.contains("MISSING_CRC"), r2)

      val bad = good + "\nnot json at all"
      val (c3, r3) = post(srv.port, "/ingest", bad,
        crc = Some(crcOf(bad.getBytes(StandardCharsets.UTF_8))))
      assert(c3 == 400 && r3.contains("MALFORMED") && r3.contains("\"line\":2"), r3)

      // nothing landed; both rejects inspectable
      assert(!Files.list(Paths.get(src)).iterator().hasNext ||
        Files.list(Paths.get(src)).iterator().next().getFileName.toString == ".ingest")
      val rejected = Files.list(Paths.get(src, ".ingest", "rejected"))
        .iterator()
      assert(Iterator.continually(rejected).takeWhile(_.hasNext)
        .map(_.next()).size == 2)
      val (_, st) = post(srv.port, "/ingeststat", "")
      assert(st.contains("\"stagedEvents\":0") && st.contains("\"rejectedSets\":2"), st)
    } finally srv.stop()
  }

  test("client retries are idempotent across a server restart") {
    val src = tmpDir("ingest-retry")
    val set = event(1, "I", "c9", 0, "v")
    val crc = Some(crcOf(set.getBytes(StandardCharsets.UTF_8)))
    val srv1 = IngestServer.start(IngestConfig(src, segmentEvents = 100), port = 0)
    val (c1, _) = post(srv1.port, "/ingest", set, crc, batch = Some("k1"))
    assert(c1 == 200)
    val (c2, r2) = post(srv1.port, "/ingest", set, crc, batch = Some("k1"))
    assert(c2 == 200 && r2.contains("\"duplicate\":true"), r2)
    srv1.stop() // rolls the staged remainder as segment=0

    val srv2 = IngestServer.start(IngestConfig(src, segmentEvents = 100), port = 0)
    try {
      // the accepted-key ledger survives the restart
      val (c3, r3) = post(srv2.port, "/ingest", set, crc, batch = Some("k1"))
      assert(c3 == 200 && r3.contains("\"duplicate\":true"), r3)
      // numbering continues past the published segment
      val s2 = event(2, "I", "c9", 1, "w")
      val (c4, _) = post(srv2.port, "/ingest", s2,
        crc = Some(crcOf(s2.getBytes(StandardCharsets.UTF_8))), batch = Some("k2"))
      assert(c4 == 200)
      assert(srv2.roll() == 1L)
      assert(Files.exists(Paths.get(src, "segment=0")) &&
        Files.exists(Paths.get(src, "segment=1")))
    } finally srv2.stop()
  }

  test("intake pauses when the downstream table falls behind, resumes after a drain") {
    val src = tmpDir("ingest-bp-src")
    val tbl = tmpDir("ingest-bp-tbl")
    val srv = IngestServer.start(IngestConfig(src, segmentEvents = 1,
      tableRoot = Some(tbl), maxPendingSegments = 1), port = 0)
    try {
      val s1 = event(1, "I", "b1", 0, "x")
      val (c1, _) = post(srv.port, "/ingest", s1,
        crc = Some(crcOf(s1.getBytes(StandardCharsets.UTF_8))))
      assert(c1 == 200) // rolled immediately (segmentEvents=1) -> 1 pending
      val s2 = event(2, "I", "b1", 1, "y")
      val crc2 = Some(crcOf(s2.getBytes(StandardCharsets.UTF_8)))
      val (c2, r2) = post(srv.port, "/ingest", s2, crc2)
      assert(c2 == 503 && r2.contains("PAUSED"), r2)

      val p = new CdcPipeline(PipelineConfig(src, tbl, segmentsPerBatch = 1,
        numBuckets = 2))
      assert(p.runAll(spark) == 1)
      val (c3, _) = post(srv.port, "/ingest", s2, crc2)
      assert(c3 == 200) // backlog cleared -> intake resumes
    } finally srv.stop()
  }

  test("a source can mix parquet backfill segments with network JSONL segments") {
    import graft.source.{BinlogConfig, BinlogGenerator}
    val src = tmpDir("ingest-mixed")
    val tbl = tmpDir("ingest-mixed-tbl")
    // parquet bulk backfill: segment=0
    BinlogGenerator.writeSegments(spark,
      BinlogConfig(numEvents = 100, numConversations = 4, segmentSize = 100,
        dupPct = 0, filesPerSegment = 2), src)
    // live network intake continues AFTER the backfill (lsns above it)
    val srv = IngestServer.start(IngestConfig(src, segmentEvents = 2), port = 0)
    try {
      val s = Seq(event(1000, "I", "mix", 0, "m0"), event(1001, "I", "mix", 1, "m1"))
        .mkString("\n")
      val (c, r) = post(srv.port, "/ingest", s,
        crc = Some(crcOf(s.getBytes(StandardCharsets.UTF_8))))
      assert(c == 200 && r.contains("\"rolledSegment\":1"), r)
      val p = new CdcPipeline(PipelineConfig(src, tbl, segmentsPerBatch = 2,
        numBuckets = 2))
      assert(p.runAll(spark) == 1) // one batch spanning both formats
      val st = p.currentState(spark)
      assert(st.where("conv_id = 'mix'").count() == 2)
      assert(st.count() > 2) // backfill rows present too
    } finally srv.stop()
  }

  test("the streaming drain tails parquet and network JSONL segments together") {
    import graft.source.{BinlogConfig, BinlogGenerator}
    val src = tmpDir("ingest-ss")
    val tbl = tmpDir("ingest-ss-tbl")
    BinlogGenerator.writeSegments(spark,
      BinlogConfig(numEvents = 60, numConversations = 3, segmentSize = 30,
        dupPct = 0, filesPerSegment = 1), src)
    val srv = IngestServer.start(IngestConfig(src, segmentEvents = 2), port = 0)
    try {
      val s = Seq(event(2000, "I", "ssx", 0, "s0"), event(2001, "I", "ssx", 1, "s1"))
        .mkString("\n")
      val (c, _) = post(srv.port, "/ingest", s,
        crc = Some(crcOf(s.getBytes(StandardCharsets.UTF_8))))
      assert(c == 200)
      val p = new CdcPipeline(PipelineConfig(src, tbl, sourceId = "ingss",
        numBuckets = 2))
      val ckpt = tmpDir("ingest-ss-ckpt")
      val q = p.startStream(spark, ckpt, maxFilesPerTrigger = 4)
      q.awaitTermination(120000)
      val st = p.currentState(spark)
      assert(st.where("conv_id = 'ssx'").count() == 2)
      assert(st.count() > 2)

      // a restart from the same checkpoint replays nothing (both sources'
      // offsets are checkpointed; the batchKey ledger absorbs any overlap)
      val before = st.count()
      val q2 = p.startStream(spark, ckpt, maxFilesPerTrigger = 4)
      q2.awaitTermination(120000)
      assert(p.currentState(spark).count() == before)
    } finally srv.stop()
  }
}
