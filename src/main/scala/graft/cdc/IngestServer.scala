package graft.cdc

import graft.table.ChronicleTable

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}
import java.util.zip.CRC32
import scala.jdk.CollectionConverters._

/** Ingest-server configuration.
  *
  * @param sourceDir          binlog directory the server appends segments to
  *                           (the same directory a [[CdcPipeline]] tails)
  * @param segmentEvents      roll a segment once it holds at least this many
  *                           events (a POST never splits: the roll happens
  *                           at the batch boundary after the threshold)
  * @param tableRoot          downstream table, if known — enables the
  *                           pending-segment backpressure probe
  * @param maxPendingSegments pause intake (503 + Retry-After) when this many
  *                           completed segments sit beyond the table's
  *                           consumed cursor; 0 = no guard
  * @param minFreeBytes       pause intake when the source filesystem has
  *                           less usable space than this; 0 = no guard
  */
case class IngestConfig(
    sourceDir: String,
    segmentEvents: Long = 1000L,
    tableRoot: Option[String] = None,
    maxPendingSegments: Int = 0,
    minFreeBytes: Long = 0L)

/** Network intake for the CDC pipeline — the reference's Thrift ingest
  * endpoint (`SuroServer` hosting `ThriftServer` + `MessageSetProcessor`,
  * ThriftServer.java:62-104) re-expressed as a loopback HTTP surface in
  * front of the engine's file-tailed binlog:
  *
  *   - `POST /ingest` — body is JSON-lines, one change event per line in
  *     [[graft.model.Model.changeSchema]] shape (`ts` ISO-8601); the
  *     client stamps `X-Graft-Crc32` with the CRC32 of the raw body bytes
  *     and the server verifies it before anything lands — the reference's
  *     message-set CRC (MessageSetProcessor.java:125-182 `checkCRC`).
  *     Corrupt or unparseable sets are rejected WHOLE with the payload
  *     preserved under `<sourceDir>/.ingest/rejected/` (suro returns
  *     CRC_CORRUPTED to the client and counts the drop; we additionally
  *     keep the bytes inspectable, consistent with the quarantine
  *     philosophy). An optional `X-Graft-Batch` key makes client retries
  *     idempotent: a re-POST of an accepted key answers OK/duplicate
  *     without re-appending (the client-side half of exactly-once; the
  *     table ledger is the consumer-side half).
  *   - `POST /roll` — close the open segment now (otherwise segments roll
  *     at `segmentEvents` and on `stop()`).
  *   - `GET /ingeststat` — counters: next segment, staged events, accepted
  *     sets, rejects, downstream pending.
  *
  * Accepted events append to a staging directory invisible to the tailer;
  * a roll ATOMICALLY renames it to `segment=K`, so a concurrent drain only
  * ever sees whole segments (same stage-then-publish move the table's own
  * writers use). Backpressure mirrors `ThriftServer`'s pause behaviour
  * (queue-full and insufficient-disk checks, QueuedSink.java:51-60,
  * TestPauseOnInsufficientDiskSpaceThriftServer.java): when the downstream
  * table falls `maxPendingSegments` behind or disk runs low, the server
  * answers 503 with a Retry-After derived from the backlog instead of
  * accepting unbounded intake.
  *
  * Like [[StatusServer]] this runs on the JDK's own http server with NO
  * Spark dependency: intake is row-oriented and driver-light by design;
  * columnarization happens downstream where the pipeline reads the JSONL
  * segments with the declared schema (see `CdcPipeline.readBatch`).
  */
class IngestServer(val cfg: IngestConfig) {

  private val srcDir = Paths.get(cfg.sourceDir)
  private val ingestDir = srcDir.resolve(".ingest")
  private val stagingDir = ingestDir.resolve("staging")
  private val rejectedDir = ingestDir.resolve("rejected")
  private val ledgerFile = ingestDir.resolve("accepted.jsonl")
  private val stagedFile = stagingDir.resolve("part-00000.jsonl")

  Files.createDirectories(stagingDir)
  Files.createDirectories(rejectedDir)

  /** Client batch keys already accepted (reloaded across restarts). A key
    * is ledgered AFTER its events land in staging, so a crash between the
    * two can at worst re-append on retry — a duplicate DELIVERY, which the
    * downstream per-key LSN merge already absorbs (the binlog fixture
    * models exactly this redelivery window).
    */
  private val accepted: scala.collection.mutable.Set[String] = {
    val s = scala.collection.mutable.Set.empty[String]
    if (Files.exists(ledgerFile))
      Files.readAllLines(ledgerFile).asScala.foreach { line =>
        val t = line.trim
        if (t.nonEmpty) s += ChronicleTable.mapper.readTree(t).get("key").asText
      }
    s
  }

  /** Next segment number to publish: past completed segments win over any
    * staging leftovers (which roll INTO this number).
    */
  private var nextSegment: Long = {
    val existing = if (Files.exists(srcDir))
      Files.list(srcDir).iterator().asScala
        .map(_.getFileName.toString)
        .filter(_.startsWith("segment="))
        .map(_.stripPrefix("segment=").toLong)
        .foldLeft(-1L)(math.max)
    else -1L
    existing + 1L
  }

  /** Events sitting in the open staging segment (recounted on restart). */
  private var stagedEvents: Long =
    if (Files.exists(stagedFile)) Files.lines(stagedFile).count() else 0L

  private var rejectedSets: Long =
    Files.list(rejectedDir).iterator().asScala.count(_ => true).toLong

  private var acceptedSets: Long = 0L
  private var server: HttpServer = _

  def port: Int = server.getAddress.getPort

  /** Completed segments not yet consumed by the downstream table (-1 when
    * no table is configured; 0 when caught up).
    */
  private def pendingSegments(): Long = cfg.tableRoot match {
    case None => -1L
    case Some(root) =>
      val consumed =
        try {
          val t = new ChronicleTable(root)
          if (!t.exists) -1L else t.loadCurrent().cursors.values.foldLeft(-1L)(math.max)
        } catch { case _: Throwable => -1L }
      math.max(0L, nextSegment - 1L - consumed)
  }

  private def diskLow(): Boolean =
    cfg.minFreeBytes > 0L &&
      Files.getFileStore(srcDir).getUsableSpace < cfg.minFreeBytes

  /** Validate the set: every non-blank line must parse as a JSON object
    * (structural check only — semantic validation is the pipeline's
    * quarantine route, exactly as suro defers routing checks past intake).
    * Returns the first bad 1-based line, or -1 if clean.
    */
  private def firstBadLine(lines: Array[String]): Int = {
    var i = 0
    while (i < lines.length) {
      val t = lines(i).trim
      if (t.nonEmpty) {
        try {
          if (!ChronicleTable.mapper.readTree(t).isObject) return i + 1
        } catch { case _: Throwable => return i + 1 }
      }
      i += 1
    }
    -1
  }

  private def reject(body: Array[Byte], reason: String): Unit = {
    val f = rejectedDir.resolve(f"set-$rejectedSets%06d-$reason.jsonl")
    Files.write(f, body)
    rejectedSets += 1
  }

  /** Close the open segment: atomically publish staging as `segment=K`.
    * Returns the published segment number, or -1 when staging is empty
    * (nothing to publish).
    */
  def roll(): Long = synchronized {
    if (stagedEvents == 0L) -1L
    else {
      val target = srcDir.resolve(s"segment=$nextSegment")
      Files.move(stagingDir, target, StandardCopyOption.ATOMIC_MOVE)
      Files.createDirectories(stagingDir)
      val published = nextSegment
      nextSegment += 1L
      stagedEvents = 0L
      published
    }
  }

  /** Accept one message set. Returns (httpCode, jsonBody). */
  private[cdc] def ingest(body: Array[Byte], crcHeader: Option[String],
      batchKey: Option[String]): (Int, String) = synchronized {
    val m = ChronicleTable.mapper
    def json(kv: (String, Any)*): String = {
      val o = new java.util.LinkedHashMap[String, Any]()
      kv.foreach { case (k, v) => o.put(k, v) }
      m.writeValueAsString(o)
    }
    crcHeader match {
      case None => return (400, json("result" -> "MISSING_CRC"))
      case Some(h) =>
        val crc = new CRC32(); crc.update(body)
        val sent = try h.trim.toLong catch { case _: Throwable => -1L }
        if (sent != crc.getValue) {
          reject(body, "crc")
          return (400, json("result" -> "CRC_CORRUPTED",
            "expected" -> crc.getValue))
        }
    }
    if (batchKey.exists(accepted.contains))
      return (200, json("result" -> "OK", "duplicate" -> true))
    val pending = pendingSegments()
    if (cfg.maxPendingSegments > 0 && pending >= cfg.maxPendingSegments)
      // Retry-After ~ backlog size: suro derives its pause from
      // pending/throughput (QueuedSink.java:51-60); with no rate meter at
      // intake we use one second per pending segment as the stand-in.
      return (503, json("result" -> "PAUSED", "pendingSegments" -> pending,
        "retryAfterSec" -> pending))
    if (diskLow())
      return (503, json("result" -> "PAUSED", "reason" -> "disk",
        "retryAfterSec" -> 30L))

    val lines = new String(body, StandardCharsets.UTF_8).split("\n", -1)
    val bad = firstBadLine(lines)
    if (bad > 0) {
      reject(body, "parse")
      return (400, json("result" -> "MALFORMED", "line" -> bad))
    }
    val events = lines.iterator.map(_.trim).filter(_.nonEmpty).toArray
    if (events.nonEmpty) {
      Files.write(stagedFile,
        (events.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
      stagedEvents += events.length
    }
    batchKey.foreach { k =>
      Files.write(ledgerFile,
        (json("key" -> k, "events" -> events.length) + "\n")
          .getBytes(StandardCharsets.UTF_8),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
      accepted += k
    }
    acceptedSets += 1L
    val rolled = if (stagedEvents >= cfg.segmentEvents) roll() else -1L
    (200, json("result" -> "OK", "events" -> events.length,
      "staged" -> stagedEvents, "rolledSegment" -> rolled))
  }

  private[cdc] def stats(): String = synchronized {
    val o = new java.util.LinkedHashMap[String, Any]()
    o.put("nextSegment", nextSegment)
    o.put("stagedEvents", stagedEvents)
    o.put("acceptedSets", acceptedSets)
    o.put("acceptedKeys", accepted.size)
    o.put("rejectedSets", rejectedSets)
    o.put("pendingSegments", pendingSegments())
    ChronicleTable.mapper.writeValueAsString(o)
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    if (code == 503) {
      // surface the pause to standard clients too
      val retry = try {
        ChronicleTable.mapper.readTree(body).path("retryAfterSec").asLong(1L)
      } catch { case _: Throwable => 1L }
      ex.getResponseHeaders.set("Retry-After", math.max(1L, retry).toString)
    }
    ex.sendResponseHeaders(code, bytes.length)
    try ex.getResponseBody.write(bytes) finally ex.close()
  }

  private def start(port: Int): IngestServer = {
    server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/ingest", new HttpHandler {
      override def handle(ex: HttpExchange): Unit =
        try {
          if (ex.getRequestMethod != "POST")
            respond(ex, 405, """{"result":"METHOD_NOT_ALLOWED"}""")
          else {
            val body = ex.getRequestBody.readAllBytes()
            val (code, resp) = ingest(body,
              Option(ex.getRequestHeaders.getFirst("X-Graft-Crc32")),
              Option(ex.getRequestHeaders.getFirst("X-Graft-Batch")))
            respond(ex, code, resp)
          }
        } catch {
          case t: Throwable =>
            respond(ex, 500, s"""{"result":"ERROR","message":${
              ChronicleTable.mapper.writeValueAsString(String.valueOf(t.getMessage))}}""")
        }
    })
    server.createContext("/roll", new HttpHandler {
      override def handle(ex: HttpExchange): Unit =
        if (ex.getRequestMethod != "POST")
          respond(ex, 405, """{"result":"METHOD_NOT_ALLOWED"}""")
        else respond(ex, 200, s"""{"result":"OK","rolledSegment":${roll()}}""")
    })
    server.createContext("/ingeststat", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = respond(ex, 200, stats())
    })
    server.setExecutor(java.util.concurrent.Executors.newSingleThreadExecutor(
      r => { val t = new Thread(r, "graft-ingest"); t.setDaemon(true); t }))
    server.start()
    this
  }

  /** Stop accepting and publish any staged remainder as a final segment. */
  def stop(): Unit = {
    server.stop(0)
    roll()
  }
}

object IngestServer {
  /** Start serving on `port` (0 = ephemeral; read back via `.port`). */
  def start(cfg: IngestConfig, port: Int): IngestServer =
    new IngestServer(cfg).start(port)
}
