package graft.source

import graft.table.ChronicleTable

import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.LogEvent
import org.apache.logging.log4j.core.LoggerContext
import org.apache.logging.log4j.core.appender.AbstractAppender
import org.apache.logging.log4j.core.config.{LoggerConfig, Property}

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration
import java.util.zip.CRC32

/** Application logs as a CDC source — the reference's `Log4jAppender`
  * (suro-client/src/main/java/com/netflix/suro/input/Log4jAppender.java:32-186:
  * a log4j appender formats each event and hands it to the async suro
  * client, which batches over a BOUNDED queue toward the Thrift intake and
  * COUNTS drops when the pipe is down) re-expressed against this engine's
  * intake contract: events buffer in a bounded in-memory queue, flush as
  * one CRC-stamped JSON-lines message set to an [[graft.cdc.IngestServer]]
  * (`X-Graft-Crc32` + idempotent `X-Graft-Batch` retry key), and land as
  * ordinary change events the pipeline drains exactly-once. Flushes are
  * size-based (`batchEvents`) AND time-based (`flushIntervalMs`, the
  * async client's `asyncTimeout=5000ms` semantics — a quiet logger's
  * tail never sits buffered indefinitely). The logging
  * path NEVER throws (suro's appender contract): intake failures keep the
  * buffer, and when it exceeds `maxBuffered` the oldest events drop with
  * the drop counted (`droppedEvents`), exactly the async-client semantics
  * (AsyncSuroClient's memory queue + dropped-message counter).
  *
  * Event → change-event mapping (the routing key becomes the key column,
  * the doctrine of [[graft.model.Model]]): `conv_id` =
  * `<routingKey>:<incarnationMs>:<loggerName>` — one "conversation" per
  * (appender incarnation, logger), so restarts NEVER collide with (and
  * LWW-overwrite) an earlier incarnation's keys; `turn_idx` = per-logger
  * sequence; `role` = level; `text` = formatted message (+ throwable);
  * `tool` = thread name; `ts` = event time; `lsn` =
  * `incarnationMs * 1e6 + seq` — monotone within an incarnation and
  * across restarts while an incarnation emits < 10^6 events per elapsed
  * millisecond, which a logging source cannot approach. Delivery is
  * at-least-once (a lost response retries the slice under a superset
  * batch key); the table's per-key LSN merge absorbs redelivery — the
  * same contract every other source in this engine rides.
  */
class GraftLogAppender(name: String, endpoint: String, routingKey: String,
    batchEvents: Int, maxBuffered: Int, flushIntervalMs: Long = 5000L)
  extends AbstractAppender(name, null, null, true, Property.EMPTY_ARRAY) {

  private val incarnationMs = System.currentTimeMillis()
  private val http = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(2)).build()

  // time-based flush alongside the size-based one: a QUIET logger's tail
  // must not sit buffered until the next append or stop() — the async
  // client's asyncTimeout (ClientConfig default 5000ms) semantics
  private val flusher =
    java.util.concurrent.Executors.newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, s"$name-flusher"); t.setDaemon(true); t
    })
  flusher.scheduleWithFixedDelay(
    () => try flush() catch { case _: Throwable => () },
    flushIntervalMs, flushIntervalMs, java.util.concurrent.TimeUnit.MILLISECONDS)

  // all mutable state below guarded by `this` (log4j may append from any
  // thread). Network flushes run on the flusher thread — size-triggered
  // ones are HANDED OFF, so a logging call never blocks on the intake;
  // only explicit flush() / stop() pay the POST on the caller's thread
  // (the deterministic hooks tests and shutdown need).
  private val buffer = new java.util.ArrayDeque[String]()
  private var seq = 0L
  private val turnBySrc = scala.collection.mutable.Map.empty[String, Int]
  private var droppedCount = 0L
  private var sentCount = 0L
  private var lastFailedAtMs = 0L

  /** Events dropped because the buffer overflowed while intake was down
    * (the reference's dropped-message counter).
    */
  def droppedEvents: Long = synchronized(droppedCount)

  /** Events acknowledged by the intake (suro's getSentMessageCount). */
  def sentEvents: Long = synchronized(sentCount)

  /** Events currently buffered (not yet acknowledged). */
  def bufferedEvents: Int = synchronized(buffer.size)

  override def append(event: LogEvent): Unit = {
    // extract EVERYTHING before buffering: async log4j reuses LogEvent
    // instances after append returns
    val line =
      try {
        val logger = Option(event.getLoggerName).getOrElse("root")
        val msg = Option(event.getMessage).map(_.getFormattedMessage).getOrElse("")
        val text = Option(event.getThrown) match {
          case Some(t) => s"$msg :: ${t.getClass.getName}: ${t.getMessage}"
          case None => msg
        }
        val node = ChronicleTable.mapper.createObjectNode()
        synchronized {
          val turn = turnBySrc.getOrElse(logger, 0)
          turnBySrc(logger) = turn + 1
          node.put("lsn", incarnationMs * 1000000L + seq)
          seq += 1
          node.put("turn_idx", turn)
        }
        node.put("op", "I")
        node.put("conv_id", s"$routingKey:$incarnationMs:$logger")
        node.put("role", event.getLevel.name().toLowerCase)
        node.put("text", text)
        node.put("tool", Thread.currentThread().getName)
        node.put("ts", java.time.Instant.ofEpochMilli(event.getTimeMillis).toString)
        ChronicleTable.mapper.writeValueAsString(node)
      } catch { case _: Throwable => return } // never throw into logging
    val full = synchronized {
      buffer.addLast(line)
      while (buffer.size > maxBuffered) {
        buffer.removeFirst()
        droppedCount += 1
      }
      buffer.size >= batchEvents
    }
    // network I/O happens on the FLUSHER thread, never the logging thread
    // (the async-client contract: an app thread logging a line must not
    // block on the intake's availability or latency)
    if (full)
      try flusher.execute(() =>
        flushMutex.synchronized(flushImpl(force = false))) // backoff path
      catch { case _: Throwable => () } // rejected during stop(): remainder
                                        // ships in stop's own flush
  }

  /** Serializes the flush path (timer, size-trigger, explicit flush,
    * stop) WITHOUT blocking `append`: the POST runs while holding only
    * this mutex, never the appender monitor — a slow or hung intake
    * stalls the flusher thread, not application logging threads (the
    * monitor is held only for the bounded-time buffer snapshot before
    * the POST and the ack bookkeeping after it). Serializing flushes
    * also keeps retries on the SAME slice key (two overlapping in-flight
    * snapshots would each ship a superset under a fresh key — correct but
    * wasteful redelivery).
    */
  private val flushMutex = new Object

  /** Flush everything buffered as one message set; returns true when the
    * intake acknowledged it (duplicate replies count as acknowledged —
    * that IS the idempotent-retry contract). Failure keeps the buffer.
    */
  def flush(): Boolean = flushMutex.synchronized(flushImpl(force = true))

  private def flushImpl(force: Boolean): Boolean = {
    def lsnOf(s: String): Long =
      ChronicleTable.mapper.readTree(s).get("lsn").asLong
    // 1. snapshot the slice under the monitor (bounded-time work only)
    val lines = synchronized {
      if (buffer.isEmpty) return true
      // failure backoff: after a failed attempt, size-triggered and queued
      // flushes stand down for one timer interval (the dead-intake case
      // must not turn every threshold crossing into a connect attempt);
      // the timer itself — and stop() — always retry
      if (!force &&
          System.currentTimeMillis() - lastFailedAtMs < flushIntervalMs)
        return false
      new java.util.ArrayList[String](buffer)
    }
    // 2. POST with NO lock held — concurrent append() proceeds freely
    val body = (String.join("\n", lines) + "\n").getBytes(StandardCharsets.UTF_8)
    val crc = new CRC32(); crc.update(body)
    // slice identity = first..last lsn: a retry of the SAME slice reuses
    // the key (server answers duplicate without re-appending); a retry
    // that grew into a superset gets a new key = redelivery, absorbed by
    // the per-key LSN merge downstream
    val key = s"$name#${lsnOf(lines.get(0))}-${lsnOf(lines.get(lines.size - 1))}"
    val ok =
      try {
        val req = HttpRequest.newBuilder(URI.create(s"$endpoint/ingest"))
          .timeout(Duration.ofSeconds(5))
          .header("X-Graft-Crc32", crc.getValue.toString)
          .header("X-Graft-Batch", key)
          .POST(HttpRequest.BodyPublishers.ofByteArray(body))
          .build()
        http.send(req, HttpResponse.BodyHandlers.ofString()).statusCode() == 200
      } catch { case _: Throwable => false }
    // 3. re-acquire and settle. While unlocked the buffer only GREW at the
    // tail (append) or shrank at the head (drop-oldest), and lsns are
    // strictly increasing — so "acked" is exactly the prefix at-or-below
    // the slice's last lsn.
    synchronized {
      if (ok) {
        sentCount += lines.size
        val lastLsn = lsnOf(lines.get(lines.size - 1))
        while (!buffer.isEmpty && lsnOf(buffer.peekFirst()) <= lastLsn)
          buffer.removeFirst()
        lastFailedAtMs = 0L
      } else lastFailedAtMs = System.currentTimeMillis()
    }
    ok
  }

  override def stop(): Unit = {
    flusher.shutdownNow()
    flushMutex.synchronized(flushImpl(force = true)) // ship the remainder
    super.stop()
  }
}

object GraftLogAppender {

  /** Attach an appender to `loggerName` on the live log4j2 context
    * (additivity OFF — the logger feeds ONLY the intake, and nothing else
    * in the process leaks in). Returns the appender; pair with [[detach]].
    */
  def attach(loggerName: String, endpoint: String,
      routingKey: String = "applog", batchEvents: Int = 256,
      maxBuffered: Int = 10000, flushIntervalMs: Long = 5000L): GraftLogAppender = {
    val app = new GraftLogAppender(s"graft-$loggerName", endpoint,
      routingKey, batchEvents, maxBuffered, flushIntervalMs)
    app.start()
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val cfg = ctx.getConfiguration
    val lc = new LoggerConfig(loggerName, Level.ALL, false)
    lc.addAppender(app, Level.ALL, null)
    cfg.addLogger(loggerName, lc)
    ctx.updateLoggers()
    app
  }

  /** Remove the attached logger config and stop the appender (flushing
    * the buffered remainder).
    */
  def detach(loggerName: String, app: GraftLogAppender): Unit = {
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    ctx.getConfiguration.removeLogger(loggerName)
    ctx.updateLoggers()
    app.stop()
  }
}
