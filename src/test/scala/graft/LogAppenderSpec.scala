package graft

import graft.cdc.{CdcPipeline, IngestConfig, IngestServer, PipelineConfig}
import graft.source.GraftLogAppender

import org.apache.logging.log4j.LogManager

/** Application logs as a CDC source: a log4j2 appender buffers events,
  * ships them as CRC-stamped message sets to the intake server, and the
  * pipeline drains them into the table exactly-once — the reference's
  * `Log4jAppender` → async client → Thrift intake path
  * (suro-client/.../input/Log4jAppender.java) end to end.
  */
class LogAppenderSpec extends SparkSpec {

  test("logged events land in the table through the intake, exactly once") {
    val src = tmpDir("logapp-src")
    val tbl = tmpDir("logapp-tbl")
    val srv = IngestServer.start(IngestConfig(src, segmentEvents = 10000), port = 0)
    val loggerName = "graft.test.app.e2e"
    val app = GraftLogAppender.attach(loggerName,
      s"http://127.0.0.1:${srv.port}", routingKey = "applog",
      batchEvents = 50, maxBuffered = 10000,
      flushIntervalMs = 600000L) // timer quiesced: this test pins SIZE flushes
    try {
      val log = LogManager.getLogger(loggerName)
      (0 until 118).foreach(i => log.info(s"work item $i done"))
      log.warn("queue depth high")
      log.error("task failed", new IllegalStateException("boom"))
      // 120 events, batchEvents=50: size-triggered flushes run on the
      // FLUSHER thread (logging never blocks on the intake), so await the
      // async sends; a flush ships whatever is buffered when it runs, so
      // sent lands anywhere in [100, 120] with the rest still buffered
      val deadline = System.currentTimeMillis() + 10000
      while (app.sentEvents < 100 && System.currentTimeMillis() < deadline)
        Thread.sleep(20)
      assert(app.sentEvents >= 100 &&
        app.sentEvents + app.bufferedEvents == 120,
        s"sent=${app.sentEvents} buffered=${app.bufferedEvents}")
      GraftLogAppender.detach(loggerName, app) // flushes the remainder
      assert(app.sentEvents == 120 && app.droppedEvents == 0)

      srv.stop() // publishes the staged remainder as a segment
      val p = new CdcPipeline(PipelineConfig(src, tbl, segmentsPerBatch = 10,
        numBuckets = 2))
      assert(p.runAll(spark) >= 1)
      val rows = p.currentState(spark)
        .selectExpr("conv_id", "turn_idx", "role", "text", "tool").collect()
      assert(rows.length == 120)
      // one conversation per (incarnation, logger); contiguous turns
      assert(rows.map(_.getString(0)).distinct.toSeq ==
        Seq(rows.head.getString(0)))
      assert(rows.head.getString(0).startsWith(s"applog:") &&
        rows.head.getString(0).endsWith(s":$loggerName"))
      assert(rows.map(_.getInt(1)).sorted.toSeq == (0 until 120))
      val byRole = rows.groupBy(_.getString(2)).view.mapValues(_.length).toMap
      assert(byRole == Map("info" -> 118, "warn" -> 1, "error" -> 1), byRole)
      val err = rows.find(_.getString(2) == "error").get
      assert(err.getString(3).contains("task failed") &&
        err.getString(3).contains("IllegalStateException: boom"))
      assert(err.getString(4) != null && err.getString(4).nonEmpty) // thread

      // exactly-once: nothing new to drain
      assert(p.runAll(spark) == 0)
    } finally {
      try srv.stop() catch { case _: Throwable => () }
    }
  }

  test("a quiet logger's tail flushes on the timer, not only on size/stop") {
    val src = tmpDir("logapp-timer")
    val srv = IngestServer.start(IngestConfig(src, segmentEvents = 10000), port = 0)
    val loggerName = "graft.test.app.timer"
    val app = GraftLogAppender.attach(loggerName,
      s"http://127.0.0.1:${srv.port}", batchEvents = 1000,
      flushIntervalMs = 200L)
    try {
      val log = LogManager.getLogger(loggerName)
      (0 until 5).foreach(i => log.info(s"t$i"))
      assert(app.sentEvents == 0) // below the size threshold
      val deadline = System.currentTimeMillis() + 5000
      while (app.sentEvents < 5 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(app.sentEvents == 5 && app.bufferedEvents == 0,
        s"sent=${app.sentEvents} buffered=${app.bufferedEvents}")
    } finally {
      GraftLogAppender.detach(loggerName, app)
      srv.stop()
    }
  }

  test("intake down: logging never throws, bounded buffer drops oldest and counts") {
    val loggerName = "graft.test.app.down"
    // nothing listens on the endpoint
    val app = GraftLogAppender.attach(loggerName, "http://127.0.0.1:1",
      batchEvents = 4, maxBuffered = 10)
    try {
      val log = LogManager.getLogger(loggerName)
      (0 until 50).foreach(i => log.info(s"m$i")) // must not throw
      assert(app.sentEvents == 0)
      assert(app.bufferedEvents == 10, app.bufferedEvents)
      assert(app.droppedEvents == 40, app.droppedEvents)
    } finally GraftLogAppender.detach(loggerName, app)
  }

  test("a hung intake never blocks application logging threads") {
    // a server that ACCEPTS connections but never answers: the in-flight
    // POST sits in its 5s request timeout on the flusher thread. The
    // appender contract (and the async-client semantics it mirrors) is
    // that append() pays only bounded-time buffer work — the POST must
    // run outside the appender monitor.
    val sock = new java.net.ServerSocket(0)
    val eater = new Thread(() =>
      try {
        while (true) { sock.accept() } // hold sockets open, never respond
      } catch { case _: Throwable => () })
    eater.setDaemon(true); eater.start()
    val loggerName = "graft.test.app.hung"
    val app = GraftLogAppender.attach(loggerName,
      s"http://127.0.0.1:${sock.getLocalPort}", batchEvents = 2,
      maxBuffered = 10000, flushIntervalMs = 600000L)
    try {
      val log = LogManager.getLogger(loggerName)
      log.info("h0"); log.info("h1") // size-trigger: flusher now hangs in POST
      Thread.sleep(150)              // let the flusher enter the send
      val t0 = System.nanoTime()
      (0 until 1000).foreach(i => log.info(s"h$i"))
      val sec = (System.nanoTime() - t0) / 1e9
      assert(sec < 2.0,
        f"1000 appends took $sec%.1fs while a flush was in flight — " +
          "logging threads are blocking on the intake")
      assert(app.sentEvents == 0)
    } finally {
      GraftLogAppender.detach(loggerName, app)
      sock.close()
    }
  }

  test("a lost ack redelivers the same slice key and lands exactly once") {
    // flaky front: forwards every set to the REAL intake but swallows the
    // first success into a 500 — the client sees a failure for a batch the
    // server persisted. The retry re-POSTs the SAME slice under the SAME
    // X-Graft-Batch key; the intake's duplicate guard acknowledges without
    // re-appending, and the drained table holds each event exactly once.
    val src = tmpDir("logapp-lostack")
    val tbl = tmpDir("logapp-lostack-tbl")
    val srv = IngestServer.start(IngestConfig(src, segmentEvents = 10000), port = 0)
    val failed = new java.util.concurrent.atomic.AtomicInteger(0)
    val http = java.net.http.HttpClient.newHttpClient()
    val front = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    front.createContext("/ingest", exchange => {
      val body = exchange.getRequestBody.readAllBytes()
      val fwd = java.net.http.HttpRequest
        .newBuilder(java.net.URI.create(s"http://127.0.0.1:${srv.port}/ingest"))
        .header("X-Graft-Crc32", exchange.getRequestHeaders.getFirst("X-Graft-Crc32"))
        .header("X-Graft-Batch", exchange.getRequestHeaders.getFirst("X-Graft-Batch"))
        .POST(java.net.http.HttpRequest.BodyPublishers.ofByteArray(body))
        .build()
      val resp = http.send(fwd, java.net.http.HttpResponse.BodyHandlers.ofString())
      val status = // swallow the FIRST success: ack lost after persist
        if (resp.statusCode() == 200 && failed.getAndIncrement() == 0) 500
        else resp.statusCode()
      val out = resp.body().getBytes("UTF-8")
      exchange.sendResponseHeaders(status, out.length)
      exchange.getResponseBody.write(out)
      exchange.close()
    })
    front.start()
    val loggerName = "graft.test.app.lostack"
    val app = GraftLogAppender.attach(loggerName,
      s"http://127.0.0.1:${front.getAddress.getPort}", batchEvents = 1000)
    try {
      val log = LogManager.getLogger(loggerName)
      (0 until 10).foreach(i => log.info(s"la$i"))
      assert(!app.flush(), "first flush must see the lost ack as failure")
      assert(app.bufferedEvents == 10) // failure keeps the buffer
      assert(app.flush(), "retry of the persisted slice must be acknowledged")
      assert(app.sentEvents == 10 && app.bufferedEvents == 0)
      GraftLogAppender.detach(loggerName, app)
      srv.stop()
      val p = new CdcPipeline(PipelineConfig(src, tbl, segmentsPerBatch = 10,
        numBuckets = 2))
      p.runAll(spark)
      assert(p.currentState(spark).count() == 10,
        "redelivered slice must not duplicate rows")
    } finally {
      front.stop(0)
      try srv.stop() catch { case _: Throwable => () }
    }
  }

  test("a retried flush is idempotent at the intake (same slice, same key)") {
    val src = tmpDir("logapp-retry")
    val tbl = tmpDir("logapp-retry-tbl")
    val srv = IngestServer.start(IngestConfig(src, segmentEvents = 10000), port = 0)
    val loggerName = "graft.test.app.retry"
    val app = GraftLogAppender.attach(loggerName,
      s"http://127.0.0.1:${srv.port}", batchEvents = 1000)
    try {
      val log = LogManager.getLogger(loggerName)
      (0 until 10).foreach(i => log.info(s"r$i"))
      assert(app.flush())
      // client retry of an ALREADY-ACKED slice: re-POST the same set by
      // hand is impossible from here (buffer cleared), so re-log the same
      // COUNT and flush twice — the second flush of an empty buffer is a
      // no-op, and the intake's duplicate guard is separately covered by
      // IngestServerSpec; what this pins is flush() idempotence
      assert(app.flush()) // empty buffer: acknowledged no-op
      GraftLogAppender.detach(loggerName, app)
      srv.stop()
      val p = new CdcPipeline(PipelineConfig(src, tbl, segmentsPerBatch = 10,
        numBuckets = 2))
      p.runAll(spark)
      assert(p.currentState(spark).count() == 10)
    } finally {
      try srv.stop() catch { case _: Throwable => () }
    }
  }
}
