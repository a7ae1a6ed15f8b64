package graft.cdc

import graft.table.ChronicleTable

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** Live HTTP status surface for a running (or resting) table — the
  * reference serves per-sink rates and liveness over REST
  * (`/surosinkstat` + `/healthcheck`: StatusServer.java:46-56,
  * HealthCheck.java:45-63, SinkStat.java:29-41); here the same numbers
  * come straight off the table's own metadata, so serving needs NO Spark
  * session and adds zero load to the drain:
  *
  *   - `GET /healthcheck` -> 200 "OK" when the table root loads (a
  *     readable current snapshot), 503 otherwise;
  *   - `GET /stats`       -> one JSON object: snapshot version/rows/files,
  *     per-source high-water marks and cursors, delta counts, plus
  *     per-mode recent rates folded from the last lines of the JSONL
  *     metrics ledger ([[Metrics]]) — the `/surosinkstat` numbers.
  *
  * Built on the JDK's own `com.sun.net.httpserver` (in-process, a
  * handful of requests per second — an operator surface, not a data
  * path). Start alongside a drain via `GRAFT_STATUS_PORT` on `RunCdc
  * run`/`stream`, or standalone with `RunCdc serve <tableRoot> <port>`.
  */
object StatusServer {

  /** Start serving `tableRoot` on `port` (0 = ephemeral; read the bound
    * port from the returned server). Daemon executor: never blocks JVM
    * exit when the drain finishes.
    */
  def start(tableRoot: String, port: Int): HttpServer = {
    val srv = HttpServer.create(new InetSocketAddress(port), 0)
    srv.createContext("/healthcheck", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val ok =
          try { new ChronicleTable(tableRoot).loadCurrent(); true }
          catch { case _: Throwable => false }
        respond(ex, if (ok) 200 else 503, if (ok) "OK\n" else "UNHEALTHY\n",
          "text/plain")
      }
    })
    srv.createContext("/stats", new HttpHandler {
      override def handle(ex: HttpExchange): Unit =
        try respond(ex, 200, statsJson(tableRoot), "application/json")
        catch {
          case t: Throwable =>
            respond(ex, 503, s"""{"error":${ChronicleTable.mapper
              .writeValueAsString(String.valueOf(t.getMessage))}}""",
              "application/json")
        }
    })
    srv.setExecutor(java.util.concurrent.Executors.newSingleThreadExecutor(
      r => { val t = new Thread(r, "graft-status"); t.setDaemon(true); t }))
    srv.start()
    srv
  }

  private def respond(ex: HttpExchange, code: Int, body: String,
      ctype: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", ctype)
    ex.sendResponseHeaders(code, bytes.length)
    try ex.getResponseBody.write(bytes) finally ex.close()
  }

  /** The /stats payload: snapshot metadata (O(manifest list), no data or
    * bucket-manifest IO) + per-mode rates over the last `lastK` ledger
    * lines, folded WITHOUT Spark (the ledger is driver-side JSONL).
    */
  private[cdc] def statsJson(tableRoot: String, lastK: Int = 20): String = {
    val snap = new ChronicleTable(tableRoot).loadCurrent()
    val m = ChronicleTable.mapper
    val base = new java.util.LinkedHashMap[String, Any]()
    base.put("version", snap.version)
    base.put("rows", snap.totalRows)
    base.put("files", snap.numFiles)
    base.put("deltaFiles", snap.manifestList.map(_.deltaFiles).sum)
    base.put("buckets", snap.numBuckets)
    base.put("hwmLsn", snap.hwmLsn)
    base.put("commitTimeMs", snap.commitTimeMs)
    base.put("hwmBySource", new java.util.TreeMap[String, Long](
      scala.jdk.CollectionConverters.MapHasAsJava(snap.hwms).asJava))
    base.put("cursors", new java.util.TreeMap[String, Long](
      scala.jdk.CollectionConverters.MapHasAsJava(snap.cursors).asJava))
    base.put("unorderedSources",
      scala.jdk.CollectionConverters.SeqHasAsJava(
        snap.unordered.toSeq.sorted).asJava)
    base.put("schema",
      scala.jdk.CollectionConverters.SeqHasAsJava(
        snap.schema.fieldNames.toSeq).asJava)

    // recent per-mode rates off the JSONL ledger TAIL (bounded read — the
    // ledger grows forever; the fold lives in Metrics.recentRates)
    val summaries = Metrics.recentRates(s"$tableRoot/metrics", lastK)
    if (summaries.nonEmpty) {
      val rates = new java.util.TreeMap[String, Any]()
      summaries.foreach { case (mode, s) =>
        val r = new java.util.LinkedHashMap[String, Any]()
        r.put("batches", s.batches)
        r.put("rows", s.rows)
        s.rowsPerSec.foreach(v => r.put("rowsPerSec", v))
        r.put("lastTsMs", s.lastTsMs)
        rates.put(mode, r)
      }
      base.put("recentRates", rates)
    }
    m.writerWithDefaultPrettyPrinter().writeValueAsString(base)
  }
}
