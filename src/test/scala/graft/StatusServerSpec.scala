package graft

import graft.cdc.{CdcPipeline, PipelineConfig, StatusServer}
import graft.source.{BinlogConfig, BinlogGenerator}

/** The live HTTP status surface: /healthcheck + /stats off the table
  * metadata and metrics ledger (the reference's StatusServer/HealthCheck
  * + /surosinkstat, StatusServer.java:46-56, SinkStat.java:29-41).
  */
class StatusServerSpec extends SparkSpec {

  private def get(port: Int, path: String): (Int, String) = {
    val conn = new java.net.URL(s"http://127.0.0.1:$port$path")
      .openConnection().asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(5000)
    conn.setReadTimeout(5000)
    val code = conn.getResponseCode
    val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val body = new String(is.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    conn.disconnect()
    (code, body)
  }

  test("healthcheck and stats serve live table metadata + ledger rates without Spark jobs") {
    val cfg = BinlogConfig(numEvents = 600, numConversations = 6, segmentSize = 200)
    val src = tmpDir("binlog-status")
    val tbl = tmpDir("table-status")
    BinlogGenerator.writeSegments(spark, cfg, src)
    val p = new CdcPipeline(PipelineConfig(src, tbl, segmentsPerBatch = 1,
      numBuckets = 2, recordMetrics = true))
    p.runAll(spark)
    val snap = p.table.loadCurrent()

    val srv = StatusServer.start(tbl, port = 0)
    try {
      val port = srv.getAddress.getPort
      val (hc, hb) = get(port, "/healthcheck")
      assert(hc == 200 && hb.trim == "OK")

      val (sc, sb) = get(port, "/stats")
      assert(sc == 200)
      val json = graft.table.ChronicleTable.mapper.readTree(sb)
      assert(json.get("version").asLong == snap.version)
      assert(json.get("rows").asLong == snap.totalRows)
      assert(json.get("files").asInt == snap.numFiles)
      assert(json.get("hwmLsn").asLong == snap.hwmLsn)
      assert(json.get("hwmBySource").get("binlog").asLong ==
        snap.hwms("binlog"))
      assert(json.get("cursors").get("binlog").asLong == 2L)
      // rates folded from the metrics ledger (3 batch events recorded)
      val batchRates = json.get("recentRates").get("batch")
      assert(batchRates.get("batches").asInt == 3)
      assert(batchRates.get("rows").asLong > 0)

      // the surface is LIVE: another drained batch shows up on next poll
      val more = tmpDir("binlog-status2")
      BinlogGenerator.writeSegments(spark,
        cfg.copy(numEvents = 800), more)
      // stage one extra segment into the source and drain it
      java.nio.file.Files.move(
        java.nio.file.Paths.get(more, "segment=3"),
        java.nio.file.Paths.get(src, "segment=3"))
      assert(p.runAll(spark) == 1)
      val (sc2, sb2) = get(port, "/stats")
      assert(sc2 == 200)
      val json2 = graft.table.ChronicleTable.mapper.readTree(sb2)
      assert(json2.get("version").asLong == snap.version + 1)
      assert(json2.get("recentRates").get("batch").get("batches").asInt == 4)
    } finally srv.stop(0)

    // a broken root is unhealthy, not a hang
    val srv2 = StatusServer.start(tmpDir("not-a-table"), port = 0)
    try {
      val (hc2, _) = get(srv2.getAddress.getPort, "/healthcheck")
      assert(hc2 == 503)
      val (sc3, sb3) = get(srv2.getAddress.getPort, "/stats")
      assert(sc3 == 503 && sb3.contains("error"))
    } finally srv2.stop(0)
  }

  test("a chain-fed table's /stats shows per-mode rates for the chained drain") {
    import graft.cdc.Chain
    val cfg = BinlogConfig(numEvents = 600, numConversations = 6, segmentSize = 200)
    val src = tmpDir("binlog-chainstat")
    BinlogGenerator.writeSegments(spark, cfg, src)
    val p = new CdcPipeline(PipelineConfig(src, tmpDir("table-chainstat-up"),
      segmentsPerBatch = 1, numBuckets = 2))
    p.runAll(spark, maxBatches = 2)
    val down = new graft.table.ChronicleTable(tmpDir("table-chainstat-down"))
    Chain.drain(spark, p.table, down, numBuckets = 2)
    p.runAll(spark)
    Chain.drain(spark, p.table, down, numBuckets = 2)

    val srv = StatusServer.start(down.root, port = 0)
    try {
      val (sc, sb) = get(srv.getAddress.getPort, "/stats")
      assert(sc == 200)
      val json = graft.table.ChronicleTable.mapper.readTree(sb)
      // chain polls record metrics-ledger lines on the DOWNSTREAM table,
      // so the /surosinkstat numbers are live for chain-fed tables too
      val chainRates = json.get("recentRates").get("chain-poll")
      assert(chainRates != null, s"no chain-poll rates in $sb")
      assert(chainRates.get("batches").asInt >= 2)
      assert(chainRates.get("rows").asLong > 0)
    } finally srv.stop(0)
  }
}
