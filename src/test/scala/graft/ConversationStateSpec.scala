package graft

import graft.model.Model
import graft.model.Model.ChangeEvent
import graft.source.{BinlogConfig, BinlogGenerator}
import graft.streaming.ConversationState
import org.apache.spark.sql.streaming.Trigger

/** Custom keyed streaming state (flatMapGroupsWithState) converges to the
  * batch reference over a replayed change stream with duplicates.
  */
class ConversationStateSpec extends SparkSpec {
  import spark.implicits._

  test("per-conversation state tracking matches the batch reference") {
    val cfg = BinlogConfig(numEvents = 1500, numConversations = 8,
      segmentSize = 200, dupPct = 5)
    val src = tmpDir("binlog-state")
    BinlogGenerator.writeSegments(spark, cfg, src)

    val stream = spark.readStream
      .schema(Model.changeSchema)
      .option("maxFilesPerTrigger", 24)
      .parquet(s"$src/segment=*")
      .as[ChangeEvent]
    val q = ConversationState.track(stream)
      .writeStream.format("memory").queryName("conv_state")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("ckpt-state"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    // final state per conversation = the row with the highest hwm
    val got = spark.sql(
      """select conv_id, liveTurns, hwmLsn from (
        |  select *, row_number() over (partition by conv_id order by hwmLsn desc, events desc) rn
        |  from conv_state) where rn = 1""".stripMargin)
      .collect().map(r => r.getString(0) -> (r.getInt(1), r.getLong(2))).toMap

    val cdf = BinlogGenerator.zipfCdf(cfg.numConversations, cfg.zipfS)
    val trueLog = (0L until cfg.numEvents)
      .map(l => BinlogGenerator.eventAt(cfg, cdf, l))
    val want = ConversationState.batchReference(spark, trueLog)

    assert(got.keySet == want.keySet)
    want.foreach { case (c, (turns, hwm)) =>
      assert(got(c) == (turns, hwm), s"conversation $c diverged")
    }
  }
}
