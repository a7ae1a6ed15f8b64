package graft.streaming

import graft.model.Model.ChangeEvent
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed streaming state over the change stream:
  * `flatMapGroupsWithState` tracking, per conversation, the live turn count
  * and LSN high-water mark, emitting an update whenever either advances.
  *
  * This is the Structured Streaming shape for stateful per-key logic the
  * DataFrame API can't express (the reference's per-sink mutable counters,
  * QueuedSink.java:200-203, generalized to keyed state with checkpointed
  * fault tolerance).
  */
object ConversationState {

  case class ConvProgress(conv_id: String, liveTurns: Int, hwmLsn: Long,
      events: Long)

  /** Checkpointed per-conversation state (public: Catalyst generates
    * constructor calls for the state encoder).
    */
  case class St(turns: Seq[Int], hwm: Long, events: Long)

  def track(events: Dataset[ChangeEvent]): Dataset[ConvProgress] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState[St, ConvProgress](
        OutputMode.Append, GroupStateTimeout.NoTimeout()) {
        (convId: String, batch: Iterator[ChangeEvent], state: GroupState[St]) =>
          val st0 = state.getOption.getOrElse(St(Seq.empty, -1L, 0L))
          // rows within an epoch arrive unordered; apply in LSN order
          val st = batch.toSeq.sortBy(_.lsn).foldLeft(st0) { (s, e) =>
            if (e.lsn <= s.hwm) s.copy(events = s.events + 1) // dup redelivery
            else {
              val turns =
                if (e.op == "D") s.turns.filterNot(_ == e.turn_idx)
                else if (s.turns.contains(e.turn_idx)) s.turns
                else s.turns :+ e.turn_idx
              St(turns, e.lsn, s.events + 1)
            }
          }
          state.update(st)
          Iterator.single(ConvProgress(convId, st.turns.size, st.hwm, st.events))
      }
  }

  /** Batch-mode equivalent used by tests to cross-check the streaming run. */
  def batchReference(spark: SparkSession, events: Seq[ChangeEvent]): Map[String, (Int, Long)] =
    events.sortBy(_.lsn).distinctBy(_.lsn).groupBy(_.conv_id).map { case (c, evs) =>
      val turns = evs.foldLeft(Set.empty[Int]) { (s, e) =>
        if (e.op == "D") s - e.turn_idx else s + e.turn_idx
      }
      c -> (turns.size, evs.map(_.lsn).max)
    }
}
