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
    * constructor calls for the state encoder): per-turn last-writer-wins
    * (turn_idx -> (winning lsn, deleted?)) plus a delivery counter.
    *
    * Per-TURN LWW, not a per-conversation high-water-mark guard, on
    * purpose: the file source's epochs split the log mid-segment, so an
    * epoch can carry lsn 750 of a conversation while lsn 700 (possibly a
    * DELETE) arrives only in the NEXT epoch — a global mark would
    * misclassify it as a dup redelivery and skip it (observed as a
    * resurrected turn under an unlucky file listing). LWW per turn makes
    * the fold order-independent: any interleaving of epochs converges to
    * the same state, the same property the main merge path relies on for
    * unordered sources.
    */
  case class TurnSt(lsn: Long, deleted: Boolean)
  case class St(turns: Map[Int, TurnSt], events: Long)

  def track(events: Dataset[ChangeEvent]): Dataset[ConvProgress] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState[St, ConvProgress](
        OutputMode.Append, GroupStateTimeout.NoTimeout()) {
        (convId: String, batch: Iterator[ChangeEvent], state: GroupState[St]) =>
          val st0 = state.getOption.getOrElse(St(Map.empty, 0L))
          val st = batch.foldLeft(st0) { (s, e) =>
            val turns =
              if (s.turns.get(e.turn_idx).forall(_.lsn < e.lsn))
                s.turns + (e.turn_idx -> TurnSt(e.lsn, e.op == "D"))
              else s.turns // dup/older redelivery for this turn: no-op
            St(turns, s.events + 1)
          }
          state.update(st)
          val hwm = if (st.turns.isEmpty) -1L else st.turns.values.map(_.lsn).max
          Iterator.single(ConvProgress(convId,
            st.turns.values.count(!_.deleted), hwm, st.events))
      }
  }

  /** Batch-mode equivalent used by tests to cross-check the streaming run:
    * the same per-turn LWW reduction (equal to a sequential fold of the
    * ordered log — a turn's final state is its last change).
    */
  def batchReference(spark: SparkSession, events: Seq[ChangeEvent]): Map[String, (Int, Long)] =
    events.groupBy(_.conv_id).map { case (c, evs) =>
      val winners = evs.groupBy(_.turn_idx).values.map(_.maxBy(_.lsn))
      c -> (winners.count(_.op != "D"), evs.map(_.lsn).max)
    }
}
