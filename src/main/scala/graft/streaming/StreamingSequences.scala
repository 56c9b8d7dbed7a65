package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event of a per-user stream feeding sequence-example generation.
  * `eventId` breaks ordering ties at equal timestamps, matching the batch
  * operator's (ts, event_id) sort. */
final case class SeqEvent(
    user: Long, ts: Timestamp, eventId: Long, eventType: String)

/** One emitted training example — identical shape to
  * [[graft.pipeline.Sequences.sequenceExamples]]'s output rows. */
final case class SeqExample(user: Long, pos: Long, context: String,
  label: String)

/** Per-user state: `emitted` = events finalized so far (the position
  * counter), `lastTypes` = the ≤k most recent finalized event types
  * (oldest first), `pending` = events the watermark has not yet passed. */
final case class SeqState(
    emitted: Long, lastTypes: List[String],
    pending: List[(Long, Long, String)]) // (tsMicros, eventId, type)

/** Streaming next-event-prediction examples — the
  * [[graft.pipeline.Sequences.sequenceExamples]] semantics under
  * Structured Streaming with custom state.
  *
  * Correctness contract (event-time, arrival-order-free): an event is
  * finalized only once its event time is ≤ the watermark — at that point
  * every earlier event of the user is guaranteed to have arrived, so the
  * position numbering and the k-predecessor context equal the batch
  * operator on the same data, regardless of arrival order. Events beyond
  * the final watermark stay pending (inherent to watermarking; specs
  * drive a sentinel batch to flush).
  *
  * Scale: state per user is O(k + in-flight events) — the context ring
  * never exceeds k and pending is bounded by rate × allowed lateness;
  * the only shuffle is the groupByKey on the user key. Groups with no
  * new input still flush on watermark advance via event-time timeouts. */
object StreamingSequences {

  def streamingSequenceExamples(
      events: Dataset[SeqEvent], k: Int = 3,
      watermarkDelay: String = "10 minutes"): Dataset[SeqExample] = {
    require(k >= 1, s"k must be >= 1, got $k")
    implicit val outEnc = Encoders.product[SeqExample]
    implicit val stateEnc = Encoders.product[SeqState]

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user)(Encoders.scalaLong)
      .flatMapGroupsWithState[SeqState, SeqExample](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, batch: Iterator[SeqEvent], state: GroupState[SeqState]) =>
          val wmMicros = state.getCurrentWatermarkMs() * 1000L
          var st = state.getOption.getOrElse(SeqState(0L, Nil, Nil))
          var pending = st.pending
          for (e <- batch) {
            val us = e.ts.getTime * 1000L + (e.ts.getNanos / 1000) % 1000
            // the batch operator renders NULL event types as '<null>' in
            // contexts; mirror that here
            pending = (us, e.eventId,
              Option(e.eventType).getOrElse("<null>")) :: pending
          }

          // finalize events the watermark has passed, in (ts, id) order —
          // their predecessors have all arrived, so pos/context are final
          val (ripe, still) = pending.partition(_._1 <= wmMicros)
          val out = scala.collection.mutable.ArrayBuffer[SeqExample]()
          var emitted = st.emitted
          var lastTypes = st.lastTypes
          for ((_, _, tpe) <- ripe.sortBy(p => (p._1, p._2))) {
            emitted += 1
            if (lastTypes.length == k)
              out += SeqExample(user, emitted, lastTypes.mkString(","), tpe)
            lastTypes = (lastTypes :+ tpe).takeRight(k)
          }
          st = SeqState(emitted, lastTypes, still)

          if (still.isEmpty && out.isEmpty && ripe.isEmpty && !state.exists) {
            // nothing buffered and nothing produced: no state to keep
          } else {
            state.update(st)
            // wake this group when the watermark passes its earliest
            // pending event, even if no new input arrives for the user
            val nextUs = still.map(_._1).minOption
            nextUs.foreach(us => state.setTimeoutTimestamp(us / 1000L + 1))
          }
          out.iterator
      }
  }
}
