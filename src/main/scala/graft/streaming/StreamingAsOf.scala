package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event envelope for the streaming as-of join: both sides union into one
  * stream so a single watermark governs them. `side` 0 = right (build),
  * 1 = left (probe); `id` identifies the left row in the output, `value`
  * is the right payload. `ts` carries the watermark. */
final case class AsOfEvent(
    key: Long, ts: Timestamp, side: Int, id: Long, value: Double)

/** One emitted probe row: the left id with its matched right value (None
  * when no right row fell inside the lookback). */
final case class AsOfMatch(
    id: Long, key: Long, tsMicros: Long, matchTsMicros: Option[Long],
    value: Option[Double])

/** Per-key buffers: right rows still inside any possible lookback, and
  * left rows whose event time the watermark has not yet passed. */
final case class AsOfState(
    rights: List[(Long, Double)], pending: List[(Long, Long)])

/** Streaming point-in-time join — the [[graft.pipeline.AsOf.asOfJoin]]
  * semantics (backward, inclusive, bounded lookback) under Structured
  * Streaming with CUSTOM state.
  *
  * Why not the built-in stream-stream interval join: it emits EVERY right
  * row in the interval (the reduction to "latest only" would need a
  * second stateful aggregation whose append-mode finalization Spark only
  * supports for time-window groups), and its state holds the full
  * interval per key on both sides. Here `flatMapGroupsWithState` keeps
  * exactly the rows the semantics require: rights inside the lookback
  * horizon, lefts awaiting the watermark.
  *
  * Correctness contract (event-time, arrival-order-free): a left row is
  * emitted only once its event time is ≤ the watermark — at that point
  * every right row at or before it is guaranteed to have arrived, so the
  * emitted match equals the batch as-of on the same data. Rights older
  * than `watermark − lookback` can never match a future left and are
  * trimmed. Groups with no new input still flush on watermark advance via
  * event-time timeouts. Left rows beyond the final watermark stay pending
  * (inherent to watermarking; the StreamingSpec drives a sentinel batch
  * to flush).
  *
  * Scale: state per key is O(rights-in-lookback + in-flight lefts) —
  * bounded by rate × horizon, not by stream length; the only shuffle is
  * the groupByKey on the join key.
  */
object StreamingAsOf {

  def streamingAsOf(
      events: Dataset[AsOfEvent],
      lookbackSeconds: Long,
      watermarkDelay: String = "10 minutes"): Dataset[AsOfMatch] = {
    implicit val outEnc = Encoders.product[AsOfMatch]
    implicit val stateEnc = Encoders.product[AsOfState]
    val lookbackMicros = lookbackSeconds * 1000000L

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.key)(Encoders.scalaLong)
      .flatMapGroupsWithState[AsOfState, AsOfMatch](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, batch: Iterator[AsOfEvent], state: GroupState[AsOfState]) =>
          val wmMicros = state.getCurrentWatermarkMs() * 1000L
          var rights = state.getOption.map(_.rights).getOrElse(Nil)
          var pending = state.getOption.map(_.pending).getOrElse(Nil)

          for (e <- batch) {
            val us = e.ts.getTime * 1000L + (e.ts.getNanos / 1000) % 1000
            if (e.side == 0) rights = (us, e.value) :: rights
            else pending = (e.id, us) :: pending
          }

          // flush lefts the watermark has passed: all their candidate
          // rights have arrived, so the backward match is final
          val (ready, still) = pending.partition(_._2 <= wmMicros)
          val out = ready.sortBy(l => (l._2, l._1)).map { case (id, lts) =>
            val m = rights.filter { case (rts, _) =>
              rts <= lts && rts >= lts - lookbackMicros }
              .sortBy(_._1).lastOption
            AsOfMatch(id, key, lts, m.map(_._1), m.map(_._2))
          }

          // trim rights no future left can reach (pending lefts all sit
          // above the watermark, so wm − lookback is the safe horizon)
          val keep = rights.filter(_._1 >= wmMicros - lookbackMicros)
          if (keep.isEmpty && still.isEmpty) state.remove()
          else {
            state.update(AsOfState(keep, still))
            // wake this group on the next watermark advance even if no
            // new rows arrive for the key, so pending lefts still flush
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
          }
          out.iterator
      }
  }

  /** Envelope builder: tag + union two typed streams (or frames) into the
    * [[AsOfEvent]] shape `streamingAsOf` consumes. */
  def envelope(
      left: Dataset[_], right: Dataset[_],
      keyCol: String, tsCol: String, idCol: String, valueCol: String)
      (implicit spark: SparkSession): Dataset[AsOfEvent] = {
    import spark.implicits._
    val l = left.toDF().select(
      col(keyCol).cast("long").as("key"), col(tsCol).cast("timestamp").as("ts"),
      lit(1).as("side"), col(idCol).cast("long").as("id"),
      lit(0.0).as("value"))
    val r = right.toDF().select(
      col(keyCol).cast("long").as("key"), col(tsCol).cast("timestamp").as("ts"),
      lit(0).as("side"), lit(0L).as("id"),
      col(valueCol).cast("double").as("value"))
    l.unionByName(r).as[AsOfEvent]
  }
}
