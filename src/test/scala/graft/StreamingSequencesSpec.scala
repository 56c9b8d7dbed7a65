package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{SeqEvent, SeqExample, StreamingSequences}

/** Streaming sequence examples: watermark-gated finalization equals the
  * batch operator on the same events, even with out-of-order arrival and
  * equal-timestamp ties. */
class StreamingSequencesSpec extends AnyFunSuite {
  import TestSpark._

  private def t(s: String) = Timestamp.valueOf(s"2024-01-01 $s")

  test("streaming examples equal the batch formulation; late events order") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SeqEvent]
    val q = StreamingSequences.streamingSequenceExamples(mem.toDS(), k = 2,
        watermarkDelay = "30 minutes")
      .writeStream.format("memory").queryName("seq_out")
      .outputMode("append").start()
    try {
      // user 1's first three events arrive OUT of order; the 10:05 one
      // comes in batch 2, after 10:10 — watermark gating must still
      // number and contextualize them in event-time order
      mem.addData(
        SeqEvent(1L, t("10:00:00"), 1L, "a"),
        SeqEvent(1L, t("10:10:00"), 3L, "c"),
        // user 2: equal timestamps — order falls back to eventId
        SeqEvent(2L, t("10:00:00"), 11L, "x"),
        SeqEvent(2L, t("10:00:00"), 10L, "y"))
      q.processAllAvailable()
      assert(spark.table("seq_out").count() == 0) // watermark still behind

      mem.addData(
        SeqEvent(1L, t("10:05:00"), 2L, "b"),
        SeqEvent(1L, t("10:20:00"), 4L, "d"),
        SeqEvent(2L, t("10:01:00"), 12L, "z"))
      q.processAllAvailable()

      // far-future sentinel advances the watermark past everything
      mem.addData(SeqEvent(99L, t("20:00:00"), 0L, "s"))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("seq_out").as[SeqExample].collect()
      .map(e => (e.user, e.pos, e.context, e.label)).toSet
    assert(got == Set(
      (1L, 3L, "a,b", "c"), (1L, 4L, "b,c", "d"),
      (2L, 3L, "y,x", "z")))

    // identical rows from the batch operator over the same events
    val ev = Seq(
      (1L, t("10:00:00"), 1L, "a"), (1L, t("10:05:00"), 2L, "b"),
      (1L, t("10:10:00"), 3L, "c"), (1L, t("10:20:00"), 4L, "d"),
      (2L, t("10:00:00"), 11L, "x"), (2L, t("10:00:00"), 10L, "y"),
      (2L, t("10:01:00"), 12L, "z"), (99L, t("20:00:00"), 0L, "s"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val batch = graft.pipeline.Sequences.sequenceExamples(ev, k = 2)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3))).toSet
    assert(batch == got)
  }
}
