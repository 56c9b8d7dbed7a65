package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{AsOfEvent, AsOfMatch, StreamingAsOf}

/** Streaming as-of: watermark-gated flushes equal the batch join, late
  * (out-of-arrival-order) rights still win, unmatched keys emit None, and
  * state flushes on watermark advance without new per-key input. */
class StreamingAsOfSpec extends AnyFunSuite {
  import TestSpark._

  private def t(s: String) = Timestamp.valueOf(s"2024-01-01 $s")
  private def us(s: String) = t(s).getTime * 1000L

  test("emitted matches equal the batch as-of; late rights are honored") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[AsOfEvent]
    // 30-minute allowed lateness: the watermark contract under which the
    // batch-2 right (20 minutes late) is still in-contract data
    val q = StreamingAsOf.streamingAsOf(mem.toDS(), lookbackSeconds = 3600,
        watermarkDelay = "30 minutes")
      .writeStream.format("memory").queryName("asof_out")
      .outputMode("append").start()
    try {
      // batch 1: one right, one left — the watermark (max ts − 30 min =
      // 10:00) has not passed the 10:30 left, so nothing may flush
      mem.addData(
        AsOfEvent(10, t("10:00:00"), 0, 0, 1.0),
        AsOfEvent(10, t("10:30:00"), 1, 101, 0.0))
      q.processAllAvailable()
      assert(spark.table("asof_out").count() == 0)

      // batch 2: a LATE right at 10:20 arrives after the 10:30 left but
      // inside the allowed lateness; when the watermark reaches 10:30
      // (post-batch no-data pass) the flushing left must see it
      mem.addData(
        AsOfEvent(10, t("10:20:00"), 0, 0, 2.0),
        AsOfEvent(10, t("11:00:00"), 1, 102, 0.0),
        AsOfEvent(20, t("11:00:00"), 1, 201, 0.0))
      q.processAllAvailable()

      // batch 3: far-future sentinel advances the watermark past all
      // pending lefts; key-10/20 groups flush via event-time timeout
      mem.addData(AsOfEvent(99, t("20:00:00"), 0, 0, 0.0))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("asof_out").as[AsOfMatch].collect()
      .map(m => m.id -> ((m.matchTsMicros, m.value))).toMap
    assert(got(101L) == ((Some(us("10:20:00")), Some(2.0)))) // late right won
    assert(got(102L) == ((Some(us("10:20:00")), Some(2.0)))) // latest ≤ 11:00
    assert(got(201L) == ((None, None)))                      // key never quoted

    // cross-check against the batch formulation on the same rows
    val left = Seq((101L, 10L, t("10:30:00")), (102L, 10L, t("11:00:00")),
        (201L, 20L, t("11:00:00"))).toDF("id", "key", "lts")
    val right = Seq((10L, t("10:00:00"), 1.0), (10L, t("10:20:00"), 2.0),
        (99L, t("20:00:00"), 0.0)).toDF("key", "rts", "px")
    val batch = graft.pipeline.AsOf.asOfJoin(left, right, Seq("key"),
        "lts", "rts", Seq("px"), tolerance = Some(3600L))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(batch == got.map { case (k, v) => k -> v._2 })
  }

  test("lookback bound: rights older than the horizon do not match") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[AsOfEvent]
    val q = StreamingAsOf.streamingAsOf(mem.toDS(), lookbackSeconds = 600,
        watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("asof_lb")
      .outputMode("append").start()
    try {
      mem.addData(
        AsOfEvent(1, t("09:00:00"), 0, 0, 7.0),  // 70 min before the left
        AsOfEvent(1, t("10:10:00"), 1, 11, 0.0))
      q.processAllAvailable()
      mem.addData(AsOfEvent(1, t("23:00:00"), 0, 0, 0.0)) // flush
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("asof_lb").as[AsOfMatch].collect()
      .map(m => m.id -> m.value).toMap
    assert(got(11L).isEmpty) // 09:00 is outside the 10-minute lookback
  }
}
