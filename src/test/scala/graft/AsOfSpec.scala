package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.AsOf

/** As-of join semantics pinned on hand-checkable data: backward/forward,
  * inclusive boundary, tolerance, per-key isolation, null payload fields
  * surviving the carry, and the no-match → NULL case. */
class AsOfSpec extends AnyFunSuite {
  import TestSpark._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val (clicks, quotes) = {
    import spark.implicits._
    val c = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 10:05:00")),
      (3L, 10L, ts("2024-01-01 09:00:00")), // before any quote
      (4L, 20L, ts("2024-01-01 10:05:00")), // boundary: equals quote ts
      (5L, 30L, ts("2024-01-01 12:00:00"))  // key with no quotes at all
    ).toDF("id", "uid", "cts")
    val q = Seq(
      (10L, ts("2024-01-01 09:30:00"), Some(1.0)),
      (10L, ts("2024-01-01 10:03:00"), None),  // null payload field
      (20L, ts("2024-01-01 10:05:00"), Some(3.0)),
      (20L, ts("2024-01-01 11:00:00"), Some(4.0))
    ).toDF("uid", "qts", "px")
    (c, q)
  }

  private def run(forward: Boolean = false, tol: Option[Long] = None) =
    AsOf.asOfJoin(clicks, quotes, Seq("uid"), "cts", "qts", Seq("px"),
      forward = forward, tolerance = tol)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) null else r.getDouble(3))).toMap

  test("backward: greatest quote ts <= click ts, inclusive boundary") {
    val m = run()
    assert(m(1L) == 1.0)  // 09:30 quote
    assert(m(2L) == null) // 10:03 quote matched — its null px must WIN, not skip
    assert(m(3L) == null) // nothing before 09:00
    assert(m(4L) == 3.0)  // equal-ts quote visible (inclusive)
    assert(m(5L) == null) // key never quoted
  }

  test("forward: least quote ts >= click ts") {
    val m = run(forward = true)
    assert(m(1L) == null) // next quote at 10:03 has null px
    assert(m(2L) == null) // nothing after 10:05 for uid 10
    assert(m(3L) == 1.0)  // first quote at 09:30
    assert(m(4L) == 3.0)  // inclusive on the other side too
    assert(m(5L) == null)
  }

  test("tolerance keeps matches inside the bound") {
    val m = run(tol = Some(3600)) // 1 hour
    assert(m(1L) == 1.0)  // 09:30 → 10:00 = 30 min, inside
    assert(m(4L) == 3.0)  // 0 s gap
  }

  test("tolerance: match farther than the bound nulls out") {
    val m = run(tol = Some(60)) // 1 minute
    assert(m(1L) == null) // 09:30 quote is 30 min stale
    assert(m(2L) == null)
    assert(m(4L) == 3.0)  // exact-boundary match survives
  }

  test("rollingAgg: windowed sum is leakage-free and boundary-inclusive") {
    val m = AsOf.rollingAgg(clicks, quotes.filter(col("px").isNotNull),
        Seq("uid"), "cts", "qts", "px", horizonSeconds = 1800)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(m(1L) == 1.0) // 09:30 is exactly cts−30min: inclusive lower bound
    assert(m(2L) == 0.0) // only the null-px quote in window; filtered out here
    assert(m(3L) == 0.0) // nothing before 09:00 (and 09:30 must NOT leak back)
    assert(m(4L) == 3.0) // equal-ts quote inclusive at the upper bound
    assert(m(5L) == 0.0) // key never quoted ⇒ sum 0
  }

  test("rollingAgg: count/avg shapes and empty-window conventions") {
    val c = AsOf.rollingAgg(clicks, quotes, Seq("uid"), "cts", "qts", "px",
        horizonSeconds = 7200, agg = "count")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // count(value) skips the null-px quote per SQL count(col) semantics
    assert(c == Map(1L -> 1L, 2L -> 1L, 3L -> 0L, 4L -> 1L, 5L -> 0L))
    val a = AsOf.rollingAgg(clicks, quotes, Seq("uid"), "cts", "qts", "px",
        horizonSeconds = 7200, agg = "avg")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    assert(a(1L) == 1.0 && a(3L) == null && a(5L) == null)
  }

  test("null right timestamps and null keys never match") {
    import spark.implicits._
    val l = Seq((1L, Some(10L), ts("2024-01-01 09:00:00")))
      .toDF("id", "uid", "cts")
    val r = Seq(
      (Some(10L), Option.empty[java.sql.Timestamp], 9.0), // null ts
      (Option.empty[Long], Some(ts("2024-01-01 08:00:00")), 8.0) // null key
    ).toDF("uid", "qts", "px")
    val out = AsOf.asOfJoin(l, r, Seq("uid"), "cts", "qts", Seq("px"))
      .collect()
    // neither phantom row may become the match: NULLS-FIRST ordering would
    // otherwise carry the null-ts right into every unmatched left
    assert(out.length == 1 && out.head.isNullAt(3))
  }

  test("payload collision with a left column is loud") {
    val e = intercept[IllegalArgumentException] {
      AsOf.asOfJoin(clicks, quotes.withColumnRenamed("px", "id"),
        Seq("uid"), "cts", "qts", Seq("id"))
    }
    assert(e.getMessage.contains("exist on the left side"))
  }
}
