package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence-example generation: turning per-entity event streams into
  * supervised training rows (next-event prediction), the event-log
  * counterpart of the document chunking/packing ops in [[Corpus]]. */
object Sequences {

  /** One training example per event position with ≥ `k` predecessors in
    * its user's time-ordered stream: the `k` preceding event types joined
    * as a comma-separated context plus the current type as label.
    * Ordering ties on the timestamp break by `idCol`, so the emitted
    * examples are deterministic (and SQL-mirrorable) even when events
    * share a timestamp. Returns (user, pos, context, label) where pos is
    * the 1-based position in the user's stream.
    *
    * Scale shape: ONE hash shuffle on the user key + an in-partition sort
    * feeds every window function (all share the same WINDOW spec), then a
    * narrow filter/projection — no second exchange, no self-join; the
    * standard sessionize-class shape that parallelizes per user at any
    * corpus size. */
  def sequenceExamples(events: DataFrame, k: Int = 3,
      userCol: String = "user_id", tsCol: String = "ts",
      eventCol: String = "event_type", idCol: String = "event_id")
      : DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    // concat_ws silently SKIPS nulls, which would shorten a context
    // instead of marking the gap — surface null event types explicitly
    val lags = (k to 1 by -1).map(i =>
      coalesce(lag(col(eventCol), i).over(w), lit("<null>")))
    events
      .select(col(userCol).as("user"),
        row_number().over(w).cast("long").as("pos"),
        concat_ws(",", lags: _*).as("context"),
        coalesce(col(eventCol), lit("<null>")).as("label"))
      // a full context exists iff the event has k predecessors — gate on
      // the position, not on lag nullability (a NULL event TYPE is data,
      // not a missing predecessor)
      .filter(col("pos") > k)
  }
}
