package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) joins: for each left row, the single right row
  * with the greatest right timestamp ≤ the left timestamp (backward, the
  * default; inclusive), or the least right timestamp ≥ it (forward), per
  * join key — the primitive behind feature lookups ("the user's last
  * purchase before this click"), slowly-changing-dimension reads, and
  * leakage-free training-example enrichment.
  *
  * Spark-first plan — the UNION-MERGE form, not a range join:
  * tag both sides, union them, and run ONE window pass per key ordered by
  * time, carrying the last-seen right row forward as a single STRUCT
  * (`last(_, ignoreNulls = true)` over unbounded-preceding..current);
  * left rows then unpack their carried match. The struct carry keeps
  * right rows whose payload FIELDS are null visible (per-column carries
  * would skip them and resurrect an older match). Cost: one shuffle on
  * the key + one per-partition sort over |L|+|R| rows — no per-row
  * subquery, no O(|L|·|R|) range explosion, no driver-side state. (A
  * broadcast range join would need the whole right side per executor; an
  * interval cross-join blows up on dense keys. The merge form is how
  * kdb/Flink do it and scales as a single exchange.)
  *
  * Boundary semantics: at equal timestamps the right row is visible to
  * the left row (inclusive — matches DuckDB/kdb ASOF). Right-side ties on
  * (key, ts) resolve to the row latest in the sort (deterministic given a
  * unique right timestamp per key; pre-deduplicate the right side for
  * strict determinism under ties).
  *
  * The reference engine has no as-of operator; this is part of the
  * training-data-pipeline surface (SURVEY.md §6).
  */
object AsOf {

  /** Backward (default) or forward as-of join.
    *
    * @param left       probe side; every row is preserved (left join)
    * @param right      build side carrying the payload to attach
    * @param keys       equi-join key column names (present on both sides)
    * @param leftTs     left timestamp column name
    * @param rightTs    right timestamp column name
    * @param payload    right columns to attach (must not collide with left)
    * @param forward    false = greatest rightTs ≤ leftTs; true = least
    *                   rightTs ≥ leftTs
    * @param tolerance  optional max |leftTs − rightTs| in seconds; matches
    *                   farther than this resolve to NULL payload
    */
  def asOfJoin(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      forward: Boolean = false,
      tolerance: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "asOfJoin: at least one key column")
    val clash = payload.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty,
      s"asOfJoin: payload column(s) ${clash.mkString(", ")} exist on the left side")

    val ts = "__asof_ts"
    val side = "__asof_side"
    val pack = "__asof_p"
    val lCols = left.columns.toSeq

    // Equi-join + comparison semantics for NULLs: a right row with a NULL
    // timestamp or NULL key can never match (rightTs <= leftTs is NULL,
    // null keys don't equi-join) — drop them up front. Left unpaired: asc
    // ordering is NULLS FIRST, so an unfiltered null-ts right would sort
    // before every row and become the phantom "match" for left rows with
    // no real predecessor.
    val rValid = (col(rightTs).isNotNull +: keys.map(col(_).isNotNull))
      .reduce(_ && _)
    // the carried match, one nullable struct: payload fields + right ts
    // (the ts rides along for the tolerance check)
    val rPacked = right.filter(rValid).select(
      (keys.map(col) :+ col(rightTs).as(ts) :+
        struct(payload.map(col) :+ col(rightTs).as("__rts"): _*).as(pack)): _*)
    val packType = rPacked.schema(pack).dataType

    val l = left
      .withColumn(ts, col(leftTs))
      .withColumn(side, lit(1))
      .withColumn(pack, lit(null).cast(packType))
    // non-key left columns null-padded with their exact types so the
    // union never widens or reorders anything
    val r = rPacked
      .withColumn(side, lit(0))
      .select((lCols.map(c =>
        if (keys.contains(c)) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) :+
        col(ts) :+ col(side) :+ col(pack)): _*)

    // side tag orders right rows BEFORE left rows at equal timestamps →
    // the boundary match is visible (inclusive semantics). forward =
    // backward on reversed time: flip the sort, keep the carry.
    val ord =
      if (forward) Seq(col(ts).desc, col(side).asc)
      else Seq(col(ts).asc, col(side).asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    var out = l.unionByName(r)
      .withColumn(pack, last(col(pack), ignoreNulls = true).over(w))
      .filter(col(side) === 1)
    // cast("timestamp"): tolerate TIMESTAMP_NTZ inputs (raw parquet reads)
    // — under the UTC session timezone the instants are identical, and
    // unix_micros only accepts the LTZ flavor
    val matched = tolerance match {
      case Some(tol) =>
        col(pack).isNotNull &&
          abs(unix_micros(col(ts).cast("timestamp")) -
              unix_micros(col(pack)("__rts").cast("timestamp"))) <=
            lit(tol) * lit(1000000L)
      case None => col(pack).isNotNull
    }
    for (c <- payload)
      out = out.withColumn(c, when(matched, col(pack)(c)))
    out.select(lCols.map(col) ++ payload.map(col): _*)
  }

  /** Leakage-free rolling aggregate: for each left row, aggregate the
    * right rows of the same key whose timestamp lies in
    * `[leftTs − horizon, leftTs]` (inclusive both ends) — "sum of the
    * user's purchases in the hour before this click". The as-of join's
    * sibling: same union-merge shape, but a RANGE window over epoch
    * micros instead of a last() carry, so m matches aggregate instead of
    * the latest one winning. Right rows never see each other's windows
    * (only `valueCol` from the right side enters the aggregate; left rows
    * contribute null) and the left row's own timestamp is the inclusive
    * upper bound — nothing after it leaks in.
    *
    * `agg` ∈ sum | count | min | max | avg. Empty window ⇒ 0 for
    * sum/count, NULL for min/max/avg (Cypher/SQL empty-aggregate
    * convention). One shuffle on the key, one sort — identical cost shape
    * to [[asOfJoin]].
    */
  def rollingAgg(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, valueCol: String,
      horizonSeconds: Long, agg: String = "sum",
      outName: String = "rolling"): DataFrame = {
    require(keys.nonEmpty, "rollingAgg: at least one key column")
    require(!left.columns.contains(outName),
      s"rollingAgg: output column $outName exists on the left side")
    val ts = "__roll_ts"
    val side = "__roll_side"
    val v = "__roll_v"
    val lCols = left.columns.toSeq

    val l = left
      .withColumn(ts, col(leftTs))
      .withColumn(side, lit(1))
      .withColumn(v, lit(null).cast(right.schema(valueCol).dataType))
    // null right timestamps/keys can never fall in any window (same
    // reasoning as asOfJoin's rValid filter)
    val r = right
      .filter((col(rightTs).isNotNull +: keys.map(col(_).isNotNull)).reduce(_ && _))
      .select(
        (keys.map(col) :+ col(rightTs).as(ts) :+ lit(0).as(side) :+
          col(valueCol).as(v)) ++
        lCols.filterNot(keys.contains).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)): _*)

    // cast("timestamp"): same NTZ tolerance as asOfJoin's matched check
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(unix_micros(col(ts).cast("timestamp")))
      .rangeBetween(-horizonSeconds * 1000000L, 0L)
    val aggCol = agg.toLowerCase match {
      case "sum"   => coalesce(sum(col(v)).over(w), lit(0).cast(right.schema(valueCol).dataType))
      case "count" => count(col(v)).over(w)
      case "min"   => min(col(v)).over(w)
      case "max"   => max(col(v)).over(w)
      case "avg"   => avg(col(v)).over(w)
      case other => throw new graft.cypher.GraftException(
        s"rollingAgg: unsupported aggregate '$other' (sum/count/min/max/avg)")
    }
    l.unionByName(r)
      .withColumn(outName, aggCol)
      .filter(col(side) === 1)
      .select((lCols :+ outName).map(col): _*)
  }
}
