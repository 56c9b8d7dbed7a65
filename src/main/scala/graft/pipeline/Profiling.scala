package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dataset profiling: per-column null/distinct/min/max statistics in ONE
  * scan — the input-validation step a training pipeline runs before
  * committing a 100 TB read to the expensive stages. */
object Profiling {

  /** Per-column profile of `cols` (default: every top-level column):
    * (col_name, n_rows, n_nulls, n_distinct, min_num, max_num, min_str,
    * max_str). Numeric/boolean columns surface min/max as DOUBLE,
    * string columns as binary-collation strings; other types (arrays,
    * structs, binary) profile nulls/distinct only. Distinct counts are
    * EXACT (COUNT(DISTINCT col) semantics — nulls excluded).
    *
    * Scale shape: one aggregate over one scan. The n-ary distinct
    * aggregates compile to Catalyst's Expand + two-phase aggregate — a
    * single shuffle whose width is #cols, with every non-distinct stat
    * map-side combined; no per-column re-scan, no driver-side loop over
    * data (the final pivot to rows runs on the ONE aggregated row). */
  def profileTable(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val names = if (cols.nonEmpty) cols else df.schema.fieldNames.toSeq
    require(names.nonEmpty, "profileTable: no columns to profile")
    val fields = names.map(n => df.schema(n))

    def aggsFor(f: StructField): Seq[Column] = {
      val c = col(f.name)
      val isNum = f.dataType match {
        case _: NumericType | BooleanType => true
        case _ => false
      }
      val isStr = f.dataType == StringType
      Seq(
        sum(c.isNull.cast("long")).as(s"__nulls_${f.name}"),
        count_distinct(c).as(s"__dist_${f.name}"),
        (if (isNum) min(c.cast("double")) else lit(null).cast("double"))
          .as(s"__minn_${f.name}"),
        (if (isNum) max(c.cast("double")) else lit(null).cast("double"))
          .as(s"__maxn_${f.name}"),
        (if (isStr) min(c) else lit(null).cast("string"))
          .as(s"__mins_${f.name}"),
        (if (isStr) max(c) else lit(null).cast("string"))
          .as(s"__maxs_${f.name}"))
    }

    val allAggs = count(lit(1)).as("__rows") +:
      fields.flatMap(aggsFor)
    val one = df.agg(allAggs.head, allAggs.tail: _*)
    // pivot the single aggregated row to one output row per column; a
    // stack() over already-aggregated scalars, not a second pass
    val stackArgs = fields.map { f =>
      s"'${f.name}', __rows, `__nulls_${f.name}`, `__dist_${f.name}`, " +
        s"`__minn_${f.name}`, `__maxn_${f.name}`, `__mins_${f.name}`, " +
        s"`__maxs_${f.name}`"
    }.mkString(", ")
    one.select(expr(
      s"stack(${fields.size}, $stackArgs) AS " +
        "(col_name, n_rows, n_nulls, n_distinct, min_num, max_num, " +
        "min_str, max_str)"))
  }
}
