package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Typed extraction of semi-structured metadata columns (JSON sidecars,
  * crawler headers, event properties) — the first step of most
  * training-data pipelines, where raw records carry a free-form `props`
  * blob that downstream filters need as typed columns.
  *
  * Scale notes (100 TB): `from_json` with an explicit DDL schema is a
  * narrow, codegen'd projection (Jackson parse per row, no shuffle, no
  * schema-inference pre-pass — inference would be a full extra scan).
  * Unparseable rows yield NULL structs rather than failing the job, so a
  * corrupt shard cannot kill a pipeline; count them via `_corrupt`
  * bookkeeping below if loss accounting matters.
  */
object Metadata {

  /** Parse `jsonCol` against an explicit DDL schema (e.g. `"k INT, tag
    * STRING"`), flattening every top-level field into its own column.
    * Rows that fail to parse keep NULLs in the extracted columns.
    *
    * The parse is staged behind a GENERATE barrier: with a plain
    * projection, predicate pushdown substitutes the deterministic
    * `from_json` alias into a downstream filter as it sinks, so
    * `parseJson(df, ...).filter($"k" >= 50)` ran the Jackson parse TWICE
    * per row (pushed filter + projection); a non-deterministic fence
    * column doesn't survive either (ColumnPruning erases it, then the
    * substitution proceeds). Conditions on GENERATED attributes, however,
    * are never pushed below their Generate, so the parse is emitted
    * through `explode_outer(array(from_json(...)))` — exactly one row per
    * input row, exactly one parse per row, still narrow and codegen'd.
    * OUTER generate so no `size(...) > 0` filter is inferred
    * ([[Explodes]]). PlanSpec pins exactly one JsonToStructs per
    * p_json* plan. */
  def parseJson(df: DataFrame, jsonCol: String, schemaDDL: String): DataFrame = {
    val schema = StructType.fromDDL(schemaDDL)
    val gen = df.select(col("*"),
      explode_outer(array(from_json(col(jsonCol), schema))).as("_parsed"))
    schema.fieldNames.foldLeft(gen) { (d, f) =>
      d.withColumn(f, col("_parsed").getField(f))
    }.drop("_parsed")
  }

  /** Single-path extraction without a full schema (JsonPath-style), for
    * exploratory pulls where only one field matters. */
  def extractPath(df: DataFrame, jsonCol: String, path: String, as: String): DataFrame =
    df.withColumn(as, get_json_object(col(jsonCol), path))

  /** Decile-style profile of a numeric JSON field: bucket the extracted
    * value and aggregate a payload column per bucket. One map-side
    * combinable aggregation — the shuffle carries `#buckets` rows per
    * partition, nothing proportional to input size. */
  def profileIntField(df: DataFrame, jsonCol: String, field: String,
      bucketWidth: Int, payload: Column): DataFrame =
    parseJson(df, jsonCol, s"$field INT")
      .filter(col(field).isNotNull)
      // floor, not cast-truncation: negative values must land in the
      // bucket BELOW zero (mirrors the oracle's floor(k/width))
      .groupBy(floor(col(field) / bucketWidth).cast("int").as("bucket"))
      .agg(count(lit(1)).as("cnt"),
           round(avg(payload), 6).as("avg_payload"))
}
