package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Training-data pipeline operators surfaced as driver-checkable queries
  * (dedup / similarity / text analysis / multimodal / streaming-batch).
  * Filled in module by module; see graft.pipeline.* */
object PipelineEntries {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map.empty
  def oracleSql: Map[String, String] = Map.empty
}
