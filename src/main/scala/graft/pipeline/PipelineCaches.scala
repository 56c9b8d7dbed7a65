package graft.pipeline

import org.apache.spark.sql.SparkSession

/** Cache lifecycle for the pipeline operators.
  *
  * [[Dedup.minhashPairs]], [[Dedup.ngramJaccardPairs]],
  * [[Dedup.simhashPairs]], [[Similarity.lshTopK]], [[Similarity.ivfTopK]]
  * and [[Similarity.cosinePairs]] persist intermediate signature/vector
  * tables because several consumers in the same job read them (re-deriving
  * the tokenize→shingle→hash lineage per consumer costs more than the
  * cache). Spark offers no "unpersist when the consuming query finishes"
  * hook for a lazily-executed result, so the blocks stay cached for the
  * session — exactly like GraphX's persisted graphs. One-shot jobs
  * (Verify, Bench) never notice; a long-running session (e.g. a
  * QueryServer embedding these operators) should clear between jobs.
  */
object PipelineCaches {

  /** Unpersist every cached table/DataFrame block in the session. */
  def clear(spark: SparkSession): Unit = spark.sqlContext.clearCache()
}
