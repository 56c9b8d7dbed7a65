package graft.pipeline

import org.apache.spark.sql.DataFrame

/** Cache lifecycle for the pipeline operators.
  *
  * [[Dedup.minhashPairs]], [[Dedup.ngramJaccardPairs]],
  * [[Dedup.simhashPairs]], [[Similarity.lshTopK]], [[Similarity.ivfTopK]]
  * and [[Similarity.cosinePairs]] persist intermediate signature/vector
  * tables because several consumers in the same job read them (re-deriving
  * the tokenize→shingle→hash lineage per consumer costs more than the
  * cache). Spark offers no "unpersist when the consuming query finishes"
  * hook for a lazily-executed result, so the blocks stay cached until
  * [[clear]] — exactly like GraphX's persisted graphs. One-shot jobs
  * (Verify, Bench) never notice; a long-running session (e.g. a
  * QueryServer embedding these operators) should clear between jobs.
  *
  * Only pipeline-created frames are tracked (weakly — a collected frame
  * needs no cleanup): clearing does NOT touch other caches in the session,
  * such as GraftSession's memoized adjacency indexes.
  */
object PipelineCaches {

  private val registry =
    scala.collection.mutable.WeakHashMap.empty[DataFrame, Unit]
  private val cleanups =
    scala.collection.mutable.ArrayBuffer.empty[() => Unit]

  /** Register an (already persisted) pipeline intermediate for [[clear]];
    * used via `.transform(PipelineCaches.track)` after each persist. */
  private[pipeline] def track(df: DataFrame): DataFrame = synchronized {
    registry.put(df, ())
    df
  }

  /** Register an arbitrary cleanup (e.g. a GraphX `Graph.unpersist` —
    * GraphX caches vertex/edge RDDs internally, and repeated graph jobs in
    * one JVM otherwise accumulate dead blocks until the block manager
    * starts evicting caches that are still live). Runs once at [[clear]]. */
  private[graft] def onClear(f: () => Unit): Unit = synchronized {
    cleanups += f
  }

  /** Unpersist every pipeline-tracked intermediate. */
  def clear(): Unit = synchronized {
    registry.keys.foreach(df => try df.unpersist() catch { case _: Exception => })
    registry.clear()
    cleanups.foreach(f => try f() catch { case _: Exception => })
    cleanups.clear()
  }
}
