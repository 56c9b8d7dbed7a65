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
  private val cleanups = scala.collection.mutable.ArrayBuffer
    .empty[(java.lang.ref.WeakReference[AnyRef], AnyRef => Unit)]

  /** Register an (already persisted) pipeline intermediate for [[clear]];
    * used via `.transform(PipelineCaches.track)` after each persist. */
  private[pipeline] def track(df: DataFrame): DataFrame = synchronized {
    registry.put(df, ())
    df
  }

  /** Register a cleanup against a target object (e.g. a GraphX `Graph` —
    * GraphX caches vertex/edge RDDs internally, and repeated graph jobs in
    * one JVM otherwise accumulate dead blocks until the block manager
    * starts evicting caches that are still live). The target is held
    * WEAKLY: a caller that never invokes [[clear]] (long-lived server,
    * notebook) keeps the pre-existing behavior — once the graph reference
    * is dropped, Spark's ContextCleaner GC-unpersists its RDDs and this
    * entry degrades to a no-op instead of pinning the graph forever. */
  private[graft] def onClear[A <: AnyRef](target: A)(f: A => Unit): Unit =
    synchronized {
      cleanups.filterInPlace(_._1.get != null) // drop GC-collected entries
      cleanups += ((new java.lang.ref.WeakReference[AnyRef](target),
        f.asInstanceOf[AnyRef => Unit]))
    }

  /** Unpersist every pipeline-tracked intermediate. */
  def clear(): Unit = synchronized {
    registry.keys.foreach(df => try df.unpersist() catch { case _: Exception => })
    registry.clear()
    cleanups.foreach { case (ref, f) =>
      Option(ref.get).foreach(t => try f(t) catch { case _: Exception => })
    }
    cleanups.clear()
  }
}
