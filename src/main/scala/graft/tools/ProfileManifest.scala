package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale rehearsal for [[graft.pipeline.Corpus.updateManifest]] — the
  * incremental-maintenance claim measured the way [[ProfileIngest]]
  * measures the dedup admission path: the corpus grows `factor`×
  * ([[ScaleUp.scaledDocuments]]), its manifest is built and PERSISTED
  * once per factor (setup — the only step that scans the corpus), and
  * then a FIXED 1,000-doc delta folds in against the persisted artifact,
  * timed. The claim under test: delta-fold latency is FLAT while the
  * corpus grows 10×, because the fold reads the |shards|-row artifact
  * plus the delta and never the corpus. Each fold's output is verified
  * equal to the from-scratch manifest of the merged corpus (the
  * bit-identity `p_manifest_delta` pins at the gate).
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.ProfileManifest
  *        (SPARK_GRAFT_PROBE_ROUNDS=N, default 3)
  */
object ProfileManifest {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rounds = sys.env.getOrElse("SPARK_GRAFT_PROBE_ROUNDS", "3").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft_manifest").toString
    // fixed delta: 1,000 novel docs with ids above every scaled corpus id
    val delta = spark.range(1000L)
      .select((col("id") + lit(100L * ScaleUp.Stride)).as("doc_id"),
        concat(lit("novel delta doc number "), col("id").cast("string"),
          lit(" with a few more filler tokens")).as("text"))
      .cache()
    delta.count()
    for (factor <- Seq(1, 2, 5, 10)) {
      val corpus = ScaleUp.scaledDocuments(base, factor)
      val mPath = s"$tmp/manifest_f$factor"
      val t0 = System.nanoTime()
      graft.pipeline.Corpus.shardManifest(corpus)
        .write.mode(SaveMode.Overwrite).parquet(mPath)
      val setup = (System.nanoTime() - t0) / 1e9
      val folds = (1 to rounds).map { _ =>
        val t1 = System.nanoTime()
        val updated = graft.pipeline.Corpus.updateManifest(
          spark.read.parquet(mPath), delta)
        val rows = updated.collect()
        ((System.nanoTime() - t1) / 1e9, rows)
      }
      // exactness at every factor: incremental == from-scratch merged
      val fresh = graft.pipeline.Corpus
        .shardManifest(corpus.unionAll(delta)).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1).toSeq
      val inc = folds.head._2
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1).toSeq
      require(inc == fresh, s"factor $factor: incremental != from-scratch")
      println(f"[manifest] factor $factor%2d (${corpus.count()}%8d docs): " +
        f"setup ${setup}%6.2f s, delta fold " +
        folds.map(f => f"${f._1}%.2f").mkString("[", ", ", "]") +
        " s (verified == from-scratch)")
      graft.pipeline.PipelineCaches.clear(blocking = true)
    }
    spark.stop()
  }
}
