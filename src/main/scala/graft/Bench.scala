package graft

import org.apache.spark.sql.SparkSession

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm-up outside the timed loop: JVM/JIT + codegen + parquet footer
    // reads otherwise land entirely on whichever query happens to run first
    // (profiled: the first dedup-shaped query pays ~2-3x its steady-state
    // cost). Tiny limit() slices exercise the same generated operators —
    // wide aggregates, HOF lambdas, xxhash, window top-k — without doing
    // meaningful work.
    spark.range(1000000L).selectExpr("sum(id)").collect()
    try SparkEntry.entry(spark).collect() catch { case _: Throwable => }
    val warmFrames = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.DataFrame]
    try {
      val d = spark.read.parquet(s"$sfDir/documents.parquet").limit(64).cache()
      warmFrames += d
      graft.pipeline.Dedup.minhashPairs(d).count()
      graft.pipeline.Dedup.simhashPairs(d).count()
      graft.pipeline.Dedup.ngramJaccardPairs(d).count()
      graft.pipeline.TextAnalysis.qualityFeatures(d).count()
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(64).cache()
      warmFrames += e
      graft.pipeline.Similarity.bruteForceTopK(e, e.limit(4)).count()
      graft.pipeline.Similarity.cosinePairs(e).count()
    } catch { case _: Throwable => } finally {
      // drop every warm-up cache (incl. the pipeline ops' internal
      // signature tables) so the timed loop starts from clean storage
      warmFrames.foreach(df => try df.unpersist() catch { case _: Throwable => })
      graft.pipeline.PipelineCaches.clear()
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
