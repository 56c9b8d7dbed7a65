package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway profiler for the dupClusters pipeline (round-5 bench triage).
  * Times each stage of the lineage separately, twice, to separate JIT
  * warm-up from steady state. */
object ProfileCC {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (round <- 1 to 2) {
      time(s"r$round pairs only") {
        graft.pipeline.Dedup.ngramJaccardPairs(docs, 0.5).count()
      }
      time(s"r$round full dupClusters") {
        graft.pipeline.Dedup.dupClusters(docs, 0.5).count()
      }
      graft.pipeline.PipelineCaches.clear()
    }
    spark.stop()
  }
}
