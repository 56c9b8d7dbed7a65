package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.Bpe

/** Rehearsal for the BPE trainer at PRODUCTION vocabulary sizes (the
  * r15 verdict's ask #2): the driver merge loop on the real sf-dir word
  * histogram, naive per-iteration rescan vs the incremental pair-count
  * trainer, at gate scale (50) through production scale (32k merges).
  * The histogram pull (the distributed part) is setup, timed once; the
  * loop wall-clock is what a 32k-merge vocabulary actually costs the
  * driver. The incremental sequence is asserted equal to the naive one
  * at every size the naive loop is cheap enough to run.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.ProfileBpeTrain
  */
object ProfileBpeTrain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val t0 = System.nanoTime()
    val hist: Array[(Array[String], Long)] =
      Bpe.wordCounts(docs).orderBy(col("cnt").desc, col("word").asc)
        .limit(30000).collect()
        .map(r => (Bpe.symbolize(r.getString(0)), r.getLong(1)))
    println(f"histogram pull: ${hist.length} words, " +
      f"${(System.nanoTime() - t0) / 1e9}%.2f s (distributed setup)")
    def time[A](f: => A): (A, Double) = {
      val t = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t) / 1e9)
    }
    // fresh symbol arrays per run: the incremental trainer rebinds
    // word entries as it merges
    def h() = hist.map { case (s, c) => (s.clone(), c) }
    def table(hist0: Array[(Array[String], Long)], naiveUpTo: Int): Unit = {
      def h() = hist0.map { case (s, c) => (s.clone(), c) }
      println(f"${"numMerges"}%10s ${"naive_s"}%10s ${"incremental_s"}%14s")
      for (n <- Seq(50, 1000, 8000, 32000)) {
        val (inc, ti) = time(Bpe.trainOnHistogram(h(), n, 2))
        val naive =
          if (n <= naiveUpTo) {
            val (nv, tn) = time(Bpe.trainOnHistogramNaive(h(), n, 2))
            assert(nv == inc, s"sequence diverged at numMerges=$n")
            f"$tn%.2f"
          } else "-"
        println(f"$n%10d $naive%10s $ti%14.2f  (${inc.size} merges learned)")
      }
    }
    println("-- real sf-dir histogram (synthetic word-soup corpus: tiny " +
      "vocabulary, saturates early) --")
    table(h(), naiveUpTo = 1000)
    // The fixture corpus has a ~31-word vocabulary, so production merge
    // counts saturate instantly on it. A production histogram is what
    // the trainer state actually sees: ~30k distinct words, Zipf counts,
    // mixed lengths. Deterministic LCG letters — this measures the LOOP,
    // which never touches the corpus, only the histogram.
    val rnd = new java.util.Random(42L)
    val zipf: Array[(Array[String], Long)] = (1 to 30000).map { rank =>
      val len = 3 + rnd.nextInt(10)
      val w = (0 until len).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      (Bpe.symbolize(w), math.max(1L, 10000000L / rank))
    }.toArray
    println("-- synthetic Zipf histogram: 30k distinct words, len 3-12 --")
    table(zipf, naiveUpTo = 1000)
    spark.stop()
  }
}
