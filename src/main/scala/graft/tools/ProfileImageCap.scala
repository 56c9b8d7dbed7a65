package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, Multimodal}

/** Demonstrates [[Dedup.imageHashPairs]]' `maxBucketSize` cap ENGAGING,
  * with logged drops and a measured recall bill — the no-silent-caps
  * rehearsal the r16 verdict asked for (#4). The fixture is the
  * adversarially dense case the cap exists for: the 27×16 gradient
  * admits only ~256 dHash classes, so at sf1-density id counts every
  * (chunk, cv) block holds hundreds-to-thousands of images and the
  * uncapped self-join is Σ B² — quadratic in class density.
  *
  * Ground truth WITHOUT the quadratic join: pair truth factors through
  * hash CLASSES — collect the ~256 (hash, count) rows, compare all
  * class pairs driver-side (256² Hamming distances), and count
  * `Σ cntA·cntB [dist ≤ d] + Σ C(cnt,2) [within-class]` — exact, cheap,
  * and independent of the miner under test.
  *
  * Prints per cap: dropped blocks (the [[Dedup.imageHashBucketDrops]]
  * frame — returned, not silent), dropped memberships, the analytic
  * join size Σ B² the cap admitted, mined pairs, recall vs truth, and
  * wall seconds. Usage: runMain graft.tools.ProfileImageCap [nIds]
  */
object ProfileImageCap {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 50000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val hashes = Multimodal.imageDHash(spark,
        Multimodal.synthesizeBmpMedia(spark,
          spark.range(n).select(col("id").as("doc_id"))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nImg = hashes.count()

    // exact truth through class arithmetic (independent of the miner)
    val classes = hashes.groupBy("dhash").count().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val maxDist = 2
    var truth = 0L
    for (i <- classes.indices) {
      val (ha, ca) = classes(i)
      truth += ca * (ca - 1) / 2 // within-class (dist 0)
      for (j <- i + 1 until classes.length) {
        val (hb, cb) = classes(j)
        if (ham(ha, hb) <= maxDist) truth += ca * cb
      }
    }
    println(s"$nImg images, ${classes.length} hash classes, " +
      s"true pairs(dist<=$maxDist) = $truth")

    def time[A](f: => A): (A, Double) = {
      val t = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t) / 1e9)
    }
    println(f"${"cap"}%10s ${"dropBlocks"}%10s ${"dropMembers"}%12s " +
      f"${"joinRows"}%14s ${"pairs"}%10s ${"recall"}%8s ${"sec"}%7s")
    for (cap <- Seq(Int.MaxValue, 10000, 2000, 500)) {
      val drops = Dedup.imageHashBucketDrops(hashes, maxBucketSize = cap)
        .collect().map(r => r.getLong(2))
      // analytic candidate-join size the cap admits: Σ B² over kept
      // blocks — the SAME bucket definition the miner uses
      val joinRows = Dedup.hashChunkCounts(hashes)
        .filter(col("count") > 1 && col("count") <= cap)
        .agg(coalesce(sum(col("count") * col("count")), lit(0L)))
        .head().getLong(0)
      val (pairs, sec) = time(
        Dedup.imageHashPairs(hashes, maxDist = maxDist,
          maxBucketSize = cap).count())
      val capLabel = if (cap == Int.MaxValue) "UNCAPPED" else cap.toString
      println(f"$capLabel%10s ${drops.length}%10d ${drops.sum}%12d " +
        f"$joinRows%14d $pairs%10d ${pairs.toDouble / truth}%8.4f $sec%7.1f")
    }
    spark.stop()
  }
}
