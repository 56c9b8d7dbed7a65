package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, Multimodal}

/** Rehearsal for the `p_mm_dedup_jpeg` gate entry: how much dHash drift
  * does the JDK's lossy JPEG round trip add to the 27×16 gradient
  * fixture, and where does that put the pair-mining `maxDist` boundary?
  *
  * Prints, for a given id count:
  *   - the distance distribution DECODED vs the lossless arithmetic
  *     formula (per-image codec drift);
  *   - the WITHIN-GROUP (id/4) pairwise distance distribution — the
  *     near-dup structure the miner must recover;
  *   - pair counts at maxDist 1..5 vs the lossless (PNG-path) counts at
  *     the gate's maxDist 2 — the over/under-mining trade the entry's
  *     maxDist choice adjudicates (recorded in DESIGN.md).
  *
  * Usage: runMain graft.tools.ProfileJpegDedup [nIds]
  */
object ProfileJpegDedup {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 5000L
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = spark.range(n).select(col("id").as("doc_id"))
    val jpegHashes = Multimodal.imageDHash(spark,
        Multimodal.synthesizeJpegMedia(spark, docs))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // lossless reference: the arithmetic formula (== the PNG/GIF/BMP path)
    def formulaHash(id: Long): Long = Multimodal.dhashOf(27, 16,
      (x, y) => ((17 * (id / 4) + 7 * x + 13 * y + id % 4) % 256).toInt)
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

    val drift = jpegHashes.toSeq.map { case (id, h) => ham(h, formulaHash(id)) }
    def histo(xs: Seq[Int]): String =
      xs.groupBy(identity).toSeq.sortBy(_._1)
        .map { case (d, g) => s"$d:${g.size}" }.mkString(" ")
    println(s"[jpeg] codec drift vs formula (dist:count): ${histo(drift)}")

    // within-group pairwise distances (the pairs a near-dup mine wants)
    val within = jpegHashes.toSeq.groupBy(_._1 / 4).values.toSeq
      .flatMap { g =>
        for (Seq((_, ha), (_, hb)) <- g.sortBy(_._1).combinations(2).toSeq)
          yield ham(ha, hb)
      }
    println(s"[jpeg] within-group pair dists: ${histo(within)}")

    // miner output at candidate radii, vs the lossless PNG-path truth
    val jpegHashDf = jpegHashes.toSeq.toDF("doc_id", "dhash")
    for (d <- 1 to 5) {
      // maxDist > 3 exceeds the 4-chunk block guarantee: no mining job,
      // only the brute-force reference for those radii
      val mined =
        if (d <= 3)
          Dedup.imageHashPairs(jpegHashDf, maxDist = d).count().toString
        else "n/a(block>3)"
      val brute = jpegHashes.toSeq.combinations(2)
        .count { case Seq((_, ha), (_, hb)) => ham(ha, hb) <= d }
      println(s"[jpeg] maxDist=$d  minedPairs=$mined  brutePairs=$brute")
    }
    val lossless = (0L until n).filter(_ % 17 != 0)
      .map(id => id -> formulaHash(id))
    val losslessPairs = lossless.combinations(2)
      .count { case Seq((_, ha), (_, hb)) => ham(ha, hb) <= 2 }
    println(s"[png-truth] maxDist=2 pairs (the lossless gate): $losslessPairs")
    spark.stop()
  }
}
