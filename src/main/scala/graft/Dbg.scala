package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Dbg {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-16s ${(System.nanoTime()-t0)/1e9}%8.2fs rows=$n")
    }
    println("docs=" + docs.count())
    // stagewise minhash
    val prep = docs.select(col("doc_id").as("id"), pipeline.Dedup.shingles(col("text")).as("sh"))
    time("shingles")(prep.count())
    val exploded = prep.select(col("id"), explode(col("sh")).as("s")).select(col("id"), xxhash64(col("s")).as("h"))
    time("exploded")(exploded.count())
    val sigCols = (0 until 120).map(k => min(xxhash64(col("h"), lit(k))).as(s"m$k"))
    val sig = exploded.groupBy("id").agg(sigCols.head, sigCols.tail: _*)
    time("sig")(sig.count())
    time("minhash_full")(pipeline.Dedup.minhashPairs(docs).count())
    time("simhash")(pipeline.Dedup.simhashPairs(docs).count())
    time("ngram")(pipeline.Dedup.ngramJaccardPairs(docs).count())
    spark.stop()
  }
}
