package graft.tools

import org.apache.spark.sql.SparkSession

/** Driver-contract smoke: `SparkEntry.entry` must return >0 rows on the
  * sf0.001 fixture (the driver's flagship check). `Bench` exercises
  * entry() only inside a swallow-all warmup, so a broken flagship would
  * otherwise surface for the first time in the driver's own run. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"ENTRY ROWS: $n")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
