package graft.tools

import org.apache.spark.sql.SparkSession

/** Verifies the "self-heals at scale" claim recorded at
  * [[graft.pipeline.Dedup.ngramJaccardPairs]]'s prefix chain: past
  * broadcast size, BOTH sides of the PPJoin prefix self-join plan
  * identical Exchange(p) subtrees, and the claim is that AQE's runtime
  * stage cache executes that map stage ONCE. This runs the miner with
  * `spark.sql.autoBroadcastJoinThreshold=-1` (forcing the past-broadcast
  * regime at any data size), executes it, and prints the FINAL adaptive
  * plan plus a ShuffleQueryStage census: a stage id appearing at N > 1
  * plan positions is the runtime reuse the claim predicts; every
  * distinct id maps to one executed exchange.
  *
  * {{{ sbt "runMain graft.tools.ProfileNgramSelfHeal /root/testdata/sf0.1" }}}
  */
object ProfileNgramSelfHeal {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val pairs = graft.pipeline.Dedup.ngramJaccardPairs(docs, threshold = 0.5)
    val t0 = System.nanoTime()
    pairs.queryExecution.toRdd.foreach(_ => ())
    val sec = (System.nanoTime() - t0) / 1e9
    val finalPlan = pairs.queryExecution.executedPlan.toString
    println(finalPlan)
    val stageIds = "ShuffleQueryStage (\\d+)".r
      .findAllMatchIn(finalPlan).map(_.group(1)).toSeq
    val census = stageIds.groupBy(identity).view.mapValues(_.size).toSeq
      .sortBy(_._1.toInt)
    println(s"== ShuffleQueryStage census (id -> plan positions): " +
      census.map { case (id, n) => s"$id->$n" }.mkString(", "))
    println(s"== distinct stages executed: ${census.size}; " +
      s"plan positions: ${stageIds.size}; " +
      s"reused: ${census.count(_._2 > 1)}")
    println(f"== wall: $sec%.2f s  rows: (executed via toRdd.foreach)")
    graft.pipeline.PipelineCaches.clear()
    spark.stop()
  }
}
