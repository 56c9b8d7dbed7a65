package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the formatted physical plan (and an exchange/scan census) for
  * named [[graft.SparkEntry.queries]] entries — the plan-inspection loop
  * SURVEY.md §7 calls for ("explain, then iterate until it's the plan
  * you'd want"), runnable against any sf dir:
  *
  * {{{ sbt "runMain graft.tools.Explain /root/testdata/sf0.01 p_dedup_ngram" }}}
  */
object Explain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Explain <sfDir> <queryName>...")
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- args.tail) {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.executedPlan
      println(s"==== $name ====")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      val census = plan.collectWithSubqueries { case p => p.nodeName }
        .groupBy(identity).view.mapValues(_.size).toSeq.sortBy(-_._2)
      println(s"---- node census: " + census.map { case (n, c) => s"$n=$c" }
        .mkString(", "))
    }
    spark.stop()
  }
}
