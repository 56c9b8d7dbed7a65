package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe for the r15 verdict's watch item: `PrefixSum.groupedRunningSum`
  * folds the per-slice offsets back as a CONSTANT MAP LITERAL sized
  * `parts + groups − 1`, and `parts` is `defaultParallelism` — on a
  * 10⁴–10⁵-core cluster that literal grows to that many entries inside
  * the plan. The repo has prior history with literal-expression codegen
  * blowups (DESIGN §8.6 round 5: literal arrays past JIT method limits
  * fell back to the interpreter at 30–60 s per pass), so this measures
  * the packer shape at parts = 32 → 8192 on a fixed 2M-row / 8-shard
  * frame: same data, only the offset-map literal and partition count
  * change. A cliff would warrant a broadcast-join fallback above a size
  * threshold; flat-ish scaling closes the question.
  *
  * Usage: runMain graft.tools.ProfilePrefixSum
  */
object ProfilePrefixSum {
  def main(args: Array[String]): Unit = {
    val rows = 2000000L
    val shards = 8L
    println(f"${"parallelism"}%12s ${"build_s"}%8s ${"exec_s(min of 3)"}%16s  rendezvous")
    for (par <- Seq(32, 1024, 4096, 8192)) {
      val spark = SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", 32)
        .config("spark.default.parallelism", par)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val df = spark.range(rows).select(col("id"),
        (col("id") % shards).as("shard"), lit(3L).as("v"))
      val t0 = System.nanoTime()
      val out = graft.pipeline.PrefixSum.groupedRunningSum(
        df, "shard", "id", "v", "cum")
      val build = (System.nanoTime() - t0) / 1e9 // includes offset collect
      // which rendezvous the fixed code actually chose (the literal map
      // below MapLiteralMax slices, a broadcast hash join above it) —
      // read from the plan, not inferred from the formula
      // label only — counting literal entries from the plan string is
      // unreliable (window attribute names like _w0#245 also match a
      // key-shaped regex), and the join path has no literal at all
      val rendezvous =
        if (out.queryExecution.executedPlan.toString
            .contains("BroadcastHashJoin")) "broadcast-join"
        else "literal-map"
      val execs = (1 to 3).map { _ =>
        val t1 = System.nanoTime()
        out.queryExecution.toRdd.foreach(_ => ())
        (System.nanoTime() - t1) / 1e9
      }
      // exactness at every parallelism: the last row of each shard must
      // carry the full shard sum
      val last = out.filter(col("id") >= rows - shards)
        .select("shard", "cum").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      for (sh <- 0L until shards)
        assert(last(sh) == 3L * (rows / shards),
          s"par=$par shard $sh cum ${last(sh)}")
      println(f"$par%12d $build%8.2f ${execs.min}%16.2f  $rendezvous")
      graft.pipeline.PipelineCaches.clear()
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
