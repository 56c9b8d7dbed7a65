package graft

/** Regenerates the bench positional-output legend.
  *
  * `graft.Bench` prints its final stdout line with per-query values as
  * positional arrays in ascending query-name order whenever the
  * name-keyed form would overflow the driver's ~2000-byte stdout tail
  * window (observed on BENCH_r07/r08: the 100-entry name-keyed map is
  * ~2100 bytes and lost its head). The name order is committed as
  * `tools/bench_query_order.json`; this main regenerates it after adding
  * or removing a gate query, and `BenchLegendSpec` fails the build when
  * the committed file drifts from `SparkEntry.queries`.
  */
object BenchLegend {
  def namesJson: String =
    SparkEntry.queries.keys.toSeq.sorted
      .map(graft.util.JsonUtil.quote)
      .mkString("[\n  ", ",\n  ", "\n]\n")

  def main(args: Array[String]): Unit = {
    val out = java.nio.file.Paths.get(
      args.headOption.getOrElse("tools/bench_query_order.json"))
    java.nio.file.Files.write(out, namesJson.getBytes("UTF-8"))
    println(s"wrote ${SparkEntry.queries.size} names to $out")
  }
}
