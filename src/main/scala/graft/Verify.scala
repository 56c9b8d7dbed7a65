package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    // optional 3rd+ args: restrict to these query names (local iteration;
    // the driver always calls with exactly two args → full run)
    val only: Set[String] = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config(SparkTuning.kryoConf())
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.graphx.pregel.checkpointInterval", "10")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      } finally {
        // like Bench: two queries persisting an identical-plan frame
        // (e.g. the banded NATION_ADJ edge set) otherwise hit the
        // CacheManager's "already cached" path, and 120+ queries' caches
        // would accumulate across the run
        graft.pipeline.PipelineCaches.clear(blocking = true)
      }
    }
    // full JSON escaping matters here: a tab or CR in builder-authored SQL
    // would make the driver's json.load fail and silently zero the round's
    // correctness
    def q(s: String): String = graft.util.JsonUtil.quote(s)
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.isEmpty || only(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
