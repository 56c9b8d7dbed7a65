package graft.server

import java.nio.file.{Files, Paths}
import java.util.concurrent.CountDownLatch

import org.apache.spark.sql.SparkSession

import graft.GraftSession
import graft.fixtures.TpchGraph

/** Deployable server entrypoint — parity with the reference's
  * `server::run` (brahmand/src/server/mod.rs:24-61), which boots from
  * `BRAHMAND_HOST`/`BRAHMAND_PORT`, initializes the graph catalog, starts
  * the 60 s catalog version poll, and serves until shutdown.
  *
  * Environment:
  *  - `GRAFT_HOST`    bind address       (default 0.0.0.0)
  *  - `GRAFT_PORT`    port               (default 8080; 0 = ephemeral)
  *  - `GRAFT_DATA_DIR` parquet table dir (default /root/testdata/sf0.001)
  *  - `GRAFT_CATALOG` catalog JSON path  (optional: loaded if present,
  *                    then polled for version bumps every
  *                    `GRAFT_CATALOG_POLL_MS`, default 60000 — the
  *                    reference's graph_catalog.rs:178-219 poll)
  *  - `GRAFT_MASTER`  Spark master       (default: spark-submit's
  *                    `spark.master` if set, else local[*])
  *  - `GRAFT_SHUFFLE_PARTITIONS`         (default 32)
  */
object Main {

  /** Boot from an env lookup (injectable for specs): builds the
    * [[GraftSession]] over the data dir, wires the catalog + poll, starts
    * the HTTP server and logs the RESOLVED host/port/data dir. Returns
    * the server, session, and bound port. */
  def boot(env: String => Option[String], spark: SparkSession)
      : (QueryServer, GraftSession, Int) = {
    val host = env("GRAFT_HOST").getOrElse("0.0.0.0")
    val port = env("GRAFT_PORT").map(_.toInt).getOrElse(8080)
    val dataDir = env("GRAFT_DATA_DIR").getOrElse("/root/testdata/sf0.001")

    val gs = TpchGraph.session(spark, dataDir)
    env("GRAFT_CATALOG").foreach { p =>
      if (Files.exists(Paths.get(p))) gs.loadCatalog(p) else gs.saveCatalog(p)
      val poll = env("GRAFT_CATALOG_POLL_MS").map(_.toLong).getOrElse(60000L)
      gs.startCatalogRefresh(p, poll)
    }

    val srv = new QueryServer(gs, port, host)
    val bound = srv.start()
    println(s"graft server listening on $host:$bound (data=$dataDir)")
    (srv, gs, bound)
  }

  def main(args: Array[String]): Unit = {
    val master = sys.env.getOrElse("GRAFT_MASTER",
      sys.props.getOrElse("spark.master", "local[*]"))
    val spark = SparkSession.builder()
      .appName("graft-server")
      .master(master)
      .config(graft.SparkTuning.kryoConf())
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("GRAFT_SHUFFLE_PARTITIONS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val (srv, gs, _) = boot(sys.env.get, spark)

    val done = new CountDownLatch(1)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      srv.stop()
      gs.stopCatalogRefresh()
      spark.stop()
      done.countDown()
    }, "graft-shutdown"))
    done.await()
  }
}
