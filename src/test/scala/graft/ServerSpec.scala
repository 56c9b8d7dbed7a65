package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.scalatest.funsuite.AnyFunSuite

import graft.server.QueryServer

class ServerSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val gs: GraftSession = {
    import spark.implicits._
    val g = new GraftSession(spark)
    g.registerTable("users", Seq((1L, "u1"), (2L, "u2")).toDF("id", "name"))
    g.registerNode("User", "users", "id")
    g
  }

  private def post(port: Int, body: String): (Int, String) = {
    val client = HttpClient.newHttpClient()
    val req = HttpRequest.newBuilder(URI.create(s"http://localhost:$port/query"))
      .POST(HttpRequest.BodyPublishers.ofString(body)).build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  test("POST /query returns JSONEachRow, CSV, Pretty; errors are 400") {
    val srv = new QueryServer(gs)
    val port = srv.start()
    try {
      val (c1, b1) = post(port,
        """{"query": "MATCH (u:User) RETURN u.id AS id, u.name AS name ORDER BY id;"}""")
      assert(c1 == 200 && b1 == "{\"id\":1,\"name\":\"u1\"}\n{\"id\":2,\"name\":\"u2\"}\n")

      val (c2, b2) = post(port,
        """{"query": "MATCH (u:User) RETURN u.id AS id ORDER BY id;", "format": "CSVWithNames"}""")
      assert(c2 == 200 && b2 == "id\n1\n2\n")

      val (c3, b3) = post(port,
        """{"query": "MATCH (u:User) RETURN u.id AS id LIMIT 1;", "format": "Pretty"}""")
      assert(c3 == 200 && b3.contains("| id"))

      val (c4, _) = post(port, """{"query": "MATCH (x:Nope) RETURN x.id AS i;"}""")
      assert(c4 == 400)

      val (c5, b5) = post(port, """{"query": "MATCH (u:User) DELETE u;"}""")
      assert(c5 == 400 && b5.contains("not supported"))

      // PrettyCompact is a DISTINCT format: no outer frame
      val (c6, b6) = post(port,
        """{"query": "MATCH (u:User) RETURN u.id AS id LIMIT 1;", "format": "PrettyCompact"}""")
      assert(c6 == 200 && b6.contains("id") && !b6.contains("| id"))

      // round-5 surface reaches the HTTP layer: string predicates
      val (c7, b7) = post(port,
        """{"query": "MATCH (u:User) WHERE u.name ENDS WITH '2' RETURN u.id AS id;"}""")
      assert(c7 == 200 && b7 == "{\"id\":2}\n")

      // round-6 surface: UNION and EXPLAIN round-trip over HTTP
      val (c8, b8) = post(port,
        """{"query": "MATCH (u:User {id: 1}) RETURN u.id AS id UNION MATCH (u:User {id: 2}) RETURN u.id AS id;"}""")
      assert(c8 == 200 && b8.linesIterator.toSet ==
        Set("""{"id":1}""", """{"id":2}"""))
      val (c9, b9) = post(port,
        """{"query": "EXPLAIN MATCH (u:User) RETURN u.id AS id;"}""")
      assert(c9 == 200 && b9.contains("Physical Plan"))

      // round-7 surface: engine-side parameter binding over HTTP —
      // scalars, a list for IN, and loud rejections for bad shapes
      val (c10, b10) = post(port,
        """{"query": "MATCH (u:User) WHERE u.id = $uid RETURN u.name AS name;",
          | "parameters": {"uid": 2}}""".stripMargin)
      assert(c10 == 200 && b10 == "{\"name\":\"u2\"}\n", s"c10=$c10 b10=$b10")
      val (c11, b11) = post(port,
        """{"query": "MATCH (u:User) WHERE u.id IN $ids RETURN u.id AS id ORDER BY id;",
          | "parameters": {"ids": [1, 2]}}""".stripMargin)
      assert(c11 == 200 && b11 == "{\"id\":1}\n{\"id\":2}\n")
      val (c12, _) = post(port,
        """{"query": "MATCH (u:User) RETURN u.id AS id;", "parameters": [1]}""")
      assert(c12 == 400)
      val (c13, b13) = post(port,
        """{"query": "MATCH (u:User) WHERE u.id = $uid RETURN u.id AS id;",
          | "parameters": {"uid": {"nested": 1}}}""".stripMargin)
      assert(c13 == 400 && b13.contains("uid"))
    } finally srv.stop()
  }

  test("user errors are 400, engine execution faults are 500") {
    import TestSpark.spark.implicits._
    import org.apache.spark.sql.functions.{col, udf}
    val g = new GraftSession(spark)
    g.registerTable("users5", Seq((1L, "u1")).toDF("id", "name"))
    g.registerNode("User5", "users5", "id")
    // a table whose EXECUTION throws: analysis sees a valid Long column,
    // the fault only fires when a task evaluates the row — the shape of
    // an internal engine/storage failure, not a bad query
    val boom = udf((i: Long) =>
      if (i > 0) throw new IllegalStateException("storage fault") else i)
    g.registerTable("faulty", Seq((1L, "f1")).toDF("id", "name")
      .withColumn("id", boom(col("id"))))
    g.registerNode("Faulty", "faulty", "id")
    val srv = new QueryServer(g)
    val port = srv.start()
    try {
      // parse error -> 400
      val (cp, _) = post(port, """{"query": "MATCH ("}""")
      assert(cp == 400)
      // valid parse, unknown label -> 400
      val (cv, _) = post(port, """{"query": "MATCH (x:Nope) RETURN x.id AS i;"}""")
      assert(cv == 400)
      // accepted query that dies mid-execution -> 500 (Pretty collects
      // before the header, so the status can still carry the fault)
      val (ce, be) = post(port,
        """{"query": "MATCH (f:Faulty) RETURN f.id AS id;", "format": "Pretty"}""")
      assert(ce == 500, s"got $ce: $be")
      assert(be.contains("internal error"))
      // the server survives the fault and keeps serving
      val (cok, bok) = post(port,
        """{"query": "MATCH (u:User5) RETURN u.id AS id;"}""")
      assert(cok == 200 && bok == "{\"id\":1}\n")
    } finally srv.stop()
  }

  test("CLI client: scripted REPL round trip against a live server") {
    val srv = new QueryServer(gs)
    val port = srv.start()
    try {
      val script =
        """MATCH (u:User) RETURN u.id AS id ORDER BY id;
          |\format CSV
          |MATCH (u:User)
          |RETURN count(*) AS n;
          |\q
          |""".stripMargin
      val out = new java.io.ByteArrayOutputStream()
      graft.client.GraftCli.run(
        new java.io.BufferedReader(new java.io.StringReader(script)),
        new java.io.PrintStream(out, true, "UTF-8"),
        s"http://localhost:$port", "JSONEachRow")
      val printed = out.toString("UTF-8")
      assert(printed.contains("""{"id":1}"""))
      assert(printed.contains("format set to CSV"))
      assert(printed.contains("-> 2")) // count result after the multi-line continuation prompt
      // errors surface with their status code, REPL keeps going
      val out2 = new java.io.ByteArrayOutputStream()
      graft.client.GraftCli.run(
        new java.io.BufferedReader(new java.io.StringReader(
          "MATCH (x:Nope) RETURN x.id AS i;\n\\q\n")),
        new java.io.PrintStream(out2, true, "UTF-8"),
        s"http://localhost:$port", "JSONEachRow")
      assert(out2.toString("UTF-8").contains("[400]"))
    } finally srv.stop()
  }

  test("row formats stream chunked: large result, no full materialization") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val g = new GraftSession(spark)
    // 200k rows across many partitions; toLocalIterator holds ONE
    // partition at a time on the driver, so the response streams no
    // matter how large the total result is (collect()-based formatting
    // would be bounded by spark.driver.maxResultSize)
    g.registerTable("big",
      spark.range(200000).select(col("id"), concat(lit("name_"), col("id")).as("name")))
    g.registerNode("Big", "big", "id")
    val srv = new QueryServer(g)
    val port = srv.start()
    try {
      val client = java.net.http.HttpClient.newHttpClient()
      val req = java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"http://localhost:$port/query"))
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
          """{"query": "MATCH (b:Big) RETURN b.id AS id, b.name AS name;", "format": "CSV"}"""))
        .build()
      val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofLines())
      assert(resp.statusCode() == 200)
      // chunked transfer (no Content-Length) proves the server did not
      // buffer the whole body before responding
      assert(resp.headers().firstValue("content-length").isEmpty)
      assert(resp.body().count() == 200000L)
    } finally srv.stop()
  }

  test("concurrent requests interleave: fast query completes while a slow one runs") {
    import spark.implicits._
    val g = new GraftSession(spark)
    g.registerTable("cusers", Seq((1L, "u1"), (2L, "u2")).toDF("id", "name"))
    g.registerNode("CUser", "cusers", "id")
    // one partition that stalls 8 s before yielding rows — occupies a
    // handler thread (and a Spark task) for the whole window; the wide
    // margin keeps the ordering assertion below robust under load
    g.registerTable("slow_t",
      spark.range(0, 2, 1, 1).mapPartitions { it => Thread.sleep(8000); it }.toDF("id"))
    g.registerNode("Slow", "slow_t", "id")
    val srv = new QueryServer(g)
    val port = srv.start()
    try {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      val slowF = Future {
        val r = post(port, """{"query": "MATCH (s:Slow) RETURN s.id AS id ORDER BY id;"}""")
        (r, System.nanoTime())
      }
      Thread.sleep(500) // the slow request is definitely dispatched first
      val (cq, bq) = post(port, """{"query": "MATCH (u:CUser) RETURN u.id AS id ORDER BY id;"}""")
      val quickDone = System.nanoTime()
      val ((cs, bs), slowDone) = Await.result(slowF, Duration(60, "s"))
      assert(cq == 200 && bq == "{\"id\":1}\n{\"id\":2}\n")
      assert(cs == 200 && bs == "{\"id\":0}\n{\"id\":1}\n")
      // with setExecutor(null) the fast request queued behind the slow one
      // on the single dispatcher thread; with the pool it must finish first
      assert(quickDone < slowDone,
        s"fast request queued behind slow one (${(quickDone - slowDone) / 1e6} ms after)")
    } finally srv.stop()
  }

  test("Main.boot: env-configured boot serves queries, wires catalog poll, shuts down") {
    val dir = java.nio.file.Files.createTempDirectory("graft-boot").toString
    val catPath = s"$dir/catalog.json"
    val env = Map(
      "GRAFT_HOST" -> "127.0.0.1",
      "GRAFT_PORT" -> "0", // ephemeral
      "GRAFT_DATA_DIR" -> "/root/testdata/sf0.001",
      "GRAFT_CATALOG" -> catPath,
      "GRAFT_CATALOG_POLL_MS" -> "100")
    val (srv, gs, port) = graft.server.Main.boot(env.get, spark)
    try {
      // catalog was persisted at boot (fresh path) and the graph serves
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(catPath)))
      val (c, b) = post(port,
        """{"query": "MATCH (r:Region) RETURN count(*) AS n;"}""")
      assert(c == 200 && b == "{\"n\":5}\n")
      // version poll is live: bump the on-disk version, observe the swap
      val bumped = gs.catalog.copy(version = gs.catalog.version + 1)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(catPath), bumped.toJson)
      val deadline = System.nanoTime() + 10e9.toLong
      while (gs.catalog.version != bumped.version && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(gs.catalog.version == bumped.version, "catalog poll never picked up the version bump")
    } finally {
      srv.stop()
      gs.stopCatalogRefresh()
    }
  }
}
