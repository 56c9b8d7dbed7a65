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
}
