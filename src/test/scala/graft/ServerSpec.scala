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
    } finally srv.stop()
  }
}
