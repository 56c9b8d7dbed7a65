package graft.server

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.GraftSession

/** Minimal HTTP query endpoint mirroring the reference's server surface
  * (axum `POST /query` accepting `{"query": "...", "format": "..."}` and
  * streaming rows back — brahmand/src/server/handlers.rs:26-89,
  * models.rs:20-27). Formats: JSONEachRow (default), CSV, CSVWithNames,
  * Pretty, PrettyCompact.
  *
  * Built on the JDK's bundled HttpServer — no extra dependencies; the
  * engine itself stays a library, this is a thin adapter (queries execute
  * on the Spark driver exactly as in the reference, where the planner runs
  * in one process and distribution happens in the execution layer).
  */
final class QueryServer(gs: GraftSession, port: Int = 0) {

  private var server: HttpServer = _

  def start(): Int = {
    server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/query", (exchange: HttpExchange) => handle(exchange))
    server.setExecutor(null)
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = if (server != null) server.stop(0)

  private def handle(ex: HttpExchange): Unit = {
    try {
      if (ex.getRequestMethod != "POST") { respond(ex, 405, "POST only"); return }
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      val json = JsonMethods.parse(body)
      val query = (json \ "query") match {
        case JString(q) => q
        case _ => respond(ex, 400, "missing 'query'"); return
      }
      val format = (json \ "format") match {
        case JString(f) => f
        case _ => "JSONEachRow"
      }
      val df = gs.cypher(query)
      val out = format match {
        case "JSONEachRow"   => gs.toJsonEachRow(df).mkString("", "\n", "\n")
        case "CSV"           => gs.toCsv(df).mkString("", "\n", "\n")
        case "CSVWithNames"  => gs.toCsv(df, header = true).mkString("", "\n", "\n")
        case "Pretty" | "PrettyCompact" => gs.toPretty(df) + "\n"
        case other => respond(ex, 400, s"unknown format: $other"); return
      }
      respond(ex, 200, out)
    } catch {
      case e: Throwable => respond(ex, 400, s"error: ${e.getMessage}")
    }
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "text/plain; charset=utf-8")
    ex.sendResponseHeaders(code, bytes.length)
    val os = ex.getResponseBody
    os.write(bytes)
    os.close()
  }
}
