package graft.client

import java.io.{BufferedReader, PrintStream}
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets

/** Interactive query client for a running [[graft.server.QueryServer]] —
  * the Spark-native counterpart of the reference's CLI
  * (/root/reference/brahmand-client/src/main.rs): reads statements until a
  * terminating `;`, POSTs them to `/query`, prints the streamed response.
  *
  * Client commands (reference parity):
  *   - `\q` / `exit`      quit
  *   - `\format <F>`      switch output format (JSONEachRow, CSV,
  *                        CSVWithNames, Pretty, PrettyCompact)
  *
  * Usage: `graft.client.GraftCli --url http://host:port [--format F] [-q "query"]`
  * (`-q` runs one statement and exits — scriptable form).
  */
object GraftCli {

  private def jsonEscape(s: String): String = graft.util.JsonUtil.escape(s)

  private lazy val client = HttpClient.newHttpClient()

  /** One POST /query round trip; returns (status, body). When `out` is
    * given and the status is 200, the body is echoed line-by-line AS IT
    * ARRIVES and NOT accumulated — the client stays O(1) in result size,
    * matching the server's chunked streaming (the returned body string is
    * empty in that case). Error bodies are small and are returned. */
  def post(url: String, query: String, format: String,
      out: Option[PrintStream] = None): (Int, String) = {
    val payload = s"""{"query": "${jsonEscape(query)}", "format": "$format"}"""
    val req = HttpRequest.newBuilder(URI.create(s"$url/query"))
      .POST(HttpRequest.BodyPublishers.ofString(payload, StandardCharsets.UTF_8))
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofInputStream())
    val stream = out.isDefined && resp.statusCode() == 200
    val sb = new StringBuilder
    val reader = new BufferedReader(
      new java.io.InputStreamReader(resp.body(), StandardCharsets.UTF_8))
    var line = reader.readLine()
    while (line != null) {
      if (stream) out.get.println(line) else sb.append(line).append('\n')
      line = reader.readLine()
    }
    reader.close()
    (resp.statusCode(), sb.toString)
  }

  /** REPL line handling shared by the stream loop ([[run]]) and the JLine
    * interactive loop: statement buffering until `;`, `\q`/`exit`,
    * `\format`, streamed responses. */
  private final class Repl(out: PrintStream, url: String, initialFormat: String) {
    private var format = initialFormat
    private val buf = new StringBuilder

    def banner(): Unit =
      // ASCII-only: System.out may not be UTF-8 in a plain terminal
      out.println(s"graft client - connected to $url (format: $format)")

    def prompt: String = if (buf.isEmpty) "graft> " else "    -> "

    def abortStatement(): Unit = buf.clear()

    /** Process one input line; false ⇒ quit. */
    def handle(line: String): Boolean = {
      val trimmed = line.trim
      if (buf.isEmpty && (trimmed == "\\q" || trimmed == "exit")) return false
      if (buf.isEmpty && trimmed.startsWith("\\format")) {
        trimmed.split("\\s+") match {
          case Array(_, f) => format = f; out.println(s"format set to $f")
          case _ => out.println("usage: \\format <JSONEachRow|CSV|CSVWithNames|Pretty|PrettyCompact>")
        }
      } else if (trimmed.nonEmpty) {
        buf.append(line).append('\n')
        if (trimmed.endsWith(";")) {
          val query = buf.toString; buf.clear()
          try {
            // 200-responses stream straight to `out`; only error bodies
            // come back as a string
            val (code, body) = post(url, query, format, out = Some(out))
            if (code != 200) out.println(s"[$code] ${body.trim}")
          } catch {
            case e: Exception => out.println(s"connection error: ${e.getMessage}")
          }
        }
      }
      true
    }
  }

  /** REPL loop over arbitrary streams (testable without a TTY). */
  def run(in: BufferedReader, out: PrintStream, url: String,
      initialFormat: String): Unit = {
    val repl = new Repl(out, url, initialFormat)
    repl.banner()
    out.print(repl.prompt); out.flush()
    var line = in.readLine()
    while (line != null) {
      if (!repl.handle(line)) return
      out.print(repl.prompt); out.flush()
      line = in.readLine()
    }
  }

  /** Interactive REPL on a real terminal: JLine line editing + persistent
    * history (`~/.graft_history`) — parity with the reference client's
    * rustyline editor (brahmand-client/src/main.rs:20-28, which loads and
    * saves `history.txt` around the same read-eval loop). Ctrl-C aborts
    * the statement in progress; Ctrl-D quits. */
  def runInteractive(url: String, initialFormat: String): Unit = {
    import org.jline.reader.{EndOfFileException, LineReader, LineReaderBuilder, UserInterruptException}
    import org.jline.terminal.TerminalBuilder
    val terminal = TerminalBuilder.builder().system(true).build()
    val reader = LineReaderBuilder.builder()
      .terminal(terminal)
      .appName("graft")
      .variable(LineReader.HISTORY_FILE,
        java.nio.file.Paths.get(sys.props.getOrElse("user.home", "."), ".graft_history"))
      .build()
    val repl = new Repl(System.out, url, initialFormat)
    repl.banner()
    try {
      var going = true
      while (going) {
        try {
          going = repl.handle(reader.readLine(repl.prompt))
        } catch {
          case _: UserInterruptException => repl.abortStatement() // Ctrl-C
          case _: EndOfFileException => going = false             // Ctrl-D
        }
      }
    } finally terminal.close() // always restore the saved TTY attributes
  }

  def main(args: Array[String]): Unit = {
    var url = "http://localhost:8080"
    var format = "PrettyCompact" // reference client default (main.rs:35)
    var oneShot: Option[String] = None
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--url"    if i + 1 < args.length => url = args(i + 1); i += 2
        case "--format" if i + 1 < args.length => format = args(i + 1); i += 2
        case "-q"       if i + 1 < args.length => oneShot = Some(args(i + 1)); i += 2
        case other =>
          System.err.println(s"unknown argument: $other"); sys.exit(2)
      }
    }
    oneShot match {
      case Some(q) =>
        val (code, body) = post(url, q, format, out = Some(System.out))
        if (code != 200) System.err.println(s"[$code] ${body.trim}")
        sys.exit(if (code == 200) 0 else 1)
      case None =>
        // real TTY ⇒ JLine editor with history; piped stdin ⇒ stream loop.
        // JDK 22+ returns a non-null Console even for redirected stdio, so
        // prefer Console.isTerminal (reflective: absent on JDK <22).
        val console = System.console()
        val tty = console != null && (try {
          classOf[java.io.Console].getMethod("isTerminal")
            .invoke(console).asInstanceOf[Boolean]
        } catch { case _: NoSuchMethodException => true })
        if (tty) runInteractive(url, format)
        else run(new BufferedReader(new java.io.InputStreamReader(System.in)),
          System.out, url, format)
    }
  }
}
