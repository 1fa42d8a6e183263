package graft.jobs

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** HTTP front for [[JobRegistry]] — the reference's REST surface
  * (internal/api/server.go:21-31 routes; submit :50-73; status
  * :75-127; health :129-135) served with the JDK's built-in
  * `com.sun.net.httpserver` (no new dependencies):
  *
  *   - `POST /jobs`      body `{"files":[...],"nReduce":N}`
  *                       (+ optional `"outPath"` — our sink needs an
  *                       explicit destination) → `{"id":N}`;
  *                       empty files / nReduce <= 0 → 400
  *                       (server.go:62-65), non-POST → 405
  *   - `GET  /jobs/{id}` → `{"id":..,"status":..,"files_count":..,
  *                       "map_tasks_completed":..,
  *                       "reduce_tasks_completed":..}` — the exact
  *                       JSON field names of server.go:42-48;
  *                       missing/garbled id → 400, unknown → 404
  *   - `GET  /health`    → 200 `OK` (server.go:129-135)
  *
  * The listener is an API veneer: request handling only registers /
  * reads registry state, all execution stays on Spark's scheduler
  * through [[JobRegistry.submit]].
  */
final class JobHttpServer(registry: JobRegistry, port: Int = 0) {

  private val server =
    HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

  /** Ephemeral-port friendly (pass port=0, read the bound one). */
  def boundPort: Int = server.getAddress.getPort

  def start(): Unit = { server.createContext("/", handle _); server.start() }

  def stop(): Unit = server.stop(0)

  private def handle(ex: HttpExchange): Unit = {
    val path = ex.getRequestURI.getPath
    val method = ex.getRequestMethod
    try {
      (method, path) match {
        case ("POST", "/jobs") => handleSubmit(ex)
        case (_, "/jobs") => respond(ex, 405, "Method not allowed")
        case ("GET", p) if p.startsWith("/jobs/") => handleStatus(ex, p)
        case (_, p) if p.startsWith("/jobs/") =>
          respond(ex, 405, "Method not allowed")
        case ("GET", "/health") => respond(ex, 200, registry.health)
        case _ => respond(ex, 404, "Not found")
      }
    } catch {
      case _: Throwable => respond(ex, 500, "Internal error")
    } finally ex.close()
  }

  private def handleSubmit(ex: HttpExchange): Unit = {
    val body = new String(ex.getRequestBody.readAllBytes(),
      StandardCharsets.UTF_8)
    MiniJson.parse(body) match {
      case Some(obj: Map[String @unchecked, Any @unchecked]) =>
        val files = obj.get("files") match {
          case Some(xs: List[Any @unchecked]) => xs.collect { case s: String => s }
          case _ => Nil
        }
        val nReduce = obj.get("nReduce") match {
          case Some(d: Double) => d.toInt
          case _ => 0
        }
        val outPath = obj.get("outPath") match {
          case Some(s: String) => s
          case _ => java.nio.file.Files
            .createTempDirectory("graft-http-job").toString + "/out"
        }
        if (files.isEmpty || nReduce <= 0)
          respond(ex, 400, "Invalid parameters")
        else {
          val id = registry.submit(files, nReduce, outPath)
          respondJson(ex, 200, s"""{"id":$id}""")
        }
      case _ => respond(ex, 400, "Invalid request body")
    }
  }

  private def handleStatus(ex: HttpExchange, path: String): Unit = {
    val idStr = path.stripPrefix("/jobs/")
    if (idStr.isEmpty) { respond(ex, 400, "Missing Job ID"); return }
    idStr.toIntOption match {
      case None => respond(ex, 400, "Invalid Job ID")
      case Some(id) => registry.status(id) match {
        case None => respond(ex, 404, "Job not found")
        case Some(st) =>
          respondJson(ex, 200,
            s"""{"id":${st.id},"status":"${st.status}",""" +
              s""""files_count":${st.filesCount},""" +
              s""""map_tasks_completed":${st.mapTasksCompleted},""" +
              s""""reduce_tasks_completed":${st.reduceTasksCompleted}}""")
      }
    }
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
  }

  private def respondJson(ex: HttpExchange, code: Int, body: String): Unit = {
    ex.getResponseHeaders.set("Content-Type", "application/json")
    respond(ex, code, body)
  }
}

/** Tiny recursive-descent JSON reader for the submit body — objects,
  * arrays, strings (with escapes), numbers (as Double), booleans,
  * null. Zero-dependency by design (the build adds no libraries
  * beyond Spark); ~50 lines is cheaper than a parser dependency for
  * one three-field request shape.
  */
private[graft] object MiniJson {
  def parse(s: String): Option[Any] =
    try {
      val p = new P(s)
      val v = p.value()
      p.ws()
      if (p.done) Some(v) else None
    } catch { case _: Exception => None }

  private final class P(s: String) {
    private var i = 0
    def done: Boolean = i >= s.length
    def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    private def expect(c: Char): Unit = {
      if (done || s.charAt(i) != c) fail(s"expected $c"); i += 1
    }
    private def fail(m: String) = throw new IllegalArgumentException(m)

    def value(): Any = {
      ws()
      if (done) fail("eof")
      s.charAt(i) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => str()
        case 't' => lit("true", true)
        case 'f' => lit("false", false)
        case 'n' => lit("null", null)
        case _ => num()
      }
    }
    private def lit(word: String, v: Any): Any = {
      if (!s.startsWith(word, i)) fail(word); i += word.length; v
    }
    private def obj(): Map[String, Any] = {
      expect('{'); ws()
      if (!done && s.charAt(i) == '}') { i += 1; return Map.empty }
      val b = Map.newBuilder[String, Any]
      var more = true
      while (more) {
        ws(); val k = str(); ws(); expect(':'); b += k -> value(); ws()
        if (!done && s.charAt(i) == ',') i += 1 else more = false
      }
      expect('}'); b.result()
    }
    private def arr(): List[Any] = {
      expect('['); ws()
      if (!done && s.charAt(i) == ']') { i += 1; return Nil }
      val b = List.newBuilder[Any]
      var more = true
      while (more) {
        b += value(); ws()
        if (!done && s.charAt(i) == ',') i += 1 else more = false
      }
      expect(']'); b.result()
    }
    private def str(): String = {
      expect('"')
      val sb = new StringBuilder
      while (!done && s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\') {
          i += 1
          if (done) fail("eof in string")
          s.charAt(i) match {
            case '"' => sb += '"'
            case '\\' => sb += '\\'
            case '/' => sb += '/'
            case 'b' => sb += '\b'
            case 'f' => sb += '\f'
            case 'n' => sb += '\n'
            case 'r' => sb += '\r'
            case 't' => sb += '\t'
            case 'u' =>
              sb += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar
              i += 4
            case x => fail(s"bad escape $x")
          }
        } else sb += c
        i += 1
      }
      expect('"'); sb.result()
    }
    private def num(): Double = {
      val start = i
      while (!done && "+-0123456789.eE".indexOf(s.charAt(i)) >= 0) i += 1
      if (i == start) fail("bad token")
      s.substring(start, i).toDouble
    }
  }
}
