package graft

import graft.jobs.{JobHttpServer, JobRegistry, MiniJson}
import graft.sources.TextIO

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** End-to-end HTTP drive of the reference's REST surface: POST /jobs
  * over a real socket, poll GET /jobs/{id} to COMPLETED, GET /health,
  * plus the reference's validation failures (server.go:62-65).
  */
class JobHttpSpec extends SparkSpec {
  import spark.implicits._

  implicit val ec: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.global

  private def http(method: String, url: String,
                   body: Option[String] = None): (Int, String) = {
    val conn = URI.create(url).toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    body.foreach { b =>
      conn.setDoOutput(true)
      conn.getOutputStream.write(b.getBytes(StandardCharsets.UTF_8))
    }
    val code = conn.getResponseCode
    val is = if (code < 400) conn.getInputStream else conn.getErrorStream
    val text = if (is == null) "" else
      new String(is.readAllBytes(), StandardCharsets.UTF_8)
    conn.disconnect()
    (code, text)
  }

  private def withServer(f: String => Unit): Unit = {
    val srv = new JobHttpServer(new JobRegistry(spark))
    srv.start()
    try f(s"http://127.0.0.1:${srv.boundPort}") finally srv.stop()
  }

  test("POST /jobs → poll GET /jobs/{id} to COMPLETED → output correct") {
    val dir = Files.createTempDirectory("graft-http").toFile
    Files.writeString(new java.io.File(dir, "in.txt").toPath,
      "alpha beta alpha\n")
    val out = Files.createTempDirectory("graft-http-out") + "/wc"
    withServer { base =>
      val (code, body) = http("POST", s"$base/jobs", Some(
        s"""{"files":["$dir/*.txt"],"nReduce":2,"outPath":"$out"}"""))
      assert(code == 200, body)
      val id = MiniJson.parse(body).get
        .asInstanceOf[Map[String, Any]]("id").asInstanceOf[Double].toInt

      val deadline = System.nanoTime() + 60L * 1000000000L
      var status = ""
      while (status != "COMPLETED" && status != "FAILED" &&
             System.nanoTime() < deadline) {
        Thread.sleep(100)
        val (c, s) = http("GET", s"$base/jobs/$id")
        assert(c == 200, s)
        status = MiniJson.parse(s).get
          .asInstanceOf[Map[String, Any]]("status").asInstanceOf[String]
      }
      assert(status == "COMPLETED")

      // reference JSON field names present with sane values
      val (_, s) = http("GET", s"$base/jobs/$id")
      val st = MiniJson.parse(s).get.asInstanceOf[Map[String, Any]]
      assert(st("files_count") == 1.0)
      assert(st("map_tasks_completed").asInstanceOf[Double] > 0)
      assert(st("reduce_tasks_completed").asInstanceOf[Double] > 0)

      val got = TextIO.readKV(spark, out).as[(String, String)].collect().toMap
      assert(got == Map("alpha" -> "2", "beta" -> "1"))
    }
  }

  test("validation and routing mirror the reference") {
    withServer { base =>
      // empty files → 400 (server.go:62-65)
      assert(http("POST", s"$base/jobs",
        Some("""{"files":[],"nReduce":2}"""))._1 == 400)
      // nReduce <= 0 → 400
      assert(http("POST", s"$base/jobs",
        Some("""{"files":["x"],"nReduce":0}"""))._1 == 400)
      // garbage body → 400
      assert(http("POST", s"$base/jobs", Some("{not json"))._1 == 400)
      // wrong method → 405
      assert(http("GET", s"$base/jobs")._1 == 405)
      // bad id → 400, unknown id → 404
      assert(http("GET", s"$base/jobs/abc")._1 == 400)
      assert(http("GET", s"$base/jobs/9999")._1 == 404)
      // health → 200 OK
      val (hc, hb) = http("GET", s"$base/health")
      assert(hc == 200 && hb == "OK")
    }
  }
}
