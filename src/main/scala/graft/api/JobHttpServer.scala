package graft.api

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.concurrent.TrieMap

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery

/** HTTP binding for [[JobServer]] — the reference's JobManager REST plane
  * (reference: jobmanager/api.py: submit :169-253, status :256-278,
  * cancel :281-329, metrics :332-352, list :384-398, savepoint/recover
  * :446-515) on the JDK's built-in HTTP server (no dependencies).
  *
  * The reference submits pickled job graphs; jobs here are code, so
  * `/jobs/submit` starts a pipeline from a named registry the embedding
  * application fills ([[registerPipeline]]) — the same trust boundary as
  * the reference (its pickles execute arbitrary code too; a name registry
  * is the safe version of that contract). Parameters travel as query
  * params, responses as JSON.
  *
  * Routes:
  *   GET  /jobs                         list active jobs
  *   POST /jobs/submit?pipeline=P       start registered pipeline P
  *   GET  /jobs/{id}/status
  *   GET  /jobs/{id}/metrics
  *   POST /jobs/{id}/cancel
  *   POST /jobs/savepoint?checkpoint=C&name=N&root=R
  *   POST /jobs/recover?pipeline=P&name=N&root=R   start P from savepoint
  *   POST /jobs/catalog-savepoint?checkpoint=C&catalog=B&name=N&root=R
  *   POST /jobs/catalog-recover?pipeline=P&catalog=B&name=N&root=R
  *   POST /jobs/catalog-replicate?primary=P&replica=R[&full=true]
  *   GET  /jobs/catalog-verify?primary=P&replica=R
  */
final class JobHttpServer(spark: SparkSession, js: JobServer, port: Int = 0) {

  /** name -> factory; the Option is a checkpoint override (None = the
    * pipeline's own default, Some(path) = recover from that savepoint).
    */
  private val pipelines = TrieMap.empty[String, Option[String] => StreamingQuery]

  def registerPipeline(name: String)(start: Option[String] => StreamingQuery): Unit =
    pipelines.put(name, start)

  /** Submitted/recovered queries by id — kept after termination so
    * status/metrics remain queryable (the reference's job store does the
    * same; `spark.streams.get` only sees active queries).
    */
  private val jobs = TrieMap.empty[String, StreamingQuery]

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

  def boundPort: Int = server.getAddress.getPort

  private def jsonEscape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def params(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).getOrElse("").split("&").toSeq
      .filter(_.contains("="))
      .map { kv =>
        val Array(k, v) = kv.split("=", 2)
        java.net.URLDecoder.decode(k, UTF_8) -> java.net.URLDecoder.decode(v, UTF_8)
      }.toMap

  private def queryById(id: String): Option[StreamingQuery] =
    jobs.get(id).orElse(
      try Option(spark.streams.get(java.util.UUID.fromString(id)))
      catch { case _: IllegalArgumentException => None })

  private def track(q: StreamingQuery): StreamingQuery = {
    jobs.put(q.id.toString, q); q
  }

  private def jobJson(q: StreamingQuery): String =
    s"""{"id":"${q.id}","name":"${jsonEscape(Option(q.name).getOrElse(""))}","status":"${js.status(q)}"}"""

  private def handle(ex: HttpExchange): Unit = {
    val path = ex.getRequestURI.getPath
    val method = ex.getRequestMethod
    try {
      (method, path.split("/").filter(_.nonEmpty).toList) match {
        case ("GET", List("jobs")) =>
          respond(ex, 200, js.listJobs().map(h => jobJson(h.query)).mkString("[", ",", "]"))

        case ("POST", List("jobs", "submit")) =>
          val p = params(ex)
          p.get("pipeline").flatMap(n => pipelines.get(n)) match {
            case Some(start) =>
              val h = js.submit(p("pipeline"), track(start(None)))
              respond(ex, 200, jobJson(h.query))
            case None => respond(ex, 404, s"""{"error":"unknown pipeline"}""")
          }

        case ("GET", List("jobs", id, "status")) =>
          queryById(id) match {
            case Some(q) => respond(ex, 200, s"""{"status":"${js.status(q)}"}""")
            case None => respond(ex, 404, s"""{"error":"no such job"}""")
          }

        case ("GET", List("jobs", id, "metrics")) =>
          queryById(id).flatMap(js.metrics) match {
            case Some(m) => respond(ex, 200,
              s"""{"recordsPerSecond":${m.recordsPerSecond},"inputRowsPerSecond":${m.inputRowsPerSecond},""" +
                s""""batchDurationMs":${m.batchDurationMs},"numInputRows":${m.numInputRows},"stateRows":${m.stateRows}}""")
            case None => respond(ex, 404, s"""{"error":"no metrics yet"}""")
          }

        case ("POST", List("jobs", id, "cancel")) =>
          queryById(id) match {
            case Some(q) => js.cancel(q); respond(ex, 200, s"""{"cancelled":true}""")
            case None => respond(ex, 404, s"""{"error":"no such job"}""")
          }

        case ("POST", List("jobs", "savepoint")) =>
          val p = params(ex)
          val sp = js.savepoint(p("checkpoint"), p("name"), p("root"))
          respond(ex, 200, s"""{"savepoint":"${jsonEscape(sp)}"}""")

        case ("POST", List("jobs", "recover")) =>
          val p = params(ex)
          pipelines.get(p("pipeline")) match {
            case Some(start) =>
              val h = js.recover(p("root"), p("name"))(sp => track(start(Some(sp))))
              respond(ex, 200, jobJson(h.query))
            case None => respond(ex, 404, s"""{"error":"unknown pipeline"}""")
          }

        case ("POST", List("jobs", "catalog-savepoint")) =>
          val p = params(ex)
          val sp = js.catalogSavepoint(p("checkpoint"), p("catalog"), p("name"), p("root"))
          respond(ex, 200, s"""{"savepoint":"${jsonEscape(sp)}"}""")

        case ("POST", List("jobs", "catalog-recover")) =>
          val p = params(ex)
          pipelines.get(p("pipeline")) match {
            case Some(start) =>
              val h = js.catalogRecover(p("root"), p("name"), p("catalog"))(sp =>
                track(start(Some(sp))))
              respond(ex, 200, jobJson(h.query))
            case None => respond(ex, 404, s"""{"error":"unknown pipeline"}""")
          }

        case ("POST", List("jobs", "catalog-replicate")) =>
          val p = params(ex)
          val copied = js.catalogReplicate(p("primary"), p("replica"),
            p.get("full").contains("true"))
          respond(ex, 200, copied.toSeq.sorted
            .map { case (s, g) => s""""${jsonEscape(s)}":$g""" }
            .mkString("""{"copied":{""", ",", "}}"))

        case ("GET", List("jobs", "catalog-verify")) =>
          val p = params(ex)
          val rows = js.catalogVerify(p("primary"), p("replica"))
          respond(ex, 200, rows.map { case (s, np, nr, ok) =>
            s"""{"store":"${jsonEscape(s)}","n_primary":$np,"n_replica":$nr,"consistent":$ok}"""
          }.mkString("[", ",", "]"))

        case _ => respond(ex, 404, s"""{"error":"no route"}""")
      }
    } catch {
      case e: IllegalArgumentException =>
        respond(ex, 400, s"""{"error":"${jsonEscape(Option(e.getMessage).getOrElse("bad request"))}"}""")
      case e: NoSuchElementException =>
        respond(ex, 400, s"""{"error":"missing parameter: ${jsonEscape(e.getMessage)}"}""")
      case e: Throwable =>
        respond(ex, 500, s"""{"error":"${jsonEscape(Option(e.getMessage).getOrElse(e.getClass.getName))}"}""")
    }
  }

  server.createContext("/", handle _)
  server.setExecutor(null) // serve on the dispatcher thread; this is a control plane, not a data plane
  server.start()

  def close(): Unit = server.stop(0)
}
