package graft.api

import java.io.{InputStream, OutputStream}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.Base64

/** WebSocket push channel for live job updates — the reference's
  * `WS /ws/jobs/{id}` (jobmanager/api.py:598-626) pushes HARD-CODED mock
  * numbers; these frames carry the real per-query progress the
  * [[JobServer]] listener records. The JDK's built-in http server cannot
  * upgrade a connection, so this is a deliberately minimal RFC 6455
  * server (handshake, unmasked server→client text frames, close on
  * client close or disconnect) on its own port — it pairs with
  * [[JobHttpServer]], which keeps the REST surface.
  *
  * Scope matches the reference's: a push-only metrics feed. Client→server
  * payloads are not interpreted beyond detecting the close opcode.
  */
final class JobWsServer(js: JobServer, port: Int = 0, intervalMs: Long = 1000) {

  private val server = new ServerSocket(port)
  def boundPort: Int = server.getLocalPort
  @volatile private var running = true

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val s = server.accept()
        val t = new Thread(() => handle(s), "graft-ws-conn")
        t.setDaemon(true)
        t.start()
      } catch { case _: Throwable => () /* server closed */ }
    }
  }, "graft-ws-accept")
  acceptor.setDaemon(true)
  acceptor.start()

  def close(): Unit = { running = false; server.close() }

  private val WsGuid = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11" // RFC 6455 §1.3

  private def handle(sock: Socket): Unit =
    try {
      // a client sending a PARTIAL frame (or handshake) must not wedge
      // this connection's push loop in a blocking read forever — time out
      // and drop the connection instead (caught below)
      sock.setSoTimeout(math.max(5 * intervalMs, 5000L).toInt)
      val in = sock.getInputStream
      val out = sock.getOutputStream
      val (path, key) = readHandshake(in)
      val jobId = path match {
        case s if s.startsWith("/ws/jobs/") && s.length > "/ws/jobs/".length =>
          Some(s.stripPrefix("/ws/jobs/"))
        case _ => None
      }
      if (jobId.isEmpty || key.isEmpty) {
        out.write("HTTP/1.1 404 Not Found\r\nContent-Length: 0\r\n\r\n"
          .getBytes(StandardCharsets.UTF_8))
        return
      }
      val accept = Base64.getEncoder.encodeToString(
        MessageDigest.getInstance("SHA-1")
          .digest((key.get + WsGuid).getBytes(StandardCharsets.UTF_8)))
      out.write(("HTTP/1.1 101 Switching Protocols\r\n" +
        "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
        s"Sec-WebSocket-Accept: $accept\r\n\r\n").getBytes(StandardCharsets.UTF_8))
      out.flush()
      while (running && !clientClosed(in, out)) {
        writeTextFrame(out, metricsJson(jobId.get))
        Thread.sleep(intervalMs)
      }
    } catch {
      case _: Throwable => () // disconnect/broken pipe ends the feed
    } finally sock.close()

  /** Read the upgrade request (raw bytes to \r\n\r\n); return path + key. */
  private def readHandshake(in: InputStream): (String, Option[String]) = {
    val buf = new StringBuilder
    // append-THEN-check: reading ahead before the terminator check would
    // block forever on the byte after the final \n
    var b = in.read()
    var done = false
    while (b != -1 && !done) {
      buf.append(b.toChar)
      done = buf.endsWith("\r\n\r\n")
      if (!done) b = in.read()
    }
    val lines = buf.toString.split("\r\n")
    val path = lines.headOption.map(_.split(" ")).filter(_.length >= 2).map(_(1)).getOrElse("")
    val key = lines.collectFirst {
      case l if l.toLowerCase.startsWith("sec-websocket-key:") => l.substring(l.indexOf(':') + 1).trim
    }
    (path, key)
  }

  /** Between pushes, drain any buffered client frame and detect close
    * (opcode 8) — replying with a close frame per the RFC.
    */
  private def clientClosed(in: InputStream, out: OutputStream): Boolean = {
    while (in.available() > 0) {
      val first = in.read()
      if (first == -1) return true
      if ((first & 0x0f) == 8) {
        out.write(Array[Byte](0x88.toByte, 0x00))
        out.flush()
        return true
      }
      // skip the rest of a non-close frame: len byte (+mask), then payload
      val lenByte = in.read()
      if (lenByte == -1) return true
      val masked = (lenByte & 0x80) != 0
      var len = lenByte & 0x7f
      if (len == 126) len = (in.read() << 8) | in.read()
      // 127 = 64-bit extended length: no legitimate client payload on a
      // push-only feed is >= 64 KiB — treat it as a protocol violation and
      // close rather than desync frame parsing on the 8-byte header
      else if (len == 127) return true
      val toSkip = (if (masked) 4 else 0) + len
      var skipped = 0L
      while (skipped < toSkip && in.read() != -1) skipped += 1
    }
    false
  }

  private def writeTextFrame(out: OutputStream, text: String): Unit = {
    val payload = text.getBytes(StandardCharsets.UTF_8)
    val header =
      if (payload.length < 126) Array[Byte](0x81.toByte, payload.length.toByte)
      else if (payload.length < 65536) Array[Byte](0x81.toByte, 126.toByte,
        (payload.length >> 8).toByte, payload.length.toByte)
      else // 64-bit length path (RFC 6455 §5.2) — a long job name/error
           // string must not emit a corrupt 16-bit header
        Array[Byte](0x81.toByte, 127.toByte) ++
          (56 to 0 by -8).map(s => (payload.length.toLong >> s).toByte)
    out.write(header)
    out.write(payload)
    out.flush()
  }

  // user-supplied strings (job name = the streaming query name, status,
  // error text) must be JSON-escaped — a quote or control char in a name
  // would otherwise push invalid JSON to every subscriber
  private def q(s: String): String = graft.core.JsonText.quote(s)

  // JSON has no NaN/Infinity literal, and Spark reports NaN rates on
  // zero-duration batches (common on the first micro-batch) — emit null
  private def num(d: Double): String =
    if (d.isNaN || d.isInfinite) "null" else d.toString

  private def metricsJson(id: String): String =
    js.listJobs().find(h => h.id.toString == id || h.name == id) match {
      case None => s"""{"error":"no such job"}"""
      case Some(h) =>
        val base = s""""jobId":${q(h.id.toString)},"name":${q(h.name)},"status":${q(js.status(h.query))}"""
        js.metrics(h.query) match {
          case Some(m) =>
            s"""{$base,"recordsPerSecond":${num(m.recordsPerSecond)},""" +
              s""""inputRowsPerSecond":${num(m.inputRowsPerSecond)},""" +
              s""""batchDurationMs":${m.batchDurationMs},""" +
              s""""numInputRows":${m.numInputRows},"stateRows":${m.stateRows}}"""
          case None => s"""{$base}"""
        }
    }
}
