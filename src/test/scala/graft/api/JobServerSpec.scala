package graft.api

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class JobServerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("submit/list/status/metrics/cancel lifecycle with real progress numbers") {
    implicit val ctx = spark.sqlContext
    val server = new JobServer(spark)
    val in = MemoryStream[Int]
    val job = server.submit("counter", {
      in.toDF().toDF("v").groupBy(col("v") % 10).count()
        .writeStream.outputMode(OutputMode.Complete())
        .format("memory").queryName("jobsrv_out").start()
    })
    try {
      assert(job.isActive)
      assert(server.status(job.query) == "RUNNING")
      assert(server.listJobs().exists(_.id == job.id))
      in.addData(1 to 1000: _*)
      job.query.processAllAvailable()
      // listener events are async; give the bus a moment
      val deadline = System.currentTimeMillis() + 10000
      var m = server.metrics(job.query)
      while ((m.isEmpty || m.get.numInputRows == 0) && System.currentTimeMillis() < deadline) {
        Thread.sleep(100); m = server.metrics(job.query)
      }
      assert(m.exists(_.numInputRows > 0), s"no real metrics captured: $m")
      assert(m.exists(_.stateRows > 0)) // aggregation state is visible
      server.cancel(job.query)
      assert(!job.query.isActive)
      assert(server.status(job.query) == "FINISHED")
    } finally {
      if (job.query.isActive) job.query.stop()
      server.close()
    }
  }

  test("ingest job lifecycle: savepoint pins the store generation, recover resumes it") {
    import graft.core.SwapStore
    import graft.ops.Sketches
    val js = new JobServer(spark)
    val dir = graft.core.TempDirs.create("jobsrv_ingest_src")
    val store = graft.core.TempDirs.create("jobsrv_ingest_store")
    val ckpt = java.nio.file.Files.createTempDirectory("jobsrv_ingest_ckpt").toString
    val spRoot = java.nio.file.Files.createTempDirectory("jobsrv_ingest_sp").toString
    val all = spark.range(100).select(lit("g").as("g"), (col("id") % 4).as("b"),
      col("id").as("v"), col("id").as("ord"))
    Sketches.initThetaStore(all.where(lit(false)), Seq(col("g")), col("b"), col("v"), store)
    def distinctNow: Long =
      Sketches.distinctOver(SwapStore.read(spark, store), Seq("g"), lit(true))
        .as[(String, Long)].collect().headOption.map(_._2).getOrElse(0L)
    def runIngest(cp: String): Unit = {
      val job = js.submit("theta_ingest", Sketches.ingestThetaStream(spark,
        graft.streaming.Replay.orderedStream(spark, dir, all.schema),
        Seq(col("g")), col("b"), col("v"), store, checkpoint = Some(cp)))
      try job.query.processAllAvailable() finally js.cancel(job.query)
    }
    try {
      // phase A: two slices fold in (batch ids 0, 1), then stop + savepoint
      graft.streaming.Replay.writeOrderedSlices(
        all.where(col("ord") < 50), col("ord"), dir, 2)
      runIngest(ckpt)
      assert(SwapStore.lastBatch(spark, store) == 1L && distinctNow == 50L)
      js.ingestSavepoint(ckpt, store, "sp1", spRoot)
      // phase B: two MORE slices arrive; the restarted job (same live
      // checkpoint) folds them as batches 2, 3
      graft.streaming.Replay.appendSlice(dir,
        all.where(col("ord") >= 50 && col("ord") < 75), 2)
      graft.streaming.Replay.appendSlice(dir, all.where(col("ord") >= 75), 3)
      runIngest(ckpt)
      assert(SwapStore.lastBatch(spark, store) == 3L && distinctNow == 100L)
      // disaster: the live store is lost entirely
      val storeUnit = java.nio.file.Paths.get(store, "_store")
      java.nio.file.Files.walk(storeUnit).sorted(java.util.Comparator.reverseOrder())
        .forEach(java.nio.file.Files.delete(_))
      // recover from the named pin: the store comes back at ledger
      // batch 1, and the recovered query replays slices 2/3 from the
      // snapshot offsets as batches 2/3 — converging to the same table
      val job = js.ingestRecover(spRoot, "sp1", store) { cp =>
        Sketches.ingestThetaStream(spark,
          graft.streaming.Replay.orderedStream(spark, dir, all.schema),
          Seq(col("g")), col("b"), col("v"), store, checkpoint = Some(cp))
      }
      try job.query.processAllAvailable() finally js.cancel(job.query)
      assert(SwapStore.lastBatch(spark, store) == 3L,
        "recovered job must resume at the pinned batch and catch up")
      assert(distinctNow == 100L, "recovered store must converge to the full build")
      // the savepoint is a FORK POINT: the first recovery ran on its own
      // checkpoint copy, so a SECOND recovery from the same name starts
      // at the pinned batch again and converges identically
      java.nio.file.Files.walk(java.nio.file.Paths.get(store, "_store"))
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(java.nio.file.Files.delete(_))
      val again = js.ingestRecover(spRoot, "sp1", store) { cp =>
        Sketches.ingestThetaStream(spark,
          graft.streaming.Replay.orderedStream(spark, dir, all.schema),
          Seq(col("g")), col("b"), col("v"), store, checkpoint = Some(cp))
      }
      try again.query.processAllAvailable() finally js.cancel(again.query)
      assert(SwapStore.lastBatch(spark, store) == 3L && distinctNow == 100L,
        "a second recovery from the same pin must converge the same way")
    } finally js.close()
  }

  test("catalog job lifecycle: savepoint pins generations O(1), recover rewinds and replays the tail") {
    import org.apache.spark.sql.DataFrame
    import graft.core.Catalog
    val js = new JobServer(spark)
    val dir = graft.core.TempDirs.create("jobsrv_cat_src")
    val base = graft.core.TempDirs.create("jobsrv_cat_store")
    val ckpt = java.nio.file.Files.createTempDirectory("jobsrv_cat_ckpt").toString
    val spRoot = java.nio.file.Files.createTempDirectory("jobsrv_cat_sp").toString
    val all = spark.range(100).select((col("id") % 4).as("k"), col("id").as("v"))
    val folds: Seq[(String, (DataFrame, DataFrame) => DataFrame)] = Seq(
      "cnt" -> ((cur, b) => cur.unionByName(b.agg(count(lit(1)).as("n")))
        .agg(sum(col("n")).as("n"))),
      "sums" -> ((cur, b) => cur.unionByName(b.groupBy("k").agg(sum(col("v")).as("s")))
        .groupBy("k").agg(sum(col("s")).as("s"))))
    Catalog.init(base, Map(
      "cnt" -> Seq(0L).toDF("n"),
      "sums" -> Seq.empty[(Long, Long)].toDF("k", "s")))
    def cntNow: Long = Catalog.read(spark, base, "cnt").as[Long].collect().head
    def runIngest(cp: String): Unit = {
      val job = js.submit("cat_ingest", Catalog.ingestStream(spark,
        graft.streaming.Replay.orderedStream(spark, dir, all.schema),
        base, folds, checkpoint = Some(cp)))
      try job.query.processAllAvailable() finally js.cancel(job.query)
    }
    try {
      // phase A: two slices fold in (shared-ledger batches 0, 1)
      graft.streaming.Replay.writeOrderedSlices(
        all.where(col("v") < 50), col("v"), dir, 2)
      runIngest(ckpt)
      assert(Catalog.lastBatch(spark, base) == 1L && cntNow == 50L)
      js.catalogSavepoint(ckpt, base, "csp1", spRoot)
      // phase B: two MORE slices; the restarted live job folds 2, 3 —
      // post-pin folds GC everything except current/previous/pinned
      graft.streaming.Replay.appendSlice(dir,
        all.where(col("v") >= 50 && col("v") < 75), 2)
      graft.streaming.Replay.appendSlice(dir, all.where(col("v") >= 75), 3)
      runIngest(ckpt)
      assert(Catalog.lastBatch(spark, base) == 3L && cntNow == 100L)
      // recover: the manifest rewinds to the pin (no data copy), the
      // recovered query replays slices 2/3 from the snapshot offsets
      // and converges; a SECOND recovery from the same name works too
      for (round <- 1 to 2) {
        val job = js.catalogRecover(spRoot, "csp1", base) { cp =>
          Catalog.ingestStream(spark,
            graft.streaming.Replay.orderedStream(spark, dir, all.schema),
            base, folds, checkpoint = Some(cp))
        }
        try job.query.processAllAvailable() finally js.cancel(job.query)
        assert(Catalog.lastBatch(spark, base) == 3L && cntNow == 100L,
          s"recovery $round must rewind to the pin and converge on replay")
        assert(Catalog.read(spark, base, "sums").as[(Long, Long)].collect().toMap
          == (0L until 100L).groupBy(_ % 4).view.mapValues(_.sum).toMap,
          s"recovery $round: per-key sums must match the straight-through run")
      }
      // the REST binding drives the same pair end-to-end
      val http = new JobHttpServer(spark, js)
      try {
        http.registerPipeline("cat_ingest") { cpo =>
          Catalog.ingestStream(spark,
            graft.streaming.Replay.orderedStream(spark, dir, all.schema),
            base, folds, checkpoint = cpo.orElse(Some(ckpt)))
        }
        def call(method: String, pathAndQuery: String): (Int, String) = {
          val conn = new java.net.URL(s"http://127.0.0.1:${http.boundPort}$pathAndQuery")
            .openConnection().asInstanceOf[java.net.HttpURLConnection]
          conn.setRequestMethod(method)
          val code = conn.getResponseCode
          val is = if (code < 400) conn.getInputStream else conn.getErrorStream
          val body = scala.io.Source.fromInputStream(is, "UTF-8").mkString
          conn.disconnect()
          (code, body)
        }
        def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
        val (spc, spBody) = call("POST", s"/jobs/catalog-savepoint?checkpoint=${enc(ckpt)}" +
          s"&catalog=${enc(base)}&name=csp2&root=${enc(spRoot)}")
        assert(spc == 200, spBody)
        // duplicate name -> 400, and no half-savepoint squats on it
        assert(call("POST", s"/jobs/catalog-savepoint?checkpoint=${enc(ckpt)}" +
          s"&catalog=${enc(base)}&name=csp2&root=${enc(spRoot)}")._1 == 400)
        val (rc, rBody) = call("POST", s"/jobs/catalog-recover?pipeline=cat_ingest" +
          s"&catalog=${enc(base)}&name=csp2&root=${enc(spRoot)}")
        assert(rc == 200, rBody)
        val rid = """"id":"([^"]+)"""".r.findFirstMatchIn(rBody).get.group(1)
        val rq = spark.streams.get(java.util.UUID.fromString(rid))
        try rq.processAllAvailable() finally rq.stop()
        assert(Catalog.lastBatch(spark, base) == 3L && cntNow == 100L,
          "REST catalog-recover must rewind to the pin and converge on replay")
      } finally http.close()
    } finally js.close()
  }

  test("DR through the facade: catalog-replicate syncs a replica, catalog-verify fingerprints it") {
    import org.apache.spark.sql.DataFrame
    import graft.core.Catalog
    val js = new JobServer(spark)
    val base = graft.core.TempDirs.create("jobsrv_dr_p")
    val rep = graft.core.TempDirs.create("jobsrv_dr_r")
    val folds: Seq[(String, (DataFrame, DataFrame) => DataFrame)] = Seq(
      "cnt" -> ((cur, b) => cur.unionByName(b.agg(count(lit(1)).as("n")))
        .agg(sum(col("n")).as("n"))))
    Catalog.init(base, Map("cnt" -> Seq(0L).toDF("n")))
    Catalog.ingest(spark, base, 0L, spark.range(10).toDF("v"), folds)
    try {
      assert(js.catalogReplicate(base, rep) == Map("cnt" -> 0L))
      assert(js.catalogVerify(base, rep) == Seq(("cnt", 1L, 1L, true)))
      val http = new JobHttpServer(spark, js)
      try {
        def call(method: String, pathAndQuery: String): (Int, String) = {
          val conn = new java.net.URL(s"http://127.0.0.1:${http.boundPort}$pathAndQuery")
            .openConnection().asInstanceOf[java.net.HttpURLConnection]
          conn.setRequestMethod(method)
          val code = conn.getResponseCode
          val is = if (code < 400) conn.getInputStream else conn.getErrorStream
          val body = scala.io.Source.fromInputStream(is, "UTF-8").mkString
          conn.disconnect()
          (code, body)
        }
        def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
        Catalog.ingest(spark, base, 1L, spark.range(5).toDF("v"), folds)
        val (c1, b1) = call("POST",
          s"/jobs/catalog-replicate?primary=${enc(base)}&replica=${enc(rep)}")
        assert(c1 == 200 && b1 == """{"copied":{"cnt":1}}""", b1)
        val (c2, b2) = call("POST",
          s"/jobs/catalog-replicate?primary=${enc(base)}&replica=${enc(rep)}")
        assert(c2 == 200 && b2 == """{"copied":{}}""", s"converged sync must ship nothing: $b2")
        val (c3, b3) = call("GET",
          s"/jobs/catalog-verify?primary=${enc(base)}&replica=${enc(rep)}")
        assert(c3 == 200 &&
          b3 == """[{"store":"cnt","n_primary":1,"n_replica":1,"consistent":true}]""", b3)
      } finally http.close()
    } finally js.close()
  }

  test("WebSocket binding: RFC6455 handshake + live metric frames for a running job") {
    implicit val ctx = spark.sqlContext
    val js = new JobServer(spark)
    val ws = new JobWsServer(js, port = 0, intervalMs = 100)
    val in = MemoryStream[Int]
    val job = js.submit("ws_counter", {
      in.toDF().toDF("v").groupBy(col("v") % 5).count()
        .writeStream.outputMode(OutputMode.Complete())
        .format("memory").queryName("ws_out").start()
    })
    try {
      in.addData(1 to 500: _*)
      job.query.processAllAvailable()
      val sock = new java.net.Socket("127.0.0.1", ws.boundPort)
      val out = sock.getOutputStream
      // RFC 6455 §1.3 sample key -> the spec's expected accept hash
      out.write((s"GET /ws/jobs/${job.id} HTTP/1.1\r\nHost: x\r\n" +
        "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
        "Sec-WebSocket-Key: dGhlIHNhbXBsZSBub25jZQ==\r\n" +
        "Sec-WebSocket-Version: 13\r\n\r\n").getBytes("UTF-8"))
      out.flush()
      val is = sock.getInputStream
      val head = new StringBuilder
      while (!head.endsWith("\r\n\r\n")) head.append(is.read().toChar)
      assert(head.toString.startsWith("HTTP/1.1 101"), head.toString)
      assert(head.toString.contains("Sec-WebSocket-Accept: s3pPLMBiTxaQ9kYGzzhZRbK+xOo="),
        s"wrong accept hash:\n$head")
      // read one pushed text frame and check it carries real job fields
      def readFrame(): String = {
        val b0 = is.read(); assert((b0 & 0x0f) == 1, s"not a text frame: $b0")
        var len = is.read() & 0x7f
        if (len == 126) len = (is.read() << 8) | is.read()
        val payload = new Array[Byte](len)
        var off = 0
        while (off < len) { val n = is.read(payload, off, len - off); assert(n > 0); off += n }
        new String(payload, "UTF-8")
      }
      val frame = readFrame()
      assert(frame.contains(s""""jobId":"${job.id}"""") && frame.contains("\"status\":\"RUNNING\""),
        s"frame missing job fields: $frame")
      val second = readFrame() // the feed keeps pushing
      assert(second.contains(s"${job.id}"))
      // polite close: client close frame (masked, empty) ends the feed
      out.write(Array[Byte](0x88.toByte, 0x80.toByte, 0, 0, 0, 0)); out.flush()
      sock.close()
    } finally {
      ws.close()
      if (job.query.isActive) job.query.stop()
      js.close()
    }
  }

  test("HTTP binding: submit/list/status/metrics/cancel + savepoint/recover over REST") {
    implicit val ctx = spark.sqlContext
    val js = new JobServer(spark)
    val http = new JobHttpServer(spark, js)
    val in = MemoryStream[(String, Double)]
    val ckpt = java.nio.file.Files.createTempDirectory("graft_http_ckpt").toString
    val spRoot = java.nio.file.Files.createTempDirectory("graft_http_sp").toString
    val sinkNames = Iterator.from(0).map(i => s"http_sink_$i")
    http.registerPipeline("sum_by_key") { ckptOverride =>
      val w = graft.streaming.StreamOps.runningAgg(in.toDF().toDF("k", "v"),
          Seq(col("k")), Seq(sum(graft.ops.Aggregates.dec(col("v"))).cast("double").as("s")))
        .writeStream.outputMode(OutputMode.Complete())
        .option("checkpointLocation", ckptOverride.getOrElse(ckpt))
        .format("memory").queryName(sinkNames.next())
      w.start()
    }

    def call(method: String, pathAndQuery: String): (Int, String) = {
      val url = new java.net.URL(s"http://127.0.0.1:${http.boundPort}$pathAndQuery")
      val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod(method)
      val code = conn.getResponseCode
      val is = if (code < 400) conn.getInputStream else conn.getErrorStream
      val body = scala.io.Source.fromInputStream(is, "UTF-8").mkString
      conn.disconnect()
      (code, body)
    }

    try {
      // submit via REST
      val (sc, sBody) = call("POST", "/jobs/submit?pipeline=sum_by_key")
      assert(sc == 200, sBody)
      val id = """"id":"([^"]+)"""".r.findFirstMatchIn(sBody).get.group(1)
      assert(sBody.contains(""""status":"RUNNING""""))
      // unknown pipeline is a 404, not a crash
      assert(call("POST", "/jobs/submit?pipeline=nope")._1 == 404)

      in.addData(("a", 1.0), ("b", 2.0))
      spark.streams.get(java.util.UUID.fromString(id)).processAllAvailable()

      assert(call("GET", "/jobs")._2.contains(id))
      assert(call("GET", s"/jobs/$id/status")._2.contains("RUNNING"))
      val deadline = System.currentTimeMillis() + 10000
      var metrics = call("GET", s"/jobs/$id/metrics")
      while ((metrics._1 != 200 || !metrics._2.contains(""""numInputRows":2""")) &&
             System.currentTimeMillis() < deadline) {
        Thread.sleep(100); metrics = call("GET", s"/jobs/$id/metrics")
      }
      assert(metrics._2.contains(""""numInputRows":2"""), metrics._2)

      // cancel, savepoint the stopped checkpoint, recover from it via REST
      assert(call("POST", s"/jobs/$id/cancel")._2.contains("true"))
      assert(call("GET", s"/jobs/$id/status")._2.contains("FINISHED"))
      val (spc, spBody) = call("POST",
        s"/jobs/savepoint?checkpoint=${java.net.URLEncoder.encode(ckpt, "UTF-8")}&name=sp1&root=${java.net.URLEncoder.encode(spRoot, "UTF-8")}")
      assert(spc == 200, spBody)
      // savepoint name collision -> 400 with the require message
      assert(call("POST",
        s"/jobs/savepoint?checkpoint=${java.net.URLEncoder.encode(ckpt, "UTF-8")}&name=sp1&root=${java.net.URLEncoder.encode(spRoot, "UTF-8")}")._1 == 400)

      in.addData(("a", 4.0))
      val (rc, rBody) = call("POST",
        s"/jobs/recover?pipeline=sum_by_key&name=sp1&root=${java.net.URLEncoder.encode(spRoot, "UTF-8")}")
      assert(rc == 200, rBody)
      val rid = """"id":"([^"]+)"""".r.findFirstMatchIn(rBody).get.group(1)
      val rq = spark.streams.get(java.util.UUID.fromString(rid))
      rq.processAllAvailable()
      val recovered = spark.table("http_sink_1").as[(String, Double)].collect().toMap
      assert(recovered == Map("a" -> 5.0, "b" -> 2.0), s"got $recovered")
      call("POST", s"/jobs/$rid/cancel")
    } finally {
      spark.streams.active.foreach(_.stop())
      http.close()
      js.close()
    }
  }
}
