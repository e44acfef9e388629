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
}
