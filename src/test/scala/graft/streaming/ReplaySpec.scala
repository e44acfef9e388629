package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ReplaySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("slices replay in event-time order, one slice per micro-batch, no rows lost") {
    // input deliberately NOT in time order; ms range [1000, 9000]
    val rows: Seq[(Long, Option[Long])] = Seq(
      (7L, Some(8000L)), (1L, Some(1000L)), (5L, Some(5500L)), (3L, Some(3000L)),
      (8L, Some(9000L)), (2L, Some(2000L)), (6L, Some(7000L)), (4L, Some(4500L)),
      (9L, None)) // null order value: dropped from the replay
    val df = rows.toDF("id", "ms")
    val dir = java.nio.file.Files.createTempDirectory("graft_replay").toString
    Replay.writeOrderedSlices(df, col("ms"), dir, slices = 4)

    val batches = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val q = Replay.orderedStream(spark, dir, df.schema)
      .writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val r = b.agg(count(lit(1)), min(col("ms")), max(col("ms"))).head
        if (r.getLong(0) > 0)
          batches.synchronized { batches += ((r.getLong(0), r.getLong(1), r.getLong(2))) }
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()

    assert(batches.map(_._1).sum == 8, s"rows lost or duplicated: $batches")
    // event-time order ACROSS batches: every batch's min >= the previous
    // batch's max — the property the streaming-twin parity oracles need
    batches.toSeq.sliding(2).foreach {
      case Seq((_, _, prevMax), (_, curMin, _)) =>
        assert(curMin >= prevMax, s"batches out of event-time order: $batches")
      case _ =>
    }
    assert(batches.size >= 2, s"expected a multi-batch replay: $batches")
  }

  test("guards: no rows, bad slice count") {
    val df = Seq((1L, 1000L)).toDF("id", "ms")
    assertThrows[IllegalArgumentException] {
      Replay.writeOrderedSlices(df, col("ms"),
        java.nio.file.Files.createTempDirectory("graft_replay_g").toString, slices = 0)
    }
    assertThrows[IllegalArgumentException] {
      Replay.writeOrderedSlices(df.where(col("id") < 0), col("ms"),
        java.nio.file.Files.createTempDirectory("graft_replay_g2").toString)
    }
  }
}
