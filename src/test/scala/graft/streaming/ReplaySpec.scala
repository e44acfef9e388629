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

  test("appendSlice arrives as the FINAL micro-batch regardless of its content") {
    // the appended slice carries SMALLER order values than every real
    // slice — delivery order must still come from the mtime, not the data
    val df = Seq((1L, 5000L), (2L, 6000L), (3L, 7000L), (4L, 8000L))
      .toDF("id", "ms")
    val dir = java.nio.file.Files.createTempDirectory("graft_replay_a").toString
    Replay.writeOrderedSlices(df, col("ms"), dir, slices = 2)
    Replay.appendSlice(dir, Seq((99L, 1000L)).toDF("id", "ms"), 2)

    val batches = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
    val q = Replay.orderedStream(spark, dir, df.schema)
      .writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val ids = b.select(col("id")).collect().map(_.getLong(0)).toSet
        if (ids.nonEmpty) batches.synchronized { batches += ids }
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    assert(batches.size == 3, s"expected 3 batches: $batches")
    assert(batches.last == Set(99L), s"appended slice not delivered last: $batches")
  }

  test("writeShuffledSlices delivers slices in the given permutation") {
    // content ranges are the ORDERED slices; only delivery order moves.
    // Same fixture as the ordered test: 4 ranges over ms [1000, 9000].
    val df = Seq((1L, 1000L), (2L, 2000L), (3L, 3000L), (4L, 4500L),
      (5L, 5500L), (6L, 7000L), (7L, 8000L), (8L, 9000L)).toDF("id", "ms")
    val dir = java.nio.file.Files.createTempDirectory("graft_replay_p").toString
    Replay.writeShuffledSlices(df, col("ms"), dir, Seq(1, 0, 3, 2))

    val batches = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
    val q = Replay.orderedStream(spark, dir, df.schema)
      .writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val ids = b.select(col("id")).collect().map(_.getLong(0)).toSet
        if (ids.nonEmpty) batches.synchronized { batches += ids }
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    // ordered ranges over [1000, 9001), N=8001: [1000,3000)={1,2},
    // [3000,5000)={3,4}, [5000,7000)={5}, [7000,9001)={6,7,8};
    // delivered as 1,0,3,2
    assert(batches.toSeq == Seq(Set(3L, 4L), Set(1L, 2L), Set(6L, 7L, 8L), Set(5L)),
      s"permuted delivery order not honored: $batches")
  }

  test("slice-index inverse formula matches the range boundaries (q130 oracle contract)") {
    // the q130 oracle recovers a row's slice as ((v-lo)*k + k-1) // N —
    // pin its equivalence to writeOrderedSlices' boundary formula
    // a_i = lo + N*i/k over adversarial (N, k) shapes
    for (k <- Seq(2, 3, 4, 8); n <- Seq(k, k + 1, 2 * k - 1, 10, 97, 3501)) {
      val lo = 1704067200000L
      val bounds = (0 to k).map(i => lo + n.toLong * i / k)
      for (v <- lo until (lo + n)) {
        val byRange = bounds.sliding(2).indexWhere(b => v >= b.head && v < b.last)
        val byFormula = (((v - lo) * k + k - 1) / n).toInt
        assert(byRange == byFormula,
          s"slice mismatch at v=$v (N=$n, k=$k): range=$byRange formula=$byFormula")
      }
    }
  }

  test("guards: no rows, bad slice count, bad append index") {
    assertThrows[IllegalArgumentException] {
      Replay.appendSlice(
        java.nio.file.Files.createTempDirectory("graft_replay_g3").toString,
        Seq((1L, 1000L)).toDF("id", "ms"), 0)
    }
    val df = Seq((1L, 1000L)).toDF("id", "ms")
    assertThrows[IllegalArgumentException] {
      Replay.writeOrderedSlices(df, col("ms"),
        java.nio.file.Files.createTempDirectory("graft_replay_g").toString, slices = 0)
    }
    // a colliding append index must fail fast, not silently overwrite
    val cdir = java.nio.file.Files.createTempDirectory("graft_replay_g4").toString
    val two = Seq((1L, 1000L), (2L, 2000L)).toDF("id", "ms")
    Replay.writeOrderedSlices(two, col("ms"), cdir, slices = 2)
    assertThrows[IllegalArgumentException] {
      Replay.appendSlice(cdir, df, 1) // slice1 already written
    }
    assertThrows[IllegalArgumentException] {
      Replay.writeShuffledSlices(df, col("ms"),
        java.nio.file.Files.createTempDirectory("graft_replay_g5").toString,
        Seq(0, 2)) // not a permutation
    }
    assertThrows[IllegalArgumentException] {
      Replay.writeOrderedSlices(df.where(col("id") < 0), col("ms"),
        java.nio.file.Files.createTempDirectory("graft_replay_g2").toString)
    }
  }
}
