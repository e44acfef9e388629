package graft.core

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SwapStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("init / read / lastBatch / fold lifecycle") {
    val path = TempDirs.create("swapstore_spec")
    SwapStore.init(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), path)
    assert(SwapStore.lastBatch(spark, path) == -1L)
    assert(SwapStore.read(spark, path).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")))
    SwapStore.fold(spark, path, 0L)(_.withColumn("v", upper(col("v"))))
    assert(SwapStore.lastBatch(spark, path) == 0L)
    assert(SwapStore.read(spark, path).as[(Long, String)].collect().toSet ==
      Set((1L, "A"), (2L, "B")))
  }

  test("fold: stale and equal batch ids are no-ops; only ascending ids apply") {
    val path = TempDirs.create("swapstore_replay")
    SwapStore.init(Seq((1L, 10L)).toDF("k", "n"), path)
    SwapStore.fold(spark, path, 5L)(_.withColumn("n", col("n") + 1))
    for (stale <- Seq(0L, 5L)) {
      SwapStore.fold(spark, path, stale)(_.withColumn("n", col("n") + 100))
      assert(SwapStore.read(spark, path).as[(Long, Long)].collect().head == ((1L, 11L)),
        s"batch $stale must be a no-op")
    }
    // ids need not be contiguous — only ascending
    SwapStore.fold(spark, path, 42L)(_.withColumn("n", col("n") + 1))
    assert(SwapStore.read(spark, path).as[(Long, Long)].collect().head == ((1L, 12L)))
    assert(SwapStore.lastBatch(spark, path) == 42L)
  }

  test("a crashed previous attempt's leftover _store.next does not block the next fold") {
    val path = TempDirs.create("swapstore_crash")
    SwapStore.init(Seq((1L, 1L)).toDF("k", "n"), path)
    // simulate a crash AFTER writing the staging dir but BEFORE the swap
    Seq((9L, 9L)).toDF("k", "n").write.parquet(s"$path/_store.next/data")
    SwapStore.fold(spark, path, 0L)(_.withColumn("n", col("n") * 2))
    assert(SwapStore.read(spark, path).as[(Long, Long)].collect().head == ((1L, 2L)))
  }

  test("init over an existing store replaces it atomically and resets the ledger") {
    val path = TempDirs.create("swapstore_reinit")
    SwapStore.init(Seq((1L, "old")).toDF("k", "v"), path)
    SwapStore.fold(spark, path, 3L)(identity)
    SwapStore.init(Seq((2L, "new")).toDF("k", "v"), path)
    assert(SwapStore.lastBatch(spark, path) == -1L)
    assert(SwapStore.read(spark, path).as[(Long, String)].collect().toSet ==
      Set((2L, "new")))
  }
}
