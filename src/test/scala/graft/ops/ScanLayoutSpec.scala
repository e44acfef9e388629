package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The fan-out width law (r15 verdict: raw `defaultParallelism` made
  * the fan-out queries SLOWER at local[32] than at local[8] — width
  * must grow with data size, never jump straight to the core count).
  */
class ScanLayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def p: Int = spark.sparkContext.defaultParallelism

  test("fanOutWidth: a tiny frame gets the floor, not the core count") {
    val docs = graft.sources.Tables(spark, sf).documents
      .select("doc_id", "text")
    val expected = math.min(p, math.max(p / 4, math.min(p, 8)))
    assert(ScanLayout.fanOutWidth(docs) == expected,
      s"tiny-frame width should be the floor ($expected) at parallelism $p")
    assert(ScanLayout.fanOutWidth(docs) <= p)
  }

  test("fanOutWidth: grows one partition per 16 MiB of plan-stat bytes, capped at parallelism") {
    // range(n) has exact size statistics (8 bytes a row) — a convenient
    // dial for the size axis without writing big files
    def width(rows: Long): Int =
      ScanLayout.fanOutWidth(spark.range(rows).toDF())
    val perPart = ScanLayout.FanOutBytesPerPartition / 8
    val floor = math.min(p, math.max(p / 4, math.min(p, 8)))
    assert(width(1000) == floor, "small range stays at the floor")
    // enough bytes for exactly p partitions: width saturates at p
    assert(width(perPart * (p + 10)) == p, "big frame saturates at parallelism")
  }

  test("fanOut spreads an under-parallelized scan to fanOutWidth partitions") {
    val docs = graft.sources.Tables(spark, sf).documents
      .select("doc_id", "text")
    assert(ScanLayout.underParallelized(docs))
    val spread = ScanLayout.fanOut(docs)
    assert(spread.rdd.getNumPartitions == ScanLayout.fanOutWidth(docs))
    // identity on already-spread frames: fanOut after fanOut is a no-op
    assert(ScanLayout.fanOut(spread) eq spread)
  }

  test("pinForPasses pins at fanOutWidth and the release handle unpersists") {
    val docs = graft.sources.Tables(spark, sf).documents
      .select("doc_id", "text")
    val (pinned, release, didPin) = ScanLayout.pinForPasses(docs)
    try {
      assert(didPin)
      assert(pinned.rdd.getNumPartitions == ScanLayout.fanOutWidth(docs))
      assert(pinned.count() == docs.count())
      assert(pinned.storageLevel.useMemory)
    } finally release()
    assert(!pinned.storageLevel.useMemory, "release() must unpersist the pin")
  }
}
