package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Window-assignment invariants (SURVEY §5.4): properties of the
  * reference's assigners (stateful.py:42-85) that must hold for Spark's
  * `window()` too. Checked over a pseudo-random timestamp sample.
  */
class WindowAssignSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sample = spark.range(2000)
    .select(timestamp_micros((abs(xxhash64(col("id"))) % (30L * 86400 * 1000000)).cast("long")).as("ts"))

  test("tumbling: every ts lands in exactly one window, aligned and covering") {
    val w = sample.select(col("ts"), window(col("ts"), "10 minutes").as("w"))
      .select(unix_millis(col("ts")).as("ms"), unix_millis(col("w.start")).as("s"), unix_millis(col("w.end")).as("e"))
    // one row per input ts (exactly one window)
    assert(w.count() == 2000)
    // start = ts div size * size; ts in [start, end); end-start = size
    val bad = w.where(!(col("s") === (col("ms").divide(600000).cast("long")) * 600000 &&
      col("ms") >= col("s") && col("ms") < col("e") && col("e") - col("s") === 600000)).count()
    assert(bad == 0)
  }

  test("sliding: every ts lands in exactly size/slide windows, each containing it") {
    val w = sample.select(col("ts"), window(col("ts"), "30 minutes", "10 minutes").as("w"))
      .select(unix_millis(col("ts")).as("ms"), unix_millis(col("w.start")).as("s"), unix_millis(col("w.end")).as("e"))
    assert(w.count() == 2000 * 3)
    val bad = w.where(!(col("s") % 600000 === 0 &&
      col("ms") >= col("s") && col("ms") < col("e") && col("e") - col("s") === 1800000)).count()
    assert(bad == 0)
    // exactly 3 distinct windows per ts
    val counts = w.groupBy(col("ms")).agg(countDistinct(col("s")).as("n"))
      .where(col("n") =!= 3).count()
    assert(counts == 0)
  }

  test("session: gap-merge semantics — events closer than gap share a session") {
    val ts = Seq(0L, 10L, 25L, 100L, 105L, 300L).map(s => (1, new java.sql.Timestamp(s * 1000)))
    val df = ts.toDF("k", "ts")
    val sessions = df.groupBy(session_window(col("ts"), "30 seconds"), col("k"))
      .agg(count(lit(1)).as("n"))
      .select(unix_millis(col("session_window.start")).as("s"), col("n"))
      .as[(Long, Long)].collect().sortBy(_._1)
    // gaps: 10,15 (merge), 75 (split), 5 (merge), 195 (split)
    assert(sessions.toSeq == Seq((0L, 3L), (100000L, 2L), (300000L, 1L)))
  }
}
