package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Driver-side replica of the Z-value: min/max normalize each column to
    * `bits` bits (truncating division), interleave bit i of column j at
    * position i·ncols+j.
    */
  private def refZ(rows: Seq[Seq[Long]], bits: Int): Seq[Long] = {
    val ncols = rows.head.size
    val mins = (0 until ncols).map(j => rows.map(_(j)).min)
    val maxs = (0 until ncols).map(j => rows.map(_(j)).max)
    val maxVal = (1L << bits) - 1
    rows.map { r =>
      (0 until ncols).map { j =>
        val span = math.max(maxs(j) - mins(j), 1L)
        val nz = (r(j) - mins(j)) * maxVal / span
        (0 until bits).map(i => ((nz >> i) & 1L) << (i * ncols + j)).sum
      }.sum
    }
  }

  test("zval equals the driver-side replica bit for bit") {
    val rows = Seq(Seq(3L, 900L), Seq(17L, 4L), Seq(255L, 255L),
      Seq(0L, 0L), Seq(1000L, 1L), Seq(512L, 512L))
    val df = rows.map(r => (r(0), r(1))).toDF("a", "b")
    val got = Layout.withZValue(df, Seq(col("a"), col("b")), bits = 16)
      .select(col("a"), col("b"), col("zval"))
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, z) => (Seq(a, b), z) }.toMap
    val want = rows.zip(refZ(rows, 16)).toMap
    assert(got == want)
  }

  test("interleave places low bits adjacently: two tiny cols give the classic morton order") {
    // 2-bit curve over a 2x2 grid: (0,0)->0 (1,0)->1 (0,1)->2 (1,1)->3
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L)).toDF("a", "b")
    val got = Layout.withZValue(df, Seq(col("a"), col("b")), bits = 1)
      .select(col("a"), col("b"), col("zval")).as[(Long, Long, Long)]
      .collect().toSet
    assert(got == Set((0L, 0L, 0L), (1L, 0L, 1L), (0L, 1L, 2L), (1L, 1L, 3L)))
  }

  test("range guard: a column wider than the exact-arithmetic bound fails loudly") {
    val df = Seq((0L, 1L), (1L << 60, 2L)).toDF("a", "b")
    val ex = intercept[Exception] {
      Layout.withZValue(df, Seq(col("a"), col("b")), bits = 16).collect()
    }
    assert(ex.getMessage != null && ex.getMessage.contains("exact-arithmetic bound"))
  }

  test("zorderWrite: every file covers a small hyper-box on BOTH columns (linear sort does not)") {
    // 100k rows over two independent uniform dimensions
    val n = 100000L
    val df = spark.range(n).select(
      pmod(xxhash64(col("id")), lit(4096L)).as("a"),
      pmod(xxhash64(col("id") + 7777777L), lit(4096L)).as("b"))
    val zDir = java.nio.file.Files.createTempDirectory("graft_zorder").toString + "/z"
    val linDir = java.nio.file.Files.createTempDirectory("graft_zorder").toString + "/lin"
    Layout.zorderWrite(df, Seq(col("a"), col("b")), zDir, numFiles = 16)
    df.repartitionByRange(16, col("a")).sortWithinPartitions(col("a"))
      .write.mode("overwrite").parquet(linDir)

    // avg per-file normalized bounding-box AREA — the quantity parquet
    // min/max pruning sees. Linear layout: tight on a, full-range on b
    // (area ~ 1/16); zorder: tight-ish on BOTH (area ~ 1/16 spread over
    // both dims, and crucially max per-dim span << full range)
    def boxes(dir: String): Seq[(Double, Double)] =
      spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(((max(col("a")) - min(col("a"))) / 4095.0).as("ra"),
          ((max(col("b")) - min(col("b"))) / 4095.0).as("rb"))
        .select(col("ra"), col("rb")).as[(Double, Double)].collect().toSeq
    val z = boxes(zDir)
    val lin = boxes(linDir)
    assert(z.size == 16 && lin.size == 16)
    val zWorstB = z.map(_._2).max
    val linWorstB = lin.map(_._2).max
    // linear layout leaves b unconstrained (~full range); zorder bounds it
    assert(linWorstB > 0.9, s"test premise broken: linear b-span $linWorstB")
    assert(zWorstB <= 0.6, s"zorder failed to localize b: worst span $zWorstB")
    // A predicate STRIP — wide on a, narrow on b — overlaps far fewer
    // zorder files. The contrast is structural, not marginal: every
    // linear file spans ~the full b range and the strip's a range
    // covers all 16 a segments (all 16 files hit, deterministically),
    // while the strip b∈[100,900] sits inside the bottom level-2 curve
    // row (b < 1024) whose cells own 4 of the 16 equal-count z
    // segments — so zorder hits ~4 files, ≤8 even when the sampled
    // range boundaries of repartitionByRange bleed a neighbor file
    // into each hit cell. (The previous quarter-box variant compared
    // 4-vs-4±1 and flaked on exactly that sampling noise.)
    def hits(dir: String): Long = {
      val files = spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min(col("a")).as("mna"), max(col("a")).as("mxa"),
          min(col("b")).as("mnb"), max(col("b")).as("mxb"))
      files.where(col("mna") <= 3995 && col("mxa") >= 100 &&
        col("mnb") <= 900 && col("mxb") >= 100).count()
    }
    val zHits = hits(zDir)
    val linHits = hits(linDir)
    assert(linHits >= 15,
      s"test premise broken: a-wide strip should touch every linear file, got $linHits")
    assert(zHits <= 8,
      s"zorder should confine a b-strip to ~the 4 bottom-row curve cells: z=$zHits")
    assert(zHits * 2 < linHits,
      s"a b-strip predicate should touch far fewer zorder files: z=$zHits lin=$linHits")
  }

  test("zorderWrite plan: one range exchange, narrow curve computation") {
    val df = spark.range(1000).select(
      pmod(col("id"), lit(100L)).as("a"), pmod(col("id") * 7, lit(100L)).as("b"))
    val planned = Layout.withZValue(df, Seq(col("a"), col("b")), bits = 8)
      .repartitionByRange(4, col("zval")).sortWithinPartitions(col("zval"))
    val p = planned.queryExecution.executedPlan.toString
    assert(p.contains("Exchange rangepartitioning"), s"no range exchange:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"curve computation should not hash-shuffle:\n$p")
  }
}
