package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.{Catalog, TempDirs}

class JoinViewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // change rows: (is_left, k, lv, rv) — lv meaningful on left rows,
  // rv on right rows (the wide-union CDC encoding)
  private def pl(b: DataFrame) = b.select(col("k"), col("lv"))
  private def pr(b: DataFrame) = b.select(col("k"), col("rv"))

  private def mkChanges(seed: Int, n: Int): Seq[(Boolean, Long, Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Seq.tabulate(n) { i =>
      val left = rnd.nextBoolean()
      (left, rnd.nextInt(12).toLong, if (left) rnd.nextInt(100).toLong else -1L,
        if (left) -1L else rnd.nextInt(100).toLong)
    }
  }

  private def batchJoin(rows: Seq[(Boolean, Long, Long, Long)]): Set[(Long, Long, Long)] = {
    val l = rows.filter(_._1).map(r => (r._2, r._3))
    val r = rows.filterNot(_._1).map(r => (r._2, r._4))
    (for ((k, lv) <- l; (k2, rv) <- r if k == k2) yield (k, lv, rv)).toSet
  }

  test("streamed CDC converges to the batch join under random batch cuts; replays no-op") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val base = TempDirs.create("graft_joinview")
    val rows = mkChanges(seed = 7, n = 120)
    JoinView.init(spark,
      base,
      Seq.empty[(Long, Long)].toDF("k", "lv"),
      Seq.empty[(Long, Long)].toDF("k", "rv"), Seq("k"))
    val in = MemoryStream[(Boolean, Long, Long, Long)]
    val folds = JoinView.folds(spark, base, Seq("k"), col("is_left"), pl, pr)
    val q = Catalog.ingestStream(spark,
      in.toDF().toDF("is_left", "k", "lv", "rv"), base, folds,
      ephemeralOk = true)
    try {
      val rnd = new scala.util.Random(11)
      var rest = rows
      while (rest.nonEmpty) {
        val take = 1 + rnd.nextInt(25)
        in.addData(rest.take(take): _*); q.processAllAvailable()
        rest = rest.drop(take)
      }
    } finally q.stop()
    val got = JoinView.read(spark, base)
      .as[(Long, Long, Long)].collect()
    // multiset equality: duplicate (k, lv, rv) combinations are real
    // join multiplicity and must be preserved
    def ms(xs: Seq[(Long, Long, Long)]) = xs.groupBy(identity).view.mapValues(_.size).toMap
    val l = rows.filter(_._1).map(r => (r._2, r._3))
    val r = rows.filterNot(_._1).map(r => (r._2, r._4))
    val want = for ((k, lv) <- l; (k2, rv) <- r if k == k2) yield (k, lv, rv)
    assert(ms(got.toSeq) == ms(want))
    // a re-delivered batch id is a no-op across all three stores
    val before = got.length
    Catalog.ingest(spark, base, 0L,
      Seq((true, 1L, 1L, -1L)).toDF("is_left", "k", "lv", "rv"), folds)
    assert(JoinView.read(spark, base).count() == before)
  }

  test("a crash between folds leaves view and sides mutually consistent (all-or-nothing)") {
    val base = TempDirs.create("graft_joinview_crash")
    JoinView.init(spark, base,
      Seq((1L, 10L)).toDF("k", "lv"), Seq((1L, 20L)).toDF("k", "rv"), Seq("k"))
    val folds = JoinView.folds(spark, base, Seq("k"), col("is_left"), pl, pr)
    val batch = Seq((true, 1L, 11L, -1L), (false, 1L, -1L, 21L))
      .toDF("is_left", "k", "lv", "rv")
    for (failAfter <- 0 to 3) {
      intercept[IllegalStateException] {
        Catalog.ingestImpl(spark, base, 0L, batch, folds, failAfter)
      }
      assert(JoinView.read(spark, base).as[(Long, Long, Long)].collect().toSet
        == Set((1L, 10L, 20L)), s"failAfter=$failAfter must not tear the view")
      assert(Catalog.read(spark, base, "left").count() == 1)
    }
    // the replay lands everything exactly once: view = {10,11}x{20,21}
    Catalog.ingest(spark, base, 0L, batch, folds)
    assert(JoinView.read(spark, base).as[(Long, Long, Long)].collect().toSet
      == Set((1L, 10L, 20L), (1L, 10L, 21L), (1L, 11L, 20L), (1L, 11L, 21L)))
  }

  test("colliding non-key columns fail fast") {
    intercept[IllegalArgumentException] {
      JoinView.init(spark, TempDirs.create("graft_joinview_bad"),
        Seq((1L, 1L)).toDF("k", "v"), Seq((1L, 2L)).toDF("k", "v"), Seq("k"))
    }
  }
  test("a derived aggregate store folds the same delta and never tears from the view") {
    val base = TempDirs.create("graft_joinview_agg")
    JoinView.init(spark, base,
      Seq.empty[(Long, Long)].toDF("k", "lv"),
      Seq.empty[(Long, Long)].toDF("k", "rv"), Seq("k"))
    Catalog.addStore(spark, base, "agg",
      Seq.empty[(Long, Long, Long)].toDF("k", "n", "sum_rv"))
    val dlt = JoinView.delta(spark, base, Seq("k"), col("is_left"), pl, pr) _
    val folds = JoinView.folds(spark, base, Seq("k"), col("is_left"), pl, pr) :+
      ("agg" -> ((cur: DataFrame, b: DataFrame) =>
        cur.unionByName(dlt(b).groupBy(col("k"))
            .agg(count(lit(1)).as("n"), sum(col("rv")).as("sum_rv")))
          .groupBy(col("k"))
          .agg(sum(col("n")).as("n"), sum(col("sum_rv")).as("sum_rv"))))
    val rows = mkChanges(seed = 31, n = 80)
    rows.grouped(17).zipWithIndex.foreach { case (b, i) =>
      Catalog.ingest(spark, base, i.toLong,
        b.toDF("is_left", "k", "lv", "rv"), folds)
    }
    // the aggregate equals a one-shot group-by over the converged view
    val fromView = JoinView.read(spark, base).groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("rv")).as("sum_rv"))
      .as[(Long, Long, Long)].collect().toSet
    val agg = Catalog.read(spark, base, "agg")
      .as[(Long, Long, Long)].collect().toSet
    assert(agg == fromView && agg.nonEmpty)
    // a crash between folds tears NEITHER store (one manifest swap)
    val before = agg
    intercept[IllegalStateException] {
      Catalog.ingestImpl(spark, base, 99L,
        Seq((true, 1L, 1L, -1L)).toDF("is_left", "k", "lv", "rv"), folds,
        failAfter = 3)
    }
    assert(Catalog.read(spark, base, "agg")
      .as[(Long, Long, Long)].collect().toSet == before)
  }
}
