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

  // ---- banded, retraction-capable (CDC) variant ----

  // CDC rows: (op, is_left, k, lv, rv)
  private val lproj = Seq(col("k"), col("lv"))
  private val rproj = Seq(col("k"), col("rv"))

  test("retraction CDC converges to the join of the net tables under random batch cuts") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val base = TempDirs.create("graft_joinview_cdc")
    JoinView.initCdc(spark, base,
      Seq.empty[(Long, Long)].toDF("k", "lv"),
      Seq.empty[(Long, Long)].toDF("k", "rv"), Seq("k"), bands = 4)
    // generate inserts, duplicate inserts (real multiplicity), deletes
    // of live rows, and -U/+U update pairs; track the net Z-multisets
    val rnd = new scala.util.Random(19)
    val live = Seq(scala.collection.mutable.Map.empty[(Long, Long), Long],
                   scala.collection.mutable.Map.empty[(Long, Long), Long])
    val events = scala.collection.mutable.ArrayBuffer.empty[(String, Boolean, Long, Long, Long)]
    def insert(side: Int, k: Long, v: Long, op: String = "+I"): Unit = {
      live(side)((k, v)) = live(side).getOrElse((k, v), 0L) + 1
      events += ((op, side == 0, k, if (side == 0) v else -1L, if (side == 1) v else -1L))
    }
    def delete(side: Int, op: String = "-D"): Unit = {
      val liveRows = live(side).filter(_._2 > 0).keys.toSeq.sorted
      if (liveRows.nonEmpty) {
        val (k, v) = liveRows(rnd.nextInt(liveRows.size))
        live(side)((k, v)) -= 1
        events += ((op, side == 0, k, if (side == 0) v else -1L, if (side == 1) v else -1L))
      }
    }
    for (_ <- 1 to 240) {
      val side = rnd.nextInt(2)
      rnd.nextInt(10) match {
        case d if d < 5 => insert(side, rnd.nextInt(10).toLong, rnd.nextInt(8).toLong)
        case d if d < 8 => delete(side)
        case _ => // update = -U old + +U new in the SAME stream
          delete(side, op = "-U")
          insert(side, rnd.nextInt(10).toLong, rnd.nextInt(8).toLong, op = "+U")
      }
    }
    val in = MemoryStream[(String, Boolean, Long, Long, Long)]
    val q = JoinView.ingestCdcStream(spark,
      in.toDF().toDF("op", "is_left", "k", "lv", "rv"), base,
      col("is_left"), "op", lproj, rproj, ephemeralOk = true)
    try {
      var rest = events.toSeq
      while (rest.nonEmpty) {
        val take = 1 + rnd.nextInt(40)
        in.addData(rest.take(take): _*); q.processAllAvailable()
        rest = rest.drop(take)
      }
    } finally q.stop()
    // expected bag: per key, every (lv count) x (rv count) product
    val want = (for {
      ((k, lv), cl) <- live(0).toSeq.filter(_._2 > 0)
      ((k2, rv), cr) <- live(1).toSeq.filter(_._2 > 0)
      if k == k2
    } yield ((k, lv, rv), cl * cr)).groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val got = JoinView.readCdc(spark, base).as[(Long, Long, Long)].collect()
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(got == want)
    assert(want.values.exists(_ > 1), "generator must exercise real multiplicity > 1")
    // counted form agrees
    val counted = JoinView.readCdcCounted(spark, base)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (k, lv, rv, m) => ((k, lv, rv), m) }.toMap
    assert(counted == want)
    // a re-delivered batch id is a no-op
    JoinView.ingestCdc(spark, base, 0L,
      Seq(("+I", true, 1L, 1L, -1L)).toDF("op", "is_left", "k", "lv", "rv"),
      col("is_left"), "op", lproj, rproj)
    assert(JoinView.readCdc(spark, base).count() == want.values.sum)
  }

  test("CDC folds rewrite ONLY the touched bands; untouched generations ride the swap") {
    val base = TempDirs.create("graft_joinview_bands")
    JoinView.initCdc(spark, base,
      (0L until 64L).map(k => (k, k * 10)).toDF("k", "lv"),
      (0L until 64L).map(k => (k, k * 100)).toDF("k", "rv"),
      Seq("k"), bands = 8)
    val before = Catalog.gens(spark, base)
    JoinView.ingestCdc(spark, base, 0L,
      Seq(("+I", false, 3L, -1L, 999L)).toDF("op", "is_left", "k", "lv", "rv"),
      col("is_left"), "op", lproj, rproj)
    val after = Catalog.gens(spark, base)
    val changed = after.filter { case (n, g) => before(n) != g }.keys.toSet
    // one right row: exactly its key's right band and view band move
    assert(changed.size == 2, s"expected 2 banded stores touched, got $changed")
    assert(changed.count(_.startsWith("right__b")) == 1)
    assert(changed.count(_.startsWith("view__b")) == 1)
    // and the view really grew by the one new pairing
    assert(JoinView.readCdc(spark, base).where(col("rv") === 999L).count() == 1)
  }

  test("out-of-order CDC (delete replayed before its insert) nets correctly") {
    val base = TempDirs.create("graft_joinview_ooo")
    JoinView.initCdc(spark, base,
      Seq.empty[(Long, Long)].toDF("k", "lv"),
      Seq((5L, 50L)).toDF("k", "rv"), Seq("k"), bands = 2)
    def batch(bid: Long, op: String): Unit =
      JoinView.ingestCdc(spark, base, bid,
        Seq((op, true, 5L, 7L, -1L)).toDF("op", "is_left", "k", "lv", "rv"),
        col("is_left"), "op", lproj, rproj)
    batch(0L, "-D") // delete arrives first: negative count retained, invisible
    assert(JoinView.readCdc(spark, base).count() == 0)
    batch(1L, "+I") // its insert lands: net zero, still absent
    assert(JoinView.readCdc(spark, base).count() == 0)
    batch(2L, "+I") // a second insert: net +1, present exactly once
    assert(JoinView.readCdc(spark, base).as[(Long, Long, Long)].collect().toSeq
      == Seq((5L, 7L, 50L)))
  }

  test("a crash between CDC band folds is all-or-nothing; the replay converges") {
    val base = TempDirs.create("graft_joinview_cdc_crash")
    JoinView.initCdc(spark, base,
      Seq((1L, 10L)).toDF("k", "lv"), Seq((1L, 20L)).toDF("k", "rv"),
      Seq("k"), bands = 4)
    val batch = Seq(("+I", true, 1L, 11L, -1L), ("-D", false, 1L, -1L, 20L),
      ("+I", false, 1L, -1L, 21L)).toDF("op", "is_left", "k", "lv", "rv")
    for (failAfter <- 0 to 2) {
      intercept[IllegalStateException] {
        JoinView.ingestCdcImpl(spark, base, 0L, batch, col("is_left"), "op",
          lproj, rproj, derived = Nil, failAfter = failAfter)
      }
      assert(JoinView.readCdc(spark, base).as[(Long, Long, Long)].collect().toSet
        == Set((1L, 10L, 20L)), s"failAfter=$failAfter must not tear the view")
    }
    JoinView.ingestCdc(spark, base, 0L, batch, col("is_left"), "op", lproj, rproj)
    // rv=20 retracted: view = {10,11} x {21}
    assert(JoinView.readCdc(spark, base).as[(Long, Long, Long)].collect().toSet
      == Set((1L, 10L, 21L), (1L, 11L, 21L)))
  }

  test("a derived aggregate folds the SIGNED view delta and retracts exactly") {
    val base = TempDirs.create("graft_joinview_cdc_agg")
    JoinView.initCdc(spark, base,
      Seq.empty[(Long, Long)].toDF("k", "lv"),
      Seq.empty[(Long, Long)].toDF("k", "rv"), Seq("k"), bands = 2)
    Catalog.addStore(spark, base, "agg",
      Seq.empty[(Long, Long, Long)].toDF("k", "n", "sum_rv"))
    val aggFold = Seq("agg" -> ((cur: DataFrame, dv: DataFrame) =>
      cur.unionByName(dv.groupBy(col("k")).agg(
          sum(col(JoinView.MultCol)).as("n"),
          sum(col("rv") * col(JoinView.MultCol)).as("sum_rv")))
        .groupBy(col("k")).agg(sum(col("n")).as("n"), sum(col("sum_rv")).as("sum_rv"))
        // retire only when EVERY measure is zero (transient n=0 with a
        // nonzero sum is live out-of-order state, not a retired group)
        .where(col("n") =!= 0 || col("sum_rv") =!= 0)))
    def ing(bid: Long, rows: Seq[(String, Boolean, Long, Long, Long)]): Unit =
      JoinView.ingestCdc(spark, base, bid,
        rows.toDF("op", "is_left", "k", "lv", "rv"),
        col("is_left"), "op", lproj, rproj, derived = aggFold)
    def aggNow = Catalog.read(spark, base, "agg")
      .as[(Long, Long, Long)].collect().toSet
    def fromView = JoinView.readCdc(spark, base).groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("rv")).as("sum_rv"))
      .as[(Long, Long, Long)].collect().toSet
    ing(0, Seq(("+I", true, 1L, 10L, -1L), ("+I", true, 1L, 11L, -1L),
      ("+I", false, 1L, -1L, 20L)))
    assert(aggNow == Set((1L, 2L, 40L)) && aggNow == fromView)
    ing(1, Seq(("-D", true, 1L, 10L, -1L), ("+I", false, 1L, -1L, 21L)))
    assert(aggNow == Set((1L, 2L, 41L)) && aggNow == fromView)
    // retract the whole right side: the group must RETIRE, not linger at 0
    ing(2, Seq(("-D", false, 1L, -1L, 20L), ("-D", false, 1L, -1L, 21L)))
    assert(aggNow.isEmpty && JoinView.readCdc(spark, base).count() == 0)
    // OUT-OF-ORDER regression: a delete of rv=20 lands BEFORE its
    // insert, alongside an insert of rv=21 — the group transits
    // (n=0, sum_rv=1), which an n-only retire predicate would DROP,
    // permanently corrupting the aggregate when the late insert lands
    ing(3, Seq(("+I", true, 2L, 30L, -1L)))
    ing(4, Seq(("-D", false, 2L, -1L, 20L), ("+I", false, 2L, -1L, 21L)))
    assert(aggNow == Set((2L, 0L, 1L)),
      "the transient zero-count group must survive as in-flight signed state")
    ing(5, Seq(("+I", false, 2L, -1L, 20L))) // the late insert arrives
    assert(aggNow == Set((2L, 1L, 21L)) && aggNow == fromView)
  }

  test("re-initCdc at the same path refreshes the cached (bands, keys) meta") {
    val base = TempDirs.create("graft_joinview_reinit")
    JoinView.initCdc(spark, base,
      Seq.empty[(Long, Long)].toDF("k", "lv"),
      Seq.empty[(Long, Long)].toDF("k", "rv"), Seq("k"), bands = 2)
    JoinView.readCdcCounted(spark, base) // warm the per-path meta cache
    // stand the SAME path up again with different geometry — a stale
    // cached bands=2 would make every later read/fold band against the
    // wrong store set (here: miss the initial rows hashed to bands 2–3)
    val ks = (0L until 8L).toSeq
    JoinView.initCdc(spark, base,
      ks.map(k => (k, k * 10)).toDF("k", "lv"),
      ks.map(k => (k, k * 100)).toDF("k", "rv"), Seq("k"), bands = 4)
    assert(JoinView.readCdc(spark, base).as[(Long, Long, Long)].collect().toSet
      == ks.map(k => (k, k * 10, k * 100)).toSet)
  }

  test("CDC rejects an unknown op in-plan") {
    val base = TempDirs.create("graft_joinview_badop")
    JoinView.initCdc(spark, base,
      Seq.empty[(Long, Long)].toDF("k", "lv"),
      Seq.empty[(Long, Long)].toDF("k", "rv"), Seq("k"), bands = 2)
    val e = intercept[Exception] {
      JoinView.ingestCdc(spark, base, 0L,
        Seq(("??", true, 1L, 1L, -1L)).toDF("op", "is_left", "k", "lv", "rv"),
        col("is_left"), "op", lproj, rproj)
    }
    assert(e.getMessage != null)
  }
}
