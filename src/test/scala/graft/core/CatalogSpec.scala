package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CatalogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // three tiny "indexes" over a (k, v) batch: a row count, a per-key
  // sum, and a distinct-key list — shapes enough to tell torn state
  private def folds: Seq[(String, (DataFrame, DataFrame) => DataFrame)] = Seq(
    "cnt" -> ((cur, b) => cur.unionByName(b.agg(count(lit(1)).as("n")))
      .agg(sum(col("n")).as("n"))),
    "sums" -> ((cur, b) => cur.unionByName(b.groupBy("k").agg(sum(col("v")).as("s")))
      .groupBy("k").agg(sum(col("s")).as("s"))),
    "keys" -> ((cur, b) => cur.unionByName(b.select(col("k"))).distinct()))

  private def initStores(base: String): Unit =
    Catalog.init(base, Map(
      "cnt" -> Seq(0L).toDF("n"),
      "sums" -> Seq.empty[(Long, Long)].toDF("k", "s"),
      "keys" -> Seq.empty[Tuple1[Long]].toDF("k")))

  private def snapshot(base: String): (Long, Map[Long, Long], Set[Long]) = (
    Catalog.read(spark, base, "cnt").as[Long].collect().head,
    Catalog.read(spark, base, "sums").as[(Long, Long)].collect().toMap,
    Catalog.read(spark, base, "keys").as[Long].collect().toSet)

  test("ingest folds one batch into every store; replays are no-ops") {
    val base = TempDirs.create("catalog_basic")
    initStores(base)
    assert(Catalog.lastBatch(spark, base) == -1L)
    Catalog.ingest(spark, base, 0L, Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), folds)
    assert(Catalog.lastBatch(spark, base) == 0L)
    assert(snapshot(base) == ((2L, Map(1L -> 10L, 2L -> 20L), Set(1L, 2L))))
    // re-delivery of the same batch id must change nothing
    Catalog.ingest(spark, base, 0L, Seq((9L, 999L)).toDF("k", "v"), folds)
    assert(snapshot(base) == ((2L, Map(1L -> 10L, 2L -> 20L), Set(1L, 2L))))
    Catalog.ingest(spark, base, 1L, Seq((1L, 5L)).toDF("k", "v"), folds)
    assert(snapshot(base) == ((3L, Map(1L -> 15L, 2L -> 20L), Set(1L, 2L))))
  }

  test("a crash at EVERY point of the fold sequence leaves the catalog atomic") {
    // failAfter = 0 (before any store), 1, 2 (mid-sequence), 3 (all
    // stores written, manifest not yet swapped) — in every case the
    // catalog must answer as if the batch never arrived, and the
    // replay must land it exactly once
    for (failAfter <- 0 to 3) {
      val base = TempDirs.create(s"catalog_crash$failAfter")
      initStores(base)
      Catalog.ingest(spark, base, 0L, Seq((1L, 10L)).toDF("k", "v"), folds)
      val before = snapshot(base)
      val batch = Seq((1L, 1L), (3L, 30L)).toDF("k", "v")
      intercept[IllegalStateException] {
        Catalog.ingestImpl(spark, base, 1L, batch, folds, failAfter)
      }
      assert(Catalog.lastBatch(spark, base) == 0L,
        s"failAfter=$failAfter: ledger must not advance")
      assert(snapshot(base) == before,
        s"failAfter=$failAfter: no store may see the torn batch")
      // the replay (the foreachBatch restart path) applies it exactly once
      Catalog.ingest(spark, base, 1L, batch, folds)
      assert(snapshot(base) == ((3L, Map(1L -> 11L, 3L -> 30L), Set(1L, 3L))),
        s"failAfter=$failAfter: replay must converge to the no-crash result")
    }
  }

  test("stores outside the fold set keep their generation and content") {
    val base = TempDirs.create("catalog_subset")
    initStores(base)
    Catalog.ingest(spark, base, 0L, Seq((1L, 10L)).toDF("k", "v"), folds.take(2))
    assert(Catalog.read(spark, base, "keys").count() == 0, "unfolded store untouched")
    assert(Catalog.gens(spark, base)("keys") == -1L)
    assert(Catalog.gens(spark, base)("cnt") == 0L)
  }

  test("superseded generations are deleted; current + previous survive") {
    val base = TempDirs.create("catalog_gc")
    initStores(base)
    Catalog.ingest(spark, base, 0L, Seq((1L, 1L)).toDF("k", "v"), folds)
    Catalog.ingest(spark, base, 1L, Seq((2L, 2L)).toDF("k", "v"), folds)
    val dirs = new java.io.File(s"$base/stores/cnt").listFiles().map(_.getName).toSet
    assert(dirs == Set("g0", "g1"), s"expected current+previous, got $dirs")
  }

  test("continuous ingestion: the streaming form folds each micro-batch atomically") {
    val base = TempDirs.create("catalog_stream")
    initStores(base)
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]
    val q = Catalog.ingestStream(spark, mem.toDF().toDF("k", "v"), base, folds,
      ephemeralOk = true)
    try {
      mem.addData((1L, 10L), (2L, 20L)); q.processAllAvailable()
      mem.addData((1L, 5L)); q.processAllAvailable()
    } finally q.stop()
    assert(snapshot(base) == ((3L, Map(1L -> 15L, 2L -> 20L), Set(1L, 2L))))
    assert(Catalog.lastBatch(spark, base) == 1L)
  }

  test("ingestStreamDynamic: batch-dependent folds touch only the planned stores, re-delivered ids skip planning, a torn dynamic fold replays exactly once") {
    val base = TempDirs.create("catalog_stream_dynamic")
    Catalog.init(base, Map(
      "odd" -> Seq.empty[(Long, Long)].toDF("k", "s"),
      "even" -> Seq.empty[(Long, Long)].toDF("k", "s")))
    // the banded-store shape: the planner inspects the BATCH to decide
    // which stores it touches (here: the key parities present)
    val planned = new java.util.concurrent.atomic.AtomicInteger(0)
    def plan(batch: DataFrame): Seq[(String, (DataFrame, DataFrame) => DataFrame)] = {
      planned.incrementAndGet()
      val pars = batch.select(pmod(col("k"), lit(2L)).as("p"))
        .distinct().as[Long].collect().toSet
      def fold(p: Long): (DataFrame, DataFrame) => DataFrame = (cur, b) =>
        cur.unionByName(b.where(pmod(col("k"), lit(2L)) === p)
            .groupBy("k").agg(sum(col("v")).as("s")))
          .groupBy("k").agg(sum(col("s")).as("s"))
      Seq("even" -> 0L, "odd" -> 1L)
        .collect { case (n, p) if pars(p) => n -> fold(p) }
    }
    def store(n: String) =
      Catalog.read(spark, base, n).as[(Long, Long)].collect().toMap
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]
    val q = Catalog.ingestStreamDynamic(spark, mem.toDF().toDF("k", "v"), base,
      plan, ephemeralOk = true)
    try {
      mem.addData((1L, 10L), (3L, 30L)); q.processAllAvailable() // bid 0: odd only
      assert(Catalog.gens(spark, base)("even") == -1L,
        "a store outside the batch's plan must never fold")
      assert(store("odd") == Map(1L -> 10L, 3L -> 30L))
      mem.addData((2L, 20L), (1L, 5L)); q.processAllAvailable() // bid 1: both
    } finally q.stop()
    assert(planned.get == 2)
    assert(store("odd") == Map(1L -> 15L, 3L -> 30L))
    assert(store("even") == Map(2L -> 20L))
    assert(Catalog.lastBatch(spark, base) == 1L)
    // a restarted query's batch ids begin again at 0 — the shared ledger
    // marks them re-deliveries and the wrapper must skip fold PLANNING
    // entirely (the planner may collect from the batch; a no-op replay
    // must not pay that, and a nondeterministic-looking plan over a
    // different restart batch must not fold)
    val mem2 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]
    val q2 = Catalog.ingestStreamDynamic(spark, mem2.toDF().toDF("k", "v"), base,
      plan, ephemeralOk = true)
    try { mem2.addData((9L, 999L)); q2.processAllAvailable() } finally q2.stop()
    assert(planned.get == 2, "re-delivered batch id must not even plan folds")
    assert(store("odd") == Map(1L -> 15L, 3L -> 30L))
    assert(store("even") == Map(2L -> 20L))
    // crash replay with batch-dependent folds: a torn fold leaves the
    // catalog untouched; the restart path REPLANS from the same batch
    // content, converges on the same store set, and lands exactly once
    val batch = Seq((5L, 50L), (4L, 40L)).toDF("k", "v")
    intercept[IllegalStateException] {
      Catalog.ingestImpl(spark, base, 2L, batch, plan(batch), failAfter = 1)
    }
    assert(Catalog.lastBatch(spark, base) == 1L, "torn batch must not ledger")
    assert(store("odd") == Map(1L -> 15L, 3L -> 30L))
    assert(store("even") == Map(2L -> 20L))
    Catalog.ingest(spark, base, 2L, batch, plan(batch))
    assert(store("odd") == Map(1L -> 15L, 3L -> 30L, 5L -> 50L))
    assert(store("even") == Map(2L -> 20L, 4L -> 40L))
  }

  test("savepoint pins generations against GC; restore rewinds to the fork point and the tail replays") {
    val base = TempDirs.create("catalog_savepoint")
    initStores(base)
    Catalog.ingest(spark, base, 0L, Seq((1L, 10L)).toDF("k", "v"), folds)
    Catalog.savepoint(spark, base, "p0")
    val pinned = snapshot(base)
    Catalog.ingest(spark, base, 1L, Seq((2L, 20L)).toDF("k", "v"), folds)
    Catalog.ingest(spark, base, 2L, Seq((3L, 30L)).toDF("k", "v"), folds)
    def gensOf(store: String) =
      new java.io.File(s"$base/stores/$store").listFiles().map(_.getName).toSet
    assert(gensOf("cnt").contains("g0"),
      "the pinned generation must survive GC two folds later")
    Catalog.restore(spark, base, "p0")
    assert(Catalog.lastBatch(spark, base) == 0L, "ledger rewinds to the pin")
    assert(snapshot(base) == pinned)
    // fork replay with DIFFERENT content than the abandoned timeline;
    // its fold overwrites the orphaned g1 and GCs the orphaned g2
    Catalog.ingest(spark, base, 1L, Seq((9L, 90L)).toDF("k", "v"), folds)
    assert(snapshot(base) == ((2L, Map(1L -> 10L, 9L -> 90L), Set(1L, 9L))))
    assert(!gensOf("cnt").contains("g2"),
      "abandoned future generations are GC'd by the first post-restore fold")
    // the savepoint is a standing fork point: restore again
    Catalog.restore(spark, base, "p0")
    assert(snapshot(base) == pinned)
    intercept[IllegalArgumentException] { Catalog.savepoint(spark, base, "p0") }
    intercept[IllegalArgumentException] { Catalog.restore(spark, base, "nope") }
    // snapshot reads: the pinned view answers AS OF the pin while the
    // live catalog sits elsewhere, without restoring anything
    val asOf = Catalog.readAt(spark, base, "p0")
    assert(asOf("cnt").as[Long].collect().head == 1L)
    assert(asOf("sums").as[(Long, Long)].collect().toMap == Map(1L -> 10L))
    assert(Catalog.lastBatch(spark, base) == 0L, "readAt must not mutate")
    intercept[IllegalArgumentException] { Catalog.readAt(spark, base, "nope") }
    assert(Catalog.savepoints(spark, base) == Seq("p0"))
    Catalog.dropSavepoint(spark, base, "p0")
    assert(Catalog.savepoints(spark, base).isEmpty)
    intercept[IllegalArgumentException] { Catalog.dropSavepoint(spark, base, "p0") }
  }

  test("addStore: a store added mid-stream backfills, then folds like a founding member") {
    val base = TempDirs.create("catalog_addstore")
    initStores(base)
    Catalog.ingest(spark, base, 0L, Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), folds)
    // backfill the new store FROM an existing one — the lineage pattern
    Catalog.addStore(spark, base, "negsums",
      Catalog.read(spark, base, "sums").select(col("k"), (-col("s")).as("ns")))
    assert(Catalog.gens(spark, base)("negsums") == 0L,
      "the backfill generation carries the current ledger id")
    assert(Catalog.lastBatch(spark, base) == 0L, "addStore must not advance the ledger")
    val foldsPlus = folds :+ ("negsums" -> ((cur: DataFrame, b: DataFrame) =>
      cur.unionByName(b.groupBy("k").agg((-sum(col("v"))).as("ns")))
        .groupBy("k").agg(sum(col("ns")).as("ns"))))
    Catalog.ingest(spark, base, 1L, Seq((1L, 5L), (3L, 7L)).toDF("k", "v"), foldsPlus)
    assert(Catalog.read(spark, base, "negsums").as[(Long, Long)].collect().toMap
      == Map(1L -> -15L, 2L -> -20L, 3L -> -7L),
      "post-add batches must fold into the added store on top of its backfill")
    assert(snapshot(base) == ((4L, Map(1L -> 15L, 2L -> 20L, 3L -> 7L), Set(1L, 2L, 3L))),
      "founding stores unaffected by the add")
    intercept[IllegalArgumentException] {
      Catalog.addStore(spark, base, "cnt", Seq(0L).toDF("n"))
    }
  }

  test("a racing reader never observes a torn batch: cross-store invariant holds under live folds") {
    // the manifest swap is the single atomicity point, so one
    // readAll's pointer set is always a consistent snapshot; the
    // invariant "total count == sum of per-key counts" can only break
    // if a reader saw store A at batch i and store B at batch j != i.
    // The reader loop races 15 live folds, retrying only the bounded
    // swap-visibility window (a GC'd generation re-resolves on retry).
    val base = TempDirs.create("catalog_race")
    Catalog.init(base, Map(
      "cnt" -> Seq(0L).toDF("n"),
      "sums" -> Seq.empty[(Long, Long)].toDF("k", "n")))
    val raceFolds: Seq[(String, (DataFrame, DataFrame) => DataFrame)] = Seq(
      "cnt" -> ((cur, b) => cur.unionByName(b.agg(count(lit(1)).as("n")))
        .agg(sum(col("n")).as("n"))),
      "sums" -> ((cur, b) => cur.unionByName(b.groupBy("k").agg(count(lit(1)).as("n")))
        .groupBy("k").agg(sum(col("n")).as("n"))))
    @volatile var stop = false
    val torn = new java.util.concurrent.atomic.AtomicInteger
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]
    val reads = new java.util.concurrent.atomic.AtomicInteger
    val reader = new Thread(() => {
      while (!stop) {
        try SwapStore.retryingStaleReads() {
          val st = Catalog.readAll(spark, base)
          val c = st("cnt").as[Long].collect().head
          val s = st("sums").agg(coalesce(sum(col("n")), lit(0L)))
            .as[Long].collect().head
          if (c != s) torn.incrementAndGet()
          reads.incrementAndGet()
        } catch { case e: Throwable => failures.add(e.toString) }
      }
    })
    reader.start()
    try {
      (0 until 15).foreach { i =>
        Catalog.ingest(spark, base, i.toLong,
          spark.range(i * 100L, (i + 1) * 100L)
            .select((col("id") % 7).as("k"), col("id").as("v")),
          raceFolds)
      }
    } finally { stop = true; reader.join(30000) }
    assert(failures.isEmpty, s"reader died mid-race: ${failures.peek()}")
    assert(torn.get() == 0, s"${torn.get()} of ${reads.get()} reads saw a torn batch")
    assert(reads.get() > 0, "the reader never completed a read — the race was vacuous")
    assert(Catalog.read(spark, base, "cnt").as[Long].collect().head == 1500L)
  }

  test("replicate bootstraps a replica, ships only changed generations, cuts over atomically") {
    val base = TempDirs.create("catalog_repl_p")
    val rep = TempDirs.create("catalog_repl_r")
    initStores(base)
    Catalog.ingest(spark, base, 0L, Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), folds)
    // bootstrap: every store ships
    assert(Catalog.replicate(spark, base, rep).keySet == Set("cnt", "sums", "keys"))
    assert(snapshot(rep) == snapshot(base))
    assert(Catalog.lastBatch(spark, rep) == 0L)
    // incremental: a batch folding TWO stores ships exactly those two
    Catalog.ingest(spark, base, 1L, Seq((1L, 5L)).toDF("k", "v"), folds.take(2))
    assert(Catalog.replicate(spark, base, rep) == Map("cnt" -> 1L, "sums" -> 1L),
      "unchanged stores must ship nothing")
    assert(snapshot(rep) == snapshot(base))
    // convergence: an untouched primary replicates as a copy-free no-op
    assert(Catalog.replicate(spark, base, rep).isEmpty)
    assert(Catalog.savepoints(spark, base).isEmpty,
      "the internal replication pin must not outlive the call")
  }

  test("a stale inflight pin (crashed follower tick) cannot strand one replicate() call behind the call-time ledger") {
    // a follower stopped between its savepoint rename and its pin drop
    // leaves the internal inflight pin at an OLDER ledger; a later
    // replicate() must finish that snapshot (resumability) AND then
    // catch up — the caller asked for "the primary as of now" (q185's
    // deterministic final sync requires exactly this)
    val base = TempDirs.create("catalog_stalepin_p")
    val rep = TempDirs.create("catalog_stalepin_r")
    initStores(base)
    Catalog.ingest(spark, base, 0L, Seq((1L, 10L)).toDF("k", "v"), folds)
    // simulate the crashed tick: the inflight pin exists at ledger 0...
    Catalog.savepoint(spark, base, f"repl-${rep.hashCode}%08x")
    // ...and the primary then advances past it
    Catalog.ingest(spark, base, 1L, Seq((2L, 20L)).toDF("k", "v"), folds)
    Catalog.replicate(spark, base, rep)
    assert(Catalog.lastBatch(spark, rep) == 1L,
      "one replicate() call must converge to the call-time ledger")
    assert(Catalog.gens(spark, rep) == Catalog.gens(spark, base))
    assert(Catalog.verifyReplica(spark, base, rep)
      .where(!col("consistent")).isEmpty)
    // the inflight pin is gone — the next call is the no-op fast path
    assert(Catalog.replicate(spark, base, rep).isEmpty)
  }

  test("a crash at every point of the copy sequence leaves the replica serving its old state; re-runs converge") {
    val base = TempDirs.create("catalog_replcrash_p")
    val rep = TempDirs.create("catalog_replcrash_r")
    initStores(base)
    Catalog.ingest(spark, base, 0L, Seq((1L, 10L)).toDF("k", "v"), folds)
    Catalog.replicate(spark, base, rep)
    val v1 = snapshot(rep)
    Catalog.ingest(spark, base, 1L, Seq((2L, 20L)).toDF("k", "v"), folds)
    // failAfter = 0, 1, 2 (mid-copy), 3 (all copies done, cutover not):
    // the replica must keep answering v1 after every crash
    for (failAfter <- 0 to 3) {
      intercept[IllegalStateException] {
        Catalog.replicateImpl(spark, base, rep, full = false, failAfter)
      }
      assert(Catalog.lastBatch(spark, rep) == 0L,
        s"failAfter=$failAfter: replica ledger must not move before the cutover")
      assert(snapshot(rep) == v1,
        s"failAfter=$failAfter: replica readers must still see the old snapshot")
    }
    // the resumed run completes the SAME pinned snapshot
    Catalog.replicate(spark, base, rep)
    assert(snapshot(rep) == snapshot(base))
    assert(Catalog.lastBatch(spark, rep) == 1L)
    assert(Catalog.savepoints(spark, base).isEmpty)
  }

  test("the replica's own savepoints pin its generations across replications") {
    val base = TempDirs.create("catalog_replsp_p")
    val rep = TempDirs.create("catalog_replsp_r")
    initStores(base)
    Catalog.ingest(spark, base, 0L, Seq((1L, 10L)).toDF("k", "v"), folds)
    Catalog.replicate(spark, base, rep)
    Catalog.savepoint(spark, rep, "rp")
    val pinnedView = snapshot(rep)
    Catalog.ingest(spark, base, 1L, Seq((2L, 20L)).toDF("k", "v"), folds)
    Catalog.ingest(spark, base, 2L, Seq((3L, 30L)).toDF("k", "v"), folds)
    Catalog.replicate(spark, base, rep)
    Catalog.replicate(spark, base, rep) // converged: the pointer-compare fast path
    assert(snapshot(rep) == snapshot(base))
    val asOf = Catalog.readAt(spark, rep, "rp")
    assert(asOf("cnt").as[Long].collect().head == pinnedView._1,
      "replication GC must not collect generations the replica pinned")
  }

  test("a primary fork (restore) re-mints generation ids; full replication recopies them") {
    val base = TempDirs.create("catalog_replfork_p")
    val rep = TempDirs.create("catalog_replfork_r")
    initStores(base)
    Catalog.ingest(spark, base, 0L, Seq((1L, 10L)).toDF("k", "v"), folds)
    Catalog.savepoint(spark, base, "fork")
    Catalog.ingest(spark, base, 1L, Seq((2L, 20L)).toDF("k", "v"), folds)
    Catalog.replicate(spark, base, rep)
    // fork: the replayed batch reuses generation id 1 with new content,
    // so the incremental gen-number check cannot see the change — the
    // documented caveat — and full=true is the recovery
    Catalog.restore(spark, base, "fork")
    Catalog.ingest(spark, base, 1L, Seq((9L, 90L)).toDF("k", "v"), folds)
    assert(Catalog.replicate(spark, base, rep).isEmpty,
      "incremental replication is blind to a fork that reuses gen ids (documented)")
    assert(Catalog.replicate(spark, base, rep, full = true).keySet
      == Set("cnt", "sums", "keys"))
    assert(snapshot(rep) == snapshot(base))
  }

  test("verifyReplica: content fingerprints catch divergence pointer compares cannot") {
    val base = TempDirs.create("catalog_verify_p")
    val rep = TempDirs.create("catalog_verify_r")
    initStores(base)
    Catalog.ingest(spark, base, 0L, Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), folds)
    Catalog.replicate(spark, base, rep)
    def verdicts = Catalog.verifyReplica(spark, base, rep)
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(verdicts.values.forall(_._3), s"fresh replica must verify clean: $verdicts")
    // fork divergence: same generation NUMBERS and ledger, different
    // content — the pointer-compare fast path is blind to it (replicate
    // no-ops); the content fingerprint is not. Same row COUNT on the
    // diverged store, so only the value hash can tell.
    Catalog.savepoint(spark, base, "f")
    Catalog.ingest(spark, base, 1L, Seq((2L, 20L)).toDF("k", "v"), folds)
    Catalog.replicate(spark, base, rep)
    Catalog.restore(spark, base, "f")
    Catalog.ingest(spark, base, 1L, Seq((2L, 99L)).toDF("k", "v"), folds)
    assert(Catalog.replicate(spark, base, rep).isEmpty,
      "matching pointers: incremental replication cannot see the fork")
    val v2 = verdicts
    assert(!v2("sums")._3 && v2("sums")._1 == v2("sums")._2,
      s"equal counts with different content must fail the fingerprint: $v2")
    assert(v2("cnt")._3 && v2("keys")._3,
      s"stores whose content agrees still verify clean: $v2")
    // missing store on one side
    Catalog.addStore(spark, base, "extra", Seq((1L, 1L)).toDF("k", "s"))
    val v3 = verdicts
    assert(v3("extra") == ((1L, -1L, false)))
  }

  test("replicateStream: a follower converges after every tick; restarts need no checkpoint") {
    val base = TempDirs.create("catalog_follow_p")
    val rep = TempDirs.create("catalog_follow_r")
    initStores(base)
    implicit val sqlCtx = spark.sqlContext
    def follow(body: (org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Int],
                      org.apache.spark.sql.streaming.StreamingQuery) => Unit): Unit = {
      val ticks = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Int]
      val q = Catalog.replicateStream(spark, base, rep, ticks = Some(ticks.toDF()))
      try body(ticks, q) finally q.stop()
    }
    follow { (ticks, q) =>
      Catalog.ingest(spark, base, 0L, Seq((1L, 10L)).toDF("k", "v"), folds)
      ticks.addData(1); q.processAllAvailable()
      assert(snapshot(rep) == snapshot(base))
      Catalog.ingest(spark, base, 1L, Seq((2L, 20L)).toDF("k", "v"), folds)
      ticks.addData(2); q.processAllAvailable()
      assert(snapshot(rep) == snapshot(base))
    }
    // primary advances while the follower is DOWN; a fresh follower
    // (no checkpoint to recover) converges on its first tick
    Catalog.ingest(spark, base, 2L, Seq((3L, 30L)).toDF("k", "v"), folds)
    follow { (ticks, q) =>
      ticks.addData(3); q.processAllAvailable()
      assert(snapshot(rep) == snapshot(base))
      assert(Catalog.lastBatch(spark, rep) == 2L)
    }
    assert(Catalog.verifyReplica(spark, base, rep)
      .as[(String, Long, Long, Boolean)].collect().forall(_._4))
  }

  test("replicas fan out: two replicas sync independently, each with its own pin") {
    val base = TempDirs.create("catalog_replfan_p")
    val r1 = TempDirs.create("catalog_replfan_r1")
    val r2 = TempDirs.create("catalog_replfan_r2")
    initStores(base)
    Catalog.ingest(spark, base, 0L, Seq((1L, 10L)).toDF("k", "v"), folds)
    Catalog.replicate(spark, base, r1)
    Catalog.ingest(spark, base, 1L, Seq((2L, 20L)).toDF("k", "v"), folds)
    // r2 bootstraps at batch 1 while r1 sits at batch 0; a crashed r1
    // sync in between leaves ITS inflight pin without touching r2's
    intercept[IllegalStateException] {
      Catalog.replicateImpl(spark, base, r1, full = false, failAfter = 0)
    }
    Catalog.replicate(spark, base, r2)
    assert(Catalog.lastBatch(spark, r2) == 1L)
    assert(Catalog.lastBatch(spark, r1) == 0L, "r1 still serves its old snapshot")
    Catalog.replicate(spark, base, r1) // resumes r1's own pin
    assert(snapshot(r1) == snapshot(base) && snapshot(r2) == snapshot(base))
    assert(Catalog.savepoints(spark, base).isEmpty,
      "both inflight pins must be dropped after their syncs complete")
    assert(Catalog.verifyReplica(spark, base, r1)
      .unionByName(Catalog.verifyReplica(spark, base, r2))
      .where(!col("consistent")).isEmpty)
  }

  test("replicate refuses to overwrite a generation the replica's savepoints pin") {
    // the collision exists only after a primary fork re-mints a gen id
    // the replica pinned from the old timeline — overwriting in place
    // would silently corrupt the replica's pinned snapshot
    val base = TempDirs.create("catalog_replpin_p")
    val rep = TempDirs.create("catalog_replpin_r")
    initStores(base)
    Catalog.savepoint(spark, base, "f") // fork point BEFORE batch 0
    Catalog.ingest(spark, base, 0L, Seq((1L, 10L)).toDF("k", "v"), folds)
    Catalog.replicate(spark, base, rep)
    Catalog.savepoint(spark, rep, "keep") // replica pins the g0 timeline
    Catalog.restore(spark, base, "f")
    Catalog.ingest(spark, base, 0L, Seq((9L, 90L)).toDF("k", "v"), folds)
    val ex = intercept[IllegalArgumentException] {
      Catalog.replicate(spark, base, rep, full = true)
    }
    assert(ex.getMessage.contains("diverged timeline"), ex.getMessage)
    assert(Catalog.readAt(spark, rep, "keep")("sums")
      .as[(Long, Long)].collect().toMap == Map(1L -> 10L),
      "the pinned snapshot must be untouched by the refused sync")
    Catalog.dropSavepoint(spark, rep, "keep")
    Catalog.replicate(spark, base, rep, full = true)
    assert(snapshot(rep) == snapshot(base))
  }

  test("vacuum removes crash orphans and strays, never referenced or pinned generations") {
    val base = TempDirs.create("catalog_vacuum")
    initStores(base)
    Catalog.ingest(spark, base, 0L, Seq((1L, 10L)).toDF("k", "v"), folds)
    Catalog.savepoint(spark, base, "keep")
    Catalog.ingest(spark, base, 1L, Seq((2L, 20L)).toDF("k", "v"), folds)
    Catalog.ingest(spark, base, 2L, Seq((3L, 30L)).toDF("k", "v"), folds)
    val live = snapshot(base)
    // orphan: a crashed ingest of batch 3 wrote cnt's g3, never committed
    intercept[IllegalStateException] {
      Catalog.ingestImpl(spark, base, 3L, Seq((4L, 40L)).toDF("k", "v"), folds, 1)
    }
    // stray: a crashed addStore wrote a generation, never swapped the manifest
    Seq(1L).toDF("x").write.parquet(s"$base/stores/stray/g2")
    // stray: a crashed savepoint left its staging dir
    new java.io.File(s"$base/_savepoints/.tmp-dead").mkdirs()
    val deleted = Catalog.vacuum(spark, base)
    def gensOf(store: String) =
      new java.io.File(s"$base/stores/$store").listFiles().map(_.getName).toSet
    assert(gensOf("cnt") == Set("g2", "g0"),
      "keep current + pinned; the orphan g3 and the superseded g1 go")
    assert(!new java.io.File(s"$base/stores/stray").exists(), "unreferenced store dir goes")
    assert(!new java.io.File(s"$base/_savepoints/.tmp-dead").exists())
    assert(deleted.exists(_.endsWith("stores/cnt/g3")))
    assert(snapshot(base) == live, "vacuum is content-invariant")
    assert(Catalog.readAt(spark, base, "keep")("cnt").as[Long].collect().head == 1L,
      "pinned snapshot reads survive the sweep")
  }

  test("unknown store names and duplicate folds fail fast") {
    val base = TempDirs.create("catalog_guards")
    initStores(base)
    val b = Seq((1L, 1L)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Catalog.ingest(spark, base, 0L, b, Seq("nope" -> folds.head._2))
    }
    intercept[IllegalArgumentException] {
      Catalog.ingest(spark, base, 0L, b, folds.take(1) ++ folds.take(1))
    }
    intercept[IllegalArgumentException] { Catalog.read(spark, base, "nope") }
  }

  test("single-writer ENFORCED: a second concurrent ingest fails loudly instead of racing") {
    val base = TempDirs.create("catalog_lease_race")
    initStores(base)
    Catalog.ingest(spark, base, 0L, Seq((1L, 10L)).toDF("k", "v"), folds)
    // writer A blocks INSIDE its first fold (lease held); writer B's
    // ingest of the next batch must fail with the named lease error,
    // not corrupt the staging dirs
    val entered = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val blocking: Seq[(String, (DataFrame, DataFrame) => DataFrame)] =
      folds.map { case (n, f) =>
        n -> ((cur: DataFrame, b: DataFrame) => {
          entered.countDown()
          assert(release.await(30, java.util.concurrent.TimeUnit.SECONDS))
          f(cur, b)
        })
      }
    var aFailure: Option[Throwable] = None
    val a = new Thread(() =>
      try Catalog.ingest(spark, base, 1L, Seq((2L, 20L)).toDF("k", "v"), blocking)
      catch { case t: Throwable => aFailure = Some(t) })
    a.start()
    try {
      assert(entered.await(30, java.util.concurrent.TimeUnit.SECONDS))
      val e = intercept[IllegalStateException] {
        Catalog.ingest(spark, base, 2L, Seq((3L, 30L)).toDF("k", "v"), folds)
      }
      assert(e.getMessage.contains("another writer holds the lease"))
    } finally {
      release.countDown()
      a.join(60000)
    }
    assert(aFailure.isEmpty, s"writer A must complete: $aFailure")
    assert(Catalog.lastBatch(spark, base) == 1L)
    assert(snapshot(base) == ((2L, Map(1L -> 10L, 2L -> 20L), Set(1L, 2L))))
    // with A done (lease released), the blocked batch lands normally
    Catalog.ingest(spark, base, 2L, Seq((3L, 30L)).toDF("k", "v"), folds)
    assert(snapshot(base) == ((3L, Map(1L -> 10L, 2L -> 20L, 3L -> 30L), Set(1L, 2L, 3L))))
  }

  test("a crashed holder's lease is reclaimed; a fresh one is not") {
    val base = TempDirs.create("catalog_lease_stale")
    initStores(base)
    val lease = new java.io.File(base, "_writer.lease")
    // fresh foreign lease (heartbeat now): ingest must refuse
    java.nio.file.Files.write(lease.toPath,
      "other-host#999#dead-owner\nCatalog.ingest\n".getBytes("UTF-8"))
    val e = intercept[IllegalStateException] {
      Catalog.ingest(spark, base, 0L, Seq((1L, 10L)).toDF("k", "v"), folds)
    }
    assert(e.getMessage.contains("another writer holds the lease"))
    assert(Catalog.lastBatch(spark, base) == -1L)
    // the same lease gone stale (heartbeat died with its holder):
    // reclaimed transparently, the ingest proceeds
    assert(lease.setLastModified(
      System.currentTimeMillis() - 2 * WriterLease.DefaultStaleMs))
    Catalog.ingest(spark, base, 0L, Seq((1L, 10L)).toDF("k", "v"), folds)
    assert(Catalog.lastBatch(spark, base) == 0L)
    assert(!lease.exists(), "a completed ingest releases its lease")
  }

  test("replicate and vacuum honor the writer lease") {
    val base = TempDirs.create("catalog_lease_repl_p")
    val rep = TempDirs.create("catalog_lease_repl_r")
    initStores(base)
    Catalog.ingest(spark, base, 0L, Seq((1L, 10L)).toDF("k", "v"), folds)
    // live foreign lease on the REPLICA: replicate refuses to write it
    val rLease = new java.io.File(rep, "_writer.lease")
    java.nio.file.Files.write(rLease.toPath,
      "other-host#999#dead-owner\nCatalog.ingest\n".getBytes("UTF-8"))
    val e1 = intercept[IllegalStateException] { Catalog.replicate(spark, base, rep) }
    assert(e1.getMessage.contains("another writer holds the lease"))
    // stale: reclaimed, replication proceeds and converges
    assert(rLease.setLastModified(
      System.currentTimeMillis() - 2 * WriterLease.DefaultStaleMs))
    Catalog.replicate(spark, base, rep)
    assert(Catalog.lastBatch(spark, rep) == 0L)
    // a converged follower tick stays lock-free: a live foreign lease
    // on the replica does NOT block the no-op fast path
    java.nio.file.Files.write(rLease.toPath,
      "other-host#999#dead-owner\nCatalog.ingest\n".getBytes("UTF-8"))
    assert(Catalog.replicate(spark, base, rep) == Map.empty)
    rLease.delete()
    // vacuum on a leased base refuses too
    val pLease = new java.io.File(base, "_writer.lease")
    java.nio.file.Files.write(pLease.toPath,
      "other-host#999#dead-owner\nCatalog.ingest\n".getBytes("UTF-8"))
    val e2 = intercept[IllegalStateException] { Catalog.vacuum(spark, base) }
    assert(e2.getMessage.contains("another writer holds the lease"))
    pLease.delete()
    assert(Catalog.vacuum(spark, base).isEmpty
      || Catalog.lastBatch(spark, base) == 0L) // sweep runs once unblocked
  }
  test("an interrupted lease holder still releases (both interrupt delivery modes)") {
    // mode 1: the body THROWS InterruptedException (sleep/wait)
    val base1 = TempDirs.create("catalog_lease_intr1")
    val entered1 = new java.util.concurrent.CountDownLatch(1)
    val t1 = new Thread(() =>
      try WriterLease.withLease(spark, base1, "test-intr1") {
        entered1.countDown(); Thread.sleep(60000)
      } catch { case _: Throwable => () })
    t1.start(); assert(entered1.await(10, java.util.concurrent.TimeUnit.SECONDS))
    Thread.sleep(100) // let the holder settle inside the body
    t1.interrupt(); t1.join(15000)
    assert(!new java.io.File(base1, "_writer.lease").exists(),
      "a sleep-interrupted holder must delete its lease")
    // mode 2: the interrupt FLAG is set without a throw (fs/Spark ops
    // often just set it) — release must clear, clean up, and restore
    val base2 = TempDirs.create("catalog_lease_intr2")
    @volatile var restored = false
    val t2 = new Thread(() => {
      WriterLease.withLease(spark, base2, "test-intr2") {
        Thread.currentThread().interrupt()
      }
      restored = Thread.currentThread().isInterrupted
    })
    t2.start(); t2.join(15000)
    assert(!new java.io.File(base2, "_writer.lease").exists(),
      "a flag-interrupted holder must delete its lease")
    assert(restored, "the interrupt flag must be restored for the caller")
  }
}
