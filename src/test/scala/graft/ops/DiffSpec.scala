package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DiffSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("added / removed / changed / unchanged, null-safe compares") {
    val before = Seq(
      (1L, Some("a"), 10L), (2L, Some("b"), 20L), (3L, None, 30L),
      (4L, Some("d"), 40L), (5L, None, 50L)).toDF("k", "s", "v")
    val after = Seq(
      (2L, Some("b"), 20L),       // unchanged -> absent
      (3L, Some("c"), 30L),       // null -> value: changed
      (4L, Some("d"), 41L),       // value changed
      (5L, None, 50L),            // null == null: unchanged -> absent
      (6L, Some("f"), 60L)).toDF("k", "s", "v") // added
    val got = Diff.snapshots(before, after, Seq("k"))
      .as[(Long, String)].collect().sorted.toSeq
    assert(got == Seq((1L, "removed"), (3L, "changed"), (4L, "changed"), (6L, "added")))
  }

  test("composite keys; all-key tables diff on presence only") {
    val b = Seq((1L, "x", 5L), (1L, "y", 6L)).toDF("k1", "k2", "v")
    val a = Seq((1L, "y", 6L), (2L, "x", 7L)).toDF("k1", "k2", "v")
    val got = Diff.snapshots(b, a, Seq("k1", "k2"))
      .as[(Long, String, String)].collect().sorted.toSeq
    assert(got == Seq((1L, "x", "removed"), (2L, "x", "added")))
  }

  test("guards: duplicate keys, schema mismatch, missing key") {
    val ok = Seq((1L, 2L)).toDF("k", "v")
    val dup = Seq((1L, 2L), (1L, 3L)).toDF("k", "v")
    assertThrows[IllegalArgumentException] { Diff.snapshots(dup, ok, Seq("k")) }
    assertThrows[IllegalArgumentException] { Diff.snapshots(ok, dup, Seq("k")) }
    assertThrows[IllegalArgumentException] {
      Diff.snapshots(ok, Seq((1L, 2L)).toDF("k", "w"), Seq("k"))
    }
    assertThrows[IllegalArgumentException] { Diff.snapshots(ok, ok, Seq("nope")) }
    assertThrows[IllegalArgumentException] { Diff.snapshots(ok, ok, Seq.empty) }
  }

  test("applyChangelog: latest-wins upsert, delete, passthrough, log-only insert+delete") {
    val snap = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)).toDF("k", "s", "v")
    val ch = Seq(
      (1L, "a1", 11L, 1L, "U"),  // update k=1 ...
      (1L, "a2", 12L, 2L, "U"),  // ... then again: seq 2 wins
      (2L, "b", 20L, 1L, "D"),   // delete k=2
      (4L, "d", 40L, 1L, "U"),   // insert new key
      (5L, "e", 50L, 1L, "U"),   // insert ...
      (5L, "e", 50L, 2L, "D")    // ... then delete in the same log: gone
    ).toDF("k", "s", "v", "seq", "op")
    val got = Diff.applyChangelog(snap, ch, Seq("k"), "seq", "op")
      .as[(Long, String, Long)].collect().sorted.toSeq
    assert(got == Seq((1L, "a2", 12L), (3L, "c", 30L), (4L, "d", 40L)))
  }

  test("applyChangelog: delete-then-reinsert keeps the reinsert; output schema = snapshot") {
    val snap = Seq((1L, 10L)).toDF("k", "v")
    val ch = Seq((1L, 0L, 1L, "D"), (1L, 99L, 2L, "U")).toDF("k", "v", "seq", "op")
    val out = Diff.applyChangelog(snap, ch, Seq("k"), "seq", "op")
    assert(out.columns.toSeq == Seq("k", "v"))
    assert(out.as[(Long, Long)].collect().toSeq == Seq((1L, 99L)))
  }

  test("applyChangelog guards: dup snapshot keys, missing columns, reserved names") {
    val snap = Seq((1L, 10L)).toDF("k", "v")
    val ch = Seq((1L, 11L, 1L, "U")).toDF("k", "v", "seq", "op")
    assertThrows[IllegalArgumentException] {
      Diff.applyChangelog(Seq((1L, 1L), (1L, 2L)).toDF("k", "v"), ch, Seq("k"), "seq", "op")
    }
    assertThrows[IllegalArgumentException] {
      Diff.applyChangelog(snap, ch.drop("op"), Seq("k"), "seq", "op")
    }
    assertThrows[IllegalArgumentException] {
      Diff.applyChangelog(Seq((1L, 1L)).toDF("k", "__op"),
        Seq((1L, 1L, 1L, "U")).toDF("k", "__op", "seq", "op"), Seq("k"), "seq", "op")
    }
  }

  test("applyChangelog plan: winner collapse is a partial aggregate, not a window") {
    val o = graft.sources.Tables(spark, "/root/testdata/sf0.001").orders
      .select(col("o_orderkey"), col("o_custkey"))
    val ch = o.withColumn("seq", lit(1L)).withColumn("op", lit("U"))
    val plan = Diff.applyChangelog(o, ch, Seq("o_orderkey"), "seq", "op")
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_max") || plan.contains("partial max"),
      s"winner pick must be a partial max aggregate:\n$plan")
    assert(!plan.contains("RunningWindowFunction") && !plan.contains("Window"),
      s"no per-key window over the raw log:\n$plan")
  }

  test("scd2: validity chain per key, is_current on the last version") {
    val log = Seq(
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"),
      (2L, 5L, "x")).toDF("k", "seq", "s")
    val got = Diff.scd2(log, Seq("k"), "seq")
      .select(col("k"), col("seq"), col("s"), col("valid_to"), col("is_current"))
      .as[(Long, Long, String, Option[Long], Boolean)].collect().sorted.toSeq
    assert(got == Seq(
      (1L, 10L, "a", Some(20L), false),
      (1L, 20L, "b", Some(30L), false),
      (1L, 30L, "c", None, true),
      (2L, 5L, "x", None, true)))
  }

  test("scd2Apply: the fold is indistinguishable from the rebuild") {
    val prefix = Seq(
      (1L, 10L, "a"), (1L, 20L, "b"),
      (2L, 5L, "x")).toDF("k", "seq", "s")
    val slice = Seq(
      (1L, 30L, "c"), (1L, 40L, "d"), // two chained new versions
      (3L, 7L, "n")                   // a brand-new key
    ).toDF("k", "seq", "s")           // key 2: untouched, stays current
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("k"), col("seq"), col("s"), col("valid_to"), col("is_current"))
        .as[(Long, Long, String, Option[Long], Boolean)].collect().sorted.toSeq
    val applied = Diff.scd2Apply(Diff.scd2(prefix, Seq("k"), "seq"), slice,
      Seq("k"), "seq")
    assert(canon(applied) == canon(Diff.scd2(prefix.unionByName(slice), Seq("k"), "seq")))
    assert(canon(applied) == canon(Diff.scd2Apply(Diff.scd2(prefix, Seq("k"), "seq"),
      slice, Seq("k"), "seq", broadcastChanges = false)))
    // empty slice: a no-op fold
    assert(canon(Diff.scd2Apply(applied, slice.limit(0), Seq("k"), "seq"))
      == canon(applied))
  }

  test("scd2Apply guards: out-of-order versions and replayed slices fail fast") {
    val hist = Diff.scd2(Seq((1L, 10L, "a"), (1L, 20L, "b")).toDF("k", "seq", "s"),
      Seq("k"), "seq")
    // a version at or before the key's current valid_from
    intercept[IllegalArgumentException] {
      Diff.scd2Apply(hist, Seq((1L, 20L, "dup")).toDF("k", "seq", "s"), Seq("k"), "seq")
    }
    intercept[IllegalArgumentException] {
      Diff.scd2Apply(hist, Seq((1L, 15L, "late")).toDF("k", "seq", "s"), Seq("k"), "seq")
    }
    // double-apply of an accepted slice trips the same contract
    val slice = Seq((1L, 30L, "c")).toDF("k", "seq", "s")
    val once = Diff.scd2Apply(hist, slice, Seq("k"), "seq")
    intercept[IllegalArgumentException] {
      Diff.scd2Apply(once, slice, Seq("k"), "seq")
    }
    // duplicate (key, seq) within one slice
    intercept[IllegalArgumentException] {
      Diff.scd2Apply(hist, Seq((1L, 30L, "c"), (1L, 30L, "c2")).toDF("k", "seq", "s"),
        Seq("k"), "seq")
    }
    // not an scd2 output
    intercept[IllegalArgumentException] {
      Diff.scd2Apply(Seq((1L, 10L, "a")).toDF("k", "seq", "s"), slice, Seq("k"), "seq")
    }
  }

  test("scd2Stream: version batches fold into the persisted history; the ledger no-ops replays") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val path = graft.core.TempDirs.create("graft_scd2s_test")
    val all = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "x"),
      (1L, 30L, "c"), (3L, 7L, "n"))
    graft.core.SwapStore.init(
      Diff.scd2(all.take(0).toDF("k", "seq", "s"), Seq("k"), "seq"), path)
    val in = MemoryStream[(Long, Long, String)]
    val q = Diff.scd2Stream(spark, in.toDF().toDF("k", "seq", "s"), path,
      Seq("k"), "seq", ephemeralOk = true)
    try {
      in.addData(all.take(3): _*); q.processAllAvailable()
      in.addData(all.drop(3): _*); q.processAllAvailable()
    } finally q.stop()
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("k"), col("seq"), col("s"), col("valid_to"), col("is_current"))
        .as[(Long, Long, String, Option[Long], Boolean)].collect().sorted.toSeq
    val want = canon(Diff.scd2(all.toDF("k", "seq", "s"), Seq("k"), "seq"))
    assert(canon(graft.core.SwapStore.read(spark, path)) == want)
    // a re-delivered batch id no-ops at the ledger BEFORE scd2Apply's
    // double-apply guard could fire
    graft.core.SwapStore.fold(spark, path, 1L)(h =>
      Diff.scd2Apply(h, all.drop(3).toDF("k", "seq", "s"), Seq("k"), "seq"))
    assert(canon(graft.core.SwapStore.read(spark, path)) == want)
  }

  test("temporalJoin: as-of version per fact, gap after expiry, pre-history miss") {
    val dim = Seq(
      (1L, 10L, Some(20L), "v1"),  // k=1 [10,20)
      (1L, 20L, Some(30L), "v2"),  // k=1 [20,30) — then GAP (deleted)
      (1L, 40L, None, "v3"),       // k=1 [40,∞)
      (2L, 5L, None, "w1")         // k=2 [5,∞)
    ).toDF("k", "vf", "vt", "name")
    val facts = Seq(
      (1L, 9L),   // before any version -> null
      (1L, 10L),  // boundary: v1 starts here
      (1L, 25L),  // v2
      (1L, 35L),  // inside the gap -> null (as-of finds v2 but vt=30 expired)
      (1L, 99L),  // v3 open-ended
      (2L, 5L),   // boundary on k=2
      (3L, 50L)   // unknown key -> null
    ).toDF("k", "t")
    val got = Diff.temporalJoin(facts, dim, Seq("k"), "t", "vf", "vt", Seq("name"))
      .as[(Long, Long, Option[String])].collect().sorted.toSeq
    assert(got == Seq(
      (1L, 9L, None), (1L, 10L, Some("v1")), (1L, 25L, Some("v2")),
      (1L, 35L, None), (1L, 99L, Some("v3")), (2L, 5L, Some("w1")),
      (3L, 50L, None)))
  }

  test("temporalJoin: null dim keys match nothing; facts keep left semantics") {
    val dim = Seq((Some(1L), 10L, "v")).toDF("k", "vf", "name")
      .withColumn("vt", lit(null).cast("long"))
      .union(Seq((Option.empty[Long], 5L, "junk")).toDF("k", "vf", "name")
        .withColumn("vt", lit(null).cast("long")))
    val facts = Seq((Some(1L), 15L), (Option.empty[Long], 15L)).toDF("k", "t")
    val got = Diff.temporalJoin(facts, dim, Seq("k"), "t", "vf", "vt", Seq("name"))
      .select(col("k"), col("t"), col("name"))
      .as[(Option[Long], Long, Option[String])].collect().toSeq.sortBy(_._2)
    assert(got.toSet == Set((Some(1L), 15L, Some("v")), (None, 15L, None)))
  }

  test("temporalJoin guards: dup (key, validFrom), carry collision, missing cols") {
    val dim = Seq((1L, 10L, Option.empty[Long], "v")).toDF("k", "vf", "vt", "name")
    val facts = Seq((1L, 15L)).toDF("k", "t")
    assertThrows[IllegalArgumentException] {
      Diff.temporalJoin(facts,
        Seq((1L, 10L, Option.empty[Long], "a"), (1L, 10L, Option.empty[Long], "b"))
          .toDF("k", "vf", "vt", "name"),
        Seq("k"), "t", "vf", "vt", Seq("name"))
    }
    assertThrows[IllegalArgumentException] {
      Diff.temporalJoin(facts.withColumnRenamed("t", "name"), dim,
        Seq("k"), "name", "vf", "vt", Seq("name"))
    }
    assertThrows[IllegalArgumentException] {
      Diff.temporalJoin(facts, dim.drop("vt"), Seq("k"), "t", "vf", "vt", Seq("name"))
    }
  }

  test("temporalJoin plan: one keyed window, no join node") {
    val e = graft.sources.Tables(spark, "/root/testdata/sf0.001").events
    val dim = Diff.scd2(
      e.where(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("version_id"), col("value")),
      Seq("user_id"), "version_id")
    val plan = Diff.temporalJoin(
      e.where(col("event_type") =!= "purchase")
        .select(col("user_id"), col("event_id"), col("event_type")),
      dim, Seq("user_id"), "event_id", "version_id", "valid_to",
      Seq("version_id", "value"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"temporalJoin must not contain a join node:\n$plan")
    assert(plan.contains("Window"), s"the as-of carry is a window:\n$plan")
  }

  test("scd2 guards: duplicate (key, seq), reserved output names") {
    assertThrows[IllegalArgumentException] {
      Diff.scd2(Seq((1L, 10L), (1L, 10L)).toDF("k", "seq"), Seq("k"), "seq")
    }
    assertThrows[IllegalArgumentException] {
      Diff.scd2(Seq((1L, 10L, 0L)).toDF("k", "seq", "valid_to"), Seq("k"), "seq")
    }
  }

  test("both sides stay distributed: full-outer sort-merge join, no broadcast") {
    val o = graft.sources.Tables(spark, "/root/testdata/sf0.001").orders
    val plan = Diff.snapshots(o.where(col("o_orderkey") % 2 === 0),
        o.where(col("o_orderkey") % 3 === 0), Seq("o_orderkey"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") && plan.contains("FullOuter"),
      s"expected a full-outer sort-merge join:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"), s"diff must not broadcast a snapshot:\n$plan")
  }

  private def fpRows(df: org.apache.spark.sql.DataFrame) =
    Diff.fingerprint(df, Seq("g"), Seq("a", "b"))
      .as[(String, Long, Long, Long)].collect().toSet

  test("fingerprint: partition- and order-invariant; equal content agrees") {
    val df = Seq(("x", 1L, "p"), ("x", 2L, "q"), ("y", 3L, "r"), ("y", 4L, null))
      .toDF("g", "a", "b")
    val shuffled = df.orderBy(col("a").desc).repartition(7)
    assert(fpRows(df) == fpRows(shuffled))
    assert(fpRows(df) == fpRows(df.coalesce(1)))
  }

  test("fingerprint: a one-value change, a null-vs-empty flip, and an even duplicate all surface") {
    val base = Seq(("x", 1L, "p"), ("x", 2L, "q")).toDF("g", "a", "b")
    // one changed value
    assert(fpRows(base) != fpRows(Seq(("x", 1L, "p"), ("x", 2L, "Q")).toDF("g", "a", "b")))
    // null vs empty string must be distinguishable (the U+0002 sentinel)
    assert(fpRows(Seq(("x", 1L, null.asInstanceOf[String])).toDF("g", "a", "b")) !=
      fpRows(Seq(("x", 1L, "")).toDF("g", "a", "b")))
    // an even-multiplicity duplicate cancels in XOR — n and sum_fp must
    // still differ (the hole the three-measure design closes)
    val dupTwice = Seq(("x", 1L, "p"), ("x", 2L, "q"), ("x", 2L, "q"), ("x", 2L, "q"))
      .toDF("g", "a", "b")
    val (fb, fd) = (fpRows(base).head, fpRows(dupTwice).head)
    assert(fb._3 == fd._3, "xor is expected to cancel the duplicated pair")
    assert(fb._2 != fd._2 && fb._4 != fd._4, s"count/sum failed to surface the dup: $fb vs $fd")
  }

  test("fingerprint: one scan with partial aggregation, group-sized exchange") {
    val li = graft.sources.Tables(spark, "/root/testdata/sf0.001").lineitem
      .select(col("l_returnflag").as("g"), col("l_orderkey").as("a"),
        col("l_linestatus").as("b"))
    val plan = Diff.fingerprint(li, Seq("g"), Seq("a", "b"))
      .queryExecution.executedPlan.toString
    // partial-then-final hash aggregate pair around one exchange; no sort
    assert(plan.contains("HashAggregate"), s"expected hash aggregation:\n$plan")
    assert(!plan.contains("SortAggregate") && !plan.contains("Sort "),
      s"fingerprint must not sort:\n$plan")
    assert("Exchange".r.findAllIn(plan).size == 1, s"expected exactly one exchange:\n$plan")
  }

  test("fingerprint guards: missing column, key/col overlap, no cols") {
    val df = Seq(("x", 1L, "p")).toDF("g", "a", "b")
    assertThrows[IllegalArgumentException] { Diff.fingerprint(df, Seq("g"), Seq.empty) }
    assertThrows[IllegalArgumentException] { Diff.fingerprint(df, Seq("g"), Seq("zz")) }
    assertThrows[IllegalArgumentException] { Diff.fingerprint(df, Seq("g"), Seq("g", "a")) }
  }

  // ---- maintainAgg ----

  private def baseRows = Seq(
    (1L, 10L), (1L, 11L), (2L, 20L), (3L, 30L), (3L, 31L), (3L, 32L), (4L, 40L))
  private def viewOf(rows: Seq[(Long, Long)]) =
    rows.toDF("k", "v").groupBy("k")
      .agg(count(lit(1)).as("cnt"), sum("v").as("sum_v"))

  test("maintainAgg insert-only min/max: extremes fold monotonically; retractions raise") {
    val view = Seq((1L, 2L, 10L, 3L, 7L)).toDF("k", "cnt", "s", "mn", "mx")
    val changes = Seq((1L, "+I", 1L), (1L, "+I", 9L), (2L, "+I", 5L))
      .toDF("k", "op", "v")
    val out = Diff.maintainAgg(view, changes, Seq("k"), "op", "cnt",
        Seq("s" -> "v"), mins = Seq("mn" -> "v"), maxs = Seq("mx" -> "v"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // key 1: count 2+2, sum 10+10, min least(3,1), max greatest(7,9);
    // key 2 is brand new and takes the batch extremes directly
    assert(out == Set((1L, 4L, 20L, 1L, 9L), (2L, 1L, 5L, 5L, 5L)))
    // untouched keys keep their extremes byte-identical
    val untouched = Diff.maintainAgg(view,
        Seq((2L, "+I", 5L)).toDF("k", "op", "v"), Seq("k"), "op", "cnt",
        Seq("s" -> "v"), mins = Seq("mn" -> "v"), maxs = Seq("mx" -> "v"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(untouched == Set((1L, 2L, 10L, 3L, 7L), (2L, 1L, 5L, 5L, 5L)))
    // any retraction op under min/max maintenance must raise in-plan
    val e = intercept[Throwable] {
      Diff.maintainAgg(view, Seq((1L, "-D", 1L)).toDF("k", "op", "v"),
        Seq("k"), "op", "cnt", Seq("s" -> "v"),
        mins = Seq("mn" -> "v"), maxs = Seq("mx" -> "v")).collect()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(_.contains("insert-only")), chain(e).mkString(" | "))
  }

  test("maintainAgg == re-aggregation: insert, update pair, delete, net-zero key") {
    val ch = Seq(
      (5L, 99L, "+I"),            // brand-new key
      (1L, 12L, "+I"),            // extra row on existing key
      (3L, 30L, "-U"), (3L, 300L, "+U"), // update one of k=3's rows
      (2L, 20L, "-D"),            // key 2's only row: key disappears
      (6L, 7L, "+I"), (6L, 7L, "-D")     // insert-then-delete nets to nothing
    ).toDF("k", "v", "op")
    val got = Diff.maintainAgg(viewOf(baseRows), ch, Seq("k"),
        "op", "cnt", Seq("sum_v" -> "v"))
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val after = baseRows.filterNot(r => r == (3L, 30L) || r == (2L, 20L)) ++
      Seq((5L, 99L), (1L, 12L), (3L, 300L))
    val want = viewOf(after).as[(Long, Long, Long)].collect().sorted.toSeq
    assert(got == want)
  }

  test("maintainAgg: empty changelog is the identity; untouched keys byte-equal") {
    val ch = Seq.empty[(Long, Long, String)].toDF("k", "v", "op")
    val got = Diff.maintainAgg(viewOf(baseRows), ch, Seq("k"),
        "op", "cnt", Seq("sum_v" -> "v"))
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(got == viewOf(baseRows).as[(Long, Long, Long)].collect().sorted.toSeq)
  }

  test("maintainAgg: multiple sum measures shift together") {
    val view = Seq((1L, 2L, 10L, 100L), (2L, 1L, 20L, 200L))
      .toDF("k", "cnt", "sum_a", "sum_b")
    val ch = Seq((1L, 5L, 50L, "+I"), (2L, 20L, 200L, "-D"))
      .toDF("k", "a", "b", "op")
    val got = Diff.maintainAgg(view, ch, Seq("k"), "op", "cnt",
        Seq("sum_a" -> "a", "sum_b" -> "b"))
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    assert(got == Seq((1L, 3L, 15L, 150L)))
  }

  test("maintainAgg: retracting a row the view never had fails loudly") {
    // merged branch: key 2 IS in the view, over-retracted
    val ch = Seq((2L, 20L, "-D"), (2L, 21L, "-D")).toDF("k", "v", "op")
    val ex = intercept[Exception] {
      Diff.maintainAgg(viewOf(baseRows), ch, Seq("k"),
        "op", "cnt", Seq("sum_v" -> "v")).collect()
    }
    assert(ex.getMessage != null && ex.getMessage.contains("count went negative"),
      s"unexpected: ${ex.getMessage}")
    // FRESH branch: key 99 was never in the view at all — the guard
    // behind the nondeterministic pushdown barrier must still fire
    // (a pushed-down cnt>0 filter would silently swallow this row)
    val ch2 = Seq((99L, 5L, "-D")).toDF("k", "v", "op")
    val ex2 = intercept[Exception] {
      Diff.maintainAgg(viewOf(baseRows), ch2, Seq("k"),
        "op", "cnt", Seq("sum_v" -> "v")).collect()
    }
    assert(ex2.getMessage != null && ex2.getMessage.contains("count went negative"),
      s"fresh-branch guard did not fire: ${ex2.getMessage}")
    // and a mixed batch where the same invalid retraction rides next to
    // valid changes fails too, rather than emitting a partial view
    val ch3 = Seq((99L, 5L, "-D"), (1L, 12L, "+I")).toDF("k", "v", "op")
    val ex3 = intercept[Exception] {
      Diff.maintainAgg(viewOf(baseRows), ch3, Seq("k"),
        "op", "cnt", Seq("sum_v" -> "v")).collect()
    }
    assert(ex3.getMessage != null && ex3.getMessage.contains("count went negative"))
  }

  test("maintainAgg: non-maintained view columns are rejected, not silently dropped") {
    val view = viewOf(baseRows).withColumn("last_seen", lit(123L))
    val ch = Seq((1L, 5L, "+I")).toDF("k", "v", "op")
    val ex = intercept[IllegalArgumentException] {
      Diff.maintainAgg(view, ch, Seq("k"), "op", "cnt", Seq("sum_v" -> "v"))
    }
    assert(ex.getMessage.contains("last_seen"))
  }

  test("maintainAgg: unknown op code fails loudly; missing columns fail fast") {
    val ch = Seq((1L, 5L, "UPSERT")).toDF("k", "v", "op")
    val ex = intercept[Exception] {
      Diff.maintainAgg(viewOf(baseRows), ch, Seq("k"),
        "op", "cnt", Seq("sum_v" -> "v")).collect()
    }
    assert(ex.getMessage.contains("must be one of"), s"unexpected: ${ex.getMessage}")
    assertThrows[IllegalArgumentException] {
      Diff.maintainAgg(viewOf(baseRows), ch, Seq("k"), "op", "nope",
        Seq("sum_v" -> "v"))
    }
    assertThrows[IllegalArgumentException] {
      Diff.maintainAgg(viewOf(baseRows), ch, Seq("k"), "op", "cnt",
        Seq("sum_v" -> "zz"))
    }
  }

  test("maintainAggStream: changelog batches fold into the persisted view; replays are no-ops") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val path = graft.core.TempDirs.create("graft_mas_test")
    Diff.initView(viewOf(baseRows), path)
    val batches = Seq(
      Seq((5L, 99L, "+I"), (1L, 12L, "+I")),
      Seq((3L, 30L, "-U"), (3L, 300L, "+U")),
      Seq((2L, 20L, "-D")))
    val in = MemoryStream[(Long, Long, String)]
    val q = Diff.maintainAggStream(spark, in.toDF().toDF("k", "v", "op"), path,
      Seq("k"), "op", "cnt", Seq("sum_v" -> "v"), ephemeralOk = true)
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    val after = baseRows.filterNot(r => r == (3L, 30L) || r == (2L, 20L)) ++
      Seq((5L, 99L), (1L, 12L), (3L, 300L))
    val want = viewOf(after).as[(Long, Long, Long)].collect().sorted.toSeq
    assert(Diff.readView(spark, path).as[(Long, Long, Long)]
      .collect().sorted.toSeq == want)
    // exactly-once: re-applying an old batch id must be a no-op
    Diff.applyChangelogBatch(spark, Seq((1L, 1000L, "+I")).toDF("k", "v", "op"),
      path, Seq("k"), "op", "cnt", Seq("sum_v" -> "v"), batchId = 1L)
    assert(Diff.readView(spark, path).as[(Long, Long, Long)]
      .collect().sorted.toSeq == want)
    // and a NEW batch id applies
    Diff.applyChangelogBatch(spark, Seq((1L, 1000L, "+I")).toDF("k", "v", "op"),
      path, Seq("k"), "op", "cnt", Seq("sum_v" -> "v"), batchId = 99L)
    val bumped = Diff.readView(spark, path).where(col("k") === 1L)
      .as[(Long, Long, Long)].collect().head
    assert(bumped == ((1L, 4L, 10L + 11L + 12L + 1000L)))
  }

  test("scd2Apply plan: the slice broadcasts — the history side never shuffles or re-windows") {
    val o = graft.sources.Tables(spark, "/root/testdata/sf0.001").orders
      .select(col("o_custkey").as("k"), col("o_orderkey").as("seq"),
        col("o_totalprice").as("p"))
    val hist = Diff.scd2(o.where(col("seq") % 7 =!= 0), Seq("k"), "seq")
      // materialized = read back from storage, not a live window plan
      .localCheckpoint()
    val maxSeq = o.agg(max(col("seq"))).head.getLong(0)
    val slice = o.where(col("seq") % 7 === 0)
      .withColumn("seq", col("seq") + maxSeq) // respect the in-order contract
    val plan = Diff.scd2Apply(hist, slice, Seq("k"), "seq")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"the slice's first-version table must broadcast into the close:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"the history must not re-shuffle for the close:\n$plan")
    // exactly one window (the slice's own chain); the history is never
    // re-windowed
    assert(plan.split("\\bWindow\\b").length - 1 == 1,
      s"only the slice may pay a window exchange:\n$plan")
  }

  test("maintainAgg plan: deltas broadcast — the view side never shuffles") {
    val o = graft.sources.Tables(spark, "/root/testdata/sf0.001").orders
    val view = o.groupBy("o_custkey")
      .agg(count(lit(1)).as("cnt"), sum("o_totalprice").as("sum_p"))
      // materialized = read back from storage, not a live agg plan
      .localCheckpoint()
    val ch = o.where(col("o_orderkey") % 97 === 0)
      .select(col("o_custkey"), col("o_totalprice").as("p"), lit("+I").as("op"))
    val plan = Diff.maintainAgg(view, ch, Seq("o_custkey"), "op", "cnt",
        Seq("sum_p" -> "p"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"delta side must broadcast:\n$plan")
    // the only hash exchanges allowed are the changelog's own delta
    // aggregation — the view side must never enter a shuffled join
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"the view must not re-shuffle for the merge:\n$plan")
  }
}
