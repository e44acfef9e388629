package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Bucketed

class ScaleJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted join: same result as plain join under a hot key") {
    // hot key: 9000 of 10000 rows share key 1
    val skewed = spark.range(10000)
      .select(when(col("id") < 9000, 1L).otherwise(col("id")).as("k"), col("id").as("v"))
    val small = Seq((1L, "hot"), (9500L, "cold")).toDF("k2", "label")
    val plain = skewed.join(small, col("k") === col("k2"))
      .groupBy("label").count().as[(String, Long)].collect().toMap
    val salted = Joins.saltedJoin(skewed, small, col("k"), col("k2"),
        saltCols = Seq(col("v")), buckets = 8)
      .groupBy("label").count().as[(String, Long)].collect().toMap
    assert(salted == plain)
    assert(salted("hot") == 9000L && salted("cold") == 1L)
  }

  test("salted join: row-to-bucket placement is stable across partitionings") {
    // the salt is a hash of stable row columns, so the (row -> bucket)
    // assignment itself — not just the joined output — must be identical
    // when the input arrives with a different partitioning (as it would
    // under task retry or a different upstream plan), and must spread the
    // hot key across buckets
    val skewed = spark.range(5000)
      .select(when(col("id") < 4500, 1L).otherwise(col("id")).as("k"), col("id").as("v"))
    def buckets(df: org.apache.spark.sql.DataFrame): Map[Long, Int] =
      df.select(col("v"), Joins.saltExpr(Seq(col("v")), 8).as("salt"))
        .as[(Long, Int)].collect().toMap
    val a = buckets(skewed.repartition(3, col("v")))
    val b = buckets(skewed.repartition(17))
    assert(a == b)
    assert(a.values.toSet.size == 8, "hot-key rows should spread over all buckets")
  }

  test("asofJoin: newest at-or-before right row per key; null when none") {
    val trades = Seq((1L, "a", 100L), (2L, "a", 205L), (3L, "b", 50L), (4L, "c", 10L))
      .toDF("trade_id", "sym", "t_ms")
    val quotes = Seq(("a", 90L, 1.0), ("a", 100L, 2.0), ("a", 200L, 3.0), ("b", 60L, 9.0))
      .toDF("q_sym", "q_ms", "px")
    val got = Joins.asofJoin(trades, quotes,
        col("sym"), col("q_sym"), col("t_ms"), col("q_ms"),
        Seq("px" -> col("px"), "q_ms" -> col("q_ms")))
      .select(col("trade_id"), col("asof.px"), col("asof.q_ms"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some((r.getDouble(1), r.getLong(2))))).toMap
    assert(got(1L) == Some((2.0, 100L)))  // equal-ts quote matches (inclusive)
    assert(got(2L) == Some((3.0, 200L)))  // newest preceding, not just any
    assert(got(3L) == None)               // only a later quote exists for b
    assert(got(4L) == None)               // key with no quotes at all
    // plan shape: one keyed window, no range cross-join
    val p = Joins.asofJoin(trades, quotes, col("sym"), col("q_sym"),
        col("t_ms"), col("q_ms"), Seq("px" -> col("px")))
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"as-of degraded to a range join:\n$p")
  }

  test("asofJoin property: random trades/quotes match a driver-side oracle") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val cases = (1 to 5).flatMap { seed =>
      val g = for {
        nl <- Gen.choose(1, 80)
        nr <- Gen.choose(0, 80)
        keys <- Gen.choose(1, 5)
        lts <- Gen.listOfN(nl, for { k <- Gen.choose(0, keys - 1); t <- Gen.choose(0L, 50L) } yield (k, t))
        rts <- Gen.listOfN(nr, for { k <- Gen.choose(0, keys - 1); t <- Gen.choose(0L, 50L) } yield (k, t))
      } yield (lts, rts)
      g.apply(Gen.Parameters.default, Seed(seed))
    }
    assert(cases.nonEmpty)
    for ((lts, rts) <- cases) {
      val left = lts.zipWithIndex.map { case ((k, t), i) => (i.toLong, s"k$k", t) }
        .toDF("lid", "k", "lt")
      // dedupe right to one row per (key, ts) — the operator's documented
      // determinism precondition — keeping the max payload
      val right = rts.zipWithIndex.map { case ((k, t), i) => (s"k$k", t, i.toLong) }
        .groupBy(r => (r._1, r._2)).map { case ((k, t), rows) => (k, t, rows.map(_._3).max) }
        .toSeq.toDF("rk", "rt", "payload")
      val got = Joins.asofJoin(left, right, col("k"), col("rk"), col("lt"), col("rt"),
          Seq("payload" -> col("payload")))
        .select(col("lid"), col("asof.payload"))
        .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
      val rightByKey = rts.zipWithIndex.map { case ((k, t), i) => (s"k$k", t, i.toLong) }
        .groupBy(r => (r._1, r._2)).map { case ((k, t), rows) => (k, t, rows.map(_._3).max) }
        .toSeq.groupBy(_._1)
      val want = lts.zipWithIndex.map { case ((k, t), i) =>
        val eligible = rightByKey.getOrElse(s"k$k", Seq.empty).filter(_._2 <= t)
        i.toLong -> (if (eligible.isEmpty) -1L else eligible.maxBy(_._2)._3)
      }.toMap
      assert(got == want, s"nl=${lts.size} nr=${rts.size}")
    }
  }

  test("binnedRangeJoin equals the naive range join; no nested-loop in the plan") {
    val points = spark.range(2000).select(col("id").as("p_id"),
      timestamp_millis(lit(1704067200000L) + col("id") * 7919).as("p_ts"))
    val intervals = spark.range(40).select(col("id").as("i_id"),
      timestamp_millis(lit(1704067200000L) + col("id") * 397000).as("s"),
      timestamp_millis(lit(1704067200000L) + col("id") * 397000 + 120000).as("e"))
    val naive = points.join(intervals,
        col("p_ts") >= col("s") && col("p_ts") <= col("e"))
      .select(col("i_id"), col("p_id")).as[(Long, Long)].collect().toSet
    val binnedDf = Joins.binnedRangeJoin(points, col("p_ts"),
      intervals, col("s"), col("e"), binMs = 60000L)
    val binned = binnedDf.select(col("i_id"), col("p_id"))
      .as[(Long, Long)].collect().toSet
    assert(binned == naive && binned.nonEmpty,
      s"binned=${binned.size} naive=${naive.size}")
    // the whole point: a hash join on the bin id, not a nested loop
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = Joins.binnedRangeJoin(points, col("p_ts"),
          intervals, col("s"), col("e"), binMs = 60000L)
        .queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"range join still a nested loop:\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"no hash-based join on the bin key:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("binnedOverlapJoin equals the naive overlap join — multi-bin pairs admitted once") {
    // long intervals guarantee pairs share MANY bins, exercising the
    // first-shared-bin dedup
    val wa = spark.range(30).select(col("id").as("a_id"),
      timestamp_millis(lit(1704067200000L) + col("id") * 300000).as("a_s"),
      timestamp_millis(lit(1704067200000L) + col("id") * 300000 + 600000).as("a_e"))
    val wb = spark.range(40).select(col("id").as("b_id"),
      timestamp_millis(lit(1704067100000L) + col("id") * 250000).as("b_s"),
      timestamp_millis(lit(1704067100000L) + col("id") * 250000 + 450000).as("b_e"))
    val naive = wa.join(wb, col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
      .select(col("a_id"), col("b_id")).as[(Long, Long)].collect()
    val binned = Joins.binnedOverlapJoin(wa, col("a_s"), col("a_e"),
        wb, col("b_s"), col("b_e"), binMs = 60000L)
      .select(col("a_id"), col("b_id")).as[(Long, Long)].collect()
    // exact multiset equality: a multi-bin duplicate would fail the size
    // check even when the sets agree
    assert(binned.sorted.toSeq == naive.sorted.toSeq && naive.nonEmpty)
  }

  test("binnedRangeJoin: a pathological interval fails fast instead of exploding") {
    val points = Seq((1L, new java.sql.Timestamp(1704067200000L))).toDF("p_id", "p_ts")
    val intervals = Seq((1L, new java.sql.Timestamp(1704067200000L),
      new java.sql.Timestamp(1704067200000L + 365L * 86400000L))).toDF("i_id", "s", "e")
    val ex = intercept[Exception] {
      Joins.binnedRangeJoin(points, col("p_ts"), intervals, col("s"), col("e"),
        binMs = 60000L, maxBinsPerInterval = 100).collect()
    }
    assert(ex.getMessage != null && ex.getMessage.contains("binnedRangeJoin"))
    // inclusive bounds + interval ends honored exactly at the bin edge
    val ok = Joins.binnedRangeJoin(points, col("p_ts"), intervals, col("s"), col("e"),
      binMs = 60000L, maxBinsPerInterval = 1000000).count()
    assert(ok == 1)
  }

  test("bucketed tables join without exchange on the bucket key") {
    val a = spark.range(1000).select(col("id").as("k"), (col("id") * 2).as("va"))
    val b = spark.range(1000).select(col("id").as("k"), (col("id") * 3).as("vb"))
    Bucketed.write(a, "bk_a", "k", 4)
    Bucketed.write(b, "bk_b", "k", 4)
    // tiny tables would broadcast (which bypasses bucketing entirely);
    // force the sort-merge path a 100 TB same-key join takes
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketed.read(spark, "bk_a")
        .join(Bucketed.read(spark, "bk_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin"))
      assert(joined.count() == 1000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("asofNearest: minimum |dt| wins, earlier on ties, no-match nulls, no join node") {
    import org.apache.spark.sql.functions.col
    val left = Seq((1L, 100L, "e1"), (1L, 205L, "e2"), (1L, 400L, "e3"),
      (2L, 50L, "lonely")).toDF("k", "ts", "tag")
    // key 1 right: 90 (|10| to e1), 210 (|5| to e2), 300
    //   e2 at 205: prev 210? no — prev is <=205: 90? 210>205 so prev=90(|115|),
    //   next=210(|5|) -> 210; e3 at 400: prev 300 (|100|), no next -> 300
    //   e1 at 100: prev 90 (|10|), next 210 (|110|) -> 90
    val right = Seq((1L, 90L, 9L), (1L, 210L, 21L), (1L, 300L, 30L))
      .toDF("k", "ts", "v")
    val got = Joins.asofNearest(left, right, col("k"), col("k"),
      col("ts"), col("ts"), Seq("v" -> col("v")))
      .select(col("tag"), col("nearest.v"), col("nearest_dt"))
      .as[(String, Option[Long], Option[Long])].collect().toSet
    assert(got == Set(("e1", Some(9L), Some(-10L)), ("e2", Some(21L), Some(5L)),
      ("e3", Some(30L), Some(-100L)), ("lonely", None, None)))
    // exact tie: right at 100 and 300, left at 200 -> EARLIER (100) wins
    val tied = Joins.asofNearest(Seq((1L, 200L)).toDF("k", "ts"),
      Seq((1L, 100L, "a"), (1L, 300L, "b")).toDF("k", "ts", "v"),
      col("k"), col("k"), col("ts"), col("ts"), Seq("v" -> col("v")))
      .select(col("nearest.v")).as[String].head()
    assert(tied == "a")
    // equal timestamp: distance 0 via the backward carry
    val eq = Joins.asofNearest(Seq((1L, 100L)).toDF("k", "ts"),
      Seq((1L, 100L, "x")).toDF("k", "ts", "v"),
      col("k"), col("k"), col("ts"), col("ts"), Seq("v" -> col("v")))
      .select(col("nearest_dt")).as[Long].head()
    assert(eq == 0L)
    val plan = Joins.asofNearest(left, right, col("k"), col("k"),
      col("ts"), col("ts"), Seq("v" -> col("v")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"asofNearest must not contain a join:\n$plan")
    intercept[IllegalArgumentException] {
      Joins.asofNearest(left.withColumn("ts", col("ts").cast("double")), right,
        col("k"), col("k"), col("ts"), col("ts"), Seq("v" -> col("v")))
    }
  }
}
