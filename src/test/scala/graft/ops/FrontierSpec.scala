package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class FrontierSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // (id, grp, size, price)
  private def rows = Seq(
    (1L, "a", 10, 5.0),  // frontier: biggest size, unique price at it
    (2L, "a", 10, 7.0),  // dominated by 1 (same size, higher price)
    (3L, "a", 8, 4.0),   // frontier: cheaper than anything size >= 8
    (4L, "a", 8, 4.0),   // exact tie of 3 — both survive
    (5L, "a", 6, 4.5),   // dominated by 3 (bigger AND cheaper)
    (6L, "a", 6, 4.0),   // dominated by 3 (bigger, equal price, size strict)
    (7L, "a", 2, 1.0),   // frontier: global cheapest
    (8L, "b", 1, 99.0),  // dominated by 9 (bigger, equal price)
    (9L, "b", 2, 99.0)   // frontier: groups are independent
  ).toDF("id", "grp", "size", "price")

  private def bruteSkyline(grp: String): Set[Long] = {
    val rs = rows.where($"grp" === grp)
      .as[(Long, String, Int, Double)].collect()
    rs.filter { r =>
      !rs.exists(q => q._3 >= r._3 && q._4 <= r._4 &&
        (q._3 > r._3 || q._4 < r._4))
    }.map(_._1).toSet
  }

  test("per-group skyline matches the brute-force dominance filter") {
    val got = Frontier.skyline2d(rows, Seq("grp"), "size", "price")
      .select($"id").as[Long].collect().toSet
    assert(got == bruteSkyline("a") ++ bruteSkyline("b"))
    assert(got == Set(1L, 3L, 4L, 7L, 9L))
  }

  test("global skyline (no group) and the shuffled-staircase path agree") {
    val a = Frontier.skyline2d(rows, Seq.empty, "size", "price")
      .select($"id").as[Long].collect().toSet
    val b = Frontier.skyline2d(rows, Seq.empty, "size", "price",
      broadcastStaircase = false)
      .select($"id").as[Long].collect().toSet
    assert(a == b)
    // brute force over the whole table
    val rs = rows.as[(Long, String, Int, Double)].collect()
    val brute = rs.filter { r =>
      !rs.exists(q => q._3 >= r._3 && q._4 <= r._4 &&
        (q._3 > r._3 || q._4 < r._4))
    }.map(_._1).toSet
    assert(a == brute)
  }

  test("null dimensions are excluded, survivors keep all columns") {
    val withNulls = rows.unionByName(
      Seq((100L, "a", null.asInstanceOf[Integer], java.lang.Double.valueOf(0.0)))
        .toDF("id", "grp", "size", "price"))
    val out = Frontier.skyline2d(withNulls, Seq("grp"), "size", "price")
    assert(!out.select($"id").as[Long].collect().contains(100L))
    assert(out.columns.toSet == Set("id", "grp", "size", "price"))
  }

  test("stream-grown frontier equals the one-shot skyline; replay no-ops") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    implicit val ctx = spark.sqlContext
    val rnd = new scala.util.Random(23)
    val data = (1L to 400L).map(i =>
      (i, "g" + rnd.nextInt(3), rnd.nextInt(15), rnd.nextInt(12).toDouble))
    val (seed, rest) = data.splitAt(100)
    val path = graft.core.TempDirs.create("graft_skyline_store")
    Frontier.initSkylineStore(seed.toDF("id", "grp", "size", "price"),
      Seq("grp"), "size", "price", path)
    val in = MemoryStream[(Long, String, Int, Double)]
    val q = Frontier.skylineStream(spark,
      in.toDF().toDF("id", "grp", "size", "price"),
      Seq("grp"), "size", "price", path, ephemeralOk = true)
    try {
      rest.grouped(100).foreach { b => in.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    val got = Frontier.readSkylineStore(spark, path)
      .select(col("id")).as[Long].collect().toSet
    val want = Frontier.skyline2d(data.toDF("id", "grp", "size", "price"),
      Seq("grp"), "size", "price").select(col("id")).as[Long].collect().toSet
    assert(got == want)
    // exactly-once: re-folding an applied batch id leaves the store as is
    graft.core.SwapStore.fold(spark, path, batchId = 0L)(cur => cur.limit(0))
    val after = Frontier.readSkylineStore(spark, path)
      .select(col("id")).as[Long].collect().toSet
    assert(after == want)
  }

  test("randomized agreement with brute force") {
    val rnd = new scala.util.Random(7)
    val data = (1L to 300L).map(i =>
      (i, "g" + rnd.nextInt(3), rnd.nextInt(12), rnd.nextInt(10).toDouble))
    val df = data.toDF("id", "grp", "size", "price")
    val got = Frontier.skyline2d(df, Seq("grp"), "size", "price")
      .select($"id").as[Long].collect().toSet
    val brute = data.filter { r =>
      !data.exists(q => q._2 == r._2 && q._3 >= r._3 && q._4 <= r._4 &&
        (q._3 > r._3 || q._4 < r._4))
    }.map(_._1).toSet
    assert(got == brute)
  }
}
