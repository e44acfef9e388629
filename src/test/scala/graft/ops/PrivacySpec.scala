package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PrivacySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // (id, city, age)
  private def people = Seq(
    (1L, "ber", 30), (2L, "ber", 31), (3L, "ber", 32),    // ber decade-30: 3
    (4L, "ber", 45),                                       // ber 40s: alone -> city lvl
    (5L, "par", 30), (6L, "par", 31),                      // par 30s: 2 -> city lvl? par has 3
    (7L, "par", 99),
    (8L, "rom", 20)                                        // rom: 1 at every level -> suppressed
  ).toDF("id", "city", "age")

  private def quasi = Seq(
    "city" -> col("city"),
    "dec" -> floor(col("age") / 10).cast("long"))

  test("finest qualifying level wins; failures generalize; outliers suppress") {
    val out = Privacy.kAnonymize(people, quasi,
      Seq(Seq("city", "dec"), Seq("city")), k = 3)
      .select($"id", $"lvl", $"grp_n").as[(Long, Long, Long)].collect().toSet
    assert(out == Set(
      (1L, 0L, 3L), (2L, 0L, 3L), (3L, 0L, 3L),  // (ber, 3x): exactly k
      (4L, 1L, 4L),                               // alone in (ber, 4x), ber has 4
      (5L, 1L, 3L), (6L, 1L, 3L), (7L, 1L, 3L),  // (par, 3x) only 2 — city level
      // rom: 1 member at both levels — suppressed entirely
    ))
  }

  test("every output group at the chosen level really has >= k members") {
    val out = Privacy.kAnonymize(people, quasi,
      Seq(Seq("city", "dec"), Seq("city")), k = 2)
    val bad = out.groupBy($"lvl", $"grp_n").count()
      .where($"count" > $"grp_n").count()
    assert(bad == 0)
    assert(out.columns.toSeq == Seq("id", "city", "age", "lvl", "grp_n"))
  }

  test("NULL is a quasi value, not a row-dropper") {
    val withNulls = Seq(
      (1L, null.asInstanceOf[String], 30),
      (2L, null.asInstanceOf[String], 31),
      (3L, "ber", 40)).toDF("id", "city", "age")
    val out = Privacy.kAnonymize(withNulls, Seq("city" -> col("city")),
      Seq(Seq("city")), k = 2)
      .select($"id", $"grp_n").as[(Long, Long)].collect().toSet
    // the two null-city rows form a k=2 group; ber is alone -> suppressed
    assert(out == Set((1L, 2L), (2L, 2L)))
  }

  test("invalid ladders fail fast") {
    intercept[IllegalArgumentException] {
      Privacy.kAnonymize(people, quasi, Seq(Seq("nope")), k = 2)
    }
    intercept[IllegalArgumentException] {
      Privacy.kAnonymize(people, quasi, Seq(Seq("city")), k = 1)
    }
  }
}
