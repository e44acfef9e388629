package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class FuzzySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private val vocab = Seq("cold", "old", "bold", "gold", "golds", "red",
    "rod", "row", "stream", "steam", "dream", "abcabd", "abcd", "", "a", "ab")

  test("self-join at k=1 and k=2 matches the brute-force cross join") {
    val df = vocab.toDF("w")
    for (k <- Seq(1, 2)) {
      val got = Fuzzy.editSelfJoin(df, col("w"), k)
        .as[(String, String, Long)].collect().toSet
      val brute = (for {
        a <- vocab; b <- vocab if a < b
        d = lev(a, b) if d <= k
      } yield (a, b, d.toLong)).toSet
      assert(got == brute, s"k=$k")
    }
  }

  test("two-sided join is exact and keeps sides straight") {
    val left = Seq("steam", "zzz").toDF("l")
    val right = Seq("stream", "steam", "team", "zebra").toDF("r")
    val got = Fuzzy.editJoin(left, col("l"), right, col("r"), 1)
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("steam", "stream", 1L), ("steam", "steam", 0L),
      ("steam", "team", 1L)))
  }

  test("candidate collisions beyond k are verified away") {
    // U_2("abcabd") and U_2("abcd") intersect (delete positions 4,5 of
    // the former; it IS distance 2 away — but "abcabd" vs "dcba" is 4)
    val got = Fuzzy.editJoin(Seq("abcabd").toDF("l"), col("l"),
      Seq("dcba").toDF("r"), col("r"), 2)
    assert(got.count() == 0)
  }

  test("overlong strings fail loudly instead of exploding variants") {
    val long = "x" * 80
    val e = intercept[Exception] {
      Fuzzy.editSelfJoin(Seq(long, "y").toDF("w"), col("w"), 1).count()
    }
    assert(e.getMessage.contains("maxLen") ||
      e.getCause != null && e.getCause.getMessage.contains("maxLen"))
  }
}
