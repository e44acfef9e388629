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

  // (id, city, age, disease) — the l-diversity fixtures
  private def patients = Seq(
    (1L, "ber", 30, "flu"), (2L, "ber", 31, "flu"), (3L, "ber", 32, "flu"),
    (4L, "ber", 45, "cold"),
    (5L, "par", 30, "flu"), (6L, "par", 31, "cold"), (7L, "par", 33, "mal"),
    (8L, "rom", 20, "flu")
  ).toDF("id", "city", "age", "disease")

  test("l-diversity: a k-big but homogeneous cell escalates like a too-small one") {
    val out = Privacy.lDiversify(patients, quasi, col("disease"),
      Seq(Seq("city", "dec"), Seq("city")), k = 3, l = 2)
      .select($"id", $"lvl", $"grp_n", $"grp_l")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out == Set(
      // (ber, 3x): n=3 reaches k but EVERY member has flu (d=1) —
      // the homogeneity attack k-anonymity alone misses — escalate
      (1L, 1L, 4L, 2L), (2L, 1L, 4L, 2L), (3L, 1L, 4L, 2L),
      (4L, 1L, 4L, 2L),                    // alone in (ber, 4x): size escalation
      (5L, 0L, 3L, 3L), (6L, 0L, 3L, 3L), (7L, 0L, 3L, 3L), // (par, 3x): both floors
      // rom: 1 member everywhere — suppressed
    ))
    // same data under k-anonymity only: rows 1-3 stay at level 0 —
    // the disclosure l-diversity exists to close
    val kOnly = Privacy.kAnonymize(patients, quasi,
      Seq(Seq("city", "dec"), Seq("city")), k = 3)
      .select($"id", $"lvl").as[(Long, Long)].collect().toMap
    assert(kOnly(1L) == 0L)
  }

  test("l-diversity: NULL sensitive counts toward k but never toward diversity") {
    val rows = Seq(
      (1L, "a", "flu"), (2L, "a", null.asInstanceOf[String]), (3L, "a", null.asInstanceOf[String]),
      (4L, "b", "flu"), (5L, "b", "cold"), (6L, "b", null.asInstanceOf[String])
    ).toDF("id", "cell", "disease")
    val out = Privacy.lDiversify(rows, Seq("cell" -> col("cell")),
      col("disease"), Seq(Seq("cell")), k = 3, l = 2)
      .select($"id", $"grp_n", $"grp_l").as[(Long, Long, Long)].collect().toSet
    // cell a: n=3 (nulls count toward size) but only ONE disclosed
    // value — suppressed; cell b: n=3, two distinct diseases — kept
    assert(out == Set((4L, 3L, 2L), (5L, 3L, 2L), (6L, 3L, 2L)))
  }

  test("recursive (c,l)-diversity: a diverse-but-skewed cell escalates; the test is s1 < c*tail") {
    // cell (ber, dec 3x): 6 rows, diseases flu x4, cold, mal -> 3
    // distinct (distinct l=3 passes) but s1=4 >= 3*(tail at l=3: s3=1)
    // -> r(3,3) FAILS; city ber adds 2 colds + mal: counts flu 4,
    // cold 3, mal 2 -> s1=4 < 3*2 -> passes at level 1
    val skewed = Seq(
      (1L, "ber", 30, "flu"), (2L, "ber", 31, "flu"), (3L, "ber", 32, "flu"),
      (4L, "ber", 33, "flu"), (5L, "ber", 34, "cold"), (6L, "ber", 35, "mal"),
      (7L, "ber", 45, "cold"), (8L, "ber", 46, "cold"), (9L, "ber", 47, "mal")
    ).toDF("id", "city", "age", "disease")
    val out = Privacy.rlDiversify(skewed, quasi, col("disease"),
      Seq(Seq("city", "dec"), Seq("city")), k = 3, l = 3, c = 3)
      .select($"id", $"lvl", $"grp_n", $"grp_s1", $"grp_tail")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // distinct l-diversity would keep rows 1-6 at level 0; r(2,3) must not
    val dOut = Privacy.lDiversify(skewed, quasi, col("disease"),
      Seq(Seq("city", "dec"), Seq("city")), k = 3, l = 3)
      .select($"id", $"lvl").as[(Long, Long)].collect().toMap
    assert(dOut(1L) == 0L)
    // r(3,3): every row escalates to city (counts 4/3/2: 4 < 3*2)
    assert(out.map(_._1) == (1L to 9L).toSet)
    assert(out.forall { case (_, lvl, n, s1, tail) =>
      lvl == 1L && n == 9L && s1 == 4L && tail == 2L })
  }

  test("recursive (c,l)-diversity: fewer than l distinct values means an empty tail and suppression") {
    val rows = Seq(
      (1L, "a", "flu"), (2L, "a", "flu"), (3L, "a", "cold"),
      (4L, "b", null.asInstanceOf[String]), (5L, "b", null.asInstanceOf[String]),
      (6L, "b", null.asInstanceOf[String])
    ).toDF("id", "cell", "disease")
    val out = Privacy.rlDiversify(rows, Seq("cell" -> col("cell")),
      col("disease"), Seq(Seq("cell")), k = 3, l = 3, c = 10)
      .select($"id").as[Long].collect().toSet
    // cell a: 2 distinct < l=3 -> tail empty -> fails even at c=10;
    // cell b: all-null sensitive, no count vector at all -> fails
    // (but must fail by PREDICATE, not by vanishing from the frame)
    assert(out == Set.empty[Long])
  }

  test("l-diversity: invalid floors fail fast") {
    intercept[IllegalArgumentException] {
      Privacy.lDiversify(patients, quasi, col("disease"),
        Seq(Seq("city")), k = 2, l = 1)
    }
    intercept[IllegalArgumentException] {
      Privacy.lDiversify(patients, quasi, col("disease"),
        Seq(Seq("nope")), k = 2, l = 2)
    }
  }

  // ---- t-closeness ----

  // ordered sensitive s in {1,2,3}; global: 1->3, 2->2, 3->3, N=8, m=3.
  // city a: (2,1,1) — prefix diffs 4,4,0 -> EMD = 8/(2*4*8) = 0.125
  // city b: (1,1,2) — symmetric, EMD = 0.125
  private def salaries = Seq(
    (1L, "a", 1L), (2L, "a", 1L), (3L, "a", 2L), (4L, "a", 3L),
    (5L, "b", 3L), (6L, "b", 3L), (7L, "b", 2L), (8L, "b", 1L)
  ).toDF("id", "city", "sal")

  private def tQuasi = Seq("city" -> col("city"), "all" -> lit(0L))

  test("t-closeness: the ordered-domain EMD is exact and the ladder escalates on it") {
    // t = 1/8 == both cells' EMD exactly: the finest level passes
    val pass = Privacy.tCloseness(salaries, tQuasi, col("sal"),
      Seq(Seq("city"), Seq("all")), k = 2, tNum = 1, tDen = 8)
      .select($"id", $"lvl", $"grp_n", $"emd_ppm")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(pass == (1L to 8L).map(i => (i, 0L, 4L, 125000L)).toSet)
    // t = 1/10 < EMD: every cell escalates to the global level, whose
    // distribution IS the global one (EMD exactly 0)
    val esc = Privacy.tCloseness(salaries, tQuasi, col("sal"),
      Seq(Seq("city"), Seq("all")), k = 2, tNum = 1, tDen = 10)
      .select($"id", $"lvl", $"grp_n", $"emd_ppm")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(esc == (1L to 8L).map(i => (i, 1L, 8L, 0L)).toSet)
  }

  test("t-closeness: NULL sensitive counts toward k but not the distribution") {
    val rows = salaries.unionByName(Seq(
      (9L, "c", null.asInstanceOf[java.lang.Long]),
      (10L, "c", null.asInstanceOf[java.lang.Long]))
      .toDF("id", "city", "sal"))
    val out = Privacy.tCloseness(rows, tQuasi, col("sal"),
      Seq(Seq("city"), Seq("all")), k = 2, tNum = 1, tDen = 8)
      .select($"id", $"lvl").as[(Long, Long)].collect().toMap
    // city c is k-big (n=2) but has NO distribution to certify: it must
    // escalate to the global level, not pass the finest by default
    assert(out(9L) == 1L && out(10L) == 1L)
    assert((1L to 8L).forall(out(_) == 0L))
    // at the global level the null rows still ride the group whose
    // non-null distribution equals the global one
  }

  test("t-closeness: degenerate or oversized sensitive domains fail fast") {
    intercept[IllegalArgumentException] {
      Privacy.tCloseness(salaries.withColumn("sal", lit(1L)), tQuasi,
        col("sal"), Seq(Seq("city")), k = 2, tNum = 1, tDen = 2)
    }
    intercept[IllegalArgumentException] {
      Privacy.tCloseness(salaries, tQuasi, col("sal"),
        Seq(Seq("city")), k = 2, tNum = 1, tDen = 2, maxDomain = 2)
    }
  }

  test("categorical t-closeness: variational distance is exact; absent domain mass counts") {
    // salaries ∪ city c (two sal=1 rows): global 1→5, 2→2, 3→3, N=10.
    // a: (2,1,1)/4 → e = |20−20|+|10−8|+|10−12| = 4  → TVD 4/80  = 0.05
    // b: (1,1,2)/4 → e = |10−20|+|10−8|+|20−12| = 20 → TVD 20/80 = 0.25
    // c: (2,0,0)/2 → present |20−10| = 10, ABSENT (10−5)·2 = 10 →
    //                e = 20 → TVD 20/40 = 0.5 (the missing values are
    //                genuine zeros in c's distribution)
    val rows = salaries.unionByName(Seq(
      (9L, "c", 1L), (10L, "c", 1L)).toDF("id", "city", "sal"))
    val out = Privacy.tClosenessCategorical(rows, tQuasi, col("sal"),
      Seq(Seq("city"), Seq("all")), k = 2, tNum = 1, tDen = 2)
      .select($"id", $"lvl", $"grp_n", $"tvd_ppm")
      .as[(Long, Long, Long, Long)].collect().toSet
    val want = (1L to 4L).map(i => (i, 0L, 4L, 50000L)) ++
      (5L to 8L).map(i => (i, 0L, 4L, 250000L)) ++
      (9L to 10L).map(i => (i, 0L, 2L, 500000L))
    assert(out == want.toSet)
    // a tighter t: b and c escalate to the global level (TVD exactly 0)
    val esc = Privacy.tClosenessCategorical(rows, tQuasi, col("sal"),
      Seq(Seq("city"), Seq("all")), k = 2, tNum = 1, tDen = 10)
      .select($"id", $"lvl", $"tvd_ppm").as[(Long, Long, Long)].collect().toSet
    assert(esc == ((1L to 4L).map(i => (i, 0L, 50000L)) ++
      (5L to 10L).map(i => (i, 1L, 0L))).toSet)
    // namespace guard covers the new output too
    intercept[IllegalArgumentException] {
      Privacy.tClosenessCategorical(rows.withColumn("tvd_ppm", lit(1L)),
        tQuasi, col("sal"), Seq(Seq("city")), k = 2, tNum = 1, tDen = 2)
    }
  }

  test("the full working/output namespace is guarded, not just __s/__cn") {
    val bad1 = people.withColumn("grp_n", lit(1L))
    intercept[IllegalArgumentException] {
      Privacy.kAnonymize(bad1, quasi, Seq(Seq("city")), k = 2)
    }
    val bad2 = people.withColumn("__q_city", lit(1L))
    intercept[IllegalArgumentException] {
      Privacy.kAnonymize(bad2, quasi, Seq(Seq("city")), k = 2)
    }
    val bad3 = patients.withColumn("__l0", lit(1L))
    intercept[IllegalArgumentException] {
      Privacy.lDiversify(bad3, quasi, col("disease"), Seq(Seq("city")), k = 2, l = 2)
    }
    val bad4 = patients.withColumn("grp_tail", lit(1L))
    intercept[IllegalArgumentException] {
      Privacy.rlDiversify(bad4, quasi, col("disease"), Seq(Seq("city")),
        k = 2, l = 2, c = 2)
    }
    val bad5 = salaries.withColumn("emd_ppm", lit(1L))
    intercept[IllegalArgumentException] {
      Privacy.tCloseness(bad5, tQuasi, col("sal"), Seq(Seq("city")),
        k = 2, tNum = 1, tDen = 2)
    }
  }

  test("pseudonymize: stable, keyed, column-scoped tokens; NULL stays NULL; joinability survives") {
    val df = Seq((1L, Some("ann"), "ann"), (2L, Some("bob"), "ann"),
      (3L, None, "bob")).toDF("id", "name", "referrer")
    val p = Privacy.pseudonymize(df, Seq("name", "referrer"), "s1")
    val byId = p.as[(Long, Option[String], String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // deterministic: equal values -> equal tokens (rows 1 and 2 share
    // the referrer token; row 1's name token equals it only if the
    // column scoping were broken)
    assert(byId(1L)._2 == byId(2L)._2, "equal values must map to equal tokens")
    assert(byId(1L)._1.get != byId(1L)._2,
      "the same value in two columns must get DIFFERENT tokens (column scoping)")
    assert(byId(3L)._1.isEmpty, "NULL stays NULL")
    // keyed: a different salt changes every token
    val p2 = Privacy.pseudonymize(df, Seq("name"), "s2")
      .as[(Long, Option[String], String)].collect().map(r => r._1 -> r._2).toMap
    assert(p2(1L) != byId(1L)._1)
    // untouched columns pass through; schema/order preserved
    assert(p.columns.toSeq == df.columns.toSeq)
    // vault: one row per distinct value, token matches the frame
    val vault = Privacy.pseudonymVault(df, "name", "s1")
      .as[(String, String)].collect().toMap
    assert(vault.keySet == Set("ann", "bob"))
    assert(vault("ann") == byId(1L)._1.get)
    intercept[IllegalArgumentException] {
      Privacy.pseudonymize(df, Seq("nope"), "s1")
    }
    intercept[IllegalArgumentException] {
      Privacy.pseudonymize(df, Seq("name"), "")
    }
  }
}
