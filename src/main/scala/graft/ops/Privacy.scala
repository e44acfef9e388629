package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** k-anonymity enforcement over a generalization ladder — the privacy
  * screen a training-data release pipeline runs before shipping rows
  * that carry quasi-identifiers (demographics, coarse location,
  * account buckets): every emitted row must be indistinguishable from
  * at least k−1 others at SOME level of the ladder, and each row takes
  * the FINEST level that reaches k.
  *
  * `quasi` names the candidate quasi-identifier columns once (raw or
  * coarsened — a bucket width is just another named expression);
  * `levels` lists name-subsets finest-first. A row reports the first
  * level whose group (over that level's columns) has ≥ k members; rows
  * failing even the coarsest level are SUPPRESSED (dropped), k-anonymity's
  * standard outlier treatment.
  *
  * Scale shape: ONE corpus-sized shuffle to the distinct quasi cells
  * (`groupBy` over the union of all quasi columns, map-side partial),
  * then every level's counts aggregate from the CELL frame (cells ≪
  * rows), fold back into it by cell-sized joins, and the annotated
  * cells join to the rows once. The naive form is one full shuffle +
  * full join PER LEVEL; this is one of each regardless of ladder
  * depth. All joins are null-safe (`<=>`): NULL is a quasi value, not
  * a row-dropper.
  *
  * Reference scope: the reference has no privacy surface; this extends
  * the release-gate family next to [[Checks]] (quality contracts) and
  * the PII scrub (q57).
  */
object Privacy {

  /** The ladder functions project working columns (`__q_<quasi>`, the
    * per-level `__n0`/`__l0`/`__s10`/`__t0`, the flat `__s`/`__cn`/…)
    * and emit fixed output names — an input column shadowing ANY of
    * them would yield ambiguous-column errors or silent shadowing, so
    * the whole namespace is checked up front, not just `__s`/`__cn`.
    */
  private def requireFreeNames(fn: String, df: DataFrame, qnames: Seq[String],
                               nLevels: Int, perLevel: Seq[String],
                               flat: Seq[String], outputs: Seq[String]): Unit = {
    val reserved = (qnames.map(n => s"__q_$n") ++ flat ++
      (0 until nLevels).flatMap(i => perLevel.map(p => s"__$p$i")) ++
      outputs).toSet
    val clash = df.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"$fn: input columns collide with the working/output namespace " +
        s"(${clash.mkString(", ")}) — rename them before the ladder")
  }

  private def nullSafeJoin(left: DataFrame, right: DataFrame,
                           names: Seq[String], keep: Seq[String],
                           joinType: String = "inner"): DataFrame = {
    val l = left.alias("__l")
    val r = right.alias("__r")
    val cond = names.map(n => col(s"__l.$n") <=> col(s"__r.$n")).reduce(_ && _)
    l.join(r, cond, joinType)
      .select(left.columns.map(n => col(s"__l.$n")) ++
        keep.map(n => col(s"__r.$n")): _*)
  }

  /** Annotate `df` with (`lvl`, `grp_n`): the 0-based index of the
    * finest generalization level whose quasi group reaches `k`, and
    * that group's size; rows failing every level are dropped.
    */
  def kAnonymize(df: DataFrame, quasi: Seq[(String, Column)],
                 levels: Seq[Seq[String]], k: Long): DataFrame = {
    require(k >= 2, s"k-anonymity needs k >= 2, got $k")
    require(levels.nonEmpty && levels.forall(_.nonEmpty),
      "k-anonymity needs at least one non-empty level")
    val qnames = quasi.map(_._1)
    require(qnames.distinct == qnames, "quasi names must be unique")
    levels.foreach(l => require(l.forall(qnames.contains),
      s"level ${l.mkString(",")} references undeclared quasi columns"))
    requireFreeNames("kAnonymize", df, qnames, levels.size,
      perLevel = Seq("n"), flat = Seq("__cn"), outputs = Seq("lvl", "grp_n"))
    val g = (n: String) => s"__q_$n"
    val proj = df.select(df.columns.map(col) ++
      quasi.map { case (n, c) => c.as(g(n)) }: _*)
    val all = qnames.map(g)
    val cells0 = proj.groupBy(all.map(col): _*).agg(count(lit(1)).as("__cn"))
    // fold each level's roll-up back into the cell frame — cell-sized work
    val cells = levels.zipWithIndex.foldLeft(cells0) { case (cs, (lvl, i)) =>
      val cols = lvl.map(g)
      val cnt = cs.groupBy(cols.map(col): _*)
        .agg(sum(col("__cn")).as(s"__n$i"))
      nullSafeJoin(cs, cnt, cols, Seq(s"__n$i"))
    }
    val annotated = nullSafeJoin(proj, cells, all,
      levels.indices.map(i => s"__n$i"))
    val lvl = coalesce(levels.indices.map(i =>
      when(col(s"__n$i") >= k, lit(i.toLong))): _*)
    val grpN = coalesce(levels.indices.map(i =>
      when(col(s"__n$i") >= k, col(s"__n$i"))): _*)
    annotated
      .withColumn("lvl", lvl).withColumn("grp_n", grpN)
      .where(col("lvl").isNotNull)
      .select(df.columns.map(col) :+ col("lvl") :+ col("grp_n"): _*)
  }

  /** l-diversity on top of k-anonymity — the standard next rung:
    * [[kAnonymize]] bounds group SIZE, but a group of 50 where every
    * member shares one sensitive value still discloses it (the
    * homogeneity attack); distinct l-diversity additionally requires
    * ≥ `l` DISTINCT sensitive values per group. A row takes the finest
    * level satisfying BOTH floors — a level that is k-big but
    * homogeneous escalates coarser, exactly like a too-small one —
    * and rows failing every level are suppressed.
    *
    * Scale shape: same one-shuffle ladder as [[kAnonymize]], with the
    * cell frame at (quasi..., sensitive) grain — its size is the
    * DISTINCT combination count, still ≪ rows. Each level's group
    * count is a sum and its diversity an exact count-distinct over
    * that frame; both roll up cell-sized, fold back by cell-sized
    * null-safe joins, and annotate the rows in one join. NULL
    * sensitive values do not count toward diversity (you cannot
    * disclose a value that isn't there), but their rows still count
    * toward k.
    *
    * Output: `df`'s columns + (`lvl`, `grp_n`, `grp_l`) — the 0-based
    * chosen level, its group size, and its distinct-sensitive count.
    */
  def lDiversify(df: DataFrame, quasi: Seq[(String, Column)],
                 sensitive: Column, levels: Seq[Seq[String]],
                 k: Long, l: Long): DataFrame = {
    require(k >= 2, s"l-diversity needs k >= 2, got $k")
    require(l >= 2, s"l-diversity needs l >= 2, got $l")
    require(levels.nonEmpty && levels.forall(_.nonEmpty),
      "l-diversity needs at least one non-empty level")
    val qnames = quasi.map(_._1)
    require(qnames.distinct == qnames, "quasi names must be unique")
    levels.foreach(lv => require(lv.forall(qnames.contains),
      s"level ${lv.mkString(",")} references undeclared quasi columns"))
    requireFreeNames("lDiversify", df, qnames, levels.size,
      perLevel = Seq("n", "l"), flat = Seq("__s", "__cn"),
      outputs = Seq("lvl", "grp_n", "grp_l"))
    val g = (n: String) => s"__q_$n"
    val proj = df.select(df.columns.map(col) ++
      quasi.map { case (n, c) => c.as(g(n)) } :+ sensitive.as("__s"): _*)
    val all = qnames.map(g)
    val cells0 = proj.groupBy((all.map(col) :+ col("__s")): _*)
      .agg(count(lit(1)).as("__cn"))
    val cells = levels.zipWithIndex.foldLeft(cells0) { case (cs, (lvl, i)) =>
      val cols = lvl.map(g)
      val cnt = cs.groupBy(cols.map(col): _*)
        .agg(sum(col("__cn")).as(s"__n$i"),
          count_distinct(col("__s")).as(s"__l$i"))
      nullSafeJoin(cs, cnt, cols, Seq(s"__n$i", s"__l$i"))
    }
    val annotated = nullSafeJoin(proj, cells, all :+ "__s",
      levels.indices.flatMap(i => Seq(s"__n$i", s"__l$i")))
    def ok(i: Int) = col(s"__n$i") >= k && col(s"__l$i") >= l
    val lvl = coalesce(levels.indices.map(i => when(ok(i), lit(i.toLong))): _*)
    val grpN = coalesce(levels.indices.map(i => when(ok(i), col(s"__n$i"))): _*)
    val grpL = coalesce(levels.indices.map(i => when(ok(i), col(s"__l$i"))): _*)
    annotated
      .withColumn("lvl", lvl).withColumn("grp_n", grpN).withColumn("grp_l", grpL)
      .where(col("lvl").isNotNull)
      .select(df.columns.map(col) :+ col("lvl") :+ col("grp_n") :+ col("grp_l"): _*)
  }

  /** Recursive (c,l)-diversity — distinct l-diversity's standard
    * strengthening (Machanavajjhala et al.): a cell with l distinct
    * sensitive values can still be 99% one value; r(c,l) bounds the
    * SKEW, requiring s₁ < c·(s_l + s_{l+1} + … + s_m) over the cell's
    * descending sensitive-value counts s₁ ≥ … ≥ s_m — the most common
    * value must not dominate the tail from the l-th value on. Fewer
    * than l distinct values makes the tail empty, so r(c,l) subsumes
    * the distinct floor. Counts are integers, so the test is exact
    * and engine-portable. A row takes the finest level satisfying
    * both k and r(c,l); failures escalate, then suppress — exactly
    * [[lDiversify]]'s ladder with the stronger per-level predicate.
    *
    * Scale shape: the same one-shuffle (quasi..., sensitive)-grain
    * cell frame; each level adds a per-sensitive roll-up and ONE
    * window over that level's (group × sensitive-value) frame — both
    * cell-sized, never row-sized. NULL sensitive values count toward
    * k but never enter the count vector.
    *
    * Output: `df`'s columns + (`lvl`, `grp_n`, `grp_s1`, `grp_tail`)
    * — chosen level, group size, top sensitive count, and the
    * rank-≥-l tail sum the test compared against.
    */
  def rlDiversify(df: DataFrame, quasi: Seq[(String, Column)],
                  sensitive: Column, levels: Seq[Seq[String]],
                  k: Long, l: Long, c: Long): DataFrame = {
    require(k >= 2, s"(c,l)-diversity needs k >= 2, got $k")
    require(l >= 2, s"(c,l)-diversity needs l >= 2, got $l")
    require(c >= 1, s"(c,l)-diversity needs c >= 1, got $c")
    require(levels.nonEmpty && levels.forall(_.nonEmpty),
      "(c,l)-diversity needs at least one non-empty level")
    val qnames = quasi.map(_._1)
    require(qnames.distinct == qnames, "quasi names must be unique")
    levels.foreach(lv => require(lv.forall(qnames.contains),
      s"level ${lv.mkString(",")} references undeclared quasi columns"))
    requireFreeNames("rlDiversify", df, qnames, levels.size,
      perLevel = Seq("n", "s1", "t"), flat = Seq("__s", "__cn", "__sc", "__rk"),
      outputs = Seq("lvl", "grp_n", "grp_s1", "grp_tail"))
    val g = (n: String) => s"__q_$n"
    val proj = df.select(df.columns.map(col) ++
      quasi.map { case (n, cc) => cc.as(g(n)) } :+ sensitive.as("__s"): _*)
    val all = qnames.map(g)
    val cells0 = proj.groupBy((all.map(col) :+ col("__s")): _*)
      .agg(count(lit(1)).as("__cn"))
    val cells = levels.zipWithIndex.foldLeft(cells0) { case (cs, (lvl, i)) =>
      val cols = lvl.map(g)
      val n = cs.groupBy(cols.map(col): _*).agg(sum(col("__cn")).as(s"__n$i"))
      val perSens = cs.where(col("__s").isNotNull)
        .groupBy((cols.map(col) :+ col("__s")): _*)
        .agg(sum(col("__cn")).as("__sc"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(cols.map(col): _*)
        .orderBy(col("__sc").desc, col("__s").asc)
      val st = perSens.withColumn("__rk", row_number().over(w))
        .groupBy(cols.map(col): _*)
        .agg(max(when(col("__rk") === 1, col("__sc"))).as(s"__s1$i"),
          coalesce(sum(when(col("__rk") >= l, col("__sc"))), lit(0L))
            .as(s"__t$i"))
      // st is LEFT-joined: a group whose rows are all null-sensitive
      // has no count vector at all — it must stay in the cell frame
      // (a coarser level may still admit it), just with null stats
      // this level's strict < rejects
      nullSafeJoin(nullSafeJoin(cs, n, cols, Seq(s"__n$i")),
        st, cols, Seq(s"__s1$i", s"__t$i"), joinType = "left")
    }
    val annotated = nullSafeJoin(proj, cells, all :+ "__s",
      levels.indices.flatMap(i => Seq(s"__n$i", s"__s1$i", s"__t$i")))
    // a group whose rows are ALL null-sensitive has no count vector at
    // all (st is empty for it): coalesce its s1 to "infinitely skewed"
    // via tail 0, which the strict < already rejects
    def ok(i: Int) = col(s"__n$i") >= k &&
      coalesce(col(s"__s1$i"), lit(0L)) < lit(c) * coalesce(col(s"__t$i"), lit(0L))
    val lvl = coalesce(levels.indices.map(i => when(ok(i), lit(i.toLong))): _*)
    def pick(suffix: String) = coalesce(levels.indices.map(i =>
      when(ok(i), coalesce(col(s"__$suffix$i"), lit(0L)))): _*)
    annotated
      .withColumn("lvl", lvl).withColumn("grp_n", pick("n"))
      .withColumn("grp_s1", pick("s1")).withColumn("grp_tail", pick("t"))
      .where(col("lvl").isNotNull)
      .select(df.columns.map(col) :+ col("lvl") :+ col("grp_n") :+
        col("grp_s1") :+ col("grp_tail"): _*)
  }

  /** t-closeness — the ladder's last standard rung (Li, Li,
    * Venkatasubramanian): diversity bounds how many sensitive values a
    * cell holds and how skewed they are, but a cell whose DISTRIBUTION
    * still differs sharply from the global one leaks (all-low-income
    * cells in a mixed population). For an ORDERED sensitive domain
    * v₁ < … < v_m the Earth Mover's Distance has the exact closed form
    *
    *   EMD = (1/(m−1)) · Σ_{i<m} |Σ_{j≤i} (p_j − q_j)|
    *
    * (prefix sums of the cell-vs-global CDF difference). With integer
    * counts and a rational threshold t = tNum/tDen the test clears
    * denominators — Σ|prefix(cnt_j·N − g_j·n_s)| · tDen ≤
    * tNum·(m−1)·n_s·N — and is EXACT and engine-portable: no floating
    * point anywhere. A row takes the finest level satisfying both
    * k-anonymity and the EMD bound; all-NULL-sensitive groups cannot
    * certify a distribution and escalate. NULL sensitive values count
    * toward k but not toward either distribution.
    *
    * Scale shape: the one-shuffle cell ladder as everywhere, plus per
    * level ONE (groups × domain) frame — cells × m, never rows — with
    * one window over it for the prefix sums. The global domain (m
    * values + total N) collects to the driver: t-closeness is defined
    * against a SMALL ordered domain (buckets, grades, codes); a guard
    * fails fast past `maxDomain`. Long arithmetic is exact while
    * cnt·N < 2⁶³ (N the global non-null row count) — beyond ~3·10⁹
    * rows move the diff column to decimal(38,0); the ppm output
    * already computes in decimal.
    *
    * Output: `df`'s columns + (`lvl`, `grp_n`, `emd_ppm`) — chosen
    * level, its group size, and ⌊10⁶·EMD⌋ at that level.
    */
  def tCloseness(df: DataFrame, quasi: Seq[(String, Column)],
                 sensitive: Column, levels: Seq[Seq[String]],
                 k: Long, tNum: Long, tDen: Long,
                 maxDomain: Int = 4096): DataFrame = {
    require(k >= 2, s"t-closeness needs k >= 2, got $k")
    require(tNum >= 0 && tDen > 0, s"t must be a rational >= 0, got $tNum/$tDen")
    require(levels.nonEmpty && levels.forall(_.nonEmpty),
      "t-closeness needs at least one non-empty level")
    val qnames = quasi.map(_._1)
    require(qnames.distinct == qnames, "quasi names must be unique")
    levels.foreach(lv => require(lv.forall(qnames.contains),
      s"level ${lv.mkString(",")} references undeclared quasi columns"))
    requireFreeNames("tCloseness", df, qnames, levels.size,
      perLevel = Seq("n", "ns", "e"),
      flat = Seq("__s", "__cn", "__sc", "__g", "__d", "__pfx"),
      outputs = Seq("lvl", "grp_n", "emd_ppm"))
    val g = (n: String) => s"__q_$n"
    val proj = df.select(df.columns.map(col) ++
      quasi.map { case (n, cc) => cc.as(g(n)) } :+ sensitive.as("__s"): _*)
    val all = qnames.map(g)
    val cells0 = proj.groupBy((all.map(col) :+ col("__s")): _*)
      .agg(count(lit(1)).as("__cn"))
    // the global ordered domain and its counts — small by contract
    val domRows = cells0.where(col("__s").isNotNull)
      .groupBy(col("__s")).agg(sum(col("__cn")).as("__g"))
      .orderBy(col("__s")).limit(maxDomain + 1).collect()
    require(domRows.length <= maxDomain,
      s"tCloseness: sensitive domain exceeds maxDomain=$maxDomain distinct " +
        "values — t-closeness is defined against a small ordered domain; " +
        "bucket the sensitive column first")
    val m = domRows.length
    require(m >= 2,
      s"tCloseness: the sensitive domain has $m distinct non-null value(s); " +
        "EMD over an ordered domain needs at least 2")
    val bigN = domRows.map(_.getLong(1)).sum
    val dom = proj.sparkSession.createDataFrame(
      java.util.Arrays.asList(domRows: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__s",
          cells0.schema("__s").dataType),
        org.apache.spark.sql.types.StructField("__g",
          org.apache.spark.sql.types.LongType, nullable = false))))
    val cells = levels.zipWithIndex.foldLeft(cells0) { case (cs, (lvl, i)) =>
      val cols = lvl.map(g)
      val n = cs.groupBy(cols.map(col): _*).agg(sum(col("__cn")).as(s"__n$i"))
      val sc = cs.where(col("__s").isNotNull)
        .groupBy((cols.map(col) :+ col("__s")): _*)
        .agg(sum(col("__cn")).as("__sc"))
      val ns = sc.groupBy(cols.map(col): _*).agg(sum(col("__sc")).as(s"__ns$i"))
      // (groups × domain) frame: a value the cell lacks is a genuine
      // ZERO in its distribution and must appear in the prefix walk
      val full = nullSafeJoin(ns.crossJoin(broadcast(dom)), sc,
          cols :+ "__s", Seq("__sc"), joinType = "left")
        .withColumn("__d",
          coalesce(col("__sc"), lit(0L)) * lit(bigN) -
            col("__g") * col(s"__ns$i"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(cols.map(col): _*)
        .orderBy(col("__s").asc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val emd = full.withColumn("__pfx", sum(col("__d")).over(w))
        .groupBy(cols.map(col): _*)
        .agg(sum(abs(col("__pfx"))).as(s"__e$i"),
          first(col(s"__ns$i")).as(s"__ns$i"))
      // emd is LEFT-joined: an all-NULL-sensitive group has no
      // distribution at all — it stays in the cell frame for coarser
      // levels, with null stats this level's predicate rejects
      nullSafeJoin(nullSafeJoin(cs, n, cols, Seq(s"__n$i")),
        emd, cols, Seq(s"__ns$i", s"__e$i"), joinType = "left")
    }
    val annotated = nullSafeJoin(proj, cells, all :+ "__s",
      levels.indices.flatMap(i => Seq(s"__n$i", s"__ns$i", s"__e$i")))
    // the admission product gains tDen / tNum·(m−1) factors over the
    // documented cnt·N < 2⁶³ ceiling — compute it in decimal(38,0) so
    // it can never wrap a long and silently certify a level
    def ok(i: Int) = col(s"__n$i") >= k &&
      coalesce(col(s"__ns$i"), lit(0L)) > 0 &&
      coalesce(col(s"__e$i"), lit(Long.MaxValue)).cast("decimal(38,0)") * tDen <=
        lit(tNum).cast("decimal(38,0)") * lit((m - 1).toLong) *
          col(s"__ns$i") * lit(bigN)
    val lvl = coalesce(levels.indices.map(i => when(ok(i), lit(i.toLong))): _*)
    val grpN = coalesce(levels.indices.map(i => when(ok(i), col(s"__n$i"))): _*)
    // ⌊10⁶·EMD⌋ in decimal — exact past the long range of e·10⁶; the
    // remainder is subtracted BEFORE the division so the quotient is
    // integral and decimal rounding cannot perturb the floor
    def ppmOf(i: Int) = {
      val num = col(s"__e$i").cast("decimal(38,0)") * lit(1000000L)
      val den = (lit((m - 1).toLong).cast("decimal(38,0)") *
        col(s"__ns$i") * lit(bigN))
      ((num - pmod(num, den)) / den).cast("long")
    }
    val ppm = coalesce(levels.indices.map(i => when(ok(i), ppmOf(i))): _*)
    annotated
      .withColumn("lvl", lvl).withColumn("grp_n", grpN)
      .withColumn("emd_ppm", ppm)
      .where(col("lvl").isNotNull)
      .select(df.columns.map(col) :+ col("lvl") :+ col("grp_n") :+
        col("emd_ppm"): _*)
  }

  /** t-closeness for a CATEGORICAL sensitive attribute — the paper's
    * other distance: with no order on the domain, EMD degenerates to
    * the variational distance ½·Σ|p_i − q_i|. Same exact-integer
    * clearing as [[tCloseness]]: the test is Σ|cnt_i·N − g_i·n_s| ·
    * tDen ≤ 2·tNum·n_s·N, and the reported ⌊10⁶·TVD⌋ divides by
    * 2·n_s·N — no floats, no window (per-(group, value) absolute
    * differences sum directly), so it is one partial aggregate
    * cheaper per level than the ordered form. Missing domain values
    * contribute |0 − q_i| = g_i·n_s, accumulated without a domain
    * cross join: Σ over PRESENT values of |cnt·N − g·ns| plus
    * (N − Σ_present g)·n_s for the absent mass. NULL handling, the
    * ladder, and the maxDomain/driver posture match [[tCloseness]]
    * (the domain itself never ships to the driver here — only N).
    *
    * Output: `df`'s columns + (`lvl`, `grp_n`, `tvd_ppm`).
    */
  def tClosenessCategorical(df: DataFrame, quasi: Seq[(String, Column)],
                            sensitive: Column, levels: Seq[Seq[String]],
                            k: Long, tNum: Long, tDen: Long): DataFrame = {
    require(k >= 2, s"t-closeness needs k >= 2, got $k")
    require(tNum >= 0 && tDen > 0, s"t must be a rational >= 0, got $tNum/$tDen")
    require(levels.nonEmpty && levels.forall(_.nonEmpty),
      "t-closeness needs at least one non-empty level")
    val qnames = quasi.map(_._1)
    require(qnames.distinct == qnames, "quasi names must be unique")
    levels.foreach(lv => require(lv.forall(qnames.contains),
      s"level ${lv.mkString(",")} references undeclared quasi columns"))
    requireFreeNames("tClosenessCategorical", df, qnames, levels.size,
      perLevel = Seq("n", "ns", "e"),
      flat = Seq("__s", "__cn", "__sc", "__g", "__gp"),
      outputs = Seq("lvl", "grp_n", "tvd_ppm"))
    val g = (n: String) => s"__q_$n"
    val proj = df.select(df.columns.map(col) ++
      quasi.map { case (n, cc) => cc.as(g(n)) } :+ sensitive.as("__s"): _*)
    val all = qnames.map(g)
    val cells0 = proj.groupBy((all.map(col) :+ col("__s")): _*)
      .agg(count(lit(1)).as("__cn"))
    val dom = cells0.where(col("__s").isNotNull)
      .groupBy(col("__s")).agg(sum(col("__cn")).as("__g"))
    val bigN = dom.agg(sum(col("__g"))).head().getLong(0)
    require(bigN > 0,
      "tClosenessCategorical: no non-null sensitive values — nothing to certify")
    val cells = levels.zipWithIndex.foldLeft(cells0) { case (cs, (lvl, i)) =>
      val cols = lvl.map(g)
      val n = cs.groupBy(cols.map(col): _*).agg(sum(col("__cn")).as(s"__n$i"))
      val sc = cs.where(col("__s").isNotNull)
        .groupBy((cols.map(col) :+ col("__s")): _*)
        .agg(sum(col("__cn")).as("__sc"))
      val ns = sc.groupBy(cols.map(col): _*).agg(sum(col("__sc")).as(s"__ns$i"))
      // present values carry |cnt·N − g·ns|; the group's ABSENT domain
      // mass contributes Σ_absent g·ns = (N − Σ_present g)·ns, added
      // without ever materializing a (groups × domain) frame
      val e = nullSafeJoin(sc.join(broadcast(dom), Seq("__s")), ns,
          cols, Seq(s"__ns$i"))
        .groupBy(cols.map(col): _*)
        .agg(first(col(s"__ns$i")).as(s"__ns$i"),
          (sum(abs(col("__sc") * bigN - col("__g") * col(s"__ns$i"))) +
            (lit(bigN) - sum(col("__g"))) * first(col(s"__ns$i")))
            .as(s"__e$i"))
      nullSafeJoin(nullSafeJoin(cs, n, cols, Seq(s"__n$i")),
        e, cols, Seq(s"__ns$i", s"__e$i"), joinType = "left")
    }
    val annotated = nullSafeJoin(proj, cells, all :+ "__s",
      levels.indices.flatMap(i => Seq(s"__n$i", s"__ns$i", s"__e$i")))
    // decimal(38,0) for the same reason as the ordered form: the extra
    // tDen / 2·tNum factors must not wrap a long near the cnt·N ceiling
    def ok(i: Int) = col(s"__n$i") >= k &&
      coalesce(col(s"__ns$i"), lit(0L)) > 0 &&
      coalesce(col(s"__e$i"), lit(Long.MaxValue)).cast("decimal(38,0)") * tDen <=
        lit(2L).cast("decimal(38,0)") * tNum * col(s"__ns$i") * lit(bigN)
    val lvl = coalesce(levels.indices.map(i => when(ok(i), lit(i.toLong))): _*)
    val grpN = coalesce(levels.indices.map(i => when(ok(i), col(s"__n$i"))): _*)
    def ppmOf(i: Int) = {
      val num = col(s"__e$i").cast("decimal(38,0)") * lit(1000000L)
      val den = (lit(2L).cast("decimal(38,0)") * col(s"__ns$i") * lit(bigN))
      ((num - pmod(num, den)) / den).cast("long")
    }
    val ppm = coalesce(levels.indices.map(i => when(ok(i), ppmOf(i))): _*)
    annotated
      .withColumn("lvl", lvl).withColumn("grp_n", grpN)
      .withColumn("tvd_ppm", ppm)
      .where(col("lvl").isNotNull)
      .select(df.columns.map(col) :+ col("lvl") :+ col("grp_n") :+
        col("tvd_ppm"): _*)
  }

  /** The pseudonym for one column value: md5 of
    * `salt:columnName:value` — keyed (no salt, no re-identification),
    * column-scoped (the same value in two columns maps to two tokens,
    * so tokens never create cross-column linkage the raw data didn't
    * have), deterministic (equal values map to equal tokens, so joins
    * and group-bys still work on the pseudonymized frame), and
    * engine-portable (md5 is md5 everywhere — the [[graft.ops
    * .TextAnalysis.fingerprint]] / `Sampling` portability pattern).
    * NULL stays NULL.
    */
  private def pseudonym(colName: String, salt: String): Column = {
    // the preimage is colon-delimited, so a ':' inside the salt or the
    // column NAME would let distinct (column, value) pairs share a
    // preimage (salt "s", col "a", value "x:y" vs col "a:x", value "y")
    // and silently break the no-cross-column-linkage guarantee (r14
    // advisor finding). Values may contain ':' freely — they occupy the
    // unambiguous tail position. Reject rather than escape: an escape
    // scheme would change every existing token for a cosmetic freedom.
    require(!salt.contains(":"),
      "pseudonym: salt must not contain ':' (colon-delimited preimage)")
    require(!colName.contains(":"),
      s"pseudonym: column name '$colName' must not contain ':' " +
        "(colon-delimited preimage)")
    when(col(colName).isNull, lit(null))
      .otherwise(md5(concat(lit(salt), lit(":"), lit(colName), lit(":"),
        col(colName).cast("string"))))
  }

  /** GDPR-style pseudonymization: replace each listed column's values
    * with stable keyed tokens (see [[pseudonym]]) — the reversible
    * cousin of `TextAnalysis.redactPii` (redaction destroys; tokens
    * preserve joinability, and the [[pseudonymVault]] restores under
    * access control). Map-only: a per-row expression chain, no
    * exchange, codegen'd md5 — a 100 TB frame pseudonymizes in the
    * scan.
    */
  def pseudonymize(df: DataFrame, cols: Seq[String], salt: String): DataFrame = {
    require(cols.nonEmpty, "pseudonymize: at least one column")
    require(salt.nonEmpty, "pseudonymize: empty salt defeats the keying")
    cols.foreach(c => require(df.columns.contains(c),
      s"pseudonymize: no such column '$c'"))
    df.select(df.columns.map(c =>
      if (cols.contains(c)) pseudonym(c, salt).as(c) else col(c)): _*)
  }

  /** The re-identification vault for ONE pseudonymized column: the
    * distinct (value, token) mapping — stored under separate access
    * control, it is the only way back from tokens to values. Fails
    * loudly if two distinct values collide on a token (2⁻¹²⁸-unlikely,
    * but a silent collision would merge two identities): the check is
    * one aggregate over the value-sized vault, never over rows.
    */
  def pseudonymVault(df: DataFrame, colName: String, salt: String): DataFrame = {
    require(df.columns.contains(colName),
      s"pseudonymVault: no such column '$colName'")
    val vault = df.where(col(colName).isNotNull)
      .select(col(colName).cast("string").as("value"),
        pseudonym(colName, salt).as("token"))
      .distinct()
    val collisions = vault.groupBy(col("token"))
      .agg(count(lit(1)).as("__n")).where(col("__n") > 1).count()
    require(collisions == 0L,
      s"pseudonymVault: $collisions token collision(s) on '$colName' — " +
        "change the salt; a silent collision would merge identities")
    vault
  }
}
