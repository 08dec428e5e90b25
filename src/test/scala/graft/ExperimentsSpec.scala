package graft

import graft.operators.Experiments
import org.apache.spark.sql.functions._

/** Hand-computed fixtures for the A/B-experimentation family:
  * two-proportion z-test, Mann–Whitney U, CUPED adjustment. Every
  * expected value is derived by hand from the textbook formula and
  * asserted as the exact micro-integer the operator must emit.
  */
class ExperimentsSpec extends SparkSpec {
  import spark.implicits._

  test("twoProportionZ: 8/10 vs 2/10 scores z2=7.2 exactly; degenerate pooled rate scores 0") {
    // group g: A converts 8/10, B converts 2/10.
    // d = x_a*n_b - x_b*n_a = 80-20 = 60; N = 20, X = 10.
    // z2_6 = 1e6 * 60^2 * 20 div (10*10*10*10) = 7_200_000 — significant.
    val rows =
      (1 to 10).map(i => ("g", "A", if (i <= 8) 1L else 0L)) ++
        (1 to 10).map(i => ("g", "B", if (i <= 2) 1L else 0L)) ++
        // group z: nobody converts on either side -> X = 0 -> z2 0
        (1 to 5).map(_ => ("z", "A", 0L)) ++ (1 to 5).map(_ => ("z", "B", 0L))
    val got = Experiments
      .twoProportionZ(rows.toDF("g", "v", "s"), col("g"), col("v"), col("s"))
      .orderBy(col("group"))
      .collect()
      .map(r => (r.getString(0), r.getLong(7), r.getBoolean(8)))
    assert(got.toSeq == Seq(("g", 7200000L, true), ("z", 0L, false)))
  }

  test("twoProportionZ: one-armed and three-armed groups are dropped") {
    val rows = Seq(
      ("one", "A", 1L), ("one", "A", 0L),
      ("three", "A", 1L), ("three", "B", 0L), ("three", "C", 1L))
    val got = Experiments
      .twoProportionZ(rows.toDF("g", "v", "s"), col("g"), col("v"), col("s"))
    assert(got.count() == 0L)
  }

  test("mannWhitneyU: no-tie complete separation scores z2=2.4; mid-rank ties score z2=1") {
    // a={1,2}, b={3,4}: U_a = 0, mean 2, var 5/3 -> z2 = 2.4 exactly.
    val sep = Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L)).toDF("s", "v")
    val r1 = Experiments.mannWhitneyU(sep, col("s"), col("v")).head()
    assert((r1.getLong(2), r1.getLong(3), r1.getLong(4), r1.getLong(5), r1.getBoolean(6)) ==
      ((2L, 2L, 0L, 2400000L, false)))
    // a={1,1}, b={1,2}: v=1 has t=3 (doubled mid-rank 4), ties3 = 24.
    // 2U_a = 8 - 6 = 2; var with ties = 1 -> z2 = (1-2)^2/1 = 1.
    val tied = Seq(("a", 1L), ("a", 1L), ("b", 1L), ("b", 2L)).toDF("s", "v")
    val r2 = Experiments.mannWhitneyU(tied, col("s"), col("v")).head()
    assert((r2.getLong(4), r2.getLong(5)) == ((2L, 1000000L)))
  }

  test("mannWhitneyU: all-equal values degenerate to z2=0; three sides fail fast") {
    val const = Seq(("a", 5L), ("b", 5L)).toDF("s", "v")
    val r = Experiments.mannWhitneyU(const, col("s"), col("v")).head()
    assert((r.getLong(5), r.getBoolean(6)) == ((0L, false)))
    val three = Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("s", "v")
    val e = intercept[Exception](
      Experiments.mannWhitneyU(three, col("s"), col("v")).head())
    assert(e.getMessage.contains("exactly 2 sides"))
  }

  test("cupedAdjust: perfectly linear metric collapses to a constant adjusted value") {
    // y = 10x: theta6 = 1e7, and every unit's adj6 lands on 1e6*ybar = 2e7.
    val df = Seq(("k1", 10L, 1L), ("k2", 20L, 2L), ("k3", 30L, 3L)).toDF("k", "y", "x")
    val got = Experiments
      .cupedAdjust(df, col("k"), col("y"), col("x"))
      .collect()
      .map(r => (r.getString(0), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      ("k1", 10000000L, 20000000L),
      ("k2", 10000000L, 20000000L),
      ("k3", 10000000L, 20000000L)))
  }

  test("cupedAdjust: constant covariate fails fast") {
    val df = Seq(("k1", 10L, 5L), ("k2", 20L, 5L)).toDF("k", "y", "x")
    val e = intercept[Exception](
      Experiments.cupedAdjust(df, col("k"), col("y"), col("x")).head())
    assert(e.getMessage.contains("covariate is constant"))
  }

  test("srmCheck: on-design split scores 0; 50/50 under a 1:3 design scores chi2=13.333") {
    val w = Map("control" -> 1L, "treatment" -> 3L)
    val onDesign =
      (1 to 10).map(_ => ("g", "control")) ++ (1 to 30).map(_ => ("g", "treatment"))
    val r0 = Experiments
      .srmCheck(onDesign.toDF("g", "v"), col("g"), col("v"), w).head()
    assert((r0.getLong(1), r0.getLong(2), r0.getLong(3), r0.getBoolean(4)) ==
      ((40L, 2L, 0L, false)))
    // 20/20 observed against 1:3 designed: 10 + 10/3 = 13.333... (micro-truncated per term)
    val skew =
      (1 to 20).map(_ => ("g", "control")) ++ (1 to 20).map(_ => ("g", "treatment"))
    val r1 = Experiments
      .srmCheck(skew.toDF("g", "v"), col("g"), col("v"), w).head()
    assert((r1.getLong(3), r1.getBoolean(4)) == ((13333333L, true)))
  }

  test("srmCheck: zero-traffic designed arm still contributes; off-design variant fails fast") {
    val w = Map("control" -> 1L, "treatment" -> 3L)
    // all 8 rows landed in treatment: chi2 = 2 + 2/3 = 2.666666
    val oneArm = (1 to 8).map(_ => ("g", "treatment"))
    val r = Experiments
      .srmCheck(oneArm.toDF("g", "v"), col("g"), col("v"), w).head()
    assert((r.getLong(2), r.getLong(3), r.getBoolean(4)) == ((2L, 2666666L, false)))
    val rogue = Seq(("g", "control"), ("g", "rogue"))
    val e = intercept[Exception](
      Experiments.srmCheck(rogue.toDF("g", "v"), col("g"), col("v"), w).head())
    assert(e.getMessage.contains("outside the designed allocation"))
    val tooMany = (1 to 12).map(i => s"v$i" -> 1L).toMap
    val e2 = intercept[IllegalArgumentException](
      Experiments.srmCheck(rogue.toDF("g", "v"), col("g"), col("v"), tooMany))
    assert(e2.getMessage.contains("1..11"))
  }

  test("welchT: hand-computed unequal variances score t2=16.2; constant arms score 0") {
    // A={2,4} (var 2), B={10,14} (var 8): t2 = 81/(1+4) = 16.2 exactly.
    val rows = Seq(("g", "A", 2L), ("g", "A", 4L), ("g", "B", 10L), ("g", "B", 14L))
    val r = Experiments
      .welchT(rows.toDF("g", "v", "y"), col("g"), col("v"), col("y")).head()
    assert((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getBoolean(7)) ==
      ((2L, 2L, -9000000L, 16200000L, true)))
    // both arms constant -> zero sampling variance -> 0 by convention
    val const = Seq(("g", "A", 5L), ("g", "A", 5L), ("g", "B", 7L), ("g", "B", 7L))
    val rc = Experiments
      .welchT(const.toDF("g", "v", "y"), col("g"), col("v"), col("y")).head()
    assert((rc.getLong(5), rc.getLong(6), rc.getBoolean(7)) == ((-2000000L, 0L, false)))
  }

  test("welchT: an arm with n < 2 drops its group") {
    val rows = Seq(("g", "A", 2L), ("g", "B", 10L), ("g", "B", 14L))
    assert(Experiments
      .welchT(rows.toDF("g", "v", "y"), col("g"), col("v"), col("y")).count() == 0L)
  }

  test("twoProportionZFromCells: sum-merged partial cells equal the one-shot test exactly") {
    // the cells are the sufficient statistic — two partial batches
    // merged by summing (n, x) must reproduce the 8/10-vs-2/10 score
    val partials = Seq(
      ("g", "A", 6L, 5L), ("g", "B", 4L, 1L),  // batch 1
      ("g", "A", 4L, 3L), ("g", "B", 6L, 1L))  // batch 2
      .toDF("g", "v", "n", "x")
    val merged = partials.groupBy(col("g"), col("v"))
      .agg(sum(col("n")).as("n"), sum(col("x")).as("x"))
    val r = Experiments.twoProportionZFromCells(merged).head()
    assert((r.getLong(7), r.getBoolean(8)) == ((7200000L, true)))
  }

  test("mdeSampleSize: 8/10 vs 2/10 needs 7 per arm; zero delta yields null with the flag") {
    // NUM = 8*2*100 + 2*8*100 = 3200; d = 60, d^2 = 3600.
    // n_req = ceil(7848880*3200 / (1e6*3600)) = ceil(6.9768) = 7.
    val rows =
      (1 to 10).map(i => ("g", "A", if (i <= 8) 1L else 0L)) ++
        (1 to 10).map(i => ("g", "B", if (i <= 2) 1L else 0L)) ++
        // equal rates: delta 0 -> no finite n detects it
        (1 to 2).map(i => ("z", "A", if (i <= 1) 1L else 0L)) ++
        (1 to 2).map(i => ("z", "B", if (i <= 1) 1L else 0L))
    val got = Experiments
      .mdeSampleSize(rows.toDF("g", "v", "s"), col("g"), col("v"), col("s"))
      .orderBy(col("group"))
      .collect()
      .map(r => (r.getString(0), r.getBoolean(7), if (r.isNullAt(8)) -1L else r.getLong(8)))
    assert(got.toSeq == Seq(("g", false, 7L), ("z", true, -1L)))
  }

  test("diffInDiff: hand-computed 4-cell fixture scores did6=1e7, t2=6.25; missing cell drops") {
    // every cell has spread {m-2, m+2}: von6 = 4e6 per cell, sum 16e6.
    // means 12/22 (A pre/post), 12/32 (B): did6 = 20e6 - 10e6 = 1e7.
    // t2_6 = 1e14 div 16e6 = 6_250_000 -> significant.
    val rows = Seq(
      ("g", "A", false, 10L), ("g", "A", false, 14L),
      ("g", "A", true, 20L), ("g", "A", true, 24L),
      ("g", "B", false, 10L), ("g", "B", false, 14L),
      ("g", "B", true, 30L), ("g", "B", true, 34L),
      // group m: B has no post cell -> dropped
      ("m", "A", false, 1L), ("m", "A", false, 2L),
      ("m", "A", true, 3L), ("m", "A", true, 4L),
      ("m", "B", false, 5L), ("m", "B", false, 6L))
    val got = Experiments
      .diffInDiff(
        rows.toDF("g", "arm", "post", "y"),
        col("g"), col("arm"), col("post"), col("y"))
      .collect()
      .map(r => (r.getString(0), r.getLong(7), r.getLong(8), r.getBoolean(9)))
    assert(got.toSeq == Seq(("g", 10000000L, 6250000L, true)))
  }

  test("cohensKappa: textbook confusion matrix scores kappa=0.4; anti-agreement scores -1") {
    // diag 35 of 50; rows 25/25, cols 30/20 -> pe = 0.5, kappa = 0.4.
    val rows =
      (1 to 20).map(_ => ("yes", "yes")) ++ (1 to 5).map(_ => ("yes", "no")) ++
        (1 to 10).map(_ => ("no", "yes")) ++ (1 to 15).map(_ => ("no", "no"))
    val r = Experiments
      .cohensKappa(rows.toDF("r1", "r2"), col("r1"), col("r2")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((50L, 2L, 700000L, 500000L, 400000L)))
    // perfect anti-agreement on a balanced 2-class grid: kappa = -1
    // (exercises the negative-numerator truncation path)
    val anti = (1 to 5).map(_ => ("a", "b")) ++ (1 to 5).map(_ => ("b", "a"))
    val ra = Experiments
      .cohensKappa(anti.toDF("r1", "r2"), col("r1"), col("r2")).head()
    assert(ra.getLong(4) == -1000000L)
    // both raters constant: pe = 1, kappa 0 by convention
    val const = (1 to 4).map(_ => ("x", "x"))
    val rc = Experiments
      .cohensKappa(const.toDF("r1", "r2"), col("r1"), col("r2")).head()
    assert((rc.getLong(2), rc.getLong(4)) == ((1000000L, 0L)))
  }

  test("postStratify: pooled-mix reweighting moves the rate; missing stratum shrinks w_base") {
    // strata: s1 pooled 8, s2 pooled 2, N = 10.
    // A (s1 only, 2/4): adj = 1e6*8*2/(10*4) = 400000, w_base 800000, raw 500000.
    // B (1/4 in s1, 1/2 in s2): adj = 200000 + 100000 = 300000, w_base 1e6, raw 333333.
    val rows = Seq(
      ("A", "s1", 1L), ("A", "s1", 1L), ("A", "s1", 0L), ("A", "s1", 0L),
      ("B", "s1", 1L), ("B", "s1", 0L), ("B", "s1", 0L), ("B", "s1", 0L),
      ("B", "s2", 1L), ("B", "s2", 0L))
    val got = Experiments
      .postStratify(rows.toDF("v", "st", "s"), col("v"), col("st"), col("s"))
      .orderBy(col("variant"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      ("A", 4L, 500000L, 400000L, 800000L),
      ("B", 6L, 333333L, 300000L, 1000000L)))
  }

  test("obfLooks5: cumulative looks cross the OBF boundary at look 2; sparse looks gap-filled") {
    // look 1: A 8/10 vs B 2/10 -> z2 = 7.2e6, below the 20.8e6 look-1 bound.
    // look 2 doubles both cells -> z2 = 14.4e6 >= 10.4e6 -> crossed.
    // look 3 has A-only NEW traffic, but B's CUMULATIVE cells carry
    // forward (gap-fill): A 17/21 vs B 4/20 -> z2 = 15.23e6 >= 6.9e6.
    // A pre-fix engine dropped look 3 entirely — the silent skipped-
    // boundary-check bug.
    val rows =
      (1 to 10).map(i => ("g", "A", 1L, if (i <= 8) 1L else 0L)) ++
        (1 to 10).map(i => ("g", "B", 1L, if (i <= 2) 1L else 0L)) ++
        (1 to 10).map(i => ("g", "A", 2L, if (i <= 8) 1L else 0L)) ++
        (1 to 10).map(i => ("g", "B", 2L, if (i <= 2) 1L else 0L)) ++
        Seq(("g", "A", 3L, 1L))
    val full = Experiments
      .obfLooks5(
        rows.toDF("g", "v", "look", "s"),
        col("g"), col("v"), col("s"), col("look"))
      .orderBy(col("look"))
      .collect()
    val got = full.map(r => (r.getLong(1), r.getLong(6), r.getLong(7), r.getBoolean(8)))
    assert(got.toSeq == Seq(
      (1L, 7200000L, 20814120L, false),
      (2L, 14400000L, 10407060L, true),
      (3L, 15232290L, 6938040L, true)))
    // the gap-filled look carries B's cumulative cells unchanged
    val l3 = full.last
    assert((l3.getLong(2), l3.getLong(3), l3.getLong(4), l3.getLong(5)) ==
      ((21L, 17L, 20L, 4L)))
    // one-armed-FOREVER looks stay omitted: a variant with no history
    // at all cannot be compared — drop B entirely, nothing pivots
    val aOnly = (1 to 4).map(i => ("g", "A", i.toLong % 2 + 1, 1L))
      .toDF("g", "v", "look", "s")
    assert(Experiments.obfLooks5(aOnly, col("g"), col("v"), col("s"), col("look")).count() == 0L)
    val bad = Seq(("g", "A", 7L, 1L), ("g", "B", 7L, 0L)).toDF("g", "v", "look", "s")
    val e = intercept[Exception](
      Experiments.obfLooks5(bad, col("g"), col("v"), col("s"), col("look")).head())
    assert(e.getMessage.contains("look index must be 1..5"))
  }

  test("pocockLooks5: constant boundary crosses at look 1 where OBF holds") {
    // same fixture as the OBF test: look-1 z2 = 7.2e6. OBF's look-1
    // bar is 20.8e6 (no cross); Pocock's constant bar is 5.82e6 ->
    // crossed immediately — the even-spending vs hoarding contrast.
    val rows =
      (1 to 10).map(i => ("g", "A", 1L, if (i <= 8) 1L else 0L)) ++
        (1 to 10).map(i => ("g", "B", 1L, if (i <= 2) 1L else 0L))
    val got = Experiments
      .pocockLooks5(
        rows.toDF("g", "v", "look", "s"),
        col("g"), col("v"), col("s"), col("look"))
      .head()
    assert((got.getLong(6), got.getLong(7), got.getBoolean(8)) ==
      ((7200000L, 5822569L, true)))
  }

  test("ebShrinkRates: rates shrink toward the mean with nu=24; identical groups pass through") {
    // 6/10, 5/10, 4/10: m6 = 500000, v12 = 1e10, nu = 25-1 = 24.
    // eb = (1e6*x + 500000*24) div (10+24) -> 529411 / 500000 / 470588.
    def mk(g: String, x: Int) =
      (1 to 10).map(i => (g, if (i <= x) 1L else 0L))
    val rows = mk("g1", 6) ++ mk("g2", 5) ++ mk("g3", 4)
    val got = Experiments
      .ebShrinkRates(rows.toDF("g", "s"), col("g"), col("s"))
      .orderBy(col("group"))
      .collect()
      .map(r => (r.getString(0), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      ("g1", 600000L, 529411L), ("g2", 500000L, 500000L), ("g3", 400000L, 470588L)))
    // zero between-group variance: shrinkage is the identity
    val flat = mk("a", 5) ++ mk("b", 5)
    val gf = Experiments
      .ebShrinkRates(flat.toDF("g", "s"), col("g"), col("s"))
      .collect().map(r => (r.getLong(3), r.getLong(4)))
    assert(gf.forall { case (raw, eb) => raw == eb })
    // a single group has no between-group variance: fail fast
    val one = mk("solo", 5)
    val e = intercept[Exception](
      Experiments.ebShrinkRates(one.toDF("g", "s"), col("g"), col("s")).head())
    assert(e.getMessage.contains("at least 2 groups"))
  }

  test("oneWayAnova: hand-computed 3-arm fixture scores F=16; constant arms score 0") {
    // A{1,3} B{5,7} C{9,11}: SSB = 64, SSW = 6, F = (64/2)/(6/3) = 16;
    // chi2 = 2F = 32e6 >= chi2_2 literal -> significant.
    val rows = Seq(
      ("A", 1L), ("A", 3L), ("B", 5L), ("B", 7L), ("C", 9L), ("C", 11L))
    val r = Experiments
      .oneWayAnova(rows.toDF("arm", "y"), col("arm"), col("y")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getBoolean(6)) ==
      ((3L, 6L, 64000000L, 6000000L, 16000000L, 32000000L, true)))
    // every arm constant: zero within-variance -> 0 by convention
    val const = Seq(("A", 5L), ("A", 5L), ("B", 9L), ("B", 9L))
    val rc = Experiments
      .oneWayAnova(const.toDF("arm", "y"), col("arm"), col("y")).head()
    assert((rc.getLong(4), rc.getLong(5), rc.getBoolean(6)) == ((0L, 0L, false)))
    // single-row arms are dropped; a lone surviving arm yields no row
    val thin = Seq(("A", 1L), ("B", 5L), ("B", 7L))
    assert(Experiments
      .oneWayAnova(thin.toDF("arm", "y"), col("arm"), col("y")).count() == 0L)
    // 12 arms overflow the literal chi-square table: fail fast
    val wide = (1 to 12).flatMap(i => Seq((s"a$i", 1L), (s"a$i", 2L)))
    val e = intercept[Exception](
      Experiments.oneWayAnova(wide.toDF("arm", "y"), col("arm"), col("y")).head())
    assert(e.getMessage.contains("2..11 arms"))
  }

  test("kruskalWallis: separation scores H=2.4; tie-corrected fixture scores 1.0; all-equal 0") {
    // A{1,2} B{3,4}: H = 2.4 exactly, no ties.
    val sep = Seq(("A", 1L), ("A", 2L), ("B", 3L), ("B", 4L)).toDF("arm", "v")
    val r = Experiments.kruskalWallis(sep, col("arm"), col("v")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)) ==
      ((2L, 4L, 2400000L, false)))
    // A{1,1} B{1,2}: mid-rank ties, H = 0.6, correction 0.6 -> 1.0.
    val tied = Seq(("A", 1L), ("A", 1L), ("B", 1L), ("B", 2L)).toDF("arm", "v")
    val rt = Experiments.kruskalWallis(tied, col("arm"), col("v")).head()
    assert(rt.getLong(2) == 1000000L)
    // all values equal: correction denominator 0 -> 0 by convention
    val const = Seq(("A", 5L), ("B", 5L)).toDF("arm", "v")
    assert(Experiments.kruskalWallis(const, col("arm"), col("v")).head().getLong(2) == 0L)
    val wide = (1 to 12).flatMap(i => Seq((s"a$i", i.toLong))).toDF("arm", "v")
    val e = intercept[Exception](
      Experiments.kruskalWallis(wide, col("arm"), col("v")).head())
    assert(e.getMessage.contains("2..11 arms"))
  }

  test("jonckheereTerpstra: hand-computed JT2 with and without ties; Lehmann variance exact") {
    // arms 1:[1,2], 2:[2,3]: JT = 3 wins + half a tie -> JT2 = 7,
    // E2 = (16-8)/2 = 4; A = 156-36-18 = 102,
    // var72 = (102*24 + 0 + 9*2*4*2)/24 = 108,
    // z2_6 = 18e6*9 div 108 = 1,500,000 -> not significant
    val tied = Seq((1L, 1L), (1L, 2L), (2L, 2L), (2L, 3L))
    val r = Experiments
      .jonckheereTerpstra(tied.toDF("a", "x"), col("a"), col("x"))
      .head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getBoolean(5)) == ((2L, 4L, 7L, 4L, 1500000L, false)))
    // no ties, fully separated arms 1:[1,2], 2:[3,4]: JT2 = 8,
    // var72 = classic no-tie 72*Var = N^2(2N+3) - sum n_g^2(2n_g+3)
    //       = 176 - 56 = 120; z2_6 = 18e6*16 div 120 = 2,400,000
    val clean = Seq((1L, 1L), (1L, 2L), (2L, 3L), (2L, 4L))
    val rc = Experiments
      .jonckheereTerpstra(clean.toDF("a", "x"), col("a"), col("x"))
      .head()
    assert((rc.getLong(2), rc.getLong(4)) == ((8L, 2400000L)))
    // one arm fails fast
    val e = intercept[IllegalArgumentException](
      Experiments.jonckheereTerpstra(
        Seq((1L, 1L), (1L, 2L)).toDF("a", "x"), col("a"), col("x")))
    assert(e.getMessage.contains("2..11 ordered arms"), e.getMessage)
  }

  test("pageTrend: perfect order scores z2 = 4e6 and crosses; opposing units cancel to 0") {
    // two units, both strictly increasing: per-unit doubled ranks
    // 2/4/6 weighted 1/2/3 -> L2 = 56, E2 = 2*3*16/2 = 48,
    // z2_6 = 36e6*64 div (2*9*16*2) = 4,000,000 >= 3,841,459
    val inc = Seq(
      (1L, 1L, 10L), (1L, 2L, 20L), (1L, 3L, 30L),
      (2L, 1L, 5L), (2L, 2L, 6L), (2L, 3L, 7L))
    val r = Experiments
      .pageTrend(inc.toDF("u", "t", "x"), col("u"), col("t"), col("x"))
      .head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getBoolean(5)) == ((3L, 2L, 56L, 48L, 4000000L, true)))
    // one rising + one falling unit: L2 = 28 + 20 = 48 = E2 -> z2 = 0
    val mix = Seq(
      (1L, 1L, 10L), (1L, 2L, 20L), (1L, 3L, 30L),
      (2L, 1L, 30L), (2L, 2L, 20L), (2L, 3L, 10L))
    val rm = Experiments
      .pageTrend(mix.toDF("u", "t", "x"), col("u"), col("t"), col("x"))
      .head()
    assert((rm.getLong(2), rm.getLong(4), rm.getBoolean(5)) == ((48L, 0L, false)))
    // incomplete panel fails fast (the friedman contract)
    val bad = inc.drop(1)
    val e = intercept[Exception](
      Experiments.pageTrend(bad.toDF("u", "t", "x"), col("u"), col("t"), col("x")).collect())
    assert(e.getMessage.contains("exactly 3 treatment rows"), e.getMessage)
  }

  test("cochranArmitage: hand-computed dose-response; saturated outcome degenerates to 0") {
    // doses 1/2/3 with 2/10, 5/10, 8/10 successes: N=30, X=15,
    // num = 30*36 - 15*60 = 180, den = 15*15*(30*140 - 3600) = 135000,
    // z2_6 = 1e6*180^2*30 div 135000 = 7,200,000 -> significant
    val rows =
      (1 to 10).map(i => (1L, if (i <= 2) 1L else 0L)) ++
        (1 to 10).map(i => (2L, if (i <= 5) 1L else 0L)) ++
        (1 to 10).map(i => (3L, if (i <= 8) 1L else 0L))
    val r = Experiments
      .cochranArmitage(rows.toDF("w", "s"), col("w"), col("s"))
      .head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)) ==
      ((3L, 30L, 15L, 7200000L, true)))
    // X = N (every unit succeeds): variance is 0 -> z2 = 0 by convention
    val sat = (1 to 6).map(i => (i.toLong % 3 + 1, 1L)).toDF("w", "s")
    val rs = Experiments.cochranArmitage(sat, col("w"), col("s")).head()
    assert((rs.getLong(3), rs.getBoolean(4)) == ((0L, false)))
  }

  test("cached cell tables release under the harness hygiene (lifetime contract)") {
    // the `cached` helper's documented contract: plans are lazy, so
    // the CALLER releases the cell-table cache — Verify/Bench do
    // clearCache() + RDD unpersist between queries; this pins that
    // one sweep actually leaves nothing behind
    spark.catalog.clearCache()
    val rows = (1 to 20).map(i => (if (i % 2 == 0) "A" else "B", i.toLong)).toDF("s", "v")
    Experiments.mannWhitneyU(rows, col("s"), col("v")).collect()
    assert(!spark.sharedState.cacheManager.isEmpty,
      "the cell table should be cached while the test result is live")
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    assert(spark.sharedState.cacheManager.isEmpty)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("mcnemar: discordant 3-vs-1 scores chi2=1; no switchers score 0") {
    val rows = Seq(
      (false, true), (false, true), (false, true), (true, false),
      (true, true), (false, false), (true, true), (false, false))
      .toDF("pre", "post")
    val r = Experiments.mcnemar(rows, col("pre"), col("post")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)) ==
      ((8L, 3L, 1L, 1000000L, false)))
    val quiet = Seq((true, true), (false, false)).toDF("pre", "post")
    val rq = Experiments.mcnemar(quiet, col("pre"), col("post")).head()
    assert((rq.getLong(3), rq.getBoolean(4)) == ((0L, false)))
  }

  test("brownForsythe: lower-median deviations feed ANOVA; hand-computed F") {
    // A{0,2,10}: med 2, |z| = {2,0,8}; B{0,4,4}: med 4 (lower-median
    // rank (3+1) div 2 = 2), |z| = {4,0,0}.
    // ANOVA on z: ssb6 = 6e6, ssw6 = 45333334, f6 = 529411.
    val rows = Seq(
      ("A", 0L), ("A", 2L), ("A", 10L), ("B", 0L), ("B", 4L), ("B", 4L))
      .toDF("arm", "y")
    val r = Experiments.brownForsythe(rows, col("arm"), col("y")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((2L, 6L, 6000000L, 45333334L, 529411L)))
  }

  test("sprtBernoulli: success streaks cross at n=2, failure streaks at n=6, short streams continue") {
    // p0=0.1 vs p1=0.5: L1 = 1609438, L0 = -587787, bounds +/-2944439.
    // all-success group crosses hi at n=2; all-failure crosses lo at
    // n=6; a single-observation group must report continue.
    val rows =
      (1 to 5).map(i => ("up", i.toLong, 1L)) ++
        (1 to 8).map(i => ("down", i.toLong, 0L)) ++
        Seq(("short", 1L, 1L))
    val got = Experiments
      .sprtBernoulli(
        rows.toDF("g", "seq", "s"),
        col("g"), Seq(col("seq")), col("s"),
        p0 = 0.1, p1 = 0.5)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      ("down", 6L, 0L, -3526722L, "accept_h0"),
      ("short", 1L, 1L, 1609438L, "continue"),
      ("up", 2L, 2L, 3218876L, "accept_h1")))
  }

  test("bhStepUp: a passing low rank rescues the ranks above it; family-size mismatch fails fast") {
    // thresholds 10/5/3 (millions): stats 12, 4, 3.5 -> ranks 1,2,3.
    // rank 2 fails its own threshold but rank 3 passes -> cut = 3 ->
    // ALL discovered (the signature step-up rescue).
    val tests = Seq(("g1", 12000000L), ("g2", 4000000L), ("g3", 3500000L))
      .toDF("g", "z2")
    val got = Experiments
      .bhStepUp(tests, col("g"), col("z2"), col("g"),
        Seq(10000000L, 5000000L, 3000000L))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(4)))
      .sortBy(_._2)
    assert(got.toSeq == Seq(("g1", 1L, true), ("g2", 2L, true), ("g3", 3L, true)))
    // nothing passes anywhere -> nothing discovered
    val none = Seq(("a", 1000000L), ("b", 900000L), ("c", 100000L)).toDF("g", "z2")
    val gn = Experiments
      .bhStepUp(none, col("g"), col("z2"), col("g"),
        Seq(10000000L, 5000000L, 3000000L))
      .collect().map(_.getBoolean(4))
    assert(gn.forall(!_))
    val two = Seq(("a", 1L), ("b", 2L)).toDF("g", "z2")
    val e = intercept[Exception](
      Experiments.bhStepUp(two, col("g"), col("z2"), col("g"),
        Seq(10000000L, 5000000L, 3000000L)).head())
    assert(e.getMessage.contains("family of 3 tests"))
  }

  test("cochranQ: textbook 4x3 fixture scores Q=3; all-constant units score 0; missing cell fails") {
    // C = (3,2,1), R = (2,1,3,0): Q = 2*(3*14-36)/(3*6-14) = 3.
    val rows = Seq(
      (1L, "a", 1L), (1L, "b", 1L), (1L, "c", 0L),
      (2L, "a", 1L), (2L, "b", 0L), (2L, "c", 0L),
      (3L, "a", 1L), (3L, "b", 1L), (3L, "c", 1L),
      (4L, "a", 0L), (4L, "b", 0L), (4L, "c", 0L))
      .toDF("u", "t", "x")
    val r = Experiments.cochranQ(rows, col("u"), col("t"), col("x")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)) ==
      ((3L, 4L, 3000000L, false)))
    // every unit saturated: zero within-unit variation -> 0
    val flat = Seq(
      (1L, "a", 1L), (1L, "b", 1L), (2L, "a", 1L), (2L, "b", 1L))
      .toDF("u", "t", "x")
    assert(Experiments.cochranQ(flat, col("u"), col("t"), col("x")).head().getLong(2) == 0L)
    val ragged = Seq((1L, "a", 1L), (1L, "b", 0L), (2L, "a", 1L)).toDF("u", "t", "x")
    val e = intercept[Exception](
      Experiments.cochranQ(ragged, col("u"), col("t"), col("x")).head())
    assert(e.getMessage.contains("exactly k treatment rows"))
  }

  test("runsTest: alternating and streaky 8-sequences both flag; one-class scores 0") {
    // n=8, a=b=4: both R=8 (alternation) and R=2 (streaks) give
    // z2 = 1e6*24^2*7 div (32*24) = 5250000 >= 3841459.
    val alt = (1 to 8).map(i => ("alt", i.toLong, i % 2 == 0))
    val streak = (1 to 8).map(i => ("streak", i.toLong, i <= 4))
    val solo = (1 to 5).map(i => ("solo", i.toLong, true))
    val got = Experiments
      .runsTest(
        (alt ++ streak ++ solo).toDF("g", "seq", "f"),
        col("g"), Seq(col("seq")), col("f"))
      .collect()
      .map(r => (r.getString(0), r.getLong(4), r.getLong(5), r.getBoolean(6)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      ("alt", 8L, 5250000L, true),
      ("solo", 1L, 0L, false),
      ("streak", 2L, 5250000L, true)))
  }

  test("fleissKappa: hand-computed panel fixture; unanimity convention; ragged panel fails") {
    // 4 units x 2 raters: pbar6 = 750000, pe6 = 531250, kappa6 = 466666.
    val rows = Seq(
      (1L, "a"), (1L, "a"), (2L, "a"), (2L, "a"),
      (3L, "b"), (3L, "b"), (4L, "a"), (4L, "b"))
      .toDF("u", "cat")
    val r = Experiments.fleissKappa(rows, col("u"), col("cat")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5)) == ((4L, 2L, 2L, 750000L, 531250L, 466666L)))
    // one category everywhere: pe = 1e6 -> kappa 0 by the limit convention
    val flat = Seq((1L, "x"), (1L, "x"), (2L, "x"), (2L, "x")).toDF("u", "cat")
    assert(Experiments.fleissKappa(flat, col("u"), col("cat")).head().getLong(5) == 0L)
    val ragged = Seq((1L, "a"), (1L, "b"), (2L, "a")).toDF("u", "cat")
    val e = intercept[Exception](
      Experiments.fleissKappa(ragged, col("u"), col("cat")).head())
    assert(e.getMessage.contains("same rating count"))
  }

  test("krippendorffAlpha: agreement 1e6; systematic disagreement -500000; singletons drop") {
    // perfect agreement: u1 {a,a}, u2 {b,b} -> do6 = 0, de = 8 -> 1e6
    val agree = Seq((1L, "a"), (1L, "a"), (2L, "b"), (2L, "b")).toDF("u", "cat")
    val r1 = Experiments.krippendorffAlpha(agree, col("u"), col("cat")).head()
    assert((r1.getLong(0), r1.getLong(1), r1.getLong(2), r1.getLong(3), r1.getLong(4)) ==
      ((2L, 4L, 2L, 0L, 1000000L)))
    // both units split {a,b}: Do = 1, De = 2/3 -> alpha = -0.5
    val split = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b")).toDF("u", "cat")
    val r2 = Experiments.krippendorffAlpha(split, col("u"), col("cat")).head()
    assert((r2.getLong(3), r2.getLong(4)) == ((4000000L, -500000L)))
    // chance-level: u1 {a,a}, u2 {a,b} -> Do = De = 0.5 -> alpha 0;
    // a singleton unit u3 {b} contributes nothing (not even margins)
    val mixed = Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "b"), (3L, "b")).toDF("u", "cat")
    val r3 = Experiments.krippendorffAlpha(mixed, col("u"), col("cat")).head()
    assert((r3.getLong(0), r3.getLong(1), r3.getLong(4)) == ((2L, 4L, 0L)))
    // one category everywhere: De = 0 -> 0 by the fleissKappa convention
    val flat = Seq((1L, "x"), (1L, "x"), (2L, "x"), (2L, "x")).toDF("u", "cat")
    assert(Experiments.krippendorffAlpha(flat, col("u"), col("cat")).head().getLong(4) == 0L)
  }

  test("mantelHaenszel: hand-computed two-stratum table; OR_MH exact; three variants fail") {
    // s1: A 3/4 vs B 1/4; s2: A 1/2 vs B 0/2.
    // e6 = 2e6 + 500000, v6 = 571428 + 250000, O = 4
    // z2_6 = (4e6-2.5e6)^2 div 821428 = 2739132
    // rn = 1125000 + 500000, rd = 125000 + 0 -> or_mh6 = 13e6
    val rows =
      (1 to 4).map(i => ("s1", "A", i <= 3)) ++
        (1 to 4).map(i => ("s1", "B", i <= 1)) ++
        (1 to 2).map(i => ("s2", "A", i <= 1)) ++
        (1 to 2).map(_ => ("s2", "B", false))
    val r = Experiments
      .mantelHaenszel(rows.toDF("st", "v", "s"), col("st"), col("v"), col("s"))
      .head()
    assert((r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8), r.getBoolean(9)) ==
      (("A", "B", 2L, 12L, 4L, 2500000L, 821428L, 2739132L, 13000000L, false)))
    val three = Seq(("s1", "A", true), ("s1", "B", false), ("s1", "C", true))
      .toDF("st", "v", "s")
    val e = intercept[Exception](
      Experiments.mantelHaenszel(three, col("st"), col("v"), col("s")).head())
    assert(e.getMessage.contains("exactly 2 variants"))
  }

  test("signTest: 3 up vs 1 down with a tie scores z2 = 1e6; all ties score 0") {
    val rows = Seq((1L, 2L), (1L, 3L), (1L, 4L), (5L, 4L), (7L, 7L)).toDF("pre", "post")
    val r = Experiments.signTest(rows, col("pre"), col("post")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)) ==
      ((3L, 1L, 1L, 1000000L, false)))
    val ties = Seq((1L, 1L), (2L, 2L)).toDF("pre", "post")
    assert(Experiments.signTest(ties, col("pre"), col("post")).head().getLong(3) == 0L)
  }

  test("jackknifeRatio: leave-one-out replicates spread exactly; lone bucket fails fast") {
    // b0 (x=2, n=2), b1 (x=0, n=2): replicates 0 and 1e6,
    // rbar = 500000, SS = 5e11 -> jk_var12 = (1*5e11) div 2 = 2.5e11
    val rows = Seq((0L, 1L, 1L), (0L, 1L, 1L), (1L, 0L, 1L), (1L, 0L, 1L))
      .toDF("b", "x", "n")
    val r = Experiments.jackknifeRatio(rows, col("b"), col("x"), col("n")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5)) == ((2L, 2L, 4L, 500000L, 500000L, 250000000000L)))
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    val lone = Seq((0L, 1L, 1L)).toDF("b", "x", "n")
    val e = intercept[Exception](
      Experiments.jackknifeRatio(lone, col("b"), col("x"), col("n")).collect())
    assert(chain(e).contains("empties the denominator"))
  }

  test("poissonRateRatio: exposure-normalized rates; exact chi2; three arms fail") {
    // A: 4 events over 2 unit-days, B: 2 over 2 -> rr = 2.0,
    // d = 4*2 - 2*2 = 4, z2 = 1e6*16 div (6*2*2) = 666666 (not significant)
    val rows = Seq(
      ("A", 1L, "d1"), ("A", 1L, "d1"), ("A", 1L, "d1"), ("A", 1L, "d2"),
      ("B", 1L, "d1"), ("B", 1L, "d2")).toDF("s", "u", "d")
    val r = Experiments.poissonRateRatio(rows, col("s"), col("u"), col("d")).head()
    assert((r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getLong(6), r.getLong(7), r.getBoolean(8)) ==
      (("A", "B", 4L, 2L, 2L, 2L, 2000000L, 666666L, false)))
    val three = Seq(("A", 1L, "d1"), ("B", 1L, "d1"), ("C", 1L, "d1")).toDF("s", "u", "d")
    val e = intercept[Exception](
      Experiments.poissonRateRatio(three, col("s"), col("u"), col("d")).head())
    assert(e.getMessage.contains("exactly 2 arms"))
  }

  test("eProcessRate: exact affine log-wealth over running counts; bad lambda fails") {
    // p0 = 0.5, lambda = 0.5: a6 = round(ln 1.25 * 1e6) = 223144,
    // b6 = round(ln 0.75 * 1e6) = -287682; alpha 0.05 -> thr6 =
    // round(ln 20 * 1e6) = 2995732.
    // d1: two successes -> lnE6 = 446288; d2: one failure ->
    // lnE6 = 446288 - 287682 = 158606; neither crosses.
    assert(Experiments.eProcessConstants(500000L, 500000L, 50000L) ==
      ((223144L, -287682L, 2995732L)))
    val rows = Seq(("d1", true), ("d1", true), ("d2", false)).toDF("day", "ok")
    val got = Experiments
      .eProcessRate(rows, col("ok"), col("day"), 500000L, 500000L, 50000L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(got.toSeq == Seq(
      ("d1", 2L, 2L, 446288L, false),
      ("d2", 1L, 0L, 158606L, false)))
    val e = intercept[IllegalArgumentException](
      Experiments.eProcessRate(rows, col("ok"), col("day"), 500000L, 2000001L, 50000L))
    assert(e.getMessage.contains("wealth must stay positive"))
  }

  test("eProcessConfidenceSeq: two-sided band; rejection latches; interval only shrinks") {
    // day 1: 16/20 successes; day 2: 4/20 (running rate drops to
    // 1/2). Expected intervals from an INDEPENDENT sequential fold
    // over the same literal grid (the single-threaded-reference
    // idiom): per candidate, each day's two-sided log-wealth is the
    // exact affine map, a candidate survives while its running SUP
    // stays under the per-side ln(2/alpha) threshold.
    val rows = ((1 to 16).map(_ => ("d1", true)) ++
      (1 to 4).map(_ => ("d1", false)) ++
      (1 to 4).map(_ => ("d2", true)) ++
      (1 to 16).map(_ => ("d2", false))).toDF("day", "ok")
    val grid = Experiments.eProcessCsGrid(500000L)
    val thr = math.round(math.log(2e6 / 50000L) * 1e6)
    def lnE(cx: Long, cn: Long)(g: (Long, Long, Long, Long, Long)): Long =
      math.max(cx * g._2 + (cn - cx) * g._3, cx * g._4 + (cn - cx) * g._5)
    val surv1 = grid.filter(g => lnE(16, 20)(g) < thr).map(_._1)
    val surv2 = grid.filter(g =>
      math.max(lnE(16, 20)(g), lnE(20, 40)(g)) < thr).map(_._1)
    assert(surv1.nonEmpty && surv2.nonEmpty && surv2.toSet.subsetOf(surv1.toSet))
    val got = Experiments
      .eProcessConfidenceSeq(rows, col("ok"), col("day"), 500000L, 50000L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      ("d1", 20L, 16L, surv1.min, surv1.max),
      ("d2", 20L, 4L, surv2.min, surv2.max)), got.toSeq.toString)
    // sanity on the reference itself: a low-rate hypothesis died on
    // day 1, the interval is two-sided proper, and it SHRANK
    assert(surv1.min > 1L && surv1.max == 99L)
    assert(surv2.min >= surv1.min && surv2.max < surv1.max)
  }

  test("eProcessDiffBand: composes the per-arm alpha/2 bands; one-arm days withheld") {
    // arm A: 16/20 on d1; arm B: 4/20 on d1; d2 carries only A (no
    // output row). The band must equal the hand-composition of the
    // two per-arm confidence sequences at alpha/2.
    val mk = (arm: String, day: String, ok: Boolean, k: Int) =>
      (1 to k).map(_ => (arm, day, ok))
    val rows = (mk("A", "d1", true, 16) ++ mk("A", "d1", false, 4) ++
      mk("B", "d1", true, 4) ++ mk("B", "d1", false, 16) ++
      mk("A", "d2", true, 3)).toDF("arm", "day", "ok")
    def bandOf(arm: String): (Long, Long) = {
      val r = Experiments
        .eProcessConfidenceSeq(
          rows.filter(col("arm") === arm), col("ok"), col("day"), 500000L, 50000L)
        .filter(col("day") === "d1")
        .head()
      (r.getLong(3), r.getLong(4))
    }
    val (loA, hiA) = bandOf("A")
    val (loB, hiB) = bandOf("B")
    val got = Experiments
      .eProcessDiffBand(
        rows, col("arm"), col("arm") === "A", col("ok"), col("day"),
        500000L, 100000L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.toSeq == Seq(
      ("d1", 20L, 16L, 20L, 4L, loA - hiB, hiA - loB)), got.toSeq.toString)
    // 20 obs/arm cannot exclude 0 at 90% time-uniform — assert the
    // coverage property instead: the true 60-point gap is inside
    assert(loA - hiB <= 60L && 60L <= hiA - loB,
      s"band [${loA - hiB}, ${hiA - loB}] must cover the true 60-pct gap")
  }

  test("eProcessTwoSample: success-stream reduction — failures ignored, arm labels bet on") {
    // pi_A = 0.5, lambda = 0.5 -> same constants as the one-sample
    // fixture (a6 = 223144, b6 = -287682). d1: successes A, A, plus
    // an ignored failure -> lnE6 = 446288; d2: one B success ->
    // 446288 - 287682 = 158606. A failure-only day emits no row.
    val rows = Seq(
      ("d1", "A", true), ("d1", "A", true), ("d1", "B", false),
      ("d2", "B", true), ("d3", "A", false)).toDF("day", "arm", "ok")
    val got = Experiments
      .eProcessTwoSample(
        rows, col("arm"), col("arm") === "A", col("ok"), col("day"),
        500000L, 500000L, 50000L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(got.toSeq == Seq(
      ("d1", 2L, 2L, 446288L, false),
      ("d2", 1L, 0L, 158606L, false)))
  }

  test("winsorizedMeans: pooled exact cutoffs, identical clamps per arm; bad ppm fails") {
    // pooled sorted values: 1..10 then 100,200,...,1000; n = 20.
    // loPpm 10% -> r_lo = ceil(2) = 2 -> L = 2; hiPpm 90% ->
    // r_hi = ceil(18) = 18 -> U = 800.
    // A (1..10): clamp 1->2 (one lo), wins sum 56 -> 5_600_000;
    //   trim keeps 2..10 (9 rows, sum 54) -> 6_000_000.
    // B (100..1000): clamp 900,1000 -> 800 (two hi),
    //   wins sum 3600+1600 = 5200 -> 520_000_000;
    //   trim keeps 100..800 (8 rows, sum 3600) -> 450_000_000.
    val rows = ((1 to 10).map(v => ("A", v.toLong)) ++
      (1 to 10).map(v => ("B", v.toLong * 100L))).toDF("s", "v")
    val got = Experiments
      .winsorizedMeans(rows, col("s"), col("v"), 100000L, 900000L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8)))
    assert(got.toSeq == Seq(
      ("A", 10L, 2L, 800L, 1L, 0L, 5600000L, 9L, 6000000L),
      ("B", 10L, 2L, 800L, 0L, 2L, 520000000L, 8L, 450000000L)))
    val e = intercept[IllegalArgumentException](
      Experiments.winsorizedMeans(rows, col("s"), col("v"), 500000L, 500000L))
    assert(e.getMessage.contains("loPpm < hiPpm"))
  }

  test("quantileTreatmentEffect: order-statistic probes difference exactly; three sides fail") {
    // A {1,2,3,4}, B {2,4,6,8}, k=2: medians 2 vs 4, maxes 4 vs 8
    val rows = Seq(
      ("A", 1L), ("A", 2L), ("A", 3L), ("A", 4L),
      ("B", 2L), ("B", 4L), ("B", 6L), ("B", 8L)).toDF("s", "v")
    val got = Experiments.quantileTreatmentEffect(rows, col("s"), col("v"), 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq((1L, 2L, 4L, -2L), (2L, 4L, 8L, -4L)))
    val three = Seq(("A", 1L), ("B", 2L), ("C", 3L)).toDF("s", "v")
    val e = intercept[IllegalArgumentException](
      Experiments.quantileTreatmentEffect(three, col("s"), col("v"), 2))
    assert(e.getMessage.contains("exactly 2 sides"))
  }

  test("friedman: perfect concordance scores chi2=4, W=1; fully-tied units score 0; ragged fails") {
    // two units both ranking a < b < c: chi2 = 4, W = chi2/(n(k-1)) = 1.
    val rows = Seq(
      (1L, "a", 10L), (1L, "b", 20L), (1L, "c", 30L),
      (2L, "a", 1L), (2L, "b", 2L), (2L, "c", 3L))
      .toDF("u", "t", "v")
    val r = Experiments.friedman(rows, col("u"), col("t"), col("v")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)) ==
      ((3L, 2L, 4000000L, 1000000L, false)))
    // every unit fully tied: denominator 0 -> 0 by convention
    val tied = Seq(
      (1L, "a", 5L), (1L, "b", 5L), (2L, "a", 7L), (2L, "b", 7L))
      .toDF("u", "t", "v")
    assert(Experiments.friedman(tied, col("u"), col("t"), col("v")).head().getLong(2) == 0L)
    val ragged = Seq((1L, "a", 1L), (1L, "b", 2L), (2L, "a", 3L)).toDF("u", "t", "v")
    val e = intercept[Exception](
      Experiments.friedman(ragged, col("u"), col("t"), col("v")).head())
    assert(e.getMessage.contains("exactly k treatment rows"))
  }

  test("oddsRatio: Haldane-corrected 8/10-vs-2/10 interval excludes 0; zero cells stay finite") {
    // half-unit cells (17,5,5,17): ln OR = ln(25/289) -> -2447551,
    // halfwidth 1994252 -> CI entirely below 0 -> significant.
    val rows =
      (1 to 10).map(i => ("g", "A", if (i <= 8) 1L else 0L)) ++
        (1 to 10).map(i => ("g", "B", if (i <= 2) 1L else 0L))
    val r = Experiments
      .oddsRatio(rows.toDF("g", "v", "s"), col("g"), col("v"), col("s")).head()
    assert((r.getLong(7), r.getLong(8), r.getLong(9), r.getBoolean(10)) ==
      ((-2447551L, -4441803L, -453299L, true)))
    // a zero cell: x_b = 0 stays finite under the +0.5 correction
    val zero =
      (1 to 4).map(i => ("z", "A", if (i <= 2) 1L else 0L)) ++
        (1 to 4).map(_ => ("z", "B", 0L))
    val rz = Experiments
      .oddsRatio(zero.toDF("g", "v", "s"), col("g"), col("v"), col("s")).head()
    assert(!rz.isNullAt(7) && rz.getLong(7) < 0L)
  }

  test("wilcoxonSignedRank: no-tie fixture scores z2=0.1333; tied fixture z2=1/3; zeros dropped") {
    // d = +1,+2,+3,-4, one zero pair: W+ = 6, E = 5, Var = 7.5 -> z2 = 2/15.
    val df = Seq((0L, 1L), (0L, 2L), (0L, 3L), (4L, 0L), (5L, 5L)).toDF("pre", "post")
    val r = Experiments.wilcoxonSignedRank(df, col("pre"), col("post")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)) ==
      ((4L, 1L, 12L, 133333L, false)))
    // d = +1,+1,-1 (full tie): mid-rank 2 each, Var = 3.5 - 0.5 = 3 -> z2 = 1/3.
    val tied = Seq((0L, 1L), (0L, 1L), (1L, 0L)).toDF("pre", "post")
    val rt = Experiments.wilcoxonSignedRank(tied, col("pre"), col("post")).head()
    assert((rt.getLong(0), rt.getLong(2), rt.getLong(3)) == ((3L, 8L, 333333L)))
    // all differences zero: n = 0, degenerate 0
    val allz = Seq((5L, 5L), (7L, 7L)).toDF("pre", "post")
    val rz = Experiments.wilcoxonSignedRank(allz, col("pre"), col("post")).head()
    assert((rz.getLong(0), rz.getLong(1), rz.getLong(3)) == ((0L, 2L, 0L)))
  }

  test("poissonBootDiff: constant arms give an exactly degenerate CI; reps bound fails fast") {
    import spark.implicits._
    // 30 units per arm, arm A always 100, arm B always 50: every
    // unit's ratio is the arm constant, so EVERY replicate's
    // ratio-of-sums is exactly 100e6/50e6 micro regardless of the
    // weights it drew -> point diff and both CI ends are exactly
    // 50_000_000, and (at 30 units/arm) no replicate drops.
    val rows = (0L until 30L).flatMap(u =>
      Seq((u * 2L, 100L), (u * 2L, 100L), (u * 2L + 1L, 50L), (u * 2L + 1L, 50L), (u * 2L + 1L, 50L)))
    val df = rows.toDF("uid", "v")
    val r = Experiments
      .poissonBootDiff(df, col("uid"), col("uid") % 2 === 0, col("v"), reps = 100)
      .head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((100L, 60L, 90L)))
    assert((r.getLong(3), r.getLong(4)) == ((100000000L, 50000000L)))
    assert((r.getLong(5), r.getLong(6), r.getLong(7)) ==
      ((50000000L, 50000000L, 50000000L)))
    // the Poisson CDF literals: 15 lowercase hex chars, strictly increasing
    val t = Experiments.Pois1HexCdf
    assert(t.size == 8 && t.forall(_.matches("[0-9a-f]{15}")) && t == t.sorted)
    assert(t.head.startsWith("5e2d58d8")) // floor(e^-1 * 16^15) prefix
    intercept[IllegalArgumentException] {
      Experiments.poissonBootDiff(df, col("uid"), col("uid") % 2 === 0, col("v"), reps = 10)
    }
  }

  test("eProcessMean: exact micro-nat wealth on the value grid; bound violation fails fast") {
    import spark.implicits._
    // m0 = 0.5, lambda = 0.5: y = 1 contributes ln(1.25) -> 223144
    // micro-nats, y = 0 contributes ln(0.75) -> -287682. Day 1 has
    // two max-value rows, day 2 one zero row.
    val rows = Seq(("d1", 1000000L), ("d1", 1000000L), ("d2", 0L)).toDF("d", "v")
    val r = Experiments
      .eProcessMean(rows, col("v"), col("d"), m0Ppm = 500000L,
        lambdaPpm = 500000L, alphaPpm = 50000L)
      .collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getBoolean(3)))
    assert(r.toSeq == Seq(
      ("d1", 2L, 446288L, false),
      ("d2", 1L, 158606L, false)), r.toSeq.toString)
    // an undeclared whale breaks the job, not the guarantee
    val whale = Seq(("d1", 1000001L)).toDF("d", "v")
    intercept[Exception] {
      Experiments.eProcessMean(whale, col("v"), col("d"), 500000L, 500000L, 50000L)
        .collect()
    }
    intercept[IllegalArgumentException] {
      Experiments.eProcessMean(rows, col("v"), col("d"), 500000L, 2000001L, 50000L)
    }
  }

  test("eProcessMeanCs stepPct knob: coarse grid is the 1% grid subsampled; band nests") {
    import spark.implicits._
    // the k-grid's candidates (and their capped lambdas) are literally
    // the 1-grid's entries at multiples of k — validity per candidate
    // is untouched, only resolution is traded
    assert(Experiments.eProcessMeanCsGrid(500000L, 5L) ==
      Experiments.eProcessMeanCsGrid(500000L).filter(_._1 % 5 == 0))
    val rows = Seq(
      ("d1", 40000L), ("d1", 60000L), ("d2", 50000L), ("d2", 50000L),
      ("d3", 45000L), ("d3", 55000L)).toDF("d", "v")
    def band(step: Long) = Experiments
      .eProcessMeanCs(rows, col("v"), col("d"), lambdaPpm = 500000L,
        alphaPpm = 50000L, stepPct = step)
      .collect()
      .map(x => x.getString(0) -> (x.getLong(2), x.getLong(3))).toMap
    val fine = band(1L)
    val coarse = band(5L)
    coarse.foreach { case (d, (lo, hi)) =>
      assert(lo % 5 == 0 && hi % 5 == 0, s"$d: coarse endpoints off-grid ($lo, $hi)")
      val (lo1, hi1) = fine(d)
      assert(lo >= lo1 && hi <= hi1,
        s"$d: coarse band ($lo,$hi) must be the fine band's ($lo1,$hi1) restriction")
    }
    intercept[IllegalArgumentException] {
      Experiments.eProcessMeanCsGrid(500000L, 0L)
    }
  }

  test("eProcessMedianCs: sign-test bets pin the median; ties count in n, neither side") {
    import spark.implicits._
    // λ = 1.0 makes the two shared constants ln(1.5) and ln(0.5)
    assert(Experiments.eProcessMedianCsConstants(1000000L) == ((405465L, -693147L)))
    // day 1: twenty observations exactly at 50% of the bound. Every
    // candidate below 50 sees 20 'above' successes -> wealth
    // 20·405465 = 8.1e6 >= ln(2/α)·1e6 = 3.69e6 -> rejected; every
    // candidate above 50 symmetric; candidate 50 sees only TIES
    // (in n, in neither indicator) -> wealth stays negative. The
    // band collapses to [50, 50] in one day.
    val d1 = Seq.fill(20)(("d1", 500000L))
    // day 2: ten observations at 51% — candidate 50's above-side
    // wealth is 10·405465 + 20·(−693147) < 0, so it still survives;
    // candidate 51 was already latched out on day 1 (its below-side
    // saw 20 successes), so the band stays [50, 50]
    val d2 = Seq.fill(10)(("d2", 510000L))
    val r = Experiments
      .eProcessMedianCs(
        (d1 ++ d2).toDF("d", "v"), col("v"), col("d"),
        lambdaPpm = 1000000L, alphaPpm = 50000L)
      .collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.toSeq == Seq(("d1", 20L, 50L, 50L), ("d2", 10L, 50L, 50L)), r.toSeq.toString)
    // the declared bound is enforced at the grid fold
    intercept[Exception] {
      Experiments.eProcessMedianCs(
        Seq(("d1", 1000001L)).toDF("d", "v"), col("v"), col("d"), 500000L, 50000L)
        .collect()
    }
  }

  test("signFlipTest: one-sided-heavy fixture rejects at the add-one floor; zero diffs give p = 1") {
    import spark.implicits._
    // 30 units, every d = +100: |T_r| >= |T_obs| = 3000 needs all 30
    // md5 draws to agree — probability ~2^-29 per replicate, so
    // n_ge = 0 and p_ppm = 1e6 * 1 div 201 = 4975 (the add-one
    // floor: a permutation p can never be 0).
    val pos = (0L until 30L).map(u => (u, 100L)).toDF("u", "d")
    val r = Experiments.signFlipTest(pos, col("u"), col("d"), reps = 200).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((30L, 200L, 3000L, 0L, 4975L)))
    // all-zero differences: every replicate ties T_obs = 0 exactly,
    // p = 1e6 (no evidence by construction)
    val zero = (0L until 10L).map(u => (u, 0L)).toDF("u", "d")
    val z = Experiments.signFlipTest(zero, col("u"), col("d"), reps = 200).head()
    assert((z.getLong(3), z.getLong(4)) == ((200L, 1000000L)))
    intercept[IllegalArgumentException] {
      Experiments.signFlipTest(pos, col("u"), col("d"), reps = 5)
    }
  }

  test("holmStepDown: rejection stops at the FIRST failure even if later ranks clear their bars") {
    import spark.implicits._
    // Holm table for m=5: 6634897, 6238533, 5731139, 5023886,
    // 3841459. Stats 10e6, 6e6, 5.9e6, 4e6, 1e6: rank 1 passes,
    // rank 2 FAILS its bar (6e6 < 6238533) — so rank 3 must NOT be
    // significant even though 5.9e6 >= 5731139 clears its own bar
    // (the step-down monotonicity BH's step-up scan doesn't have).
    val thr = Seq(6634897L, 6238533L, 5731139L, 5023886L, 3841459L)
    val tests = Seq(("t1", 10000000L), ("t2", 6000000L), ("t3", 5900000L),
      ("t4", 4000000L), ("t5", 1000000L)).toDF("g", "z")
    val r = Experiments
      .holmStepDown(tests, col("g"), col("z"), col("g"), thr)
      .orderBy(col("rank")).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getBoolean(4)))
    assert(r.toSeq == Seq(
      ("t1", 1L, true), ("t2", 2L, false), ("t3", 3L, false),
      ("t4", 4L, false), ("t5", 5L, false)), r.toSeq.toString)
    // all clear their bars -> all rejected
    val strong = Seq(("t1", 10000000L), ("t2", 9000000L), ("t3", 8000000L),
      ("t4", 7000000L), ("t5", 6000000L)).toDF("g", "z")
    val all = Experiments
      .holmStepDown(strong, col("g"), col("z"), col("g"), thr)
      .collect().map(_.getBoolean(4))
    assert(all.forall(identity))
    intercept[IllegalArgumentException] {
      Experiments.holmStepDown(tests, col("g"), col("z"), col("g"), thr.reverse)
    }
  }

  test("ebShrinkMeans: half-pooling fixture exact; zero within-variance means no pooling") {
    import spark.implicits._
    // g1 {0,10}, g2 {10,20}: raw6 = 5e6/15e6, m6 = 10e6, within SS
    // 50+50 -> sw2 = 50, samp12 = 2.5e13 each; v12 = 5e13, avg12 =
    // 2.5e13 -> tau12 = 2.5e13 -> shrink factor exactly 1/2:
    // shrunk6 = 7.5e6 / 12.5e6.
    val noisy = Seq(("g1", 0L), ("g1", 10L), ("g2", 10L), ("g2", 20L)).toDF("g", "v")
    val r = Experiments.ebShrinkMeans(noisy, col("g"), col("v"))
      .orderBy(col("group")).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.toSeq == Seq(
      ("g1", 2L, 5000000L, 7500000L),
      ("g2", 2L, 15000000L, 12500000L)), r.toSeq.toString)
    // constant groups: sampling variance 0 -> tau carries ALL the
    // spread and the shrink is the identity (raw means survive)
    val clean = Seq(("g1", 0L), ("g1", 0L), ("g2", 10L), ("g2", 10L)).toDF("g", "v")
    val c = Experiments.ebShrinkMeans(clean, col("g"), col("v"))
      .orderBy(col("group")).collect()
      .map(x => (x.getLong(2), x.getLong(3)))
    assert(c.toSeq == Seq((0L, 0L), (10000000L, 10000000L)), c.toSeq.toString)
  }

  test("tostEquivalence: inside-margin gap passes, big gap fails, zero-variance limit is the sign test") {
    import spark.implicits._
    def arm(g: String, v: String, n: Int, x: Int) =
      Seq.tabulate(n)(i => (g, v, if (i < x) 1L else 0L))
    // g1: .500 vs .510 at n=1000/arm, margin 5pp: diff6 = -10000,
    // se2_12 = 250000000 + 249900000 = 499900000; both one-sided z²
    // clear 2705543 micro (1e6*40000² and 1e6*60000² vs
    // 2705543*499900000 ≈ 1.3526e15) -> equivalent.
    // g2: .5 vs .4 — the gap exceeds the margin -> not equivalent.
    // g3: both arms constant 0 -> se2 = 0, diff 0: the documented
    // zero-variance limit (strict sign test) -> equivalent.
    val df = (arm("g1", "A", 1000, 500) ++ arm("g1", "B", 1000, 510) ++
      arm("g2", "A", 1000, 500) ++ arm("g2", "B", 1000, 400) ++
      arm("g3", "A", 5, 0) ++ arm("g3", "B", 7, 0)).toDF("g", "v", "s")
    val r = Experiments
      .tostEquivalence(df, col("g"), col("v"), col("s"), marginPpm = 50000L)
      .orderBy(col("group"))
      .collect()
      .map(x => (x.getString(0), x.getLong(7), x.getLong(8), x.getBoolean(9)))
    assert(r.toSeq == Seq(
      ("g1", -10000L, 499900000L, true),
      ("g2", 100000L, 490000000L, false),
      ("g3", 0L, 0L, true)), r.toSeq.toString)
    intercept[IllegalArgumentException] {
      Experiments.tostEquivalence(df, col("g"), col("v"), col("s"), marginPpm = 0L)
    }
  }

  test("cemAtt: treated-weighted matched-strata gap; unmatched strata drop; signed div toward zero") {
    import spark.implicits._
    // Stratum A: t{10} vs c{4} -> gap 6e6, weight 1. Stratum B:
    // t{20,30} vs c{5} -> gap 20e6, weight 2. Stratum C treated-only,
    // D control-only -> both drop. att6 = 46e6 div 3 = 15333333;
    // match_ppm = 3/4 treated matched = 750000.
    val rows = Seq(
      ("A", true, 10L), ("A", false, 4L),
      ("B", true, 20L), ("B", true, 30L), ("B", false, 5L),
      ("C", true, 99L), ("D", false, 7L)).toDF("k", "tr", "y")
    val r = Experiments.cemAtt(rows, col("tr"), col("y"), Seq(col("k"))).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getLong(6)) ==
      ((4L, 2L, 4L, 3L, 2L, 750000L, 15333333L)))
    // negative ATT: single matched stratum t{1} vs c{2}
    val neg = Seq(("A", true, 1L), ("A", false, 2L)).toDF("k", "tr", "y")
    val rn = Experiments.cemAtt(neg, col("tr"), col("y"), Seq(col("k"))).head()
    assert(rn.getLong(6) == -1000000L)
    intercept[IllegalArgumentException] {
      Experiments.cemAtt(rows, col("tr"), col("y"), Seq.empty)
    }
  }

  test("eBhRejections: k* step by hand; hindsight rescue; empty set; alpha guard") {
    import spark.implicits._
    // K=5, alpha=0.05: thr6(k) = round(ln(100/k)*1e6) =
    // 4605170, 3912023, 3506558, 3218876, 2995732. Values clear
    // k=1..3 and fail k=4..5 -> k*=3, top 3 rejected.
    val ev = Seq(
      ("a", 5000000L), ("b", 4000000L), ("c", 3600000L),
      ("d", 3000000L), ("e", 1000000L)).toDF("hyp", "ln_e6")
    val r = Experiments.eBhRejections(ev, 50000L)
      .collect().map(x => (x.getString(0), x.getLong(2), x.getLong(3), x.getBoolean(4)))
    assert(r.map(_._1).toSeq == Seq("a", "b", "c", "d", "e"))
    assert(r.map(_._3).toSeq == Seq(4605170L, 3912023L, 3506558L, 3218876L, 2995732L))
    assert(r.map(_._4).toSeq == Seq(true, true, true, false, false))
    // the e-BH signature move: the TOP e-value misses its own k=1
    // threshold (ln(60) = 4.0943) but k=2 and k=3 pass, so k*=3
    // rejects ALL three — max-k, not first-failure
    val rescue = Seq(("a", 4000000L), ("b", 3950000L), ("c", 3600000L)).toDF("hyp", "ln_e6")
    val rr = Experiments.eBhRejections(rescue, 50000L).collect()
    assert(rr.forall(_.getBoolean(4)))
    // nothing clears -> kstar = 0, empty rejection set
    val none = Seq(("a", 100L), ("b", 50L)).toDF("hyp", "ln_e6")
    assert(Experiments.eBhRejections(none, 50000L).collect().forall(!_.getBoolean(4)))
    intercept[IllegalArgumentException] {
      Experiments.eBhRejections(ev, 0L)
    }
  }
}
