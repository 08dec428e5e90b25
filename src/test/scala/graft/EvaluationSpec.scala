package graft

import graft.operators.Evaluation
import org.apache.spark.sql.functions._

/** Hand-computed fixtures for the detector-evaluation family:
  * rank-identity ROC-AUC, reliability bins, ECE and the Brier score.
  * Every expected value is derived by hand from the textbook formula
  * and asserted as the exact micro/pico integer the operator must
  * emit.
  */
class EvaluationSpec extends SparkSpec {
  import spark.implicits._

  test("rocAuc: perfect separation = 1e6, reversal = 0, a single tie = 500000") {
    // pos {3,4} above neg {1,2}: R2+ = 6+8, u2x = 14-6 = 8 = 2*n+*n-.
    val sep = Seq((true, 3L), (true, 4L), (false, 1L), (false, 2L)).toDF("y", "v")
    val r1 = Evaluation.rocAuc(sep, col("y"), col("v")).head()
    assert((r1.getLong(0), r1.getLong(1), r1.getLong(2), r1.getLong(3), r1.getLong(4)) ==
      ((2L, 2L, 8L, 1000000L, 1000000L)))
    // reversed: pos {1,2} under neg {3,4} -> u2x = 0, AUC 0, gini -1e6.
    val rev = Seq((true, 1L), (true, 2L), (false, 3L), (false, 4L)).toDF("y", "v")
    val r2 = Evaluation.rocAuc(rev, col("y"), col("v")).head()
    assert((r2.getLong(2), r2.getLong(3), r2.getLong(4)) == ((0L, 0L, -1000000L)))
    // one pos, one neg, same score: doubled mid-rank 3, u2x = 1 -> 0.5.
    val tie = Seq((true, 7L), (false, 7L)).toDF("y", "v")
    val r3 = Evaluation.rocAuc(tie, col("y"), col("v")).head()
    assert((r3.getLong(2), r3.getLong(3), r3.getLong(4)) == ((1L, 500000L, 0L)))
  }

  test("rocAucCells: partial grids SUM-merge to the single-pass AUC") {
    val rows = Seq((true, 3L), (true, 4L), (false, 1L), (false, 2L))
    val whole = rows.toDF("y", "v")
    val merged = Seq(
      Seq(rows(0), rows(2)).toDF("y", "v"),
      Seq(rows(1), rows(3)).toDF("y", "v"))
      .map(p => Evaluation.rocAucCells(p, col("y"), col("v")))
      .reduce(_ unionByName _)
    val fromCells = Evaluation.rocAucFromCells(merged).head()
    val onePass = Evaluation.rocAuc(whole, col("y"), col("v")).head()
    assert(fromCells.toSeq == onePass.toSeq)
    assert(fromCells.getLong(3) == 1000000L)
  }

  test("rocAuc: single-class input fails fast") {
    val onlyPos = Seq((true, 1L), (true, 2L)).toDF("y", "v")
    val e = intercept[Exception](
      Evaluation.rocAuc(onlyPos, col("y"), col("v")).head())
    assert(e.getMessage.contains("both classes required"))
  }

  test("youdenThreshold: perfect separation cuts at the lowest positive score with MCC=1") {
    val sep = Seq((true, 3L), (true, 4L), (false, 1L), (false, 2L)).toDF("y", "v")
    val r = Evaluation.youdenThreshold(sep, col("y"), col("v")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getLong(6)) == ((3L, 2L, 2L, 2L, 0L, 1000000L, 1000000L)))
    // overlap: pos {1,3}, neg {2} -> best J = 0.5 at thr 3, MCC^2 = 0.25
    val mix = Seq((true, 1L), (true, 3L), (false, 2L)).toDF("y", "v")
    val r2 = Evaluation.youdenThreshold(mix, col("y"), col("v")).head()
    assert((r2.getLong(0), r2.getLong(5), r2.getLong(6)) == ((3L, 500000L, 250000L)))
    val one = Seq((true, 1L)).toDF("y", "v")
    val e = intercept[Exception](
      Evaluation.youdenThreshold(one, col("y"), col("v")).head())
    assert(e.getMessage.contains("both classes required"))
  }

  test("gainsTable: positives concentrated on top scores double the top-bucket lift") {
    val rows = Seq(
      (1L, 40L, 1L), (2L, 30L, 1L), (3L, 20L, 0L), (4L, 10L, 0L))
      .toDF("id", "v", "y")
    val got = Evaluation
      .gainsTable(rows, col("y") === 1L, col("v"), col("id"), 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      (1L, 2L, 2L, 1000000L, 2000000L, 1000000L),
      (2L, 2L, 0L, 0L, 0L, 1000000L)))
  }

  test("mondrianConformal: per-group thresholds off the count grid; per-group coverage") {
    val cal = ((1L to 9L).map(v => ("A", v)) ++ Seq(("B", 10L), ("B", 20L))).toDF("g", "v")
    val hold = Seq(("A", 5L), ("A", 10L), ("B", 15L)).toDF("g", "v")
    val got = Evaluation
      .mondrianConformal(cal, hold, col("g"), col("v"), 100000L)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    // A: n=9, rank ceil(10*0.9)=9 -> qhat 9; covers 1 of 2
    assert(got("A") == ((9L, 9L, 9L, 2L, 1L, 500000L)))
    // B: n=2, rank min(2, ceil(3*0.9)=3) = 2 -> qhat 20; covers 1 of 1
    assert(got("B") == ((2L, 2L, 20L, 1L, 1L, 1000000L)))
  }

  test("conformalThreshold: ceil((n+1)(1-a)) order statistic; holdout coverage exact") {
    val cal = (1L to 9L).toDF("v")
    val hold = Seq(5L, 10L).toDF("v")
    // alpha = 0.1: r = ceil(10*0.9) = 9 -> qhat = 9; holdout covers 1 of 2
    val r1 = Evaluation.conformalThreshold(cal, hold, col("v"), 100000L).head()
    assert((r1.getLong(0), r1.getLong(1), r1.getLong(2), r1.getLong(3), r1.getLong(4),
      r1.getLong(5), r1.getLong(6)) == ((9L, 9L, 9L, 2L, 1L, 500000L, 900000L)))
    // alpha = 0.2: r = ceil(10*0.8) = 8 -> qhat = 8
    val r2 = Evaluation.conformalThreshold(cal, hold, col("v"), 200000L).head()
    assert((r2.getLong(1), r2.getLong(2)) == ((8L, 8L)))
    intercept[IllegalArgumentException](
      Evaluation.conformalThreshold(cal, hold, col("v"), 0L))
  }

  test("qiniCurve: balanced arms walk at zero; treated-only conversions score full uplift") {
    // balanced: both arms convert at the top -> Q = 0 everywhere
    val bal = Seq(
      (1L, 40L, true, true), (2L, 30L, false, true),
      (3L, 20L, true, false), (4L, 10L, false, false))
      .toDF("id", "v", "tr", "y")
    val g1 = Evaluation
      .qiniCurve(bal, col("tr"), col("y"), col("v"), col("id"), 2)
      .collect().map(r => (r.getLong(0), r.getLong(5), r.getLong(6)))
    assert(g1.toSeq == Seq((1L, 0L, 0L), (2L, 0L, 0L)))
    // uplift concentrated: only the treated top converts ->
    // bucket-1 uplift 1e6, Q = 1e6 at both depths
    val up = Seq(
      (1L, 40L, true, true), (2L, 30L, false, false),
      (3L, 20L, true, false), (4L, 10L, false, false))
      .toDF("id", "v", "tr", "y")
    val g2 = Evaluation
      .qiniCurve(up, col("tr"), col("y"), col("v"), col("id"), 2)
      .collect().map(r => (r.getLong(0), r.getLong(5), r.getLong(6)))
    assert(g2.toSeq == Seq((1L, 1000000L, 1000000L), (2L, 0L, 1000000L)))
  }

  test("calibrationBins: hand grid at bins=2; top edge closes the last bin") {
    // (s6, y): (200000,0) (400000,1) -> bin 0; (900000,1) (1000000,1) -> bin 1
    // (1e6*2 div 1e6 = 2, clamped to bins-1 = 1).
    val rows = Seq((0L, 200000L), (1L, 400000L), (1L, 900000L), (1L, 1000000L))
    val grid = Evaluation
      .calibrationBins(rows.toDF("y", "s6"), col("y") === 1L, col("s6"), 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(grid.toSeq == Seq(
      (0L, 2L, 1L, 300000L, 500000L, 200000L),
      (1L, 2L, 2L, 950000L, 1000000L, 50000L)))
  }

  test("calibrationSummary: ECE is the traffic-weighted gap; Brier matches the residuals") {
    // residuals: .04 + .36 + .01 + 0 = .41 -> mean .1025 -> 102_500_000_000 pico.
    // ece6 = (2*200000 + 2*50000) div 4 = 125000.
    val rows = Seq((0L, 200000L), (1L, 400000L), (1L, 900000L), (1L, 1000000L))
    val grid = Evaluation
      .calibrationBins(rows.toDF("y", "s6"), col("y") === 1L, col("s6"), 2)
    val s = Evaluation.calibrationSummary(grid).head()
    assert((s.getLong(0), s.getLong(1), s.getLong(2)) ==
      ((4L, 125000L, 102500000000L)))
  }

  test("calibrationCells: partial grids SUM-merge to the single-pass bins and summary") {
    val rows = Seq((0L, 200000L), (1L, 400000L), (1L, 900000L), (1L, 1000000L))
    val whole = rows.toDF("y", "s6")
    val parts = Seq(
      Seq(rows(0), rows(2)).toDF("y", "s6"),
      Seq(rows(1), rows(3)).toDF("y", "s6"))
    val merged = parts
      .map(p => Evaluation.calibrationCells(p, col("y") === 1L, col("s6"), 2))
      .reduce(_ unionByName _)
    val fromCells = Evaluation.calibrationBinsFromCells(merged).collect().map(_.toSeq)
    val onePass = Evaluation
      .calibrationBins(whole, col("y") === 1L, col("s6"), 2).collect().map(_.toSeq)
    assert(fromCells.toSeq == onePass.toSeq)
    val s = Evaluation
      .calibrationSummary(Evaluation.calibrationBinsFromCells(merged)).head()
    assert((s.getLong(0), s.getLong(1), s.getLong(2)) ==
      ((4L, 125000L, 102500000000L)))
  }

  test("isotonicCalibration: violating middle bin pools with its left neighbor") {
    // acc = [0.3, 0.1, 0.6] with equal mass -> PAV pools bins 0-1 at 0.2:
    // iso = [200000, 200000, 600000] via the minimax identity
    val grid = Seq(
      (0L, 10L, 3L, 300000L), (1L, 10L, 1L, 100000L), (2L, 10L, 6L, 600000L))
      .toDF("bin", "n", "x", "acc6")
    val got = Evaluation.isotonicCalibration(grid).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (0L, 300000L, 200000L), (1L, 100000L, 200000L), (2L, 600000L, 600000L)))
    // already-monotone grid is a fixed point
    val mono = Seq(
      (0L, 10L, 1L, 100000L), (1L, 10L, 5L, 500000L), (2L, 10L, 9L, 900000L))
      .toDF("bin", "n", "x", "acc6")
    val got2 = Evaluation.isotonicCalibration(mono).collect()
      .map(r => (r.getLong(3), r.getLong(4)))
    assert(got2.forall(p => p._1 == p._2))
  }

  test("brierDecomposition: hand-computed REL/RES/UNC off the bin grid") {
    // bins: (n=2, x=1, conf 0.3, acc 0.5), (n=2, x=2, conf 0.95, acc 1.0)
    // base6 = 750000; rel12 = (2*4e10 + 2*2.5e9) div 4 = 21_250_000_000
    // res12 = (2+2)*(250000^2) div 4 = 62_500_000_000; unc12 = 187_500_000_000
    val grid = Seq(
      (0L, 2L, 1L, 300000L, 500000L), (1L, 2L, 2L, 950000L, 1000000L))
      .toDF("bin", "n", "x", "conf6", "acc6")
    val r = Evaluation.brierDecomposition(grid).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((4L, 750000L, 21250000000L, 62500000000L, 187500000000L)))
  }

  test("calibrationBins: out-of-range score fails fast; bins bounds enforced") {
    val bad = Seq((1L, 1000001L)).toDF("y", "s6")
    val e = intercept[Exception](
      Evaluation.calibrationBins(bad, col("y") === 1L, col("s6"), 10).collect())
    assert(e.getMessage.contains("outside [0, 1e6]"))
    intercept[IllegalArgumentException](
      Evaluation.calibrationBins(bad, col("y") === 1L, col("s6"), 0))
    intercept[IllegalArgumentException](
      Evaluation.calibrationBins(bad, col("y") === 1L, col("s6"), 1001))
  }
}
