package graft

import graft.operators.{Checks, Graph, Sampling, Series, TextAnalysis}
import org.apache.spark.sql.functions._

/** Hand-computed fixtures for the round-8 exact-integer statistics
  * wave: chi-square independence, Simpson/HHI concentration,
  * type-token stats, Markov transitions, largest-remainder quotas,
  * common-neighbor link prediction.
  */
class StatsOpsSpec extends SparkSpec {
  import spark.implicits._

  test("chiSquareIndependence: uniform 2x2 scores 0; perfect association scores N") {
    val uniform = Seq.fill(10)(("a", "x")) ++ Seq.fill(10)(("a", "y")) ++
      Seq.fill(10)(("b", "x")) ++ Seq.fill(10)(("b", "y"))
    val u = Checks
      .chiSquareIndependence(uniform.toDF("l", "s"), col("l"), col("s")).head()
    assert((u.getLong(0), u.getLong(3), u.getLong(4), u.getLong(5)) == ((40L, 1L, 0L, 0L)))
    // perfect association: chi2 == N, Cramer's V == 1
    val assoc = Seq.fill(10)(("a", "x")) ++ Seq.fill(10)(("b", "y"))
    val p = Checks
      .chiSquareIndependence(assoc.toDF("l", "s"), col("l"), col("s")).head()
    // chi26 = 1e6 * N = 2e7; v6 = 1e6
    assert((p.getLong(0), p.getLong(3), p.getLong(4), p.getLong(5)) ==
      ((20L, 1L, 20000000L, 1000000L)))
    // degenerate: one level on a side -> dof 0, chi26 0, v6 0
    val d = Checks
      .chiSquareIndependence(
        Seq(("a", "x"), ("a", "y")).toDF("l", "s"), col("l"), col("s")).head()
    assert((d.getLong(3), d.getLong(4), d.getLong(5)) == ((0L, 0L, 0L)))
  }

  test("binomialSplitScan: exact micro-nat LRT per split; last split dropped") {
    import spark.implicits._
    // b1: 1/2 successes, b2: 2/2. One valid split (after b1):
    // LL(1,2) = 2*round(ln .5 * 1e6) = -1386294; LL(2,2) = 0;
    // LL(3,4) = 3*round(ln .75 * 1e6) + round(ln .25 * 1e6)
    //         = 3*(-287682) + (-1386294) = -2249340;
    // g6 = 2*(-1386294 + 0 + 2249340) = 1726092.
    val rows = Seq(
      ("b1", true), ("b1", false), ("b2", true), ("b2", true)).toDF("b", "ok")
    val got = Checks.binomialSplitScan(rows, col("ok"), col("b"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(("b1", 2L, 1L, 2L, 2L, 1726092L)), got.toSeq.toString)
  }

  test("meanSplitScan: exact z2 at the level shift; constant series scores 0") {
    import spark.implicits._
    // b1: {0, 0}, b2: {10, 10}: split after b1 has w = 4 div 4 = 1,
    // means 0 vs 10_000_000 micro, pooled varc2 = (4*200 - 400) div
    // 16 = 25 (sigma = 5 exactly) -> z2_6 = (1 * 1e7 * 1e7) div
    // (1e6 * 25) = 4_000_000 (z2 = w*d2/var = 100/25 = 4).
    val rows = Seq(("b1", 0L), ("b1", 0L), ("b2", 10L), ("b2", 10L)).toDF("b", "v")
    val got = Checks.meanSplitScan(rows, col("v"), col("b"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(("b1", 2L, 2L, 0L, 10000000L, 4000000L)), got.toSeq.toString)
    val flat = Seq(("b1", 7L), ("b2", 7L)).toDF("b", "v")
    val z = Checks.meanSplitScan(flat, col("v"), col("b"))
      .collect().map(_.getLong(5)).toSeq
    assert(z == Seq(0L), z.toString)
  }

  test("binomialBinseg2: argmax split then per-side rescans; flat sides score 0") {
    import spark.implicits._
    // b1,b2: 0/2 each; b3,b4: 2/2 each. Top split after b2:
    // ll(0,4) = 0, ll(4,4) = 0, ll(4,8) = 8*round(ln .5 * 1e6)
    // = -5545176 -> g6 = 11090352 (vs 3452184 after b1/b3).
    // Both sides are rate-constant -> their best splits score 0.
    val rows = Seq(
      ("b1", false), ("b1", false), ("b2", false), ("b2", false),
      ("b3", true), ("b3", true), ("b4", true), ("b4", true)).toDF("b", "ok")
    val got = Checks.binomialBinseg2(rows, col("ok"), col("b"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(got.toSeq == Seq(
      (1, "*", "b2", 4L, 0L, 4L, 4L, 11090352L),
      (2, "L", "b1", 2L, 0L, 2L, 0L, 0L),
      (2, "R", "b3", 2L, 2L, 2L, 2L, 0L)), got.toSeq.toString)
  }

  test("meanBinseg2: level shift localized at depth 1; constant sides score 0") {
    import spark.implicits._
    // b1,b2: {0,0}; b3,b4: {10,10}. Top split after b2: w = 16 div 8
    // = 2, d6 = 1e7, varc2 = (8*400 - 1600) div 64 = 25 ->
    // z2_6 = (2 * 1e14) div 2.5e7 = 8_000_000. Each side is
    // constant (varc2 = 0) -> depth-2 rows score 0.
    val rows = Seq(
      ("b1", 0L), ("b1", 0L), ("b2", 0L), ("b2", 0L),
      ("b3", 10L), ("b3", 10L), ("b4", 10L), ("b4", 10L)).toDF("b", "v")
    val got = Checks.meanBinseg2(rows, col("v"), col("b"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(got.toSeq == Seq(
      (1, "*", "b2", 4L, 4L, 0L, 10000000L, 8000000L),
      (2, "L", "b1", 2L, 2L, 0L, 0L, 0L),
      (2, "R", "b3", 2L, 2L, 10000000L, 10000000L, 0L)), got.toSeq.toString)
  }

  test("simpsonDiversity: {2,2} split scores 333333; singleton groups dropped") {
    val df = Seq(
      ("g1", "x"), ("g1", "x"), ("g1", "y"), ("g1", "y"),
      ("g2", "z")).toDF("g", "c")
    val got = Checks.simpsonDiversity(df, col("g"), col("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // pairs = 2*1 + 2*1 = 4; denom = 4*3 = 12 -> 1e6*4 div 12 = 333333
    assert(got.toSeq == Seq(("g1", 4L, 2L, 333333L)))
  }

  test("hhiConcentration: {2,2} split scores 500000; monoculture scores 1e6") {
    val df = Seq(
      ("g1", "x"), ("g1", "x"), ("g1", "y"), ("g1", "y"),
      ("g2", "z"), ("g2", "z")).toDF("g", "c")
    val got = Checks.hhiConcentration(df, col("g"), col("c"))
      .collect().map(r => (r.getString(0), r.getLong(3))).toMap
    assert(got == Map("g1" -> 500000L, "g2" -> 1000000L))
  }

  test("ttrStats: 'a a b' -> 3 tokens, 2 types, 1 hapax; empty text contributes nothing") {
    val df = Seq(("en", "a a b"), ("en", ""), ("fr", "x y")).toDF("lang", "text")
    val got = TextAnalysis.ttrStats(df, "text", col("lang"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(got("en") == ((3L, 2L, 1L, 666666L, 500000L)))
    assert(got("fr") == ((2L, 2L, 2L, 1000000L, 1000000L)))
  }

  test("goodTuring: 'a a a b b c' gives the exact fof table and the n1/N unseen mass") {
    val df = Seq(("a a a b b c")).toDF("text")
    val got = TextAnalysis.goodTuring(df, "text", maxR = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // N = 6; counts a=3, b=2, c=1 -> n_1 = n_2 = n_3 = 1.
    // r=0 mass = 1e6*1 div 6; r* = (r+1)*n_{r+1}/n_r exact;
    // r=3 has no successor -> r*6 = 0 by the documented convention.
    assert(got.toSeq == Seq(
      (0L, 0L, 166666L, 0L),
      (1L, 1L, 166666L, 2000000L),
      (2L, 1L, 333333L, 3000000L),
      (3L, 1L, 500000L, 0L)), got.toSeq.toString)
    intercept[IllegalArgumentException] {
      TextAnalysis.goodTuring(df, "text", maxR = 0)
    }
  }

  test("burstinessTop: bursty vs stamped terms separate; top-k and tiebreak exact") {
    // 'x' appears 4 times in ONE of two docs (bursty: burst6 = 4e6,
    // share 500000); 'the' once in each (stamped-evenly: burst6 =
    // 1e6, share 1e6).
    val df = Seq((1L, "x x x x the"), (2L, "the y")).toDF("doc_id", "text")
    val got = TextAnalysis.burstinessTop(df, "text", "doc_id", 2)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      ("x", 4L, 1L, 4000000L, 500000L),
      ("the", 2L, 2L, 1000000L, 1000000L)), got.toSeq.toString)
    intercept[IllegalArgumentException] {
      TextAnalysis.burstinessTop(df, "text", "doc_id", 0)
    }
  }

  test("transitionMatrix: hand-traced sequences give exact counts and row-normalized p6") {
    val df = Seq(
      (1L, 1L, "A"), (1L, 2L, "B"), (1L, 3L, "A"), (1L, 4L, "B"),
      (2L, 1L, "A"), (2L, 2L, "A")).toDF("u", "t", "st")
    val got = Series
      .transitionMatrix(df, col("u"), Seq(col("t")), col("st"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    // from A: A->B x2, A->A x1 (row total 3); from B: B->A x1
    assert(got == Map(
      ("A", "B") -> ((2L, 666666L)),
      ("A", "A") -> ((1L, 333333L)),
      ("B", "A") -> ((1L, 1000000L))))
  }

  test("quotaLargestRemainder: quotas sum to k exactly; largest remainder wins the leftover") {
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c")).toDF("l")
    // k=10: exact proportions, no leftovers
    val exact = Sampling.quotaLargestRemainder(df, col("l"), 10L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(exact == Map("a" -> 5L, "b" -> 3L, "c" -> 2L))
    // k=7: bases (3,2,1) leave 1 seat; remainders (5,1,4) -> a wins
    val seven = Sampling.quotaLargestRemainder(df, col("l"), 7L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(seven == Map("a" -> 4L, "b" -> 2L, "c" -> 1L))
    assert(seven.values.sum == 7L)
  }

  test("spearmanDaily: monotone series score 1e6, reversed -1e6, whale day barely moves it") {
    import java.sql.Date
    def d(i: Int) = Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i))
    val xs = (0 until 10).map(i => (d(i), (i + 1).toLong))
    val up = xs.toDF("day", "n")
    val down = xs.map { case (dt, v) => (dt, 11L - v) }.toDF("day", "n")
    assert(Series.spearmanDaily(up, up, "day", "n").head().getLong(1) == 1000000L)
    assert(Series.spearmanDaily(up, down, "day", "n").head().getLong(1) == -1000000L)
    // a 1000x whale on the last day changes no rank: still exactly 1
    val whale = xs.init :+ ((d(9), 10000L))
    assert(Series.spearmanDaily(up, whale.toDF("day", "n"), "day", "n")
      .head().getLong(1) == 1000000L)
    // constant side -> zero rank variance -> null (undefined, not 0)
    val const = (0 until 10).map(i => (d(i), 5L)).toDF("day", "n")
    assert(Series.spearmanDaily(up, const, "day", "n").head().isNullAt(1))
  }

  test("manifestDiff: added/removed/changed/unchanged all classify correctly") {
    val mk = (rows: Seq[(String, Long)]) => Checks.partitionManifest(
      rows.toDF("p", "k"), col("p"), col("k"))
    val oldM = mk(Seq(("p1", 1L), ("p1", 2L), ("p2", 1L), ("p3", 9L)))
    val newM = mk(Seq(("p1", 1L), ("p1", 2L), ("p2", 7L), ("p4", 1L)))
    val got = Checks.manifestDiff(oldM, newM)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map(
      "p1" -> "unchanged", // same rows, same xor
      "p2" -> "changed",   // same count, different content
      "p3" -> "removed",
      "p4" -> "added"))
  }

  test("jsdTokens: identical corpora score 0; disjoint corpora score ln2 in micro-nats") {
    val same = Seq(("a", "x y z"), ("b", "x y z")).toDF("g", "text")
    val s = TextAnalysis.jsdTokens(same, "text", col("g"), "a", "b").head()
    assert(s.getLong(3) == 0L, s.toString)
    val disjoint = Seq(("a", "x y"), ("b", "u v")).toDF("g", "text")
    val dd = TextAnalysis.jsdTokens(disjoint, "text", col("g"), "a", "b").head()
    // ln 2 = 0.693147... -> per-term p*ln2 contributions sum to ~693147
    assert(math.abs(dd.getLong(3) - 693147L) <= 2L, dd.toString)
    // one empty side -> zero rows
    assert(TextAnalysis.jsdTokens(
      Seq(("a", "x")).toDF("g", "text"), "text", col("g"), "a", "b").collect().isEmpty)
  }

  test("modePerGroup: ties break to the smallest value (pinned, unlike Spark's mode())") {
    import graft.operators.Relational
    val df = Seq(
      ("g1", "b"), ("g1", "b"), ("g1", "a"), ("g1", "a"), ("g1", "c"),
      ("g2", "z")).toDF("g", "v")
    val got = Relational.modePerGroup(df, col("g"), col("v"))
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
    // g1: a and b both count 2 -> tie breaks to "a"
    assert(got == Map("g1" -> (("a", 2L)), "g2" -> (("z", 1L))))
  }

  test("fillForwardDaily: LOCF fills gaps, nulls before first sighting, raw obs preserved") {
    import java.sql.Date
    def d(i: Int) = Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i))
    // k1 observed on days 0 and 3; k2 on day 2 only; grid spans 0..3
    val daily = Seq(("k1", d(0), 5L), ("k1", d(3), 7L), ("k2", d(2), 9L))
      .toDF("key", "day", "n")
    val got = Series.fillForwardDaily(daily, "key", "day", "n")
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        ((if (r.isNullAt(2)) -1L else r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3))))
      .toMap
    assert(got(("k1", "2024-01-01")) == ((5L, 5L)))
    assert(got(("k1", "2024-01-02")) == ((-1L, 5L))) // gap -> carried
    assert(got(("k1", "2024-01-03")) == ((-1L, 5L)))
    assert(got(("k1", "2024-01-04")) == ((7L, 7L)))
    assert(got(("k2", "2024-01-01")) == ((-1L, -1L))) // before first sighting
    assert(got(("k2", "2024-01-03")) == ((9L, 9L)))
    assert(got(("k2", "2024-01-04")) == ((-1L, 9L)))
    assert(got.size == 8) // 2 keys x 4 grid days
  }

  test("commonNeighbors: path predicts its endpoints; square predicts both diagonals") {
    val path = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val p = Graph.commonNeighbors(path)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(p.toSeq == Seq((1L, 3L, 1L, 1000000L)))
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("id_a", "id_b")
    val sq = Graph.commonNeighbors(square)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // diagonals share BOTH midpoints: jac6 = 1e6*2 div (2+2-2) = 1e6
    assert(sq == Set((1L, 3L, 2L, 1000000L), (2L, 4L, 2L, 1000000L)))
    // triangle edges are real edges -> nothing predicted
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("id_a", "id_b")
    assert(Graph.commonNeighbors(tri).collect().isEmpty)
  }

  test("property: quotaLargestRemainder sums to k and never under-allocates the floor") {
    val rnd = new scala.util.Random(7)
    (1 to 5).foreach { _ =>
      val strata = (1 to (2 + rnd.nextInt(6))).map(i => s"s$i" -> (1 + rnd.nextInt(40)))
      val rows = strata.flatMap { case (name, n) => Seq.fill(n)(name) }
      val nTotal = rows.size.toLong
      val k = 1 + rnd.nextInt(2 * rows.size)
      val got = Sampling.quotaLargestRemainder(rows.toDF("l"), col("l"), k.toLong)
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(got.values.map(_._2).sum == k.toLong, s"sum != k for $strata, k=$k")
      got.foreach { case (_, (n, q)) =>
        assert(q >= k * n / nTotal && q <= k * n / nTotal + 1L)
      }
    }
  }

  test("property: chiSquareIndependence is symmetric in its two columns") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 200).map(_ => (s"a${rnd.nextInt(4)}", s"b${rnd.nextInt(3)}"))
    val df = rows.toDF("x", "y")
    val xy = Checks.chiSquareIndependence(df, col("x"), col("y")).head()
    val yx = Checks.chiSquareIndependence(df, col("y"), col("x")).head()
    assert(xy.getLong(4) == yx.getLong(4), "chi26 must be column-order invariant")
    assert(xy.getLong(5) == yx.getLong(5), "cramer_v6 must be column-order invariant")
    assert(xy.getLong(4) >= 0L)
  }

  test("property: transitionMatrix row p6 sums land in [1e6 - n_states, 1e6]") {
    val rnd = new scala.util.Random(13)
    val states = Vector("A", "B", "C", "D")
    val rows = (1 to 300).map(i => (i % 9L, i.toLong, states(rnd.nextInt(4))))
    val got = Series
      .transitionMatrix(rows.toDF("u", "t", "st"), col("u"), Seq(col("t")), col("st"))
      .collect().map(r => (r.getString(0), r.getLong(3)))
    got.groupBy(_._1).foreach { case (from, ps) =>
      val total = ps.map(_._2).sum
      assert(total <= 1000000L && total >= 1000000L - states.size,
        s"row $from p6 sum $total outside truncation band")
    }
  }

  test("adamicAdar: path endpoint pair weighs round(1e6/ln 2); square diagonals double it") {
    val path = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val got = Graph.adamicAdar(path)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 3L, 1L, 1442695L))) // round(1e6 / ln 2)
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("id_a", "id_b")
    val sq = Graph.adamicAdar(square)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(sq == Set((1L, 3L, 2885390L), (2L, 4L, 2885390L)))
  }

  test("mutualInformation: perfect dependence scores NMI=1; independence and constants score 0") {
    // diagonal 2x2: each cell term = 0.5*ln(2) -> 346574 micro-nats.
    val dep = Seq.fill(5)(("a1", "b1")) ++ Seq.fill(5)(("a2", "b2"))
    val d = Checks
      .mutualInformation(dep.toDF("a", "b"), col("a"), col("b")).head()
    assert((d.getLong(0), d.getLong(1), d.getLong(2), d.getLong(3), d.getLong(6)) ==
      ((10L, 2L, 2L, 693148L, 1000000L)))
    // uniform 2x2: every cell ln(1) = 0 -> MI 0, NMI 0
    val ind = Seq.fill(5)(("a1", "b1")) ++ Seq.fill(5)(("a1", "b2")) ++
      Seq.fill(5)(("a2", "b1")) ++ Seq.fill(5)(("a2", "b2"))
    val i = Checks
      .mutualInformation(ind.toDF("a", "b"), col("a"), col("b")).head()
    assert((i.getLong(3), i.getLong(6)) == ((0L, 0L)))
    // both columns constant: H sums 0 -> NMI 0 by convention
    val c = Checks
      .mutualInformation(
        Seq.fill(4)(("x", "y")).toDF("a", "b"), col("a"), col("b")).head()
    assert((c.getLong(3), c.getLong(4), c.getLong(5), c.getLong(6)) ==
      ((0L, 0L, 0L, 0L)))
  }

  test("neymanAllocation: budget splits by n*sigma; constant stratum gets 0; n<2 excluded") {
    // s1 {0,2}: w6 = round(1e6*sqrt(8)) = 2828427; s2 {0,4}: sqrt(32) -> 5656854;
    // s3 constant -> 0; s4 singleton -> excluded. k=3 lands (1, 2, 0).
    val rows = Seq(
      ("s1", 0L), ("s1", 2L), ("s2", 0L), ("s2", 4L),
      ("s3", 3L), ("s3", 3L), ("s4", 9L))
    val got = Sampling
      .neymanAllocation(rows.toDF("st", "v"), col("st"), col("v"), 3L)
      .collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      ("s1", 2828427L, 1L), ("s2", 5656854L, 2L), ("s3", 0L, 0L)))
    // all strata constant: no Neyman signal -> fail fast
    val flat = Seq(("a", 1L), ("a", 1L), ("b", 2L), ("b", 2L))
    val e = intercept[Exception](
      Sampling.neymanAllocation(flat.toDF("st", "v"), col("st"), col("v"), 2L).head())
    assert(e.getMessage.contains("every stratum is constant"))
  }

  test("queryLikelihoodDirichlet: hand-computed micro-nat scores; absent terms skipped") {
    // d1 "a a b" (len 3), d2 "b c" (len 2), C = 5, cf(a) = 2, mu = 2.
    // score(d1) = ln(14/25) -> -579818; score(d2) = ln(4/20) -> -1609438.
    // query term z is absent from the corpus and contributes nothing.
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val got = TextAnalysis
      .queryLikelihoodDirichlet(docs, "text", "doc_id", Seq("a", "z"), 2L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(got.toSeq == Seq((1L, 3L, -579818L), (2L, 2L, -1609438L)))
    val e = intercept[IllegalArgumentException](
      TextAnalysis.queryLikelihoodDirichlet(docs, "text", "doc_id", Seq("a"), 0L))
    assert(e.getMessage.contains("mu must be positive"))
  }

  test("fsMatchWeights/fsScorePairs: Laplace m/u ppm and log-ratio weights, zero-threshold score") {
    import graft.operators.Relational
    // field f agrees on 3/4 matches and 1/4 non-matches:
    // m = (3+1)/(4+2) -> 666666 ppm, u = (1+1)/(4+2) -> 333333 ppm,
    // w_agree6 = round(1e6 ln(m/u)) = 693147, w_dis6 = -693146.
    val pairs = Seq(
      (1L, 11L, true, true), (2L, 12L, true, true), (3L, 13L, true, true),
      (4L, 14L, true, false),
      (5L, 6L, false, true), (7L, 8L, false, false), (9L, 10L, false, false),
      (15L, 16L, false, false))
      .toDF("id_a", "id_b", "m", "ag")
    val fields = Seq("f" -> col("ag"))
    val w = Relational.fsMatchWeights(pairs, col("m"), fields).head()
    assert((w.getString(0), w.getLong(5), w.getLong(6), w.getLong(7), w.getLong(8)) ==
      (("f", 666666L, 333333L, 693147L, -693146L)))
    // scoring at the zero threshold: agree -> positive -> predicted match
    val weights = Relational.fsMatchWeights(pairs, col("m"), fields)
    val scored = Relational
      .fsScorePairs(pairs, fields, weights, Seq("id_a", "id_b"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3)))
      .sortBy(_._1)
    assert(scored.toSeq == Seq(
      (1L, 693147L, true), (2L, 693147L, true), (3L, 693147L, true),
      (4L, -693146L, false), (5L, 693147L, true), (7L, -693146L, false),
      (9L, -693146L, false), (15L, -693146L, false)))
    // a one-class training set is smoothing noise: fail fast
    val oneClass = Seq((1L, 2L, true, true), (3L, 4L, true, false))
      .toDF("id_a", "id_b", "m", "ag")
    val e = intercept[Exception](
      Relational.fsMatchWeights(oneClass, col("m"), Seq("f" -> col("ag"))).head())
    assert(e.getMessage.contains("both matches and"))
  }

  test("fkContainment: distinct-key containment in exact ppm; null keys excluded") {
    val child = Seq(Some(1L), Some(2L), Some(3L), None, Some(2L)).toDF("k")
    val parent = Seq(2L, 3L, 4L).toDF("p")
    val r = Checks.fkContainment(child, col("k"), parent, col("p")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((3L, 2L, 666666L)))
    val empty = Seq.empty[Option[Long]].toDF("k")
    val re = Checks.fkContainment(empty, col("k"), parent, col("p")).head()
    assert((re.getLong(0), re.getLong(1), re.getLong(2)) == ((0L, 0L, 0L)))
  }

  test("fdViolations: null Y is a value, null X determines nothing, rows-at-risk exact") {
    // key 2 carries {a,b}, key 3 carries {null,c} -> 2 violating keys,
    // 4 rows at risk; the null-X row is excluded entirely.
    val rows = Seq(
      (Some(1L), Some("a")), (Some(1L), Some("a")),
      (Some(2L), Some("a")), (Some(2L), Some("b")),
      (Some(3L), None), (Some(3L), Some("c")),
      (None, Some("z")))
      .toDF("x", "y")
    val r = Checks.fdViolations(rows, col("x"), col("y")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)) ==
      ((3L, 2L, 4L, false)))
    val clean = Seq((1L, "a"), (2L, "b"), (2L, "b")).toDF("x", "y")
    val rc = Checks.fdViolations(clean, col("x"), col("y")).head()
    assert((rc.getLong(1), rc.getBoolean(3)) == ((0L, true)))
  }

  test("stratifiedDraw: quota-exact per-stratum hash draw, stable across reruns") {
    val rows = ((1 to 6).map(i => ("A", i.toLong)) ++ (7 to 10).map(i => ("B", i.toLong)))
      .toDF("st", "k")
    val d1 = Sampling.stratifiedDraw(rows, col("st"), col("k"), 5L)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted
    assert(d1.count(_._1 == "A") == 3 && d1.count(_._1 == "B") == 2)
    val d2 = Sampling.stratifiedDraw(rows, col("st"), col("k"), 5L)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted
    assert(d1.toSeq == d2.toSeq)
  }

  test("stratifiedDraw: k beyond the population fails fast instead of under-filling") {
    val rows = ((1 to 6).map(i => ("A", i.toLong)) ++ (7 to 10).map(i => ("B", i.toLong)))
      .toDF("st", "k")
    // k = N draws everything, still exact
    assert(Sampling.stratifiedDraw(rows, col("st"), col("k"), 10L).count() == 10L)
    val e = intercept[Exception](
      Sampling.stratifiedDraw(rows, col("st"), col("k"), 11L).collect())
    assert(e.getMessage.contains("exceeds the population"), e.getMessage)
  }

  test("medianWithCi: rank-based 95% interval around the lower median, clamped at the edges") {
    import graft.operators.Relational
    // n=9: m=5, o=floor(0.979982*3)=2 -> (v3, v5, v7).
    val rows = (1 to 9).map(i => ("g", i.toLong)) :+ (("solo", 42L))
    val got = Relational
      .medianWithCi(rows.toDF("g", "v"), col("g"), col("v"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      ("g", 9L, 3L, 5L, 7L),
      ("solo", 1L, 42L, 42L, 42L)))
  }

  test("lDiversity: groups under l distinct sensitive values; null is a value") {
    val rows = Seq(
      ("g1", Some("a")), ("g1", Some("a")), ("g1", Some("b")),
      ("g2", Some("a")), ("g2", Some("b")), ("g2", Some("c")),
      ("g3", Some("a")), ("g3", None))
      .toDF("q", "s")
    val got = Checks
      .lDiversity(rows, Seq("q" -> col("q")), col("s"), 3L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(("g1", 3L, 2L), ("g3", 2L, 2L)))
  }

  test("tCloseness: concentrated groups score the exact CDF-gap mean; absent buckets count") {
    // corpus buckets {1: 2, 2: 2}; g1 all in bucket 1, g2 all in 2:
    // per group, gaps (500000, 0) -> emd6 = 250000 each.
    val rows = Seq(("g1", 1L), ("g1", 1L), ("g2", 2L), ("g2", 2L)).toDF("q", "b")
    val got = Checks
      .tCloseness(rows, Seq("q" -> col("q")), col("b"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(("g1", 2L, 250000L), ("g2", 2L, 250000L)))
    // a group matching the corpus mix exactly scores 0
    val mixed = Seq(("g1", 1L), ("g1", 2L), ("g2", 1L), ("g2", 2L)).toDF("q", "b")
    val gm = Checks
      .tCloseness(mixed, Seq("q" -> col("q")), col("b"))
      .collect().map(r => r.getLong(2))
    assert(gm.forall(_ == 0L))
  }

  test("associationRules: hand-computed support/confidence/lift; per-basket dedup") {
    import graft.operators.Relational
    // baskets: {x,y} {x,y} {x} {y,z} — duplicate x in basket 3 dedups.
    // pair (x,y): n_ab=2, n_x=3, n_y=3, N=4:
    //   support 500000, conf both 666666, lift6 = 1e6*2*4/(3*3) = 888888.
    val rows = Seq(
      (1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"),
      (3L, "x"), (3L, "x"), (4L, "y"), (4L, "z"))
      .toDF("b", "i")
    val got = Relational
      .associationRules(rows, col("b"), col("i"), minPairCount = 2L)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(4), r.getLong(5),
        r.getLong(6), r.getLong(7), r.getLong(8)))
    assert(got.toSeq == Seq(("x", "y", 2L, 500000L, 666666L, 666666L, 888888L)))
  }

  test("skyline2d: dominated rows drop, duplicates of a front point all survive") {
    import graft.operators.Relational
    val rows = Seq(
      (1L, 100L, 5L),  // front
      (2L, 100L, 5L),  // duplicate of the front point -> survives
      (3L, 100L, 3L),  // same price, smaller -> dominated in-group
      (4L, 200L, 7L),  // front (pricier but bigger)
      (5L, 200L, 5L),  // dominated by row 1 (pricier, same size)
      (6L, 300L, 7L),  // dominated by row 4 (pricier, same size)
      (7L, 400L, 9L)   // front
    ).toDF("id", "price", "size")
    val got = Relational.skyline2d(rows, col("price"), col("size"))
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 4L, 7L))
  }

  test("theilIndex: equal values score 0; {3,1} folds hand-computed micro-nat terms") {
    val eq = Seq(5L, 5L, 5L, 5L).toDF("x")
    val r0 = Checks.theilIndex(eq, col("x")).head()
    assert((r0.getLong(0), r0.getLong(1), r0.getLong(2)) == ((4L, 20L, 0L)))
    // mu = 2: terms 1.5*ln1.5 -> 608198, 0.5*ln0.5 -> -346574
    // theil6 = 261624 div 2 = 130812
    val sk = Seq(3L, 1L).toDF("x")
    assert(Checks.theilIndex(sk, col("x")).head().getLong(2) == 130812L)
    // non-positive rows are excluded, not ln'd
    val withZero = Seq(3L, 1L, 0L, -2L).toDF("x")
    val r2 = Checks.theilIndex(withZero, col("x")).head()
    assert((r2.getLong(0), r2.getLong(2)) == ((2L, 130812L)))
  }

  test("lorenzCurve: bottom-half share of {1,2,3,4} is 3/10; terminal point closes at 1e6") {
    val rows = Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L)).toDF("id", "x")
    val got = Checks.lorenzCurve(rows, col("x"), col("id"), 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 2L, 500000L, 300000L), (2L, 4L, 1000000L, 1000000L)))
  }

  test("fanoFactor: flat series scores 0; a burst day scores var/mean exactly") {
    val rows = Seq(
      ("f", "d1", 10L), ("f", "d2", 10L),
      ("b", "d1", 0L), ("b", "d2", 20L)).toDF("grp", "bucket", "n")
    val got = Checks.fanoFactor(rows).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("f") == ((2L, 20L, 0L)))
    // var = 200, mean = 10 -> F = 20
    assert(got("b") == ((2L, 20L, 20000000L)))
  }

  test("kendallTauB: perfect concordance 1e6, reversal -1e6, square-tied grid 0") {
    val inc = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("x", "y")
    val r1 = Checks.kendallTauB(inc, col("x"), col("y")).head()
    assert((r1.getLong(0), r1.getLong(3), r1.getLong(4), r1.getLong(5), r1.getLong(6)) ==
      ((3L, 3L, 0L, 1000000L, 1000000L)))
    val dec = Seq((1L, 3L), (2L, 2L), (3L, 1L)).toDF("x", "y")
    val r2 = Checks.kendallTauB(dec, col("x"), col("y")).head()
    assert((r2.getLong(3), r2.getLong(4), r2.getLong(5), r2.getLong(6)) ==
      ((0L, 3L, -1000000L, -1000000L)))
    // 2x2 full grid: 1 concordant + 1 discordant pair cancel to 0
    val sq = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L)).toDF("x", "y")
    val r3 = Checks.kendallTauB(sq, col("x"), col("y")).head()
    assert((r3.getLong(3), r3.getLong(4), r3.getLong(5), r3.getLong(6)) ==
      ((1L, 1L, 0L, 0L)))
  }

  test("kendallTauB: tie correction shrinks the denominator; fully-tied margin scores 0") {
    // x = (1,2,3,3), y = (1,2,3,4): C = 5, D = 0, Tx2 = 2
    // tau_a6 = 2e6*5 div 12 = 833333; taub2s6 = 4e6*25 div (10*12) = 833333
    val tied = Seq((1L, 1L), (2L, 2L), (3L, 3L), (3L, 4L)).toDF("x", "y")
    val r = Checks.kendallTauB(tied, col("x"), col("y")).head()
    assert((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)) ==
      ((5L, 0L, 833333L, 833333L)))
    // constant x: every pair tied in x -> denominator 0 -> 0
    val const = Seq((7L, 1L), (7L, 2L), (7L, 3L)).toDF("x", "y")
    val r2 = Checks.kendallTauB(const, col("x"), col("y")).head()
    assert((r2.getLong(5), r2.getLong(6)) == ((0L, 0L)))
  }

  test("kendallTauB: dense grid past maxGridCells fails fast in-plan") {
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    val wide = (1L to 4L).flatMap(x => (1L to 4L).map(y => (x, y))).toDF("x", "y")
    val e = intercept[Exception](
      Checks.kendallTauB(wide, col("x"), col("y"), maxGridCells = 15L).collect())
    assert(chain(e).contains("exceeds maxGridCells"))
  }
}
