package graft

import graft.operators.Series
import org.apache.spark.sql.functions._

/** Series.ewmaOrdered — the bounded replacement for the
  * collect_list + aggregate() EWMA (r4 VERDICT "what's wrong" #2).
  * The contract under test: bit-identical to the sequential
  * array-fold definition, independent of partition count, O(1)
  * per-key state (no per-key array ever materializes).
  */
class SeriesSpec extends SparkSpec {
  import spark.implicits._

  // deterministic mixed fixture: one whale key (most rows), several
  // small keys, values from integer arithmetic (exact doubles vary
  // in magnitude and sign)
  private lazy val events = {
    val rows = (0 until 5000).map { i =>
      val key = if (i % 3 != 0) 1L else (i % 7).toLong + 2 // key 1 = whale
      val v = (((i * 2654435761L) % 997) - 498).toDouble / 7.0
      (key, i.toLong * 1000, i.toLong, v)
    }
    rows.toDF("user_id", "us", "event_id", "value")
  }

  /** The old unbounded formulation, kept here as the executable
    * reference semantics.
    */
  private def arrayFold(df: org.apache.spark.sql.DataFrame) = {
    val seq = array_sort(collect_list(struct(col("us"), col("event_id"), col("value"))))
    df.groupBy(col("user_id"))
      .agg(transform(seq, x => x.getField("value")).as("vs"))
      .select(
        col("user_id"),
        size(col("vs")).cast("long").as("n"),
        aggregate(
          slice(col("vs"), lit(2), greatest(size(col("vs")) - 1, lit(0))),
          element_at(col("vs"), 1),
          (acc, x) => lit(0.3) * x + lit(0.7) * acc).as("ewma"))
  }

  private def asMap(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Any)] =
    df.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.get(2)))).toMap

  test("ewmaOrdered: bit-identical to the sequential array-fold reference") {
    val got = asMap(Series.ewmaOrdered(events, "user_id", Seq("us", "event_id"), "value", 0.3))
    val want = asMap(arrayFold(events))
    assert(got.keySet == want.keySet)
    // exact == on doubles on purpose: the fold must run the SAME
    // IEEE chain as the sequential definition, not an approximation
    assert(got == want)
  }

  test("ewmaOrdered: result independent of partition count (whale key spans no boundary)") {
    val base = asMap(
      Series.ewmaOrdered(events, "user_id", Seq("us", "event_id"), "value", 0.3,
        numPartitions = Some(1)))
    for (p <- Seq(2, 3, 17, 64)) {
      val got = asMap(
        Series.ewmaOrdered(events, "user_id", Seq("us", "event_id"), "value", 0.3,
          numPartitions = Some(p)))
      assert(got == base, s"partition count $p changed the result")
    }
  }

  test("ewmaOrdered: null value poisons the fold from that point; null key is one group") {
    val df = Seq[(java.lang.Long, Long, Long, java.lang.Double)](
      (10L, 1L, 1L, 2.0), (10L, 2L, 2L, null), (10L, 3L, 3L, 8.0), // null mid-stream
      (11L, 1L, 4L, 4.0), (11L, 2L, 5L, 14.0),                     // clean
      (null, 1L, 6L, 5.0), (null, 2L, 7L, 15.0)                    // null key group
    ).toDF("user_id", "us", "event_id", "value")
    val got = Series.ewmaOrdered(df, "user_id", Seq("us", "event_id"), "value", 0.3)
      .collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0)) -> ((r.getLong(1), r.get(2))))
      .toMap
    assert(got(10L) == ((3L, null)))
    assert(got(11L) == ((2L, 0.3 * 14.0 + 0.7 * 4.0)))
    assert(got(-1L) == ((2L, 0.3 * 15.0 + 0.7 * 5.0)))
  }

  test("holtOrdered: bit-identical to a driver-side sequential reference fold") {
    val rows = events.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val want: Map[Long, (Long, Double, Double, Double)] = rows
      .groupBy(_._1)
      .map { case (k, g) =>
        val vs = g.sortBy(r => (r._2, r._3)).map(_._4)
        var level = vs.head
        var trend = 0.0
        vs.tail.foreach { v =>
          val l2 = 0.5 * v + 0.5 * (level + trend)
          trend = 0.3 * (l2 - level) + 0.7 * trend
          level = l2
        }
        k -> ((vs.length.toLong, level, trend, level + trend))
      }
    val got = Series.holtOrdered(events, "user_id", Seq("us", "event_id"), "value", 0.5, 0.3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got == want)
  }

  test("holtOrdered: partition-count independent; null poisons level, trend and forecast") {
    val base = asMap(
      Series.holtOrdered(events, "user_id", Seq("us", "event_id"), "value", 0.5, 0.3,
        numPartitions = Some(1)).select(col("user_id"), col("n"), col("forecast")))
    for (p <- Seq(3, 17)) {
      val got = asMap(
        Series.holtOrdered(events, "user_id", Seq("us", "event_id"), "value", 0.5, 0.3,
          numPartitions = Some(p)).select(col("user_id"), col("n"), col("forecast")))
      assert(got == base, s"partition count $p changed the result")
    }
    val df = Seq[(java.lang.Long, Long, Long, java.lang.Double)](
      (10L, 1L, 1L, 2.0), (10L, 2L, 2L, null), (10L, 3L, 3L, 8.0),
      (11L, 1L, 4L, 4.0), (11L, 2L, 5L, 14.0)
    ).toDF("user_id", "us", "event_id", "value")
    val got = Series.holtOrdered(df, "user_id", Seq("us", "event_id"), "value", 0.5, 0.3)
      .collect().map(r => r.getLong(0) -> ((r.get(2), r.get(3), r.get(4)))).toMap
    assert(got(10L) == ((null, null, null)))
    val l2 = 0.5 * 14.0 + 0.5 * 4.0
    assert(got(11L) == ((l2, 0.3 * (l2 - 4.0), l2 + 0.3 * (l2 - 4.0))))
  }

  test("ewmaOrdered plan: no ObjectHashAggregate/SortAggregate collect_list buffer") {
    val plan = Series.ewmaOrdered(events, "user_id", Seq("us", "event_id"), "value", 0.3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("collect_list"), plan)
    assert(!plan.contains("ObjectHashAggregate"), plan)
  }

  test("theilSenDaily: lower-median slope, outlier-immune, negative slopes truncate toward zero") {
    import graft.operators.Series
    def day(i: Int) = java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i))
    val daily = Seq(
      // a: slopes(x1e6) sorted [-10, 0, 10, 10, 10, 30] -> lower median 10e6
      ("a", day(0), 10L), ("a", day(1), 20L), ("a", day(2), 10L), ("a", day(3), 40L),
      // b: monotone decline -> -10e6
      ("b", day(0), 30L), ("b", day(1), 20L), ("b", day(2), 10L),
      // c: single pair -7 over 3 days: 1e6*(-7) div 3 truncates toward
      // zero -> -2333333 (DuckDB // agrees; floor would give ...334)
      ("c", day(0), 10L), ("c", day(3), 3L)
    ).toDF("k", "day", "n")
    val got = Series.theilSenDaily(daily, "k", "day", "n")
      .orderBy($"k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(
      ("a", 4L, 6L, 10000000L),
      ("b", 3L, 3L, -10000000L),
      ("c", 2L, 1L, -2333333L)))
  }

  test("mannKendallDaily: strict rise significant, flat zero, ties correct the variance") {
    import graft.operators.Series
    def day(i: Int) = java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i))
    val daily = Seq(
      // a: strictly increasing 5 days -> S = 10, no ties, den = 5*4*15 = 300,
      //    z2_6 = 18e6 * 81 div 300 = 4,860,000 >= 3,841,459 -> significant
      ("a", day(0), 1L), ("a", day(1), 2L), ("a", day(2), 3L),
      ("a", day(3), 4L), ("a", day(4), 5L),
      // b: flat -> S = 0 -> z2 = 0 (and den itself degenerates: tt = 3*2*11 = 66 = n(n-1)(2n+5))
      ("b", day(0), 7L), ("b", day(1), 7L), ("b", day(2), 7L),
      // c: rise with one tie pair: values 1,2,2,3 -> S = 5,
      //    tt = 2*1*9 = 18, den = 4*3*13 - 18 = 138,
      //    z2_6 = 18e6 * 16 div 138 = 2,086,956 -> not significant
      ("c", day(0), 1L), ("c", day(1), 2L), ("c", day(2), 2L), ("c", day(3), 3L)
    ).toDF("k", "day", "n")
    val got = Series.mannKendallDaily(daily, "k", "day", "n")
      .orderBy($"k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
      .toSeq
    assert(got == Seq(
      ("a", 5L, 10L, 1000000L, 4860000L, true),
      ("b", 3L, 0L, 0L, 0L, false),
      ("c", 4L, 5L, 833333L, 2086956L, false)))
  }

  test("decayWeights6: unit at age 0, exactly half at one half-life, monotone to 0") {
    import graft.operators.Series
    val w = Series.decayWeights6(7, 60)
    assert(w.head == 1000000L)
    assert(w(7) == 500000L)
    assert(w(14) == 250000L)
    assert(w.sliding(2).forall(p => p(0) >= p(1)))
  }

  test("acfDaily: perfect alternation scores lag-1 -1e6 and lag-2 +1e6-ish; flat excluded") {
    import graft.operators.Series
    def d(i: Int) = java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, i))
    // alternating 0,10,0,10,0,10: every centered lag-1 product is
    // negative and |num| = den-class; exact values: n=6, S=30,
    // c_t = 6v-30 = ±30 alternating; den = 6*900 = 5400;
    // lag1: 5 pairs each -900 -> num=-4500 -> acf6 = -833333
    // lag2: 4 pairs each +900 -> num=+3600 -> acf6 = 666666
    val daily = (1 to 6).map(i => ("a", d(i), if (i % 2 == 1) 0L else 10L)) ++
      Seq(("flat", d(1), 5L), ("flat", d(2), 5L)) // zero variance: excluded
    val got = Series.acfDaily(daily.toDF("k", "day", "n"), "k", "day", "n", 2)
      .orderBy($"k", $"lag").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(("a", 1L, 5L, -833333L), ("a", 2L, 4L, 666666L)))
  }

  test("changepointDaily: hand-computed split gain locates the regime shift") {
    import graft.operators.Series
    def d(i: Int) = java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, i))
    // 10,10,10,40,40: A(t) = (5*S_t - 110t)^2 / (t(5-t)):
    // A(1)=900, A(2)=2400, A(3)=5400, A(4)=2025 -> split after day 3,
    // change day = Jan 4, gain6 = 5400e6
    val daily = Seq(
      ("a", d(1), 10L), ("a", d(2), 10L), ("a", d(3), 10L),
      ("a", d(4), 40L), ("a", d(5), 40L),
      ("b", d(1), 7L) // single day: no split, absent
    ).toDF("k", "day", "n")
    val got = Series.changepointDaily(daily, "k", "day", "n")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDate(2).toString, r.getLong(3)))
    assert(got.toSeq == Seq(("a", 5L, "2024-01-04", 5400000000L)))
  }

  test("medianPairwiseSlope6: perfect Zipf scores slope -1e6; NaN axes excluded") {
    import graft.operators.Series
    // f = 8/r at r = 1, 2, 4: every ln-ln pairwise slope is exactly -1
    val pts = Seq(
      (0L, math.log(1.0), math.log(8.0)),
      (0L, math.log(2.0), math.log(4.0)),
      (0L, math.log(4.0), math.log(2.0)),
      (0L, Double.NaN, 1.0) // excluded, not poisoning
    ).toDF("k", "x", "y")
    val r = Series.medianPairwiseSlope6(pts, "k", "x", "y").head()
    assert(r.getLong(1) == 3L) // n_points after NaN exclusion
    assert(r.getLong(2) == 3L)
    assert(r.getLong(3) == -1000000L)
  }

  test("crossCorrDaily: a shifted copy peaks at exactly its lag with xcf 1e6") {
    import graft.operators.Series
    def d(i: Int) = java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, i))
    // b is a 2-day-delayed copy of a (same values): the lag-2 pairs
    // align identical centered values -> correlation exactly 1e6
    val av = Seq(10L, 30L, 20L, 50L, 40L, 60L, 25L, 45L)
    val a = av.zipWithIndex.map { case (v, i) => (d(i + 1), v) }.toDF("day", "n")
    val b = av.zipWithIndex.map { case (v, i) => (d(i + 3), v) }.toDF("day", "n")
    val got = Series.crossCorrDaily(a, b, "day", "n", 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(2L) == ((8L, 1000000L)), s"got $got")
    // every other lag has fewer aligned pairs and lower |xcf|
    got.filter(_._1 != 2L).foreach { case (l, (_, x)) =>
      assert(math.abs(x) < 1000000L, s"lag $l")
    }
  }

  test("fanoDaily: constant series disperses 0, hand case exact, zero-sum dropped") {
    import graft.operators.Series
    def d(i: Int) = java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, i))
    val rows = Seq(
      ("c", d(1), 5L), ("c", d(2), 5L),        // constant -> 0
      ("h", d(1), 1L), ("h", d(2), 3L),        // (2*10-16)/(2*4) = 0.5
      ("z", d(1), 0L), ("z", d(2), 0L))        // zero-sum -> dropped
    val got = Series.fanoDaily(rows.toDF("k", "day", "v"), "k", "day", "v")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == Map("c" -> ((2L, 10L, 0L)), "h" -> ((2L, 4L, 500000L))))
  }

  test("mannKendallDaily: monotone series scores tau 1e6, outlier-spiked flat series near 0") {
    import graft.operators.Series
    def d(i: Int) = java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, i))
    // key "up": strictly increasing 5 days -> S = 10 pairs, tau = 1e6
    // key "flat": constant except one spike -> S = (n-1) - 0 ... spike
    // at the END adds only +4 of 10 pairs -> tau small (0.4e6):
    // the Theil-Sen-vs-MK divergence the scaladoc promises
    val rows =
      (1 to 5).map(i => ("up", d(i), i.toLong)) ++
        Seq(("flat", d(1), 10L), ("flat", d(2), 10L), ("flat", d(3), 10L),
          ("flat", d(4), 10L), ("flat", d(5), 99L))
    val got = Series
      .mannKendallDaily(rows.toDF("k", "day", "v"), "k", "day", "v")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got("up") == ((5L, 10L, 1000000L)))
    assert(got("flat") == ((5L, 4L, 400000L)))
    // negative S truncates toward zero exactly like the oracle: 4 of
    // 6 pairs falling -> tau6 = -(1e6*2)//6 ... hand case: 1,3,2,1
    val neg = Seq(("n", d(1), 3L), ("n", d(2), 2L), ("n", d(3), 1L), ("n", d(4), 2L))
    val gneg = Series.mannKendallDaily(neg.toDF("k", "day", "v"), "k", "day", "v")
      .head()
    // pairs: (3,2)-1 (3,1)-1 (3,2)-1 (2,1)-1 (2,2)0 (1,2)+1 -> S=-3
    assert(gneg.getLong(2) == -3L && gneg.getLong(3) == -500000L)
  }

  test("kaplanMeier: hand-computed product-limit curve with censoring") {
    import graft.operators.Series
    def d(day: Int) = java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, day))
    // corpus clock = day 10, censor horizon 2 days:
    // e1 age 0 churn, e2 age 1 censored, e3 age 2 churn, e4 age 2 censored
    // n: age0=4, age1=3, age2=2
    // S(0)=750000, S(1)=750000 (censoring is not churn), S(2)=375000
    val ev = Seq(
      (1L, d(5)), (2L, d(8)), (2L, d(9)), (3L, d(3)), (3L, d(5)),
      (4L, d(8)), (4L, d(10))).toDF("id", "day")
    val got = Series.kaplanMeier(ev, "id", "day", 1, 2)
      .orderBy($"age").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq(
      (0L, 4L, 1L, 0L, 750000L),
      (1L, 3L, 0L, 1L, 750000L),
      (2L, 2L, 1L, 1L, 375000L)))
  }

  test("ksFromCounts: disjoint grids score 1e6 at the first bucket; identical grids 0") {
    import graft.operators.Checks
    val a = Seq((0L, 10L)).toDF("bucket", "n")
    val b = Seq((1L, 10L)).toDF("bucket", "n")
    val r = Checks.ksFromCounts(a, b).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((2L, 10L, 10L, 0L, 1000000L)))
    val same = Checks.ksFromCounts(a, a).head()
    assert(same.getLong(4) == 0L)
  }

  test("jsFromCounts: identical grids score 0; disjoint grids score symmetric smoothed mass") {
    import graft.operators.Checks
    val a = Seq((0L, 10L)).toDF("bucket", "n")
    val b = Seq((1L, 10L)).toDF("bucket", "n")
    // smoothed pa0 = 11/12 vs pb0 = 1/12, symmetric on bucket 1:
    // per-bucket micro-nat term 203156, total 406312 (< ln2 = 693147)
    val r = Checks.jsFromCounts(a, b).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((2L, 10L, 10L, 406312L)))
    assert(Checks.jsFromCounts(a, a).head().getLong(3) == 0L)
    // symmetry: js(a,b) == js(b,a)
    assert(Checks.jsFromCounts(b, a).head().getLong(3) == 406312L)
  }

  test("cvmFromCounts: disjoint grids integrate the unit gap; identical grids score 0") {
    import graft.operators.Checks
    val a = Seq((0L, 10L)).toDF("bucket", "n")
    val b = Seq((1L, 10L)).toDF("bucket", "n")
    // gap6 = 1e6 on bucket 0 (mass 10), 0 on bucket 1:
    // T = (10*10/400) * 10 * 1^2 = 2.5 -> t6 = 2500000
    val r = Checks.cvmFromCounts(a, b).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((2L, 10L, 10L, 2500000L)))
    assert(Checks.cvmFromCounts(a, a).head().getLong(3) == 0L)
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    val empty = Seq.empty[(Long, Long)].toDF("bucket", "n")
    val e = intercept[Exception](Checks.cvmFromCounts(a, empty).collect())
    assert(chain(e).contains("non-empty"))
  }

  test("ksFromCounts fails fast on an empty side; two empty sides return zero rows") {
    import graft.operators.Checks
    val a = Seq((0L, 10L)).toDF("bucket", "n")
    val empty = Seq.empty[(Long, Long)].toDF("bucket", "n")
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    val e = intercept[Exception](Checks.ksFromCounts(a, empty).collect())
    assert(chain(e).contains("non-empty"))
    val e2 = intercept[Exception](Checks.ksFromCounts(empty, a).collect())
    assert(chain(e2).contains("non-empty"))
    // nothing to compare at all -> zero rows, no throw
    assert(Checks.ksFromCounts(empty, empty).collect().isEmpty)
  }

  test("seasonalIndexDow: Monday-doubled fortnight yields exact micro-unit indexes") {
    import graft.operators.Series
    // 2024-01-01 is a Monday; 14 days, Mondays 20 else 10:
    // total 160, Monday idx = 20*14/160 = 1.75, others 0.875
    val days = (0 until 14).map { i =>
      val d = java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i))
      (d, if (i % 7 == 0) 20L else 10L)
    }
    val got = Series.seasonalIndexDow(days.toDF("day", "n"), "day", "n")
      .orderBy($"dow").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got.length == 7)
    assert(got(1) == ((1L, 2L, 40L, 1750000L))) // Monday
    assert(got.filter(_._1 != 1L).forall(x => x._2 == 2L && x._3 == 20L && x._4 == 875000L))
  }

  test("nelsonAalen: per-age d/n terms sum exactly; censoring matches the KM convention") {
    // ages 0/1/2 with d = 1,1,0 and at-risk 4,3,2:
    // h6 = 250000, then +333333, then +0.
    val rows = Seq(
      (1L, "2024-01-01"), (1L, "2024-01-01"),
      (2L, "2024-01-01"), (2L, "2024-01-02"),
      (3L, "2024-01-01"), (3L, "2024-01-03"),
      (4L, "2024-01-01"), (4L, "2024-01-03"))
      .toDF("id", "d").withColumn("day", col("d").cast("date"))
    val got = Series
      .nelsonAalen(rows, "id", "day", 1, 1)
      .orderBy(col("age"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (0L, 4L, 1L, 0L, 250000L),
      (1L, 3L, 1L, 0L, 583333L),
      (2L, 2L, 0L, 2L, 583333L)))
  }

  test("logRank: hand-computed two-group curve; censored entity is at-risk evidence only") {
    // A lifetimes {0,1}, B {2,3}, censorDays=0 -> nobody censored.
    // ages: 0 (dA=1, n=4), 1 (dA=1, n=3), 2 (dB=1), 3 (dB=1)
    // E6 = 500000+333333, V6 = 250000+222222, O_A = 2
    // z2_6 = (2e6-833333)^2 div 472222 = 2882355
    val rows = Seq(
      (1L, "A", "2024-01-01"), (2L, "A", "2024-01-01"), (2L, "A", "2024-01-02"),
      (3L, "B", "2024-01-01"), (3L, "B", "2024-01-03"),
      (4L, "B", "2024-01-01"), (4L, "B", "2024-01-04"))
      .toDF("id", "g", "d").withColumn("day", col("d").cast("date"))
    val r = Series.logRank(rows, "id", "day", "g", 1, 0).head()
    assert((r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getLong(6), r.getLong(7), r.getBoolean(8)) ==
      (("A", "B", 2L, 2L, 2L, 833333L, 472222L, 2882355L, false)))
    // censor a2 at the corpus clock (censorDays=1): it stays in the
    // risk sets but its age-3 row is not churn -> O_A drops to 1.
    // ages: 0 dA=1 (nA=2,nB=2), 1 dB=1 (nA=1,nB=2), 2 dB=1 (nA=1,nB=1),
    // 3 cA=1. E6 = 500000+333333+500000, V6 = 250000+222222+250000.
    val cens = Seq(
      (1L, "A", "2024-01-01"),
      (2L, "A", "2024-01-01"), (2L, "A", "2024-01-04"),
      (3L, "B", "2024-01-01"), (3L, "B", "2024-01-02"),
      (4L, "B", "2024-01-01"), (4L, "B", "2024-01-03"))
      .toDF("id", "g", "d").withColumn("day", col("d").cast("date"))
    val r2 = Series.logRank(cens, "id", "day", "g", 1, 1).head()
    assert((r2.getLong(4), r2.getLong(5), r2.getLong(6), r2.getLong(7)) ==
      ((1L, 1333333L, 722222L, 153845L)))
  }

  test("kaplanMeierGreenwood: per-age pico terms accumulate; zero-churn age adds nothing") {
    // KM fixture ages 0/1/2, (n,d) = (4,1),(3,0),(2,1), S6 = 750000/750000/375000
    // g12 terms: 1e12/(4*3), 0, 1e12/(2*1); gvar12 via S^2 * cumsum
    def d(day: Int) = java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, day))
    val ev = Seq(
      (1L, d(5)), (2L, d(8)), (2L, d(9)), (3L, d(3)), (3L, d(5)),
      (4L, d(8)), (4L, d(10))).toDF("id", "day")
    val got = Series.kaplanMeierGreenwood(ev, "id", "day", 1, 2)
      .orderBy(col("age")).collect()
      .map(r => (r.getLong(0), r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      (0L, 750000L, 46874999999L),
      (1L, 750000L, 46874999999L),
      (2L, 375000L, 82031249999L)))
  }

  test("hazardRatio: per-side expected churn folds to the hand-computed MH ratio") {
    // the logRank fixture: A lifetimes {0,1}, B {2,3}, no censoring.
    // EA6 = 500000+333333, EB6 = 500000+666666+1e6+1e6 = 3166666
    // hr6 = (1e6*2*3166666) div (2*833333) = 3800000
    val rows = Seq(
      (1L, "A", "2024-01-01"), (2L, "A", "2024-01-01"), (2L, "A", "2024-01-02"),
      (3L, "B", "2024-01-01"), (3L, "B", "2024-01-03"),
      (4L, "B", "2024-01-01"), (4L, "B", "2024-01-04"))
      .toDF("id", "g", "d").withColumn("day", col("d").cast("date"))
    val r = Series.hazardRatio(rows, "id", "day", "g", 1, 0).head()
    assert((r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6)) ==
      (("A", "B", 2L, 2L, 833333L, 3166666L, 3800000L)))
  }

  test("restrictedMeanSurvival: step areas under the KM curve, horizon-clipped") {
    // the kaplanMeier fixture: ages 0/1/2 with S6 = 750000/750000/375000
    def d(day: Int) = java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, day))
    val ev = Seq(
      (1L, d(5)), (2L, d(8)), (2L, d(9)), (3L, d(3)), (3L, d(5)),
      (4L, d(8)), (4L, d(10))).toDF("id", "day")
    // tau=2: 750000*(1-0) + 750000*(2-1) = 1500000
    val r2 = Series.restrictedMeanSurvival(ev, "id", "day", 1, 2, 2L).head()
    assert((r2.getLong(0), r2.getLong(1), r2.getLong(2)) == ((2L, 4L, 1500000L)))
    // tau=5: + 375000*(5-2) = 2625000 (last step extends to tau)
    val r5 = Series.restrictedMeanSurvival(ev, "id", "day", 1, 2, 5L).head()
    assert(r5.getLong(2) == 2625000L)
  }

  test("gehanWilcoxon: at-risk weights re-weigh the logRank fixture's early evidence") {
    // per-age num = 1e6*n*dA - n*e6: 2e6 + 2000001 + 0 + 0 = 4000001
    // den6 = n^2*v6: 4e6 + 1999998 = 5999998 -> z2_6 = 2666668
    val rows = Seq(
      (1L, "A", "2024-01-01"), (2L, "A", "2024-01-01"), (2L, "A", "2024-01-02"),
      (3L, "B", "2024-01-01"), (3L, "B", "2024-01-03"),
      (4L, "B", "2024-01-01"), (4L, "B", "2024-01-04"))
      .toDF("id", "g", "d").withColumn("day", col("d").cast("date"))
    val r = Series.gehanWilcoxon(rows, "id", "day", "g", 1, 0).head()
    assert((r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getBoolean(6)) == (("A", "B", 2L, 2L, 2L, 2666668L, false)))
  }

  test("stratifiedLogRank: one stratum equals logRank; two identical strata double the evidence") {
    val one = Seq(
      (1L, "A", "s1", "2024-01-01"), (2L, "A", "s1", "2024-01-01"), (2L, "A", "s1", "2024-01-02"),
      (3L, "B", "s1", "2024-01-01"), (3L, "B", "s1", "2024-01-03"),
      (4L, "B", "s1", "2024-01-01"), (4L, "B", "s1", "2024-01-04"))
      .toDF("id", "g", "st", "d").withColumn("day", col("d").cast("date"))
    val r1 = Series.stratifiedLogRank(one, "id", "day", "g", "st", 1, 0).head()
    // same evidence as the logRank fixture: z2_6 = 2882355
    assert((r1.getLong(2), r1.getLong(5), r1.getLong(6), r1.getLong(7), r1.getLong(8)) ==
      ((1L, 2L, 833333L, 472222L, 2882355L)))
    // a second isomorphic stratum doubles O/E/V: z2 = (4e6-1666666)^2 div 944444
    val two = one.unionByName(
      one.select((col("id") + 100L).as("id"), col("g"), lit("s2").as("st"),
        col("d"), col("day")))
    val r2 = Series.stratifiedLogRank(two, "id", "day", "g", "st", 1, 0).head()
    assert((r2.getLong(2), r2.getLong(5), r2.getLong(6), r2.getLong(7), r2.getLong(8),
      r2.getBoolean(9)) == ((2L, 4L, 1666666L, 944444L, 5764711L, true)))
    // an entity spanning two strata is a caller bug
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    val dup = Seq(
      (1L, "A", "s1", "2024-01-01"), (1L, "A", "s2", "2024-01-02"),
      (2L, "B", "s1", "2024-01-01"))
      .toDF("id", "g", "st", "d").withColumn("day", col("d").cast("date"))
    val e = intercept[Exception](
      Series.stratifiedLogRank(dup, "id", "day", "g", "st", 1, 0).collect())
    assert(chain(e).contains("two groups or strata"))
  }

  test("cumulativeIncidence: per-cause mass sums to the all-cause churn; last event names the cause") {
    // e1 (age0, x), e2 (age0, y), e3 (age1, last=x), e4 (age1, x):
    // S(0-) = 1e6, S(1-) = 500000
    // CIF_x: 250000 at age0, 750000 at age1; CIF_y: 250000 at age0
    val rows = Seq(
      (1L, "x", "2024-01-01"),
      (2L, "y", "2024-01-01"),
      (3L, "y", "2024-01-01"), (3L, "x", "2024-01-02"),
      (4L, "x", "2024-01-01"), (4L, "x", "2024-01-02"))
      .toDF("id", "cause", "d").withColumn("day", col("d").cast("date"))
    val got = Series.cumulativeIncidence(rows, "id", "day", "cause", 1, 0)
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(3), r.getLong(4))))
      .toMap
    assert(got(("x", 0L)) == ((1L, 250000L)))
    assert(got(("y", 0L)) == ((1L, 250000L)))
    assert(got(("x", 1L)) == ((2L, 750000L)))
    assert(got.size == 3)
  }

  test("logRank: three groups and a two-group entity both fail fast") {
    import graft.operators.Series
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    val three = Seq((1L, "A", "2024-01-01"), (2L, "B", "2024-01-01"), (3L, "C", "2024-01-01"))
      .toDF("id", "g", "d").withColumn("day", col("d").cast("date"))
    val e = intercept[Exception](Series.logRank(three, "id", "day", "g", 1, 0).collect())
    assert(chain(e).contains("exactly 2 groups"))
    val dup = Seq((1L, "A", "2024-01-01"), (1L, "B", "2024-01-02"), (2L, "B", "2024-01-01"))
      .toDF("id", "g", "d").withColumn("day", col("d").cast("date"))
    val e2 = intercept[Exception](Series.logRank(dup, "id", "day", "g", 1, 0).collect())
    assert(chain(e2).contains("entity in two groups"))
  }

  test("hillTailIndex: exact dyadic fixture; flat top scores 0; short input fails fast") {
    // top-3 of {8,4,2}: x_ref = 2, terms ln(4), ln(2) -> h6 = 1039720.
    val dyadic = Seq(8L, 4L, 2L, 1L).toDF("v")
    val r = Series.hillTailIndex(dyadic, col("v"), 2).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((2L, 2L, 1039720L, 961797L)))
    // all top values equal: no tail slope -> h6 = 0, alpha 0
    val flat = Seq(5L, 5L, 5L).toDF("v")
    val rf = Series.hillTailIndex(flat, col("v"), 2).head()
    assert((rf.getLong(2), rf.getLong(3)) == ((0L, 0L)))
    val short = Seq(3L, 2L).toDF("v")
    val e = intercept[Exception](Series.hillTailIndex(short, col("v"), 2).head())
    assert(e.getMessage.contains("need at least 3 positive values"))
  }

  test("iatEntropy: metronomic gaps score 0; spread gaps score exact micro-nats") {
    def ts(sec: Int) = s"2024-01-01 00:00:${"%02d".format(sec)}"
    val rows = Seq(
      // user 1: gaps 1s,1s,1s -> one bucket -> entropy 0
      (1L, ts(0), 10L), (1L, ts(1), 11L), (1L, ts(2), 12L), (1L, ts(3), 13L),
      // user 2: gaps 1s,3s,7s -> buckets 1,2,3 -> entropy ln(3) micro
      (2L, ts(0), 20L), (2L, ts(1), 21L), (2L, ts(4), 22L), (2L, ts(11), 23L),
      // user 3: single event -> no gap -> absent
      (3L, ts(5), 30L))
      .toDF("u", "tss", "eid")
      .withColumn("ts", col("tss").cast("timestamp"))
    val got = Series
      .iatEntropy(rows, col("u"), col("ts"), col("eid"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 3L, 1L, 0L),
      (2L, 3L, 3L, 1098612L)))
  }

  test("twap: interval-weighted mean, zero-span null, singletons absent") {
    // user 1: v=10 holds 10s, v=20 holds 20s -> (100+400)/30 = 16 (trunc).
    val rows = Seq(
      (1L, "2024-01-01 00:00:00", 1L, 10L),
      (1L, "2024-01-01 00:00:10", 2L, 20L),
      (1L, "2024-01-01 00:00:30", 3L, 0L),
      // user 2: both events at one instant -> span 0 -> null twap
      (2L, "2024-01-01 00:00:00", 4L, 5L),
      (2L, "2024-01-01 00:00:00", 5L, 9L),
      // user 3: single event -> absent
      (3L, "2024-01-01 00:00:00", 6L, 7L))
      .toDF("u", "tss", "eid", "v")
      .withColumn("ts", col("tss").cast("timestamp"))
    val got = Series
      .twap(rows, col("u"), col("ts"), col("eid"), col("v"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 3L, 30000000L, 16L),
      (2L, 2L, 0L, -1L)))
  }

  test("markovNll: per-key surprise under the corpus's own transition model") {
    // global model: p(b|a)=p(a|a)=0.5 (nll ln2), p(a|b)=1 (nll 0).
    // user 1 a->b->a->b: 693147+0+693147; user 2 a->a->a: 2*693147.
    val rows = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"), (1L, 4L, "b"),
      (2L, 1L, "a"), (2L, 2L, "a"), (2L, 3L, "a"))
      .toDF("u", "seq", "st")
    val got = Series
      .markovNll(rows, col("u"), Seq(col("seq")), col("st"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 3L, 1386294L, 462098L),
      (2L, 2L, 1386294L, 693147L)))
  }

  test("attributionCredits: linear and U-shape splits, window cut, unattributed surfaced") {
    // user 1: conv day 10, touches click d3 / view d5 / click d7 (n=3,
    // U = 400k/200k/400k) plus a click at d2 OUTSIDE the 7-day window;
    // user 3: conv day 10, click d8 + view d9 (n=2, 500k each);
    // user 2: conversion with no touches -> "(unattributed)".
    def ts(d: Int) = s"2024-01-${"%02d".format(d)} 00:00:00"
    val rows = Seq(
      (1L, ts(10), 100L, "purchase"),
      (1L, ts(2), 101L, "click"),   // 8 days before: excluded
      (1L, ts(3), 102L, "click"),
      (1L, ts(5), 103L, "view"),
      (1L, ts(7), 104L, "click"),
      (2L, ts(10), 200L, "purchase"),
      (3L, ts(10), 300L, "purchase"),
      (3L, ts(8), 301L, "click"),
      (3L, ts(9), 302L, "view"))
      .toDF("user_id", "tss", "event_id", "event_type")
      .withColumn("ts", col("tss").cast("timestamp"))
    val got = Series
      .attributionCredits(
        rows, col("user_id"), col("ts"), col("event_id"),
        col("event_type") === "purchase",
        col("event_type").isin("click", "view"),
        col("event_type"), lookbackDays = 7)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      ("(unattributed)", 0L, 1L, 1000000L, 1000000L),
      ("click", 3L, 2L, 1166666L, 1300000L),
      ("view", 2L, 2L, 833333L, 700000L)))
  }

  test("seasonalNaiveEval: exact WAPE/sMAPE/MASE on a three-week step series") {
    import spark.implicits._
    // Weeks at levels 10 / 12 / 15, season 7, holdout 7: train pairs
    // are days 8-14 (|e| = 2 each, MAE 2), eval days 15-21 (|e| = 3,
    // MAE 3). wape6 = (1e6*21) div 105 = 200000; per-day smape term
    // (2e6*3) div 27 = 222222; mase6 = 1.5e6 exactly.
    val rows = (1 to 21).map { i =>
      (f"2024-01-$i%02d", if (i <= 7) 10L else if (i <= 14) 12L else 15L)
    }
    val r = Series
      .seasonalNaiveEval(rows.toDF("day", "y"), "day", "y", season = 7, holdout = 7)
      .head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8)) ==
      ((7L, 7L, 21L, 105L, 7L, 0L, 200000L, 222222L, 1500000L)))
    // degenerate guards: a flat series has zero train error -> MASE
    // guard returns 0 (not a division error); zero values exercise
    // the smape 0/0 convention
    val flat = (1 to 21).map(i => (f"2024-01-$i%02d", 0L))
    val z = Series
      .seasonalNaiveEval(flat.toDF("day", "y"), "day", "y", season = 7, holdout = 7)
      .head()
    assert((z.getLong(2), z.getLong(6), z.getLong(7), z.getLong(8)) ==
      ((0L, 0L, 0L, 0L)))
    intercept[IllegalArgumentException] {
      Series.seasonalNaiveEval(rows.toDF("day", "y"), "day", "y", season = 0, holdout = 7)
    }
  }
}
