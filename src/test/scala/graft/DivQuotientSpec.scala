package graft

import graft.operators.{Checks, Evaluation, Experiments, Series, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Amplified-scale fixtures for the round-11 DIVSWEEP (see
  * DIVSWEEP.md): every restaged BIGINT→DECIMAL numerator class is
  * exercised at magnitudes where the OLD staging wrapped (non-ANSI)
  * or aborted (ANSI) — counts ≥ 2e13, centered products past 2^63 —
  * and the results are checked against BigInt-computed expectations.
  * Also pins the ANSI posture the inventory's failure-mode analysis
  * assumes, and the ADVICE round-10 empty-corpus Good–Turing fix.
  */
class DivQuotientSpec extends SparkSpec {
  import spark.implicits._

  test("session runs ANSI mode (overflow aborts loudly, never wraps)") {
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true")
  }

  test("the old BIGINT staging provably fails at 2e13-scale counts") {
    // the exact ebShrinkRates/ppm shape before the sweep: 1e6·x in
    // BIGINT with x = 2.5e13 exceeds 2^63 → ANSI ArithmeticException
    val df = Seq((25000000000000L, 50000000000000L)).toDF("x", "n")
    intercept[ArithmeticException] {
      df.select(expr("CAST(1000000 * x div n AS BIGINT)")).head()
    }
  }

  test("restaged ppm/mean shapes are exact at 2e13-scale counts") {
    val df = Seq((25000000000000L, 50000000000000L)).toDF("x", "n")
    // the DECIMAL restage of the same shape (≈50 sites' idiom)
    assert(df.select(
      expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * x div n AS BIGINT)"))
      .head().getLong(0) == 500000L)
    // the cdf6 variant (factor order flipped: Checks.ksStat class)
    assert(df.select(
      expr("CAST(x * CAST(1000000 AS DECIMAL(38,0)) div n AS BIGINT)"))
      .head().getLong(0) == 500000L)
    // capture–recapture N̂ (Dedup): (n_a+1)(n_b+1) past 2^63
    val cr = Seq((4000000000L, 4000000000L, 1000000000L)).toDF("n_a", "n_b", "n_overlap")
    val expected =
      ((BigInt(4000000001L) * BigInt(4000000001L)) / BigInt(1000000001L) - 1).toLong
    assert(cr.select(
      expr("CAST(CAST(n_a + 1 AS DECIMAL(38,0)) * (n_b + 1) div (n_overlap + 1) AS BIGINT) - 1"))
      .head().getLong(0) == expected)
    // seasonal-index triple product (Series.seasonalIndexDow shape)
    val si = Seq((20000000000000L, 365L, 52L, 21000000000000L))
      .toDF("sum_n", "__n_days", "n_days", "__total")
    val exp2 = (BigInt(1000000) * BigInt(20000000000000L) * BigInt(365) /
      (BigInt(52) * BigInt(21000000000000L))).toLong
    assert(si.select(
      expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * sum_n * __n_days) div (n_days * __total) AS BIGINT)"))
      .head().getLong(0) == exp2)
    // decimal micro-term sum feeding a div (theilIndex/markovChain
    // class): three 5e18 terms — the BIGINT sum would abort at row 2
    val s = Seq(5000000000000000000L, 5000000000000000000L, 5000000000000000000L)
      .toDF("t")
    assert(s.agg(sum(col("t").cast("decimal(38,0)")).as("ts"))
      .select(expr("CAST(ts div 3 AS BIGINT)"))
      .head().getLong(0) == 5000000000000000000L)
  }

  test("ksFromCounts: exact CDF gap at 4e13-row histogram mass") {
    val a = Seq((1L, 30000000000000L), (2L, 10000000000000L)).toDF("bucket", "n")
    val b = Seq((1L, 10000000000000L), (2L, 30000000000000L)).toDF("bucket", "n")
    val r = Checks.ksFromCounts(a, b).head()
    // F_a(1) = 750000, F_b(1) = 250000 → D = 500000 at bucket 1
    assert(r.getAs[Long]("n_rows_a") == 40000000000000L)
    assert(r.getAs[Long]("ks_bucket") == 1L)
    assert(r.getAs[Long]("ks6") == 500000L)
  }

  test("calibration grid chain: exact at 4e13-row bins") {
    val schema = StructType(Seq(
      StructField("bin", LongType),
      StructField("n", LongType),
      StructField("x", LongType),
      StructField("ssum", DecimalType(38, 0)),
      StructField("s2sum", DecimalType(38, 0)),
      StructField("sysum", DecimalType(38, 0))))
    // one bin: n = 4e13, x = 1e13, mean score 500000 → Σs = 2e19
    // (past 2^63: the pre-sweep BIGINT ssum could not represent it)
    val cells = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(0L, 40000000000000L, 10000000000000L,
          BigDecimal("20000000000000000000").bigDecimal,
          BigDecimal("10000000000000000000000000").bigDecimal,
          BigDecimal("5000000000000000000").bigDecimal)),
      schema)
    val bins = Evaluation.calibrationBinsFromCells(cells).head()
    assert(bins.getAs[Long]("conf6") == 500000L)
    assert(bins.getAs[Long]("acc6") == 250000L)
    assert(bins.getAs[Long]("gap6") == 250000L)
    val dec = Evaluation.brierDecomposition(
      Evaluation.calibrationBinsFromCells(cells)).head()
    // base6 = 250000; rel12 = n·(conf6-acc6)² div n = 6.25e10; res 0
    assert(dec.getAs[Long]("base6") == 250000L)
    assert(dec.getAs[Long]("rel12") == 62500000000L)
    assert(dec.getAs[Long]("res12") == 0L)
    assert(dec.getAs[Long]("unc12") == 250000L * 750000L)
  }

  test("acfDaily: exact at daily values whose centered products pass 2^63") {
    // 4-day alternating series at 5e9/1e9: c_t = 4v − 12e9 = ±8e9,
    // c² = 6.4e19 > 2^63 — the pre-sweep BIGINT products aborted here
    val daily = Seq(
      ("k", "1970-01-01", 5000000000L),
      ("k", "1970-01-02", 1000000000L),
      ("k", "1970-01-03", 5000000000L),
      ("k", "1970-01-04", 1000000000L))
      .toDF("key", "day", "v")
      .select(col("key"), col("day").cast("date").as("day"), col("v"))
    val r = Series.acfDaily(daily, "key", "day", "v", maxLag = 1).head()
    // den = 4·(8e9)² = 2.56e20; num(lag1) = 3·(−6.4e19) = −1.92e20
    // acf6 = 1e6·num div den = −750000 exactly
    assert(r.getAs[Long]("n_pairs") == 3L)
    assert(r.getAs[Long]("acf6") == -750000L)
  }

  test("embeddingDispersionFromCells: exact at 3e12-vector moment cells") {
    val schema = StructType(Seq(
      StructField("j", IntegerType),
      StructField("n", LongType),
      StructField("s", DecimalType(38, 0)),
      StructField("q", DecimalType(38, 0))))
    // 3e12 unit vectors, coordinate constant 1.0 (micro 1e6):
    // S = 3e18 (near the documented 3.16e18 DECIMAL(38) square cap),
    // Q = 3e24 → mean_sq12 = centroid_sq12 = 1e12, dispersion 0
    val cells = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(0, 3000000000000L,
          BigDecimal("3000000000000000000").bigDecimal,
          BigDecimal("3000000000000000000000000").bigDecimal)),
      schema)
    val r = Similarity.embeddingDispersionFromCells(cells).head()
    assert(r.getAs[Long]("mean_sq12") == 1000000000000L)
    assert(r.getAs[Long]("centroid_sq12") == 1000000000000L)
    assert(r.getAs[Long]("dispersion12") == 0L)
    assert(r.getAs[Long]("pairwise12") == 0L)
  }

  test("Class C guard: kruskalWallis fails fast just over N = 5e7, runs at it") {
    // the count-grid input puts N wherever we want without
    // materializing rows — one row over the documented bound must
    // name the remedy; AT the bound the 4N⁴ staging still fits
    val over = Seq((1L, 1L, 30000000L), (2L, 2L, 20000001L)).toDF("arm", "v", "c")
    val e = intercept[Exception] {
      Experiments.kruskalWallisFromCounts(over).collect()
    }
    assert(e.getMessage.contains("validity bound 5e7"), e.getMessage)
    val at = Seq((1L, 1L, 30000000L), (2L, 2L, 20000000L)).toDF("arm", "v", "c")
    assert(Experiments.kruskalWallisFromCounts(at).collect().length == 1)
  }

  test("Class C guard: cvmFromCounts fails fast just over mass 2e8, runs at it") {
    val a = Seq((1L, 150000000L)).toDF("bucket", "n")
    val e = intercept[Exception] {
      Checks.cvmFromCounts(a, Seq((1L, 50000001L)).toDF("bucket", "n")).collect()
    }
    assert(e.getMessage.contains("validity bound 2e8"), e.getMessage)
    val r = Checks.cvmFromCounts(a, Seq((1L, 50000000L)).toDF("bucket", "n")).head()
    assert(r.getAs[Long]("t6") == 0L) // identical single-bucket CDFs
  }

  test("Class C guard: chiSquareIndependence fails fast just over N = 3e6, runs at it") {
    def table(n: Long) = spark.range(n)
      .select((col("id") % 2).as("a"), (col("id") % 3).as("b"))
    val e = intercept[Exception] {
      Checks.chiSquareIndependence(table(3000001L), col("a"), col("b")).collect()
    }
    assert(e.getMessage.contains("validity bound 3e6"), e.getMessage)
    val r = Checks.chiSquareIndependence(table(3000000L), col("a"), col("b")).head()
    assert(r.getAs[Long]("n_rows") == 3000000L)
  }

  test("Class C guard: jonckheereTerpstra fails at PLAN time just over N = 1e6") {
    def arms(n: Long) = spark.range(n)
      .select((col("id") % 2).as("arm"), (col("id") % 5).as("v"))
    // the require fires inside the driver bootstrap — no action needed
    val e = intercept[IllegalArgumentException] {
      Experiments.jonckheereTerpstra(arms(1000001L), col("arm"), col("v"))
    }
    assert(e.getMessage.contains("validity bound 1e6"), e.getMessage)
    val r = Experiments
      .jonckheereTerpstra(arms(1000000L), col("arm"), col("v")).head()
    assert(r.getAs[Long]("n") == 1000000L)
  }

  test("goodTuringFromFreq: empty corpus reads mass_ppm 0, never null") {
    val empty = Seq.empty[(String, Long)].toDF("tok", "n")
    val rows = TextAnalysis.goodTuringFromFreq(empty, 5).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("r") == 0L)
    assert(!rows.head.isNullAt(rows.head.fieldIndex("mass_ppm")))
    assert(rows.head.getAs[Long]("mass_ppm") == 0L)
  }
}
