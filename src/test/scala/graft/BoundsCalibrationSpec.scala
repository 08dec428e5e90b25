package graft

import org.apache.spark.sql.functions._

/** The round-10 declared-bound incident (an in-plan fail-fast bound
  * calibrated on sf0.01's max value would have errored the driver's
  * sf0.1 bench run) promoted to a checked rule: every DATA-MAGNITUDE
  * fail-fast bound in the query registry is re-exercised here against
  * the LARGEST scale factor the harness runs (sf0.1), with headroom
  * asserted — a bound that barely clears today's data is a bench
  * failure waiting for the next data refresh.
  *
  * Inventory (round 11): the registry carries exactly two
  * data-magnitude declared bounds —
  *   1. a_eprocess_mean / st_eprocess_mean map cent values into ppm
  *      of a declared $1000 cap (Experiments.eProcessMean requires
  *      valuePpm ≤ 1e6);
  *   2. g_hits runs Graph.hits with the default unit = 1e6, whose
  *      normalizer requires node count < unit (scaladoc rule:
  *      unit scales with nodes on bigger corpora).
  * Every other assert_true/require in operators/ is a STRUCTURAL
  * invariant (exactly-2-sides, ragged arrays, grid caps like k ≤ 11
  * arms or bins ≤ 1000) — scale-factor-independent by construction —
  * or a clamp (calibration score `least`, histSketch ceiling bucket),
  * which degrades gracefully instead of failing.
  */
class BoundsCalibrationSpec extends SparkSpec {

  private val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

  private def available: Boolean = new java.io.File(s"$sfDir/events.parquet").exists()

  test("a_eprocess_mean's declared $1000 bound clears sf0.1 with headroom") {
    assume(available, s"$sfDir not present")
    // the query maps round(value·100)·10 into ppm of the $1000 cap;
    // the guard fires at value > $1000 — require ≥ 25% headroom over
    // the observed max so a data refresh can't silently cross it
    val maxValue = spark.read.parquet(s"$sfDir/events.parquet")
      .agg(max(col("value"))).head().getDouble(0)
    val cap = 1000.0
    assert(maxValue <= cap * 0.80,
      s"observed max value $maxValue is within 25% of the declared $$1000 " +
        "e-process bound — recalibrate the bound (and m0/lambda rescale) " +
        "BEFORE the bench trips the in-plan guard")
  }

  test("g_hits' node count stays under the default hits unit at sf0.1") {
    assume(available, s"$sfDir not present")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val ord = spark.read.parquet(s"$sfDir/orders.parquet")
    val edges = li
      .join(ord.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("src"), (-col("l_suppkey") - 1).as("dst"))
    val nodes = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id")))
      .distinct().count()
    // Graph.hits normalizer requires nodes < unit (default 1e6);
    // assert 2x headroom and point at the documented unit-∝-nodes rule
    assert(nodes < 500000L,
      s"g_hits graph has $nodes nodes — within 2x of the default " +
        "unit = 1e6 normalizer bound; raise unit in the query " +
        "(Graph.hits scaladoc: unit must exceed the node count)")
  }
}
