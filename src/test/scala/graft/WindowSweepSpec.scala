package graft

import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window => LWindow}

/** Registry-wide single-task-Window sweep — the structural closure of
  * the r8/r9 funnel hunt. r8 pinned six queries by hand, r9 found two
  * more of the same class by hand (`a_mood_median`, `t_textrank`);
  * this suite ends the query-by-query game: EVERY query in
  * `SparkEntry.queries` is constructed and its OPTIMIZED logical plan
  * walked (including subqueries), and every surviving `Window` node
  * must carry a partition spec — an unpartitioned window is Spark's
  * one-task-holds-the-whole-table shape, the exact thing that dies at
  * corpus scale — unless the query is on the documented whitelist of
  * BOUNDED grids below, each entry citing the bound that keeps its
  * window's input k rows, not corpus rows.
  *
  * Why the optimized logical plan and not the executed plan: the
  * logical `Window.partitionSpec` is a typed field (no string/bracket
  * parsing), windows are never INTRODUCED after optimization (the
  * physical planner maps logical Window 1:1 to WindowExec/
  * WindowGroupLimit), and skipping execution keeps a 490-query sweep
  * tractable — construction still runs each query's bounded
  * driver-side bootstraps and artifact writes, so the plan inspected
  * is the plan Verify runs.
  *
  * The whitelist is also checked in REVERSE: an entry whose query no
  * longer plans an unpartitioned window fails the sweep as stale, so
  * the list stays the complete, current inventory of intentional
  * bounded-grid windows.
  */
class WindowSweepSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** Queries whose plan intentionally carries an unpartitioned Window
    * over a k-row BOUNDED grid (never corpus rows). Value = the bound
    * and its source-of-truth citation.
    */
  private val boundedGridWhitelist: Map[String, String] = {
    val survivalAgeGrid =
      "survival age grid — one row per distinct (day div ageUnitDays) age, " +
        "calendar-bounded (Series.kaplanMeier/logRank: per-entity partials " +
        "collapse to the age grid before any window)"
    val histGrid =
      "64-row histSketch bucket grid (Checks.ksFromCounts scaladoc: the grid " +
        "window is the documented bounded class)"
    val evalGrid =
      "k <= 1000 bucket grid (Evaluation.gainsTable/qiniCurve require(k <= 1000); " +
        "rows collapse to buckets via globalRank BEFORE the cumulative window)"
    val strataGrid =
      "stratum grid — largest-remainder rank over one row per stratum " +
        "(Sampling.quotaLargestRemainder/neymanAllocation, stratum-bounded)"
    val dayGrid = "calendar-day grid — one row per day, bounded by the corpus time span"
    Map(
      "a_bh_fdr" -> ("m = 5 hypotheses (one per event type; literal 5-entry " +
        "threshold table in the query — Experiments.bhStepUp ranks the m-row grid)"),
      "a_holm" -> ("m = 5 hypotheses (the a_bh_fdr family under the FWER scan — " +
        "Experiments.holmStepDown ranks the same m-row grid)"),
      "a_cif" -> survivalAgeGrid,
      "a_gehan" -> survivalAgeGrid,
      "a_hazard_ratio" -> survivalAgeGrid,
      "a_km_greenwood" -> survivalAgeGrid,
      "a_logrank" -> survivalAgeGrid,
      "a_rmst" -> survivalAgeGrid,
      "a_survival_hazard" -> survivalAgeGrid,
      "a_survival_km" -> survivalAgeGrid,
      "st_cif" -> survivalAgeGrid,
      "st_logrank" -> survivalAgeGrid,
      "w_logrank" -> survivalAgeGrid,
      "dq_cvm" -> histGrid,
      "dq_ks" -> histGrid,
      "a_hist_quantile" -> histGrid,
      "st_hist_quantile" -> histGrid,
      "a_gains" -> evalGrid,
      "a_qini" -> evalGrid,
      "st_qini" -> evalGrid,
      "s_neyman_alloc" -> strataGrid,
      "s_quota_draw" -> strataGrid,
      "s_quota_lr" -> strataGrid,
      "a_kmv_join_est" -> ("union-rank over <= 2k KMV buffer hashes by construction " +
        "(Sketches.kmvOverlapEstimate require(k <= 65536) + inline bound comment)"),
      "a_spearman_daily" -> dayGrid,
      "w_cumulative_revenue" -> dayGrid,
      "r_hybrid_rrf" -> ("rank over limit(50) retrieval legs + Rag.rrfFuse k = 10 " +
        "fused list — every window input is limit-k by construction"),
      "r_hybrid_persisted" -> "same limit(50)/k=10 shape as r_hybrid_rrf, off the persisted index",
      "r_rbo" -> ("limit(10) legs + TextAnalysis.rboTable k-row depth grid " +
        "(require(k <= 100); scaladoc names it the documented bounded-window class)"),
      "s_hash_negatives" -> ("negative-pool ring rank — the pool is broadcast-small " +
        "by contract (Sampling.hashNegatives eagerly counts it and broadcasts; the " +
        "broadcast would fail before the window did)"),
      "t_heaps" -> ("doc_id < 2000 prefix by construction — cumulative windows over " +
        "<= 2000 per-doc rows; slope chassis over <= 80 sampled points"),
      "t_zipf" -> "rank over the limit(100) frequency head; slope chassis <= 100 points",
      "t_zipf_head" -> "rank over the limit(30) frequency head")
  }

  test("every Window in every registry query plan is partitioned or a documented bounded grid") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    val hits = scala.collection.mutable.Set[String]()
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val unpart = df.queryExecution.optimizedPlan.collectWithSubqueries {
        case w: LWindow if w.partitionSpec.isEmpty => w
      }
      if (unpart.nonEmpty) {
        hits += name
        if (!boundedGridWhitelist.contains(name))
          offenders += s"$name: ${unpart.map(_.windowExpressions.map(_.name)).mkString(", ")}"
      }
    }
    assert(
      offenders.isEmpty,
      s"unpartitioned (single-task) Window outside the bounded-grid whitelist in:\n  " +
        offenders.mkString("\n  "))
    val stale = boundedGridWhitelist.keySet -- hits
    assert(
      stale.isEmpty,
      s"stale whitelist entries (no unpartitioned Window planned anymore): $stale")
    val unknown = boundedGridWhitelist.keySet -- names.toSet
    assert(unknown.isEmpty, s"whitelist names not in the registry: $unknown")
  }
}
