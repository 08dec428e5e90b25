package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Classifier/detector EVALUATION — the readout layer for every score
  * this engine produces (quality gates, near-dup detectors, language
  * ID margins, spam heuristics): how good is a score column at
  * separating a binary label, and can its raw value be read as a
  * probability? The reference ships detectors but never scores them
  * (`/root/reference/src/structured_extraction_v2.py` emits
  * confidence fields that nothing downstream audits); a 100 TB
  * pipeline promotes or demotes a gate on exactly these numbers.
  *
  * Exactness contract (the [[Experiments]] discipline): every
  * statistic is a ratio of exact integer cross-products in
  * DECIMAL(38,0) where BIGINT would overflow, one truncating division
  * per emitted term, bit-identical on any partitioning and mirrored
  * verbatim by the DuckDB oracle.
  */
object Evaluation {

  /** ROC area under the curve via the rank identity (Hanley & McNeil
    * 1982): AUC = U⁺/(n⁺·n⁻) where U⁺ is the Mann–Whitney U of the
    * positive class — the probability a random positive outscores a
    * random negative, with ties counting half. This IS the
    * trapezoidal area under the empirical ROC curve, computed without
    * materializing the curve: mid-ranks make the tie trapezoids
    * exact.
    *
    * Exactness — the [[Experiments.mannWhitneyU]] doubled-mid-rank
    * chassis: a distinct value with min-rank r and tie-count t gives
    * each member the doubled mid-rank 2r + t − 1 (integer); the
    * doubled positive rank-sum yields 2U⁺ = R2⁺ − n⁺(n⁺+1), and
    *
    *   auc6 = 1e6 · 2U⁺ div (2 · n⁺ · n⁻)
    *
    * — one truncating division off DECIMAL(38,0) cross-products
    * (n⁺·n⁻ alone passes 2^63 at ~3e9 rows per class). gini6 =
    * 2·auc6 − 1e6 (the accuracy-ratio rescaling, 0 = chance).
    * A single-class input fails fast in-plan: AUC is undefined, and a
    * detector audit that silently returns a constant hides exactly
    * the labeling bug it exists to catch.
    *
    * Scale shape: one hash aggregate to the distinct-score count
    * table (bounded by the score DOMAIN, never the corpus), min-ranks
    * from [[Relational.globalCumSum]]'s range-partitioned prefix sum
    * (never a single-task window), a 1-row bounded final aggregate.
    * Returns one row (n_pos, n_neg, u2x, auc6, gini6).
    */
  def rocAuc(df: DataFrame, labelCol: Column, scoreCol: Column): DataFrame =
    rocAucFromCells(rocAucCells(df, labelCol, scoreCol))

  /** The MERGEABLE half of [[rocAuc]]: the per-distinct-score count
    * grid (v, t, np_v) — counts are linear, so partial grids from
    * independent slices SUM-merge exactly and [[rocAucFromCells]]
    * over the merged grid is bit-equal to a single-pass AUC (the
    * calibrationCells posture applied to ranking quality: a live
    * detector-AUC monitor never re-scans history). Grid size is
    * bounded by the score DOMAIN; one corpus scan.
    */
  def rocAucCells(df: DataFrame, labelCol: Column, scoreCol: Column): DataFrame =
    df
      .filter(labelCol.isNotNull && scoreCol.isNotNull)
      .groupBy(scoreCol.cast("long").as("v"))
      .agg(
        count(lit(1)).as("t"),
        sum(when(labelCol.cast("boolean"), 1L).otherwise(0L)).as("np_v"))

  /** AUC off a (possibly merged) [[rocAucCells]] grid — ranks and
    * the one division happen AFTER the merge, so partials stay
    * exact. Single-class input fails fast (the rocAuc contract).
    */
  def rocAucFromCells(cells: DataFrame): DataFrame = {
    val vs = cells
      .groupBy(col("v"))
      .agg(sum(col("t")).as("t"), sum(col("np_v")).as("np_v"))
    val totals = broadcast(
      vs.agg(
        sum(col("np_v")).as("__np"),
        sum(col("t") - col("np_v")).as("__nn")))
    val checked = vs
      .crossJoin(totals)
      .filter(
        assert_true(
          col("__np") > 0L && col("__nn") > 0L,
          concat(
            lit("rocAuc: both classes required (n_pos="),
            col("__np").cast("string"),
            lit(", n_neg="),
            col("__nn").cast("string"),
            lit(") — AUC is undefined on a single-class input"))).isNull)
      .select(col("v"), col("t"), col("np_v"))
    val ranked = Relational
      .globalCumSum(checked, Seq(col("v")), "t", "__below")
      .withColumn("rmin", col("__below") + 1L)
    ranked
      .agg(
        sum(col("np_v")).as("n_pos"),
        sum(col("t") - col("np_v")).as("n_neg"),
        // the doubled rank-sum in DECIMAL from the first multiply:
        // np_v·(2·rmin+t−1) reaches ~2·N·np_v and its SUM ~2·N·n⁺,
        // both past 2^63 near the ~3e9-rows-per-class bound — a
        // silent BIGINT wrap here would corrupt the AUC, so the
        // numerator gets the same DECIMAL(38,0) discipline as the
        // denominator below
        sum(
          col("np_v").cast("decimal(38,0)")
            * (lit(2L) * col("rmin") + col("t") - 1L)).as("__r2p"))
      .withColumn(
        "u2x",
        (col("__r2p") - col("n_pos").cast("decimal(38,0)") * (col("n_pos") + 1L))
          .cast("long"))
      .withColumn(
        "auc6",
        expr(
          """CAST((CAST(1000000 AS DECIMAL(38,0)) * CAST(u2x AS DECIMAL(38,0)))
            |div (CAST(2 AS DECIMAL(38,0)) * CAST(n_pos AS DECIMAL(38,0))
            |     * CAST(n_neg AS DECIMAL(38,0))) AS BIGINT)""".stripMargin))
      .select(
        col("n_pos"), col("n_neg"), col("u2x"), col("auc6"),
        (lit(2L) * col("auc6") - 1000000L).as("gini6"))
  }

  /** Youden-J optimal threshold (Youden 1950) with the confusion
    * matrix and signed MCC² at the optimum — the operating-point
    * chooser that turns a scored detector into a GATE: over every
    * distinct score threshold (predict positive when score ≥ thr),
    * maximize J = TPR − FPR; ties prefer the LARGEST threshold (the
    * conservative gate). [[rocAuc]] says whether the score ranks;
    * this says where to cut it.
    *
    * Exactness — the rocAuc count-table chassis read from the top:
    * per distinct score, cumulative tp/fp come from
    * [[Relational.globalCumSum]] under the DESCENDING score order
    * (distributed, never a single-task window); tpr6/fpr6 are one
    * truncating division each, j6 = tpr6 − fpr6; the argmax is a
    * distributed TakeOrdered(1). Matthews correlation at the chosen
    * threshold is emitted as its SIGNED SQUARE (the kendallTauB
    * no-sqrt rule): mcc2s6 = sign(d)·1e6·d² div Π(margins) with
    * d = tp·tn − fp·fn, DECIMAL(38,0) cross-products (d² reaches
    * n⁴), any zero margin → 0. Single-class input fails fast (the
    * rocAuc contract). Returns one row (thr, n_pos, n_neg, tp, fp,
    * j6, mcc2s6).
    */
  def youdenThreshold(df: DataFrame, labelCol: Column, scoreCol: Column): DataFrame = {
    val vs = df
      .filter(labelCol.isNotNull && scoreCol.isNotNull)
      .groupBy(scoreCol.cast("long").as("v"))
      .agg(
        count(lit(1)).as("t"),
        sum(when(labelCol.cast("boolean"), 1L).otherwise(0L)).as("np_v"))
    val totals = broadcast(
      vs.agg(
        sum(col("np_v")).as("__np"),
        sum(col("t") - col("np_v")).as("__nn")))
    val checked = vs
      .crossJoin(totals)
      .filter(
        assert_true(
          col("__np") > 0L && col("__nn") > 0L,
          concat(
            lit("youdenThreshold: both classes required (n_pos="),
            col("__np").cast("string"),
            lit(", n_neg="),
            col("__nn").cast("string"),
            lit(")"))).isNull)
      .select(
        col("v"), col("np_v"), (col("t") - col("np_v")).as("nn_v"),
        col("__np"), col("__nn"))
    // cumulative tp/fp scanning thresholds from the TOP score down
    val cum = Relational
      .globalCumSum(
        Relational.globalCumSum(checked, Seq(col("v").desc), "np_v", "__tpx"),
        Seq(col("v").desc), "nn_v", "__fpx")
      .withColumn("tp", col("__tpx") + col("np_v"))
      .withColumn("fp", col("__fpx") + col("nn_v"))
      .withColumn("__j6", expr(
        "CAST((CAST(1000000 AS DECIMAL(38,0)) * tp) div __np AS BIGINT) - CAST((CAST(1000000 AS DECIMAL(38,0)) * fp) div __nn AS BIGINT)"))
    cum
      .orderBy(col("__j6").desc, col("v").desc)
      .limit(1)
      .withColumn(
        "__d",
        expr(
          """CAST(tp AS DECIMAL(38,0)) * (__nn - fp)
            |- CAST(fp AS DECIMAL(38,0)) * (__np - tp)""".stripMargin))
      .withColumn(
        "mcc2s6",
        expr(
          """CASE WHEN tp + fp = 0 OR tp + (__np - tp) = 0
            |  OR (__nn - fp) + fp = 0 OR __np + __nn - tp - fp = 0
            |  OR (CAST(tp + fp AS DECIMAL(38,0)) * __np * __nn
            |      * CAST(__np + __nn - tp - fp AS DECIMAL(38,0))) = 0
            |THEN CAST(0 AS BIGINT)
            |ELSE CAST(
            |  (CASE WHEN __d >= 0 THEN 1 ELSE -1 END)
            |  * ((CAST(1000000 AS DECIMAL(38,0)) * __d * __d)
            |     div (CAST(tp + fp AS DECIMAL(38,0))
            |          * CAST(__np AS DECIMAL(38,0))
            |          * CAST(__nn AS DECIMAL(38,0))
            |          * CAST(__np + __nn - tp - fp AS DECIMAL(38,0))))
            |AS BIGINT) END""".stripMargin))
      .select(
        col("v").as("thr"),
        col("__np").as("n_pos"),
        col("__nn").as("n_neg"),
        col("tp"), col("fp"),
        col("__j6").as("j6"),
        col("mcc2s6"))
  }

  /** Gains / lift table at k score-rank quantiles — the campaign-
    * targeting readout ("how concentrated are the positives in the
    * top deciles of the score"): units rank by (score desc, tie),
    * slice into k equal-population buckets, and each bucket reports
    * its positive rate against the base rate plus the cumulative
    * gain curve.
    *
    * Exactness: ranks from [[Relational.globalRank]]'s range-
    * partitioned total order (`tieCol` must make the order TOTAL —
    * ties across a bucket boundary would otherwise land
    * engine-dependently); decile = ((rank−1)·k) div n + 1;
    * lift6 = (1e6·x_d·N) div (n_d·X) is ONE division of exact
    * cross-products, cum_gain6 = 1e6·cumX div X over the k-bounded
    * grid. Returns (bucket, n, x, rate6, lift6, cum_gain6), k rows.
    */
  def gainsTable(
      df: DataFrame,
      labelCol: Column,
      scoreCol: Column,
      tieCol: Column,
      k: Int): DataFrame = {
    require(k >= 1 && k <= 1000, "k must be in 1..1000")
    val in = df
      .filter(labelCol.isNotNull && scoreCol.isNotNull)
      .select(
        scoreCol.cast("long").as("__v"),
        tieCol.as("__t"),
        when(labelCol.cast("boolean"), 1L).otherwise(0L).as("__y"))
    val ranked = Relational
      .globalRank(in, Seq(col("__v").desc, col("__t")), "__rank")
    val tot = broadcast(
      in.agg(count(lit(1)).as("__n"), sum(col("__y")).as("__x")))
    val buckets = ranked
      .crossJoin(tot)
      .withColumn("bucket", expr(s"((__rank - 1) * $k) div __n + 1"))
      .groupBy(col("bucket"), col("__n"), col("__x"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("x"))
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    buckets
      .withColumn("__cumx", sum(col("x")).over(w))
      .select(
        col("bucket"),
        col("n"),
        col("x"),
        expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * x) div n AS BIGINT)").as("rate6"),
        expr(
          """CASE WHEN __x = 0 THEN CAST(0 AS BIGINT)
            |ELSE CAST((CAST(1000000 AS DECIMAL(38,0)) * x * __n)
            |div (CAST(n AS DECIMAL(38,0)) * __x) AS BIGINT) END""".stripMargin)
          .as("lift6"),
        expr(
          """CASE WHEN __x = 0 THEN CAST(0 AS BIGINT)
            |ELSE CAST((CAST(1000000 AS DECIMAL(38,0)) * __cumx) div __x AS BIGINT) END""".stripMargin)
          .as("cum_gain6"))
      .orderBy(col("bucket"))
  }

  /** Split-conformal threshold + holdout coverage (Vovk et al. 2005;
    * the Lei et al. 2018 split recipe) — the distribution-free
    * guarantee layer over any score: the calibration set's
    * ⌈(n+1)(1−α)⌉-th smallest nonconformity score is the threshold
    * q̂ below which a FRESH exchangeable point falls with probability
    * ≥ 1−α, no model assumptions. The audit half then measures the
    * guarantee empirically: holdout coverage should sit at or above
    * the target.
    *
    * Exactness: the rank is exact integer ceiling arithmetic —
    * r = min(n, ((n+1)·(1e6−alpha6) + 999999) div 1e6) — and q̂ is
    * the value at rank r under [[Relational.globalRank]] (the
    * tie-permutation-invariant order-statistic probe); coverage6 is
    * one truncating division off exact counts. Returns one row
    * (n_cal, rank, qhat, n_holdout, covered, coverage6, target6).
    */
  def conformalThreshold(
      cal: DataFrame,
      holdout: DataFrame,
      scoreCol: Column,
      alpha6: Long): DataFrame = {
    require(alpha6 > 0L && alpha6 < 1000000L, "alpha6 must be in (0, 1e6)")
    val calV = cal.filter(scoreCol.isNotNull).select(scoreCol.cast("long").as("__v"))
    val n = calV.count()
    require(n >= 1L, "conformalThreshold: calibration set must be non-empty")
    val r = math.min(n, ((n + 1L) * (1000000L - alpha6) + 999999L) / 1000000L)
    val qhatRow = Relational
      .globalRank(calV, Seq(col("__v")), "__rank")
      .filter(col("__rank") === r)
    holdout
      .filter(scoreCol.isNotNull)
      .select(scoreCol.cast("long").as("__h"))
      .crossJoin(broadcast(qhatRow.select(col("__v").as("qhat"))))
      .groupBy(col("qhat"))
      .agg(
        count(lit(1)).as("n_holdout"),
        sum(when(col("__h") <= col("qhat"), 1L).otherwise(0L)).as("covered"))
      .select(
        lit(n).as("n_cal"),
        lit(r).as("rank"),
        col("qhat"),
        col("n_holdout"),
        col("covered"),
        expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * covered) div n_holdout AS BIGINT)").as("coverage6"),
        lit(1000000L - alpha6).as("target6"))
  }

  /** Mondrian (group-conditional) split-conformal thresholds — the
    * fairness-grade upgrade of [[conformalThreshold]]: one global
    * threshold guarantees coverage ON AVERAGE, which lets easy groups
    * subsidize hard ones (English covered at 95%, Thai at 60%);
    * Mondrian calibrates PER GROUP, so each group gets its own
    * ⌈(n_g+1)(1−α)⌉-th order statistic and its own audit.
    *
    * Scale shape — per-group order statistics WITHOUT per-group
    * sorts: calibration scores collapse to the (group, value) count
    * grid (bounded by group × value DOMAIN, never rows), cumulative
    * counts run in a window PARTITIONED BY GROUP over that bounded
    * grid, and q̂_g is the smallest value whose cumulative count
    * reaches the exact integer rank — so a group with 1e9 rows costs
    * one hash aggregate, not a single-task sort. Coverage audits per
    * group on the holdout with one truncating division. Returns one
    * row per group present in BOTH halves (g, n_cal, rank, qhat,
    * n_holdout, covered, coverage6, target6).
    */
  def mondrianConformal(
      cal: DataFrame,
      holdout: DataFrame,
      groupCol: Column,
      scoreCol: Column,
      alpha6: Long): DataFrame = {
    require(alpha6 > 0L && alpha6 < 1000000L, "alpha6 must be in (0, 1e6)")
    val grid = cal
      .filter(groupCol.isNotNull && scoreCol.isNotNull)
      .groupBy(groupCol.as("g"), scoreCol.cast("long").as("__v"))
      .agg(count(lit(1)).as("__c"))
    val nG = grid.groupBy(col("g")).agg(sum(col("__c")).as("n_cal"))
      .withColumn(
        "rank",
        expr(s"least(n_cal, ((n_cal + 1) * ${1000000L - alpha6} + 999999) div 1000000)"))
    val w = Window.partitionBy(col("g")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val qhat = grid
      .withColumn("__cum", sum(col("__c")).over(w))
      .join(nG, Seq("g"))
      .filter(col("__cum") >= col("rank"))
      .groupBy(col("g"), col("n_cal"), col("rank"))
      .agg(min(col("__v")).as("qhat"))
    holdout
      .filter(groupCol.isNotNull && scoreCol.isNotNull)
      .select(groupCol.as("g"), scoreCol.cast("long").as("__h"))
      .join(qhat, Seq("g"))
      .groupBy(col("g"), col("n_cal"), col("rank"), col("qhat"))
      .agg(
        count(lit(1)).as("n_holdout"),
        sum(when(col("__h") <= col("qhat"), 1L).otherwise(0L)).as("covered"))
      .select(
        col("g"), col("n_cal"), col("rank"), col("qhat"),
        col("n_holdout"), col("covered"),
        expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * covered) div n_holdout AS BIGINT)").as("coverage6"),
        lit(1000000L - alpha6).as("target6"))
  }

  /** Qini curve (Radcliffe 2007) — the UPLIFT sibling of
    * [[gainsTable]]: when units split into TREATED and CONTROL, the
    * question is not "where are the positives" but "where did the
    * treatment CAUSE positives" — gains credits a score for finding
    * would-buy-anyway users; Qini subtracts the control baseline at
    * every depth:
    *
    *   Q(k) = X_t(k) − X_c(k)·N_t(k)/N_c(k)   (cumulative to
    *   bucket k; the curve a random score walks at 0)
    *
    * Exactness: one global (score desc, tie) rank ([[Relational
    * .globalRank]]), k equal-population buckets, cumulative counts
    * over the k-bounded grid; qini6 = 1e6·X_t − (1e6·X_c·N_t) div
    * N_c is one truncating DECIMAL division per bucket (no control
    * yet → the uncorrected 1e6·X_t, documented), and the per-bucket
    * uplift6 is the two-rate difference off exact counts. `tieCol`
    * totality is the determinism contract (the gainsTable rule).
    * Returns (bucket, n_t, x_t, n_c, x_c, uplift6, qini6), k rows.
    */
  def qiniCurve(
      df: DataFrame,
      treatCol: Column,
      outcomeCol: Column,
      scoreCol: Column,
      tieCol: Column,
      k: Int): DataFrame = {
    require(k >= 1 && k <= 1000, "k must be in 1..1000")
    val in = df
      .filter(treatCol.isNotNull && outcomeCol.isNotNull && scoreCol.isNotNull)
      .select(
        scoreCol.cast("long").as("__v"),
        tieCol.as("__t"),
        when(treatCol.cast("boolean"), 1L).otherwise(0L).as("__tr"),
        when(outcomeCol.cast("boolean"), 1L).otherwise(0L).as("__y"))
    val ranked = Relational
      .globalRank(in, Seq(col("__v").desc, col("__t")), "__rank")
    val n = in.count()
    val buckets = ranked
      .withColumn("bucket", expr(s"((__rank - 1) * $k) div $n + 1"))
      .groupBy(col("bucket"))
      .agg(
        sum(col("__tr")).as("n_t"),
        sum(col("__tr") * col("__y")).as("x_t"),
        sum(lit(1L) - col("__tr")).as("n_c"),
        sum((lit(1L) - col("__tr")) * col("__y")).as("x_c"))
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    buckets
      .withColumn("__cnt", sum(col("n_t")).over(w))
      .withColumn("__cxt", sum(col("x_t")).over(w))
      .withColumn("__cnc", sum(col("n_c")).over(w))
      .withColumn("__cxc", sum(col("x_c")).over(w))
      .select(
        col("bucket"), col("n_t"), col("x_t"), col("n_c"), col("x_c"),
        expr(
          """CASE WHEN n_t = 0 OR n_c = 0 THEN CAST(0 AS BIGINT)
            |ELSE CAST((CAST(1000000 AS DECIMAL(38,0)) * x_t) div n_t - (CAST(1000000 AS DECIMAL(38,0)) * x_c) div n_c
            |AS BIGINT) END""".stripMargin).as("uplift6"),
        expr(
          """CASE WHEN __cnc = 0 THEN CAST(1000000 * __cxt AS BIGINT)
            |ELSE CAST(CAST(1000000 AS DECIMAL(38,0)) * __cxt
            |  - (CAST(1000000 AS DECIMAL(38,0)) * __cxc * __cnt)
            |    div CAST(__cnc AS DECIMAL(38,0))
            |AS BIGINT) END""".stripMargin).as("qini6"))
      .orderBy(col("bucket"))
  }

  /** Reliability table for a micro-scaled probability score (the
    * binned calibration diagram of Guo et al., "On Calibration of
    * Modern Neural Networks", ICML 2017): equal-width bins over
    * score6 ∈ [0, 1e6], each bin reporting mean CONFIDENCE (what the
    * score claimed) against observed ACCURACY (what the labels did).
    * The per-bin sums are chosen so [[calibrationSummary]] derives
    * ECE and the Brier score from this table alone — the bin grid is
    * the sufficient statistic, one corpus scan total.
    *
    * Exactness: bin = min(bins−1, score6·bins div 1e6) — the top
    * edge closes the last bin. conf6 = Σscore6 div n and
    * acc6 = 1e6·x div n are one truncating division each off exact
    * integer sums; gap6 = |acc6 − conf6|. Out-of-range scores fail
    * fast in-plan (a "probability" outside [0,1] is a caller bug,
    * not a bin). s2sum (Σ score6², DECIMAL — 1e12 per row) and
    * sysum (Σ score6·y) ride along for the Brier identity.
    *
    * Scale shape: one hash aggregate to ≤ `bins` cells; everything
    * downstream is bin-bounded. Returns (bin, n, x, conf6, acc6,
    * gap6, s2sum, sysum) ordered by bin, observed bins only.
    */
  def calibrationBins(
      df: DataFrame,
      labelCol: Column,
      score6Col: Column,
      bins: Int): DataFrame =
    calibrationBinsFromCells(calibrationCells(df, labelCol, score6Col, bins))

  /** The MERGEABLE half of [[calibrationBins]]: per-bin sufficient
    * statistics (bin, n, x, ssum, s2sum, sysum) — all linear, so
    * partial grids from independent slices (micro-batches, shards,
    * days) SUM-merge exactly and [[calibrationBinsFromCells]] over
    * the merged grid is bit-equal to a single-pass computation: the
    * st_kruskal sufficient-statistic posture applied to calibration
    * monitoring. One corpus scan, ≤ `bins` output rows.
    */
  def calibrationCells(
      df: DataFrame,
      labelCol: Column,
      score6Col: Column,
      bins: Int): DataFrame = {
    require(bins >= 1 && bins <= 1000,
      s"calibrationBins: 1..1000 bins supported, got $bins")
    val s6 = score6Col.cast("long")
    df
      .filter(labelCol.isNotNull && s6.isNotNull)
      .filter(
        assert_true(
          s6 >= 0L && s6 <= 1000000L,
          concat(
            lit("calibrationBins: score6 outside [0, 1e6]: "),
            s6.cast("string"))).isNull)
      .select(
        s6.as("__s6"),
        when(labelCol.cast("boolean"), 1L).otherwise(0L).as("__y"))
      .select(
        least(lit(bins - 1L), expr(s"(__s6 * $bins) div 1000000")).as("bin"),
        col("__s6"),
        col("__y"))
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("__y")).as("x"),
        // score sums reach 1e6·N — DECIMAL keeps every linear stat
        // exact past the ~9e12-row BIGINT wrap (family-wide sum
        // discipline; the readout casts stay BIGINT)
        sum(col("__s6").cast("decimal(38,0)")).as("ssum"),
        sum(col("__s6").cast("decimal(38,0)") * col("__s6").cast("decimal(38,0)"))
          .cast("decimal(38,0)").as("s2sum"),
        sum(col("__s6").cast("decimal(38,0)") * col("__y")).as("sysum"))
  }

  /** Derive the reliability table from a (possibly merged) cell grid
    * — the rounding (one truncating division per bin for conf6/acc6)
    * happens HERE, after the merge, so partial grids stay exact.
    */
  def calibrationBinsFromCells(cells: DataFrame): DataFrame =
    cells
      .groupBy(col("bin"))
      .agg(
        sum(col("n")).as("n"),
        sum(col("x")).as("x"),
        sum(col("ssum")).as("__ssum"),
        sum(col("s2sum")).cast("decimal(38,0)").as("s2sum"),
        sum(col("sysum")).as("sysum"))
      .select(
        col("bin"),
        col("n"),
        col("x"),
        expr("__ssum div n").as("conf6"),
        expr("(CAST(1000000 AS DECIMAL(38,0)) * x) div n").as("acc6"),
        expr("abs((CAST(1000000 AS DECIMAL(38,0)) * x) div n - __ssum div n)").as("gap6"),
        col("s2sum"),
        col("sysum"))
      .orderBy(col("bin"))

  /** Isotonic calibration map (pool-adjacent-violators; Ayer et al.
    * 1955, the Zadrozny & Elkan 2002 recalibration recipe) over the
    * [[calibrationBins]] grid — the FIX for what ECE diagnoses: the
    * best MONOTONE mapping from score bin to observed rate, the
    * lookup table a serving layer applies to turn a miscalibrated
    * score into a probability.
    *
    * Computed via the minimax identity instead of the sequential
    * stack: iso(i) = max_{j≤i} min_{l≥i} avg(x over bins j..l) —
    * equivalent to PAV and, unlike the stack, pure joins. The grid
    * is bin-bounded (≤ `bins` rows upstream), so the interval
    * enumeration is O(B³) rows of BOUNDED size — the documented
    * bounded-BNLJ class, never corpus-proportional. Exactness: each
    * interval average rounds ONCE (avg6 = 1e6·Σx div Σn, exact
    * integer sums), and the minimax over already-rounded micro
    * integers is order-free — bit-identical on both engines.
    * Returns (bin, n, x, acc6, iso6), iso6 non-decreasing.
    */
  def isotonicCalibration(binGrid: DataFrame): DataFrame = {
    val bins = binGrid.select(col("bin"), col("n"), col("x"))
    val b1 = bins.select(col("bin").as("j"), col("n").as("nj"), col("x").as("xj"))
    val b2 = bins.select(col("bin").as("l"))
    // interval (j..l) averages off exact prefix-free sums: join the
    // grid to itself (bounded), aggregate the member bins
    val intervals = b1
      .crossJoin(b2)
      .filter(col("j") <= col("l"))
      .join(
        bins.select(col("bin").as("m"), col("n").as("nm"), col("x").as("xm")),
        col("m") >= col("j") && col("m") <= col("l"))
      .groupBy(col("j"), col("l"))
      .agg(sum(col("nm")).as("sn"), sum(col("xm")).as("sx"))
      .select(
        col("j"), col("l"),
        expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * sx) div sn AS BIGINT)").as("avg6"))
    val iGrid = bins.select(col("bin").as("i"))
    val minOverL = intervals
      .join(iGrid, col("i") >= col("j") && col("i") <= col("l"))
      .groupBy(col("j"), col("i"))
      .agg(min(col("avg6")).as("__m"))
    val iso = minOverL
      .groupBy(col("i").as("bin"))
      .agg(max(col("__m")).as("iso6"))
    binGrid
      .select(col("bin"), col("n"), col("x"), col("acc6"))
      .join(iso, Seq("bin"))
      .orderBy(col("bin"))
  }

  /** Murphy (1973) decomposition of the Brier score off the
    * [[calibrationBins]] grid — WHY is the score what it is:
    *
    *   REL (reliability, lower better)  = Σ n_b·(conf6−acc6)²  / N
    *   RES (resolution, higher better)  = Σ n_b·(acc6−base6)² / N
    *   UNC (uncertainty, data-fixed)    = base6·(1e6−base6)
    *
    * with base6 the overall positive rate; Brier ≈ REL − RES + UNC
    * (exact in the binned limit — binning and per-bin micro rounding
    * make the identity approximate, documented). A score can have a
    * fine Brier by being uninformative (RES ≈ 0) — this readout
    * separates "calibrated" from "useful". All pico-scaled exact
    * integer cross-products off the bin sums, one truncating
    * division each. Returns (n, base6, rel12, res12, unc12).
    */
  def brierDecomposition(binGrid: DataFrame): DataFrame = {
    val base = broadcast(
      binGrid.agg(
        sum(col("n")).as("__nt"),
        sum(col("x")).as("__xt"))
        .withColumn("__base6", expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * __xt) div __nt AS BIGINT)")))
    binGrid
      .crossJoin(base)
      .groupBy(col("__nt"), col("__base6"))
      .agg(
        sum(expr(
          """CAST(n AS DECIMAL(38,0)) * (conf6 - acc6) * (conf6 - acc6)"""))
          .cast("decimal(38,0)").as("__rel"),
        sum(expr(
          """CAST(n AS DECIMAL(38,0)) * (acc6 - __base6) * (acc6 - __base6)"""))
          .cast("decimal(38,0)").as("__res"))
      .select(
        col("__nt").as("n"),
        col("__base6").as("base6"),
        expr("CAST(__rel div __nt AS BIGINT)").as("rel12"),
        expr("CAST(__res div __nt AS BIGINT)").as("res12"),
        expr("CAST(__base6 * (1000000 - __base6) AS BIGINT)").as("unc12"))
  }

  /** One-row calibration summary off the [[calibrationBins]] grid —
    * no second corpus scan:
    *
    *   ece6    = Σ_bins n_b · gap6_b div N
    *             (expected calibration error, micro-scaled — the
    *             traffic-weighted mean confidence/accuracy gap)
    *   brier12 = Σ (score6 − 1e6·y)² div N
    *           = (Σs² − 2e6·Σsy + 1e12·Σy) div N
    *             (pico-scaled mean squared error of the probability —
    *             the identity expands the square so the bin sums are
    *             the sufficient statistic; 0 = oracle, 2.5e11 = the
    *             constant-half no-skill score against a balanced
    *             label)
    *
    * Exactness: both are one truncating division off exact integer
    * sums (gap6 already carries its per-bin rounding — documented
    * per-term discipline, mirrored by the oracle). Returns
    * (n, ece6, brier12).
    */
  def calibrationSummary(binGrid: DataFrame): DataFrame =
    binGrid
      .agg(
        sum(col("n")).as("n"),
        // n·gap6 ≤ 1e6·N — DECIMAL keeps the weighted-gap sum exact
        // past ~9e12 total rows (the family-wide wrap discipline)
        sum(col("n").cast("decimal(38,0)") * col("gap6")).as("__wgap"),
        sum(col("s2sum")).as("__s2"),
        sum(col("sysum").cast("decimal(38,0)")).as("__sy"),
        sum(col("x")).as("__x"))
      .select(
        col("n"),
        expr("__wgap div n").as("ece6"),
        expr(
          """CAST((__s2 - CAST(2000000 AS DECIMAL(38,0)) * __sy
            |       + CAST(1000000 AS DECIMAL(38,0))
            |         * CAST(1000000 AS DECIMAL(38,0)) * CAST(__x AS DECIMAL(38,0)))
            |div CAST(n AS DECIMAL(38,0)) AS BIGINT)""".stripMargin).as("brier12"))
}
