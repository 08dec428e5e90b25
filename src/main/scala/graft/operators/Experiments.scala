package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** A/B-experimentation statistics — the measurement layer a data
  * pipeline runs AFTER shipping a change (a new dedup threshold, a
  * re-ranked feed, a quality-gate tweak): did the treated population
  * actually move, and by how much once the pre-period is controlled
  * for? Reference analogue: the reference's dashboards report raw
  * per-segment rates (`/root/reference/src/api.py:323-368`); these
  * operators add the significance discipline those comparisons lack.
  *
  * Exactness contract (the chi²/entropy-family discipline of
  * [[Checks.chiSquareIndependence]]): every statistic is a ratio of
  * exact integer cross-products, carried in DECIMAL(38,0) where a
  * BIGINT would overflow, with ONE truncating division at the end —
  * bit-identical on any partitioning, mirrored verbatim by the
  * DuckDB oracle. No variance is ever computed by summing floats.
  */
object Experiments {

  /** Persist a BOUNDED first-aggregate table (cells / grids — sized
    * by category products, never the corpus) so its one corpus-scan
    * aggregate feeds every downstream consumer from cache instead of
    * re-running per consumer: Catalyst's exchange reuse only dedupes
    * byte-identical subtrees, and the min/max-pivot consumers differ
    * enough that an unpersisted cell table re-scans the fact table
    * once per arm.
    *
    * LIFETIME CONTRACT: the returned plan is lazy, so the operator
    * cannot unpersist before its caller materializes the result —
    * the cache lives until the CALLER releases it. The Verify/Bench
    * harnesses clear caches between queries (`spark.catalog
    * .clearCache()` + unpersist of lingering RDDs — the pair-pipeline
    * discipline, pinned by ExperimentsSpec); a long-lived production
    * session running many tests must do the same, or each test
    * session accumulates one category-bounded cell table (small, but
    * N of them add up).
    */
  private def cached(df: DataFrame): DataFrame =
    df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** z²·1e6 significance threshold for alpha = 0.05 two-sided:
    * 1.96² = 3.8415 (the chi²₁ 95th percentile, micro-scaled).
    * A LITERAL, not computed at runtime — the mmrRerank lambda rule.
    */
  val Z2Alpha05Micro: Long = 3841459L

  /** chi²₉₅ percentile literals (micro-scaled) for dof 1..10 —
    * R `qchisq(0.95, k)`, literal per the no-runtime-special-functions
    * rule. [[srmCheck]] indexes this by k−1 variants.
    */
  val Chi2Alpha05Micro: Seq[Long] = Seq(
    3841459L, 5991465L, 7814728L, 9487729L, 11070498L,
    12591587L, 14067140L, 15507313L, 16918978L, 18307038L)

  /** Sample-ratio-mismatch gate (the FIRST check any experiment
    * readout must pass — Fabijan et al., "Diagnosing Sample Ratio
    * Mismatch", KDD 2019): does each group's observed variant split
    * match the DESIGNED allocation? A mismatch means broken
    * randomization or differential logging loss, and every downstream
    * statistic on that group is garbage. chi² goodness-of-fit against
    * integer design weights:
    *
    *   term6(v) = 1e6 · (n_v·W − N·w_v)² div (N·w_v·W),  chi²6 = Σ_v
    *
    * with W = Σw — per-cell truncating division then exact sum, the
    * [[Checks.chiSquareIndependence]] convention. Significance
    * compares chi²6 against the dof = k−1 entry of
    * [[Chi2Alpha05Micro]] (k ≤ 11 enforced by a driver-side require —
    * the weights map IS the bound, no data-dependent dof).
    *
    * Contract: `weights` is the complete design — a variant observed
    * in the data but absent from the map FAILS FAST in-plan (that is
    * itself an SRM-class bug: traffic landing in an arm the design
    * doesn't know); a designed variant with zero observed traffic
    * contributes its full expected-count term (the weights table is
    * the join spine, observed counts fill 0).
    *
    * Scale shape: one hash aggregate to (group, variant) cells, then
    * a broadcast join against the literal weights table; chi² is a
    * per-group sum over ≤ k cells. Returns (group, n, k, chi2_6,
    * significant), one row per group with any observed traffic.
    */
  def srmCheck(
      df: DataFrame,
      groupCol: Column,
      variantCol: Column,
      weights: Map[String, Long]): DataFrame = {
    require(weights.nonEmpty && weights.size <= 11,
      s"srmCheck: 1..11 designed variants supported (dof table), got ${weights.size}")
    require(weights.values.forall(_ > 0L),
      "srmCheck: design weights must be positive integers")
    val spark = df.sparkSession
    import spark.implicits._
    val wSum = weights.values.sum
    val dof = weights.size - 1
    val thr = if (dof == 0) Long.MaxValue else Chi2Alpha05Micro(dof - 1)
    val wDf = weights.toSeq.toDF("v", "w")
    val cells = df
      .filter(groupCol.isNotNull && variantCol.isNotNull)
      .groupBy(groupCol.as("g"), variantCol.as("v"))
      .agg(count(lit(1)).as("n_v"))
    // fail fast on off-design variants BEFORE pivoting to the spine
    val checked = cached(
      cells
        .join(broadcast(wDf), Seq("v"), "left")
        .filter(
          assert_true(
            col("w").isNotNull,
            concat(
              lit("srmCheck: observed variant outside the designed allocation: "),
              col("v").cast("string"))).isNull))
    val totals = checked.groupBy(col("g"))
      .agg(sum(col("n_v")).as("N"))
    totals
      .crossJoin(broadcast(wDf))
      .join(checked.select(col("g"), col("v"), col("n_v")), Seq("g", "v"), "left")
      .na.fill(0L, Seq("n_v"))
      .withColumn(
        "__term6",
        expr(
          s"""CAST(
             |  (CAST(1000000 AS DECIMAL(38,0))
             |   * CAST(n_v * $wSum - N * w AS DECIMAL(38,0))
             |   * CAST(n_v * $wSum - N * w AS DECIMAL(38,0)))
             |  div (CAST(N AS DECIMAL(38,0)) * CAST(w AS DECIMAL(38,0))
             |       * CAST($wSum AS DECIMAL(38,0)))
             |AS BIGINT)""".stripMargin))
      .groupBy(col("g"))
      .agg(max(col("N")).as("n"), count(lit(1)).as("k"), sum(col("__term6")).as("chi2_6"))
      .select(
        col("g").as("group"), col("n"), col("k"), col("chi2_6"),
        (col("chi2_6") >= thr).as("significant"))
  }

  /** Two-proportion z-test per group (the textbook A/B conversion
    * gate): for each group, compare the success rate of the
    * lexicographically FIRST variant (a) against the second (b).
    * z = (p_a − p_b) / sqrt(p̂(1−p̂)(1/n_a + 1/n_b)) with pooled p̂;
    * the operator reports z² in micro-units, exactly:
    *
    *   z²·1e6 = 1e6 · (x_a·n_b − x_b·n_a)² · N div (n_a·n_b·X·(N−X))
    *
    * with N = n_a+n_b, X = x_a+x_b — all integer cross-products in
    * DECIMAL(38,0) (the numerator reaches n⁵; BIGINT dies past
    * N ≈ 7k), one truncating division. `significant` compares z²6
    * against the micro-scaled chi²₁ 95th-percentile literal — an
    * integer compare, no sqrt anywhere.
    *
    * Conventions: groups are keyed by `groupCol`; a group must carry
    * EXACTLY two distinct variants or it is dropped (a one-armed or
    * many-armed "experiment" is a design error, not a z-test); a
    * degenerate pooled rate (X = 0 or X = N — nobody or everybody
    * converted) yields z²6 = 0, not-significant, by convention
    * (the statistic's denominator is 0; there is no evidence of a
    * difference when both arms are constant).
    *
    * Scale shape: one hash aggregate to (group, variant) cells —
    * map-side combined, never a shuffle of raw rows — then a pivot
    * over the 2-variant axis via min/max-keyed conditional sums on
    * the CELL table. Returns (group, variant_a, variant_b, n_a, x_a,
    * n_b, x_b, z2_6, significant).
    */
  def twoProportionZ(
      df: DataFrame,
      groupCol: Column,
      variantCol: Column,
      successCol: Column): DataFrame =
    twoProportionZFromCells(
      df
        .filter(groupCol.isNotNull && variantCol.isNotNull && successCol.isNotNull)
        .groupBy(groupCol.as("g"), variantCol.as("v"))
        .agg(
          count(lit(1)).as("n"),
          sum(successCol.cast("long")).as("x")))

  /** [[twoProportionZ]] off a PRE-AGGREGATED cell table (g, v, n, x)
    * — the always-on experiment-monitor entry point: cells are linear
    * (SUM-mergeable, no state store), so a live intake appends
    * per-micro-batch partial cells to a persisted artifact and the
    * monitor scores the sum-merge, exactly the
    * [[graft.operators.Checks]] volume-gate / CMS artifact-is-the-
    * state discipline. Callers merging partials must sum n and x per
    * (g, v) before calling; the statistic then equals the one-shot
    * batch test bit-for-bit (the counts ARE the sufficient
    * statistic).
    */
  def twoProportionZFromCells(cellsIn: DataFrame): DataFrame = {
    val cells = cached(cellsIn)
    // two-pass pivot over the tiny cell table: name the (min, max)
    // variant per group first, then join each arm's cell back on
    val mins = cells.groupBy(col("g"))
      .agg(
        count(lit(1)).as("__nv"),
        min(col("v")).as("variant_a"),
        max(col("v")).as("variant_b"))
      .filter(col("__nv") === 2L)
    mins
      .join(
        cells.select(col("g"), col("v").as("variant_a"), col("n").as("n_a"), col("x").as("x_a")),
        Seq("g", "variant_a"))
      .join(
        cells.select(col("g"), col("v").as("variant_b"), col("n").as("n_b"), col("x").as("x_b")),
        Seq("g", "variant_b"))
      .withColumn(
        "__d",
        expr(
          """CAST(x_a AS DECIMAL(38,0)) * CAST(n_b AS DECIMAL(38,0))
            |- CAST(x_b AS DECIMAL(38,0)) * CAST(n_a AS DECIMAL(38,0))""".stripMargin))
      .withColumn(
        "z2_6",
        expr(
          """CASE WHEN x_a + x_b = 0 OR x_a + x_b = n_a + n_b THEN CAST(0 AS BIGINT)
            |ELSE CAST(
            |  (CAST(1000000 AS DECIMAL(38,0)) * __d * __d
            |   * CAST(n_a + n_b AS DECIMAL(38,0)))
            |  div (CAST(n_a AS DECIMAL(38,0)) * CAST(n_b AS DECIMAL(38,0))
            |       * CAST(x_a + x_b AS DECIMAL(38,0))
            |       * CAST(n_a + n_b - x_a - x_b AS DECIMAL(38,0)))
            |AS BIGINT) END""".stripMargin))
      .select(
        col("g").as("group"),
        col("variant_a"),
        col("variant_b"),
        col("n_a"), col("x_a"), col("n_b"), col("x_b"),
        col("z2_6"),
        (col("z2_6") >= Z2Alpha05Micro).as("significant"))
  }

  /** Mann–Whitney U rank-sum test (Mann & Whitney 1947) — the
    * nonparametric two-sample location test: did the TREATED side's
    * value DISTRIBUTION shift, without assuming normality (the right
    * test for heavy-tailed metrics like revenue or latency, where a
    * t-test's mean is whale-dominated). The distribution-free
    * companion of [[Checks.ksDrift]]: KS asks "are the shapes
    * different anywhere", U asks "did one side stochastically
    * dominate".
    *
    * Exactness — ranks without floats: ties take MID-ranks, which are
    * half-integers, so all rank arithmetic is DOUBLED. For a distinct
    * value with min-rank r and tie-count t, each member's doubled
    * mid-rank is 2r + t − 1 (an integer). The doubled rank-sum of
    * side a gives the doubled U statistic 2U = R2_a − n_a(n_a+1),
    * and the tie-corrected z² in micro-units is exactly
    *
    *   z²·1e6 = 1e6 · 3 · (2U − n_a·n_b)² · n·(n−1)
    *            div (n_a·n_b·((n+1)·n·(n−1) − Σ(t³−t)))
    *
    * (the classic normal approximation with the tie term; all
    * cross-products in DECIMAL(38,0) — the numerator reaches n⁶ —
    * one truncating division). All-values-equal degenerates the
    * denominator to 0 → z²6 = 0 by convention. Valid range: the two
    * BIGINT-stage quantities are Σ(t³−t) (per-value tie count t³ —
    * quantize or dither a value with more than ~2e6 exact ties) and
    * n_a·n_b (sides up to ~3e9 rows each); everything past those
    * first multiplies is DECIMAL(38,0).
    *
    * Scale shape: values collapse to a per-side DISTINCT-VALUE count
    * table in one hash aggregate; min-ranks come from
    * [[Relational.globalCumSum]]'s range-partitioned distributed
    * prefix sum over the distinct-value table (bounded by the value
    * domain, never the corpus — and distributed even when that
    * domain is 1e7+ values, never a single-task window); the final
    * statistic is a 1-row aggregate. Sides are the
    * lexicographic (min, max) of `sideCol`; exactly two required,
    * enforced fail-fast.
    *
    * Returns one row (side_a, side_b, n_a, n_b, u2x — the DOUBLED U
    * of side a, z2_6, significant).
    */
  def mannWhitneyU(df: DataFrame, sideCol: Column, valueCol: Column): DataFrame = {
    // ONE corpus scan to the (side, value) count table — domain ×
    // 2 bounded; sides, tie counts and side-a membership all derive
    // from it (persisted: three consumers, zero re-scans)
    val vs = cached(
      df
        .filter(sideCol.isNotNull && valueCol.isNotNull)
        .groupBy(sideCol.as("s"), valueCol.cast("long").as("v"))
        .agg(count(lit(1)).as("c")))
    val sides = broadcast(
      vs.agg(
        count_distinct(col("s")).as("__ns"),
        min(col("s")).as("side_a"),
        max(col("s")).as("side_b")))
    val counts = vs
      .crossJoin(sides)
      .filter(
        assert_true(
          col("__ns") === 2L,
          concat(
            lit("mannWhitneyU: exactly 2 sides required, got "),
            col("__ns").cast("string"))).isNull)
      .groupBy(col("v"))
      .agg(
        sum(col("c")).as("t"),
        sum(when(col("s") === col("side_a"), col("c")).otherwise(0L)).as("na_v"))
    // min-rank = 1 + count of strictly-smaller values, via the
    // DISTRIBUTED prefix sum (range-partitioned sort + per-partition
    // fold) — never a single-task Window.orderBy: a cents-quantized
    // value domain at corpus scale is 1e7+ distinct values
    val ranked = Relational
      .globalCumSum(counts, Seq(col("v")), "t", "__below")
      .withColumn("rmin", col("__below") + 1L)
      .drop("__below")
    ranked
      .crossJoin(sides.select(col("side_a"), col("side_b")))
      .groupBy(col("side_a"), col("side_b"))
      .agg(
        sum(col("na_v")).as("n_a"),
        sum(col("t") - col("na_v")).as("n_b"),
        // doubled rank-sum and tie cubes in DECIMAL from the first
        // multiply — na_v·(2·rmin+t−1) ~ 2·N·na_v and t³ both pass
        // 2^63 well before the per-side row bound does (same
        // discipline as rocAucFromCells.__r2p)
        sum(
          col("na_v").cast("decimal(38,0)")
            * (lit(2L) * col("rmin") + col("t") - 1L)).as("__r2a"),
        sum(
          col("t").cast("decimal(38,0)") * col("t") * col("t") - col("t"))
          .as("__ties3"))
      .withColumn(
        "u2x",
        (col("__r2a") - col("n_a").cast("decimal(38,0)") * (col("n_a") + 1L))
          .cast("long"))
      // tie-corrected variance denominator in DECIMAL from the first
      // multiply — (n+1)·n·(n−1) passes 2^63 already at n ≈ 2e6
      .withColumn(
        "__den",
        expr(
          """CAST(n_a AS DECIMAL(38,0)) * CAST(n_b AS DECIMAL(38,0))
            |* (CAST(n_a + n_b + 1 AS DECIMAL(38,0))
            |   * CAST(n_a + n_b AS DECIMAL(38,0))
            |   * CAST(n_a + n_b - 1 AS DECIMAL(38,0))
            |   - CAST(__ties3 AS DECIMAL(38,0)))""".stripMargin))
      .withColumn(
        "z2_6",
        expr(
          """CASE WHEN __den <= 0 THEN CAST(0 AS BIGINT)
            |ELSE CAST(
            |  (CAST(3000000 AS DECIMAL(38,0))
            |   * (CAST(u2x AS DECIMAL(38,0)) - CAST(n_a AS DECIMAL(38,0)) * n_b)
            |   * (CAST(u2x AS DECIMAL(38,0)) - CAST(n_a AS DECIMAL(38,0)) * n_b)
            |   * CAST(n_a + n_b AS DECIMAL(38,0))
            |   * CAST(n_a + n_b - 1 AS DECIMAL(38,0)))
            |  div __den
            |AS BIGINT) END""".stripMargin))
      .select(
        col("side_a"), col("side_b"), col("n_a"), col("n_b"), col("u2x"),
        col("z2_6"),
        (col("z2_6") >= Z2Alpha05Micro).as("significant"))
  }

  /** CUPED variance reduction (Deng, Xu, Kohavi & Walker, WSDM 2013)
    * — adjust each unit's experiment metric by its PRE-period
    * covariate before testing: y' = y − θ(x − x̄) with
    * θ = cov(x,y)/var(x). Removes the between-user variance the
    * experiment didn't cause; the industry-standard sensitivity
    * boost (same mean, smaller variance → smaller detectable
    * effects at the same traffic).
    *
    * Exactness: θ in micro-units is one truncating division of exact
    * integer cross-products,
    *   θ6 = 1e6·(n·Σxy − Σx·Σy) div (n·Σx² − (Σx)²)
    * (DECIMAL(38,0); with cent-scaled inputs the cross-products
    * reach n·max² ≈ 1e23 at n = 1e6 users of 1e6-cent spend). The
    * per-unit adjustment keeps integers end-to-end:
    *   adj6 = 1e6·y − θ6·(n·x − Σx) div n
    * — ONE truncating division per row, off exact integers, so the
    * adjusted metric is bit-stable on any partitioning. var(x) = 0
    * (constant covariate) fails fast: CUPED on a constant is a
    * caller bug (θ undefined), not a 0-convention.
    *
    * Scale shape: one aggregate pass for the five sums (map-side
    * combined), broadcast as a 1-row bootstrap onto the per-unit
    * frame — no window, no second shuffle. Returns (key, metric,
    * covariate, theta6, adj6) per unit; `metric`/`covariate` echo
    * the integer inputs.
    */
  def cupedAdjust(
      df: DataFrame,
      keyCol: Column,
      metricCol: Column,
      covariateCol: Column): DataFrame = {
    val base = df
      .filter(keyCol.isNotNull && metricCol.isNotNull && covariateCol.isNotNull)
      .select(
        keyCol.as("key"),
        metricCol.cast("long").as("metric"),
        covariateCol.cast("long").as("covariate"))
    val stats = broadcast(
      base.agg(
        count(lit(1)).as("__n"),
        sum(col("covariate")).as("__sx"),
        sum(col("metric")).as("__sy"),
        // covariate moments in DECIMAL from the first multiply —
        // cent-class values square to ~1e14 per row, so the BIGINT
        // sum wraps at ~1e5 rows of whale covariates (the silent-wrap
        // class the r10 sweep is closing)
        sum(col("covariate").cast("decimal(38,0)") * col("covariate")).as("__sxx"),
        sum(col("covariate").cast("decimal(38,0)") * col("metric")).as("__sxy")))
    base
      .crossJoin(stats)
      .filter(
        assert_true(
          col("__n") * col("__sxx") - col("__sx").cast("decimal(38,0)") * col("__sx")
            =!= lit(0L).cast("decimal(38,0)"),
          lit("cupedAdjust: covariate is constant — var(x) = 0, theta undefined; " +
            "pick a covariate that varies")).isNull)
      .withColumn(
        "theta6",
        expr(
          """CAST(
            |  (CAST(1000000 AS DECIMAL(38,0))
            |   * CAST(__n * __sxy - __sx * __sy AS DECIMAL(38,0)))
            |  div CAST(__n * __sxx - __sx * __sx AS DECIMAL(38,0))
            |AS BIGINT)""".stripMargin))
      .withColumn(
        "adj6",
        expr(
          """CAST(1000000 AS BIGINT) * metric
            |- CAST(
            |    (CAST(theta6 AS DECIMAL(38,0))
            |     * CAST(__n * covariate - __sx AS DECIMAL(38,0)))
            |    div CAST(__n AS DECIMAL(38,0))
            |  AS BIGINT)""".stripMargin))
      .select(col("key"), col("metric"), col("covariate"), col("theta6"), col("adj6"))
  }

  /** Welch's unequal-variance t-test per group (Welch 1947) — the
    * continuous-metric sibling of [[twoProportionZ]]: did the mean of
    * an integer metric differ between the two variants, WITHOUT the
    * pooled-variance assumption (arms in real experiments rarely share
    * a variance; Student's pooled t is anti-conservative under
    * imbalance). t² = (ȳ_a − ȳ_b)² / (s²_a/n_a + s²_b/n_b).
    *
    * Exactness — two-stage micro pipeline (the [[cupedAdjust]]
    * theta6/adj6 discipline: each stage ONE truncating division off
    * exact integers, the stage boundary pinned at micro resolution so
    * the oracle can mirror it bit-for-bit):
    *
    *   stage 1 (per arm):  md6   = 1e6·(S_a·n_b − S_b·n_a) div (n_a·n_b)
    *                       von6_x = 1e6·Q_x div (n_x²·(n_x−1)),
    *                       Q_x = n_x·SS_x − S_x²   (var/n, micro)
    *   stage 2:            t2_6  = md6² div (von6_a + von6_b)
    *
    * All cross-products in DECIMAL(38,0); SS sums are DECIMAL from the
    * first multiply (Σy² passes BIGINT at ~3e18 — cent-scaled metrics
    * overflow a long sum past ~9e6 rows of 1e6-cent values).
    * Degenerate von6_a + von6_b = 0 (both arms constant at micro
    * resolution) → t2_6 = 0, not-significant, by the [[twoProportionZ]]
    * convention: with zero sampling variance there is nothing to test —
    * compare the two constants directly. Arms with n < 2 are dropped
    * with their group (a variance needs 2 observations).
    * `significant` compares against [[Z2Alpha05Micro]] — the normal
    * approximation of the t reference, valid for n ≳ 30 per arm
    * (below that the threshold is anti-conservative; Welch–
    * Satterthwaite fractional dof is deliberately out of scope —
    * no non-literal quantiles).
    *
    * Scale shape: one hash aggregate to (group, variant) moment cells
    * (n, S, SS — map-side combined), min/max variant pivot on the cell
    * table, pure projection after. Returns (group, variant_a,
    * variant_b, n_a, n_b, md6, t2_6, significant).
    */
  def welchT(
      df: DataFrame,
      groupCol: Column,
      variantCol: Column,
      metricCol: Column): DataFrame = {
    val cells = cached(
      df
        .filter(groupCol.isNotNull && variantCol.isNotNull && metricCol.isNotNull)
        .groupBy(groupCol.as("g"), variantCol.as("v"))
        .agg(
          count(lit(1)).as("n"),
          sum(metricCol.cast("long")).as("s"),
          sum(
            metricCol.cast("long").cast("decimal(38,0)")
              * metricCol.cast("long").cast("decimal(38,0)")).as("ss"))
        .filter(col("n") >= 2L))
    val mins = cells.groupBy(col("g"))
      .agg(
        count(lit(1)).as("__nv"),
        min(col("v")).as("variant_a"),
        max(col("v")).as("variant_b"))
      .filter(col("__nv") === 2L)
    mins
      .join(
        cells.select(
          col("g"), col("v").as("variant_a"),
          col("n").as("n_a"), col("s").as("s_a"), col("ss").as("ss_a")),
        Seq("g", "variant_a"))
      .join(
        cells.select(
          col("g"), col("v").as("variant_b"),
          col("n").as("n_b"), col("s").as("s_b"), col("ss").as("ss_b")),
        Seq("g", "variant_b"))
      .withColumn(
        "md6",
        expr(
          """CAST(
            |  (CAST(1000000 AS DECIMAL(38,0))
            |   * (CAST(s_a AS DECIMAL(38,0)) * CAST(n_b AS DECIMAL(38,0))
            |      - CAST(s_b AS DECIMAL(38,0)) * CAST(n_a AS DECIMAL(38,0))))
            |  div (CAST(n_a AS DECIMAL(38,0)) * CAST(n_b AS DECIMAL(38,0)))
            |AS BIGINT)""".stripMargin))
      .withColumn(
        "__von_a",
        expr(
          """CAST(
            |  (CAST(1000000 AS DECIMAL(38,0))
            |   * (CAST(n_a AS DECIMAL(38,0)) * ss_a
            |      - CAST(s_a AS DECIMAL(38,0)) * CAST(s_a AS DECIMAL(38,0))))
            |  div (CAST(n_a AS DECIMAL(38,0)) * CAST(n_a AS DECIMAL(38,0))
            |       * CAST(n_a - 1 AS DECIMAL(38,0)))
            |AS BIGINT)""".stripMargin))
      .withColumn(
        "__von_b",
        expr(
          """CAST(
            |  (CAST(1000000 AS DECIMAL(38,0))
            |   * (CAST(n_b AS DECIMAL(38,0)) * ss_b
            |      - CAST(s_b AS DECIMAL(38,0)) * CAST(s_b AS DECIMAL(38,0))))
            |  div (CAST(n_b AS DECIMAL(38,0)) * CAST(n_b AS DECIMAL(38,0))
            |       * CAST(n_b - 1 AS DECIMAL(38,0)))
            |AS BIGINT)""".stripMargin))
      .withColumn(
        "t2_6",
        expr(
          """CASE WHEN __von_a + __von_b = 0 THEN CAST(0 AS BIGINT)
            |ELSE CAST(
            |  (CAST(md6 AS DECIMAL(38,0)) * CAST(md6 AS DECIMAL(38,0)))
            |  div CAST(__von_a + __von_b AS DECIMAL(38,0))
            |AS BIGINT) END""".stripMargin))
      .select(
        col("g").as("group"),
        col("variant_a"), col("variant_b"),
        col("n_a"), col("n_b"), col("md6"), col("t2_6"),
        (col("t2_6") >= Z2Alpha05Micro).as("significant"))
  }

  /** (z_{α/2} + z_β)² for alpha = 0.05 two-sided, power = 0.80
    * (1.959964 + 0.841621)², micro-scaled — the sample-size constant
    * of every two-proportion power calculation. A LITERAL per the
    * no-runtime-quantiles rule; [[mdeSampleSize]] injects it into
    * both plans.
    */
  val PowerConst05_80Micro: Long = 7848880L

  /** Required sample size per arm (the experiment PLANNING operator —
    * run it on LAST experiment's observed rates before launching the
    * next): for each group, the classic two-proportion formula
    *
    *   n/arm = (z_{α/2}+z_β)² · (p_a(1−p_a) + p_b(1−p_b)) / (p_a−p_b)²
    *
    * at alpha 0.05 / power 0.80, evaluated EXACTLY on the observed
    * integer cells: with p_x = x_x/n_x the ratio reduces to
    *
    *   n_req = ceil( L6 · (x_a(n_a−x_a)·n_b² + x_b(n_b−x_b)·n_a²)
    *                 div (1e6 · (x_a·n_b − x_b·n_a)²) )
    *
    * — one ceiling division of DECIMAL(38,0) cross-products
    * (numerator reaches n⁴·L6 ≈ 1e31 at n = 1e6), L6 =
    * [[PowerConst05_80Micro]]. Semantics: the n that would make the
    * OBSERVED effect size detectable with 80% power — the "how much
    * traffic would this readout have needed" column next to
    * [[twoProportionZ]]'s "was it significant at the traffic it got".
    *
    * Conventions: exactly-two-variant groups only (the
    * twoProportionZ rule); a ZERO observed difference (x_a·n_b =
    * x_b·n_a) yields n_req NULL with delta_zero = true — no finite
    * sample detects a zero effect, and publishing a sentinel number
    * would read as a plan. Both-arms-degenerate variance (x = 0 and
    * x = n on both sides simultaneously with a nonzero delta) cannot
    * occur: a nonzero delta forces at least one nondegenerate arm,
    * so the numerator is 0 only when delta is too.
    *
    * Scale shape: identical to [[twoProportionZ]] — one (group,
    * variant) cell aggregate, min/max pivot, pure projection.
    * Returns (group, variant_a, variant_b, n_a, x_a, n_b, x_b,
    * delta_zero, n_req).
    */
  def mdeSampleSize(
      df: DataFrame,
      groupCol: Column,
      variantCol: Column,
      successCol: Column): DataFrame = {
    val cells = cached(
      df
        .filter(groupCol.isNotNull && variantCol.isNotNull && successCol.isNotNull)
        .groupBy(groupCol.as("g"), variantCol.as("v"))
        .agg(
          count(lit(1)).as("n"),
          sum(successCol.cast("long")).as("x")))
    val mins = cells.groupBy(col("g"))
      .agg(
        count(lit(1)).as("__nv"),
        min(col("v")).as("variant_a"),
        max(col("v")).as("variant_b"))
      .filter(col("__nv") === 2L)
    mins
      .join(
        cells.select(col("g"), col("v").as("variant_a"), col("n").as("n_a"), col("x").as("x_a")),
        Seq("g", "variant_a"))
      .join(
        cells.select(col("g"), col("v").as("variant_b"), col("n").as("n_b"), col("x").as("x_b")),
        Seq("g", "variant_b"))
      .withColumn(
        "__d",
        expr(
          """CAST(x_a AS DECIMAL(38,0)) * CAST(n_b AS DECIMAL(38,0))
            |- CAST(x_b AS DECIMAL(38,0)) * CAST(n_a AS DECIMAL(38,0))""".stripMargin))
      .withColumn("delta_zero", col("__d") === lit(0))
      .withColumn(
        "n_req",
        expr(
          s"""CASE WHEN __d = 0 THEN CAST(NULL AS BIGINT)
             |ELSE CAST(
             |  (CAST($PowerConst05_80Micro AS DECIMAL(38,0))
             |   * (CAST(x_a AS DECIMAL(38,0)) * CAST(n_a - x_a AS DECIMAL(38,0))
             |      * CAST(n_b AS DECIMAL(38,0)) * CAST(n_b AS DECIMAL(38,0))
             |      + CAST(x_b AS DECIMAL(38,0)) * CAST(n_b - x_b AS DECIMAL(38,0))
             |        * CAST(n_a AS DECIMAL(38,0)) * CAST(n_a AS DECIMAL(38,0)))
             |   + CAST(1000000 AS DECIMAL(38,0)) * __d * __d - 1)
             |  div (CAST(1000000 AS DECIMAL(38,0)) * __d * __d)
             |AS BIGINT) END""".stripMargin))
      .select(
        col("g").as("group"),
        col("variant_a"), col("variant_b"),
        col("n_a"), col("x_a"), col("n_b"), col("x_b"),
        col("delta_zero"), col("n_req"))
  }

  /** Difference-in-differences (the quasi-experimental workhorse —
    * Card & Krueger 1994 shape): when treatment wasn't randomized,
    * compare the treated arm's pre→post CHANGE against the control
    * arm's, cancelling any time-invariant arm difference and any
    * arm-invariant time shock. Repeated cross-sections — four cells
    * (arm × period), each observation belongs to one:
    *
    *   did = (ȳ_{b,post} − ȳ_{b,pre}) − (ȳ_{a,post} − ȳ_{a,pre})
    *
    * with arm a = lexicographic min (the control by convention),
    * b = max. Micro-exact per the [[welchT]] two-stage discipline:
    * each cell mean m6 and variance-of-mean von6 is ONE truncating
    * division off exact integer moment sums (SS in DECIMAL from the
    * first multiply); did6 = m6_b_post − m6_b_pre − m6_a_post +
    * m6_a_pre (exact integer arithmetic on the stage boundary), and
    * the four-cell Welch statistic t²6 = did6² div Σ von6 — cells
    * are independent samples, so variances add. All four cells must
    * have n ≥ 2 or the group is dropped (a variance needs 2
    * observations); all-four-cells-constant degenerates Σvon6 = 0 →
    * t2_6 = 0, not-significant (the twoProportionZ convention).
    * `periodCol` must be boolean is-post.
    *
    * Scale shape: ONE hash aggregate to (group, arm, period) moment
    * cells, a 4-way pivot via conditional min/max on the cell table,
    * pure projection after. Returns (group, arm_a, arm_b, n_a_pre,
    * n_a_post, n_b_pre, n_b_post, did6, t2_6, significant).
    */
  def diffInDiff(
      df: DataFrame,
      groupCol: Column,
      armCol: Column,
      isPostCol: Column,
      metricCol: Column): DataFrame = {
    val cells = cached(
      df
        .filter(
          groupCol.isNotNull && armCol.isNotNull && isPostCol.isNotNull &&
            metricCol.isNotNull)
        .groupBy(groupCol.as("g"), armCol.as("arm"), isPostCol.cast("boolean").as("post"))
        .agg(
          count(lit(1)).as("n"),
          sum(metricCol.cast("long")).as("s"),
          sum(
            metricCol.cast("long").cast("decimal(38,0)")
              * metricCol.cast("long").cast("decimal(38,0)")).as("ss"))
        .filter(col("n") >= 2L))
      .withColumn(
        "m6",
        expr(
          """CAST((CAST(1000000 AS DECIMAL(38,0)) * CAST(s AS DECIMAL(38,0)))
            |  div CAST(n AS DECIMAL(38,0)) AS BIGINT)""".stripMargin))
      .withColumn(
        "von6",
        expr(
          """CAST(
            |  (CAST(1000000 AS DECIMAL(38,0))
            |   * (CAST(n AS DECIMAL(38,0)) * ss
            |      - CAST(s AS DECIMAL(38,0)) * CAST(s AS DECIMAL(38,0))))
            |  div (CAST(n AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0))
            |       * CAST(n - 1 AS DECIMAL(38,0)))
            |AS BIGINT)""".stripMargin))
    val arms = cells.groupBy(col("g"))
      .agg(
        count(lit(1)).as("__nc"),
        min(col("arm")).as("arm_a"),
        max(col("arm")).as("arm_b"))
      .filter(col("__nc") === 4L)
    def cell(arm: String, post: Boolean, suffix: String) =
      cells
        .filter(col("post") === lit(post))
        .select(
          col("g"), col("arm").as(arm),
          col("n").as(s"n_$suffix"), col("m6").as(s"m6_$suffix"),
          col("von6").as(s"von6_$suffix"))
    arms
      .join(cell("arm_a", post = false, "a_pre"), Seq("g", "arm_a"))
      .join(cell("arm_a", post = true, "a_post"), Seq("g", "arm_a"))
      .join(cell("arm_b", post = false, "b_pre"), Seq("g", "arm_b"))
      .join(cell("arm_b", post = true, "b_post"), Seq("g", "arm_b"))
      .withColumn(
        "did6",
        col("m6_b_post") - col("m6_b_pre") - col("m6_a_post") + col("m6_a_pre"))
      .withColumn(
        "__von",
        col("von6_a_pre") + col("von6_a_post") + col("von6_b_pre") + col("von6_b_post"))
      .withColumn(
        "t2_6",
        expr(
          """CASE WHEN __von = 0 THEN CAST(0 AS BIGINT)
            |ELSE CAST(
            |  (CAST(did6 AS DECIMAL(38,0)) * CAST(did6 AS DECIMAL(38,0)))
            |  div CAST(__von AS DECIMAL(38,0))
            |AS BIGINT) END""".stripMargin))
      .select(
        col("g").as("group"), col("arm_a"), col("arm_b"),
        col("n_a_pre"), col("n_a_post"), col("n_b_pre"), col("n_b_post"),
        col("did6"), col("t2_6"),
        (col("t2_6") >= Z2Alpha05Micro).as("significant"))
  }

  /** Cohen's kappa inter-rater agreement (Cohen 1960) — the labeling-
    * pipeline QA statistic: how much do two raters (a cheap gate vs
    * the full classifier, two annotators, model vs human) agree
    * BEYOND chance? Raw agreement po rewards a rater that always says
    * the majority class; kappa subtracts the agreement their marginal
    * distributions would produce by luck:
    *
    *   kappa = (po − pe) / (1 − pe),
    *   po = Σ_c diag_c / N,   pe = Σ_c row_c·col_c / N²
    *
    * Exactness: kappa6 = 1e6·(N·D − M) div (N² − M) with D = Σ diag,
    * M = Σ row_c·col_c — integer cross-products in DECIMAL(38,0)
    * (M reaches N²), ONE truncating division; po6/pe6 published
    * alongside as their own single divisions. Degenerate pe = 1
    * (BOTH raters constant — N² = M) → kappa6 = 0 by convention,
    * matching the limit argument (no information beyond chance
    * exists to measure).
    *
    * Scale shape: one hash aggregate to the (r1, r2) confusion
    * matrix (class-count² bounded), marginals as two grid
    * re-aggregations, 1-row final. Returns one row (n, n_classes —
    * distinct labels across both raters, po6, pe6, kappa6).
    */
  def cohensKappa(df: DataFrame, rater1: Column, rater2: Column): DataFrame = {
    val grid = cached(
      df
        .filter(rater1.isNotNull && rater2.isNotNull)
        .groupBy(rater1.as("r1"), rater2.as("r2"))
        .agg(count(lit(1)).as("n")))
    val rows = grid.groupBy(col("r1").as("c")).agg(sum(col("n")).as("rn"))
    val cols = grid.groupBy(col("r2").as("c")).agg(sum(col("n")).as("cn"))
    val marg = rows
      .join(cols, Seq("c"), "full_outer")
      .na.fill(0L, Seq("rn", "cn"))
      .agg(
        count(lit(1)).as("n_classes"),
        sum(expr("CAST(rn AS DECIMAL(38,0)) * CAST(cn AS DECIMAL(38,0))")).as("__m"))
    val diag = grid.agg(
      sum(col("n")).as("__nt"),
      sum(when(col("r1") === col("r2"), col("n")).otherwise(0L)).as("__d"))
    diag
      .crossJoin(marg)
      .withColumn(
        "po6",
        expr(
          """CAST((CAST(1000000 AS DECIMAL(38,0)) * CAST(__d AS DECIMAL(38,0)))
            |  div CAST(__nt AS DECIMAL(38,0)) AS BIGINT)""".stripMargin))
      .withColumn(
        "pe6",
        expr(
          """CAST((CAST(1000000 AS DECIMAL(38,0)) * __m)
            |  div (CAST(__nt AS DECIMAL(38,0)) * CAST(__nt AS DECIMAL(38,0)))
            |AS BIGINT)""".stripMargin))
      .withColumn(
        "kappa6",
        expr(
          """CASE WHEN CAST(__nt AS DECIMAL(38,0)) * CAST(__nt AS DECIMAL(38,0)) = __m
            |THEN CAST(0 AS BIGINT)
            |ELSE CAST(
            |  (CAST(1000000 AS DECIMAL(38,0))
            |   * (CAST(__nt AS DECIMAL(38,0)) * CAST(__d AS DECIMAL(38,0)) - __m))
            |  div (CAST(__nt AS DECIMAL(38,0)) * CAST(__nt AS DECIMAL(38,0)) - __m)
            |AS BIGINT) END""".stripMargin))
      .select(
        col("__nt").as("n"), col("n_classes"), col("po6"), col("pe6"), col("kappa6"))
  }

  /** Post-stratification adjustment (the survey-sampling estimator
    * applied to experiment readouts): when arms are IMBALANCED across
    * a stratum (mobile users randomized 60/40 by a logging bug, one
    * source over-crawled), the raw per-arm rate confounds the arm
    * effect with the stratum mix. Re-weight each arm's per-stratum
    * rate by the POOLED stratum share:
    *
    *   adj_ppm(v) = Σ_s round( 1e6 · N_s · x_{v,s} div (N · n_{v,s}) )
    *
    * — per-stratum terms each ONE truncating division (the
    * [[graft.operators.Checks]] psiFromCounts per-term discipline:
    * denominators vary per stratum, so rounding happens per term and
    * the sum is exact), N_s = pooled stratum size, N = pooled total.
    * A stratum where an arm has ZERO traffic contributes nothing for
    * that arm AND its pooled share is excluded from that arm's
    * weight base (w_base — published so the caller sees how much of
    * the population the adjusted rate actually covers; silent
    * renormalization would hide structurally-missing strata).
    *
    * Scale shape: one hash aggregate to (variant, stratum) cells, a
    * broadcast stratum-size grid join, per-variant sum — all bounded
    * by variants × strata. Returns (variant, n, raw_ppm, adj_ppm,
    * w_base_ppm).
    */
  def postStratify(
      df: DataFrame,
      variantCol: Column,
      stratumCol: Column,
      successCol: Column): DataFrame = {
    val cells = cached(
      df
        .filter(variantCol.isNotNull && stratumCol.isNotNull && successCol.isNotNull)
        .groupBy(variantCol.as("v"), stratumCol.as("st"))
        .agg(
          count(lit(1)).as("n_vs"),
          sum(successCol.cast("long")).as("x_vs")))
    val strata = cells.groupBy(col("st")).agg(sum(col("n_vs")).as("n_s"))
    val total = broadcast(strata.agg(sum(col("n_s")).as("__nt")))
    cells
      .join(broadcast(strata), Seq("st"))
      .crossJoin(total)
      .withColumn(
        "__term",
        expr(
          """CAST(
            |  (CAST(1000000 AS DECIMAL(38,0)) * CAST(n_s AS DECIMAL(38,0))
            |   * CAST(x_vs AS DECIMAL(38,0)))
            |  div (CAST(__nt AS DECIMAL(38,0)) * CAST(n_vs AS DECIMAL(38,0)))
            |AS BIGINT)""".stripMargin))
      .withColumn(
        "__wterm",
        expr(
          """CAST((CAST(1000000 AS DECIMAL(38,0)) * CAST(n_s AS DECIMAL(38,0)))
            |  div CAST(__nt AS DECIMAL(38,0)) AS BIGINT)""".stripMargin))
      .groupBy(col("v"))
      .agg(
        sum(col("n_vs")).as("n"),
        sum(col("x_vs")).as("__x"),
        sum(col("__term")).as("adj_ppm"),
        sum(col("__wterm")).as("w_base_ppm"))
      .withColumn(
        "raw_ppm",
        expr(
          """CAST((CAST(1000000 AS DECIMAL(38,0)) * CAST(__x AS DECIMAL(38,0)))
            |  div CAST(n AS DECIMAL(38,0)) AS BIGINT)""".stripMargin))
      .select(
        col("v").as("variant"), col("n"), col("raw_ppm"), col("adj_ppm"),
        col("w_base_ppm"))
  }

  /** O'Brien–Fleming z² boundaries (micro-scaled) for K = 5 equally
    * spaced looks at overall alpha 0.05 two-sided: z_k = C·sqrt(K/k)
    * with C = 2.0403 (Jennison & Turnbull, Table 2.3), so z²_k·1e6 =
    * C²·1e6·K/k. LITERALS per the no-runtime-quantiles rule.
    */
  val ObfZ2Micro5: Seq[Long] =
    Seq(20814120L, 10407060L, 6938040L, 5203530L, 4162824L)

  /** Group-sequential A/B readout with O'Brien–Fleming spending over
    * K = 5 equally spaced looks — the CORRECT way to peek at a
    * running experiment: the naive [[twoProportionZ]] applied daily
    * inflates false positives to ~14% at 5 peeks; OBF spends almost
    * no alpha early (look-1 boundary z² ≈ 20.8) and preserves the
    * overall 5% level. Each row carries its look index (1..5 — the
    * period it ARRIVED in); the statistic at look k is the pooled z²
    * of the CUMULATIVE cells through k, compared against
    * [[ObfZ2Micro5]](k−1).
    *
    * Exactness: cumulative (n, x) cells come from one running-sum
    * window over the (group, variant, look) cell table (looks-bounded,
    * never the corpus); each look's z²6 is the [[twoProportionZ]]
    * DECIMAL cross-product division; crossing is an integer compare.
    * Degenerate looks (pooled X = 0 or X = N so far) score 0 — the
    * early-looks norm. Each variant's look axis is GAP-FILLED against
    * the group's observed look spine before the pivot (zero-cell
    * looks carry the last cumulative cn/cx forward), so an arm with
    * no NEW traffic in a period still enters that look's boundary
    * check; a look where an arm has no CUMULATIVE traffic yet is
    * omitted (no comparison exists), reappearing once both arms have
    * history.
    *
    * Scale shape: one hash aggregate to (group, variant, look) cells,
    * a ≤5-row window per (group, variant), min/max variant pivot on
    * the look grid. Returns (group, look, n_a, x_a, n_b, x_b, z2_6,
    * bound6, crossed) — one row per (group, observed look).
    */
  def obfLooks5(
      df: DataFrame,
      groupCol: Column,
      variantCol: Column,
      successCol: Column,
      lookCol: Column): DataFrame =
    groupSeqLooks5(df, groupCol, variantCol, successCol, lookCol, ObfZ2Micro5)

  /** Pocock z² boundaries (micro-scaled) for K = 5 equally spaced
    * looks at overall alpha 0.05 two-sided: the CONSTANT boundary
    * c_P(5) = 2.413 (Jennison & Turnbull, Table 2.1), z²·1e6 =
    * 2.413²·1e6 at every look. LITERALS per the
    * no-runtime-quantiles rule.
    */
  val PocockZ2Micro5: Seq[Long] = Seq.fill(5)(5822569L)

  /** [[obfLooks5]] with Pocock's constant boundary instead of
    * O'Brien–Fleming's decaying one — same cumulative-cell
    * machinery, same gap-fill, different alpha-spending posture:
    * Pocock spends evenly (easier early stops, harsher final bar
    * z² ≈ 5.82 vs the fixed-test 3.84); OBF hoards alpha for the
    * end. The pair gives the experimenter both canonical spending
    * schedules over one artifact shape.
    */
  def pocockLooks5(
      df: DataFrame,
      groupCol: Column,
      variantCol: Column,
      successCol: Column,
      lookCol: Column): DataFrame =
    groupSeqLooks5(df, groupCol, variantCol, successCol, lookCol, PocockZ2Micro5)

  private def groupSeqLooks5(
      df: DataFrame,
      groupCol: Column,
      variantCol: Column,
      successCol: Column,
      lookCol: Column,
      boundsZ2Micro: Seq[Long]): DataFrame =
    groupSeqLooksFromCells(
      df
        .filter(
          groupCol.isNotNull && variantCol.isNotNull && successCol.isNotNull &&
            lookCol.isNotNull)
        .select(
          groupCol.as("g"), variantCol.as("v"),
          lookCol.cast("long").as("look"), successCol.cast("long").as("s"))
        .groupBy(col("g"), col("v"), col("look"))
        .agg(count(lit(1)).as("n"), sum(col("s")).as("x")),
      boundsZ2Micro)

  /** [[obfLooks5]] off a PRE-AGGREGATED (g, v, look, n, x) cell grid
    * — the streaming-monitor entry point (the
    * [[kruskalWallisFromCounts]] posture): the group-sequential
    * readout's sufficient statistic is the per-look cell grid, which
    * is LINEAR — per-micro-batch partial cells SUM-merge exactly, so
    * a live intake appends partials and the monitor recomputes the
    * boundary checks over the merged looks-bounded grid, bit-equal
    * to the one-shot batch readout. Callers merging partials must
    * sum (n, x) per (g, v, look) first.
    */
  def obfLooks5FromCells(cells: DataFrame): DataFrame =
    groupSeqLooksFromCells(cells, ObfZ2Micro5)

  private def groupSeqLooksFromCells(
      cellsIn: DataFrame,
      boundsZ2Micro: Seq[Long]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(boundsZ2Micro.length == 5, "K = 5 looks: need 5 boundary literals")
    val spark = cellsIn.sparkSession
    import spark.implicits._
    val cells = cellsIn.filter(
      assert_true(
        col("look").between(1L, 5L),
        concat(lit("obfLooks5: look index must be 1..5, got "),
          col("look").cast("string"))).isNull)
    // gap-fill each variant's look axis against the group's observed
    // look spine (a look exists once ANY arm has traffic in it): an
    // arm with zero NEW traffic in a period has no raw cell, but its
    // CUMULATIVE evidence still exists — without the fill that look's
    // boundary check is silently skipped for sparse-traffic periods
    val spine = cells.select(col("g"), col("look")).distinct()
    val variants = cells.select(col("g"), col("v")).distinct()
    val filled = spine
      .join(variants, Seq("g"))
      .join(cells, Seq("g", "v", "look"), "left")
      .na.fill(0L, Seq("n", "x"))
    val w = Window.partitionBy(col("g"), col("v")).orderBy(col("look"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = cached(
      filled
        .withColumn("cn", sum(col("n")).over(w))
        .withColumn("cx", sum(col("x")).over(w))
        // an arm enters a look's pivot only once it HAS cumulative
        // traffic — a look with one arm so far stays omitted
        .filter(col("cn") > 0L))
    val mins = cum.groupBy(col("g"), col("look"))
      .agg(
        count(lit(1)).as("__nv"),
        min(col("v")).as("variant_a"),
        max(col("v")).as("variant_b"))
      .filter(col("__nv") === 2L)
    val bounds = broadcast(
      boundsZ2Micro.zipWithIndex.map { case (b, i) => (i + 1L, b) }
        .toDF("look", "bound6"))
    mins
      .join(
        cum.select(col("g"), col("look"), col("v").as("variant_a"),
          col("cn").as("n_a"), col("cx").as("x_a")),
        Seq("g", "look", "variant_a"))
      .join(
        cum.select(col("g"), col("look"), col("v").as("variant_b"),
          col("cn").as("n_b"), col("cx").as("x_b")),
        Seq("g", "look", "variant_b"))
      .join(bounds, Seq("look"))
      .withColumn(
        "__d",
        expr(
          """CAST(x_a AS DECIMAL(38,0)) * CAST(n_b AS DECIMAL(38,0))
            |- CAST(x_b AS DECIMAL(38,0)) * CAST(n_a AS DECIMAL(38,0))""".stripMargin))
      .withColumn(
        "z2_6",
        expr(
          """CASE WHEN x_a + x_b = 0 OR x_a + x_b = n_a + n_b THEN CAST(0 AS BIGINT)
            |ELSE CAST(
            |  (CAST(1000000 AS DECIMAL(38,0)) * __d * __d
            |   * CAST(n_a + n_b AS DECIMAL(38,0)))
            |  div (CAST(n_a AS DECIMAL(38,0)) * CAST(n_b AS DECIMAL(38,0))
            |       * CAST(x_a + x_b AS DECIMAL(38,0))
            |       * CAST(n_a + n_b - x_a - x_b AS DECIMAL(38,0)))
            |AS BIGINT) END""".stripMargin))
      .select(
        col("g").as("group"), col("look"),
        col("n_a"), col("x_a"), col("n_b"), col("x_b"),
        col("z2_6"), col("bound6"),
        (col("z2_6") >= col("bound6")).as("crossed"))
  }

  /** Empirical-Bayes shrinkage of per-group success rates (the
    * beta-binomial "how to rank small samples" estimator — Robbins
    * 1956 shape, method-of-moments prior): a group with 2/2 successes
    * must not outrank one with 95/100, so every group's rate is
    * pulled toward the global mean with strength inversely
    * proportional to its evidence:
    *
    *   eb = (x_i + α) / (n_i + ν),  ν = α + β,  prior mean m = α/ν
    *
    * Method of moments ENTIRELY in integers: group rates are first
    * micro-quantized (p6_i = 1e6·x_i div n_i — the stage-boundary
    * rounding of [[cupedAdjust]]), the global mean m6 = 1e6·X div N,
    * the between-group variance of the p6 values v12 = (G·Σp6² −
    * (Σp6)²) div (G·(G−1)) is exact micro² (DECIMAL cross-products),
    * and the prior strength ν = m6·(1e6−m6) div v12 − 1 is
    * DIMENSIONLESS (micro²/micro² — no unit juggling). The shrunk
    * rate is one final truncating division per group:
    *   eb6 = (1e6·x_i + m6·ν) div (n_i + ν).
    *
    * Conventions: ν clamps to ≥ 0 (observed between-group variance
    * at or above the binomial ceiling means the prior carries no
    * information — eb6 degrades to the raw rate); v12 = 0 (all
    * groups identical) likewise takes ν = 0 (shrinkage toward a
    * point the groups already sit on is the identity); fewer than 2
    * groups fails fast (no between-group variance exists).
    *
    * Scale shape: one hash aggregate to group cells, a broadcast
    * 1-row moment bootstrap, one projection — no window, no second
    * shuffle. Returns (group, n, x, raw6, eb6).
    */
  def ebShrinkRates(
      df: DataFrame,
      groupCol: Column,
      successCol: Column): DataFrame = {
    val cells = cached(
      df
        .filter(groupCol.isNotNull && successCol.isNotNull)
        .groupBy(groupCol.as("g"))
        .agg(count(lit(1)).as("n"), sum(successCol.cast("long")).as("x"))
        .withColumn("raw6", expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * x div n AS BIGINT)")))
    val moments = broadcast(
      cells.agg(
        count(lit(1)).as("__gc"),
        sum(col("n")).as("__nt"),
        sum(col("x")).as("__xt"),
        sum(col("raw6")).as("__sp"),
        sum(expr("CAST(raw6 AS DECIMAL(38,0)) * CAST(raw6 AS DECIMAL(38,0))"))
          .as("__spp")))
    cells
      .crossJoin(moments)
      .filter(
        assert_true(
          col("__gc") >= 2L,
          lit("ebShrinkRates: at least 2 groups required (no between-group " +
            "variance exists)")).isNull)
      .withColumn("m6", expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * __xt div __nt AS BIGINT)"))
      .withColumn(
        "__v12",
        expr(
          """CAST(
            |  (CAST(__gc AS DECIMAL(38,0)) * __spp
            |   - CAST(__sp AS DECIMAL(38,0)) * CAST(__sp AS DECIMAL(38,0)))
            |  div (CAST(__gc AS DECIMAL(38,0)) * CAST(__gc - 1 AS DECIMAL(38,0)))
            |AS BIGINT)""".stripMargin))
      .withColumn(
        "__nu",
        expr(
          """CASE WHEN __v12 <= 0 THEN CAST(0 AS BIGINT)
            |ELSE greatest(CAST(0 AS BIGINT), CAST(
            |  (CAST(m6 AS DECIMAL(38,0)) * CAST(1000000 - m6 AS DECIMAL(38,0)))
            |  div CAST(__v12 AS DECIMAL(38,0)) AS BIGINT) - 1) END""".stripMargin))
      .withColumn(
        "eb6",
        expr(
          """CAST(
            |  (CAST(1000000 AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0))
            |   + CAST(m6 AS DECIMAL(38,0)) * CAST(__nu AS DECIMAL(38,0)))
            |  div CAST(n + __nu AS DECIMAL(38,0))
            |AS BIGINT)""".stripMargin))
      .select(col("g").as("group"), col("n"), col("x"), col("raw6"), col("eb6"))
  }

  /** Empirical-Bayes shrinkage of per-group MEANS —
    * [[ebShrinkRates]]' Gaussian sibling (the James–Stein/partial-
    * pooling estimator, Efron & Morris 1975, method-of-moments
    * prior): a 3-event user's mean must not outrank a 300-event
    * user's, so each group's mean is pulled toward the grand mean
    * with weight τ²/(τ² + σ̂²_w/n_i) — τ² the between-group variance
    * the data supports beyond sampling noise, σ̂²_w the pooled
    * within-group variance.
    *
    * Method of moments entirely in integers (values exact integer
    * units, ≥ 0 by contract — div/floor parity). Unit discipline:
    * Spark's `div` returns BIGINT, so every variance quantity lives
    * in MILLI-value² units — variances are INTENSIVE (they do not
    * grow with N), so ~1e11 milli-cents² fits a long at any corpus
    * size, where the micro² staging a first draft used wraps at the
    * first real dataset. rawc_i = s_i div n_i (value units, moments
    * only; the OUTPUT means stay micro); v_m = (1000·(G·Σrawc² −
    * (Σrawc)²)) div (G·(G−1)); within SS ssw_i = q_i − (s_i² div
    * n_i) summed → sw2_m = (1000·Σssw) div (N−G); sampvar_m_i =
    * sw2_m div n_i; τ²_m = max(0, v_m − (Σ sampvar_m div G)). The
    * shrink is ONE signed truncating division per group routed
    * through the documented sign·(|τ²·(raw6−m6)| div (τ²+sampvar))
    * convention (the τ²/(τ²+s²) factor is unit-free, so the milli
    * staging cancels exactly). Degenerate: τ²_m = 0 → complete
    * pooling (shrunk6 = m6); a zero denominator (constant corpus)
    * returns the raw mean; G < 2 or N ≤ G fails fast.
    *
    * Scale shape: one hash aggregate to group cells, two broadcast
    * 1-row moment bootstraps (the second needs σ̂²_w first), one
    * projection. Returns (group, n, raw6, shrunk6).
    */
  def ebShrinkMeans(
      df: DataFrame,
      groupCol: Column,
      valueCol: Column): DataFrame = {
    val cells = cached(
      df
        .filter(groupCol.isNotNull && valueCol.isNotNull)
        .groupBy(groupCol.as("g"))
        .agg(
          count(lit(1)).as("n"),
          sum(valueCol.cast("long")).as("s"),
          sum(valueCol.cast("long").cast("decimal(38,0)") * valueCol.cast("long"))
            .as("q"))
        .withColumn("raw6", expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * s) div n AS BIGINT)"))
        .withColumn("__rawc", expr("s div n"))
        .withColumn(
          "__ssw",
          expr("q - (CAST(s AS DECIMAL(38,0)) * s) div n")))
    val m1 = broadcast(
      cells.agg(
        count(lit(1)).as("__gc"),
        sum(col("n")).as("__nt"),
        sum(col("s")).as("__st"),
        sum(col("__rawc")).as("__sp"),
        sum(expr("CAST(__rawc AS DECIMAL(38,0)) * __rawc")).as("__spp"),
        sum(col("__ssw")).as("__sswt")))
    val base = cells
      .crossJoin(m1)
      .filter(
        assert_true(
          col("__gc") >= 2L && col("__nt") > col("__gc"),
          lit("ebShrinkMeans: needs >= 2 groups and N > G (within-group " +
            "variance must exist)")).isNull)
      .withColumn("__m6", expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * __st) div __nt AS BIGINT)"))
      .withColumn(
        "__vm",
        expr(
          """(CAST(1000 AS DECIMAL(38,0))
            |  * (CAST(__gc AS DECIMAL(38,0)) * __spp
            |     - CAST(__sp AS DECIMAL(38,0)) * __sp))
            |div (CAST(__gc AS DECIMAL(38,0)) * (__gc - 1))""".stripMargin))
      .withColumn(
        "__sw2m",
        expr("(CAST(1000 AS DECIMAL(38,0)) * __sswt) div (__nt - __gc)"))
      .withColumn("__sampm", expr("__sw2m div n"))
    val m2 = broadcast(
      base.agg(
        expr("CAST(SUM(__sampm) AS DECIMAL(38,0)) div COUNT(*)").as("__avgm")))
    base
      .crossJoin(m2)
      .withColumn(
        "__taum",
        greatest(lit(0L), col("__vm") - col("__avgm")))
      .withColumn(
        "shrunk6",
        expr(
          """CASE WHEN __taum + __sampm = 0 THEN raw6
            |ELSE __m6 + (CASE WHEN raw6 < __m6 THEN -1 ELSE 1 END)
            |  * (CAST(__taum AS DECIMAL(38,0)) * abs(raw6 - __m6))
            |    div (CAST(__taum AS DECIMAL(38,0)) + __sampm)
            |END""".stripMargin).cast("long"))
      .select(col("g").as("group"), col("n"), col("raw6"), col("shrunk6"))
  }

  /** Paired sign-flip permutation test (Fisher 1935's randomization
    * test, the design-based gold standard): under H0 "the paired
    * difference is symmetric around 0", every unit's sign is
    * exchangeable — so the null distribution of T = Σ d_i is read
    * off R random sign patterns, assumption-free (no normality, no
    * rank approximation; the exact-finite-sample complement of
    * [[wilcoxonSignedRank]] that keeps the MAGNITUDES).
    *
    * Determinism — the [[poissonBootDiff]] md5 discipline: unit i's
    * sign in replicate r flips iff the 15-hex md5 prefix of
    * "unit:r" is < "800000000000000" (exactly half the 60-bit space;
    * a literal, no computed threshold needed), identical in both
    * engines. Everything else is exact integer: per-unit differences
    * collapse first (cluster-level flips — the randomization-unit
    * discipline), replicate sums in DECIMAL(38,0), and the add-one
    * p-value p_ppm = 1e6·(1 + #{|T_r| ≥ |T_obs|}) div (R+1) — the
    * only division, nonnegative both sides. Scale shape: the
    * unit×reps explosion map-side combines to R replicate rows;
    * reps ≤ 1000 fail-fast. Returns one row (n_units, n_reps,
    * t_obs, n_ge, p_ppm).
    */
  def signFlipTest(
      df: DataFrame,
      unitCol: Column,
      diffCol: Column,
      reps: Int = 200): DataFrame = {
    require(reps >= 40 && reps <= 1000, s"reps must be in [40, 1000], got $reps")
    val perUnit = cached(
      df
        .filter(unitCol.isNotNull && diffCol.isNotNull)
        .groupBy(unitCol.cast("string").as("u"))
        .agg(sum(diffCol.cast("long")).as("d")))
    val spark = df.sparkSession
    val r = spark.range(reps.toLong).select(col("id").cast("int").as("r"))
    val h = substring(
      md5(concat(col("u"), lit(":"), col("r").cast("string")).cast("binary")),
      1, 15)
    val obs = broadcast(
      perUnit.agg(
        count(lit(1)).as("n_units"),
        sum(col("d")).cast("decimal(38,0)").as("__tobs")))
    val ts = perUnit
      .crossJoin(r)
      .withColumn("__sd", when(h < lit("800000000000000"), -col("d")).otherwise(col("d")))
      .groupBy(col("r"))
      .agg(sum(col("__sd").cast("decimal(38,0)")).as("__t"))
    ts
      .crossJoin(obs)
      .agg(
        max(col("n_units")).as("n_units"),
        count(lit(1)).as("n_reps"),
        max(col("__tobs")).cast("long").as("t_obs"),
        sum(when(abs(col("__t")) >= abs(col("__tobs")), 1L).otherwise(0L)).as("n_ge"))
      .withColumn(
        "p_ppm",
        expr(
          """CAST((CAST(1000000 AS DECIMAL(38,0)) * (1 + n_ge))
            |div (n_reps + 1) AS BIGINT)""".stripMargin))
  }

  /** One-way ANOVA across k arms (Fisher) — the many-armed sibling of
    * [[welchT]]: did the metric's mean differ across ANY of the k
    * variants? F = (SSB/(k−1)) / (SSW/(N−k)) from one pass of
    * per-arm moments.
    *
    * Exactness (the psiFromCounts per-term discipline): the between-
    * group sum of squares decomposes as SSB = Σ_g s_g²/n_g − S²/N;
    * each term rounds ONCE to micro units by truncating DECIMAL
    * division (t_g = 1e6·s_g² div n_g), so ssb6 = Σ t_g − (1e6·S²
    * div N) — truncation can leave ssb6 up to ~k µ-units NEGATIVE on
    * identical arms; it clamps at 0 (documented). ssw6 = 1e6·SS −
    * Σ t_g is ≥ 1e6·SSW ≥ 0 by construction (each t_g is ≤ its exact
    * value), no clamp needed. f6 = (ssb6·(N−k)·1e6) div
    * (ssw6·(k−1)).
    *
    * Significance uses the large-sample identity (k−1)·F → chi²_{k−1}
    * (valid for N ≫ k — per-arm n ≳ 30; below that the threshold is
    * anti-conservative, the [[welchT]] caveat): chi2_6 = (ssb6·(N−k)
    * ·1e6) div ssw6 compared against the dof = k−1 entry of
    * [[Chi2Alpha05Micro]] — k is capped at 11 by that table,
    * enforced fail-fast in-plan. ssw6 = 0 (every arm constant) → f6
    * = chi2_6 = 0, not-significant (the twoProportionZ degenerate
    * convention); arms with n < 2 are dropped (no variance
    * evidence); fewer than 2 surviving arms yields zero rows.
    *
    * Scale shape: ONE hash aggregate to per-arm moments (map-side
    * combined), a broadcast 1-row total, a k-row final aggregate.
    * Returns one row (k, n, ssb6, ssw6, f6, chi2_6, significant).
    */
  def oneWayAnova(df: DataFrame, armCol: Column, metricCol: Column): DataFrame = {
    val arms = cached(
      df
        .filter(armCol.isNotNull && metricCol.isNotNull)
        .groupBy(armCol.as("arm"))
        .agg(
          count(lit(1)).as("n_g"),
          sum(metricCol.cast("long")).as("s_g"),
          sum(
            metricCol.cast("long").cast("decimal(38,0)")
              * metricCol.cast("long").cast("decimal(38,0)")).as("ss_g"))
        .filter(col("n_g") >= 2L)
        .withColumn(
          "t_g",
          expr(
            """CAST(
              |  (CAST(1000000 AS DECIMAL(38,0))
              |   * CAST(s_g AS DECIMAL(38,0)) * CAST(s_g AS DECIMAL(38,0)))
              |  div CAST(n_g AS DECIMAL(38,0))
              |AS BIGINT)""".stripMargin)))
    arms
      .agg(
        count(lit(1)).as("k"),
        sum(col("n_g")).as("n"),
        sum(col("s_g")).as("__s"),
        sum(col("ss_g")).as("__ss"),
        sum(col("t_g")).as("__tsum"))
      .filter(col("k") >= 2L)
      .filter(
        assert_true(
          col("k") <= 11L,
          concat(
            lit("oneWayAnova: 2..11 arms supported (chi-square literal table), got "),
            col("k").cast("string"))).isNull)
      .withColumn(
        "ssb6",
        greatest(
          lit(0L),
          expr(
            """__tsum - CAST(
              |  (CAST(1000000 AS DECIMAL(38,0))
              |   * CAST(__s AS DECIMAL(38,0)) * CAST(__s AS DECIMAL(38,0)))
              |  div CAST(n AS DECIMAL(38,0))
              |AS BIGINT)""".stripMargin)))
      .withColumn(
        "ssw6",
        expr(
          """CAST(1000000 AS DECIMAL(38,0)) * __ss
            |- CAST(__tsum AS DECIMAL(38,0))""".stripMargin))
      .withColumn(
        "f6",
        expr(
          """CASE WHEN ssw6 = 0 THEN CAST(0 AS BIGINT)
            |ELSE CAST(
            |  (CAST(ssb6 AS DECIMAL(38,0)) * CAST(n - k AS DECIMAL(38,0))
            |   * CAST(1000000 AS DECIMAL(38,0)))
            |  div (ssw6 * CAST(k - 1 AS DECIMAL(38,0)))
            |AS BIGINT) END""".stripMargin))
      .withColumn(
        "chi2_6",
        expr(
          """CASE WHEN ssw6 = 0 THEN CAST(0 AS BIGINT)
            |ELSE CAST(
            |  (CAST(ssb6 AS DECIMAL(38,0)) * CAST(n - k AS DECIMAL(38,0))
            |   * CAST(1000000 AS DECIMAL(38,0)))
            |  div ssw6
            |AS BIGINT) END""".stripMargin))
      .withColumn(
        "__thr",
        element_at(
          array(Chi2Alpha05Micro.map(lit): _*),
          (col("k") - 1L).cast("int")))
      .select(
        col("k"), col("n"), col("ssb6"),
        col("ssw6").cast("long").as("ssw6"),
        col("f6"), col("chi2_6"),
        (col("chi2_6") >= col("__thr")).as("significant"))
  }

  /** Kruskal–Wallis rank test (Kruskal & Wallis 1952) — the k-armed
    * nonparametric sibling of [[mannWhitneyU]], completing the test
    * grid (parametric/nonparametric × 2-arm/k-arm with [[welchT]] and
    * [[oneWayAnova]]): did ANY arm's value distribution shift, with
    * no normality assumption.
    *
    * Exactness on the doubled-mid-rank chassis (2r + t − 1 per
    * member of a tie group — always integer): per-arm doubled rank
    * sums R2_g fold from the DISTINCT-(arm, value) count table, each
    * arm's term rounds ONCE (t_g = 1e6·R2_g² div (4·n_g), DECIMAL —
    * R2² reaches 4N⁴, valid to N ≈ 5e7 rows before 1e38), then
    *
    *   H6  = (12·Σt_g) div (N(N+1)) − 3e6·(N+1)   [clamped ≥ 0 —
    *         truncation can leave a few µ-units negative on
    *         identical arms]
    *   Hc6 = H6·(N³−N) div (N³−N−ΣT),  T = t³−t   [tie correction]
    *
    * — staged truncating divisions at pinned boundaries (the
    * oneWayAnova convention), oracle-mirrored stage for stage.
    * All-values-equal degenerates the correction denominator → 0
    * convention. Significance: Hc6 vs the dof = k−1 entry of
    * [[Chi2Alpha05Micro]] (2..11 arms, fail-fast). Arms keep ALL
    * sizes (ranks need no per-arm variance); fewer than 2 arms
    * yields zero rows.
    *
    * Scale shape: one hash aggregate to the (value, arm) count grid,
    * one DISTRIBUTED prefix sum over the VALUE DOMAIN (never the
    * corpus, never a single task — [[Relational.globalCumSum]]), a
    * k-row final. Returns one row (k, n, hc6, significant).
    */
  def kruskalWallis(df: DataFrame, armCol: Column, valueCol: Column): DataFrame =
    kruskalWallisFromCounts(
      df
        .filter(armCol.isNotNull && valueCol.isNotNull)
        .groupBy(valueCol.cast("long").as("v"), armCol.as("arm"))
        .agg(count(lit(1)).as("c")))

  /** [[kruskalWallis]] off a PRE-AGGREGATED (v, arm, c) count grid —
    * the streaming-monitor entry point: RANKS are not mergeable, but
    * the rank test's sufficient statistic IS (the count grid is
    * linear — per-micro-batch partial counts SUM-merge exactly, the
    * volume-gate/CMS artifact-is-the-state discipline), so a live
    * intake appends partial grids and the monitor recomputes ranks
    * over the value-DOMAIN-bounded merge. Callers merging partials
    * must sum c per (v, arm) first; the statistic then equals the
    * one-shot batch test bit-for-bit.
    */
  def kruskalWallisFromCounts(vaIn: DataFrame): DataFrame = {
    val va = cached(vaIn)
    // min-rank via the DISTRIBUTED prefix sum over the distinct-value
    // table (range-partitioned sort + per-partition fold, the
    // globalRank chassis) — never a single-task Window.orderBy
    val vt = Relational
      .globalCumSum(
        va.groupBy(col("v")).agg(sum(col("c")).as("t")),
        Seq(col("v")),
        "t",
        "__below")
      .withColumn("rmin", col("__below") + 1L)
      .drop("__below")
    val arms = cached(
      va
        .join(vt.select(col("v"), col("t"), col("rmin")), Seq("v"))
        .groupBy(col("arm"))
        .agg(
          sum(col("c")).as("n_g"),
          // rank sums and tie cubes in DECIMAL from the first multiply
          // — c·(2·rmin+t−1) ~ 2·N·c and t³ pass 2^63 long before the
          // row bound does (the rocAucFromCells.__r2p discipline)
          sum(col("c").cast("decimal(38,0)")
            * (lit(2L) * col("rmin") + col("t") - 1L)).as("r2_g")))
    val tot = broadcast(arms.agg(count(lit(1)).as("k"), sum(col("n_g")).as("n")))
    val ties = broadcast(
      vt.agg(
        sum(col("t").cast("decimal(38,0)") * col("t") * col("t") - col("t"))
          .as("__ties3")))
    arms
      .crossJoin(tot)
      // DIVSWEEP Class C bound in-plan: R2² reaches 4N⁴, exhausting
      // DECIMAL(38) past the documented N ≈ 5e7 — the guard sits
      // BEFORE the u_g6 term so the caller gets the remedy, not a
      // mid-job ANSI ArithmeticException
      .filter(
        assert_true(
          col("n") <= 50000000L,
          concat(
            lit("kruskalWallis: N exceeds the documented DECIMAL(38) validity " +
              "bound 5e7 (rank-sum squares reach 4N⁴) — quantize values or " +
              "subsample arms upstream (DIVSWEEP Class C); got N = "),
            col("n").cast("string"))).isNull)
      // per-arm micro term 12·(R2_g/2)²/(n_g·N(N+1)) rounded ONCE —
      // dividing by the FULL denominator per arm keeps every
      // intermediate ≤ ~12e6·n_g (a huge t_g = 1e6·R2² div 4n_g
      // would overflow the BIGINT that Spark's div always returns)
      .withColumn(
        "u_g6",
        expr(
          """CAST(
            |  (CAST(3000000 AS DECIMAL(38,0))
            |   * CAST(r2_g AS DECIMAL(38,0)) * CAST(r2_g AS DECIMAL(38,0)))
            |  div (CAST(n_g AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0))
            |       * CAST(n + 1 AS DECIMAL(38,0)))
            |AS BIGINT)""".stripMargin))
      .groupBy(col("k"), col("n"))
      .agg(sum(col("u_g6")).as("__a"))
      .filter(col("k") >= 2L)
      .filter(
        assert_true(
          col("k") <= 11L,
          concat(
            lit("kruskalWallis: 2..11 arms supported (chi-square literal table), got "),
            col("k").cast("string"))).isNull)
      .crossJoin(ties)
      .withColumn(
        "__h6",
        greatest(lit(0L), col("__a") - lit(3000000L) * (col("n") + 1L)))
      .withColumn(
        "hc6",
        expr(
          """CASE WHEN CAST(n AS DECIMAL(38,0)) * n * n - n - __ties3 <= 0
            |THEN CAST(0 AS BIGINT)
            |ELSE CAST(
            |  (CAST(__h6 AS DECIMAL(38,0))
            |   * (CAST(n AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0))
            |      * CAST(n AS DECIMAL(38,0)) - CAST(n AS DECIMAL(38,0))))
            |  div (CAST(n AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0))
            |       * CAST(n AS DECIMAL(38,0)) - CAST(n AS DECIMAL(38,0))
            |       - CAST(__ties3 AS DECIMAL(38,0)))
            |AS BIGINT) END""".stripMargin))
      .withColumn(
        "__thr",
        element_at(
          array(Chi2Alpha05Micro.map(lit): _*),
          (col("k") - 1L).cast("int")))
      .select(
        col("k"), col("n"), col("hc6"),
        (col("hc6") >= col("__thr")).as("significant"))
  }

  /** McNemar's test (McNemar 1947) — the PAIRED binary test: each
    * unit carries a pre and a post flag, and only the DISCORDANT
    * pairs carry information (b = 0→1 upgrades, c = 1→0 downgrades;
    * concordant pairs cancel out of the null). chi²6 =
    * 1e6·(b−c)² div (b+c) — exact integers with the cross-product in
    * DECIMAL(38,0) (1e6·(b−c)² passes 2^63 at |b−c| ≈ 3e6 discordant
    * pairs — the sibling-operator discipline), one truncating
    * division; b + c = 0 (nobody switched) → 0, not-significant, by
    * the degenerate convention. Significance vs the chi²₁ literal
    * [[Z2Alpha05Micro]]. Returns one row (n, b, c, chi2_6,
    * significant).
    *
    * Scale shape: one filter + 1-row aggregate — map-side combined,
    * nothing else.
    */
  def mcnemar(df: DataFrame, preCol: Column, postCol: Column): DataFrame =
    df
      .filter(preCol.isNotNull && postCol.isNotNull)
      .agg(
        count(lit(1)).as("n"),
        sum(when(!preCol.cast("boolean") && postCol.cast("boolean"), 1L).otherwise(0L))
          .as("b"),
        sum(when(preCol.cast("boolean") && !postCol.cast("boolean"), 1L).otherwise(0L))
          .as("c"))
      .withColumn(
        "chi2_6",
        // DECIMAL(38,0) from the first multiply — 1e6·(b−c)² passes
        // 2^63 already at |b−c| ≈ 3e6 discordant pairs; the sibling
        // operators' discipline, no BIGINT stage
        expr(
          """CASE WHEN b + c = 0 THEN CAST(0 AS BIGINT)
            |ELSE CAST(
            |  (CAST(1000000 AS DECIMAL(38,0))
            |   * CAST(b - c AS DECIMAL(38,0)) * CAST(b - c AS DECIMAL(38,0)))
            |  div CAST(b + c AS DECIMAL(38,0))
            |AS BIGINT) END""".stripMargin))
      .select(
        col("n"), col("b"), col("c"), col("chi2_6"),
        (col("chi2_6") >= Z2Alpha05Micro).as("significant"))

  /** Brown–Forsythe variance-equality test (Brown & Forsythe 1974 —
    * Levene's test with the MEDIAN center): are the arms' SPREADS
    * equal? The gate a mean-comparison should pass before trusting
    * pooled-variance machinery, and a drift alarm in its own right
    * (a variant that widens latency variance without moving the mean
    * is invisible to [[welchT]]). Composition: per-arm LOWER median
    * by exact rank (element at position (n+1) div 2 under the value
    * order — the order-statistic discipline, no approx percentile),
    * absolute deviations |y − med_g|, then [[oneWayAnova]] on the
    * deviations verbatim — output shape and conventions inherited.
    */
  def brownForsythe(df: DataFrame, armCol: Column, metricCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df
      .filter(armCol.isNotNull && metricCol.isNotNull)
      .select(armCol.as("__arm"), metricCol.cast("long").as("__y"))
    val w = Window.partitionBy(col("__arm"))
    val meds = base
      .withColumn("__rn", row_number().over(w.orderBy(col("__y"))))
      .withColumn("__n", count(lit(1)).over(w))
      .filter(col("__rn") === expr("CAST((__n + 1) div 2 AS INT)"))
      .select(col("__arm"), col("__y").as("__med"))
    oneWayAnova(
      base.join(meds, Seq("__arm")),
      col("__arm"),
      abs(col("__y") - col("__med")))
  }

  /** Wald's sequential probability ratio test (Wald 1945) — the
    * origin of all sequential testing and the cheapest always-on
    * monitor: H0: p = p0 vs H1: p = p1 over a Bernoulli stream,
    * stopping the moment the evidence clears either boundary instead
    * of waiting for a fixed n (on average ~half the samples of the
    * fixed-n test at the same error rates). The simple-hypothesis
    * companion of [[obfLooks5]]'s calendar looks.
    *
    *   LLR_n = x·ln(p1/p0) + (n−x)·ln((1−p1)/(1−p0))
    *   accept_h1 at LLR ≥ ln((1−β)/α),  accept_h0 at ≤ ln(β/(1−α))
    *
    * Exactness — the ndcgWeights shared-constant discipline: the two
    * per-observation increments and both boundaries are micro-nat
    * LITERALS computed ONCE driver-side from (p0, p1, α, β) and
    * injected into both plans; the running LLR is then an exact
    * BIGINT x·L1 + (n−x)·L0 over cumulative counts from one
    * per-group window under the caller's arrival total order.
    * Reported per group: the FIRST crossing row (min arrival rank
    * among crossings — the decision the live monitor would have
    * announced), or the final row with decision "continue" if no
    * boundary was reached. Returns (group, n_at_decision,
    * x_at_decision, llr6, decision).
    */
  def sprtBernoulli(
      df: DataFrame,
      groupCol: Column,
      orderCols: Seq[Column],
      successCol: Column,
      p0: Double,
      p1: Double,
      alpha: Double = 0.05,
      beta: Double = 0.05): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(p0 > 0 && p0 < 1 && p1 > 0 && p1 < 1 && p0 != p1,
      "p0, p1 must be distinct probabilities in (0,1)")
    require(alpha > 0 && alpha < 1 && beta > 0 && beta < 1,
      "alpha, beta must be in (0,1)")
    val l1 = math.round(1e6 * math.log(p1 / p0))
    val l0 = math.round(1e6 * math.log((1.0 - p1) / (1.0 - p0)))
    val hi = math.round(1e6 * math.log((1.0 - beta) / alpha))
    val lo = math.round(1e6 * math.log(beta / (1.0 - alpha)))
    val w = Window.partitionBy(col("__g")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wr = Window.partitionBy(col("__g")).orderBy(orderCols: _*)
    val scored = df
      .filter(groupCol.isNotNull && successCol.isNotNull)
      .withColumn("__g", groupCol)
      .withColumn("__s", successCol.cast("long"))
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__x", sum(col("__s")).over(w))
      .withColumn("__rn", row_number().over(wr))
      .withColumn("llr6", col("__x") * lit(l1) + (col("__n") - col("__x")) * lit(l0))
      .withColumn(
        "decision",
        when(col("llr6") >= lit(hi), lit("accept_h1"))
          .when(col("llr6") <= lit(lo), lit("accept_h0"))
          .otherwise(lit("continue")))
      .select(col("__g"), col("__rn"), col("__n"), col("__x"), col("llr6"), col("decision"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val firstCross = scored
      .filter(col("decision") =!= "continue")
      .groupBy(col("__g"))
      .agg(min(col("__rn")).as("__rn"))
      .join(scored, Seq("__g", "__rn"))
    val undecided = scored
      .join(firstCross.select(col("__g")), Seq("__g"), "left_anti")
      .groupBy(col("__g"))
      .agg(max(col("__rn")).as("__rn"))
      .join(scored, Seq("__g", "__rn"))
    firstCross
      .unionByName(undecided)
      .select(
        col("__g").as("group"),
        col("__n").as("n_at_decision"),
        col("__x").as("x_at_decision"),
        col("llr6"),
        col("decision"))
  }

  /** Benjamini–Hochberg step-up over a FIXED family of chi²₁-scale
    * tests (Benjamini & Hochberg 1995) — the multiple-testing closure
    * of the family: running [[twoProportionZ]] across m segments at
    * α = 0.05 each inflates the family false-positive rate to
    * 1−0.95^m; BH controls the FALSE DISCOVERY RATE at q instead.
    * Because m is fixed at authoring time, the per-rank thresholds
    * are LITERALS (chi²₁ quantiles at p = i·q/m — the
    * no-runtime-quantiles rule holds even for multiple-testing
    * corrections): rank the statistics descending, find the largest
    * rank i with z²_(i) ≥ thr_i, and everything at or above that
    * rank is discovered.
    *
    * `thresholds6(i-1)` is the micro-scaled chi²₁ quantile for rank
    * i (most significant first — DESCENDING thresholds); the input
    * must carry exactly `thresholds6.length` rows (enforced
    * fail-fast in-plan — BH's thresholds are a function of the
    * family size, so a row-count mismatch means the family changed
    * under the literals). Ties in the statistic rank by the caller's
    * `tieCol` total order. Returns the input's group column + (rank,
    * z2_6, thr6, significant).
    */
  def bhStepUp(
      tests: DataFrame,
      groupCol: Column,
      statCol: Column,
      tieCol: Column,
      thresholds6: Seq[Long]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(thresholds6.nonEmpty, "thresholds6 must be non-empty")
    require(
      thresholds6 == thresholds6.sorted.reverse,
      "thresholds6 must be descending (most significant rank first)")
    val m = thresholds6.length
    val spark = tests.sparkSession
    import spark.implicits._
    val thr = broadcast(
      thresholds6.zipWithIndex.map { case (t, i) => (i + 1L, t) }.toDF("rank", "thr6"))
    val ranked = tests
      .select(groupCol.as("group"), statCol.cast("long").as("z2_6"), tieCol.as("__tie"))
      .withColumn(
        "rank",
        row_number().over(Window.orderBy(col("z2_6").desc, col("__tie"))).cast("long"))
      .crossJoin(broadcast(tests.agg(count(lit(1)).as("__m"))))
      .filter(
        assert_true(
          col("__m") === m.toLong,
          concat(
            lit(s"bhStepUp: the literal threshold table is for a family of $m tests, got "),
            col("__m").cast("string"))).isNull)
      .join(thr, Seq("rank"))
      .withColumn("__pass", when(col("z2_6") >= col("thr6"), col("rank")).otherwise(0L))
    val cutoff = broadcast(ranked.agg(max(col("__pass")).as("__cut")))
    ranked
      .crossJoin(cutoff)
      .select(
        col("group"), col("rank"), col("z2_6"), col("thr6"),
        (col("rank") <= col("__cut")).as("significant"))
  }

  /** Holm step-DOWN multiple-test correction (Holm 1979) —
    * [[bhStepUp]]'s FWER sibling: where BH controls the FALSE
    * DISCOVERY RATE (fine for a screening dashboard that tolerates a
    * few false leads), Holm controls the FAMILY-WISE error rate with
    * no independence assumption — the correction for ship/no-ship
    * families where ONE false rejection is the disaster. Mechanics
    * mirror bhStepUp (descending-stat rank against a caller-supplied
    * literal chi²₁(α/(m−i+1)) micro table, family size enforced
    * in-plan) with the opposite scan: step-down REJECTS ranks
    * strictly before the FIRST failure (step-up accepts up to the
    * LAST pass), so the cutoff fold is a min over failing ranks —
    * a k-row bounded window + two 1-row folds, same as BH. Returns
    * (group, rank, z2_6, thr6, significant).
    */
  def holmStepDown(
      tests: DataFrame,
      groupCol: Column,
      statCol: Column,
      tieCol: Column,
      thresholds6: Seq[Long]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(thresholds6.nonEmpty, "thresholds6 must be non-empty")
    require(
      thresholds6 == thresholds6.sorted.reverse,
      "thresholds6 must be descending (most significant rank first)")
    val m = thresholds6.length
    val spark = tests.sparkSession
    import spark.implicits._
    val thr = broadcast(
      thresholds6.zipWithIndex.map { case (t, i) => (i + 1L, t) }.toDF("rank", "thr6"))
    val ranked = tests
      .select(groupCol.as("group"), statCol.cast("long").as("z2_6"), tieCol.as("__tie"))
      .withColumn(
        "rank",
        row_number().over(Window.orderBy(col("z2_6").desc, col("__tie"))).cast("long"))
      .crossJoin(broadcast(tests.agg(count(lit(1)).as("__m"))))
      .filter(
        assert_true(
          col("__m") === m.toLong,
          concat(
            lit(s"holmStepDown: the literal threshold table is for a family of $m tests, got "),
            col("__m").cast("string"))).isNull)
      .join(thr, Seq("rank"))
      .withColumn(
        "__fail",
        when(col("z2_6") < col("thr6"), col("rank")).otherwise(lit(m + 1L)))
    val cutoff = broadcast(ranked.agg(min(col("__fail")).as("__cut")))
    ranked
      .crossJoin(cutoff)
      .select(
        col("group"), col("rank"), col("z2_6"), col("thr6"),
        (col("rank") < col("__cut")).as("significant"))
  }

  /** Cochran's Q (Cochran 1950) — [[mcnemar]] generalized to k
    * repeated binary measurements per unit: did the success rate
    * differ across ANY of the k treatments/periods, with each unit
    * as its own control?
    *
    *   Q = (k−1)·(k·ΣC_j² − N²) div (k·N − ΣR_i²)
    *
    * with C_j = per-treatment success totals, R_i = per-unit success
    * totals, N = ΣC — ENTIRELY exact integers, one truncating
    * division (micro-scaled); Q → chi²_{k−1} under H0, compared
    * against [[Chi2Alpha05Micro]] (2..11 treatments, fail-fast).
    * Degenerate denominator 0 (every unit all-0 or all-k — no
    * within-unit variation anywhere) → 0, not-significant. Units
    * must carry EXACTLY k treatment rows (enforced in-plan — a
    * missing cell is a design error, not a zero). Returns one row
    * (k, n_units, q6, significant).
    *
    * Scale shape: one (unit) aggregate for R_i (+ the completeness
    * assert), one (treatment) aggregate for C_j, two 1-row folds.
    */
  def cochranQ(
      df: DataFrame,
      unitCol: Column,
      treatmentCol: Column,
      flagCol: Column): DataFrame = {
    val base = cached(
      df
        .filter(unitCol.isNotNull && treatmentCol.isNotNull && flagCol.isNotNull)
        .select(unitCol.as("u"), treatmentCol.as("t"), flagCol.cast("long").as("x")))
    val k = broadcast(base.agg(count_distinct(col("t")).as("__k")))
    val rows = base
      .groupBy(col("u"))
      .agg(count(lit(1)).as("__nt"), sum(col("x")).as("r"))
      .crossJoin(k)
      .filter(
        assert_true(
          col("__nt") === col("__k"),
          concat(
            lit("cochranQ: every unit must carry exactly k treatment rows; unit with "),
            col("__nt").cast("string"), lit(" of "), col("__k").cast("string"))).isNull)
    val rAgg = rows.agg(
      count(lit(1)).as("n_units"),
      sum(col("r")).as("__n"),
      sum(col("r") * col("r")).as("__rr"))
    val cAgg = base.groupBy(col("t")).agg(sum(col("x")).as("c"))
      // per-treatment totals square past 2^63 at ~3e9 successes
      .agg(sum(col("c").cast("decimal(38,0)") * col("c")).as("__cc"))
    rAgg
      .crossJoin(broadcast(cAgg))
      .crossJoin(k)
      .filter(
        assert_true(
          col("__k").between(2L, 11L),
          concat(lit("cochranQ: 2..11 treatments supported (chi-square literal table), got "),
            col("__k").cast("string"))).isNull)
      .withColumn(
        "q6",
        expr(
          """CASE WHEN __k * __n - __rr = 0 THEN CAST(0 AS BIGINT)
            |ELSE CAST(
            |  (CAST(1000000 AS DECIMAL(38,0)) * CAST(__k - 1 AS DECIMAL(38,0))
            |   * (CAST(__k AS DECIMAL(38,0)) * CAST(__cc AS DECIMAL(38,0))
            |      - CAST(__n AS DECIMAL(38,0)) * CAST(__n AS DECIMAL(38,0))))
            |  div (CAST(__k AS DECIMAL(38,0)) * CAST(__n AS DECIMAL(38,0))
            |       - CAST(__rr AS DECIMAL(38,0)))
            |AS BIGINT) END""".stripMargin))
      .withColumn(
        "__thr",
        element_at(
          array(Chi2Alpha05Micro.map(lit): _*),
          (col("__k") - 1L).cast("int")))
      .select(
        col("__k").as("k"), col("n_units"), col("q6"),
        (col("q6") >= col("__thr")).as("significant"))
  }

  /** Wald–Wolfowitz runs test (1940) — is a binary SEQUENCE random,
    * or streaky/alternating? The randomization audit that catches
    * what marginal rates can't: a bucket assignment that alternates
    * A,B,A,B has a perfect 50/50 split and zero randomness (session
    * stickiness, round-robin routers, sorted inputs all leave this
    * fingerprint). Counts runs R (maximal same-value streaks) under
    * the caller's arrival total order; under H0,
    *
    *   z²·1e6 = 1e6·(n·R − 2ab − n)²·(n−1) div (2ab·(2ab − n))
    *
    * with a/b the class counts — the classic mean 2ab/n + 1 and
    * variance folded into ONE truncating division of exact
    * DECIMAL(38,0) cross-products (numerator reaches n⁵). Degenerate
    * 2ab ≤ n (one class absent or nearly so — the normal
    * approximation has no variance to stand on) → 0,
    * not-significant. Returns per group (group, n, n_a, n_b, runs,
    * z2_6, significant).
    *
    * Scale shape: one lag window per group under (orderCols), one
    * group aggregate.
    */
  def runsTest(
      df: DataFrame,
      groupCol: Column,
      orderCols: Seq[Column],
      flagCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("__g")).orderBy(orderCols: _*)
    df
      .filter(groupCol.isNotNull && flagCol.isNotNull)
      .withColumn("__g", groupCol)
      .withColumn("__f", flagCol.cast("boolean"))
      .withColumn("__prev", lag(col("__f"), 1).over(w))
      .groupBy(col("__g"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("__f"), 1L).otherwise(0L)).as("n_a"),
        sum(when(!col("__f"), 1L).otherwise(0L)).as("n_b"),
        sum(
          when(col("__prev").isNull || col("__prev") =!= col("__f"), 1L)
            .otherwise(0L)).as("runs"))
      .withColumn(
        "z2_6",
        expr(
          """CASE WHEN 2 * n_a * n_b <= n THEN CAST(0 AS BIGINT)
            |ELSE CAST(
            |  (CAST(1000000 AS DECIMAL(38,0))
            |   * (CAST(n AS DECIMAL(38,0)) * CAST(runs AS DECIMAL(38,0))
            |      - CAST(2 AS DECIMAL(38,0)) * CAST(n_a AS DECIMAL(38,0))
            |        * CAST(n_b AS DECIMAL(38,0))
            |      - CAST(n AS DECIMAL(38,0)))
            |   * (CAST(n AS DECIMAL(38,0)) * CAST(runs AS DECIMAL(38,0))
            |      - CAST(2 AS DECIMAL(38,0)) * CAST(n_a AS DECIMAL(38,0))
            |        * CAST(n_b AS DECIMAL(38,0))
            |      - CAST(n AS DECIMAL(38,0)))
            |   * CAST(n - 1 AS DECIMAL(38,0)))
            |  div (CAST(2 AS DECIMAL(38,0)) * CAST(n_a AS DECIMAL(38,0))
            |       * CAST(n_b AS DECIMAL(38,0))
            |       * (CAST(2 AS DECIMAL(38,0)) * CAST(n_a AS DECIMAL(38,0))
            |          * CAST(n_b AS DECIMAL(38,0)) - CAST(n AS DECIMAL(38,0))))
            |AS BIGINT) END""".stripMargin))
      .select(
        col("__g").as("group"), col("n"), col("n_a"), col("n_b"), col("runs"),
        col("z2_6"),
        (col("z2_6") >= Z2Alpha05Micro).as("significant"))
  }

  /** Fleiss' kappa (Fleiss 1971) — [[cohensKappa]] generalized to n
    * raters per unit: the labeling-pipeline QA statistic when every
    * document is judged by a PANEL (n heuristic gates, n annotators,
    * n model versions) rather than a fixed pair. Input is long
    * format (unit, category) with one row per rating; every unit
    * must carry the same rating count n (enforced in-plan — Fleiss
    * assumes a fixed panel size).
    *
    * Exactness — both components are single exact divisions:
    *   P̄6  = 1e6·Σ_i(Σ_j n_ij² − n)  div  (N·n·(n−1))
    *   P̄e6 = 1e6·Σ_j C_j²           div  (N·n)²
    *   κ6  = 1e6·(P̄6 − P̄e6) div (1e6 − P̄e6)
    * (N units, n ratings/unit, n_ij = unit i's count of category j,
    * C_j = column totals; the final stage divides already-rounded
    * micro integers — the cohensKappa two-stage convention, negative
    * numerator truncates toward zero identically on both engines).
    * All raters unanimous on one category everywhere → P̄e = 1e6 →
    * κ6 = 0 by the limit convention. Returns one row (n_units,
    * n_raters, n_categories, pbar6, pe6, kappa6).
    *
    * Scale shape: one (unit, category) hash aggregate, one unit
    * re-aggregate, one category re-aggregate — all map-side
    * combinable; no pair enumeration (the er_metrics rule).
    */
  def fleissKappa(df: DataFrame, unitCol: Column, categoryCol: Column): DataFrame = {
    val cells = cached(
      df
        .filter(unitCol.isNotNull && categoryCol.isNotNull)
        .groupBy(unitCol.as("u"), categoryCol.as("cat"))
        .agg(count(lit(1)).as("c")))
    val n = broadcast(
      cells.groupBy(col("u")).agg(sum(col("c")).as("__n"))
        .agg(
          count(lit(1)).as("n_units"),
          min(col("__n")).as("__nmin"),
          max(col("__n")).as("__nmax"))
        .filter(
          assert_true(
            col("__nmin") === col("__nmax"),
            concat(
              lit("fleissKappa: every unit must carry the same rating count; saw "),
              col("__nmin").cast("string"), lit(".."), col("__nmax").cast("string"))).isNull))
    val pbar = cells
      .groupBy(col("u"))
      .agg((sum(col("c") * col("c"))).as("__ss"), sum(col("c")).as("__n"))
      .agg(sum(col("__ss") - col("__n")).as("__pnum"))
    val pe = cells
      .groupBy(col("cat"))
      .agg(sum(col("c")).as("cj"))
      .agg(
        count(lit(1)).as("n_categories"),
        sum(expr("CAST(cj AS DECIMAL(38,0)) * CAST(cj AS DECIMAL(38,0))")).as("__cc"))
    pbar
      .crossJoin(n)
      .crossJoin(broadcast(pe))
      .withColumn(
        "pbar6",
        expr(
          """CAST(
            |  (CAST(1000000 AS DECIMAL(38,0)) * CAST(__pnum AS DECIMAL(38,0)))
            |  div (CAST(n_units AS DECIMAL(38,0)) * CAST(__nmin AS DECIMAL(38,0))
            |       * CAST(__nmin - 1 AS DECIMAL(38,0)))
            |AS BIGINT)""".stripMargin))
      .withColumn(
        "pe6",
        expr(
          """CAST(
            |  (CAST(1000000 AS DECIMAL(38,0)) * __cc)
            |  div (CAST(n_units AS DECIMAL(38,0)) * CAST(__nmin AS DECIMAL(38,0))
            |       * CAST(n_units AS DECIMAL(38,0)) * CAST(__nmin AS DECIMAL(38,0)))
            |AS BIGINT)""".stripMargin))
      .withColumn(
        "kappa6",
        expr(
          """CASE WHEN pe6 >= 1000000 THEN CAST(0 AS BIGINT)
            |ELSE CAST(1000000 * (pbar6 - pe6) div (1000000 - pe6) AS BIGINT) END""".stripMargin))
      .select(
        col("n_units"), col("__nmin").as("n_raters"), col("n_categories"),
        col("pbar6"), col("pe6"), col("kappa6"))
  }

  /** Krippendorff's alpha, nominal metric (Krippendorff 1970, 2004) —
    * the MISSING-DATA inter-rater statistic completing the kappa
    * family: [[cohensKappa]] needs exactly 2 fixed raters,
    * [[fleissKappa]] a constant panel size; alpha accepts any number
    * of ratings per unit (annotator dropout, sampled double-rating,
    * heuristic gates that abstain) by weighting each unit's
    * disagreement by its own pairable count. Units with a single
    * rating carry no pairable values and drop out entirely —
    * including from the category margins, per the coincidence-matrix
    * construction.
    *
    *   Do = (1/n)·Σ_u [Σ_c n_uc(m_u − n_uc)] / (m_u − 1)
    *   De = (n² − Σ_c n_c²) / (n(n−1))          (n = Σ m_u pairable)
    *   alpha = 1 − Do/De
    *
    * Exactness: the per-unit division rounds ONCE to micro units off
    * exact integers — do6_u = 1e6·(m_u² − Σ_c n_uc²) div (m_u − 1),
    * the [[Checks.psiFromCounts]]-class per-term discipline — then
    * exact BIGINT sums; the final fold is one DECIMAL division:
    * alpha6 = 1e6 − (Σdo6·(n−1)) div (n² − Σn_c²). A single observed
    * category degenerates De to 0 → alpha6 = 0 (the fleissKappa
    * limit convention). Per-unit rating counts past ~3e6 would
    * overflow the m² stage — quantize upstream (documented bound).
    *
    * Scale shape: one (unit, category) hash aggregate, one per-unit
    * re-aggregate, one per-category re-aggregate over the
    * pairable-unit cells — all map-side combinable, no pair
    * enumeration. Returns one row (n_units, n, n_categories, do6,
    * alpha6).
    */
  def krippendorffAlpha(
      df: DataFrame,
      unitCol: Column,
      categoryCol: Column): DataFrame = {
    val cells = cached(
      df
        .filter(unitCol.isNotNull && categoryCol.isNotNull)
        .groupBy(unitCol.as("u"), categoryCol.as("cat"))
        .agg(count(lit(1)).as("c")))
    val units = cells
      .groupBy(col("u"))
      .agg(sum(col("c")).as("m"), sum(col("c") * col("c")).as("__ss"))
      .filter(col("m") >= 2L)
    val doAgg = units
      .select(
        col("u"),
        col("m"),
        expr(
          """CAST((CAST(1000000 AS DECIMAL(38,0))
            |       * (CAST(m AS DECIMAL(38,0)) * m - __ss))
            |div CAST(m - 1 AS DECIMAL(38,0)) AS BIGINT)""".stripMargin).as("__do6u"))
    val totals = doAgg
      .agg(
        count(lit(1)).as("n_units"),
        sum(col("m")).as("n"),
        sum(col("__do6u")).as("do6"))
    // category margins over PAIRABLE units only
    val catAgg = cells
      .join(units.select(col("u")), Seq("u"))
      .groupBy(col("cat"))
      .agg(sum(col("c")).as("__nc"))
      .agg(
        count(lit(1)).as("n_categories"),
        sum(expr("CAST(__nc AS DECIMAL(38,0)) * __nc")).cast("decimal(38,0)")
          .as("__cc"))
    totals
      .crossJoin(broadcast(catAgg))
      .withColumn(
        "__de",
        expr("CAST(n AS DECIMAL(38,0)) * n - __cc"))
      .withColumn(
        "alpha6",
        expr(
          """CASE WHEN __de IS NULL OR __de <= 0 THEN CAST(0 AS BIGINT)
            |ELSE CAST(1000000
            |  - (CAST(do6 AS DECIMAL(38,0)) * CAST(n - 1 AS DECIMAL(38,0))) div __de
            |AS BIGINT) END""".stripMargin))
      .select(
        col("n_units"), col("n"), col("n_categories"), col("do6"), col("alpha6"))
  }

  /** Delete-one-bucket jackknife variance for a RATIO metric (Quenouille
    * 1956; Tukey 1958 — the machinery every large-scale experimentation
    * platform uses for clicks-per-user-class metrics): a ratio of sums
    * is not a mean of anything, so its variance has no clean
    * closed form; the jackknife re-computes the ratio with each of k
    * disjoint buckets deleted and reads the spread of those leave-one-out
    * replicates:
    *
    *   r_(−j) = (X − x_j)/(N − n_j),   Var ≈ (k−1)/k · Σ_j (r_(−j) − r̄)²
    *
    * Exactness: per-replicate ratios round ONCE to micro units
    * (truncating, off exact integer sums), r̄6 = Σr_j6 div k rounds
    * once more, and the variance fold is exact DECIMAL cross-products
    * with one final division — deterministic and oracle-mirrored (the
    * spread of ALREADY-ROUNDED replicates, documented). A bucket whose
    * deletion empties the denominator fails fast in-plan (the jackknife
    * is undefined; a k that concentrated is a bucketing bug). The
    * bucket column is the caller's hash contract (e.g. user_id % k) —
    * deterministic bucketing is what makes replicates reproducible.
    * Returns one row (k, num, den, ratio6, rbar6, jk_var12).
    *
    * Scale shape: one hash aggregate to k cells, everything after is
    * k-bounded.
    */
  def jackknifeRatio(
      df: DataFrame,
      bucketCol: Column,
      numCol: Column,
      denCol: Column): DataFrame = {
    val cells = cached(
      df
        .filter(bucketCol.isNotNull && numCol.isNotNull && denCol.isNotNull)
        .groupBy(bucketCol.as("b"))
        .agg(sum(numCol.cast("long")).as("x"), sum(denCol.cast("long")).as("n")))
    val tot = broadcast(
      cells.agg(
        count(lit(1)).as("k"),
        sum(col("x")).as("__xt"),
        sum(col("n")).as("__nt")))
    val reps = cells
      .crossJoin(tot)
      .filter(
        assert_true(
          col("__nt") - col("n") > 0L,
          concat(
            lit("jackknifeRatio: deleting bucket "),
            col("b").cast("string"),
            lit(" empties the denominator — the jackknife is undefined"))).isNull)
      .withColumn(
        "__r6",
        expr(
          """CAST((CAST(1000000 AS DECIMAL(38,0)) * (__xt - x))
            |div CAST(__nt - n AS DECIMAL(38,0)) AS BIGINT)""".stripMargin))
    val rbar = broadcast(
      reps.agg(sum(col("__r6")).as("__rs"), count(lit(1)).as("__kk"))
        .withColumn("rbar6", expr("CAST(__rs div __kk AS BIGINT)")))
    reps
      .crossJoin(rbar.select(col("rbar6")))
      .groupBy(col("k"), col("__xt"), col("__nt"), col("rbar6"))
      .agg(
        sum(
          expr("CAST(__r6 - rbar6 AS DECIMAL(38,0)) * CAST(__r6 - rbar6 AS DECIMAL(38,0))"))
          .cast("decimal(38,0)").as("__ss"))
      .select(
        col("k"),
        col("__xt").as("num"),
        col("__nt").as("den"),
        expr(
          """CAST((CAST(1000000 AS DECIMAL(38,0)) * __xt)
            |div CAST(__nt AS DECIMAL(38,0)) AS BIGINT)""".stripMargin).as("ratio6"),
        col("rbar6"),
        expr(
          """CAST((CAST(k - 1 AS DECIMAL(38,0)) * __ss)
            |div CAST(k AS DECIMAL(38,0)) AS BIGINT)""".stripMargin).as("jk_var12"))
  }

  /** Poisson rate-ratio test (the conditional/binomial exact-form
    * chi², Przyborowski & Wilenski 1940) — the INCIDENCE comparison
    * every per-user rate question actually is: events per unit of
    * EXPOSURE (user-days), not per user, so an arm whose users
    * simply stick around longer doesn't fake a lift. Exposure is
    * the distinct (unit, day) count per arm; under the equal-rate
    * null the arm-A event count is Binomial(N, exp_a/(exp_a+exp_b)),
    * and the 1-df chi² has the exact integer form
    *
    *   z²·1e6 = 1e6·(O_a·exp_b − O_b·exp_a)²
    *            div (N·exp_a·exp_b)
    *
    * (the (exp_a+exp_b)² normalizations of the binomial mean and
    * variance cancel exactly: O_a − N·p = d/(exp_a+exp_b) and
    * N·p·(1−p) = N·exp_a·exp_b/(exp_a+exp_b)², so z² = d² div
    * (N·exp_a·exp_b) with d = O_a·exp_b − O_b·exp_a)
    *
    * (DECIMAL(38,0) cross-products, one truncating division), with
    * the rate ratio rr6 = (1e6·O_a·exp_b) div (O_b·exp_a) as the
    * effect size (0 when O_b = 0, the degenerate convention).
    * Exactly two arms, lexicographic (min, max), fail-fast in-plan.
    *
    * Scale shape: one distinct + two hash aggregates, a 2-row pivot,
    * 1-row output (side_a, side_b, o_a, o_b, exp_a, exp_b, rr6,
    * z2_6, significant).
    */
  def poissonRateRatio(
      df: DataFrame,
      sideCol: Column,
      unitCol: Column,
      dayCol: Column): DataFrame = {
    val base = df
      .filter(sideCol.isNotNull && unitCol.isNotNull && dayCol.isNotNull)
      .select(sideCol.cast("string").as("s"), unitCol.as("u"), dayCol.as("d"))
    val events = base.groupBy(col("s")).agg(count(lit(1)).as("o"))
    val expo = base.distinct().groupBy(col("s")).agg(count(lit(1)).as("ex"))
    val cells = cached(events.join(expo, Seq("s")))
    val sides = broadcast(
      cells.agg(
        count_distinct(col("s")).as("__ns"),
        min(col("s")).as("side_a"),
        max(col("s")).as("side_b")))
    cells
      .crossJoin(sides)
      .filter(
        assert_true(
          col("__ns") === 2L,
          concat(
            lit("poissonRateRatio: exactly 2 arms required, got "),
            col("__ns").cast("string"))).isNull)
      .groupBy(col("side_a"), col("side_b"))
      .agg(
        sum(when(col("s") === col("side_a"), col("o")).otherwise(0L)).as("o_a"),
        sum(when(col("s") === col("side_b"), col("o")).otherwise(0L)).as("o_b"),
        sum(when(col("s") === col("side_a"), col("ex")).otherwise(0L)).as("exp_a"),
        sum(when(col("s") === col("side_b"), col("ex")).otherwise(0L)).as("exp_b"))
      .withColumn(
        "rr6",
        expr(
          """CASE WHEN o_b = 0 OR exp_a = 0 THEN CAST(0 AS BIGINT)
            |ELSE CAST((CAST(1000000 AS DECIMAL(38,0)) * o_a * exp_b)
            |div (CAST(o_b AS DECIMAL(38,0)) * exp_a) AS BIGINT) END""".stripMargin))
      .withColumn(
        "z2_6",
        expr(
          """CASE WHEN o_a + o_b = 0 OR exp_a = 0 OR exp_b = 0 THEN CAST(0 AS BIGINT)
            |ELSE CAST(
            |  (CAST(1000000 AS DECIMAL(38,0))
            |   * (CAST(o_a AS DECIMAL(38,0)) * exp_b
            |      - CAST(o_b AS DECIMAL(38,0)) * exp_a)
            |   * (CAST(o_a AS DECIMAL(38,0)) * exp_b
            |      - CAST(o_b AS DECIMAL(38,0)) * exp_a))
            |  div (CAST(o_a + o_b AS DECIMAL(38,0))
            |       * CAST(exp_a AS DECIMAL(38,0)) * CAST(exp_b AS DECIMAL(38,0)))
            |AS BIGINT) END""".stripMargin))
      .select(
        col("side_a"), col("side_b"), col("o_a"), col("o_b"),
        col("exp_a"), col("exp_b"), col("rr6"), col("z2_6"),
        (col("z2_6") >= Z2Alpha05Micro).as("significant"))
  }

  /** Quantile treatment effects (Doksum 1974; the Lehmann QTE) — the
    * DISTRIBUTIONAL readout every mean-based test hides: at each of
    * k population quantiles, how far apart are the two arms' value
    * distributions? A treatment that moves only the tail (a latency
    * fix for the p99, a spend cap for whales) is invisible to
    * [[welchT]] and diluted in [[mannWhitneyU]]; the QTE table shows
    * WHERE the distribution moved.
    *
    * Exactness: each arm's quantiles are exact ORDER STATISTICS —
    * the value at rank max(1, d·n_arm div k) under [[Relational
    * .globalRank]]'s range-partitioned sort (the equiDepthBoundaries
    * probe idiom; the d-th order-statistic VALUE is invariant to how
    * ties permute, so no tie column is needed) — and qte is their
    * exact integer difference. No interpolation, no floats. Sides
    * are the lexicographic (min, max) of `sideCol`; exactly two
    * required (driver-side require off a 2-row bounded distinct —
    * the documented constant bootstrap class). Returns
    * (bucket, side_a, side_b, q_a, q_b, qte), k rows.
    */
  def quantileTreatmentEffect(
      df: DataFrame,
      sideCol: Column,
      valueCol: Column,
      k: Int): DataFrame = {
    require(k >= 1 && k <= 100, "k must be in 1..100")
    val base = df
      .filter(sideCol.isNotNull && valueCol.isNotNull)
      .select(sideCol.cast("string").as("s"), valueCol.cast("long").as("v"))
    val sides = base.select(col("s")).distinct().orderBy(col("s"))
      .collect().map(_.getString(0))
    require(sides.length == 2,
      s"quantileTreatmentEffect: exactly 2 sides required, got ${sides.length}")
    val (sa, sb) = (sides(0), sides(1))
    def probes(side: String, out: String): DataFrame = {
      val in = base.filter(col("s") === side).select(col("v"))
      val ranked = Relational.globalRank(in, Seq(col("v")), "__rank")
      val n = in.count()
      val spark = df.sparkSession
      import spark.implicits._
      val targets = (1 to k)
        .map(d => (d.toLong, math.max(1L, d.toLong * n / k)))
        .toDF("bucket", "__rank")
      ranked.join(broadcast(targets), Seq("__rank")).select(col("bucket"), col("v").as(out))
    }
    probes(sa, "q_a")
      .join(probes(sb, "q_b"), Seq("bucket"))
      .select(
        col("bucket"),
        lit(sa).as("side_a"),
        lit(sb).as("side_b"),
        col("q_a"),
        col("q_b"),
        (col("q_a") - col("q_b")).as("qte"))
      .orderBy(col("bucket"))
  }

  /** Cochran–Mantel–Haenszel test (Cochran 1954; Mantel & Haenszel
    * 1959) — the STRATIFIED 2×2 association test: does the treatment
    * move the binary outcome once a confounder is held fixed, by
    * summing each stratum's hypergeometric evidence instead of
    * pooling rows (pooling invites Simpson's paradox — strata can
    * all agree while the merged table flips sign). Per stratum, with
    * margins (n_a, x_a, n_b, x_b), X = x_a + x_b, n = n_a + n_b:
    *
    *   E = n_a·X/n,   V = n_a·n_b·X·(n−X)/(n²(n−1)),
    *   z² = (O − ΣE)²/ΣV with O = Σx_a  (uncorrected — no 0.5
    *   continuity term, documented),
    *
    * plus the Mantel–Haenszel COMMON ODDS RATIO,
    * OR = Σ(x_a·(n_b−x_b)/n) / Σ(x_b·(n_a−x_a)/n) — the effect size
    * the test is about.
    *
    * Exactness — the [[Series.logRank]] per-term discipline on
    * strata instead of ages: e6/v6/or-numerator/or-denominator each
    * round ONCE per stratum to micro units off exact DECIMAL(38,0)
    * cross-products, then exact BIGINT sums; the final z² and or6
    * are one DECIMAL division each. A stratum with only one variant
    * present contributes O = E and V = 0 — harmless by construction.
    * Exactly TWO variants globally, lexicographic (min, max), fail
    * fast otherwise. ΣV = 0 → z2_6 = 0; OR denominator 0 → or6 = 0
    * (both the established degenerate conventions).
    *
    * Scale shape: one (stratum, variant) hash aggregate, a stratum-
    * bounded pivot, 1-row output (variant_a, variant_b, k_strata, n,
    * o_a, e6, v6, z2_6, or_mh6, significant).
    */
  def mantelHaenszel(
      df: DataFrame,
      stratumCol: Column,
      variantCol: Column,
      successCol: Column): DataFrame = {
    val cells = cached(
      df
        .filter(stratumCol.isNotNull && variantCol.isNotNull && successCol.isNotNull)
        .groupBy(stratumCol.as("st"), variantCol.as("v"))
        .agg(
          count(lit(1)).as("n"),
          sum(when(successCol.cast("boolean"), 1L).otherwise(0L)).as("x")))
    val sides = broadcast(
      cells.agg(
        count_distinct(col("v")).as("__nv"),
        min(col("v")).as("variant_a"),
        max(col("v")).as("variant_b")))
    val strata = cells
      .crossJoin(sides)
      .filter(
        assert_true(
          col("__nv") === 2L,
          concat(
            lit("mantelHaenszel: exactly 2 variants required, got "),
            col("__nv").cast("string"))).isNull)
      .groupBy(col("st"), col("variant_a"), col("variant_b"))
      .agg(
        sum(when(col("v") === col("variant_a"), col("n")).otherwise(0L)).as("na"),
        sum(when(col("v") === col("variant_a"), col("x")).otherwise(0L)).as("xa"),
        sum(when(col("v") === col("variant_b"), col("n")).otherwise(0L)).as("nb"),
        sum(when(col("v") === col("variant_b"), col("x")).otherwise(0L)).as("xb"))
      .withColumn(
        "__e6",
        expr(
          """CASE WHEN na + nb = 0 THEN CAST(0 AS BIGINT)
            |ELSE CAST((CAST(1000000 AS DECIMAL(38,0)) * na * (xa + xb))
            |div (na + nb) AS BIGINT) END""".stripMargin))
      .withColumn(
        "__v6",
        expr(
          """CASE WHEN na + nb < 2 THEN CAST(0 AS BIGINT)
            |ELSE CAST(
            |  (CAST(1000000 AS DECIMAL(38,0)) * na * nb * (xa + xb)
            |   * (na + nb - xa - xb))
            |  div (CAST(na + nb AS DECIMAL(38,0)) * (na + nb) * (na + nb - 1))
            |AS BIGINT) END""".stripMargin))
      .withColumn(
        "__rn6",
        expr(
          """CASE WHEN na + nb = 0 THEN CAST(0 AS BIGINT)
            |ELSE CAST((CAST(1000000 AS DECIMAL(38,0)) * xa * (nb - xb))
            |div (na + nb) AS BIGINT) END""".stripMargin))
      .withColumn(
        "__rd6",
        expr(
          """CASE WHEN na + nb = 0 THEN CAST(0 AS BIGINT)
            |ELSE CAST((CAST(1000000 AS DECIMAL(38,0)) * xb * (na - xa))
            |div (na + nb) AS BIGINT) END""".stripMargin))
    strata
      .groupBy(col("variant_a"), col("variant_b"))
      .agg(
        count(lit(1)).as("k_strata"),
        sum(col("na") + col("nb")).as("n"),
        sum(col("xa")).as("o_a"),
        sum(col("__e6")).as("e6"),
        sum(col("__v6")).as("v6"),
        sum(col("__rn6")).as("__rn"),
        sum(col("__rd6")).as("__rd"))
      .withColumn(
        "z2_6",
        expr(
          """CASE WHEN v6 <= 0 THEN CAST(0 AS BIGINT)
            |ELSE CAST(
            |  ((CAST(1000000 AS DECIMAL(38,0)) * o_a - e6)
            |   * (CAST(1000000 AS DECIMAL(38,0)) * o_a - e6))
            |  div CAST(v6 AS DECIMAL(38,0))
            |AS BIGINT) END""".stripMargin))
      .withColumn(
        "or_mh6",
        expr(
          """CASE WHEN __rd <= 0 THEN CAST(0 AS BIGINT)
            |ELSE CAST((CAST(1000000 AS DECIMAL(38,0)) * __rn) div __rd AS BIGINT)
            |END""".stripMargin))
      .select(
        col("variant_a"), col("variant_b"), col("k_strata"), col("n"),
        col("o_a"), col("e6"), col("v6"), col("z2_6"), col("or_mh6"),
        (col("z2_6") >= Z2Alpha05Micro).as("significant"))
  }

  /** Sign test (Arbuthnott 1710 — the oldest test in the book) over
    * PAIRED pre/post values: count units that moved up vs down,
    * ignore ties, and ask whether the split could be a fair coin.
    * The assumption-free companion of [[wilcoxonSignedRank]] (which
    * also weighs HOW FAR units moved): when magnitudes are
    * untrustworthy (censored, clipped, ordinal), the sign test is
    * what remains.
    *
    * Exactness: z²·1e6 = 1e6·(pos − neg)² div (pos + neg) — the
    * square of the normal approximation to Binomial(pos+neg, ½),
    * one truncating division off exact counts; pos + neg = 0 (all
    * ties) → 0 by convention. Returns one row (n_pos, n_neg, n_tie,
    * z2_6, significant).
    *
    * Scale shape: one aggregate pass, map-side combined.
    */
  def signTest(df: DataFrame, preCol: Column, postCol: Column): DataFrame =
    df
      .filter(preCol.isNotNull && postCol.isNotNull)
      .agg(
        sum(when(postCol > preCol, 1L).otherwise(0L)).as("n_pos"),
        sum(when(postCol < preCol, 1L).otherwise(0L)).as("n_neg"),
        sum(when(postCol === preCol, 1L).otherwise(0L)).as("n_tie"))
      .withColumn(
        "z2_6",
        expr(
          """CASE WHEN n_pos + n_neg = 0 THEN CAST(0 AS BIGINT)
            |ELSE CAST(
            |  (CAST(1000000 AS DECIMAL(38,0)) * (n_pos - n_neg) * (n_pos - n_neg))
            |  div CAST(n_pos + n_neg AS DECIMAL(38,0))
            |AS BIGINT) END""".stripMargin))
      .select(
        col("n_pos"), col("n_neg"), col("n_tie"), col("z2_6"),
        (col("z2_6") >= Z2Alpha05Micro).as("significant"))

  /** Friedman test (Friedman 1937) + Kendall's W — the k-treatment
    * PAIRED continuous test completing the grid ([[cochranQ]] is its
    * binary special case, [[kruskalWallis]] its unpaired sibling):
    * each unit ranks the k treatments among themselves, so
    * between-unit scale differences cancel entirely — the right test
    * for "did the mix shift within users" when users differ 100× in
    * volume.
    *
    * Exactness on the per-unit doubled-mid-rank chassis (2r + t − 1
    * within each unit's own k values — always integer):
    *
    *   chi2_6 = 1e6·(k−1)·Σ_j (R2_j − n(k+1))²
    *            div (Σ_rows d² − n·k·(k+1)²)
    *
    * — the tie-corrected statistic as ONE truncating DECIMAL
    * division (R2_j = treatment j's doubled rank sum; the
    * denominator is the doubled-rank sum of squares about the tie-
    * free total, 0 only when every unit is fully tied → 0
    * convention). Kendall's W = chi²/(n(k−1)) rides along as one
    * more division of the rounded statistic — the 0..1 concordance
    * effect size. Units must carry exactly k treatment rows
    * (fail-fast); significance vs chi²_{k−1} ([[Chi2Alpha05Micro]],
    * 2..11 treatments). Returns one row (k, n_units, chi2_6, w6,
    * significant).
    *
    * Scale shape: ranks cost one per-(unit, value) aggregate and one
    * per-unit window over ≤ k distinct values — never a corpus-wide
    * sort; everything after is treatment-bounded.
    */
  def friedman(
      df: DataFrame,
      unitCol: Column,
      treatmentCol: Column,
      valueCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = cached(
      df
        .filter(unitCol.isNotNull && treatmentCol.isNotNull && valueCol.isNotNull)
        .select(unitCol.as("u"), treatmentCol.as("trt"), valueCol.cast("long").as("v")))
    val k = broadcast(base.agg(count_distinct(col("trt")).as("__k")))
    val dv = base.groupBy(col("u"), col("v")).agg(count(lit(1)).as("t"))
      .withColumn(
        "rmin",
        coalesce(
          sum(col("t")).over(
            Window.partitionBy(col("u")).orderBy(col("v"))
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)) + 1L)
    val ranked = base
      .join(dv, Seq("u", "v"))
      .withColumn("d", lit(2L) * col("rmin") + col("t") - 1L)
    val units = ranked.groupBy(col("u")).agg(count(lit(1)).as("__nt"))
      .crossJoin(k)
      .filter(
        assert_true(
          col("__nt") === col("__k"),
          concat(
            lit("friedman: every unit must carry exactly k treatment rows; unit with "),
            col("__nt").cast("string"), lit(" of "), col("__k").cast("string"))).isNull)
    val nAndD2 = broadcast(
      units.agg(count(lit(1)).as("n_units"))
        .crossJoin(broadcast(ranked.agg(sum(col("d") * col("d")).as("__d2")))))
    ranked
      .groupBy(col("trt"))
      .agg(sum(col("d")).as("r2"))
      .crossJoin(nAndD2)
      .crossJoin(k)
      .filter(
        assert_true(
          col("__k").between(2L, 11L),
          concat(lit("friedman: 2..11 treatments supported (chi-square literal table), got "),
            col("__k").cast("string"))).isNull)
      .withColumn(
        "__num",
        expr(
          """CAST(r2 - n_units * (__k + 1) AS DECIMAL(38,0))
            |* CAST(r2 - n_units * (__k + 1) AS DECIMAL(38,0))""".stripMargin))
      .groupBy(col("__k"), col("n_units"), col("__d2"))
      .agg(sum(col("__num")).as("__numsum"))
      .withColumn(
        "chi2_6",
        expr(
          """CASE WHEN __d2 - n_units * __k * (__k + 1) * (__k + 1) = 0
            |THEN CAST(0 AS BIGINT)
            |ELSE CAST(
            |  (CAST(1000000 AS DECIMAL(38,0)) * CAST(__k - 1 AS DECIMAL(38,0)) * __numsum)
            |  div (CAST(__d2 AS DECIMAL(38,0))
            |       - CAST(n_units AS DECIMAL(38,0)) * CAST(__k AS DECIMAL(38,0))
            |         * CAST(__k + 1 AS DECIMAL(38,0)) * CAST(__k + 1 AS DECIMAL(38,0)))
            |AS BIGINT) END""".stripMargin))
      .withColumn(
        "w6",
        expr("CAST(chi2_6 div (n_units * (__k - 1)) AS BIGINT)"))
      .withColumn(
        "__thr",
        element_at(
          array(Chi2Alpha05Micro.map(lit): _*),
          (col("__k") - 1L).cast("int")))
      .select(
        col("__k").as("k"), col("n_units"), col("chi2_6"), col("w6"),
        (col("chi2_6") >= col("__thr")).as("significant"))
  }

  /** Odds ratio with Wald log-interval — the epidemiology-standard
    * 2×2 effect readout next to [[twoProportionZ]]'s significance:
    * HOW MUCH more likely is success under arm b than arm a, with an
    * interval a reader can act on (significance alone says nothing
    * about size). Per group with the (min, max)-variant pivot:
    *
    *   ln OR = ln( x_b·(n_a−x_a) / (x_a·(n_b−x_b)) )
    *   CI    = ln OR ± 1.959964·√(1/x_a + 1/(n_a−x_a)
    *                              + 1/x_b + 1/(n_b−x_b))
    *
    * Haldane–Anscombe +0.5 continuity correction applied to all four
    * cells (in HALF-UNITS so the arithmetic stays exact integers:
    * cell' = 2·cell + 1), which keeps zero cells finite — the
    * documented convention. ln and the √ run on identical doubles
    * built from exact integers, each bound micro-rounded ONCE;
    * `significant` = the interval excludes 0 (integer compares).
    * Returns (group, variant_a, variant_b, n_a, x_a, n_b, x_b,
    * ln_or6, ci_lo6, ci_hi6, significant).
    */
  def oddsRatio(
      df: DataFrame,
      groupCol: Column,
      variantCol: Column,
      successCol: Column): DataFrame = {
    val cells = cached(
      df
        .filter(groupCol.isNotNull && variantCol.isNotNull && successCol.isNotNull)
        .groupBy(groupCol.as("g"), variantCol.as("v"))
        .agg(count(lit(1)).as("n"), sum(successCol.cast("long")).as("x")))
    val mins = cells.groupBy(col("g"))
      .agg(
        count(lit(1)).as("__nv"),
        min(col("v")).as("variant_a"),
        max(col("v")).as("variant_b"))
      .filter(col("__nv") === 2L)
    mins
      .join(
        cells.select(col("g"), col("v").as("variant_a"), col("n").as("n_a"), col("x").as("x_a")),
        Seq("g", "variant_a"))
      .join(
        cells.select(col("g"), col("v").as("variant_b"), col("n").as("n_b"), col("x").as("x_b")),
        Seq("g", "variant_b"))
      // Haldane-Anscombe half-unit cells: 2*cell + 1, exact integers
      .withColumn("__a1", lit(2L) * col("x_a") + 1L)
      .withColumn("__a0", lit(2L) * (col("n_a") - col("x_a")) + 1L)
      .withColumn("__b1", lit(2L) * col("x_b") + 1L)
      .withColumn("__b0", lit(2L) * (col("n_b") - col("x_b")) + 1L)
      .withColumn(
        "ln_or6",
        round(
          log(
            (col("__b1").cast("double") * col("__a0").cast("double")) /
              (col("__a1").cast("double") * col("__b0").cast("double"))) * lit(1e6),
          0).cast("long"))
      .withColumn(
        "__hw6",
        round(
          lit(1.959964) * sqrt(
            lit(2.0) / col("__a1").cast("double") + lit(2.0) / col("__a0").cast("double") +
              lit(2.0) / col("__b1").cast("double") + lit(2.0) / col("__b0").cast("double")) *
            lit(1e6),
          0).cast("long"))
      .select(
        col("g").as("group"), col("variant_a"), col("variant_b"),
        col("n_a"), col("x_a"), col("n_b"), col("x_b"),
        col("ln_or6"),
        (col("ln_or6") - col("__hw6")).as("ci_lo6"),
        (col("ln_or6") + col("__hw6")).as("ci_hi6"),
        (col("ln_or6") - col("__hw6") > 0L || col("ln_or6") + col("__hw6") < 0L)
          .as("significant"))
  }

  /** Wilcoxon signed-rank test (Wilcoxon 1945) — the PAIRED
    * nonparametric test: each unit is its own control (pre vs post),
    * and the question is whether the within-unit differences are
    * symmetrically scattered around zero. The paired companion of
    * [[mannWhitneyU]], sharing its doubled-mid-rank machinery: rank
    * |d| over the DISTINCT-|d| count table (2r + t − 1 per member,
    * always integer), T2 = doubled rank-sum of the d > 0 side.
    * Zero differences are DROPPED (the classic Wilcoxon reduction;
    * their count is reported as n_zero so the caller sees how much
    * signal the drop discarded).
    *
    *   z²·1e6 = 3e6 · (2·T2 − n(n+1))² div (2n(n+1)(2n+1) − Σ(t³−t))
    *
    * — the tie-corrected normal approximation as ONE truncating
    * division of exact integers. Valid range: (2T2 − n(n+1))² reaches
    * n⁴, so DECIMAL(38,0) holds to n ≈ 3e7 nonzero pairs (micro
    * numerator 3e6·n⁴ ≤ 1e38) — document-enforced, plenty for paired
    * designs. All-zero differences (n = 0) degenerate the
    * denominator → z²6 = 0, not-significant.
    *
    * Scale shape: one aggregate to the per-unit difference, one hash
    * aggregate to the distinct-|d| count table, one DISTRIBUTED
    * prefix sum over the VALUE DOMAIN (never the corpus, never a
    * single task — [[Relational.globalCumSum]]), 1-row final
    * aggregate.
    * Returns one row (n, n_zero, t2x — the DOUBLED positive-rank sum,
    * z2_6, significant).
    */
  def wilcoxonSignedRank(df: DataFrame, preCol: Column, postCol: Column): DataFrame = {
    // ONE corpus scan to the signed-difference count table (value-
    // domain bounded, persisted); zero count, tie counts and the
    // positive-side membership all derive from it
    val dc = cached(
      df
        .filter(preCol.isNotNull && postCol.isNotNull)
        .groupBy((postCol.cast("long") - preCol.cast("long")).as("d"))
        .agg(count(lit(1)).as("c")))
    val zeroCnt = broadcast(
      dc.agg(sum(when(col("d") === 0L, col("c")).otherwise(0L)).as("n_zero")))
    val counts = dc
      .filter(col("d") =!= 0L)
      .groupBy(abs(col("d")).as("ad"))
      .agg(
        sum(col("c")).as("t"),
        sum(when(col("d") > 0L, col("c")).otherwise(0L)).as("np_v"))
    // min-rank via the DISTRIBUTED prefix sum over the distinct-|d|
    // table (range-partitioned sort + per-partition fold) — never a
    // single-task Window.orderBy
    val ranked = Relational
      .globalCumSum(counts, Seq(col("ad")), "t", "__below")
      .withColumn("rmin", col("__below") + 1L)
      .drop("__below")
    val agg = ranked.agg(
      sum(col("t")).as("n"),
      // doubled rank-sum and tie cubes in DECIMAL from the first
      // multiply (the rocAucFromCells.__r2p discipline) — the BIGINT
      // t2x output column is re-cast at the boundary below
      sum(col("np_v").cast("decimal(38,0)")
        * (lit(2L) * col("rmin") + col("t") - 1L)).as("t2x"),
      sum(col("t").cast("decimal(38,0)") * col("t") * col("t") - col("t"))
        .as("__ties3"))
    agg
      .na.fill(0L, Seq("n", "t2x", "__ties3"))
      .crossJoin(zeroCnt)
      .na.fill(0L, Seq("n_zero"))
      .withColumn(
        "__den",
        expr(
          """CAST(2 AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0))
            |* CAST(n + 1 AS DECIMAL(38,0)) * CAST(2 * n + 1 AS DECIMAL(38,0))
            |- CAST(__ties3 AS DECIMAL(38,0))""".stripMargin))
      .withColumn(
        "z2_6",
        expr(
          """CASE WHEN __den <= 0 THEN CAST(0 AS BIGINT)
            |ELSE CAST(
            |  (CAST(3000000 AS DECIMAL(38,0))
            |   * (CAST(2 AS DECIMAL(38,0)) * CAST(t2x AS DECIMAL(38,0))
            |      - CAST(n AS DECIMAL(38,0)) * CAST(n + 1 AS DECIMAL(38,0)))
            |   * (CAST(2 AS DECIMAL(38,0)) * CAST(t2x AS DECIMAL(38,0))
            |      - CAST(n AS DECIMAL(38,0)) * CAST(n + 1 AS DECIMAL(38,0))))
            |  div __den
            |AS BIGINT) END""".stripMargin))
      .select(
        col("n"), col("n_zero"), col("t2x").cast("long").as("t2x"), col("z2_6"),
        (col("z2_6") >= Z2Alpha05Micro).as("significant"))
  }

  /** Jonckheere–Terpstra ordered k-arm trend test (Jonckheere 1954;
    * Terpstra 1952) — the CONTINUOUS-response sibling of
    * [[cochranArmitage]] and the ordered-alternative upgrade of
    * [[kruskalWallis]]: do values shift in the HYPOTHESIZED arm
    * order? JT = Σ over ordered arm pairs g < h of
    * #(x_g < x_h) + ½·#(x_g = x_h); the DOUBLED statistic JT2 stays
    * integer and folds from the (arm, value) COUNT GRID:
    *
    *   JT2 = Σ_v Σ_{g<h} c_h(v) · (2·B_g(v) + c_g(v))
    *
    * where B_g(v) (arm g's count strictly below v) comes from ONE
    * [[Relational.globalCumSum]] over the gap-filled (arm × value-
    * spine) grid ordered by (arm, v), minus a ≤11-row arm-offset
    * broadcast — per-arm prefixes with NO per-arm single-task window.
    * The arm pairing is a k²-bounded self-join per spine value.
    *
    * Significance with the FULL Lehmann (1975) tie-corrected
    * variance — all three correction terms as exact integer
    * aggregates over arm sizes n_g and value-tie sizes t_v:
    *
    *   A  = N(N−1)(2N+5) − Σ_g n_g(n_g−1)(2n_g+5) − Σ_v t_v(t_v−1)(2t_v+5)
    *   B  = [Σ_g n_g(n_g−1)(n_g−2)] · [Σ_v t_v(t_v−1)(t_v−2)]
    *   C  = [Σ_g n_g(n_g−1)] · [Σ_v t_v(t_v−1)]
    *   72·Var ≈ var72 = (A·N(N−1)(N−2) + 2B + 9(N−2)C) div (N(N−1)(N−2))
    *   z²·1e6 = 18e6 · (JT2 − E2)² div var72,  E2 = (N² − Σn_g²)/2
    *
    * — staged truncating divisions at pinned boundaries (the
    * oneWayAnova convention), oracle-mirrored stage for stage; E2 is
    * always integer (parity argument: x² ≡ x mod 2). Valid range:
    * A·N³ ≈ 2N⁶ ≤ 1e38 → N ≲ 1e6 rows; collapse to the count grid
    * upstream (it already is one) or subsample beyond. Degenerate
    * var72 ≤ 0 (everything tied / one arm) scores 0; 2 ≤ k ≤ 11
    * fail-fast. Two-sided vs the chi²₁ literal [[Z2Alpha05Micro]];
    * the ordered one-sided reading checks sign(JT2 − E2) alongside.
    *
    * Returns one row (k, n, jt2, e2, z2_6, significant).
    */
  def jonckheereTerpstra(
      df: DataFrame,
      armCol: Column,
      valueCol: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val va = cached(
      df
        .filter(armCol.isNotNull && valueCol.isNotNull)
        .groupBy(armCol.cast("long").as("arm"), valueCol.cast("long").as("v"))
        .agg(count(lit(1)).as("c")))
    // arm totals: k ≤ 11 fail-fast, so the offsets are a documented
    // bounded-constant driver bootstrap
    val armTotals = va.groupBy(col("arm")).agg(sum(col("c")).as("n_g"))
      .orderBy(col("arm")).collect().map(r => (r.getLong(0), r.getLong(1)))
    require(
      armTotals.length >= 2 && armTotals.length <= 11,
      s"jonckheereTerpstra: 2..11 ordered arms required, got ${armTotals.length}")
    // DIVSWEEP Class C bound pushed in-plan: the Lehmann variance's
    // A·N³ cross-products exhaust DECIMAL(38) headroom past the
    // documented N ≈ 1e6 — fail at PLAN time with the remedy, not
    // mid-job with an ANSI ArithmeticException
    locally {
      val nTotal = armTotals.map(_._2).sum
      require(
        nTotal <= 1000000L,
        s"jonckheereTerpstra: N = $nTotal exceeds the documented DECIMAL(38) " +
          "validity bound 1e6 (A·N³ variance cross-products) — collapse to " +
          "the count grid or subsample upstream (DIVSWEEP Class C)")
    }
    val offsets = broadcast(
      armTotals.toSeq
        .scanLeft((0L, 0L)) { case ((_, acc), (a, n0)) => (a, acc + n0) }
        .sliding(2).map { case Seq((_, prev), (a, _)) => (a, prev) }.toSeq
        .toDF("arm", "__off"))
    val spine = va.select(col("v")).distinct()
    val arms = va.select(col("arm")).distinct()
    val filled = spine.crossJoin(arms)
      .join(va, Seq("arm", "v"), "left")
      .na.fill(0L, Seq("c"))
    // B_g(v) = global exclusive cumsum under (arm, v) minus the sum of
    // all earlier arms' totals
    val bg = Relational
      .globalCumSum(filled, Seq(col("arm"), col("v")), "c", "__cum")
      .join(offsets, Seq("arm"))
      .select(
        col("v"), col("arm").as("ag"), col("c").as("cg"),
        (col("__cum") - col("__off")).as("b"))
    val jt = bg
      .join(va.select(col("v"), col("arm").as("ah"), col("c").as("ch")), Seq("v"))
      .filter(col("ag") < col("ah"))
      .agg(coalesce(
        // JT2 terms in DECIMAL from the first multiply — ch·(2·B+c)
        // sums to ~N² concordant pairs, past 2^63 at N ≈ 3e9
        sum(col("ch").cast("decimal(38,0)") * (lit(2L) * col("b") + col("cg"))),
        lit(0L).cast("decimal(38,0)")).as("jt2"))
    // the Lehmann variance inputs are n³-class PER GROUP — n_g³ and
    // t_v³ wrap BIGINT already at ~2.1e6 rows per arm / per tied
    // value, far below any corpus bound, so every cube chain starts
    // in DECIMAL(38,0)
    val gStats = broadcast(
      va.groupBy(col("arm")).agg(sum(col("c")).as("n_g"))
        .agg(
          sum(col("n_g")).as("n"),
          sum(col("n_g").cast("decimal(38,0)") * col("n_g")).as("__sq"),
          sum(col("n_g").cast("decimal(38,0)") * (col("n_g") - 1L)
            * (lit(2L) * col("n_g") + 5L)).as("__ga"),
          sum(col("n_g").cast("decimal(38,0)") * (col("n_g") - 1L)
            * (col("n_g") - 2L)).as("__gb"),
          sum(col("n_g").cast("decimal(38,0)") * (col("n_g") - 1L)).as("__gc")))
    val tStats = broadcast(
      va.groupBy(col("v")).agg(sum(col("c")).as("t"))
        .agg(
          sum(col("t").cast("decimal(38,0)") * (col("t") - 1L)
            * (lit(2L) * col("t") + 5L)).as("__ta"),
          sum(col("t").cast("decimal(38,0)") * (col("t") - 1L)
            * (col("t") - 2L)).as("__tb"),
          sum(col("t").cast("decimal(38,0)") * (col("t") - 1L)).as("__tc")))
    jt
      .crossJoin(gStats)
      .crossJoin(tStats)
      .withColumn("k", lit(armTotals.length.toLong))
      .withColumn("e2", expr("(CAST(n AS DECIMAL(38,0)) * n - __sq) div 2"))
      .withColumn(
        "__var72",
        expr(
          """CASE WHEN n < 3 THEN CAST(0 AS DECIMAL(38,0))
            |ELSE
            |  ((CAST(n AS DECIMAL(38,0)) * CAST(n - 1 AS DECIMAL(38,0))
            |      * CAST(2 * n + 5 AS DECIMAL(38,0))
            |    - CAST(__ga AS DECIMAL(38,0)) - CAST(__ta AS DECIMAL(38,0)))
            |   * CAST(n AS DECIMAL(38,0)) * CAST(n - 1 AS DECIMAL(38,0))
            |   * CAST(n - 2 AS DECIMAL(38,0))
            |   + CAST(2 AS DECIMAL(38,0)) * CAST(__gb AS DECIMAL(38,0))
            |     * CAST(__tb AS DECIMAL(38,0))
            |   + CAST(9 AS DECIMAL(38,0)) * CAST(n - 2 AS DECIMAL(38,0))
            |     * CAST(__gc AS DECIMAL(38,0)) * CAST(__tc AS DECIMAL(38,0)))
            |  div (CAST(n AS DECIMAL(38,0)) * CAST(n - 1 AS DECIMAL(38,0))
            |       * CAST(n - 2 AS DECIMAL(38,0))) END""".stripMargin))
      .withColumn(
        "z2_6",
        expr(
          """CASE WHEN __var72 <= 0 THEN CAST(0 AS BIGINT)
            |ELSE CAST(
            |  (CAST(18000000 AS DECIMAL(38,0))
            |   * CAST(jt2 - e2 AS DECIMAL(38,0)) * CAST(jt2 - e2 AS DECIMAL(38,0)))
            |  div __var72
            |AS BIGINT) END""".stripMargin))
      .select(
        col("k"), col("n"),
        col("jt2").cast("long").as("jt2"), col("e2").cast("long").as("e2"),
        col("z2_6"),
        (col("z2_6") >= Z2Alpha05Micro).as("significant"))
  }

  /** Page's L trend test (Page, JASA 1963) — the ORDERED-alternative
    * companion of [[friedman]] on the same per-unit rank chassis:
    * Friedman asks "did ANY treatment shift"; Page asks "do the
    * treatments increase in the HYPOTHESIZED order" and buys the
    * power an omnibus test wastes when the order is known (dose
    * steps, time periods, model-size ladders). `treatmentCol` must
    * cast to integers whose NUMERIC ORDER is the hypothesis; weights
    * are the dense 1..k positions of the distinct values (a ≤11-row
    * sorted driver bootstrap — the documented bounded-constant
    * class).
    *
    * Doubled-mid-rank exactness: with per-unit doubled ranks d
    * (2r + t − 1, always integer), L2 = Σ_rows w·d = 2L and
    *
    *   z²·1e6 = 36e6 · (L2 − n·k(k+1)²/2)² div (n·k²(k+1)²(k−1))
    *
    * — exact integer cross-products in DECIMAL(38,0), ONE truncating
    * division (E[L2] = n·k(k+1)²/2 is always an integer). Ties take
    * mid-ranks; the variance is the classic no-tie closed form (the
    * standard Page approximation — the test assumes continuous
    * responses; heavy ties warrant [[friedman]] instead).
    * Significance vs the chi²₁ literal [[Z2Alpha05Micro]] (two-sided
    * on z; callers wanting the one-sided ordered alternative check
    * sign(L2 − E2) alongside). Every unit must carry exactly k
    * treatment rows (fail-fast, the friedman panel contract);
    * 3 ≤ k ≤ 11.
    *
    * Returns one row (k, n_units, l2, e2, z2_6, significant).
    */
  def pageTrend(
      df: DataFrame,
      unitCol: Column,
      treatmentCol: Column,
      valueCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val base = cached(
      df
        .filter(unitCol.isNotNull && treatmentCol.isNotNull && valueCol.isNotNull)
        .select(
          unitCol.as("u"),
          treatmentCol.cast("long").as("trt"),
          valueCol.cast("long").as("v")))
    val trts = base.select(col("trt")).distinct().orderBy(col("trt"))
      .collect().map(_.getLong(0))
    require(
      trts.length >= 3 && trts.length <= 11,
      s"pageTrend: 3..11 ordered treatments required, got ${trts.length}")
    val k = trts.length.toLong
    val weights = broadcast(
      trts.zipWithIndex.map { case (t0, i) => (t0, i + 1L) }.toSeq.toDF("trt", "w"))
    val dv = base.groupBy(col("u"), col("v")).agg(count(lit(1)).as("t"))
      .withColumn(
        "rmin",
        coalesce(
          sum(col("t")).over(
            Window.partitionBy(col("u")).orderBy(col("v"))
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)) + 1L)
    val ranked = base
      .join(dv, Seq("u", "v"))
      .withColumn("d", lit(2L) * col("rmin") + col("t") - 1L)
    val units = ranked.groupBy(col("u")).agg(count(lit(1)).as("__nt"))
      .filter(
        assert_true(
          col("__nt") === lit(k),
          concat(
            lit(s"pageTrend: every unit must carry exactly $k treatment rows; unit with "),
            col("__nt").cast("string"))).isNull)
    val n = broadcast(units.agg(count(lit(1)).as("n_units")))
    ranked
      .join(weights, Seq("trt"))
      .agg(sum(col("w") * col("d")).as("l2"))
      .crossJoin(n)
      .withColumn("k", lit(k))
      .withColumn("e2", expr(s"CAST(n_units AS DECIMAL(38,0)) * $k * ($k + 1) * ($k + 1) div 2"))
      .withColumn(
        "z2_6",
        expr(
          s"""CASE WHEN n_units = 0 THEN CAST(0 AS BIGINT)
             |ELSE CAST(
             |  (CAST(36000000 AS DECIMAL(38,0))
             |   * CAST(l2 - e2 AS DECIMAL(38,0)) * CAST(l2 - e2 AS DECIMAL(38,0)))
             |  div (CAST(n_units AS DECIMAL(38,0))
             |       * CAST($k AS DECIMAL(38,0)) * CAST($k AS DECIMAL(38,0))
             |       * CAST($k + 1 AS DECIMAL(38,0)) * CAST($k + 1 AS DECIMAL(38,0))
             |       * CAST($k - 1 AS DECIMAL(38,0)))
             |AS BIGINT) END""".stripMargin))
      .select(
        col("k"), col("n_units"), col("l2"), col("e2"), col("z2_6"),
        (col("z2_6") >= Z2Alpha05Micro).as("significant"))
  }

  /** Cochran–Armitage trend test (Cochran 1954; Armitage 1955) — the
    * binary × ORDERED-dose cell of the test grid: does a success
    * rate move monotonically with an integer dose score? The
    * unordered chi² ([[Checks.chiSquareIndependence]]) spends k−1
    * degrees of freedom and wastes the ordering; this spends ONE on
    * the linear trend, the standard dose-response readout. With
    * per-level cells (w_v, n_v, x_v), N = Σn, X = Σx:
    *
    *   num    = N·Σ(w·x) − X·Σ(w·n)
    *   den    = X·(N−X)·(N·Σ(w²·n) − (Σ(w·n))²)
    *   z²·1e6 = 1e6·num²·N div den
    *
    * — exact integer cross-products in DECIMAL(38,0) (num² reaches
    * N⁴·w⁴), ONE truncating division, significance vs the chi²₁
    * literal [[Z2Alpha05Micro]]. Valid range: 1e6·num²·N ≤ 1e38 with
    * num ≤ w_max·N², i.e. N ≲ 1e6 at w_max = 5 — rescale dose scores
    * (they only need relative spacing) before testing larger
    * populations. Degenerate X = 0, X = N, or a
    * single dose level (den = 0) scores 0, not-significant. Dose
    * scores are the caller's INTEGER column — equally spaced (1..k)
    * or real spacings, the statistic is exact either way.
    *
    * Scale shape: one hash aggregate to ≤k dose cells, a 1-row
    * pivot — map-side combined, nothing else. Returns one row
    * (k, n, x, z2_6, significant).
    */
  def cochranArmitage(
      df: DataFrame,
      doseCol: Column,
      successCol: Column): DataFrame =
    df
      .filter(doseCol.isNotNull && successCol.isNotNull)
      .groupBy(doseCol.cast("long").as("w"))
      .agg(count(lit(1)).as("n_v"), sum(successCol.cast("long")).as("x_v"))
      .agg(
        count(lit(1)).as("k"),
        sum(col("n_v")).as("n"),
        sum(col("x_v")).as("x"),
        // dose-weighted moments in DECIMAL — the dose domain is
        // caller-defined (any long), so w²·n has no safe BIGINT bound
        sum(col("w").cast("decimal(38,0)") * col("x_v")).as("__wx"),
        sum(col("w").cast("decimal(38,0)") * col("n_v")).as("__wn"),
        sum(col("w").cast("decimal(38,0)") * col("w") * col("n_v")).as("__wwn"))
      .withColumn(
        "__num",
        expr(
          """CAST(n AS DECIMAL(38,0)) * CAST(__wx AS DECIMAL(38,0))
            |- CAST(x AS DECIMAL(38,0)) * CAST(__wn AS DECIMAL(38,0))""".stripMargin))
      .withColumn(
        "__den",
        expr(
          """CAST(x AS DECIMAL(38,0)) * CAST(n - x AS DECIMAL(38,0))
            |* (CAST(n AS DECIMAL(38,0)) * CAST(__wwn AS DECIMAL(38,0))
            |   - CAST(__wn AS DECIMAL(38,0)) * CAST(__wn AS DECIMAL(38,0)))"""
            .stripMargin))
      .withColumn(
        "z2_6",
        expr(
          """CASE WHEN __den <= 0 THEN CAST(0 AS BIGINT)
            |ELSE CAST(
            |  (CAST(1000000 AS DECIMAL(38,0)) * __num * __num
            |   * CAST(n AS DECIMAL(38,0)))
            |  div __den
            |AS BIGINT) END""".stripMargin))
      .select(
        col("k"), col("n"), col("x"), col("z2_6"),
        (col("z2_6") >= Z2Alpha05Micro).as("significant"))

  /** Anytime-valid e-process rate monitor (Waudby-Smith & Ramdas,
    * JRSS-B 2024 betting form; Ville 1939 for the inequality) — the
    * MODERN replacement for fixed-look group-sequential boundaries
    * ([[obfLooks5]]/[[pocockLooks5]]): the wealth process
    * E_n = Π (1 + λ·(X_i − p0)) is a nonnegative supermartingale
    * under H0: rate = p0, so by Ville P(sup E_n ≥ 1/α) ≤ α — the
    * monitor may peek EVERY day forever and the α guarantee still
    * holds, no look table, no alpha spending.
    *
    * Exactness — the ndcgWeights shared-constant discipline: X is
    * binary, so ln E_n has exactly TWO distinct per-event terms,
    * a = ln(1 + λ(1−p0)) and b = ln(1 − λ·p0), computed ONCE here in
    * micro-nats and injected as literals into both engines; the
    * cumulative log-wealth is then the exact integer
    * lnE6(d) = c1(d)·a6 + c0(d)·b6 over the running success/failure
    * counts, and the threshold ln(1/α) is one more literal. Daily
    * cumulative counts come from [[Relational.globalCumSum]] over the
    * calendar-day grid (bounded, but the chassis costs nothing —
    * zero Window nodes). DECIMAL(38,0) products (c·a6 passes 2^63
    * near 1e13 rows).
    *
    * Scale shape: one hash agg to the day grid, two distributed
    * prefix sums, a map-side affine readout. The (c0, c1) pair is a
    * SUFFICIENT STATISTIC — partial day grids from independent
    * slices sum-merge exactly, so the streaming twin never re-scans
    * history. Returns one row per day (day, n, x, ln_e6, crossed),
    * ordered by day; `crossed` latches via the running maximum being
    * monotone in counts only at the day granularity (a day that
    * crosses stays crossed in any later re-read because counts only
    * grow).
    */
  def eProcessRate(
      df: DataFrame,
      successCol: Column,
      dayCol: Column,
      p0Ppm: Long,
      lambdaPpm: Long,
      alphaPpm: Long): DataFrame =
    eProcessFromCells(
      df
        .filter(successCol.isNotNull && dayCol.isNotNull)
        .groupBy(dayCol.as("day"))
        .agg(
          count(lit(1)).as("n"),
          sum(when(successCol.cast("boolean"), 1L).otherwise(0L)).as("x")),
      p0Ppm,
      lambdaPpm,
      alphaPpm)

  /** [[eProcessRate]]'s readout over a (possibly merged) (day, n, x)
    * count grid — the MERGEABLE half (the rocAucCells posture):
    * counts are linear, so partial grids from independent slices
    * SUM-merge exactly and the wealth readout over the merged grid
    * is bit-equal to a single-pass run; a live monitor never
    * re-scans history.
    */
  def eProcessFromCells(
      cells: DataFrame,
      p0Ppm: Long,
      lambdaPpm: Long,
      alphaPpm: Long): DataFrame = {
    require(p0Ppm > 0L && p0Ppm < 1000000L, "p0Ppm must be in (0, 1e6)")
    require(alphaPpm > 0L && alphaPpm < 1000000L, "alphaPpm must be in (0, 1e6)")
    require(lambdaPpm > 0L && lambdaPpm * p0Ppm < 1000000000000L,
      "lambdaPpm must be positive with lambda * p0 < 1 (wealth must stay positive)")
    val (a6, b6, thr6) = eProcessConstants(p0Ppm, lambdaPpm, alphaPpm)
    val daily = cells
      .groupBy(col("day"))
      .agg(sum(col("n")).as("n"), sum(col("x")).as("x"))
    val c1 = Relational.globalCumSum(daily, Seq(col("day")), "x", "__x0")
    val c01 = Relational.globalCumSum(c1, Seq(col("day")), "n", "__n0")
    c01
      .select(
        col("day"),
        col("n"),
        col("x"),
        ((col("__x0") + col("x")).cast("decimal(38,0)") * a6 +
          (col("__n0") + col("n") - col("__x0") - col("x")).cast("decimal(38,0)") * b6)
          .cast("long").as("ln_e6"))
      .withColumn("crossed", col("ln_e6") >= thr6)
      .orderBy(col("day"))
  }

  /** Anytime-valid BOUNDED-MEAN monitor — the e-process family's
    * VALUE-metric member (Waudby-Smith & Ramdas 2024's capital
    * process for means in [0,1]): wealth W_n = Π(1 + λ(y_i − m0))
    * is a nonnegative supermartingale under H0 "E[y] ≤ m0" for
    * y ∈ [0,1], so ln W crossing ln(1/α) rejects with Ville's
    * guarantee at EVERY peek — the always-valid revenue/latency
    * monitor beside the Bernoulli-rate T224 (λ > 0 bets "the mean
    * exceeds m0").
    *
    * Values arrive ppm-quantized against a caller-DECLARED upper
    * bound (y_ppm ∈ [0, 1e6], violations fail fast in-plan — an
    * undeclared whale would silently break the supermartingale
    * property, so it must break the job instead). Unlike the
    * Bernoulli case, ln(1+λ(y−m0)) is not affine in counts — but it
    * IS constant per distinct value, so the (day, value) count grid
    * (the mannWhitneyU value-domain discipline) carries one
    * micro-nat ln term per distinct value: ln of the integer ratio
    * (1e12 + λppm·(v − m0ppm))/1e12 (shared IEEE), rounded ONCE,
    * multiplied by exact counts in DECIMAL(38,0), day totals
    * cumulated by [[Relational.globalCumSum]] over the day DOMAIN.
    * The grid is the mergeable sufficient statistic — the streaming
    * twin SUM-merges partial grids and re-runs bit-equal.
    * Returns one row per day (day, n, ln_e6, crossed), ordered.
    */
  def eProcessMean(
      df: DataFrame,
      valuePpmCol: Column,
      dayCol: Column,
      m0Ppm: Long,
      lambdaPpm: Long,
      alphaPpm: Long): DataFrame =
    eProcessMeanFromCells(
      df
        .filter(valuePpmCol.isNotNull && dayCol.isNotNull)
        .select(dayCol.as("day"), valuePpmCol.cast("long").as("v"))
        .filter(
          assert_true(
            col("v") >= 0L && col("v") <= 1000000L,
            lit("eProcessMean: valuePpm outside [0, 1e6] — the declared " +
              "bound is violated")).isNull)
        .groupBy(col("day"), col("v"))
        .agg(count(lit(1)).as("n")),
      m0Ppm, lambdaPpm, alphaPpm)

  /** [[eProcessMean]] over a (possibly merged) (day, v, n) value-grid
    * — the mergeable half, mirroring [[eProcessFromCells]]. */
  def eProcessMeanFromCells(
      cells: DataFrame,
      m0Ppm: Long,
      lambdaPpm: Long,
      alphaPpm: Long): DataFrame = {
    require(m0Ppm > 0L && m0Ppm < 1000000L, "m0Ppm must be in (0, 1e6)")
    require(alphaPpm > 0L && alphaPpm < 1000000L, "alphaPpm must be in (0, 1e6)")
    require(lambdaPpm > 0L && lambdaPpm * m0Ppm < 1000000000000L,
      "lambdaPpm must be positive with lambda * m0 < 1 (wealth must stay positive)")
    val thr6 = math.round(math.log(1e6 / alphaPpm) * 1e6)
    val daily = cells
      .groupBy(col("day"), col("v"))
      .agg(sum(col("n")).as("n"))
      .withColumn(
        "__t6",
        expr(
          s"""CAST(round(ln(CAST(1000000000000 + $lambdaPpm * (v - $m0Ppm)
             |AS DOUBLE) / 1e12) * 1000000, 0) AS BIGINT)""".stripMargin))
      .groupBy(col("day"))
      .agg(
        sum(col("n")).as("n"),
        sum(col("n").cast("decimal(38,0)") * col("__t6")).cast("long").as("__d6"))
    Relational.globalCumSum(daily, Seq(col("day")), "__d6", "__lw0")
      .select(
        col("day"),
        col("n"),
        (col("__lw0") + col("__d6")).as("ln_e6"))
      .withColumn("crossed", col("ln_e6") >= lit(thr6))
      .orderBy(col("day"))
  }

  /** Anytime-valid DISPERSION monitor — the e-process family's
    * VARIANCE member: is the daily variance above v0? A variance
    * widening under a stable mean is invisible to [[eProcessMean]]
    * (the moodMedianTest argument, made anytime-valid). Each day
    * with N_d ≥ 2 is ONE betting round on the day's UNBIASED sample
    * variance: z_d = (N_d·Q_d − S_d²) div (N_d·(N_d−1)) in exact
    * ppm² off the SAME (day, v, n) value grid the mean monitor
    * rides, normalized against the maximal POPULATION variance of a
    * bounded ppm value (B²/4 = 2.5e11 ppm²): ẑ = z_d div 250000.
    * NOTE the normalized UNBIASED statistic is NOT confined to
    * [0, 1e6]: its range is [0, 1e6·N_d/(N_d−1)] ≤ 2e6 (one 0 and
    * one B in a 2-observation day gives ẑ = 2e6). The guarantee
    * below relies on UNBIASEDNESS (E[ẑ] ≤ v̂0 under H0), not on the
    * range; wealth positivity needs only λ·v̂0 < 1 (the λ > 0 bet
    * can only gain from large ẑ). Calibrate λ/v0 against the 2e6
    * ceiling, not 1e6.
    * W = Π_days (1 + λ(ẑ_d − v̂0)) is a nonnegative supermartingale
    * under H0 "every day's variance ≤ v0" (E[ẑ_d] ≤ v̂0 by
    * unbiasedness; truncation only biases ẑ DOWN — conservative for
    * the λ > 0 bet), so ln W crossing ln(1/α) rejects with Ville's
    * guarantee at every peek. λ·v̂0 < 1 keeps wealth positive
    * (fail-fast require, the family convention).
    *
    * Exactness: one micro-nat ln term per day off the integer ratio
    * (1e12 + λppm·(ẑ − v̂0))/1e12 (shared IEEE, rounded ONCE), day
    * wealth via [[Relational.globalCumSum]] — and the grid is the
    * mergeable sufficient statistic, so the streaming twin
    * SUM-merges partial grids and re-runs bit-equal. Days with
    * N_d < 2 carry no variance and contribute nothing (documented).
    * Returns one row per contributing day
    * (day, n, var_hat_ppm, ln_e6, crossed), ordered.
    */
  def eProcessVariance(
      df: DataFrame,
      valuePpmCol: Column,
      dayCol: Column,
      v0Ppm: Long,
      lambdaPpm: Long,
      alphaPpm: Long): DataFrame =
    eProcessVarianceFromCells(
      df
        .filter(valuePpmCol.isNotNull && dayCol.isNotNull)
        .select(dayCol.as("day"), valuePpmCol.cast("long").as("v"))
        .filter(
          assert_true(
            col("v") >= 0L && col("v") <= 1000000L,
            lit("eProcessVariance: valuePpm outside [0, 1e6] — the declared " +
              "bound is violated")).isNull)
        .groupBy(col("day"), col("v"))
        .agg(count(lit(1)).as("n")),
      v0Ppm, lambdaPpm, alphaPpm)

  /** [[eProcessVariance]] over a (possibly merged) (day, v, n)
    * value-grid — the mergeable half, mirroring
    * [[eProcessMeanFromCells]] (same grid, different functional). */
  def eProcessVarianceFromCells(
      cells: DataFrame,
      v0Ppm: Long,
      lambdaPpm: Long,
      alphaPpm: Long): DataFrame = {
    require(v0Ppm > 0L && v0Ppm < 1000000L, "v0Ppm must be in (0, 1e6)")
    require(alphaPpm > 0L && alphaPpm < 1000000L, "alphaPpm must be in (0, 1e6)")
    require(lambdaPpm > 0L && lambdaPpm * v0Ppm < 1000000000000L,
      "lambdaPpm must be positive with lambda * v0 < 1 (wealth must stay positive)")
    val thr6 = math.round(math.log(1e6 / alphaPpm) * 1e6)
    val daily = cells
      .groupBy(col("day"), col("v"))
      .agg(sum(col("n")).as("n"))
      .groupBy(col("day"))
      .agg(
        sum(col("n")).as("n"),
        sum(col("n").cast("decimal(38,0)") * col("v")).as("__s"),
        sum(col("n").cast("decimal(38,0)") * col("v") * col("v")).as("__q"))
      .filter(col("n") >= 2L)
      // z ≤ B²/4 = 2.5e11 ppm² — intensive quotient, DECIMAL-staged
      // numerator and denominator (the DIVSWEEP discipline)
      .withColumn(
        "__z",
        expr(
          """(CAST(n AS DECIMAL(38,0)) * __q - __s * __s)
            |div (CAST(n AS DECIMAL(38,0)) * (n - 1))""".stripMargin))
      .withColumn("var_hat_ppm", expr("__z div 250000"))
      .withColumn(
        "__t6",
        expr(
          s"""CAST(round(ln(CAST(1000000000000 + $lambdaPpm * (var_hat_ppm - $v0Ppm)
             |AS DOUBLE) / 1e12) * 1000000, 0) AS BIGINT)""".stripMargin))
    Relational.globalCumSum(daily, Seq(col("day")), "__t6", "__lw0")
      .select(
        col("day"),
        col("n"),
        col("var_hat_ppm"),
        (col("__lw0") + col("__t6")).as("ln_e6"))
      .withColumn("crossed", col("ln_e6") >= lit(thr6))
      .orderBy(col("day"))
  }

  /** Anytime-valid TWO-SAMPLE rate comparison — the A/B form of
    * [[eProcessRate]] via the success-stream reduction: under
    * H0: p_A = p_B with a FIXED design assignment probability π_A
    * (fixed randomization, the [[srmCheck]] precondition), each
    * SUCCESS is an arm-A success with probability exactly π_A
    * regardless of the common rate, so betting on the arm label of
    * successive successes is a one-sample e-process with p0 = π_A —
    * wealth grows when arm A wins more (λ > 0 bets "A is better";
    * run a second monitor with the arms swapped for the other
    * side). Same Ville guarantee: peek every day forever at α.
    *
    * The reduction means the chassis is shared verbatim: cells =
    * (day, n = successes, x = arm-A successes) feed
    * [[eProcessFromCells]] with p0Ppm = piAPpm — so the (day, n, x)
    * grid is again the mergeable sufficient statistic and a
    * streaming twin costs nothing new. Returns one row per day with
    * ≥1 success (day, n, x, ln_e6, crossed), ordered by day.
    */
  def eProcessTwoSample(
      df: DataFrame,
      sideCol: Column,
      isA: Column,
      successCol: Column,
      dayCol: Column,
      piAPpm: Long,
      lambdaPpm: Long,
      alphaPpm: Long): DataFrame =
    eProcessFromCells(
      df
        .filter(sideCol.isNotNull && successCol.isNotNull && dayCol.isNotNull)
        .filter(successCol.cast("boolean"))
        .groupBy(dayCol.as("day"))
        .agg(
          count(lit(1)).as("n"),
          sum(when(isA, 1L).otherwise(0L)).as("x")),
      piAPpm,
      lambdaPpm,
      alphaPpm)

  /** Anytime-valid confidence SEQUENCE for a rate — the band the
    * T224 wealth process implies (Waudby-Smith & Ramdas 2024 §3:
    * a CS is the set of p0 no e-process has rejected yet; by Ville
    * the running band covers the true rate at every time
    * simultaneously with probability ≥ 1−α): each candidate p0 on
    * the percent grid 1..99 runs ITS OWN betting wealth against the
    * running counts, and day d's interval is [min, max] of the
    * still-unrejected candidates. Intervals only SHRINK over time
    * (wealth suprema are monotone in the running maximum; rejection
    * latches via the running max below), which is the defining CS
    * property a per-day fixed-n interval lacks.
    *
    * Two-sided by TWO one-sided bets (the standard composition): per
    * candidate, a λ>0 wealth catches "true rate above p0" and a λ<0
    * wealth catches "below p0", each tested at α/2 (union bound ⇒
    * simultaneous α). Exactness: the grid is 99 literal
    * (pct, a⁺6, b⁺6, a⁻6, b⁻6) tuples computed once here (the
    * ndcgWeights discipline — the oracle interpolates the SAME longs
    * via [[eProcessCsGrid]]); per (day, candidate) each side's
    * log-wealth is an exact affine map of (cx, cn); the latch is a
    * candidate-partitioned running max over the day-bounded grid
    * (PARTITIONED window — the sweep-clean kind). λ is clamped per
    * candidate to keep BOTH sides' wealth positive:
    * λ(p0) = min(lambdaPpm/1e6, 0.5/max(p0, 1−p0)).
    *
    * Scale shape: one hash agg to the day grid, two distributed
    * prefix sums, a broadcast 99-row grid join, one partitioned
    * running max. Returns one row per day (day, n, x, lo_pct,
    * hi_pct), ordered by day.
    */
  def eProcessConfidenceSeq(
      df: DataFrame,
      successCol: Column,
      dayCol: Column,
      lambdaPpm: Long,
      alphaPpm: Long): DataFrame =
    eProcessConfidenceSeqFromCells(
      df
        .filter(successCol.isNotNull && dayCol.isNotNull)
        .groupBy(dayCol.as("day"))
        .agg(
          count(lit(1)).as("n"),
          sum(when(successCol.cast("boolean"), 1L).otherwise(0L)).as("x")),
      lambdaPpm,
      alphaPpm)

  /** [[eProcessConfidenceSeq]]'s readout over a (possibly merged)
    * (day, n, x) count grid — the MERGEABLE half, shared with
    * [[eProcessFromCells]]: the same sufficient statistic feeds both
    * the point monitor and the band, so a live CS never re-scans
    * history either.
    */
  def eProcessConfidenceSeqFromCells(
      cells: DataFrame,
      lambdaPpm: Long,
      alphaPpm: Long): DataFrame = {
    require(alphaPpm > 0L && alphaPpm < 1000000L, "alphaPpm must be in (0, 1e6)")
    require(lambdaPpm > 0L && lambdaPpm <= 1000000L, "lambdaPpm must be in (0, 1e6]")
    val spark = cells.sparkSession
    import spark.implicits._
    // per-side level alpha/2 -> threshold ln(2/alpha)
    val thr6 = math.round(math.log(2e6 / alphaPpm) * 1e6)
    val grid = broadcast(
      eProcessCsGrid(lambdaPpm).toDF("pct", "ap6", "bp6", "an6", "bn6"))
    val daily = cells
      .groupBy(col("day"))
      .agg(sum(col("n")).as("n"), sum(col("x")).as("x"))
    val c1 = Relational.globalCumSum(daily, Seq(col("day")), "x", "__x0")
    val c01 = Relational.globalCumSum(c1, Seq(col("day")), "n", "__n0")
    val wealth = c01
      .select(
        col("day"), col("n"), col("x"),
        (col("__x0") + col("x")).as("cx"),
        (col("__n0") + col("n")).as("cn"))
      .crossJoin(grid)
      .withColumn(
        "ln_e6",
        greatest(
          (col("cx").cast("decimal(38,0)") * col("ap6") +
            (col("cn") - col("cx")).cast("decimal(38,0)") * col("bp6")).cast("long"),
          (col("cx").cast("decimal(38,0)") * col("an6") +
            (col("cn") - col("cx")).cast("decimal(38,0)") * col("bn6")).cast("long")))
    // rejection latches: a candidate whose wealth EVER crossed stays
    // rejected (sup over time, the Ville form) — running max per
    // candidate over the day order
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("pct"))
      .orderBy(col("day"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    wealth
      .withColumn("__sup6", max(col("ln_e6")).over(w))
      .filter(col("__sup6") < thr6)
      .groupBy(col("day"), col("n"), col("x"))
      .agg(min(col("pct")).as("lo_pct"), max(col("pct")).as("hi_pct"))
      .orderBy(col("day"))
  }

  /** Anytime-valid confidence SEQUENCE for a BOUNDED MEAN — the
    * value-metric completion of [[eProcessConfidenceSeq]] (the CS the
    * T244 mean monitor implies): each candidate mean m0 on the
    * percent grid runs TWO betting wealths against the value stream —
    * λ > 0 catches "true mean above m0", λ < 0 catches "below" —
    * each at α/2, and day d's interval is [min, max] of the
    * still-unrejected candidates; rejection latches via the running
    * max (Ville's sup form), so the band only shrinks and the whole
    * PATH covers at 1−α. Per candidate the betting fraction is
    * capped at the WSR positivity bound λ ≤ 0.5/max(m0, 1−m0)
    * (shared by both sides — the [[eProcessCsGrid]] convention),
    * computed in exact integer ppm so both engines share literals.
    *
    * Exactness: like [[eProcessMean]], ln(1 ± λ(y − m0)) is constant
    * per distinct value, so the (day, v, n) grid × the 99-candidate
    * broadcast carries one micro-nat term per (value, candidate,
    * side) — shared IEEE ln of an integer ratio, rounded ONCE,
    * count-multiplied in DECIMAL(38,0); per-candidate day wealth and
    * the rejection latch are bounded-partition windows (99 candidate
    * partitions — never an unpartitioned window). The value grid is
    * again the mergeable sufficient statistic: the same artifact the
    * mean and variance monitors ride feeds the live band. Returns
    * one row per day with ≥1 surviving candidate
    * (day, n, lo_pct, hi_pct), ordered.
    */
  def eProcessMeanCs(
      df: DataFrame,
      valuePpmCol: Column,
      dayCol: Column,
      lambdaPpm: Long,
      alphaPpm: Long,
      stepPct: Long = 1L): DataFrame =
    eProcessMeanCsFromCells(
      df
        .filter(valuePpmCol.isNotNull && dayCol.isNotNull)
        .select(dayCol.as("day"), valuePpmCol.cast("long").as("v"))
        .filter(
          assert_true(
            col("v") >= 0L && col("v") <= 1000000L,
            lit("eProcessMeanCs: valuePpm outside [0, 1e6] — the declared " +
              "bound is violated")).isNull)
        .groupBy(col("day"), col("v"))
        .agg(count(lit(1)).as("n")),
      lambdaPpm, alphaPpm, stepPct)

  /** [[eProcessMeanCs]] over a (possibly merged) (day, v, n)
    * value-grid — the mergeable half; same grid as
    * [[eProcessMeanFromCells]] / [[eProcessVarianceFromCells]].
    *
    * `stepPct` is the candidate-density knob: the band IS one monitor
    * per candidate, so its cost is linear in the grid density. The
    * canonical operating point (and every registry query) stays the
    * full percent grid (stepPct = 1, 99 candidates); a caller that
    * wants a cheaper live band coarsens the grid — the stepPct = k
    * band is exactly the 1%-band's surviving candidates restricted
    * to multiples of k (each candidate's wealth path is independent
    * of the others), so coarsening trades RESOLUTION (the mean is
    * located only to the k% grid) and nothing else: every remaining
    * candidate keeps its own anytime-validity untouched.
    */
  def eProcessMeanCsFromCells(
      cells: DataFrame,
      lambdaPpm: Long,
      alphaPpm: Long,
      stepPct: Long = 1L): DataFrame = {
    require(alphaPpm > 0L && alphaPpm < 1000000L, "alphaPpm must be in (0, 1e6)")
    require(lambdaPpm > 0L && lambdaPpm <= 1000000L, "lambdaPpm must be in (0, 1e6]")
    val spark = cells.sparkSession
    import spark.implicits._
    val thr6 = math.round(math.log(2e6 / alphaPpm) * 1e6)
    val grid = broadcast(eProcessMeanCsGrid(lambdaPpm, stepPct).toDF("pct", "m0", "lam6"))
    // merged grid referenced by the daily rollup and the candidate
    // scan — materialize once (the modularity storage rule) instead
    // of re-reading + re-aggregating the cells per reference
    val merged = Checkpointing.truncate(
      cells.groupBy(col("day"), col("v")).agg(sum(col("n")).as("n")),
      None, eager = true)
    val daily = merged.groupBy(col("day")).agg(sum(col("n")).as("n"))
    // the ln terms depend only on (value, candidate) — compute each
    // ONCE over the distinct-value domain (~|V|·99 rows) instead of
    // per (day, value, candidate) cell (~9× fewer ln calls at a
    // 30-day grid; identical values, the plan-only optimization)
    val vTerms = merged.select(col("v")).distinct()
      .crossJoin(grid)
      .withColumn(
        "__t6p",
        expr(
          """CAST(round(ln(CAST(1000000000000 + lam6 * (v - m0) AS DOUBLE)
            |/ 1e12) * 1000000, 0) AS BIGINT)""".stripMargin))
      .withColumn(
        "__t6n",
        expr(
          """CAST(round(ln(CAST(1000000000000 - lam6 * (v - m0) AS DOUBLE)
            |/ 1e12) * 1000000, 0) AS BIGINT)""".stripMargin))
      .select(col("v"), col("pct"), col("__t6p"), col("__t6n"))
    val dayPct = merged
      .join(vTerms, Seq("v"))
      .groupBy(col("day"), col("pct"))
      // per-cell product in BIGINT, accumulation in DECIMAL(38,0):
      // |t6| ≤ ln(2)·1e6 < 693148, so the product needs n_cell ≥
      // 1.33e13 events in ONE (day, value) cell to overflow — ANSI
      // aborts loudly there, and the DECIMAL sum + final long cast
      // (the DIVSWEEP restage surface) are unchanged. The decimal
      // MULTIPLY was the measured cost: 99 candidates × the cell grid
      // ran it through the non-codegen decimal path per row
      // (12.1/15.0 s vs 10.3/12.3 s for the same fold at sf0.1).
      .agg(
        sum((col("n") * col("__t6p")).cast("decimal(38,0)")).cast("long").as("__d6p"),
        sum((col("n") * col("__t6n")).cast("decimal(38,0)")).cast("long").as("__d6n"))
    // 99 candidate partitions — bounded-grid windows by construction
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col("pct"))
      .orderBy(col("day"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    dayPct
      .withColumn("__lnp", sum(col("__d6p")).over(wCum))
      .withColumn("__lnn", sum(col("__d6n")).over(wCum))
      .withColumn("__sup6", max(greatest(col("__lnp"), col("__lnn"))).over(wCum))
      .filter(col("__sup6") < thr6)
      .groupBy(col("day"))
      .agg(min(col("pct")).as("lo_pct"), max(col("pct")).as("hi_pct"))
      .join(daily, Seq("day"))
      .select(col("day"), col("n"), col("lo_pct"), col("hi_pct"))
      .orderBy(col("day"))
  }

  /** The (pct, m0Ppm, lam6) literals [[eProcessMeanCs]] bets with,
    * exposed for the oracle (the eProcessCsGrid shared-constant
    * discipline): per candidate, λ is capped at the WSR positivity
    * bound 0.5/max(m0, 1−m0) — exact integer ppm, no float in the
    * cap.
    */
  def eProcessMeanCsGrid(lambdaPpm: Long, stepPct: Long = 1L): Seq[(Long, Long, Long)] = {
    require(stepPct >= 1L && stepPct <= 50L, "stepPct must be in [1, 50]")
    (stepPct to 99L by stepPct).map { pct =>
      val m0 = pct * 10000L
      val lamMax6 = 500000000000L / math.max(m0, 1000000L - m0)
      (pct, m0, math.min(lambdaPpm, lamMax6))
    }
  }

  /** Anytime-valid confidence SEQUENCE for the MEDIAN — the
    * sign-test member of the CS family and the FOURTH consumer of
    * the shared (day, v, n) value grid (mean alarm, variance alarm,
    * mean band, and now the location band that no heavy tail can
    * drag): for each candidate m on the percent grid of the declared
    * bound, under H0 "median = m" BOTH P(Y > m) ≤ 1/2 and
    * P(Y < m) ≤ 1/2 hold for ANY distribution (ties at m only lower
    * both), so two one-sided Bernoulli bets at p0 = 1/2 and level
    * α/2 each (the [[eProcessConfidenceSeq]] composition) reject
    * candidates below/above the true median; day d's band is the
    * surviving candidates' hull, rejection latches via the running
    * sup (Ville), the band only shrinks and the whole path covers at
    * 1−α (Howard & Ramdas 2022's time-uniform quantile bands, in
    * betting form).
    *
    * Exactness — the family's cheapest member: at p0 = 1/2 the
    * per-event wealth factors ln(1 ± λ/2) are TWO micro-nat
    * constants shared by every candidate and both sides
    * ([[eProcessMedianCsConstants]], injected into the oracle — the
    * ndcgWeights discipline), so per (day, candidate) each side's
    * log-wealth is an exact affine map of (c_gt, c_lt, c_n): NO ln
    * runs in either plan. Ties (v = m) count in n but in neither
    * indicator — exactly the inequality H0 needs. Scale shape: the
    * grid × 99-candidate broadcast comparison-aggregates to
    * (day, pct), then 99-partition bounded cumulative windows — the
    * value grid is again the mergeable sufficient statistic, so the
    * streaming twin SUM-merges partials and re-runs bit-equal.
    * Returns one row per day with ≥1 surviving candidate
    * (day, n, lo_pct, hi_pct), ordered.
    */
  def eProcessMedianCs(
      df: DataFrame,
      valuePpmCol: Column,
      dayCol: Column,
      lambdaPpm: Long,
      alphaPpm: Long): DataFrame =
    eProcessMedianCsFromCells(
      df
        .filter(valuePpmCol.isNotNull && dayCol.isNotNull)
        .select(dayCol.as("day"), valuePpmCol.cast("long").as("v"))
        .filter(
          assert_true(
            col("v") >= 0L && col("v") <= 1000000L,
            lit("eProcessMedianCs: valuePpm outside [0, 1e6] — the declared " +
              "bound is violated")).isNull)
        .groupBy(col("day"), col("v"))
        .agg(count(lit(1)).as("n")),
      lambdaPpm, alphaPpm)

  /** [[eProcessMedianCs]] over a (possibly merged) (day, v, n)
    * value grid — the mergeable half; same grid as the other three
    * e-process consumers. The q = 50% case of
    * [[eProcessQuantileCsFromCells]].
    */
  def eProcessMedianCsFromCells(
      cells: DataFrame,
      lambdaPpm: Long,
      alphaPpm: Long): DataFrame =
    eProcessQuantileCsFromCells(cells, 500000L, lambdaPpm, alphaPpm)

  /** Anytime-valid confidence SEQUENCE for ANY quantile — the
    * [[eProcessMedianCs]] machinery at general q (the tail member:
    * at q = 90% this is the always-valid p90 band, the tail-latency/
    * tail-cost readout a mean can't see and a heavy tail can't
    * drag): per candidate m, under H0 "the q-quantile is m" both
    * P(Y > m) ≤ 1−q and P(Y < m) ≤ q hold for ANY distribution
    * (ties at m only lower both), so the above-side bets a Bernoulli
    * e-process at p0 = 1−q on {y > m} and the below-side at p0 = q
    * on {y < m}, each at α/2; rejection latches (Ville), the band
    * only shrinks, the whole path covers at 1−α.
    *
    * Exactness: FOUR micro-nat constants shared by every candidate
    * ([[eProcessQuantileCsConstants]] — the per-side success/failure
    * factors ln(1 ± λ_side·(·)), λ capped per side at the positivity
    * bound 0.5/max(p0, 1−p0)), so per (day, candidate) each side's
    * log-wealth is an exact affine map of running counts — zero ln
    * calls in-plan, the cheapest family shape at any q.
    */
  def eProcessQuantileCsFromCells(
      cells: DataFrame,
      qPpm: Long,
      lambdaPpm: Long,
      alphaPpm: Long): DataFrame = {
    require(qPpm > 0L && qPpm < 1000000L, "qPpm must be in (0, 1e6)")
    require(alphaPpm > 0L && alphaPpm < 1000000L, "alphaPpm must be in (0, 1e6)")
    require(lambdaPpm > 0L && lambdaPpm <= 1000000L, "lambdaPpm must be in (0, 1e6]")
    val spark = cells.sparkSession
    import spark.implicits._
    val (ag6, bg6, al6, bl6) = eProcessQuantileCsConstants(qPpm, lambdaPpm)
    val thr6 = math.round(math.log(2e6 / alphaPpm) * 1e6)
    // merged grid referenced by the daily rollup and the candidate
    // scan — materialize once (the modularity storage rule) instead
    // of re-reading + re-aggregating the cells per reference
    val merged = Checkpointing.truncate(
      cells.groupBy(col("day"), col("v")).agg(sum(col("n")).as("n")),
      None, eager = true)
    val daily = merged.groupBy(col("day")).agg(sum(col("n")).as("n"))
    val dailyCum = Relational
      .globalCumSum(daily, Seq(col("day")), "n", "__n0")
      .select(col("day"), col("n"), (col("__n0") + col("n")).as("cn"))
    val grid = broadcast(
      (1L to 99L).map(p => (p, p * 10000L)).toDF("pct", "m"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("pct"))
      .orderBy(col("day"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    merged
      .crossJoin(grid)
      .groupBy(col("day"), col("pct"))
      .agg(
        sum(when(col("v") > col("m"), col("n")).otherwise(0L)).as("xg"),
        sum(when(col("v") < col("m"), col("n")).otherwise(0L)).as("xl"))
      .withColumn("cxg", sum(col("xg")).over(w))
      .withColumn("cxl", sum(col("xl")).over(w))
      .join(dailyCum, Seq("day"))
      .withColumn(
        "__wg6",
        (col("cxg").cast("decimal(38,0)") * ag6 +
          (col("cn") - col("cxg")).cast("decimal(38,0)") * bg6).cast("long"))
      .withColumn(
        "__wl6",
        (col("cxl").cast("decimal(38,0)") * al6 +
          (col("cn") - col("cxl")).cast("decimal(38,0)") * bl6).cast("long"))
      .withColumn("__sup6", max(greatest(col("__wg6"), col("__wl6"))).over(w))
      .filter(col("__sup6") < thr6)
      .groupBy(col("day"), col("n"))
      .agg(min(col("pct")).as("lo_pct"), max(col("pct")).as("hi_pct"))
      .select(col("day"), col("n"), col("lo_pct"), col("hi_pct"))
      .orderBy(col("day"))
  }

  /** The two micro-nat wealth constants [[eProcessMedianCs]] bets
    * with — ln(1 + λ/2) and ln(1 − λ/2), shared by every candidate
    * and both sides (p0 = 1/2 makes the grid degenerate) — exposed
    * so the oracle injects the SAME longs.
    */
  def eProcessMedianCsConstants(lambdaPpm: Long): (Long, Long) = {
    val lam = lambdaPpm / 1e6
    (
      math.round(math.log1p(lam * 0.5) * 1e6),
      math.round(math.log1p(-lam * 0.5) * 1e6))
  }

  /** The four micro-nat wealth constants [[eProcessQuantileCsFromCells]]
    * bets with — (above-success, above-failure, below-success,
    * below-failure), λ capped per side at 0.5/max(p0, 1−p0) — exposed
    * so the oracle injects the SAME longs. At qPpm = 500000 the two
    * sides coincide with [[eProcessMedianCsConstants]].
    */
  def eProcessQuantileCsConstants(
      qPpm: Long,
      lambdaPpm: Long): (Long, Long, Long, Long) = {
    def side(p0: Double): (Long, Long) = {
      val lam = math.min(lambdaPpm / 1e6, 0.5 / math.max(p0, 1.0 - p0))
      (
        math.round(math.log1p(lam * (1.0 - p0)) * 1e6),
        math.round(math.log1p(-lam * p0) * 1e6))
    }
    val q = qPpm / 1e6
    val (ag, bg) = side(1.0 - q) // bet on {y > m}, null mean 1−q
    val (al, bl) = side(q) // bet on {y < m}, null mean q
    (ag, bg, al, bl)
  }

  /** Anytime-valid band for a rate DIFFERENCE p_A − p_B — the
    * two-sample completion of [[eProcessConfidenceSeq]]: each arm
    * runs its own confidence sequence at α/2, and by the union bound
    * both bands cover their rates simultaneously at every time with
    * probability ≥ 1−α, so [lo_A − hi_B, hi_A − lo_B] is a valid
    * time-uniform band for the difference (the standard interval
    * composition; wider than a bespoke difference martingale, but
    * exactly as always-valid and built ENTIRELY from the shared
    * mergeable (day, arm, n, x) grid — a streaming twin costs
    * nothing new). Arms are the caller's isA/else split. Days are
    * emitted once BOTH arms have appeared (inner join on the day
    * spine — each arm's band is defined from its first observation);
    * α/2 truncates toward conservative on odd ppm.
    *
    * Returns one row per day (day, n_a, x_a, n_b, x_b, lo_diff_pct,
    * hi_diff_pct), ordered by day; the diff bounds are whole
    * percentage points (the grid's resolution).
    */
  def eProcessDiffBand(
      df: DataFrame,
      sideCol: Column,
      isA: Column,
      successCol: Column,
      dayCol: Column,
      lambdaPpm: Long,
      alphaPpm: Long): DataFrame = {
    val base = df
      .filter(sideCol.isNotNull && successCol.isNotNull && dayCol.isNotNull)
      .select(
        when(isA, lit("A")).otherwise(lit("B")).as("__arm"),
        dayCol.as("day"),
        when(successCol.cast("boolean"), 1L).otherwise(0L).as("__x"))
    val cells = base
      .groupBy(col("__arm"), col("day"))
      .agg(count(lit(1)).as("n"), sum(col("__x")).as("x"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def band(arm: String, suf: String): DataFrame =
      eProcessConfidenceSeqFromCells(
        cells.filter(col("__arm") === arm).select(col("day"), col("n"), col("x")),
        lambdaPpm,
        alphaPpm / 2L)
        .select(
          col("day"),
          col("n").as(s"n_$suf"),
          col("x").as(s"x_$suf"),
          col("lo_pct").as(s"__lo_$suf"),
          col("hi_pct").as(s"__hi_$suf"))
    band("A", "a")
      .join(band("B", "b"), Seq("day"))
      .select(
        col("day"), col("n_a"), col("x_a"), col("n_b"), col("x_b"),
        (col("__lo_a") - col("__hi_b")).as("lo_diff_pct"),
        (col("__hi_a") - col("__lo_b")).as("hi_diff_pct"))
      .orderBy(col("day"))
  }

  /** The 99-row (pct, a⁺6, b⁺6, a⁻6, b⁻6) literal grid
    * [[eProcessConfidenceSeq]] bets with, exposed so the oracle
    * interpolates the SAME longs: the λ>0 side's success/failure
    * terms and the λ<0 side's. λ is truncated per candidate to keep
    * both sides' per-event wealth factors positive.
    */
  def eProcessCsGrid(lambdaPpm: Long): Seq[(Long, Long, Long, Long, Long)] =
    (1L to 99L).map { pct =>
      val p0 = pct / 100.0
      val lamMax = 0.5 / math.max(p0, 1.0 - p0)
      val lam = math.min(lambdaPpm / 1e6, lamMax)
      (
        pct,
        math.round(math.log1p(lam * (1.0 - p0)) * 1e6),
        math.round(math.log1p(-lam * p0) * 1e6),
        math.round(math.log1p(-lam * (1.0 - p0)) * 1e6),
        math.round(math.log1p(lam * p0) * 1e6))
    }

  /** The literals [[eProcessRate]] injects, exposed so the oracle SQL
    * interpolates the SAME micro-nat constants (the ndcgWeights
    * shared-constant discipline).
    */
  def eProcessConstants(p0Ppm: Long, lambdaPpm: Long, alphaPpm: Long): (Long, Long, Long) = {
    val p0 = p0Ppm / 1e6
    val lam = lambdaPpm / 1e6
    (
      math.round(math.log1p(lam * (1.0 - p0)) * 1e6),
      math.round(math.log1p(-lam * p0) * 1e6),
      math.round(math.log(1e6 / alphaPpm) * 1e6))
  }

  /** Winsorized and trimmed per-arm means (Tukey; the Dixon &
    * Tukey 1968 winsorization) — the heavy-tail-robust metric
    * readout every large-scale revenue experiment ships: one whale
    * user can move a raw arm mean more than the treatment does, so
    * the tails are CLAMPED (winsorized) or DROPPED (trimmed) at
    * fixed quantile cutoffs before averaging. Cutoffs are computed
    * on the POOLED distribution so both arms clamp at identical
    * values — per-arm cutoffs would absorb exactly the tail shift a
    * treatment may cause (the standard practice, e.g. Kohavi et al.,
    * "Trustworthy Online Controlled Experiments" §22).
    *
    * Exactness: the cutoffs are exact ORDER STATISTICS — L = the
    * value at pooled rank max(1, ceil(n·loPpm/1e6)), U = at rank
    * max(r_lo, min(n, ceil(n·hiPpm/1e6))) — read off the
    * distinct-value count grid + [[Relational.globalCumSum]] (the
    * value whose cumulative range covers the target rank; the
    * a_mood_median chassis), never a full-table rank window. Sums
    * of clamped values accumulate in DECIMAL(38,0); each mean is
    * one truncating division (mean6 = 1e6·Σ div n). loPpm = 0 /
    * hiPpm = 1e6 degrade to the raw mean exactly (L = min, U = max).
    *
    * Scale shape: one hash agg to the value-domain count grid, the
    * distributed prefix sum, a 1-row broadcast of (L, U), one
    * map-side clamp + per-arm hash agg. Returns one row per arm
    * (side, n, lo_cut, hi_cut, n_lo_clamped, n_hi_clamped,
    * wins_mean6, n_trim, trim_mean6), ordered by side.
    */
  def winsorizedMeans(
      df: DataFrame,
      sideCol: Column,
      valueCol: Column,
      loPpm: Long,
      hiPpm: Long): DataFrame = {
    require(loPpm >= 0L && hiPpm <= 1000000L && loPpm < hiPpm,
      "winsorizedMeans: need 0 <= loPpm < hiPpm <= 1000000")
    val base = df
      .filter(sideCol.isNotNull && valueCol.isNotNull)
      .select(sideCol.cast("string").as("s"), valueCol.cast("long").as("v"))
    val counts = base.groupBy(col("v")).agg(count(lit(1)).as("t"))
    val tot = broadcast(counts.agg(sum(col("t")).as("n")))
    val cum = Relational.globalCumSum(counts, Seq(col("v")), "t", "__below")
      .crossJoin(tot)
      // ceil-rank targets in DECIMAL (n·ppm passes 2^63 at n ≈ 9e12)
      .withColumn(
        "__rlo",
        expr(s"""GREATEST(CAST(1 AS BIGINT),
                |  (CAST(n AS DECIMAL(38,0)) * $loPpm + 999999) div 1000000)"""
          .stripMargin))
      .withColumn(
        "__rhi",
        expr(s"""GREATEST(__rlo, LEAST(n,
                |  (CAST(n AS DECIMAL(38,0)) * $hiPpm + 999999) div 1000000))"""
          .stripMargin))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def cutAt(rank: String, out: String): DataFrame =
      cum
        .filter(col("__below") < col(rank) && col(rank) <= col("__below") + col("t"))
        .select(col("v").as(out))
    val cuts = broadcast(cutAt("__rlo", "lo_cut").crossJoin(cutAt("__rhi", "hi_cut")))
    val w = greatest(col("lo_cut"), least(col("hi_cut"), col("v")))
    val inRange = col("v") >= col("lo_cut") && col("v") <= col("hi_cut")
    base
      .crossJoin(cuts)
      .groupBy(col("s").as("side"), col("lo_cut"), col("hi_cut"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("v") < col("lo_cut"), 1L).otherwise(0L)).as("n_lo_clamped"),
        sum(when(col("v") > col("hi_cut"), 1L).otherwise(0L)).as("n_hi_clamped"),
        sum(w.cast("decimal(38,0)")).as("__ws"),
        sum(when(inRange, 1L).otherwise(0L)).as("n_trim"),
        sum(when(inRange, col("v")).otherwise(0L).cast("decimal(38,0)")).as("__ts"))
      .select(
        col("side"), col("n"), col("lo_cut"), col("hi_cut"),
        col("n_lo_clamped"), col("n_hi_clamped"),
        expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * __ws) div n AS BIGINT)")
          .as("wins_mean6"),
        col("n_trim"),
        expr(
          """CASE WHEN n_trim = 0 THEN CAST(0 AS BIGINT)
            |ELSE CAST((CAST(1000000 AS DECIMAL(38,0)) * __ts) div n_trim AS BIGINT)
            |END""".stripMargin).as("trim_mean6"))
      .orderBy(col("side"))
  }

  /** One-sided z 95th-percentile squared, micro-scaled:
    * 1.6448536269514722² = 2.705543… → 2705543. The TOST gate's
    * literal (each one-sided test runs at α = .05, so the
    * equivalence conclusion holds at overall α = .05 — TOST needs no
    * multiplicity correction; the intersection-union argument is
    * Berger & Hsu 1996). */
  val Z2OneSided05Micro: Long = 2705543L

  /** TOST equivalence gate for two-arm conversion rates (Schuirmann
    * 1987 two one-sided tests; Berger & Hsu 1996): the SHIP decision
    * [[twoProportionZ]] cannot make — failing to find a difference
    * is not evidence of equivalence; TOST rejects "|p_a − p_b| ≥ δ"
    * only when BOTH one-sided tests reject, i.e. the rate gap is
    * provably inside ±δ. The non-inferiority/parity gate a pipeline
    * runs before swapping in a cheaper model or a refactored
    * operator.
    *
    * Exactness — no sqrt anywhere: with diff6 the micro rate gap and
    * se2_12 the UNPOOLED variance in micro² (per-arm truncating
    * divisions of nonnegative integer cross-products, DECIMAL(38,0)
    * staged), each one-sided rejection is the integer predicate
    *
    *   diff6 + δ6 > 0  AND  1e6·(diff6 + δ6)² ≥ Z2OneSided05Micro·se2_12
    *
    * (and its mirror with δ6 − diff6) — z² compared in micro against
    * the literal, both engines bit-identical. Degenerate constant
    * arms (se2_12 = 0) degrade to the strict sign conditions
    * −δ6 < diff6 < δ6, which is the correct zero-variance limit.
    *
    * Group/variant conventions as [[twoProportionZ]] (exactly two
    * variants per group, lexicographic arm order). Scale shape: one
    * map-side-combined (group, variant) cell aggregate, then
    * grid-bounded pivots. Returns (group, variant_a, variant_b, n_a,
    * x_a, n_b, x_b, diff6, se2_12, equivalent).
    */
  def tostEquivalence(
      df: DataFrame,
      groupCol: Column,
      variantCol: Column,
      successCol: Column,
      marginPpm: Long): DataFrame = {
    require(
      marginPpm > 0L && marginPpm <= 1000000L,
      s"marginPpm must be in (0, 1e6], got $marginPpm")
    val cells = cached(
      df
        .filter(groupCol.isNotNull && variantCol.isNotNull && successCol.isNotNull)
        .groupBy(groupCol.as("g"), variantCol.as("v"))
        .agg(
          count(lit(1)).as("n"),
          sum(successCol.cast("long")).as("x")))
    val mins = cells.groupBy(col("g"))
      .agg(
        count(lit(1)).as("__nv"),
        min(col("v")).as("variant_a"),
        max(col("v")).as("variant_b"))
      .filter(col("__nv") === 2L)
    mins
      .join(
        cells.select(col("g"), col("v").as("variant_a"), col("n").as("n_a"), col("x").as("x_a")),
        Seq("g", "variant_a"))
      .join(
        cells.select(col("g"), col("v").as("variant_b"), col("n").as("n_b"), col("x").as("x_b")),
        Seq("g", "variant_b"))
      .withColumn(
        "diff6",
        expr(
          """CAST((CAST(1000000 AS DECIMAL(38,0)) * x_a) div n_a
            |  - (CAST(1000000 AS DECIMAL(38,0)) * x_b) div n_b AS BIGINT)"""
            .stripMargin))
      .withColumn(
        "se2_12",
        expr(
          """CAST(
            |  (CAST(1000000000000 AS DECIMAL(38,0)) * x_a * (n_a - x_a))
            |    div (CAST(n_a AS DECIMAL(38,0)) * n_a * n_a)
            |  + (CAST(1000000000000 AS DECIMAL(38,0)) * x_b * (n_b - x_b))
            |    div (CAST(n_b AS DECIMAL(38,0)) * n_b * n_b)
            |AS BIGINT)""".stripMargin))
      .withColumn(
        "equivalent",
        expr(
          s"""diff6 + $marginPpm > 0 AND $marginPpm - diff6 > 0
             |AND CAST(1000000 AS DECIMAL(38,0))
             |    * (diff6 + $marginPpm) * (diff6 + $marginPpm)
             |    >= CAST($Z2OneSided05Micro AS DECIMAL(38,0)) * se2_12
             |AND CAST(1000000 AS DECIMAL(38,0))
             |    * ($marginPpm - diff6) * ($marginPpm - diff6)
             |    >= CAST($Z2OneSided05Micro AS DECIMAL(38,0)) * se2_12"""
            .stripMargin))
      .select(
        col("g").as("group"), col("variant_a"), col("variant_b"),
        col("n_a"), col("x_a"), col("n_b"), col("x_b"),
        col("diff6"), col("se2_12"), col("equivalent"))
  }

  /** Poisson(1) CDF thresholds as 15-hex-digit string literals
    * (floor(cdf_k · 16^15), zero-padded lowercase): a 15-char md5
    * prefix compared lexicographically against these IS a numeric
    * compare of the same 60-bit uniform draw, so Spark and DuckDB
    * draw identical bootstrap weights from identical literals.
    * Computed once here (the dq_benford injected-literal precedent)
    * for k = 0..7; the residual mass past k = 7 (~1e-5) caps at 8.
    */
  private[graft] lazy val Pois1HexCdf: Seq[String] = {
    val pmf = Iterator
      .iterate((0, math.exp(-1.0))) { case (k, p) => (k + 1, p / (k + 1)) }
      .map(_._2)
    pmf
      .scanLeft(0.0)(_ + _)
      .slice(1, 9) // cdf_0 .. cdf_7
      .map(c => f"${(BigDecimal(c) * BigDecimal(BigInt(16).pow(15))).toBigInt.toLong}%015x")
      .toSeq
  }

  /** One-pass cluster Poisson bootstrap for the difference in the
    * ratio-of-sums mean between two arms (Chamandy–Muralidharan–
    * Najmi–Naidu 2012's streaming bootstrap, at the experiment's
    * RANDOMIZATION unit): each unit's (n, Σv) collapses from one
    * corpus scan; every (unit, replicate) pair then draws an i.i.d.
    * Poisson(1) weight and the replicate statistic is
    * Σ w·Σv / Σ w·n per arm — the cluster bootstrap a ratio metric
    * needs (resampling EVENTS understates the variance when users
    * contribute many events; this is [[jackknifeRatio]]'s
    * percentile-CI sibling).
    *
    * Determinism — the injected-literal discipline: weights come
    * from the md5 of "unit:replicate" compared against
    * [[Pois1HexCdf]]'s 15-hex-digit thresholds (lexicographic ==
    * numeric for fixed-width lowercase hex), so both engines draw
    * bit-identical weights. All means are exact truncating DECIMAL
    * divisions in micro-units (operands nonnegative by the valueCol
    * ≥ 0 contract, so Spark's truncating `div` and DuckDB's flooring
    * `//` agree).
    *
    * Scale shape: the unit×reps explosion never materializes — it is
    * map-side combined into reps rows of arm partials; the quantile
    * selection is a k-bounded sorted array over the reps-row
    * replicate table (reps ≤ 1000, fail-fast). Replicates where
    * either arm draws zero total weight are dropped (probability
    * ~(1/e)^units — real only on toy fixtures); the CI indexes are
    * the integer-exact lo = floor(.025·R)+1, hi = R − floor(.025·R)
    * over the R VALID replicates.
    *
    * Returns one row (n_reps, n_a, n_b, mean_a6, mean_b6,
    * diff_point6, diff_lo6, diff_hi6).
    */
  def poissonBootDiff(
      df: DataFrame,
      unitCol: Column,
      isACol: Column,
      valueCol: Column,
      reps: Int = 100): DataFrame = {
    require(reps >= 40 && reps <= 1000, s"reps must be in [40, 1000], got $reps")
    val dec = "decimal(38,0)"
    val perUnit = df
      .filter(unitCol.isNotNull && isACol.isNotNull && valueCol.isNotNull)
      .groupBy(unitCol.cast("string").as("u"), isACol.cast("boolean").as("a"))
      .agg(count(lit(1)).as("n"), sum(valueCol.cast("long")).as("sv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val spark = df.sparkSession
    val r = spark.range(reps.toLong).select(col("id").cast("int").as("r"))
    val h = substring(
      md5(concat(col("u"), lit(":"), col("r").cast("string")).cast("binary")),
      1, 15)
    val w = Pois1HexCdf.zipWithIndex.reverse.foldLeft(lit(8L)) {
      case (acc, (t, k)) => when(h < lit(t), lit(k.toLong)).otherwise(acc)
    }
    val zero = lit(0L).cast(dec)
    val cells = perUnit
      .crossJoin(r)
      .withColumn("__w", w)
      .groupBy(col("r"))
      .agg(
        sum(when(col("a"), col("__w") * col("n")).otherwise(0L)).as("nwa"),
        sum(when(col("a"), col("__w").cast(dec) * col("sv")).otherwise(zero)).as("swa"),
        sum(when(!col("a"), col("__w") * col("n")).otherwise(0L)).as("nwb"),
        sum(when(!col("a"), col("__w").cast(dec) * col("sv")).otherwise(zero)).as("swb"))
    val diffs = cells
      .filter(col("nwa") > 0L && col("nwb") > 0L)
      .select(
        expr(
          """CAST((CAST(1000000 AS DECIMAL(38,0)) * swa) div nwa
            |  - (CAST(1000000 AS DECIMAL(38,0)) * swb) div nwb AS BIGINT)"""
            .stripMargin).as("diff6"))
    val ci = diffs
      .agg(
        count(lit(1)).as("n_reps"),
        array_sort(collect_list(col("diff6"))).as("__sorted"))
      .select(
        col("n_reps"),
        element_at(
          col("__sorted"),
          (expr("(n_reps * 25) div 1000") + 1L).cast("int")).as("diff_lo6"),
        element_at(
          col("__sorted"),
          (col("n_reps") - expr("(n_reps * 25) div 1000")).cast("int")).as("diff_hi6"))
    val point = perUnit
      .agg(
        sum(when(col("a"), col("n")).otherwise(0L)).as("n_a"),
        sum(when(col("a"), col("sv")).otherwise(0L)).cast(dec).as("__sa"),
        sum(when(!col("a"), col("n")).otherwise(0L)).as("n_b"),
        sum(when(!col("a"), col("sv")).otherwise(0L)).cast(dec).as("__sb"))
      .select(
        col("n_a"),
        col("n_b"),
        expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * __sa) div n_a AS BIGINT)")
          .as("mean_a6"),
        expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * __sb) div n_b AS BIGINT)")
          .as("mean_b6"))
    ci.crossJoin(broadcast(point))
      .select(
        col("n_reps"), col("n_a"), col("n_b"), col("mean_a6"), col("mean_b6"),
        (col("mean_a6") - col("mean_b6")).as("diff_point6"),
        col("diff_lo6"), col("diff_hi6"))
  }

  /** Coarsened exact matching ATT (Iacus–King–Porro 2012): stratify
    * units by the caller-coarsened covariate columns, keep only
    * strata containing BOTH treated and control units, and average
    * the within-stratum treated-minus-control outcome gaps weighted
    * by each stratum's treated count — the observational-data
    * complement of the randomized [[twoProportionZ]]/CUPED family
    * (when assignment correlates with the covariates, the raw gap
    * confounds; CEM compares like with like and reports how much of
    * the treated population survived matching).
    *
    * Exactness: outcomes are exact integer units, ≥ 0 by contract
    * (per-stratum means are truncating divisions of NONNEGATIVE
    * operands, where Spark's `div` and DuckDB's `//` agree); the
    * final ATT numerator Σ n_t·(ȳ_t6 − ȳ_c6) CAN be negative, so the
    * one signed division is routed through an explicit
    * sign·(|num| div den) — both engines identical, convention
    * documented here: truncation toward zero.
    *
    * Scale: one corpus scan to the strata grid (bounded by the
    * coarsened covariate product — the caller's binning IS the
    * guarantee), one grid fold to a single row. Returns (n_strata,
    * n_strata_matched, n_treated, n_treated_matched,
    * n_control_matched, match_ppm, att6).
    */
  def cemAtt(
      df: DataFrame,
      treatedCol: Column,
      outcomeCol: Column,
      strataCols: Seq[Column]): DataFrame = {
    require(strataCols.nonEmpty, "cemAtt needs at least one coarsened covariate")
    val keys = strataCols.zipWithIndex.map { case (c, i) => c.as(s"__k$i") }
    val u = df
      .filter(treatedCol.isNotNull && outcomeCol.isNotNull)
      .select(
        Seq(treatedCol.cast("boolean").as("__tr"),
          outcomeCol.cast("long").as("__y")) ++ keys: _*)
    val strata = u
      .groupBy(keys.indices.map(i => col(s"__k$i")): _*)
      .agg(
        sum(when(col("__tr"), 1L).otherwise(0L)).as("nt"),
        sum(when(col("__tr"), col("__y")).otherwise(0L)).as("syt"),
        sum(when(!col("__tr"), 1L).otherwise(0L)).as("nc"),
        sum(when(!col("__tr"), col("__y")).otherwise(0L)).as("syc"))
    val matched = col("nt") > 0L && col("nc") > 0L
    val gap6 = expr(
      """(CAST(1000000 AS DECIMAL(38,0)) * syt) div nt
        |  - (CAST(1000000 AS DECIMAL(38,0)) * syc) div nc""".stripMargin)
    strata
      .agg(
        count(lit(1)).as("n_strata"),
        sum(when(matched, 1L).otherwise(0L)).as("n_strata_matched"),
        sum(col("nt")).as("n_treated"),
        sum(when(matched, col("nt")).otherwise(0L)).as("n_treated_matched"),
        sum(when(matched, col("nc")).otherwise(0L)).as("n_control_matched"),
        sum(when(matched, col("nt").cast("decimal(38,0)") * gap6)
          .otherwise(lit(0L).cast("decimal(38,0)"))).as("__num"))
      .select(
        col("n_strata"), col("n_strata_matched"), col("n_treated"),
        col("n_treated_matched"), col("n_control_matched"),
        expr(
          """CASE WHEN n_treated = 0 THEN CAST(0 AS BIGINT)
            |ELSE CAST((CAST(1000000 AS DECIMAL(38,0)) * n_treated_matched)
            |          div n_treated AS BIGINT) END""".stripMargin).as("match_ppm"),
        expr(
          """CASE WHEN n_treated_matched = 0 THEN CAST(0 AS BIGINT)
            |ELSE CAST(
            |  (CASE WHEN __num < 0 THEN -1 ELSE 1 END)
            |  * (abs(__num) div n_treated_matched) AS BIGINT) END"""
            .stripMargin).as("att6"))
  }

  /** e-BH — false-discovery-rate control ACROSS the monitor family
    * (Wang & Ramdas, "False discovery rate control with e-values",
    * JRSS-B 2022, the base procedure): given one e-value per
    * hypothesis (any of this file's monitors' final wealth qualifies
    * — e-processes are e-values at every stopping time, which is the
    * theorem's whole point), reject the hypotheses holding the k*
    * largest e-values, k* = max{k : e_(k) ≥ K/(α·k)}. FDR ≤ α holds
    * under ARBITRARY dependence between the e-values — no PRDS
    * assumption, no independence audit across monitors that all
    * watch the same corpus (the reason e-BH, not p-value BH, is the
    * right composition here).
    *
    * Input: (hyp, ln_e6) — hypothesis id + the monitor's final
    * micro-nat log wealth. In log space the rejection test is
    * ln_e6_(k) ≥ ln(K·1e6/(αppm·k)); the threshold is computed
    * in-plan by ONE shared-IEEE expression (ln of a double built
    * from exact integers — mirrored textually in the oracle, the
    * eProcessVariance discipline), rounded once to micro-nats.
    *
    * Scale shape: ranking rides [[Relational.globalRank]] (the
    * two-pass distributed chassis, no single-task window); K and k*
    * are 1-row broadcast aggregates. The hypothesis universe is the
    * MONITOR count — thousands at most — so every intermediate is
    * hypothesis-bounded; the corpus never enters this operator (it
    * was already reduced to one wealth scalar per monitor upstream).
    * Ties rank by hypothesis id ascending (total order, both
    * engines). Returns (hyp, ln_e6, k, thr6, rejected), ordered by
    * k: `rejected` = the e-BH set at level αppm.
    */
  def eBhRejections(evals: DataFrame, alphaPpm: Long): DataFrame = {
    require(alphaPpm > 0L && alphaPpm < 1000000L, "alphaPpm must be in (0, 1e6)")
    val in = evals.select(col("hyp").cast("string").as("hyp"), col("ln_e6").cast("long").as("ln_e6"))
    val kTot = broadcast(in.agg(count(lit(1)).as("__K")))
    val ranked = Relational.globalRank(in, Seq(col("ln_e6").desc, col("hyp")), "k")
    val thresholded = ranked
      .crossJoin(kTot)
      .withColumn(
        "thr6",
        expr(
          s"""CAST(round(ln(CAST(__K AS DOUBLE) * 1000000.0
             | / ($alphaPpm * CAST(k AS DOUBLE))) * 1000000, 0) AS BIGINT)""".stripMargin))
    val kStar = broadcast(
      thresholded.agg(
        coalesce(max(when(col("ln_e6") >= col("thr6"), col("k"))), lit(0L)).as("__kstar")))
    thresholded
      .crossJoin(kStar)
      .select(
        col("hyp"),
        col("ln_e6"),
        col("k"),
        col("thr6"),
        (col("k") <= col("__kstar")).as("rejected"))
      .orderBy(col("k"))
  }
}
