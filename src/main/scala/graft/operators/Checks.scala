package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Declarative data-quality checks over a table — the
  * dbt-tests / expectations primitive a 100 TB ingest runs before
  * publishing a partition: each check is a named predicate whose
  * VIOLATION count is aggregated in one pass; referential checks add
  * one anti-join per foreign key. The report is a tiny (n_checks)-row
  * frame a pipeline gates on (`violations == 0`), and — unlike a
  * fail-fast assert — it surveys every check in the same scan instead
  * of dying on the first.
  *
  * Scale shape: all row-predicate checks share ONE aggregate over the
  * table (sum of 0/1 per check — map-side combined, no shuffle of
  * rows); uniqueness is a key-count aggregate; referential integrity
  * is a left-anti join (broadcast when the parent's key set fits, AQE
  * decides — the dd_excise lesson, parent size is data-dependent).
  */
object Checks {

  /** One-pass violation counts for named row predicates: each row
    * violates `check` iff the predicate is FALSE OR NULL (a null
    * predicate is a violation — "unknown" does not pass a gate).
    * Returns (check, n_violations, pass).
    */
  def rowChecks(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "at least one check required")
    // positional aliases — check names are DATA (struct literals
    // below), never column identifiers, so any name is legal
    val counts = checks.zipWithIndex.map { case ((_, pred), i) =>
      sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L)).as(s"__c$i")
    }
    val one = df.agg(counts.head, counts.tail: _*)
    val stacked = explode(
      array(checks.zipWithIndex.map { case ((name, _), i) =>
        struct(lit(name).as("check_name"), col(s"__c$i").as("n_violations"))
      }: _*))
    one
      .select(stacked.as("c"))
      .select(
        col("c.check_name"),
        coalesce(col("c.n_violations"), lit(0L)).as("n_violations"),
        (coalesce(col("c.n_violations"), lit(0L)) === 0L).as("pass"))
  }

  /** Column profile — the data-catalog pass (null count, exact
    * distinct count, modal value) for a set of columns in ONE scan:
    * values stack as (column, value-string) pairs via a generated
    * explode, collapse through a single map-side-combined hash agg to
    * (column, value, n), and every per-column stat is a rollup of that
    * counts table. The counts table is value-cardinality-bounded — for
    * a near-unique column it approaches the row count (one shuffle,
    * AQE-split); profile low-cardinality facets when that matters.
    * Modal tie-break: highest n, then lexicographically smallest
    * value. Null values count toward n_nulls, never the mode.
    * Returns an eagerly assembled local frame (one row per profiled
    * column, the bounded-result class); the internal counts cache is
    * released before return, so the call leaves no persistent blocks.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "at least one column required")
    val stacked = df
      .select(
        explode(array(cols.map(c =>
          struct(lit(c).as("column"), col(c).cast("string").as("value"))): _*))
          .as("cv"))
      .select(col("cv.column"), col("cv.value"))
    val counts = stacked
      .groupBy(col("column"), col("value"))
      .agg(count(lit(1)).as("n"))
      .persist()
    val basics = counts
      .groupBy(col("column"))
      .agg(
        coalesce(sum(when(col("value").isNull, col("n"))), lit(0L))
          .as("n_nulls"),
        sum(when(col("value").isNotNull, 1L).otherwise(0L)).as("n_distinct"))
    // modal value via a per-column rank window over the counts table
    // (value-cardinality-bounded) — a min(STRING) aggregate would
    // degrade to SortAggregate (the i_cdc_apply lesson); the window
    // sorts within each column's slice only
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("column"))
      .orderBy(col("n").desc, col("value"))
    val top = counts
      .filter(col("value").isNotNull)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("column"), col("value").as("top_value"), col("n").as("top_n"))
    // the profile is ONE ROW PER PROFILED COLUMN — driver-trivial at
    // any corpus scale — so it assembles eagerly and the counts cache
    // is dropped before returning: no persistent blocks left at rest
    // after the call (structural, not a clearCache contract on the
    // caller). The heavy work (the stacked scan + hash agg) still ran
    // exactly once, shared by both rollup branches via the persist.
    val joined = basics.join(top, Seq("column"), "left")
    val rows = joined.collect()
    counts.unpersist(blocking = false)
    val spark = df.sparkSession
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1),
      joined.schema)
  }

  /** Uniqueness check: violations = rows beyond the first per key
    * (total rows − distinct keys, null keys counted like any value
    * via null-safe grouping). Returns the same (check, n_violations,
    * pass) shape.
    */
  def uniqueCheck(df: DataFrame, name: String, keys: Seq[Column]): DataFrame =
    df.groupBy(keys: _*)
      .agg(count(lit(1)).as("__n"))
      .agg(
        coalesce(sum(col("__n") - 1L), lit(0L)).as("n_violations"))
      .select(
        lit(name).as("check_name"),
        col("n_violations"),
        (col("n_violations") === 0L).as("pass"))

  /** Referential-integrity check: child rows whose `childKey` has no
    * match in `parent.parentKey` (null child keys are orphans — same
    * "unknown fails the gate" rule as [[rowChecks]]).
    */
  def referentialCheck(
      child: DataFrame,
      childKey: Column,
      parent: DataFrame,
      parentKey: Column,
      name: String): DataFrame = {
    child
      .select(childKey.as("__k"))
      .join(
        parent.select(parentKey.as("__k")).distinct(),
        Seq("__k"),
        "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(
        lit(name).as("check_name"),
        col("n_violations"),
        (col("n_violations") === 0L).as("pass"))
  }

  /** Key-skew summary — the pre-flight check for every groupBy/join
    * key at scale (a whale key is the thing that OOMs a 100 TB
    * shuffle; this report is what decides salting/AQE-skew-join
    * before the job runs). One row: group count, total rows, max
    * group size, DISCRETE p50/p99 group sizes, and skew6 =
    * max/mean in exact micro-units.
    *
    * Scale shape: group sizes collapse once (map-side-combined hash
    * agg), then collapse AGAIN into a count-of-counts histogram —
    * bounded by the number of DISTINCT group sizes, tiny even when
    * keys number billions — which collects to the driver (documented
    * bounded-bootstrap class) for the exact cumulative walk. No
    * global sort, no single-partition window, no approx percentile:
    * the percentiles are integer order statistics over the histogram,
    * ceil division in pure integer math (the oracle mirrors it with
    * `//`), so the report is engine-exact.
    *
    * Null keys count as a real group — null is a classic whale.
    * Percentile convention: p_q = min size s with
    * cum_groups(≤ s) ≥ ceil(q · n_keys).
    */
  def skewReport(df: DataFrame, key: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cc = df
      .groupBy(key.as("__key"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("n"))
      .agg(count(lit(1)).as("groups"))
      .orderBy(col("n"))
      .collect()
    if (cc.isEmpty)
      return Seq.empty[(Long, Long, Long, Long, Long, Long)]
        .toDF("n_keys", "total_rows", "max_n", "p50_n", "p99_n", "skew6")
    val nKeys = cc.map(_.getLong(1)).sum
    val total = cc.map(r => r.getLong(0) * r.getLong(1)).sum
    val maxN = cc.last.getLong(0)
    def pct(num: Long, den: Long): Long = {
      // target = ceil(num/den * nKeys) in pure integer math
      val target = (num * nKeys + den - 1L) / den
      var cum = 0L
      cc.iterator
        .map { r => cum += r.getLong(1); (r.getLong(0), cum) }
        .find(_._2 >= target)
        .map(_._1)
        .getOrElse(maxN)
    }
    Seq((nKeys, total, maxN, pct(1L, 2L), pct(99L, 100L), maxN * 1000000L * nKeys / total))
      .toDF("n_keys", "total_rows", "max_n", "p50_n", "p99_n", "skew6")
  }

  /** Artifact coverage audit: does a derived artifact (postings
    * index, ANN cells, dup-graph labels, payload store) cover exactly
    * the corpus rows it should? Reports expected/actual/missing/extra
    * id counts in ONE pass — the reconciliation an operator runs
    * after every build or incremental update, because a silent
    * partial build (a failed task retry, a bad predicate in the
    * increment) otherwise surfaces as quietly-wrong query results
    * weeks later.
    *
    * Scale shape: two distinct-id projections full-outer-joined on
    * the id — one shuffle of slim keys; counts come from one
    * aggregate over the join's null pattern. Null ids on either side
    * count as that side's rows (an artifact with null ids IS a
    * defect worth surfacing — they land in `n_extra`/`n_missing`
    * via the null-safe equality join... nulls never join, so each
    * null-id row shows up as uncovered).
    */
  def coverageAudit(
      expected: DataFrame,
      expectedId: Column,
      actual: DataFrame,
      actualId: Column): DataFrame = {
    val e = expected.select(expectedId.as("__id")).distinct()
      .withColumn("__e", lit(1))
    val a = actual.select(actualId.as("__id")).distinct()
      .withColumn("__a", lit(1))
    e.join(a, Seq("__id"), "full")
      .agg(
        coalesce(sum(col("__e")), lit(0)).cast("long").as("n_expected"),
        coalesce(sum(col("__a")), lit(0)).cast("long").as("n_actual"),
        coalesce(sum(when(col("__a").isNull, 1)), lit(0)).cast("long").as("n_missing"),
        coalesce(sum(when(col("__e").isNull, 1)), lit(0)).cast("long").as("n_extra"))
      .withColumn("covered", col("n_missing") === 0L)
  }

  /** Kolmogorov–Smirnov-style distribution drift per group: the max
    * CDF gap between each group's value distribution and the
    * corpus's, over `nBuckets` fixed quantization buckets of
    * [lo, hi] — the numeric-score counterpart of the token-KL and
    * embedding-drift monitors (is THIS source's quality/length/
    * perplexity distribution shaped like everyone else's?).
    *
    * Exactness: values quantize once to a bucket index (floor
    * arithmetic, clamped ends — out-of-range values land in the edge
    * buckets rather than vanishing), bucket counts are exact longs,
    * CDFs quantize to micro-units by integer division, and the KS
    * statistic is an integer max of integer gaps — engine-exact, the
    * oracle replays it with `//`. The true KS sup is approximated
    * from below by the bucket grid (sup over nBuckets boundaries) —
    * declared semantics, finer grid = tighter.
    *
    * Scale shape: one quantization pass → hash agg on (group,
    * bucket); the per-group CDF walk is a window PARTITIONED BY GROUP
    * over ≤ nBuckets rows (groups × buckets bounded, built by an
    * explode of the bucket range so empty buckets still carry the
    * running CDF); the corpus CDF is an nBuckets-bounded driver
    * bootstrap broadcast as a literal array. Null values carry no
    * distributional evidence and are excluded. Returns
    * (group, n, ks6, ks).
    */
  def ksDrift(
      df: DataFrame,
      group: Column,
      value: Column,
      lo: Double,
      hi: Double,
      nBuckets: Int): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    require(hi > lo, "hi must exceed lo")
    val b = least(
      greatest(
        floor((value - lit(lo)) / lit(hi - lo) * lit(nBuckets)).cast("long"),
        lit(0L)),
      lit(nBuckets - 1L))
    val counts = df
      .filter(value.isNotNull && group.isNotNull)
      .groupBy(group.as("group"), b.as("bucket"))
      .agg(count(lit(1)).as("c"))
    // corpus CDF: nBuckets-bounded driver bootstrap -> literal array
    val corpusHist = counts
      .groupBy(col("bucket"))
      .agg(sum(col("c")).as("c"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val total = corpusHist.values.sum
    val corpusCdf6: Seq[Long] = (0L until nBuckets.toLong)
      .scanLeft(0L)((cum, i) => cum + corpusHist.getOrElse(i, 0L))
      .tail
      .map(cum => if (total == 0L) 0L else cum * 1000000L / total)
    val cdfArr = array(corpusCdf6.map(lit): _*)
    // per group x EVERY bucket (empty buckets carry the running CDF)
    val grid = counts
      .groupBy(col("group"))
      .agg(sum(col("c")).as("n"))
      .select(
        col("group"),
        col("n"),
        explode(sequence(lit(0L), lit(nBuckets - 1L))).as("bucket"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("group"))
      .orderBy(col("bucket"))
    grid
      .join(counts, Seq("group", "bucket"), "left")
      .withColumn("cum", sum(coalesce(col("c"), lit(0L))).over(w))
      .withColumn("cdf6", expr("cum * CAST(1000000 AS DECIMAL(38,0)) div n"))
      .withColumn(
        "gap",
        abs(col("cdf6") - element_at(cdfArr, col("bucket").cast("int") + 1)))
      .groupBy(col("group"))
      .agg(max(col("n")).as("n"), max(col("gap")).as("ks6"))
      .withColumn("ks", col("ks6").cast("double") / lit(1e6))
  }

  /** The named offenders behind [[skewReport]]'s max: the `k`
    * heaviest keys with exact row counts and micro-unit share of the
    * table — the list a salting config or a drop-list is written
    * from. Keys render as strings (one report schema for any key
    * type); ties break (n desc, key asc); the total is a one-scalar
    * driver bootstrap off the group table.
    */
  def skewTopKeys(df: DataFrame, key: Column, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val gs = df
      .groupBy(key.cast("string").as("key"))
      .agg(count(lit(1)).as("n"))
    val total = gs.agg(coalesce(sum(col("n")), lit(0L))).head().getLong(0)
    gs.withColumn("share6", expr(s"n * CAST(1000000 AS DECIMAL(38,0)) div $total"))
      .orderBy(col("n").desc, col("key"))
      .limit(k)
  }

  /** CUSUM change-point monitor (Page 1954) over a pre-aggregated
    * (grp, bucket, n) count table — the drift-detection complement of
    * [[volumeAnomaly]]'s spike gate: the cumulative sum
    * S_t = max(0, S_{t-1} + (n_t − μ − slack)) accumulates SUSTAINED
    * upward level shifts a per-bucket z-score never flags (ten days
    * each 2σ high are ten unflagged z-rows but one loud CUSUM ramp).
    * μ is the group's own mean in exact micro-units
    * (sum·1e6 div days), slack = μ6 div slackDivisor, and the fold
    * runs left-to-right over the bucket-sorted counts with an
    * all-BIGINT [S, maxS] accumulator — order-pinned and
    * engine-exact; the oracle replays the identical fold via
    * list_reduce. The per-group sequence buffer is bounded by the
    * BUCKET count (days, not rows) — the sanctioned bounded-buffer
    * case. Alarm: maxS > alarmMult·μ6.
    *
    * Returns (grp, days, mu6, cusum_final6, cusum_max6, alarm).
    */
  def cusum(
      counts: DataFrame,
      slackDivisor: Int = 10,
      alarmMult: Int = 5): DataFrame = {
    require(slackDivisor >= 1 && alarmMult >= 1, "divisor and multiplier must be >= 1")
    val g = counts
      .groupBy(col("grp"))
      .agg(
        sort_array(collect_list(struct(col("bucket"), col("n")))).as("seq"),
        sum(col("n")).as("tot"),
        count(lit(1)).as("days"))
      .withColumn("mu6", expr("tot * CAST(1000000 AS DECIMAL(38,0)) div days"))
      .withColumn("slack6", expr(s"mu6 div $slackDivisor"))
    g.withColumn(
        "st",
        aggregate(
          transform(col("seq"), x => x.getField("n")),
          array(lit(0L), lit(0L)),
          (acc, x) => {
            val s = greatest(
              lit(0L),
              element_at(acc, 1) + x * lit(1000000L) - col("mu6") - col("slack6"))
            array(s, greatest(element_at(acc, 2), s))
          }))
      .select(
        col("grp"),
        col("days"),
        col("mu6"),
        element_at(col("st"), 1).as("cusum_final6"),
        element_at(col("st"), 2).as("cusum_max6"),
        (element_at(col("st"), 2) > col("mu6") * alarmMult).as("alarm"))
  }

  /** Page–Hinkley drift monitor (Page 1954; the streaming-ML variant
    * of Gama et al., "A survey on concept drift adaptation", 2014)
    * over the same pre-aggregated (grp, bucket, n) table as [[cusum]]
    * — but where CUSUM references the group's GLOBAL mean (known
    * baseline), Page–Hinkley tracks the RUNNING mean, so it detects a
    * drift away from "whatever the series was so far" without any
    * baseline parameter:
    *
    *   m_t  = Σ_{i≤t} (1e6·x_i − mean6_i − delta6),
    *   mean6_i = 1e6·S_i div i   (running mean, one truncating
    *                              division per step off the exact
    *                              prefix sum S_i ≥ 0),
    *   PH_t = m_t − min_{i≤t} m_i,   alarm ⇔ max_t PH_t > lambda6.
    *
    * Exactness: the whole fold is BIGINT arithmetic over the
    * bucket-sorted sequence with a [i, S, m, min_m, max_ph]
    * accumulator — order-pinned, engine-exact; the oracle replays the
    * identical fold via list_reduce. Per-group buffers are bounded by
    * the BUCKET count (days, never rows) — the sanctioned
    * bounded-buffer case shared with [[cusum]].
    *
    * `delta6` is the drift allowance (micro-units of x per step — 0
    * flags any sustained upward shift), `lambda6` the alarm threshold
    * in the same micro-x units. Returns (grp, days, m_final6,
    * ph_max6, alarm).
    */
  def pageHinkley(
      counts: DataFrame,
      delta6: Long,
      lambda6: Long): DataFrame = {
    require(lambda6 > 0L, "lambda6 must be positive")
    require(delta6 >= 0L, "delta6 must be >= 0")
    val g = counts
      .groupBy(col("grp"))
      .agg(
        sort_array(collect_list(struct(col("bucket"), col("n")))).as("seq"),
        count(lit(1)).as("days"))
    g.withColumn(
        "st",
        aggregate(
          transform(col("seq"), x => x.getField("n")),
          array(lit(0L), lit(0L), lit(0L), lit(Long.MaxValue), lit(0L)),
          (acc, x) => {
            val i = element_at(acc, 1) + lit(1L)
            val s = element_at(acc, 2) + x
            val mean6 = call_function("div", s * lit(1000000L), i)
            val m = element_at(acc, 3) + x * lit(1000000L) - mean6 - lit(delta6)
            val minm = least(element_at(acc, 4), m)
            val ph = m - minm
            array(i, s, m, minm, greatest(element_at(acc, 5), ph))
          }))
      .select(
        col("grp"),
        col("days"),
        element_at(col("st"), 3).as("m_final6"),
        element_at(col("st"), 5).as("ph_max6"),
        (element_at(col("st"), 5) > lambda6).as("alarm"))
  }

  /** Ingest-volume anomaly gate: per (group, bucket) row counts
    * z-scored against each group's TRAILING `window` buckets — the
    * daily "did a source silently halve / a bot 10× a feed" check a
    * pipeline runs before training on the day's data. `bucketCol`
    * must be a sortable bucket key (a yyyy-MM-dd day string).
    *
    * Exactness: counts and their trailing sum / sum-of-squares are
    * BIGINTs over a ROWS-bounded frame (never RANGE — whale-proof by
    * construction, the w_rolling_median rule), and
    * z = (w·n − sum) / sqrt(max(w·sumsq − sum², w²)) — integers into
    * one sqrt and one division, so both engines divide identical
    * values. The `w²` floor is a 1-count noise level (σ ≥ 1): a
    * PERFECTLY FLAT history has zero sample variance, and without the
    * floor the most obvious anomaly of all — a 10× spike after a flat
    * week — would be unscorable; with it, flat-history z degrades to
    * exactly n − mean. z is NULL (and the row unflagged) only while
    * the trailing window has fewer than `minWindow` buckets
    * (warm-up); the count columns always publish for eyeballing.
    *
    * Scale: one hash-agg shrinks the event stream to
    * (groups × buckets) rows before any window — the window sorts
    * group-bounded count tables, never events.
    */
  def volumeAnomaly(
      df: DataFrame,
      group: Column,
      bucketCol: Column,
      window: Int,
      minWindow: Int,
      zThreshold: Double): DataFrame =
    volumeAnomalyFromCounts(
      df.groupBy(group.cast("string").as("grp"), bucketCol.as("bucket"))
        .agg(count(lit(1)).as("n")),
      window,
      minWindow,
      zThreshold)

  /** [[volumeAnomaly]] over a PRE-AGGREGATED (grp, bucket, n) count
    * table — the incremental-maintenance entry point: counts are
    * linear, so per-micro-batch partial counts append to an artifact
    * and SUM-merge into exactly this input (the a_cms_merged rule
    * applied to the volume gate). Callers merge duplicates (sum n by
    * (grp, bucket)) before scoring.
    */
  def volumeAnomalyFromCounts(
      counts: DataFrame,
      window: Int,
      minWindow: Int,
      zThreshold: Double): DataFrame = {
    require(window >= minWindow && minWindow >= 2, "need window >= minWindow >= 2")
    import org.apache.spark.sql.expressions.Window
    val w = Window
      .partitionBy(col("grp"))
      .orderBy(col("bucket"))
      .rowsBetween(-window, -1)
    val stats = counts
      .withColumn("w_cnt", count(lit(1)).over(w))
      .withColumn("w_sum", sum(col("n")).over(w))
      .withColumn(
        "w_sumsq",
        sum(col("n").cast("decimal(38,0)") * col("n")).over(w))
    // variance cross-products in DECIMAL — a ~3e9-row bucket squares
    // past 2^63
    val varN2 = greatest(
      col("w_cnt") * col("w_sumsq") - col("w_sum").cast("decimal(38,0)") * col("w_sum"),
      (col("w_cnt") * col("w_cnt")).cast("decimal(38,0)"))
    val z = (col("w_cnt") * col("n") - col("w_sum")).cast("double") /
      sqrt(varN2.cast("double"))
    stats
      .withColumn(
        "z",
        when(col("w_cnt") >= minWindow, z)
          .otherwise(lit(null).cast("double")))
      // coalesce, not &&: null z must read as NOT-flagged, and
      // three-valued AND would leave is_anomaly null instead of false
      .withColumn(
        "is_anomaly",
        coalesce(abs(col("z")) >= zThreshold, lit(false)))
      .select(col("grp"), col("bucket"), col("n"), col("w_cnt"), col("z"), col("is_anomaly"))
  }

  /** Partition integrity manifest — the hand-off receipt for a data
    * export: per partition, the row count and an ORDER-FREE content
    * checksum (bit_xor of the portable row hash — XOR commutes,
    * associates and cannot overflow, so the checksum is identical on
    * any partitioning, any engine, any row order; a SUM checksum
    * would wrap engine-dependently under ANSI). The receiving side
    * recomputes the manifest and diffs: a lost file, a duplicated
    * retry batch, or a truncated copy all surface as a count or
    * checksum mismatch per partition, without comparing a single
    * row. One hash-aggregate over the export.
    */
  def partitionManifest(
      df: DataFrame,
      partitionCol: Column,
      rowKey: Column): DataFrame =
    df.select(partitionCol.as("partition"), Sampling.hash32(rowKey).as("__h"))
      .groupBy(col("partition"))
      .agg(
        count(lit(1)).as("n_rows"),
        expr("bit_xor(__h)").as("content_xor"))

  /** Event-time disorder audit: per group, how many events arrived
    * with an event time EARLIER than the previous arrival's (lag
    * over the per-key arrival order) — the ingest-health metric that
    * separates "pipeline is late" (watermark drops, [[graft
    * .streaming.Streams.lateDataAudit]]) from "clocks are wrong /
    * replays are happening" (this): a replayed partition or a
    * skewed producer clock shows up as a regression-ppm spike per
    * source long before downstream windows misbehave. Arrival order
    * must be a total order per key (an arrival sequence id); the
    * first arrival per key has no predecessor and never counts.
    * SEMANTICS PINNED: the arrival order is per KEY across ALL
    * groups — the lag window partitions by keyCol only, so when one
    * key spans several groups (e.g. a user across event types) the
    * previous-arrival comparison deliberately crosses group
    * boundaries and the regression is charged to the LATER event's
    * group. That is the producer-clock reading this audit exists
    * for: a replayed or skew-clocked producer (the key) is disordered
    * regardless of which stream its events land in, and the group
    * column only attributes WHERE the damage surfaced. Callers who
    * want strictly per-group order should pass a composite key
    * (e.g. struct(groupCol, keyCol)) as keyCol instead.
    * One key-partitioned lag window + a group hash-agg; ppm exact
    * integer. Returns (group, n_events, n_regressions,
    * regression_ppm).
    */
  def outOfOrderAudit(
      df: DataFrame,
      groupCol: Column,
      keyCol: Column,
      seqCol: Column,
      tsCol: Column): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(seqCol)
    df.filter(tsCol.isNotNull && seqCol.isNotNull)
      .select(
        groupCol.as("grp"),
        tsCol.as("__ts"),
        lag(tsCol, 1).over(w).as("__prev"))
      .groupBy(col("grp"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("__ts") < col("__prev"), 1L).otherwise(0L)).as("n_regressions"))
      .withColumn(
        "regression_ppm",
        expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * n_regressions div n_events AS BIGINT)"))
  }

  /** Population Stability Index (the industry-standard drift score;
    * PSI = Σ (p_a − p_b)·ln(p_a/p_b) over shared bins) between two
    * bucket-count tables — e.g. two [[Sketches.histSketch]] snapshots
    * of the same column, so the drift check reads two 64-row grids,
    * never the fact tables. Add-one smoothing over the UNION bucket
    * set keeps empty-on-one-side buckets defined and deterministic
    * (no epsilon knob): p = (n + 1)/(N + K) with K = union bucket
    * count. Per-bucket terms round to micro-nat BIGINTs before the
    * sum (the t_source_kl discipline — the one float op per term is
    * the ln, shared bit-for-bit by both engines' IEEE doubles), so
    * the total is order- and partition-free. Rule of thumb the
    * caller applies: psi6 < 1e5 stable, > 2e5 shifted.
    * Returns one row: (n_buckets, n_rows_a, n_rows_b, psi6).
    */
  def psiFromCounts(a: DataFrame, b: DataFrame): DataFrame = {
    val joined = a.select(col("bucket"), col("n").as("n_a"))
      .join(b.select(col("bucket"), col("n").as("n_b")), Seq("bucket"), "full_outer")
      .na.fill(0L, Seq("n_a", "n_b"))
    val tot = broadcast(
      joined.agg(
        count(lit(1)).as("__k"),
        sum(col("n_a")).cast("long").as("__na"),
        sum(col("n_b")).cast("long").as("__nb")))
    joined
      .crossJoin(tot)
      .withColumn(
        "pa",
        (col("n_a") + 1L).cast("double") / (col("__na") + col("__k")).cast("double"))
      .withColumn(
        "pb",
        (col("n_b") + 1L).cast("double") / (col("__nb") + col("__k")).cast("double"))
      .withColumn(
        "t6",
        round((col("pa") - col("pb")) * log(col("pa") / col("pb")) * lit(1e6), 0).cast("long"))
      .groupBy(col("__k"), col("__na"), col("__nb"))
      .agg(sum(col("t6")).as("psi6"))
      .select(
        col("__k").as("n_buckets"),
        col("__na").as("n_rows_a"),
        col("__nb").as("n_rows_b"),
        col("psi6"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic between two bucket-count
    * tables (two [[Sketches.histSketch]] grids of the same column):
    * D = max over buckets of |F_a − F_b|, the CDF-gap drift score
    * that localizes WHERE the distributions diverge, complementing
    * [[psiFromCounts]]'s mass-weighted total. All integer: per-bucket
    * CDFs in micro-units (1e6·cum div N, truncating — counts are
    * non-negative so truncation == floor on both engines), the
    * running sums over the GRID (≤ buckets rows — the documented
    * bounded-window class). Returns one row: (n_buckets, n_rows_a,
    * n_rows_b, ks_bucket = the argmax bucket with min-bucket
    * tie-break — read it against the grid's edges to name the
    * diverging price/size band — and ks6 = D in micro-units).
    * Interpretation is sample-size-dependent (the classic
    * c(α)·√((na+nb)/(na·nb)) threshold) — the caller applies it.
    * An EMPTY side (zero total count) has no CDF, so the plan FAILS
    * FAST (in-plan assert_true, the canary-guard idiom) instead of
    * returning a null-ks6 row with an arbitrary argmax bucket; two
    * empty sides return zero rows (nothing to compare).
    */
  def ksFromCounts(a: DataFrame, b: DataFrame): DataFrame = {
    val joined = a.select(col("bucket"), col("n").as("n_a"))
      .join(b.select(col("bucket"), col("n").as("n_b")), Seq("bucket"), "full_outer")
      .na.fill(0L, Seq("n_a", "n_b"))
    val tot = broadcast(
      joined.agg(
        count(lit(1)).as("__k"),
        sum(col("n_a")).cast("long").as("__na"),
        sum(col("n_b")).cast("long").as("__nb")))
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joined
      .crossJoin(tot)
      .filter(
        assert_true(
          col("__na") > 0L && col("__nb") > 0L,
          concat(
            lit("ksFromCounts: both histograms must be non-empty (no CDF exists " +
              "for an empty side); totals were "),
            col("__na").cast("string"),
            lit(" / "),
            col("__nb").cast("string"))).isNull)
      .withColumn("ca", sum(col("n_a")).over(w))
      .withColumn("cb", sum(col("n_b")).over(w))
      .withColumn(
        "gap6",
        abs(
          expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * ca div __na AS BIGINT)") -
            expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * cb div __nb AS BIGINT)")))
      .withColumn(
        "rk",
        row_number().over(Window.orderBy(col("gap6").desc, col("bucket"))))
      .filter(col("rk") === 1)
      .select(
        col("__k").as("n_buckets"),
        col("__na").as("n_rows_a"),
        col("__nb").as("n_rows_b"),
        col("bucket").as("ks_bucket"),
        col("gap6").as("ks6"))
  }

  /** Jensen–Shannon divergence between two bucket-count tables (Lin
    * 1991) — the BOUNDED, SYMMETRIC drift score completing the panel:
    * [[psiFromCounts]] is unbounded and blows up on vanishing bins,
    * [[ksFromCounts]] only sees the worst CDF gap; JSD =
    * ½KL(P‖M) + ½KL(Q‖M) with M the midpoint is finite by
    * construction (≤ ln 2 ≈ 693147 micro-nats), symmetric, and its
    * square root is a metric — the number you can put on a dashboard
    * axis. Same add-one smoothing over the union bucket set and the
    * same per-term micro-nat rounding discipline as psiFromCounts
    * (the one float op per term is the ln, shared bit-for-bit by
    * both engines' IEEE doubles — terms round to BIGINT before the
    * sum, so the total is order- and partition-free).
    * Returns one row (n_buckets, n_rows_a, n_rows_b, js6).
    */
  def jsFromCounts(a: DataFrame, b: DataFrame): DataFrame = {
    val joined = a.select(col("bucket"), col("n").as("n_a"))
      .join(b.select(col("bucket"), col("n").as("n_b")), Seq("bucket"), "full_outer")
      .na.fill(0L, Seq("n_a", "n_b"))
    val tot = broadcast(
      joined.agg(
        count(lit(1)).as("__k"),
        sum(col("n_a")).cast("long").as("__na"),
        sum(col("n_b")).cast("long").as("__nb")))
    joined
      .crossJoin(tot)
      .withColumn(
        "pa",
        (col("n_a") + 1L).cast("double") / (col("__na") + col("__k")).cast("double"))
      .withColumn(
        "pb",
        (col("n_b") + 1L).cast("double") / (col("__nb") + col("__k")).cast("double"))
      .withColumn(
        "t6",
        round(
          (col("pa") * log(col("pa") / ((col("pa") + col("pb")) / 2.0))
            + col("pb") * log(col("pb") / ((col("pa") + col("pb")) / 2.0)))
            / 2.0 * lit(1e6),
          0).cast("long"))
      .groupBy(col("__k"), col("__na"), col("__nb"))
      .agg(sum(col("t6")).as("js6"))
      .select(
        col("__k").as("n_buckets"),
        col("__na").as("n_rows_a"),
        col("__nb").as("n_rows_b"),
        col("js6"))
  }

  /** Single-changepoint binomial split scan (the sup-LRT / binary-
    * segmentation first step, Hinkley 1970) — the WHERE companion of
    * [[pageHinkley]]'s WHETHER: for every split point of the bucket
    * grid, the likelihood-ratio gain of modeling the success rate as
    * two segments instead of one,
    *
    *   g6(s) = 2·(LL(left) + LL(right) − LL(all))
    *
    * with LL(x, n) = x·ln(x/n) + (n−x)·ln((n−x)/n). The full k-row
    * table is emitted (the dd_threshold_sweep posture: the analyst
    * reads the knee / argmax; sup-LRT critical values are
    * scan-length-dependent, so no significance column pretends
    * otherwise).
    *
    * Exactness — the jsFromCounts entropy-family discipline: the one
    * float op per term is the ln of an integer ratio (identical IEEE
    * doubles in both engines), rounded ONCE to micro-nats via
    * HALF_UP, then multiplied by the exact integer count in
    * DECIMAL(38,0) (c·l6 reaches ~28e6·N, past 2^63 near 3e11 rows)
    * and summed exactly; empty-segment and zero/full-rate terms
    * contribute 0 by the x·ln(x) = 0 convention. Cumulative (x, n)
    * prefixes come from [[Relational.globalCumSum]] over the bucket
    * grid — the day/bucket DOMAIN, never the event stream.
    *
    * Returns one row per split AFTER each bucket except the last
    * (bucket, n_left, x_left, n_right, x_right, g6), ordered by
    * bucket.
    */
  def binomialSplitScan(df: DataFrame, successCol: Column, bucketCol: Column): DataFrame = {
    val cells = df
      .filter(successCol.isNotNull && bucketCol.isNotNull)
      .groupBy(bucketCol.as("bucket"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(successCol.cast("boolean"), 1L).otherwise(0L)).as("x"))
    binomialScanOnGrid(cells).orderBy(col("bucket"))
  }

  /** The split scan proper, over an already-built (bucket, n, x)
    * count grid — totals fold from the GRID it is given, so the same
    * scan serves the full series and any contiguous sub-segment of
    * it (the [[binomialBinseg2]] recursion). Unordered; callers sort. */
  private[graft] def binomialScanOnGrid(cells: DataFrame): DataFrame = {
    val c1 = Relational.globalCumSum(cells, Seq(col("bucket")), "x", "__x0")
    val c01 = Relational.globalCumSum(c1, Seq(col("bucket")), "n", "__n0")
    val tot = broadcast(cells.agg(sum(col("n")).as("__nn"), sum(col("x")).as("__xx")))
    // micro-nat log-likelihood of a (x, n) segment: per-term ln
    // rounded once (HALF_UP, the shared-IEEE contract), exact
    // DECIMAL multiply-and-add after
    def ll6(x: Column, n: Column): Column = {
      def term(c: Column): Column =
        when(
          c > 0L,
          c.cast("decimal(38,0)") *
            round(log(c.cast("double") / n.cast("double")) * 1e6, 0).cast("long"))
          .otherwise(lit(0L).cast("decimal(38,0)"))
      term(x) + term(n - x)
    }
    val xl = col("__x0") + col("x")
    val nl = col("__n0") + col("n")
    c01
      .crossJoin(tot)
      .filter(nl < col("__nn"))
      .select(
        col("bucket"),
        nl.as("n_left"),
        xl.as("x_left"),
        (col("__nn") - nl).as("n_right"),
        (col("__xx") - xl).as("x_right"),
        (lit(2L) *
          (ll6(xl, nl) + ll6(col("__xx") - xl, col("__nn") - nl)
            - ll6(col("__xx"), col("__nn"))))
          .cast("long").as("g6"))
  }

  /** Depth-2 binary segmentation of the binomial rate series
    * (Scott & Knott 1974 / Vostrikova 1981's recursion, stopped at
    * depth 2): run [[binomialScanOnGrid]] on the full grid, take the
    * argmax split (ties to the earliest bucket — the statistic is an
    * exact integer in both engines, so the argmax is deterministic),
    * then re-run the SAME scan on each side's sub-grid, where the
    * segment's own totals (folded from the sub-grid) are the null
    * model. Localizes up to three changepoints from ONE corpus scan:
    * the events collapse to the (bucket, n, x) day-grid once, and
    * every subsequent pass is grid-bounded (the persisted cells are
    * the only thing re-read).
    *
    * Returns ≤3 rows (depth, side, bucket, n_left, x_left, n_right,
    * x_right, g6): depth 1 side '*' = the top split; depth 2 sides
    * 'L'/'R' = the best split strictly inside each segment (absent
    * when a side has <2 buckets). Ordered by (depth, side).
    */
  def binomialBinseg2(df: DataFrame, successCol: Column, bucketCol: Column): DataFrame =
    binomialBinseg2FromCells(
      df
        .filter(successCol.isNotNull && bucketCol.isNotNull)
        .groupBy(bucketCol.as("bucket"))
        .agg(
          count(lit(1)).as("n"),
          sum(when(successCol.cast("boolean"), 1L).otherwise(0L)).as("x")))

  /** [[binomialBinseg2]] over an already-merged (bucket, n, x) count
    * grid — the grid is the MERGEABLE sufficient statistic (partial
    * grids SUM-merge exactly), so a streaming monitor that appends
    * per-batch partials re-runs this bit-equal to the batch scan
    * with zero history re-scans (the st_eprocess grid, reused). */
  def binomialBinseg2FromCells(cells0: DataFrame): DataFrame = {
    val cells = cells0
      .select(col("bucket"), col("n").cast("long").as("n"), col("x").cast("long").as("x"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val outCols = Seq("bucket", "n_left", "x_left", "n_right", "x_right", "g6").map(col)
    def best(scan: DataFrame): DataFrame =
      scan.orderBy(col("g6").desc, col("bucket")).limit(1).select(outCols: _*)
    val top = best(binomialScanOnGrid(cells))
    val t1 = broadcast(top.select(col("bucket").as("__t1")))
    val sided = cells.crossJoin(t1)
    val bestL = best(binomialScanOnGrid(
      sided.filter(col("bucket") <= col("__t1")).drop("__t1")))
    val bestR = best(binomialScanOnGrid(
      sided.filter(col("bucket") > col("__t1")).drop("__t1")))
    top.withColumn("depth", lit(1).cast("int")).withColumn("side", lit("*"))
      .unionByName(
        bestL.withColumn("depth", lit(2).cast("int")).withColumn("side", lit("L")))
      .unionByName(
        bestR.withColumn("depth", lit(2).cast("int")).withColumn("side", lit("R")))
      .select(Seq(col("depth"), col("side")) ++ outCols: _*)
      .orderBy(col("depth"), col("side"))
  }

  /** Mean-shift single-changepoint split scan — [[binomialSplitScan]]'s
    * continuous sibling (the known-variance Gaussian LRT / classic
    * binary-segmentation statistic): for every split of the bucket
    * grid, z²(s) = w·(μ_l − μ_r)²/σ̂² with w = n_l·n_r/n the split
    * weight and σ̂² the pooled MLE variance — WHERE did the level of
    * a value series move, next to the volume/rate monitors' WHETHER.
    *
    * Exact-integer staging (each stage sized to DECIMAL(38,0) — the
    * naive single expression d²·n with d = s_l·n_r − s_r·n_l reaches
    * ~1e51 at corpus scale and silently nulls a decimal):
    * per-side micro-means m6 = (1e6·s) div n; w = (n_l·n_r) div n;
    * varc2 = (n·Q − S²) div n² (pooled variance in value² units,
    * truncating — document sub-unit loss); z2_6 = (w·d6²) div
    * (1e6·varc2) with d6 = m_l6 − m_r6. Every division truncating,
    * both engines identical. Constant series (varc2 ≤ 0) emits 0.
    * Prefix sums from [[Relational.globalCumSum]] over the bucket
    * DOMAIN. Returns one row per split (bucket, n_left, n_right,
    * mean_l6, mean_r6, z2_6), ordered by bucket.
    */
  def meanSplitScan(df: DataFrame, valueCol: Column, bucketCol: Column): DataFrame = {
    // ONE corpus scan: the per-bucket cells also carry the sum of
    // squares, so the totals fold from the grid instead of re-reading
    // the events
    val cells = df
      .filter(valueCol.isNotNull && bucketCol.isNotNull)
      .groupBy(bucketCol.as("bucket"))
      .agg(
        count(lit(1)).as("n"),
        sum(valueCol.cast("long")).as("s"),
        sum(valueCol.cast("long").cast("decimal(38,0)") * valueCol.cast("long"))
          .as("q"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    meanScanOnGrid(cells).orderBy(col("bucket"))
  }

  /** The mean-shift scan proper, over an already-built
    * (bucket, n, s, q) moment grid — the segment totals (and the
    * pooled variance of the null model) fold from the GRID it is
    * given, so the same scan serves the full series and any
    * contiguous sub-segment ([[meanBinseg2]]). Unordered. */
  private[graft] def meanScanOnGrid(cells: DataFrame): DataFrame = {
    val c1 = Relational.globalCumSum(cells, Seq(col("bucket")), "s", "__s0")
    val c01 = Relational.globalCumSum(c1, Seq(col("bucket")), "n", "__n0")
    val tot = broadcast(
      cells.agg(
        sum(col("n")).as("__nn"),
        sum(col("s")).as("__ss"),
        sum(col("q")).as("__qq")))
    val nl = col("__n0") + col("n")
    val sl = col("__s0") + col("s")
    val nr = col("__nn") - nl
    val sr = col("__ss") - sl
    c01
      .crossJoin(tot)
      .filter(nl < col("__nn"))
      .withColumn("__ml6", expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * (__s0 + s)) div (__n0 + n) AS BIGINT)"))
      .withColumn("__mr6", expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * (__ss - __s0 - s)) div (__nn - __n0 - n) AS BIGINT)"))
      .withColumn("__w", expr("CAST((CAST(__n0 + n AS DECIMAL(38,0)) * (__nn - __n0 - n)) div __nn AS BIGINT)"))
      .withColumn(
        "__varc2",
        expr(
          """CAST((CAST(__nn AS DECIMAL(38,0)) * __qq
            |  - CAST(__ss AS DECIMAL(38,0)) * __ss)
            |div (CAST(__nn AS DECIMAL(38,0)) * __nn) AS BIGINT)""".stripMargin))
      .select(
        col("bucket"),
        nl.as("n_left"),
        nr.as("n_right"),
        col("__ml6").as("mean_l6"),
        col("__mr6").as("mean_r6"),
        expr(
          """CASE WHEN __varc2 <= 0 THEN CAST(0 AS BIGINT)
            |ELSE CAST(
            |  (CAST(__w AS DECIMAL(38,0))
            |   * CAST(__ml6 - __mr6 AS DECIMAL(38,0))
            |   * CAST(__ml6 - __mr6 AS DECIMAL(38,0)))
            |  div (CAST(1000000 AS DECIMAL(38,0)) * __varc2)
            |AS BIGINT) END""".stripMargin).as("z2_6"))
  }

  /** Depth-2 binary segmentation of the value-level series —
    * [[binomialBinseg2]]'s continuous sibling on the
    * [[meanScanOnGrid]] statistic. Argmax split of the full grid
    * (ties to the earliest bucket), then the best split strictly
    * inside each side, each side scored against its OWN pooled
    * variance (the sub-grid's moments are the null model). One
    * corpus scan builds the (bucket, n, s, q) grid; all three scans
    * re-read only the persisted grid. Returns ≤3 rows (depth, side,
    * bucket, n_left, n_right, mean_l6, mean_r6, z2_6), ordered by
    * (depth, side); a side with <2 buckets emits nothing.
    */
  def meanBinseg2(df: DataFrame, valueCol: Column, bucketCol: Column): DataFrame =
    meanBinseg2FromCells(
      df
        .filter(valueCol.isNotNull && bucketCol.isNotNull)
        .groupBy(bucketCol.as("bucket"))
        .agg(
          count(lit(1)).as("n"),
          sum(valueCol.cast("long")).as("s"),
          sum(valueCol.cast("long").cast("decimal(38,0)") * valueCol.cast("long"))
            .as("q")))

  /** [[meanBinseg2]] over an already-merged (bucket, n, s, q) moment
    * grid — n/s are BIGINT sums and q a DECIMAL(38,0) sum, ALL
    * linear, so per-batch partial grids SUM-merge exactly and a
    * streaming monitor re-runs this bit-equal to the batch scan
    * (the [[binomialBinseg2FromCells]] posture with one more
    * moment). */
  def meanBinseg2FromCells(cells0: DataFrame): DataFrame = {
    val cells = cells0
      .select(
        col("bucket"),
        col("n").cast("long").as("n"),
        col("s").cast("long").as("s"),
        col("q").cast("decimal(38,0)").as("q"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val outCols =
      Seq("bucket", "n_left", "n_right", "mean_l6", "mean_r6", "z2_6").map(col)
    def best(scan: DataFrame): DataFrame =
      scan.orderBy(col("z2_6").desc, col("bucket")).limit(1).select(outCols: _*)
    val top = best(meanScanOnGrid(cells))
    val t1 = broadcast(top.select(col("bucket").as("__t1")))
    val sided = cells.crossJoin(t1)
    val bestL = best(meanScanOnGrid(
      sided.filter(col("bucket") <= col("__t1")).drop("__t1")))
    val bestR = best(meanScanOnGrid(
      sided.filter(col("bucket") > col("__t1")).drop("__t1")))
    top.withColumn("depth", lit(1).cast("int")).withColumn("side", lit("*"))
      .unionByName(
        bestL.withColumn("depth", lit(2).cast("int")).withColumn("side", lit("L")))
      .unionByName(
        bestR.withColumn("depth", lit(2).cast("int")).withColumn("side", lit("R")))
      .select(Seq(col("depth"), col("side")) ++ outCols: _*)
      .orderBy(col("depth"), col("side"))
  }

  /** Depth-3 binary segmentation — [[meanBinseg2FromCells]] deepened
    * one level for multi-changepoint localization (up to 7 split
    * candidates over ≤4 leaf segments): the depth-2 splits (t1, tL,
    * tR) bound four sub-segments, and each is scanned against its
    * OWN pooled variance exactly as depth 2 scans the halves. All
    * segment restriction is plan-side crossJoin with the 1-row
    * best-split frames — no driver collect, and a parent side with
    * <2 buckets yields an EMPTY 1-row frame whose crossJoin empties
    * the child segments too (the missing-parent semantics for free).
    * Same mergeable (bucket, n, s, q) grid; ≤7 rows out
    * (depth, side ∈ {*, L, R, LL, LR, RL, RR}, bucket, n_left,
    * n_right, mean_l6, mean_r6, z2_6), ordered by (depth, side).
    */
  def meanBinseg3FromCells(cells0: DataFrame): DataFrame = {
    val cells = cells0
      .select(
        col("bucket"),
        col("n").cast("long").as("n"),
        col("s").cast("long").as("s"),
        col("q").cast("decimal(38,0)").as("q"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val outCols =
      Seq("bucket", "n_left", "n_right", "mean_l6", "mean_r6", "z2_6").map(col)
    def best(scan: DataFrame): DataFrame =
      scan.orderBy(col("z2_6").desc, col("bucket")).limit(1).select(outCols: _*)
    val top = best(meanScanOnGrid(cells))
    val t1 = broadcast(top.select(col("bucket").as("__t1")))
    val sided = cells.crossJoin(t1)
    val bestL = best(meanScanOnGrid(
      sided.filter(col("bucket") <= col("__t1")).drop("__t1")))
    val bestR = best(meanScanOnGrid(
      sided.filter(col("bucket") > col("__t1")).drop("__t1")))
    val tL = broadcast(bestL.select(col("bucket").as("__tl")))
    val tR = broadcast(bestR.select(col("bucket").as("__tr")))
    val segLL = cells.crossJoin(tL)
      .filter(col("bucket") <= col("__tl")).drop("__tl")
    val segLR = cells.crossJoin(tL).crossJoin(t1)
      .filter(col("bucket") > col("__tl") && col("bucket") <= col("__t1"))
      .drop("__tl", "__t1")
    val segRL = cells.crossJoin(t1).crossJoin(tR)
      .filter(col("bucket") > col("__t1") && col("bucket") <= col("__tr"))
      .drop("__t1", "__tr")
    val segRR = cells.crossJoin(tR)
      .filter(col("bucket") > col("__tr")).drop("__tr")
    def lvl(d: Int, side: String, b: DataFrame): DataFrame =
      b.withColumn("depth", lit(d).cast("int")).withColumn("side", lit(side))
    lvl(1, "*", top)
      .unionByName(lvl(2, "L", bestL))
      .unionByName(lvl(2, "R", bestR))
      .unionByName(lvl(3, "LL", best(meanScanOnGrid(segLL))))
      .unionByName(lvl(3, "LR", best(meanScanOnGrid(segLR))))
      .unionByName(lvl(3, "RL", best(meanScanOnGrid(segRL))))
      .unionByName(lvl(3, "RR", best(meanScanOnGrid(segRR))))
      .select(Seq(col("depth"), col("side")) ++ outCols: _*)
      .orderBy(col("depth"), col("side"))
  }

  /** Two-sample Cramér–von Mises criterion between two bucket-count
    * tables — the INTEGRATED squared CDF gap, completing the drift
    * panel's geometry: KS reads the single worst gap (sensitive to
    * one sharp divergence, blind to many small ones), CvM integrates
    * (F_a − F_b)² over the combined empirical measure (sensitive to
    * broad low-grade drift KS under-weights):
    *
    *   T = (n_a·n_b / N²) · Σ_buckets cnt_i · (F_a(i) − F_b(i))²
    *
    * (Anderson 1962's two-sample form on the grouped grid). All
    * integer: CDFs in micro-units off the grid running sums (the
    * ksFromCounts quantities), per-bucket squared gaps summed
    * exactly in DECIMAL(38,0) (S reaches 1e12·N), one truncating
    * division for t6 = (n_a·n_b·S) div (N²·1e6) — exact to
    * DECIMAL(38,0) headroom at N ≲ 2e8 grid mass (histogram grids
    * are pre-aggregated, so N is the ROW total; document upstream
    * sampling past that). Empty sides fail fast (the ksFromCounts
    * contract); the grid window is the documented bounded class.
    * Returns one row (n_buckets, n_rows_a, n_rows_b, t6).
    */
  def cvmFromCounts(a: DataFrame, b: DataFrame): DataFrame = {
    val joined = a.select(col("bucket"), col("n").as("n_a"))
      .join(b.select(col("bucket"), col("n").as("n_b")), Seq("bucket"), "full_outer")
      .na.fill(0L, Seq("n_a", "n_b"))
    val tot = broadcast(
      joined.agg(
        count(lit(1)).as("__k"),
        sum(col("n_a")).cast("long").as("__na"),
        sum(col("n_b")).cast("long").as("__nb")))
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joined
      .crossJoin(tot)
      .filter(
        assert_true(
          col("__na") > 0L && col("__nb") > 0L,
          concat(
            lit("cvmFromCounts: both histograms must be non-empty (no CDF exists " +
              "for an empty side); totals were "),
            col("__na").cast("string"),
            lit(" / "),
            col("__nb").cast("string"))).isNull)
      // DIVSWEEP Class C bound in-plan: the t6 numerator na·nb·Σ mass
      // exhausts DECIMAL(38) past the documented grid mass N ≈ 2e8 —
      // guard BEFORE the CDF gap math so the caller gets the remedy
      .filter(
        assert_true(
          col("__na") + col("__nb") <= 200000000L,
          concat(
            lit("cvmFromCounts: total histogram mass exceeds the documented " +
              "DECIMAL(38) validity bound 2e8 — quantize to coarser buckets " +
              "upstream (DIVSWEEP Class C); got "),
            (col("__na") + col("__nb")).cast("string"))).isNull)
      .withColumn("ca", sum(col("n_a")).over(w))
      .withColumn("cb", sum(col("n_b")).over(w))
      .withColumn(
        "__gap6",
        expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * ca div __na AS BIGINT)") -
          expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * cb div __nb AS BIGINT)"))
      .groupBy(col("__k"), col("__na"), col("__nb"))
      .agg(
        sum(
          expr("CAST(n_a + n_b AS DECIMAL(38,0)) * __gap6 * __gap6"))
          .cast("decimal(38,0)").as("__s"))
      .select(
        col("__k").as("n_buckets"),
        col("__na").as("n_rows_a"),
        col("__nb").as("n_rows_b"),
        expr(
          """CAST((CAST(__na AS DECIMAL(38,0)) * __nb * __s)
            |div (CAST(__na + __nb AS DECIMAL(38,0)) * (__na + __nb)
            |     * CAST(1000000 AS DECIMAL(38,0))) AS BIGINT)""".stripMargin)
          .as("t6"))
  }

  /** Benford expected first-digit probabilities in integer ppm:
    * round(1e6 · log10(1 + 1/d)) for d = 1..9 — computed once here
    * and injected into the oracle via [[benfordPpmSql]] (the
    * ndcgWeights shared-constant discipline), so no float log runs
    * in either plan.
    */
  val benfordPpm: Seq[Long] =
    (1 to 9).map(d => math.round(1e6 * math.log10(1.0 + 1.0 / d)))

  /** Oracle-side mirror of [[benfordPpm]]. */
  def benfordPpmSql(digitExpr: String): String =
    benfordPpm.zipWithIndex
      .map { case (p, i) => s"WHEN $digitExpr = ${i + 1} THEN $p" }
      .mkString("CASE ", " ", " ELSE 0 END")

  /** Benford's-law first-digit audit (Newcomb 1881, Benford 1938):
    * the fraud/corruption smoke test for money-class columns —
    * organically-generated amounts follow p(d) = log10(1 + 1/d),
    * fabricated or truncated ones don't. The value is quantized to
    * integer cents (the round-parity idiom) and the digit read as
    * the leading character of the cent count, so the digit
    * derivation is engine-exact; non-positive cents are excluded
    * (no leading significant digit exists). Returns per digit
    * (digit, n, obs_ppm, exp_ppm, dev_ppm = obs − exp, all exact
    * integer ppm). One hash aggregate + a 9-row broadcast of totals.
    */
  def benfordAudit(df: DataFrame, value: Column): DataFrame = {
    val cents = round(value.cast("double") * 100.0, 0).cast("long")
    val digits = df
      .select(cents.as("__c"))
      .filter(col("__c") > 0)
      .select(substring(col("__c").cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy(col("digit"))
      .agg(count(lit(1)).as("n"))
    val tot = broadcast(digits.agg(sum(col("n")).cast("long").as("__nt")))
    val expPpm = benfordPpm.zipWithIndex.foldLeft(lit(0L)) { case (acc, (p, i)) =>
      when(col("digit") === (i + 1), lit(p)).otherwise(acc)
    }
    digits
      .crossJoin(tot)
      .withColumn("obs_ppm", expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * n div __nt AS BIGINT)"))
      .withColumn("exp_ppm", expPpm)
      .select(
        col("digit"),
        col("n"),
        col("obs_ppm"),
        col("exp_ppm"),
        (col("obs_ppm") - col("exp_ppm")).as("dev_ppm"))
  }

  /** k-anonymity audit (Sweeney 2002) over a quasi-identifier
    * combination: a released row is re-identifiable when its
    * quasi-id group holds fewer than k records. Returns the
    * VIOLATING groups (quasi cols…, n) — the suppression/
    * generalization worklist a privacy-preserving export runs before
    * releasing training data with joinable attributes. One hash
    * aggregate over the quasi keys; nothing sensitive rides the
    * shuffle beyond the keys themselves.
    */
  def kAnonymity(df: DataFrame, quasiCols: Seq[Column], k: Long): DataFrame = {
    require(k >= 2, "k must be >= 2")
    df.groupBy(quasiCols: _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") < k)
  }

  /** Release-risk summary for [[kAnonymity]]: group counts, rows at
    * risk, and the suppression fraction in exact ppm (integer
    * division — the fraction of rows a suppress-violators release
    * would drop). One extra aggregate over the group table.
    */
  def kAnonymityStats(df: DataFrame, quasiCols: Seq[Column], k: Long): DataFrame = {
    require(k >= 2, "k must be >= 2")
    df.groupBy(quasiCols: _*)
      .agg(count(lit(1)).as("n"))
      .agg(
        count(lit(1)).as("n_groups"),
        sum(when(col("n") < k, 1L).otherwise(0L)).as("n_violating_groups"),
        sum(when(col("n") < k, col("n")).otherwise(0L)).as("n_rows_at_risk"),
        sum(col("n")).as("n_rows"))
      .withColumn(
        "suppression_ppm",
        expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * n_rows_at_risk div n_rows AS BIGINT)"))
  }

  /** l-diversity audit (Machanavajjhala et al. 2007) — the attribute-
    * disclosure gate k-anonymity misses: a QI group can hold 50 rows
    * (k-safe) that all share ONE sensitive value, so membership alone
    * reveals it. Per QI group, the count of DISTINCT sensitive
    * values; groups under l are the worklist. NULL sensitive values
    * count as a value (knowing "it's missing" is itself a
    * disclosure; mirror of the [[fdViolations]] null-Y rule). One
    * two-level hash aggregate — (QI, s) then QI. Returns the
    * violating groups (quasiCols…, n_rows, n_distinct_sensitive).
    */
  def lDiversity(
      df: DataFrame,
      quasiCols: Seq[(String, Column)],
      sensitive: Column,
      l: Long): DataFrame = {
    require(l >= 2, "l must be >= 2")
    require(quasiCols.nonEmpty, "quasiCols must be non-empty")
    val base = df.select(
      quasiCols.map { case (n, c) => c.as(n) } :+ sensitive.as("__s"): _*)
    val qs = quasiCols.map { case (n, _) => col(n) }
    base
      .groupBy(qs :+ col("__s"): _*)
      .agg(count(lit(1)).as("__c"))
      .groupBy(qs: _*)
      .agg(sum(col("__c")).as("n_rows"), count(lit(1)).as("n_distinct_sensitive"))
      .filter(col("n_distinct_sensitive") < l)
  }

  /** t-closeness audit (Li, Li & Venkatasubramanian 2007) — the
    * distribution-disclosure gate l-diversity misses: a group can
    * carry l distinct sensitive values whose MIX still leaks (90%
    * "default" where the corpus runs 50%). Per QI group, the earth-
    * mover's distance between the group's sensitive-value
    * distribution and the corpus's over an ORDERED bucket domain —
    * for one-dimensional ordered buckets EMD is exactly the L1 gap
    * between cumulative distributions, which makes it computable in
    * exact integers:
    *
    *   emd6(g) = Σ_buckets |cum_g·1e6 div n_g − cum·1e6 div N|
    *             div n_buckets
    *
    * (per-bucket micro CDFs by truncating division — the ksFromCounts
    * discipline, whose statistic is the MAX of the same gaps where
    * EMD is the MEAN; both engines fold the identical grid). Groups
    * with emd6 above the caller's threshold are the re-binning
    * worklist. Returns per group (quasiCols…, n_rows, emd6), all
    * groups — thresholding is the caller's policy.
    *
    * Scale shape: one (QI, bucket) aggregate, a broadcast corpus
    * grid, per-group running sums over the bucket-bounded domain.
    */
  def tCloseness(
      df: DataFrame,
      quasiCols: Seq[(String, Column)],
      bucket: Column): DataFrame = {
    require(quasiCols.nonEmpty, "quasiCols must be non-empty")
    val names = quasiCols.map(_._1)
    val qs = names.map(col)
    val base = df
      .filter(bucket.isNotNull)
      .select(quasiCols.map { case (n, c) => c.as(n) } :+ bucket.as("__b"): _*)
    val cells = base
      .groupBy(qs :+ col("__b"): _*)
      .agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val corpus = cells.groupBy(col("__b")).agg(sum(col("c")).as("cc"))
    val tot = broadcast(
      corpus.agg(count(lit(1)).as("__nb"), sum(col("cc")).cast("long").as("__nt")))
    val groups = cells.groupBy(qs: _*).agg(sum(col("c")).as("n_g"))
    // group × FULL bucket domain: absent buckets carry 0 group mass
    // but real corpus mass — the CDF gap must see them
    groups
      .crossJoin(broadcast(corpus))
      .join(cells, names :+ "__b", "left")
      .na.fill(0L, Seq("c"))
      .crossJoin(tot)
      .withColumn(
        "cum_g",
        sum(col("c")).over(
          Window.partitionBy(qs: _*).orderBy(col("__b"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn(
        "cum",
        sum(col("cc")).over(
          Window.partitionBy(qs: _*).orderBy(col("__b"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn(
        "__gap",
        abs(
          expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * cum_g div n_g AS BIGINT)") -
            expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * cum div __nt AS BIGINT)")))
      .groupBy(qs :+ col("n_g") :+ col("__nb"): _*)
      .agg(sum(col("__gap")).as("__gapsum"))
      .select(
        qs :+ col("n_g").as("n_rows") :+
          expr("CAST(__gapsum div __nb AS BIGINT)").as("emd6"): _*)
  }

  /** Diff two [[partitionManifest]] receipts — the reconciliation
    * step of the 100 TB hand-off: each partition is `added` (new side
    * only), `removed` (old side only), `changed` (both sides, row
    * count or XOR checksum differs), or `unchanged`. One full-outer
    * join on the partition key over two partition-count-bounded
    * manifests — row data never moves again; the manifests ARE the
    * comparison. Returns (partition, status, n_old, n_new) with
    * null counts where a side is absent.
    */
  def manifestDiff(oldManifest: DataFrame, newManifest: DataFrame): DataFrame = {
    val o = oldManifest.select(
      col("partition"),
      col("n_rows").as("n_old"),
      col("content_xor").as("__xo"))
    val n = newManifest.select(
      col("partition"),
      col("n_rows").as("n_new"),
      col("content_xor").as("__xn"))
    o.join(n, Seq("partition"), "full_outer")
      .select(
        col("partition"),
        when(col("n_old").isNull, "added")
          .when(col("n_new").isNull, "removed")
          .when(col("n_old") === col("n_new") && col("__xo") === col("__xn"), "unchanged")
          .otherwise("changed")
          .as("status"),
        col("n_old"),
        col("n_new"))
  }

  /** Pearson chi-square test of independence between two categorical
    * columns — the corpus-composition gate ("is lang independent of
    * source?"): a near-zero statistic says the crawl mixes languages
    * uniformly across sources; a large one localizes a source that
    * over-feeds one language (the silent mixture-shift a per-column
    * histogram can't see). Layout: one hash aggregate to the
    * contingency cells, marginals re-aggregated from the CELL table
    * (never the corpus), and the full r×c grid restored by a
    * level-bounded cross join (the documented bounded-BNLJ class —
    * empty cells MUST contribute, their expected mass is real).
    *
    * Exactness: with d = N·n_ij − r_i·c_j (exact BIGINT), the cell
    * term is 1e6·d² div (N·r_i·c_j), computed in DECIMAL(38,0) —
    * 1e6·d² overflows BIGINT past N ≈ 55k rows, decimal carries it
    * exactly to 1e38 (N to ~3e6; quantize counts upstream beyond
    * that) — then truncating-divided and summed: chi26 is
    * bit-identical on any engine/partitioning. Cramér's V is the one
    * float step: sqrt of a ratio of exact integers (IEEE sqrt +
    * division, correctly rounded on both engines), rounded to v6.
    * Returns one row (n_rows, n_a, n_b, dof, chi26, cramer_v6); null
    * levels excluded; a degenerate table (one level on either side)
    * returns dof 0 with chi26 0 and v6 0 by convention.
    */
  def chiSquareIndependence(df: DataFrame, a: Column, b: Column): DataFrame = {
    val cells = df
      .filter(a.isNotNull && b.isNotNull)
      .groupBy(a.as("__a"), b.as("__b"))
      .agg(count(lit(1)).as("n"))
    val rowsM = cells.groupBy(col("__a")).agg(sum(col("n")).as("r"))
    val colsM = cells.groupBy(col("__b")).agg(sum(col("n")).as("c"))
    val tot = broadcast(
      cells.agg(
        sum(col("n")).as("__N"),
        count_distinct(col("__a")).as("__na"),
        count_distinct(col("__b")).as("__nb")))
    val grid = rowsM
      .crossJoin(colsM)
      .join(cells, Seq("__a", "__b"), "left")
      .na.fill(0L, Seq("n"))
      .crossJoin(tot)
      // DIVSWEEP Class C bound in-plan: 1e6·d² with d up to ~N²/4
      // exhausts DECIMAL(38) past the documented N ≈ 3e6 — guard
      // BEFORE the term math so the caller gets the remedy
      .filter(
        assert_true(
          col("__N") <= 3000000L,
          concat(
            lit("chiSquareIndependence: N exceeds the documented DECIMAL(38) " +
              "validity bound 3e6 — quantize or pre-aggregate counts " +
              "upstream (DIVSWEEP Class C); got N = "),
            col("__N").cast("string"))).isNull)
    grid
      .select(
        col("__N"), col("__na"), col("__nb"),
        (col("__N") * col("n") - col("r") * col("c"))
          .cast("decimal(38,0)").as("__d"),
        (col("__N") * col("r") * col("c")).cast("decimal(38,0)").as("__e"))
      .withColumn(
        "__term6",
        expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * __d * __d) div __e AS BIGINT)"))
      .groupBy(col("__N"), col("__na"), col("__nb"))
      .agg(sum(col("__term6")).as("chi26"))
      .select(
        col("__N").as("n_rows"),
        col("__na").as("n_a"),
        col("__nb").as("n_b"),
        ((col("__na") - 1L) * (col("__nb") - 1L)).as("dof"),
        when(col("__na") > 1L && col("__nb") > 1L, col("chi26"))
          .otherwise(lit(0L)).as("chi26"),
        when(
          col("__na") > 1L && col("__nb") > 1L,
          round(
            lit(1e3) * sqrt(
              col("chi26").cast("double") /
                (col("__N") * least(col("__na") - 1L, col("__nb") - 1L)).cast("double")),
            0).cast("long"))
          .otherwise(lit(0L)).as("cramer_v6"))
  }

  /** Mutual information between two categorical columns (lang ×
    * source, variant × segment) in exact micro-nats — the
    * information-theoretic companion of [[chiSquareIndependence]]:
    * chi² asks "is there ANY association", MI measures HOW MANY bits
    * (nats) one column tells you about the other, and the normalized
    * form NMI = 2·MI/(H_a+H_b) puts it on a 0..1 scale comparable
    * across tables. The mixture-design gate: a corpus where source
    * determines language (NMI → 1) cannot be rebalanced on one axis
    * without skewing the other.
    *
    * Exactness — the entropy-family discipline ([[psiFromCounts]],
    * t_source_kl): each occupied cell's term
    *   round(1e6 · (n_ab/N) · ln(n_ab·N / (n_a·n_b)))
    * is rounded ONCE to a micro-nat BIGINT, then exactly summed
    * (empty cells contribute exactly 0 and are skipped — lim x·ln x
    * = 0). The marginal entropies take the same per-class treatment.
    * The only floats are ln/division on identical doubles built from
    * exact integers. nmi6 = 1e6·2·mi6 div (h_a6 + h_b6) — one
    * truncating division of already-rounded integers (rounding can
    * leave mi6 a hair negative on independent columns; the division
    * truncates toward zero, parity pinned in the oracle). Both
    * columns constant → H sums 0 → nmi6 = 0 by convention.
    *
    * Scale shape: one hash aggregate to the (a, b) grid, two grid
    * re-aggregations for marginals, 1-row final — all bounded by the
    * class-count product, never the corpus. Returns one row (n,
    * classes_a, classes_b, mi6, h_a6, h_b6, nmi6).
    */
  def mutualInformation(df: DataFrame, a: Column, b: Column): DataFrame = {
    // class-product-bounded grid, persisted: four consumers (both
    // marginals, totals, the MI terms) read one corpus scan
    val grid = df
      .filter(a.isNotNull && b.isNotNull)
      .groupBy(a.as("__a"), b.as("__b"))
      .agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ma = grid.groupBy(col("__a")).agg(sum(col("n")).as("n_a"))
    val mb = grid.groupBy(col("__b")).agg(sum(col("n")).as("n_b"))
    val tot = broadcast(
      grid.agg(
        sum(col("n")).cast("long").as("__nt"),
        count_distinct(col("__a")).as("__ca"),
        count_distinct(col("__b")).as("__cb")))
    val mi = grid
      .join(ma, Seq("__a"))
      .join(mb, Seq("__b"))
      .crossJoin(tot)
      .withColumn(
        "__t6",
        round(
          (col("n").cast("double") / col("__nt").cast("double")) *
            log(
              (col("n").cast("double") * col("__nt").cast("double")) /
                (col("n_a").cast("double") * col("n_b").cast("double"))) *
            lit(1e6),
          0).cast("long"))
      .agg(sum(col("__t6")).as("mi6"))
    def entropy6(m: DataFrame, cnt: String) =
      m.crossJoin(tot)
        .withColumn(
          "__h6",
          round(
            (col(cnt).cast("double") / col("__nt").cast("double")) *
              log(col("__nt").cast("double") / col(cnt).cast("double")) *
              lit(1e6),
            0).cast("long"))
        .agg(sum(col("__h6")))
    val ha = broadcast(entropy6(ma, "n_a").toDF("h_a6"))
    val hb = broadcast(entropy6(mb, "n_b").toDF("h_b6"))
    mi
      .crossJoin(broadcast(tot))
      .crossJoin(ha)
      .crossJoin(hb)
      .select(
        col("__nt").as("n"),
        col("__ca").as("classes_a"),
        col("__cb").as("classes_b"),
        col("mi6"), col("h_a6"), col("h_b6"),
        expr(
          """CASE WHEN h_a6 + h_b6 = 0 THEN CAST(0 AS BIGINT)
            |ELSE CAST(1000000 * 2 * mi6 div (h_a6 + h_b6) AS BIGINT) END""".stripMargin)
          .as("nmi6"))
  }

  /** Foreign-key containment audit — the join-key discovery / FK-
    * integrity primitive of a data catalog: what fraction of the
    * child column's DISTINCT values exist in the parent column?
    * containment_ppm = 1e6 at a clean FK; below it, the gap names
    * the orphan key mass a join would silently drop (the dq_checks
    * FK row generalized to a measurement instead of a pass/fail).
    * Run over candidate pairs to DISCOVER undeclared relationships
    * (high containment + high parent distinct = likely FK).
    *
    * Exactness: distinct child keys, one left-semi join against the
    * parent's distinct keys, exact counts, one truncating ppm
    * division; NULL keys are excluded on both sides (SQL FK
    * semantics — NULL references nothing). Empty child → 0-distinct
    * row with containment 0 (no division). Returns one row
    * (n_child_distinct, n_contained, containment_ppm).
    *
    * Scale shape: two distinct passes + one key-only semi join —
    * every shuffle carries slim keys, never rows.
    */
  def fkContainment(
      child: DataFrame,
      childKey: Column,
      parent: DataFrame,
      parentKey: Column): DataFrame = {
    val ck = child.filter(childKey.isNotNull).select(childKey.as("__k")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pk = parent.filter(parentKey.isNotNull).select(parentKey.as("__k")).distinct()
    ck.agg(count(lit(1)).as("n_child_distinct"))
      .crossJoin(
        broadcast(
          ck.join(pk, Seq("__k"), "left_semi")
            .agg(count(lit(1)).as("n_contained"))))
      .select(
        col("n_child_distinct"),
        col("n_contained"),
        expr(
          """CASE WHEN n_child_distinct = 0 THEN CAST(0 AS BIGINT)
            |ELSE CAST(CAST(1000000 AS DECIMAL(38,0)) * n_contained div n_child_distinct AS BIGINT)
            |END""".stripMargin).as("containment_ppm"))
  }

  /** Functional-dependency audit — does X determine Y? The schema-
    * inference / denormalization-safety check: a violation is an X
    * value carrying MORE than one distinct Y (the rows a "SELECT x,
    * any_value(y)" would silently corrupt). Returns one row
    * (n_keys, n_violating_keys, n_rows_at_risk, fd_holds): violating
    * keys counted exactly, rows-at-risk = total rows under violating
    * keys (the blast radius of treating X→Y as clean). NULL X
    * excluded (determines nothing); NULL Y counts as a value (two
    * rows NULL/non-NULL under one key ARE a violation — any_value
    * would flip between them).
    *
    * Scale shape: one (X, Y) hash aggregate then one X re-aggregate
    * — two map-side-combinable passes, no joins.
    */
  def fdViolations(df: DataFrame, x: Column, y: Column): DataFrame =
    df
      .filter(x.isNotNull)
      .groupBy(x.as("__x"), y.as("__y"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col("__x"))
      .agg(count(lit(1)).as("__ny"), sum(col("__c")).as("__rows"))
      .agg(
        count(lit(1)).as("n_keys"),
        sum(when(col("__ny") > 1L, 1L).otherwise(0L)).as("n_violating_keys"),
        sum(when(col("__ny") > 1L, col("__rows")).otherwise(0L)).as("n_rows_at_risk"))
      .na.fill(0L, Seq("n_violating_keys", "n_rows_at_risk"))
      .select(
        col("n_keys"), col("n_violating_keys"), col("n_rows_at_risk"),
        (col("n_violating_keys") === 0L).as("fd_holds"))

  /** Simpson concentration index per group, over a class column:
    * D = Σ_i n_i(n_i−1) / (N(N−1)) — the probability two documents
    * drawn WITHOUT replacement from the group share a class. The
    * diversity gate for a training mixture (1−D is the Gini–Simpson
    * diversity): a source whose language concentration drifts toward
    * 1e6 has collapsed to a monoculture. FULLY exact: one class
    * aggregate, one group aggregate, a single truncating division
    * per group — no floats anywhere. Groups with fewer than 2 rows
    * are dropped (no unordered pair exists; D is undefined).
    * Returns (group, n, n_classes, simpson6).
    */
  def simpsonDiversity(df: DataFrame, groupCol: Column, classCol: Column): DataFrame =
    df.filter(groupCol.isNotNull && classCol.isNotNull)
      .groupBy(groupCol.as("g"), classCol.as("cl"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("g"))
      .agg(
        sum(col("n")).as("n"),
        count(lit(1)).as("n_classes"),
        // pair counts in DECIMAL — n·(n−1) wraps BIGINT at ~3e9-row
        // groups, and 1e6·pairs a thousand times sooner
        sum(col("n").cast("decimal(38,0)") * (col("n") - 1L)).as("__pairs"))
      .filter(col("n") >= 2L)
      .select(
        col("g"),
        col("n"),
        col("n_classes"),
        expr(
          """CAST((CAST(1000000 AS DECIMAL(38,0)) * __pairs)
            |div (CAST(n AS DECIMAL(38,0)) * (n - 1)) AS BIGINT)""".stripMargin)
          .as("simpson6"))

  /** Herfindahl–Hirschman concentration per group: HHI = Σ_i s_i²
    * with s_i = n_i/N the class share — [[simpsonDiversity]]'s
    * with-replacement sibling and the standard market-concentration
    * scale (US DOJ: >0.25 "highly concentrated" → hhi6 > 250000).
    * Exact: hhi6 = (1e6·Σn_i²) div N², ONE truncating division per
    * group, all cross-products in DECIMAL(38,0) from the first
    * multiply — no group-size bound. Returns
    * (group, n, n_classes, hhi6).
    */
  def hhiConcentration(df: DataFrame, groupCol: Column, classCol: Column): DataFrame =
    df.filter(groupCol.isNotNull && classCol.isNotNull)
      .groupBy(groupCol.as("g"), classCol.as("cl"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("g"))
      .agg(
        sum(col("n")).as("n"),
        count(lit(1)).as("n_classes"),
        sum(col("n").cast("decimal(38,0)") * col("n")).as("__sq"))
      .select(
        col("g"),
        col("n"),
        col("n_classes"),
        expr(
          """CAST((CAST(1000000 AS DECIMAL(38,0)) * __sq)
            |div (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)""".stripMargin)
          .as("hhi6"))

  /** Theil inequality index (Theil 1967) over a positive value
    * column — the DECOMPOSABLE concentration score beside the Gini
    * (a_gini) and [[hhiConcentration]]: T = (1/n)·Σ (x/μ)·ln(x/μ),
    * 0 = perfect equality, ln n = one unit holds everything; unlike
    * Gini it splits exactly into between-group + within-group terms,
    * which is why mixture audits prefer it. Rows with x ≤ 0 are
    * excluded (ln undefined — a zero-spend unit is a membership
    * question the caller answers upstream, documented).
    *
    * Determinism: one aggregate for (n, Σx), then each row's term is
    * the identical IEEE double chain on both engines —
    * r = (x·n)/Σx, t6 = round(1e6·r·ln r) — rounded to BIGINT per
    * row before the exact sum (the [[psiFromCounts]] per-term
    * discipline), and theil6 = Σt6 div n is one truncating division.
    * Scale shape: one agg + one broadcast + one map-side-combined
    * sum. Returns (n, total, theil6).
    */
  def theilIndex(df: DataFrame, valueCol: Column): DataFrame = {
    val in = df
      .select(valueCol.cast("long").as("__x"))
      .filter(col("__x").isNotNull && col("__x") > 0L)
    val tot = broadcast(
      in.agg(count(lit(1)).as("__n"), sum(col("__x")).as("__s")))
    in.crossJoin(tot)
      .withColumn(
        "__r",
        col("__x").cast("double") * col("__n").cast("double")
          / col("__s").cast("double"))
      .withColumn("__t6", round(col("__r") * log(col("__r")) * lit(1e6), 0).cast("long"))
      .groupBy(col("__n"), col("__s"))
      // micro-terms sum to ~14e6·N — DECIMAL keeps the fold exact
      // past the ~9e11-row BIGINT wrap (family-wide sum discipline)
      .agg(sum(col("__t6").cast("decimal(38,0)")).as("__tsum"))
      .select(
        col("__n").as("n"),
        col("__s").as("total"),
        expr("CAST(__tsum div __n AS BIGINT)").as("theil6"))
  }

  /** Lorenz curve table at k points — the distribution BEHIND the
    * Gini scalar (a_gini integrates this curve): at each population
    * quantile d/k, what share of total value do the bottom d/k of
    * units hold? The dashboard artifact for "how whale-dominated is
    * this corpus/revenue/source mixture", read directly against the
    * equality diagonal.
    *
    * Exactness: units sort by (value, tie) under [[Relational
    * .globalRank]]'s range-partitioned total order; cumulative value
    * comes from [[Relational.globalCumSum]] over the SAME total
    * order (two distributed passes, no global window); the k probe
    * ranks are max(1, d·n div k) (the equiDepthBoundaries probe
    * idiom — n and total are the documented one-scalar driver
    * bootstraps) and both shares are single truncating micro
    * divisions. Returns (bucket, rank, pop_share6, wealth_share6),
    * k rows; under the ascending sort the bottom d/k of units hold
    * AT MOST d/k of the value, so wealth_share6 ≤ pop_share6
    * row-by-row, with equality exactly when all values are equal —
    * the curve's sag below the diagonal IS the inequality.
    */
  def lorenzCurve(
      df: DataFrame,
      valueCol: Column,
      tieCol: Column,
      k: Int): DataFrame = {
    require(k >= 1 && k <= 1000, "k must be in 1..1000")
    val in = df
      .select(valueCol.cast("long").as("__v"), tieCol.as("__t"))
      .filter(col("__v").isNotNull)
    val cum = Relational
      .globalCumSum(in, Seq(col("__v"), col("__t")), "__v", "__below")
      .withColumn("__cum", col("__below") + col("__v"))
    val ranked = Relational
      .globalRank(cum, Seq(col("__v"), col("__t")), "__rank")
    val n = in.count()
    val total = in.agg(coalesce(sum(col("__v")), lit(0L))).head().getLong(0)
    val spark = df.sparkSession
    import spark.implicits._
    val targets = (1 to k)
      .map(d => (d.toLong, math.max(1L, d.toLong * n / k)))
      .toDF("bucket", "__rank")
    ranked
      .join(broadcast(targets), Seq("__rank"))
      .select(
        col("bucket"),
        col("__rank").as("rank"),
        expr(s"CAST((CAST(1000000 AS DECIMAL(38,0)) * __rank) div $n AS BIGINT)").as("pop_share6"),
        expr(s"CAST((CAST(1000000 AS DECIMAL(38,0)) * __cum) div $total AS BIGINT)").as("wealth_share6"))
      .orderBy(col("bucket"))
  }

  /** Fano factor / index of dispersion (Fano 1947) over the same
    * pre-aggregated (grp, bucket, n) daily grid as [[cusum]] and
    * [[pageHinkley]]: variance-to-mean ratio of the per-bucket
    * counts — 1e6 = Poisson-like arrivals, far above = BURSTY (bot
    * burst lists, replay storms), far below = suspiciously regular
    * (rate-limited schedulers, synthetic traffic). The cheapest
    * member of the bot battery: one moment pass.
    *
    * Exactness: F·1e6 = 1e6·(days·Σn² − (Σn)²) div ((days−1)·Σn) —
    * exact DECIMAL(38,0) cross-products, one truncating division;
    * days < 2 or zero total → 0 by the established degenerate
    * convention. Returns (grp, days, total, fano6).
    */
  def fanoFactor(counts: DataFrame): DataFrame =
    counts
      .groupBy(col("grp"))
      .agg(
        count(lit(1)).as("days"),
        sum(col("n")).as("total"),
        sum(col("n").cast("decimal(38,0)") * col("n").cast("decimal(38,0)"))
          .cast("decimal(38,0)").as("__ss"))
      .select(
        col("grp"),
        col("days"),
        col("total"),
        expr(
          """CASE WHEN days < 2 OR total <= 0 THEN CAST(0 AS BIGINT)
            |ELSE CAST(
            |  (CAST(1000000 AS DECIMAL(38,0))
            |   * (CAST(days AS DECIMAL(38,0)) * __ss
            |      - CAST(total AS DECIMAL(38,0)) * total))
            |  div (CAST(days - 1 AS DECIMAL(38,0)) * total)
            |AS BIGINT) END""".stripMargin).as("fano6"))

  /** Kendall's tau-b rank correlation (Kendall 1938; tie correction
    * per Kendall 1945) between two integer-quantized columns — the
    * ORDINAL association audit next to [[chiSquareIndependence]]
    * (which sees categories, not order) and [[mutualInformation]]
    * (which sees dependence, not direction): do the two columns move
    * TOGETHER, scored purely by concordant vs discordant pairs, with
    * ties in either margin removed from the denominator?
    *
    * Exactness — no sqrt at runtime (the mmrRerank no-special-
    * functions rule): alongside exact tau-a we emit the SIGNED SQUARE
    * of tau-b, which is a pure integer ratio:
    *
    *   tau_a6    = 2e6·(C−D) div (n(n−1))
    *   taub2s6   = sign(C−D) · 4e6·(C−D)² div ((n(n−1)−Tx2)(n(n−1)−Ty2))
    *
    * with Tx2 = Σ_x n_x(n_x−1), Ty2 likewise (doubled tie pairs), all
    * cross-products DECIMAL(38,0) ((C−D)² reaches n⁴ — exact to
    * ~1e8 rows), one truncating division each; a fully-tied margin
    * degenerates the denominator to 0 → 0 by the established
    * convention.
    *
    * Scale shape — concordance WITHOUT a pair join: on the gap-filled
    * X × Y count grid, each cell's strictly-dominated count F and
    * strictly-discordant count G come from two PARTITIONED prefix
    * scans (per-column cum-below, then per-row cum-across — every
    * window is partitioned by the opposite axis, no single-task
    * funnel), and C = Σ c·F, D = Σ c·G. The dense grid is
    * |X|·|Y| cells and is the operator's memory contract: quantize
    * first; grids past `maxGridCells` fail fast in-plan (cell counts
    * are data-dependent, so the cap cannot be a driver `require`).
    * Returns one row (n, kx, ky, c_pairs, d_pairs, tau_a6, taub2s6).
    */
  def kendallTauB(
      df: DataFrame,
      xCol: Column,
      yCol: Column,
      maxGridCells: Long = 4000000L): DataFrame = {
    require(maxGridCells >= 1L, "maxGridCells must be >= 1")
    val cells = df
      .filter(xCol.isNotNull && yCol.isNotNull)
      .groupBy(xCol.cast("long").as("x"), yCol.cast("long").as("y"))
      .agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val xs = cells.groupBy(col("x")).agg(sum(col("c")).as("nx"))
    val ys = cells.groupBy(col("y")).agg(sum(col("c")).as("ny"))
    val dims = broadcast(
      // tie-pair terms in DECIMAL — a single value carrying ~3e9
      // rows wraps n·(n−1) in BIGINT
      xs.agg(
          count(lit(1)).as("kx"),
          sum(col("nx").cast("decimal(38,0)") * (col("nx") - 1L)).as("tx2"))
        .crossJoin(
          ys.agg(
            count(lit(1)).as("ky"),
            sum(col("ny").cast("decimal(38,0)") * (col("ny") - 1L)).as("ty2"))))
    // gap-filled dense grid, capped in-plan BEFORE it is materialized
    val dense = xs
      .crossJoin(dims)
      .filter(
        assert_true(
          col("kx") * col("ky") <= maxGridCells,
          concat(
            lit("kendallTauB: dense grid "),
            (col("kx") * col("ky")).cast("string"),
            lit(s" cells exceeds maxGridCells=$maxGridCells — quantize the inputs"))).isNull)
      .select(col("x"), col("nx"))
      .crossJoin(ys.select(col("y")))
      .join(cells, Seq("x", "y"), "left")
      .na.fill(0L, Seq("c"))
    val wBelowY = Window
      .partitionBy(col("x")).orderBy(col("y"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAcrossX = Window
      .partitionBy(col("y")).orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val fg = dense
      .withColumn("__a", coalesce(sum(col("c")).over(wBelowY), lit(0L)))
      .withColumn("__b", col("nx") - col("__a") - col("c"))
      .withColumn("__f", coalesce(sum(col("__a")).over(wAcrossX), lit(0L)))
      .withColumn("__g", coalesce(sum(col("__b")).over(wAcrossX), lit(0L)))
    fg
      .agg(
        sum(col("c")).as("n"),
        sum(col("c").cast("decimal(38,0)") * col("__f")).cast("decimal(38,0)").as("__cp"),
        sum(col("c").cast("decimal(38,0)") * col("__g")).cast("decimal(38,0)").as("__dp"))
      .crossJoin(dims)
      .select(
        col("n"), col("kx"), col("ky"),
        col("__cp").cast("long").as("c_pairs"),
        col("__dp").cast("long").as("d_pairs"),
        expr(
          """CASE WHEN n < 2 THEN CAST(0 AS BIGINT)
            |ELSE CAST((CAST(2000000 AS DECIMAL(38,0)) * (__cp - __dp))
            |div (CAST(n AS DECIMAL(38,0)) * (n - 1)) AS BIGINT) END""".stripMargin)
          .as("tau_a6"),
        expr(
          """CASE WHEN n < 2
            |  OR CAST(n AS DECIMAL(38,0)) * (n - 1) - tx2 <= 0
            |  OR CAST(n AS DECIMAL(38,0)) * (n - 1) - ty2 <= 0 THEN CAST(0 AS BIGINT)
            |ELSE CAST(
            |  (CASE WHEN __cp >= __dp THEN 1 ELSE -1 END)
            |  * ((CAST(4000000 AS DECIMAL(38,0)) * (__cp - __dp) * (__cp - __dp))
            |     div ((CAST(n AS DECIMAL(38,0)) * (n - 1) - tx2)
            |          * (CAST(n AS DECIMAL(38,0)) * (n - 1) - ty2)))
            |AS BIGINT) END""".stripMargin)
          .as("taub2s6"))
  }
}
