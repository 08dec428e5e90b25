package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Frequency and distinct-count sketching (A-family corpus audits at
  * 100 TB: vocab size per source, unique URLs per domain, heavy-hitter
  * token counts — places where the exact computation would shuffle
  * every distinct value).
  *
  * KMV (k minimum values, Bar-Yossef et al. 2002): hash every value
  * uniformly onto [0, 2^32), keep the k smallest distinct hashes per
  * group; the k-th smallest estimates density, D ≈ (k−1)·2^32 / h_k.
  * Under k distinct values the buffer IS the distinct set, so the
  * estimate degrades to exact. Relative error ~1/√(k−2).
  *
  * Spark's `approx_count_distinct` is deliberately NOT used anywhere:
  * it is a black-box HLL++ no second engine reproduces. KMV is a pure
  * order statistic over a shared portable hash ([[Sampling.hash32]]) —
  * deterministic on any engine/partitioning, so the DuckDB oracle
  * recomputes it bit-for-bit — and [[hllRegisters]] provides the
  * fixed-size HLL alternative with the SAME portability (registers
  * derived from the same hash with engine-shared integer kernels).
  */
object Sketches {

  private val Space = 4294967296.0 // 2^32

  /** Per-group distinct-count estimate of `key`: (group…, n_seen,
    * kmv_est). `n_seen` is the buffer fill (= exact distinct-hash
    * count when < k). One hash-aggregate whose partials carry ≤ k
    * longs per group — the value stream itself never shuffles.
    */
  /** Bucket index of `value` for CMS row `j`: the repo's portable
    * md5-slice hash (6 hex chars → 24-bit int) mod `width` — the same
    * construction on any engine, so a DuckDB oracle rebuilds the
    * identical sketch.
    */
  private[graft] def cmsBucket(value: Column, j: Int, width: Int): Column =
    conv(substring(md5(concat(lit(s"$j:"), value)), 1, 6), 16, 10)
      .cast("long") % width

  /** Count-Min Sketch (Cormode & Muthukrishnan 2005) of the frequency
    * of `key`: `depth` independent hash rows × `width` counters.
    * Returns the sketch as a table (j, bucket, c) — depth·width rows
    * regardless of input size.
    *
    * Why CMS here: counter updates are SUMS, so the sketch build is
    * one map-side-combined hash aggregate whose output is
    * depth·width rows — order-free, partition-free, exactly
    * reproducible (no Misra-Gries/SpaceSaving merge-order
    * sensitivity) — and the value stream itself never shuffles more
    * than depth copies of (j, bucket).
    */
  def cmsBuild(df: DataFrame, key: Column, depth: Int, width: Int): DataFrame = {
    require(depth > 0 && width > 0, "depth and width must be positive")
    val rows = (0 until depth).map(j =>
      struct(lit(j).as("j"), cmsBucket(key, j, width).as("bucket")))
    df.filter(key.isNotNull)
      .select(explode(array(rows: _*)).as("jb"))
      .groupBy(col("jb.j").as("j"), col("jb.bucket").as("bucket"))
      .agg(count(lit(1)).as("c"))
  }

  /** Point-estimate lookups against a [[cmsBuild]] sketch: for each
    * row of `probes`, est = min over the depth rows of the probed
    * bucket's counter (an overestimate by construction; error ≤
    * 2N/width with prob 1−(1/2)^depth). `sketch` is depth·width rows —
    * broadcast-sized by CONSTRUCTION (not by data assumption), so the
    * probe join is map-side at any corpus size.
    */
  def cmsEstimate(
      probes: DataFrame,
      key: Column,
      sketch: DataFrame,
      depth: Int,
      width: Int): DataFrame = {
    val probed = (0 until depth)
      .foldLeft(probes.withColumn("__key", key)) { (acc, j) =>
        acc
          .withColumn(s"__b$j", cmsBucket(col("__key"), j, width))
          .join(
            broadcast(
              sketch
                .filter(col("j") === j)
                .select(col("bucket").as(s"__b$j"), col("c").as(s"__c$j"))),
            Seq(s"__b$j"),
            "left")
      }
    val est = least((0 until depth).map(j => coalesce(col(s"__c$j"), lit(0L))): _*)
    probed
      .withColumn("cms_est", est)
      .drop("__key")
      .drop((0 until depth).flatMap(j => Seq(s"__b$j", s"__c$j")): _*)
  }

  def kmvDistinct(df: DataFrame, groupCols: Seq[Column], key: Column, k: Int): DataFrame =
    kmvSketches(df, groupCols, key, k)
      .select(groupCols ++ estimateCols(col("mins"), k): _*)

  /** The raw per-group KMV sketch — (group…, mins: array<bigint>, the
    * sorted ≤ k smallest distinct hashes). This IS the mergeable /
    * persistable form: a sketch table written per day (or per source,
    * per shard) folds into any coarser rollup via [[kmvMergeEstimate]]
    * without rescanning the value stream, because each buffer keeps
    * its group's k smallest distinct hashes and the union's k
    * smallest therefore survive in the concatenation — the same
    * lossless-merge property the IVF/postings artifacts lean on,
    * here over sketches instead of rows.
    */
  def kmvSketches(df: DataFrame, groupCols: Seq[Column], key: Column, k: Int): DataFrame = {
    val kmv = udaf(new graft.expressions.KmvAggregator(k))
    Width.spread(df)
      .withColumn("__h", Sampling.hash32(key))
      // null keys hash to null, which the non-nullable Long aggregator
      // input would reject at runtime — ignore them, the same "null
      // keys are never selected" contract as hashSample/splitAssign
      .filter(col("__h").isNotNull)
      .groupBy(groupCols: _*)
      .agg(kmv(col("__h")).as("mins"))
  }

  /** Merge a table of [[kmvSketches]] buffers into ONE distinct-count
    * estimate (n_seen, kmv_est) — the k smallest distinct hashes of
    * the union of buffers are exactly the k smallest of the union of
    * the original streams, so the merged estimate equals the estimate
    * a full rescan would produce (the oracle recomputes it that way).
    * Input is sketch rows — group-count-bounded, never the stream.
    */
  def kmvMergeEstimate(sketches: DataFrame, minsCol: Column, k: Int): DataFrame = {
    val kmv = udaf(new graft.expressions.KmvAggregator(k))
    sketches
      .select(explode(minsCol).as("__h"))
      .agg(kmv(col("__h")).as("mins"))
      .select(estimateCols(col("mins"), k): _*)
  }

  /** Distinct-set overlap estimates from TWO [[kmvSketches]] buffers
    * (the KMV set-operation estimator, Beyer et al. SIGMOD 2007 —
    * the join-size / audience-overlap planning primitive): union
    * size from the k smallest hashes of the buffer union, Jaccard
    * from the fraction of those present in BOTH buffers,
    * intersection = jaccard · union. Membership is EXACT, not a
    * heuristic: union ⊇ each side, so the union's k-th order
    * statistic is ≤ each side's k-th — every union-k-min hash that
    * belongs to a side's set is guaranteed to sit in that side's
    * buffer.
    *
    * Inputs are one-row global sketches (grouped sketches: filter to
    * the group first). All work after the sketches is on ≤ 2k rows —
    * the single-task rank window is bounded by CONSTRUCTION, and at
    * 100 TB the sketches are the persisted artifact, so estimating a
    * join's key overlap costs two sketch reads, not a scan of either
    * table.
    *
    * Returns one row: (n_union_seen, n_both, union_est, jaccard_est,
    * inter_est).
    */
  def kmvOverlapEstimate(
      sketchA: DataFrame,
      sketchB: DataFrame,
      minsCol: Column,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1 && k <= 65536,
      "kmvOverlapEstimate: k must be in 1..65536 (the union-rank window input is 2k rows)")
    val aH = sketchA.select(explode(minsCol).as("h")).distinct()
    val bH = sketchB.select(explode(minsCol).as("h")).distinct()
    // unpartitioned window input ≤ 2k rows BY CONSTRUCTION: each side
    // is one KmvAggregator buffer holding at most k hashes (the
    // documented bounded-grid window class, enforced by the k require)
    val uni = aH.unionAll(bH).distinct()
      .withColumn("rn", row_number().over(Window.orderBy(col("h"))))
      .filter(col("rn") <= k)
    val flagged = uni
      .join(aH.select(col("h"), lit(1).as("in_a")), Seq("h"), "left")
      .join(bH.select(col("h"), lit(1).as("in_b")), Seq("h"), "left")
    flagged
      .agg(
        count(lit(1)).as("n_union_seen"),
        max(when(col("rn") === k, col("h"))).as("__hk"),
        coalesce(
          sum(when(col("in_a") === 1 && col("in_b") === 1, 1L).otherwise(0L)),
          lit(0L)).as("n_both"))
      .select(
        col("n_union_seen"),
        col("n_both"),
        when(col("n_union_seen") < k, col("n_union_seen").cast("double"))
          .otherwise(lit((k - 1).toDouble * Space) / col("__hk").cast("double"))
          .as("union_est"))
      .withColumn(
        "jaccard_est",
        when(col("n_union_seen") === 0, lit(0.0))
          .otherwise(col("n_both").cast("double") / col("n_union_seen").cast("double")))
      .withColumn("inter_est", col("jaccard_est") * col("union_est"))
  }

  /** (n_seen, kmv_est) off a sorted min-hash buffer: buffer fill, and
    * the (k−1)·2^32 / h_k density estimate (exact-count degradation
    * below k).
    */
  private def estimateCols(minsCol: Column, k: Int): Seq[Column] = Seq(
    size(minsCol).cast("long").as("n_seen"),
    when(size(minsCol) < k, size(minsCol).cast("double"))
      .otherwise(
        lit((k - 1).toDouble * Space) /
          element_at(minsCol, k).cast("double"))
      .as("kmv_est"))

  /** Fixed-grid histogram sketch of a money-class numeric column:
    * integer-cent quantization (the int8Quantize round-parity idiom)
    * then `bucket = min(buckets-1, max(0, cents)·buckets div
    * ceilCents)` — pure BIGINT math, so shards built anywhere
    * SUM-merge into exactly the full-corpus sketch (counter
    * linearity, the CMS property) and any engine rebuilds it
    * bit-for-bit. Returns (bucket, n), occupied buckets only; values
    * above `ceilValue` clamp into the top bucket and NEGATIVE values
    * clamp into bucket 0 (both tails visible as fat edge buckets,
    * never silently dropped — but a negative is indistinguishable
    * from a near-zero value in the grid, so callers monitoring a
    * column where negatives are anomalies should gate them with a
    * [[graft.operators.Checks]] predicate upstream rather than read
    * them off the sketch). Completes the sketch
    * family: CMS = frequency, KMV = distinct, HIST = distribution/
    * quantiles — each bounded-size, linear, portable.
    */
  def histSketch(
      df: DataFrame,
      value: Column,
      ceilValue: Double,
      buckets: Int): DataFrame = {
    require(buckets >= 2, "need at least 2 buckets")
    require(ceilValue > 0.0, "ceilValue must be positive")
    val ceilCents = math.round(ceilValue * 100)
    val cents = round(value.cast("double") * 100.0, 0).cast("long")
    // null values are excluded (a null bucket would ride into the
    // quantile ORDER BY, where Spark and DuckDB sort nulls to
    // opposite ends — the silent-parity-break class)
    df.select(cents.as("__cents"))
      .filter(col("__cents").isNotNull)
      .select(
        // div, not /: Column./ on longs is DOUBLE division
        expr(s"CAST(least(${buckets - 1}, greatest(0, __cents) * $buckets div $ceilCents) AS BIGINT)")
          .as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  /** Quantile estimates off a [[histSketch]] (bucket, n) table: for
    * each integer percent q the smallest bucket whose running count
    * reaches ceil(q% · N), reported with the bucket's LOWER edge as
    * the estimate (error ≤ one bucket width by construction). The
    * running-sum window is global but bounded by the GRID (≤ buckets
    * rows, never the data) — the documented bounded-window class.
    * Returns (q_pct, bucket, est, cum_n, n_total).
    */
  def histQuantiles(
      hist: DataFrame,
      ceilValue: Double,
      buckets: Int,
      qs: Seq[Int]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 1 && q <= 100), "q in 1..100")
    val width = ceilValue / buckets
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("bucket"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = hist.withColumn("cum_n", sum(col("n")).over(w))
    val tot = broadcast(hist.agg(sum(col("n")).cast("long").as("n_total")))
    val targets = tot.select(
      explode(array(qs.map(q => lit(q.toLong)): _*)).as("q_pct"),
      col("n_total"))
      .withColumn("target", expr("CAST((n_total * q_pct + 99) div 100 AS BIGINT)"))
    // min(bucket) is a primitive hash-agg (a struct-valued min would
    // plan as SortAggregate — the audit trap); cum_n rejoins by
    // bucket, which is unique in the grid
    targets
      .join(cum, cum("cum_n") >= targets("target"))
      .groupBy(col("q_pct"), col("n_total"))
      .agg(min(col("bucket")).as("bucket"))
      .join(cum.select(col("bucket"), col("cum_n")), Seq("bucket"))
      .select(
        col("q_pct"),
        col("bucket"),
        (col("bucket") * lit(width)).as("est"),
        col("cum_n"),
        col("n_total"))
  }

  /** HyperLogLog register table (Flajolet, Fusy, Gandouet & Meunier
    * 2007) — the PORTABLE-register variant: bucket = top `p` bits of
    * the shared md5-slice [[Sampling.hash32]], rho = 1 + leading-zero
    * count of the remaining w = 32−p bits, computed as
    * w + 1 − bit_length(rem) with bit_length via length(bin(x)) —
    * `bin` is the same function on Spark and DuckDB, so a second
    * engine rebuilds the register table bit-for-bit. Spark's built-in
    * `approx_count_distinct` is deliberately NOT used for the same
    * reason [[kmvSketches]] documents: its HLL++ registers are a
    * black box no oracle reproduces. Returns (group…, bucket, r) —
    * occupied buckets only, ≤ 2^p rows per group regardless of input
    * size, and max-merge linear: shard register tables built anywhere
    * [[hllMerge]] into exactly the full-corpus table, the same
    * lossless-merge property as the KMV buffers. One hash aggregate;
    * the value stream never shuffles (partials carry ≤ 2^p registers).
    * Null keys are ignored (the hashSample "null keys never selected"
    * contract). vs KMV: same portability, but the sketch is
    * FIXED-SIZE (2^p registers vs k hashes) with ~1.04/√m relative
    * error — the shape you persist per day per source at 100 TB.
    */
  def hllRegisters(
      df: DataFrame,
      groupCols: Seq[Column],
      key: Column,
      p: Int): DataFrame = {
    require(p >= 4 && p <= 14, "p must be in [4, 14]")
    val w = 32 - p
    val pow2w = 1L << w
    val h = Sampling.hash32(key)
    val rem = col("__h") % pow2w
    Width.spread(df)
      .withColumn("__h", h)
      .filter(col("__h").isNotNull)
      .withColumn("bucket", expr(s"CAST(__h div $pow2w AS BIGINT)"))
      .withColumn(
        "__rho",
        when(rem === 0L, lit((w + 1).toLong))
          .otherwise(lit((w + 1).toLong) - length(bin(rem)).cast("long")))
      .groupBy((groupCols :+ col("bucket")): _*)
      .agg(max(col("__rho")).as("r"))
  }

  /** Max-merge of HLL register tables (register max is the lossless
    * union, so merged == full-rescan exactly — the oracle recomputes
    * it that way). Input is register rows — 2^p-bounded per group,
    * never the stream.
    *
    * GROUPING CONTRACT: the merge groups by `groupCols :+ bucket`
    * only. With the default `groupCols = Nil`, ANY extra columns in
    * the input (source, day, …) are max-merged ACROSS — a global
    * cross-group union, which is the intended "union N per-day
    * sketches into one" call shape but reads like a per-group bug if
    * you meant per-source merging. Pass every partitioning column
    * you want preserved (e.g. `Seq(col("source"))`); the output
    * carries exactly `groupCols + (bucket, r)` and nothing else.
    */
  def hllMerge(regs: DataFrame, groupCols: Seq[Column] = Nil): DataFrame =
    regs
      .groupBy((groupCols :+ col("bucket")): _*)
      .agg(max(col("r")).as("r"))

  /** Distinct-count estimate off a [[hllRegisters]] table: raw
    * estimate alpha_m · m² · 2^33 / S with S = Σ_occupied 2^(33−r) +
    * zeros · 2^33 an EXACT BIGINT (2^(33−r) via integer div/shift, no
    * float powers), alpha_m injected as one double literal shared
    * with the oracle; below 2.5·m with empty buckets present the
    * standard linear-counting correction m · ln(m / zeros) applies
    * (the one float class — ln on identical doubles, the
    * psiFromCounts discipline). The estimate is rounded to a whole
    * BIGINT (round-then-cast, both engines half-away-from-zero on
    * positives). All work is on ≤ 2^p rows per group by
    * CONSTRUCTION. Returns (group…, n_occupied, hll_est).
    *
    * VALID RANGE: the registers come off a 32-bit hash
    * ([[Sampling.hash32]]), and this estimator implements the small-
    * range (linear-counting) correction but NOT the classic
    * large-range correction −2^32·ln(1 − E/2^32) — at cardinalities
    * approaching 2^32 the 32-bit hash itself saturates and the raw
    * estimate reads LOW. The persisted register artifact is therefore
    * specified for cardinalities ≲ 1e8 per group (where 32-bit
    * collisions are negligible and the large-range branch is inert);
    * shard the keyspace (e.g. per-source registers max-merged for a
    * global view stays per-source for estimation) before trusting
    * counts beyond that.
    */
  def hllEstimate(
      regs: DataFrame,
      p: Int,
      groupCols: Seq[Column] = Nil): DataFrame = {
    val m = 1L << p
    val alpha = hllAlpha(p)
    val agg0 = regs
      .groupBy(groupCols: _*)
      .agg(
        count(lit(1)).as("n_occupied"),
        sum(expr("CAST(8589934592 div shiftleft(CAST(1 AS BIGINT), CAST(r AS INT)) AS BIGINT)"))
          .as("__s_occ"))
    val zeros = lit(m) - col("n_occupied")
    // global agg over an EMPTY register table yields one row with a
    // null sum — coalesce so the empty sketch estimates 0 (all
    // registers empty -> linear counting of m/m) instead of null
    val s = (coalesce(col("__s_occ"), lit(0L)) + zeros * lit(8589934592L)).cast("double")
    val raw = lit(alpha * m.toDouble * m.toDouble * 8589934592.0) / s
    val est = when(
      raw <= lit(2.5 * m.toDouble) && zeros > lit(0L),
      lit(m.toDouble) * log(lit(m.toDouble) / zeros.cast("double")))
      .otherwise(raw)
    agg0.select(
      (groupCols :+ col("n_occupied") :+
        round(est, 0).cast("long").as("hll_est")): _*)
  }

  /** The standard HLL bias constant for 2^p registers — computed ONCE
    * here and interpolated as the SAME double literal into the engine
    * plan and the oracle SQL (two engines evaluating 0.7213/(1+1.079/m)
    * independently would agree anyway, but one shared literal removes
    * the question).
    */
  private[graft] def hllAlpha(p: Int): Double = p match {
    case 4 => 0.673
    case 5 => 0.697
    case 6 => 0.709
    case _ => 0.7213 / (1.0 + 1.079 / (1L << p).toDouble)
  }
}
