package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}

/** Order-dependent per-key sequence operators (time-series family).
  *
  * EWMA, and any linear recurrence like it, is defined as a
  * SEQUENTIAL fold over each key's events in time order. The naive
  * distributed shapes both fail a scale test:
  *
  *   - `collect_list` + `aggregate(...)` materializes a key's entire
  *     history in ONE aggregation buffer — a whale/bot key with 10M
  *     events is a straight OOM, and AQE cannot split an aggregate
  *     buffer the way it splits a skewed join.
  *   - a composable (A, B) segment merge (acc' = αx + (1-α)acc over a
  *     length-n segment is A = (1-α)ⁿ, result = A·acc₀ + B) is
  *     associative in exact arithmetic but NOT in IEEE doubles: the
  *     merge tree's rounding differs from the sequential chain's, so
  *     results drift in the last bits AND become partition-count
  *     dependent (partial-aggregate merge order is not deterministic).
  *
  * The shape used here is the classic ordered streaming fold:
  * hash-repartition by key, external sort within partitions by
  * (key, order), then one forward pass holding O(1) state per key —
  * the sort spills to disk (no per-key memory at any history length)
  * and the fold applies the EXACT IEEE chain of the sequential
  * definition, bit-identical to a single-threaded reference (e.g.
  * DuckDB's `list_reduce`) and independent of partition count because
  * each key lives in exactly one partition and its fold order is the
  * total (key, order) sort order. This is the sanctioned imperative
  * per-partition case (SURVEY §0's "rarely" clause): the recurrence
  * itself is inexpressible as a bounded-buffer Catalyst aggregate
  * without changing its floating-point semantics.
  */
object Series {

  /** Per-key EWMA in event order: seed acc = first value, then
    * acc' = alpha·x + (1-alpha)·acc per subsequent value — the same
    * chain as `list_reduce(vs, (acc, x) -> alpha*x + (1-alpha)*acc)`
    * seeded with the head.
    *
    * Output: (keyCol, n: long, ewma: double) — `n` counts the key's
    * rows (null values included, mirroring `collect_list(struct(...))`
    * + `size`), and a null value poisons the fold to null from that
    * point on (IEEE null-propagation parity with `aggregate` /
    * `list_reduce` folding a null element). Null keys form one group,
    * as in `groupBy`. Ties in `orderCols` make the fold order — and
    * thus the result — undefined between the tied rows; pass a total
    * order (the callers order by (event_time, event_id)).
    */
  def ewmaOrdered(
      df: DataFrame,
      keyCol: String,
      orderCols: Seq[String],
      valueCol: String,
      alpha: Double,
      numPartitions: Option[Int] = None): DataFrame = {
    require(alpha > 0 && alpha < 1, "alpha must be in (0,1)")
    val in = df.select((keyCol +: orderCols :+ valueCol).map(col): _*)
    val keyField = in.schema.head
    val valueIdx = in.schema.length - 1
    val outSchema = StructType(Seq(
      keyField.copy(name = keyCol),
      StructField("n", LongType, nullable = false),
      StructField("ewma", DoubleType, nullable = true)))
    val parted = numPartitions match {
      case Some(p) => in.repartition(p, col(keyCol))
      case None    => in.repartition(col(keyCol))
    }
    val sorted = parted.sortWithinPartitions((keyCol +: orderCols).map(col): _*)
    val a = alpha
    sorted.mapPartitions { it =>
      new Iterator[Row] {
        private var pending: Row = null          // finished group awaiting emit
        private var curKey: Any = null
        private var open = false                 // a group is accumulating
        private var n = 0L
        private var acc: java.lang.Double = null
        private var accPoisoned = false          // null value seen -> null result
        private def close(): Row = {
          val r = Row(curKey, n, if (accPoisoned) null else acc)
          open = false
          r
        }
        private def advance(): Unit = {
          while (pending == null && it.hasNext) {
            val row = it.next()
            val k = row.get(0)
            if (!open || k != curKey) {
              if (open) pending = close()
              curKey = k; open = true; n = 0L; acc = null; accPoisoned = false
            }
            val v: java.lang.Double =
              if (row.isNullAt(valueIdx)) null else row.getDouble(valueIdx)
            if (n == 0L) { if (v == null) accPoisoned = true else acc = v }
            else if (!accPoisoned) {
              if (v == null || acc == null) accPoisoned = true
              else acc = a * v + (1.0 - a) * acc
            }
            n += 1
          }
          if (pending == null && open) pending = close()
        }
        override def hasNext: Boolean = { if (pending == null) advance(); pending != null }
        override def next(): Row = {
          if (!hasNext) throw new NoSuchElementException
          val r = pending; pending = null; r
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Per-key Holt double-exponential smoothing (level + trend) in
    * event order — [[ewmaOrdered]]'s two-state sibling, same ordered
    * streaming fold (hash-repartition, spillable sort, one forward
    * pass with O(1) state; bit-identical to the sequential chain and
    * partition-count independent for the same reasons).
    *
    * Recurrence, seeded (level, trend) = (x₀, 0.0):
    * {{{
    *   level' = alpha·x + (1−alpha)·(level + trend)
    *   trend' = beta·(level' − level) + (1−beta)·trend
    * }}}
    * Output: (keyCol, n, level, trend, forecast = level + trend — the
    * one-step-ahead prediction). IEEE caveat carried from ewmaOrdered:
    * pick alpha/beta whose `1.0 − c` is exactly representable against
    * the oracle's literal (0.5 trivially; 0.3 because 1.0 − 0.3 ties
    * to even onto the 0.7 double). A null value poisons level, trend
    * AND forecast to null from that point on; null keys form one
    * group; orderCols must be a total order.
    */
  def holtOrdered(
      df: DataFrame,
      keyCol: String,
      orderCols: Seq[String],
      valueCol: String,
      alpha: Double,
      beta: Double,
      numPartitions: Option[Int] = None): DataFrame = {
    require(alpha > 0 && alpha < 1, "alpha must be in (0,1)")
    require(beta > 0 && beta < 1, "beta must be in (0,1)")
    val in = df.select((keyCol +: orderCols :+ valueCol).map(col): _*)
    val keyField = in.schema.head
    val valueIdx = in.schema.length - 1
    val outSchema = StructType(Seq(
      keyField.copy(name = keyCol),
      StructField("n", LongType, nullable = false),
      StructField("level", DoubleType, nullable = true),
      StructField("trend", DoubleType, nullable = true),
      StructField("forecast", DoubleType, nullable = true)))
    val parted = numPartitions match {
      case Some(p) => in.repartition(p, col(keyCol))
      case None    => in.repartition(col(keyCol))
    }
    val sorted = parted.sortWithinPartitions((keyCol +: orderCols).map(col): _*)
    val a = alpha
    val b = beta
    sorted.mapPartitions { it =>
      new Iterator[Row] {
        private var pending: Row = null
        private var curKey: Any = null
        private var open = false
        private var n = 0L
        private var level = 0.0
        private var trend = 0.0
        private var poisoned = false
        private def close(): Row = {
          val r =
            if (poisoned) Row(curKey, n, null, null, null)
            else Row(curKey, n, level, trend, level + trend)
          open = false
          r
        }
        private def advance(): Unit = {
          while (pending == null && it.hasNext) {
            val row = it.next()
            val k = row.get(0)
            if (!open || k != curKey) {
              if (open) pending = close()
              curKey = k; open = true; n = 0L; level = 0.0; trend = 0.0; poisoned = false
            }
            if (row.isNullAt(valueIdx)) poisoned = true
            else if (!poisoned) {
              val v = row.getDouble(valueIdx)
              if (n == 0L) { level = v; trend = 0.0 }
              else {
                val l2 = a * v + (1.0 - a) * (level + trend)
                trend = b * (l2 - level) + (1.0 - b) * trend
                level = l2
              }
            }
            n += 1
          }
          if (pending == null && open) pending = close()
        }
        override def hasNext: Boolean = { if (pending == null) advance(); pending != null }
        override def next(): Row = {
          if (!hasNext) throw new NoSuchElementException
          val r = pending; pending = null; r
        }
      }
    }(Encoders.row(outSchema))
  }

  /** [[theilSenDaily]] generalized to DOUBLE axes: the lower-median
    * of pairwise slopes round(1e6·(y_j−y_i)/(x_j−x_i)) per key,
    * pairs taken over x_i < x_j. The one float op per pair is the
    * division (plus whatever the caller computed into x/y — e.g. ln
    * for a log-log Zipf fit), rounded to micro-units BEFORE the
    * median rank so the pick is integer-deterministic (the
    * theilSenDaily discipline). Null or non-finite axes are excluded
    * up front (the null-sort parity rule). Quadratic per key over
    * the POINT table — callers bound the points (top-K terms, daily
    * series), never feed a raw stream. Returns (key, n_points,
    * n_pairs, slope6).
    */
  def medianPairwiseSlope6(
      df: DataFrame,
      keyCol: String,
      xCol: String,
      yCol: String): DataFrame = {
    val base = df
      .filter(
        col(xCol).isNotNull && col(yCol).isNotNull &&
          !isnan(col(xCol)) && !isnan(col(yCol)))
      .select(col(keyCol).as("k"), col(xCol).cast("double").as("x"), col(yCol).cast("double").as("y"))
    val a = base.select(col("k"), col("x").as("xa"), col("y").as("ya"))
    val b = base.select(col("k"), col("x").as("xb"), col("y").as("yb"))
    val slopes = a
      .join(b, Seq("k"))
      .filter(col("xa") < col("xb"))
      .select(
        col("k"),
        round(lit(1e6) * (col("yb") - col("ya")) / (col("xb") - col("xa")), 0)
          .cast("long")
          .as("slope6"))
    val counts = base.groupBy(col("k")).agg(count(lit(1)).as("n_points"))
    val w = Window.partitionBy(col("k")).orderBy(col("slope6"))
    slopes
      .withColumn("rn", row_number().over(w))
      .withColumn("np", count(lit(1)).over(Window.partitionBy(col("k"))))
      .filter(col("rn") === expr("CAST((np + 1) div 2 AS BIGINT)"))
      .select(col("k").as(keyCol), col("np").as("n_pairs"), col("slope6"))
      .join(counts.withColumnRenamed("k", keyCol), Seq(keyCol))
      .select(col(keyCol), col("n_points"), col("n_pairs"), col("slope6"))
  }

  /** Half-life decay weights in integer micro-units: w(a) =
    * round(1e6 · 0.5^(a / halfLife)) for ages 0..maxAge days —
    * computed ONCE here and injected as literals into both the
    * engine plan and the oracle (the ndcgWeights shared-constant
    * discipline), so recency scoring is exact integer accumulation
    * with no pow() in either plan. Ages beyond maxAge weigh 0
    * (fully decayed — the bounded-constant contract).
    */
  def decayWeights6(halfLifeDays: Int, maxAgeDays: Int): Seq[Long] = {
    require(halfLifeDays >= 1 && maxAgeDays >= 0)
    (0 to maxAgeDays).map(a =>
      math.round(1e6 * math.pow(0.5, a.toDouble / halfLifeDays)))
  }

  /** Oracle-side mirror of [[decayWeights6]]. */
  def decayWeightSql(halfLifeDays: Int, maxAgeDays: Int, ageExpr: String): String =
    decayWeights6(halfLifeDays, maxAgeDays).zipWithIndex
      .map { case (w, a) => s"WHEN $ageExpr = $a THEN $w" }
      .mkString("CASE ", " ", " ELSE 0 END")

  /** Autocorrelation of a daily series at lags 1..maxLag, in EXACT
    * integer arithmetic: with n days, sum S and values x_t, the
    * mean-centered products scale to integers as
    * (n·x_t − S)(n·x_{t+ℓ} − S), so
    * acf6(ℓ) = 1e6 · Σ_t (n·x_t − S)(n·x_{t+ℓ} − S)
    *               div Σ_t (n·x_t − S)² — one integer division per
    * lag, truncation toward zero on both engines, no float mean
    * anywhere. The centered products are EXTENSIVE in the daily
    * value (c = n·x − S reaches n·x), so the whole chain stages in
    * DECIMAL(38,0) from the first multiply — BIGINT would wrap at
    * Σc² > 2^63, i.e. daily values of ~1e5 on a 1e4-day grid.
    * Residual headroom bound (mirrored by the oracle's HUGEINT):
    * 1e6·Σ|c·c2| < 1e38 — daily totals to ~3e11 on a 30-year grid;
    * quantize the value upstream beyond (the chi2FromCounts
    * convention). A weekly ingest rhythm reads as the lag-7 peak (the
    * ACF view of what [[seasonalIndexDow]] reports as per-dow
    * indexes); a lag-1 spike is day-to-day stickiness. The lag join
    * matches day = day + ℓ exactly — calendar gaps simply contribute
    * no pair (documented; run [[Relational.dayIslands]] first if
    * gaps matter). Keys with zero variance are excluded (acf
    * undefined). Per key: one (n, S) agg + maxLag self-equi-joins on
    * the daily table. Returns (key, lag, n_pairs, acf6).
    */
  def acfDaily(
      daily: DataFrame,
      keyCol: String,
      dayCol: String,
      valueCol: String,
      maxLag: Int = 7): DataFrame = {
    require(maxLag >= 1, "maxLag must be >= 1")
    val base = daily
      .filter(col(dayCol).isNotNull && col(valueCol).isNotNull)
      .select(
        col(keyCol).as("k"),
        datediff(col(dayCol), lit("1970-01-01").cast("date")).cast("long").as("d"),
        col(valueCol).cast("long").as("v"))
    val stats = base.groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
    val centered = base
      .join(stats, Seq("k"))
      .select(
        col("k"), col("d"),
        (col("n").cast("decimal(38,0)") * col("v") - col("s")).as("c"))
    val den = centered
      .groupBy(col("k"))
      .agg(sum(col("c") * col("c")).as("den"))
      .filter(col("den") > 0L)
    val lags = base.sparkSession.range(1, maxLag + 1).select(col("id").as("lag"))
    val pairs = centered
      .join(
        centered.select(col("k"), col("d").as("d2"), col("c").as("c2")),
        Seq("k"))
      .join(broadcast(lags), col("d2") === col("d") + col("lag"))
      .groupBy(col("k"), col("lag"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("c") * col("c2")).as("num"))
    pairs
      .join(den, Seq("k"))
      .select(
        col("k").as(keyCol),
        col("lag"),
        col("n_pairs"),
        expr("CAST(1000000 * num div den AS BIGINT)").as("acf6"))
  }

  /** Single-changepoint LOCATION per key over a daily series — the
    * binary-segmentation step (Scott & Knott 1974 lineage) that
    * complements [[Checks.cusum]]: CUSUM alarms that a level shift
    * happened, this says WHERE. For each split t the separation gain
    * is A(t) = (n·S_t − S·t)² / (t·(n−t)) (the scaled between-
    * segment sum of squares; S_t = prefix sum), maximized over
    * 1 ≤ t < n with ties to the EARLIEST day. gain6 = round(1e6·A):
    * the numerator is exact integer arithmetic (safe while
    * n·S < 2^26.5-ish, i.e. daily totals into the millions — the
    * daily-series class this operates on), one double division +
    * round per t, argmax on the rounded integer so the pick is
    * deterministic. Windows partition by key over the DAILY table.
    * Keys with < 2 days have no split and are absent. Returns
    * (key, n_days, change_day = first day of the new regime, gain6).
    */
  def changepointDaily(
      daily: DataFrame,
      keyCol: String,
      dayCol: String,
      valueCol: String): DataFrame = {
    val base = daily
      .filter(col(dayCol).isNotNull && col(valueCol).isNotNull)
      .select(col(keyCol).as("k"), col(dayCol).as("d"), col(valueCol).cast("long").as("v"))
    val w = Window.partitionBy(col("k")).orderBy(col("d"))
    val cum = base
      .withColumn("t", row_number().over(w).cast("long"))
      .withColumn("st", sum(col("v")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("k"))))
      .withColumn("s", sum(col("v")).over(Window.partitionBy(col("k"))))
      .withColumn("next_d", lead(col("d"), 1).over(w))
    val gains = cum
      .filter(col("t") < col("n"))
      .withColumn("__num", col("n") * col("st") - col("s") * col("t"))
      .withColumn(
        "gain6",
        round(
          lit(1e6) * (col("__num") * col("__num")).cast("double") /
            (col("t") * (col("n") - col("t"))).cast("double"),
          0).cast("long"))
    val best = gains.groupBy(col("k")).agg(max(col("gain6")).as("mg"))
    gains
      .join(best, Seq("k"))
      .filter(col("gain6") === col("mg"))
      .groupBy(col("k"), col("n"), col("mg"))
      .agg(min(col("next_d")).as("change_day"))
      .select(
        col("k").as(keyCol),
        col("n").as("n_days"),
        col("change_day"),
        col("mg").as("gain6"))
  }

  /** Theil–Sen robust trend slope per key (Theil 1950, Sen 1968):
    * the median of all pairwise slopes over a DAILY series — immune
    * to the outlier days that wreck a least-squares fit (one scraper
    * burst flips an OLS trend; the median slope shrugs). Slopes in
    * exact micro-units per day: slope6 = 1e6·(v_j − v_i) div
    * (day_j − day_i), BIGINT throughout; the median is the LOWER
    * median (rank (n+1) div 2 in slope6 order) so both engines pick
    * the identical element with no averaging.
    *
    * Scale posture: the pairwise join is quadratic PER KEY over the
    * daily table — bounded by the series length (a year of days =
    * ~66k pairs), never the raw stream; the median window partitions
    * by key over that bounded pair set. Returns (key, n_days,
    * n_pairs, slope6).
    */
  def theilSenDaily(
      daily: DataFrame,
      keyCol: String,
      dayCol: String,
      valueCol: String): DataFrame = {
    // null days/values are excluded up front: a null reaching the
    // slope ORDER BY would sort to opposite ends on Spark vs DuckDB
    // (silent parity break), and a null value has no slope anyway
    val base = daily
      .filter(col(dayCol).isNotNull && col(valueCol).isNotNull)
      .select(
        col(keyCol).as("k"),
        datediff(col(dayCol), lit("1970-01-01").cast("date")).cast("long").as("d"),
        col(valueCol).cast("long").as("v"))
    val a = base.select(col("k"), col("d").as("da"), col("v").as("va"))
    val b = base.select(col("k"), col("d").as("db"), col("v").as("vb"))
    val slopes = a
      .join(b, Seq("k"))
      .filter(col("da") < col("db"))
      .select(
        col("k"),
        expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * (vb - va) div (db - da) AS BIGINT)").as("slope6"))
    val counts = base.groupBy(col("k")).agg(count(lit(1)).as("n_days"))
    val w = Window.partitionBy(col("k")).orderBy(col("slope6"))
    slopes
      .withColumn("rn", row_number().over(w))
      .withColumn("np", count(lit(1)).over(Window.partitionBy(col("k"))))
      .filter(col("rn") === expr("CAST((np + 1) div 2 AS BIGINT)"))
      .select(col("k").as(keyCol), col("np").as("n_pairs"), col("slope6"))
      .join(counts.withColumnRenamed("k", keyCol), Seq(keyCol))
      .select(col(keyCol), col("n_days"), col("n_pairs"), col("slope6"))
  }

  /** Day-of-week seasonal index over a daily series (day, value):
    * idx(dow) = avg(value | dow) / avg(value), reported in exact
    * micro-units via one cross-multiplied integer division —
    * idx6 = (1e6 · sum_dow · n_days) div (n_dow · total) — so the
    * decomposition is bit-stable on any partitioning (no float mean
    * chain). The weekly-shape complement of [[Checks.cusum]]'s level
    * shifts and the volume gate's per-bucket z-test: a Monday-heavy
    * ingest reads as idx6 > 1e6 on Monday, and dividing a day's
    * count by its index deseasonalizes before anomaly logic. dow is
    * 0 = Sunday … 6 = Saturday (Spark's dayofweek − 1, matching
    * DuckDB's numbering). Rows with a null day or value are excluded
    * from BOTH sides of the index (numerator groups and the
    * total/n_days denominator) so a null row can never skew idx6.
    * Two hash aggregates over the DAILY table — the raw stream never
    * reaches this operator.
    */
  def seasonalIndexDow(daily: DataFrame, dayCol: String, valueCol: String): DataFrame = {
    val clean = daily.filter(col(dayCol).isNotNull && col(valueCol).isNotNull)
    val tot = broadcast(
      clean.agg(
        sum(col(valueCol)).cast("long").as("__total"),
        count(lit(1)).as("__n_days")))
    clean
      .select(
        (dayofweek(col(dayCol)) - 1).cast("long").as("dow"),
        col(valueCol).cast("long").as("__v"))
      .groupBy(col("dow"))
      .agg(count(lit(1)).as("n_days"), sum(col("__v")).as("sum_n"))
      .crossJoin(tot)
      .withColumn(
        "idx6",
        expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * sum_n * __n_days) div (n_days * __total) AS BIGINT)"))
      .select(col("dow"), col("n_days"), col("sum_n"), col("idx6"))
  }

  /** Lead–lag cross-correlation between TWO daily series at signed
    * lags −maxLag..maxLag: xcf(ℓ) = Σ_t ca(t)·cb(t+ℓ) /
    * √(Σca²·Σcb²) with each series centered by its own
    * (n·v − S) integer scaling (the [[acfDaily]] discipline — scale
    * factors cancel in the normalized ratio). The "clicks lead
    * purchases by how many days" instrument: the argmax lag is the
    * measured latency between cause-series and effect-series, which
    * the per-series ACF can't see. Numerators and both denominators
    * are EXACT BIGINTs; the one float step is
    * 1e6·num/√(dena·denb) — IEEE sqrt and division are correctly
    * rounded, so both engines produce the identical double, rounded
    * to a micro-unit BIGINT. Positive lag = `a` LEADS `b` (a's day t
    * pairs with b's day t+ℓ). Returns (lag, n_pairs, xcf6) for every
    * lag with at least one aligned pair, ordered by the caller.
    *
    * CENTERING PINNED: each series is centered on its own GLOBAL
    * mean (over all its days), not the per-lag overlap window's
    * mean — the signal-processing convention (and the oracle's). A
    * `numpy.correlate`-on-pre-centered-arrays port matches; a
    * per-window Pearson (each lag re-centered on the overlapping
    * days only) does NOT — the two definitions diverge on short
    * overlaps where the window mean drifts from the global mean.
    * Likewise the denominator is the GLOBAL √(Σca²·Σcb²), constant
    * across lags, so |xcf6| at extreme lags can exceed a per-window
    * Pearson's; argmax-lag reading is unaffected.
    */
  def crossCorrDaily(
      a: DataFrame,
      b: DataFrame,
      dayCol: String,
      valueCol: String,
      maxLag: Int = 7): DataFrame = {
    require(maxLag >= 1, "maxLag must be >= 1")
    def prep(df: DataFrame, cName: String, dName: String) = {
      val base = df
        .filter(col(dayCol).isNotNull && col(valueCol).isNotNull)
        .select(
          datediff(col(dayCol), lit("1970-01-01").cast("date")).cast("long").as(dName),
          col(valueCol).cast("long").as("v"))
      val st = broadcast(base.agg(count(lit(1)).as("n"), sum(col("v")).as("s")))
      base.crossJoin(st).select(col(dName), (col("n") * col("v") - col("s")).as(cName))
    }
    val ca = prep(a, "ca", "da")
    val cb = prep(b, "cb", "db")
    val dena = broadcast(ca.agg(sum(col("ca") * col("ca")).as("dena")))
    val denb = broadcast(cb.agg(sum(col("cb") * col("cb")).as("denb")))
    val lags = a.sparkSession
      .range(-maxLag.toLong, maxLag + 1L)
      .select(col("id").as("lag"))
    ca
      .crossJoin(broadcast(lags))
      .join(cb, col("db") === col("da") + col("lag"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("ca") * col("cb")).as("num"))
      .crossJoin(dena)
      .crossJoin(denb)
      .filter(col("dena") > 0L && col("denb") > 0L)
      .select(
        col("lag"),
        col("n_pairs"),
        round(
          lit(1e6) * col("num").cast("double") /
            sqrt(col("dena").cast("double") * col("denb").cast("double")),
          0).cast("long").as("xcf6"))
  }

  /** Fano factor (index of dispersion, variance/mean) per key over a
    * DAILY series — the burstiness gate: a Poisson-ish organic
    * arrival process scores ~1e6, a bursty scraper or replay spikes
    * far above it, and a rate-limited bot pins BELOW it (too regular
    * — sub-Poisson is as diagnostic as super-Poisson). Exact
    * integers: fano6 = 1e6·(n·Σx² − S²) div (n·S) — the
    * (n·x − S)-scaled centering of [[acfDaily]], one truncating
    * division per key (all terms non-negative: n·Σx² ≥ S² by
    * Cauchy–Schwarz). Overflow bound: 1e6·n·Σx² < 2^63 — daily
    * counts to ~3e5 over a year of days; rescale the value upstream
    * past that. Null day/value rows excluded; zero-sum keys dropped
    * (no arrivals — dispersion undefined). Returns (key, n_days,
    * sum_n, fano6).
    */
  def fanoDaily(
      daily: DataFrame,
      keyCol: String,
      dayCol: String,
      valueCol: String): DataFrame =
    daily
      .filter(col(dayCol).isNotNull && col(valueCol).isNotNull)
      .select(col(keyCol).as("k"), col(valueCol).cast("long").as("v"))
      .groupBy(col("k"))
      .agg(
        count(lit(1)).as("n_days"),
        sum(col("v")).as("sum_n"),
        sum(col("v") * col("v")).as("__ss"))
      .filter(col("sum_n") > 0L)
      .select(
        col("k").as(keyCol),
        col("n_days"),
        col("sum_n"),
        expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * (CAST(n_days AS DECIMAL(38,0)) * __ss - CAST(sum_n AS DECIMAL(38,0)) * sum_n)) div (n_days * sum_n) AS BIGINT)")
          .as("fano6"))

  /** Mann–Kendall trend statistic per key (Mann 1945, Kendall 1975)
    * over a DAILY series — the nonparametric IS-there-a-trend
    * companion to [[theilSenDaily]]'s HOW-steep: S = Σ over ordered
    * day pairs of sign(v_j − v_i), and Kendall's tau = S/(n(n−1)/2)
    * reported in exact micro-units. S is an exact integer sum of
    * {−1,0,1}; tau6 divides with truncation toward zero (S can be
    * negative — the SQL mirror emulates truncation where floor
    * division would diverge). |tau6| → 1e6 monotone, → 0 trendless;
    * a big Theil–Sen slope with a small |tau6| is one outlier, not a
    * trend. SIGNIFICANCE rides along (Kendall 1975's normal
    * approximation, tie-corrected and continuity-corrected):
    *
    *   z²·1e6 = 1e6·18·(|S|−1)² div (n(n−1)(2n+5) − Σ t(t−1)(2t+5))
    *
    * — exact integer cross-products in DECIMAL(38,0), ONE truncating
    * division (the [[Experiments]] discipline); S = 0 or a
    * degenerate denominator (everything tied) scores 0,
    * not-significant; tie counts cost one (key, value) hash
    * aggregate. Same bounded shape as Theil–Sen: the pairwise join
    * is quadratic in the per-key DAY GRID, never the raw stream.
    * Keys with fewer than 2 days carry no pair evidence and are
    * dropped; null day/value rows excluded (the engine-dependent
    * null ORDER BY rule). Returns (key, n_days, s_stat, tau6, z2_6,
    * significant).
    */
  def mannKendallDaily(
      daily: DataFrame,
      keyCol: String,
      dayCol: String,
      valueCol: String): DataFrame = {
    val base = daily
      .filter(col(dayCol).isNotNull && col(valueCol).isNotNull)
      .select(
        col(keyCol).as("k"),
        datediff(col(dayCol), lit("1970-01-01").cast("date")).cast("long").as("d"),
        col(valueCol).cast("long").as("v"))
    val a = base.select(col("k"), col("d").as("da"), col("v").as("va"))
    val b = base.select(col("k"), col("d").as("db"), col("v").as("vb"))
    val s = a
      .join(b, Seq("k"))
      .filter(col("da") < col("db"))
      .groupBy(col("k"))
      .agg(sum(signum(col("vb") - col("va")).cast("long")).as("s_stat"))
    val ties = base
      .groupBy(col("k"), col("v"))
      .agg(count(lit(1)).as("t"))
      .groupBy(col("k"))
      .agg(sum(col("t") * (col("t") - 1L) * (lit(2L) * col("t") + 5L)).as("__tt"))
    base
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_days"))
      .filter(col("n_days") >= 2)
      .join(s, Seq("k"))
      .join(ties, Seq("k"))
      .withColumn(
        "tau6",
        expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * s_stat) div (n_days * (n_days - 1) div 2) AS BIGINT)"))
      .withColumn(
        "__den",
        expr(
          """CAST(n_days AS DECIMAL(38,0)) * CAST(n_days - 1 AS DECIMAL(38,0))
            |* CAST(2 * n_days + 5 AS DECIMAL(38,0)) - CAST(__tt AS DECIMAL(38,0))"""
            .stripMargin))
      .withColumn(
        "z2_6",
        expr(
          """CASE WHEN s_stat = 0 OR __den <= 0 THEN CAST(0 AS BIGINT)
            |ELSE CAST(
            |  (CAST(18000000 AS DECIMAL(38,0))
            |   * CAST(abs(s_stat) - 1 AS DECIMAL(38,0))
            |   * CAST(abs(s_stat) - 1 AS DECIMAL(38,0)))
            |  div __den
            |AS BIGINT) END""".stripMargin))
      .select(
        col("k").as(keyCol), col("n_days"), col("s_stat"), col("tau6"),
        col("z2_6"),
        (col("z2_6") >= Experiments.Z2Alpha05Micro).as("significant"))
  }

  /** Kaplan–Meier product-limit survival curve (Kaplan & Meier, JASA
    * 1958) over entity LIFETIMES in an activity log: lifetime = days
    * between an entity's first and last activity, bucketed into
    * `ageUnitDays`-day ages; an entity whose last activity is within
    * `censorDays` of the corpus clock (max activity day) is CENSORED
    * — still alive, its lifetime only a lower bound — and KM is
    * exactly the estimator that uses censored rows' at-risk evidence
    * without counting them as churn (the naive "mean lifetime" is
    * biased low; this is the retention curve a_retention's cohort
    * grid doesn't give you).
    *
    * Exactness: S6(a) = fold over ages j ≤ a of
    * S ← (S · (n_j − d_j)) div n_j starting at 1e6 — a sequential
    * integer product (all values non-negative, truncation == floor on
    * both engines) evaluated IN-PLAN: the age grid is collected into
    * a one-row broadcast array (bounded by the date SPAN, never by
    * entity count — ~80 rows for seven years of 30-day ages, the
    * documented bounded-grid class) and each row folds its own
    * prefix with a higher-order aggregate; the oracle replays the
    * identical fold as a recursive CTE. At-risk counts via one
    * age-desc running sum over the same grid. At 100 TB the only
    * entity-proportional work is the per-entity min/max aggregate.
    *
    * Returns (age, n_risk, n_churn, n_censored, s6), one row per
    * observed age, s6 non-increasing.
    */
  /** Shared (age, d, c, n) survival grid of [[kaplanMeier]] and
    * [[nelsonAalen]]: per-entity lifetimes quantized to age units,
    * censor flag against the corpus-max clock, at-risk counts from
    * one descending running sum over the age-bounded grid.
    */
  private def survivalGrid(
      df: DataFrame,
      idCol: String,
      dayCol: String,
      ageUnitDays: Int,
      censorDays: Int): DataFrame = {
    require(ageUnitDays >= 1, "ageUnitDays must be >= 1")
    require(censorDays >= 0, "censorDays must be >= 0")
    val perUser = df
      .filter(col(idCol).isNotNull && col(dayCol).isNotNull)
      .groupBy(col(idCol))
      .agg(min(col(dayCol)).as("__f"), max(col(dayCol)).as("__l"))
    val clock = broadcast(perUser.agg(max(col("__l")).as("__cmax")))
    val lives = perUser
      .crossJoin(clock)
      .select(
        expr(s"CAST(datediff(__l, __f) div $ageUnitDays AS BIGINT)").as("age"),
        (datediff(col("__cmax"), col("__l")) < censorDays).as("__cens"))
    val ages = lives
      .groupBy(col("age"))
      .agg(
        sum(when(!col("__cens"), 1L).otherwise(0L)).as("d"),
        sum(when(col("__cens"), 1L).otherwise(0L)).as("c"))
    val wDesc = Window
      .orderBy(col("age").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ages.withColumn("n", sum(col("d") + col("c")).over(wDesc))
  }

  /** Nelson–Aalen cumulative hazard (Nelson 1972, Aalen 1978) — the
    * ADDITIVE sibling of [[kaplanMeier]] on the same survival grid:
    * H(t) = Σ_{age ≤ t} d/n. Where KM answers "what fraction
    * survives to t", the cumulative hazard reads as expected events
    * per at-risk entity and is the quantity hazard models regress
    * on; near-linear H = constant churn rate, convex = aging out.
    * Exactness: each grid term rounds ONCE to micro units
    * (1e6·d div n, truncating — the psiFromCounts per-term
    * discipline), then an exact ascending running BIGINT sum over
    * the age-bounded grid. Same censoring convention as KM (entities
    * last seen within censorDays of the corpus-max clock are at-risk
    * evidence, not churn). Returns (age, n_risk, n_churn,
    * n_censored, h6).
    */
  def nelsonAalen(
      df: DataFrame,
      idCol: String,
      dayCol: String,
      ageUnitDays: Int,
      censorDays: Int): DataFrame = {
    val grid = survivalGrid(df, idCol, dayCol, ageUnitDays, censorDays)
    val wAsc = Window
      .orderBy(col("age"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .withColumn("__h", expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * d div n AS BIGINT)"))
      .withColumn("h6", sum(col("__h")).over(wAsc))
      .select(
        col("age"),
        col("n").as("n_risk"),
        col("d").as("n_churn"),
        col("c").as("n_censored"),
        col("h6"))
  }

  def kaplanMeier(
      df: DataFrame,
      idCol: String,
      dayCol: String,
      ageUnitDays: Int,
      censorDays: Int): DataFrame = {
    val grid = survivalGrid(df, idCol, dayCol, ageUnitDays, censorDays)
    val arr = broadcast(
      grid.agg(
        array_sort(collect_list(struct(col("age"), col("d"), col("n"))))
          .as("__arr")))
    grid
      .crossJoin(arr)
      .withColumn(
        "s6",
        expr(
          "aggregate(filter(__arr, x -> x.age <= age), " +
            "CAST(1000000 AS BIGINT), " +
            "(acc, x) -> (acc * (x.n - x.d)) div x.n)"))
      .select(
        col("age"),
        col("n").as("n_risk"),
        col("d").as("n_churn"),
        col("c").as("n_censored"),
        col("s6"))
  }

  /** Log-rank test (Mantel 1966, Peto & Peto 1972) — DO two cohorts'
    * survival curves differ, with censoring handled the only honest
    * way: at each event age, compare group A's OBSERVED churn against
    * the churn expected if both groups shared one hazard, given who
    * was still at risk. The inferential companion of [[kaplanMeier]]
    * (which only draws the curves) on the same lifetime/censoring
    * construction, split by a per-entity group.
    *
    * Per event age j (d = total churn, n = total at risk, nA at risk
    * in A):  E_j = d·nA/n  and the hypergeometric variance
    * V_j = d·(nA/n)·(nB/n)·(n−d)/(n−1); then
    * z² = (O_A − ΣE)² / ΣV ~ chi²₁.
    *
    * Exactness: per-age terms round ONCE to micro units off exact
    * integer cross-products in DECIMAL(38,0) —
    * e6 = 1e6·d·nA div n, v6 = 1e6·d·nA·nB·(n−d) div (n²·(n−1)) —
    * then exact BIGINT sums (the [[nelsonAalen]] per-term
    * discipline, mirrored verbatim by the oracle); the final
    * z2_6 = (1e6·O_A − Σe6)² div Σv6 is one DECIMAL division.
    * Valid range: the v6 cross-product reaches 1e6·n⁴ — exact to
    * DECIMAL(38,0) headroom at n ≲ 1e8 entities (past that, stage
    * the division). ΣV = 0 (no age with churn from both risk sets)
    * degenerates to z2_6 = 0 by the established convention.
    *
    * Contracts, both fail-fast in-plan: exactly TWO groups (sides are
    * the lexicographic (min, max), the [[Experiments.mannWhitneyU]]
    * convention), and one group per entity — an id seen under two
    * groups is a caller bug, not a vote.
    *
    * Scale shape: one per-entity aggregate (the only
    * entity-proportional work), then everything lives on the
    * age-bounded grid (date span / ageUnitDays — the documented
    * bounded-grid class, so its ordered window is safe); one-row
    * output (side_a, side_b, n_a, n_b, o_a, e6, v6, z2_6,
    * significant).
    */
  /** Shared two-group per-age grid of [[logRank]] and [[hazardRatio]]:
    * (age, side_a, side_b, da, db, ca, cb, na, nb) — lifetimes split
    * by a per-entity group, at-risk counts from the age-bounded
    * descending running sum, both fail-fast contracts applied.
    */
  private def logRankGrid(
      df: DataFrame,
      idCol: String,
      dayCol: String,
      groupCol: String,
      ageUnitDays: Int,
      censorDays: Int): DataFrame = {
    require(ageUnitDays >= 1, "ageUnitDays must be >= 1")
    require(censorDays >= 0, "censorDays must be >= 0")
    val perUser = df
      .filter(col(idCol).isNotNull && col(dayCol).isNotNull && col(groupCol).isNotNull)
      .groupBy(col(idCol))
      .agg(
        min(col(dayCol)).as("__f"),
        max(col(dayCol)).as("__l"),
        min(col(groupCol)).as("__g"),
        max(col(groupCol)).as("__g2"))
      .filter(
        assert_true(
          col("__g") === col("__g2"),
          concat(
            lit("logRank: entity in two groups: "),
            col(idCol).cast("string"))).isNull)
    val clock = broadcast(
      perUser.agg(
        max(col("__l")).as("__cmax"),
        count_distinct(col("__g")).as("__ng"),
        min(col("__g")).as("side_a"),
        max(col("__g")).as("side_b")))
    val lives = perUser
      .crossJoin(clock)
      .filter(
        assert_true(
          col("__ng") === 2L,
          concat(
            lit("logRank: exactly 2 groups required, got "),
            col("__ng").cast("string"))).isNull)
      .select(
        expr(s"CAST(datediff(__l, __f) div $ageUnitDays AS BIGINT)").as("age"),
        (datediff(col("__cmax"), col("__l")) < censorDays).as("__cens"),
        (col("__g") === col("side_a")).as("__isa"),
        col("side_a"),
        col("side_b"))
    val ages = lives
      .groupBy(col("age"), col("side_a"), col("side_b"))
      .agg(
        sum(when(!col("__cens") && col("__isa"), 1L).otherwise(0L)).as("da"),
        sum(when(!col("__cens") && !col("__isa"), 1L).otherwise(0L)).as("db"),
        sum(when(col("__cens") && col("__isa"), 1L).otherwise(0L)).as("ca"),
        sum(when(col("__cens") && !col("__isa"), 1L).otherwise(0L)).as("cb"))
    val wDesc = Window
      .orderBy(col("age").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ages
      .withColumn("na", sum(col("da") + col("ca")).over(wDesc))
      .withColumn("nb", sum(col("db") + col("cb")).over(wDesc))
  }

  def logRank(
      df: DataFrame,
      idCol: String,
      dayCol: String,
      groupCol: String,
      ageUnitDays: Int,
      censorDays: Int): DataFrame = {
    logRankGrid(df, idCol, dayCol, groupCol, ageUnitDays, censorDays)
      .withColumn(
        "__e6",
        expr(
          """CAST((CAST(1000000 AS DECIMAL(38,0)) * (da + db) * na)
            |div (na + nb) AS BIGINT)""".stripMargin))
      .withColumn(
        "__v6",
        expr(
          """CASE WHEN na + nb < 2 THEN CAST(0 AS BIGINT)
            |ELSE CAST(
            |  (CAST(1000000 AS DECIMAL(38,0)) * (da + db) * na * nb
            |   * (na + nb - da - db))
            |  div (CAST(na + nb AS DECIMAL(38,0)) * (na + nb) * (na + nb - 1))
            |AS BIGINT) END""".stripMargin))
      .groupBy(col("side_a"), col("side_b"))
      .agg(
        sum(col("da") + col("ca")).as("n_a"),
        sum(col("db") + col("cb")).as("n_b"),
        sum(col("da")).as("o_a"),
        sum(col("__e6")).as("e6"),
        sum(col("__v6")).as("v6"))
      .withColumn(
        "z2_6",
        expr(
          """CASE WHEN v6 <= 0 THEN CAST(0 AS BIGINT)
            |ELSE CAST(
            |  ((CAST(1000000 AS DECIMAL(38,0)) * o_a - e6)
            |   * (CAST(1000000 AS DECIMAL(38,0)) * o_a - e6))
            |  div CAST(v6 AS DECIMAL(38,0))
            |AS BIGINT) END""".stripMargin))
      .select(
        col("side_a"), col("side_b"), col("n_a"), col("n_b"),
        col("o_a"), col("e6"), col("v6"), col("z2_6"),
        (col("z2_6") >= Experiments.Z2Alpha05Micro).as("significant"))
  }

  /** Gehan–Wilcoxon weighted log-rank (Gehan 1965; Breslow 1970) —
    * the EARLY-difference-sensitive member of the weighted-log-rank
    * family: each age's hypergeometric term is weighted by the
    * at-risk count n(a), so divergence while everyone is still at
    * risk dominates, where the plain [[logRank]] (w = 1) weighs all
    * ages equally and is best against proportional hazards. Run both:
    * agreeing verdicts are robust, a split says the hazards CROSS.
    *
    *   z² = (Σ n·(d_A − E))² / (Σ n²·V)
    *
    * Exactness: the logRank grid's per-age e6/v6 (each micro-rounded
    * once) are weighted by EXACT integer n and n² before the exact
    * sums — num = Σ(1e6·n·d_A − n·e6), den6 = Σ n²·v6 — and
    * z2_6 = num² div den6 is one DECIMAL division (num reaches
    * 1e6·n², den 1e6·n³: exact to ~1e8 entities, the logRank bound).
    * Same contracts and grid as logRank. Returns one row (side_a,
    * side_b, n_a, n_b, o_a, z2_6, significant).
    */
  def gehanWilcoxon(
      df: DataFrame,
      idCol: String,
      dayCol: String,
      groupCol: String,
      ageUnitDays: Int,
      censorDays: Int): DataFrame =
    logRankGrid(df, idCol, dayCol, groupCol, ageUnitDays, censorDays)
      .withColumn(
        "__e6",
        expr(
          """CASE WHEN na + nb = 0 THEN CAST(0 AS BIGINT)
            |ELSE CAST((CAST(1000000 AS DECIMAL(38,0)) * (da + db) * na)
            |div (na + nb) AS BIGINT) END""".stripMargin))
      .withColumn(
        "__v6",
        expr(
          """CASE WHEN na + nb < 2 THEN CAST(0 AS BIGINT)
            |ELSE CAST(
            |  (CAST(1000000 AS DECIMAL(38,0)) * (da + db) * na * nb
            |   * (na + nb - da - db))
            |  div (CAST(na + nb AS DECIMAL(38,0)) * (na + nb) * (na + nb - 1))
            |AS BIGINT) END""".stripMargin))
      .withColumn(
        "__num",
        expr(
          """CAST(1000000 AS DECIMAL(38,0)) * (na + nb) * da
            |- CAST(na + nb AS DECIMAL(38,0)) * __e6""".stripMargin))
      .withColumn(
        "__den6",
        expr(
          """CAST(na + nb AS DECIMAL(38,0)) * (na + nb) * __v6"""))
      .groupBy(col("side_a"), col("side_b"))
      .agg(
        sum(col("da") + col("ca")).as("n_a"),
        sum(col("db") + col("cb")).as("n_b"),
        sum(col("da")).as("o_a"),
        sum(col("__num")).cast("decimal(38,0)").as("__n"),
        sum(col("__den6")).cast("decimal(38,0)").as("__d"))
      .withColumn(
        "z2_6",
        expr(
          """CASE WHEN __d <= 0 THEN CAST(0 AS BIGINT)
            |ELSE CAST((__n * __n) div __d AS BIGINT) END""".stripMargin))
      .select(
        col("side_a"), col("side_b"), col("n_a"), col("n_b"), col("o_a"),
        col("z2_6"),
        (col("z2_6") >= Experiments.Z2Alpha05Micro).as("significant"))

  /** Stratified log-rank test (the Mantel 1966 test summed over
    * strata — [[Experiments.mantelHaenszel]]'s posture applied to
    * survival): does the treatment's survival effect hold once a
    * confounder is fixed, by summing each stratum's per-age
    * hypergeometric evidence? A cohort mix shift (old strata churn
    * fast AND skew toward one arm) fools the plain [[logRank]]; the
    * stratified form compares arms only WITHIN strata.
    *
    * Exactness: the logRank per-term discipline per (stratum, age)
    * cell — e6/v6 micro-round once per cell off DECIMAL(38,0)
    * cross-products, then exact BIGINT sums over every cell;
    * z2_6 = (1e6·O_A − Σe6)² div Σv6 is one DECIMAL division.
    * At-risk counts come from a descending running sum PARTITIONED
    * BY STRATUM (each partition is one stratum's age-bounded grid —
    * strictly better-shaped than the unpartitioned survival-grid
    * window). Same fail-fast contracts as logRank (exactly 2 groups
    * GLOBALLY; one group per entity), plus one entity = one stratum
    * (an id in two strata is the same caller bug). Returns one row
    * (side_a, side_b, k_strata, n_a, n_b, o_a, e6, v6, z2_6,
    * significant).
    */
  def stratifiedLogRank(
      df: DataFrame,
      idCol: String,
      dayCol: String,
      groupCol: String,
      stratumCol: String,
      ageUnitDays: Int,
      censorDays: Int): DataFrame = {
    require(ageUnitDays >= 1, "ageUnitDays must be >= 1")
    require(censorDays >= 0, "censorDays must be >= 0")
    val perUser = df
      .filter(col(idCol).isNotNull && col(dayCol).isNotNull
        && col(groupCol).isNotNull && col(stratumCol).isNotNull)
      .groupBy(col(idCol))
      .agg(
        min(col(dayCol)).as("__f"),
        max(col(dayCol)).as("__l"),
        min(col(groupCol)).as("__g"),
        max(col(groupCol)).as("__g2"),
        min(col(stratumCol)).as("__st"),
        max(col(stratumCol)).as("__st2"))
      .filter(
        assert_true(
          col("__g") === col("__g2") && col("__st") === col("__st2"),
          concat(
            lit("stratifiedLogRank: entity in two groups or strata: "),
            col(idCol).cast("string"))).isNull)
    val clock = broadcast(
      perUser.agg(
        max(col("__l")).as("__cmax"),
        count_distinct(col("__g")).as("__ng"),
        min(col("__g")).as("side_a"),
        max(col("__g")).as("side_b")))
    val lives = perUser
      .crossJoin(clock)
      .filter(
        assert_true(
          col("__ng") === 2L,
          concat(
            lit("stratifiedLogRank: exactly 2 groups required, got "),
            col("__ng").cast("string"))).isNull)
      .select(
        col("__st").as("st"),
        expr(s"CAST(datediff(__l, __f) div $ageUnitDays AS BIGINT)").as("age"),
        (datediff(col("__cmax"), col("__l")) < censorDays).as("__cens"),
        (col("__g") === col("side_a")).as("__isa"),
        col("side_a"),
        col("side_b"))
    val ages = lives
      .groupBy(col("st"), col("age"), col("side_a"), col("side_b"))
      .agg(
        sum(when(!col("__cens") && col("__isa"), 1L).otherwise(0L)).as("da"),
        sum(when(!col("__cens") && !col("__isa"), 1L).otherwise(0L)).as("db"),
        sum(when(col("__cens") && col("__isa"), 1L).otherwise(0L)).as("ca"),
        sum(when(col("__cens") && !col("__isa"), 1L).otherwise(0L)).as("cb"))
    val wDesc = Window
      .partitionBy(col("st"))
      .orderBy(col("age").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ages
      .withColumn("na", sum(col("da") + col("ca")).over(wDesc))
      .withColumn("nb", sum(col("db") + col("cb")).over(wDesc))
      .withColumn(
        "__e6",
        expr(
          """CAST((CAST(1000000 AS DECIMAL(38,0)) * (da + db) * na)
            |div (na + nb) AS BIGINT)""".stripMargin))
      .withColumn(
        "__v6",
        expr(
          """CASE WHEN na + nb < 2 THEN CAST(0 AS BIGINT)
            |ELSE CAST(
            |  (CAST(1000000 AS DECIMAL(38,0)) * (da + db) * na * nb
            |   * (na + nb - da - db))
            |  div (CAST(na + nb AS DECIMAL(38,0)) * (na + nb) * (na + nb - 1))
            |AS BIGINT) END""".stripMargin))
      .groupBy(col("side_a"), col("side_b"))
      .agg(
        count_distinct(col("st")).as("k_strata"),
        sum(col("da") + col("ca")).as("n_a"),
        sum(col("db") + col("cb")).as("n_b"),
        sum(col("da")).as("o_a"),
        sum(col("__e6")).as("e6"),
        sum(col("__v6")).as("v6"))
      .withColumn(
        "z2_6",
        expr(
          """CASE WHEN v6 <= 0 THEN CAST(0 AS BIGINT)
            |ELSE CAST(
            |  ((CAST(1000000 AS DECIMAL(38,0)) * o_a - e6)
            |   * (CAST(1000000 AS DECIMAL(38,0)) * o_a - e6))
            |  div CAST(v6 AS DECIMAL(38,0))
            |AS BIGINT) END""".stripMargin))
      .select(
        col("side_a"), col("side_b"), col("k_strata"), col("n_a"), col("n_b"),
        col("o_a"), col("e6"), col("v6"), col("z2_6"),
        (col("z2_6") >= Experiments.Z2Alpha05Micro).as("significant"))
  }

  /** Cumulative incidence function under competing risks (Aalen &
    * Johansen 1978; Kalbfleisch & Prentice's CIF) — WHICH way do
    * entities leave, when "churn" has causes: each entity's terminal
    * cause is its LAST event's type, and naively running per-cause
    * KM treats competitors as censoring, which overstates every
    * cause (the classic 1−KM bias). The CIF is the honest
    * decomposition:
    *
    *   CIF_c(t) = Σ_{a ≤ t} S(a−) · d_c(a)/n(a),   Σ_c CIF_c(∞) +
    *   censored mass = 1
    *
    * with S the ALL-CAUSE Kaplan–Meier and d_c the cause-c churn.
    *
    *       Exactness: S(a−) is the lagged all-cause KM step (already
    * micro-rounded by the [[kaplanMeier]] fold; the age BEFORE a is
    * the previous grid row — one lag over the age-bounded grid);
    * each increment rounds once more —
    * inc6 = (S6prev·(1e6·d_c div n)) div 1e6, the documented
    * two-stage convention — then an exact running sum PARTITIONED BY
    * CAUSE over the bounded grid. Returns (cause, age, n_risk, d_c,
    * cif6), cif6 non-decreasing per cause.
    */
  def cumulativeIncidence(
      df: DataFrame,
      idCol: String,
      dayCol: String,
      causeCol: String,
      ageUnitDays: Int,
      censorDays: Int): DataFrame = {
    require(ageUnitDays >= 1, "ageUnitDays must be >= 1")
    require(censorDays >= 0, "censorDays must be >= 0")
    // per-entity lifetime + terminal cause = the LAST event's type
    // (max(ts) struct argmax — deterministic: ties on the same last
    // day break by the cause string itself)
    val perUser = df
      .filter(col(idCol).isNotNull && col(dayCol).isNotNull && col(causeCol).isNotNull)
      .groupBy(col(idCol))
      .agg(
        min(col(dayCol)).as("__f"),
        max(col(dayCol)).as("__l"),
        max(struct(col(dayCol).as("d"), col(causeCol).as("c"))).as("__last"))
    val clock = broadcast(perUser.agg(max(col("__l")).as("__cmax")))
    val lives = perUser
      .crossJoin(clock)
      .select(
        expr(s"CAST(datediff(__l, __f) div $ageUnitDays AS BIGINT)").as("age"),
        (datediff(col("__cmax"), col("__l")) < censorDays).as("__cens"),
        col("__last.c").as("cause"))
    // all-cause grid + KM fold (the kaplanMeier construction inline —
    // the grid also needs per-cause churn, so the shared helper's
    // 2-group shape does not fit)
    val ages = lives
      .groupBy(col("age"))
      .agg(
        sum(when(!col("__cens"), 1L).otherwise(0L)).as("d"),
        sum(when(col("__cens"), 1L).otherwise(0L)).as("c"))
    val wDesc = Window
      .orderBy(col("age").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val grid = ages.withColumn("n", sum(col("d") + col("c")).over(wDesc))
    val arr = broadcast(
      grid.agg(
        array_sort(collect_list(struct(col("age"), col("d"), col("n"))))
          .as("__arr")))
    val km = grid
      .crossJoin(arr)
      .withColumn(
        "s6",
        expr(
          "aggregate(filter(__arr, x -> x.age <= age), " +
            "CAST(1000000 AS BIGINT), " +
            "(acc, x) -> (acc * (x.n - x.d)) div x.n)"))
      // S(a-) = the step BEFORE this age: fold over strictly-smaller
      // ages (1e6 before the first event age)
      .withColumn(
        "s6prev",
        expr(
          "aggregate(filter(__arr, x -> x.age < age), " +
            "CAST(1000000 AS BIGINT), " +
            "(acc, x) -> (acc * (x.n - x.d)) div x.n)"))
      .select(col("age"), col("n"), col("s6prev"))
    val causeAges = lives
      .filter(!col("__cens"))
      .groupBy(col("cause"), col("age"))
      .agg(count(lit(1)).as("d_c"))
    val wAsc = Window
      .partitionBy(col("cause"))
      .orderBy(col("age"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    causeAges
      .join(km, Seq("age"))
      .withColumn(
        "__inc6",
        expr(
          """CAST((s6prev * CAST(CAST(1000000 AS DECIMAL(38,0)) * d_c div n AS BIGINT))
            |div 1000000 AS BIGINT)""".stripMargin))
      .withColumn("cif6", sum(col("__inc6")).over(wAsc))
      .select(
        col("cause"), col("age"), col("n").as("n_risk"), col("d_c"), col("cif6"))
  }

  /** Greenwood variance of the Kaplan–Meier curve (Greenwood 1926) —
    * the uncertainty band every published survival curve carries:
    * Var(S(t)) = S(t)²·Σ_{a≤t} d/(n(n−d)). Where [[kaplanMeier]]
    * gives the point estimate, this says how much at-risk evidence
    * backs each step (late ages with tiny risk sets get honest wide
    * variance). Emitted as the pico-scaled variance (callers apply
    * their own z·sqrt — the no-runtime-sqrt rule).
    *
    * Exactness: per-age terms round ONCE to pico units
    * (g12 = 1e12·d div (n·(n−d)), truncating, DECIMAL for the n²
    * product; d = n degenerates the term to the n−d = 0 guard → the
    * curve is dead, variance 0 by convention), an exact ascending
    * running sum over the age-bounded grid, then
    * gvar12 = (S6²·Σg12) div 1e12 — one more truncating division of
    * DECIMAL cross-products. Returns the kaplanMeier columns plus
    * gvar12.
    */
  def kaplanMeierGreenwood(
      df: DataFrame,
      idCol: String,
      dayCol: String,
      ageUnitDays: Int,
      censorDays: Int): DataFrame = {
    val km = kaplanMeier(df, idCol, dayCol, ageUnitDays, censorDays)
    val wAsc = Window
      .orderBy(col("age"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    km
      .withColumn(
        "__g12",
        expr(
          """CASE WHEN n_risk - n_churn <= 0 THEN CAST(0 AS BIGINT)
            |ELSE CAST(
            |  (CAST(1000000000000 AS DECIMAL(38,0)) * n_churn)
            |  div (CAST(n_risk AS DECIMAL(38,0)) * (n_risk - n_churn))
            |AS BIGINT) END""".stripMargin))
      .withColumn("__gsum", sum(col("__g12")).over(wAsc))
      .withColumn(
        "gvar12",
        expr(
          """CAST(
            |  (CAST(s6 AS DECIMAL(38,0)) * s6 * __gsum)
            |  div CAST(1000000000000 AS DECIMAL(38,0))
            |AS BIGINT)""".stripMargin))
      .select(
        col("age"), col("n_risk"), col("n_churn"), col("n_censored"),
        col("s6"), col("gvar12"))
  }

  /** Mantel–Haenszel hazard ratio off the [[logRank]] grid — the
    * EFFECT SIZE the log-rank test is about (the test says the
    * curves differ; this says by HOW MUCH, as a constant relative
    * risk): HR = (O_A/E_A)/(O_B/E_B), the observed-over-expected
    * ratio under the shared-hazard null, the standard companion
    * readout of every survival comparison.
    *
    * Exactness: E6 terms micro-round once per age for EACH side
    * (e6_a = 1e6·d·nA div n, e6_b = 1e6·d·nB div n — the logRank
    * per-term discipline), then
    * hr6 = (1e6·O_A·ΣE6_B) div (O_B·ΣE6_A) is one DECIMAL division;
    * a zero denominator (no churn in B, or no expected churn in A)
    * → 0 by the established degenerate convention. Same fail-fast
    * contracts as logRank. Returns one row (side_a, side_b, o_a,
    * o_b, ea6, eb6, hr6).
    */
  def hazardRatio(
      df: DataFrame,
      idCol: String,
      dayCol: String,
      groupCol: String,
      ageUnitDays: Int,
      censorDays: Int): DataFrame =
    logRankGrid(df, idCol, dayCol, groupCol, ageUnitDays, censorDays)
      .withColumn(
        "__ea6",
        expr(
          """CASE WHEN na + nb = 0 THEN CAST(0 AS BIGINT)
            |ELSE CAST((CAST(1000000 AS DECIMAL(38,0)) * (da + db) * na)
            |div (na + nb) AS BIGINT) END""".stripMargin))
      .withColumn(
        "__eb6",
        expr(
          """CASE WHEN na + nb = 0 THEN CAST(0 AS BIGINT)
            |ELSE CAST((CAST(1000000 AS DECIMAL(38,0)) * (da + db) * nb)
            |div (na + nb) AS BIGINT) END""".stripMargin))
      .groupBy(col("side_a"), col("side_b"))
      .agg(
        sum(col("da")).as("o_a"),
        sum(col("db")).as("o_b"),
        sum(col("__ea6")).as("ea6"),
        sum(col("__eb6")).as("eb6"))
      .withColumn(
        "hr6",
        expr(
          """CASE WHEN o_b <= 0 OR ea6 <= 0 THEN CAST(0 AS BIGINT)
            |ELSE CAST(
            |  (CAST(1000000 AS DECIMAL(38,0)) * o_a * eb6)
            |  div (CAST(o_b AS DECIMAL(38,0)) * ea6)
            |AS BIGINT) END""".stripMargin))
      .select(
        col("side_a"), col("side_b"), col("o_a"), col("o_b"),
        col("ea6"), col("eb6"), col("hr6"))

  /** Restricted mean survival time (RMST; Royston & Parmar 2013's
    * recommended model-free summary) off the [[kaplanMeier]] curve:
    * the area under S(t) up to horizon τ — "expected lifetime within
    * the first τ age units", the scalar that stays meaningful when
    * censoring makes the plain mean undefined and hazards are not
    * proportional.
    *
    *   RMST6(τ) = 1e6·min(a₁, τ) + Σ_i S6(a_i)·(min(a_{i+1}, τ) −
    *              min(a_i, τ))
    *
    * — S is a step function constant between event ages, so the
    * integral is an exact sum of step areas over the age-BOUNDED
    * grid (S6 terms already micro-rounded by KM; widths are exact
    * integers; one lead() over the bounded grid — the documented
    * bounded-window class; rows at or past τ contribute 0; the
    * segment before the first grid age is survival 1). Same
    * construction parameters as kaplanMeier. Returns one row
    * (tau, n_entities, rmst6 — micro age-units).
    */
  def restrictedMeanSurvival(
      df: DataFrame,
      idCol: String,
      dayCol: String,
      ageUnitDays: Int,
      censorDays: Int,
      tau: Long): DataFrame = {
    require(tau >= 1L, "tau must be >= 1 age unit")
    val km = kaplanMeier(df, idCol, dayCol, ageUnitDays, censorDays)
    val w = Window.orderBy(col("age"))
    km
      .withColumn("__next", lead(col("age"), 1).over(w))
      .agg(
        max(lit(tau)).as("tau"),
        max(col("n_risk")).as("n_entities"),
        (least(min(col("age")), lit(tau)) * lit(1000000L) +
          coalesce(
            sum(
              col("s6") *
                (least(coalesce(col("__next"), lit(tau)), lit(tau))
                  - least(col("age"), lit(tau)))),
            lit(0L))).as("rmst6"))
  }

  /** Gap-fill a per-key daily series onto the full calendar grid
    * with last-observation-carried-forward — the reporting-table
    * normalizer ("what was every source's running state on every
    * day") that turns sparse event days into a dense grid a
    * dashboard or a drift detector can difference. Grid: the GLOBAL
    * [min day, max day] span (sequence + explode — one row per day
    * per key, keys × days bounded); days before a key's first
    * observation stay NULL (nothing to carry — LOCF, not
    * back-fill). One `last(ignoreNulls)` running window per key over
    * the bounded grid. Returns (key, day, n = the raw observation or
    * null, filled = LOCF value or null before first sighting).
    */
  def fillForwardDaily(
      daily: DataFrame,
      keyCol: String,
      dayCol: String,
      valueCol: String): DataFrame = {
    val obs = daily
      .filter(col(keyCol).isNotNull && col(dayCol).isNotNull)
      .select(col(keyCol).as("key"), col(dayCol).as("day"), col(valueCol).as("n"))
    val span = broadcast(obs.agg(min(col("day")).as("__lo"), max(col("day")).as("__hi")))
    val grid = obs.select(col("key")).distinct()
      .crossJoin(span)
      .select(col("key"), explode(sequence(col("__lo"), col("__hi"))).as("day"))
    val w = Window.partitionBy(col("key")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .join(obs, Seq("key", "day"), "left")
      .select(
        col("key"),
        col("day"),
        col("n"),
        last(col("n"), ignoreNulls = true).over(w).as("filled"))
  }

  /** Spearman rank correlation between TWO daily series on their
    * shared day grid — [[crossCorrDaily]]'s rank-robust sibling: a
    * single whale day that drags Pearson toward itself moves each
    * rank by at most one step here, so "do clicks and purchases move
    * together" survives outliers. Ties take AVERAGE ranks, kept
    * exact by working in DOUBLED ranks (2·avg = min_rank + max_rank
    * = 2·rank + (ties−1), an integer whenever the average is .5) —
    * every sum is an exact BIGINT and the one float step is the
    * classic Pearson denominator sqrt over exact integers (IEEE,
    * correctly rounded both engines). Rank windows run over the
    * JOINED DAY GRID (bounded — never the event stream). Overflow
    * bound: n·Σ(2r)² ≈ 4n⁴ < 2^63 — day grids to ~40k days (a
    * century is 36.5k); chunk the grid past that. Returns one row
    * (n_days, rho6); fewer than 2 shared days or a constant side
    * (zero rank variance) returns rho6 null — undefined, not 0.
    */
  def spearmanDaily(
      a: DataFrame,
      b: DataFrame,
      dayCol: String,
      valueCol: String): DataFrame = {
    def prep(df: DataFrame, v: String) = df
      .filter(col(dayCol).isNotNull && col(valueCol).isNotNull)
      .select(col(dayCol).as("__day"), col(valueCol).cast("long").as(v))
    val joined = prep(a, "va").join(prep(b, "vb"), Seq("__day"))
    // doubled average rank: 2*min_rank + (ties - 1), exact integer
    joined
      .select(
        col("__day"),
        (rank().over(Window.orderBy(col("va"))) * 2L +
          count(lit(1)).over(Window.partitionBy(col("va"))) - 1L).as("ra"),
        (rank().over(Window.orderBy(col("vb"))) * 2L +
          count(lit(1)).over(Window.partitionBy(col("vb"))) - 1L).as("rb"))
      .agg(
        count(lit(1)).as("n_days"),
        sum(col("ra")).as("__sa"),
        sum(col("rb")).as("__sb"),
        sum(col("ra") * col("ra")).as("__saa"),
        sum(col("rb") * col("rb")).as("__sbb"),
        sum(col("ra") * col("rb")).as("__sab"))
      .select(
        col("n_days"),
        when(
          col("n_days") >= 2L &&
            (col("n_days") * col("__saa") - col("__sa") * col("__sa")) > 0L &&
            (col("n_days") * col("__sbb") - col("__sb") * col("__sb")) > 0L,
          round(
            lit(1e6) *
              (col("n_days") * col("__sab") - col("__sa") * col("__sb")).cast("double") /
              (sqrt((col("n_days") * col("__saa") - col("__sa") * col("__sa")).cast("double")) *
                sqrt((col("n_days") * col("__sbb") - col("__sb") * col("__sb")).cast("double"))),
            0).cast("long"))
          .as("rho6"))
  }

  /** First-order Markov transition matrix over per-key ordered event
    * sequences: for every (from, to) state pair, the transition count
    * and row-normalized probability in exact ppm — the behavioral
    * fingerprint that catches scripted traffic (a bot's
    * view→view→view loop pins p(view|view) near 1e6 where organic
    * sessions spread mass) and feeds next-event priors. ORDER
    * CONTRACT: `orderCols` must be a TOTAL order per key (pass a
    * unique tiebreaker like the event id last) or lead() is
    * nondeterministic under ties — the outOfOrderAudit rule. One
    * window pass keyed on `keyCol` (each key's sequence never crosses
    * partitions), one hash aggregate over (from, to), row totals
    * re-aggregated from the PAIR table. A key's last event has no
    * successor and contributes nothing. Returns
    * (from_state, to_state, n, p6 = 1e6·n div Σ_to n).
    */
  def transitionMatrix(
      df: DataFrame,
      keyCol: Column,
      orderCols: Seq[Column],
      stateCol: Column): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(orderCols: _*)
    val pairs = df
      .filter(keyCol.isNotNull && stateCol.isNotNull)
      .select(stateCol.as("from_state"), lead(stateCol, 1).over(w).as("to_state"))
      .filter(col("to_state").isNotNull)
      .groupBy(col("from_state"), col("to_state"))
      .agg(count(lit(1)).as("n"))
    val rowTot = pairs.groupBy(col("from_state")).agg(sum(col("n")).as("__rt"))
    pairs
      .join(rowTot, Seq("from_state"))
      .select(
        col("from_state"),
        col("to_state"),
        col("n"),
        expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * n div __rt AS BIGINT)").as("p6"))
  }

  /** Time-weighted average (TWAP) per key — the honest mean of an
    * irregularly-sampled signal: each observation holds until the
    * next one, so its weight is the microseconds it was current, not
    * its row count (a plain AVG over-weights bursts — ten readings
    * in one noisy second would dominate an hour of calm). The
    * metrics/pricing convention everywhere observations arrive
    * event-driven.
    *
    * Exactness: Σ v_i·Δt_i div Σ Δt_i over the (ts, event_id) total
    * order — exact integer microsecond gaps times exact integer
    * values in DECIMAL(38,0), ONE truncating division per key; the
    * last observation carries no interval (nothing holds after it —
    * the standard left-closed convention) so keys need ≥ 2 events
    * and a zero total span (all events at one timestamp) returns
    * NULL twap (no time passed to average over; a 0 would read as a
    * price). Returns (key, n_obs, span_micros, twap).
    */
  def twap(
      df: DataFrame,
      keyCol: Column,
      tsCol: Column,
      eventIdCol: Column,
      valueCol: Column): DataFrame = {
    val w = Window.partitionBy(col("__k")).orderBy(col("__ts"), col("__eid"))
    df
      .filter(
        keyCol.isNotNull && tsCol.isNotNull && eventIdCol.isNotNull &&
          valueCol.isNotNull)
      .select(
        keyCol.as("__k"),
        tsCol.as("__tsc"),
        eventIdCol.cast("long").as("__eid"),
        valueCol.cast("long").as("__v"))
      .withColumn("__ts", expr("unix_micros(__tsc)"))
      .withColumn("__gap", lead(col("__ts"), 1).over(w) - col("__ts"))
      .groupBy(col("__k"))
      .agg(
        count(lit(1)).as("n_obs"),
        sum(coalesce(col("__gap"), lit(0L))).as("span_micros"),
        sum(
          when(
            col("__gap").isNotNull,
            expr("CAST(__v AS DECIMAL(38,0)) * CAST(__gap AS DECIMAL(38,0))"))
            .otherwise(expr("CAST(0 AS DECIMAL(38,0))"))).as("__wv"))
      .filter(col("n_obs") >= 2L)
      .select(
        col("__k").as("key"),
        col("n_obs"),
        col("span_micros"),
        expr(
          """CASE WHEN span_micros = 0 THEN CAST(NULL AS BIGINT)
            |ELSE CAST(__wv div CAST(span_micros AS DECIMAL(38,0)) AS BIGINT)
            |END""".stripMargin).as("twap"))
  }

  /** Per-key Markov negative log-likelihood — behavioral anomaly
    * scoring against the corpus's own transition model: fit the
    * GLOBAL first-order transition matrix ([[transitionMatrix]]
    * semantics, same (orderCols) total order), then score each key's
    * transition sequence by mean NLL under it. Keys replaying loops
    * the corpus finds likely score low; scripted or out-of-pattern
    * sequences score high — the model-based member of the bot
    * battery ([[fanoDaily]], [[iatEntropy]], raw transition shares).
    *
    * Exactness: the model is the exact micro matrix p6 = 1e6·n div
    * rowtotal; each transition's term rounds ONCE to micro-nats,
    * nll6 = round(1e6·ln(1e6 / max(1, p6))) — the 1-micro floor caps
    * a sub-ppm transition's surprise at ln(1e6) ≈ 13.8 nats and
    * keeps ln finite (documented; p6 = 0 only when a transition is
    * rarer than 1-in-1e6 of its row). mean_nll6 = exact sum div
    * count. The transitions frame is persisted — the model fit and
    * the scoring read ONE lead-window pass. Keys with no transition
    * (single event) are absent. Returns (key, n_transitions,
    * nll_sum6, mean_nll6).
    */
  def markovNll(
      df: DataFrame,
      keyCol: Column,
      orderCols: Seq[Column],
      stateCol: Column): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(orderCols: _*)
    val trans = df
      .filter(keyCol.isNotNull && stateCol.isNotNull)
      .select(
        keyCol.as("__k"),
        stateCol.as("from_state"),
        lead(stateCol, 1).over(w).as("to_state"))
      .filter(col("to_state").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cells = trans.groupBy(col("from_state"), col("to_state")).agg(count(lit(1)).as("n"))
    val rowTot = cells.groupBy(col("from_state")).agg(sum(col("n")).as("__rt"))
    val model = cells
      .join(rowTot, Seq("from_state"))
      .select(
        col("from_state"), col("to_state"),
        expr("greatest(CAST(1 AS BIGINT), CAST(CAST(1000000 AS DECIMAL(38,0)) * n div __rt AS BIGINT))").as("p6"))
      .withColumn(
        "nll6",
        round(log(lit(1e6) / col("p6").cast("double")) * lit(1e6), 0).cast("long"))
    trans
      .join(broadcast(model.select(col("from_state"), col("to_state"), col("nll6"))),
        Seq("from_state", "to_state"))
      .groupBy(col("__k"))
      // nll6 ≤ ~14e6 per transition — DECIMAL keeps the corpus sum
      // exact past the ~6e11-row BIGINT wrap; the published column
      // stays BIGINT (its own contract bound)
      .agg(
        count(lit(1)).as("n_transitions"),
        sum(col("nll6").cast("decimal(38,0)")).as("__nll"))
      .select(
        col("__k").as("key"),
        col("n_transitions"),
        col("__nll").cast("long").as("nll_sum6"),
        expr("CAST(__nll div n_transitions AS BIGINT)").as("mean_nll6"))
  }

  /** Hill tail-index estimator (Hill 1975) — HOW heavy is the heavy
    * tail: over the k largest positive values, H = (1/k)·Σ ln(x_i /
    * x_ref) with x_ref the (k+1)-th order statistic, and the Pareto
    * exponent alpha = 1/H. Gini (T82) says the mass is concentrated;
    * Hill says whether moments even EXIST (alpha ≤ 2 → infinite
    * variance — every mean-based statistic on that column is
    * sample-size noise). The column-triage gate before trusting
    * means/t-tests on revenue-class metrics.
    *
    * Exactness: the top-(k+1) shortlist is a TakeOrderedAndProject
    * under the (value desc, tie) total order — never a full sort;
    * each term rounds ONCE to micro-nats (ln of one double division
    * of exact integers — the entropy-family discipline), h6 = exact
    * sum div k, alpha6 = 1e12 div h6 (0 convention when h6 = 0: all
    * top-k equal — no tail slope exists). Non-positive values are
    * excluded (no log exists). Fails fast if fewer than k+1 positive
    * values remain. Returns one row (k, x_ref, h6, alpha6).
    */
  def hillTailIndex(df: DataFrame, valueCol: Column, k: Int): DataFrame = {
    require(k >= 2, "k must be >= 2")
    val spark = df.sparkSession
    import spark.implicits._
    val top = df
      .filter(valueCol.isNotNull && valueCol.cast("long") > 0L)
      .select(valueCol.cast("long").as("v"))
      .orderBy(col("v").desc)
      .limit(k + 1)
    val ranked = top
      .withColumn(
        "rn",
        row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("v").desc)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ref = broadcast(
      ranked
        .agg(count(lit(1)).as("__n"), min(col("v")).as("x_ref"))
        .filter(
          assert_true(
            col("__n") === (k + 1).toLong,
            concat(
              lit(s"hillTailIndex: need at least ${k + 1} positive values, got "),
              col("__n").cast("string"))).isNull))
    ranked
      .filter(col("rn") <= k)
      .crossJoin(ref)
      .withColumn(
        "__t6",
        round(
          log(col("v").cast("double") / col("x_ref").cast("double")) * lit(1e6),
          0).cast("long"))
      .groupBy(col("x_ref"))
      .agg(sum(col("__t6")).as("__s6"))
      .select(
        lit(k.toLong).as("k"),
        col("x_ref"),
        expr(s"CAST(__s6 div $k AS BIGINT)").as("h6"))
      .withColumn(
        "alpha6",
        expr(
          """CASE WHEN h6 = 0 THEN CAST(0 AS BIGINT)
            |ELSE CAST(1000000000000 div h6 AS BIGINT) END""".stripMargin))
  }

  /** Inter-arrival-time entropy per key — the metronome detector: a
    * human's gaps between events spread over many log₂ buckets (high
    * entropy); a rate-limited bot or replayed log pins one bucket
    * (entropy → 0). The timing-domain member of the bot battery next
    * to [[fanoDaily]] (volume burstiness) and [[transitionMatrix]]
    * (action loops).
    *
    * Gaps under the (ts, event_id) total order (the outOfOrderAudit
    * tie rule); bucket = floor(log₂(seconds + 1)) — log₂ on one
    * exact integer through identical IEEE doubles, sub-second gaps
    * land in bucket 0. Entropy in exact micro-nats: per-bucket terms
    * round ONCE (the t_source_kl discipline) then sum. Keys need ≥ 2
    * events to have a gap; single-event keys are absent. Returns
    * (key, n_gaps, n_buckets, entropy6).
    *
    * Scale shape: one lag window per key, one (key, bucket) hash
    * aggregate, one key re-aggregate with a key-total join — all on
    * the key's partitioning.
    */
  def iatEntropy(
      df: DataFrame,
      keyCol: Column,
      tsCol: Column,
      eventIdCol: Column): DataFrame = {
    val w = Window.partitionBy(col("__k")).orderBy(col("__ts"), col("__eid"))
    val gaps = df
      .filter(keyCol.isNotNull && tsCol.isNotNull && eventIdCol.isNotNull)
      .select(keyCol.as("__k"), tsCol.as("__ts"), eventIdCol.cast("long").as("__eid"))
      .withColumn("__prev", lag(col("__ts"), 1).over(w))
      .filter(col("__prev").isNotNull)
      .select(
        col("__k"),
        expr("CAST(floor(log2(CAST(unix_micros(__ts) - unix_micros(__prev) AS DOUBLE) " +
          "/ 1000000.0 + 1.0)) AS BIGINT)").as("bucket"))
    val cells = gaps.groupBy(col("__k"), col("bucket")).agg(count(lit(1)).as("c"))
    val totals = cells.groupBy(col("__k")).agg(sum(col("c")).as("n_gaps"))
    cells
      .join(totals, Seq("__k"))
      .withColumn(
        "__t6",
        round(
          (col("c").cast("double") / col("n_gaps").cast("double")) *
            log(col("n_gaps").cast("double") / col("c").cast("double")) * lit(1e6),
          0).cast("long"))
      .groupBy(col("__k"))
      .agg(
        max(col("n_gaps")).as("n_gaps"),
        count(lit(1)).as("n_buckets"),
        sum(col("__t6")).as("entropy6"))
      .select(col("__k").as("key"), col("n_gaps"), col("n_buckets"), col("entropy6"))
  }

  /** Multi-touch conversion attribution — the marketing-analytics
    * credit split: each conversion distributes one unit of credit
    * over the TOUCH events that preceded it within the lookback
    * window, per channel. Two standard models side by side:
    *
    *   linear:   every touch gets 1e6 div n
    *   U-shape:  n=1 → 1e6; n=2 → 500000 each;
    *             n≥3 → first 400000, last 400000,
    *                   middles 200000 div (n−2) each
    *
    * (the 40/20/40 position model; first/last under the (ts,
    * event_id) total order — the outOfOrderAudit tie rule). Credits
    * are exact integer micro-units with TRUNCATING division — a
    * conversion's credits sum to ≤ 1e6, never more, and the deficit
    * is the documented price of integer determinism (no float
    * shares, no remainder lottery). Conversions with NO touch in the
    * window surface as one "(unattributed)" row carrying their count
    * and full 1e6-per-conversion credit — silent disappearance would
    * overstate every channel's share.
    *
    * Scale shape: conversions × touches join per user key (bounded
    * by per-user activity; repartitions on the user hash), one
    * per-conversion window over the matched touches, one channel
    * hash-agg; the matched-touch table is persisted (credits + the
    * orphan anti-join read one join pass). Returns (channel,
    * n_touches, n_conversions, linear6, ushape6).
    */
  def attributionCredits(
      df: DataFrame,
      userCol: Column,
      tsCol: Column,
      eventIdCol: Column,
      isConversionCol: Column,
      isTouchCol: Column,
      channelCol: Column,
      lookbackDays: Int): DataFrame = {
    require(lookbackDays > 0, "lookbackDays must be positive")
    val ev = df
      .filter(userCol.isNotNull && tsCol.isNotNull && eventIdCol.isNotNull)
      .select(
        userCol.as("u"), tsCol.as("ts"), eventIdCol.cast("long").as("eid"),
        isConversionCol.cast("boolean").as("conv"),
        isTouchCol.cast("boolean").as("touch"),
        channelCol.as("ch"))
    val convs = ev.filter(col("conv"))
      .select(col("u"), col("ts").as("cts"), col("eid").as("ceid"))
    val touches = ev.filter(col("touch"))
      .select(col("u"), col("ts").as("tts"), col("eid").as("teid"), col("ch"))
    val matched = convs
      .join(touches, Seq("u"))
      .filter(
        col("tts") < col("cts") &&
          col("tts") >= col("cts") - expr(s"INTERVAL $lookbackDays DAYS"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val w = Window.partitionBy(col("u"), col("ceid"))
    val credits = matched
      .withColumn("rk", row_number().over(w.orderBy(col("tts"), col("teid"))))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("linear6", expr("CAST(1000000 div n AS BIGINT)"))
      .withColumn(
        "ushape6",
        when(col("n") === 1, 1000000L)
          .when(col("n") === 2, 500000L)
          .when(col("rk") === 1 || col("rk") === col("n"), 400000L)
          .otherwise(expr("CAST(200000 div (n - 2) AS BIGINT)")))
    val perChannel = credits
      .groupBy(col("ch").as("channel"))
      .agg(
        count(lit(1)).as("n_touches"),
        count_distinct(col("u"), col("ceid")).as("n_conversions"),
        sum(col("linear6")).as("linear6"),
        sum(col("ushape6")).as("ushape6"))
    val orphans = convs
      .join(matched.select(col("u"), col("ceid")).distinct(), Seq("u", "ceid"), "left_anti")
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > 0L)
      .select(
        lit("(unattributed)").as("channel"),
        lit(0L).as("n_touches"),
        col("__n").as("n_conversions"),
        (col("__n") * 1000000L).as("linear6"),
        (col("__n") * 1000000L).as("ushape6"))
    perChannel.unionByName(orphans)
  }

  /** Forecast-accuracy panel for the seasonal-naive baseline
    * (Hyndman & Koehler 2006's MASE discipline): split the daily
    * series into train / last-`holdout`-days eval, forecast each
    * eval day as the value `season` days earlier, and score WAPE,
    * sMAPE, and MASE — MASE's denominator is the TRAIN-side mean
    * absolute seasonal-naive error, so a score < 1e6 micro means
    * "beat the naive forecaster on its own scale", comparable across
    * series. Any model's forecast can be judged against this panel;
    * shipping the baseline's own score calibrates what the series
    * allows.
    *
    * Exactness: values are exact integer units (cents/counts, ≥ 0 by
    * contract — division parity needs nonnegative operands); sMAPE
    * is the mean of per-day (2e6·|e|) div (y + ŷ) truncating terms
    * (0 when both sides are 0), WAPE/MASE one staged DECIMAL(38,0)
    * division each. Day pairs come from an equi-join of the daily
    * grid with itself shifted by `season` — days missing their
    * seasonal parent drop on BOTH sides (deterministic in both
    * engines); gaps in the grid are the caller's to fill
    * ([[gapFill]]) if calendar-complete eval is wanted. One
    * grid-bounded pass after the daily collapse; the eval window is
    * anchored to the series' own max day. Returns one row (n_train,
    * n_eval, sum_abs_err, sum_abs_y, n_over, n_under, wape6, smape6,
    * mase6).
    */
  def seasonalNaiveEval(
      daily: DataFrame,
      dayCol: String,
      valCol: String,
      season: Int,
      holdout: Int): DataFrame = {
    require(season >= 1 && season <= 366, s"season must be in [1, 366], got $season")
    require(holdout >= 1, s"holdout must be >= 1, got $holdout")
    val d = daily.select(
      col(dayCol).cast("date").as("day"),
      col(valCol).cast("long").as("y"))
      .filter(col("day").isNotNull && col("y").isNotNull)
    val shifted = d.select(
      date_add(col("day"), season).as("day"),
      col("y").as("yhat"))
    val mx = broadcast(d.agg(max(col("day")).as("__mx")))
    val e = col("y") - col("yhat")
    val isEval = datediff(col("__mx"), col("day")) < holdout
    val smapeTerm =
      when(col("y") + col("yhat") === 0L, 0L)
        .otherwise(expr("CAST((CAST(2000000 AS DECIMAL(38,0)) * abs(y - yhat)) div (y + yhat) AS BIGINT)"))
    d.join(shifted, Seq("day"))
      .crossJoin(mx)
      .agg(
        sum(when(!isEval, 1L).otherwise(0L)).as("n_train"),
        sum(when(!isEval, abs(e)).otherwise(0L)).as("__train_sae"),
        sum(when(isEval, 1L).otherwise(0L)).as("n_eval"),
        sum(when(isEval, abs(e)).otherwise(0L)).as("sum_abs_err"),
        sum(when(isEval, abs(col("y"))).otherwise(0L)).as("sum_abs_y"),
        sum(when(isEval && e > 0L, 1L).otherwise(0L)).as("n_over"),
        sum(when(isEval && e < 0L, 1L).otherwise(0L)).as("n_under"),
        sum(when(isEval, smapeTerm).otherwise(0L)).as("__smape_sum"))
      .select(
        col("n_train"), col("n_eval"), col("sum_abs_err"), col("sum_abs_y"),
        col("n_over"), col("n_under"),
        expr(
          """CASE WHEN sum_abs_y = 0 THEN CAST(0 AS BIGINT)
            |ELSE CAST((CAST(1000000 AS DECIMAL(38,0)) * sum_abs_err)
            |          div sum_abs_y AS BIGINT) END""".stripMargin).as("wape6"),
        expr(
          """CASE WHEN n_eval = 0 THEN CAST(0 AS BIGINT)
            |ELSE CAST(__smape_sum div n_eval AS BIGINT) END""".stripMargin)
          .as("smape6"),
        expr(
          """CASE WHEN n_eval = 0 OR __train_sae = 0 THEN CAST(0 AS BIGINT)
            |ELSE CAST((CAST(1000000 AS DECIMAL(38,0)) * sum_abs_err * n_train)
            |          div (CAST(n_eval AS DECIMAL(38,0)) * __train_sae)
            |     AS BIGINT) END""".stripMargin).as("mase6"))
  }
}
