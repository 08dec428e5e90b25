package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Generic relational building blocks used across SURVEY §2:
  * first-wins dedup (D1-D6), top-k (W1), running-length cap (W5),
  * latest-per-key (W2/A1), change detection (J8/I1).
  *
  * All are shuffle-conscious: dedup/latest use a single window shuffle
  * on the key; topK plans as `TakeOrderedAndProject` (no full sort).
  */
object Relational {

  /** D1-D6 — first-wins dedup: keep the first row per key set, "first"
    * defined by `order` (Python seen-set dedup preserves encounter
    * order — reference `scraper_v2.py:1045-1086`; `dropDuplicates`
    * alone keeps an arbitrary row, so order is made explicit).
    */
  def dedupeFirstWins(df: DataFrame, keys: Seq[Column], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** W1 — filter-before-top-k. Catalyst plans orderBy+limit as
    * TakeOrderedAndProject: per-partition heap then driver merge — no
    * global sort shuffle, unlike the reference's over-fetch heuristic
    * (`rag_search.py:50-65`).
    */
  def topK(df: DataFrame, predicate: Column, order: Seq[Column], k: Int): DataFrame =
    df.filter(predicate).orderBy(order: _*).limit(k)

  /** W2 — latest row per key by a timestamp-ish ordering (max_by with
    * deterministic tie-break), reference `structured_extraction_v2.py:1992-2000`.
    */
  def latestPerKey(df: DataFrame, keys: Seq[Column], order: Seq[Column]): DataFrame =
    dedupeFirstWins(df, keys, order.map(_.desc))

  /** W5 — running-length cutoff: keep rows while the running sum of
    * `weight` (ordered by `order` within `partition`) stays ≤ `cap`
    * (reference `search_all_sources`,
    * `structured_extraction_v2.py:1277-1323`).
    */
  def runningCap(
      df: DataFrame,
      partition: Seq[Column],
      order: Seq[Column],
      weight: Column,
      cap: Long): DataFrame = {
    val w = Window
      .partitionBy(partition: _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__run", sum(weight).over(w))
      .filter(col("__run") <= cap)
      .drop("__run")
  }

  /** As-of join (Spark has no native one): for each left row attach
    * the value of the LATEST right row with `ts_right <= ts_left` on
    * the same key. Composed from existing ops per the
    * compose-before-custom-plan rule: tag + union + one ignore-nulls
    * `last_value` window — a single shuffle on the key, no range
    * explosion, no per-left-row subquery. This is the 100 TB-safe
    * layout (a join + filter + rank formulation shuffles the full
    * left×right candidate product instead).
    *
    * `left`/`right` must share `keyCol` and `tsCol`; the right frame's
    * `valueCols` are attached to each left row (null when no right row
    * precedes it). Ties on (key, ts) resolve right-before-left
    * (inclusive as-of), then by `tieBreak` among right rows.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCols: Seq[String],
      tieBreak: Column): DataFrame = {
    // Right rows carry ALL valueCols in ONE struct: the struct itself
    // is non-null for every right row (even when its fields are null),
    // so `last(..., ignoreNulls)` skips exactly the interleaved LEFT
    // rows — a right row whose value is genuinely null still wins as
    // the latest row, and every attached column comes from the SAME
    // right row.
    val lTagged = left
      .withColumn("__is_left", lit(1))
      .withColumn("__tie", lit(null).cast("long"))
      .withColumn(
        "__vals",
        lit(null).cast(
          org.apache.spark.sql.types.StructType(
            valueCols.map(v => right.schema(v).copy(name = v)))))
    val rTagged = right
      .withColumn("__is_left", lit(0))
      .withColumn("__tie", tieBreak.cast("long"))
      .withColumn("__vals", struct(valueCols.map(col): _*))
      .select(Seq(keyCol, tsCol, "__is_left", "__tie", "__vals").map(col): _*)
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)
    val w = Window
      .partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__is_left"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withAsof = unioned
      .withColumn("__asof", last(col("__vals"), ignoreNulls = true).over(w))
    valueCols
      .foldLeft(withAsof) { (df, v) =>
        df.withColumn(s"asof_$v", col("__asof").getField(v))
      }
      .filter(col("__is_left") === 1)
      .drop("__is_left", "__tie", "__vals", "__asof")
  }

  /** Nearest-event join: for each left row, the right row (same key)
    * minimizing |Δts| in EITHER direction — the bidirectional sibling
    * of [[asofJoin]] (sensor alignment, purchase↔click attribution,
    * log correlation). Ties on distance go to the BACKWARD (earlier)
    * match; among equal-ts right rows the backward pick takes the
    * greatest `tieBreak` and the forward pick the smallest (each
    * direction's frame-edge row). `tsCol` must be NUMERIC — cast
    * timestamps to unix micros first (the w_ewma caller rule) so the
    * distance comparison is exact integer arithmetic.
    *
    * Same union + key-partitioned window shape as [[asofJoin]] (one
    * backward and one forward frame over a single sort): one shuffle
    * on the key, no per-row range probe, whale keys spill in the
    * window sort instead of exploding a join.
    *
    * Output: left columns + `nearest_<v>` per valueCol + `nearest_dt`
    * (right ts − left ts, signed; null when the key has no right
    * rows).
    */
  def nearestJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCols: Seq[String],
      tieBreak: Column): DataFrame = {
    val valFields =
      org.apache.spark.sql.types.StructField("__rts", right.schema(tsCol).dataType) +:
        valueCols.map(v => right.schema(v).copy(name = v))
    val lTagged = left
      .withColumn("__is_left", lit(1))
      .withColumn("__tie", lit(null).cast("long"))
      .withColumn("__vals", lit(null).cast(org.apache.spark.sql.types.StructType(valFields)))
    val rTagged = right
      .withColumn("__is_left", lit(0))
      .withColumn("__tie", tieBreak.cast("long"))
      .withColumn("__vals", struct((col(tsCol).as("__rts") +: valueCols.map(col)): _*))
      .select(Seq(keyCol, tsCol, "__is_left", "__tie", "__vals").map(col): _*)
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)
    val ord = Seq(col(tsCol), col("__is_left"), col("__tie"))
    val wb = Window
      .partitionBy(col(keyCol))
      .orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window
      .partitionBy(col(keyCol))
      .orderBy(ord: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val withBF = unioned
      .withColumn("__b", last(col("__vals"), ignoreNulls = true).over(wb))
      .withColumn("__f", first(col("__vals"), ignoreNulls = true).over(wf))
    val db = col(tsCol) - col("__b").getField("__rts")
    val df_ = col("__f").getField("__rts") - col(tsCol)
    val nearest = when(col("__b").isNull, col("__f"))
      .when(col("__f").isNull, col("__b"))
      .when(db <= df_, col("__b"))
      .otherwise(col("__f"))
    valueCols
      .foldLeft(withBF.withColumn("__n", nearest)) { (df0, v) =>
        df0.withColumn(s"nearest_$v", col("__n").getField(v))
      }
      .withColumn("nearest_dt", col("__n").getField("__rts") - col(tsCol))
      .filter(col("__is_left") === 1)
      .drop("__is_left", "__tie", "__vals", "__b", "__f", "__n")
  }

  /** Range join (point-in-interval) via grid bucketing: each right
    * interval [start, end] is exploded over the fixed-size grid cells
    * it covers, the join is an equi-join on the cell, and the exact
    * containment predicate filters inside the bucket. Candidate volume
    * is O(intervals × avg_cells + points), never the cross product —
    * the standard scale layout for interval joins.
    */
  def rangeJoinBucketed(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      cellSize: Double): DataFrame = {
    val cellOfPoint = floor(col(pointCol) / cellSize).cast("long")
    val cells = intervals.withColumn(
      "__cell",
      explode(
        sequence(
          floor(col(startCol) / cellSize).cast("long"),
          floor(col(endCol) / cellSize).cast("long"))))
    points
      .withColumn("__cell", cellOfPoint)
      .join(cells, Seq("__cell"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__cell")
  }

  /** Ordered event-funnel conversion (product-analytics sequence
    * match): for each user, the earliest completion time of every
    * funnel stage, where stage i+1 must occur strictly AFTER stage i's
    * completion and within `maxGapUs`. Returns (user, t1..tn) epoch-µs
    * longs with nulls from the first missed stage onward (a null t_i
    * nulls the downstream filter, so later stages cannot resurrect —
    * the monotone-prefix funnel invariant).
    *
    * Shape: one min-agg per stage over that stage's events (each
    * frame ≤ |users| rows) chained by equi-joins on the user key —
    * every join reuses the same hash partitioning, and the event
    * stream is scanned per stage with the type filter pushed to the
    * scan. No window over the raw event stream, no per-user
    * sequence materialization.
    */
  def orderedFunnel(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      stages: Seq[String],
      maxGapUs: Long): DataFrame = {
    require(stages.nonEmpty, "need at least one funnel stage")
    require(maxGapUs > 0, "maxGapUs must be positive")
    val base = events.select(
      col(userCol).as("user"),
      unix_micros(col(tsCol)).as("__us"),
      col(typeCol).as("__tp"))
    val first = base
      .filter(col("__tp") === stages.head)
      .groupBy(col("user"))
      .agg(min(col("__us")).as("t1"))
    stages.drop(1).zipWithIndex.foldLeft(first) { case (prev, (tp, i)) =>
      val nCol = s"t${i + 2}"
      val nxt = base
        .filter(col("__tp") === tp)
        .join(prev.select(col("user"), col(s"t${i + 1}").as("__pt")), "user")
        .filter(col("__us") > col("__pt") && col("__us") <= col("__pt") + maxGapUs)
        .groupBy(col("user"))
        .agg(min(col("__us")).as(nCol))
      prev.join(nxt, Seq("user"), "left")
    }
  }

  /** Interval×interval overlap join ([[rangeJoinBucketed]] handles
    * point-in-interval; this pairs two INTERVAL sets): rows whose
    * [start, end] ranges intersect (closed ends — an exact touch
    * counts), equi-keyed on `keys`. Column names across the two sides
    * must be disjoint.
    *
    * Scale shape: both sides explode into fixed-size time cells and
    * equi-join on (keys, cell) — a theta-join would nest-loop the full
    * key group. A pair overlapping across several shared cells would
    * duplicate, so each pair is kept ONLY in the cell containing
    * max(startL, startR): that point lies in both intervals (so the
    * cell is matched), making the dedup a per-row predicate instead of
    * a dropDuplicates shuffle over the pair stream. Cells per row =
    * interval_length/cellSize — size `cellSize` to the p99 interval.
    */
  def intervalOverlapJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      startL: String,
      endL: String,
      startR: String,
      endR: String,
      cellSize: Double): DataFrame = {
    require(cellSize > 0, "cellSize must be positive")
    def cells(df: DataFrame, s: String, e: String) = df.withColumn(
      "__cell",
      explode(
        sequence(
          floor(col(s) / cellSize).cast("long"),
          floor(col(e) / cellSize).cast("long"))))
    cells(left, startL, endL)
      .join(cells(right, startR, endR), keys :+ "__cell")
      .filter(col(startL) <= col(endR) && col(startR) <= col(endL))
      .filter(
        floor(greatest(col(startL), col(startR)) / cellSize).cast("long") === col("__cell"))
      .drop("__cell")
  }

  /** Skew-resistant aggregation: two-phase salted combine. Phase 1
    * aggregates on (keys, salt) — spreading a hot key over
    * `saltBuckets` reducers — phase 2 merges the partials. Results
    * are identical to a direct groupBy for algebraic aggregates
    * (sum/count here). AQE handles moderate skew; this is the explicit
    * tool for the pathological hot-key case at 100 TB.
    */
  def saltedSumCount(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      saltBuckets: Int): DataFrame = {
    val salted = df.withColumn(
      "__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val partial = salted
      .groupBy(keys.map(col) :+ col("__salt"): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"), sum(col("__pcnt")).as("n_rows"))
  }

  /** Skew-resistant equi-join ([[saltedSumCount]]'s pattern for
    * JOINS): the big side salts on a deterministic per-row expression,
    * the small side replicates into every salt bucket, and the join
    * runs on (key, salt) — a hot key's rows spread over `saltBuckets`
    * reducers instead of funnelling one. Results are identical to the
    * plain equi-join (every big row still meets every matching small
    * row exactly once, in its own bucket). AQE's skew splitting covers
    * moderate skew; this is the explicit tool for the pathological
    * hot-key join at 100 TB. Cost: the small side ships
    * saltBuckets× — size the bucket count to the skew, not beyond.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      saltBy: Column,
      saltBuckets: Int): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    // null-safe: hash32(null) is null and a null salt would silently
    // drop the row from the equi-join — bucket null salts to 0 so the
    // plain-join equivalence holds for nullable salt expressions too
    val salted = big.withColumn(
      "__salt",
      pmod(coalesce(graft.operators.Sampling.hash32(saltBy), lit(0L)), lit(saltBuckets.toLong)))
    val replicated = small.withColumn(
      "__salt",
      explode(sequence(lit(0L), lit(saltBuckets.toLong - 1L))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Apply a CDC changelog to a base snapshot (the engine-side half
    * of I3's upsert contract, extended with DELETES): changes carry
    * (keys…, op ∈ upsert|delete, seq); the LATEST change per key wins
    * (ties broken deterministically by requiring a total `seq`), a
    * winning delete removes the key, and untouched base rows pass
    * through. One shuffle on the key (the union sorts within groups
    * via max_by, no window). Base rows rank below every change
    * (seq = Long.MinValue).
    *
    * Malformed-op contract: ONLY the exact string "delete" deletes;
    * any other op — including null or a typo — applies as an upsert
    * (null-safe filter, so a null op cannot silently delete). A
    * change with a null (or long-uncastable) `seq` is IGNORED — it
    * has no position in the change order, so it can neither win nor
    * delete; dropped explicitly before the union rather than left to
    * max_by's null-skipping. Feeds needing strict validation should
    * reject malformed rows upstream.
    *
    * Sentinel collision: base rows rank at seq = Long.MinValue, so a
    * change whose seq casts to exactly Long.MinValue would TIE the
    * base row — and with per-column max_by a tie lets each aggregate
    * pick fields from a different tied row (a frankenrow). Such
    * changes are excluded with the null-seq rows: Long.MinValue is
    * reserved by this operator, not a usable change position. Ties
    * WITHIN the changelog remain the caller's documented total-`seq`
    * contract.
    */
  def applyChanges(
      base: DataFrame,
      changes: DataFrame,
      keys: Seq[String],
      valueCols: Seq[String],
      opCol: String,
      seqCol: String): DataFrame = {
    val cols = keys ++ valueCols
    val b = base
      .select(cols.map(col): _*)
      .withColumn("__op", lit("upsert"))
      .withColumn("__seq", lit(Long.MinValue))
    val c = changes
      .select(
        (cols.map(col) :+ col(opCol).as("__op") :+ col(seqCol).cast("long").as("__seq")): _*)
      .filter(col("__seq").isNotNull && col("__seq") =!= lit(Long.MinValue))
    // PER-COLUMN max_by on the shared total seq (every max_by picks
    // the same winning row) instead of one max_by over a struct: a
    // struct aggregation buffer is immutable and degrades the whole
    // agg to SortAggregate; with primitive value columns these stay
    // HashAggregate (the encoded-argmax discipline, audit-pinned).
    // The delete flag aggregates as a null-safe boolean per the
    // malformed-op contract.
    val winners =
      max_by(col("__op") <=> "delete", col("__seq")).as("__wdel") +:
        valueCols.map(v => max_by(col(v), col("__seq")).as(v))
    b.unionByName(c)
      .groupBy(keys.map(col): _*)
      .agg(winners.head, winners.tail: _*)
      .filter(!col("__wdel"))
      .select(cols.map(col): _*)
  }

  /** J8/I1 — content-hash change detection between two snapshots of
    * the same keyed table: emits (keys..., status) with status ∈
    * {added, removed, changed} (unchanged rows dropped). Reference
    * `dags/orbit_daily_update_dag.py:126-201`.
    *
    * At scale: this is one full-outer shuffle join on the key; with
    * date-partitioned input both sides prune to one partition each.
    */
  def changeDetection(
      old: DataFrame,
      fresh: DataFrame,
      keys: Seq[String],
      hashCol: String): DataFrame = {
    // presence markers, NOT hash nullability, decide added/removed —
    // a nullable hash column (null content) must not fake a missing
    // row; the change test is null-safe (<=>) so null↔value
    // transitions count as changed, not silently "same"
    val o = old.select(
      keys.map(col) ++ Seq(col(hashCol).as("__old_hash"), lit(true).as("__in_old")): _*)
    val n = fresh.select(
      keys.map(col) ++ Seq(col(hashCol).as("__new_hash"), lit(true).as("__in_new")): _*)
    o.join(n, keys, "full_outer")
      .withColumn(
        "status",
        when(col("__in_old").isNull, lit("added"))
          .when(col("__in_new").isNull, lit("removed"))
          .when(!(col("__old_hash") <=> col("__new_hash")), lit("changed"))
          .otherwise(lit("same")))
      .filter(col("status") =!= "same")
      .drop("__old_hash", "__new_hash", "__in_old", "__in_new")
  }

  /** Algebraic materialized-view maintenance: merge a delta batch's
    * aggregate into a base aggregate table without recomputing from
    * raw history — `merged(k) = base(k) ⊎ delta(k)` for sum-mergeable
    * aggregates (counts, sums; avg = sum/count at read time). The
    * lakehouse incremental-refresh primitive: the raw history is never
    * re-scanned, only the base AGGREGATE (already |keys|-bounded) and
    * the new batch.
    *
    * `aggCols` must be sum-mergeable columns present in both frames;
    * absent keys on either side contribute typed zeros. Null-key
    * contract: standard SQL join semantics — a null key never matches,
    * so a null-key row on each side survives as its OWN output row
    * (zeros from the other side); pre-coalesce keys if null should be
    * a mergeable group. Scale shape:
    * a full-outer join on the key — UNHINTED, the dd_excise lesson:
    * a delta batch's size is data-dependent (a backfill delta can
    * rival the base), so AQE picks broadcast only when the delta
    * actually fits; pre-bucketed base tables keep the merge and the
    * output write co-partitioned either way.
    */
  def mergeAggDelta(
      base: DataFrame,
      deltaAgg: DataFrame,
      keys: Seq[String],
      aggCols: Seq[String]): DataFrame = {
    val d = aggCols.foldLeft(deltaAgg) { (df, c) =>
      df.withColumnRenamed(c, s"__d_$c")
    }
    val joined = base.join(d, keys, "full_outer")
    aggCols
      .foldLeft(joined) { (df, c) =>
        df.withColumn(
          c,
          coalesce(col(c), lit(0)) + coalesce(col(s"__d_$c"), lit(0)))
      }
      .drop(aggCols.map(c => s"__d_$c"): _*)
  }

  /** SCD type-2 history build: turn a changelog (key…, seq, tracked
    * values…) into versioned rows with validity intervals —
    * `valid_from` = the version's seq, `valid_to` = the NEXT
    * version's seq (null = still current), consecutive changes whose
    * tracked values are unchanged collapse into one version
    * (change-only SCD2, null-safe comparison). The warehouse-side
    * complement of [[applyChanges]]: applyChanges materializes the
    * latest snapshot; this keeps the full history queryable by
    * as-of seq.
    *
    * Contract: `seq` must be unique within a key (the applyChanges
    * totality contract) — with ties the run-collapse pick is
    * window-order-dependent.
    *
    * Scale shape: two per-key windows (lag to collapse runs, lead to
    * close intervals) over keys that are numerous and individually
    * bounded — the sessionize posture; no global window, no driver
    * state.
    */
  def scd2History(
      changes: DataFrame,
      keyCols: Seq[String],
      seqCol: Column,
      valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "scd2History needs at least one tracked column")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(seqCol)
    val sameAsPrev = valueCols
      .map(c => col(c) <=> lag(col(c), 1).over(w))
      .reduce(_ && _)
    // lag(seq) is null exactly on a key's first change (seq itself is
    // non-null by the totality contract) — guards the all-null first
    // version from being mistaken for a run continuation
    val isRunContinuation = sameAsPrev && lag(seqCol, 1).over(w).isNotNull
    changes
      .withColumn("__dup", isRunContinuation)
      .filter(!col("__dup"))
      .drop("__dup")
      .withColumn("valid_from", seqCol)
      .withColumn("valid_to", lead(seqCol, 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Dense global rank (1-based) by a TOTAL order, without the
    * single-task `row_number().over(Window.orderBy(...))` funnel: the
    * frame is range-sort-partitioned (distributed sort), then
    * `zipWithIndex` assigns global positions with one lightweight
    * per-partition count job — every partition ranks its own slice.
    * This is the sanctioned RDD use (genuine per-partition imperative
    * logic); result is deterministic because the order is total, so
    * ranks are independent of partition boundaries.
    */
  /** Exact equi-depth histogram boundaries: bucket i's upper bound is
    * the value at global rank max(1, (i·n) div k) under the
    * (value, tie) total order, i = 1..k — the table-stats artifact
    * behind join planning, skew budgeting and bucketing choices,
    * computed exactly instead of via approx_percentile (which no
    * second engine reproduces). Ranks come from [[globalRank]]'s
    * range-partitioned sort (never a driver sort); the rank probe is
    * a k-row broadcast join; n is a one-scalar driver bootstrap
    * (documented constant class). Returns (bucket, ub).
    */
  def equiDepthBoundaries(df: DataFrame, value: Column, tie: Column, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val in = df.select(value.as("__v"), tie.as("__t"))
    val ranked = globalRank(in, Seq(col("__v"), col("__t")), "__rank")
    val n = in.count()
    val spark = df.sparkSession
    import spark.implicits._
    val targets = (1 to k)
      .map(i => (i.toLong, math.max(1L, i.toLong * n / k)))
      .toDF("bucket", "__rank")
    ranked
      .join(broadcast(targets), "__rank")
      .select(col("bucket"), col("__v").as("ub"))
  }

  def globalRank(df: DataFrame, order: Seq[Column], rankCol: String): DataFrame = {
    val sorted = df.orderBy(order: _*)
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+
        org.apache.spark.sql.types.StructField(
          rankCol, org.apache.spark.sql.types.LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Exclusive distributed prefix SUM of a BIGINT column under a
    * TOTAL order — the scale-safe replacement for
    * `sum(c).over(Window.orderBy(...).rowsBetween(unboundedPreceding,
    * -1))`, which Spark executes as ONE task holding the entire
    * table. The [[globalRank]] chassis generalized from counting to
    * summing: the frame is range-sort-partitioned (a distributed
    * sort), pass 1 folds each partition to its total (numPartitions
    * scalars to the driver — the same bounded constant class as
    * zipWithIndex's count job), a scanLeft turns totals into
    * partition offsets, and pass 2 emits each row's offset plus the
    * running in-partition sum. Deterministic because the order is
    * total (prefix sums are independent of where partition
    * boundaries fall); exact because everything is Long addition.
    * `outCol` EXCLUDES the current row (sum over strictly preceding
    * rows; the first row gets 0); null summands count as 0.
    */
  def globalCumSum(
      df: DataFrame,
      order: Seq[Column],
      sumCol: String,
      outCol: String): DataFrame = {
    val sorted = df.orderBy(order: _*)
    val idx = sorted.schema.fieldIndex(sumCol)
    val rdd = sorted.rdd
    val partTotals = rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var s = 0L
        it.foreach(r => if (!r.isNullAt(idx)) s += r.getLong(idx))
        Iterator((pid, s))
      }
      .collect()
      .sortBy(_._1)
      .map(_._2)
    val offsets = partTotals.scanLeft(0L)(_ + _)
    val bc = df.sparkSession.sparkContext.broadcast(offsets)
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+
        org.apache.spark.sql.types.StructField(
          outCol, org.apache.spark.sql.types.LongType, nullable = false))
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      var run = bc.value(pid)
      it.map { r =>
        val o = org.apache.spark.sql.Row.fromSeq(r.toSeq :+ run)
        if (!r.isNullAt(idx)) run += r.getLong(idx)
        o
      }
    }
    df.sparkSession.createDataFrame(out, schema)
  }

  /** Exclusive distributed prefix MAX of an orderable column under a
    * TOTAL order — the running-best sibling of [[globalCumSum]] (same
    * two-pass range-partitioned chassis, max instead of +). `outCol`
    * is the maximum over STRICTLY preceding rows (null until the
    * first non-null predecessor — callers treat null as "no prior
    * best", the skyline convention). Values compare via their
    * external Java ordering (all Spark orderable external types are
    * `Comparable`); nulls never become the running best.
    */
  def globalRunningMax(
      df: DataFrame,
      order: Seq[Column],
      maxCol: String,
      outCol: String): DataFrame = {
    val sorted = df.orderBy(order: _*)
    val idx = sorted.schema.fieldIndex(maxCol)
    def gt(a: AnyRef, b: AnyRef): Boolean =
      a.asInstanceOf[Comparable[AnyRef]].compareTo(b) > 0
    val rdd = sorted.rdd
    val partMax = rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var best: AnyRef = null
        it.foreach { r =>
          val v = r.getAs[AnyRef](idx)
          if (v != null && (best == null || gt(v, best))) best = v
        }
        Iterator((pid, best))
      }
      .collect()
      .sortBy(_._1)
      .map(_._2)
    // offsets(p) = max over all partitions strictly before p
    val offsets = partMax.scanLeft(null: AnyRef) { (acc, v) =>
      if (v == null) acc else if (acc == null || gt(v, acc)) v else acc
    }
    val bc = df.sparkSession.sparkContext.broadcast(offsets)
    val field = sorted.schema(maxCol)
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+
        org.apache.spark.sql.types.StructField(
          outCol, field.dataType, nullable = true))
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      var best: AnyRef = bc.value(pid)
      it.map { r =>
        val o = org.apache.spark.sql.Row.fromSeq(r.toSeq :+ best)
        val v = r.getAs[AnyRef](idx)
        if (v != null && (best == null || gt(v, best))) best = v
        o
      }
    }
    df.sparkSession.createDataFrame(out, schema)
  }

  /** Gaps-and-islands over a per-key day series: collapse each key's
    * active days into contiguous runs (day − row_number is constant
    * within a run — the classic islands key, exact integer
    * arithmetic on epoch days) and report (key, island start/end,
    * n_days, gap_before_days). The ingest-backfill planner: a
    * source's islands ARE its coverage, the gaps between them are
    * the backfill worklist ([[gapFill]] fills values inside a range;
    * this finds the missing ranges). Window partitions by key over
    * the DAILY table — bounded by the calendar, never the raw
    * stream.
    */
  def dayIslands(daily: DataFrame, keyCol: String, dayCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(dayCol))
    val runs = daily
      .select(col(keyCol), col(dayCol))
      .filter(col(dayCol).isNotNull) // null day has no island; and a
      // null in the run ORDER BY would sort engine-dependently
      .distinct()
      .withColumn("__d", datediff(col(dayCol), lit("1970-01-01").cast("date")).cast("long"))
      .withColumn("__grp", col("__d") - row_number().over(w))
    val islands = runs
      .groupBy(col(keyCol), col("__grp"))
      .agg(
        min(col("__d")).as("__start"),
        max(col("__d")).as("__end"),
        count(lit(1)).as("n_days"))
    val wi = Window.partitionBy(col(keyCol)).orderBy(col("__start"))
    islands
      .withColumn("__prev_end", lag(col("__end"), 1).over(wi))
      .select(
        col(keyCol),
        date_add(lit("1970-01-01").cast("date"), col("__start").cast("int")).as("island_start"),
        date_add(lit("1970-01-01").cast("date"), col("__end").cast("int")).as("island_end"),
        col("n_days"),
        coalesce(col("__start") - col("__prev_end") - 1L, lit(0L)).as("gap_before_days"))
  }

  /** Field-level survivorship for ER golden records (the upgrade of
    * the min-id whole-record rule): per matched cluster, each field
    * survives by its own rule —
    *   - `longestCols`: the longest non-null value ("most complete",
    *     the standard rule for names/addresses),
    *   - `recentCols`: the non-null value from the highest `seqCol`
    *     ("most recent wins", for volatile contact fields),
    *   - `maxCols`: the numeric max.
    * All ties resolve to the smallest `idCol` — and every argmax is
    * two PRIMITIVE hash-aggregates plus an equi-join back by id
    * (max(len)/max(seq) → min(id) among hitters → value by id): a
    * min/max whose buffer is a STRING plans as SortAggregate (the
    * er_golden lesson), so field values never enter an aggregate.
    * A field null across the whole cluster survives as null.
    *
    * Input must carry `idCol`, `clusterCol`, `seqCol` and the rule
    * columns; returns one row per cluster: (cluster, n_members,
    * fields…). Scale shape: per field a cluster-keyed hash-agg over
    * the member table + id-keyed joins — nothing quadratic, nothing
    * sorted, cluster sizes never materialize a window.
    */
  def goldenRecord(
      members: DataFrame,
      idCol: String,
      clusterCol: String,
      seqCol: String,
      longestCols: Seq[String],
      recentCols: Seq[String],
      maxCols: Seq[String]): DataFrame = {
    require(
      (longestCols ++ recentCols ++ maxCols).nonEmpty,
      "goldenRecord needs at least one field rule")
    val cl = col(clusterCol)
    var out = members.groupBy(cl).agg(count(lit(1)).as("n_members"))
    longestCols.foreach { f =>
      val ml = members
        .filter(col(f).isNotNull)
        .groupBy(cl)
        .agg(max(length(col(f))).as("__ml"))
      val pid = members
        .join(ml, Seq(clusterCol))
        .filter(length(col(f)) === col("__ml"))
        .groupBy(cl)
        .agg(min(col(idCol)).as("__pid"))
      val v = pid.join(
        members.select(col(idCol).as("__pid"), col(f)),
        Seq("__pid"))
        .select(cl, col(f))
      out = out.join(v, Seq(clusterCol), "left")
    }
    recentCols.foreach { f =>
      val ms = members
        .filter(col(f).isNotNull)
        .groupBy(cl)
        .agg(max(col(seqCol)).as("__ms"))
      val pid = members
        .filter(col(f).isNotNull)
        .join(ms, Seq(clusterCol))
        .filter(col(seqCol) === col("__ms"))
        .groupBy(cl)
        .agg(min(col(idCol)).as("__pid"))
      val v = pid.join(
        members.select(col(idCol).as("__pid"), col(f)),
        Seq("__pid"))
        .select(cl, col(f))
      out = out.join(v, Seq(clusterCol), "left")
    }
    maxCols.foreach { f =>
      out = out.join(
        members.groupBy(cl).agg(max(col(f)).as(f)),
        Seq(clusterCol),
        "left")
    }
    out
  }

  /** RFM segmentation (Hughes 1994 — the classic direct-marketing
    * triage, and a pretraining-era user-value gate): per key,
    * recency (days since last event vs the corpus clock), frequency
    * (event count), monetary (exact integer cents), each scored into
    * terciles 3/2/1 by EXACT rank cutoffs (r <= n div 3 — the CCNet
    * bucketing discipline, no ntile opacity, ties broken by key so
    * the verdict is total-order deterministic), best-first per
    * dimension (low recency / high frequency / high monetary = 3).
    * segment = 100·R + 10·F + M. Ranks come from [[globalRank]]'s
    * range-partitioned distributed sort (three passes over the
    * aggregate-bounded KEY table — one row per user), never a
    * single-task `Window.orderBy`: a customer key table at corpus
    * scale is 1e7-1e9 rows. Returns (key, recency_days, frequency,
    * monetary_cents, r_score, f_score, m_score, segment).
    */
  def rfmSegments(
      df: DataFrame,
      keyCol: Column,
      tsCol: Column,
      valueCol: Column): DataFrame = {
    val per = df
      .filter(keyCol.isNotNull && tsCol.isNotNull)
      .groupBy(keyCol.as("key"))
      .agg(
        max(to_date(tsCol)).as("__last"),
        count(lit(1)).as("frequency"),
        sum(round(valueCol.cast("double") * 100.0, 0).cast("long")).as("monetary_cents"))
    val clock = broadcast(
      per.agg(max(col("__last")).as("__now"), count(lit(1)).as("__n")))
    val base = per
      .crossJoin(clock)
      .withColumn("recency_days", datediff(col("__now"), col("__last")).cast("long"))
    // tercile cutoffs by EXACT global rank from the range-partitioned
    // [[globalRank]] (three distributed sorts of the per-key table),
    // not row_number().over(Window.orderBy(...)) — a customer key
    // table at corpus scale is 1e7-1e9 rows, too big for one task;
    // __n rides the 1-row clock broadcast
    def score(order: Seq[Column], out: String) = { (d: DataFrame) =>
      globalRank(d, order, "__r")
        .withColumn(
          out,
          when(col("__r") <= expr("__n div 3"), 3L)
            .when(col("__r") <= expr("(2 * __n) div 3"), 2L)
            .otherwise(1L))
        .drop("__r")
    }
    base
      .transform(score(Seq(col("recency_days"), col("key")), "r_score"))
      .transform(score(Seq(col("frequency").desc, col("key")), "f_score"))
      .transform(score(Seq(col("monetary_cents").desc, col("key")), "m_score"))
      .select(
        col("key"),
        col("recency_days"),
        col("frequency"),
        col("monetary_cents"),
        col("r_score"),
        col("f_score"),
        col("m_score"),
        (col("r_score") * 100L + col("f_score") * 10L + col("m_score")).as("segment"))
  }

  /** 2-D skyline / Pareto front (Borzsonyi et al. 2001): the rows
    * no other row dominates — better-or-equal on BOTH axes and
    * strictly better on at least one (minimize `minCol`, maximize
    * `maxCol`). The classic "cheapest AND biggest" shortlist a
    * quadratic dominance self-join dies computing; in 2-D a
    * group-level pass suffices: per distinct minCol value only the
    * group max of maxCol can survive (lesser same-price rows are
    * dominated within the group), and a group survives iff its best
    * STRICTLY exceeds the running best over all strictly-cheaper
    * groups (equal would mean a cheaper row ties on max — strict on
    * min — dominated). Duplicates of a surviving (min, max) point
    * all survive: identical points do not dominate each other. The
    * running best folds over the DISTINCT-minCol group table via
    * [[globalRunningMax]]'s range-partitioned prefix scan (value-
    * bounded AND distributed — no single-task window even when the
    * value domain is huge); the corpus is touched by one hash
    * aggregate and one join. All comparisons exact on the input
    * types. Returns the input rows of the front.
    */
  def skyline2d(df: DataFrame, minCol: Column, maxCol: Column): DataFrame = {
    val base = df.filter(minCol.isNotNull && maxCol.isNotNull)
    val groups = base.groupBy(minCol.as("__m")).agg(max(maxCol).as("__gb"))
    // running best over strictly-cheaper groups via the distributed
    // prefix-max (range-partitioned sort + per-partition fold), never
    // a single-task Window.orderBy — the group table is value-domain
    // bounded but a price domain at corpus scale is still too big for
    // one task
    val keep = globalRunningMax(groups, Seq(col("__m")), "__gb", "__pb")
      .filter(col("__pb").isNull || col("__gb") > col("__pb"))
      .select(col("__m"), col("__gb"))
    base
      .join(keep, minCol === col("__m") && maxCol === col("__gb"))
      .drop("__m", "__gb")
  }

  /** Deterministic mode per group: the most frequent value, ties
    * broken to the SMALLEST value (a total tie-break — Spark's
    * `mode()` aggregate is explicitly nondeterministic on ties, which
    * makes it oracle-unmatchable and run-unstable; this is the
    * pinned version). Two hash aggregates: (group, value) counts,
    * then first-wins on (count desc, value asc) over the
    * group-bounded count table. Returns (group, mode, n_mode).
    */
  def modePerGroup(df: DataFrame, groupCol: Column, valueCol: Column): DataFrame =
    dedupeFirstWins(
      df.filter(groupCol.isNotNull && valueCol.isNotNull)
        .groupBy(groupCol.as("g"), valueCol.as("mode"))
        .agg(count(lit(1)).as("n_mode")),
      Seq(col("g")),
      Seq(col("n_mode").desc, col("mode")))

  /** Association rules over baskets (Agrawal, Imieliński & Swami
    * 1993) — support / confidence / lift for co-occurring item
    * pairs: the market-basket / co-retrieval / "docs cited together"
    * miner. For each unordered pair {a, b} with a < b that clears
    * the basket-count floor:
    *
    *   support_ppm  = 1e6·n_ab div N
    *   conf_a_b_ppm = 1e6·n_ab div n_a    (P(b | a))
    *   conf_b_a_ppm = 1e6·n_ab div n_b
    *   lift6        = 1e6·n_ab·N div (n_a·n_b)   (> 1e6 = genuine
    *                  affinity; ≤ 1e6 = popularity coincidence)
    *
    * — all exact integer counts into truncating divisions
    * (DECIMAL(38,0) for the lift cross-product). Items are
    * DISTINCT-per-basket (quantity inside one basket is not
    * co-occurrence evidence).
    *
    * Scale shape: one distinct pass to (basket, item), a per-basket
    * self-join bounded by basket size (the T36 co-purchase shape —
    * pre-cap pathological baskets upstream), `minPairCount` prunes
    * the pair tail BEFORE the item-count join. Returns (item_a,
    * item_b, n_a, n_b, n_ab, support_ppm, conf_a_b_ppm,
    * conf_b_a_ppm, lift6).
    */
  def associationRules(
      df: DataFrame,
      basketCol: Column,
      itemCol: Column,
      minPairCount: Long = 2L): DataFrame = {
    require(minPairCount >= 1L, "minPairCount must be >= 1")
    val bi = df
      .filter(basketCol.isNotNull && itemCol.isNotNull)
      .select(basketCol.as("b"), itemCol.as("i"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nBaskets = broadcast(bi.select(col("b")).distinct().agg(count(lit(1)).as("__nb")))
    val items = bi.groupBy(col("i")).agg(count(lit(1)).as("n_i"))
    val pairs = bi.as("x")
      .join(bi.as("y"), col("x.b") === col("y.b") && col("x.i") < col("y.i"))
      .groupBy(col("x.i").as("item_a"), col("y.i").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairCount)
    pairs
      .join(items.select(col("i").as("item_a"), col("n_i").as("n_a")), Seq("item_a"))
      .join(items.select(col("i").as("item_b"), col("n_i").as("n_b")), Seq("item_b"))
      .crossJoin(nBaskets)
      .select(
        col("item_a"), col("item_b"), col("n_a"), col("n_b"), col("n_ab"),
        expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * n_ab div __nb AS BIGINT)").as("support_ppm"),
        expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * n_ab div n_a AS BIGINT)").as("conf_a_b_ppm"),
        expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * n_ab div n_b AS BIGINT)").as("conf_b_a_ppm"),
        expr(
          """CAST(
            |  (CAST(1000000 AS DECIMAL(38,0)) * CAST(n_ab AS DECIMAL(38,0))
            |   * CAST(__nb AS DECIMAL(38,0)))
            |  div (CAST(n_a AS DECIMAL(38,0)) * CAST(n_b AS DECIMAL(38,0)))
            |AS BIGINT)""".stripMargin).as("lift6"))
  }

  /** Distribution-free median confidence interval — the
    * order-statistic CI (no normality, no bootstrap, no approx
    * percentile): the 95% CI for a group's median is the pair of
    * values at ranks m ± ⌊z/2·√n⌋ around the LOWER-median rank
    * m = (n+1) div 2 (binomial normal approximation; z/2 = 0.979982
    * as a LITERAL — the no-runtime-quantiles rule), ranks clamped to
    * [1, n]. The error bar a dashboard should print next to every
    * group median — medians of small groups are noisier than they
    * look, and this makes the noise exact and engine-portable.
    *
    * Determinism: ranks come from one per-group window over the
    * value order; equal values tie arbitrarily in RANK but the VALUE
    * at any rank inside a tie run is unique, so the selected
    * (median, lo, hi) values are deterministic. The one float op is
    * floor(0.979982·sqrt(n)) on the exact integer n — identical
    * IEEE doubles on both engines. Returns (group, n, ci_lo, median,
    * ci_hi).
    */
  def medianWithCi(df: DataFrame, groupCol: Column, valueCol: Column): DataFrame = {
    val base = df
      .filter(groupCol.isNotNull && valueCol.isNotNull)
      .select(groupCol.as("g"), valueCol.cast("long").as("v"))
    val w = Window.partitionBy(col("g"))
    base
      .withColumn("rn", row_number().over(w.orderBy(col("v"))))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("m", expr("CAST((n + 1) div 2 AS BIGINT)"))
      .withColumn(
        "o",
        expr("CAST(floor(0.979982 * sqrt(CAST(n AS DOUBLE))) AS BIGINT)"))
      .withColumn("lo", greatest(lit(1L), col("m") - col("o")))
      .withColumn("hi", least(col("n"), col("m") + col("o")))
      .filter(col("rn") === col("m") || col("rn") === col("lo") || col("rn") === col("hi"))
      .groupBy(col("g"))
      .agg(
        max(col("n")).as("n"),
        max(when(col("rn") === col("lo"), col("v"))).as("ci_lo"),
        max(when(col("rn") === col("m"), col("v"))).as("median"),
        max(when(col("rn") === col("hi"), col("v"))).as("ci_hi"))
      .select(col("g").as("group"), col("n"), col("ci_lo"), col("median"), col("ci_hi"))
  }

  /** Fellegi–Sunter match/non-match weights (Fellegi & Sunter 1969)
    * — the probabilistic-record-linkage theory under every modern ER
    * stack: for each comparison field, estimate m = P(agree | match)
    * and u = P(agree | non-match) from LABELED candidate pairs, and
    * publish the log-likelihood-ratio weights a scorer adds up:
    * agreement is worth ln(m/u), disagreement ln((1−m)/(1−u)). A
    * field that agrees often by chance (u high) earns a small
    * agreement weight no matter how reliable it is on matches — the
    * principled version of hand-tuned field scores.
    *
    * Exactness: m/u are Laplace-smoothed exact ppm — m_ppm =
    * 1e6·(a+1) div (n+2) — so both live in [1, 999999] and no ln(0)
    * exists; each weight is ONE double division of two ppm BIGINTs
    * through ln, micro-rounded once (the entropy-family discipline).
    * NULL agreement flags count as disagreement (pinned convention —
    * FS treats missingness as its own outcome; fold it in upstream
    * if you need a third state). A training set with zero matches or
    * zero non-matches FAILS FAST in-plan: the weights would be pure
    * smoothing noise dressed as evidence.
    *
    * Scale shape: fields stack per pair inside codegen (explode of a
    * literal-size array — |fields| rows per pair), one hash
    * aggregate to the fields-bounded weight table. Returns (field,
    * n_match, n_unmatch, a_match, a_unmatch, m_ppm, u_ppm, w_agree6,
    * w_dis6).
    */
  def fsMatchWeights(
      pairs: DataFrame,
      isMatch: Column,
      fields: Seq[(String, Column)]): DataFrame = {
    require(fields.nonEmpty, "fsMatchWeights: at least one comparison field")
    val stacked = pairs
      .filter(isMatch.isNotNull)
      .select(
        isMatch.cast("boolean").as("__m"),
        explode(array(fields.map { case (n, c) =>
          struct(lit(n).as("field"), coalesce(c.cast("boolean"), lit(false)).as("agree"))
        }: _*)).as("f"))
      .select(col("__m"), col("f.field").as("field"), col("f.agree").as("agree"))
    stacked
      .groupBy(col("field"))
      .agg(
        sum(when(col("__m"), 1L).otherwise(0L)).as("n_match"),
        sum(when(!col("__m"), 1L).otherwise(0L)).as("n_unmatch"),
        sum(when(col("__m") && col("agree"), 1L).otherwise(0L)).as("a_match"),
        sum(when(!col("__m") && col("agree"), 1L).otherwise(0L)).as("a_unmatch"))
      .filter(
        assert_true(
          col("n_match") > 0L && col("n_unmatch") > 0L,
          lit("fsMatchWeights: the labeled pairs must contain both matches and " +
            "non-matches — weights off one class are smoothing noise")).isNull)
      .withColumn("m_ppm", expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * (a_match + 1) div (n_match + 2) AS BIGINT)"))
      .withColumn("u_ppm", expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * (a_unmatch + 1) div (n_unmatch + 2) AS BIGINT)"))
      .withColumn(
        "w_agree6",
        round(log(col("m_ppm").cast("double") / col("u_ppm").cast("double")) * lit(1e6), 0)
          .cast("long"))
      .withColumn(
        "w_dis6",
        round(
          log(
            (lit(1000000L) - col("m_ppm")).cast("double") /
              (lit(1000000L) - col("u_ppm")).cast("double")) * lit(1e6),
          0).cast("long"))
  }

  /** Score candidate pairs with [[fsMatchWeights]] output: per pair,
    * score6 = Σ_field (agree ? w_agree6 : w_dis6) — exact integer
    * sum of the micro-nat weights, positive evidence for match. The
    * same stack-explode shape as the estimator (NULL agreement =
    * disagreement, same pinned convention); the weight table rides a
    * broadcast join keyed on the field name. Returns keyCols +
    * (score6, is_match_pred = score6 > 0 — the classic zero-
    * threshold decision; calibrate against your own FP/FN costs).
    */
  def fsScorePairs(
      pairs: DataFrame,
      fields: Seq[(String, Column)],
      weights: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    require(fields.nonEmpty && keyCols.nonEmpty,
      "fsScorePairs: fields and keyCols must be non-empty")
    pairs
      .select(
        keyCols.map(col) :+
          explode(array(fields.map { case (n, c) =>
            struct(lit(n).as("field"), coalesce(c.cast("boolean"), lit(false)).as("agree"))
          }: _*)).as("f"): _*)
      .select(keyCols.map(col) :+ col("f.field").as("field") :+ col("f.agree").as("agree"): _*)
      .join(broadcast(weights.select(col("field"), col("w_agree6"), col("w_dis6"))), Seq("field"))
      .groupBy(keyCols.map(col): _*)
      .agg(
        sum(when(col("agree"), col("w_agree6")).otherwise(col("w_dis6"))).as("score6"))
      .withColumn("is_match_pred", col("score6") > 0L)
  }
}
