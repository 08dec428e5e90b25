package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{
  DataStreamWriter, GroupState, GroupStateTimeout, OutputMode, Trigger
}
import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}

/** SURVEY §2.11 — the reference's incremental daily-batch semantics
  * re-expressed as Structured Streaming
  * (`/root/reference/dags/orbit_daily_update_dag.py:126-299`,
  * `src/agents/tools.py:330-335`).
  *
  * All operators are watermark-bounded so state stores stay finite on
  * an unbounded stream — the 100 TB posture: state is keyed by
  * (entity, page) with late data evicted, never an ever-growing set.
  */
object Streams {

  /** I1/I3 — content-hash dedup on an append stream: a page re-crawled
    * with an unchanged hash (within the watermark delay) is dropped; a
    * changed hash passes through (the downstream upsert is then
    * last-wins by deterministic id).
    *
    * `dropDuplicatesWithinWatermark` is what actually BOUNDS the
    * state: plain `dropDuplicates(keys)` without the event-time column
    * in the subset keeps every (key, hash) ever seen forever. The
    * tradeoff is that an identical re-crawl arriving after the
    * watermark delay re-emits — which the last-wins upsert downstream
    * absorbs (same deterministic id, same content).
    */
  def dedupByContentHash(
      stream: DataFrame,
      tsCol: String,
      keyCols: Seq[String],
      hashCol: String,
      watermark: String = "1 day"): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols :+ hashCol)

  /** I5 — sliding windowed aggregate with late-data tolerance
    * (30-day news-mention analogue; here parameterized).
    */
  def slidingCounts(
      stream: DataFrame,
      tsCol: String,
      keyCol: String,
      windowLen: String,
      slide: String,
      watermark: String = "1 day"): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen, slide), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col(keyCol),
        col("n_events"))

  /** Stream-stream event-time interval join: pair each left event
    * with the same key's right events inside
    * `[left.ts - lookback, left.ts]` — the "purchase joined to the
    * clicks that led to it" shape. Both sides carry watermarks and
    * the join condition bounds event time on BOTH sides, which is
    * what lets Spark evict right-side state older than
    * `watermark + lookback` instead of buffering the stream forever —
    * the unbounded-state trap of an unconstrained stream-stream join.
    * Inner join, append mode: a match emits exactly once, when both
    * sides have arrived.
    *
    * Column layout: callers pre-project distinct names (the join
    * condition references both sides' ts columns, so they cannot
    * share names).
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      lookback: String,
      watermark: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(
      r,
      col(leftKey) === col(rightKey) &&
        col(rightTs) >= col(leftTs) - expr(s"INTERVAL $lookback") &&
        col(rightTs) <= col(leftTs))
  }

  /** I4 — date-partitioned append JSON sink (risk-signal log:
    * one JSONL partition per day, append-only).
    */
  def datePartitionedJsonSink(
      stream: DataFrame,
      tsCol: String,
      path: String,
      checkpoint: String): DataStreamWriter[Row] =
    stream
      .withColumn("date", date_format(col(tsCol), "yyyy-MM-dd"))
      .writeStream
      .format("json")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .partitionBy("date")
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())

  /** Session-gap aggregation: events closer than `gap` merge into one
    * session per key (dynamic windows — `session_window` built-in).
    * No reference counterpart (SURVEY §2.11); completes the streaming
    * window surface next to the tumbling/sliding `slidingCounts`.
    */
  def sessionCounts(
      stream: DataFrame,
      tsCol: String,
      keyCol: String,
      gap: String,
      watermark: String = "1 day"): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col(keyCol),
        col("n_events"))

  /** One page-crawl observation (key = entity+page identity). */
  case class PageUpdate(key: String, content_hash: String, ts: java.sql.Timestamp)

  /** A detected content transition for a key (prev_hash null on the
    * first sighting).
    */
  case class ChangeEvent(key: String, prev_hash: String, new_hash: String)

  /** I1 as CUSTOM state — `flatMapGroupsWithState`: per key the state
    * store holds only the last seen hash; each micro-batch emits one
    * ChangeEvent per hash TRANSITION (first sighting included),
    * something `dropDuplicates` can't express (it keeps rows, not
    * transitions, and re-admits a hash seen before an intervening
    * change). State is O(keys) — one string per (entity, page) —
    * regardless of stream length.
    */
  def changeEvents(updates: Dataset[PageUpdate]): Dataset[ChangeEvent] = {
    import updates.sparkSession.implicits._
    updates
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: String, rows: Iterator[PageUpdate], state: GroupState[String]) => {
          // batch arrival order is not event order — replay by ts at
          // full precision (getTime alone truncates to ms and would
          // tie-break sub-ms updates by hash instead of time)
          val sorted = rows.toSeq.sortBy(r => (r.ts.getTime, r.ts.getNanos, r.content_hash))
          var prev = state.getOption
          val out = Seq.newBuilder[ChangeEvent]
          sorted.foreach { r =>
            if (!prev.contains(r.content_hash)) {
              out += ChangeEvent(key, prev.orNull, r.content_hash)
              prev = Some(r.content_hash)
            }
          }
          prev.foreach(state.update)
          out.result().iterator
        })
  }

  /** One emitted row per consecutive state pair. */
  case class TransitionPair(key: String, from_state: String, to_state: String)

  /** Streaming first-order transition pairs — the live twin of
    * [[graft.operators.Series.transitionMatrix]]'s stateful half:
    * per key, every consecutive (previous state, new state) pair
    * INCLUDING self-transitions (unlike [[changeEvents]], which
    * exists to suppress them), carried across micro-batch boundaries
    * by one string of state per key. Same replay-order contract as
    * changeEvents: batch arrival order is not event order, so rows
    * re-sort by full-precision ts inside each (batch, key) group —
    * give the stream a unique monotone clock (the event id) and the
    * emitted pairs equal the batch lead()-over-total-order pairs
    * exactly. Downstream aggregation to the (from, to, n, p6) matrix
    * is a stateless batch fold over the emitted pair sink.
    */
  def transitionPairs(updates: Dataset[PageUpdate]): Dataset[TransitionPair] = {
    import updates.sparkSession.implicits._
    updates
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: String, rows: Iterator[PageUpdate], state: GroupState[String]) => {
          val sorted = rows.toSeq.sortBy(r => (r.ts.getTime, r.ts.getNanos, r.content_hash))
          var prev = state.getOption
          val out = Seq.newBuilder[TransitionPair]
          sorted.foreach { r =>
            prev.foreach(p => out += TransitionPair(key, p, r.content_hash))
            prev = Some(r.content_hash)
          }
          prev.foreach(state.update)
          out.result().iterator
        })
  }

  /** Watermark late-data audit: run the stream through
    * `withWatermark(tsCol, delay)` + `dropDuplicatesWithinWatermark`
    * on a UNIQUE key against a throwaway memory sink, and report how
    * many input rows the late-row filter rejected — the operational
    * metric a 100 TB ingest pipeline alarms on (a stuck upstream
    * partition surfaces as a dropped-row spike long before anyone
    * reads the counts). Three behaviors are load-bearing, each
    * verified in StreamingSpec against Spark's ACTUAL machinery
    * rather than the folklore version:
    *   - the dedup operator is the right probe: a windowed
    *     AGGREGATION's numRowsDroppedByWatermark counts post-partial-
    *     agg state rows (one per window per upstream partition — a
    *     partition-count-dependent number no oracle can predict),
    *     while the dedup filter runs per INPUT row;
    *   - update-mode aggregation would not drop late rows at all (it
    *     re-opens closed windows and emits corrections; only state is
    *     evicted);
    *   - rows are judged against the LATE-EVENTS watermark, which
    *     TRAILS the eviction watermark by one micro-batch (the
    *     multi-stateful-operator regime) — a straggler is dropped
    *     only when it arrives >= 2 batches after the on-time data
    *     that advanced the watermark past it.
    * `keyCols` must be unique per row (an event id) so the dedup
    * itself never drops anything and the metric isolates lateness;
    * state is per-row but watermark-bounded (entries older than the
    * delay evict every batch). Callers stage late rows well below
    * the watermark (never edge timestamps) for the expected count to
    * be deterministic. Returns (nBatches, nDroppedLate, nInputRows).
    */
  def lateDataAudit(
      stream: DataFrame,
      tsCol: String,
      delay: String,
      keyCols: Seq[String],
      sinkName: String): (Long, Long, Long) = {
    val deduped = stream
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keyCols)
    val q = deduped.writeStream
      .format("memory")
      .queryName(sinkName)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val progresses = q.recentProgress.toSeq
    val dropped = progresses
      .flatMap(p => Option(p.stateOperators).toSeq.flatMap(_.toSeq))
      .map(_.numRowsDroppedByWatermark)
      .sum
    val input = progresses.map(_.numInputRows).sum
    (progresses.count(_.numInputRows > 0).toLong, dropped, input)
  }

  /** I2 — foreachBatch incremental merge: per micro-batch, compute the
    * changed work-list (against the previous materialized state) and
    * hand only changed keys to `process`. The batch-mode analogue is
    * Relational.changeDetection + semi-join.
    */
  def incrementalMerge(
      stream: DataFrame,
      keyCols: Seq[String],
      hashCol: String,
      loadPrevious: () => Option[DataFrame],
      process: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val work = loadPrevious() match {
          case Some(prev) =>
            graft.operators.Relational
              .changeDetection(prev, batch, keyCols.toSeq, hashCol)
              .filter(col("status").isin("added", "changed"))
          case None => batch
        }
        process(work, id)
      }
      .trigger(Trigger.AvailableNow())
}
