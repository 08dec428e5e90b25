package graft.operators

import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.{Column, DataFrame}

/** Partition-width hygiene for per-document kernel passes.
  *
  * A SMALL parquet scan arrives in ~1 partition and would serialize
  * per-doc work (and quadratic pair scans) on one thread, so narrow
  * inputs are spread to cluster width. A LARGE input already has ≥
  * width partitions and must NOT pay a full-corpus round-robin
  * shuffle just to run a per-row expression — so spreading is a
  * no-op there.
  *
  * The decision is made from the OPTIMIZED LOGICAL plan only — no
  * physical planning, no RDD materialization (`df.rdd` would compile
  * the physical plan on every call just to read a partition count):
  *  - a plan containing any exchange-forcing operator (aggregate,
  *    join, window, sort, distinct, explicit repartition) is already
  *    at shuffle width — no-op;
  *  - otherwise the frame is scan-shaped, and its width is estimated
  *    as sizeInBytes / maxPartitionBytes, exactly the split math the
  *    file source applies. Without CBO, filters/projections keep the
  *    scan's sizeInBytes, so the estimate errs toward "wide" — the
  *    failure mode is skipping the spread on a heavily-filtered
  *    frame, which is safe because the underlying SCAN already has
  *    that many partitions doing the per-row work.
  */
private[graft] object Width {

  private def width(df: DataFrame): Int =
    df.sparkSession.sparkContext.defaultParallelism

  /** Operators whose physical form ALWAYS introduces an exchange,
    * leaving the frame at `spark.sql.shuffle.partitions` width.
    * Join and explicit repartition are deliberately absent: a join
    * may plan as broadcast (no exchange on the streamed side — a
    * narrow scan stays narrow through it), and `coalesce(n)` is a
    * RepartitionOperation whose whole point is FEWER partitions; both
    * fall through to the size estimate, which errs toward spreading.
    */
  private def alreadyShuffled(plan: LogicalPlan): Boolean =
    plan.exists {
      case _: Aggregate | _: Window | _: Sort | _: Distinct |
          _: Deduplicate | _: SetOperation => true
      case _ => false
    }

  /** Estimated scan partitions from logical stats — the same
    * bytes/maxSplit math FilePartition planning uses.
    */
  private def estimatedPartitions(df: DataFrame): Int = {
    val maxSplit = df.sparkSession.sessionState.conf.filesMaxPartitionBytes
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (bytes <= 0) 1
    else ((bytes + maxSplit - 1) / maxSplit).min(Int.MaxValue).toInt
  }

  private def isNarrow(df: DataFrame): Boolean =
    !alreadyShuffled(df.queryExecution.optimizedPlan) &&
      estimatedPartitions(df) < width(df)

  /** Round-robin spread for keyless per-doc passes. Streaming frames
    * pass through untouched — width reasoning is illegal on a stream,
    * and micro-batch width is the source's concern, not ours.
    */
  def spread(df: DataFrame): DataFrame =
    if (df.isStreaming) df
    else if (isNarrow(df)) df.repartition(width(df))
    else df

  /** Hash spread on `key` — for pair scans whose downstream agg/window
    * reuses the hash(key) layout. Pinned count: size-based AQE would
    * coalesce a tiny input back to one partition.
    */
  def spreadBy(df: DataFrame, key: Column): DataFrame =
    if (df.isStreaming) df
    else if (isNarrow(df)) df.repartition(width(df), key)
    else df
}
