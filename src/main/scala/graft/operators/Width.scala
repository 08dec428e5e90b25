package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Partition-width hygiene for per-document kernel passes.
  *
  * A SMALL parquet scan arrives in ~1 partition and would serialize
  * per-doc work (and quadratic pair scans) on one thread, so narrow
  * inputs are spread to cluster width. A LARGE input already has ≥
  * width partitions and must NOT pay a full-corpus round-robin
  * shuffle just to run a per-row expression — so spreading is a
  * no-op there. The partition count comes from the compiled plan
  * without executing it.
  */
private[graft] object Width {

  private def width(df: DataFrame): Int =
    df.sparkSession.sparkContext.defaultParallelism

  /** Round-robin spread for keyless per-doc passes. Streaming frames
    * pass through untouched — `df.rdd` is illegal on a stream, and
    * micro-batch width is the source's concern, not ours.
    */
  def spread(df: DataFrame): DataFrame =
    if (df.isStreaming) df
    else if (df.rdd.getNumPartitions >= width(df)) df
    else df.repartition(width(df))

  /** Hash spread on `key` — for pair scans whose downstream agg/window
    * reuses the hash(key) layout. Pinned count: size-based AQE would
    * coalesce a tiny input back to one partition.
    */
  def spreadBy(df: DataFrame, key: Column): DataFrame =
    if (df.isStreaming) df
    else if (df.rdd.getNumPartitions >= width(df)) df
    else df.repartition(width(df), key)
}
