package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Write-side layout optimization: Z-order (Morton) keys for
  * multi-dimensional data clustering — the lakehouse `OPTIMIZE ZORDER
  * BY` primitive. Sorting a table by the interleaved key co-locates
  * rows that are close in EVERY keyed dimension, so per-file min/max
  * stats prune multi-predicate scans that a single-column sort can
  * only prune on its leading column. At 100 TB this is the difference
  * between touching every file and touching the handful whose
  * (min, max) ranges overlap the predicate.
  *
  * Exactness: the key is pure integer bit-interleaving — engine- and
  * partitioning-independent, mirrored in SQL as a sum of
  * `((x div 2^b) % 2) * 4^b` terms.
  */
object Layout {

  /** Morton/Z-value of two dimensions, `bits` bits each (values are
    * masked to `bits` low bits first): bit b of `x` lands at position
    * 2b+1, bit b of `y` at position 2b. Total 2·bits ≤ 62. Null
    * contract: a null in either dimension nulls the key (null-in →
    * null-out); rows with null layout keys sort together at the end
    * of a z-ordered write.
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val xm = pmod(x.cast("long"), lit(1L << bits))
    val ym = pmod(y.cast("long"), lit(1L << bits))
    (0 until bits)
      .map { b =>
        (shiftright(xm, b) % 2L) * lit(1L << (2 * b + 1)) +
          (shiftright(ym, b) % 2L) * lit(1L << (2 * b))
      }
      .reduce(_ + _)
  }

  /** Data-skipping effectiveness report for a layout: bucket rows by
    * `bucketKey div bucketSize` (a stand-in for file assignment under
    * the layout's sort order), collect per-bucket (min, max) of the
    * predicate column — exactly the footer stats a parquet reader
    * prunes on — and report how many buckets a `[lo, hi)` range
    * predicate must touch. One hash aggregate; output is one row per
    * layout name.
    */
  def skippingReport(
      df: org.apache.spark.sql.DataFrame,
      layout: String,
      bucket: Column,
      predicate: Column,
      lo: Long,
      hi: Long): org.apache.spark.sql.DataFrame =
    df.groupBy(bucket.as("bucket"))
      .agg(min(predicate).as("mn"), max(predicate).as("mx"))
      .agg(
        count(lit(1)).as("n_buckets"),
        sum(when(col("mn") < hi && col("mx") >= lo, 1L).otherwise(0L))
          .as("touched"))
      .select(
        lit(layout).as("layout"),
        col("n_buckets"),
        col("touched"))
}
