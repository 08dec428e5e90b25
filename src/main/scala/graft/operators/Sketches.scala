package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Distinct-count sketching (A-family corpus audits at 100 TB: vocab
  * size per source, unique URLs per domain — counts where exact
  * `count(distinct)` would shuffle every distinct value).
  *
  * KMV (k minimum values, Bar-Yossef et al. 2002): hash every value
  * uniformly onto [0, 2^32), keep the k smallest distinct hashes per
  * group; the k-th smallest estimates density, D ≈ (k−1)·2^32 / h_k.
  * Under k distinct values the buffer IS the distinct set, so the
  * estimate degrades to exact. Relative error ~1/√(k−2).
  *
  * Chosen over HLL deliberately: Spark's `approx_count_distinct` is a
  * black-box HLL no second engine reproduces, while KMV is a pure
  * order statistic over a shared portable hash ([[Sampling.hash32]]) —
  * deterministic on any engine/partitioning, so the DuckDB oracle
  * recomputes it bit-for-bit. Same accuracy class at the same sketch
  * size.
  */
object Sketches {

  private val Space = 4294967296.0 // 2^32

  /** Per-group distinct-count estimate of `key`: (group…, n_seen,
    * kmv_est). `n_seen` is the buffer fill (= exact distinct-hash
    * count when < k). One hash-aggregate whose partials carry ≤ k
    * longs per group — the value stream itself never shuffles.
    */
  def kmvDistinct(df: DataFrame, groupCols: Seq[Column], key: Column, k: Int): DataFrame = {
    val kmv = udaf(new graft.expressions.KmvAggregator(k))
    Width.spread(df)
      .withColumn("__h", Sampling.hash32(key))
      // null keys hash to null, which the non-nullable Long aggregator
      // input would reject at runtime — ignore them, the same "null
      // keys are never selected" contract as hashSample/splitAssign
      .filter(col("__h").isNotNull)
      .groupBy(groupCols: _*)
      .agg(kmv(col("__h")).as("__mins"))
      .select(
        groupCols :+
          size(col("__mins")).cast("long").as("n_seen") :+
          when(size(col("__mins")) < k, size(col("__mins")).cast("double"))
            .otherwise(
              lit((k - 1).toDouble * Space) /
                element_at(col("__mins"), k).cast("double"))
            .as("kmv_est"): _*)
  }
}
