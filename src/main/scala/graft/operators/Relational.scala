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
    val o = old.select(keys.map(col) :+ col(hashCol).as("__old_hash"): _*)
    val n = fresh.select(keys.map(col) :+ col(hashCol).as("__new_hash"): _*)
    o.join(n, keys, "full_outer")
      .withColumn(
        "status",
        when(col("__old_hash").isNull, lit("added"))
          .when(col("__new_hash").isNull, lit("removed"))
          .when(col("__old_hash") =!= col("__new_hash"), lit("changed"))
          .otherwise(lit("same")))
      .filter(col("status") =!= "same")
      .drop("__old_hash", "__new_hash")
  }
}
