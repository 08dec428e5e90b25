package graft.operators

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
}
