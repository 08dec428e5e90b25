package graft.pipelines

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** E3/J6 — nested-document payload assembly: parent row + arrays of
  * child rows, the reference's `Payload(...)` build
  * (`/root/reference/src/structured_extraction_v2.py:3484-3494`).
  *
  * Shape: one `groupBy(parentKey).agg(collect_list(struct(...)))` per
  * child table, then left joins onto the parent — each child costs one
  * shuffle on the parent key; the join itself co-partitions on that
  * same key, so AQE merges the exchanges. Arrays are sorted for
  * deterministic output.
  */
object Payload {

  /** Collapse a child table into (key, array<struct>) with the array
    * sorted by `sortCols` for determinism.
    */
  def nest(
      child: DataFrame,
      key: String,
      valueCols: Seq[String],
      outName: String): DataFrame =
    child
      .groupBy(col(key))
      .agg(sort_array(collect_list(struct(valueCols.map(col): _*))).as(outName))

  /** Assemble parent + nested children; children absent for a parent
    * become empty arrays (reference emits [] not null).
    */
  def assemble(
      parent: DataFrame,
      parentKey: String,
      children: Seq[(DataFrame, String, Seq[String], String)]): DataFrame =
    children.foldLeft(parent) { case (acc, (child, childKey, cols, name)) =>
      val nested = nest(child, childKey, cols, name)
        .withColumnRenamed(childKey, parentKey)
      acc
        .join(nested, Seq(parentKey), "left")
        .withColumn(name, coalesce(col(name), array().cast(nested.schema(name).dataType)))
    }

  /** Serialize assembled payloads to one JSON document per row. */
  def toJsonDocs(assembled: DataFrame): DataFrame =
    assembled.select(to_json(struct(assembled.columns.toIndexedSeq.map(col): _*)).as("payload_json"))
}
