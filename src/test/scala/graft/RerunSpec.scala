package graft

import org.apache.spark.sql.functions._

/** Rerun stability of the SparkEntry streaming queries: the driver (and
  * Bench/Verify) may invoke a query more than once in one session, and
  * each invocation starts a fresh memory-sink stream under the same
  * query name. A stale registered sink table or checkpoint would make
  * the second run differ or throw.
  */
class RerunSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  for (name <- SparkEntryStreaming.queries.keys.toSeq.sorted)
    test(s"$name: second invocation in the same session matches the first") {
      val fn = SparkEntryStreaming.queries(name)
      val first = fn(spark, sf).collect().map(_.toString).toSeq
      val second = fn(spark, sf).collect().map(_.toString).toSeq
      assert(first.nonEmpty, s"$name returned no rows")
      assert(first == second, s"$name is not rerun-stable")
    }

  test("streaming drain restores the session shuffle-partition setting") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    SparkEntryStreaming.queries("st_dedup_keys")(spark, sf).collect()
    assert(spark.conf.get("spark.sql.shuffle.partitions") == before)
  }
}
