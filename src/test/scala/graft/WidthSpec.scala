package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Width.spread/spreadBy decide from the OPTIMIZED LOGICAL plan (no
  * physical planning, no df.rdd) whether a frame needs spreading to
  * cluster width before a per-doc kernel pass. These tests pin the
  * decision table: narrow scans spread, post-shuffle frames pass
  * through, and the two hazard cases a physical-plan-free check could
  * get wrong — broadcast-join outputs and coalesce(1) — spread.
  */
class WidthSpec extends SparkSpec {
  import spark.implicits._

  private def parts(df: DataFrame): Int = df.rdd.getNumPartitions
  private def width: Int = spark.sparkContext.defaultParallelism

  private lazy val tmp = {
    val dir = java.nio.file.Files.createTempDirectory("widthspec")
    // recursive delete on JVM exit — createTempDirectory alone leaks
    // one fixture dir per test run
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      java.nio.file.Files.walk(dir)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))))
    (1 to 100).map(i => (i.toLong, s"doc $i text")).toDF("id", "text")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/docs.parquet")
    dir.toString
  }

  private def narrowScan: DataFrame = spark.read.parquet(s"$tmp/docs.parquet")

  test("narrow scan spreads to cluster width") {
    assert(parts(narrowScan) < width, "fixture must start narrow")
    assert(parts(graft.operators.Width.spread(narrowScan)) == width)
  }

  test("post-aggregate frame passes through unspread") {
    val agg = narrowScan.groupBy($"text").agg(count(lit(1)).as("n"))
    val out = graft.operators.Width.spread(agg)
    // no Repartition node added on top of the aggregate
    assert(out.queryExecution.logical eq agg.queryExecution.logical)
  }

  test("broadcast-join output still spreads (join is not proof of an exchange)") {
    val dim = Seq((1L, "a"), (2L, "b")).toDF("id", "tag")
    val joined = narrowScan.join(broadcast(dim), Seq("id"), "left")
    assert(parts(joined) < width, "broadcast join must keep the scan's narrow layout")
    assert(parts(graft.operators.Width.spread(joined)) == width)
  }

  test("coalesce(1) still spreads (explicit repartition is not proof of width)") {
    val squeezed = narrowScan.coalesce(1)
    assert(parts(graft.operators.Width.spread(squeezed)) == width)
  }

  test("spreadBy hash-spreads a narrow scan on the key") {
    val out = graft.operators.Width.spreadBy(narrowScan, $"id")
    assert(parts(out) == width)
  }
}
