package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR with a noop sink (full materialization — a bare
  * count() would let Catalyst prune most of the work) and prints one
  * JSON line with per-query seconds.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env
      .get("SPARK_GRAFT_CPUS")
      .map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val spark = Engine.session("graft-bench", s"local[$cpus]", cpus)

    // Warmup on a 5-row table so JVM/codegen startup isn't billed to
    // the first queries: beyond the scan path, run a tiny
    // agg+join+window+explode so the Janino compiler, the codegen
    // stage skeletons and the shuffle machinery are all JIT-warm
    // before timing starts (the first Janino compile costs ~10× the
    // steady-state ones).
    {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val r = spark.read.parquet(s"$sfDir/region.parquet")
      r.write.format("noop").mode("overwrite").save()
      val a = r.groupBy(col("r_regionkey")).agg(count(lit(1)).as("c"))
      r.join(a, Seq("r_regionkey"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("r_regionkey")).orderBy(col("r_name"))))
        .select(col("r_regionkey"), explode(split(col("r_name"), "")).as("w"), col("rn"))
        .groupBy(col("w")).agg(sum(col("rn")).as("s"))
        .orderBy(col("s").desc)
        .write.format("noop").mode("overwrite").save()
    }

    // SPARK_GRAFT_ONLY=a,b,c restricts the run (local iteration aid);
    // unset = the full corpus the driver times.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }

    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // Reset session state OUTSIDE the timed window so queries don't
      // inherit each other's memory debt: SQL cache (internal
      // persist()s), localCheckpoint RDD blocks (not covered by
      // clearCache), and accumulated garbage (otherwise one query's
      // GC bill lands on a random later one).
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
      name -> dt
    }
    val qs = results
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum

    // Isolation re-runs of the heaviest queries (the ±1.6×
    // suite-position/JVM band documented since r4 pollutes exactly
    // these): each of the top-20 re-runs in a FRESH SparkSession —
    // no inherited cache, no inherited GC debt, no shared /tmp
    // artifact bases (application-keyed bases rebuild inside the
    // window, so an isolation timing is SELF-CONTAINED and
    // comparable iso-to-iso across rounds, not to the amortized main
    // map). Janino's codegen cache is JVM-global, so the sessions
    // stay JIT-warm. Skipped under SPARK_GRAFT_NO_ISO=1.
    val isoCount = sys.env.get("SPARK_GRAFT_ISO_TOP")
      .flatMap(s => scala.util.Try(s.trim.toInt).toOption)
      .getOrElse(20)
    val runIso = !sys.env.get("SPARK_GRAFT_NO_ISO").contains("1") && only.isEmpty
    val topNames = results.sortBy(-_._2).take(isoCount).map(_._1).sorted
    // Persist the completed suite's map BEFORE the iso phase: a
    // failure anywhere in the fresh-session loop must not discard
    // the full suite's timings (queries_iso merges in on success).
    val mainLine =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_FULL.json"), mainLine + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] main dump failed: ${e.getMessage}") }
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    spark.stop()
    val iso = if (!runIso) Seq.empty[(String, Double)] else topNames.flatMap { name =>
      try {
        val s2 = Engine.session("graft-bench-iso", s"local[$cpus]", cpus)
        s2.read.parquet(s"$sfDir/region.parquet")
          .write.format("noop").mode("overwrite").save()
        val t0 = System.nanoTime()
        try SparkEntry.queries(name)(s2, sfDir).write.format("noop").mode("overwrite").save()
        catch {
          case e: Throwable =>
            System.err.println(s"[bench-iso] $name failed: ${e.getMessage}")
        }
        val dt = (System.nanoTime() - t0) / 1e9
        s2.stop()
        Some(name -> dt)
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench-iso] $name session failed: ${e.getMessage}")
          None
      }
    }
    val isoQs = iso
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""queries_iso":$isoQs,"sf":"$sfDir"}"""
    println(line)
    // The driver scrapes a bounded log tail, which truncates the line
    // once the corpus passes ~100 queries — persist the full map to a
    // repo file too so every per-query timing survives the round.
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_FULL.json"), line + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] full dump failed: ${e.getMessage}") }
    spark.stop()
  }
}
