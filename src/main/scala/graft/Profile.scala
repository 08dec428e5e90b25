package graft

/** Ad-hoc profiler: time named SparkEntry queries against a testdata
  * dir and print each physical plan — the `.explain("formatted")`
  * feedback loop for plan tuning.
  *
  * Usage: runMain graft.Profile <sfDir> [-x] <query> [query ...]
  * (-x prints the formatted plan before running; repeat runs twice
  * and reports both timings so plan-compile cost is visible.)
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val rest = args.drop(1)
    val explain = rest.contains("-x")
    val names = rest.filterNot(_ == "-x")
    val cpus = sys.env
      .get("SPARK_GRAFT_CPUS")
      .map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val spark = Engine.session("graft-profile", s"local[$cpus]", cpus)
    spark.read.parquet(s"$sfDir/region.parquet").write
      .format("noop").mode("overwrite").save()

    if (rest.contains("-determinism")) {
      // rerun-stability guard: every query executed twice, rows
      // compared — catches nondeterministic tie-breaks that a single
      // oracle compare can pass by luck
      var bad = 0
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        try {
          val a = fn(spark, sfDir).collect().map(_.toString).toSeq
          spark.catalog.clearCache()
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
          val b = fn(spark, sfDir).collect().map(_.toString).toSeq
          if (a == b) println(s"[determinism] $name: stable (${a.size} rows)")
          else { bad += 1; println(s"[determinism] $name: UNSTABLE") }
        } catch {
          case e: Throwable => bad += 1; println(s"[determinism] $name: ERROR ${e.getMessage}")
        }
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      }
      println(s"[determinism] unstable/error count: $bad")
      spark.stop()
      return
    }

    if (rest.contains("-audit")) {
      // plan audit: flag scale-hostile physical operators in every
      // query's FINAL (AQE-resolved) plan
      val flags = Seq("SortAggregate", "BroadcastNestedLoopJoin", "CartesianProduct")
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          df.collect()
          val p = df.queryExecution.executedPlan.toString
          val hits = flags.filter(p.contains)
          println(s"[audit] $name: ${if (hits.isEmpty) "clean" else hits.mkString(", ")}")
        } catch {
          case e: Throwable => println(s"[audit] $name: ERROR ${e.getMessage}")
        }
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      }
      spark.stop()
      return
    }

    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[profile] unknown query: $name")
        case Some(fn) =>
          val df = fn(spark, sfDir)
          if (explain) {
            println(s"===== plan: $name =====")
            df.explain("formatted")
          }
          (1 to 2).foreach { i =>
            val t0 = System.nanoTime()
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            val dt = (System.nanoTime() - t0) / 1e9
            spark.catalog.clearCache()
            spark.sparkContext.getPersistentRDDs.values
              .foreach(_.unpersist(blocking = false))
            System.gc()
            println(f"[profile] $name run$i: $dt%.3f s")
          }
      }
    }
    spark.stop()
  }
}
