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

    // SPARK_GRAFT_ONLY=a,b,c restricts the sweep modes too
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)

    if (rest.contains("-determinism")) {
      // rerun-stability guard: every query executed twice, rows
      // compared — catches nondeterministic tie-breaks that a single
      // oracle compare can pass by luck
      var bad = 0
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (n, _) => only.forall(_.contains(n)) }
        .foreach { case (name, fn) =>
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
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (n, _) => only.forall(_.contains(n)) }
        .foreach { case (name, fn) =>
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

    if (rest.contains("-dupgraph")) {
      // amortization measurement for the persisted dup-graph artifact:
      // ONE timed build (pair pipeline + closure + writes), then each
      // consumer timed off the existing artifact — the numbers the
      // *_persisted queries can't show because the driver contract
      // makes each query self-contained (build + consume per run)
      import org.apache.spark.sql.functions._
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val gPath = s"/tmp/graft_idx/dupg_prof_${sfDir.replaceAll("[^A-Za-z0-9]", "_")}"
      def timed[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime()
        val r = f
        println(f"[dupgraph] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        r
      }
      timed("build (pairs + closure + writes)") {
        graft.sources.Io.writeDupGraph(
          graft.operators.Dedup
            .ngramJaccardPairs(docs, "text", "doc_id", 3, 0.2)
            .select(col("id_a"), col("id_b")),
          gPath)
      }
      timed("consume: pageRank") {
        graft.operators.Graph
          .pageRank(graft.sources.Io.readDupGraphPairs(spark, gPath))
          .write.format("noop").mode("overwrite").save()
      }
      timed("consume: cluster sizes") {
        docs.select(col("doc_id"))
          .join(
            graft.sources.Io.readDupGraphLabels(spark, gPath),
            col("doc_id") === col("id"), "left")
          .select(coalesce(col("cluster_id"), col("doc_id")).as("cluster"))
          .groupBy(col("cluster")).agg(count(lit(1)).as("sz"))
          .groupBy(col("sz")).agg(count(lit(1)).as("n_clusters"))
          .write.format("noop").mode("overwrite").save()
      }
      timed("consume: leakage split") {
        graft.operators.Sampling
          .leakageSafeSplitLabeled(
            docs, "doc_id",
            graft.sources.Io.readDupGraphLabels(spark, gPath),
            Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
          .write.format("noop").mode("overwrite").save()
      }
      timed("consume: cluster resolve") {
        graft.operators.Dedup
          .resolveClustersLabeled(
            docs, "doc_id", graft.sources.Io.readDupGraphLabels(spark, gPath))
          .write.format("noop").mode("overwrite").save()
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
