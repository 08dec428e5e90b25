package graft

import graft.operators.{Checks, Dedup, Evaluation, Experiments, Graph, TextAnalysis}
import graft.sources.Io
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-curve benchmark for the families with superlinear risk —
  * the "one more decade up" evidence run: pair pipelines
  * (prefix-filtered Jaccard at t=0.8, MinHash-LSH), the dup-graph
  * lifecycle (build → upsert → takedown → compact → re-read),
  * postings build + latest read, and triangle counting — each timed
  * at data multipliers 1×/3×/10× of SPARK_GRAFT_SF_DIR (default
  * sf0.1, so 10× == sf1-scale: 50k docs / 6M lineitem rows).
  *
  * Amplification preserves WORKLOAD SHAPE instead of manufacturing
  * artificial dup explosions: copy i of a document suffixes every
  * token with `q<i>`, so each copy reproduces the base corpus's
  * full shingle/pair/cluster structure while copies share no
  * shingle (a verbatim ×10 replication would instead give every doc
  * 9 identical twins — 45× pair blowup that no real corpus decade
  * exhibits). Lineitem copies offset both keys, so the co-order
  * graph becomes N disjoint isomorphic components. The honest
  * expectation under this construction is ~linear wall growth with
  * the data ratio; anything superlinear beyond log factors is a
  * real scale defect in the operator under test.
  *
  * Per multiplier the run also reports the shingle-key skew
  * ([[Checks.skewReport]] over the exploded shingle table — the
  * shuffle-heaviest join key of the pair pipelines) so the scale
  * curve is read alongside the skew that drives it.
  *
  * Output: one JSON line (metric=scale) with per-family
  * {sec, rows} per multiplier, plus the same map written to the
  * round record (SPARK_GRAFT_SCALE_OUT, default SCALE_r09.json).
  * SPARK_GRAFT_SCALE_FAMILIES selects a subset of families for
  * targeted extra decades (the x100 run); the dup-graph family
  * reports per-step sub-timings so a steep decade is attributable
  * to pair discovery / closure / merge / takedown / compaction.
  */
object ScaleBench {

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** The Bench between-query hygiene: one family must not inherit
    * another's cached blocks or GC debt.
    */
  private def reset(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    System.gc()
  }

  private def deleteDir(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) { fs.delete(p, true); () }
  }

  private def amplifiedTable(
      spark: SparkSession,
      path: String,
      copies: Seq[DataFrame]): DataFrame = {
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path)))
      copies.reduce(_ unionByName _).write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
  }

  /** documents ×m: copy i offsets doc_id by i·1e6 and suffixes every
    * token with q<i> (copy 0 is the base verbatim).
    */
  private def slug(base: String): String = base.replaceAll("[^A-Za-z0-9]", "_")

  private def docsX(spark: SparkSession, base: String, m: Int): DataFrame = {
    val src = spark.read.parquet(s"$base/documents.parquet")
    amplifiedTable(
      spark,
      s"/tmp/graft_scale/${slug(base)}_docs_x$m",
      (0 until m).map { i =>
        val text =
          if (i == 0) col("text")
          else
            array_join(
              transform(split(col("text"), "\\s+"), t => concat(t, lit(s"q$i"))),
              " ")
        src.select(
          (col("doc_id") + lit(i.toLong * 1000000L)).as("doc_id"),
          text.as("text"),
          col("lang"),
          col("source"),
          col("n_chars"))
      })
  }

  /** lineitem (orderkey, partkey) ×m: both keys offset per copy →
    * N disjoint isomorphic co-order components.
    */
  private def coOrderX(spark: SparkSession, base: String, m: Int): DataFrame = {
    val src = spark.read.parquet(s"$base/lineitem.parquet")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
    amplifiedTable(
      spark,
      s"/tmp/graft_scale/${slug(base)}_coorder_x$m",
      (0 until m).map { i =>
        src.select(
          (col("o") + lit(i.toLong * 100000000L)).as("o"),
          (col("p") + lit(i.toLong * 100000000L)).as("p"))
      })
  }

  /** embeddings ×m: copy i offsets vec_id by i·1e6 and circularly
    * shifts the vector by i % dim positions — copies decorrelate
    * (distinct directions) while norms and the component
    * distribution are preserved, so the IVF cell balance scales the
    * way a real corpus decade would.
    */
  private def embsX(spark: SparkSession, base: String, m: Int): DataFrame = {
    val src = spark.read.parquet(s"$base/embeddings.parquet")
    amplifiedTable(
      spark,
      s"/tmp/graft_scale/${slug(base)}_embs_x$m",
      (0 until m).map { i =>
        val sh = i % 64
        val emb =
          if (sh == 0) col("embedding")
          else
            concat(
              slice(col("embedding"), sh + 1, 64 - sh),
              slice(col("embedding"), 1, sh))
        src.select(
          (col("vec_id") + lit(i.toLong * 1000000L)).as("vec_id"),
          emb.as("embedding"),
          col("label"))
      })
  }

  /** events ×m: copy i offsets user_id by i·1e7 and keeps event_type/
    * ts/value verbatim — rows and users scale with m while the VALUE
    * DOMAIN (distinct cent values, days, score grids) stays constant,
    * which is exactly the regime the rank/grid chassis (globalCumSum
    * count tables, kendall dense grids, calibration bins) claims to
    * be bounded by: the honest expectation is wall growth dominated
    * by the one row-linear aggregate/sort, with the grid-side work
    * flat.
    */
  private def eventsX(spark: SparkSession, base: String, m: Int): DataFrame = {
    val src = Engine.normalizeEventTs(spark.read.parquet(s"$base/events.parquet"))
      .select(col("user_id"), col("event_type"), col("ts"), col("value"))
    amplifiedTable(
      spark,
      s"/tmp/graft_scale/${slug(base)}_events_x$m",
      (0 until m).map { i =>
        src.select(
          (col("user_id") + lit(i.toLong * 10000000L)).as("user_id"),
          col("event_type"),
          col("ts"),
          col("value"))
      })
  }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mults = sys.env.getOrElse("SPARK_GRAFT_SCALE_MULTS", "1,3,10")
      .split(",").map(_.trim.toInt).toSeq
    // family selection for targeted decades (e.g. the x100 run cares
    // about the three families whose 30× step was steepest): comma
    // list of prefix_jaccard,minhash_lsh,dupgraph,postings,triangles,
    // ivf — default all
    val fams = sys.env.get("SPARK_GRAFT_SCALE_FAMILIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def on(f: String): Boolean = fams.forall(_.contains(f))
    val outFile = sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT", "SCALE_r10.json")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    // the partition-sweep knob (the x100 adjudication run): the r9
    // superlinear steps were attributed to fixed-32-partition spill;
    // this lets the same family run at 32/64/128/256 shuffle
    // partitions so the attribution is a measurement, not an argument
    val shuffleParts = sys.env.get("SPARK_GRAFT_SHUFFLE_PARTS").map(_.toInt)
    val spark = Engine.session("graft-scale", s"local[$cpus]", shuffleParts.getOrElse(cpus))
    shuffleParts.foreach(p => spark.conf.set("spark.sql.shuffle.partitions", p.toString))
    // the partitions-∝-input DEFAULT (the SCALE_r10 partition-sweep
    // lesson made operational): pair discovery at x100 wants shuffle
    // partitions scaled with the data multiplier (68 s at the fixed
    // 32 → ~44 s at ≥64), and AQE coalescing absorbs over-
    // provisioning on the small multipliers — so each multiplier runs
    // at max(cpus, cpus·m/10) unless SPARK_GRAFT_SHUFFLE_PARTS pins
    // an explicit sweep value
    def partsFor(m: Int): Int =
      shuffleParts.getOrElse(math.max(cpus, cpus * m / 10))

    // warmup (the Bench rule): JIT/codegen/shuffle machinery off the clock
    spark.read.parquet(s"$base/region.parquet").write.format("noop").mode("overwrite").save()

    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    mults.foreach { m =>
      spark.conf.set("spark.sql.shuffle.partitions", partsFor(m).toString)
      val docs = docsX(spark, base, m)
      val nDocs = docs.count()
      val parts = scala.collection.mutable.ArrayBuffer[String](s""""n_docs":$nDocs""")

      if (on("prefix_jaccard")) {
        reset(spark)
        val (pj, pjSec) = timed(
          Dedup.prefixJaccardPairs(docs, "text", "doc_id", 3, 0.8).count())
        parts += f""""prefix_jaccard":{"sec":$pjSec%.2f,"rows":$pj}"""
      }

      if (on("minhash_lsh")) {
        reset(spark)
        val (mh, mhSec) = timed(
          Dedup.minhashLshPairs(docs, "text", "doc_id", 3, 8, 1, 0.05).count())
        parts += f""""minhash_lsh":{"sec":$mhSec%.2f,"rows":$mh}"""
      }

      if (on("ngram_pairs")) {
        // the dup-graph lifecycle's pair-discovery step in isolation —
        // exactly the ngramJaccardPairs call dupgraph times as
        // pairs_sec, split out so the partition sweep re-runs ONLY the
        // step under adjudication
        reset(spark)
        val (np, npSec) = timed(
          Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, 0.2)
            .select(col("id_a"), col("id_b")).count())
        parts += f""""ngram_pairs":{"sec":$npSec%.2f,"rows":$np}"""
      }

      if (on("dupgraph")) {
        reset(spark)
        val gPath = s"/tmp/graft_scale/dupg_x$m"
        deleteDir(spark, gPath) // stale tombstones would poison a rebuilt base
        // per-step sub-timings so a steep decade is ATTRIBUTABLE: is
        // the growth in pair discovery, the base closure, the star
        // merge, the takedown re-closure, or compaction?
        val t0 = System.nanoTime()
        val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, 0.2)
          .select(col("id_a"), col("id_b"))
          .localCheckpoint() // one pipeline pass feeds base + increment
        val tPairs = (System.nanoTime() - t0) / 1e9
        val inBase =
          pmod(col("id_a"), lit(1000000L)) < 2500 &&
            pmod(col("id_b"), lit(1000000L)) < 2500
        val (_, tWrite) = timed(Io.writeDupGraph(pairs.filter(inBase), gPath))
        val (_, tUpsert) = timed(Io.upsertDupGraph(pairs.filter(!inBase), gPath, seq = 1L))
        val (_, tDelete) = timed(Io.deleteDupGraphDocs(
          docs.filter(col("doc_id") % 10 === 0).select(col("doc_id")), gPath, seq = 2L))
        val (_, tCompact) = timed(Io.compactDupGraph(spark, gPath))
        val (dg, tRead) = timed(Io.readDupGraphLabels(spark, gPath).count())
        val dgSec = tPairs + tWrite + tUpsert + tDelete + tCompact + tRead
        parts += f""""dupgraph_lifecycle":{"sec":$dgSec%.2f,"rows":$dg,""" +
          f""""pairs_sec":$tPairs%.2f,"write_sec":$tWrite%.2f,""" +
          f""""upsert_sec":$tUpsert%.2f,"delete_sec":$tDelete%.2f,""" +
          f""""compact_sec":$tCompact%.2f,"read_sec":$tRead%.2f}"""
      }

      if (on("postings")) {
        reset(spark)
        val pPath = s"/tmp/graft_scale/postings_x$m"
        deleteDir(spark, pPath)
        val (po, poSec) = timed {
          Io.writePostings(TextAnalysis.invertedIndex(docs, "text", "doc_id"), pPath, 64)
          Io.readPostingsLatest(spark, pPath).count()
        }
        parts += f""""postings_build":{"sec":$poSec%.2f,"rows":$po}"""
      }

      if (on("triangles")) {
        reset(spark)
        val co = coOrderX(spark, base, m)
        val (tr, trSec) = timed {
          val op = co.distinct()
          val edges = op.select(col("o"), col("p").as("id_a"))
            .join(op.select(col("o"), col("p").as("id_b")), Seq("o"))
            .filter(col("id_a") < col("id_b"))
            .groupBy(col("id_a"), col("id_b"))
            .agg(count(lit(1)).as("w"))
            .filter(col("w") >= 2)
            .select(col("id_a"), col("id_b"))
          Graph.triangleCounts(edges).count()
        }
        parts += f""""triangles":{"sec":$trSec%.2f,"rows":$tr}"""
      }

      if (on("louvain")) {
        // the Louvain ladder under co-purchase-graph growth (disjoint
        // isomorphic components per copy). Claims under adjudication:
        // the phase-1 move is EDGE-proportional (hash aggs over the
        // directed edge list + a 1-row argmax), coarsening is ONE
        // hash aggregate over the labeled edges, and the phase-2
        // weighted move runs on the COMMUNITY-bounded coarse graph —
        // the step a 100 TB hierarchy iterates should cost orders of
        // magnitude less than phase 1, and its wall should track
        // coarse rows, not corpus edges. No reset between steps: the
        // localCheckpointed edge/label frames are the measured
        // amortization (the dupgraph family's discipline).
        reset(spark)
        val co = coOrderX(spark, base, m)
        val t0 = System.nanoTime()
        val op = co.distinct()
        val edges = op.select(col("o"), col("p").as("id_a"))
          .join(op.select(col("o"), col("p").as("id_b")), Seq("o"))
          .filter(col("id_a") < col("id_b"))
          .groupBy(col("id_a"), col("id_b"))
          .agg(count(lit(1)).as("w"))
          .filter(col("w") >= 2)
          .select(col("id_a"), col("id_b"))
          .localCheckpoint()
        val nEdges = edges.count()
        val tEdges = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val labels = Graph.labelPropagation(edges, rounds = 4).localCheckpoint()
        labels.count()
        val tLab = (System.nanoTime() - t1) / 1e9
        val (_, tMove) = timed(
          Graph.modularity(edges, Graph.louvainBestMove(edges, labels)).count())
        val t2 = System.nanoTime()
        val coarse = Graph.louvainCoarsen(edges, labels).localCheckpoint()
        val coarseRows = coarse.count()
        val tCoarsen = (System.nanoTime() - t2) / 1e9
        val ident = coarse.select(col("id_a").as("id"))
          .unionAll(coarse.select(col("id_b").as("id")))
          .distinct()
          .select(col("id"), col("id").as("community"))
        val (_, tCmove) = timed(
          Graph.modularityWeighted(
            coarse, Graph.louvainBestMoveWeighted(coarse, ident)).count())
        val lvSec = tEdges + tLab + tMove + tCoarsen + tCmove
        parts += f""""louvain":{"sec":$lvSec%.2f,"rows":$nEdges,""" +
          f""""edges_sec":$tEdges%.2f,"labelprop_sec":$tLab%.2f,""" +
          f""""move_sec":$tMove%.2f,"coarsen_sec":$tCoarsen%.2f,""" +
          f""""coarse_rows":$coarseRows,"cmove_sec":$tCmove%.2f}"""
      }

      if (on("ivf")) {
        reset(spark)
        val embs = embsX(spark, base, m)
        val cents = embs
          .filter(col("vec_id").between(1, 16))
          .orderBy(col("vec_id"))
          .collect()
          .map(_.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray)
          .toSeq
        val qvec = cents.head
        val iPath = s"/tmp/graft_scale/ivf_x$m"
        deleteDir(spark, iPath)
        val (ib, ibSec) = timed {
          graft.sources.Io.writeIvfIndex(
            graft.operators.Similarity.ivfAssign(embs, "embedding", cents), cents, iPath)
          graft.sources.Io.readIvfIndex(spark, iPath)._2.count()
        }
        reset(spark)
        val (iq, iqSec) = timed {
          val (loadedCents, corpus) = graft.sources.Io.readIvfIndex(spark, iPath)
          graft.operators.Similarity
            .ivfTopK(corpus, "embedding", loadedCents, qvec, 10, 4)
            .count()
        }
        parts += f""""ivf_build":{"sec":$ibSec%.2f,"rows":$ib}"""
        parts += f""""ivf_topk":{"sec":$iqSec%.2f,"rows":$iq}"""
      }

      if (on("batchserve")) {
        // batched IVFADC serving under corpus growth at FIXED query
        // load (64 queries, 16 cells, probe 4): the encode/persist
        // step is row-linear by construction; the serving claim under
        // adjudication is that wall tracks the CANDIDATE set (the
        // probed ~4/16 of the corpus scanned as codes via the
        // broadcast hash join — the corpus itself never shuffles) and
        // the Q-side overhead (routing crossJoin, ADC arrays, final
        // per-qid windows over Q·shortlist rows) stays flat in m
        reset(spark)
        val embs = embsX(spark, base, m)
        val cents = embs
          .filter(col("vec_id").between(1, 16))
          .orderBy(col("vec_id"))
          .collect()
          .map(_.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray)
          .toSeq
        val books = (0 until 8).map(sp => cents.map(_.slice(sp * 8, (sp + 1) * 8)))
        val encPath = s"/tmp/graft_scale/ivfpq_enc_x$m"
        deleteDir(spark, encPath)
        val (eb, ebSec) = timed {
          graft.operators.Similarity
            .pqEncode(
              graft.operators.Similarity.ivfAssign(embs, "embedding", cents),
              "embedding", 8, books)
            .write.mode("overwrite").parquet(encPath)
          spark.read.parquet(encPath).count()
        }
        reset(spark)
        val (bq, bqSec) = timed {
          val encoded = spark.read.parquet(encPath)
          val centsDf = embs
            .filter(col("vec_id").between(1, 16))
            .select(
              (col("vec_id") - 1).cast("int").as("cell"),
              col("embedding").cast("array<double>").as("ce"))
          val cbDf = centsDf
            .select(col("cell").as("code"), col("ce"),
              explode(array((0 until 8).map(lit): _*)).as("s"))
            .select(col("s"), col("code"), slice(col("ce"), col("s") * 8 + 1, lit(8)).as("be"))
          val queries = embs
            .filter(col("vec_id").between(17, 80))
            .select(col("vec_id").as("qid"), col("embedding").cast("array<double>").as("qe"))
          graft.operators.Similarity
            .ivfPqTopKBatch(encoded, "embedding", centsDf, cbDf, queries,
              subDim = 8, nSub = 8, codeCount = 16, nprobe = 4, shortlist = 100, k = 10)
            .count()
        }
        parts += f""""ivfpq_encode":{"sec":$ebSec%.2f,"rows":$eb}"""
        parts += f""""batch_serve":{"sec":$bqSec%.2f,"rows":$bq}"""
      }

      if (on("rankstats")) {
        // the evaluation/rank-chassis wave (T185+): score-domain-
        // bounded grids under row growth — AUC's distinct-score count
        // table, kendall's dense 2-D grid (constant cells, growing
        // counts), QTE's per-arm distributed order statistics, and
        // the gains table's global rank
        val ev = eventsX(spark, base, m)
        val evFiltered = ev.filter(col("event_type").isNotNull && col("value").isNotNull)
        reset(spark)
        val (ra, raSec) = timed(
          Evaluation.rocAuc(
            evFiltered,
            col("event_type") === "purchase",
            round(col("value") * 100.0, 0).cast("long")).count())
        parts += f""""roc_auc":{"sec":$raSec%.2f,"rows":$ra}"""
        reset(spark)
        val (kt, ktSec) = timed(
          Checks.kendallTauB(
            ev.filter(col("value").isNotNull && col("ts").isNotNull),
            expr("CAST(round(value * 100) AS BIGINT) div 1000"),
            expr("CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01') AS BIGINT)")).count())
        parts += f""""kendall_tau":{"sec":$ktSec%.2f,"rows":$kt}"""
        reset(spark)
        val (qt, qtSec) = timed(
          Experiments.quantileTreatmentEffect(
            ev.filter(col("user_id").isNotNull && col("value").isNotNull),
            when(col("user_id") % 2 === 0, lit("A")).otherwise(lit("B")),
            round(col("value") * 100.0, 0).cast("long"),
            10).count())
        parts += f""""qte":{"sec":$qtSec%.2f,"rows":$qt}"""
        reset(spark)
        val (gn, gnSec) = timed {
          val per = ev
            .filter(col("user_id").isNotNull && col("value").isNotNull
              && col("event_type").isNotNull)
            .groupBy(col("user_id"))
            .agg(
              sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"),
              max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("buyer"))
          Evaluation
            .gainsTable(per, col("buyer") === 1L, col("cents"), col("user_id"), 10)
            .count()
        }
        parts += f""""gains":{"sec":$gnSec%.2f,"rows":$gn}"""
      }

      if (on("wealth")) {
        // the r10 wave: winsorized means (value-domain count grid +
        // two order-stat cutoffs) and the anytime-valid confidence
        // sequence (day-grid × 99-candidate wealth latch) — both
        // claim grid-bounded work under row growth
        val ev = eventsX(spark, base, m)
        reset(spark)
        val (wm, wmSec) = timed(
          Experiments.winsorizedMeans(
            ev.filter(col("user_id").isNotNull && col("value").isNotNull),
            when(col("user_id") % 2 === 0, lit("A")).otherwise(lit("B")),
            round(col("value") * 100.0, 0).cast("long"),
            10000L,
            990000L).count())
        parts += f""""winsorized":{"sec":$wmSec%.2f,"rows":$wm}"""
        reset(spark)
        val (cs, csSec) = timed(
          Experiments.eProcessConfidenceSeq(
            ev.filter(col("event_type").isNotNull && col("ts").isNotNull),
            col("event_type") === "purchase",
            to_date(col("ts")),
            500000L,
            50000L).count())
        parts += f""""eprocess_cs":{"sec":$csSec%.2f,"rows":$cs}"""
        // the r12 wave: the quantile CS — one row-linear grid fold,
        // then everything candidate×day bounded (the sign-test band
        // claims the cheapest family shape; this measures it)
        reset(spark)
        val (qcs, qcsSec) = timed(
          Experiments.eProcessQuantileCsFromCells(
            ev.filter(col("value").isNotNull && col("ts").isNotNull)
              .groupBy(
                to_date(col("ts")).as("day"),
                expr("CAST(round(value * 100) AS BIGINT) * 10").as("v"))
              .agg(count(lit(1)).as("n")),
            qPpm = 900000L,
            lambdaPpm = 500000L,
            alphaPpm = 50000L).count())
        parts += f""""quantile_cs":{"sec":$qcsSec%.2f,"rows":$qcs}"""
      }

      if (on("changepoint")) {
        // the T230-T231 wave: depth-2 binary segmentation (day-grid
        // moment cells + three grid-bounded scans) and the cluster
        // Poisson bootstrap (per-unit collapse, unit×100-rep weight
        // draws map-side combined to 100 arm-partial rows) — both
        // claim one row-linear pass with everything after bounded
        val ev = eventsX(spark, base, m)
        reset(spark)
        val (bs, bsSec) = timed(
          Checks.meanBinseg2(
            ev.filter(col("value").isNotNull && col("ts").isNotNull),
            round(col("value") * 100.0, 0).cast("long"),
            date_format(col("ts"), "yyyy-MM-dd")).count())
        parts += f""""mean_binseg":{"sec":$bsSec%.2f,"rows":$bs}"""
        reset(spark)
        val (pb, pbSec) = timed(
          Experiments.poissonBootDiff(
            ev,
            col("user_id"),
            col("user_id") % 2 === 0,
            round(col("value") * 100.0, 0).cast("long"),
            reps = 100).count())
        parts += f""""poisson_boot":{"sec":$pbSec%.2f,"rows":$pb}"""
      }

      if (on("survival")) {
        // the survival chassis (T187+): per-entity min/max aggregate
        // is the only row-proportional stage; the age grid is
        // calendar-bounded, so tests over it should stay flat
        val ev = eventsX(spark, base, m)
        val evG = ev
          .filter(col("user_id").isNotNull && col("ts").isNotNull)
          .select(
            col("user_id"),
            to_date(col("ts")).as("day"),
            when(col("user_id") % 2 === 0, lit("A")).otherwise(lit("B")).as("par"))
        reset(spark)
        val (lr, lrSec) = timed(
          graft.operators.Series.logRank(evG, "user_id", "day", "par", 3, 1).count())
        parts += f""""logrank":{"sec":$lrSec%.2f,"rows":$lr}"""
        reset(spark)
        val (ci, ciSec) = timed(
          graft.operators.Series
            .cumulativeIncidence(
              ev.filter(col("user_id").isNotNull && col("ts").isNotNull
                && col("event_type").isNotNull)
                .select(col("user_id"), to_date(col("ts")).as("day"), col("event_type")),
              "user_id", "day", "event_type", 3, 1)
            .count())
        parts += f""""cif":{"sec":$ciSec%.2f,"rows":$ci}"""
      }

      if (on("skew")) {
        reset(spark)
        val skew = Checks
          .skewReport(Dedup.shingleTable(docs, "text", "doc_id", 3), col("shingle"))
          .head()
        parts +=
          s""""shingle_skew":{"n_keys":${skew.getLong(0)},"total_rows":${skew.getLong(1)},""" +
            s""""max_n":${skew.getLong(2)},"p50_n":${skew.getLong(3)},""" +
            s""""p99_n":${skew.getLong(4)},"skew6":${skew.getLong(5)}}"""
      }

      out(s"x$m") = parts.mkString("{", ",", "}")
      System.err.println(s"[scale] x$m done: ${out(s"x$m")}")
    }

    val line =
      s"""{"metric":"scale","unit":"sec","base":"$base","cpus":$cpus,""" +
        s""""shuffle_partitions":${spark.conf.get("spark.sql.shuffle.partitions")},""" +
        out.map { case (k, v) => s""""$k":$v""" }.mkString(",") + "}"
    println(line)
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), line + "\n")
    catch { case e: Throwable => System.err.println(s"[scale] dump failed: ${e.getMessage}") }
    spark.stop()
  }
}
