package graft

import graft.streaming.Streams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming wave of the driver contract (SURVEY §2.11): each query
  * here actually RUNS Structured Streaming — a parquet file source
  * micro-batched by `Trigger.AvailableNow`, the §2.11 operator under
  * test, and a memory sink whose table is returned for the oracle
  * compare. The streams terminate (AvailableNow drains the source and
  * stops), so the results are finite and deterministic, and DuckDB can
  * mirror the semantics in batch SQL — the same batch/stream parity
  * the operators promise (`dags/orbit_daily_update_dag.py:126-299`
  * re-expressed as unbounded computation).
  */
object SparkEntryStreaming {

  /** events.parquet has shipped as TIMESTAMP(NANOS) (read as long
    * under nanosAsLong) and TIMESTAMP(MICROS) (read as NTZ) across
    * testdata generations; normalize to µs TIMESTAMP, the same loader
    * contract as the batch queries (Engine.normalizeEventTs).
    */
  private def eventStream(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    Engine.normalizeEventTs(
      s.readStream
        .schema(schema)
        // glob, not the bare file path: FileStreamSource derives its
        // basePath from the non-glob prefix, and a plain file path makes
        // it reject ("Option 'basePath' must be a directory")
        .parquet(s"$dir/[e]vents.parquet"))
  }

  /** Drain an AvailableNow stream into a named memory-sink table and
    * return it. The query name doubles as the sink table name.
    */
  private def drain(
      df: DataFrame,
      name: String,
      mode: String): DataFrame = {
    // State-store partition count is fixed at query start from
    // spark.sql.shuffle.partitions; at harness scale the per-partition
    // commit overhead (one delta file per state partition per batch)
    // dominates, so run the short-lived drain with fewer state
    // partitions and restore the session setting after. On a real
    // cluster a long-lived stream keeps the session default.
    val spark = df.sparkSession
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val q = df.writeStream
        .format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    spark.table(name)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // I5 as a live stream — daily tumbling counts per event type
    // through withWatermark + window(); complete mode so every window
    // is in the sink when the source drains
    "st_window_counts" -> { (s, dir) =>
      val counts = Streams.slidingCounts(
        eventStream(s, dir), "ts", "event_type", "1 day", "1 day")
      drain(counts, "st_window_counts_sink", "complete")
        .select(
          date_format(col("window_start"), "yyyy-MM-dd").as("d"),
          col("event_type"),
          col("n_events"))
        .orderBy(col("d"), col("event_type"))
    },
    // I1 as a live stream — flatMapGroupsWithState hash-transition
    // detection per user over the event-type sequence (event_id is the
    // replay clock: unique and monotone, so stream replay order and
    // the oracle's lag() order coincide exactly)
    "st_change_events" -> { (s, dir) =>
      import s.implicits._
      val updates = eventStream(s, dir)
        .select(
          col("user_id").cast("string").as("key"),
          col("event_type").as("content_hash"),
          timestamp_seconds(col("event_id")).as("ts"))
        .as[Streams.PageUpdate]
      drain(Streams.changeEvents(updates).toDF(), "st_change_events_sink", "append")
        .select(
          col("key"),
          coalesce(col("prev_hash"), lit("-")).as("prev_hash"),
          col("new_hash"))
        .orderBy(col("key"), col("prev_hash"), col("new_hash"))
    },
    // T112 as a live stream — stateful per-user transition pairing
    // via flatMapGroupsWithState (last state carries across
    // micro-batches; event_id is the replay clock, so emitted pairs
    // equal the batch lead() pairs exactly); the (from, to, n, p6)
    // matrix is a stateless batch fold over the drained pair sink
    "st_transitions" -> { (s, dir) =>
      import s.implicits._
      val updates = eventStream(s, dir)
        .select(
          col("user_id").cast("string").as("key"),
          col("event_type").as("content_hash"),
          timestamp_seconds(col("event_id")).as("ts"))
        .as[Streams.PageUpdate]
      val pairs =
        drain(Streams.transitionPairs(updates).toDF(), "st_transitions_sink", "append")
          .groupBy(col("from_state"), col("to_state"))
          .agg(count(lit(1)).as("n"))
      // rename before the self-join: both sides read the same memory
      // sink view, and a shared from_state attribute id trips the
      // analyzer's conflicting-references check
      val rowTot = pairs
        .groupBy(col("from_state").as("__fs"))
        .agg(sum(col("n")).as("__rt"))
      pairs
        .join(rowTot, col("from_state") === col("__fs"))
        .select(
          col("from_state"), col("to_state"), col("n"),
          expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * n div __rt AS BIGINT)").as("p6"))
        .orderBy(col("from_state"), col("to_state"))
    },
    // session windows as a live stream — gap-merged dynamic windows
    // per user through session_window(); complete mode so every
    // session is in the sink when the source drains. Session starts
    // ride out as epoch micros (integer-exact on both sides).
    "st_session_counts" -> { (s, dir) =>
      val sessions = Streams.sessionCounts(
        eventStream(s, dir), "ts", "user_id", "1 hour")
      drain(sessions, "st_session_counts_sink", "complete")
        .select(
          col("user_id"),
          unix_micros(col("session_start")).as("session_start_us"),
          col("n_events"))
        .orderBy(col("user_id"), col("session_start_us"))
    },
    // stream-static enrichment — the most common streaming shape:
    // each event joined to a static dimension (broadcast per
    // micro-batch, no stream state at all), append mode
    "st_enrich" -> { (s, dir) =>
      val dim = broadcast(
        s.read.parquet(s"$dir/customer.parquet")
          .filter(col("c_custkey") < 150)
          .select(col("c_custkey").as("user_id"), col("c_mktsegment").as("segment")))
      val enriched = eventStream(s, dir)
        .filter(col("event_type") === "purchase")
        .join(dim, Seq("user_id"), "left")
        .select(
          col("event_id"),
          col("user_id"),
          coalesce(col("segment"), lit("UNKNOWN")).as("segment"))
      drain(enriched, "st_enrich_sink", "append")
        .orderBy(col("event_id"))
    },
    // stream-stream event-time interval join — purchases paired with
    // the same user's clicks in the preceding 4 hours, both sides
    // watermarked (365 days > the table's span, so no state evicts
    // mid-drain and the result is the exact interval join)
    "st_stream_join" -> { (s, dir) =>
      val ev = eventStream(s, dir)
      val purchases = ev
        .filter(col("event_type") === "purchase")
        .select(
          col("user_id").as("p_user"),
          col("event_id").as("purchase_id"),
          col("ts").as("p_ts"))
      val clicks = ev
        .filter(col("event_type") === "click")
        .select(
          col("user_id").as("c_user"),
          col("event_id").as("click_id"),
          col("ts").as("c_ts"))
      val joined = Streams.intervalJoin(
        purchases, clicks, "p_user", "c_user", "p_ts", "c_ts",
        lookback = "4 hours", watermark = "365 days")
      drain(
        joined.select(col("p_user").as("user_id"), col("purchase_id"), col("click_id")),
        "st_stream_join_sink",
        "append")
        .orderBy(col("user_id"), col("purchase_id"), col("click_id"))
    },
    // I1/I3 as a live stream — watermark-bounded streaming dedup; only
    // the dedup key is projected so the kept-row choice inside a
    // micro-batch can't leak nondeterminism into the result
    "st_dedup_keys" -> { (s, dir) =>
      val deduped = Streams.dedupByContentHash(
        eventStream(s, dir),
        "ts",
        Seq("user_id"),
        "event_type",
        // delay longer than the table's time span: state never expires
        // mid-drain, so the stream computes an exact distinct
        watermark = "365 days")
      drain(
        deduped.select(col("user_id"), col("event_type")),
        "st_dedup_keys_sink",
        "append")
        .orderBy(col("user_id"), col("event_type"))
    },
    // dd_incremental as a LIVE stream — the daily-ingest shape with
    // the batch arriving as a file stream: stream-static inner join
    // re-posts every 5th doc's historical text, streaming
    // dropDuplicates dedups within the stream, and a stream-static
    // broadcast ANTI join drops anything whose fingerprint the
    // historical corpus already has. Exactly dd_incremental's
    // semantics, so its oracle SQL carries over verbatim.
    "st_incremental" -> { (s, dir) =>
      val schema = s.read.parquet(s"$dir/documents.parquet").schema
      val hist = s.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") < 250)
        .select(col("doc_id").as("h_id"), col("text").as("h_text"))
      val histFps = hist
        .select(graft.functions.TextFns.fingerprint(col("h_text")).as("fp"))
        .distinct()
      val batch = s.readStream
        .schema(schema)
        .parquet(s"$dir/[d]ocuments.parquet")
        .filter(col("doc_id") >= 250)
        .join(hist, col("doc_id") - 250 === col("h_id"))
        .select(
          col("doc_id"),
          when(col("doc_id") % 5 === 0, col("h_text")).otherwise(col("text")).as("text"))
        .select(
          col("doc_id"),
          graft.functions.TextFns.fingerprint(col("text")).as("fp"))
        .dropDuplicates("fp")
        .join(broadcast(histFps), Seq("fp"), "left_anti")
      drain(batch.select(col("doc_id"), col("fp")), "st_incremental_sink", "append")
        .orderBy(col("doc_id"))
    },
    // The corpus funnel as a live stream (Corpus.streamFunnel): gates
    // and sample per-row, exact dedup via state-store dropDuplicates,
    // decontamination via the benchmark's constant shingle-hash set —
    // semantics identical to t_funnel_e2e, whose oracle is shared
    "st_funnel" -> { (s, dir) =>
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val stream = s.readStream
        .schema(docs.schema)
        .parquet(s"$dir/[d]ocuments.parquet")
        .filter(col("source") =!= "src0")
      val funneled = graft.pipelines.Corpus
        .streamFunnel(
          stream,
          docs.filter(col("source") === "src0"),
          "text",
          "doc_id",
          SparkEntry.langMarkers,
          keepLang = "dataish",
          SparkEntry.qualityStops,
          minQuality = 0.5,
          shingleN = 3,
          sampleFraction = 0.5)
        .select(col("doc_id"), col("source"), col("lang_pred"), col("quality"))
      drain(funneled, "st_funnel_sink", "append")
        .orderBy(col("doc_id"))
    },
    // dd_incremental_neardup as a LIVE stream — the reference's daily
    // incremental with NEAR-dup hygiene: each micro-batch runs
    // MinHash-LSH against the static history table inside
    // foreachBatch (the per-batch escape hatch for operators whose
    // multi-join shape the streaming planner can't host), and only
    // docs with no history near-dup survive to the sink. Near-dup-
    // vs-static is stateless across batches, so per-batch application
    // computes exactly the batch result at ANY batch split — the
    // batch query's oracle carries over verbatim. At scale the
    // history side is the persisted signature table, re-read per
    // batch (incremental index maintenance is the i3 upsert's job).
    "st_incremental_neardup" -> { (s, dir) =>
      val d = s.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("text"))
      val hist = d.filter(col("doc_id") < 250)
      val schema = s.read.parquet(s"$dir/documents.parquet").schema
      val stream = s.readStream
        .schema(schema)
        .parquet(s"$dir/[d]ocuments.parquet")
        .filter(col("doc_id") >= 250)
        .join(
          hist.select(col("doc_id").as("h_id"), col("text").as("h_text")),
          col("doc_id") - 250 === col("h_id"))
        .select(
          col("doc_id"),
          when(
            col("doc_id") % 7 === 0,
            concat(col("h_text"), lit(" data stream batch"))).otherwise(col("text")).as("text"))
      val outPath = s"/tmp/graft_stream/st_incr_neardup"
      val q = stream.writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          val matched = graft.operators.Dedup
            .minhashLshAgainst(batch, hist, "text", "doc_id", 3, 8, 1, 0.3)
            .select(col("id_a").as("m_id"))
            .distinct()
          batch
            .join(matched, col("doc_id") === col("m_id"), "left_anti")
            .select(col("doc_id"))
            .write.mode(if (batchId == 0) "overwrite" else "append").parquet(outPath)
          // minhashLshAgainst persists signature tables internally;
          // drop them so a multi-batch drain doesn't accumulate blocks
          batch.sparkSession.catalog.clearCache()
          (): Unit
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(outPath).orderBy(col("doc_id"))
    },
    // Streaming KMV: the per-source vocabulary-size sketch maintained
    // live over the document stream (update-on-every-batch cardinality
    // monitoring). KMV's buffer is a pure order statistic with
    // commutative, duplicate-absorbing merges, so the drained stream's
    // sketch is BIT-IDENTICAL to the batch sketch over the same rows —
    // the oracle recomputes it exactly, no parity caveats needed
    "st_kmv_distinct" -> { (s, dir) =>
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val tok = s.readStream
        .schema(docs.schema)
        .parquet(s"$dir/[d]ocuments.parquet")
        .filter(length(trim(col("text"))) > 0)
        .select(
          col("source"),
          explode(graft.functions.TextFns.tokens(col("text"))).as("term"))
      val sketch = graft.operators.Sketches
        .kmvDistinct(tok, Seq(col("source")), col("term"), 64)
      drain(sketch, "st_kmv_distinct_sink", "complete")
        .orderBy(col("source"))
    },
    // Streaming HLL maintenance: each micro-batch appends its OWN
    // register partials (Sketches.hllRegisters over the batch's
    // tokens) to the parquet artifact; register max is the lossless
    // union, so the read-side max-merge + estimate equals a
    // full-rescan batch build EXACTLY — the fixed-size-sketch member
    // of the streamed-partial family (st_hist_quantile's SUM
    // linearity, here MAX linearity). Shares a_hll_merged's
    // full-rescan oracle.
    "st_hll_distinct" -> { (s, dir) =>
      val hPath = s"/tmp/graft_idx/hllst_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val docs = s.read.parquet(s"$dir/documents.parquet")
      def toks(df: DataFrame): DataFrame = df
        .filter(length(trim(col("text"))) > 0)
        .select(explode(graft.functions.TextFns.tokens(col("text"))).as("term"))
      graft.operators.Sketches
        .hllRegisters(toks(docs.filter(lit(false))), Nil, col("term"), 10)
        .write.mode("overwrite").parquet(hPath)
      val stream = s.readStream.schema(docs.schema).parquet(s"$dir/[d]ocuments.parquet")
      val q = stream.writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          graft.operators.Sketches
            .hllRegisters(toks(batch), Nil, col("term"), 10)
            .write.mode("append").parquet(hPath)
          (): Unit
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      graft.operators.Sketches
        .hllEstimate(graft.operators.Sketches.hllMerge(s.read.parquet(hPath)), 10)
        .crossJoin(broadcast(
          toks(docs).agg(countDistinct(col("term")).as("n_exact"))))
        .select(col("n_exact"), col("n_occupied"), col("hll_est"))
    },
    // Streaming index maintenance: a live stream of corrected vectors
    // upserts into the persisted IVF index per micro-batch (seq =
    // batchId+1 — later batches win; the base build holds stale
    // reversed embeddings for exactly those ids), then the read-side
    // last-wins view serves the same top-k the batch upsert query
    // proves — the reference's daily incremental, unbounded
    // Streaming signature-artifact maintenance — st_ivf_upsert's
    // mirror for the 6th family: the re-crawled docs stream in, each
    // micro-batch re-signs them (one shingle pass over the increment
    // only) and appends with seq = batchId+1; the last-wins read then
    // hands the daily near-dup run the SAME history the batch path
    // (dd_sigs_upsert) proves, completing batch/stream symmetry.
    "st_sigs_upsert" -> { (s, dir) =>
      val d = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val stale = d.filter(col("doc_id") < 250).select(
        col("doc_id"),
        when(
          col("doc_id") % 9 === 0,
          lit("stale placeholder page content pending recrawl nothing indexed here"))
          .otherwise(col("text")).as("text"))
      val aPath = s"/tmp/graft_idx/sigs_st_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      graft.sources.Io.writeMinhashSigs(
        graft.operators.Dedup.minhashSign(stale, "text", "doc_id", 3, 8),
        aPath, buckets = 8)
      val stream = s.readStream
        .schema(s.read.parquet(s"$dir/documents.parquet").schema)
        .parquet(s"$dir/[d]ocuments.parquet")
        .filter(col("doc_id") < 250 && col("doc_id") % 9 === 0)
        .select(col("doc_id"), col("text"))
      val q = stream.writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          graft.sources.Io.upsertMinhashSigs(
            graft.operators.Dedup.minhashSign(batch, "text", "doc_id", 3, 8),
            aPath,
            seq = batchId + 1L)
          (): Unit
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      graft.operators.Dedup
        .minhashLshAgainstSigs(
          d.filter(col("doc_id") >= 250),
          graft.sources.Io.readMinhashSigsLatest(s, aPath),
          "text", "doc_id", 3, 8, 1, 0.05)
        .select(col("id_a"), col("id_b"))
        .orderBy(col("id_a"), col("id_b"))
    },
    "st_ivf_upsert" -> { (s, dir) =>
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val cents = emb
        .filter(col("vec_id").between(1, 4))
        .orderBy(col("vec_id"))
        .collect()
        .map(_.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray)
        .toSeq
      val query = emb
        .filter(col("vec_id") === 0)
        .collect()
        .head
        .getAs[scala.collection.Seq[Float]]("embedding")
        .map(_.toDouble)
        .toArray
      val corpus = emb.filter(col("vec_id") =!= 0)
      val stale = corpus.withColumn(
        "embedding",
        when(col("vec_id") % 5 === 0, reverse(col("embedding")))
          .otherwise(col("embedding")))
      val idxPath = s"/tmp/graft_idx/ivf_stup_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      graft.sources.Io.writeIvfIndex(
        graft.operators.Similarity.ivfAssign(stale, "embedding", cents),
        cents,
        idxPath)
      val stream = s.readStream
        .schema(emb.schema)
        .parquet(s"$dir/[e]mbeddings.parquet")
        .filter(col("vec_id") =!= 0 && col("vec_id") % 5 === 0)
      val q = stream.writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          graft.sources.Io.upsertIvfIndex(
            graft.operators.Similarity.ivfAssign(batch, "embedding", cents),
            idxPath,
            seq = batchId + 1L)
          (): Unit
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val (loadedCents, latest) =
        graft.sources.Io.readIvfIndexLatest(s, idxPath, "vec_id")
      graft.operators.Similarity
        .ivfTopK(latest, "embedding", loadedCents, query, 10, 2)
        .select(col("vec_id"), col("label"), col("cell"), col("score"))
    },
    // Streaming PQ index maintenance — st_ivf_upsert's mirror for the
    // byte-coded layout: corrected vectors stream in, each micro-batch
    // re-encodes them against the FROZEN codebooks and appends with
    // seq = batchId+1; the last-wins read then serves the same top-k
    // the batch path (v_pq_upsert) proves, completing batch/stream
    // symmetry for both persistent ANN index families
    "st_pq_upsert" -> { (s, dir) =>
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val full = emb
        .filter(col("vec_id").between(1, 4))
        .orderBy(col("vec_id"))
        .collect()
        .map(_.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray)
      val query = emb
        .filter(col("vec_id") === 0)
        .collect()
        .head
        .getAs[scala.collection.Seq[Float]]("embedding")
        .map(_.toDouble)
        .toArray
      val subDim = 8
      val centroids =
        (0 until 8).map(sub => full.toSeq.map(_.slice(sub * subDim, (sub + 1) * subDim)))
      val corpus = emb.filter(col("vec_id") =!= 0)
      val stale = corpus.withColumn(
        "embedding",
        when(col("vec_id") % 5 === 0, reverse(col("embedding")))
          .otherwise(col("embedding")))
      val idxPath = s"/tmp/graft_idx/pq_stup_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      graft.sources.Io.writePqIndex(
        graft.operators.Similarity.pqEncode(stale, "embedding", subDim, centroids),
        centroids,
        idxPath)
      val stream = s.readStream
        .schema(emb.schema)
        .parquet(s"$dir/[e]mbeddings.parquet")
        .filter(col("vec_id") =!= 0 && col("vec_id") % 5 === 0)
      val q = stream.writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          graft.sources.Io.upsertPqIndex(
            graft.operators.Similarity.pqEncode(batch, "embedding", subDim, centroids),
            idxPath,
            seq = batchId + 1L)
          (): Unit
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val (books, latest) = graft.sources.Io.readPqIndexLatest(s, idxPath, "vec_id")
      graft.operators.Similarity
        .pqTopK(latest, "embedding", books, query, subDim, 50, 10)
        .select(col("vec_id"), col("label"), col("approx_score"), col("score"))
    },
    // Streaming COMPOSED-index maintenance — the IVFADC hybrid's
    // st_pq_upsert twin: the base build lands every 5th vector STALE
    // (reversed — assigned AND encoded as such, so its cell tag and
    // codes are both wrong), corrections stream in, and each
    // micro-batch re-ASSIGNS + re-encodes its rows against the FROZEN
    // coarse centroids and codebooks before appending with
    // seq = batchId+1. Because the cell tag and the byte codes live in
    // the same row, last-wins id resolution fixes a vector that moved
    // across coarse cells with no separate cell-tombstone machinery —
    // the composed-mutation invariant, now proven from the stream
    // path. The converged hybrid must equal the plain table's
    // (v_ivfpq_topk's oracle, shared three ways: in-line, batch
    // upsert, stream upsert).
    "st_ivfpq_upsert" -> { (s, dir) =>
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val full = emb
        .filter(col("vec_id").between(1, 4))
        .orderBy(col("vec_id"))
        .collect()
        .map(_.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray)
      val query = emb
        .filter(col("vec_id") === 0)
        .collect()
        .head
        .getAs[scala.collection.Seq[Float]]("embedding")
        .map(_.toDouble)
        .toArray
      val subDim = 8
      val cents = full.toSeq
      val books =
        (0 until 8).map(sp => full.toSeq.map(_.slice(sp * subDim, (sp + 1) * subDim)))
      val corpus = emb.filter(col("vec_id") =!= 0)
      val stale = corpus.withColumn(
        "embedding",
        when(col("vec_id") % 5 === 0, reverse(col("embedding")))
          .otherwise(col("embedding")))
      val ivfPath = s"/tmp/graft_idx/ivfpq_sc_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val pqPath = s"/tmp/graft_idx/ivfpq_sp_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val staleEnc = graft.operators.Similarity.pqEncode(
        graft.operators.Similarity.ivfAssign(stale, "embedding", cents),
        "embedding", subDim, books)
      graft.sources.Io.writeIvfIndex(
        staleEnc.select(col("vec_id"), col("cell")), cents, ivfPath)
      graft.sources.Io.writePqIndex(staleEnc, books, pqPath)
      val stream = s.readStream
        .schema(emb.schema)
        .parquet(s"$dir/[e]mbeddings.parquet")
        .filter(col("vec_id") =!= 0 && col("vec_id") % 5 === 0)
      val q = stream.writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          graft.sources.Io.upsertPqIndex(
            graft.operators.Similarity.pqEncode(
              graft.operators.Similarity.ivfAssign(batch, "embedding", cents),
              "embedding", subDim, books),
            pqPath,
            seq = batchId + 1L)
          (): Unit
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val (loadedCents, _) = graft.sources.Io.readIvfIndex(s, ivfPath)
      val (loadedBooks, latest) = graft.sources.Io.readPqIndexLatest(s, pqPath, "vec_id")
      graft.operators.Similarity
        .ivfPqTopK(latest, "embedding", loadedCents, loadedBooks, query, subDim,
          nprobe = 2, shortlist = 50, k = 10)
        .select(col("vec_id"), col("label"), col("approx_score"), col("score"))
    },
    // Streaming VOLUME gate — the dq_volume_anomaly check fed by the
    // live intake: each micro-batch appends its PARTIAL (type, day)
    // counts to a persisted count artifact (no state store needed —
    // counts are linear), and the gate scores the SUM-merged table
    // with Checks.volumeAnomalyFromCounts. Must equal the batch gate
    // exactly — shared oracle.
    "st_volume_anomaly" -> { (s, dir) =>
      val cPath = s"/tmp/graft_idx/volcnt_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val ev = Engine.normalizeEventTs(s.read.parquet(s"$dir/events.parquet"))
      // fresh empty base with the partial-count schema (clears any
      // prior run's appends)
      ev.filter(lit(false))
        .select(
          col("event_type").cast("string").as("grp"),
          date_format(col("ts"), "yyyy-MM-dd").as("bucket"),
          lit(0L).as("n"))
        .write.mode("overwrite").parquet(cPath)
      val q = eventStream(s, dir).writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch
            .groupBy(
              col("event_type").cast("string").as("grp"),
              date_format(col("ts"), "yyyy-MM-dd").as("bucket"))
            .agg(count(lit(1)).as("n"))
            .write.mode("append").parquet(cPath)
          (): Unit
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      graft.operators.Checks
        .volumeAnomalyFromCounts(
          s.read.parquet(cPath)
            .groupBy(col("grp"), col("bucket"))
            .agg(sum(col("n")).as("n")),
          window = 7,
          minWindow = 3,
          zThreshold = 3.0)
        .orderBy(col("grp"), col("bucket"))
    },
    // Streaming EXPERIMENT monitor — the a_ab_test readout fed by
    // the live intake: each micro-batch appends its PARTIAL (group,
    // variant, n, x) cells to a persisted cell artifact (counts are
    // linear — no state store), and the monitor scores the SUM-merged
    // cells with Experiments.twoProportionZFromCells. The cells are
    // the test's sufficient statistic, so this must equal the
    // one-shot batch z-test exactly — shared oracle.
    "st_ab_test" -> { (s, dir) =>
      val cPath = s"/tmp/graft_idx/abcells_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val ev = Engine.normalizeEventTs(s.read.parquet(s"$dir/events.parquet"))
      // fresh empty base with the partial-cell schema (clears any
      // prior run's appends)
      ev.filter(lit(false))
        .select(
          col("event_type").cast("string").as("g"),
          lit("A").as("v"),
          lit(0L).as("n"),
          lit(0L).as("x"))
        .write.mode("overwrite").parquet(cPath)
      val q = eventStream(s, dir).writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch
            .filter(col("user_id").isNotNull && col("value").isNotNull &&
              col("event_type").isNotNull)
            .groupBy(
              col("event_type").cast("string").as("g"),
              when(col("user_id") % 2 === 0, lit("A")).otherwise(lit("B")).as("v"))
            .agg(
              count(lit(1)).as("n"),
              sum((col("value") > 50.0).cast("long")).as("x"))
            .write.mode("append").parquet(cPath)
          (): Unit
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      graft.operators.Experiments
        .twoProportionZFromCells(
          s.read.parquet(cPath)
            .groupBy(col("g"), col("v"))
            .agg(sum(col("n")).as("n"), sum(col("x")).as("x")))
        .orderBy(col("group"))
    },
    // Streaming KRUSKAL-WALLIS monitor — ranks are NOT mergeable, but
    // the rank test's sufficient statistic IS: the (value, arm) count
    // grid is linear, so micro-batches append partial grids to a
    // persisted artifact and the monitor recomputes the ranks over
    // the value-domain-bounded sum-merge. Must equal the one-shot
    // batch test exactly — shared oracle.
    "st_kruskal" -> { (s, dir) =>
      val cPath = s"/tmp/graft_idx/kwgrid_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val ev = Engine.normalizeEventTs(s.read.parquet(s"$dir/events.parquet"))
      ev.filter(lit(false))
        .select(lit(0L).as("v"), col("event_type").cast("string").as("arm"), lit(0L).as("c"))
        .write.mode("overwrite").parquet(cPath)
      val q = eventStream(s, dir).writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch
            .filter(col("event_type").isNotNull && col("value").isNotNull)
            .groupBy(
              round(col("value") * 100.0, 0).cast("long").as("v"),
              col("event_type").cast("string").as("arm"))
            .agg(count(lit(1)).as("c"))
            .write.mode("append").parquet(cPath)
          (): Unit
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      graft.operators.Experiments.kruskalWallisFromCounts(
        s.read.parquet(cPath)
          .groupBy(col("v"), col("arm"))
          .agg(sum(col("c")).as("c")))
    },
    // Streaming group-sequential monitor — the OBF boundary check IS
    // naturally a streaming job (peek as traffic arrives): per-batch
    // partial (g, v, look, n, x) cells SUM-merge exactly (the
    // st_kruskal sufficient-statistic posture), the monitor re-runs
    // the gap-filled cumulative pivot over the merged looks-bounded
    // grid — bit-equal to the batch a_obf_looks under one oracle.
    "st_obf_looks" -> { (s, dir) =>
      val cPath = s"/tmp/graft_idx/obfgrid_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val ev = Engine.normalizeEventTs(s.read.parquet(s"$dir/events.parquet"))
      ev.filter(lit(false))
        .select(
          col("event_type").cast("string").as("g"), lit("A").as("v"),
          lit(0L).as("look"), lit(0L).as("n"), lit(0L).as("x"))
        .write.mode("overwrite").parquet(cPath)
      val q = eventStream(s, dir).writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch
            .filter(
              col("user_id").isNotNull && col("value").isNotNull &&
                col("ts").isNotNull && col("event_type").isNotNull)
            .groupBy(
              col("event_type").cast("string").as("g"),
              when(col("user_id") % 2 === 0, lit("A")).otherwise(lit("B")).as("v"),
              least(
                lit(5L),
                lit(1L) + expr(
                  "CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01') div 6 AS BIGINT)"))
                .as("look"))
            .agg(
              count(lit(1)).as("n"),
              sum((col("value") > 50.0).cast("long")).as("x"))
            .write.mode("append").parquet(cPath)
          (): Unit
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      graft.operators.Experiments
        .obfLooks5FromCells(
          s.read.parquet(cPath)
            .groupBy(col("g"), col("v"), col("look"))
            .agg(sum(col("n")).as("n"), sum(col("x")).as("x")))
        .orderBy(col("group"), col("look"))
    },
    // Streaming LM maintenance — the 7th artifact family's live
    // increment: the base model's count grids hold the historical
    // half, document micro-batches append their PARTIAL grids
    // (counts are linear — per-batch grids SUM-merge exactly, no
    // refit, no token-stream rescan), and the model derived from the
    // merged artifact must score bit-identically to the in-line
    // full-corpus fit — t_perplexity_bigram's oracle, shared three
    // ways (in-line, batch upsert, stream).
    "st_lm_upsert" -> { (s, dir) =>
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val p = s"/tmp/graft_idx/lmc_stup_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val (u0, b0) = SparkEntryCoverage.lmCountGrids(s, dir, "lt250")
      graft.sources.Io.writeLmCounts(u0, b0, p)
      val stream = s.readStream
        .schema(docs.schema)
        .parquet(s"$dir/[d]ocuments.parquet")
        .filter(col("doc_id") >= 250)
      val q = stream.writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          val (ub, bb) =
            graft.operators.TextAnalysis.bigramCountGrids(batch, "text")
          graft.sources.Io.upsertLmCounts(ub, bb, p, seq = batchId + 1L)
          (): Unit
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val (mu, mb) = graft.sources.Io.readLmCounts(s, p)
      graft.operators.TextAnalysis
        .scoreBigramLm(docs, "text", "doc_id",
          graft.operators.TextAnalysis.fitBigramLmFromCounts(mu, mb))
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"))
    },
    // Streaming Mann-Kendall trend monitor — sign sums over day pairs
    // are not mergeable, but the DAILY COUNT GRID is (per-batch
    // partial counts SUM-merge exactly, the st_kruskal sufficient-
    // statistic posture): micro-batches append partial (key, day, n)
    // grids, the monitor re-runs the trend test over the merged
    // day-bounded grid. Bit-equal to the batch w_mann_kendall under
    // the shared oracle.
    "st_mann_kendall" -> { (s, dir) =>
      val cPath = s"/tmp/graft_idx/mkgrid_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val ev = Engine.normalizeEventTs(s.read.parquet(s"$dir/events.parquet"))
      ev.filter(lit(false))
        .select(
          col("event_type").cast("string").as("k"),
          to_date(col("ts")).as("day"),
          lit(0L).as("n"))
        .write.mode("overwrite").parquet(cPath)
      val q = eventStream(s, dir).writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch
            .groupBy(
              col("event_type").cast("string").as("k"),
              to_date(col("ts")).as("day"))
            .agg(count(lit(1)).as("n"))
            .write.mode("append").parquet(cPath)
          (): Unit
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      graft.operators.Series
        .mannKendallDaily(
          s.read.parquet(cPath)
            .groupBy(col("k"), col("day"))
            .agg(sum(col("n")).as("n")),
          "k", "day", "n")
        .withColumnRenamed("k", "event_type")
        .orderBy(col("event_type"))
    },
    // Streaming anytime-valid e-process monitor — the natural home of
    // an always-valid test (peek as traffic arrives, Ville covers
    // every peek): per-batch partial (day, n, x) grids SUM-merge
    // exactly (the st_mann_kendall sufficient-statistic posture), the
    // monitor re-runs the exact affine wealth readout over the merged
    // day-bounded grid — bit-equal to the batch a_eprocess under one
    // shared oracle.
    "st_eprocess" -> { (s, dir) =>
      val cPath = s"/tmp/graft_idx/epgrid_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val ev = Engine.normalizeEventTs(s.read.parquet(s"$dir/events.parquet"))
      ev.filter(lit(false))
        .select(to_date(col("ts")).as("day"), lit(0L).as("n"), lit(0L).as("x"))
        .write.mode("overwrite").parquet(cPath)
      val q = eventStream(s, dir).writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch
            .filter(col("event_type").isNotNull && col("ts").isNotNull)
            .groupBy(to_date(col("ts")).as("day"))
            .agg(
              count(lit(1)).as("n"),
              sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("x"))
            .write.mode("append").parquet(cPath)
          (): Unit
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      graft.operators.Experiments
        .eProcessFromCells(
          s.read.parquet(cPath),
          p0Ppm = 200000L,
          lambdaPpm = 300000L,
          alphaPpm = 50000L)
        .withColumn("day", date_format(col("day"), "yyyy-MM-dd"))
        .orderBy(col("day"))
    },
    // Streaming e-BH — the FDR composition fed from the live intake:
    // each micro-batch appends its PARTIAL per-bucket (hyp, n, x)
    // counts (linear — no state store), the merged grid folds to one
    // final-wealth e-value per bucket with the shared micro-nat
    // constants, and ONE e-BH pass over those 20 e-values re-runs
    // bit-equal to the batch readout (a_ebh_rates' oracle shared) —
    // the monitor-of-monitors posture: the family's rejection set is
    // itself a sufficient-statistic readout.
    "st_ebh_rates" -> { (s, dir) =>
      val cPath = s"/tmp/graft_idx/ebhgrid_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val ev = Engine.normalizeEventTs(s.read.parquet(s"$dir/events.parquet"))
      ev.filter(lit(false))
        .select((col("user_id") % 20).as("hyp"), lit(0L).as("n"), lit(0L).as("x"))
        .write.mode("overwrite").parquet(cPath)
      val q = eventStream(s, dir).writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch
            .filter(
              col("event_type").isNotNull && col("ts").isNotNull &&
                col("user_id").isNotNull)
            .groupBy((col("user_id") % 20).as("hyp"))
            .agg(
              count(lit(1)).as("n"),
              sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("x"))
            .write.mode("append").parquet(cPath)
          (): Unit
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val (a6, b6, _) =
        graft.operators.Experiments.eProcessConstants(150000L, 300000L, 50000L)
      val evals = s.read.parquet(cPath)
        .groupBy(col("hyp"))
        .agg(sum(col("n")).as("n"), sum(col("x")).as("x"))
        .select(
          col("hyp"),
          (col("x").cast("decimal(38,0)") * a6 +
            (col("n") - col("x")).cast("decimal(38,0)") * b6).cast("long").as("ln_e6"))
      graft.operators.Experiments.eBhRejections(evals, alphaPpm = 50000L)
    },
    // Streaming anytime-valid confidence SEQUENCE — the band off the
    // SAME (day, n, x) sufficient statistic st_eprocess appends: the
    // monitor re-runs the 99-candidate two-sided wealth latch over
    // the merged grid — bit-equal to the batch a_eprocess_cs under
    // one shared oracle. A live always-valid band with zero history
    // re-scans.
    "st_eprocess_cs" -> { (s, dir) =>
      val cPath = s"/tmp/graft_idx/epcsgrid_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val ev = Engine.normalizeEventTs(s.read.parquet(s"$dir/events.parquet"))
      ev.filter(lit(false))
        .select(to_date(col("ts")).as("day"), lit(0L).as("n"), lit(0L).as("x"))
        .write.mode("overwrite").parquet(cPath)
      val q = eventStream(s, dir).writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch
            .filter(col("event_type").isNotNull && col("ts").isNotNull)
            .groupBy(to_date(col("ts")).as("day"))
            .agg(
              count(lit(1)).as("n"),
              sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("x"))
            .write.mode("append").parquet(cPath)
          (): Unit
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      graft.operators.Experiments
        .eProcessConfidenceSeqFromCells(
          s.read.parquet(cPath),
          lambdaPpm = 500000L,
          alphaPpm = 50000L)
        .withColumn("day", date_format(col("day"), "yyyy-MM-dd"))
        .orderBy(col("day"))
    },
    // Streaming depth-2 changepoint localization — the WHERE readout
    // off the SAME (day, n, x) sufficient statistic st_eprocess
    // appends (partial grids SUM-merge exactly): micro-batches append
    // partial purchase-rate grids, the monitor re-runs the full
    // binary segmentation (argmax split, then per-side rescans) over
    // the merged day-bounded grid — bit-equal to the batch
    // dq_rate_binseg under one shared oracle. The always-valid
    // monitors say WHETHER the rate moved; this localizes WHERE,
    // live, with zero history re-scans.
    "st_rate_binseg" -> { (s, dir) =>
      val cPath = s"/tmp/graft_idx/bsgrid_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val ev = Engine.normalizeEventTs(s.read.parquet(s"$dir/events.parquet"))
      ev.filter(lit(false))
        .select(
          date_format(col("ts"), "yyyy-MM-dd").as("bucket"),
          lit(0L).as("n"),
          lit(0L).as("x"))
        .write.mode("overwrite").parquet(cPath)
      val q = eventStream(s, dir).writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch
            .filter(col("event_type").isNotNull && col("ts").isNotNull)
            .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("bucket"))
            .agg(
              count(lit(1)).as("n"),
              sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("x"))
            .write.mode("append").parquet(cPath)
          (): Unit
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      graft.operators.Checks
        .binomialBinseg2FromCells(
          s.read.parquet(cPath)
            .groupBy(col("bucket"))
            .agg(sum(col("n")).as("n"), sum(col("x")).as("x")))
    },
    // Streaming Good–Turing — the monitor pattern extended to the
    // ARTIFACT-class sufficient statistic: per-type counts are
    // linear, so micro-batches append partial (tok, n) counts to a
    // parquet artifact (the postings posture — type-bounded, not
    // driver state) and the fof/unseen-mass readout over the
    // SUM-merge is bit-equal to the batch t_good_turing under one
    // shared oracle. The live "how incomplete is my n-gram table"
    // gauge an ingest pipeline watches.
    "st_good_turing" -> { (s, dir) =>
      val cPath = s"/tmp/graft_idx/gtgrid_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val schema = s.read.parquet(s"$dir/documents.parquet").schema
      def toks(df: DataFrame): DataFrame = df
        .filter(length(trim(col("text"))) > 0)
        .select(split(trim(col("text")), "\\s+").as("__tk"))
        .filter(size(col("__tk")) >= 3)
        .select(explode(expr(
          "transform(sequence(1, size(__tk) - 2), i -> concat_ws(' ', slice(__tk, i, 3)))"))
          .as("tok"))
      toks(s.read.parquet(s"$dir/documents.parquet").filter(lit(false)))
        .groupBy(col("tok")).agg(count(lit(1)).as("n"))
        .write.mode("overwrite").parquet(cPath)
      val q = s.readStream
        .schema(schema)
        .parquet(s"$dir/[d]ocuments.parquet")
        .writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          toks(batch).groupBy(col("tok")).agg(count(lit(1)).as("n"))
            .write.mode("append").parquet(cPath)
          (): Unit
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      graft.operators.TextAnalysis
        .goodTuringFromFreq(
          s.read.parquet(cPath)
            .groupBy(col("tok"))
            .agg(sum(col("n")).as("n")),
          maxR = 10)
    },
    // Streaming term-burstiness monitor — t_good_turing's head-table
    // sibling closing the monitor family: every per-term statistic
    // (n, df) and the doc count are linear because each document's
    // rows land wholly inside one micro-batch, so batches append
    // partial (term, n, df) grids + a 1-row partial doc count (the
    // type-bounded ARTIFACT posture, never driver state) and the
    // SUM-merged readout is bit-equal to the batch t_burstiness
    // under one shared oracle — the live burst/spam gauge.
    "st_burstiness" -> { (s, dir) =>
      val cPath = s"/tmp/graft_idx/bstgrid_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val nPath = s"/tmp/graft_idx/bstnd_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val schema = s.read.parquet(s"$dir/documents.parquet").schema
      def base(df: DataFrame): DataFrame =
        df.filter(length(trim(col("text"))) > 0 && col("doc_id").isNotNull)
      def grid(df: DataFrame): DataFrame = base(df)
        .select(col("doc_id").as("__id"), explode(split(trim(col("text")), "\\s+")).as("term"))
        .groupBy(col("__id"), col("term"))
        .agg(count(lit(1)).as("__c"))
        .groupBy(col("term"))
        .agg(sum(col("__c")).as("n"), count(lit(1)).as("df"))
      def nd(df: DataFrame): DataFrame =
        base(df).agg(countDistinct(col("doc_id")).as("__nd"))
      val empty = s.read.parquet(s"$dir/documents.parquet").filter(lit(false))
      grid(empty).write.mode("overwrite").parquet(cPath)
      nd(empty).write.mode("overwrite").parquet(nPath)
      val q = s.readStream
        .schema(schema)
        .parquet(s"$dir/[d]ocuments.parquet")
        .writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          grid(batch).write.mode("append").parquet(cPath)
          nd(batch).write.mode("append").parquet(nPath)
          (): Unit
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      graft.operators.TextAnalysis
        .burstinessTopFromCells(s.read.parquet(cPath), s.read.parquet(nPath), 30)
        .orderBy(col("n").desc, col("term"))
    },
    // Streaming anytime-valid bounded-MEAN monitor — the value
    // member of the e-process family live: micro-batches append
    // partial (day, v, n) value-grid cells (counts are linear), the
    // monitor SUM-merges and re-runs the exact per-value micro-nat
    // wealth readout — bit-equal to the batch a_eprocess_mean under
    // one shared oracle. The natural home of an always-valid
    // revenue monitor: peek as traffic arrives, Ville covers every
    // peek.
    "st_eprocess_mean" -> { (s, dir) =>
      val cPath = s"/tmp/graft_idx/epmgrid_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val ev = Engine.normalizeEventTs(s.read.parquet(s"$dir/events.parquet"))
      val vppm = expr("CAST(round(value * 100) AS BIGINT) * 10")
      ev.filter(lit(false))
        .select(to_date(col("ts")).as("day"), lit(0L).as("v"), lit(0L).as("n"))
        .write.mode("overwrite").parquet(cPath)
      val q = eventStream(s, dir).writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch
            .filter(col("value").isNotNull && col("ts").isNotNull)
            .groupBy(to_date(col("ts")).as("day"), vppm.as("v"))
            .agg(count(lit(1)).as("n"))
            .write.mode("append").parquet(cPath)
          (): Unit
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      graft.operators.Experiments
        .eProcessMeanFromCells(
          s.read.parquet(cPath)
            .groupBy(col("day"), col("v"))
            .agg(sum(col("n")).as("n")),
          m0Ppm = 175000L,
          lambdaPpm = 300000L,
          alphaPpm = 50000L)
        .withColumn("day", date_format(col("day"), "yyyy-MM-dd"))
        .orderBy(col("day"))
    },
    // Streaming anytime-valid DISPERSION monitor — the variance
    // member live: the SAME (day, v, n) value-grid sufficient
    // statistic as st_eprocess_mean (counts are linear, partials
    // SUM-merge), re-run through the per-day unbiased-sample-
    // variance betting readout — bit-equal to the batch
    // a_eprocess_var under one shared oracle. The live "did the
    // value distribution widen" alarm a mean monitor can't see.
    "st_eprocess_var" -> { (s, dir) =>
      val cPath = s"/tmp/graft_idx/epvgrid_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val ev = Engine.normalizeEventTs(s.read.parquet(s"$dir/events.parquet"))
      val vppm = expr("CAST(round(value * 100) AS BIGINT) * 10")
      ev.filter(lit(false))
        .select(to_date(col("ts")).as("day"), lit(0L).as("v"), lit(0L).as("n"))
        .write.mode("overwrite").parquet(cPath)
      val q = eventStream(s, dir).writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch
            .filter(col("value").isNotNull && col("ts").isNotNull)
            .groupBy(to_date(col("ts")).as("day"), vppm.as("v"))
            .agg(count(lit(1)).as("n"))
            .write.mode("append").parquet(cPath)
          (): Unit
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      graft.operators.Experiments
        .eProcessVarianceFromCells(
          s.read.parquet(cPath)
            .groupBy(col("day"), col("v"))
            .agg(sum(col("n")).as("n")),
          v0Ppm = 5000L,
          lambdaPpm = 100000000L,
          alphaPpm = 50000L)
        .withColumn("day", date_format(col("day"), "yyyy-MM-dd"))
        .orderBy(col("day"))
    },
    // Streaming anytime-valid MEAN confidence sequence — the running
    // always-valid band live: the SAME (day, v, n) value-grid
    // sufficient statistic (third consumer of the posture), re-run
    // through the 99-candidate two-sided betting readout — bit-equal
    // to the batch a_eprocess_mean_cs under one shared oracle. The
    // live "what IS the mean, with path-valid coverage" readout
    // beside the mean/variance alarms.
    "st_eprocess_mean_cs" -> { (s, dir) =>
      val cPath = s"/tmp/graft_idx/epcgrid_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val ev = Engine.normalizeEventTs(s.read.parquet(s"$dir/events.parquet"))
      val vppm = expr("CAST(round(value * 100) AS BIGINT) * 10")
      ev.filter(lit(false))
        .select(to_date(col("ts")).as("day"), lit(0L).as("v"), lit(0L).as("n"))
        .write.mode("overwrite").parquet(cPath)
      val q = eventStream(s, dir).writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch
            .filter(col("value").isNotNull && col("ts").isNotNull)
            .groupBy(to_date(col("ts")).as("day"), vppm.as("v"))
            .agg(count(lit(1)).as("n"))
            .write.mode("append").parquet(cPath)
          (): Unit
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      graft.operators.Experiments
        .eProcessMeanCsFromCells(
          s.read.parquet(cPath)
            .groupBy(col("day"), col("v"))
            .agg(sum(col("n")).as("n")),
          lambdaPpm = 500000L,
          alphaPpm = 50000L)
        .withColumn("day", date_format(col("day"), "yyyy-MM-dd"))
        .orderBy(col("day"))
    },
    // Streaming anytime-valid MEDIAN confidence sequence — the
    // sign-test member live: the SAME (day, v, n) value-grid
    // sufficient statistic (fourth consumer of the posture), re-run
    // through the two-constant affine betting readout — bit-equal to
    // the batch a_eprocess_median_cs under one shared oracle. The
    // live location band no heavy tail can drag.
    "st_eprocess_median_cs" -> { (s, dir) =>
      val cPath = s"/tmp/graft_idx/epdgrid_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val ev = Engine.normalizeEventTs(s.read.parquet(s"$dir/events.parquet"))
      val vppm = expr("CAST(round(value * 100) AS BIGINT) * 10")
      ev.filter(lit(false))
        .select(to_date(col("ts")).as("day"), lit(0L).as("v"), lit(0L).as("n"))
        .write.mode("overwrite").parquet(cPath)
      val q = eventStream(s, dir).writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch
            .filter(col("value").isNotNull && col("ts").isNotNull)
            .groupBy(to_date(col("ts")).as("day"), vppm.as("v"))
            .agg(count(lit(1)).as("n"))
            .write.mode("append").parquet(cPath)
          (): Unit
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      graft.operators.Experiments
        .eProcessMedianCsFromCells(
          s.read.parquet(cPath)
            .groupBy(col("day"), col("v"))
            .agg(sum(col("n")).as("n")),
          lambdaPpm = 500000L,
          alphaPpm = 50000L)
        .withColumn("day", date_format(col("day"), "yyyy-MM-dd"))
        .orderBy(col("day"))
    },
    // Streaming anytime-valid p90 band — the tail member live (the
    // SAME value-grid sufficient statistic, fifth consumer), re-run
    // through the four-constant affine quantile betting readout —
    // bit-equal to the batch a_eprocess_p90_cs under one shared
    // oracle. The live "is the tail fattening" alarm.
    "st_eprocess_p90_cs" -> { (s, dir) =>
      val cPath = s"/tmp/graft_idx/epqgrid_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val ev = Engine.normalizeEventTs(s.read.parquet(s"$dir/events.parquet"))
      val vppm = expr("CAST(round(value * 100) AS BIGINT) * 10")
      ev.filter(lit(false))
        .select(to_date(col("ts")).as("day"), lit(0L).as("v"), lit(0L).as("n"))
        .write.mode("overwrite").parquet(cPath)
      val q = eventStream(s, dir).writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch
            .filter(col("value").isNotNull && col("ts").isNotNull)
            .groupBy(to_date(col("ts")).as("day"), vppm.as("v"))
            .agg(count(lit(1)).as("n"))
            .write.mode("append").parquet(cPath)
          (): Unit
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      graft.operators.Experiments
        .eProcessQuantileCsFromCells(
          s.read.parquet(cPath)
            .groupBy(col("day"), col("v"))
            .agg(sum(col("n")).as("n")),
          qPpm = 900000L,
          lambdaPpm = 500000L,
          alphaPpm = 50000L)
        .withColumn("day", date_format(col("day"), "yyyy-MM-dd"))
        .orderBy(col("day"))
    },
    // Streaming upsert of the PERSISTED value-grid artifact (the 8th
    // seq-versioned family) — where st_eprocess_mean proves the
    // sufficient statistic merges, this proves the FAMILY's own
    // lifecycle API is the streaming posture: the base generation is
    // an empty grid, each micro-batch's partial grid lands through
    // Io.upsertValueGrid under its batch-id stamp (the declared-bound
    // guard firing on every append), and the monitor reads the merged
    // artifact back through Io.readValueGrid — bit-equal to the batch
    // a_eprocess_mean under the shared oracle.
    "st_valgrid_upsert" -> { (s, dir) =>
      val gPath = s"/tmp/graft_idx/valgrid_st_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val ev = Engine.normalizeEventTs(s.read.parquet(s"$dir/events.parquet"))
      val vppm = expr("CAST(round(value * 100) AS BIGINT) * 10")
      graft.sources.Io.writeValueGrid(
        ev.filter(lit(false))
          .select(to_date(col("ts")).as("day"), lit(0L).as("v"), lit(0L).as("n")),
        gPath)
      val q = eventStream(s, dir).writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          graft.sources.Io.upsertValueGrid(
            batch
              .filter(col("value").isNotNull && col("ts").isNotNull)
              .groupBy(to_date(col("ts")).as("day"), vppm.as("v"))
              .agg(count(lit(1)).as("n")),
            gPath,
            seq = batchId + 1L)
          (): Unit
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      graft.operators.Experiments
        .eProcessMeanFromCells(
          graft.sources.Io.readValueGrid(s, gPath),
          m0Ppm = 175000L,
          lambdaPpm = 300000L,
          alphaPpm = 50000L)
        .withColumn("day", date_format(col("day"), "yyyy-MM-dd"))
        .orderBy(col("day"))
    },
    // Streaming depth-2 MEAN changepoint — st_rate_binseg's
    // continuous sibling: the (day, n, s, q) moment grid is linear
    // in every coordinate (n/s BIGINT sums, q a DECIMAL(38,0) sum of
    // squares), so per-batch partials SUM-merge exactly and the
    // monitor re-runs the full segmentation over the merged grid —
    // bit-equal to the batch dq_mean_binseg under one shared oracle.
    "st_mean_binseg" -> { (s, dir) =>
      val cPath = s"/tmp/graft_idx/msbsgrid_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val ev = Engine.normalizeEventTs(s.read.parquet(s"$dir/events.parquet"))
      val cents = expr("CAST(round(value * 100) AS BIGINT)")
      ev.filter(lit(false))
        .select(
          date_format(col("ts"), "yyyy-MM-dd").as("bucket"),
          lit(0L).as("n"),
          lit(0L).as("s"),
          lit(0L).cast("decimal(38,0)").as("q"))
        .write.mode("overwrite").parquet(cPath)
      val q = eventStream(s, dir).writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch
            .filter(col("value").isNotNull && col("ts").isNotNull)
            .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("bucket"))
            .agg(
              count(lit(1)).as("n"),
              sum(cents).as("s"),
              sum(cents.cast("decimal(38,0)") * cents).as("q"))
            .write.mode("append").parquet(cPath)
          (): Unit
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      graft.operators.Checks
        .meanBinseg2FromCells(
          s.read.parquet(cPath)
            .groupBy(col("bucket"))
            .agg(
              sum(col("n")).as("n"),
              sum(col("s")).as("s"),
              sum(col("q")).as("q")))
    },
    // Streaming depth-3 MEAN changepoint — the st_mean_binseg grid
    // (same linear moment coordinates) read through the deepened
    // four-leaf segmentation: multi-changepoint localization live,
    // bit-equal to the batch dq_mean_binseg3 under one shared oracle.
    "st_mean_binseg3" -> { (s, dir) =>
      val cPath = s"/tmp/graft_idx/msbs3grid_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val ev = Engine.normalizeEventTs(s.read.parquet(s"$dir/events.parquet"))
      val cents = expr("CAST(round(value * 100) AS BIGINT)")
      ev.filter(lit(false))
        .select(
          date_format(col("ts"), "yyyy-MM-dd").as("bucket"),
          lit(0L).as("n"),
          lit(0L).as("s"),
          lit(0L).cast("decimal(38,0)").as("q"))
        .write.mode("overwrite").parquet(cPath)
      val q = eventStream(s, dir).writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch
            .filter(col("value").isNotNull && col("ts").isNotNull)
            .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("bucket"))
            .agg(
              count(lit(1)).as("n"),
              sum(cents).as("s"),
              sum(cents.cast("decimal(38,0)") * cents).as("q"))
            .write.mode("append").parquet(cPath)
          (): Unit
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      graft.operators.Checks
        .meanBinseg3FromCells(
          s.read.parquet(cPath)
            .groupBy(col("bucket"))
            .agg(
              sum(col("n")).as("n"),
              sum(col("s")).as("s"),
              sum(col("q")).as("q")))
    },
    // Streaming embedding-dispersion monitor — the live mode-collapse
    // gauge: vectors stream in, each micro-batch appends its partial
    // per-coordinate (j, n, s, q) moment grid (every coordinate
    // linear: count + two exact sums), the monitor re-runs the
    // variance-identity readout over the merged dim-bounded grid —
    // bit-equal to the batch v_dispersion under one shared oracle.
    "st_dispersion" -> { (s, dir) =>
      val cPath = s"/tmp/graft_idx/dispgrid_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val quant = expr("CAST(round(CAST(x AS DOUBLE) * 1000000.0, 0) AS BIGINT)")
      def grid(df: DataFrame): DataFrame = df
        .filter(col("embedding").isNotNull)
        .select(posexplode(col("embedding")).as(Seq("j", "x")))
        .select(col("j"), quant.as("qv"))
        .groupBy(col("j"))
        .agg(
          count(lit(1)).as("n"),
          // Pre-cast addends: accumulate in DECIMAL(38,0), never BIGINT
          // (BIGINT SUM wraps where DuckDB promotes to HUGEINT).
          sum(col("qv").cast("decimal(38,0)")).as("s"),
          sum(expr("CAST(qv AS DECIMAL(38,0)) * qv")).as("q"))
      grid(emb.filter(lit(false))).write.mode("overwrite").parquet(cPath)
      val q = s.readStream
        .schema(emb.schema)
        .parquet(s"$dir/[e]mbeddings.parquet")
        .writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          grid(batch).write.mode("append").parquet(cPath)
          (): Unit
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      graft.operators.Similarity
        .embeddingDispersionFromCells(
          s.read.parquet(cPath)
            .groupBy(col("j"))
            .agg(sum(col("n")).as("n"), sum(col("s")).as("s"), sum(col("q")).as("q")))
    },
    // Streaming Page-Hinkley drift monitor — the running-mean fold is
    // order-pinned and not mergeable, but the DAILY COUNT GRID is
    // (per-batch partial counts SUM-merge exactly, the
    // st_mann_kendall posture): micro-batches append partial
    // (grp, bucket, n) grids, the monitor re-runs the fold over the
    // merged bucket-bounded grid. Bit-equal to the batch
    // w_page_hinkley under the shared oracle.
    "st_page_hinkley" -> { (s, dir) =>
      val cPath = s"/tmp/graft_idx/phgrid_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val ev = Engine.normalizeEventTs(s.read.parquet(s"$dir/events.parquet"))
      ev.filter(lit(false))
        .select(
          col("event_type").cast("string").as("grp"),
          date_format(col("ts"), "yyyy-MM-dd").as("bucket"),
          lit(0L).as("n"))
        .write.mode("overwrite").parquet(cPath)
      val q = eventStream(s, dir).writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch
            .groupBy(
              col("event_type").cast("string").as("grp"),
              date_format(col("ts"), "yyyy-MM-dd").as("bucket"))
            .agg(count(lit(1)).as("n"))
            .write.mode("append").parquet(cPath)
          (): Unit
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      graft.operators.Checks
        .pageHinkley(
          s.read.parquet(cPath)
            .groupBy(col("grp"), col("bucket"))
            .agg(sum(col("n")).as("n")),
          0L,
          20000000L)
        .orderBy(col("grp"))
    },
    // Streaming log-rank monitor — a per-entity LIFETIME is
    // (min day, max day), and min/max are mergeable: micro-batches
    // append partial per-entity (first, last) grids, the monitor
    // min/max-merges and re-runs the two-group test over the merged
    // lifetimes (fed back as two rows per entity) — bit-equal to the
    // batch w_logrank under the shared oracle. Live cohort-survival
    // watching with zero history re-scans.
    "st_logrank" -> { (s, dir) =>
      val cPath = s"/tmp/graft_idx/lrgrid_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val ev = Engine.normalizeEventTs(s.read.parquet(s"$dir/events.parquet"))
      def partials(d: DataFrame) =
        d.filter(col("user_id").isNotNull && col("ts").isNotNull)
          .groupBy(
            col("user_id").as("u"),
            when(col("user_id") % 2 === 0, lit("A")).otherwise(lit("B")).as("g"))
          .agg(min(to_date(col("ts"))).as("f"), max(to_date(col("ts"))).as("l"))
      partials(ev.filter(lit(false))).write.mode("overwrite").parquet(cPath)
      val q = eventStream(s, dir).writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          partials(batch).write.mode("append").parquet(cPath)
          (): Unit
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val merged = s.read.parquet(cPath)
        .groupBy(col("u"), col("g"))
        .agg(min(col("f")).as("f"), max(col("l")).as("l"))
      val pts = merged.select(col("u"), col("g"), col("f").as("day"))
        .unionByName(merged.select(col("u"), col("g"), col("l").as("day")))
      graft.operators.Series.logRank(pts, "u", "day", "g", 3, 1)
    },
    // Streaming CUSUM + Fano monitors — the daily count grid is the
    // same mergeable sufficient statistic st_page_hinkley appends:
    // these two re-run their folds over the SUM-merged grid,
    // bit-equal to the batch w_cusum / w_fano under shared oracles.
    // Together the three cover the drift triad live: baseline-shift
    // (cusum), running-mean drift (page-hinkley), burstiness (fano).
    "st_cusum" -> { (s, dir) =>
      val cPath = s"/tmp/graft_idx/cusumgrid_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val ev = Engine.normalizeEventTs(s.read.parquet(s"$dir/events.parquet"))
      ev.filter(lit(false))
        .select(
          col("event_type").cast("string").as("grp"),
          date_format(col("ts"), "yyyy-MM-dd").as("bucket"),
          lit(0L).as("n"))
        .write.mode("overwrite").parquet(cPath)
      val q = eventStream(s, dir).writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch
            .groupBy(
              col("event_type").cast("string").as("grp"),
              date_format(col("ts"), "yyyy-MM-dd").as("bucket"))
            .agg(count(lit(1)).as("n"))
            .write.mode("append").parquet(cPath)
          (): Unit
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      graft.operators.Checks
        .cusum(
          s.read.parquet(cPath)
            .groupBy(col("grp"), col("bucket"))
            .agg(sum(col("n")).as("n")))
        .orderBy(col("grp"))
    },
    "st_fano" -> { (s, dir) =>
      val cPath = s"/tmp/graft_idx/fanogrid_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val ev = Engine.normalizeEventTs(s.read.parquet(s"$dir/events.parquet"))
      ev.filter(lit(false))
        .select(
          col("event_type").cast("string").as("grp"),
          date_format(col("ts"), "yyyy-MM-dd").as("bucket"),
          lit(0L).as("n"))
        .write.mode("overwrite").parquet(cPath)
      val q = eventStream(s, dir).writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch
            .groupBy(
              col("event_type").cast("string").as("grp"),
              date_format(col("ts"), "yyyy-MM-dd").as("bucket"))
            .agg(count(lit(1)).as("n"))
            .write.mode("append").parquet(cPath)
          (): Unit
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      graft.operators.Checks
        .fanoFactor(
          s.read.parquet(cPath)
            .groupBy(col("grp"), col("bucket"))
            .agg(sum(col("n")).as("n")))
        .orderBy(col("grp"))
    },
    // Streaming Qini monitor — the per-user (spend, buyer, treated)
    // table is a SUFFICIENT STATISTIC (cent sums and buyer maxes
    // merge): micro-batches append partial per-user grids, the
    // monitor sum/max-merges and re-ranks the uplift curve —
    // bit-equal to the batch a_qini under the shared oracle. Live
    // uplift-targeting watching with zero history re-scans.
    "st_qini" -> { (s, dir) =>
      val cPath = s"/tmp/graft_idx/qinigrid_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val ev = Engine.normalizeEventTs(s.read.parquet(s"$dir/events.parquet"))
      def partials(d: DataFrame) =
        d.filter(col("user_id").isNotNull && col("value").isNotNull
          && col("event_type").isNotNull)
          .groupBy(col("user_id").as("u"))
          .agg(
            sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"),
            max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("buyer"))
      partials(ev.filter(lit(false))).write.mode("overwrite").parquet(cPath)
      val q = eventStream(s, dir).writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          partials(batch).write.mode("append").parquet(cPath)
          (): Unit
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val merged = s.read.parquet(cPath)
        .groupBy(col("u"))
        .agg(sum(col("cents")).as("cents"), max(col("buyer")).as("buyer"))
        .withColumn("treated", (col("u") % 2 === 0).cast("long"))
      graft.operators.Evaluation.qiniCurve(
        merged, col("treated") === 1L, col("buyer") === 1L,
        col("cents"), col("u"), 10)
    },
    // Streaming competing-risks monitor — per-entity lifetime
    // (min/max day) AND terminal cause ((day, cause) struct-max) are
    // all mergeable: micro-batches append partial per-entity
    // (first, last, last-cause) grids, the monitor merges and re-runs
    // the cumulative-incidence decomposition — bit-equal to the batch
    // a_cif under the shared oracle. Live which-way-are-they-leaving
    // watching with zero history re-scans.
    "st_cif" -> { (s, dir) =>
      val cPath = s"/tmp/graft_idx/cifgrid_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val ev = Engine.normalizeEventTs(s.read.parquet(s"$dir/events.parquet"))
      def partials(d: DataFrame) =
        d.filter(col("user_id").isNotNull && col("ts").isNotNull
          && col("event_type").isNotNull)
          .groupBy(col("user_id").as("u"))
          .agg(
            min(to_date(col("ts"))).as("f"),
            max(to_date(col("ts"))).as("l"),
            max(struct(to_date(col("ts")).as("d"), col("event_type").as("c")))
              .as("last"))
          .select(col("u"), col("f"), col("l"),
            col("last.d").as("lastd"), col("last.c").as("lastc"))
      partials(ev.filter(lit(false))).write.mode("overwrite").parquet(cPath)
      val q = eventStream(s, dir).writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          partials(batch).write.mode("append").parquet(cPath)
          (): Unit
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val merged = s.read.parquet(cPath)
        .groupBy(col("u"))
        .agg(
          min(col("f")).as("f"),
          max(col("l")).as("l"),
          max(struct(col("lastd").as("d"), col("lastc").as("c"))).as("last"))
      // two rows per entity reproduce (min, max, last) exactly under
      // cumulativeIncidence's own per-entity aggregate
      val pts = merged
        .select(col("u"), col("f").as("day"), col("last.c").as("cause"))
        .unionByName(
          merged.select(col("u"), col("l").as("day"), col("last.c").as("cause")))
      graft.operators.Series
        .cumulativeIncidence(pts, "u", "day", "cause", 3, 1)
        .orderBy(col("cause"), col("age"))
    },
    // Streaming ROC-AUC monitor — the per-distinct-score count grid
    // (v, t, np_v) is a SUFFICIENT STATISTIC (counts linear, partial
    // grids SUM-merge): micro-batches append partial grids, the
    // monitor re-runs the doubled-mid-rank AUC over the merged
    // score-domain-bounded grid — bit-equal to the one-shot batch
    // a_roc_auc under the shared oracle. Live detector-quality
    // watching with zero history re-scans.
    "st_roc_auc" -> { (s, dir) =>
      val cPath = s"/tmp/graft_idx/rocgrid_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val ev = Engine.normalizeEventTs(s.read.parquet(s"$dir/events.parquet"))
      def cells(d: DataFrame) =
        graft.operators.Evaluation.rocAucCells(
          d.filter(col("event_type").isNotNull && col("value").isNotNull),
          col("event_type") === "purchase",
          round(col("value") * 100.0, 0).cast("long"))
      cells(ev.filter(lit(false))).write.mode("overwrite").parquet(cPath)
      val q = eventStream(s, dir).writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          cells(batch).write.mode("append").parquet(cPath)
          (): Unit
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      graft.operators.Evaluation.rocAucFromCells(s.read.parquet(cPath))
    },
    // Streaming calibration monitor — the reliability-bin grid is a
    // SUFFICIENT STATISTIC (n, x, Σs, Σs², Σsy per bin, all linear):
    // micro-batches append partial cell grids, the monitor SUM-merges
    // and re-derives ECE + Brier — bit-equal to the one-shot batch
    // a_brier_ece under the shared oracle. Live quality-score
    // watching without ever re-scanning history.
    "st_brier_ece" -> { (s, dir) =>
      val cPath = s"/tmp/graft_idx/calgrid_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val ev = Engine.normalizeEventTs(s.read.parquet(s"$dir/events.parquet"))
      def cells(d: DataFrame) =
        graft.operators.Evaluation.calibrationCells(
          d.filter(col("event_type").isNotNull && col("value").isNotNull),
          col("event_type") === "purchase",
          least(lit(1000000L), round(col("value") * 100.0, 0).cast("long") * 100L),
          10)
      cells(ev.filter(lit(false))).write.mode("overwrite").parquet(cPath)
      val q = eventStream(s, dir).writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          cells(batch).write.mode("append").parquet(cPath)
          (): Unit
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      graft.operators.Evaluation.calibrationSummary(
        graft.operators.Evaluation.calibrationBinsFromCells(s.read.parquet(cPath)))
    },
    // Streaming PHASH maintenance — re-crawled media re-hashed per
    // micro-batch: the base index holds STALE codes for every 5th doc
    // (a '?'-run appended — bin 15 and the byte length move, so the
    // aHash actually changes; reversing or case-flipping text would
    // be a VACUOUS no-op on a byte-histogram hash, since
    // ascii%16 is case-insensitive for letters), the stream upserts
    // the true codes (seq = batchId+1), and the last-wins read must
    // converge the code table to the full corpus —
    // mm_phash_neardup's oracle, the streaming path. Completes
    // batch/stream symmetry for the last index family
    // (IVF/PQ/postings/dup-graph already have it).
    "st_phash_upsert" -> { (s, dir) =>
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val idxPath = s"/tmp/graft_idx/phash_stup_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      def codesOf(d: DataFrame) =
        graft.operators.Multimodal.phashCodes(
          graft.operators.Multimodal.fromText(d, "doc_id", "text", "image"))
      val stale = docs.withColumn(
        "text",
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" ??????????????????????")))
          .otherwise(col("text")))
      graft.sources.Io.writePhashIndex(codesOf(stale), idxPath)
      val stream = s.readStream
        .schema(docs.schema)
        .parquet(s"$dir/[d]ocuments.parquet")
        .filter(col("doc_id") % 5 === 0)
      val q = stream.writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          graft.sources.Io.upsertPhashIndex(codesOf(batch), idxPath, seq = batchId + 1L)
          (): Unit
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      graft.operators.Multimodal
        .phashPairsFromCodes(
          graft.sources.Io.readPhashIndexLatest(s, idxPath), 2, maxBucket = 8)
        .orderBy(col("id_a"), col("id_b"))
    },
    // Streaming POSTINGS maintenance — the reference's daily
    // incremental re-index of changed pages applied to the retrieval
    // index: the base build indexes every 5th doc STALE (the phrase
    // "table hash" appended — postings a broken replacement would
    // ghost-match), the stream re-indexes the true versions per
    // micro-batch (doc-version-granular append, seq = batchId+1), and
    // the last-wins read + pruned phrase query must equal the plain
    // r_phrase_search oracle. Ghost terms are the sharp edge proven
    // here: the stale version CONTAINS the phrase, the true version
    // of most of those docs does not — per-row last-wins would keep
    // the stale phrase postings, doc-level resolution deletes them.
    "st_postings_upsert" -> { (s, dir) =>
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val stale = docs.withColumn(
        "text",
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" table hash")))
          .otherwise(col("text")))
      val idxPath = s"/tmp/graft_idx/post_stup_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      graft.sources.Io.writePostings(
        graft.operators.TextAnalysis.invertedIndex(stale, "text", "doc_id"),
        idxPath)
      val stream = s.readStream
        .schema(docs.schema)
        .parquet(s"$dir/[d]ocuments.parquet")
        .filter(col("doc_id") % 5 === 0)
      val q = stream.writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          graft.sources.Io.upsertPostings(
            graft.operators.TextAnalysis.invertedIndex(batch, "text", "doc_id"),
            idxPath,
            seq = batchId + 1L)
          (): Unit
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val phrase = Seq("table", "hash")
      val pruned = graft.sources.Io
        .readPostingsLatest(s, idxPath)
        .filter(
          col("term_bucket")
            .isin(graft.sources.Io.postingsBuckets(s, idxPath, phrase): _*))
      graft.operators.TextAnalysis
        .phraseSearch(pruned, phrase)
        .select(col("id").as("doc_id"), col("n_hits"))
        .orderBy(col("doc_id"))
    },
    // Streaming vector takedown — delete requests stream into the
    // persisted IVF index (per-micro-batch tombstones, seq =
    // batchId+1); the last-wins read then ranks over exactly the
    // survivors. Completes live-stream symmetry for the vector
    // family's delete path (st_takedown covers postings).
    "st_ivf_delete" -> { (s, dir) =>
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val cents = emb
        .filter(col("vec_id").between(1, 4))
        .orderBy(col("vec_id"))
        .collect()
        .map(_.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray)
        .toSeq
      val query = emb
        .filter(col("vec_id") === 0)
        .collect()
        .head
        .getAs[scala.collection.Seq[Float]]("embedding")
        .map(_.toDouble)
        .toArray
      val corpus = emb.filter(col("vec_id") =!= 0)
      val idxPath = s"/tmp/graft_idx/ivf_stdel_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      graft.sources.Io.writeIvfIndex(
        graft.operators.Similarity.ivfAssign(corpus, "embedding", cents),
        cents,
        idxPath)
      val stream = s.readStream
        .schema(emb.schema)
        .parquet(s"$dir/[e]mbeddings.parquet")
        .filter(col("vec_id") =!= 0 && col("vec_id") % 7 === 0)
        .select(col("vec_id"))
      val q = stream.writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          graft.sources.Io.deleteIvfIds(batch, idxPath, seq = batchId + 1L)
          (): Unit
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val (loadedCents, latest) =
        graft.sources.Io.readIvfIndexLatest(s, idxPath, "vec_id")
      graft.operators.Similarity
        .ivfTopK(latest, "embedding", loadedCents, query, 10, 2)
        .select(col("vec_id"), col("label"), col("cell"), col("score"))
    },
    // Streaming takedown — right-to-be-forgotten as a live feed:
    // delete requests (doc ids) stream in and each micro-batch
    // tombstones them in the persisted postings index
    // (Io.deletePostingsDocs, seq = batchId+1); the phrase query
    // afterwards must see none of them. Oracle: the phrase mirror
    // over the surviving docs — a takedown that missed a batch (or a
    // term) would leave hits the oracle doesn't have.
    "st_takedown" -> { (s, dir) =>
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val idxPath =
        s"/tmp/graft_idx/post_td_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      graft.sources.Io.writePostings(
        graft.operators.TextAnalysis.invertedIndex(docs, "text", "doc_id"),
        idxPath)
      val stream = s.readStream
        .schema(docs.schema)
        .parquet(s"$dir/[d]ocuments.parquet")
        .filter(col("doc_id") % 4 === 0)
        .select(col("doc_id"))
      val q = stream.writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          graft.sources.Io.deletePostingsDocs(batch, idxPath, seq = batchId + 1L)
          (): Unit
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val phrase = Seq("table", "hash")
      val pruned = graft.sources.Io
        .readPostingsLatest(s, idxPath)
        .filter(
          col("term_bucket")
            .isin(graft.sources.Io.postingsBuckets(s, idxPath, phrase): _*))
      graft.operators.TextAnalysis
        .phraseSearch(pruned, phrase)
        .select(col("id").as("doc_id"), col("n_hits"))
        .orderBy(col("doc_id"))
    },
    // Streaming dup-graph maintenance — the last artifact family gets
    // its live increment: the base graph holds the historical half's
    // closure, batch docs stream in, and each micro-batch appends
    // every pair touching its docs (verified against the full corpus
    // snapshot, the st_incremental_neardup posture) and re-resolves
    // labels incrementally via the star-edge merge. The final label
    // table must equal the full-corpus closure — dd_cluster_sizes'
    // oracle, shared three ways (in-line, batch upsert, stream).
    "st_dupgraph_upsert" -> { (s, dir) =>
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val gPath = s"/tmp/graft_idx/dupg_stup_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      // copy-on-write off the SHARED half base (full-corpus pairs
      // restricted to historical endpoints — a superset-or-equal of
      // the half-corpus discovery this query used to build, so the
      // post-stream closure is unchanged: the oracle is the full-
      // corpus histogram either way, and dd_graph_upsert already
      // proves restricted-base + cross increments closes to it)
      SparkEntryCoverage.copyTree(
        SparkEntryCoverage.dupGraphBase(s, dir, "half"), gPath)
      val stream = s.readStream
        .schema(docs.schema)
        .parquet(s"$dir/[d]ocuments.parquet")
        .filter(col("doc_id") >= 250)
      val q = stream.writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          // honest incremental discovery: the micro-batch's pairs come
          // from the two-table operator (batch-shingles x corpus-
          // shingles — increment-proportional), not a full-corpus
          // pair recompute
          graft.sources.Io.upsertDupGraph(
            graft.operators.Dedup
              .ngramJaccardAgainst(batch, docs, "text", "doc_id", 3, 0.2)
              .select(col("id_a"), col("id_b")),
            gPath,
            seq = batchId + 1L)
          (): Unit
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      docs.select(col("doc_id"))
        .join(
          graft.sources.Io.readDupGraphLabels(s, gPath),
          col("doc_id") === col("id"),
          "left")
        .select(coalesce(col("cluster_id"), col("doc_id")).as("cluster"))
        .groupBy(col("cluster"))
        .agg(count(lit(1)).as("sz"))
        .groupBy(col("sz"))
        .agg(count(lit(1)).as("n_clusters"))
        .orderBy(col("sz"))
    },
    // Streaming modularity monitor — the edge-append posture applied
    // to the partition-quality gauge: batches discover increment-
    // proportional pairs (two-table operator, never a full-corpus
    // recompute), upsert them into the dup-graph artifact (which
    // maintains the closure labels), and the readout scores the
    // artifact's OWN live partition with Graph.modularity — the
    // union of restricted base + cross increments is exactly the
    // full-corpus pair set (the dd_graph_upsert argument), so the
    // live score must bit-equal the batch g_modularity_persisted
    // under the shared oracle: structure collapsing in the live dup
    // graph (term6 mass draining) is the re-cluster signal.
    "st_modularity" -> { (s, dir) =>
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val gPath = s"/tmp/graft_idx/dupg_stmod_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      SparkEntryCoverage.copyTree(
        SparkEntryCoverage.dupGraphBase(s, dir, "half"), gPath)
      val stream = s.readStream
        .schema(docs.schema)
        .parquet(s"$dir/[d]ocuments.parquet")
        .filter(col("doc_id") >= 250)
      val q = stream.writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          graft.sources.Io.upsertDupGraph(
            graft.operators.Dedup
              .ngramJaccardAgainst(batch, docs, "text", "doc_id", 3, 0.2)
              .select(col("id_a"), col("id_b")),
            gPath,
            seq = batchId + 1L)
          (): Unit
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      graft.operators.Graph.modularity(
        graft.sources.Io.readDupGraphPairs(s, gPath),
        graft.sources.Io.readDupGraphLabels(s, gPath)
          .select(col("id"), col("cluster_id").as("community")))
    },
    // Streaming Louvain move — the ACTION twin of st_modularity: the
    // same edge-append maintenance (increment-proportional pair
    // discovery upserted into the live dup-graph artifact), then the
    // readout degrades the live closure labels (%7 singleton split,
    // the g_louvain_move_persisted fixture) and applies ONE argmax
    // relabel before re-grading. Because the converged artifact's
    // pairs and labels equal the full-corpus build (the dd_graph_
    // upsert argument), the moved re-grade must bit-equal the batch
    // persisted-move query under its shared oracle — the monitor
    // proves the repair action itself is stable under micro-batch
    // arrival order.
    "st_louvain_move" -> { (s, dir) =>
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val gPath = s"/tmp/graft_idx/dupg_stlmv_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      SparkEntryCoverage.copyTree(
        SparkEntryCoverage.dupGraphBase(s, dir, "half"), gPath)
      val stream = s.readStream
        .schema(docs.schema)
        .parquet(s"$dir/[d]ocuments.parquet")
        .filter(col("doc_id") >= 250)
      val q = stream.writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          graft.sources.Io.upsertDupGraph(
            graft.operators.Dedup
              .ngramJaccardAgainst(batch, docs, "text", "doc_id", 3, 0.2)
              .select(col("id_a"), col("id_b")),
            gPath,
            seq = batchId + 1L)
          (): Unit
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val pairs = graft.sources.Io.readDupGraphPairs(s, gPath)
      val degraded = graft.sources.Io.readDupGraphLabels(s, gPath)
        .select(
          col("id"),
          when(col("id") % 7 === 0, -col("id") - 1)
            .otherwise(col("cluster_id"))
            .as("community"))
      graft.operators.Graph.modularity(
        pairs, graft.operators.Graph.louvainBestMove(pairs, degraded))
    },
    // Streaming data-quality gate: the same one-pass violation
    // aggregate as the batch dq_checks report, running on live intake
    // (complete mode) — violation sums are merge-invariant across
    // micro-batches, so the drained report equals the batch oracle
    "st_dq_checks" -> { (s, dir) =>
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val stream = s.readStream
        .schema(docs.schema)
        .parquet(s"$dir/[d]ocuments.parquet")
      val report = graft.operators.Checks.rowChecks(
        stream,
        Seq(
          "doc_chars_match" -> (col("n_chars") === length(col("text"))),
          "doc_lang_known" -> col("lang").isin("de", "en", "es", "fr", "zh"),
          "doc_text_nonblank" -> (length(trim(col("text"))) > 0)))
      drain(report, "st_dq_checks_sink", "complete")
        .orderBy(col("check_name"))
    },
    // Streamed Count-Min Sketch: counter updates are SUMS, so the
    // sketch built from micro-batches is bit-equal to the batch build
    // (the KMV merge-invariance story for frequencies, not distincts);
    // complete mode drains the 4×1024-row aggregate
    "st_cms_sketch" -> { (s, dir) =>
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val tok = s.readStream
        .schema(docs.schema)
        .parquet(s"$dir/[d]ocuments.parquet")
        .filter(length(trim(col("text"))) > 0)
        .select(explode(graft.functions.TextFns.tokens(col("text"))).as("term"))
      val sketch = graft.operators.Sketches
        .cmsBuild(tok, col("term"), depth = 4, width = 1024)
      drain(sketch, "st_cms_sketch_sink", "complete")
        .orderBy(col("j"), col("bucket"))
    },
    // Batch-fit / stream-score parity: the unigram LM is fit on the
    // static history (docs < 250) and the streamed batch (docs >= 250)
    // is scored per doc, unseen terms falling back to the smoothed OOV
    // log-prob — the train-offline / score-online seam of a corpus
    // intake pipeline. Micro-nat integer sums stay exact under
    // micro-batch arrival order; complete mode drains the per-doc agg.
    "st_perplexity" -> { (s, dir) =>
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val lm = graft.operators.TextAnalysis
        .fitUnigramLm(docs.filter(col("doc_id") < 250), "text")
      val stream = s.readStream
        .schema(docs.schema)
        .parquet(s"$dir/[d]ocuments.parquet")
        .filter(col("doc_id") >= 250)
      val scored = graft.operators.TextAnalysis
        .scoreUnigramLm(stream, "text", "doc_id", lm)
      drain(scored, "st_perplexity_sink", "complete")
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"))
    },
    // Streaming manifest maintenance: each micro-batch appends its
    // per-partition (n, partial-XOR) rows to the receipt artifact;
    // XOR and counts are both linear, so the merged table IS the
    // batch manifest over the same rows — dq_manifest's oracle
    // carries over verbatim (the st_hist_quantile pattern for the
    // hand-off receipt: a stream can maintain the export checksum
    // continuously, no state store)
    "st_manifest" -> { (s, dir) =>
      val mPath = s"/tmp/graft_idx/manst_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val ev = Engine.normalizeEventTs(s.read.parquet(s"$dir/events.parquet"))
      graft.operators.Checks
        .partitionManifest(
          ev.filter(lit(false)),
          date_format(col("ts"), "yyyy-MM-dd"),
          concat_ws(":", col("event_id"), col("user_id"), col("event_type")))
        .write.mode("overwrite").parquet(mPath)
      val q = eventStream(s, dir).writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          graft.operators.Checks
            .partitionManifest(
              batch,
              date_format(col("ts"), "yyyy-MM-dd"),
              concat_ws(":", col("event_id"), col("user_id"), col("event_type")))
            .write.mode("append").parquet(mPath)
          (): Unit
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(mPath)
        .groupBy(col("partition"))
        .agg(
          sum(col("n_rows")).as("n_rows"),
          expr("bit_xor(content_xor)").as("content_xor"))
        .orderBy(col("partition"))
    },
    // Streaming histogram-sketch maintenance: each micro-batch
    // appends its own 64-row fixed-grid partial (Sketches.histSketch)
    // to the parquet artifact — counter linearity makes the
    // SUM-merged grid bit-equal to the batch build over the same
    // rows, so a_hist_quantile's oracle carries over verbatim (the
    // st_volume_anomaly/a_cms_merged pattern for the quantile
    // sketch). No state store: the artifact IS the state.
    "st_hist_quantile" -> { (s, dir) =>
      val hPath = s"/tmp/graft_idx/histst_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      graft.operators.Sketches
        .histSketch(li.filter(lit(false)), col("l_extendedprice"), 110000.0, 64)
        .write.mode("overwrite").parquet(hPath)
      val stream = s.readStream.schema(li.schema).parquet(s"$dir/[l]ineitem.parquet")
      val q = stream.writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          graft.operators.Sketches
            .histSketch(batch, col("l_extendedprice"), 110000.0, 64)
            .write.mode("append").parquet(hPath)
          (): Unit
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      graft.operators.Sketches
        .histQuantiles(
          s.read.parquet(hPath).groupBy(col("bucket")).agg(sum(col("n")).as("n")),
          110000.0, 64, Seq(50, 90, 99))
        .orderBy(col("q_pct"))
    },
    // Watermark late-data accounting (Streams.lateDataAudit): three
    // staged micro-batches — on-time files (Jan 20-29, then Jan
    // 29-30; the second also lets the late-events watermark catch up
    // to eviction, which it trails by one batch) and then a
    // straggler file whose sub-Jan-10 rows sit whole closed windows
    // below the watermark (never at the boundary, so the expected
    // drop count is deterministic) while its Jan-30+ rows pass. The
    // result is Spark's OWN late-row filter metric
    // (numRowsDroppedByWatermark), not a re-derivation — the
    // ingest-health alarm a stuck upstream partition trips at 100 TB.
    "st_late_events" -> { (s, dir) =>
      import java.nio.file.{Files, Paths, StandardCopyOption}
      val ev = Engine.normalizeEventTs(s.read.parquet(s"$dir/events.parquet"))
      val safe = dir.replaceAll("[^A-Za-z0-9]", "_")
      val stage = s"/tmp/graft_stream/late_$safe"
      def rmrf(p: java.io.File): Unit = {
        if (p.isDirectory) Option(p.listFiles()).foreach(_.foreach(rmrf))
        p.delete(): Unit
      }
      rmrf(new java.io.File(stage))
      val inDir = s"$stage/in"
      Files.createDirectories(Paths.get(inDir))
      // one flat file per micro-batch; modification times force the
      // FileStreamSource order (maxFilesPerTrigger=1 splits them)
      def stageOne(df: DataFrame, name: String, mtime: Long): Unit = {
        val tmp = s"$stage/tmp_$name"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
          .getOrElse(sys.error(s"no part file staged under $tmp"))
        val dest = Paths.get(s"$inDir/$name.parquet")
        Files.copy(part.toPath, dest, StandardCopyOption.REPLACE_EXISTING)
        dest.toFile.setLastModified(mtime): Unit
      }
      stageOne(
        ev.filter(col("ts") >= lit("2024-01-20") && col("ts") < lit("2024-01-29")),
        "0", 1000000L)
      stageOne(
        ev.filter(col("ts") >= lit("2024-01-29") && col("ts") < lit("2024-01-30")),
        "1", 2000000L)
      stageOne(
        ev.filter(col("ts") < lit("2024-01-10") || col("ts") >= lit("2024-01-30")),
        "2", 3000000L)
      val stream = s.readStream
        .schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$inDir/*.parquet")
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      val (nBatches, nDropped, nInput) =
        try Streams.lateDataAudit(stream, "ts", "1 day", Seq("event_id"), "st_late_events_sink")
        finally s.conf.set("spark.sql.shuffle.partitions", prev)
      import s.implicits._
      Seq((nBatches, nInput, nDropped)).toDF("n_batches", "n_input", "n_late_dropped")
    }
  )

  def oracleSql: Map[String, String] = Map(
    // batch/stream parity: the live funnel keeps t_funnel_e2e's exact
    // semantics, so its oracle is shared verbatim
    "st_funnel" -> SparkEntryCoverage.funnelE2eOracle,
    // count linearity: streamed partial counts SUM-merge to the
    // one-pass aggregation, so the batch gate's oracle is shared
    "st_volume_anomaly" -> SparkEntryCoverage.volumeAnomalyOracleSql,
    // cells are the z-test's sufficient statistic and counts are
    // linear, so the streamed cell artifact scores bit-equal to the
    // one-shot batch test
    "st_ab_test" -> SparkEntryCoverage.abTestOracleSql,
    // the (v, arm, c) count grid is the rank test's sufficient
    // statistic and counts are linear — streamed grid == batch test
    "st_kruskal" -> SparkEntryCoverage.kruskalOracleSql,
    // daily-count-grid merge-invariance makes the streamed trend test
    // bit-equal to the batch w_mann_kendall — one shared oracle
    "st_mann_kendall" -> SparkEntryCoverage.mannKendallOracleSql,
    // (day, n, x) count-grid merge-invariance: the streamed wealth
    // readout must equal the one-shot batch a_eprocess
    "st_eprocess" -> SparkEntryCoverage.eProcessOracleSql,
    // merged partial (hyp, n, x) grids fold to the same final-wealth
    // e-values, so the batch e-BH chain is the oracle for both paths
    "st_ebh_rates" -> SparkEntryCoverage.ebhRatesOracleSql,
    // same grid, the 99-candidate band readout — one oracle with the
    // batch a_eprocess_cs
    "st_eprocess_cs" -> SparkEntryCoverage.oracleSql("a_eprocess_cs"),
    // same (day, n, x) grid, the depth-2 changepoint readout — one
    // oracle with the batch dq_rate_binseg
    "st_rate_binseg" -> SparkEntryCoverage.oracleSql("dq_rate_binseg"),
    // (day, n, s, q) moment-grid merge-invariance — one oracle with
    // the batch dq_mean_binseg
    "st_mean_binseg" -> SparkEntryCoverage.oracleSql("dq_mean_binseg"),
    // same moment-grid merge-invariance, one level deeper
    "st_mean_binseg3" -> SparkEntryCoverage.oracleSql("dq_mean_binseg3"),
    // per-coordinate moment-grid merge-invariance — one oracle with
    // the batch v_dispersion
    "st_dispersion" -> SparkEntryCoverage.oracleSql("v_dispersion"),
    // (day, value) grid merge-invariance — one oracle with the batch
    // a_eprocess_mean
    "st_eprocess_mean" -> SparkEntryCoverage.oracleSql("a_eprocess_mean"),
    // value-grid merge-invariance, the variance functional: the
    // streamed dispersion monitor must equal the batch readout
    "st_eprocess_var" -> SparkEntryCoverage.oracleSql("a_eprocess_var"),
    "st_valgrid_upsert" -> SparkEntryCoverage.oracleSql("a_eprocess_mean"),
    // value-grid merge-invariance, the sign-test functional: the
    // streamed median band must equal the batch path
    "st_eprocess_median_cs" -> SparkEntryCoverage.oracleSql("a_eprocess_median_cs"),
    // value-grid merge-invariance, the tail functional: the streamed
    // p90 band must equal the batch path
    "st_eprocess_p90_cs" -> SparkEntryCoverage.oracleSql("a_eprocess_p90_cs"),
    // value-grid merge-invariance, the CS functional: the streamed
    // band must equal the batch path
    "st_eprocess_mean_cs" -> SparkEntryCoverage.oracleSql("a_eprocess_mean_cs"),
    // type-count artifact merge-invariance — one oracle with the
    // batch t_good_turing
    "st_good_turing" -> SparkEntryCoverage.oracleSql("t_good_turing"),
    // per-term (n, df) + doc-count merge-invariance: the streamed
    // head table must equal the one-shot batch readout
    "st_burstiness" -> SparkEntryCoverage.oracleSql("t_burstiness"),
    "st_page_hinkley" -> SparkEntryCoverage.pageHinkleyOracleSql,
    // calibration-cell merge-invariance: the streamed summary must
    // equal the one-shot batch readout
    "st_brier_ece" -> SparkEntryCoverage.brierEceOracleSql,
    // per-score count-grid merge-invariance: the streamed AUC must
    // equal the one-shot batch readout
    "st_roc_auc" -> SparkEntryCoverage.rocAucOracleSql,
    // per-entity lifetime (min/max) merge-invariance: the streamed
    // survival comparison must equal the one-shot batch readout
    "st_logrank" -> SparkEntryCoverage.eventsLogRankOracleSql,
    // lifetime + terminal-cause merge-invariance: the streamed CIF
    // must equal the one-shot batch decomposition
    "st_cif" -> SparkEntryCoverage.cifOracleSql,
    // per-user spend/buyer merge-invariance: the streamed uplift
    // curve must equal the one-shot batch ranking
    "st_qini" -> SparkEntryCoverage.qiniOracleSql,
    // daily-grid merge-invariance for the remaining drift pair
    "st_cusum" -> SparkEntryCoverage.cusumOracleSql,
    "st_fano" -> SparkEntryCoverage.fanoOracleSql,
    // LM count-grid merge-invariance: the streamed model must score
    // bit-identically to the in-line full-corpus fit
    "st_lm_upsert" -> SparkEntryCoverage.bigramPplOracleSql("TRUE"),
    // per-look cell merge-invariance: the streamed group-sequential
    // monitor must reproduce the batch OBF readout bit-for-bit
    "st_obf_looks" -> SparkEntryCoverage.groupSeqLooksOracleSql(
      graft.operators.Experiments.ObfZ2Micro5),
    // sketch merge-invariance makes the streamed KMV bit-equal to the
    // batch recomputation (a_kmv_distinct's oracle minus the exact-
    // count column)
    "st_kmv_distinct" ->
      s"""WITH tok AS (SELECT source, unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
         |  FROM documents WHERE length(trim(text)) > 0),
         |hh AS (SELECT DISTINCT source, ${SparkEntryCoverage.sqlHash32("term")} AS h FROM tok),
         |rk AS (SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM hh)
         |SELECT source, CAST(count(*) FILTER (rn <= 64) AS BIGINT) AS n_seen,
         |       CASE WHEN count(*) FILTER (rn <= 64) < 64
         |            THEN CAST(count(*) FILTER (rn <= 64) AS DOUBLE)
         |            ELSE ${63.0 * 4294967296.0} / CAST(max(h) FILTER (rn = 64) AS DOUBLE) END AS kmv_est
         |FROM rk GROUP BY source
         |ORDER BY source""".stripMargin,
    // register max-merge is lossless, so the streamed per-batch HLL
    // partials must reproduce the full-rescan estimate bit-for-bit —
    // a_hll_merged's oracle shared verbatim
    "st_hll_distinct" -> SparkEntryCoverage.hllMergedOracle,
    // the streamed upserts must converge to the same last-wins view
    // the batch upsert proves — one oracle, three paths (in-line,
    // batch-upserted, stream-upserted)
    // the streamed re-signs resolve to the TRUE history, so the batch
    // path's from-texts recompute is the oracle (dd_sigs_upsert's)
    "st_sigs_upsert" -> SparkEntryCoverage.minhashAgainstSigsOracle("text"),
    "st_ivf_upsert" -> SparkEntryCoverage.ivfTopkOracle,
    // PQ mirror of the same three-path convergence (in-line v_pq_topk,
    // batch v_pq_upsert, this stream) — one shared oracle
    "st_pq_upsert" -> SparkEntryCoverage.pqTopkOracle,
    // composed-index convergence: the streamed cell+code corrections
    // must serve the plain hybrid — v_ivfpq_topk's oracle, shared
    // three ways (in-line, batch upsert, stream upsert)
    "st_ivfpq_upsert" -> SparkEntryCoverage.oracleSql("v_ivfpq_topk"),
    // streamed doc-version upserts must converge the postings index
    // to the plain corpus's phrase results — r_phrase_search's oracle
    "st_postings_upsert" -> SparkEntryCoverage.phraseSearchOracle,
    // streamed incremental closure must converge to the full-corpus
    // closure — dd_cluster_sizes' oracle, shared three ways
    "st_dupgraph_upsert" -> SparkEntryCoverage.oracleSql("dd_cluster_sizes"),
    // live artifact's own partition scored: must equal the batch
    // persisted-modularity readout (same full-corpus pair set)
    "st_modularity" -> SparkEntryCoverage.oracleSql("g_modularity_persisted"),
    // the streamed move must reproduce the batch persisted move —
    // one oracle, one degradation, two maintenance paths
    "st_louvain_move" -> SparkEntryCoverage.oracleSql("g_louvain_move_persisted"),
    // streamed takedowns: phrase results over exactly the survivors
    "st_takedown" -> SparkEntryCoverage.phraseSearchOracleFor("doc_id % 4 <> 0"),
    // streamed vector takedowns: top-k over exactly the survivors
    "st_ivf_delete" ->
      SparkEntryCoverage.ivfTopkOracleFor("b.vec_id <> 0 AND b.vec_id % 7 <> 0"),
    // violation sums are merge-invariant; NULL predicate = violation
    // (the Checks contract)
    "st_dq_checks" ->
      """WITH rc AS (
        | SELECT 'doc_chars_match' AS check_name,
        |   CAST(sum(CASE WHEN n_chars = length(text) THEN 0 ELSE 1 END) AS BIGINT) AS n_violations
        | FROM documents
        | UNION ALL SELECT 'doc_lang_known',
        |   CAST(sum(CASE WHEN lang IN ('de','en','es','fr','zh') THEN 0 ELSE 1 END) AS BIGINT)
        | FROM documents
        | UNION ALL SELECT 'doc_text_nonblank',
        |   CAST(sum(CASE WHEN length(trim(text)) > 0 THEN 0 ELSE 1 END) AS BIGINT)
        | FROM documents)
        |SELECT check_name, n_violations, n_violations = 0 AS pass
        |FROM rc ORDER BY check_name""".stripMargin,
    // counter sums are merge-invariant: the streamed sketch equals
    // the batch CTE bit-for-bit (shared fragment with a_cms_heavy)
    "st_cms_sketch" ->
      s"""WITH ${SparkEntryCoverage.cmsSketchSql}
         |SELECT j, bucket, c FROM sketch
         |ORDER BY j, bucket""".stripMargin,
    // identical to dd_incremental_neardup's oracle: near-dup-vs-static
    // is stateless across micro-batches, so the foreachBatch
    // application computes the batch result at any batch split
    "st_incremental_neardup" -> SparkEntryCoverage.incrementalNeardupOracle,
    // identical to dd_incremental's oracle: the streaming form keeps
    // the same semantics (within-batch fp dedup is an identity on
    // this corpus — no two batch rows share a fingerprint — so
    // arrival-order dropDuplicates and the rn=1 first-wins agree)
    "st_incremental" ->
      """WITH hist AS (SELECT doc_id, text FROM documents WHERE doc_id < 250),
        |batch AS (SELECT b.doc_id, CASE WHEN b.doc_id % 5 = 0 THEN h.text ELSE b.text END AS text
        |          FROM documents b JOIN hist h ON b.doc_id - 250 = h.doc_id WHERE b.doc_id >= 250),
        |hfp AS (SELECT DISTINCT md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp FROM hist),
        |bd AS (SELECT doc_id, md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp FROM batch
        |       QUALIFY row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1)
        |SELECT doc_id, fp FROM bd
        |WHERE NOT EXISTS (SELECT 1 FROM hfp WHERE hfp.fp = bd.fp)
        |ORDER BY doc_id""".stripMargin,
    "st_perplexity" ->
      // fit on history, score the batch; OOV fallback ln(1/(T+V)).
      // (On this synthetic corpus the batch has zero OOV tokens — the
      // OOV path is exercised by OperatorsSpec instead.)
      """WITH tokh AS (
        |  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |  FROM documents WHERE doc_id < 250 AND length(trim(text)) > 0),
        |vocab AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM tokh GROUP BY term),
        |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS t, CAST(COUNT(*) AS BIGINT) AS v FROM vocab),
        |lp AS (SELECT term,
        |         CAST(round(ln((CAST(cnt AS DOUBLE)+1.0)/(CAST(t AS DOUBLE)+CAST(v AS DOUBLE)))*1000000) AS BIGINT) AS lp6
        |       FROM vocab, tot),
        |oov AS (SELECT CAST(round(ln(1.0/(CAST(t AS DOUBLE)+CAST(v AS DOUBLE)))*1000000) AS BIGINT) AS oov6 FROM tot),
        |tokb AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |  FROM documents WHERE doc_id >= 250 AND length(trim(text)) > 0)
        |SELECT tokb.doc_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |       CAST(-SUM(COALESCE(lp.lp6, oov.oov6)) AS BIGINT) AS nll_sum6,
        |       round(CAST(-SUM(COALESCE(lp.lp6, oov.oov6)) AS DOUBLE) / (COUNT(*)*1000000.0), 6) AS mean_nll,
        |       round(exp(CAST(-SUM(COALESCE(lp.lp6, oov.oov6)) AS DOUBLE) / (COUNT(*)*1000000.0)), 4) AS ppl
        |FROM tokb LEFT JOIN lp ON tokb.term = lp.term, oov
        |GROUP BY tokb.doc_id
        |ORDER BY doc_id""".stripMargin,
    "st_window_counts" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS d, event_type,
        |       CAST(count(*) AS BIGINT) AS n_events
        |FROM events GROUP BY 1, 2 ORDER BY d, event_type""".stripMargin,
    // a row emits exactly when its hash differs from the previous
    // row's (runs collapse, so the previous ROW at an emission is the
    // previous STATE); first sighting emits with prev '-'
    "st_change_events" ->
      """WITH o AS (
        |  SELECT CAST(user_id AS VARCHAR) AS key, event_type AS h,
        |         lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS prev
        |  FROM events)
        |SELECT key, COALESCE(prev, '-') AS prev_hash, h AS new_hash
        |FROM o WHERE prev IS NULL OR prev <> h
        |ORDER BY key, prev_hash, new_hash""".stripMargin,
    // every consecutive pair incl. self-transitions (unlike
    // st_change_events); identical to w_transitions' batch oracle
    // modulo the event_id replay clock (monotone in ts, same order)
    "st_transitions" ->
      """WITH seq AS (
        | SELECT event_type AS from_state,
        |        lead(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS to_state
        | FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
        |p AS (SELECT from_state, to_state, CAST(COUNT(*) AS BIGINT) AS n
        |      FROM seq WHERE to_state IS NOT NULL GROUP BY 1, 2),
        |rt AS (SELECT from_state, CAST(SUM(n) AS BIGINT) AS rt FROM p GROUP BY 1)
        |SELECT p.from_state, p.to_state, p.n,
        | CAST((1000000 * p.n) // rt.rt AS BIGINT) AS p6
        |FROM p JOIN rt USING (from_state) ORDER BY from_state, to_state""".stripMargin,
    // session_window semantics: windows are [start, start+gap) merged
    // on overlap, so an event exactly `gap` after its predecessor
    // starts a NEW session — the gaps-and-islands mirror must use >=
    "st_session_counts" ->
      """WITH g AS (
        |  SELECT user_id, ts,
        |         epoch_us(ts) - epoch_us(lag(ts, 1) OVER
        |           (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts,
        |         CASE WHEN gap_us IS NULL OR gap_us >= 3600000000 THEN 1 ELSE 0 END AS new_sess
        |  FROM g),
        |sid AS (
        |  SELECT user_id, ts,
        |         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        |  FROM s)
        |SELECT user_id, CAST(MIN(epoch_us(ts)) AS BIGINT) AS session_start_us,
        |       CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM sid GROUP BY user_id, sess
        |ORDER BY user_id, session_start_us""".stripMargin,
    "st_dedup_keys" ->
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin,
    "st_enrich" ->
      """SELECT event_id, user_id,
        | COALESCE((SELECT c_mktsegment FROM customer
        |           WHERE c_custkey = user_id AND c_custkey < 150), 'UNKNOWN') AS segment
        |FROM events WHERE event_type = 'purchase'
        |ORDER BY event_id""".stripMargin,
    "st_stream_join" ->
      """SELECT p.user_id AS user_id, p.event_id AS purchase_id, c.event_id AS click_id
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id
        | AND c.ts >= p.ts - INTERVAL 4 HOUR AND c.ts <= p.ts
        |ORDER BY user_id, purchase_id, click_id""".stripMargin,
    // grid linearity: streamed partials SUM-merge to the batch build,
    // so the batch sketch's oracle is shared verbatim
    "st_hist_quantile" -> SparkEntryCoverage.oracleSql("a_hist_quantile"),
    // XOR/count linearity: streamed partial receipts fold to the
    // batch manifest — one oracle, two paths
    "st_manifest" -> SparkEntryCoverage.oracleSql("dq_manifest"),
    // the staged split is deterministic by construction: batches 0-1
    // = [Jan 20, Jan 30) on time, batch 2 = (< Jan 10) ∪ (>= Jan 30);
    // by batch 2 the late-events watermark (which trails eviction by
    // one batch) sits at ~Jan 27, so every sub-Jan-10 window is long
    // closed (dropped) and the Jan-30 window is open (kept) — no row
    // sits near the boundary
    "st_late_events" ->
      """SELECT CAST(3 AS BIGINT) AS n_batches,
        |  CAST((SELECT count(*) FROM events
        |        WHERE ts >= TIMESTAMP '2024-01-20' OR ts < TIMESTAMP '2024-01-10') AS BIGINT) AS n_input,
        |  CAST((SELECT count(*) FROM events
        |        WHERE ts < TIMESTAMP '2024-01-10') AS BIGINT) AS n_late_dropped""".stripMargin
  )
}
