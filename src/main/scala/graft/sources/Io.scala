package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** SURVEY §2.1 — sources and sinks. The reference's edges are JSON
  * (pretty + JSONL), text files and blob stores; the engine
  * standardizes on Parquet internally with JSON at the edges.
  *
  * Cloud stores (the reference's GCS, S5) are path schemes to Spark —
  * `gs://`/`s3a://` URIs work through the same readers once the
  * connector jars are on the cluster; nothing here is local-FS bound.
  */
object Io {

  /** S1 — seed scan: one JSON array document (multiLine) — the Forbes
    * seed file shape (`/root/reference/src/scraper_v2.py:4133-4147`).
    */
  def readJsonArray(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("multiLine", "true")
    schema.fold(r)(s => r.schema(s)).json(path)
  }

  /** S10-shape — JSONL (one object per line), e.g. risk-signal logs. */
  def readJsonl(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.fold(r)(s => r.schema(s)).json(path)
  }

  /** S7 — recursive text scan with file provenance: one row per line
    * plus the source path (`input_file_name`), the
    * `*_clean.txt`-walk analogue (`handle_chunking.py:12-25`).
    *
    * `recursive = true` walks the whole tree under `path` filtered by
    * `pathGlobFilter` — a plain Hadoop glob has no `**`, so files
    * nested deeper than the literal pattern would be silently skipped.
    * Use `recursive = false` only for a single-level glob.
    */
  def readTextTree(
      spark: SparkSession,
      path: String,
      recursive: Boolean = false,
      globFilter: Option[String] = None): DataFrame = {
    val reader = spark.read
      .option("recursiveFileLookup", recursive.toString)
    globFilter
      .foldLeft(reader)((r, g) => r.option("pathGlobFilter", g))
      .textFile(path)
      .withColumn("source_path", input_file_name())
  }

  /** §1.3 — permissive JSON parsing with quarantine: malformed rows
    * land in a reject frame instead of aborting (the reference drops
    * ValidationError rows with a warning,
    * `structured_extraction_v2.py:2300-2302`). Returns (valid, rejects).
    */
  def parseJsonQuarantine(
      df: DataFrame,
      jsonCol: String,
      schema: StructType): (DataFrame, DataFrame) = {
    // malformed-ness comes from the parser's corrupt-record column,
    // NOT from "all declared fields are null" — '{}' or explicit
    // nulls are well-formed rows that must survive as valid
    val corrupt = "__corrupt"
    val parsed = df.withColumn(
      "__parsed",
      from_json(
        col(jsonCol),
        schema.add(corrupt, org.apache.spark.sql.types.StringType),
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> corrupt)))
    val isBad = col("__parsed").isNull || col(s"__parsed.$corrupt").isNotNull
    val valid = parsed.filter(!isBad)
      .select(col("*"), col("__parsed.*"))
      .drop("__parsed", jsonCol, corrupt)
    val rejects = parsed.filter(isBad).drop("__parsed")
    (valid, rejects)
  }

  /** S10 — date-partitioned append JSONL sink (risk signals:
    * `data/risk_signals/risk_signals_{date}.jsonl`,
    * `src/agents/tools.py:308-337`).
    */
  def writeDatePartitionedJson(df: DataFrame, tsCol: String, path: String): Unit =
    df.withColumn("date", date_format(col(tsCol), "yyyy-MM-dd"))
      .write
      .mode("append")
      .partitionBy("date")
      .json(path)

  /** S11 — payload sink: one JSON document per entity
    * (`structured_extraction_v2.py:798-833`). Partitioned by the key
    * so a point lookup (E2) prunes to one directory.
    */
  def writePayloads(df: DataFrame, keyCol: String, path: String): Unit =
    df.write.mode("overwrite").partitionBy(keyCol).json(path)

  /** Engine-internal standard: partitioned Parquet. `partitionBy` on
    * the natural pruning key (company/date) is what makes I2-style
    * incremental skips free at scale.
    */
  def writeParquet(df: DataFrame, path: String, partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(path)
  }

  /** A9/S13 — metrics via `observe`: named aggregates collected on the
    * driver after an action, the accumulator-based counter analogue
    * (`src/agents/metrics.py:20-26`). Returns the observed DataFrame;
    * read results from `QueryExecutionListener` or
    * `Observation` at the call site.
    */
  def withRowMetrics(df: DataFrame, name: String): DataFrame =
    df.observe(
      name,
      count(lit(1)).as("n_rows"),
      sum(when(col(df.columns.head).isNull, 1L).otherwise(0L)).as("null_keys"))

  /** CSV source with explicit schema (never inference for curated
    * tables, §1.3) — header + permissive mode, corrupt rows preserved
    * in `_corrupt_record` when the schema declares it.
    */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .schema(schema)
      .csv(path)

  /** Columnar ORC sink/source round-trip (engine standard is Parquet;
    * ORC for interop with hive-side consumers).
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Training-shard export: the shape a trainer's data loader reads —
    * `shard=K/part-*.json.gz` JSONL directories with a FIXED shard
    * count and a bounded records-per-file. Shard assignment is
    * `pmod(hash32(key), numShards)` over the engine's portable md5
    * hash, NOT Spark's internal partitioner — the same doc lands in
    * the same shard on any engine, any partitioning, any rerun, so
    * dataloader resume/repeat contracts survive a re-export.
    *
    * One clustering shuffle on the shard id (hash-uniform by
    * construction, so no skew), then each shard directory is written
    * by bounded-size files — `maxRecordsPerFile` is what keeps a
    * 100 TB export from producing multi-GB unsplittable gzip members.
    */
  def writeTrainingShards(
      df: DataFrame,
      key: Column,
      path: String,
      numShards: Int,
      maxRecordsPerFile: Long = 0L,
      gzip: Boolean = true): Unit = {
    require(numShards > 0, "numShards must be positive")
    val sharded = df
      .withColumn("shard", pmod(graft.operators.Sampling.hash32(key), lit(numShards.toLong)))
      .repartition(col("shard"))
      .write
      .mode("overwrite")
      .partitionBy("shard")
      .option("compression", if (gzip) "gzip" else "none")
    (if (maxRecordsPerFile > 0L) sharded.option("maxRecordsPerFile", maxRecordsPerFile)
     else sharded).json(path)
  }

  /** Bucketed managed table: pre-shuffles on the join key at write
    * time so repeated joins/aggregations on that key run with NO
    * exchange — the co-located-join layout for fact tables reused
    * across queries at 100 TB (pay the shuffle once on ingest, not
    * per query). Same bucket count on both sides is required for the
    * shuffle-free sort-merge join.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      numBuckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  // ---- persistent ANN indexes -------------------------------------
  //
  // The reference's vector index is PERSISTENT: built once, queried
  // many times, upserted incrementally (Pinecone auto-create-then-
  // reuse, `src/services/embeddings.py:117-152`). At 100 TB the index
  // BUILD (k-means fit + full-corpus assignment/encoding) is the
  // expensive artifact — a retrieval path that re-fits per query pays
  // it every time. These sinks/sources make the fit a one-time cost:
  // centroids/codebooks are tiny parquet side tables, and the
  // assigned corpus is laid out partitioned BY CELL so an IVF probe
  // reads only the probed cells' directories (partition pruning does
  // the nprobe/nlist read at the FILE level, not with a post-scan
  // filter).

  /** Persist an IVF index: `path/centroids` (cell, centroid) and
    * `path/cells` — the corpus with its cell assignment, partitioned
    * by cell. Loading + `ivfTopK` must return exactly what the
    * in-line fit returned for the same centroids.
    */
  def writeIvfIndex(
      assigned: DataFrame,
      centroids: Seq[Array[Double]],
      path: String): Unit = {
    val spark = assigned.sparkSession
    import spark.implicits._
    centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }
      .toDF("cell", "centroid")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/centroids")
    // base rows carry upsert-stamp 0 so the cell files share ONE
    // schema with later upsertIvfIndex appends (mixed parquet schemas
    // under a directory read back nondeterministically without
    // mergeSchema)
    assigned
      .withColumn("__seq", lit(0L))
      // file-per-cell write (REBALANCE-before-partitionBy, the
      // dup-graph rule): without it every task emits a sliver into
      // every cell directory
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/cells")
  }

  /** Load an IVF index written by [[writeIvfIndex]]: (centroids in
    * cell order, assigned corpus). Filters on `cell` prune to the
    * probed partition directories. Upsert stamps are dropped — use
    * [[readIvfIndexLatest]] when the index has live upserts.
    */
  /** Persist a positional inverted index
    * (`TextAnalysis.invertedIndex` output) partitioned by a bounded
    * TERM-HASH bucket — one directory per bucket (never per term:
    * vocab-sized directory listings are their own scale problem), so
    * a phrase query that pre-filters to its terms' buckets prunes the
    * scan to a handful of partitions at any index size.
    */
  def writePostings(index: DataFrame, path: String, buckets: Int = 64): Unit = {
    require(buckets > 0, "buckets must be positive")
    val spark = index.sparkSession
    import spark.implicits._
    // base rows carry upsert-stamp 0 (the writeIvfIndex rule: one
    // schema shared with upsertPostings appends)
    index
      .withColumn("term_bucket", pmod(xxhash64(col("term")), lit(buckets.toLong)))
      .withColumn("__seq", lit(0L))
      // file-per-bucket write (the dup-graph rule)
      .repartition(col("term_bucket"))
      .write
      .mode("overwrite")
      .partitionBy("term_bucket")
      .parquet(path)
    // doc-version sidecar (underscore dir — invisible to the data
    // scan): one (id, seq) row per indexed doc version, so the
    // read-side last-wins resolution aggregates a doc-count-bounded
    // slim table instead of re-scanning the whole postings index for
    // the per-doc max stamp
    index.select(col("id")).distinct()
      .withColumn("seq", lit(0L))
      .withColumn("deleted", lit(false))
      .write.mode("overwrite").parquet(s"$path/_docseq")
    // doc-length sidecar (the Lucene-norms idea): token count per doc
    // derived from the postings themselves, so length-normalized
    // scoring (BM25) runs entirely off the index — no corpus scan
    index.groupBy(col("id"))
      .agg(sum(size(col("positions"))).cast("long").as("dl"))
      .withColumn("seq", lit(0L))
      .write.mode("overwrite").parquet(s"$path/_doclen")
    // the bucket count is part of the index's IDENTITY, so it rides
    // with the index instead of being re-supplied (and possibly
    // mis-supplied) at read time: an underscore-prefixed child
    // directory is invisible to the data scan (Spark's file listing
    // skips `_`/`.` paths), and postingsBuckets reads the modulus
    // from here — a guessed mismatch would prune to the WRONG
    // partitions and make phrase queries silently return empty.
    Seq(buckets).toDF("buckets")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/_meta")
  }

  /** Load a [[writePostings]] index. Pair with
    * `postingsBuckets(path, terms)` to pre-filter the partition
    * column. Upsert stamps are dropped — use [[readPostingsLatest]]
    * when the index has live upserts.
    */
  def readPostings(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).drop("__seq")

  /** Incremental postings upsert — the IVF/PQ maintenance shape for
    * the retrieval index: `index` is the
    * [[graft.operators.TextAnalysis.invertedIndex]] output for the
    * RE-INDEXED docs only (the daily changed-page increment), landed
    * as an append to the bucketed layout with a caller seq stamp that
    * must increase per upsert. Resolution granularity is the DOC
    * VERSION, not the (term, doc) row: [[readPostingsLatest]] keeps
    * only rows whose stamp equals their doc's maximum, so a term the
    * new version DROPPED cannot ghost-match from the old version's
    * rows — per-row last-wins could never express that deletion.
    * Contract: an upsert replaces postings for ids PRESENT in the
    * increment; removing a doc entirely is [[deletePostingsDocs]].
    */
  def upsertPostings(index: DataFrame, path: String, seq: Long): Unit = {
    require(seq > 0L, "upsert seq must be positive (0 is the base build's stamp)")
    val buckets = postingsBucketCount(index.sparkSession, path)
    index
      .withColumn("term_bucket", pmod(xxhash64(col("term")), lit(buckets.toLong)))
      .withColumn("__seq", lit(seq))
      .repartition(col("term_bucket"))
      .write.mode("append").partitionBy("term_bucket").parquet(path)
    index.select(col("id")).distinct()
      .withColumn("seq", lit(seq))
      .withColumn("deleted", lit(false))
      .write.mode("append").parquet(s"$path/_docseq")
    index.groupBy(col("id"))
      .agg(sum(size(col("positions"))).cast("long").as("dl"))
      .withColumn("seq", lit(seq))
      .write.mode("append").parquet(s"$path/_doclen")
  }

  /** Tombstone-delete whole documents from a persisted postings
    * index: `ids` (one column, the doc ids) get a deleted doc-version
    * row at `seq`, so [[readPostingsLatest]] serves NO postings for
    * them — every term vanishes at once, no bucket file rewritten.
    * Re-indexing a doc at a higher stamp (upsertPostings) restores
    * it. The takedown shape for the retrieval index.
    */
  def deletePostingsDocs(ids: DataFrame, path: String, seq: Long): Unit = {
    require(seq > 0L, "delete seq must be positive (0 is the base build's stamp)")
    ids
      .select(col(ids.columns.head).as("id"))
      .distinct()
      .withColumn("seq", lit(seq))
      .withColumn("deleted", lit(true))
      .write.mode("append").parquet(s"$path/_docseq")
  }

  /** Load a postings index with upserts applied: each doc's LATEST
    * version's postings only (doc-level max stamp from the `_docseq`
    * sidecar — doc-count-bounded — joined back on (id, stamp)). The
    * main index scan stays single and partition-prunable; the join
    * key is slim. Ties on the stamp keep both versions' rows —
    * callers must use distinct positive stamps per upsert.
    */
  /** The live doc versions of a postings index: (\_\_did, __max_seq)
    * for every doc whose latest sidecar row is not a tombstone.
    */
  private def livePostingsDocs(
      spark: SparkSession,
      path: String,
      asOf: Option[Long] = None): DataFrame = {
    // a doc's effective version is its max-stamp sidecar row; if that
    // row is a tombstone (deletePostingsDocs), the doc serves nothing.
    // asOf restricts the sidecar to stamps <= the as-of clock.
    val raw = asOf.fold(spark.read.parquet(s"$path/_docseq"))(m =>
      spark.read.parquet(s"$path/_docseq").filter(col("seq") <= m))
    val withFlag =
      if (raw.columns.contains("deleted"))
        raw.withColumn("deleted", coalesce(col("deleted"), lit(false)))
      else raw.withColumn("deleted", lit(false))
    graft.operators.Relational
      .dedupeFirstWins(withFlag, Seq(col("id")), Seq(col("seq").desc))
      .filter(!col("deleted"))
      .select(col("id").as("__did"), col("seq").as("__max_seq"))
  }

  /** Time-travel read of a postings index AS OF `asOfSeq` — the
    * [[readIvfIndexAsOf]]/[[readDupGraphPairsAsOf]] discipline on the
    * third artifact family: the doc-version sidecar and the postings
    * rows are both restricted to stamps ≤ the as-of clock, then the
    * usual per-doc max-stamp resolution runs — so a read below a
    * takedown's or re-index's stamp serves yesterday's index exactly
    * (reproduce a retrieval regression against the index that
    * produced it). As-of max(seq) == [[readPostingsLatest]]; as-of 0
    * == the base build. Compaction forfeits pre-compaction states
    * (one-generation rewrite), same trade as the other families.
    */
  def readPostingsAsOf(
      spark: SparkSession,
      path: String,
      asOfSeq: Long): DataFrame = {
    require(asOfSeq >= 0L, "asOfSeq must be >= 0")
    spark.read.parquet(path)
      .withColumn("__seq", coalesce(col("__seq"), lit(0L)))
      .filter(col("__seq") <= asOfSeq)
      .join(
        livePostingsDocs(spark, path, Some(asOfSeq)),
        col("id") === col("__did") && col("__seq") === col("__max_seq"))
      .drop("__did", "__max_seq", "__seq")
  }

  def readPostingsLatest(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .withColumn("__seq", coalesce(col("__seq"), lit(0L)))
      .join(
        livePostingsDocs(spark, path),
        col("id") === col("__did") && col("__seq") === col("__max_seq"))
      .drop("__did", "__max_seq", "__seq")

  /** Live doc lengths (id, dl) from the `_doclen` sidecar — each live
    * doc's CURRENT version's token count. The input to index-resident
    * length-normalized scoring ([[graft.operators.TextAnalysis
    * .bm25FromPostings]]); doc-count-bounded, no corpus scan.
    */
  def readPostingsDocLengths(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/_doclen")
      .join(
        livePostingsDocs(spark, path),
        col("id") === col("__did") && col("seq") === col("__max_seq"))
      .select(col("id"), col("dl"))

  /** Compact a persisted postings index: materialize the effective
    * postings (doc-version resolution + tombstones) and rebuild the
    * bucketed base via [[writePostings]] with the SAME persisted
    * modulus — the doc-seq sidecar resets to stamp 0, tombstoned
    * docs' bytes are gone, and [[readPostings]] afterwards serves
    * what [[readPostingsLatest]] served before.
    */
  def compactPostings(spark: SparkSession, path: String): Unit = {
    val buckets = postingsBucketCount(spark, path)
    // staging must be a SIBLING, not a child: writePostings overwrites
    // the index root, which would delete a child staging dir before
    // the rebuild reads it
    val stage = s"${path}__compacting"
    readPostingsLatest(spark, path)
      .drop("term_bucket")
      .write.mode("overwrite").parquet(stage)
    writePostings(spark.read.parquet(stage), path, buckets)
    deleteDir(spark, stage)
  }

  /** The bucket modulus `path`'s index was written with (persisted by
    * [[writePostings]]) — fails fast on a pre-meta or foreign layout
    * instead of guessing.
    */
  def postingsBucketCount(spark: SparkSession, path: String): Int =
    spark.read.parquet(s"$path/_meta").head().getInt(0)

  /** The partition buckets `writePostings` assigned to `terms` — the
    * pruning predicate for a phrase query over a loaded index. The
    * bucket modulus comes from the index's own persisted `_meta`, so
    * the write/read pair CANNOT desynchronize — the silent-empty
    * failure mode of a caller-supplied count is structurally gone.
    */
  def postingsBuckets(
      spark: SparkSession,
      path: String,
      terms: Seq[String]): Seq[Long] = {
    import spark.implicits._
    val buckets = postingsBucketCount(spark, path)
    terms
      .toDF("term")
      .select(pmod(xxhash64(col("term")), lit(buckets.toLong)))
      .collect()
      .map(_.getLong(0))
      .distinct
      .toSeq
  }

  // ---- persistent near-dup pair graph -----------------------------
  //
  // The near-dup pair pipeline (shingle → band → verify) and its
  // transitive closure are, after the ANN index build, the most
  // expensive artifacts the engine derives — and they feed MANY
  // consumers: cluster-size health reports, PageRank centrality,
  // leakage-safe splits, golden-record resolution. At 100 TB that
  // pipeline is a many-hour scan; re-deriving it inside every
  // consumer query multiplies it per consumer. These sinks make it a
  // build-once artifact, the same pattern as the IVF/PQ/postings
  // indexes above: pairs and cluster labels land as parquet
  // partitioned by an id-hash bucket (bounded directory count; a
  // per-doc neighbor or label lookup prunes to one bucket), and every
  // consumer loads instead of re-deriving.

  /** Persist a near-dup pair graph: `path/pairs` (the verified edge
    * list, partitioned by `pair_bucket` = hash(id_a) mod `buckets`)
    * and `path/labels` — the transitive-closure cluster labels
    * (id, cluster_id) computed here via [[graft.operators.Dedup
    * .clusterPairs]], partitioned by hash(id) likewise. The pair
    * frame is WRITTEN FIRST and the closure runs off the written
    * parquet, so the upstream pair pipeline executes exactly once
    * per build no matter how expensive its lineage is.
    *
    * Labels cover ids that appear in at least one pair — singleton
    * docs are absent by construction and consumers restore them with
    * `coalesce(cluster_id, id)`, the same rule the in-line
    * clusterPairs consumers already apply. The bucket modulus is
    * persisted in `path/_meta` (the postings-index guard): readers
    * never guess it. `checkpointDir` passes through to the closure's
    * iteration-truncation policy ([[graft.operators.Checkpointing]]).
    */
  def writeDupGraph(
      pairs: DataFrame,
      path: String,
      buckets: Int = 64,
      checkpointDir: Option[String] = None): Unit = {
    require(buckets > 0, "buckets must be positive")
    val spark = pairs.sparkSession
    import spark.implicits._
    // base rows carry upsert-stamp 0, the writeIvfIndex rule: one
    // schema shared with later upsertDupGraph appends
    val stampedPairs = pairs
      .withColumn("pair_bucket", pmod(xxhash64(col("id_a")), lit(buckets.toLong)))
      .withColumn("__seq", lit(0L))
    stampedPairs
      // cluster by the partition column before the partitioned write
      // (guide-standard REBALANCE-before-write): each bucket lands in
      // ONE task → one file per bucket per generation, instead of a
      // file per (task × bucket) — the write used to emit ~4 small
      // files per bucket and every read/copy paid the listing. At
      // production scale the bucket modulus is the file-sizing knob.
      .repartition(col("pair_bucket"))
      .write
      .mode("overwrite")
      .partitionBy("pair_bucket")
      .parquet(s"$path/pairs")
    // EXPLICIT-schema read-backs throughout this family: an EMPTY
    // pair set (a quiet day's increment base, a history window with
    // no dups) writes a fileless parquet dir, and schema inference on
    // it throws — with the schema persisted in _meta and supplied on
    // every read, an empty artifact is just an empty frame.
    val stampedLabels = graft.operators.Dedup
      .clusterPairs(
        spark.read.schema(stampedPairs.schema).parquet(s"$path/pairs")
          .select(col("id_a"), col("id_b")),
        checkpointDir = checkpointDir)
      .withColumn("id_bucket", pmod(xxhash64(col("id")), lit(buckets.toLong)))
    stampedLabels
      .repartition(col("id_bucket"))
      .write
      .mode("overwrite")
      .partitionBy("id_bucket")
      .parquet(s"$path/labels")
    Seq((buckets, stampedPairs.schema.json, stampedLabels.schema.json))
      .toDF("buckets", "pairs_schema", "labels_schema")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/_meta")
  }

  private def dupGraphMeta(spark: SparkSession, path: String): (Int, StructType, StructType) = {
    val r = spark.read.parquet(s"$path/_meta")
      .select(col("buckets"), col("pairs_schema"), col("labels_schema"))
      .head()
    (
      r.getInt(0),
      org.apache.spark.sql.types.DataType.fromJson(r.getString(1)).asInstanceOf[StructType],
      org.apache.spark.sql.types.DataType.fromJson(r.getString(2)).asInstanceOf[StructType])
  }

  /** Load a [[writeDupGraph]] edge list: (id_a, id_b) plus whatever
    * verification columns the build carried (jaccard score etc.).
    * A neighbor lookup for doc d prunes on
    * `pair_bucket = hash(d) mod bucketCount` — see [[dupGraphBuckets]].
    */
  def readDupGraphPairs(spark: SparkSession, path: String): DataFrame = {
    val (_, pairsSchema, _) = dupGraphMeta(spark, path)
    val raw = spark.read.schema(pairsSchema).parquet(s"$path/pairs")
    // doc tombstones ([[deleteDupGraphDocs]]) hide every pair that
    // touches a deleted doc at or below the tombstone stamp — pairs
    // re-appended at a higher stamp (the doc came back) stay live
    val live = tombstonesOf(spark, path) match {
      case None => raw
      case Some(t) =>
        val tmax = t.groupBy(col("id").as("__tid")).agg(max(col("seq")).as("__tseq"))
        raw
          .join(
            tmax,
            col("id_a") === col("__tid") &&
              coalesce(col("__seq"), lit(0L)) <= col("__tseq"),
            "left_anti")
          .join(
            tmax,
            col("id_b") === col("__tid") &&
              coalesce(col("__seq"), lit(0L)) <= col("__tseq"),
            "left_anti")
    }
    live.drop("pair_bucket", "__seq")
  }

  /** Time-travel read of the dup-graph pair set AS OF `asOfSeq` — the
    * [[readIvfIndexAsOf]] discipline applied to the second artifact
    * family: every appended pair carries its stamp (base build = 0)
    * and tombstones carry theirs, so the graph exactly as it stood at
    * stamp `asOfSeq` is a FILTER (appends with __seq ≤ asOfSeq,
    * tombstones restricted to seq ≤ asOfSeq), not a restore from
    * backup. As-of the max stamp == the live [[readDupGraphPairs]]
    * view; as-of 0 == the base build; an as-of read BELOW a delete's
    * stamp sees the pre-takedown graph — the audit/debug view
    * ("which cluster did this doc sit in before Tuesday's takedown")
    * that no current-view read can produce. NOTE: compaction
    * ([[compactDupGraph]]) rewrites history into one generation and
    * deliberately forfeits pre-compaction as-of states — time travel
    * and compaction trade off, same as the IVF family.
    */
  def readDupGraphPairsAsOf(
      spark: SparkSession,
      path: String,
      asOfSeq: Long): DataFrame = {
    require(asOfSeq >= 0L, "asOfSeq must be >= 0")
    val (_, pairsSchema, _) = dupGraphMeta(spark, path)
    val raw = spark.read.schema(pairsSchema).parquet(s"$path/pairs")
      .filter(coalesce(col("__seq"), lit(0L)) <= asOfSeq)
    val live = tombstonesOf(spark, path) match {
      case None => raw
      case Some(t) =>
        val tmax = t
          .filter(col("seq") <= asOfSeq)
          .groupBy(col("id").as("__tid"))
          .agg(max(col("seq")).as("__tseq"))
        raw
          .join(
            tmax,
            col("id_a") === col("__tid") &&
              coalesce(col("__seq"), lit(0L)) <= col("__tseq"),
            "left_anti")
          .join(
            tmax,
            col("id_b") === col("__tid") &&
              coalesce(col("__seq"), lit(0L)) <= col("__tseq"),
            "left_anti")
    }
    live.drop("pair_bucket", "__seq")
  }

  /** Tombstone-delete DOCS from the dup graph (the takedown shape for
    * the pair artifact): every pair touching the ids is hidden from
    * this stamp on, and — because removing a node can SPLIT a cluster,
    * which no incremental label patch can express — the label table
    * is re-closed over the LIVE pairs. The recompute is the honest
    * cost of graph deletion; it re-runs only the closure (labels are
    * doc-bounded), never the pair-discovery pipeline.
    *
    * BULK TAKEDOWNS: the closure is O(live pairs) per call, so N
    * small takedown batches paying N closures is the artifact
    * family's write-amplification hot spot at production scale. Pass
    * `recompute = false` for every batch but the last (or for all of
    * them, then call [[recomputeDupGraphLabels]] once) — tombstones
    * are the durable truth and each batch's stamp stays individually
    * time-travelable ([[readDupGraphPairsAsOf]] semantics are
    * IDENTICAL either way; only label-refresh timing differs). The
    * trade: between a deferred delete and the final closure the PAIR
    * reads already hide the docs but the LABEL table is stale — a
    * label consumer in that window can still see a tombstoned id or
    * a cluster that the takedown split. Defer only within a
    * maintenance window that ends with the one closure.
    */
  def deleteDupGraphDocs(
      ids: DataFrame,
      path: String,
      seq: Long,
      checkpointDir: Option[String] = None,
      recompute: Boolean = true): Unit = {
    require(seq > 0L, "delete seq must be positive (0 is the base build's stamp)")
    writeTombstones(ids, path, seq)
    if (recompute) recomputeDupGraphLabels(ids.sparkSession, path, checkpointDir)
  }

  /** Re-close the dup graph's label table from its live pair set —
    * the maintenance step after [[deleteDupGraphDocs]] (invoked there
    * automatically) or any out-of-band pair surgery. Staged swap like
    * the upsert path.
    */
  def recomputeDupGraphLabels(
      spark: SparkSession,
      path: String,
      checkpointDir: Option[String] = None): Unit = {
    val (buckets, _, _) = dupGraphMeta(spark, path)
    graft.operators.Dedup
      .clusterPairs(
        readDupGraphPairs(spark, path).select(col("id_a"), col("id_b")),
        checkpointDir = checkpointDir)
      .withColumn("id_bucket", pmod(xxhash64(col("id")), lit(buckets.toLong)))
      .repartition(col("id_bucket"))
      .write.mode("overwrite").partitionBy("id_bucket").parquet(s"$path/labels_next")
    // directory swap instead of read-back + rewrite: the staged table
    // used to be re-shuffled and re-written into the live dir (2× the
    // label I/O per refresh); a rename carries the same crash
    // contract (staged dir intact until the live one is replaced, so
    // an interrupted swap is re-runnable from the stage)
    swapDir(spark, s"$path/labels_next", s"$path/labels")
  }

  /** Load [[writeDupGraph]] cluster labels: (id, cluster_id), pair-
    * member ids only — restore singletons with coalesce(label, id).
    */
  def readDupGraphLabels(spark: SparkSession, path: String): DataFrame = {
    val (_, _, labelsSchema) = dupGraphMeta(spark, path)
    spark.read.schema(labelsSchema).parquet(s"$path/labels").drop("id_bucket")
  }

  /** The persisted bucket modulus of a dup-graph artifact — for
    * building pruning predicates on `pair_bucket`/`id_bucket`.
    */
  def dupGraphBucketCount(spark: SparkSession, path: String): Int =
    spark.read.parquet(s"$path/_meta").select(col("buckets")).head().getInt(0)

  /** Compact a dup-graph artifact's pair set: distinct pairs rewritten
    * as a fresh stamp-0 base. Streaming maintenance can append the
    * same pair under two stamps (a pair whose endpoints arrive in
    * different micro-batches is discovered by both); the duplicates
    * are harmless to the closure and to every label consumer, but
    * they inflate the pair scan — this clears them, plus the file
    * accumulation of a long append history. Labels are already a
    * resolved table and are untouched.
    */
  def compactDupGraph(spark: SparkSession, path: String): Unit = {
    val (buckets, _, _) = dupGraphMeta(spark, path)
    val stage = s"$path/pairs_compacting"
    readDupGraphPairs(spark, path)
      .distinct()
      .withColumn("pair_bucket", pmod(xxhash64(col("id_a")), lit(buckets.toLong)))
      .withColumn("__seq", lit(0L))
      .repartition(col("pair_bucket"))
      .write.mode("overwrite").partitionBy("pair_bucket").parquet(stage)
    // swap, don't rewrite: the compacted generation was read back and
    // re-written into the live dir — 2× the surviving-pair I/O per
    // compaction for the same crash contract (stage survives until
    // the live dir is replaced)
    swapDir(spark, stage, s"$path/pairs")
    // the compacted base holds only LIVE pairs at stamp 0 — keeping
    // the tombstones would wrongly re-hide docs whose pairs were
    // re-appended before compaction
    deleteDir(spark, s"$path/_tombstones")
  }

  /** Incremental dup-graph maintenance — the IVF/PQ/postings upsert
    * discipline applied to the pair-graph artifact (the reference's
    * daily changed-page increment, where a batch's new near-dup pairs
    * must NOT trigger a full-corpus re-closure): `newPairs` (the
    * increment's verified pairs — batch×batch plus batch×history)
    * appends to `path/pairs` with a seq stamp, and the label table is
    * re-resolved INCREMENTALLY — every existing cluster re-enters the
    * closure as depth-1 star edges (member → its label), so the merge
    * converges in O(log new-chain-length) rounds over the
    * increment + star edges instead of re-walking the full pair set's
    * chains. The rewritten labels are the artifact's new truth
    * (labels are a resolved VIEW, small next to the pair set — a
    * doc-count table, not a pair table, so the rewrite is the cheap
    * part of the update).
    *
    * Equivalence: union-with-stars has the same transitive closure as
    * the full pair set (a star edge is itself a consequence of the
    * old pairs; every old pair is label-connected through its star),
    * and min-label propagation keeps cluster ids stable under
    * increments — the canonical id only ever decreases.
    *
    * Takedown interaction (seq order, like every artifact family): an
    * increment pair touching a previously-tombstoned id lands ABOVE
    * the tombstone stamp and therefore RE-ADDS that doc to the graph.
    * If the takedown must stick, filter the increment against the
    * takedown list before upserting.
    */
  def upsertDupGraph(
      newPairs: DataFrame,
      path: String,
      seq: Long,
      checkpointDir: Option[String] = None,
      recomputeLabels: Boolean = true): Unit = {
    require(seq > 0L, "upsert seq must be positive (0 is the base build's stamp)")
    val spark = newPairs.sparkSession
    val (buckets, pairsSchema, _) = dupGraphMeta(spark, path)
    newPairs
      .withColumn("pair_bucket", pmod(xxhash64(col("id_a")), lit(buckets.toLong)))
      .withColumn("__seq", lit(seq))
      .repartition(col("pair_bucket"))
      .write.mode("append").partitionBy("pair_bucket").parquet(s"$path/pairs")
    // `recomputeLabels = false` is the bulk-maintenance posture the
    // delete path already offers: appends are the durable truth (pair
    // reads and as-of reads are correct immediately); skip the
    // star-edge merge when the maintenance window ends with its own
    // label refresh (or when the consumer reads pairs, not labels) —
    // N batched upserts then pay ONE closure, not N.
    if (!recomputeLabels) return
    val oldLabels = readDupGraphLabels(spark, path)
    val stars = oldLabels
      .filter(col("id") =!= col("cluster_id"))
      .select(col("id").as("id_a"), col("cluster_id").as("id_b"))
    val merged = graft.operators.Dedup.clusterPairs(
      // read the increment back from the artifact (pair lineage runs
      // once, into the append) and fold in the star edges
      spark.read.schema(pairsSchema).parquet(s"$path/pairs")
        .filter(coalesce(col("__seq"), lit(0L)) === seq)
        .select(col("id_a"), col("id_b"))
        .unionByName(stars),
      checkpointDir = checkpointDir)
    // docs untouched by the increment keep their labels; docs in the
    // merged closure take the new (possibly lower) canonical id
    val rewritten = oldLabels
      .join(merged.withColumnRenamed("cluster_id", "__new"), Seq("id"), "full")
      .select(
        col("id"),
        coalesce(col("__new"), col("cluster_id")).as("cluster_id"))
    rewritten
      .withColumn("id_bucket", pmod(xxhash64(col("id")), lit(buckets.toLong)))
      .repartition(col("id_bucket"))
      .write.mode("overwrite").partitionBy("id_bucket").parquet(s"$path/labels_next")
    // swap via rename (same crash contract as the old read-back +
    // rewrite — the staged dir survives until the live one is
    // replaced — at half the label I/O)
    swapDir(spark, s"$path/labels_next", s"$path/labels")
  }

  /** Persist a perceptual-hash code table
    * ([[graft.operators.Multimodal.phashCodes]] output) partitioned
    * by the 8-bit prefix bucket — the multimodal member of the
    * persistent-index family: codes are the hash of the DECODED
    * media (the expensive step at 100 TB of images), so the build
    * runs once and every dedup/probe consumer loads 2-byte codes
    * instead of re-decoding bytes; a single-image probe prunes to
    * its prefix directory.
    */
  def writePhashIndex(codes: DataFrame, path: String): Unit =
    codes
      .withColumn("__seq", lit(0L))
      // file-per-prefix write (the dup-graph rule)
      .repartition(col("pfx"))
      .write.mode("overwrite").partitionBy("pfx").parquet(path)

  def readPhashIndex(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).drop("__seq")

  /** Append re-hashed media codes to a persisted phash index with a
    * caller seq stamp (the re-crawled-image shape: decode + hash runs
    * only on the increment, the base is never rewritten). A re-hashed
    * image whose code changed may land in a DIFFERENT `pfx` directory
    * than its old version — [[readPhashIndexLatest]] resolves
    * last-wins per id across buckets, which is why the latest reader
    * (not a bucket-pruned raw scan) is the correct consumer of an
    * upserted index; after [[compactPhashIndex]] the stale row is
    * physically gone and bucket pruning is safe again.
    */
  def upsertPhashIndex(codes: DataFrame, path: String, seq: Long): Unit = {
    require(seq > 0L, "upsert seq must be positive (0 is the base build's stamp)")
    codes
      .withColumn("__seq", lit(seq))
      .repartition(col("pfx"))
      .write.mode("append").partitionBy("pfx").parquet(path)
  }

  /** Tombstone-delete media ids from a persisted phash index — the
    * [[deleteIvfIds]] shape for the code table (media takedown
    * without touching code files).
    */
  def deletePhashIds(ids: DataFrame, path: String, seq: Long): Unit = {
    require(seq > 0L, "delete seq must be positive (0 is the base build's stamp)")
    writeTombstones(ids, path, seq)
  }

  /** Load a phash index with upserts + tombstones applied: the LATEST
    * version of every media id (max `__seq`, distinct positive stamps
    * per upsert), minus tombstoned ids. One id-window shuffle — the
    * read-side cost of the append-only write path.
    */
  def readPhashIndexLatest(spark: SparkSession, path: String): DataFrame = {
    val all = spark.read.parquet(path)
      .withColumn("__seq", coalesce(col("__seq"), lit(0L)))
    val latest = graft.operators.Relational
      .dedupeFirstWins(all, Seq(col("id")), Seq(col("__seq").desc))
    applyTombstones(latest, "id", path)
  }

  /** Time-travel read of a phash index AS OF `asOfSeq`: code rows
    * and tombstones restricted to stamps ≤ the clock, then the same
    * last-wins resolution as [[readPhashIndexLatest]] — an as-of
    * below a takedown's stamp serves the pre-takedown code table.
    */
  def readPhashIndexAsOf(
      spark: SparkSession,
      path: String,
      asOfSeq: Long): DataFrame = {
    require(asOfSeq >= 0L, "asOfSeq must be >= 0")
    val all = spark.read.parquet(path)
      .withColumn("__seq", coalesce(col("__seq"), lit(0L)))
      .filter(col("__seq") <= asOfSeq)
    val latest = graft.operators.Relational
      .dedupeFirstWins(all, Seq(col("id")), Seq(col("__seq").desc))
    applyTombstones(latest, "id", path, Some(asOfSeq))
  }

  /** Compact a persisted phash index: resolve last-wins + tombstones
    * once, rewrite as a stamp-0 base (root overwrite also purges the
    * tombstone sidecar). [[readPhashIndex]] afterwards serves exactly
    * what [[readPhashIndexLatest]] served before.
    */
  def compactPhashIndex(spark: SparkSession, path: String): Unit = {
    val stage = s"${path}__compacting"
    readPhashIndexLatest(spark, path)
      .withColumn("__seq", lit(0L))
      .repartition(col("pfx"))
      .write.mode("overwrite").partitionBy("pfx").parquet(stage)
    // swap, don't rewrite (same crash contract, half the I/O); the
    // fresh stage has no _tombstones child, so the purge rides along
    swapDir(spark, stage, path)
  }

  // ---- minhash signature artifact (the 6th seq-versioned family) --
  //
  // The incremental near-dup pipeline's history side: signatures are
  // ONE full-corpus shingle pass, and every daily batch afterwards
  // needs only them (band candidates + hash-set verification both
  // read the signature table, never the history TEXT). At 100 TB the
  // re-signing cost this artifact removes is the dominant term of
  // the daily near-dup run — the same fit-once/score-forever shape
  // as the LM-stats artifact. Same lifecycle discipline as
  // IVF/PQ/postings/phash/dup-graph: stamp-0 base, seq-stamped
  // upserts resolved last-wins per id, tombstone deletes, as-of time
  // travel, one-generation compaction (ArtifactContractSpec runs its
  // four clauses over this family too).

  /** Persist a MinHash signature table ([[graft.operators.Dedup
    * .minhashSign]] output: id, sig array, hs sorted hash set) as a
    * stamp-0 base, partitioned by hash(id) mod `buckets` (bounded
    * directory count; per-doc signature lookups prune to one
    * bucket). Modulus + schema persist in `_meta` (the dup-graph
    * rule: explicit-schema read-backs, empty artifacts read as empty
    * frames).
    */
  def writeMinhashSigs(sigs: DataFrame, path: String, buckets: Int = 64): Unit = {
    require(buckets > 0, "buckets must be positive")
    val spark = sigs.sparkSession
    import spark.implicits._
    val stamped = sigs
      .withColumn("id_bucket", pmod(xxhash64(col("id")), lit(buckets.toLong)))
      .withColumn("__seq", lit(0L))
    stamped
      .repartition(col("id_bucket"))
      .write.mode("overwrite").partitionBy("id_bucket").parquet(s"$path/sigs")
    Seq((buckets, stamped.schema.json))
      .toDF("buckets", "sigs_schema")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/_meta")
  }

  private def minhashSigsMeta(spark: SparkSession, path: String): (Int, StructType) = {
    val r = spark.read.parquet(s"$path/_meta")
      .select(col("buckets"), col("sigs_schema")).head()
    (r.getInt(0),
      org.apache.spark.sql.types.DataType.fromJson(r.getString(1)).asInstanceOf[StructType])
  }

  /** Append re-signed docs with a caller seq stamp — the re-crawled
    * page shape: shingle + sign runs only on the increment, the base
    * is never rewritten. [[readMinhashSigsLatest]] resolves replaced
    * ids last-wins on the stamp.
    */
  def upsertMinhashSigs(sigs: DataFrame, path: String, seq: Long): Unit = {
    require(seq > 0L, "upsert seq must be positive (0 is the base build's stamp)")
    val (buckets, _) = minhashSigsMeta(sigs.sparkSession, path)
    sigs
      .withColumn("id_bucket", pmod(xxhash64(col("id")), lit(buckets.toLong)))
      .withColumn("__seq", lit(seq))
      .repartition(col("id_bucket"))
      .write.mode("append").partitionBy("id_bucket").parquet(s"$path/sigs")
  }

  /** Tombstone-delete doc ids from a signature artifact (takedown
    * without rewriting signature files; re-signing at a higher stamp
    * restores).
    */
  def deleteMinhashIds(ids: DataFrame, path: String, seq: Long): Unit = {
    require(seq > 0L, "delete seq must be positive (0 is the base build's stamp)")
    writeTombstones(ids, path, seq)
  }

  /** Plain read (stamps dropped) — for freshly-built or compacted
    * artifacts; use [[readMinhashSigsLatest]] under live upserts.
    */
  def readMinhashSigs(spark: SparkSession, path: String): DataFrame = {
    val (_, schema) = minhashSigsMeta(spark, path)
    spark.read.schema(schema).parquet(s"$path/sigs").drop("__seq", "id_bucket")
  }

  /** Latest signature per id (max stamp, tombstones applied) — the
    * live history side of the daily near-dup run.
    */
  def readMinhashSigsLatest(spark: SparkSession, path: String): DataFrame = {
    val (_, schema) = minhashSigsMeta(spark, path)
    val all = spark.read.schema(schema).parquet(s"$path/sigs")
      .withColumn("__seq", coalesce(col("__seq"), lit(0L)))
    val latest = graft.operators.Relational
      .dedupeFirstWins(all, Seq(col("id")), Seq(col("__seq").desc))
    applyTombstones(latest, "id", path).drop("id_bucket")
  }

  /** Time-travel read AS OF `asOfSeq` — signature rows and tombstones
    * restricted to stamps ≤ the clock, then last-wins: reproduce
    * yesterday's dedup decisions against yesterday's history.
    */
  def readMinhashSigsAsOf(spark: SparkSession, path: String, asOfSeq: Long): DataFrame = {
    require(asOfSeq >= 0L, "asOfSeq must be >= 0")
    val (_, schema) = minhashSigsMeta(spark, path)
    val all = spark.read.schema(schema).parquet(s"$path/sigs")
      .withColumn("__seq", coalesce(col("__seq"), lit(0L)))
      .filter(col("__seq") <= asOfSeq)
    val latest = graft.operators.Relational
      .dedupeFirstWins(all, Seq(col("id")), Seq(col("__seq").desc))
    applyTombstones(latest, "id", path, Some(asOfSeq)).drop("id_bucket")
  }

  /** Compact: resolve last-wins + tombstones once, rewrite as a
    * stamp-0 base, purge the tombstone sidecar — [[readMinhashSigs]]
    * afterwards serves what [[readMinhashSigsLatest]] served before.
    */
  def compactMinhashSigs(spark: SparkSession, path: String): Unit = {
    val (buckets, schema) = minhashSigsMeta(spark, path)
    val stage = s"$path/sigs_compacting"
    readMinhashSigsLatest(spark, path)
      .withColumn("id_bucket", pmod(xxhash64(col("id")), lit(buckets.toLong)))
      .withColumn("__seq", lit(0L))
      .repartition(col("id_bucket"))
      .write.mode("overwrite").partitionBy("id_bucket").parquet(stage)
    swapDir(spark, stage, s"$path/sigs")
    deleteDir(spark, s"$path/_tombstones")
  }

  /** Persist a learned BPE vocab-units table
    * ([[graft.operators.TextAnalysis.bpeVocabUnits]]) — the tokenizer
    * artifact: fit once per corpus release, price every later batch's
    * token budget by a dictionary join. Flat layout (the table is
    * vocab-bounded) + `_meta` schema for the explicit-schema
    * read-back (empty vocab reads as an empty frame). Versioned by
    * PATH, not by stamps: a tokenizer re-fit is a REBUILD (frozen-
    * codebook rule), never an in-place upsert.
    */
  def writeBpeVocab(units: DataFrame, path: String): Unit = {
    val spark = units.sparkSession
    import spark.implicits._
    units.write.mode("overwrite").parquet(s"$path/units")
    Seq(units.schema.json).toDF("units_schema")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/_meta")
  }

  /** Load a [[writeBpeVocab]] artifact: (w, units). */
  def readBpeVocab(spark: SparkSession, path: String): DataFrame = {
    val schema = org.apache.spark.sql.types.DataType
      .fromJson(
        spark.read.parquet(s"$path/_meta").select(col("units_schema")).head().getString(0))
      .asInstanceOf[StructType]
    spark.read.schema(schema).parquet(s"$path/units")
  }

  /** Persist a fitted bigram LM ([[graft.operators.TextAnalysis
    * .fitBigramLm]]'s (biLp, uniLp, oov6, oovbo6)) as a build-once
    * artifact — the LM-stats member of the IVF/postings/dup-graph
    * family: at 100 TB the LM fit is a full token-stream scan, while
    * scoring any new batch off the ARTIFACT is two dictionary
    * equi-joins, so fit once per corpus release and score forever.
    * Layout: `bigrams/` term-dictionary rows bucketed by hash(prev)
    * (a scorer's bigram join prunes to the probe terms' buckets),
    * `unigrams/` flat, `_meta` carrying bucket modulus + the two OOV
    * constants + both schemas (explicit-schema read-backs: an empty
    * LM — one-doc corpus — must read as an empty frame, the
    * writeDupGraph rule).
    */
  def writeLmModel(
      lm: (DataFrame, DataFrame, Long, Long),
      path: String,
      buckets: Int = 64): Unit = {
    require(buckets > 0, "buckets must be positive")
    val (biLp, uniLp, oov6, oovbo6) = lm
    val spark = biLp.sparkSession
    import spark.implicits._
    val bi = biLp.withColumn(
      "prev_bucket",
      pmod(xxhash64(col("prev")), lit(buckets.toLong)))
    bi.repartition(col("prev_bucket"))
      .write.mode("overwrite").partitionBy("prev_bucket").parquet(s"$path/bigrams")
    uniLp.write.mode("overwrite").parquet(s"$path/unigrams")
    Seq((buckets, oov6, oovbo6, bi.schema.json, uniLp.schema.json))
      .toDF("buckets", "oov6", "oovbo6", "bi_schema", "uni_schema")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/_meta")
  }

  /** Load a [[writeLmModel]] artifact back into the exact
    * (biLp, uniLp, oov6, oovbo6) shape [[graft.operators
    * .TextAnalysis.scoreBigramLm]] consumes — scoring off the loaded
    * model must be bit-identical to scoring off the in-line fit
    * (every log-prob was rounded to BIGINT micro-nats at FIT time, so
    * the parquet round-trip is lossless by construction).
    */
  def readLmModel(
      spark: SparkSession,
      path: String): (DataFrame, DataFrame, Long, Long) = {
    val m = spark.read.parquet(s"$path/_meta")
      .select(col("buckets"), col("oov6"), col("oovbo6"), col("bi_schema"), col("uni_schema"))
      .head()
    def schemaOf(j: String) =
      org.apache.spark.sql.types.DataType.fromJson(j).asInstanceOf[StructType]
    val bi = spark.read.schema(schemaOf(m.getString(3))).parquet(s"$path/bigrams")
      .drop("prev_bucket")
    val uni = spark.read.schema(schemaOf(m.getString(4))).parquet(s"$path/unigrams")
    (bi, uni, m.getLong(1), m.getLong(2))
  }

  // --- LM COUNT-GRID artifact family (the 7th seq-versioned family) ---
  //
  // [[writeLmModel]] persists derived LOG-PROBS — correct for a frozen
  // release, but log-probs are not mergeable, so a live corpus would
  // re-fit per increment. The count grids ARE mergeable (linear in
  // documents): this family persists (term, cnt) / (prev, term, cab)
  // with upsert-seq stamps, increments append partial grids, a doc
  // TAKEDOWN appends the removed docs' grids NEGATED (no tombstone
  // sidecar — counts subtract exactly), as-of reads reconstruct any
  // historical model, and [[graft.operators.TextAnalysis
  // .fitBigramLmFromCounts]] derives a scorer bit-identical to a
  // from-scratch fit over the same live corpus.

  /** Persist bigram-LM count grids at upsert-stamp 0. Layout:
    * `uni/` (term, cnt, __seq) bucketed by hash(term); `bi/`
    * (prev, term, cab, __seq) bucketed by hash(prev); `_meta` with
    * the modulus + both schemas (explicit-schema read-backs — an
    * empty grid reads as an empty frame, the writeDupGraph rule).
    */
  def writeLmCounts(
      uni: DataFrame,
      bi: DataFrame,
      path: String,
      buckets: Int = 64): Unit = {
    require(buckets > 0, "buckets must be positive")
    val spark = uni.sparkSession
    import spark.implicits._
    val u = uni
      .withColumn("term_bucket", pmod(xxhash64(col("term")), lit(buckets.toLong)))
      .withColumn("__seq", lit(0L))
    u.repartition(col("term_bucket"))
      .write.mode("overwrite").partitionBy("term_bucket").parquet(s"$path/uni")
    val b = bi
      .withColumn("prev_bucket", pmod(xxhash64(col("prev")), lit(buckets.toLong)))
      .withColumn("__seq", lit(0L))
    b.repartition(col("prev_bucket"))
      .write.mode("overwrite").partitionBy("prev_bucket").parquet(s"$path/bi")
    Seq((buckets, u.schema.json, b.schema.json))
      .toDF("buckets", "uni_schema", "bi_schema")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/_meta")
  }

  private def lmCountsMeta(spark: SparkSession, path: String): (Int, StructType, StructType) = {
    val m = spark.read.parquet(s"$path/_meta")
      .select(col("buckets"), col("uni_schema"), col("bi_schema"))
      .head()
    def schemaOf(j: String) =
      org.apache.spark.sql.types.DataType.fromJson(j).asInstanceOf[StructType]
    (m.getInt(0), schemaOf(m.getString(1)), schemaOf(m.getString(2)))
  }

  /** Append an increment's partial count grids with a seq stamp.
    * A TAKEDOWN is the same call with the removed docs' grids
    * NEGATED by the caller (counts are linear — no tombstone
    * machinery, subtraction IS removal).
    */
  def upsertLmCounts(
      uniDelta: DataFrame,
      biDelta: DataFrame,
      path: String,
      seq: Long): Unit = {
    val spark = uniDelta.sparkSession
    val (buckets, _, _) = lmCountsMeta(spark, path)
    uniDelta
      .withColumn("term_bucket", pmod(xxhash64(col("term")), lit(buckets.toLong)))
      .withColumn("__seq", lit(seq))
      .repartition(col("term_bucket"))
      .write.mode("append").partitionBy("term_bucket").parquet(s"$path/uni")
    biDelta
      .withColumn("prev_bucket", pmod(xxhash64(col("prev")), lit(buckets.toLong)))
      .withColumn("__seq", lit(seq))
      .repartition(col("prev_bucket"))
      .write.mode("append").partitionBy("prev_bucket").parquet(s"$path/bi")
  }

  /** Merged count grids AS OF a stamp: SUM over all deltas with
    * `__seq <= asOfSeq`, keys whose merged count reaches 0 DROP
    * (a taken-down doc's types vanish from the vocab exactly as a
    * re-fit would drop them). Returns (uni, bi) scorer-fit inputs.
    */
  def readLmCountsAsOf(
      spark: SparkSession,
      path: String,
      asOfSeq: Long): (DataFrame, DataFrame) = {
    val (_, uniSchema, biSchema) = lmCountsMeta(spark, path)
    val uni = spark.read.schema(uniSchema).parquet(s"$path/uni")
      .filter(coalesce(col("__seq"), lit(0L)) <= asOfSeq)
      .groupBy(col("term"))
      .agg(sum(col("cnt")).as("cnt"))
      .filter(col("cnt") > 0L)
    val bi = spark.read.schema(biSchema).parquet(s"$path/bi")
      .filter(coalesce(col("__seq"), lit(0L)) <= asOfSeq)
      .groupBy(col("prev"), col("term"))
      .agg(sum(col("cab")).as("cab"))
      .filter(col("cab") > 0L)
    (uni, bi)
  }

  /** Latest merged grids (as-of the maximum stamp). */
  def readLmCounts(spark: SparkSession, path: String): (DataFrame, DataFrame) =
    readLmCountsAsOf(spark, path, Long.MaxValue)

  /** Rewrite the delta history as ONE merged grid at stamp 0 — the
    * family's compaction: a month of micro-batch appends (and
    * takedown negations) collapses so readers stop re-merging
    * history. Staged rewrite (never overwrite a path while lazily
    * reading it), zero-count keys purged.
    */
  def compactLmCounts(spark: SparkSession, path: String): Unit = {
    val (buckets, uniSchema, biSchema) = lmCountsMeta(spark, path)
    val (uni, bi) = readLmCounts(spark, path)
    val uStage = s"$path/uni_compacting"
    uni
      .withColumn("term_bucket", pmod(xxhash64(col("term")), lit(buckets.toLong)))
      .withColumn("__seq", lit(0L))
      .repartition(col("term_bucket"))
      .write.mode("overwrite").partitionBy("term_bucket").parquet(uStage)
    swapDir(spark, uStage, s"$path/uni")
    val bStage = s"$path/bi_compacting"
    bi
      .withColumn("prev_bucket", pmod(xxhash64(col("prev")), lit(buckets.toLong)))
      .withColumn("__seq", lit(0L))
      .repartition(col("prev_bucket"))
      .write.mode("overwrite").partitionBy("prev_bucket").parquet(bStage)
    swapDir(spark, bStage, s"$path/bi")
  }

  /** Persisted (day, v, n) VALUE-GRID artifact — the EIGHTH
    * seq-versioned family: the e-process monitors' shared sufficient
    * statistic (the mean monitor, the variance monitor and the mean
    * confidence sequence all fold the SAME grid) promoted from a
    * session memo to a lifecycle artifact. Counts are LINEAR, so the
    * lmCounts rules apply verbatim: an increment appends its partial
    * grid under a seq stamp, a TAKEDOWN appends the removed rows'
    * grid NEGATED (subtraction IS removal — no tombstone machinery),
    * readers SUM-merge with zero-count keys dropping, and compaction
    * rewrites one merged generation at stamp 0. The streaming
    * monitors' append posture IS this artifact's upsert path.
    *
    * The declared-bound contract (v ∈ [0, 1e6] — ppm of the family's
    * documented value bound) is enforced at EVERY write, so a
    * violating increment fails at append time, never twelve hours
    * later inside a consumer — the same fail-fast surface the memo
    * build had, now owned by the artifact.
    */
  def writeValueGrid(cells: DataFrame, path: String, buckets: Int = 32): Unit = {
    require(buckets > 0, "buckets must be positive")
    val spark = cells.sparkSession
    import spark.implicits._
    val g = valueGridGuard(cells.select(col("day"), col("v"), col("n")))
      .withColumn("day_bucket", pmod(xxhash64(col("day")), lit(buckets.toLong)))
      .withColumn("__seq", lit(0L))
    g.repartition(col("day_bucket"))
      .write.mode("overwrite").partitionBy("day_bucket").parquet(s"$path/grid")
    Seq((buckets, g.schema.json))
      .toDF("buckets", "grid_schema")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/_meta")
  }

  private def valueGridGuard(df: DataFrame): DataFrame =
    df.filter(
      assert_true(
        col("v") >= 0L && col("v") <= 1000000L,
        lit("valueGrid: v outside [0, 1e6] — the declared value bound " +
          "is violated")).isNull)

  private def valueGridMeta(spark: SparkSession, path: String): (Int, StructType) = {
    val m = spark.read.parquet(s"$path/_meta")
      .select(col("buckets"), col("grid_schema"))
      .head()
    (m.getInt(0),
      org.apache.spark.sql.types.DataType.fromJson(m.getString(1)).asInstanceOf[StructType])
  }

  /** Append an increment's partial (day, v, n) grid with a seq stamp;
    * negate `n` for a takedown (counts are linear).
    */
  def upsertValueGrid(delta: DataFrame, path: String, seq: Long): Unit = {
    require(seq > 0L, "upsert seq must be positive (0 is the base build's stamp)")
    val (buckets, _) = valueGridMeta(delta.sparkSession, path)
    valueGridGuard(delta.select(col("day"), col("v"), col("n")))
      .withColumn("day_bucket", pmod(xxhash64(col("day")), lit(buckets.toLong)))
      .withColumn("__seq", lit(seq))
      .repartition(col("day_bucket"))
      .write.mode("append").partitionBy("day_bucket").parquet(s"$path/grid")
  }

  /** Merged grid AS OF a stamp: SUM over all deltas with
    * `__seq <= asOfSeq`, keys whose merged count reaches 0 DROP (a
    * taken-down day×value cell vanishes exactly as a rebuild on the
    * filtered events would produce). Returns the (day, v, n)
    * monitor-fit grid.
    */
  def readValueGridAsOf(spark: SparkSession, path: String, asOfSeq: Long): DataFrame = {
    val (_, schema) = valueGridMeta(spark, path)
    spark.read.schema(schema).parquet(s"$path/grid")
      .filter(coalesce(col("__seq"), lit(0L)) <= asOfSeq)
      .groupBy(col("day"), col("v"))
      .agg(sum(col("n")).as("n"))
      .filter(col("n") > 0L)
  }

  /** Latest merged grid (as-of the maximum stamp). */
  def readValueGrid(spark: SparkSession, path: String): DataFrame =
    readValueGridAsOf(spark, path, Long.MaxValue)

  /** Rewrite the delta history as ONE merged grid at stamp 0 —
    * the family's compaction (staged rewrite, zero-count keys
    * purged, history forfeited).
    */
  def compactValueGrid(spark: SparkSession, path: String): Unit = {
    val (buckets, schema) = valueGridMeta(spark, path)
    val stage = s"$path/grid_compacting"
    readValueGrid(spark, path)
      .withColumn("day_bucket", pmod(xxhash64(col("day")), lit(buckets.toLong)))
      .withColumn("__seq", lit(0L))
      .repartition(col("day_bucket"))
      .write.mode("overwrite").partitionBy("day_bucket").parquet(stage)
    swapDir(spark, stage, s"$path/grid")
  }

  /** Rewrite a parquet directory into ~`targetBytes`-sized files —
    * the cure for long append histories and over-parallel writes (a
    * 32-task write of a 10 MB table leaves 32 tiny files; a month of
    * micro-batch appends leaves thousands — and at 100 TB the
    * NameNode/listing cost and per-file open overhead of a
    * small-files directory dominate reads long before the bytes do).
    * File count = ceil(total data bytes / targetBytes), floor 1;
    * staged rewrite (never overwrite a path while lazily reading it),
    * rows byte-identical. Returns (filesBefore, filesAfter).
    */
  def compactSmallFiles(
      spark: SparkSession,
      path: String,
      targetBytes: Long): (Int, Int) = {
    require(targetBytes > 0, "targetBytes must be positive")
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    def dataFiles() = {
      val it = fs.listFiles(p, true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.LocatedFileStatus]
      while (it.hasNext) {
        val f = it.next()
        if (!f.getPath.getName.startsWith("_") && !f.getPath.getName.startsWith("."))
          buf += f
      }
      buf.toSeq
    }
    val before = dataFiles()
    val total = before.map(_.getLen).sum
    val n = math.max(1L, (total + targetBytes - 1) / targetBytes).toInt
    val stage = s"${path}__compacting"
    spark.read.parquet(path).repartition(n).write.mode("overwrite").parquet(stage)
    // repartition again on the live rewrite: the stage read-back may
    // pack several small files per split (files.maxPartitionBytes),
    // and the file count must come out n either way
    spark.read.parquet(stage).repartition(n).write.mode("overwrite").parquet(path)
    deleteDir(spark, stage)
    (before.size, dataFiles().size)
  }

  // ---- tombstone deletes (takedown / right-to-be-forgotten) -------
  //
  // A training-data engine must be able to REMOVE documents from its
  // persisted artifacts — takedown requests, licensing reversals,
  // contamination discoveries — without rewriting a 100 TB index. The
  // discipline is the upsert one inverted: deletes land as seq-stamped
  // tombstone rows in an underscore sidecar (invisible to the data
  // scan, append-only, no existing file rewritten), and the last-wins
  // readers treat a tombstone at stamp s as deleting every version
  // with stamp <= s — so delete-then-reupsert restores the doc, and
  // upsert-then-delete removes it, purely by seq order. Callers use
  // stamps distinct from every upsert stamp. Physical purging
  // (rewriting the data files to actually drop the bytes) is a
  // compaction concern layered on top; the tombstone makes the doc
  // UNSERVABLE immediately, which is what the request requires.

  private def writeTombstones(ids: DataFrame, path: String, seq: Long): Unit =
    ids
      .select(col(ids.columns.head).as("id"))
      .distinct()
      .withColumn("seq", lit(seq))
      .write.mode("append").parquet(s"$path/_tombstones")

  private def tombstonesOf(spark: SparkSession, path: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(s"$path/_tombstones")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) Some(spark.read.parquet(s"$path/_tombstones")) else None
  }

  /** Drop the rows of `latest` (which still carries `__seq`) whose id
    * has a tombstone at or above the row's stamp, then drop `__seq`.
    * `maxSeq` restricts which tombstones are VISIBLE (the as-of
    * read's clock) — None means all of them, the live view.
    */
  private def applyTombstones(
      latest: DataFrame,
      idCol: String,
      path: String,
      maxSeq: Option[Long] = None): DataFrame = {
    val spark = latest.sparkSession
    tombstonesOf(spark, path) match {
      case None => latest.drop("__seq")
      case Some(t0) =>
        val t = maxSeq.fold(t0)(m => t0.filter(col("seq") <= m))
        val tmax = t.groupBy(col("id").as("__tid")).agg(max(col("seq")).as("__tseq"))
        latest
          .join(
            tmax,
            col(idCol) === col("__tid") && col("__seq") <= col("__tseq"),
            "left_anti")
          .drop("__seq")
    }
  }

  /** Tombstone-delete vectors from a persisted IVF index: `ids` (one
    * column, the vector ids) become unservable to
    * [[readIvfIndexLatest]] from this stamp on — no cell file is
    * rewritten. Re-upserting an id at a HIGHER stamp restores it.
    */
  def deleteIvfIds(ids: DataFrame, path: String, seq: Long): Unit = {
    require(seq > 0L, "delete seq must be positive (0 is the base build's stamp)")
    writeTombstones(ids, path, seq)
  }

  /** Tombstone-delete coded vectors from a persisted PQ index — the
    * [[deleteIvfIds]] mirror for the byte-coded layout.
    */
  def deletePqIds(ids: DataFrame, path: String, seq: Long): Unit = {
    require(seq > 0L, "delete seq must be positive (0 is the base build's stamp)")
    writeTombstones(ids, path, seq)
  }

  // ---- compaction --------------------------------------------------
  //
  // The physical-purge half of the tombstone story, and the standard
  // cure for append-only accumulation: resolve last-wins + tombstones
  // ONCE, rewrite the result as a fresh base (stamp 0), drop the
  // sidecars. After compaction the plain readers serve the artifact
  // with no per-read resolution cost, deleted bytes are actually gone
  // from disk (the takedown's retention requirement), and the file
  // count resets — the small-files problem of a long upsert history
  // clears in one pass. Each compact stages the resolved rows to a
  // scratch child first (never overwrite a path while lazily reading
  // it), then rewrites the live layout and deletes the staging +
  // tombstone dirs through the Hadoop FS API.

  private def deleteDir(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) { fs.delete(p, true); () }
  }

  /** Replace `dst` with the fully-written staged dir `src` by rename —
    * the staged-swap step for artifact maintenance without the old
    * read-back + rewrite (which paid the table's I/O twice per swap).
    * Crash contract is unchanged: `src` is complete before `dst` is
    * touched, so an interrupted swap re-runs from the stage. On object
    * stores without atomic rename the FS client copies server-side —
    * still cheaper than pulling the table through Spark again.
    */
  private def swapDir(spark: SparkSession, src: String, dst: String): Unit = {
    val s = new org.apache.hadoop.fs.Path(src)
    val d = new org.apache.hadoop.fs.Path(dst)
    val fs = s.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(d)) fs.delete(d, true)
    if (!fs.rename(s, d))
      throw new java.io.IOException(s"swapDir: rename $src -> $dst failed")
  }

  /** Compact a persisted IVF index: materialize the effective corpus
    * (upserts last-wins, tombstones applied) as the new stamp-0 base,
    * purge the tombstone sidecar. [[readIvfIndex]] afterwards serves
    * exactly what [[readIvfIndexLatest]] served before.
    */
  def compactIvfIndex(spark: SparkSession, path: String, idCol: String): Unit = {
    val (_, latest) = readIvfIndexLatest(spark, path, idCol)
    latest
      .withColumn("__seq", lit(0L))
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/cells_compacting")
    swapDir(spark, s"$path/cells_compacting", s"$path/cells")
    deleteDir(spark, s"$path/_tombstones")
  }

  /** Compact a persisted PQ index — [[compactIvfIndex]]'s mirror for
    * the byte-coded layout.
    */
  def compactPqIndex(spark: SparkSession, path: String, idCol: String): Unit = {
    val (_, latest) = readPqIndexLatest(spark, path, idCol)
    latest
      .withColumn("__seq", lit(0L))
      .write.mode("overwrite").parquet(s"$path/codes_compacting")
    swapDir(spark, s"$path/codes_compacting", s"$path/codes")
    deleteDir(spark, s"$path/_tombstones")
  }

  def readIvfIndex(spark: SparkSession, path: String): (Seq[Array[Double]], DataFrame) = {
    val cents = spark.read.parquet(s"$path/centroids")
      .orderBy(col("cell"))
      .collect()
      .map(_.getAs[scala.collection.Seq[Double]]("centroid").toArray)
      .toSeq
    (cents, spark.read.parquet(s"$path/cells").drop("__seq"))
  }

  /** Incremental IVF upsert — the reference's index maintenance shape
    * (Pinecone upserts vectors into an EXISTING index; the fit is
    * never repeated): `assigned` (new/changed vectors already
    * cell-assigned against the index's frozen centroids via
    * [[graft.operators.Similarity.ivfAssign]]) lands as an APPEND to
    * the cell-partitioned layout, stamped with `seq` — a caller
    * batch number that must increase per upsert. No rewrite of
    * existing files, no shuffle of the existing index: the append
    * touches only the incoming rows' cell directories.
    * [[readIvfIndexLatest]] resolves replaced ids last-wins on the
    * stamp. (Re-fitting centroids is a REBUILD, not an upsert —
    * assignment against frozen centroids is what keeps the increment
    * cheap, at the cost of drift the operator's caller monitors.)
    */
  def upsertIvfIndex(assigned: DataFrame, path: String, seq: Long): Unit = {
    require(seq > 0L, "upsert seq must be positive (0 is the base build's stamp)")
    assigned
      .withColumn("__seq", lit(seq))
      .repartition(col("cell"))
      .write.mode("append").partitionBy("cell").parquet(s"$path/cells")
  }

  /** Load an IVF index with upserts applied: centroids + the LATEST
    * version of every vector (max `__seq` per `idCol`; ties broken to
    * the base — callers must use distinct positive stamps per
    * upsert). One window shuffle on the id — the read-side cost of
    * the append-only write path.
    */
  def readIvfIndexLatest(
      spark: SparkSession,
      path: String,
      idCol: String): (Seq[Array[Double]], DataFrame) = {
    val cents = spark.read.parquet(s"$path/centroids")
      .orderBy(col("cell"))
      .collect()
      .map(_.getAs[scala.collection.Seq[Double]]("centroid").toArray)
      .toSeq
    val cells = spark.read.parquet(s"$path/cells")
      .withColumn("__seq", coalesce(col("__seq"), lit(0L)))
    val latest = graft.operators.Relational
      .dedupeFirstWins(cells, Seq(col(idCol)), Seq(col("__seq").desc))
    (cents, applyTombstones(latest, idCol, path))
  }

  /** TIME TRAVEL over the seq-versioned IVF layout:
    * [[readIvfIndexLatest]] restricted to upserts with
    * `__seq <= asOfSeq` — the index exactly as it stood before later
    * batches landed. The versioned upsert layout (stamped appends,
    * never in-place rewrites) is what makes this a FILTER rather
    * than a restore: reproduce yesterday's retrieval for an audit,
    * bisect a quality regression to the batch that introduced it, or
    * roll a bad upsert back by re-publishing its predecessor.
    * Tombstones are NOT applied — deletes carry their own seq
    * lifecycle and an as-of read predates them by definition of the
    * audit use; compose with [[applyTombstones]] if needed.
    */
  def readIvfIndexAsOf(
      spark: SparkSession,
      path: String,
      idCol: String,
      asOfSeq: Long): (Seq[Array[Double]], DataFrame) = {
    val cents = spark.read.parquet(s"$path/centroids")
      .orderBy(col("cell"))
      .collect()
      .map(_.getAs[scala.collection.Seq[Double]]("centroid").toArray)
      .toSeq
    val cells = spark.read.parquet(s"$path/cells")
      .withColumn("__seq", coalesce(col("__seq"), lit(0L)))
      .filter(col("__seq") <= asOfSeq)
    val latest = graft.operators.Relational
      .dedupeFirstWins(cells, Seq(col(idCol)), Seq(col("__seq").desc))
    (cents, latest)
  }

  /** Persist a PQ index: `path/codebooks` (sub, cell, centroid) and
    * `path/codes` — the byte-coded corpus (the pq_* columns replace
    * the full vectors in the scan; keep the embedding column in
    * `codes` only if the exact re-rank should read it from the index
    * rather than joining back to the corpus).
    */
  def writePqIndex(
      codes: DataFrame,
      codebooks: Seq[Seq[Array[Double]]],
      path: String): Unit = {
    val spark = codes.sparkSession
    import spark.implicits._
    codebooks.zipWithIndex
      .flatMap { case (subCents, s) =>
        subCents.zipWithIndex.map { case (c, i) => (s, i, c.toSeq) }
      }
      .toDF("sub", "cell", "centroid")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/codebooks")
    // base rows carry upsert-stamp 0, the writeIvfIndex rule: one
    // schema shared with later upsertPqIndex appends
    codes
      .withColumn("__seq", lit(0L))
      .write.mode("overwrite").parquet(s"$path/codes")
  }

  /** Load a PQ index written by [[writePqIndex]]: (codebooks indexed
    * [sub][cell], coded corpus). Upsert stamps are dropped — use
    * [[readPqIndexLatest]] when the index has live upserts.
    */
  def readPqIndex(
      spark: SparkSession,
      path: String): (Seq[Seq[Array[Double]]], DataFrame) = {
    (readPqCodebooks(spark, path), spark.read.parquet(s"$path/codes").drop("__seq"))
  }

  /** Incremental PQ upsert — [[upsertIvfIndex]]'s mirror for the
    * byte-coded layout: `codes` (new/changed vectors already ENCODED
    * against the index's FROZEN codebooks via
    * [[graft.operators.Similarity.pqEncode]]) appends with a caller
    * seq stamp; no rewrite of existing files, no re-fit.
    * [[readPqIndexLatest]] resolves replaced ids last-wins on the
    * stamp. (Re-fitting codebooks is a REBUILD — encoding against
    * frozen codebooks keeps the increment cheap at the cost of drift
    * the caller monitors, the exact IVF-centroid tradeoff.)
    */
  def upsertPqIndex(codes: DataFrame, path: String, seq: Long): Unit = {
    require(seq > 0L, "upsert seq must be positive (0 is the base build's stamp)")
    codes
      .withColumn("__seq", lit(seq))
      .write.mode("append").parquet(s"$path/codes")
  }

  /** Load a PQ index with upserts applied: codebooks + the LATEST
    * version of every code row (max `__seq` per `idCol`, ties to the
    * base — distinct positive stamps per upsert). One window shuffle
    * on the id, the read-side cost of the append-only write path —
    * identical to [[readIvfIndexLatest]]'s contract.
    */
  def readPqIndexLatest(
      spark: SparkSession,
      path: String,
      idCol: String): (Seq[Seq[Array[Double]]], DataFrame) = {
    val codes = spark.read.parquet(s"$path/codes")
      .withColumn("__seq", coalesce(col("__seq"), lit(0L)))
    val latest = graft.operators.Relational
      .dedupeFirstWins(codes, Seq(col(idCol)), Seq(col("__seq").desc))
    (readPqCodebooks(spark, path), applyTombstones(latest, idCol, path))
  }

  /** Time-travel read of a PQ index AS OF `asOfSeq` — completes as-of
    * symmetry across all five artifact families (IVF, dup-graph,
    * postings, phash, PQ): code rows and tombstones restricted to
    * stamps ≤ the clock, then [[readPqIndexLatest]]'s last-wins
    * resolution. Codebooks are frozen at build time, so they need no
    * clock.
    */
  def readPqIndexAsOf(
      spark: SparkSession,
      path: String,
      idCol: String,
      asOfSeq: Long): (Seq[Seq[Array[Double]]], DataFrame) = {
    require(asOfSeq >= 0L, "asOfSeq must be >= 0")
    val codes = spark.read.parquet(s"$path/codes")
      .withColumn("__seq", coalesce(col("__seq"), lit(0L)))
      .filter(col("__seq") <= asOfSeq)
    val latest = graft.operators.Relational
      .dedupeFirstWins(codes, Seq(col(idCol)), Seq(col("__seq").desc))
    (readPqCodebooks(spark, path), applyTombstones(latest, idCol, path, Some(asOfSeq)))
  }

  private def readPqCodebooks(spark: SparkSession, path: String): Seq[Seq[Array[Double]]] =
    spark.read.parquet(s"$path/codebooks")
      .orderBy(col("sub"), col("cell"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getAs[scala.collection.Seq[Double]](2).toArray))
      .groupBy(_._1)
      .toSeq
      .sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3).toSeq)

  /** The IVF index's coarse centroids as a FRAME — (cell int,
    * ce array<double>), the exact shape
    * [[graft.operators.Similarity.ivfPqTopKBatch]] consumes. The
    * single-query readers ([[readIvfIndex]]) collect the centroid
    * table into driver literals because a one-off probe bakes its
    * query into the plan anyway; the BATCHED serving path must stay
    * literal-free end-to-end, so this reader keeps the nlist-bounded
    * table in-plan — Catalyst broadcasts it into the probe
    * crossJoin, nothing ever touches the driver.
    */
  def readIvfCentroidFrame(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/centroids")
      .select(
        col("cell").cast("int").as("cell"),
        col("centroid").cast("array<double>").as("ce"))

  /** The PQ index's codebooks as a FRAME — (s int, code int,
    * be array<double>), [[graft.operators.Similarity.ivfPqTopKBatch]]'s
    * codebook shape: one row per (subspace, code word). S·K rows
    * total (bounded by the index geometry, never the corpus), kept
    * in-plan for the batched ADC-table build — the collect-backed
    * [[readPqCodebooks]] stays the single-query bootstrap's reader.
    */
  def readPqCodebookFrame(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/codebooks")
      .select(
        col("sub").cast("int").as("s"),
        col("cell").cast("int").as("code"),
        col("centroid").cast("array<double>").as("be"))
}
