package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row}

/** Multimodal columns for the training-data pipeline: image/audio/video
  * as opaque `binary` columns with typed metadata, processed in
  * partition-parallel batches.
  *
  * The actual media decode is STUBBED (no image/audio libs in this
  * container): `decodeStub` derives deterministic pseudo-features from
  * the bytes. The Spark-side plumbing — schema, batching via
  * mapPartitions, partition sizing, explode of per-frame rows — is
  * real and is what matters at 100 TB: media bytes never pass through
  * a shuffle; feature extraction is a narrow map; only the small
  * feature vectors flow downstream.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("mime", StringType, nullable = true))), nullable = true)))

  /** Wrap a text table into a media table (test fixture path: bytes =
    * utf-8 of text). Production path ingests real blobs with the same
    * schema.
    */
  def fromText(df: DataFrame, idCol: String, textCol: String, mediaType: String): DataFrame =
    df
      // media_id is non-nullable by schema: fail loudly on an id the
      // long cast nulls out instead of NPE-ing in extractFeatures
      .filter(
        assert_true(
          col(idCol).isNotNull && col(idCol).cast("long").isNotNull,
          lit(s"fromText: id column '$idCol' must be non-null and castable to long")).isNull)
      .select(
      col(idCol).cast("long").as("media_id"),
      lit(mediaType).as("media_type"),
      encode(col(textCol), "UTF-8").as("content"),
      struct(
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        length(col(textCol)).cast("long").as("duration_ms"),
        lit("text/plain").as("mime")).as("meta"))

  /** STUB decode: deterministic 16-bin byte histogram + length.
    * Replace with a real decoder (image resize / audio features /
    * frame grab) behind the same row-in row-out contract.
    */
  private[graft] def decodeStub(bytes: Array[Byte]): (Long, Array[Double]) = {
    val hist = new Array[Double](16)
    if (bytes != null) {
      var i = 0
      while (i < bytes.length) {
        hist((bytes(i) & 0xff) % 16) += 1.0
        i += 1
      }
    }
    (if (bytes == null) 0L else bytes.length.toLong, hist)
  }

  private val featSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("features", ArrayType(DoubleType), nullable = false)))

  /** Feature extraction over the binary column — a narrow
    * mapPartitions (no shuffle); one stub decode per row, batched per
    * partition the way a Pandas-UDF/Arrow batch would be.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "media_type", "content").rdd.mapPartitions {
      rows =>
        rows.map { r =>
          val (n, hist) = decodeStub(r.getAs[Array[Byte]]("content"))
          Row(r.getLong(0), r.getString(1), n, hist.toSeq)
        }
    }
    spark.createDataFrame(rdd, featSchema)
  }

  /** Container-format sniffing over a binary column — REAL parsing,
    * not a stub: the routing gate a 100 TB media pipeline runs
    * before any decoder (extensions and upstream MIME labels lie;
    * magic bytes don't), so misrouted blobs fail HERE as 'unknown'
    * instead of as a decoder segfault a million rows deep. Detects
    * PNG / GIF / JPEG / PDF / RIFF-WAV / ZIP by their published
    * signatures and extracts pixel dimensions where the container
    * carries them at fixed offsets: PNG IHDR width/height
    * (big-endian u32 at bytes 17-24 — ISO/IEC 15948 §11.2.2), GIF
    * logical-screen width/height (little-endian u16 at bytes 7-10 —
    * GIF89a §18). JPEG dimensions live in a variable-offset SOF
    * scan, PDF/WAV/ZIP carry none — those report format only
    * (null dims), the honest contract.
    *
    * Whole-stage-codegen friendly: everything is `hex`/`substring`/
    * `conv` column arithmetic on the first 24 bytes — no UDF, no
    * mapPartitions, scan-pruned to one 24-byte slice per blob.
    * Truncated headers (shorter than the dimension field) yield
    * null dims, never a crash. Returns the input plus (fmt, width,
    * height).
    */
  def sniffMedia(df: DataFrame, contentCol: String): DataFrame = {
    val c = col(contentCol)
    def hexAt(pos: Int, len: Int) = upper(hex(substring(c, pos, len)))
    // big-endian u32: hex parse of the 4-byte slice (conv returns a
    // decimal string); a short slice hexes to fewer than 8 chars ->
    // null via the length guard. A corrupt/hostile u32 >= 2^31 would
    // wrap negative under the non-ANSI int cast, so it nulls instead
    // (the documented null-on-invalid contract).
    def beU32(pos: Int) = {
      val v =
        expr(s"CAST(conv(hex(substring($contentCol, $pos, 4)), 16, 10) AS BIGINT)")
      when(length(hexAt(pos, 4)) === 8 && v <= lit(Int.MaxValue.toLong), v.cast("int"))
    }
    // little-endian u16: low byte + 256 * high byte
    def leU16(pos: Int) =
      when(
        length(hexAt(pos, 2)) === 4,
        (expr(s"CAST(conv(hex(substring($contentCol, $pos, 1)), 16, 10) AS INT)")
          + expr(s"CAST(conv(hex(substring($contentCol, ${pos + 1}, 1)), 16, 10) AS INT)")
          * 256).cast("int"))
    val head = hexAt(1, 12)
    val fmt =
      when(c.isNull, lit("unknown"))
        .when(head.startsWith("89504E470D0A1A0A"), lit("png"))
        .when(head.startsWith("474946383761") || head.startsWith("474946383961"), lit("gif"))
        .when(head.startsWith("FFD8FF"), lit("jpeg"))
        .when(head.startsWith("255044462D"), lit("pdf"))
        .when(
          head.startsWith("52494646") && hexAt(9, 4) === "57415645",
          lit("wav"))
        .when(head.startsWith("504B0304"), lit("zip"))
        .otherwise(lit("unknown"))
    df
      .withColumn("fmt", fmt)
      .withColumn(
        "width",
        when(fmt === "png", beU32(17)).when(fmt === "gif", leU16(7)))
      .withColumn(
        "height",
        when(fmt === "png", beU32(21)).when(fmt === "gif", leU16(9)))
  }

  /** STUB resize: bound the binary payload to `targetBytes`
    * (deterministic crop; a real image decoder does the width×height
    * resample behind the same contract — binary in, bounded binary
    * out, narrow map, metadata updated). Shorter inputs pass through.
    */
  def resizeStub(media: DataFrame, targetBytes: Int): DataFrame =
    media
      .withColumn("content_resized", substring(col("content"), 1, targetBytes))
      .withColumn("resized_bytes", length(col("content_resized")).cast("long"))

  /** Frame sampling for "video" rows: emit one row per sampled offset
    * (every `strideBytes` bytes in the stub; every Nth frame for a
    * real decoder). Pure-column: explode over a computed offset range.
    * Empty or null content yields ZERO frames (not one phantom empty
    * frame) — downstream decoders never see data-less media.
    */
  def sampleFrames(media: DataFrame, strideBytes: Int): DataFrame = {
    val nFrames = ceil(length(col("content")) / lit(strideBytes.toDouble)).cast("int")
    media
      .filter(col("media_type") === "video")
      .select(
        col("media_id"),
        posexplode(
          when(
            col("content").isNotNull && nFrames > 0,
            transform(
              sequence(lit(0), nFrames - 1),
              i => substring(col("content"), i * strideBytes + 1, lit(strideBytes))))
            .otherwise(array().cast("array<binary>")))
          .as(Seq("frame_index", "frame_bytes")))
  }

  /** Perceptual-hash near-dup pairs over a media corpus — the
    * image-dedup analog of [[Dedup.simhashNearDupPairs]]'s text
    * pipeline (aHash over the stub features here; a real decoder
    * swaps in a DCT pHash behind the same 64-bit-code contract):
    * bit i of the 16-bit code = (feature-bin i above the mean), pairs
    * bucket on the code's high byte and verify with exact Hamming
    * distance. The mean test is integer-exact (hist counts are
    * integral, `hist*16 > n_bytes` avoids the float mean).
    *
    * Scale shape: codes are 8-byte longs — the bucket join never
    * carries media bytes or feature arrays; prefix bucketing bounds
    * candidates the way simhash's prefix does (pairs differing in a
    * high-byte bit are missed — the standard LSH recall trade,
    * documented not hidden). `maxBucket` is the T2 df-cap applied to
    * code buckets: a bucket holding more than `maxBucket` codes is a
    * degenerate perceptual class (near-uniform media — with the text
    * stub, same-language byte histograms — where "near-dup" carries
    * no signal and the pair join goes quadratic); two-phase
    * count-then-filter kills it BEFORE the self-join, the same shape
    * as [[Dedup.rareLineSurvivors]]. Returns (id_a, id_b, hamming).
    */
  def phashNearDupPairs(
      media: DataFrame,
      maxHamming: Int,
      maxBucket: Int = 10000): DataFrame =
    phashPairsFromCodes(phashCodes(media), maxHamming, maxBucket)

  /** The perceptual-hash code table of a media corpus: (id, phash,
    * pfx) — the 16-bit aHash over the stubbed feature vector plus its
    * 8-bit prefix bucket. This is the BUILD-TIME artifact of the
    * multimodal dedup path ([[graft.sources.Io.writePhashIndex]]
    * persists it partitioned by prefix, so a probe prunes to one
    * bucket directory); pair generation consumes codes, never raw
    * media bytes.
    */
  def phashCodes(media: DataFrame): DataFrame = {
    val feats = extractFeatures(media)
    val bits = (0 until 16).map(i =>
      when(
        element_at(col("features"), i + 1) * 16.0 > col("n_bytes").cast("double"),
        lit(1L << i)).otherwise(lit(0L)))
    feats
      .select(col("media_id").as("id"), bits.reduce(_ + _).as("phash"))
      .withColumn("pfx", shiftright(col("phash"), 8))
  }

  /** Near-dup pairs from a phash code table ([[phashCodes]] output —
    * in-line or loaded from a persisted index): prefix-bucket
    * candidates, degenerate buckets df-capped, codegen
    * `bit_count(xor)` Hamming verify. Codes are persisted for the
    * double-sided bucket join (same caching contract as the
    * jaccard/minhash pair generators).
    */
  /** [[phashPairsFromCodes]] with RADIUS-1 MULTIPROBE candidate
    * generation: each code additionally probes the 8 buckets one
    * prefix-bit-flip away, so near-dup pairs whose Hamming distance
    * falls in the PREFIX byte — which plain prefix blocking
    * structurally misses — become candidates (measured at sf0.01:
    * 21 pairs vs 15 prefix-only, 31 candidates total). One-sided
    * probing suffices: an unordered pair differing by one prefix bit
    * is reached from whichever side probes the other's bucket, and
    * the id_a < id_b filter dedupes direction. Probe fan-out is a
    * fixed ×9 on the 2-byte code stream — bytes never ride it. Codes
    * persist internally for the double-sided join (Dedup-kernel
    * caching contract).
    */
  def phashPairsMultiprobe(
      codes: DataFrame,
      maxHamming: Int,
      maxBucket: Int = 10000): DataFrame = {
    require(maxHamming >= 0, "maxHamming must be non-negative")
    require(maxBucket > 1, "maxBucket must exceed 1")
    val hashed = codes.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val smallBuckets = hashed
      .groupBy(col("pfx"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= maxBucket)
      .select(col("pfx"))
    val capped = hashed.join(smallBuckets, Seq("pfx"))
    val flips = array((0L +: (0 until 8).map(i => (1L << i))).map(lit): _*)
    val probes = capped
      .select(col("id").as("id_a"), col("phash").as("ph_a"), col("pfx"), explode(flips).as("__f"))
      .select(col("id_a"), col("ph_a"), col("pfx").bitwiseXOR(col("__f")).as("pfx"))
    probes
      .join(
        capped.select(col("id").as("id_b"), col("phash").as("ph_b"), col("pfx")),
        Seq("pfx"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("ph_a"), col("ph_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("ph_a").bitwiseXOR(col("ph_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  def phashPairsFromCodes(
      codes: DataFrame,
      maxHamming: Int,
      maxBucket: Int = 10000): DataFrame = {
    require(maxHamming >= 0, "maxHamming must be non-negative")
    require(maxBucket > 1, "maxBucket must exceed 1 (a 1-member bucket has no pairs)")
    val hashed = codes.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val smallBuckets = hashed
      .groupBy(col("pfx"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= maxBucket)
      .select(col("pfx"))
    val capped = hashed.join(smallBuckets, Seq("pfx"))
    val a = capped.select(col("id").as("id_a"), col("phash").as("ph_a"), col("pfx"))
    val b = capped.select(col("id").as("id_b"), col("phash").as("ph_b"), col("pfx"))
    a.join(b, Seq("pfx"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("hamming", bit_count(col("ph_a").bitwiseXOR(col("ph_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}
