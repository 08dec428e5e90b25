package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Training-data deduplication family: exact, n-gram Jaccard,
  * MinHash+LSH, SimHash, embedding-cosine near-dup.
  *
  * Scale posture (100 TB): every variant is built as
  * shingle/signature explode → shuffle on a *bucket key* → pair join
  * inside buckets — never an all-pairs cross join. Candidate
  * generation is linear in corpus size; verification touches only
  * bucket-colliding pairs.
  */
object Dedup {

  /** Exact dedup by content hash: first-wins (min `order`) per
    * identical normalized text.
    */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    Relational.dedupeFirstWins(
      df,
      Seq(TextFns.fingerprint(col(textCol))),
      Seq(col(idCol)))

  /** Distinct word-n-gram shingles per doc: (id, shingle). */
  def shingleTable(df: DataFrame, textCol: String, idCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("id"), explode(TextFns.shingles(col(textCol), n)).as("shingle"))

  /** N-gram Jaccard near-dup pairs: candidate pairs share ≥1 shingle;
    * jaccard = |A∩B| / (|A|+|B|-|A∩B|) ≥ threshold.
    *
    * The shingle join IS the LSH here (bucket = shingle); frequent
    * shingles can skew — AQE skew-join handles moderate skew, and a
    * document-frequency cap (`maxDf`) drops degenerate buckets the way
    * production dedup pipelines drop stop-shingles.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      n: Int,
      threshold: Double,
      maxDf: Int = 1000): DataFrame = {
    val sh = shingleTable(df, textCol, idCol, n)
    val filtered = sh
      .withColumn("__df", count(lit(1)).over(Window.partitionBy(col("shingle"))))
      .filter(col("__df") <= maxDf)
      .drop("__df")
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val a = filtered.select(col("id").as("id_a"), col("shingle"))
    val b = filtered.select(col("id").as("id_b"), col("shingle"))
    val common = a
      .join(b, Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
      .withColumn(
        "jaccard",
        col("common").cast("double") /
          (col("sz_a") + col("sz_b") - col("common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** MinHash signature column: `numHashes` permutations approximated
    * by seed-prefixed md5 lexicographic minima over the shingle set —
    * deterministic and portable (same construction expressible in the
    * DuckDB oracle).
    */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    transform(
      sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(shingles, s => md5(concat(i.cast("string"), lit(":"), s)))))

  /** MinHash+LSH candidate pairs: band the signature (`bandSize` rows
    * per band), bucket-join on (band index, band hash), then verify
    * with exact Jaccard over shingle sets.
    *
    * Plan shape: one explode to (id, band, bucket), one shuffle on the
    * bucket key, pair join inside buckets, then a verify join — the
    * canonical scalable MinHash dedup.
    */
  def minhashLshPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      n: Int,
      numHashes: Int,
      bandSize: Int,
      threshold: Double): DataFrame = {
    require(numHashes % bandSize == 0, "numHashes must be divisible by bandSize")
    val numBands = numHashes / bandSize
    val withSh = df
      .select(col(idCol).as("id"), TextFns.shingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
    val sig = withSh.withColumn("sig", minhashSignature(col("sh"), numHashes))
    // Band shuffle carries only (id, band, bucket) — shingle sets are
    // joined back per candidate pair, so the wide arrays never ride
    // through the bucket shuffle (matters at 100 TB).
    val banded = sig.select(
      col("id"),
      posexplode(
        transform(
          sequence(lit(0), lit(numBands - 1)),
          b => md5(concat_ws("|", slice(col("sig"), b * bandSize + 1, lit(bandSize)))))
      ).as(Seq("band", "bucket")))
    val cand = banded
      .select(col("id").as("id_a"), col("band"), col("bucket"))
      .join(banded.select(col("id").as("id_b"), col("band"), col("bucket")), Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")
    cand
      .join(withSh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(withSh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn(
        "jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** 64-bit SimHash fingerprint as a 16-hex-char string. Token bits
    * come from the leading 16 hex chars of md5(token); for each bit
    * position the vote over tokens (+1 if bit set, else -1) decides
    * the fingerprint bit. Near-dups = small Hamming distance; bucket
    * on fingerprint prefix to stay linear at scale.
    */
  def simhashFingerprint(toks: Column): Column = {
    val hexDigits = "0123456789abcdef"
    val digitExprs = (0 until 16).map { pos =>
      val votes = (0 until 4).map { bit =>
        val mask = 1 << (3 - bit)
        val voteSum = aggregate(
          toks,
          lit(0),
          (acc: Column, t: Column) => {
            val d = instr(lit(hexDigits), substring(md5(t), pos + 1, 1)) - 1
            acc + when((floor(d.cast("int") / mask).cast("int") % 2) === 1, 1).otherwise(-1)
          })
        when(voteSum > 0, lit(mask)).otherwise(lit(0))
      }
      votes.reduce(_ + _)
    }
    concat(digitExprs.map(d => lit(hexDigits).substr(d + 1, lit(1))): _*)
  }

  /** Hamming distance between two same-length hex fingerprints. */
  def hammingHex(a: Column, b: Column): Column = {
    val hexDigits = "0123456789abcdef"
    aggregate(
      sequence(lit(1), length(a)),
      lit(0),
      (acc: Column, i: Column) => {
        val da = (instr(lit(hexDigits), a.substr(i, lit(1))) - 1).cast("int")
        val db = (instr(lit(hexDigits), b.substr(i, lit(1))) - 1).cast("int")
        val x = da.bitwiseXOR(db)
        acc + (0 until 4)
          .map(bit => when((floor(x / (1 << bit)).cast("int") % 2) === 1, 1).otherwise(0))
          .reduce(_ + _)
      })
  }

  /** Embedding-cosine near-duplicate pairs over an embedding column —
    * see Similarity.knnJoin for the bucketed variant; this is the
    * exact quadratic baseline, use only on bounded partitions.
    */
  def embeddingNearDupPairs(
      df: DataFrame,
      idCol: String,
      embCol: String,
      threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(embCol).as("emb_a"))
    val b = df.select(col(idCol).as("id_b"), col(embCol).as("emb_b"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("score", graft.functions.VectorFns.cosine(col("emb_a"), col("emb_b")))
      .filter(col("score") >= threshold)
      .select(col("id_a"), col("id_b"), col("score"))
  }
}
