package graft.pipelines

import graft.functions.{TextFns, VectorFns}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** E1 — the RAG retrieval pipeline, minus the external LLM tail
  * (reference `/root/reference/src/rag_pipeline.py:24-75` and
  * `src/agents/tools.py:161-245`):
  *
  *   documents → chunk (C1) → embed (V1, deterministic featurizer) →
  *   cosine vs query vector (V2) → source filter (F1, pushed BELOW the
  *   top-k — strictly better than the reference's over-fetch) →
  *   orderBy(score desc).limit(k) (W1) → projection (F11).
  *
  * The embedder is the deterministic hashing featurizer computed as
  * explode → codegen'd count aggregates (array-lambda featurizing
  * profiled ~5× slower — HOF lambdas are interpreted); the query-side
  * vector is computed on the driver. A production deployment swaps in
  * a batched external embedding client behind the same column
  * contract (SURVEY §7.4 non-determinism firewall).
  */
object Rag {

  private val hexDigits = "0123456789abcdef"

  /** V4 — query augmentation: prepend the company id to the query text
    * before embedding so the company's own tokens pull its chunks up
    * the ranking (reference `src/rag_search.py:41-42`,
    * `src/agents/tools.py:218-219` — `f"{company_id} {query}"`). Blank
    * parts collapse (concat_ws semantics) so a missing company id
    * degrades to the bare query instead of a leading-space token.
    */
  def augmentQuery(companyId: String, query: String): String =
    Seq(companyId, query).map(_.trim).filter(_.nonEmpty).mkString(" ")

  /** Chunk documents into (doc_id, source, chunk_index, chunk). */
  def chunkDocs(docs: DataFrame, textCol: String, idCol: String, chunkSize: Int): DataFrame =
    docs.select(
      col(idCol),
      col("source"),
      posexplode(TextFns.chunks(col(textCol), chunkSize)).as(Seq("chunk_index", "chunk")))

  /** Driver-side featurizer for the query string — must match the
    * distributed bucket function exactly (first hex digit of
    * md5(token) mod dim).
    */
  def embedQueryVector(text: String, dim: Int): Array[Double] = {
    // EXACTLY TextFns.tokens semantics (space-only trim, regex split
    // keeping empties): the driver-side query vector must tokenize the
    // way the distributed bucket function does, or a query identical
    // to a chunk's text would not score cosine 1 against it
    var lo = 0
    var hi = text.length
    while (lo < hi && text.charAt(lo) == ' ') lo += 1
    while (hi > lo && text.charAt(hi - 1) == ' ') hi -= 1
    val t = text.substring(lo, hi)
    val toks = if (t.isEmpty) Array.empty[String] else t.split("\\s+", -1)
    val v = new Array[Double](dim)
    toks.foreach { tok =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      v(hexDigits.indexOf(hex.charAt(0)) % dim) += 1.0
    }
    v
  }

  /** Token-bucket expression mirroring embedQueryVector. */
  private def bucketExpr(tok: Column, dim: Int): Column =
    (instr(lit(hexDigits), substring(md5(tok), 1, 1)) - 1) % dim

  /** Full retrieval: top-k chunks for a query string. */
  def topKChunks(
      docs: DataFrame,
      queryText: String,
      k: Int,
      chunkSize: Int = 200,
      dim: Int = 16,
      sourceContains: Option[String] = None): DataFrame = {
    val chunks = chunkDocs(docs, "text", "doc_id", chunkSize)
    val filtered = sourceContains match {
      // F1 company filter — applied BEFORE scoring so the scan prunes
      case Some(substr) => chunks.filter(lower(col("source")).contains(substr.toLowerCase))
      case None         => chunks
    }
    // explode tokens -> one md5 per token -> dim count aggregates
    val toks = filtered.select(
      col("doc_id"),
      col("chunk_index"),
      explode(TextFns.tokens(col("chunk"))).as("tok"))
    val counts = (0 until dim).map(j =>
      sum(when(bucketExpr(col("tok"), dim) === j, 1).otherwise(0)).as(s"c$j"))
    val vecs = toks
      .groupBy(col("doc_id"), col("chunk_index"))
      .agg(counts.head, counts.tail: _*)
      .select(
        col("doc_id"),
        col("chunk_index"),
        array((0 until dim).map(j => col(s"c$j").cast("double")): _*).as("vec"))
    val qvec = array(embedQueryVector(queryText, dim).toIndexedSeq.map(lit): _*)
    // chunks with zero tokens vanish at the explode; rejoin and score
    // them 0.0 (cosine-with-zero-norm semantics)
    filtered
      .join(vecs, Seq("doc_id", "chunk_index"), "left")
      .withColumn(
        "score",
        coalesce(VectorFns.cosine(col("vec"), qvec), lit(0.0)))
      .orderBy(col("score").desc, col("doc_id"), col("chunk_index"))
      .limit(k)
      .select(
        col("doc_id"),
        col("chunk_index").cast("long").as("chunk_index"),
        col("source"),
        col("score"))
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) — the standard
    * hybrid-retrieval combiner: two ranked candidate lists (each
    * (id, rank) with rank 1-based) fuse by Σ 1/(c + rank); a doc
    * present in only one list contributes only that leg (full outer
    * join, the other leg scores 0). Rank arithmetic is integer →
    * one exact IEEE division per leg, so fusion is as deterministic
    * as its inputs; ties break on id.
    *
    * Scale shape: the inputs are ALREADY top-N lists (each leg's
    * retrieval bounds its candidates with TakeOrderedAndProject), so
    * the fusion join touches ≤ 2N rows regardless of corpus size.
    */
  def rrfFuse(a: DataFrame, b: DataFrame, idCol: String, c: Int, k: Int): DataFrame = {
    require(c >= 0 && k > 0, "need c >= 0 and k > 0")
    def leg(r: Column) = coalesce(lit(1.0) / (lit(c.toDouble) + r), lit(0.0))
    a.select(col(idCol), col("rank").as("rank_a"))
      .join(b.select(col(idCol), col("rank").as("rank_b")), Seq(idCol), "full_outer")
      .withColumn("rrf", leg(col("rank_a")) + leg(col("rank_b")))
      .orderBy(col("rrf").desc, col(idCol))
      .limit(k)
  }
}
