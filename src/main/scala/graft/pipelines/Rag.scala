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
  * The embedder is the deterministic hashing featurizer; a production
  * deployment swaps in a batched external client behind the same
  * column contract (SURVEY §7.4 non-determinism firewall).
  */
object Rag {

  /** Chunk documents into (doc_id, chunk_index, chunk). */
  def chunkDocs(docs: DataFrame, textCol: String, idCol: String, chunkSize: Int): DataFrame =
    docs.select(
      col(idCol),
      col("source"),
      posexplode(TextFns.chunks(col(textCol), chunkSize)).as(Seq("chunk_index", "chunk")))

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
    val qvec = VectorFns.embedText(lit(queryText), dim)
    filtered
      .withColumn("score", VectorFns.cosine(VectorFns.embedText(col("chunk"), dim), qvec))
      .orderBy(col("score").desc, col("doc_id"), col("chunk_index"))
      .limit(k)
      .select(
        col("doc_id"),
        col("chunk_index").cast("long").as("chunk_index"),
        col("source"),
        col("score"))
  }
}
