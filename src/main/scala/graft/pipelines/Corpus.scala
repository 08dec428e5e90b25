package graft.pipelines

import graft.operators.{Dedup, Sampling, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The pretraining corpus build as a reusable, single-plan pipeline:
  * language gate → quality gate → exact dedup → benchmark
  * decontamination → deterministic hash sample. Each stage is an
  * oracle-checked operator elsewhere in the engine; composing them
  * declaratively lets Catalyst fuse the gates into the scan, run the
  * dedup as a group-limit window, and broadcast the benchmark's
  * shingle hashes — see PLANS.md "t_funnel_e2e plan" for the compiled
  * shape and the 100 TB read on it.
  */
object Corpus {

  /** Run the funnel over `docs`, decontaminating against `benchmark`.
    *
    * @param langMarkers    marker-token table for [[TextAnalysis.langId]]
    * @param keepLang       language label that passes the gate
    * @param stopwords      stopword list for [[TextAnalysis.qualityScore]]
    * @param minQuality     inclusive quality floor
    * @param shingleN       n-gram size for decontamination overlap
    * @param sampleFraction deterministic hash-sample fraction (1.0 = keep all)
    * @return surviving rows of `docs` plus `lang_pred` and `quality`
    */
  def funnel(
      docs: DataFrame,
      benchmark: DataFrame,
      textCol: String,
      idCol: String,
      langMarkers: Seq[(String, Seq[String])],
      keepLang: String,
      stopwords: Seq[String],
      minQuality: Double,
      shingleN: Int = 3,
      sampleFraction: Double = 1.0): DataFrame = {
    val gated = docs
      .withColumn("lang_pred", TextAnalysis.langId(col(textCol), langMarkers))
      .withColumn("quality", TextAnalysis.qualityScore(col(textCol), stopwords))
      .filter(col("lang_pred") === keepLang && col("quality") >= minQuality)
    val deduped = Dedup.exact(gated, textCol, idCol)
    val clean = Dedup
      .crossCorpusOverlap(deduped, benchmark, textCol, idCol, shingleN)
      .filter(!col("contaminated"))
      .select(col("id").as(idCol))
    Sampling.hashSample(deduped.join(clean, idCol), col(idCol), sampleFraction)
  }
}
