package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}

/** S4/U2/D1/A6 — the ATS job-board pipeline: vendor JSON responses →
  * normalized jobs table → union across extractors → first-wins dedup
  * → openings counts with engineering/sales regex splits (reference
  * `/root/reference/src/ats_extractor.py`,
  * `scraper_v2.py:1045-1055,2693-2790`).
  */
object Jobs {

  /** Greenhouse `boards-api.../jobs` response shape
    * (`ats_extractor.py:114-220`).
    */
  val greenhouseSchema: StructType = StructType(Seq(
    StructField("jobs", ArrayType(StructType(Seq(
      StructField("title", StringType),
      StructField("absolute_url", StringType),
      StructField("location", StructType(Seq(StructField("name", StringType)))),
      StructField("updated_at", StringType)))))))

  /** Lever `api.lever.co/v0/postings` response shape
    * (`ats_extractor.py:221-288`).
    */
  val leverSchema: ArrayType = ArrayType(StructType(Seq(
    StructField("text", StringType),
    StructField("hostedUrl", StringType),
    StructField("categories", StructType(Seq(
      StructField("location", StringType),
      StructField("team", StringType)))),
    StructField("createdAt", LongType))))

  /** Parse a frame of (company_id, response-json) Greenhouse payloads
    * into normalized jobs.
    */
  def parseGreenhouse(df: DataFrame, jsonCol: String): DataFrame =
    df.withColumn("__p", from_json(col(jsonCol), greenhouseSchema))
      .select(col("company_id"), explode(col("__p.jobs")).as("j"))
      .select(
        col("company_id"),
        col("j.title").as("title"),
        col("j.absolute_url").as("url"),
        col("j.location.name").as("location"),
        lit("greenhouse").as("source"))

  /** Parse Lever postings payloads into normalized jobs. */
  def parseLever(df: DataFrame, jsonCol: String): DataFrame =
    df.withColumn("__p", from_json(col(jsonCol), leverSchema))
      .select(col("company_id"), explode(col("__p")).as("j"))
      .select(
        col("company_id"),
        col("j.text").as("title"),
        col("j.hostedUrl").as("url"),
        col("j.categories.location").as("location"),
        lit("lever").as("source"))

  /** U2+D1 — union jobs from all extractors and dedup on
    * (lower(title), lower(url)) keeping the first-seen row by
    * `priority` (the reference's encounter order: ATS API before
    * HTML fallbacks).
    */
  def unionDedup(frames: Seq[DataFrame], priority: DataFrame => Column): DataFrame = {
    val tagged = frames.map(f => f.withColumn("__prio", priority(f)))
    val all = tagged.reduce(_.unionByName(_, allowMissingColumns = true))
    Relational
      .dedupeFirstWins(
        all,
        Seq(lower(col("title")), lower(coalesce(col("url"), lit("")))),
        Seq(col("__prio")))
      .drop("__prio")
  }

  /** A6 — openings counts with engineering/sales splits from title
    * regexes (`scraper_v2.py:2693-2724`).
    */
  def openingsCounts(jobs: DataFrame): DataFrame = {
    // word-bounded: an unanchored 'ai'/'ml'/'data' matches inside
    // unrelated words ("Email", "Claims") and inflates the counts
    val eng = "(?i)\\b(engineer|developer|software|infra|platform|data|ml|ai)\\b"
    val sales = "(?i)\\b(sales|account exec|business development|revenue)\\b"
    jobs
      .groupBy(col("company_id"))
      .agg(
        count(lit(1)).as("job_openings_count"),
        sum(when(col("title").rlike(eng), 1L).otherwise(0L)).as("engineering_openings"),
        sum(when(col("title").rlike(sales), 1L).otherwise(0L)).as("sales_openings"))
  }
}
