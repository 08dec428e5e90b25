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

  /** Workable `apply.workable.com/api/v3/accounts/<slug>/jobs`
    * response shape (`ats_extractor.py:289-390`): `location.city` is
    * an array the reference comma-joins.
    */
  val workableSchema: StructType = StructType(Seq(
    StructField("results", ArrayType(StructType(Seq(
      StructField("title", StringType),
      StructField("location", StructType(Seq(
        StructField("city", ArrayType(StringType))))),
      StructField("department", StringType),
      StructField("url", StringType),
      StructField("shortlink", StringType),
      StructField("published_on", StringType)))))))

  /** Ashby `api.ashbyhq.com/public/job_postings` response shape
    * (`ats_extractor.py:491-560`).
    */
  val ashbySchema: StructType = StructType(Seq(
    StructField("jobPostings", ArrayType(StructType(Seq(
      StructField("title", StringType),
      StructField("locationName", StringType),
      StructField("team", StructType(Seq(StructField("name", StringType)))),
      StructField("publishedJobUrl", StringType),
      StructField("publishedAt", StringType)))))))

  /** Vendor routing over (page html, careers url) — the reference's
    * ordered substring checks, first match wins
    * (`ats_extractor.py:43-113`). The reference's iframe-src fallback
    * scan is subsumed: an iframe's src is a substring of the html, so
    * the same contains() checks fire on it. NULL when no vendor
    * marker is present (caller falls back to generic HTML mining).
    */
  def detectAts(html: Column, url: Column): Column = {
    val h = lower(coalesce(html, lit("")))
    val u = lower(coalesce(url, lit("")))
    when(h.contains("greenhouse") || u.contains("greenhouse.io"), "greenhouse")
      .when(h.contains("lever.co") || u.contains("lever.co"), "lever")
      .when(h.contains("workable") || u.contains("workable.com"), "workable")
      .when(h.contains("ashby") || u.contains("ashbyhq.com"), "ashby")
      .when(h.contains("bamboohr") || u.contains("bamboohr.com"), "bamboohr")
      .when(h.contains("icims") || u.contains("icims.com"), "icims")
      .when(
        h.contains("workday.com") || h.contains("myworkdayjobs.com") ||
          u.contains("workday.com") || u.contains("myworkdayjobs.com"),
        "workday")
      .when(h.contains("taleo") || u.contains("taleo.net") || u.contains("oraclecloud.com"), "oracle")
      .when(h.contains("smartrecruiters") || u.contains("smartrecruiters.com"), "smartrecruiters")
      .when(h.contains("jobvite") || u.contains("jobvite.com"), "jobvite")
      .otherwise(lit(null).cast("string"))
  }

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

  /** Parse Workable API payloads into normalized jobs: the city
    * array is comma-joined like the reference's `', '.join(...)`,
    * and `shortlink` backs up a missing OR empty `url` — the
    * reference's `job.get('url') or job.get('shortlink')` is falsy on
    * `""` too (`ats_extractor.py:367-380`).
    */
  def parseWorkable(df: DataFrame, jsonCol: String): DataFrame =
    df.withColumn("__p", from_json(col(jsonCol), workableSchema))
      .select(col("company_id"), explode(col("__p.results")).as("j"))
      .select(
        col("company_id"),
        col("j.title").as("title"),
        coalesce(nullif(col("j.url"), lit("")), col("j.shortlink")).as("url"),
        array_join(col("j.location.city"), ", ").as("location"),
        lit("workable").as("source"))

  /** Parse Ashby job-postings payloads into normalized jobs
    * (`ats_extractor.py:538-556`).
    */
  def parseAshby(df: DataFrame, jsonCol: String): DataFrame =
    df.withColumn("__p", from_json(col(jsonCol), ashbySchema))
      .select(col("company_id"), explode(col("__p.jobPostings")).as("j"))
      .select(
        col("company_id"),
        col("j.title").as("title"),
        col("j.publishedJobUrl").as("url"),
        col("j.locationName").as("location"),
        lit("ashby").as("source"))

  /** Parse Workday careers HTML into normalized jobs: Workday pages
    * carry `data-automation-id` attributes, so job blocks are the
    * `<li>/<div>` elements whose automation id starts with
    * job/posting; per block the `jobTitle` anchor gives title+href
    * (the href comes from THAT anchor's tag, not the first href in
    * the block — logo/share links precede it on real pages) and an
    * optional `locations` element the location — the regex mirror of
    * the reference's soup scan (`ats_extractor.py:751-783`), which
    * also resolves the href against the careers URL
    * (`urljoin(base_url, href)`, `:771`). Same 5<len<200 title
    * sanity cut.
    */
  def parseWorkday(df: DataFrame, htmlCol: String, urlCol: String): DataFrame = {
    val block =
      "(?s)<(?:li|div)[^>]*data-automation-id=\"(?:job|posting)[^\"]*\"[^>]*>.*?</(?:li|div)>"
    val anchorTag = "(?s)<a[^>]*data-automation-id=\"jobTitle\"[^>]*>"
    val anchor = "(?s)<a[^>]*data-automation-id=\"jobTitle\"[^>]*>([^<]*)</a>"
    val loc = "(?s)data-automation-id=\"locations?\"[^>]*>([^<]*)<"
    def orNull(c: Column): Column = when(c === "", lit(null).cast("string")).otherwise(c)
    // per-quote-style extraction — a mixed [^"']* class would truncate
    // an href containing the opposite quote character
    val tag = regexp_extract(col("__b"), anchorTag, 0)
    val hrefD = regexp_extract(tag, "href=\"([^\"]*)\"", 1)
    val href = when(hrefD =!= "", hrefD).otherwise(regexp_extract(tag, "href='([^']*)'", 1))
    df.select(
        col("company_id"),
        col(urlCol).as("__base"),
        explode(regexp_extract_all(col(htmlCol), lit(block), lit(0))).as("__b"))
      .select(
        col("company_id"),
        trim(regexp_extract(col("__b"), anchor, 1)).as("title"),
        when(href === "", lit(null).cast("string"))
          .otherwise(graft.functions.HtmlFns.urlJoin(href, col("__base"))).as("url"),
        orNull(trim(regexp_extract(col("__b"), loc, 1))).as("location"),
        lit("workday").as("source"))
      .filter(length(col("title")) > 5 && length(col("title")) < 200)
  }

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
