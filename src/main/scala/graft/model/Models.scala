package graft.model

import java.sql.Date

/** M0 — typed entity model mirroring the reference's Pydantic schemas
  * (`/root/reference/src/models.py`). Curated entities are
  * `Dataset[T]` with these case classes; raw pages/chunks stay
  * untyped DataFrames (SURVEY §1.3).
  *
  * `schemaVersion` is carried as a literal column, mirroring
  * `schema_version: str = "2.0.0"` (`models.py:25,47,63,...`).
  */
object Models {
  val SchemaVersion = "2.0.0"

  /** Lineage attached to every record (`models.py:5-8`). */
  case class Provenance(
      source_url: String,
      crawled_at: String,
      snippet: Option[String])

  /** `models.py:10-27`. */
  case class Company(
      company_id: String,
      legal_name: String,
      brand_name: Option[String] = None,
      website: Option[String] = None,
      hq_city: Option[String] = None,
      hq_state: Option[String] = None,
      hq_country: Option[String] = None,
      founded_year: Option[Int] = None,
      categories: Seq[String] = Nil,
      related_companies: Seq[String] = Nil,
      total_raised_usd: Option[Double] = None,
      last_disclosed_valuation_usd: Option[Double] = None,
      last_round_name: Option[String] = None,
      last_round_date: Option[Date] = None,
      schema_version: String = SchemaVersion,
      as_of: Option[Date] = None,
      provenance: Seq[Provenance] = Nil)

  /** `models.py:29-48`; event_type domain at `models.py:33-38`. */
  case class Event(
      event_id: String,
      company_id: String,
      title: String,
      occurred_on: Date,
      event_type: String,
      description: Option[String] = None,
      round_name: Option[String] = None,
      investors: Seq[String] = Nil,
      amount_usd: Option[Double] = None,
      valuation_usd: Option[Double] = None,
      actors: Seq[String] = Nil,
      tags: Seq[String] = Nil,
      schema_version: String = SchemaVersion,
      provenance: Seq[Provenance] = Nil)

  val EventTypes: Set[String] = Set(
    "funding", "mna", "product_release", "integration", "partnership",
    "customer_win", "leadership_change", "regulatory", "security_incident",
    "pricing_change", "layoff", "hiring_spike", "office_open", "office_close",
    "benchmark", "open_source_release", "contract_award", "other")

  /** `models.py:50-64`. */
  case class Snapshot(
      company_id: String,
      as_of: Date,
      headcount_total: Option[Int] = None,
      headcount_growth_pct: Option[Double] = None,
      job_openings_count: Option[Int] = None,
      engineering_openings: Option[Int] = None,
      sales_openings: Option[Int] = None,
      hiring_focus: Seq[String] = Nil,
      pricing_tiers: Seq[String] = Nil,
      active_products: Seq[String] = Nil,
      geo_presence: Seq[String] = Nil,
      confidence: Option[Double] = None,
      schema_version: String = SchemaVersion,
      provenance: Seq[Provenance] = Nil)

  /** `models.py:66-79`. */
  case class Product(
      product_id: String,
      company_id: String,
      name: String,
      description: Option[String] = None,
      pricing_model: Option[String] = None, // seat|usage|tiered
      pricing_tiers_public: Seq[String] = Nil,
      ga_date: Option[Date] = None,
      integration_partners: Seq[String] = Nil,
      github_repo: Option[String] = None,
      license_type: Option[String] = None,
      reference_customers: Seq[String] = Nil,
      schema_version: String = SchemaVersion,
      provenance: Seq[Provenance] = Nil)

  /** `models.py:81-93`. */
  case class Leadership(
      person_id: String,
      company_id: String,
      name: String,
      role: String,
      is_founder: Boolean = false,
      start_date: Option[Date] = None,
      end_date: Option[Date] = None,
      previous_affiliation: Option[String] = None,
      education: Option[String] = None,
      linkedin: Option[String] = None,
      schema_version: String = SchemaVersion,
      provenance: Seq[Provenance] = Nil)

  /** `models.py:95-103`. */
  case class Visibility(
      company_id: String,
      as_of: Date,
      news_mentions_30d: Option[Int] = None,
      avg_sentiment: Option[Double] = None,
      github_stars: Option[Int] = None,
      glassdoor_rating: Option[Double] = None,
      schema_version: String = SchemaVersion,
      provenance: Seq[Provenance] = Nil)

  /** `models.py:105-119`. */
  case class NewsArticle(
      article_id: String,
      company_id: String,
      title: String,
      url: Option[String] = None,
      author: Option[String] = None,
      date_published: Option[String] = None,
      excerpt: Option[String] = None,
      content: Option[String] = None,
      categories: Seq[String] = Nil,
      tags: Seq[String] = Nil,
      word_count: Option[Int] = None,
      reading_time: Option[Int] = None,
      schema_version: String = SchemaVersion,
      provenance: Seq[Provenance] = Nil)

  /** Chunk of page text headed to the vector index
    * (`handle_chunking.py:164-181`).
    */
  case class Chunk(
      chunk_id: String,
      company_id: String,
      page_type: String,
      chunk_index: Int,
      text: String)

  /** ATS/JSON-LD job posting (`scraper_v2.py:2296-2305`). */
  case class Job(
      title: String,
      description: Option[String] = None,
      location: Option[String] = None,
      employmentType: Option[String] = None,
      datePosted: Option[String] = None,
      source: Option[String] = None,
      url: Option[String] = None)

  /** Risk signal (`tools.py:319-329` / `risk_detection.py:74-79`). */
  case class RiskSignal(
      signal_id: String,
      company_id: String,
      risk_type: String,
      keyword: String,
      severity: String,
      source: Option[String] = None,
      context: Option[String] = None)
}
