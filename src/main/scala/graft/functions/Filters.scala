package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** F6-F9 — reusable boolean `Column` predicates (reference
  * `/root/reference/src/scraper_v2.py:1093-1129`,
  * `structured_extraction_v2.py:112-215,1758-1930`,
  * `news_extractor.py:91-130`). Pure column compositions — apply as
  * `df.filter(...)`.
  */
object Filters {

  /** F6 — page-error predicate: known error phrases, or very short
    * content that mentions an error (`detect_page_error`).
    */
  private val errorPhrases = Seq(
    "404 not found", "403 forbidden", "500 internal server error",
    "access denied", "page not found", "this page could not be found",
    "site can't be reached", "connection refused", "err_",
    "service unavailable", "too many requests", "captcha",
    "are you a robot", "enable javascript", "checking your browser")

  def pageError(text: Column): Column = {
    val l = lower(text)
    val phraseHit = errorPhrases.map(p => l.contains(p)).reduce(_ || _)
    val shortError = length(trim(text)) < 50 && l.contains("error")
    phraseHit || shortError
  }

  /** F7 — placeholder-name filter (`is_placeholder_name`): generic
    * section titles and filler values that regex extraction mistakes
    * for entities.
    */
  private val placeholderNames = Seq(
    "john doe", "jane doe", "lorem ipsum", "your name", "first last",
    "n/a", "tbd", "unknown", "test user", "admin")

  def isPlaceholderName(name: Column): Column = {
    val l = lower(trim(name))
    placeholderNames.map(p => l === p).reduce(_ || _) ||
      l.rlike("^(name|title|header|label)\\s*\\d*$")
  }

  /** F7 — website-section filter (`is_website_section`): nav/section
    * strings that are not person/company names.
    */
  private val sectionWords = Seq(
    "about us", "contact", "careers", "privacy policy", "terms of service",
    "blog", "pricing", "products", "solutions", "resources", "sign in",
    "log in", "get started", "learn more", "read more", "home", "faq",
    "documentation", "support", "newsletter")

  def isWebsiteSection(s: Column): Column = {
    val l = lower(trim(s))
    sectionWords.map(w => l === w).reduce(_ || _)
  }

  /** F7 — plausible full person name (`is_valid_full_name`): 2-4
    * capitalized words, no digits/urls.
    */
  def isValidFullName(s: Column): Column =
    trim(s).rlike("^[A-Z][a-zA-Z'\\-]+( [A-Z][a-zA-Z'\\-\\.]+){1,3}$") &&
      !lower(s).rlike("(http|www\\.|@)")

  /** F7 — placeholder-date filter: epoch/sentinel dates. */
  def isPlaceholderDate(d: Column): Column =
    d.isNull || d === to_date(lit("1970-01-01")) || d === to_date(lit("1900-01-01")) ||
      d === to_date(lit("9999-12-31"))

  /** F9 — article-link predicate: same-domain, skip listing/archive
    * paths, require an article-ish path segment
    * (`extract_article_links_from_index`).
    */
  def looksLikeArticleLink(url: Column, baseHost: Column): Column = {
    val host = regexp_replace(
      regexp_extract(url, "^https?://([^/]+)", 1), "^www\\.", "")
    val path = lower(coalesce(regexp_extract(url, "^https?://[^/]+(/.*)$", 1), lit("/")))
    val sameDomain = host === regexp_replace(baseHost, "^www\\.", "")
    val skip = Seq("/category/", "/tag/", "/author/", "/page/", "/search", "/archive")
      .map(p => path.contains(p)).reduce(_ || _)
    val articleish = Seq("/blog/", "/news/", "/post/", "/article/")
      .map(p => path.contains(p)).reduce(_ || _)
    sameDomain && !skip && articleish
  }

  /** F8 — geo cleaning: keep plausible city tokens, drop
    * action-word prefixes and false positives (`clean_geo_presence`).
    */
  def isPlausibleCity(s: Column): Column = {
    val t = trim(s)
    t.rlike("^[A-Z][a-zA-Z\\.'\\-]+(?:,? [A-Z][a-zA-Z\\.'\\-]+){0,2}$") &&
      !lower(t).rlike("^(visit|contact|join|apply|see|view|click|explore|discover) ") &&
      length(t).between(3, 40)
  }
}
