package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** S3 — RSS/Atom feed parsing: feed XML → (title, url, summary,
  * published) entries, both dialects, per-feed entry limit
  * (reference `/root/reference/src/scraper_v2.py:972-1043`,
  * `news_extractor.py:60-89`).
  *
  * Pure column expressions (regex over the XML text) so parsing runs
  * inside whole-stage codegen on the scan — one pass per feed
  * document, no UDF, no shuffle. Dialect is decided per document:
  * an `<rss>`/`<channel>` root parses `<item>` children
  * (title/link/description/pubDate); anything else parses Atom
  * `<entry>` children (title, `<link href>` falling back to link
  * text, summary, updated falling back to published). CDATA wrappers
  * are stripped; relative links are resolved against the feed URL.
  */
object Feeds {

  /** `urljoin(base, link)` for the feed cases — shared with the HTML
    * facet extractors (see [[graft.functions.HtmlFns.urlJoin]]).
    */
  def absolutize(link: Column, base: Column): Column =
    graft.functions.HtmlFns.urlJoin(link, base)

  private def stripCdata(c: Column): Column =
    regexp_replace(c, "(?s)^<!\\[CDATA\\[(.*)\\]\\]>$", "$1")

  /** Trimmed, CDATA-stripped text of the first `<tag>` child. Missing
    * child → empty string (the reference's `or ""`).
    */
  private def childText(block: Column, tag: String): Column =
    trim(stripCdata(trim(regexp_extract(block, s"(?is)<$tag[^>]*>(.*?)</$tag>", 1))))

  /** Parse one feed document into an array of
    * `struct<title,url,summary,published>`, first `limit` entries
    * (reference default 25, `scraper_v2.py:1029-1043`).
    */
  def feedEntries(xml: Column, baseUrl: Column, limit: Int = 25): Column = {
    val isRss = xml.rlike("(?is)<rss[\\s>]") || xml.rlike("(?is)<channel[\\s>]")
    val rssItems = regexp_extract_all(xml, lit("(?is)<item[^>]*>.*?</item>"), lit(0))
    val atomItems = regexp_extract_all(xml, lit("(?is)<entry[^>]*>.*?</entry>"), lit(0))
    val rss = transform(rssItems, b =>
      struct(
        childText(b, "title").as("title"),
        absolutize(childText(b, "link"), baseUrl).as("url"),
        childText(b, "description").as("summary"),
        childText(b, "pubDate").as("published")))
    val atom = transform(atomItems, b => {
      // quote-agnostic like ElementTree's .get("href"), but matched
      // per quote STYLE — a single mixed class [^"']* would truncate
      // an URL containing the opposite quote (…/d'arc)
      val hrefD = regexp_extract(b, "(?is)<link[^>]*href=\"([^\"]*)\"", 1)
      val hrefS = regexp_extract(b, "(?is)<link[^>]*href='([^']*)'", 1)
      val href = when(hrefD =!= "", hrefD).otherwise(hrefS)
      val link = when(href =!= "", href).otherwise(childText(b, "link"))
      val updated = childText(b, "updated")
      struct(
        childText(b, "title").as("title"),
        absolutize(link, baseUrl).as("url"),
        childText(b, "summary").as("summary"),
        when(updated =!= "", updated).otherwise(childText(b, "published")).as("published"))
    })
    slice(when(isRss, rss).otherwise(atom), 1, limit)
  }
}
