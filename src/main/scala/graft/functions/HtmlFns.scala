package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** C12/C15/C16 — HTML facet extraction (reference: BeautifulSoup
  * selectors, `/root/reference/src/scraper_v2.py:120-468`,
  * `structured_extraction_v2.py:442-514`).
  *
  * Regex-based: no HTML parser ships in this container, and the
  * reference's selectors reduce to tag/attribute patterns. Simple
  * facets are pure Column regexes (codegen'd); nested table extraction
  * is a Scala UDF (SURVEY §7.3 puts C15/C16 in the UDF tier).
  */
object HtmlFns {

  /** C12 — bodies of `<script type="application/ld+json">` blocks, as
    * raw JSON strings (parse with from_json downstream, route on
    * `@type`).
    */
  def jsonLdScripts(html: Column): Column =
    regexp_extract_all(
      html,
      lit("(?is)<script[^>]*type\\s*=\\s*[\"']application/ld\\+json[\"'][^>]*>(.*?)</script>"),
      lit(1))

  /** C16 — href targets of anchor tags. */
  def links(html: Column): Column =
    // capture the whole href, then strip any #fragment — excluding '#'
    // from the capture class would silently drop every link that
    // CONTAINS a fragment, not just pure anchors; pure-anchor hrefs
    // ("#top") strip to empty and are filtered out
    filter(
      transform(
        regexp_extract_all(html, lit("(?i)<a[^>]+href\\s*=\\s*[\"']([^\"']+)[\"']"), lit(1)),
        u => regexp_replace(u, "#.*$", "")),
      u => u =!= "")

  /** C16 — image sources. */
  def images(html: Column): Column =
    regexp_extract_all(html, lit("(?i)<img[^>]+src\\s*=\\s*[\"']([^\"']+)[\"']"), lit(1))

  /** C16 — document title. */
  def title(html: Column): Column =
    regexp_extract(html, "(?is)<title[^>]*>(.*?)</title>", 1)

  /** C16 — content of a named meta tag (description, og:title, ...). */
  def metaContent(html: Column, name: String): Column =
    regexp_extract(
      html,
      s"""(?is)<meta[^>]+(?:name|property)\\s*=\\s*["']${java.util.regex.Pattern.quote(name)}["'][^>]+content\\s*=\\s*["']([^"']*)["']""",
      1)

  /** Strip tags/scripts/styles to visible text (C16 text_content). */
  def textContent(html: Column): Column =
    trim(
      regexp_replace(
        regexp_replace(
          regexp_replace(html, "(?is)<(script|style)[^>]*>.*?</\\1>", " "),
          "(?s)<[^>]+>",
          " "),
        "\\s+",
        " "))

  /** C15 — per-table extraction: (caption, headers, rows) for each
    * `<table>`; headers from thead/th else first row. Scala UDF over
    * nested regex matching.
    */
  case class HtmlTable(caption: String, headers: Seq[String], rows: Seq[Seq[String]])

  private def cellText(s: String): String =
    s.replaceAll("(?s)<[^>]+>", " ").replaceAll("\\s+", " ").trim

  private[graft] def extractTablesImpl(html: String): Seq[HtmlTable] = {
    if (html == null) return Seq.empty
    val tableRe = "(?is)<table[^>]*>(.*?)</table>".r
    val rowRe = "(?is)<tr[^>]*>(.*?)</tr>".r
    val cellRe = "(?is)<t[hd][^>]*>(.*?)</t[hd]>".r
    val capRe = "(?is)<caption[^>]*>(.*?)</caption>".r
    tableRe.findAllMatchIn(html).map { tm =>
      val body = tm.group(1)
      val caption = capRe.findFirstMatchIn(body).map(m => cellText(m.group(1))).getOrElse("")
      val allRows = rowRe.findAllMatchIn(body).map { rm =>
        cellRe.findAllMatchIn(rm.group(1)).map(cm => cellText(cm.group(1))).toSeq
      }.toSeq.filter(_.nonEmpty)
      // the first row is the header row whether it uses <th> or <td> —
      // the reference's pandas.read_html promotes the first row the
      // same way for th-less tables
      val (headers, rows) =
        if (allRows.isEmpty) (Seq.empty[String], Seq.empty[Seq[String]])
        else (allRows.head, allRows.tail)
      HtmlTable(caption, headers, rows)
    }.toSeq
  }

  val extractTables: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((html: String) => extractTablesImpl(html))

  /** C14 — recursive embedded-JSON mining for job-shaped objects
    * (`title` plus one of location/department/url), reference
    * `scraper_v2.py:469-489,626-689`. Jackson tree-walk UDF.
    */
  case class MinedJob(title: String, location: String, department: String, url: String)

  private[graft] def mineJobsImpl(json: String): Seq[MinedJob] = {
    if (json == null) return Seq.empty
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root =
      try mapper.readTree(json)
      catch { case _: Exception => return Seq.empty }
    val out = scala.collection.mutable.ArrayBuffer[MinedJob]()
    def txt(n: com.fasterxml.jackson.databind.JsonNode, f: String): String = {
      val v = n.get(f)
      if (v == null || v.isNull) null
      else if (v.isTextual) v.asText()
      else if (v.isObject && v.has("name")) v.get("name").asText()
      else null
    }
    def walk(n: com.fasterxml.jackson.databind.JsonNode): Unit = {
      if (n.isObject) {
        val title = txt(n, "title")
        val loc = txt(n, "location")
        val dept = txt(n, "department")
        val url = Option(txt(n, "url")).getOrElse(txt(n, "absolute_url"))
        if (title != null && (loc != null || dept != null || url != null))
          out += MinedJob(title, loc, dept, url)
        val it = n.elements()
        while (it.hasNext) walk(it.next())
      } else if (n.isArray) {
        val it = n.elements()
        while (it.hasNext) walk(it.next())
      }
    }
    walk(root)
    out.toSeq
  }

  val mineJobs: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((json: String) => mineJobsImpl(json))
}
