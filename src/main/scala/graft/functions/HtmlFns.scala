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

  /** `urljoin(base, link)` for the common cases: absolute schemes
    * kept, protocol-relative (`//host/path`) adopt the base's scheme
    * (urllib semantics — NOT root-relative, which would double the
    * host), root-relative joined to the base's scheme+authority, other
    * relatives to the base's directory, empty → the base itself.
    */
  def urlJoin(link: Column, base: Column): Column =
    when(link.isNull || link === "", base)
      .when(link.rlike("^[A-Za-z][A-Za-z0-9+.-]*://"), link)
      .when(
        link.startsWith("//") && base.rlike("^[A-Za-z][A-Za-z0-9+.-]*://"),
        concat(regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*):", 1), lit(":"), link))
      // schemeless base: urllib returns the protocol-relative link as-is
      .when(link.startsWith("//"), link)
      .when(
        link.startsWith("/"),
        concat(regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*://[^/]+)", 1), link))
      .when(
        base.rlike("^[A-Za-z][A-Za-z0-9+.-]*://[^/]*$"),
        concat(base, lit("/"), link))
      .otherwise(concat(regexp_extract(base, "^(.*/)[^/]*$", 1), link))

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

  /** C16 — script-tag inventory as pure columns: per `<script>` its
    * src/type/id attributes, async/defer flags, inner-content length
    * and a has_json hint (body starts with `{`/`[`) — the reference's
    * `extract_all_scripts` facet (`scraper_v2.py:868-903`) minus the
    * recursive JSON mining, which is `mineJobs`' job.
    */
  def scripts(html: Column): Column = {
    val blocks = regexp_extract_all(html, lit("(?is)<script[^>]*>.*?</script>"), lit(0))
    transform(blocks, b => {
      val attrs = regexp_extract(b, "(?is)^<script([^>]*)>", 1)
      val body = regexp_extract(b, "(?is)^<script[^>]*>(.*)</script>$", 1)
      val bodyT = trim(body)
      struct(
        regexp_extract(attrs, "(?i)(?:^|\\s)src\\s*=\\s*[\"']([^\"']*)[\"']", 1).as("src"),
        regexp_extract(attrs, "(?i)(?:^|\\s)type\\s*=\\s*[\"']([^\"']*)[\"']", 1).as("stype"),
        regexp_extract(attrs, "(?i)(?:^|\\s)id\\s*=\\s*[\"']([^\"']*)[\"']", 1).as("id"),
        attrs.rlike("(?i)(?:^|\\s)async(?:\\s|=|$)").as("async"),
        attrs.rlike("(?i)(?:^|\\s)defer(?:\\s|=|$)").as("defer"),
        length(body).cast("long").as("content_length"),
        (bodyT.startsWith("{") || bodyT.startsWith("[")).as("has_json"))
    })
  }

  private def anchorStructs(blocks: Column, baseUrl: Column): Column =
    flatten(transform(blocks, b =>
      transform(
        regexp_extract_all(
          b,
          lit("(?is)<a[^>]*href\\s*=\\s*[\"'][^\"']*[\"'][^>]*>.*?</a>"),
          lit(0)),
        a =>
          struct(
            trim(regexp_replace(
              regexp_replace(regexp_extract(a, "(?is)^<a[^>]*>(.*)</a>$", 1), "(?s)<[^>]+>", " "),
              "\\s+", " ")).as("text"),
            urlJoin(
              regexp_extract(a, "(?i)href\\s*=\\s*[\"']([^\"']*)[\"']", 1),
              baseUrl).as("href")))))

  /** C16 — navigation structure: anchors inside `<nav>`/`<header>`
    * (main nav), `<footer>` (footer links), and breadcrumb-classed
    * containers, hrefs resolved against the page URL — the
    * reference's `extract_navigation_structure`
    * (`scraper_v2.py:905-955`).
    */
  def navigation(html: Column, baseUrl: Column): Column = {
    val navBlocks = concat(
      regexp_extract_all(html, lit("(?is)<nav[\\s>].*?</nav>"), lit(0)),
      regexp_extract_all(html, lit("(?is)<header[\\s>].*?</header>"), lit(0)))
    val footBlocks = regexp_extract_all(html, lit("(?is)<footer[\\s>].*?</footer>"), lit(0))
    val crumbBlocks = regexp_extract_all(
      html,
      lit("(?is)<(?:nav|ol|ul)[^>]*class\\s*=\\s*[\"'][^\"']*breadcrumb[^\"']*[\"'][^>]*>.*?</(?:nav|ol|ul)>"),
      lit(0))
    struct(
      anchorStructs(navBlocks, baseUrl).as("main_nav"),
      anchorStructs(footBlocks, baseUrl).as("footer_links"),
      anchorStructs(crumbBlocks, baseUrl).as("breadcrumbs"))
  }

  /** C16 — per-page statistics: link/image/form/table counts,
    * internal vs external links (no-authority hrefs count internal,
    * like the reference's `is_same_domain`), and visible word count
    * (`scraper_v2.py:1148-1172`).
    */
  def pageStatistics(html: Column, baseUrl: Column): Column = {
    val ls = links(html)
    val authority = "^[A-Za-z][A-Za-z0-9+.-]*://([^/]+)"
    val domain = regexp_extract(baseUrl, authority, 1)
    // a link carries an authority if it has a scheme OR is
    // protocol-relative (//host/...) — both compare against the base
    // domain; authority-free hrefs are internal by construction
    val internal = filter(
      ls,
      l => {
        val auth = when(l.rlike("^[A-Za-z][A-Za-z0-9+.-]*://"), regexp_extract(l, authority, 1))
          .when(l.startsWith("//"), regexp_extract(l, "^//([^/]+)", 1))
        auth.isNull || auth === domain
      })
    val text = textContent(html)
    struct(
      size(ls).cast("long").as("total_links"),
      size(internal).cast("long").as("internal_links"),
      (size(ls) - size(internal)).cast("long").as("external_links"),
      size(images(html)).cast("long").as("total_images"),
      size(regexp_extract_all(html, lit("(?is)<form[\\s>]"), lit(0))).cast("long").as("total_forms"),
      size(regexp_extract_all(html, lit("(?is)<table[\\s>]"), lit(0))).cast("long").as("total_tables"),
      when(text === "", 0L).otherwise(size(split(text, "\\s+")).cast("long")).as("word_count"))
  }

  /** C16 — per-form extraction with fields: action/method/id/name and
    * every input/textarea/select's type, name, id, placeholder,
    * associated `<label for=...>` text, required flag and value —
    * the reference's `extract_all_forms` (`scraper_v2.py:259-298`).
    * UDF tier like C15: nested structure plus a cross-document label
    * lookup.
    */
  case class FormField(
      ftype: String, name: String, id: String, placeholder: String,
      label: String, required: Boolean, value: String)
  case class HtmlForm(
      action: String, method: String, id: String, name: String, fields: Seq[FormField])

  private[graft] def extractFormsImpl(html: String): Seq[HtmlForm] = {
    if (html == null) return Seq.empty
    val formRe = "(?is)<form([^>]*)>(.*?)</form>".r
    val fieldRe = "(?is)<(input|textarea|select)([^>]*?)/?>".r
    val labelRe = "(?is)<label([^>]*)>(.*?)</label>".r
    def attr(attrs: String, a: String): String =
      ("(?is)(?:^|\\s)" + a + "\\s*=\\s*[\"']([^\"']*)[\"']").r
        .findFirstMatchIn(attrs).map(_.group(1)).getOrElse("")
    def boolAttr(attrs: String, a: String): Boolean =
      ("(?is)(?:^|\\s)" + a + "(?:\\s|=|$)").r.findFirstIn(attrs).isDefined
    val labels: Map[String, String] = labelRe.findAllMatchIn(html).flatMap { m =>
      val forId = attr(m.group(1), "for")
      if (forId.isEmpty) None else Some(forId -> cellText(m.group(2)))
    }.toMap
    formRe.findAllMatchIn(html).map { fm =>
      val fAttrs = fm.group(1)
      val method = attr(fAttrs, "method") match {
        case "" => "GET"
        case m  => m.toUpperCase
      }
      val fields = fieldRe.findAllMatchIn(fm.group(2)).map { im =>
        val tag = im.group(1).toLowerCase
        val a = im.group(2)
        val id = attr(a, "id")
        FormField(
          ftype = attr(a, "type") match { case "" => tag; case t => t },
          name = attr(a, "name"),
          id = id,
          placeholder = attr(a, "placeholder"),
          label = labels.getOrElse(id, ""),
          required = boolAttr(a, "required"),
          value = attr(a, "value"))
      }.toSeq
      HtmlForm(attr(fAttrs, "action"), method, attr(fAttrs, "id"), attr(fAttrs, "name"), fields)
    }.toSeq
  }

  val extractForms: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((html: String) => extractFormsImpl(html))

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
