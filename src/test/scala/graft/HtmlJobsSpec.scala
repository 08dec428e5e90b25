package graft

import graft.functions.HtmlFns
import graft.operators.{Jobs, Relational, Similarity}
import org.apache.spark.sql.functions._

class HtmlJobsSpec extends SparkSpec {
  import spark.implicits._

  private val html =
    """<html><head><title>Acme — AI for Everyone</title>
      |<meta name="description" content="Acme builds AI.">
      |<script type="application/ld+json">{"@type":"Organization","name":"Acme"}</script>
      |</head><body>
      |<a href="/about">About</a> <a href="https://ext.com/x">ext</a>
      |<img src="/logo.png">
      |<p>Welcome to <b>Acme</b>.</p>
      |<table><caption>Pricing</caption>
      | <tr><th>Tier</th><th>Price</th></tr>
      | <tr><td>Free</td><td>$0</td></tr>
      | <tr><td>Pro</td><td>$99</td></tr></table>
      |</body></html>""".stripMargin

  test("C12/C16 — jsonld scripts, links, images, title, meta, text") {
    val df = Seq(html).toDF("html")
    val r = df.select(
      HtmlFns.jsonLdScripts($"html").as("ld"),
      HtmlFns.links($"html").as("links"),
      HtmlFns.images($"html").as("imgs"),
      HtmlFns.title($"html").as("title"),
      HtmlFns.metaContent($"html", "description").as("desc"),
      HtmlFns.textContent($"html").as("text")).head()
    assert(r.getSeq[String](0).head.contains("\"@type\":\"Organization\""))
    assert(r.getSeq[String](1) == Seq("/about", "https://ext.com/x"))
    assert(r.getSeq[String](2) == Seq("/logo.png"))
    assert(r.getString(3) == "Acme — AI for Everyone")
    assert(r.getString(4) == "Acme builds AI.")
    assert(r.getString(5).contains("Welcome to Acme") && !r.getString(5).contains("<"))
  }

  test("C15 — table extraction: caption, th headers, data rows") {
    val tables = HtmlFns.extractTablesImpl(html)
    assert(tables.length == 1)
    assert(tables.head.caption == "Pricing")
    assert(tables.head.headers == Seq("Tier", "Price"))
    assert(tables.head.rows == Seq(Seq("Free", "$0"), Seq("Pro", "$99")))
    // as a UDF over a frame
    val n = Seq(html).toDF("html")
      .select(explode(HtmlFns.extractTables($"html")).as("t"))
      .select("t.caption").count()
    assert(n == 1)
  }

  test("C14 — recursive JSON job mining finds nested job-shaped dicts") {
    val json =
      """{"page":{"widgets":[{"jobs":[
        |{"title":"SWE","location":{"name":"NYC"},"absolute_url":"https://x/1"},
        |{"title":"Designer","department":"Design"},
        |{"name":"not a job"}]}]}}""".stripMargin
    val jobs = HtmlFns.mineJobsImpl(json)
    assert(jobs.map(_.title).toSet == Set("SWE", "Designer"))
    assert(jobs.find(_.title == "SWE").get.location == "NYC")
    assert(HtmlFns.mineJobsImpl("not json") == Seq())
  }

  test("S4/U2/D1/A6 — ATS parse, union-dedup, openings counts") {
    val gh = Seq(("acme",
      """{"jobs":[{"title":"Software Engineer","absolute_url":"https://gh/1","location":{"name":"NYC"},"updated_at":"2024"},
        |{"title":"Sales Lead","absolute_url":"https://gh/2","location":{"name":"SF"},"updated_at":"2024"}]}""".stripMargin))
      .toDF("company_id", "resp")
    val lv = Seq(("acme",
      """[{"text":"Software Engineer","hostedUrl":"https://gh/1","categories":{"location":"NYC","team":"Eng"},"createdAt":1}]"""))
      .toDF("company_id", "resp")
    val g = Jobs.parseGreenhouse(gh, "resp")
    val l = Jobs.parseLever(lv, "resp")
    assert(g.count() == 2 && l.count() == 1)
    // same (title,url) from lever deduped away; greenhouse wins (prio 0)
    val all = Jobs.unionDedup(
      Seq(g, l),
      f => when(col("source") === "greenhouse", 0).otherwise(1))
    assert(all.count() == 2)
    assert(all.filter(col("source") === "lever").count() == 0)
    val counts = Jobs.openingsCounts(all).head()
    assert(counts.getLong(1) == 2L && counts.getLong(2) == 1L && counts.getLong(3) == 1L)
  }

  test("S4 — detectAts: ordered vendor routing over html and url") {
    val cases = Seq(
      // html marker wins in reference priority order
      ("<iframe src='https://boards.greenhouse.io/x'>", "https://a.com", "greenhouse"),
      ("<script src='https://api.lever.co/v0/postings/x'>", "https://a.com", "lever"),
      ("<iframe src='https://apply.workable.com/acme/'>", "https://a.com", "workable"),
      ("<div data-ashby-board>", "https://a.com", "ashby"),
      ("powered by bamboohr", "https://a.com", "bamboohr"),
      ("careers.icims.com embed", "https://a.com", "icims"),
      ("<script src='https://acme.myworkdayjobs.com/w.js'>", "https://a.com", "workday"),
      ("taleo career section", "https://a.com", "oracle"),
      ("jobs.smartrecruiters.com", "https://a.com", "smartrecruiters"),
      ("jobvite widget", "https://a.com", "jobvite"),
      // url-only markers
      ("<div>plain</div>", "https://jobs.ashbyhq.com/org", "ashby"),
      ("<div>plain</div>", "https://x.wd5.myworkdayjobs.com/ext", "workday"),
      ("<div>plain</div>", "https://acme.oraclecloud.com/hcm", "oracle"),
      // greenhouse outranks a later marker in the same page
      ("greenhouse and workable both mentioned", "https://a.com", "greenhouse"),
      // nothing → null
      ("<div>plain</div>", "https://a.com", null))
    val got = cases.map(c => (c._1, c._2)).toDF("html", "url")
      .select(Jobs.detectAts(col("html"), col("url"))).collect().map(r =>
        if (r.isNullAt(0)) null else r.getString(0)).toSeq
    assert(got == cases.map(_._3))
  }

  test("S4 — parseWorkable/parseAshby API shapes, parseWorkday HTML blocks") {
    val wb = Seq(("acme",
      """{"results":[{"title":"Backend Engineer","location":{"city":["Berlin","Remote"]},
        |"department":"Eng","shortlink":"https://wk/1"},
        |{"title":"No City","location":{},"url":"https://wk/2"},
        |{"title":"Empty Url","location":{},"url":"","shortlink":"https://wk/3"}]}""".stripMargin))
      .toDF("company_id", "resp")
    val w = Jobs.parseWorkable(wb, "resp").collect()
      .map(r => (r.getString(1), r.getString(2), if (r.isNullAt(3)) null else r.getString(3))).toSeq
    assert(w == Seq(
      ("Backend Engineer", "https://wk/1", "Berlin, Remote"),
      ("No City", "https://wk/2", null),
      // empty-string url is falsy in the reference — shortlink wins
      ("Empty Url", "https://wk/3", null)))

    val as = Seq(("acme",
      """{"jobPostings":[{"title":"Data Scientist","locationName":"NYC",
        |"team":{"name":"Data"},"publishedJobUrl":"https://ash/1"}]}""".stripMargin))
      .toDF("company_id", "resp")
    val a = Jobs.parseAshby(as, "resp").head()
    assert(a.getString(1) == "Data Scientist" && a.getString(2) == "https://ash/1" &&
      a.getString(3) == "NYC" && a.getString(4) == "ashby")

    val html =
      """<ul data-automation-id="jobResults">
        |<li data-automation-id="jobPosting"><a href="/logo.png">logo</a><a data-automation-id="jobTitle" href="/job/JR-1">Staff Engineer</a>
        |<span data-automation-id="locations">Austin</span></li>
        |<li data-automation-id="jobPosting"><a data-automation-id="jobTitle" href="/job/PR-2">Platform Engineer</a></li>
        |<li data-automation-id="jobPosting"><a data-automation-id="jobTitle" href="/x">tiny</a></li>
        |</ul>""".stripMargin
    val wd = Jobs.parseWorkday(
      Seq(("acme", html, "https://acme.wd5.myworkdayjobs.com/careers"))
        .toDF("company_id", "html", "careers_url"),
      "html", "careers_url")
      .collect().map(r => (r.getString(1), r.getString(2), if (r.isNullAt(3)) null else r.getString(3))).toSeq
    // 'tiny' fails the 5<len<200 sanity cut; missing location → null;
    // hrefs resolve against the careers URL like the reference's urljoin
    assert(wd == Seq(
      ("Staff Engineer", "https://acme.wd5.myworkdayjobs.com/job/JR-1", "Austin"),
      ("Platform Engineer", "https://acme.wd5.myworkdayjobs.com/job/PR-2", null)))
  }

  test("C16 — forms, scripts, navigation, statistics facets") {
    val html =
      """<html><head>
        |<script src="/a.js" defer></script>
        |<script id="st">  [1,2,3]  </script>
        |</head><body>
        |<nav class="top"><a href="/x">X <b>bold</b></a></nav>
        |<header><a href="https://other.com/y">Y</a></header>
        |<ul class="crumb breadcrumbs"><a href="/c1">C1</a></ul>
        |<form action="/go" method="post" name="f1">
        |  <label for="q">Query</label>
        |  <input type="text" id="q" name="q" placeholder="type here" required value="v0">
        |  <textarea name="notes"></textarea>
        |  <select name="opt"><option>o</option></select>
        |</form>
        |<form><input name="bare"></form>
        |<table><tr><td>t</td></tr></table>
        |</body></html>""".stripMargin
    val df = Seq(html).toDF("html")

    val forms = HtmlFns.extractFormsImpl(html)
    assert(forms.size == 2)
    val f1 = forms.head
    assert(f1.action == "/go" && f1.method == "POST" && f1.name == "f1")
    assert(f1.fields.map(_.ftype) == Seq("text", "textarea", "select"))
    val q = f1.fields.head
    assert(q.label == "Query" && q.required && q.placeholder == "type here" && q.value == "v0")
    assert(!f1.fields(1).required && f1.fields(1).label == "")
    assert(forms(1).method == "GET" && forms(1).fields.map(_.name) == Seq("bare"))

    val sc = df.select(explode(HtmlFns.scripts(col("html"))).as("s"))
      .select("s.src", "s.async", "s.defer", "s.has_json").collect()
    assert(sc.length == 2)
    assert(sc(0).getString(0) == "/a.js" && !sc(0).getBoolean(1) && sc(0).getBoolean(2))
    assert(sc(1).getString(0) == "" && sc(1).getBoolean(3)) // [1,2,3] is json

    val nav = df.select(HtmlFns.navigation(col("html"), lit("https://base.com/p/i.html")).as("n"))
      .select("n.main_nav", "n.footer_links", "n.breadcrumbs").head()
    val main = nav.getSeq[org.apache.spark.sql.Row](0).map(r => (r.getString(0), r.getString(1)))
    assert(main == Seq(("X bold", "https://base.com/x"), ("Y", "https://other.com/y")))
    assert(nav.getSeq[org.apache.spark.sql.Row](1).isEmpty) // no footer
    assert(nav.getSeq[org.apache.spark.sql.Row](2).map(_.getString(0)) == Seq("C1"))

    val st = df.select(HtmlFns.pageStatistics(col("html"), lit("https://base.com/")).as("s"))
      .select("s.total_links", "s.internal_links", "s.external_links",
        "s.total_forms", "s.total_tables").head()
    assert((st.getLong(0), st.getLong(1), st.getLong(2), st.getLong(3), st.getLong(4)) ==
      ((3L, 2L, 1L, 2L, 1L)))
  }

  test("urlJoin: protocol-relative links adopt the base scheme (urllib semantics)") {
    val rows = Seq(
      ("//cdn.other.org/x", "https://docs.example.com/p/i.html", "https://cdn.other.org/x"),
      ("//cdn.other.org/x", "http://docs.example.com/", "http://cdn.other.org/x"),
      ("//cdn.other.org/x", "example.com/page", "//cdn.other.org/x"),
      ("/root", "https://docs.example.com/p/i.html", "https://docs.example.com/root"),
      ("rel.html", "https://docs.example.com/p/i.html", "https://docs.example.com/p/rel.html"))
    rows.foreach { case (link, base, want) =>
      val got = Seq((link, base)).toDF("l", "b")
        .select(HtmlFns.urlJoin(col("l"), col("b"))).head().getString(0)
      assert(got == want, s"urlJoin($link, $base) = $got, want $want")
    }
    // ...and pageStatistics classifies a foreign //host link as EXTERNAL
    val page = """<a href="//cdn.other.org/x">c</a><a href="//base.com/y">s</a><a href="/in">i</a>"""
    val st = Seq(page).toDF("html")
      .select(HtmlFns.pageStatistics(col("html"), lit("https://base.com/")).as("s"))
      .select("s.internal_links", "s.external_links").head()
    assert((st.getLong(0), st.getLong(1)) == ((2L, 1L)))
  }

  test("S3 — feedEntries parses RSS and Atom with urljoin and limits") {
    import graft.operators.Feeds
    val rss =
      """<rss version="2.0"><channel>
        |<item><title> A </title><link>/p/1</link><description><![CDATA[first &amp; best]]></description>
        |<pubDate>Mon, 01 Jan 2024</pubDate></item>
        |<item><title>B</title><link>https://other.com/x</link></item>
        |<item><title>C</title></item>
        |</channel></rss>""".stripMargin
    val atom =
      """<feed xmlns="http://www.w3.org/2005/Atom">
        |<entry><title>X</title><link href="https://abs.com/1"/><summary>sx</summary>
        |<updated>2024-02-01</updated><published>2023-01-01</published></entry>
        |<entry><title>Y</title><link>rel.html</link><published>2024-03-01</published></entry>
        |<entry><title>Z</title><link href='https://sq.com/2'/></entry>
        |<entry><title>Q</title><link href="https://ex.com/d'arc"/></entry>
        |</feed>""".stripMargin
    val df = Seq(
      ("rss", rss, "https://base.com/feeds/main.xml"),
      ("atom", atom, "https://base.com/feeds/main.xml"),
      ("broken", "not xml at all", "https://base.com/")
    ).toDF("src", "xml", "base")
    val got = df
      .select(col("src"), explode(Feeds.feedEntries(col("xml"), col("base"))).as("e"))
      .select(col("src"), col("e.title"), col("e.url"), col("e.summary"), col("e.published"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3), r.getString(4))).toSeq
    assert(got == Seq(
      // trim + CDATA strip; root-relative link joins scheme+authority
      ("rss", "A", "https://base.com/p/1", "first &amp; best", "Mon, 01 Jan 2024"),
      ("rss", "B", "https://other.com/x", "", ""),
      // missing link → the feed url itself (urljoin(base, ""))
      ("rss", "C", "https://base.com/feeds/main.xml", "", ""),
      // href wins; updated outranks published
      ("atom", "X", "https://abs.com/1", "sx", "2024-02-01"),
      // text link, non-root relative → base directory; published fallback
      ("atom", "Y", "https://base.com/feeds/rel.html", "", "2024-03-01"),
      // single-quoted href parses the same (ElementTree is quote-agnostic)
      ("atom", "Z", "https://sq.com/2", "", ""),
      // an apostrophe INSIDE a double-quoted href doesn't truncate it
      ("atom", "Q", "https://ex.com/d'arc", "", "")))
    // limit truncates
    val lim = df.filter(col("src") === "rss")
      .select(size(Feeds.feedEntries(col("xml"), col("base"), 2))).head().getInt(0)
    assert(lim == 2)
  }

  test("LSH hyperplane buckets: same-direction vectors collide, orthogonal don't") {
    val df = Seq(
      (1L, Seq(1.0, 0.01, 0.0)), (2L, Seq(0.99, 0.0, 0.01)), (3L, Seq(0.0, 0.0, 1.0))
    ).toDF("id", "emb")
    val pairs = Similarity.lshNearDupPairs(df, "id", "emb", dim = 3, nBits = 8, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
    // deterministic across invocations
    val sig1 = Similarity.hyperplaneSignature(df, "emb", 3, 8).select("lsh_bucket").collect()
    val sig2 = Similarity.hyperplaneSignature(df, "emb", 3, 8).select("lsh_bucket").collect()
    assert(sig1.map(_.getString(0)).toSeq == sig2.map(_.getString(0)).toSeq)
  }

  test("saltedSumCount equals direct aggregation") {
    val df = (1 to 1000).map(i => ("hot", i.toDouble)) ++ (1 to 10).map(i => ("cold", i.toDouble))
    val got = Relational.saltedSumCount(df.toDF("k", "v"), Seq("k"), "v", 8)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(got("hot") == ((1 to 1000).sum.toDouble, 1000L))
    assert(got("cold") == (55.0, 10L))
  }
}
