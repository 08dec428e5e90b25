package graft

import graft.functions.Filters
import org.apache.spark.sql.functions._

class FiltersSpec extends SparkSpec {
  import spark.implicits._

  private def flags(c: org.apache.spark.sql.Column, in: Seq[String]): Seq[Boolean] =
    in.toDF("s").select(c).collect().map(_.getBoolean(0)).toSeq

  test("F6 pageError: phrases and short-error heuristic") {
    val got = flags(Filters.pageError($"s"), Seq(
      "404 Not Found", "Checking your browser before accessing",
      "error", // short + mentions error
      "A perfectly fine long page body with plenty of real content here."))
    assert(got == Seq(true, true, true, false))
  }

  test("F7 placeholder/section/name/date predicates") {
    assert(flags(Filters.isPlaceholderName($"s"), Seq("John Doe", "TBD", "Header 2", "Dario Amodei"))
      == Seq(true, true, true, false))
    assert(flags(Filters.isWebsiteSection($"s"), Seq("About Us", "Pricing", "Acme Inc"))
      == Seq(true, true, false))
    assert(flags(Filters.isValidFullName($"s"), Seq(
      "Grace Hopper", "Ada B. Lovelace", "lowercase name", "X http://x.com"))
      == Seq(true, true, false, false))
    val d = Seq("1970-01-01", "2023-05-01").toDF("s")
      .select(Filters.isPlaceholderDate(to_date($"s"))).collect().map(_.getBoolean(0))
    assert(d.toSeq == Seq(true, false))
  }

  test("F9 article-link predicate: domain + path rules") {
    val rows = Seq(
      ("https://acme.ai/blog/new-model", "acme.ai", true),
      ("https://www.acme.ai/news/raise", "acme.ai", true),
      ("https://acme.ai/category/blog/", "acme.ai", false), // listing path
      ("https://other.com/blog/x", "acme.ai", false),       // cross-domain
      ("https://acme.ai/pricing", "acme.ai", false))        // not article-ish
    val got = rows.map(r => (r._1, r._2)).toDF("url", "host")
      .select(Filters.looksLikeArticleLink($"url", $"host")).collect().map(_.getBoolean(0))
    assert(got.toSeq == rows.map(_._3))
  }

  test("F8 plausible city") {
    assert(flags(Filters.isPlausibleCity($"s"), Seq(
      "San Francisco", "New York, NY", "Visit our office", "x", "paris"))
      == Seq(true, true, false, false, false))
  }
}
