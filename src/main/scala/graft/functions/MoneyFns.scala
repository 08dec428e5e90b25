package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** C2 — money-string parser (`$5.5B` / `about $27M` / `US$100k` →
  * USD double), reference `/root/reference/src/scraper_v2.py:2835-2864`.
  *
  * Pure column composition (regexp + `when` multiplier chain) — stays
  * inside whole-stage codegen; no UDF.
  */
object MoneyFns {

  /** Parse a human money string into a USD amount (double, null when
    * unparseable). Strips qualifiers (`about`, `over`, ...) and
    * currency markers, then applies the B/M/K multiplier.
    */
  def parseMoney(c: Column): Column = {
    val cleaned = regexp_replace(
      lower(trim(c)),
      "(about|over|approximately|around|nearly|roughly|up to|~|us\\$|usd|\\$|,)",
      "")
    val num = regexp_extract(cleaned, "([0-9]*\\.?[0-9]+)", 1)
    val numVal = when(num === "", lit(null).cast("double")).otherwise(num.cast("double"))
    val mult = when(cleaned.rlike("[0-9.]\\s*(b|bn|billion)"), lit(1e9))
      .when(cleaned.rlike("[0-9.]\\s*(m|mn|million)"), lit(1e6))
      .when(cleaned.rlike("[0-9.]\\s*(k|thousand)"), lit(1e3))
      .otherwise(lit(1.0))
    numVal * mult
  }

  /** C6 — the reference's known-VC list
    * (`structured_extraction_v2.py:2172-2179`): checked first, by
    * case-insensitive substring; regex extraction only runs when none
    * hit.
    */
  val knownInvestors: Seq[String] = Seq(
    "OpenAI Startup Fund", "Accel", "Founders Fund", "Khosla Ventures",
    "Y Combinator", "Sequoia", "Andreessen Horowitz", "a16z",
    "Lachy Groom", "Sam Altman", "Peter Thiel", "Paul Graham",
    "Jeff Weiner", "Buckley Ventures", "Neo", "GSV", "Inovia Capital",
    "Radical Ventures", "AMD Ventures", "NVIDIA", "PSP Investment")

  /** C6 — investor extraction from a funding description
    * (`structured_extraction_v2.py:2165-2216`): the known-investor
    * list is a LITERAL array (that IS the broadcast at any scale —
    * ~20 constants shipped once in the plan, matched per row inside
    * codegen); if none are present, the `led by` / `from` /
    * `investors like|including|such as` / `participation from`
    * capture patterns run, then cleanup: trim + strip trailing
    * punctuation, 2 < len < 50, drop the reference's false-positive
    * stoplist, dedup preserving first-seen order.
    */
  def extractInvestors(desc: Column, known: Seq[String] = knownInvestors): Column = {
    val d = coalesce(desc, lit(""))
    val found = filter(
      array(known.map(lit): _*),
      k => lower(d).contains(lower(k)))
    val patterns = Seq(
      "(?i)led by ([A-Z][a-zA-Z\\s&]+?)(?:,|\\.|and|with|$)",
      "(?i)from ([A-Z][a-zA-Z\\s&]+?)(?:,|\\.|and|with|$)",
      "(?i)investors? (?:like|including|such as) ([A-Z][a-zA-Z\\s&,]+?)(?:,|\\.|and|with|$)",
      "(?i)participation from ([A-Z][a-zA-Z\\s&]+?)(?:,|\\.|and|with|$)")
    val captured = patterns
      .map(p => regexp_extract_all(d, lit(p), lit(1)))
      .reduce(concat(_, _))
    val stop = array(
      Seq("the", "this", "that", "round", "funding", "company",
        "all existing", "new strategic").map(lit): _*)
    val cleaned = filter(
      array_distinct(transform(captured, m => regexp_replace(trim(m), "[,.\\s]+$", ""))),
      n => length(n) > 2 && length(n) < 50 && !array_contains(stop, lower(n)))
    when(size(found) > 0, found).otherwise(cleaned)
  }

  /** C6 — valuation extraction (`structured_extraction_v2.py:2233-2252`):
    * `$X billion|million valuation`, `valued at $X b|m`,
    * `valuation of $X b|m`, first match wins, integer USD.
    */
  def extractValuation(desc: Column): Column = {
    val d = coalesce(desc, lit(""))
    def grp(p: String, i: Int): Column = regexp_extract(d, p, i)
    val vaP = "(?i)valued at \\$([\\d.]+)\\s*(billion|million)"
    val voP = "(?i)valuation of \\$([\\d.]+)\\s*(billion|million)"
    val b1 = grp("(?i)\\$([\\d.]+)\\s*billion\\s*valuation", 1)
    val m1 = grp("(?i)\\$([\\d.]+)\\s*million\\s*valuation", 1)
    def toUsd(amt: Column, isBillion: Column): Column =
      when(isBillion, amt.cast("double") * 1e9)
        .otherwise(amt.cast("double") * 1e6)
        .cast("long")
    when(b1 =!= "", (b1.cast("double") * 1e9).cast("long"))
      .when(m1 =!= "", (m1.cast("double") * 1e6).cast("long"))
      .when(grp(vaP, 1) =!= "", toUsd(grp(vaP, 1), lower(grp(vaP, 2)) === "billion"))
      .when(grp(voP, 1) =!= "", toUsd(grp(voP, 1), lower(grp(voP, 2)) === "billion"))
      .otherwise(lit(null).cast("long"))
  }
}
