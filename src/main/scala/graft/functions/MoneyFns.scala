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
}
