package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** C3 — multi-format date parsing with fallback chain, reference
  * `/root/reference/src/structured_extraction_v2.py:2095-2163` and
  * `scraper_v2.py:2557-2596`: try ISO, then long/short human formats;
  * reject unparseable → null.
  *
  * `to_date(col, fmt)` returns null on mismatch under
  * `spark.sql.legacy.timeParserPolicy=CORRECTED` semantics only when
  * wrapped — we use `try_to_date`-style safe parsing via
  * `to_date(when(rlike))` guards so a non-matching string never
  * throws.
  */
object DateFns {

  private def tryFmt(c: Column, pattern: String, guard: String): Column =
    when(c.rlike(guard), to_date(c, pattern)).otherwise(lit(null).cast("date"))

  /** Coalesce-parse over the reference's observed formats:
    * `2022-11-18`, `November 18, 2022`, `November 2022`, `2022-11`,
    * `11/18/2022`.
    */
  def parseDateMulti(c: Column): Column = {
    val t = trim(c)
    coalesce(
      tryFmt(t, "yyyy-MM-dd", "^\\d{4}-\\d{2}-\\d{2}$"),
      tryFmt(t, "MMMM d, yyyy", "^[A-Za-z]+ \\d{1,2}, \\d{4}$"),
      tryFmt(t, "MMMM yyyy", "^[A-Za-z]+ \\d{4}$"),
      tryFmt(t, "yyyy-MM", "^\\d{4}-\\d{2}$"),
      tryFmt(t, "M/d/yyyy", "^\\d{1,2}/\\d{1,2}/\\d{4}$")
    )
  }

  /** Reference rejects future dates (placeholder guard); today is not
    * a future date and passes through.
    */
  def rejectFuture(d: Column): Column =
    when(d <= current_date(), d).otherwise(lit(null).cast("date"))
}
