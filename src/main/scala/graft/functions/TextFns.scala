package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text scalar-function library (SURVEY §2.7: C1, C9, C10, C11, F12;
  * plus the training-data text-analysis ops: language ID, quality
  * scoring, token counting, fingerprinting).
  *
  * Everything here is a pure `Column => Column` composition of Spark
  * built-ins — fully codegen'd, no UDFs — so Catalyst can fold, push
  * and pipeline them, and each has an exact ANSI-SQL mirror for the
  * DuckDB oracle.
  */
object TextFns {

  /** Whitespace tokens of trimmed text; empty array for blank text. */
  def tokens(c: Column): Column =
    when(length(trim(c)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(c), "\\s+"))

  /** C10 — word count (`len(content.split())`,
    * reference `/root/reference/src/news_extractor.py:191`).
    */
  def wordCount(c: Column): Column = size(tokens(c)).cast("long")

  /** Reading time in minutes at 200 wpm (news_extractor.py:192). */
  def readingTime(c: Column): Column =
    greatest(lit(1L), ceil(wordCount(c) / lit(200.0)).cast("long"))

  /** C1 — fixed-size chunker: `text[i:i+size]` slices, stride = size,
    * no overlap (reference `/root/reference/src/services/chunker.py:17-22`).
    * Returns `array<string>`; pair with `posexplode` for
    * `(chunk_index, chunk)`.
    */
  def chunks(c: Column, size: Int): Column = {
    val n = ceil(length(c) / lit(size.toDouble)).cast("int")
    when(length(c).isNull || length(c) === 0, array().cast("array<string>"))
      .otherwise(
        transform(sequence(lit(0), n - 1), i => c.substr(i * size + 1, lit(size))))
  }

  /** C9 — URL/title slug: lowercase, non-alphanumeric runs → `_`,
    * truncated (reference `structured_extraction_v2.py:3317-3319`).
    */
  def slug(c: Column, maxLen: Int = 50): Column =
    substring(regexp_replace(lower(c), "[^a-z0-9]+", "_"), 1, maxLen)

  /** C9 — deterministic content ids. */
  def contentHash(c: Column): Column = sha2(c, 256)
  def chunkId(c: Column): Column = md5(c)

  /** Document fingerprint: md5 of whitespace-normalized lowercase
    * text; `fingerprint64` is its leading 16 hex chars (64 bits).
    */
  def fingerprint(c: Column): Column =
    md5(lower(regexp_replace(trim(c), "\\s+", " ")))
  def fingerprint64(c: Column): Column = substring(fingerprint(c), 1, 16)

  /** C11 — case-insensitive contains. */
  def icontains(c: Column, kw: String): Column = lower(c).contains(kw.toLowerCase)

  /** F12 — snippet truncation `text[:n] + "..."`. */
  def snippet(c: Column, n: Int): Column =
    when(length(c) > n, concat(substring(c, 1, n), lit("...")))
      .otherwise(c)

  /** Unicode-light text normalization for dedup keys: lowercase,
    * collapse whitespace, strip zero-width chars.
    */
  def normalizeText(c: Column): Column =
    regexp_replace(
      lower(regexp_replace(trim(c), "[\\u200B\\u200C\\u200D\\uFEFF]", "")),
      "\\s+",
      " ")

  /** Homoglyph confusable folding (Unicode TS #39's confusable-
    * skeleton idea, restricted to the high-traffic Cyrillic/Greek
    * lookalikes of Latin letters): a dup evading exact-hash dedup by
    * swapping а for a (Cyrillic U+0430 vs Latin) re-collides after
    * folding. The FROM/TO alphabets are single public constants so
    * the engine `translate` and the oracle's interpolate the SAME
    * mapping — both engines' translate is per-codepoint, and every
    * mapped char is BMP. ASCII text is a fixed point (fold(clean) ==
    * clean), which t_homoglyph pins as evidence.
    */
  val HomoglyphFrom = "аеорсхуіѕАВЕКМНОРСТХοανρυκΑΒΕΖΗΙΚΜΝΟΡΤΧ"
  val HomoglyphTo = "aeopcxyisABEKMHOPCTXoavpukABEZHIKMNOPTX"

  def foldHomoglyphs(c: Column): Column =
    translate(c, HomoglyphFrom, HomoglyphTo)

  /** BPE-ish token count: word / number / punctuation-run tokens with
    * leading-space folding, the shape of a GPT-style pre-tokenizer
    * (lookahead-free so the same pattern runs on Java regex and RE2).
    */
  val bpeTokenPattern = " ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+| +"

  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit(bpeTokenPattern), lit(0))).cast("long")

  /** Count of occurrences of an exact token. */
  def tokenCount(c: Column, token: String): Column =
    size(filter(tokens(c), t => t === lit(token))).cast("long")

  /** Ratio of punctuation characters to total length; null for empty
    * text (a pretraining quality signal: boilerplate/code/nav text has
    * extreme punctuation density).
    */
  def punctRatio(c: Column): Column =
    when(length(c) === 0, lit(null).cast("double"))
      .otherwise(
        length(regexp_replace(c, "[a-zA-Z0-9\\s]", "")).cast("double") /
          length(c).cast("double"))

  /** Remove stopword tokens, preserving original token order
    * (training-data preprocessing).
    */
  def removeStopwords(c: Column, stopwords: Seq[String]): Column = {
    val stops = array(stopwords.map(lit): _*)
    concat_ws(" ", filter(tokens(c), t => !array_contains(stops, t)))
  }

  /** Ratio of tokens that are in `stopwords`; null for empty text. */
  def stopwordRatio(c: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(c)
    val stops = array(stopwords.map(lit): _*)
    when(size(toks) === 0, lit(null).cast("double"))
      .otherwise(
        size(filter(toks, t => array_contains(stops, t))).cast("double") /
          size(toks).cast("double"))
  }

  /** Word n-gram shingles (distinct), for Jaccard / MinHash dedup.
    * Empty array when the document has fewer than `n` tokens.
    */
  def shingles(c: Column, n: Int): Column = {
    val toks = tokens(c)
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(
        array_distinct(
          transform(
            sequence(lit(0), size(toks) - n),
            i =>
              concat_ws(
                " ",
                (0 until n).map(k => element_at(toks, i + k + 1)): _*))))
  }

  /** PII patterns for pretraining-corpus redaction. RE2-compatible
    * (no backrefs, no lazy quantifiers) so the DuckDB oracle applies
    * the IDENTICAL regex — and a real Spark cluster gets plain
    * java.util.regex, codegen'd inside the scan projection. Order
    * matters: SSN before phone (both are digit runs, SSN's 3-2-4
    * grouping must win), email before phone (digits inside an address
    * must not be re-matched once the email is already a placeholder).
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val SsnRe = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"
  // optional +1 / 1- country-code prefix is consumed so a
  // country-coded number redacts whole ('1-555-123-4567' must not
  // leak its leading '1-'); still RE2-safe — no lookbehind. Left
  // boundaries are explicit per alternative ('\b' can't sit before
  // '+' or '('): a bare '1' country code and a bare area code must
  // start at a word boundary, so the match can never begin mid
  // digit-run ('+41-555-123-4567' redacts '555-123-4567' instead of
  // matching '1-555-…' and leaking the '+4')
  val PhoneRe =
    "(?:\\+1[ .-]|\\b1[ .-])?(?:\\([0-9]{3}\\)|\\b[0-9]{3})[ .-][0-9]{3}[ .-][0-9]{4}\\b"
  val Ipv4Re = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** Redact emails / SSNs / phone numbers / IPv4 addresses to typed
    * placeholders — the standard PII scrub before a corpus ships to
    * training. Pure nested regexp_replace: one codegen'd projection
    * pass per row, no UDF, no shuffle.
    */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(c, EmailRe, "[EMAIL]"),
          SsnRe, "[SSN]"),
        PhoneRe, "[PHONE]"),
      Ipv4Re, "[IP]")

  /** Count of matches per PII class (audit metric for the scrub). */
  def piiCounts(c: Column): Column =
    struct(
      regexp_count(c, lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(c, lit(SsnRe)).cast("long").as("n_ssns"),
      regexp_count(c, lit(PhoneRe)).cast("long").as("n_phones"),
      regexp_count(c, lit(Ipv4Re)).cast("long").as("n_ips"))
}
