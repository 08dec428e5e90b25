package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Text-analysis operators for the training-data pipeline: language
  * ID (marker-word heuristic), quality scoring, token counting,
  * fingerprinting, plus the reference's risk-keyword scan
  * (F5, `/root/reference/src/risk_detection.py:21-82`).
  */
object TextAnalysis {

  /** Marker-word language scores: for each (lang, markers) pair count
    * exact-token hits; predicted = argmax with lexicographic-lang
    * tie-break. Pure column expr — no UDF, exactly mirrorable in SQL.
    */
  def langId(text: Column, markers: Seq[(String, Seq[String])]): Column =
    langIdFromTokens(TextFns.tokens(text), markers)

  /** [[langId]] over an ALREADY-TOKENIZED array — the entry point for
    * callers that materialized the token array once and classify
    * slices of it ([[mixedLanguage]]), skipping the join-then-
    * re-split round trip.
    */
  def langIdFromTokens(toks: Column, markers: Seq[(String, Seq[String])]): Column = {
    // argmax by (hits, -langRank): greatest() on structs compares
    // field-by-field, so ties on hits resolve to the lexicographically
    // FIRST language (negated rank).
    val ranked = markers.map(_._1).sorted.zipWithIndex.toMap
    val scored = markers.map { case (lang, words) =>
      val stops = array(words.map(lit): _*)
      struct(
        size(filter(toks, t => array_contains(stops, t))).as("hits"),
        lit(-ranked(lang)).as("rank"),
        lit(lang).as("lang"))
    }
    // greatest() rejects a single argument — one language wins outright
    (if (scored.size == 1) scored.head else greatest(scored: _*)).getField("lang")
  }

  /** The winning language's marker-hit count — [[langId]]'s
    * confidence proxy (the argmax's score IS the max over languages,
    * so this is one greatest() over the same per-lang hit exprs).
    * Feeds the calibration table: bucket by hits, read accuracy per
    * bucket, and you know which confidence floor to gate on.
    */
  def langIdMaxHits(text: Column, markers: Seq[(String, Seq[String])]): Column = {
    val toks = TextFns.tokens(text)
    val scored = markers.map { case (_, words) =>
      val stops = array(words.map(lit): _*)
      size(filter(toks, t => array_contains(stops, t))).cast("long")
    }
    if (scored.size == 1) scored.head else greatest(scored: _*)
  }

  /** DuckDB mirror of [[langIdMaxHits]] over token-array expr `tk`. */
  def langIdMaxHitsSql(markers: Seq[(String, Seq[String])], tk: String): String = {
    val hs = markers.sortBy(_._1).map { case (_, words) =>
      s"len(list_filter($tk, t -> list_contains(${sqlList(words)}, t)))"
    }
    if (hs.size == 1) hs.head else s"greatest(${hs.mkString(", ")})"
  }

  /** qualityScore's tunables, shared with the DuckDB SQL mirror below
    * so the engine and every oracle that inlines the formula cannot
    * desynchronize.
    */
  val QualityLenDenom = 500.0
  val QualityStopMult = 5.0
  val QualityTokLenLo = 3
  val QualityTokLenHi = 10
  val QualityWeights: (Double, Double, Double) = (0.4, 0.3, 0.3)

  /** Quality score in [0,1]: harmonic blend of length, punctuation
    * sanity and stopword presence — the heuristics a pretraining
    * quality filter uses (length/punct/stopword ratios).
    * Deterministic; round(…, 6) when oracle-compared.
    */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val (wLen, wStop, wTok) = QualityWeights
    val nChars = length(text).cast("double")
    val nToks = size(TextFns.tokens(text)).cast("double")
    val lenScore = least(nChars / lit(QualityLenDenom), lit(1.0))
    val stopRatio = coalesce(TextFns.stopwordRatio(text, stopwords), lit(0.0))
    val stopScore = least(stopRatio * QualityStopMult, lit(1.0))
    val avgTokLen = when(nToks === 0, lit(0.0)).otherwise(nChars / nToks)
    val tokLenScore =
      when(avgTokLen >= QualityTokLenLo && avgTokLen <= QualityTokLenHi, lit(1.0))
        .otherwise(lit(0.5))
    // raw double, no rounding: both engines evaluate the identical
    // op sequence, so results are bit-exact without it
    lenScore * wLen + stopScore * wStop + tokLenScore * wTok
  }

  /** DuckDB literal list for a token set: `['the','a','of']`. */
  private def sqlList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("[", ",", "]")

  /** DuckDB mirror of [[langId]] over a token-array expression `tk`:
    * argmax by (hits, lexicographically-first tie-break), generated
    * from the SAME marker table the engine uses — a marker edit
    * re-derives both sides. The CASE chain in lex-lang order picks the
    * first language whose hit count is >= every later language's,
    * which is exactly greatest(struct(hits, -rank)).
    */
  def langIdSql(markers: Seq[(String, Seq[String])], tk: String): String = {
    def hits(words: Seq[String]) =
      s"len(list_filter($tk, t -> list_contains(${sqlList(words)}, t)))"
    val byLang = markers.sortBy(_._1).map { case (lang, words) => (lang, hits(words)) }
    val cases = byLang.zipWithIndex.dropRight(1).map { case ((lang, h), i) =>
      val laterGe = byLang.drop(i + 1).map { case (_, h2) => s"$h >= $h2" }.mkString(" AND ")
      s"WHEN $laterGe THEN '$lang'"
    }
    s"CASE ${cases.mkString(" ")} ELSE '${byLang.last._1}' END"
  }

  /** DuckDB mirror of [[qualityScore]] given nc/nt/ns expressions
    * (char count, token count, stopword count — all DOUBLE), generated
    * from the same weight constants as the engine formula. `nt` is
    * never 0 on the DuckDB side (regexp_split of an empty string
    * yields [''], length 1), so empty text scores 0.15 on both sides.
    */
  def qualitySql(nc: String, nt: String, ns: String): String = {
    val (wLen, wStop, wTok) = QualityWeights
    s"least($nc/$QualityLenDenom, 1.0)*$wLen + least(($ns/$nt)*$QualityStopMult, 1.0)*$wStop + " +
      s"(CASE WHEN $nc/$nt >= $QualityTokLenLo AND $nc/$nt <= $QualityTokLenHi THEN 1.0 ELSE 0.5 END)*$wTok"
  }

  /** DuckDB stopword-count expression over a token array `tk` for the
    * given stopword list (pairs with [[qualitySql]]'s `ns`).
    */
  def stopHitsSql(stopwords: Seq[String], tk: String): String =
    s"CAST(len(list_filter($tk, t -> list_contains(${sqlList(stopwords)}, t))) AS DOUBLE)"

  /** F5 — risk keyword scan: per category take the FIRST matching
    * keyword (reference short-circuits, `risk_detection.py:64-80`),
    * emit array<struct(risk_type, keyword, severity)>; explode at the
    * call site (the reference's explode-after-UDF join, J5).
    */
  def riskSignals(
      text: Column,
      categories: Seq[(String, Seq[String], String)]): Column = {
    val lowered = lower(text)
    val structs = categories.map { case (riskType, keywords, severity) =>
      val firstKw = keywords.foldRight(lit(null).cast("string")) { (kw, rest) =>
        when(lowered.contains(kw), lit(kw)).otherwise(rest)
      }
      struct(lit(riskType).as("risk_type"), firstKw.as("keyword"), lit(severity).as("severity"))
    }
    filter(array(structs: _*), s => s.getField("keyword").isNotNull)
  }

  /** Winnowing fingerprints (rolling-hash document fingerprinting,
    * Schleimer et al. 2003): char k-gram hashes → sliding window of w
    * hashes → the distinct per-window minima are the doc's
    * fingerprints. Near-dup docs share most fingerprints; robust to
    * insertions unlike a whole-doc hash.
    *
    * Computed by the `WinnowFingerprints` expression — one eval per
    * doc (reused digest, O(n) deque sliding min), then a single
    * explode. No per-gram rows ride a shuffle and no WindowExec runs;
    * the hash is the leading 8 hex chars of md5(gram), identical to
    * the relational explode→window-min→distinct formulation that the
    * SQL oracle mirrors. Returns (id, fp) rows.
    */
  def winnowTable(
      df: DataFrame,
      textCol: String,
      idCol: String,
      k: Int,
      w: Int): DataFrame =
    Width
      .spread(df)
      .select(
        col(idCol).as("id"),
        explode(
          graft.expressions.WinnowFingerprints.winnowFps(col(textCol), k, w))
          .as("fp"))

  /** C4/Gopher-style repetition quality signals per doc: the
    * duplicate-n-gram fraction (1 − distinct/total occurrences) and
    * the top-n-gram fraction (most frequent n-gram's share). Highly
    * repetitive docs (boilerplate, spam, degenerate generations) score
    * high on both. One `NgramStats` eval per doc; docs with fewer than
    * n tokens are dropped. Returns (id, n_ngrams, dup_frac, top_frac).
    */
  def repetitionStats(df: DataFrame, textCol: String, idCol: String, n: Int): DataFrame =
    Width.spread(df)
      .select(
        col(idCol).as("id"),
        graft.expressions.NgramStats.stats(col(textCol), n).as("st"))
      .filter(col("st").isNotNull)
      .select(
        col("id"),
        col("st.total").as("n_ngrams"),
        (lit(1.0) - col("st.distinct").cast("double") / col("st.total").cast("double"))
          .as("dup_frac"),
        (col("st.top").cast("double") / col("st.total").cast("double")).as("top_frac"))

  /** Corpus composition report per (source, lang): doc/token counts,
    * each group's share of corpus tokens, and quality-distribution
    * summaries — the audit table a corpus build publishes alongside
    * the data (C4/RefinedWeb-style composition tables).
    *
    * Determinism across engines: only exact aggregates ride the
    * group-by — counts, long token sums, and min/max of per-row
    * doubles (order-independent); ratios divide exact sums cast to
    * double at the edge. A sum or mean OVER per-row doubles would be
    * partition-order-dependent and is deliberately absent (the repo's
    * oracle determinism rule). The group table (bounded by
    * |sources|×|langs|) is persisted so the corpus-total re-aggregate
    * and the final projection share ONE corpus scan — without it the
    * self-crossJoin would run the wordCount/quality pass twice
    * (clearCache contract, as the Dedup kernels).
    */
  def corpusStats(df: DataFrame, textCol: String, stopwords: Seq[String]): DataFrame = {
    val base = Width.spread(df)
      .select(
        col("source"),
        col("lang"),
        TextFns.wordCount(col(textCol)).as("__toks"),
        qualityScore(col(textCol), stopwords).as("__q"))
    val grouped = base
      .groupBy(col("source"), col("lang"))
      .agg(
        count(lit(1)).as("docs"),
        sum(col("__toks")).as("tokens"),
        sum(when(col("__q") >= 0.5, 1L).otherwise(0L)).as("__hi_q"),
        min(col("__q")).as("min_quality"),
        max(col("__q")).as("max_quality"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    grouped
      .crossJoin(broadcast(grouped.agg(sum(col("tokens")).cast("double").as("__tot"))))
      .select(
        col("source"),
        col("lang"),
        col("docs"),
        col("tokens"),
        (col("tokens").cast("double") / col("__tot")).as("token_share"),
        (col("__hi_q").cast("double") / col("docs").cast("double")).as("hi_quality_frac"),
        col("min_quality"),
        col("max_quality"))
  }

  /** Tokenizer fertility per source: BPE-ish tokens emitted per
    * whitespace word — the budgeting number that converts a corpus
    * word count into a training token count (and flags sources whose
    * text shape inflates tokenization: code, tables, non-Latin).
    * `fertility` is the ratio of exact per-source sums; min/max are
    * over per-doc ratios (docs with zero words excluded). One
    * group-by, all-exact aggregates.
    */
  def fertility(df: DataFrame, textCol: String): DataFrame = {
    val perDoc = when(
      col("__ws") > 0,
      col("__bpe").cast("double") / col("__ws").cast("double"))
    Width.spread(df)
      .select(
        col("source"),
        TextFns.wordCount(col(textCol)).as("__ws"),
        TextFns.bpeTokenCount(col(textCol)).as("__bpe"))
      .groupBy(col("source"))
      .agg(
        sum(col("__ws")).as("ws_tokens"),
        sum(col("__bpe")).as("bpe_tokens"),
        min(perDoc).as("min_fertility"),
        max(perDoc).as("max_fertility"))
      .select(
        col("source"),
        col("ws_tokens"),
        col("bpe_tokens"),
        when(
          col("ws_tokens") > 0,
          col("bpe_tokens").cast("double") / col("ws_tokens").cast("double"))
          .as("fertility"),
        col("min_fertility"),
        col("max_fertility"))
  }

  /** Token-window chunking with stride — context-window training-example
    * prep (the token-granularity upgrade of C1's char chunker,
    * reference `/root/reference/src/services/chunker.py:17-22`): slide
    * a `window`-token frame over the whitespace token stream advancing
    * `stride` tokens (stride < window ⇒ overlap, the usual LM-pretrain
    * shape, e.g. 64/32). Every doc emits ceil(max(nTok−window,0)/stride)+1
    * windows, so short docs still yield one (possibly short) example and
    * the final window truncates at the doc end rather than padding.
    *
    * Scale shape: pure per-row `transform(sequence)` + `posexplode` —
    * no shuffle, no UDF, stays inside whole-stage codegen; output rows
    * ≈ nTok/stride per doc, linear in corpus tokens. Returns
    * (id, win_index, start_token, chunk, chunk_tokens).
    */
  def tokenWindows(
      df: DataFrame,
      textCol: String,
      idCol: String,
      window: Int,
      stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    val nwin =
      ceil(greatest(col("__tlen") - window, lit(0)) / lit(stride.toDouble)).cast("long") + 1L
    Width.spread(df)
      .filter(length(trim(col(textCol))) > 0)
      .select(col(idCol).as("id"), TextFns.tokens(col(textCol)).as("__toks"))
      .withColumn("__tlen", size(col("__toks")).cast("long"))
      .select(
        col("id"),
        col("__tlen"),
        posexplode(transform(sequence(lit(0L), nwin - 1L), w =>
          struct(
            (w * stride).as("start_token"),
            array_join(slice(col("__toks"), (w * stride + 1L).cast("int"), lit(window)), " ")
              .as("chunk")))))
      .select(
        col("id"),
        col("pos").cast("long").as("win_index"),
        col("col.start_token"),
        col("col.chunk"),
        least(lit(window.toLong), col("__tlen") - col("col.start_token")).as("chunk_tokens"))
  }

  /** CCNet-style unigram LM perplexity scoring (Wenzek et al. 2020
    * shard a crawled corpus by LM perplexity; the reference's quality
    * gates are keyword heuristics, this is the statistical upgrade a
    * pretraining pipeline runs). The LM here is the corpus's own
    * add-one-smoothed unigram model, so the score reads "how typical
    * of the corpus is this doc" — low = head, high = tail/gibberish.
    *
    * Determinism contract (DuckDB hash-matched): each vocab entry's
    * log-probability is computed ONCE, scaled to micro-nats and
    * rounded to a BIGINT; per-doc accumulation is then an exact
    * integer sum, immune to float summation order across partitions
    * (JVM Math.log and libm ln differ in the last ulp — one rounding
    * point, same rule as t_tfidf's round-6). The final mean divides
    * two exact integers (one IEEE op) and ppl rounds exp() at 4dp.
    *
    * Scale shape: two streaming passes over the token stream (count
    * the vocab, score the docs), each a map-side-combined hash agg,
    * plus one shuffle equi-join token→vocab (the vocab is unbounded so
    * it is NOT force-broadcast; AQE may still choose to). The VOCAB
    * agg — the term dictionary, orders of magnitude smaller than the
    * token stream — is persisted so the scalar-totals agg and the
    * scoring join read one materialization instead of re-exploding the
    * corpus a third time; callers running many queries clear it via
    * `spark.catalog.clearCache()` (the Dedup kernel-pass contract).
    * Returns (id, n_tokens, nll_sum6, mean_nll, ppl).
    */
  def perplexity(df: DataFrame, textCol: String, idCol: String): DataFrame =
    scoreUnigramLm(df, textCol, idCol, fitUnigramLm(df, textCol))

  /** Fit the add-one-smoothed unigram LM of `df`: the term log-prob
    * table (term, lp6 micro-nats) plus the OOV fallback lp6 an unseen
    * term scores (count 0 → ln(1/(T+V))). The vocab agg — the term
    * dictionary — is persisted (clearCache contract); the scalar
    * totals are a 1-row constant-bootstrap collect, which also bakes
    * the denominator into the lp expression as a literal instead of a
    * third corpus pass re-deriving the vocab for a crossJoin.
    */
  def fitUnigramLm(df: DataFrame, textCol: String): (DataFrame, Long) = {
    val toks = df
      .filter(length(trim(col(textCol))) > 0)
      .select(explode(TextFns.tokens(col(textCol))).as("term"))
    val vocab = toks.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tot = vocab.agg(sum(col("cnt")).as("t"), count(lit(1)).as("v")).head()
    // empty fit corpus: every score-side term is OOV at lp 0 — the
    // degenerate-but-defined answer, not an NPE on the null sum
    val denom = if (tot.isNullAt(0)) 1.0 else tot.getLong(0).toDouble + tot.getLong(1).toDouble
    val lp = vocab.select(
      col("term"),
      round(log((col("cnt").cast("double") + lit(1.0)) / lit(denom)) * lit(1e6), 0)
        .cast("long").as("lp6"))
    val oov6 = BigDecimal(math.log(1.0 / denom) * 1e6)
      .setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).toLong
    (lp, oov6)
  }

  /** Score `df` under a fitted unigram LM — possibly fit on a
    * DIFFERENT corpus (the train-offline / score-online seam): per-doc
    * exact micro-nat NLL sums with the OOV fallback for unseen terms.
    * Stateless until the per-doc agg, so the same plan scores a batch
    * frame or a structured stream (complete/update mode). The LM join
    * is left unhinted: Catalyst broadcasts a small vocab and shuffles
    * a web-scale one.
    * Returns (id, n_tokens, nll_sum6, mean_nll, ppl).
    */
  def scoreUnigramLm(
      df: DataFrame,
      textCol: String,
      idCol: String,
      lm: (DataFrame, Long)): DataFrame = {
    val (lp, oov6) = lm
    val mean = col("nll_sum6").cast("double") / (col("n_tokens").cast("double") * lit(1e6))
    df.filter(length(trim(col(textCol))) > 0)
      .select(col(idCol).as("id"), explode(TextFns.tokens(col(textCol))).as("term"))
      .join(lp, Seq("term"), "left")
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        (-sum(coalesce(col("lp6"), lit(oov6)))).as("nll_sum6"))
      .select(
        col("id"),
        col("n_tokens"),
        col("nll_sum6"),
        round(mean, 6).as("mean_nll"),
        round(exp(mean), 4).as("ppl"))
  }

  /** Interpolation weights of the bigram LM: p(w|v) =
    * BigramWeight·p_MLE(w|v) + UnigramWeight·p_add1(w). Two literals
    * (not λ and 1−λ) so both engines parse the identical doubles.
    */
  val BigramWeight = 0.7
  val UnigramWeight = 0.3

  /** The (id, pos, prev, term) adjacent-token-pair stream of a corpus:
    * pos 0 rows carry a null `prev`. Built per-row with
    * `transform(sequence)` + posexplode — no self-join on position,
    * no window; the pair stream is assembled inside codegen before it
    * ever shuffles.
    */
  def bigramPairs(df: DataFrame, textCol: String, idCol: String): DataFrame =
    Width.spread(df)
      .filter(length(trim(col(textCol))) > 0)
      .select(col(idCol).as("id"), TextFns.tokens(col(textCol)).as("__tk"))
      .select(
        col("id"),
        posexplode(transform(sequence(lit(1), size(col("__tk"))), i =>
          struct(
            element_at(col("__tk"), i).as("term"),
            when(i === 1, lit(null).cast("string"))
              .otherwise(element_at(col("__tk"), i - 1)).as("prev")))))
      .select(col("id"), col("pos"), col("col.term"), col("col.prev"))

  /** Positional inverted index: (term, id, positions) — one row per
    * (term, document), positions sorted ascending. The row granularity
    * is deliberate: per-TERM posting arrays would concentrate a
    * boilerplate term's entire corpus footprint in one aggregation
    * buffer, while (term, doc) rows shard naturally and partition/
    * cluster by term on write (so a phrase query's scan prunes to its
    * terms' postings). Token positions are 0-based.
    */
  def invertedIndex(df: DataFrame, textCol: String, idCol: String): DataFrame =
    Width.spread(df)
      .filter(length(trim(col(textCol))) > 0)
      .select(
        col(idCol).as("id"),
        posexplode(graft.functions.TextFns.tokens(col(textCol)))
          .as(Seq("pos", "term")))
      .groupBy(col("term"), col("id"))
      .agg(sort_array(collect_list(col("pos"))).as("positions"))

  /** Exact phrase search against [[invertedIndex]]: documents where
    * `phrase`'s terms occur at consecutive positions, with the match
    * count. Folds left across the phrase — the candidate set after
    * term i is the array of END positions of matches of the prefix —
    * so each step is one equi-join on id against ONE term's postings
    * (scan-pruned by the term predicate) and candidates only shrink.
    * Boilerplate-term postings are per-doc rows, never whole-corpus
    * arrays; a df-cap upstream (rareLineSurvivors-style) is the
    * guard if a phrase term is stopword-frequent.
    */
  def phraseSearch(index: DataFrame, phrase: Seq[String]): DataFrame =
    phraseEnds(index, phrase)
      .select(col("id"), size(col("__ends")).as("n_hits"))
      .filter(col("n_hits") > 0)

  /** Shared phrase fold ending in (id, __ends) — the END positions of
    * every full-phrase match (0-based, the index convention). */
  private def phraseEnds(index: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one term")
    val first = index
      .filter(col("term") === phrase.head)
      .select(col("id"), col("positions").as("__ends"))
    phrase.tail.foldLeft(first) { (acc, term) =>
      acc
        .join(
          index
            .filter(col("term") === term)
            .select(col("id"), col("positions").as("__next")),
          "id")
        .select(
          col("id"),
          array_intersect(
            transform(col("__ends"), p => p + 1),
            col("__next")).as("__ends"))
    }
  }

  /** Match snippets for a phrase query — the retrieval-UX companion
    * of [[phraseSearch]]: per matching doc, the FIRST match position
    * and a `window`-token context around it, cut from the document's
    * own token stream. The phrase fold runs on the index (term-
    * pruned postings only); the text join touches only the matched
    * docs, so the snippet pass is match-bounded, never a corpus
    * scan. Returns (id, first_pos 0-based, snippet).
    */
  def phraseSnippets(
      index: DataFrame,
      docs: DataFrame,
      textCol: String,
      idCol: String,
      phrase: Seq[String],
      window: Int = 3): DataFrame = {
    require(window >= 0, "window must be >= 0")
    val firstPos = phraseEnds(index, phrase)
      .filter(size(col("__ends")) > 0)
      .select(
        col("id"),
        (array_min(col("__ends")) - (phrase.length - 1)).cast("long").as("first_pos"))
    firstPos
      .join(
        docs.select(col(idCol).as("id"), TextFns.tokens(col(textCol)).as("__tk")),
        Seq("id"))
      .select(
        col("id"),
        col("first_pos"),
        array_join(
          slice(
            col("__tk"),
            greatest(lit(1), col("first_pos") + 1 - window).cast("int"),
            lit(phrase.length + 2 * window)),
          " ").as("snippet"))
  }

  /** Dirichlet-smoothed query-likelihood retrieval (Ponte & Croft
    * 1998; Zhai & Lafferty 2001) — the language-modeling scorer next
    * to BM25: rank documents by the probability their unigram LM
    * generates the query, with Dirichlet prior mu shrinking short
    * documents toward the corpus model,
    *
    *   score(q, d) = Σ_{t∈q} ln( (tf_td·|C| + mu·cf_t)
    *                             / ((len_d + mu)·|C|) )
    *
    * The two models disagree exactly where their assumptions differ
    * (BM25's tf saturation vs QL's length-prior), which is why
    * hybrid stacks run both.
    *
    * Exactness (the perplexity micro-nat discipline): numerator and
    * denominator of each term are EXACT integers (mu is an integer
    * knob), one double division + ln per (doc, query term), rounded
    * ONCE to micro-nats, exact BIGINT sum per doc. Valid range: the
    * denominator product (len_d + mu)·|C| must stay exact in a
    * double (≲ 2^53 — corpora to ~4e12 tokens at len+mu ≤ 2k; shard
    * the corpus stats beyond that). Query terms ABSENT from the
    * corpus are skipped (cf = 0 has no Dirichlet mass — the standard
    * reduction); every indexed doc scores, including those matching
    * no query term (smoothing gives them the background score — QL
    * is a total ranking, unlike BM25's match-only output).
    *
    * Scale shape: one token aggregate to (doc, term, tf), doc
    * lengths and |C| as rollups, the scoring grid = doc-lengths ×
    * (≤ |q| broadcast query terms) with a left tf join — never a
    * corpus × vocab product. Returns (id, len, score6) for every
    * non-empty doc.
    */
  def queryLikelihoodDirichlet(
      df: DataFrame,
      textCol: String,
      idCol: String,
      qTerms: Seq[String],
      mu: Long): DataFrame = {
    require(qTerms.nonEmpty, "qTerms must be non-empty")
    require(mu > 0L, "mu must be positive (0 disables smoothing and " +
      "zero-tf terms would take ln(0))")
    val spark = df.sparkSession
    import spark.implicits._
    // (doc, term) table persisted: doc lengths, |C|, query-term cf
    // and the scoring left-join all read ONE tokenize pass
    val tf = df
      .filter(length(trim(col(textCol))) > 0)
      .select(col(idCol).as("id"), explode(TextFns.tokens(col(textCol))).as("term"))
      .groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val lens = tf.groupBy(col("id")).agg(sum(col("tf")).as("len"))
    val ctot = broadcast(tf.agg(sum(col("tf")).cast("long").as("__c")))
    val cf = broadcast(
      tf.join(broadcast(qTerms.distinct.toDF("term")), Seq("term"))
        .groupBy(col("term"))
        .agg(sum(col("tf")).cast("long").as("cf")))
    lens
      .crossJoin(cf)
      .crossJoin(ctot)
      .join(tf, Seq("id", "term"), "left")
      .na.fill(0L, Seq("tf"))
      .withColumn(
        "__t6",
        round(
          log(
            (col("tf") * col("__c") + lit(mu) * col("cf")).cast("double") /
              ((col("len") + lit(mu)).cast("double") * col("__c").cast("double"))) *
            lit(1e6),
          0).cast("long"))
      .groupBy(col("id"))
      .agg(max(col("len")).as("len"), sum(col("__t6")).as("score6"))
  }

  /** BM25 scoring ENTIRELY off a persisted postings index (k1 = 1.2,
    * b = 0.75, the engine's standard constants): tf is the posting's
    * position count, document lengths come from the index's `_doclen`
    * sidecar (the Lucene-norms idea — written at index time precisely
    * so scoring never re-reads the corpus), df/N are rollups of the
    * pruned postings and the doc-length table. The scan prunes to the
    * query terms' buckets, so at 100 TB a 2-term query reads 2/64 of
    * the index files and one doc-count-bounded sidecar — no raw-text
    * scan anywhere in the plan.
    *
    * Universe note: the index only contains non-empty docs, so N and
    * avglen are over the indexed universe (empty docs carry no terms
    * and no length mass) — the oracle mirrors that predicate.
    * Returns (doc_id, bm25) for docs matching ≥1 query term, the
    * corpus-side bm25Scores shape; scores round at 6 like the
    * text-scan path.
    */
  def bm25FromPostings(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      qTerms: Seq[String]): DataFrame = {
    val Io = graft.sources.Io
    val pruned = Io
      .readPostingsLatest(spark, path)
      .filter(col("term_bucket").isin(Io.postingsBuckets(spark, path, qTerms): _*))
      .filter(col("term").isin(qTerms: _*))
    val tf = pruned.select(
      col("id").as("doc_id"),
      col("term"),
      size(col("positions")).cast("long").as("tf"))
    val dl = Io.readPostingsDocLengths(spark, path)
      .select(col("id").as("doc_id"), col("dl"))
    val stats = broadcast(
      dl.agg(
        (sum(col("dl")).cast("double") / count(lit(1))).as("avglen"),
        count(lit(1)).as("n")))
    val dfx = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = log(
      (col("n").cast("double") - col("df").cast("double") + 0.5) /
        (col("df").cast("double") + 0.5) + 1.0)
    // literals 2.2/1.2/0.75, never k1+1 computed at runtime — the
    // mmrRerank lambda rule: a derived constant is not the same
    // double as the literal the oracle carries
    val num = col("tf").cast("double") * lit(2.2)
    val den = col("tf").cast("double") +
      lit(1.2) * (lit(1.0) - lit(0.75) + lit(0.75) * (col("dl").cast("double") / col("avglen")))
    tf.join(dfx, Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(stats)
      .withColumn("contrib", idf * num / den)
      .groupBy(col("doc_id"))
      .agg(round(sum(col("contrib")), 6).as("bm25"))
  }

  /** Collocation mining: the corpus's top-k word bigrams by pointwise
    * mutual information, PMI(a,b) = ln(p(a,b) / (p(a)·p(b))) — the
    * classic phrase detector (Church & Hanks 1990; the word2vec-phrases
    * preprocessing step). High-PMI pairs are multiword units a
    * tokenizer or dedup shingler may want to treat atomically.
    *
    * Determinism: PMI rounds to micro-nat BIGINTs (the entropy-family
    * discipline) and the top-k orders by (pmi6 DESC, term_a, term_b) —
    * an all-integer/string sort. `minCount` suppresses the
    * low-support pairs whose PMI is pure noise (and keeps the ranked
    * table small).
    *
    * Scale shape: the token stream collapses once into bigram counts
    * (map-side-combined hash agg); unigram margins and the two grand
    * totals are rollups/1-row bootstraps off count tables; the probe
    * joins are vocab-bounded; the top-k is TakeOrderedAndProject.
    */
  def collocationPmi(
      df: DataFrame,
      textCol: String,
      minCount: Long,
      k: Int): DataFrame = {
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // PMI never reads a doc id, so bigramPairs gets a synthesized
    // constant id and the stream projects to (prev, term) BEFORE the
    // persist — guessing an id from df.columns would otherwise risk
    // carrying a payload column (worst case the full document text)
    // on every exploded token row of the materialized pair stream
    val pairs = bigramPairs(
        df.select(lit(0L).as("__pmi_id"), col(textCol)), textCol, "__pmi_id")
      .select(col("prev"), col("term"))
      .persist(mem)
    val uni = pairs.groupBy(col("term")).agg(count(lit(1)).as("c")).persist(mem)
    val totU = uni.agg(sum(col("c"))).head()
    val nUni = if (totU.isNullAt(0)) 1.0 else totU.getLong(0).toDouble
    val bi = pairs
      .filter(col("prev").isNotNull)
      .groupBy(col("prev").as("term_a"), col("term").as("term_b"))
      .agg(count(lit(1)).as("n_pair"))
      .persist(mem)
    val totB = bi.agg(sum(col("n_pair"))).head()
    val nBi = if (totB.isNullAt(0)) 1.0 else totB.getLong(0).toDouble
    val pAb = col("n_pair").cast("double") / lit(nBi)
    val pA = col("ca").cast("double") / lit(nUni)
    val pB = col("cb").cast("double") / lit(nUni)
    bi.filter(col("n_pair") >= minCount)
      .join(uni.select(col("term").as("term_a"), col("c").as("ca")), "term_a")
      .join(uni.select(col("term").as("term_b"), col("c").as("cb")), "term_b")
      .select(
        col("term_a"),
        col("term_b"),
        col("n_pair"),
        round(log(pAb / (pA * pB)) * lit(1e6), 0).cast("long").as("pmi6"))
      .withColumn("pmi", col("pmi6").cast("double") / lit(1e6))
      .orderBy(col("pmi6").desc, col("term_a"), col("term_b"))
      .limit(k)
  }

  /** Interpolated-bigram upgrade of [[perplexity]] (the KenLM-shaped
    * gate CCNet actually ships: context-conditioned, not bag-of-words):
    * every doc scored under the corpus's own interpolated bigram LM.
    * First tokens score under the add-one unigram; later tokens under
    * BigramWeight·c(v,w)/c(v,·) + UnigramWeight·p_add1(w). Gibberish
    * with plausible WORDS but implausible SEQUENCES — the case a
    * unigram gate cannot see — scores tail here.
    */
  def perplexityBigram(df: DataFrame, textCol: String, idCol: String): DataFrame =
    scoreBigramLm(df, textCol, idCol, fitBigramLm(df, textCol))

  /** Fit the interpolated bigram LM of `df`. Returns (biLp — (prev,
    * term, lp6) for every SEEN bigram; uniLp — (term, lp6 unigram,
    * lpbo6 backoff = UnigramWeight·p_add1); oov6 — unseen first
    * token; oovbo6 — unseen later token). Same determinism contract
    * as [[fitUnigramLm]]: each log-prob is computed once per TYPE,
    * scaled to micro-nats and rounded to BIGINT, so scoring is exact
    * integer accumulation. The vocab and bigram-count aggs (term/pair
    * dictionaries, far smaller than the token stream) are persisted
    * (clearCache contract); totals are a 1-row bootstrap collect.
    */
  def fitBigramLm(df: DataFrame, textCol: String)
      : (DataFrame, DataFrame, Long, Long) = {
    val (uni, bi) = bigramCountGrids(df, textCol)
    fitBigramLmFromCounts(uni, bi)
  }

  /** The bigram LM's SUFFICIENT STATISTICS: unigram counts (term,
    * cnt) and bigram counts (prev, term, cab) — LINEAR in documents
    * (each doc's pair stream is independent), so per-batch partial
    * grids SUM-merge exactly and a doc takedown is the NEGATED grid
    * of the removed docs. The mergeable state behind the persisted
    * LM-count artifact family ([[graft.sources.Io.writeLmCounts]]).
    */
  def bigramCountGrids(df: DataFrame, textCol: String): (DataFrame, DataFrame) = {
    // the LM fit never reads a doc id either — same synthesized-id
    // treatment as collocationPmi
    val pairs = bigramPairs(
        df.select(lit(0L).as("__lm_id"), col(textCol)), textCol, "__lm_id")
      .select(col("prev"), col("term"))
    (
      pairs.groupBy(col("term")).agg(count(lit(1)).as("cnt")),
      pairs
        .filter(col("prev").isNotNull)
        .groupBy(col("prev"), col("term"))
        .agg(count(lit(1)).as("cab")))
  }

  /** Derive the scorer-ready (biLp, uniLp, oov6, oovbo6) LM from the
    * (term, cnt) / (prev, term, cab) COUNT GRIDS — the second half of
    * [[fitBigramLm]], split out so a merged count ARTIFACT (live
    * upserts, takedowns as negative deltas, as-of reads) re-derives
    * the model without touching the token stream. Log-probs are
    * computed once per type and micro-rounded exactly as the in-line
    * fit, so a model from merged grids is BIT-IDENTICAL to a model
    * from a from-scratch fit over the same live corpus.
    */
  def fitBigramLmFromCounts(vocabIn: DataFrame, bigIn: DataFrame)
      : (DataFrame, DataFrame, Long, Long) = {
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val vocab = vocabIn.persist(mem)
    val tot = vocab.agg(sum(col("cnt")).as("t"), count(lit(1)).as("v")).head()
    val denom = if (tot.isNullAt(0)) 1.0 else tot.getLong(0).toDouble + tot.getLong(1).toDouble
    val pAdd1 = (col("cnt").cast("double") + lit(1.0)) / lit(denom)
    val uniLp = vocab.select(
      col("term"),
      round(log(pAdd1) * lit(1e6), 0).cast("long").as("lp6"),
      round(log(lit(UnigramWeight) * pAdd1) * lit(1e6), 0).cast("long").as("lpbo6"))
    val big = bigIn.persist(mem)
    val ctx = big.groupBy(col("prev")).agg(sum(col("cab")).as("ca"))
    val biLp = big
      .join(ctx, "prev")
      .join(vocab, "term")
      .select(
        col("prev"),
        col("term"),
        round(
          log(
            lit(BigramWeight) * (col("cab").cast("double") / col("ca").cast("double")) +
              lit(UnigramWeight) * pAdd1) * lit(1e6),
          0).cast("long").as("lp6"))
    def half6(x: Double): Long = BigDecimal(x * 1e6)
      .setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).toLong
    (biLp, uniLp, half6(math.log(1.0 / denom)), half6(math.log(UnigramWeight / denom)))
  }

  /** Score `df` under a fitted bigram LM (possibly fit on a different
    * corpus — the train-offline / score-online seam of
    * [[scoreUnigramLm]]). ONE pass over the pair stream with two
    * dictionary equi-joins — unigram by term (first-token lp + the
    * per-term backoff in the same row), bigram by (prev, term); a
    * pos-0 row's null `prev` simply misses the left join. Routing is a
    * per-row CASE, so the pair stream is never split/unioned or
    * scanned twice. Joins left unhinted — Catalyst broadcasts a small
    * LM, shuffles a web-scale one — then one exact-integer per-doc
    * agg. Returns (id, n_tokens, nll_sum6, mean_nll, ppl).
    */
  def scoreBigramLm(
      df: DataFrame,
      textCol: String,
      idCol: String,
      lm: (DataFrame, DataFrame, Long, Long)): DataFrame = {
    val (biLp, uniLp, oov6, oovbo6) = lm
    val mean = col("nll_sum6").cast("double") / (col("n_tokens").cast("double") * lit(1e6))
    bigramPairs(df, textCol, idCol)
      .join(
        uniLp.select(col("term"), col("lp6").as("__u"), col("lpbo6").as("__bo")),
        Seq("term"),
        "left")
      .join(
        biLp.select(col("prev"), col("term"), col("lp6").as("__b")),
        Seq("prev", "term"),
        "left")
      .select(
        col("id"),
        when(col("pos") === 0, coalesce(col("__u"), lit(oov6)))
          .otherwise(coalesce(col("__b"), col("__bo"), lit(oovbo6)))
          .as("lp6"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"), (-sum(col("lp6"))).as("nll_sum6"))
      .select(
        col("id"),
        col("n_tokens"),
        col("nll_sum6"),
        round(mean, 6).as("mean_nll"),
        round(exp(mean), 4).as("ppl"))
  }

  /** A5 — keyword sentiment: positive/(positive+negative) counts of
    * docs whose text contains any positive vs negative keyword; null
    * when both are 0 (reference `structured_extraction_v2.py:3196-3207`).
    * Returns the per-row ±1/0 contribution columns; aggregate at call
    * site.
    */
  def sentimentFlags(text: Column, positive: Seq[String], negative: Seq[String])
      : (Column, Column) = {
    val l = lower(text)
    val pos = positive.map(k => l.contains(k)).reduce(_ || _)
    val neg = negative.map(k => l.contains(k)).reduce(_ || _)
    (when(pos, 1L).otherwise(0L), when(neg, 1L).otherwise(0L))
  }

  /** Multi-query BM25 (k1 = 1.2, b = 0.75, the repo's single-query
    * constants): scores every (query, doc) pair where the doc matches
    * ≥ 1 of the query's terms. `queries` is an exploded (qid, term)
    * table; corpus term statistics (tf, df, dl, avglen, N) are
    * computed ONCE restricted to the queries' term universe, and the
    * per-query fan-out is a join on `term` — the batch-evaluation
    * shape (N queries cost one stats pass + one join, not N corpus
    * scans). Rounds at 6 like the single-query path. Returns
    * (qid, doc_id, bm25).
    */
  def bm25PerQuery(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      queries: DataFrame): DataFrame = {
    val qt = queries.select(col("qid"), col("term")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // dl feeds the broadcast stats AND the per-doc join; tf feeds the
    // df rollup AND the scoring join — materialize each once or every
    // reference re-runs the corpus tokenize/explode (the dominant
    // cost of the whole scorer: ~4 full tokenizations collapse to 1)
    val dl = Checkpointing.truncate(
      docs.select(col(idCol).as("doc_id"), TextFns.wordCount(col(textCol)).as("dl")),
      None, eager = true)
    val stats = broadcast(
      dl.agg(
        (sum(col("dl")).cast("double") / count(lit(1))).as("avglen"),
        count(lit(1)).as("n")))
    val tf = Checkpointing.truncate(
      docs
        .select(col(idCol).as("doc_id"), explode(TextFns.tokens(col(textCol))).as("term"))
        .join(broadcast(qt.select(col("term")).distinct()), Seq("term"), "left_semi")
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf")),
      None, eager = true)
    val dfx = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = log(
      (col("n").cast("double") - col("df").cast("double") + 0.5) /
        (col("df").cast("double") + 0.5) + 1.0)
    val num = col("tf").cast("double") * lit(2.2)
    val den = col("tf").cast("double") +
      lit(1.2) * (lit(1.0) - lit(0.75) + lit(0.75) * (col("dl").cast("double") / col("avglen")))
    tf.join(dfx, Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(stats)
      .withColumn("contrib", idf * num / den)
      .join(qt, Seq("term"))
      .groupBy(col("qid"), col("doc_id"))
      .agg(round(sum(col("contrib")), 6).as("bm25"))
  }

  /** BPE merge learning (Sennrich, Haddow & Birch 2016, "Neural
    * Machine Translation of Rare Words with Subword Units"), the
    * first `steps` merges: vocabulary = corpus words with counts,
    * each word a space-separated symbol sequence (single characters
    * initially); per step, count adjacent symbol pairs weighted by
    * word count, merge the argmax pair ((cnt desc, a, b) total
    * order), rewrite the vocabulary. Returns one row per learned
    * merge: (step, sym_a, sym_b, cnt).
    *
    * Determinism/oracle posture: pair counts are integer sums; the
    * argmax is totally ordered; the rewrite is plain (non-regex)
    * first-to-last substring replacement of " a b " with " ab " over
    * sentinel-padded sequences — the same left-to-right non-overlap
    * semantics on Spark's `replace` and DuckDB's, so the oracle
    * unrolls the identical steps as CTEs. The per-step argmax is a
    * 1-row driver bootstrap (documented constant class); the
    * vocabulary (distinct words, not the corpus) is the only state
    * between steps and truncates its lineage per step. At 100 TB the
    * vocabulary table is millions of rows against billions of
    * documents — the iteration never touches the corpus again after
    * the first word count.
    *
    * MERGE-COUNT REGIME: each step is one Spark job (a driver loop —
    * the per-step argmax is TakeOrdered(1) over the vocab-bounded
    * pair table), so k merges = k sequential jobs. Intended for
    * k ≲ a few hundred (analysis/audit merges); a production 32k-
    * merge tokenizer trains on a driver-side sampled word table, not
    * through this loop — enforced by a fail-fast ceiling so a 32k ask
    * errors instead of launching 32k jobs.
    */
  def bpeTopMerges(df: DataFrame, textCol: String, steps: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    bpeLearn(df, textCol, steps)._1.toDF("step", "sym_a", "sym_b", "cnt")
  }

  /** Shared BPE learner: returns the merge list AND the final
    * rewritten vocabulary (s = sentinel-padded symbol sequence,
    * c = word count) after `steps` merges. The rewrite only changes
    * SPACING, so the original word is always `replace(trim(s),' ','')`
    * — [[bpeEncodeUnits]] exploits exactly that to map words back
    * without carrying a second column through the iteration.
    */
  private def bpeLearn(
      df: DataFrame,
      textCol: String,
      steps: Int): (Seq[(Long, String, String, Long)], DataFrame) = {
    require(steps >= 1, "steps must be >= 1")
    require(
      steps <= 512,
      s"bpeTopMerges: $steps merges = $steps sequential Spark jobs (one " +
        "argmax job per step) — the driver-loop regime caps at 512; train " +
        "production-size vocabularies on a sampled word table instead")
    def q(sym: String) = sym.replace("'", "''")
    var vocab = df
      .select(explode(TextFns.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w"))
      .agg(count(lit(1)).as("c"))
      // sentinel-padded symbol sequence: " c h a r s "
      .select(
        concat(lit(" "), concat_ws(" ", split(col("w"), "(?!^)")), lit(" ")).as("s"),
        col("c"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var i = 1
    var exhausted = false
    while (i <= steps && !exhausted) {
      val sy = vocab.select(
        col("s"),
        col("c"),
        posexplode(split(trim(col("s")), " ")).as(Seq("pos", "sym")))
      val top = sy
        .select(col("s"), col("c"), col("pos"), col("sym").as("a"))
        .join(
          sy.select(col("s"), (col("pos") - 1).as("pos"), col("sym").as("b")),
          Seq("s", "pos"))
        .groupBy(col("a"), col("b"))
        .agg(sum(col("c")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val a = top.head.getString(0)
        val b = top.head.getString(1)
        merges += ((i.toLong, a, b, top.head.getLong(2)))
        vocab = vocab
          .withColumn(
            "s",
            expr(s"replace(s, ' ${q(a)} ${q(b)} ', ' ${q(a)}${q(b)} ')"))
          .localCheckpoint()
        i += 1
      }
    }
    (merges.toSeq, vocab)
  }

  /** BPE encoding at the VOCABULARY level: learn `steps` merges
    * ([[bpeTopMerges]]), then count each document's subword units by
    * joining its words to the rewritten vocabulary — per word,
    * units = symbols left in its merged sequence. The corpus is never
    * char-split per document: the vocabulary carries the encoding
    * (millions of words at 100 TB vs billions of documents), and the
    * doc side pays one token explode + an equi-join on the word.
    * Tokenizer-evaluation use: n_units/n_words is the fertility of
    * the learned tokenizer at this merge count — the measurable
    * "how much did k merges compress the corpus" curve.
    *
    * Docs with no non-empty tokens are absent (no words to encode).
    * Returns (id, n_words, n_units).
    */
  /** The learned BPE vocabulary as a persistable unit table:
    * (w = word, units = symbols left after `steps` merges) — the
    * tokenizer-cost artifact. Fit ONCE on the reference corpus and
    * land via [[graft.sources.Io.writeBpeVocab]]; every later batch
    * prices its token budget by a dictionary join
    * ([[bpeEncodeWithVocab]]) instead of re-running the learner.
    * Re-fitting is a REBUILD (the frozen-codebook rule of the
    * IVF/PQ family).
    */
  def bpeVocabUnits(df: DataFrame, textCol: String, steps: Int): DataFrame =
    bpeLearn(df, textCol, steps)._2.select(
      regexp_replace(col("s"), " ", "").as("w"),
      size(split(trim(col("s")), " ")).cast("long").as("units"))

  /** Encode a batch against a FROZEN vocab-units table (the
    * [[bpeVocabUnits]] artifact): per doc, word count and total
    * units via one dictionary equi-join. OOV CONTRACT: a word absent
    * from the fit corpus prices at its CHARACTER COUNT — the
    * no-merges-applied conservative upper bound (true BPE would
    * still apply learned merge rules to unseen words; this artifact
    * deliberately trades that for a join-only scoring path, and the
    * bound is what a budget planner wants anyway). Documented,
    * oracle-mirrored. Returns (id, n_words, n_units).
    */
  def bpeEncodeWithVocab(
      df: DataFrame,
      textCol: String,
      idCol: String,
      vocabUnits: DataFrame): DataFrame =
    df.select(col(idCol).as("id"), explode(TextFns.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .join(vocabUnits.select(col("w"), col("units")), Seq("w"), "left")
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_words"),
        sum(coalesce(col("units"), length(col("w")).cast("long"))).as("n_units"))

  def bpeEncodeUnits(
      df: DataFrame,
      textCol: String,
      idCol: String,
      steps: Int): DataFrame = {
    val (_, vocab) = bpeLearn(df, textCol, steps)
    val units = vocab.select(
      regexp_replace(col("s"), " ", "").as("w"),
      size(split(trim(col("s")), " ")).cast("long").as("units"))
    df.select(col(idCol).as("id"), explode(TextFns.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .join(units, Seq("w"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_words"), sum(col("units")).as("n_units"))
  }

  /** Code-switch / mixed-language detector: [[langId]] over the head
    * and tail halves of each document's token stream — a document
    * whose halves classify differently is a concatenation artifact
    * (boilerplate in another language, scraped page merges, template
    * wrap) that a whole-doc classifier averages away; pretraining
    * pipelines route such docs to splitting or the reject pile.
    * Docs with fewer than 2 tokens are excluded (no two non-empty
    * halves exist). Per-row work only — ONE tokenize (materialized at
    * a projection boundary; CollapseProject keeps non-cheap aliases
    * referenced twice), then two marker scans over SLICES of that
    * array via [[langIdFromTokens]] — the old shape re-joined each
    * half to a string and re-split it inside langId, tripling the
    * regex work on what was the suite's hottest text query. Returns
    * (id, lang_head, lang_tail, is_mixed).
    */
  def mixedLanguage(
      df: DataFrame,
      textCol: String,
      idCol: String,
      markers: Seq[(String, Seq[String])]): DataFrame = {
    val toked = df
      .select(col(idCol).as("id"), TextFns.tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) >= 2)
    val n = size(col("__toks"))
    val half = floor(n.cast("double") / 2.0).cast("int")
    toked
      .select(
        col("id"),
        langIdFromTokens(slice(col("__toks"), lit(1), half), markers)
          .as("lang_head"),
        langIdFromTokens(slice(col("__toks"), half + 1, n - half), markers)
          .as("lang_tail"))
      .withColumn("is_mixed", col("lang_head") =!= col("lang_tail"))
  }

  /** RAKE keyword extraction (Rose, Engel, Cramer & Cowley 2010,
    * "Automatic keyword extraction from individual documents") with
    * an INTEGER scoring variant: candidate phrases are the maximal
    * token runs between stopword delimiters; per document each
    * phrase word gets freq(w) (occurrences in candidates) and
    * deg(w) (Σ length of candidates containing it, multiplicity
    * included); canonical RAKE scores Σ deg(w)/freq(w) — a
    * float-summation-order liability — so this variant scores
    * Σdeg / Σfreq: BIGINT sums into ONE division (and the ratio is
    * invariant to how often the same phrase string repeats in a doc,
    * since both sums scale together). Top `topK` phrases per doc by
    * (score desc, phrase).
    *
    * Scale shape: everything is per-document — explode, two
    * group-bounded windows/aggs, no corpus-wide state. The phrase
    * reassembly is a sorted collect over ONE inter-stopword run
    * (bounded by the run length, not the document), the sanctioned
    * bounded-buffer case. The pair stream persists internally so the
    * phrase/word-stat/score passes share one explode — the
    * Dedup-kernel caching contract (session clearCache between
    * queries, as Bench/Verify do).
    *
    * Returns (id, rank, phrase, score), rank 1..topK.
    */
  def rakeKeywords(
      df: DataFrame,
      textCol: String,
      idCol: String,
      stopwords: Seq[String],
      topK: Int): DataFrame = {
    require(topK >= 1, "topK must be >= 1")
    require(stopwords.nonEmpty, "RAKE needs stopword delimiters")
    val tok = Width.spread(df)
      .select(
        col(idCol).as("id"),
        posexplode(TextFns.tokens(col(textCol))).as(Seq("pos", "t")))
    val marked = tok
      .withColumn("st", col("t").isin(stopwords: _*).cast("int"))
      .withColumn(
        "grp",
        sum(col("st")).over(Window.partitionBy(col("id")).orderBy(col("pos"))))
    val pw = marked.filter(col("st") === 0)
      .select(col("id"), col("grp"), col("pos"), col("t"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ph = pw
      .groupBy(col("id"), col("grp"))
      .agg(
        concat_ws(
          " ",
          transform(
            array_sort(collect_list(struct(col("pos"), col("t")))),
            x => x.getField("t"))).as("phrase"),
        count(lit(1)).as("plen"))
    val wstat = pw
      .join(ph, Seq("id", "grp"))
      .groupBy(col("id"), col("t"))
      .agg(count(lit(1)).as("freq"), sum(col("plen")).as("deg"))
    val scored = pw
      .join(ph, Seq("id", "grp"))
      .join(wstat, Seq("id", "t"))
      .groupBy(col("id"), col("phrase"))
      .agg(sum(col("deg")).as("deg_sum"), sum(col("freq")).as("freq_sum"))
      .withColumn(
        "score",
        col("deg_sum").cast("double") / col("freq_sum").cast("double"))
    scored
      .withColumn(
        "rank",
        row_number().over(
          Window.partitionBy(col("id")).orderBy(col("score").desc, col("phrase"))))
      .filter(col("rank") <= topK)
      .select(col("id"), col("rank").cast("long").as("rank"), col("phrase"), col("score"))
  }

  /** Flesch reading-ease in exact integer MILLI-units (Flesch 1948:
    * 206.835 − 1.015·words/sentence − 84.6·syllables/word), with the
    * syllable proxy every implementation without a dictionary uses —
    * vowel-group runs. Both ratios are integer divisions of exact
    * counts, so the score is engine-identical:
    * {{{
    *   flesch3 = 206835 − (1015·n_words·1000) div (n_sents·1000)
    *                    − (84600·n_vg) div (1000·n_words) · 1000 …
    * }}}
    * concretely: 206835 − (1015000·n_words) div (1000·n_sents)
    * − (84600000·n_vg) div (1000·n_words), all BIGINT. Sentences =
    * non-empty [.!?]+ splits (min 1 for any non-empty doc); vowel
    * groups counted by collapsing each [aeiou]+ run of the lowered
    * text to one marker and counting markers (regex-replace parity,
    * no per-word explode). A readability floor is the classic
    * pre-LLM quality gate; the score also flags machine-generated
    * run-on text (words/sentence explodes → score collapses). Docs
    * with zero words are excluded. Returns (id, n_sents, n_words,
    * n_vowel_groups, flesch3).
    */
  def readability(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val lowered = lower(col(textCol))
    val sents = size(filter(split(col(textCol), "[.!?]+"), s => length(trim(s)) > 0))
    val words = TextFns.wordCount(col(textCol))
    // collapse each vowel run of the LOWERED text to one uppercase
    // marker (which cannot pre-exist post-lower), count the markers
    val marked = regexp_replace(lowered, "[aeiou]+", "A")
    val vg = (length(marked) - length(regexp_replace(marked, "[A]", ""))).cast("long")
    df.filter(words > 0)
      .select(
        col(idCol).as("id"),
        greatest(sents.cast("long"), lit(1L)).as("n_sents"),
        words.cast("long").as("n_words"),
        vg.as("n_vowel_groups"))
      .withColumn(
        "flesch3",
        expr(
          "CAST(206835 - (CAST(1015000 AS DECIMAL(38,0)) * n_words) div (1000 * n_sents)" +
            " - (CAST(84600000 AS DECIMAL(38,0)) * n_vowel_groups) div (1000 * n_words) AS BIGINT)"))
  }

  /** Interpolated Kneser–Ney bigram perplexity (Kneser & Ney 1995;
    * Chen & Goodman 1999's interpolated form) — the standard
    * quality-filter LM, distinguished from the count-interpolated
    * [[perplexityBigram]] by scoring a word's CONTEXT DIVERSITY
    * ("Francisco" is frequent but follows only "San"; KN's
    * continuation counts punish it as a unigram where raw frequency
    * would not). Absolute discount D = 3/4, chosen so every seen-
    * bigram probability is ONE exact integer ratio:
    * {{{
    *   pc(w)  = (N1+(·w) + 1) / (B + V)        add-one continuation
    *   λ(v)   = D · N1+(v·) / c(v)
    *   p(w|v) = [ (4·c(vw) − 3)·(B + V) + 3·N1+(v·)·(N1+(·w) + 1) ]
    *            / ( 4·c(v)·(B + V) )
    * }}}
    * Backoff rows decompose as lam6(v) + pc6(w) — two SEPARATELY
    * rounded micro-nat logs, a defined shared semantics (never an
    * approximation of the unrounded product). Routing per pair:
    * pos-0 → pc6 | seen bigram → the exact ratio | seen context →
    * lam6 + pc6 | unseen context → pc6; an unseen term's pc6 is the
    * 1/(B+V) constant. Dictionaries are type-bounded; (B, V) is the
    * documented 1-row bootstrap. Returns the scoreBigramLm shape
    * (id, n_tokens, nll_sum6, mean_nll, ppl).
    */
  def perplexityKn(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val lmPairs = bigramPairs(
        df.select(lit(0L).as("__lm_id"), col(textCol)), textCol, "__lm_id")
      .select(col("prev"), col("term"))
    val big = lmPairs
      .filter(col("prev").isNotNull)
      .groupBy(col("prev"), col("term"))
      .agg(count(lit(1)).as("cab"))
      .persist(mem)
    val ctx = big.groupBy(col("prev"))
      .agg(sum(col("cab")).as("ca"), count(lit(1)).as("nv"))
    val cont = big.groupBy(col("term")).agg(count(lit(1)).as("cw"))
    val vocab = lmPairs.groupBy(col("term")).agg(count(lit(1)).as("cnt")).persist(mem)
    val scal = big.agg(count(lit(1)).as("b"))
      .crossJoin(vocab.agg(count(lit(1)).as("v")))
      .head()
    val bv = (if (scal.isNullAt(0)) 0L else scal.getLong(0)) +
      (if (scal.isNullAt(1)) 0L else scal.getLong(1))
    require(bv > 0L, "perplexityKn: empty corpus")
    val contLp = vocab
      .join(cont, Seq("term"), "left")
      .na.fill(0L, Seq("cw"))
      .select(
        col("term"),
        round(log((col("cw") + 1L).cast("double") / lit(bv.toDouble)) * lit(1e6), 0)
          .cast("long").as("pc6"))
    val ctxLp = ctx.select(
      col("prev"),
      round(log(lit(3.0) * col("nv").cast("double") / (lit(4.0) * col("ca").cast("double"))) * lit(1e6), 0)
        .cast("long").as("lam6"))
    val biLp = big
      .join(ctx, Seq("prev"))
      .join(cont, Seq("term")) // every seen bigram's term IS a continuation
      .select(
        col("prev"),
        col("term"),
        round(
          log(
            ((lit(4L) * col("cab") - 3L) * bv +
              lit(3L) * col("nv") * (col("cw") + 1L)).cast("double") /
              (lit(4L) * col("ca") * bv).cast("double")) * lit(1e6),
          0).cast("long").as("bi6"))
    def half6(x: Double): Long = BigDecimal(x * 1e6)
      .setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).toLong
    val oovCont6 = half6(math.log(1.0 / bv))
    val mean = col("nll_sum6").cast("double") / (col("n_tokens").cast("double") * lit(1e6))
    val lp = when(col("prev").isNull, coalesce(col("pc6"), lit(oovCont6)))
      .when(col("bi6").isNotNull, col("bi6"))
      .when(col("lam6").isNotNull, col("lam6") + coalesce(col("pc6"), lit(oovCont6)))
      .otherwise(coalesce(col("pc6"), lit(oovCont6)))
    bigramPairs(df, textCol, idCol)
      .join(contLp, Seq("term"), "left")
      .join(biLp, Seq("prev", "term"), "left")
      .join(ctxLp, Seq("prev"), "left")
      .select(col("id"), lp.as("__lp"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"), (-sum(col("__lp"))).as("nll_sum6"))
      .select(
        col("id"),
        col("n_tokens"),
        col("nll_sum6"),
        round(mean, 6).as("mean_nll"),
        round(exp(mean), 4).as("ppl"))
  }

  /** Topic-boundary detection per document (TextTiling's lexical-
    * cohesion idea — Hearst 1997 — reduced to its oracle-checkable
    * core): split each doc's token stream into `blocks` equal
    * blocks, score every adjacent pair by exact integer Jaccard of
    * their distinct-term sets, and report the WEAKEST seam — argmin
    * (jac6 asc, earlier seam first) — plus its approximate token
    * position. The actionable companion of [[mixedLanguage]]: that
    * op flags a concatenation artifact, this one says where to cut
    * it. Docs shorter than 2·blocks tokens are excluded (blocks
    * would be degenerate). Work is per-doc bounded: one token
    * explode, (doc, block, term)-distinct aggregates, and a
    * blocks-bounded seam table per doc. Returns (id, seam_block
    * 1-based, seam_pos = first token index of the right block,
    * min_jac6).
    */
  def topicBoundaries(
      df: DataFrame,
      textCol: String,
      idCol: String,
      blocks: Int = 6): DataFrame = {
    require(blocks >= 2, "need at least 2 blocks")
    val toks = TextFns.tokens(col(textCol))
    val base = df
      .filter(size(toks) >= 2 * blocks)
      .select(col(idCol).as("id"), posexplode(toks).as(Seq("pos", "term")))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("id"))))
      .select(
        col("id"),
        col("n"),
        expr(s"CAST(pos * $blocks div n AS BIGINT)").as("blk"),
        col("term"))
    val sets = base.select(col("id"), col("n"), col("blk"), col("term")).distinct()
    val sizes = sets.groupBy(col("id"), col("n"), col("blk")).agg(count(lit(1)).as("sz"))
    val common = sets.select(col("id"), col("blk"), col("term"))
      .join(
        sets.select(col("id"), (col("blk") - 1).as("blk"), col("term")),
        Seq("id", "blk", "term"))
      .groupBy(col("id"), col("blk"))
      .agg(count(lit(1)).as("c"))
    val seams = sizes
      .filter(col("blk") < blocks - 1)
      .select(col("id"), col("n"), col("blk"), col("sz").as("sz_l"))
      .join(
        sizes.select(col("id"), (col("blk") - 1).as("blk"), col("sz").as("sz_r")),
        Seq("id", "blk"))
      .join(common, Seq("id", "blk"), "left")
      .na.fill(0L, Seq("c"))
      .withColumn("jac6", expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * c div (sz_l + sz_r - c) AS BIGINT)"))
    // argmin via primitive hash-aggs + join-back (the SortAggregate
    // discipline): min jac6 per doc, then the earliest tied seam
    val worst = seams.groupBy(col("id")).agg(min(col("jac6")).as("mj"))
    seams
      .join(worst, Seq("id"))
      .filter(col("jac6") === col("mj"))
      .groupBy(col("id"), col("mj"))
      .agg(min(col("blk")).as("blk"), max(col("n")).as("n"))
      .select(
        col("id"),
        (col("blk") + 1).as("seam_block"),
        // first token position of the right block: ceil(n*(blk+1)/blocks)
        expr(s"CAST((n * (blk + 1) + ${blocks - 1}) div $blocks AS BIGINT)").as("seam_pos"),
        col("mj").as("min_jac6"))
  }

  /** Integer DCG rank weights in micro-units: w(r) = round(1e6 /
    * log2(r + 1)) for ranks 1..k. Computed ONCE here and injected
    * verbatim into the DuckDB oracle via [[ndcgWeightSql]], so both
    * engines rank with the same integer constants — no float log in
    * either plan, and the NDCG arithmetic stays exact end to end
    * (the langIdSql shared-constant discipline applied to rank math).
    */
  def ndcgWeights(k: Int): Seq[Long] =
    (1 to k).map(r => math.round(1e6 / (math.log(r + 1.0) / math.log(2.0))))

  /** Oracle-side mirror of [[ndcgWeights]]: a CASE fragment mapping a
    * rank expression to its micro-unit weight (0 beyond k).
    */
  def ndcgWeightSql(k: Int, rankExpr: String): String =
    ndcgWeights(k).zipWithIndex
      .map { case (w, i) => s"WHEN $rankExpr = ${i + 1} THEN $w" }
      .mkString("CASE ", " ", " ELSE 0 END")

  /** NDCG@k retrieval evaluation (Järvelin & Kekäläinen 2002) over a
    * scored run and graded judgments — the graded-relevance upgrade
    * of the reciprocal-rank eval: `scored` is (qid, doc_id, score),
    * `judged` is (qid, doc_id, grade) with integer grades >= 0.
    * gain = 2^grade - 1; rank = (score desc, doc_id) per query;
    * dcg6 = sum over the top-k ranked of gain * w(rank) with
    * [[ndcgWeights]] micro-unit weights; idcg6 = the same sum over
    * the ideal ordering (grade desc, doc_id) of the judged set;
    * ndcg6 = 1e6 * dcg6 div idcg6 (integer division — never a float
    * ratio). Returns (qid, dcg6, idcg6, ndcg6, n_rel_k) where
    * n_rel_k counts grade>0 docs inside the top-k; queries with no
    * positive judgment drop (no ideal ranking exists for them).
    *
    * Scale posture: both row_number windows partition by qid — the
    * sort is per-query, never global, and whale queries spill in the
    * window sort. Judged rows ride the joins, not the corpus; the
    * dcg join is (qid, doc_id)-keyed against a frame already cut to
    * k rows per query.
    */
  def ndcgAtK(scored: DataFrame, judged: DataFrame, k: Int): DataFrame = {
    require(k >= 1 && k <= 100, "k must be in 1..100")
    val ws = ndcgWeights(k)
    def wOf(r: Column): Column =
      ws.zipWithIndex.foldLeft(lit(0L)) { case (acc, (w, i)) =>
        when(r === (i + 1), lit(w)).otherwise(acc)
      }
    // 2^grade - 1 as exact BIGINT (grades are small integers)
    val gain = expr("shiftleft(CAST(1 AS BIGINT), CAST(grade AS INT)) - CAST(1 AS BIGINT)")
    val pos = judged.filter(col("grade") > 0)
    val rankW = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("doc_id"))
    // null scores are unrankable and sort to OPPOSITE ends on Spark
    // (desc: nulls last) vs DuckDB (desc: nulls first) — excluded by
    // contract rather than silently order-divergent
    val topRanked = scored
      .filter(col("score").isNotNull)
      .withColumn("rnk", row_number().over(rankW))
      .filter(col("rnk") <= k)
    val dcg = topRanked
      .join(pos, Seq("qid", "doc_id"), "left")
      .na.fill(0L, Seq("grade"))
      .groupBy(col("qid"))
      .agg(
        sum(gain * wOf(col("rnk"))).as("dcg6"),
        sum(when(col("grade") > 0, 1L).otherwise(0L)).as("n_rel_k"))
    val idealW = Window.partitionBy(col("qid")).orderBy(col("grade").desc, col("doc_id"))
    val idcg = pos
      .withColumn("i", row_number().over(idealW))
      .filter(col("i") <= k)
      .groupBy(col("qid"))
      .agg(sum(gain * wOf(col("i"))).as("idcg6"))
    dcg
      .join(idcg, Seq("qid"))
      .withColumn(
        "ndcg6",
        when(col("idcg6") > 0, expr("CAST(1000000 * dcg6 DIV idcg6 AS BIGINT)"))
          .otherwise(lit(0L)))
      .select(col("qid"), col("dcg6"), col("idcg6"), col("ndcg6"), col("n_rel_k"))
  }

  /** Precision / recall / F1 at k — the binary-relevance readout
    * beside [[ndcgAtK]] (graded) and the MRR query (first-hit): what
    * FRACTION of the top-k is relevant, and what fraction of the
    * relevant set the top-k captured. The set-retrieval numbers a
    * RAG pipeline actually reports.
    *
    * Conventions, each pinned: precision divides by the FIXED k
    * (retrieving fewer than k rows is a retrieval deficiency, not a
    * smaller denominator); queries with NO judged-positive docs are
    * dropped (recall undefined); a judged query with zero scored
    * rows still publishes (tp = 0). Exactness: p6 = 1e6·tp div k and
    * r6 = 1e6·tp div n_pos are single truncating divisions off exact
    * counts; f16 = 2·p6·r6 div (p6 + r6) folds the already-rounded
    * micro integers (the cohensKappa two-stage convention), 0 when
    * both are 0. Null scores are excluded by the ndcg contract
    * (Spark and DuckDB sort them to opposite ends).
    *
    * Inputs: `scored` (qid, doc_id, score), `judged` (qid, doc_id,
    * grade — grade > 0 is relevant). Scale shape: one per-qid top-k
    * window over the scored table, one broadcast-sized join against
    * the positive set, per-qid aggregates. Returns (qid, n_pos, tp,
    * p6, r6, f16).
    */
  def precisionRecallAtK(scored: DataFrame, judged: DataFrame, k: Int): DataFrame = {
    require(k >= 1 && k <= 1000, "k must be in 1..1000")
    val pos = judged
      .filter(col("grade") > 0)
      .select(col("qid"), col("doc_id"))
      .distinct()
    val nPos = pos.groupBy(col("qid")).agg(count(lit(1)).as("n_pos"))
    val rankW = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("doc_id"))
    val tp = scored
      .filter(col("score").isNotNull)
      .withColumn("rnk", row_number().over(rankW))
      .filter(col("rnk") <= k)
      .join(pos.withColumn("__rel", lit(1L)), Seq("qid", "doc_id"), "left")
      .na.fill(0L, Seq("__rel"))
      .groupBy(col("qid"))
      .agg(sum(col("__rel")).as("tp"))
    nPos
      .join(tp, Seq("qid"), "left")
      .na.fill(0L, Seq("tp"))
      .withColumn("p6", expr(s"CAST((CAST(1000000 AS DECIMAL(38,0)) * tp) div $k AS BIGINT)"))
      .withColumn("r6", expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * tp) div n_pos AS BIGINT)"))
      .withColumn(
        "f16",
        expr(
          """CASE WHEN p6 + r6 = 0 THEN CAST(0 AS BIGINT)
            |ELSE CAST((2 * p6 * r6) div (p6 + r6) AS BIGINT) END""".stripMargin))
      .select(col("qid"), col("n_pos"), col("tp"), col("p6"), col("r6"), col("f16"))
  }

  /** Average precision at k (the per-query term of MAP — the TREC
    * ranking summary): AP = (1/|pos|)·Σ_{relevant ranks r ≤ k}
    * P(r), i.e. precision read exactly at each relevant hit, so
    * ranking a relevant doc higher ALWAYS helps (unlike
    * [[precisionRecallAtK]], which is order-blind inside the top-k).
    * Divides by the FULL positive-set size, so misses below k cost
    * recall — the standard "AP@k with full-R normalization".
    *
    * Exactness: per relevant rank, p6(r) = 1e6·cumrel(r) div r — one
    * truncating division off exact counts; ap6 = Σp6 div n_pos folds
    * the rounded terms (the two-stage convention, mirrored by the
    * oracle). Same input contracts as precisionRecallAtK: grade > 0
    * is relevant, null scores excluded, no-positive queries drop,
    * judged-but-unscored queries publish zeros.
    *
    * Scale shape: one per-qid top-k window, a cumulative count over
    * the k-bounded ranked rows (partitioned by qid — never a global
    * window), per-qid aggregates. Returns (qid, n_pos, n_rel_k,
    * ap6).
    */
  def averagePrecisionAtK(scored: DataFrame, judged: DataFrame, k: Int): DataFrame = {
    require(k >= 1 && k <= 1000, "k must be in 1..1000")
    val pos = judged
      .filter(col("grade") > 0)
      .select(col("qid"), col("doc_id"))
      .distinct()
    val nPos = pos.groupBy(col("qid")).agg(count(lit(1)).as("n_pos"))
    val rankW = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("doc_id"))
    val cumW = Window.partitionBy(col("qid")).orderBy(col("rnk"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val terms = scored
      .filter(col("score").isNotNull)
      .withColumn("rnk", row_number().over(rankW))
      .filter(col("rnk") <= k)
      .join(pos.withColumn("__rel", lit(1L)), Seq("qid", "doc_id"), "left")
      .na.fill(0L, Seq("__rel"))
      .withColumn("__cumrel", sum(col("__rel")).over(cumW))
      .filter(col("__rel") === 1L)
      .select(
        col("qid"),
        expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * __cumrel) div rnk AS BIGINT)").as("__p6"))
      .groupBy(col("qid"))
      .agg(sum(col("__p6")).as("__psum"), count(lit(1)).as("n_rel_k"))
    nPos
      .join(terms, Seq("qid"), "left")
      .na.fill(0L, Seq("__psum", "n_rel_k"))
      .withColumn("ap6", expr("CAST(__psum div n_pos AS BIGINT)"))
      .select(col("qid"), col("n_pos"), col("n_rel_k"), col("ap6"))
  }

  /** Vocabulary-coverage estimators off the frequency-of-frequency
    * profile — how much vocabulary has the corpus NOT seen yet, the
    * question behind "is more crawling worth it" and "how big should
    * the tokenizer vocab be":
    *
    *   Good–Turing unseen mass (Good 1953): P(next token is a new
    *   type) ≈ N₁/N — the hapax share of the token stream.
    *   Chao1 richness (Chao 1984, bias-corrected): total-type
    *   estimate D + N₁(N₁−1)/(2(N₂+1)) — always defined, equals D
    *   when nothing is rare.
    *
    * The sampling-theory complement of the SKETCH family: HLL/KMV
    * estimate the distinct count you HAVE; these estimate the
    * distinct count you HAVEN'T. Exactness: both are one truncating
    * division off exact integer counts (N₁² at ~3e9 hapaxes passes
    * BIGINT — cast up; documented). Returns one row (n_tokens,
    * n_types, n1, n2, gt_unseen6, chao1).
    *
    * Scale shape: one token explode + (term) hash aggregate — the
    * invertedIndex scan shape — then a types-bounded re-aggregate.
    */
  def vocabCoverage(df: DataFrame, textCol: String): DataFrame =
    df
      .filter(col(textCol).isNotNull)
      .select(explode(graft.functions.TextFns.tokens(col(textCol))).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("c"))
      .agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("c") === 1L, 1L).otherwise(0L)).as("n1"),
        sum(when(col("c") === 2L, 1L).otherwise(0L)).as("n2"))
      .select(
        col("n_tokens"),
        col("n_types"),
        col("n1"),
        col("n2"),
        expr(
          """CASE WHEN n_tokens IS NULL OR n_tokens = 0 THEN CAST(0 AS BIGINT)
            |ELSE CAST((CAST(1000000 AS DECIMAL(38,0)) * n1) div n_tokens AS BIGINT) END""".stripMargin)
          .as("gt_unseen6"),
        expr(
          """CAST(n_types
            |  + (CAST(n1 AS DECIMAL(38,0)) * (n1 - 1))
            |    div (CAST(2 AS DECIMAL(38,0)) * (n2 + 1)) AS BIGINT)""".stripMargin)
          .as("chao1"))

  /** Reciprocal rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009)
    * — THE hybrid-retrieval combiner: fuse a lexical ranking (BM25)
    * and a semantic ranking (embedding cosine) without comparing
    * their incommensurable scores, by summing 1/(k₀ + rank) over the
    * lists each doc appears in. A doc ranked well by BOTH rankers
    * beats a doc one ranker loved — the two-line trick that wins
    * most hybrid-search benchmarks and needs no score calibration.
    *
    * Exactness: ranks are integers (per-list row_number with the
    * ndcg tie contract: score desc, doc_id); each list's term is
    * rrf = 1e6 div (k₀ + rank) — one truncating division per list
    * membership — and the fused score is their exact BIGINT sum, so
    * the fused ORDER is integer-deterministic even though the input
    * scores are doubles. Docs outside a list's top-`topK` contribute
    * 0 from that list (the standard truncated-run convention).
    *
    * Scale shape: two per-qid top-K windows (partitioned, K-bounded)
    * and one (qid, doc_id) full outer join of two ≤topK-per-qid
    * tables. Returns (qid, doc_id, rank_a, rank_b — null when absent
    * from that run — rrf6, fused_rank).
    */
  def rrfFuse(a: DataFrame, b: DataFrame, kConst: Int, topK: Int): DataFrame = {
    require(kConst >= 1 && kConst <= 1000, "kConst must be in 1..1000")
    require(topK >= 1 && topK <= 1000, "topK must be in 1..1000")
    def ranks(df: DataFrame, out: String) = {
      val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("doc_id"))
      df.filter(col("score").isNotNull)
        .withColumn(out, row_number().over(w).cast("long"))
        .filter(col(out) <= topK)
        .select(col("qid"), col("doc_id"), col(out))
    }
    val fusedW = Window.partitionBy(col("qid")).orderBy(col("rrf6").desc, col("doc_id"))
    ranks(a, "rank_a")
      .join(ranks(b, "rank_b"), Seq("qid", "doc_id"), "full")
      .withColumn(
        "rrf6",
        expr(
          s"""CAST(coalesce(1000000 div ($kConst + rank_a), 0)
             |   + coalesce(1000000 div ($kConst + rank_b), 0) AS BIGINT)""".stripMargin))
      .withColumn("fused_rank", row_number().over(fusedW).cast("long"))
      .select(
        col("qid"), col("doc_id"), col("rank_a"), col("rank_b"),
        col("rrf6"), col("fused_rank"))
  }

  /** Truncated rank-biased overlap (Webber, Moffat & Zobel, TOIS
    * 2010) between two top-k rankings — the ranker-comparison metric
    * that, unlike Kendall/Spearman over the union, is TOP-WEIGHTED
    * (disagreement at rank 1 costs more than at rank 10) and handles
    * non-conjoint lists natively: RBO@k = Σ_{d=1..k} (1−p)·p^(d−1) ·
    * |A_{1..d} ∩ B_{1..d}| / d. The A/B harness primitive: "how
    * differently does the new ranker order the top of the list"
    * before shipping it.
    *
    * Determinism: the depth weights (1−p)·p^(d−1) are computed ONCE
    * here in micro-units and injected as literals (the
    * decay-table/ndcgWeights idiom — the oracle interpolates the SAME
    * longs), each depth's term is one exact integer
    * (w6·overlap) div d, and the cumulative rbo6 is a running sum
    * over the k-row grid — the documented bounded-window class. The
    * grid×pairs comparison join is ≤ k² rows by CONSTRUCTION (both
    * inputs are top-k lists), the documented bounded-BNLJ class.
    *
    * Inputs: two rank tables carrying `idCol` and a 1-based dense
    * `rankCol` (ties pre-broken upstream, the ndcg contract). Rows
    * ranked beyond k are ignored. Returns one row per depth d:
    * (d, n_overlap, w6, term6, rbo6 cumulative).
    */
  def rboTable(
      a: DataFrame,
      b: DataFrame,
      idCol: String,
      rankCol: String,
      k: Int,
      p: Double): DataFrame = {
    require(k >= 1 && k <= 100, "k must be in 1..100")
    require(p > 0.0 && p < 1.0, "p must be in (0, 1)")
    val w6 = rboWeights(k, p)
    val both = a
      .filter(col(rankCol) <= k)
      .select(col(idCol).as("__id"), col(rankCol).cast("long").as("__ra"))
      .join(
        b.filter(col(rankCol) <= k)
          .select(col(idCol).as("__id"), col(rankCol).cast("long").as("__rb")),
        Seq("__id"))
    val grid = a.sparkSession
      .range(1, k + 1)
      .select(col("id").cast("long").as("d"))
    val ov = grid
      .join(both, col("__ra") <= col("d") && col("__rb") <= col("d"), "left")
      .groupBy(col("d"))
      .agg(sum(when(col("__id").isNotNull, 1L).otherwise(0L)).as("n_overlap"))
    val win = Window
      .orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ov
      .withColumn("w6", element_at(array(w6.map(lit): _*), col("d").cast("int")))
      .withColumn("term6", expr("CAST(w6 * n_overlap div d AS BIGINT)"))
      .withColumn("rbo6", sum(col("term6")).over(win))
      .select(col("d"), col("n_overlap"), col("w6"), col("term6"), col("rbo6"))
  }

  /** The RBO depth weights (1−p)·p^(d−1) in micro-units — computed
    * once, shared verbatim with the oracle so no second engine
    * re-derives a float power chain.
    */
  private[graft] def rboWeights(k: Int, p: Double): Seq[Long] =
    (1 to k).map(d => math.round(1e6 * (1.0 - p) * math.pow(p, d - 1)))

  /** Type-token statistics per group — the lexical-diversity gate
    * (Templin 1957 TTR; hapax legomena fraction): machine-generated
    * or template-stamped text pins LOW TTR (few types, many tokens),
    * while OCR noise or mojibake pins HIGH hapax (every error is a
    * new "word"). Tokens are whitespace units (the t_token_count
    * convention — no case folding, so the oracle's split mirrors
    * exactly). One explode → (group, token) hash aggregate → one
    * group aggregate; ratios are exact ppm integer divisions.
    * Empty/whitespace-only texts contribute nothing. Returns
    * (group, n_tokens, n_types, n_hapax, ttr_ppm = 1e6·types div
    * tokens, hapax_ppm = 1e6·hapax div types).
    */
  def ttrStats(df: DataFrame, textCol: String, groupCol: Column): DataFrame =
    Width.spread(df)
      .filter(length(trim(col(textCol))) > 0 && groupCol.isNotNull)
      .select(groupCol.as("g"), explode(split(trim(col(textCol)), "\\s+")).as("tok"))
      .groupBy(col("g"), col("tok"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("g"))
      .agg(
        sum(col("n")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("n") === 1L, 1L).otherwise(0L)).as("n_hapax"))
      .select(
        col("g"),
        col("n_tokens"),
        col("n_types"),
        col("n_hapax"),
        expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * n_types div n_tokens AS BIGINT)").as("ttr_ppm"),
        expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * n_hapax div n_types AS BIGINT)").as("hapax_ppm"))

  /** The Gopher stop-word list (Rae et al. 2021 §A1.1): a document
    * must contain at least 2 of these to pass the stop-word rule —
    * computed ONCE here and inlined into the oracle (shared-constant
    * discipline).
    */
  val GopherStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher quality-rule gate (Rae et al. 2021, §A1.1) — the
    * published rule battery a pretraining pipeline runs verbatim,
    * complementing [[qualityScore]]'s weighted score with named
    * pass/fail verdicts per rule: word count in [50, 100k]; mean
    * word length in [3, 10] chars (cross-multiplied — no float
    * mean); symbol-to-word ratio (# and … occurrences) ≤ 0.1;
    * ≥ 80% of words contain an alphabetic char; ≥ 2 distinct
    * [[GopherStops]]; ≤ 30% of lines ending in an ellipsis. Every
    * comparison is exact integer arithmetic (ratios
    * cross-multiplied), so the verdict is bit-identical on any
    * engine. The bullet-line rule is omitted: the corpus's documents
    * are single-line, making it a constant (this is a fixture
    * limitation, not a semantics choice — add it when multi-line
    * docs land). Returns (id, n_words, r_* as 0/1 BIGINTs, pass).
    */
  def gopherGate(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = TextFns.tokens(col(textCol))
    val base = df
      .filter(length(trim(col(textCol))) > 0)
      .select(
        col(idCol).as("id"),
        col(textCol).as("__t"),
        size(toks).cast("long").as("n_words"),
        aggregate(transform(toks, t => length(t).cast("long")), lit(0L), _ + _)
          .as("__wchars"),
        size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("long").as("__alpha"),
        size(array_distinct(
          filter(transform(toks, t => lower(t)), t => t.isin(GopherStops: _*))))
          .cast("long").as("__stops"))
      .withColumn(
        "__sym",
        (length(col("__t")) - length(translate(col("__t"), "#", ""))).cast("long") +
          ((length(col("__t")) -
            length(regexp_replace(col("__t"), "\\.\\.\\.", ""))) / 3).cast("long"))
      .withColumn("__lines", split(col("__t"), "\\n"))
      .withColumn("__nl", size(col("__lines")).cast("long"))
      .withColumn(
        "__ell",
        size(filter(col("__lines"), l => l.endsWith("..."))).cast("long"))
    base.select(
      col("id"),
      col("n_words"),
      (col("n_words") >= 50L && col("n_words") <= 100000L).cast("long").as("r_word_count"),
      (lit(3L) * col("n_words") <= col("__wchars") &&
        col("__wchars") <= lit(10L) * col("n_words")).cast("long").as("r_mean_word_len"),
      (lit(10L) * col("__sym") <= col("n_words")).cast("long").as("r_symbol_ratio"),
      (lit(5L) * col("__alpha") >= lit(4L) * col("n_words")).cast("long").as("r_alpha_words"),
      (col("__stops") >= 2L).cast("long").as("r_stopwords"),
      (lit(10L) * col("__ell") <= lit(3L) * col("__nl")).cast("long").as("r_ellipsis"))
      .withColumn(
        "pass",
        (col("r_word_count") * col("r_mean_word_len") * col("r_symbol_ratio") *
          col("r_alpha_words") * col("r_stopwords") * col("r_ellipsis")).cast("long"))
  }

  /** Code-vs-prose gate: per doc, the structural-symbol density in
    * exact ppm and a kind verdict — the pretraining mixture router
    * that keeps source files out of a prose corpus (and vice versa)
    * without an ML classifier: code carries braces/brackets/
    * semicolons/assignment at densities running prose never reaches
    * (the classic >~2% heuristic; the threshold is the caller's
    * operating point). Symbol count = chars minus the text with
    * `[{}\[\]();=<>#]` stripped — ONE regexp_replace per doc, a
    * length subtraction, one truncating division; no tokenizer, no
    * floats. Returns (id, n_chars, sym_ppm, kind); empty texts drop.
    */
  def codeGate(
      df: DataFrame,
      textCol: String,
      idCol: String,
      thresholdPpm: Long): DataFrame = {
    require(thresholdPpm > 0L, "thresholdPpm must be positive")
    df.filter(length(col(textCol)) > 0)
      .select(
        col(idCol).as("id"),
        length(col(textCol)).cast("long").as("n_chars"),
        (length(col(textCol)) -
          length(regexp_replace(col(textCol), "[{}\\[\\]();=<>#]", "")))
          .cast("long").as("__sym"))
      .select(
        col("id"),
        col("n_chars"),
        expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * __sym div n_chars AS BIGINT)").as("sym_ppm"))
      .withColumn(
        "kind",
        when(col("sym_ppm") >= thresholdPpm, "code").otherwise("prose"))
  }

  /** Jensen–Shannon divergence between TWO groups' token
    * distributions — the symmetric, bounded (≤ ln 2) corpus-distance
    * a mixture designer reads before blending sources ("how far is
    * this crawl's English from that one's"): KL's asymmetry and
    * infinities make it useless on disjoint vocab tails, JSD is
    * defined everywhere. Shape: one token hash-agg per group off a
    * single pass (the union vocabulary is the join frame), two
    * 1-row broadcast totals. Determinism: each vocab term's
    * contribution p·ln(p/m) + q·ln(q/m) is computed ONCE as a
    * double, scaled to micro-nats and rounded to BIGINT, then SUMMED
    * EXACTLY — the entropy-family discipline (per-term rounding
    * absorbs the last-ulp ln differences between JVM and libm;
    * integer summation removes float order sensitivity). Absent
    * terms contribute their defined limit 0 for the missing side.
    * Returns one row (n_terms, n_tokens_a, n_tokens_b, jsd6);
    * either group empty → zero rows (no distribution exists).
    */
  def jsdTokens(
      df: DataFrame,
      textCol: String,
      groupCol: Column,
      groupA: String,
      groupB: String): DataFrame = {
    val toks = Width.spread(df)
      .filter(length(trim(col(textCol))) > 0 && groupCol.isin(groupA, groupB))
      .select(groupCol.as("g"), explode(split(trim(col(textCol)), "\\s+")).as("tok"))
    val counts = toks
      .groupBy(col("tok"))
      .agg(
        sum(when(col("g") === groupA, 1L).otherwise(0L)).as("a"),
        sum(when(col("g") === groupB, 1L).otherwise(0L)).as("b"))
    val tot = broadcast(counts.agg(sum(col("a")).as("__A"), sum(col("b")).as("__B")))
    val pa = col("a").cast("double") / col("__A").cast("double")
    val qb = col("b").cast("double") / col("__B").cast("double")
    val m = (pa + qb) / lit(2.0)
    val contrib =
      when(col("a") > 0L, pa * log(pa / m)).otherwise(lit(0.0)) +
        when(col("b") > 0L, qb * log(qb / m)).otherwise(lit(0.0))
    counts
      .crossJoin(tot)
      .filter(col("__A") > 0L && col("__B") > 0L)
      .select(
        col("__A"), col("__B"),
        round(contrib * lit(500000.0), 0).cast("long").as("__t6"))
      .groupBy(col("__A"), col("__B"))
      .agg(count(lit(1)).as("n_terms"), sum(col("__t6")).as("jsd6"))
    .select(
        col("n_terms"),
        col("__A").as("n_tokens_a"),
        col("__B").as("n_tokens_b"),
        col("jsd6"))
  }

  /** Good–Turing frequency-of-frequencies table (Good 1953) — the
    * corpus statistic underneath every smoothed LM this engine ships
    * (Kneser–Ney's absolute discounts are its steady-state): for
    * each observed occurrence count r ≤ maxR, how many types occur
    * exactly r times (n_r), what share of all tokens they carry
    * (mass_ppm = r·n_r/N), and the GT re-estimated count
    * r* = (r+1)·n_{r+1}/n_r — r* ≪ r in the low ranks means heavy
    * tail (healthy natural text); r* ≈ r means template/bot text.
    * The r = 0 row carries THE Good–Turing number: the probability
    * mass the corpus assigns to tokens it has never seen,
    * p₀ = n_1/N — the honest "how incomplete is this vocabulary"
    * readout before any coverage decision.
    *
    * Exactness: pure integer counts; mass_ppm and r*6 one truncating
    * DECIMAL division each; an r with no n_{r+1} successor emits
    * r*6 = 0 (GT is undefined there — callers smooth; emitting the
    * raw 0 keeps the oracle trivial). Absent ranks emit no row.
    * Scale shape: one tokenize → type-count hash agg (the ttrStats
    * pass), then everything is grids bounded by maxR ≤ 100
    * (fail-fast). Returns (r, n_r, mass_ppm, r_star6) ordered by r,
    * r = 0 first.
    */
  /** Term burstiness head table (after Church & Gale 1995's
    * Poisson-mixture observation): real content words are BURSTY —
    * rare across documents but repeated within the ones they hit —
    * while function words and template boilerplate spread evenly.
    * For the top-k terms by total count: occurrences n, document
    * frequency df, burst6 = n/df (mean occurrences per CONTAINING
    * doc) and doc_share_ppm = df/n_docs. The template/bot smoke
    * test beside [[repetitionStats]]'s within-doc view: a non-stop
    * term with high burst AND high doc share is boilerplate
    * stamped across the corpus.
    *
    * Exact integers; two truncating divisions per emitted row. One
    * tokenize → (doc, term) hash agg → term agg (both map-side
    * combined), then a distributed TakeOrdered of k rows (ties to
    * the lexicographically first term). k ≤ 1000 fail-fast.
    */
  def burstinessTop(df: DataFrame, textCol: String, idCol: String, k: Int): DataFrame = {
    val base = Width.spread(df)
      .filter(length(trim(col(textCol))) > 0 && col(idCol).isNotNull)
    burstinessTopFromCells(
      base
        .select(col(idCol).as("__id"), explode(split(trim(col(textCol)), "\\s+")).as("term"))
        .groupBy(col("__id"), col("term"))
        .agg(count(lit(1)).as("__c"))
        .groupBy(col("term"))
        .agg(sum(col("__c")).as("n"), count(lit(1)).as("df")),
      base.agg(countDistinct(col(idCol)).as("__nd")),
      k)
  }

  /** [[burstinessTop]] over (possibly partial) per-term (term, n, df)
    * grids plus a (possibly partial) 1-row-per-slice (__nd) doc-count
    * frame — every statistic is linear as long as each document's
    * rows land wholly inside one slice (a document table streamed by
    * micro-batch satisfies this trivially: rows are immutable whole
    * docs), so partial grids from independent slices SUM-merge
    * exactly and the merged readout is bit-equal to the one-shot
    * batch computation: the st_good_turing type-bounded ARTIFACT
    * posture extended to the head-term gauge. */
  def burstinessTopFromCells(cells: DataFrame, nDocs0: DataFrame, k: Int): DataFrame = {
    require(k >= 1 && k <= 1000, s"k must be in [1, 1000], got $k")
    val nDocs = broadcast(
      nDocs0.agg(coalesce(sum(col("__nd")), lit(0L)).as("__nd")))
    cells
      .groupBy(col("term"))
      .agg(sum(col("n")).as("n"), sum(col("df")).as("df"))
      .crossJoin(nDocs)
      .select(
        col("term"), col("n"), col("df"),
        expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * n) div df AS BIGINT)")
          .as("burst6"),
        expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * df) div __nd AS BIGINT)")
          .as("doc_share_ppm"))
      .orderBy(col("n").desc, col("term"))
      .limit(k)
  }

  def goodTuring(df: DataFrame, textCol: String, maxR: Int): DataFrame =
    goodTuringFromTokens(
      Width.spread(df)
        .filter(length(trim(col(textCol))) > 0)
        .select(explode(split(trim(col(textCol)), "\\s+")).as("tok")),
      maxR)

  /** [[goodTuring]] over an already-built one-column token table —
    * the entry point for alternate token domains (word n-gram
    * shingles, BPE pieces, char n-grams): GT on the trigram domain
    * is the "how incomplete is my n-gram table" readout an LM/
    * decontamination pipeline actually consults. */
  def goodTuringFromTokens(tokens: DataFrame, maxR: Int): DataFrame =
    goodTuringFromFreq(
      tokens.groupBy(col("tok")).agg(count(lit(1)).as("n")),
      maxR)

  /** [[goodTuring]] over an already-merged (tok, n) type-count table
    * — per-type counts are linear, so per-batch partial counts
    * SUM-merge exactly and a streaming monitor re-runs the fof
    * readout bit-equal to batch. Unlike the day/value grids this
    * sufficient statistic is TYPE-bounded (corpus-scale) — it is the
    * postings-artifact class: a parquet table a live intake appends
    * partials to, not driver state. */
  def goodTuringFromFreq(freq: DataFrame, maxR: Int): DataFrame = {
    require(maxR >= 1 && maxR <= 100, s"maxR must be in [1, 100], got $maxR")
    val cells = freq
      .groupBy(col("n").as("r"))
      .agg(count(lit(1)).as("n_r"))
      .filter(col("r") <= maxR + 1L)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tot = broadcast(freq.agg(sum(col("n")).as("__nn")))
    val next = cells.select((col("r") - 1L).as("r"), col("n_r").as("__nr1"))
    val body = cells
      .filter(col("r") <= maxR.toLong)
      .join(next, Seq("r"), "left")
      .na.fill(0L, Seq("__nr1"))
      .crossJoin(tot)
      .select(
        col("r"), col("n_r"),
        expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * r * n_r) div __nn AS BIGINT)")
          .as("mass_ppm"),
        expr(
          """CAST((CAST(1000000 AS DECIMAL(38,0)) * (r + 1) * __nr1)
            |div n_r AS BIGINT)""".stripMargin).as("r_star6"))
    val n1 = cells.filter(col("r") === 1L).select(col("n_r").as("__n1"))
    val zero = tot
      .join(n1, lit(true), "left")
      .na.fill(0L, Seq("__n1"))
      .select(
        lit(0L).as("r"),
        lit(0L).as("n_r"),
        // Empty corpus: sum(n) is null -> the unseen-mass gauge reads
        // 0, never null (downstream consumers treat it as a number).
        expr(
          """CAST(CASE WHEN __nn IS NULL OR __nn = 0 THEN 0
            |ELSE (CAST(1000000 AS DECIMAL(38,0)) * __n1) div __nn END
            |AS BIGINT)""".stripMargin).as("mass_ppm"),
        lit(0L).as("r_star6"))
    zero.unionByName(body).orderBy(col("r"))
  }
}
