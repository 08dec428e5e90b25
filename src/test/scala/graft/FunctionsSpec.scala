package graft

import graft.functions.{DateFns, MoneyFns, TextFns, VectorFns}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column): T =
    Seq("x").toDF("dummy").select(c).collect().head.getAs[T](0)

  private def oneSeq[T](c: org.apache.spark.sql.Column): Seq[T] =
    Seq("x").toDF("dummy").select(c).collect().head.getSeq[T](0).toSeq

  // C1 chunker --------------------------------------------------------------
  test("chunks: 2350 chars -> 1000/1000/350 (FIXTURES golden case)") {
    val text = "ab" * 1175
    val out = Seq(text).toDF("t").select(TextFns.chunks($"t", 1000).as("c"))
      .collect().head.getSeq[String](0)
    assert(out.map(_.length) == Seq(1000, 1000, 350))
    assert(out.mkString == text) // recombination invariant
  }
  test("chunks: empty and exact-multiple") {
    assert(oneSeq[String](TextFns.chunks(lit(""), 100)) == Seq())
    val out = oneSeq[String](TextFns.chunks(lit("a" * 200), 100))
    assert(out.map(_.length) == Seq(100, 100))
  }

  // C2 money ---------------------------------------------------------------
  test("parseMoney golden cases from scraper_v2.py:2835-2864") {
    val cases = Seq(
      "$5.5B" -> 5.5e9, "10M" -> 1.0e7, "100K" -> 1.0e5,
      "about $27M" -> 2.7e7, "US$100k" -> 1.0e5, "~$1,200 thousand" -> 1.2e6,
      "over $3.2 billion" -> 3.2e9, "usd 42" -> 42.0)
    val df = cases.map(_._1).toDF("s").select($"s", MoneyFns.parseMoney($"s").as("v"))
    val got = df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    cases.foreach { case (s, want) => assert(got(s) == want, s"for '$s'") }
  }
  test("parseMoney unparseable -> null") {
    val r = Seq("no number here").toDF("s").select(MoneyFns.parseMoney($"s")).collect().head
    assert(r.isNullAt(0))
  }

  // C6 investors/valuation -------------------------------------------------
  test("extractInvestors: known list wins, else capture patterns with cleanup") {
    val cases = Seq(
      // known-VC substring hit wins outright, list order preserved
      ("Backed by Sequoia and Accel this round", Seq("Accel", "Sequoia")),
      // led by + participation from, deduped, trailing junk stripped
      ("Round led by Alpha Partners, with participation from Gamma Labs.",
        Seq("Alpha Partners", "Gamma Labs")),
      // stoplist + length cutoffs drop false positives
      ("led by Round. backed from Ab.", Seq()),
      ("nothing to see", Seq()))
    val got = cases.map(_._1).toDF("d")
      .select($"d", MoneyFns.extractInvestors($"d").as("inv"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
    cases.foreach { case (s, want) => assert(got(s) == want, s"for '$s'") }
  }

  test("extractValuation: pattern priority and units") {
    val cases = Seq(
      ("at a $1.5 billion valuation", 1500000000L),
      ("a $300 million valuation", 300000000L),
      ("now valued at $2.5 billion overall", 2500000000L),
      ("a valuation of $750 million today", 750000000L))
    val got = cases.map(_._1).toDF("d")
      .select($"d", MoneyFns.extractValuation($"d").as("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    cases.foreach { case (s, want) => assert(got(s) == want, s"for '$s'") }
    val none = Seq("no valuation mentioned").toDF("d")
      .select(MoneyFns.extractValuation($"d")).collect().head
    assert(none.isNullAt(0))
  }

  // C3 dates ---------------------------------------------------------------
  test("parseDateMulti formats") {
    val cases = Seq(
      "2022-11-18" -> "2022-11-18", "November 18, 2022" -> "2022-11-18",
      "November 2022" -> "2022-11-01", "2022-11" -> "2022-11-01",
      "11/18/2022" -> "2022-11-18")
    val got = cases.map(_._1).toDF("s")
      .select($"s", date_format(DateFns.parseDateMulti($"s"), "yyyy-MM-dd").as("d"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (s, want) => assert(got(s) == want, s"for '$s'") }
    val bad = Seq("not a date").toDF("s").select(DateFns.parseDateMulti($"s")).collect().head
    assert(bad.isNullAt(0))
  }
  test("rejectFuture nulls future dates") {
    val df = Seq("2999-01-01", "2020-01-01").toDF("s")
      .select(DateFns.rejectFuture(to_date($"s")).as("d"))
    val got = df.collect().map(r => Option(r.get(0)).map(_.toString))
    assert(got.toSeq == Seq(None, Some("2020-01-01")))
  }

  // C9/C10 -----------------------------------------------------------------
  test("slug, wordCount, readingTime, snippet, fingerprint") {
    assert(one[String](TextFns.slug(lit("Hello, World! 123"))) == "hello_world_123")
    assert(one[Long](TextFns.wordCount(lit("a b  c"))) == 3L)
    assert(one[Long](TextFns.wordCount(lit("  "))) == 0L)
    assert(one[Long](TextFns.readingTime(lit("word"))) == 1L)
    assert(one[String](TextFns.snippet(lit("abcdef"), 3)) == "abc...")
    assert(one[String](TextFns.snippet(lit("ab"), 3)) == "ab")
    assert(
      one[String](TextFns.fingerprint(lit("A  b\tc"))) ==
        one[String](TextFns.fingerprint(lit("a b c"))))
  }

  test("shingles: n-grams distinct, short text -> empty") {
    assert(
      oneSeq[String](TextFns.shingles(lit("a b c d"), 3)) == Seq("a b c", "b c d"))
    assert(oneSeq[String](TextFns.shingles(lit("a b"), 3)) == Seq())
    // duplicate shingles collapse
    assert(oneSeq[String](TextFns.shingles(lit("x y x y x y"), 2)).sorted ==
      Seq("x y", "y x"))
  }

  // V — cosine expression ---------------------------------------------------
  test("cosine: identical=1, orthogonal=0, known value, zero-vector=0") {
    def cos(a: Seq[Double], b: Seq[Double]): Double =
      Seq((a, b)).toDF("a", "b").select(VectorFns.cosine($"a", $"b")).collect().head.getDouble(0)
    assert(math.abs(cos(Seq(1, 2, 3), Seq(1, 2, 3)) - 1.0) < 1e-12)
    assert(cos(Seq(1, 0), Seq(0, 1)) == 0.0)
    assert(math.abs(cos(Seq(1, 0), Seq(1, 1)) - 1.0 / math.sqrt(2)) < 1e-12)
    assert(cos(Seq(0, 0), Seq(1, 1)) == 0.0)
  }
  test("cosine: float arrays cast, null propagates") {
    val df = Seq((Seq(1.0f, 2.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
    assert(math.abs(df.select(VectorFns.cosine($"a", $"b")).collect().head.getDouble(0) - 1.0) < 1e-12)
    val n = Seq((Seq(1.0), null.asInstanceOf[Seq[Double]])).toDF("a", "b")
      .select(VectorFns.cosine($"a", $"b")).collect().head
    assert(n.isNullAt(0))
  }
  test("embedText: deterministic, dim-sized, counts tokens") {
    val v = oneSeq[Double](VectorFns.embedText(lit("spark spark join"), 16))
    assert(v.length == 16)
    assert(v.sum == 3.0) // every token lands in exactly one bucket
    val v2 = oneSeq[Double](VectorFns.embedText(lit("spark spark join"), 16))
    assert(v == v2)
  }

  test("GraftExtensions: text kernels callable from SQL") {
    val r = spark.sql(
      "SELECT word_shingles('a b c d', 3) AS sh, " +
        "simhash64('hello world') AS fp, " +
        "minhash_sig(word_shingles('a b c d', 3), 4) AS sig, " +
        "ngram_stats('x y x y', 2) AS st, " +
        "sorted_intersect_size(sorted_hashes64(array('p','q','r')), " +
        "                      sorted_hashes64(array('q','r','s'))) AS c, " +
        "size(winnow_fps('abcdefghijklmnopqrstuvwxyz', 8, 10)) AS nf")
      .collect().head
    assert(r.getSeq[String](0) == Seq("a b c", "b c d"))
    assert(r.getString(1).matches("[0-9a-f]{16}"))
    assert(r.getSeq[Long](2).length == 4)
    assert(r.getStruct(3).getLong(0) == 3L && r.getStruct(3).getLong(2) == 2L)
    assert(r.getInt(4) == 2)
    assert(r.getInt(5) > 0)
    // a foldable-but-not-literal n constant-folds (1+1 → 2, BIGINT ok)
    val folded = spark
      .sql("SELECT word_shingles('a b c', 1 + 1) AS s2, " +
        "word_shingles('a b c', CAST(2 AS BIGINT)) AS s2l")
      .collect().head
    assert(folded.getSeq[String](0) == Seq("a b", "b c"))
    assert(folded.getSeq[String](1) == Seq("a b", "b c"))
    // a genuinely non-foldable n is rejected with a typed analysis error
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT word_shingles('a b c', CAST(rand() * 2 AS INT))").collect()
    }
    assert(err.getCondition == "NON_FOLDABLE_ARGUMENT")
  }

  test("GraftExtensions: cosine_similarity / dot_product callable from SQL") {
    val r = spark
      .sql(
        "SELECT cosine_similarity(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c, " +
          "dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .collect()
      .head
    assert(r.getDouble(0) == 1.0)
    assert(r.getDouble(1) == 11.0)
    // SQL and Column API agree bit-for-bit on arbitrary vectors
    val both = spark
      .sql(
        "SELECT cosine_similarity(array(0.3D, -1.2D, 2.0D), array(1.1D, 0.7D, -0.4D)) AS s")
      .collect()
      .head
      .getDouble(0)
    import spark.implicits._
    val viaColumn = Seq((Seq(0.3, -1.2, 2.0), Seq(1.1, 0.7, -0.4)))
      .toDF("a", "b")
      .select(VectorFns.cosine($"a", $"b"))
      .collect()
      .head
      .getDouble(0)
    assert(java.lang.Double.doubleToLongBits(both) ==
      java.lang.Double.doubleToLongBits(viaColumn))
  }

  test("foldHomoglyphs: confusables fold to Latin, ASCII is a fixed point, idempotent") {
    import graft.functions.TextFns
    assert(TextFns.HomoglyphFrom.length == TextFns.HomoglyphTo.length)
    assert(TextFns.HomoglyphTo.forall(_ < 0x80), "fold targets must be ASCII")
    // Cyrillic-evaded and Greek-evaded spellings of the same word
    val df = Seq(
      ("dаtа jоin", "data join"),      // Cyrillic а/о
      ("ΡΑΝΕL", "PANEL"),              // Greek caps Ρ Α Ν Ε
      ("plain ascii 42!", "plain ascii 42!")
    ).toDF("raw", "want")
    val got = df.select(
      TextFns.foldHomoglyphs($"raw").as("f"),
      TextFns.foldHomoglyphs(TextFns.foldHomoglyphs($"raw")).as("ff"),
      $"want")
      .collect()
    got.foreach { r =>
      assert(r.getString(0) == r.getString(2), s"fold(${r.getString(2)})")
      assert(r.getString(1) == r.getString(0), "idempotence")
    }
  }
}
