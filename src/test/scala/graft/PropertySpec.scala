package graft

import graft.functions.{MoneyFns, TextFns}
import graft.operators.Relational
import org.apache.spark.sql.functions._
import scala.util.Random

/** SURVEY §5 property tests (seeded-random cases): chunker
  * invariants, money-parser round trips, dedup idempotence.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(42)

  test("C1 property: chunks recombine to the input; all but last are full") {
    val texts = Seq.fill(40)(rnd.alphanumeric.take(rnd.nextInt(3000)).mkString)
    val rows = texts.toDF("t")
      .select(TextFns.chunks($"t", 100).as("c"), $"t")
      .collect()
    rows.foreach { r =>
      val chunks = r.getSeq[String](0)
      assert(chunks.mkString == r.getString(1))
      if (chunks.nonEmpty) {
        assert(chunks.init.forall(_.length == 100))
        assert(chunks.last.nonEmpty && chunks.last.length <= 100)
      }
    }
  }

  test("kernel property: WordShingles == relational shingling on ragged text") {
    // random texts with mixed whitespace (spaces, tabs, newlines,
    // runs), empty and short docs — the tokenization edge cases
    val words = Vector("fox", "dog", "a", "Thé", "42", "x-y", "q")
    val ws = Vector(" ", "  ", "\t", "\n", " \t ")
    def randText(): String = {
      val n = rnd.nextInt(12)
      val sb = new StringBuilder
      if (rnd.nextBoolean()) sb.append(ws(rnd.nextInt(ws.length)))
      (0 until n).foreach { i =>
        if (i > 0) sb.append(ws(rnd.nextInt(ws.length)))
        sb.append(words(rnd.nextInt(words.length)))
      }
      if (rnd.nextBoolean()) sb.append(ws(rnd.nextInt(ws.length)))
      sb.toString
    }
    val docs = (1L to 60L).map(i => (i, randText())).toDF("doc_id", "text")
    val viaKernel = graft.operators.Dedup.shingleTable(docs, "text", "doc_id", 2)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // relational reference: explode tokens, window lead, distinct
    val toks = docs.select(
      $"doc_id".as("id"),
      posexplode(TextFns.tokens($"text")).as(Seq("pos", "tok")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"id").orderBy($"pos")
    val viaRelational = toks
      .withColumn("t1", lead($"tok", 1).over(w))
      .filter($"t1".isNotNull)
      .select($"id", concat_ws(" ", $"tok", $"t1").as("shingle"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(viaKernel == viaRelational)
  }

  test("kernel property: SimHash64 == column fingerprint on random docs") {
    val docs = (1L to 40L)
      .map(i => (i, Seq.fill(1 + rnd.nextInt(30))(rnd.alphanumeric.take(1 + rnd.nextInt(8)).mkString).mkString(" ")))
      .toDF("doc_id", "text")
    val viaKernel = graft.operators.Dedup.simhashTable(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val viaColumn = docs
      .select($"doc_id",
        graft.operators.Dedup.simhashFingerprint(TextFns.tokens($"text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(viaKernel == viaColumn)
  }

  test("kernel property: WinnowFingerprints handles unicode and long docs like the window form") {
    // multibyte chars exercise the codepoint-substring path; the long
    // doc guards against accidental quadratic behavior in the deque
    val uni = "héllo wörld ünïcode ∂ata θεσσαλονίκη 北京 données naïve " * 4
    val long = Seq.fill(4000)(rnd.alphanumeric.take(6).mkString).mkString(" ") // ~28k chars
    val docs = Seq((1L, uni), (2L, long)).toDF("doc_id", "text")
    val k = 8; val w = 10
    val viaExpr = graft.operators.TextAnalysis
      .winnowTable(docs, "text", "doc_id", k, w)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy($"id").orderBy($"i").rowsBetween(0, w - 1)
    val nG = greatest(length($"text") - (k - 1), lit(0))
    val viaWindow = docs
      .select($"doc_id".as("id"), $"text", nG.as("n"))
      .select($"id", $"text", $"n", posexplode(sequence(lit(1), $"n")).as(Seq("j", "i")))
      .select($"id", $"n", $"i", substring(md5($"text".substr($"i", lit(k))), 1, 8).as("h"))
      .withColumn("m", min($"h").over(win))
      .filter($"i" <= $"n" - (w - 1))
      .select($"id", $"m").distinct()
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(viaExpr == viaWindow)
  }

  test("C2 property: parseMoney round-trips integer amounts across suffixes") {
    val suffixes = Seq("K" -> 1e3, "M" -> 1e6, "B" -> 1e9, "" -> 1.0)
    val prefixes = Seq("$", "about $", "US$", "~$", "over $")
    val cases = Seq.fill(60) {
      val n = 1L + rnd.nextInt(999999)
      val (sfx, mult) = suffixes(rnd.nextInt(suffixes.length))
      val pre = prefixes(rnd.nextInt(prefixes.length))
      (s"$pre$n$sfx", n * mult)
    }
    val got = cases.map(_._1).distinct.toDF("s")
      .select($"s", MoneyFns.parseMoney($"s").as("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    cases.foreach { case (s, want) => assert(got(s) == want, s"for '$s'") }
  }

  test("D property: dedupeFirstWins is idempotent and keeps min order key") {
    (1 to 5).foreach { _ =>
      val rs = Seq.fill(30)((rnd.nextInt(6), rnd.nextInt(1000))).distinct
      val df = rs.toDF("k", "pos")
      val once = Relational.dedupeFirstWins(df, Seq($"k"), Seq($"pos"))
      val twice = Relational.dedupeFirstWins(once, Seq($"k"), Seq($"pos"))
      val a = once.orderBy("k").collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
      val b = twice.orderBy("k").collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
      assert(a == b)
      val mins = rs.groupBy(_._1).map { case (k, g) => k -> g.map(_._2).min }
      assert(a.toMap == mins)
    }
  }

  test("prefix-scan property: globalCumSum/globalRunningMax match driver folds on any partitioning") {
    (1 to 5).foreach { i =>
      val rs = Seq.fill(200)((rnd.nextLong() % 10000, rnd.nextInt(100).toLong))
        .distinctBy(_._1) // total order needs distinct keys
      val df = rs.toDF("k", "t").repartition(1 + rnd.nextInt(9))
      val sorted = rs.sortBy(_._1)
      val expCum = sorted.scanLeft((0L, 0L)) { case ((_, acc), (k, t)) => (k, acc + t) }
        .sliding(2).map { case Seq((_, prev), (k, _)) => k -> prev }.toMap
      val gotCum = Relational.globalCumSum(df, Seq($"k"), "t", "c")
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(gotCum == expCum, s"round $i cumsum")
      val expMax = sorted.scanLeft((0L, Option.empty[Long])) { case ((_, acc), (k, t)) =>
        (k, Some(acc.fold(t)(math.max(_, t))))
      }.sliding(2).map { case Seq((_, prev), (k, _)) => k -> prev }.toMap
      val gotMax = Relational.globalRunningMax(df, Seq($"k"), "t", "m")
        .collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getLong(2))))
        .toMap
      assert(gotMax == expMax, s"round $i runningmax")
    }
  }

  test("V2 property: dot/(norm*norm) decomposition is bit-identical to cosine") {
    // the pair-scan rewrite (Similarity/Dedup) relies on this holding
    // exactly, not approximately — oracles hash-compare raw doubles
    val vecs = Seq.fill(50)(Array.fill(64)(rnd.nextDouble() * 2 - 1))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "emb")
    val a = df.select($"id".as("id_a"), $"emb".as("emb_a"),
      graft.functions.VectorFns.norm2($"emb").as("norm_a"))
    val b = df.select($"id".as("id_b"), $"emb".as("emb_b"),
      graft.functions.VectorFns.norm2($"emb").as("norm_b"))
    val both = a.crossJoin(b)
      .select(
        graft.functions.VectorFns.cosine($"emb_a", $"emb_b").as("cos"),
        (graft.functions.VectorFns.dotc($"emb_a", $"emb_b") / ($"norm_a" * $"norm_b"))
          .as("decomposed"))
      .collect()
    both.foreach { r =>
      assert(
        java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("TopKAggregator property: equals the window row_number formulation on random data") {
    val rows = Seq.fill(300)((rnd.nextInt(8).toLong, rnd.nextInt(50).toLong, rnd.nextLong().abs % 1000))
      .zipWithIndex.map { case ((k, v, _), i) => (k, v, i.toLong) } // unique ids
    val df = rows.toDF("k", "v", "id")
    val topk = org.apache.spark.sql.functions.udaf(new graft.expressions.TopKAggregator(4))
    val viaAgg = df.groupBy($"k").agg(topk($"v", $"id").as("top"))
      .select($"k", explode($"top").as("e"))
      .select($"k", $"e._1".as("v"), $"e._2".as("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expected = rows.groupBy(_._1).flatMap { case (k, g) =>
      g.map(t => (t._2, t._3)).sortBy(t => (-t._1, t._2)).take(4).map(t => (k, t._1, t._2))
    }.toSet
    assert(viaAgg == expected)
  }

  test("asofJoin property: equals per-row brute-force latest-preceding on random data") {
    val leftRows = Seq.fill(80)((rnd.nextInt(5).toLong, rnd.nextInt(100).toLong))
      .zipWithIndex.map { case ((k, ts), i) => (k, ts, i.toLong) }
    val rightRows = Seq.fill(60)((rnd.nextInt(5).toLong, rnd.nextInt(100).toLong))
      .zipWithIndex.map { case ((k, ts), i) => (k, ts, 1000L + i, rnd.nextInt(1000).toDouble) }
    val left = leftRows.toDF("k", "ts", "lid")
    val right = rightRows.toDF("k", "ts", "rid", "v")
    val got = graft.operators.Relational
      .asofJoin(left, right, "k", "ts", Seq("v"), $"rid")
      .select($"lid", $"asof_v")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    leftRows.foreach { case (k, ts, lid) =>
      val want = rightRows
        .filter(r => r._1 == k && r._2 <= ts)
        .sortBy(r => (r._2, r._3)) // ties: larger rid wins (last in asc order)
        .lastOption.map(_._4)
      assert(got(lid) == want, s"lid=$lid k=$k ts=$ts")
    }
  }

  test("winnow property: near-dup docs share most fingerprints; disjoint docs share none") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away home tonight"
    val nearDup = base.replace("quick", "swift") // one word changed
    val other = "completely different content with zero overlap whatsoever in any gram xyz"
    val df = Seq((1L, base), (2L, nearDup), (3L, other)).toDF("doc_id", "text")
    val fps = graft.operators.TextAnalysis
      .winnowTable(df, "text", "doc_id", 8, 4)
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSet }
    val shared12 = fps(1L).intersect(fps(2L)).size.toDouble / fps(1L).size
    assert(shared12 > 0.5, s"near-dups should share most fingerprints, got $shared12")
    assert(fps(1L).intersect(fps(3L)).isEmpty)
    // every fingerprint is the hash of some gram of the doc
    val grams1 = (0 until base.length - 7).map(i => base.substring(i, i + 8)).toSet
    val gramHashes = grams1.map(g =>
      java.security.MessageDigest.getInstance("MD5").digest(g.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8))
    assert(fps(1L).subsetOf(gramHashes))
  }

  test("C3 property: parseDateMulti round-trips random dates in all formats") {
    val fmts = Seq("yyyy-MM-dd", "MMMM d, yyyy", "M/d/yyyy")
    val dates = Seq.fill(40) {
      java.time.LocalDate.of(1990 + rnd.nextInt(35), 1 + rnd.nextInt(12), 1 + rnd.nextInt(28))
    }
    fmts.foreach { f =>
      val fmt = java.time.format.DateTimeFormatter.ofPattern(f, java.util.Locale.US)
      val pairs = dates.map(d => d.format(fmt) -> d.toString)
      val got = pairs.map(_._1).distinct.toDF("s")
        .select($"s", date_format(graft.functions.DateFns.parseDateMulti($"s"), "yyyy-MM-dd").as("d"))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      pairs.foreach { case (s, want) => assert(got(s) == want, s"format $f, input '$s'") }
    }
  }

  test("PII property: redaction is idempotent and leaves no live PII behind") {
    val pii = Vector(
      "bob.smith+x@corp.example.org", "123-45-6789", "(212) 555-0147",
      "555-123-4567", "1-555-123-4567", "+1 555-123-4567", "10.20.30.40")
    val fill = Vector("hello", "order", "42nd", "v1.2", "sum:")
    def randText(): String =
      (0 until rnd.nextInt(12)).map { _ =>
        if (rnd.nextInt(3) == 0) pii(rnd.nextInt(pii.length))
        else fill(rnd.nextInt(fill.length))
      }.mkString(" ")
    val docs = (1 to 80).map(_ => randText()).toDF("t")
    val rows = docs
      .select(
        TextFns.redactPii($"t").as("once"),
        TextFns.redactPii(TextFns.redactPii($"t")).as("twice"))
      .collect()
    rows.foreach { r =>
      val once = r.getString(0)
      assert(once == r.getString(1), s"not idempotent: $once")
      pii.foreach(p => assert(!once.contains(p), s"live PII '$p' survived in: $once"))
    }
  }

  test("PhoneRe left boundary: never starts mid digit-run; foreign prefix keeps its digits") {
    val cases = Seq(
      // (input, expected after redaction)
      ("call 555-123-4567 now", "call [PHONE] now"),
      ("call 1-555-123-4567 now", "call [PHONE] now"),
      ("call +1 555-123-4567 now", "call [PHONE] now"),
      ("call +1 (555) 123-4567 now", "call [PHONE] now"),
      // foreign country code: the '1' of '41' must NOT be eaten as a
      // +1 country code (the old regex matched '1-555-…' leaking '+4')
      ("call +41-555-123-4567 now", "call +41-[PHONE] now"),
      // digit run that merely CONTAINS a phone shape is not a phone
      ("id 4555-123-4567 end", "id 4555-123-4567 end"),
      // paren form after a digit still redacts (the paren anchors it)
      ("x4(555) 123-4567", "x4[PHONE]"))
    val got = cases.map(_._1).toDF("t")
      .select($"t", TextFns.redactPii($"t").as("r"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (in, want) => assert(got(in) == want, s"input '$in'") }
  }

  test("packBins property: bins are contiguous per group and sized by the running budget") {
    val docs = (1L to 200L)
      .map(i => (i, s"g${i % 4}", 1 + rnd.nextInt(100)))
      .toDF("id", "g", "n")
    val got = graft.operators.Sampling
      .packBins(docs, $"g", $"id", $"n".cast("long"), 150L)
      .select($"g", $"id", $"n".cast("long").as("n"), $"pack_bin")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    got.values.foreach { rows =>
      // replay the greedy packing in plain Scala using the same
      // deterministic hash order and check bin assignment exactly
      val ordered = rows.sortBy { case (_, id, _, _) =>
        val md5 = java.security.MessageDigest.getInstance("MD5")
          .digest(id.toString.getBytes("UTF-8"))
        val hex = md5.take(4).map("%02x".format(_)).mkString
        (java.lang.Long.parseLong(hex, 16), id)
      }
      var cum = 0L
      ordered.foreach { case (_, _, n, bin) =>
        assert(bin == cum / 150L, s"bin $bin != ${cum / 150L} at cum $cum")
        cum += n
      }
      // bins are contiguous 0..max
      val bins = ordered.map(_._4)
      assert(bins.distinct.sorted.toSeq == (0L to bins.max).toSeq, bins.mkString(","))
    }
  }

  test("intervalOverlapJoin property: equals the naive theta join on random intervals") {
    def randIntervals(n: Int, pre: String) = (1L to n.toLong).map { i =>
      val s = rnd.nextDouble() * 200.0
      (s"k${rnd.nextInt(4)}", i, s, s + rnd.nextDouble() * 55.0)
    }.toDF("k", s"${pre}_id", s"${pre}_s", s"${pre}_e")
    val left = randIntervals(80, "l")
    val right = randIntervals(80, "r")
    for (cell <- Seq(1.0, 10.0, 64.0, 1000.0)) { // incl. one-cell-covers-all
      val got = Relational
        .intervalOverlapJoin(left, right, Seq("k"), "l_s", "l_e", "r_s", "r_e", cell)
        .select($"l_id", $"r_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      val naive = left.join(right, Seq("k"))
        .filter($"l_s" <= $"r_e" && $"r_s" <= $"l_e")
        .select($"l_id", $"r_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.sorted.toSeq == naive.sorted.toSeq, s"cellSize=$cell")
      assert(got.length == got.distinct.length, s"dup pairs at cellSize=$cell")
    }
  }

  test("tokenWindows property: windows tile the token stream exactly") {
    val texts = (1L to 50L).map { i =>
      val n = rnd.nextInt(40)
      (i, (1 to n).map(_ => s"w${rnd.nextInt(9)}").mkString("  "))
    }.toDF("doc_id", "text")
    for ((win, stride) <- Seq((8, 8), (8, 3), (5, 1))) {
      val rows = graft.operators.TextAnalysis
        .tokenWindows(texts, "text", "doc_id", win, stride)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))
      val byDoc = rows.groupBy(_._1)
      val expected = texts.select($"doc_id", TextFns.tokens($"text")).collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      byDoc.foreach { case (id, ws) =>
        val toks = expected(id)
        assert(toks.nonEmpty)
        // window count formula, start positions on the stride grid
        assert(ws.length == math.ceil(math.max(toks.length - win, 0) / stride.toDouble).toInt + 1)
        ws.sortBy(_._2).foreach { case (_, wIdx, start, chunk, nTok) =>
          assert(start == wIdx * stride)
          val want = toks.slice(start.toInt, start.toInt + win)
          assert(chunk == want.mkString(" "), s"doc $id window $wIdx")
          assert(nTok == want.length)
        }
      }
      // blank docs emit nothing; every non-blank doc emits >= 1 window
      assert(byDoc.keySet == expected.filter(_._2.nonEmpty).keySet)
    }
  }

  test("kmv property: sketch equals k smallest distinct hashes, any partitioning") {
    val keys = (1 to 400).map(_ => s"k${rnd.nextInt(120)}") // ~120 distinct, duplicated
    val df = keys.map(("g", _)).toDF("g", "key")
    val k = 16
    val got = graft.operators.Sketches
      .kmvDistinct(df.repartition(11), Seq($"g"), $"key", k)
      .head()
    // reference: exact k smallest distinct portable hashes
    val hashes = df.select(graft.operators.Sampling.hash32($"key")).distinct()
      .collect().map(_.getLong(0)).sorted.take(k)
    assert(got.getLong(1) == k.toLong)
    val expectedEst = (k - 1).toDouble * 4294967296.0 / hashes.last.toDouble
    assert(got.getDouble(2) == expectedEst)
  }

  test("mixtureSample property: binding group keeps everything, composition tracks targets") {
    val docs = ((1L to 300L).map(i => (i, "web")) ++
      (301L to 400L).map(i => (i, "code")) ++
      (401L to 460L).map(i => (i, "papers")) ++
      (461L to 500L).map(i => (i, "ignored")))
      .toDF("id", "src")
    val targets = Seq("web" -> 0.5, "code" -> 0.3, "papers" -> 0.2)
    val got = graft.operators.Sampling
      .mixtureSample(docs, $"src", $"id", targets)
      .groupBy($"src").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // T = min(300/.5, 100/.3, 60/.2) = 300 — papers binds with f = 1
    assert(got("papers") == 60L, got.toString)
    assert(!got.contains("ignored"), got.toString)
    // expected web 150, code 90; hash sampling is binomial around the
    // expectation — accept ±35% (seeded data, so this is deterministic
    // in practice; the band is for test-data regeneration)
    assert(math.abs(got("web") - 150L) <= 52, got.toString)
    assert(math.abs(got("code") - 90L) <= 32, got.toString)
    val total = got.values.sum.toDouble
    assert(total >= 200 && total <= 400, got.toString)
    // a target group with ZERO rows sinks the water level to T = 0:
    // the exact-composition contract means an empty sample, not a
    // silent renormalization over whichever groups happen to exist
    val gone = graft.operators.Sampling
      .mixtureSample(docs, $"src", $"id", targets :+ ("absent" -> 0.1))
      .count()
    assert(gone == 0L, s"expected empty sample for a missing target group, got $gone rows")
  }


  test("histSketch property: bucket counts partition the non-null rows at any input") {
    import graft.operators.Sketches
    val vals = Seq.fill(300)(rnd.nextDouble() * 2000.0 - 500.0) // incl. negatives > ceil
    val df = vals.map(Tuple1(_)).toDF("v")
    val hist = Sketches.histSketch(df, $"v", 1000.0, 16).collect()
    assert(hist.map(_.getLong(1)).sum == 300L)
    assert(hist.forall(r => r.getLong(0) >= 0L && r.getLong(0) <= 15L))
  }

  test("psiFromCounts property: self-PSI is 0 and PSI is symmetric for random grids") {
    import graft.operators.Checks
    (1 to 5).foreach { _ =>
      val g1 = (0 until 8).map(b => (b.toLong, (rnd.nextInt(100) + 1).toLong)).toDF("bucket", "n")
      val g2 = (0 until 8).map(b => (b.toLong, (rnd.nextInt(100) + 1).toLong)).toDF("bucket", "n")
      assert(Checks.psiFromCounts(g1, g1).head().getLong(3) == 0L)
      val ab = Checks.psiFromCounts(g1, g2).head().getLong(3)
      val ba = Checks.psiFromCounts(g2, g1).head().getLong(3)
      // PSI is symmetric up to the per-term rounding (each term is
      // (p-q)ln(p/q) = term(q,p)); micro-rounding can differ by 1/term
      assert(math.abs(ab - ba) <= 8L, s"asymmetry $ab vs $ba")
      assert(ab >= 0L)
    }
  }

  test("ndcgAtK property: ndcg6 bounded by 1e6 and monotone under a perfect reorder") {
    import graft.operators.TextAnalysis
    (1 to 3).foreach { _ =>
      val docs = (1 to 20).map(_.toLong)
      val scored = docs.map(d => (1L, d, rnd.nextDouble())).toDF("qid", "doc_id", "score")
      val judged = docs.filter(_ => rnd.nextBoolean())
        .map(d => (1L, d, (rnd.nextInt(2) + 1).toLong)).toDF("qid", "doc_id", "grade")
      val rows = TextAnalysis.ndcgAtK(scored, judged, 10).collect()
      rows.foreach { r =>
        assert(r.getLong(3) >= 0L && r.getLong(3) <= 1000000L)
        // scoring BY the grades is the perfect ranking: ndcg exactly 1e6
        val perfect = judged.select($"qid", $"doc_id", $"grade".cast("double").as("score"))
        val p = TextAnalysis.ndcgAtK(perfect, judged, 10).collect()
        p.foreach(row => assert(row.getLong(3) == 1000000L))
      }
    }
  }

  test("dayIslands property: islands partition the distinct days, gaps consistent") {
    import graft.operators.Relational
    (1 to 3).foreach { _ =>
      val days = (1 to 28).filter(_ => rnd.nextBoolean())
        .map(i => ("k", java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, i))))
      if (days.nonEmpty) {
        val isl = Relational.dayIslands(days.toDF("k", "day"), "k", "day")
          .orderBy($"island_start").collect()
        assert(isl.map(_.getLong(3)).sum == days.size.toLong)
        // islands are disjoint and ordered; first island has gap 0
        assert(isl.head.getLong(4) == 0L)
        assert(isl.tail.forall(_.getLong(4) >= 1L))
      }
    }
  }
}
