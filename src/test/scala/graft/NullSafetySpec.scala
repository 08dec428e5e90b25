package graft

import graft.functions.{HtmlFns, TextFns}
import graft.operators.{Feeds, Jobs}
import org.apache.spark.sql.functions._

/** Null-input contracts: real corpora carry null documents/fields even
  * though the driver's test tables don't. Every kernel expression and
  * text function must pass a NULL through (null-in → null-out, or a
  * documented fallback) without throwing — the behavior a 100 TB run
  * hits on day one.
  */
class NullSafetySpec extends SparkSpec {
  import spark.implicits._

  private lazy val row = Seq((1L, Option.empty[String])).toDF("id", "t")

  test("custom kernel expressions are null-tolerant via the SQL surface") {
    row.createOrReplaceTempView("nulls_t")
    val r = spark.sql(
      """SELECT word_shingles(t, 3) AS a, simhash64(t) AS b,
        |       winnow_fps(t, 5, 4) AS c, ngram_stats(t, 2) AS d,
        |       sorted_hashes64(CAST(NULL AS ARRAY<STRING>)) AS e,
        |       minhash_sig(CAST(NULL AS ARRAY<STRING>), 4) AS f,
        |       cosine_similarity(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)) AS g,
        |       dot_product(array(1.0D), CAST(NULL AS ARRAY<DOUBLE>)) AS h
        |FROM nulls_t""".stripMargin).head()
    (0 until 8).foreach(i => assert(r.isNullAt(i), s"column $i should be null"))
  }

  test("text functions pass nulls through without throwing") {
    val r = row.select(
      TextFns.tokens($"t").as("tokens"),
      TextFns.fingerprint($"t").as("fp"),
      TextFns.redactPii($"t").as("pii"),
      TextFns.wordCount($"t").as("wc"),
      TextFns.normalizeText($"t").as("norm"),
      TextFns.chunks($"t", 100).as("chunks")).head()
    (0 until 5).foreach(i => assert(r.isNullAt(i), s"column $i should be null"))
    // chunks' documented null fallback is the EMPTY array (a null doc
    // chunks to no chunks — downstream explode simply emits nothing)
    assert(r.getSeq[String](5).isEmpty)
  }

  test("feed/ATS parsers tolerate null html/url inputs") {
    val feeds = row.select(Feeds.feedEntries($"t", lit("https://b.com/")).as("e")).head()
    assert(feeds.isNullAt(0)) // null xml -> null entry array
    val vendor = row.select(Jobs.detectAts($"t", $"t")).head()
    assert(vendor.isNullAt(0)) // no markers anywhere -> null vendor
    val stats = row.select(HtmlFns.pageStatistics($"t", lit("https://b.com/")).as("s"))
      .select("s.total_links").head()
    assert(stats.isNullAt(0) || stats.getLong(0) == 0L)
    // urlJoin(link, NULL base): absolute links survive, relatives null out
    val uj = Seq(("https://abs.com/x", Option.empty[String])).toDF("l", "b")
      .select(HtmlFns.urlJoin($"l", $"b")).head()
    assert(uj.getString(0) == "https://abs.com/x")
  }

  test("kmvDistinct ignores null keys instead of crashing the aggregator") {
    val df = Seq(("g", Some("a")), ("g", None), ("g", Some("b")), ("g", None))
      .toDF("g", "key")
    val got = graft.operators.Sketches
      .kmvDistinct(df, Seq($"g"), $"key", 8).head()
    assert(got.getLong(1) == 2L && got.getDouble(2) == 2.0) // a, b; nulls ignored
  }

  test("semanticDecontaminate scopes out null embeddings on both sides") {
    val bench = Seq(
      (0L, Some(Seq(1.0f, 0.0f))),
      (1L, Option.empty[Seq[Float]]) // would NPE the driver collect unguarded
    ).toDF("vec_id", "embedding")
    val corpus = Seq(
      (10L, Some(Seq(0.0f, 1.0f))), // orthogonal -> survives
      (11L, Some(Seq(1.0f, 0.0f))), // identical to bench -> dropped
      (12L, Option.empty[Seq[Float]]) // null: no evidence -> scoped out
    ).toDF("vec_id", "embedding")
    val got = graft.operators.Similarity
      .semanticDecontaminate(corpus, bench, "embedding", 0.9)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(10L))
  }

  test("epochPlan excludes null AND zero-token groups per the pinned contract") {
    val df = Seq(
      (Some("a"), 10L), (Some("a"), 10L), (Some("b"), 20L),
      (Option.empty[String], 999L), // null source: not schedulable
      (Some("empty"), 0L)           // zero tokens: would 0/0 -> NaN,
                                    // which Spark min and SQL least
                                    // order differently
    ).toDF("g", "n")
    val plan = graft.operators.Sampling
      .epochPlan(df, $"g", $"n", 0.7, 100.0, 4.0)
      .collect()
    assert(plan.map(_.getString(0)).toSet == Set("a", "b"))
    // and no NaN leaked into the published doubles
    assert(plan.forall(r => !r.getDouble(4).isNaN))
  }

  test("epochPlan: all-null-count groups are excluded (no NPE) and double counts cast") {
    // group 'nul' sums to NULL (every tokenCount null) — it must be
    // excluded like a zero-token group, not blow up the driver unbox;
    // a DOUBLE-typed tokenCount column must plan fine via the cast
    val df = Seq(
      (Some("a"), Option(10.5)), (Some("a"), Option(9.5)),
      (Some("b"), Option(30.0)),
      (Some("nul"), Option.empty[Double]), (Some("nul"), Option.empty[Double])
    ).toDF("g", "n")
    val plan = graft.operators.Sampling
      .epochPlan(df, $"g", $"n", 0.7, 100.0, 4.0)
      .collect()
    assert(plan.map(_.getString(0)).toSet == Set("a", "b"))
    assert(plan.find(_.getString(0) == "a").get.getLong(1) == 20L)
  }

  test("mergeAggDelta: null keys never merge — each side's survives with zeros") {
    val base = Seq((Option(1L), 2L), (Option.empty[Long], 5L)).toDF("k", "n")
    val delta = Seq((Option.empty[Long], 7L)).toDF("k", "n")
    val got = graft.operators.Relational
      .mergeAggDelta(base, delta, Seq("k"), Seq("n"))
      .collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0))) -> r.getLong(1))
    // two separate null-key rows (5+0 and 0+7), never a 12
    assert(got.sorted.toSeq == Seq(None -> 5L, None -> 7L, Some(1L) -> 2L).sorted)
  }

  test("zValue nulls the key when either dimension is null") {
    val got = Seq((Some(3L), Option.empty[Long]), (Option.empty[Long], Some(5L)), (Some(3L), Some(5L)))
      .toDF("x", "y")
      .select(graft.operators.Layout.zValue($"x", $"y", 10).as("z"))
      .collect()
    assert(got(0).isNullAt(0) && got(1).isNullAt(0) && !got(2).isNullAt(0))
  }

  test("medoidCanonicals: all-null-embedding cluster falls back to min-id, never vanishes") {
    import graft.operators.Dedup
    val emb = Seq(
      (1L, Option.empty[Array[Float]]),
      (2L, Option.empty[Array[Float]]),
      (5L, Some(Array(1.0f, 0.0f)))).toDF("vec_id", "embedding")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val kept = Dedup.medoidCanonicals(emb, "vec_id", "embedding", pairs)
      .select($"vec_id").collect().map(_.getLong(0)).toSet
    // cluster {1,2} has no scoreable pair (both embeddings null):
    // min-id fallback keeps 1; singleton 5 untouched
    assert(kept == Set(1L, 5L))
  }

  test("medoidCanonicals: a null-embedding member rides along but cannot be the medoid") {
    import graft.operators.Dedup
    val emb = Seq(
      (1L, Option.empty[Array[Float]]),
      (2L, Some(Array(0.7f, 0.7f))),
      (3L, Some(Array(1.0f, 0.0f)))).toDF("vec_id", "embedding")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val kept = Dedup.medoidCanonicals(emb, "vec_id", "embedding", pairs)
      .select($"vec_id").collect().map(_.getLong(0)).toSet
    // only 2 and 3 score (cos=0.707 each; tie -> min id 2); 1 never
    assert(kept == Set(2L))
  }

  test("rank-order operators exclude null inputs (the engine-dependent null-sort trap)") {
    import graft.operators.{Series, Sketches, Relational}
    def d(i: Int) = java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, i))
    // theil-sen: the null-value day contributes no slope
    val daily = Seq(("a", Some(d(1)), Some(10L)), ("a", Some(d(2)), None),
      ("a", Some(d(3)), Some(30L)), ("a", None, Some(99L))).toDF("k", "day", "n")
    val ts = Series.theilSenDaily(daily, "k", "day", "n").head()
    assert(ts.getLong(2) == 1L && ts.getLong(3) == 10000000L) // one pair, slope 10/day
    // hist sketch: the null value contributes no bucket
    val h = Sketches.histSketch(Seq(Some(5.0), None).toDF("v"), $"v", 10.0, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h == Map(2L -> 1L))
    // islands: the null day is no island
    val isl = Relational.dayIslands(
      Seq(("a", Some(d(1))), ("a", None)).toDF("k", "day"), "k", "day")
      .collect()
    assert(isl.length == 1 && isl.head.getLong(3) == 1L)
  }

  test("round-9 trend/test operators exclude null inputs") {
    import graft.operators.{Experiments, Series}
    def d(i: Int) = java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, i))
    // mann-kendall: null day/value rows carry no pair and no tie
    val daily = Seq(
      ("a", Some(d(1)), Some(1L)), ("a", Some(d(2)), None),
      ("a", None, Some(9L)), ("a", Some(d(3)), Some(2L))).toDF("k", "day", "n")
    val mk = Series.mannKendallDaily(daily, "k", "day", "n").head()
    assert((mk.getLong(1), mk.getLong(2)) == ((2L, 1L))) // 2 days, S = 1
    // cochran-armitage: null dose/success rows drop before the cells
    val ca = Experiments.cochranArmitage(
      Seq((Some(1L), Some(0L)), (Some(1L), Some(1L)), (None, Some(1L)),
        (Some(2L), None), (Some(2L), Some(1L)), (Some(2L), Some(1L)))
        .toDF("w", "s"),
      col("w"), col("s")).head()
    assert((ca.getLong(0), ca.getLong(1), ca.getLong(2)) == ((2L, 4L, 3L)))
    // jonckheere: null arm/value rows never reach the grid
    val jt = Experiments.jonckheereTerpstra(
      Seq((Some(1L), Some(1L)), (Some(1L), Some(2L)), (None, Some(5L)),
        (Some(2L), None), (Some(2L), Some(3L)), (Some(2L), Some(4L)))
        .toDF("a", "x"),
      col("a"), col("x")).head()
    assert((jt.getLong(1), jt.getLong(2)) == ((4L, 8L))) // N = 4, full separation
    // page: null unit/treatment/value rows drop before the panel
    // check — a unit made incomplete ONLY by a null value fails fast
    val e = intercept[Exception](Experiments.pageTrend(
      Seq((Some(1L), Some(1L), Some(10L)), (Some(1L), Some(2L), Some(20L)),
        (Some(1L), Some(3L), Some(30L)), (Some(2L), Some(1L), Some(1L)),
        (Some(2L), Some(2L), None), (Some(2L), Some(3L), Some(3L)))
        .toDF("u", "t", "x"),
      col("u"), col("t"), col("x")).collect())
    assert(e.getMessage.contains("exactly 3 treatment rows"), e.getMessage)
  }

  test("globalCumSum / globalRunningMax: null order keys sort to one end, never throw") {
    import graft.operators.Relational
    val df = Seq((Some(2L), 10L), (None, 5L), (Some(1L), 7L)).toDF("k", "t")
    // Spark sorts nulls FIRST ascending; the scan stays total either
    // way — pin the end-to-end sums rather than the null position
    val cum = Relational.globalCumSum(df, Seq($"k"), "t", "below")
      .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0)) -> r.getLong(2)).toMap
    assert(cum == Map(-1L -> 0L, 1L -> 5L, 2L -> 12L))
    val mx = Relational.globalRunningMax(df, Seq($"k"), "t", "best")
      .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0)) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(mx == Map(-1L -> None, 1L -> Some(5L), 2L -> Some(7L)))
  }
}
