package graft

import graft.functions._
import graft.operators._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2, with a DuckDB-equivalent `oracleSql` for each
  * SQL-expressible op.
  *
  * Determinism engineering (the driver hash-compares results):
  *   - money/value sums go through exact DECIMAL(18,2) arithmetic and
  *     are cast back to double (all test-table money columns are
  *     2-decimal values, so the casts never round);
  *   - every query ends in a total ORDER BY;
  *   - vector math is a sequential left-fold in double precision,
  *     mirrored exactly by the oracle's list_reduce.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts: nanos-long or NTZ depending on testdata generation —
      // Engine.normalizeEventTs dispatches on the observed type.
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      Engine.normalizeEventTs(s.read.parquet(s"$dir/$name.parquet"))
    } else s.read.parquet(s"$dir/$name.parquet")

  /** Exact decimal sum of a 2-dp double column, returned as double. */
  private def dsum(c: Column): Column =
    sum(c.cast("decimal(18,2)")).cast("double")

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------
  // Queries
  // ---------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    relationalQueries ++ textQueries ++ dedupQueries ++ vectorQueries ++
      miscQueries ++ extraQueries ++ SparkEntryCoverage.queries ++
      SparkEntryStreaming.queries ++ SparkEntryTpch.queries

  def oracleSql: Map[String, String] = {
    val base =
      relationalOracle ++ textOracle ++ dedupOracle ++ vectorOracle ++
        miscOracle ++ extraOracle ++ SparkEntryCoverage.oracleSql ++
        SparkEntryStreaming.oracleSql ++ SparkEntryTpch.oracleSql
    // persisted-artifact twins (the SparkEntryCoverage rule): the
    // loaded / upserted phash index must reproduce the in-line pair
    // set; the compacted one serves the takedown survivors
    base ++ Map(
      "mm_phash_persisted" -> base("mm_phash_neardup"),
      "mm_phash_upsert" -> base("mm_phash_neardup"),
      // the as-of-1 read sees through the seq-2 takedown: full corpus
      "mm_phash_asof" -> base("mm_phash_neardup"),
      "st_phash_upsert" -> base("mm_phash_neardup"),
      "mm_phash_multiprobe" -> phashPairsOracleFor("TRUE", probed = true),
      "mm_phash_compacted" -> phashPairsOracleFor("doc_id % 9 <> 0"))
  }

  // ---------------------------------------------------------------
  // Extra coverage: W3, A8, C5-C7, C13, F3, J3
  // ---------------------------------------------------------------

  private def extraQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // W3 — latest run-folder selection (orbit_daily_update_dag.py:142-158)
    "w3_latest_run" -> { (s, dir) =>
      t(s, dir, "events")
        .select(concat(lit("daily_"), date_format(col("ts"), "yyyy-MM-dd")).as("run_name"))
        .distinct()
        .withColumn("run_date", to_date(regexp_extract(col("run_name"), "daily_(\\d{4}-\\d{2}-\\d{2})", 1)))
        .orderBy(col("run_date").desc)
        .limit(1)
        .select(col("run_name"), date_format(col("run_date"), "yyyy-MM-dd").as("run_date"))
    },
    // A8 — batch summary: per-day totals with countDistinct
    // (handle_chunking.py:228-262)
    "a8_batch_summary" -> { (s, dir) =>
      t(s, dir, "events")
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(
          count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          dsum(col("value")).as("total_value"))
        .orderBy(col("day"))
    },
    // C5/C6/C7 — headcount/round/stars/rating regex extraction with
    // range guards (scraper_v2.py:2652-2786; structured_extraction_v2.py:2165-2252)
    "c5_regex_extractors" -> { (s, dir) =>
      val letter = when(col("s_suppkey") % 3 === 0, "a")
        .when(col("s_suppkey") % 3 === 1, "b")
        .otherwise("c")
      val rating = when(col("s_suppkey") % 4 === 0, "3.9")
        .when(col("s_suppkey") % 4 === 1, "4.5")
        .when(col("s_suppkey") % 4 === 2, "0.2")
        .otherwise("7.8")
      val blurb = concat(
        lit("Team of "), ((col("s_suppkey") * 7) % 120000).cast("string"),
        lit(" employees. Raised a series "), letter,
        lit(" round. "), (col("s_suppkey") % 4000).cast("string"),
        lit(" stars on github. glassdoor: "), rating)
      val head = nullif(regexp_extract(col("blurb"), "(\\d+) employees", 1), lit("")).cast("long")
      val stars = nullif(regexp_extract(col("blurb"), "(\\d+) stars", 1), lit("")).cast("long")
      val gd = nullif(regexp_extract(col("blurb"), "glassdoor: (\\d\\.\\d)", 1), lit("")).cast("double")
      t(s, dir, "supplier")
        .select(col("s_suppkey"), blurb.as("blurb"))
        .select(
          col("s_suppkey"),
          col("blurb"),
          when(head.between(10, 100000), head).as("headcount"),
          regexp_extract(col("blurb"), "series ([a-z]) ", 1).as("round_letter"),
          stars.as("github_stars"),
          when(gd.between(0.0, 5.0), gd).as("glassdoor_rating"))
        .orderBy(col("s_suppkey"))
    },
    // C13 — priority-fallback JSON text recovery (handle_chunking.py:27-112)
    "c13_json_recovery" -> { (s, dir) =>
      val js = when(col("doc_id") % 3 === 0,
        concat(lit("{\"full_text\":\""), col("lang"), lit("0\"}")))
        .when(col("doc_id") % 3 === 1,
          concat(lit("{\"content\":\""), col("lang"), lit("1\"}")))
        .otherwise(concat(lit("{\"body\":\""), col("lang"), lit("2\"}")))
      t(s, dir, "documents")
        .select(col("doc_id"), js.as("js"))
        .withColumn(
          "recovered",
          coalesce(
            get_json_object(col("js"), "$.full_text"),
            get_json_object(col("js"), "$.content"),
            get_json_object(col("js"), "$.body")))
        .orderBy(col("doc_id"))
    },
    // F3 — paragraph split + keyword filter (structured_extraction_v2.py:1274-1325)
    "f3_keyword_paragraphs" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(
          col("doc_id"),
          posexplode(split(col("text"), " table ")).as(Seq("para_index", "para")))
        .filter(col("para").contains("join"))
        .select(col("doc_id"), col("para_index").cast("long").as("para_index"), col("para"))
        .orderBy(col("doc_id"), col("para_index"))
    },
    // J3 — provenance URL-mapping broadcast lookup
    // (structured_extraction_v2.py:938-948)
    "j3_provenance_lookup" -> { (s, dir) =>
      import s.implicits._
      val urlMap = broadcast(Seq(
        ("en", "https://site/en"), ("de", "https://site/de")).toDF("lang", "source_url"))
      t(s, dir, "documents")
        .join(urlMap, Seq("lang"), "left")
        .select(col("doc_id"), col("lang"), col("source_url"))
        .orderBy(col("doc_id"))
    }
  )

  private def extraOracle: Map[String, String] = Map(
    "w3_latest_run" ->
      """SELECT run_name, strftime(run_date, '%Y-%m-%d') AS run_date FROM (
        | SELECT DISTINCT 'daily_' || strftime(ts, '%Y-%m-%d') AS run_name,
        |        CAST(regexp_extract('daily_' || strftime(ts, '%Y-%m-%d'), 'daily_(\d{4}-\d{2}-\d{2})', 1) AS DATE) AS run_date
        | FROM events)
        |ORDER BY run_date DESC LIMIT 1""".stripMargin,
    "a8_batch_summary" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day, CAST(COUNT(*) AS BIGINT) AS n_events,
        | CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY day ORDER BY day""".stripMargin,
    "c5_regex_extractors" ->
      """WITH b AS (
        | SELECT s_suppkey,
        |  'Team of ' || CAST((s_suppkey * 7) % 120000 AS VARCHAR) ||
        |  ' employees. Raised a series ' ||
        |  (CASE WHEN s_suppkey % 3 = 0 THEN 'a' WHEN s_suppkey % 3 = 1 THEN 'b' ELSE 'c' END) ||
        |  ' round. ' || CAST(s_suppkey % 4000 AS VARCHAR) ||
        |  ' stars on github. glassdoor: ' ||
        |  (CASE WHEN s_suppkey % 4 = 0 THEN '3.9' WHEN s_suppkey % 4 = 1 THEN '4.5'
        |        WHEN s_suppkey % 4 = 2 THEN '0.2' ELSE '7.8' END) AS blurb
        | FROM supplier),
        |x AS (
        | SELECT s_suppkey, blurb,
        |  CAST(NULLIF(regexp_extract(blurb, '(\d+) employees', 1), '') AS BIGINT) AS head,
        |  regexp_extract(blurb, 'series ([a-z]) ', 1) AS round_letter,
        |  CAST(NULLIF(regexp_extract(blurb, '(\d+) stars', 1), '') AS BIGINT) AS github_stars,
        |  CAST(NULLIF(regexp_extract(blurb, 'glassdoor: (\d\.\d)', 1), '') AS DOUBLE) AS gd
        | FROM b)
        |SELECT s_suppkey, blurb,
        | CASE WHEN head BETWEEN 10 AND 100000 THEN head END AS headcount,
        | round_letter, github_stars,
        | CASE WHEN gd BETWEEN 0.0 AND 5.0 THEN gd END AS glassdoor_rating
        |FROM x ORDER BY s_suppkey""".stripMargin,
    "c13_json_recovery" ->
      """WITH b AS (
        | SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN '{"full_text":"' || lang || '0"}'
        |       WHEN doc_id % 3 = 1 THEN '{"content":"' || lang || '1"}'
        |       ELSE '{"body":"' || lang || '2"}' END AS js
        | FROM documents)
        |SELECT doc_id, js,
        | COALESCE(js->>'$.full_text', js->>'$.content', js->>'$.body') AS recovered
        |FROM b ORDER BY doc_id""".stripMargin,
    "f3_keyword_paragraphs" ->
      """SELECT doc_id, CAST(p.i - 1 AS BIGINT) AS para_index, parts[p.i] AS para
        |FROM (SELECT doc_id, string_split(text, ' table ') AS parts FROM documents),
        |     LATERAL (SELECT unnest(generate_series(1, len(parts))) AS i) p
        |WHERE contains(parts[p.i], 'join')
        |ORDER BY doc_id, para_index""".stripMargin,
    "j3_provenance_lookup" ->
      """WITH urlmap(lang, source_url) AS (VALUES ('en', 'https://site/en'), ('de', 'https://site/de'))
        |SELECT doc_id, d.lang, u.source_url
        |FROM documents d LEFT JOIN urlmap u ON d.lang = u.lang
        |ORDER BY doc_id""".stripMargin
  )

  private def relationalQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A-family: aggregations ------------------------------------------------
    "q1_pricing_summary" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(
            col("l_extendedprice").cast("decimal(18,2)") *
              (lit(1) - col("l_discount")).cast("decimal(18,2)"))
            .cast("double")
            .as("sum_disc_price"),
          (sum(col("l_quantity").cast("decimal(18,2)")).cast("double") /
            count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    // A1 — funding-summary shape: per-key total + latest-by-date
    // (SURVEY §2.4 A1, reference structured_extraction_v2.py:1984-2000)
    "a1_customer_summary" -> { (s, dir) =>
      // latest-by-(date, key) argmax as max over ONE encoded long —
      // max_by with a struct ordering key (or a string value) forces
      // SortAggregate, which sorts the whole fact table; encoding
      // (days, orderkey) into a long keeps both aggregation passes
      // HashAggregate with map-side partials, and the single join
      // fetches the winning row's status. orderkey < 1e10 at any SF
      // in this schema, so the encoding is collision-free.
      val o = t(s, dir, "orders")
      val enc =
        datediff(col("o_orderdate"), lit("1970-01-01").cast("date")).cast("long") *
          10000000000L + col("o_orderkey")
      val agg = o
        .groupBy(col("o_custkey"))
        .agg(
          dsum(col("o_totalprice")).as("total_spent"),
          count(lit(1)).as("order_count"),
          max(enc).as("__best"),
          date_format(max(col("o_orderdate")), "yyyy-MM-dd").as("last_orderdate"))
      val best = o.select(
        col("o_custkey"),
        enc.as("__best"),
        col("o_orderstatus").as("last_status"))
      agg
        .join(best, Seq("o_custkey", "__best"))
        .select(
          col("o_custkey"),
          col("total_spent"),
          col("order_count"),
          col("last_status"),
          col("last_orderdate"))
        .orderBy(col("o_custkey"))
    },
    // A2 — event-type histogram (structured_extraction_v2.py:3503-3508)
    "a2_event_histogram" -> { (s, dir) =>
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
        .orderBy(col("event_type"))
    },
    // A3 — conditional counts (count_if; structured_extraction_v2.py:3424-3425)
    "a3_conditional_counts" -> { (s, dir) =>
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n_total"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_error"),
          sum(when(col("value") > 50, 1L).otherwise(0L)).as("n_high_value"))
        .orderBy(col("user_id"))
    },
    // A4 — recent-window count (30-day news mentions analogue,
    // structured_extraction_v2.py:3172-3194)
    "a4_recent_counts" -> { (s, dir) =>
      t(s, dir, "events")
        .filter(col("ts") >= lit("2024-01-24 00:00:00").cast("timestamp"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_recent"))
        .orderBy(col("event_type"))
    },
    // A5 — keyword sentiment ratio, null when no hits
    // (structured_extraction_v2.py:3196-3207)
    "a5_sentiment_ratio" -> { (s, dir) =>
      val (posF, negF) =
        TextAnalysis.sentimentFlags(col("text"), Seq("fast"), Seq("slow"))
      t(s, dir, "documents")
        .select(col("source"), posF.as("p"), negF.as("n"))
        .groupBy(col("source"))
        .agg(sum(col("p")).as("n_pos"), sum(col("n")).as("n_neg"))
        .withColumn(
          "sentiment",
          when(col("n_pos") + col("n_neg") === 0, lit(null).cast("double"))
            .otherwise(
              round(
                col("n_pos").cast("double") /
                  (col("n_pos") + col("n_neg")).cast("double"),
                6)))
        .orderBy(col("source"))
    },
    // A7 — per-row stats over token arrays (scraper_v2.py:1148-1172)
    "a7_doc_stats" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(
          col("doc_id"),
          TextFns.wordCount(col("text")).as("n_tokens"),
          size(array_distinct(TextFns.tokens(col("text")))).cast("long").as("n_distinct"))
        .orderBy(col("doc_id"))
    },
    // W1 — filter → orderBy → limit top-k (TakeOrderedAndProject;
    // rag_search.py:48-65 without the over-fetch)
    "w1_top_orders" -> { (s, dir) =>
      Relational
        .topK(
          t(s, dir, "orders"),
          col("o_orderpriority") === "1-URGENT",
          Seq(col("o_totalprice").desc, col("o_orderkey")),
          10)
        .select(
          col("o_orderkey"),
          col("o_custkey"),
          col("o_totalprice"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"))
    },
    // W2 — latest-per-key (max_by; structured_extraction_v2.py:1992-2000)
    "w2_latest_event_per_user" -> { (s, dir) =>
      Relational
        .latestPerKey(
          t(s, dir, "events"),
          Seq(col("user_id")),
          Seq(col("ts"), col("event_id")))
        .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
        .orderBy(col("user_id"))
    },
    // W5 — running-length cutoff window (structured_extraction_v2.py:1277-1323)
    "w5_running_cap" -> { (s, dir) =>
      Relational
        .runningCap(
          t(s, dir, "documents"),
          Seq(col("source")),
          Seq(col("doc_id")),
          col("n_chars"),
          3000L)
        .select(col("source"), col("doc_id"), col("n_chars"))
        .orderBy(col("source"), col("doc_id"))
    },
    // J1 — broadcast dim joins (api.py:242-288 name→id resolution shape)
    "j1_region_rollup" -> { (s, dir) =>
      val c = t(s, dir, "customer")
      val n = broadcast(t(s, dir, "nation"))
      val r = broadcast(t(s, dir, "region"))
      c.join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_customers"), dsum(col("c_acctbal")).as("total_acctbal"))
        .orderBy(col("r_name"))
    },
    // J8-analogue — anti join: customers with no orders
    "j8_customers_without_orders" -> { (s, dir) =>
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },
    // semi join: suppliers with at least one max-quantity lineitem
    "j_semi_heavy_suppliers" -> { (s, dir) =>
      val sup = t(s, dir, "supplier")
      val li = t(s, dir, "lineitem").filter(col("l_quantity") >= 50)
      sup
        .join(li, sup("s_suppkey") === li("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
        .orderBy(col("s_suppkey"))
    },
    // Q3-shape join-agg top-k
    "q3_top_revenue_orders" -> { (s, dir) =>
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1998-06-01").cast("timestamp"))
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1998-06-01").cast("timestamp"))
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(li, o("o_orderkey") === li("l_orderkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(
          sum(
            col("l_extendedprice").cast("decimal(18,2)") *
              (lit(1) - col("l_discount")).cast("decimal(18,2)"))
            .cast("double")
            .as("revenue"))
        .select(
          col("o_orderkey"),
          col("revenue"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    },
    // Q5-shape multi-way join rollup
    "q5_nation_revenue" -> { (s, dir) =>
      val r = broadcast(t(s, dir, "region").filter(col("r_name") === "ASIA"))
      val n = broadcast(t(s, dir, "nation"))
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(
        col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      val li = t(s, dir, "lineitem")
      c.join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .join(o, c("c_custkey") === o("o_custkey"))
        .join(li, o("o_orderkey") === li("l_orderkey"))
        .groupBy(col("n_name"))
        .agg(
          sum(
            col("l_extendedprice").cast("decimal(18,2)") *
              (lit(1) - col("l_discount")).cast("decimal(18,2)"))
            .cast("double")
            .as("revenue"))
        .orderBy(col("n_name"))
    },
    // D1 — first-wins dedup (scraper_v2.py:1045-1086)
    "d1_first_doc_per_lang" -> { (s, dir) =>
      Relational
        .dedupeFirstWins(t(s, dir, "documents"), Seq(col("lang")), Seq(col("doc_id")))
        .select(col("lang"), col("doc_id"), col("source"))
        .orderBy(col("lang"))
    },
    // D3 — generic key dedup, earliest event per (user, type)
    "d3_first_event_per_user_type" -> { (s, dir) =>
      Relational
        .dedupeFirstWins(
          t(s, dir, "events"),
          Seq(col("user_id"), col("event_type")),
          Seq(col("event_id")))
        .select(col("user_id"), col("event_type"), col("event_id"), col("value"))
        .orderBy(col("user_id"), col("event_type"))
    },
    // U2 — union + dedup (scraper_v2.py:2281-2339)
    "u2_union_dedup" -> { (s, dir) =>
      val d = t(s, dir, "documents")
      d.filter(col("text").contains("fast"))
        .select(col("doc_id"))
        .unionByName(d.filter(col("text").contains("slow")).select(col("doc_id")))
        .distinct()
        .orderBy(col("doc_id"))
    },
    // I1/J8 — content-hash change detection between two snapshots
    // (orbit_daily_update_dag.py:126-201)
    "i1_change_detection" -> { (s, dir) =>
      val e = t(s, dir, "events")
      def half(p: Column): DataFrame =
        e.filter(p)
          .groupBy(col("user_id"), col("event_type"))
          .agg(
            count(lit(1)).as("cnt"),
            sum((col("value") * 100).cast("decimal(18,0)")).cast("long").as("cents"))
          .withColumn(
            "snap_hash",
            md5(concat_ws(":", col("cnt").cast("string"), col("cents").cast("string"))))
      val cut = lit("2024-01-16 00:00:00").cast("timestamp")
      Relational
        .changeDetection(
          half(col("ts") < cut),
          half(col("ts") >= cut),
          Seq("user_id", "event_type"),
          "snap_hash")
        .select(col("user_id"), col("event_type"), col("status"))
        .orderBy(col("user_id"), col("event_type"))
    },
    // I5 — epoch-aligned weekly windows (sliding-agg analogue,
    // structured_extraction_v2.py:3172-3194)
    "i5_weekly_windows" -> { (s, dir) =>
      t(s, dir, "events")
        .groupBy(
          date_format(window(col("ts"), "7 days").getField("start"), "yyyy-MM-dd").as("week_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
        .orderBy(col("week_start"), col("event_type"))
    }
  )

  // ---------------------------------------------------------------
  // Oracle SQL (DuckDB dialect, same tables)
  // ---------------------------------------------------------------

  private def relationalOracle: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        | CAST(COUNT(*) AS BIGINT) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "a1_customer_summary" ->
      """WITH lat AS (
        | SELECT o_custkey, o_orderstatus, strftime(o_orderdate, '%Y-%m-%d') AS od,
        |        row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        | FROM orders),
        |agg AS (
        | SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent,
        |        CAST(COUNT(*) AS BIGINT) AS order_count
        | FROM orders GROUP BY o_custkey)
        |SELECT agg.o_custkey, agg.total_spent, agg.order_count,
        |       lat.o_orderstatus AS last_status, lat.od AS last_orderdate
        |FROM agg JOIN lat ON agg.o_custkey = lat.o_custkey AND lat.rn = 1
        |ORDER BY agg.o_custkey""".stripMargin,
    "a2_event_histogram" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "a3_conditional_counts" ->
      """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_total,
        | CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS n_error,
        | CAST(COUNT(*) FILTER (WHERE value > 50) AS BIGINT) AS n_high_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "a4_recent_counts" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_recent
        |FROM events WHERE ts >= TIMESTAMP '2024-01-24 00:00:00'
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "a5_sentiment_ratio" ->
      """SELECT source,
        | CAST(COUNT(*) FILTER (WHERE contains(lower(text), 'fast')) AS BIGINT) AS n_pos,
        | CAST(COUNT(*) FILTER (WHERE contains(lower(text), 'slow')) AS BIGINT) AS n_neg,
        | CASE WHEN COUNT(*) FILTER (WHERE contains(lower(text), 'fast')) + COUNT(*) FILTER (WHERE contains(lower(text), 'slow')) = 0
        |      THEN NULL
        |      ELSE round(CAST(COUNT(*) FILTER (WHERE contains(lower(text), 'fast')) AS DOUBLE) /
        |           (COUNT(*) FILTER (WHERE contains(lower(text), 'fast')) + COUNT(*) FILTER (WHERE contains(lower(text), 'slow'))), 6)
        | END AS sentiment
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "a7_doc_stats" ->
      """SELECT doc_id,
        | CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        | CAST(len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS n_distinct
        |FROM documents ORDER BY doc_id""".stripMargin,
    "w1_top_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate
        |FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "w2_latest_event_per_user" ->
      """SELECT user_id, event_id, event_type, value FROM (
        | SELECT user_id, event_id, event_type, value,
        |        row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        | FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "w5_running_cap" ->
      """SELECT source, doc_id, n_chars FROM (
        | SELECT source, doc_id, n_chars,
        |        SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
        |                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
        | FROM documents) WHERE run <= 3000 ORDER BY source, doc_id""".stripMargin,
    "j1_region_rollup" ->
      """SELECT r_name, CAST(COUNT(*) AS BIGINT) AS n_customers,
        | CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "j8_customers_without_orders" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "j_semi_heavy_suppliers" ->
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey AND l_quantity >= 50)
        |ORDER BY s_suppkey""".stripMargin,
    "q3_top_revenue_orders" ->
      """SELECT o_orderkey,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        | strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    "q5_nation_revenue" ->
      """SELECT n_name,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "d1_first_doc_per_lang" ->
      """SELECT lang, doc_id, source FROM (
        | SELECT lang, doc_id, source,
        |        row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
        | FROM documents) WHERE rn = 1 ORDER BY lang""".stripMargin,
    "d3_first_event_per_user_type" ->
      """SELECT user_id, event_type, event_id, value FROM (
        | SELECT user_id, event_type, event_id, value,
        |        row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id) AS rn
        | FROM events) WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,
    "u2_union_dedup" ->
      """SELECT DISTINCT doc_id FROM (
        | SELECT doc_id FROM documents WHERE contains(text, 'fast')
        | UNION ALL
        | SELECT doc_id FROM documents WHERE contains(text, 'slow')
        |) ORDER BY doc_id""".stripMargin,
    "i1_change_detection" ->
      """WITH halves AS (
        | SELECT user_id, event_type, (ts >= TIMESTAMP '2024-01-16 00:00:00') AS is_new,
        |        COUNT(*) AS cnt,
        |        CAST(SUM(CAST(value * 100 AS DECIMAL(18,0))) AS BIGINT) AS cents
        | FROM events GROUP BY user_id, event_type, is_new),
        |o AS (SELECT user_id, event_type, md5(CAST(cnt AS VARCHAR) || ':' || CAST(cents AS VARCHAR)) AS h FROM halves WHERE NOT is_new),
        |n AS (SELECT user_id, event_type, md5(CAST(cnt AS VARCHAR) || ':' || CAST(cents AS VARCHAR)) AS h FROM halves WHERE is_new)
        |SELECT COALESCE(o.user_id, n.user_id) AS user_id,
        |       COALESCE(o.event_type, n.event_type) AS event_type,
        |       CASE WHEN o.h IS NULL THEN 'added'
        |            WHEN n.h IS NULL THEN 'removed'
        |            WHEN o.h <> n.h THEN 'changed' ELSE 'same' END AS status
        |FROM o FULL OUTER JOIN n ON o.user_id = n.user_id AND o.event_type = n.event_type
        |WHERE CASE WHEN o.h IS NULL THEN 'added' WHEN n.h IS NULL THEN 'removed'
        |           WHEN o.h <> n.h THEN 'changed' ELSE 'same' END <> 'same'
        |ORDER BY user_id, event_type""".stripMargin,
    "i5_weekly_windows" ->
      """SELECT strftime(make_timestamp((epoch_us(ts) // 604800000000) * 604800000000), '%Y-%m-%d') AS week_start,
        | event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY week_start, event_type
        |ORDER BY week_start, event_type""".stripMargin
  )

  // ---------------------------------------------------------------
  // Text / scalar-function queries (SURVEY §2.7, §2.2)
  // ---------------------------------------------------------------

  private[graft] val langMarkers = Seq(
    "dataish" -> Seq("data", "stream", "batch"),
    "sqlish" -> Seq("table", "query", "join"),
    "vecish" -> Seq("vector", "hash", "key"))
  private val riskCats = Seq(
    ("capacity", Seq("big", "huge"), "medium"),
    ("freshness", Seq("stale", "old"), "low"),
    ("latency", Seq("slow", "lag"), "high"))
  private[graft] val qualityStops = Seq("the", "a", "of")

  private def textQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // C1 — fixed-size chunker (chunker.py:17-22)
    "c1_chunker" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(
          col("doc_id"),
          posexplode(TextFns.chunks(col("text"), 200)).as(Seq("chunk_index", "chunk")))
        .select(col("doc_id"), col("chunk_index").cast("long").as("chunk_index"), col("chunk"))
        .orderBy(col("doc_id"), col("chunk_index"))
    },
    // C2 — money parser (scraper_v2.py:2835-2864) on constructed strings
    "c2_parse_money" -> { (s, dir) =>
      val cents = round(col("p_retailprice") * 100).cast("long")
      val moneyStr = when(col("p_partkey") % 3 === 0, concat(lit("$"), cents.cast("string"), lit("K")))
        .when(col("p_partkey") % 3 === 1, concat(lit("about $"), cents.cast("string"), lit("M")))
        .otherwise(concat(lit("US$"), cents.cast("string"), lit("B")))
      t(s, dir, "part")
        .select(col("p_partkey"), moneyStr.as("money_str"))
        .withColumn("amount_usd", MoneyFns.parseMoney(col("money_str")))
        .orderBy(col("p_partkey"))
    },
    // C3 — multi-format date parse round-trip (structured_extraction_v2.py:2095-2163)
    "c3_date_parse" -> { (s, dir) =>
      val dateStr = when(col("o_orderkey") % 3 === 0, date_format(col("o_orderdate"), "yyyy-MM-dd"))
        .when(col("o_orderkey") % 3 === 1, date_format(col("o_orderdate"), "MMMM d, yyyy"))
        .otherwise(date_format(col("o_orderdate"), "M/d/yyyy"))
      t(s, dir, "orders")
        .select(col("o_orderkey"), dateStr.as("date_str"))
        .withColumn("parsed", date_format(DateFns.parseDateMulti(col("date_str")), "yyyy-MM-dd"))
        .orderBy(col("o_orderkey"))
    },
    // C9 — deterministic ids: md5 chunk id, sha256 content hash, slug
    "c9_content_ids" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(
          col("doc_id"),
          TextFns.chunkId(col("text")).as("chunk_md5"),
          TextFns.contentHash(col("text")).as("content_sha"),
          TextFns.slug(col("text"), 50).as("slug"))
        .orderBy(col("doc_id"))
    },
    // C10 — word count + reading time (news_extractor.py:191-192)
    "c10_reading_time" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(
          col("doc_id"),
          TextFns.wordCount(col("text")).as("word_count"),
          TextFns.readingTime(col("text")).as("reading_time"))
        .orderBy(col("doc_id"))
    },
    // C12 — embedded-JSON field extraction (scraper_v2.py:120-181)
    "c12_json_extract" -> { (s, dir) =>
      t(s, dir, "events")
        .select(col("event_id"), get_json_object(col("props"), "$.k").cast("long").as("k"))
        .filter(col("k") > 90)
        .orderBy(col("event_id"))
    },
    // F1 — substring source filter (rag_search.py:54-65)
    "f1_source_filter" -> { (s, dir) =>
      t(s, dir, "documents")
        .filter(TextFns.icontains(col("source"), "src1"))
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    },
    // F2 — min-length content filter (handle_chunking.py:150-156)
    "f2_min_length" -> { (s, dir) =>
      t(s, dir, "documents")
        .filter(length(col("text")) >= 300)
        .select(col("doc_id"), length(col("text")).cast("long").as("text_len"))
        .orderBy(col("doc_id"))
    },
    // F5 — risk keyword scan, first hit per category (risk_detection.py:47-82)
    "f5_risk_scan" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(
          col("doc_id"),
          explode(TextAnalysis.riskSignals(col("text"), riskCats)).as("r"))
        .select(
          col("doc_id"),
          col("r.risk_type").as("risk_type"),
          col("r.keyword").as("keyword"),
          col("r.severity").as("severity"))
        .orderBy(col("doc_id"), col("risk_type"))
    },
    // F12 — snippet truncation (rag_search.py:96-97)
    "f12_snippet" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), TextFns.snippet(col("text"), 100).as("snip"))
        .orderBy(col("doc_id"))
    },
    // Language ID via marker tokens (training-data text analysis)
    "t_lang_id" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.langId(col("text"), langMarkers).as("lang_pred"))
        .orderBy(col("doc_id"))
    },
    // Quality score (length / stopword / token-shape heuristics)
    "t_quality_score" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.qualityScore(col("text"), qualityStops).as("quality"))
        .orderBy(col("doc_id"))
    },
    // Per-source ADAPTIVE quality gate (the FineWeb/C4 "keep the top
    // 60% of each domain" rule): a fixed global threshold over- or
    // under-prunes sources with different quality distributions, so
    // the cutoff is each source's exact 40th-percentile rank —
    // all-integer rank arithmetic ((4n+9) div 10, the a_winsor_mean
    // discipline), total (quality, doc_id) order for determinism.
    // Source partitions flow through one task each (bounded by the
    // source count; pre-thin a pathological source with hashSample,
    // same caveat as stratifiedCap).
    "t_quality_gate" -> { (s, dir) =>
      val scored = t(s, dir, "documents")
        .select(
          col("doc_id"),
          col("source"),
          TextAnalysis.qualityScore(col("text"), qualityStops).as("quality"))
      val ranked = scored
        .withColumn(
          "rn",
          row_number().over(
            Window.partitionBy(col("source")).orderBy(col("quality"), col("doc_id"))))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("source"))))
      ranked
        .filter(col("rn") > expr("(4 * n + 9) div 10"))
        .select(col("doc_id"), col("source"), col("quality"))
        .orderBy(col("doc_id"))
    },
    // Document fingerprint (normalized md5 + 64-bit prefix)
    "t_fingerprint" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(
          col("doc_id"),
          TextFns.fingerprint(col("text")).as("fp"),
          TextFns.fingerprint64(col("text")).as("fp64"))
        .orderBy(col("doc_id"))
    },
    // Unicode NFC canonicalization (graft.expressions.NfcNormalize,
    // codegen kernel) — run before fingerprinting so combining-mark
    // and precomposed spellings dedup together. The corpus tables are
    // ASCII, so a fixed non-NFC suffix (combining-acute e, then the
    // precomposed form) is appended on BOTH sides to make the
    // composition observable: len_nfc == len_raw - 1 iff the kernel
    // actually composed.
    "t_nfc_normalize" -> { (s, dir) =>
      val raw = concat(
        substring(col("text"), 1, 32),
        lit(" cafe\u0301 caf\u00e9")).as("raw")
      t(s, dir, "documents")
        .select(col("doc_id"), raw)
        .select(
          col("doc_id"),
          length(col("raw")).as("len_raw"),
          length(graft.expressions.NfcNormalize.nfcNormalize(col("raw")))
            .as("len_nfc"),
          md5(graft.expressions.NfcNormalize.nfcNormalize(col("raw")))
            .as("nfc_md5"))
        .orderBy(col("doc_id"))
    },
    // Homoglyph confusable folding (TextFns.foldHomoglyphs, the
    // Unicode TS #39 skeleton idea on the high-traffic Cyrillic/Greek
    // lookalikes): a dup evading exact-hash dedup via а-for-a swaps
    // re-collides after folding. The corpus is ASCII, so evasion is
    // made OBSERVABLE canary-style: every 10th doc gets a
    // Cyrillic-swapped twin (injection alphabet aeopcxy→аеорсху,
    // shared literal with the oracle); raw equality then fails on
    // every twin that contains a swappable letter while folded
    // equality recovers ALL of them, and folding is pinned as a
    // no-op on the clean text.
    "t_homoglyph" -> { (s, dir) =>
      val fold = TextFns.foldHomoglyphs _
      t(s, dir, "documents")
        .filter(length(trim(col("text"))) > 0 && col("doc_id") % 10 === 0)
        .select(
          col("text"),
          translate(col("text"), "aeopcxy", "аеорсху").as("evaded"))
        .agg(
          count(lit(1)).as("n_twins"),
          sum(when(col("evaded") === col("text"), 1L).otherwise(0L))
            .as("n_exact_raw"),
          sum(when(fold(col("evaded")) === fold(col("text")), 1L).otherwise(0L))
            .as("n_exact_folded"),
          sum(when(fold(col("text")) =!= col("text"), 1L).otherwise(0L))
            .as("n_clean_changed"))
    },
    // BPE-ish token counting (training-data token budgeting)
    "t_token_count" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(
          col("doc_id"),
          TextFns.wordCount(col("text")).as("ws_tokens"),
          TextFns.bpeTokenCount(col("text")).as("bpe_tokens"))
        .orderBy(col("doc_id"))
    },
    // Token-window chunking with stride (64-token windows advancing 32:
    // overlapping LM-pretrain context windows; last window truncates)
    "t_chunk_windows" -> { (s, dir) =>
      TextAnalysis
        .tokenWindows(t(s, dir, "documents"), "text", "doc_id", 64, 32)
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"), col("win_index"))
    },
    // Character-distribution entropy per doc (gibberish/boilerplate
    // signal: natural text ~4.1 bits, repeated chars ~0): each
    // (doc, char) term -p·ln p rounds to micro-nat BIGINTs before the
    // per-doc sum, so accumulation is exact-integer and order-free
    // (the perplexity discipline applied to characters)
    "t_char_entropy" -> { (s, dir) =>
      val cnt = t(s, dir, "documents")
        .filter(length(col("text")) > 0)
        .select(col("doc_id"), explode(split(lower(col("text")), "")).as("ch"))
        .groupBy(col("doc_id"), col("ch"))
        .agg(count(lit(1)).as("c"))
      val p = col("c").cast("double") / col("n").cast("double")
      cnt
        // total chars as a window sum over the per-(doc, char) COUNTS
        // (bounded ~alphabet rows per doc) — a groupBy+join-back would
        // run the corpus-wide char explode/aggregate twice
        .withColumn(
          "n",
          sum(col("c")).over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))))
        .withColumn("t6", round(-(p * log(p)) * lit(1e6), 0).cast("long"))
        .groupBy(col("doc_id"))
        .agg(
          max(col("n")).as("n_chars"),
          (sum(col("t6")).cast("double") / lit(1e6)).as("entropy_nats"))
        .orderBy(col("doc_id"))
    },
    // Mean char entropy per source: because each doc's entropy is an
    // exact micro-nat INTEGER sum, the cross-doc aggregate stays
    // exact too — sum the integers, divide once at the edge (a mean
    // over per-doc doubles would be partition-order-dependent)
    "a_source_entropy" -> { (s, dir) =>
      val cnt = t(s, dir, "documents")
        .filter(length(col("text")) > 0)
        .select(col("doc_id"), col("source"), explode(split(lower(col("text")), "")).as("ch"))
        .groupBy(col("doc_id"), col("source"), col("ch"))
        .agg(count(lit(1)).as("c"))
        .withColumn(
          "n",
          sum(col("c")).over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))))
      val p = col("c").cast("double") / col("n").cast("double")
      cnt
        .withColumn("t6", round(-(p * log(p)) * lit(1e6), 0).cast("long"))
        .groupBy(col("doc_id"), col("source"))
        .agg(sum(col("t6")).as("h6"))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          (sum(col("h6")).cast("double") / (count(lit(1)).cast("double") * lit(1e6)))
            .as("mean_entropy_nats"))
        .orderBy(col("source"))
    },
    // Corpus-drift audit: KL(P_source ‖ P_corpus) over word unigram
    // distributions — how far each source's language drifts from the
    // corpus mix (the mixture-weighting signal DSIR-style samplers
    // consume). Exactness: the micro-nat integer discipline — each
    // (source, word) term p·ln(p/q) rounds to a BIGINT before the
    // per-source sum, so accumulation is order-free. Scale: the token
    // stream collapses ONCE to vocab-bounded (source, word) counts
    // via a map-side-combined hash agg; the corpus distribution and
    // the per-source totals are rollups of THAT table, never a second
    // token pass; the probe joins are vocab-bounded both sides
    // (AQE-planned), and the grand total rides a 1-row broadcast
    // scalar (documented driver-action class).
    "t_source_kl" -> { (s, dir) =>
      val sw = t(s, dir, "documents")
        .select(
          col("source"),
          explode(split(lower(col("text")), "\\s+")).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy(col("source"), col("w"))
        .agg(count(lit(1)).as("c_sw"))
        .persist()
      val cw = sw.groupBy(col("w")).agg(sum(col("c_sw")).as("c_w"))
      val ns = sw.groupBy(col("source")).agg(sum(col("c_sw")).as("n_s"))
      val tot = sw.agg(sum(col("c_sw")).as("n"))
      val p = col("c_sw").cast("double") / col("n_s").cast("double")
      val q = col("c_w").cast("double") / col("n").cast("double")
      sw.join(cw, Seq("w"))
        .join(broadcast(ns), Seq("source"))
        .crossJoin(broadcast(tot))
        .withColumn("t6", round(p * log(p / q) * lit(1e6), 0).cast("long"))
        .groupBy(col("source"))
        .agg(
          max(col("n_s")).as("n_tokens"),
          (sum(col("t6")).cast("double") / lit(1e6)).as("kl_nats"))
        .orderBy(col("source"))
    },
    // Language-ID confusion matrix: declared lang × predicted lang
    // counts — the audit that catches a drifting marker table
    "t_langid_confusion" -> { (s, dir) =>
      t(s, dir, "documents")
        .groupBy(
          col("lang"),
          TextAnalysis.langId(col("text"), langMarkers).as("lang_pred"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("lang_pred"))
    },
    // Classifier calibration table (reliability diagram): the CHEAP
    // prefix classifier — langId on the first 80 chars, the shape a
    // 100 TB ingest gate actually runs to avoid reading whole docs —
    // bucketed by its confidence proxy (the winner's marker-hit
    // count, TextAnalysis.langIdMaxHits), scored against the
    // full-text classification per bucket in exact ppm. Low-hit
    // buckets are coin flips, high-hit buckets near-certain: the
    // curve tells you the confidence floor at which the cheap gate
    // can stand in for the expensive read. (The declared-lang labels
    // live in a different label space — the confusion matrix covers
    // that audit; calibration needs same-space truth.)
    "t_calibration" -> { (s, dir) =>
      val prefix = substring(col("text"), 1, 80)
      t(s, dir, "documents")
        .select(
          TextAnalysis.langId(col("text"), langMarkers).as("full_pred"),
          TextAnalysis.langId(prefix, langMarkers).as("pred"),
          least(TextAnalysis.langIdMaxHits(prefix, langMarkers), lit(5L))
            .as("conf_bucket"))
        .groupBy(col("conf_bucket"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("pred") === col("full_pred"), 1L).otherwise(0L))
            .as("n_agree"))
        .withColumn(
          "agree_ppm",
          expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * n_agree div n_docs AS BIGINT)"))
        .orderBy(col("conf_bucket"))
    },
    // Corpus composition report per (source, lang): counts, token
    // share, quality distribution — all-exact aggregates only
    "t_corpus_stats" -> { (s, dir) =>
      TextAnalysis
        .corpusStats(t(s, dir, "documents"), "text", qualityStops)
        .orderBy(col("source"), col("lang"))
    },
    // Tokenizer fertility per source (BPE-ish tokens per word)
    "t_fertility" -> { (s, dir) =>
      TextAnalysis
        .fertility(t(s, dir, "documents"), "text")
        .orderBy(col("source"))
    },
    // Exact per-source top-5 terms (heavy hitters): two-phase — the
    // token stream collapses to (source, term, n) via a map-side-
    // combined hash agg, and the rank window runs over that
    // vocab-bounded COUNTS table, never the token stream
    "t_top_terms" -> { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"))
        .orderBy(col("n").desc, col("term"))
      t(s, dir, "documents")
        .filter(length(trim(col("text"))) > 0)
        .select(col("source"), explode(TextFns.tokens(col("text"))).as("term"))
        .groupBy(col("source"), col("term"))
        .agg(count(lit(1)).as("n"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 5)
        .select(col("source"), col("rank"), col("term"), col("n"))
        .orderBy(col("source"), col("rank"))
    },
    // Per-key ranked top-k (W1 per-company variant)
    "wp_topk_per_source" -> { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"))
        .orderBy(col("n_chars").desc, col("doc_id"))
      t(s, dir, "documents")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("source"), col("doc_id"), col("n_chars"))
        .orderBy(col("source"), col("doc_id"))
    }
  )

  private def textOracle: Map[String, String] = Map(
    "c1_chunker" ->
      """SELECT doc_id, CAST(gs.i AS BIGINT) AS chunk_index,
        | substring(text, CAST(gs.i*200+1 AS INT), 200) AS chunk
        |FROM documents, LATERAL (SELECT unnest(generate_series(0, CAST(ceil(length(text)/200.0) AS BIGINT)-1)) AS i) gs
        |ORDER BY doc_id, chunk_index""".stripMargin,
    "c2_parse_money" ->
      """WITH b AS (SELECT p_partkey, CAST(round(p_retailprice*100) AS BIGINT) AS cents FROM part)
        |SELECT p_partkey,
        | CASE WHEN p_partkey % 3 = 0 THEN '$' || CAST(cents AS VARCHAR) || 'K'
        |      WHEN p_partkey % 3 = 1 THEN 'about $' || CAST(cents AS VARCHAR) || 'M'
        |      ELSE 'US$' || CAST(cents AS VARCHAR) || 'B' END AS money_str,
        | CASE WHEN p_partkey % 3 = 0 THEN CAST(cents AS DOUBLE) * 1000.0
        |      WHEN p_partkey % 3 = 1 THEN CAST(cents AS DOUBLE) * 1000000.0
        |      ELSE CAST(cents AS DOUBLE) * 1000000000.0 END AS amount_usd
        |FROM b ORDER BY p_partkey""".stripMargin,
    "c3_date_parse" ->
      """SELECT o_orderkey,
        | CASE WHEN o_orderkey % 3 = 0 THEN strftime(o_orderdate, '%Y-%m-%d')
        |      WHEN o_orderkey % 3 = 1 THEN strftime(o_orderdate, '%B %-d, %Y')
        |      ELSE strftime(o_orderdate, '%-m/%-d/%Y') END AS date_str,
        | strftime(o_orderdate, '%Y-%m-%d') AS parsed
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "c9_content_ids" ->
      """SELECT doc_id, md5(text) AS chunk_md5, sha256(text) AS content_sha,
        | substring(regexp_replace(lower(text), '[^a-z0-9]+', '_', 'g'), 1, 50) AS slug
        |FROM documents ORDER BY doc_id""".stripMargin,
    "c10_reading_time" ->
      """SELECT doc_id,
        | CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS word_count,
        | greatest(1, CAST(ceil(len(regexp_split_to_array(trim(text), '\s+')) / 200.0) AS BIGINT)) AS reading_time
        |FROM documents ORDER BY doc_id""".stripMargin,
    "c12_json_extract" ->
      """SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k FROM events
        |WHERE CAST(props->>'$.k' AS BIGINT) > 90 ORDER BY event_id""".stripMargin,
    "f1_source_filter" ->
      """SELECT doc_id, source FROM documents
        |WHERE contains(lower(source), 'src1') ORDER BY doc_id""".stripMargin,
    "f2_min_length" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS text_len FROM documents
        |WHERE length(text) >= 300 ORDER BY doc_id""".stripMargin,
    "f5_risk_scan" ->
      """WITH hits AS (
        | SELECT doc_id, 'capacity' AS risk_type,
        |        CASE WHEN contains(lower(text),'big') THEN 'big' WHEN contains(lower(text),'huge') THEN 'huge' END AS keyword,
        |        'medium' AS severity FROM documents
        | UNION ALL
        | SELECT doc_id, 'freshness',
        |        CASE WHEN contains(lower(text),'stale') THEN 'stale' WHEN contains(lower(text),'old') THEN 'old' END,
        |        'low' FROM documents
        | UNION ALL
        | SELECT doc_id, 'latency',
        |        CASE WHEN contains(lower(text),'slow') THEN 'slow' WHEN contains(lower(text),'lag') THEN 'lag' END,
        |        'high' FROM documents)
        |SELECT doc_id, risk_type, keyword, severity FROM hits
        |WHERE keyword IS NOT NULL ORDER BY doc_id, risk_type""".stripMargin,
    "f12_snippet" ->
      """SELECT doc_id,
        | CASE WHEN length(text) > 100 THEN substring(text,1,100) || '...' ELSE text END AS snip
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t_lang_id" ->
      """WITH h AS (SELECT doc_id,
        | len(list_filter(regexp_split_to_array(trim(text),'\s+'), t -> list_contains(['data','stream','batch'], t))) AS h_data,
        | len(list_filter(regexp_split_to_array(trim(text),'\s+'), t -> list_contains(['table','query','join'], t))) AS h_sql,
        | len(list_filter(regexp_split_to_array(trim(text),'\s+'), t -> list_contains(['vector','hash','key'], t))) AS h_vec
        |FROM documents)
        |SELECT doc_id,
        | CASE WHEN h_data >= h_sql AND h_data >= h_vec THEN 'dataish'
        |      WHEN h_sql >= h_vec THEN 'sqlish' ELSE 'vecish' END AS lang_pred
        |FROM h ORDER BY doc_id""".stripMargin,
    // lang/quality oracle fragments are DERIVED from the engine's own
    // constants (TextAnalysis.qualitySql convention) — a weight or
    // stopword edit re-generates both sides
    "t_quality_score" ->
      s"""WITH b AS (SELECT doc_id,
         | CAST(length(text) AS DOUBLE) AS nc,
         | CAST(len(regexp_split_to_array(trim(text),'\\s+')) AS DOUBLE) AS nt,
         | ${TextAnalysis.stopHitsSql(qualityStops, "regexp_split_to_array(trim(text),'\\s+')")} AS ns
         |FROM documents)
         |SELECT doc_id,
         | ${TextAnalysis.qualitySql("nc", "nt", "ns")} AS quality
         |FROM b ORDER BY doc_id""".stripMargin,
    "t_quality_gate" ->
      s"""WITH b AS (SELECT doc_id, source,
         | CAST(length(text) AS DOUBLE) AS nc,
         | CAST(len(regexp_split_to_array(trim(text),'\\s+')) AS DOUBLE) AS nt,
         | ${TextAnalysis.stopHitsSql(qualityStops, "regexp_split_to_array(trim(text),'\\s+')")} AS ns
         |FROM documents),
         |q AS (SELECT doc_id, source,
         | ${TextAnalysis.qualitySql("nc", "nt", "ns")} AS quality
         |FROM b),
         |r AS (SELECT doc_id, source, quality,
         |  row_number() OVER (PARTITION BY source ORDER BY quality, doc_id) AS rn,
         |  count(*) OVER (PARTITION BY source) AS n
         |FROM q)
         |SELECT doc_id, source, quality FROM r
         |WHERE rn > (4 * n + 9) // 10
         |ORDER BY doc_id""".stripMargin,
    "t_fingerprint" ->
      """SELECT doc_id,
        | md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp,
        | substring(md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))), 1, 16) AS fp64
        |FROM documents ORDER BY doc_id""".stripMargin,
    // chr(769) = U+0301 combining acute, chr(233) = precomposed é —
    // the same decomposed-then-precomposed suffix the Spark side
    // appends; DuckDB's nfc_normalize implements the same UAX #15
    // algorithm as the engine's NfcNormalize kernel
    "t_nfc_normalize" ->
      """WITH r AS (SELECT doc_id,
        |  substr(text, 1, 32) || ' cafe' || chr(769) || ' caf' || chr(233) AS raw
        | FROM documents)
        |SELECT doc_id,
        | length(raw) AS len_raw,
        | length(nfc_normalize(raw)) AS len_nfc,
        | md5(nfc_normalize(raw)) AS nfc_md5
        |FROM r ORDER BY doc_id""".stripMargin,
    // the same injection and the same fold mapping, both interpolated
    // from the TextFns constants (single source of truth)
    "t_homoglyph" -> {
      val f = graft.functions.TextFns.HomoglyphFrom
      val o = graft.functions.TextFns.HomoglyphTo
      s"""WITH tw AS (SELECT text, translate(text, 'aeopcxy', 'аеорсху') AS evaded
         |  FROM documents WHERE length(trim(text)) > 0 AND doc_id % 10 = 0)
         |SELECT CAST(count(*) AS BIGINT) AS n_twins,
         |  CAST(sum(CASE WHEN evaded = text THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_raw,
         |  CAST(sum(CASE WHEN translate(evaded, '$f', '$o') = translate(text, '$f', '$o')
         |       THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_folded,
         |  CAST(sum(CASE WHEN translate(text, '$f', '$o') <> text THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_clean_changed
         |FROM tw""".stripMargin
    },
    "t_token_count" ->
      """SELECT doc_id,
        | CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS ws_tokens,
        | CAST(len(regexp_extract_all(text, ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+| +')) AS BIGINT) AS bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t_chunk_windows" ->
      """WITH d AS (
        | SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        | FROM documents WHERE length(trim(text)) > 0
        |), w AS (
        | SELECT doc_id, toks, len(toks) AS tlen,
        |        CAST(ceil(greatest(len(toks) - 64, 0) / 32.0) AS BIGINT) + 1 AS nwin
        | FROM d
        |)
        |SELECT doc_id, CAST(gs.i AS BIGINT) AS win_index,
        |       CAST(gs.i*32 AS BIGINT) AS start_token,
        |       array_to_string(toks[CAST(gs.i*32+1 AS INT) : CAST(gs.i*32+64 AS INT)], ' ') AS chunk,
        |       CAST(least(64, tlen - gs.i*32) AS BIGINT) AS chunk_tokens
        |FROM w, LATERAL (SELECT unnest(generate_series(0, nwin-1)) AS i) gs
        |ORDER BY doc_id, win_index""".stripMargin,
    "a_source_entropy" ->
      """WITH ch AS (SELECT doc_id, source, unnest(string_split(lower(text), '')) AS ch
        |  FROM documents WHERE length(text) > 0),
        |cnt AS (SELECT doc_id, source, ch, CAST(count(*) AS BIGINT) AS c FROM ch GROUP BY 1, 2, 3),
        |n AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM cnt GROUP BY 1),
        |t AS (SELECT cnt.doc_id, cnt.source,
        |        CAST(round(-((CAST(c AS DOUBLE)/CAST(n AS DOUBLE)) *
        |          ln(CAST(c AS DOUBLE)/CAST(n AS DOUBLE)))*1000000) AS BIGINT) AS t6
        |      FROM cnt JOIN n ON cnt.doc_id = n.doc_id),
        |h AS (SELECT doc_id, source, CAST(SUM(t6) AS BIGINT) AS h6 FROM t GROUP BY 1, 2)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(h6) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 1000000.0) AS mean_entropy_nats
        |FROM h GROUP BY source ORDER BY source""".stripMargin,
    // same micro-nat BIGINT discipline as the entropy family; Spark's
    // split('\s+') drops no empty leading token for these texts, and
    // the length(w)>0 guard makes both sides identical anyway
    "t_source_kl" ->
      """WITH tok AS (SELECT source, unnest(regexp_split_to_array(lower(text), '\s+')) AS w
        |  FROM documents),
        |sw AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c_sw
        |       FROM tok WHERE length(w) > 0 GROUP BY 1, 2),
        |cw AS (SELECT w, CAST(sum(c_sw) AS BIGINT) AS c_w FROM sw GROUP BY 1),
        |ns AS (SELECT source, CAST(sum(c_sw) AS BIGINT) AS n_s FROM sw GROUP BY 1),
        |tot AS (SELECT CAST(sum(c_sw) AS BIGINT) AS n FROM sw),
        |t AS (SELECT sw.source,
        |        ns.n_s,
        |        CAST(round((CAST(c_sw AS DOUBLE)/CAST(n_s AS DOUBLE)) *
        |          ln((CAST(c_sw AS DOUBLE)/CAST(n_s AS DOUBLE)) /
        |             (CAST(c_w AS DOUBLE)/CAST(n AS DOUBLE)))*1000000) AS BIGINT) AS t6
        |      FROM sw JOIN cw ON sw.w = cw.w
        |           JOIN ns ON sw.source = ns.source
        |           CROSS JOIN tot)
        |SELECT source, CAST(max(n_s) AS BIGINT) AS n_tokens,
        |       CAST(SUM(t6) AS DOUBLE) / 1000000.0 AS kl_nats
        |FROM t GROUP BY source ORDER BY source""".stripMargin,
    "t_char_entropy" ->
      """WITH ch AS (SELECT doc_id, unnest(string_split(lower(text), '')) AS ch
        |  FROM documents WHERE length(text) > 0),
        |cnt AS (SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c FROM ch GROUP BY 1, 2),
        |n AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM cnt GROUP BY 1),
        |t AS (SELECT cnt.doc_id, n.n,
        |        CAST(round(-((CAST(c AS DOUBLE)/CAST(n AS DOUBLE)) *
        |          ln(CAST(c AS DOUBLE)/CAST(n AS DOUBLE)))*1000000) AS BIGINT) AS t6
        |      FROM cnt JOIN n ON cnt.doc_id = n.doc_id)
        |SELECT doc_id, max(n) AS n_chars,
        |       CAST(SUM(t6) AS DOUBLE) / 1000000.0 AS entropy_nats
        |FROM t GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // same marker table drives both classifiers, the confidence
    // proxy AND the oracle; the prefix tokenization mirrors Spark's
    // substring-then-tokens exactly
    "t_calibration" ->
      s"""WITH tok AS (SELECT regexp_split_to_array(trim(text),'\\s+') AS tk,
         |    regexp_split_to_array(trim(substr(text, 1, 80)),'\\s+') AS pk FROM documents),
         |p AS (SELECT ${TextAnalysis.langIdSql(langMarkers, "tk")} AS full_pred,
         |        ${TextAnalysis.langIdSql(langMarkers, "pk")} AS pred,
         |        least(CAST(${TextAnalysis.langIdMaxHitsSql(langMarkers, "pk")} AS BIGINT), 5) AS conf_bucket
         |      FROM tok)
         |SELECT conf_bucket, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN pred = full_pred THEN 1 ELSE 0 END) AS BIGINT) AS n_agree,
         |  CAST(1000000 * sum(CASE WHEN pred = full_pred THEN 1 ELSE 0 END) // count(*) AS BIGINT)
         |    AS agree_ppm
         |FROM p GROUP BY 1 ORDER BY conf_bucket""".stripMargin,
    "t_langid_confusion" ->
      s"""WITH tok AS (SELECT doc_id, lang, regexp_split_to_array(trim(text),'\\s+') AS tk FROM documents)
         |SELECT lang, ${TextAnalysis.langIdSql(langMarkers, "tk")} AS lang_pred,
         |       CAST(count(*) AS BIGINT) AS n
         |FROM tok GROUP BY 1, 2 ORDER BY lang, lang_pred""".stripMargin,
    "t_corpus_stats" -> {
      // derived from the engine's own constants (qualitySql/stopHitsSql)
      // so a weight/stopword edit re-generates both sides
      val tk = "regexp_split_to_array(trim(text),'\\s+')"
      s"""WITH b AS (SELECT source, lang,
         |  CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len($tk) END AS toks,
         |  CAST(length(text) AS DOUBLE) AS nc, CAST(len($tk) AS DOUBLE) AS nt,
         |  ${TextAnalysis.stopHitsSql(qualityStops, tk)} AS ns
         |FROM documents),
         |q AS (SELECT source, lang, toks, ${TextAnalysis.qualitySql("nc", "nt", "ns")} AS q FROM b),
         |g AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS docs,
         |        CAST(sum(toks) AS BIGINT) AS tokens,
         |        CAST(count(*) FILTER (q >= 0.5) AS BIGINT) AS hi_q,
         |        min(q) AS min_quality, max(q) AS max_quality
         |      FROM q GROUP BY 1, 2)
         |SELECT source, lang, docs, tokens,
         |       CAST(tokens AS DOUBLE) / CAST((SELECT sum(tokens) FROM g) AS DOUBLE) AS token_share,
         |       CAST(hi_q AS DOUBLE) / CAST(docs AS DOUBLE) AS hi_quality_frac,
         |       min_quality, max_quality
         |FROM g ORDER BY source, lang""".stripMargin
    },
    "t_fertility" -> {
      val ws = "CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(regexp_split_to_array(trim(text),'\\s+')) END"
      val bpe = s"len(regexp_extract_all(text, '${TextFns.bpeTokenPattern}'))"
      s"""WITH b AS (SELECT source, CAST($ws AS BIGINT) AS ws, CAST($bpe AS BIGINT) AS bpe FROM documents),
         |g AS (SELECT source, CAST(sum(ws) AS BIGINT) AS ws_tokens, CAST(sum(bpe) AS BIGINT) AS bpe_tokens,
         |        min(CASE WHEN ws > 0 THEN CAST(bpe AS DOUBLE)/CAST(ws AS DOUBLE) END) AS min_fertility,
         |        max(CASE WHEN ws > 0 THEN CAST(bpe AS DOUBLE)/CAST(ws AS DOUBLE) END) AS max_fertility
         |      FROM b GROUP BY 1)
         |SELECT source, ws_tokens, bpe_tokens,
         |       CASE WHEN ws_tokens > 0 THEN CAST(bpe_tokens AS DOUBLE)/CAST(ws_tokens AS DOUBLE) END AS fertility,
         |       min_fertility, max_fertility
         |FROM g ORDER BY source""".stripMargin
    },
    "t_top_terms" ->
      """WITH tok AS (SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |  FROM documents WHERE length(trim(text)) > 0),
        |cnt AS (SELECT source, term, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY 1, 2),
        |rk AS (SELECT source, term, n,
        |         CAST(row_number() OVER (PARTITION BY source ORDER BY n DESC, term) AS BIGINT) AS rank
        |       FROM cnt)
        |SELECT source, rank, term, n FROM rk WHERE rank <= 5
        |ORDER BY source, rank""".stripMargin,
    "wp_topk_per_source" ->
      """SELECT source, doc_id, n_chars FROM (
        | SELECT source, doc_id, n_chars,
        |        row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rn
        | FROM documents) WHERE rn <= 3 ORDER BY source, doc_id""".stripMargin
  )

  // ---------------------------------------------------------------
  // Dedup-family queries (training-data pipeline ops)
  // ---------------------------------------------------------------

  private def dedupQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dd_exact_dedup" -> { (s, dir) =>
      Dedup
        .exact(t(s, dir, "documents"), "text", "doc_id")
        .select(col("doc_id"), TextFns.fingerprint(col("text")).as("fp"))
        .orderBy(col("doc_id"))
    },
    "dd_jaccard_pairs" -> { (s, dir) =>
      // the suite-wide memoized pair set (SparkEntryCoverage
      // .docNgramPairs) — this query IS the pair set, sorted
      SparkEntryCoverage.docNgramPairs(s, dir)
        .orderBy(col("id_a"), col("id_b"))
    },
    // PREFIX-FILTERED Jaccard pairs (Dedup.prefixJaccardPairs —
    // SSJoin/All-Pairs/PPJoin): the candidate join explodes only each
    // doc's rarest |x|-⌈t|x|⌉+1 shingles, the filter is lossless, and
    // the merge-walk kernel re-scores survivors exactly. Run at the
    // 0.8 near-dup operating point — where the prefix is ~20% of each
    // doc and the candidate space collapses (measured 13,985 → 252
    // candidate rows at sf0.01); at permissive thresholds the
    // threshold-blind full join is the right tool, and OperatorsSpec
    // pins prefix == full there.
    "dd_prefix_jaccard" -> { (s, dir) =>
      Dedup
        .prefixJaccardPairs(t(s, dir, "documents"), "text", "doc_id", 3, 0.8)
        .orderBy(col("id_a"), col("id_b"))
    },
    "dd_minhash_pairs" -> { (s, dir) =>
      Dedup
        .minhashLshPairs(t(s, dir, "documents"), "text", "doc_id", 3, 8, 1, 0.05)
        .orderBy(col("id_a"), col("id_b"))
    },
    // Span-level decontamination: excise the tokens covered by any
    // benchmark-overlapping 5-gram from training docs and reassemble,
    // instead of dropping whole docs — overlapping n-grams on BOTH
    // sides catch a leak at any token offset
    "dd_excise" -> { (s, dir) =>
      val d = t(s, dir, "documents")
      Dedup
        .exciseContaminated(
          d.filter(col("source") =!= "src0"),
          d.filter(col("source") === "src0"),
          "text",
          "doc_id",
          5)
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"))
    },
    // Shared-span pairs via winnowing fingerprints — the approximate
    // ExactSubstr dedup (Lee et al. 2021): >= 2 shared winnow
    // fingerprints witness long verbatim character spans; the df-cap
    // kills boilerplate fingerprints before they pair quadratically
    "dd_span_pairs" -> { (s, dir) =>
      Dedup
        .winnowSpanPairs(t(s, dir, "documents"), "text", "doc_id", 8, 10, 10, 2)
        .orderBy(col("id_a"), col("id_b"))
    },
    // Containment pairs — the asymmetric axis next to Jaccard: every
    // 6th doc gets a planted "quote" doc holding only its first 12
    // tokens (id map n -> 2n, quote -> 2n+1, collision-free at any
    // SF). The quote's shingles are a subset of its source's, so
    // containment = 1.0 while Jaccard is tiny — exactly the
    // embedded-document case the operator exists for.
    "dd_containment_pairs" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
        .select((col("doc_id") * 2).as("doc_id"), col("text"))
      val quotes = docs
        .filter(col("doc_id") % 12 === 0)
        .select(
          (col("doc_id") + 1).as("doc_id"),
          array_join(slice(TextFns.tokens(col("text")), 1, 12), " ").as("text"))
      Dedup
        .containmentPairs(docs.unionByName(quotes), "text", "doc_id", 3, 0.8)
        .orderBy(col("id_a"), col("id_b"))
    }
  )

  // the engine caps shingle document-frequency at 1000 (stop-shingle
  // drop) BEFORE both the intersection counts and the set sizes —
  // QUALIFY mirrors that cap so the oracle agrees on any corpus
  // where it actually fires (df of a shingle string == df of its
  // 64-bit hash, the only thing the engine sees). Parameterized by
  // threshold: the all-shingle join runs the survey's 0.2, the
  // prefix-filtered variant its operational 0.8 — and the prefix ==
  // full equality is pinned by OperatorsSpec at shared thresholds.
  private def jaccardPairsScoredSqlAt(threshold: Double): String =
    s"""WITH tok AS (SELECT doc_id, regexp_split_to_array(trim(text),'\\s+') AS tk FROM documents),
       |sh0 AS (SELECT doc_id, unnest(list_distinct(list_transform(generate_series(1, len(tk)-2),
       |        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS shingle
       |       FROM tok WHERE len(tk) >= 3),
       |sh AS (SELECT doc_id, shingle FROM sh0
       |       QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= 1000),
       |sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
       |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
       |          FROM sh a JOIN sh b USING (shingle) WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
       |SELECT id_a, id_b,
       |       CAST(common AS DOUBLE) / CAST(sa.sz + sb.sz - common AS DOUBLE) AS jaccard
       |FROM pairs JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
       |WHERE CAST(common AS DOUBLE) / CAST(sa.sz + sb.sz - common AS DOUBLE) >= $threshold
       |ORDER BY id_a, id_b""".stripMargin

  private def dedupOracle: Map[String, String] = Map(
    "dd_exact_dedup" ->
      """SELECT doc_id, fp FROM (
        | SELECT doc_id, md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp,
        |        row_number() OVER (PARTITION BY md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) ORDER BY doc_id) AS rn
        | FROM documents) WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "dd_jaccard_pairs" -> jaccardPairsScoredSqlAt(0.2),
    // lossless candidate pruning, exact merge-walk verify — same
    // semantics as dd_jaccard_pairs at its own 0.8 operating point
    // (the regime where prefix filtering pays; OperatorsSpec pins
    // prefix == full at shared thresholds)
    "dd_prefix_jaccard" -> jaccardPairsScoredSqlAt(0.8),
    "dd_containment_pairs" ->
      // same shingle/df-cap mirror as dd_jaccard_pairs over the
      // quote-planted corpus; score = |A∩B| / min(|A|,|B|)
      """WITH base AS (SELECT doc_id * 2 AS doc_id, text FROM documents),
        |q0 AS (SELECT doc_id, regexp_split_to_array(trim(text),'\s+') AS tk
        |       FROM base WHERE doc_id % 12 = 0),
        |quotes AS (SELECT doc_id + 1 AS doc_id, array_to_string(tk[1:12], ' ') AS text FROM q0),
        |alldocs AS (SELECT doc_id, text FROM base UNION ALL SELECT doc_id, text FROM quotes),
        |tok AS (SELECT doc_id, regexp_split_to_array(trim(text),'\s+') AS tk FROM alldocs),
        |sh0 AS (SELECT doc_id, unnest(list_distinct(list_transform(generate_series(1, len(tk)-2),
        |        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS shingle
        |       FROM tok WHERE len(tk) >= 3),
        |sh AS (SELECT doc_id, shingle FROM sh0
        |       QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= 1000),
        |sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
        |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
        |          FROM sh a JOIN sh b USING (shingle) WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |       CAST(common AS DOUBLE) / CAST(least(sa.sz, sb.sz) AS DOUBLE) AS containment
        |FROM pairs JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
        |WHERE CAST(common AS DOUBLE) / CAST(least(sa.sz, sb.sz) AS DOUBLE) >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,
    "dd_excise" ->
      """WITH tok AS (SELECT doc_id, source, regexp_split_to_array(trim(text), '\s+') AS tk
        |             FROM documents WHERE length(trim(text)) > 0),
        |bench AS (SELECT DISTINCT unnest(list_transform(generate_series(1, len(tk)-4),
        |           i -> tk[i]||' '||tk[i+1]||' '||tk[i+2]||' '||tk[i+3]||' '||tk[i+4])) AS gram
        |          FROM tok WHERE source = 'src0' AND len(tk) >= 5),
        |corp AS (SELECT doc_id, tk FROM tok WHERE source <> 'src0'),
        |grams AS (SELECT doc_id, i - 1 AS p, array_to_string(tk[i:i+4], ' ') AS gram
        |          FROM corp, LATERAL (SELECT unnest(generate_series(1, len(tk) - 4)) AS i)),
        |matched AS (SELECT doc_id, p FROM grams JOIN bench USING (gram)),
        |covered AS (SELECT DISTINCT doc_id, p + d AS pos
        |            FROM matched, LATERAL (SELECT unnest(generate_series(0, 4)) AS d)),
        |toks AS (SELECT doc_id, i - 1 AS pos, tk[i] AS tok, len(tk) AS n_toks
        |         FROM corp, LATERAL (SELECT unnest(generate_series(1, len(tk))) AS i)),
        |kept AS (SELECT t.doc_id, t.pos, t.tok, t.n_toks FROM toks t
        |         WHERE NOT EXISTS (SELECT 1 FROM covered c
        |                           WHERE c.doc_id = t.doc_id AND c.pos = t.pos))
        |SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
        |       CAST(count(*) AS BIGINT) AS n_kept,
        |       CAST(max(n_toks) - count(*) AS BIGINT) AS n_dropped
        |FROM kept GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "dd_span_pairs" ->
      // winnow k=8 w=10 as in t_winnow's oracle (same fp values both
      // sides); df-cap 10 mirrored with QUALIFY before the pair join
      """WITH grams AS (
        | SELECT doc_id, greatest(length(text) - 7, 0) AS n,
        |        list_transform(generate_series(1, greatest(length(text) - 7, 0)),
        |                       i -> substring(md5(substring(text, CAST(i AS INT), 8)), 1, 8)) AS hs
        | FROM documents),
        |wins AS (
        | SELECT doc_id,
        |        list_distinct(list_transform(generate_series(1, n - 9),
        |                      i -> list_aggregate(hs[i:i+9], 'min'))) AS fps
        | FROM grams WHERE n >= 10),
        |fp0 AS (SELECT doc_id, unnest(fps) AS fp FROM wins),
        |fp AS (SELECT doc_id, fp FROM fp0 QUALIFY COUNT(*) OVER (PARTITION BY fp) <= 10)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS shared_fps
        |FROM fp a JOIN fp b USING (fp) WHERE a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING COUNT(*) >= 2
        |ORDER BY id_a, id_b""".stripMargin,
    "dd_minhash_pairs" ->
      """WITH tok AS (SELECT doc_id, regexp_split_to_array(trim(text),'\s+') AS tk FROM documents),
        |shl AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, len(tk)-2),
        |         i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sh
        |        FROM tok WHERE len(tk) >= 3),
        |sig AS (SELECT doc_id, sh, list_transform(generate_series(0, 7),
        |         i -> list_aggregate(list_transform(sh, s -> list_reduce(
        |                list_transform(generate_series(1, 8), d -> strpos('0123456789abcdef',
        |                  substring(CASE WHEN i // 4 = 0 THEN md5(s) ELSE md5(CAST(i // 4 AS VARCHAR) || ':' || s) END,
        |                            CAST((i % 4) * 8 + d AS INT), 1)) - 1),
        |                (a, b) -> a * 16 + b)), 'min')) AS sg
        |        FROM shl WHERE len(sh) > 0),
        |banded AS (SELECT doc_id, gs.b AS band, md5(CAST(sg[gs.b + 1] AS VARCHAR)) AS bucket
        |           FROM sig, LATERAL (SELECT unnest(generate_series(0, 7)) AS b) gs),
        |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |         FROM banded a JOIN banded b ON a.band = b.band AND a.bucket = b.bucket
        |         WHERE a.doc_id < b.doc_id)
        |SELECT id_a, id_b,
        |       CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
        |       CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS DOUBLE) AS jaccard
        |FROM cand JOIN shl sa ON sa.doc_id = id_a JOIN shl sb ON sb.doc_id = id_b
        |WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
        |      CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS DOUBLE) >= 0.05
        |ORDER BY id_a, id_b""".stripMargin
  )

  // ---------------------------------------------------------------
  // Vector / similarity queries (SURVEY §2.9) + RAG pipeline (E1)
  // ---------------------------------------------------------------

  /** DuckDB mirror of the CosineSimilarity expression: sequential
    * left-fold in double — bit-exact vs the codegen loop.
    */
  private def sqlCosine(a: String, b: String): String = {
    val n = s"least(len($a), len($b))"
    def fold(x: String, y: String) =
      s"list_reduce(list_transform(generate_series(1, $n), i -> CAST($x[i] AS DOUBLE)*CAST($y[i] AS DOUBLE)), (x,y) -> x+y)"
    s"""CASE WHEN sqrt(${fold(a, a)}) * sqrt(${fold(b, b)}) = 0 THEN 0.0
       | ELSE ${fold(a, b)} / (sqrt(${fold(a, a)}) * sqrt(${fold(b, b)}))
       | END""".stripMargin
  }

  private def vectorQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // V2 — brute-force cosine top-k vs the vec_id=0 query vector
    "v2_cosine_topk" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val q = broadcast(emb.filter(col("vec_id") === 0).select(col("embedding").as("q")))
      emb
        .filter(col("vec_id") =!= 0)
        .crossJoin(q)
        .withColumn("score", VectorFns.cosine(col("embedding"), col("q")))
        .select(col("vec_id"), col("label"), col("score"))
        .orderBy(col("score").desc, col("vec_id"))
        .limit(10)
    },
    // MMR diversified re-rank: top-20 retrieval shortlist → greedy
    // λ·rel − (1−λ)·maxSim selection of 5 (Carbonell & Goldstein
    // 1998) — near-duplicate hits stop crowding the result list. The
    // corpus-wide top-20 is distributed (TakeOrderedAndProject); only
    // the bounded shortlist rides to the driver for the inherently
    // sequential greedy chain (see Similarity.mmrRerank).
    "r_mmr_rerank" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val q = broadcast(
        emb.filter(col("vec_id") === 0).select(col("embedding").as("q")))
      val pool = emb
        .filter(col("vec_id") =!= 0)
        .crossJoin(q)
        .withColumn("score", VectorFns.cosine(col("embedding"), col("q")))
        .select(col("vec_id"), col("embedding"), col("score"))
        .orderBy(col("score").desc, col("vec_id"))
        .limit(20)
      Similarity
        .mmrRerank(pool, "vec_id", "embedding", "score", 5, 0.7, 0.3)
        .select(col("rank"), col("vec_id"), col("score"), col("mmr"))
        .orderBy(col("rank"))
    },
    // V3 — metadata-filtered search: predicate BELOW the top-k
    "v3_filtered_topk" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val q = broadcast(emb.filter(col("vec_id") === 0).select(col("embedding").as("q")))
      emb
        .filter(col("vec_id") =!= 0 && col("label") === 1)
        .crossJoin(q)
        .withColumn("score", VectorFns.cosine(col("embedding"), col("q")))
        .select(col("vec_id"), col("label"), col("score"))
        .orderBy(col("score").desc, col("vec_id"))
        .limit(5)
    },
    // int8 scalar quantization of the embedding store (per-vector
    // scale; codes joined to a csv so the compare is schema-simple)
    "v_int8_quant" -> { (s, dir) =>
      Similarity
        .int8Quantize(t(s, dir, "embeddings"), "vec_id", "embedding")
        .select(
          col("id").as("vec_id"),
          col("scale"),
          concat_ws(",", col("qvec")).as("qvec_csv"))
        .orderBy(col("vec_id"))
    },
    // Semantic decontamination: corpus rows whose max cosine vs any
    // held-out benchmark vector reaches 0.35 are dropped; bench rides
    // as a constant literal, so the pass is map-only (no join/shuffle)
    "dd_semantic_decontam" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Similarity
        .semanticDecontaminate(
          emb.filter(col("vec_id") % 20 =!= 0),
          emb.filter(col("vec_id") % 20 === 0),
          "embedding",
          0.35)
        .select(col("vec_id"), col("label"), col("bench_sim"))
        .orderBy(col("vec_id"))
    },
    // exact 1-NN self-join (embedding near-dup baseline)
    "v_nn_top1" -> { (s, dir) =>
      Similarity
        .nearestNeighborJoin(t(s, dir, "embeddings"), "vec_id", "embedding")
        .orderBy(col("id"))
    },
    // E1 — RAG retrieval end-to-end (chunk → embed → filter → topk)
    "rag_e2e" -> { (s, dir) =>
      pipelines.Rag.topKChunks(
        t(s, dir, "documents"),
        "spark join window",
        10,
        chunkSize = 200,
        dim = 16,
        sourceContains = Some("src1"))
    }
  )

  private def vectorOracle: Map[String, String] = Map(
    "v2_cosine_topk" ->
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
         |SELECT vec_id, label, ${sqlCosine("embedding", "qe")} AS score
         |FROM embeddings, q WHERE vec_id <> 0
         |ORDER BY score DESC, vec_id LIMIT 10""".stripMargin,
    "v3_filtered_topk" ->
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
         |SELECT vec_id, label, ${sqlCosine("embedding", "qe")} AS score
         |FROM embeddings, q WHERE vec_id <> 0 AND label = 1
         |ORDER BY score DESC, vec_id LIMIT 5""".stripMargin,
    // unrolled greedy MMR: step i picks argmax(0.7·score − 0.3·max
    // sim to steps 1..i−1), ties on vec_id — the same IEEE chain as
    // Similarity.mmrRerank (0.3 is a LITERAL on both sides; 1.0−0.7
    // is a different double)
    "r_mmr_rerank" -> {
      def sel(i: Int): String =
        if (i == 1)
          """s1 AS (SELECT 1 AS rank, vec_id, score, 0.7*score AS mmr FROM pool
            |       ORDER BY mmr DESC, vec_id LIMIT 1)""".stripMargin
        else {
          val prev = (1 until i).map(j => s"SELECT vec_id FROM s$j").mkString(" UNION ALL ")
          s"""s$i AS (SELECT $i AS rank, p.vec_id, p.score,
             |  0.7*p.score - 0.3*(SELECT max(s) FROM sims WHERE ia = p.vec_id AND ib IN ($prev)) AS mmr
             |  FROM pool p WHERE p.vec_id NOT IN ($prev)
             |  ORDER BY mmr DESC, p.vec_id LIMIT 1)""".stripMargin
        }
      val selects = (1 to 5).map(i => s"SELECT * FROM s$i").mkString(" UNION ALL ")
      s"""WITH pool AS (SELECT vec_id, embedding, score FROM (
         |  SELECT e.vec_id, e.embedding, ${sqlCosine("e.embedding", "q.qe")} AS score
         |  FROM embeddings e, (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0) q
         |  WHERE e.vec_id <> 0)
         | ORDER BY score DESC, vec_id LIMIT 20),
         |sims AS (SELECT a.vec_id AS ia, b.vec_id AS ib, ${sqlCosine("a.embedding", "b.embedding")} AS s
         |         FROM pool a JOIN pool b ON a.vec_id <> b.vec_id),
         |${(1 to 5).map(sel).mkString(",\n")}
         |SELECT rank, vec_id, score, mmr FROM ($selects) ORDER BY rank""".stripMargin
    },
    "v_int8_quant" ->
      """WITH b AS (SELECT vec_id,
        |  list_max(list_transform(embedding, v -> abs(CAST(v AS DOUBLE)))) AS ma
        |  FROM embeddings WHERE embedding IS NOT NULL),
        |s AS (SELECT vec_id, CASE WHEN ma > 0.0 THEN 127.0 / ma ELSE 0.0 END AS scale FROM b)
        |SELECT e.vec_id, s.scale,
        |       array_to_string(list_transform(e.embedding, v ->
        |         greatest(-127, least(127, CAST(round(CAST(v AS DOUBLE) * s.scale) AS BIGINT)))), ',') AS qvec_csv
        |FROM embeddings e JOIN s ON e.vec_id = s.vec_id
        |ORDER BY e.vec_id""".stripMargin,
    "dd_semantic_decontam" ->
      s"""WITH bench AS (SELECT embedding AS be FROM embeddings WHERE vec_id % 20 = 0),
         |corpus AS (SELECT vec_id, label, embedding FROM embeddings
         |           WHERE vec_id % 20 <> 0 AND embedding IS NOT NULL),
         |sims AS (SELECT c.vec_id, c.label, max(${sqlCosine("c.embedding", "b.be")}) AS bench_sim
         |         FROM corpus c, bench b GROUP BY 1, 2)
         |SELECT vec_id, label, bench_sim FROM sims
         |WHERE bench_sim < 0.35 ORDER BY vec_id""".stripMargin,
    "v_nn_top1" ->
      s"""SELECT id, nn_id, score FROM (
         | SELECT a.vec_id AS id, b.vec_id AS nn_id,
         |        ${sqlCosine("a.embedding", "b.embedding")} AS score,
         |        row_number() OVER (PARTITION BY a.vec_id
         |          ORDER BY ${sqlCosine("a.embedding", "b.embedding")} DESC, b.vec_id) AS rn
         | FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id)
         |WHERE rn = 1 ORDER BY id""".stripMargin,
    "rag_e2e" -> {
      val bucket =
        "((strpos('0123456789abcdef', substring(md5(t), 1, 1)) - 1) % 16)"
      s"""WITH chunks AS (
         | SELECT doc_id, source, CAST(gs.i AS BIGINT) AS chunk_index,
         |        substring(text, CAST(gs.i*200+1 AS INT), 200) AS chunk
         | FROM documents, LATERAL (SELECT unnest(generate_series(0, CAST(ceil(length(text)/200.0) AS BIGINT)-1)) AS i) gs
         | WHERE contains(lower(source), 'src1')),
         |vec AS (
         | SELECT doc_id, chunk_index, source,
         |        list_transform(generate_series(0, 15), j -> CAST(len(list_filter(
         |          regexp_split_to_array(trim(chunk), '\\s+'), t -> $bucket = j)) AS DOUBLE)) AS v
         | FROM chunks),
         |q AS (
         | SELECT list_transform(generate_series(0, 15), j -> CAST(len(list_filter(
         |          regexp_split_to_array(trim('spark join window'), '\\s+'), t -> $bucket = j)) AS DOUBLE)) AS qv)
         |SELECT doc_id, chunk_index, source, ${sqlCosine("v", "qv")} AS score
         |FROM vec, q
         |ORDER BY score DESC, doc_id, chunk_index LIMIT 10""".stripMargin
    }
  )

  // ---------------------------------------------------------------
  // Misc: remaining SURVEY §2 ops — theta/fuzzy joins, payload
  // assembly, first-match join, set aggs, regex extractors,
  // classifier chains, incremental work-list, simhash, multimodal
  // ---------------------------------------------------------------

  private def miscQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // J2 — broadcast substring theta-join (structured_extraction_v2.py:1005-1014)
    "j2_substring_join" -> { (s, dir) =>
      import s.implicits._
      val lexicon = broadcast(Seq("data", "spark", "join", "merge").toDF("kw"))
      t(s, dir, "documents")
        .join(lexicon, col("text").contains(col("kw")))
        .groupBy(col("kw"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("kw"))
    },
    // J4 — normalized fuzzy key join (structured_extraction_v2.py:952-1001)
    "j4_normalized_join" -> { (s, dir) =>
      import s.implicits._
      val dim = broadcast(Seq("src-1", "src-3", "src-15").toDF("post_key"))
      t(s, dir, "documents")
        .join(dim, regexp_replace(lower(col("post_key")), "-", "") === col("source"))
        .groupBy(col("post_key"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("post_key"))
    },
    // J6 — nested payload assembly (structured_extraction_v2.py:3484-3494)
    "j6_customer_payload" -> { (s, dir) =>
      val o = t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(
          count(lit(1)).as("cnt"),
          array_join(sort_array(collect_list(col("o_orderkey"))), ",").as("csv"),
          dsum(col("o_totalprice")).as("total"))
      t(s, dir, "customer")
        .join(o, col("c_custkey") === col("o_custkey"), "left")
        .select(
          col("c_custkey"),
          col("c_name"),
          coalesce(col("cnt"), lit(0L)).as("n_orders"),
          coalesce(col("csv"), lit("")).as("orderkeys_csv"),
          coalesce(col("total"), lit(0.0)).as("total_spent"))
        .orderBy(col("c_custkey"))
    },
    // J7 — first-match join (structured_extraction_v2.py:2259-2280)
    "j7_first_match_join" -> { (s, dir) =>
      val heavy = t(s, dir, "lineitem").filter(col("l_quantity") >= 49)
      val joined = t(s, dir, "supplier")
        .join(heavy, col("s_suppkey") === col("l_suppkey"))
      Relational
        .dedupeFirstWins(
          joined,
          Seq(col("s_suppkey")),
          Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber")))
        .select(
          col("s_suppkey"),
          col("s_name"),
          col("l_orderkey"),
          col("l_linenumber"))
        .orderBy(col("s_suppkey"))
    },
    // D8 — set union / collect_set (structured_extraction_v2.py:2836-2837)
    "d8_source_sets" -> { (s, dir) =>
      t(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(array_join(sort_array(collect_set(col("source"))), ",").as("sources_csv"))
        .orderBy(col("lang"))
    },
    // F10 — amount-threshold predicate (scraper_v2.py:2509)
    "f10_amount_threshold" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_extendedprice") >= 90000)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_items"), dsum(col("l_extendedprice")).as("total_price"))
        .orderBy(col("l_returnflag"))
    },
    // C4 — founded-year regex extraction (structured_extraction_v2.py:351-441)
    "c4_founded_year" -> { (s, dir) =>
      val yr = year(col("o_orderdate")).cast("string")
      val str = when(col("o_orderkey") % 2 === 0, concat(lit("founded in "), yr))
        .otherwise(concat(lit("established back in "), yr))
      val extracted = coalesce(
        nullif(regexp_extract(col("blurb"), "founded in (\\d{4})", 1), lit("")),
        nullif(regexp_extract(col("blurb"), "established.*?(\\d{4})", 1), lit("")))
        .cast("long")
      t(s, dir, "orders")
        .select(col("o_orderkey"), str.as("blurb"))
        .withColumn(
          "founded_year",
          when(extracted.between(1900, 2100), extracted).otherwise(lit(null).cast("long")))
        .orderBy(col("o_orderkey"))
    },
    // C8 — URL normalization (scraper_v2.py:956-970)
    "c8_url_normalize" -> { (s, dir) =>
      val url = concat(lit("https://www."), col("source"), lit(".example.com/p/"), col("doc_id").cast("string"))
      t(s, dir, "documents")
        .select(col("doc_id"), url.as("url"))
        .withColumn(
          "host",
          regexp_replace(regexp_extract(col("url"), "^https?://([^/]+)", 1), "^www\\.", ""))
        .orderBy(col("doc_id"))
    },
    // C17 — keyword classifier chain (scraper_v2.py:2608-2650)
    "c17_classifier" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(
          col("doc_id"),
          when(col("text").contains("stream"), "streaming")
            .when(col("text").contains("batch"), "batch")
            .when(col("text").contains("table"), "relational")
            .otherwise("other")
            .as("category"))
        .orderBy(col("doc_id"))
    },
    // I2 — incremental work-list: changed keys drive reprocessing
    // (orbit_daily_update_dag.py:233-299)
    "i2_worklist" -> { (s, dir) =>
      val e = t(s, dir, "events")
      def half(p: Column): DataFrame =
        e.filter(p)
          .groupBy(col("user_id"), col("event_type"))
          .agg(
            count(lit(1)).as("cnt"),
            sum((col("value") * 100).cast("decimal(18,0)")).cast("long").as("cents"))
          .withColumn(
            "snap_hash",
            md5(concat_ws(":", col("cnt").cast("string"), col("cents").cast("string"))))
      val cut = lit("2024-01-16 00:00:00").cast("timestamp")
      val changed = Relational
        .changeDetection(
          half(col("ts") < cut),
          half(col("ts") >= cut),
          Seq("user_id", "event_type"),
          "snap_hash")
        .filter(col("status") === "changed")
        .select(col("user_id"), col("event_type"))
      e.filter(col("ts") >= cut)
        .join(changed, Seq("user_id", "event_type"), "left_semi")
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n_rows"))
        .orderBy(col("user_id"), col("event_type"))
    },
    // U1 — union by name with missing columns (handle_chunking.py:217)
    "u1_union_by_name" -> { (s, dir) =>
      val a = t(s, dir, "part")
        .select(col("p_partkey").as("id"), col("p_brand").as("tag"), lit("part").as("src"))
      val b = t(s, dir, "supplier")
        .select(col("s_suppkey").as("id"), lit("supplier").as("src"))
      a.unionByName(b, allowMissingColumns = true)
        .orderBy(col("src"), col("id"))
    },
    // SimHash fingerprints (training-data near-dup family)
    "dd_simhash" -> { (s, dir) =>
      Dedup
        .simhashTable(t(s, dir, "documents"), "text", "doc_id")
        .select(col("id").as("doc_id"), col("simhash"))
        .orderBy(col("doc_id"))
    },
    // Multimodal exact dedup: duplicate media detected by content
    // digest WITHOUT decoding (bytes never shuffle — only the 32-byte
    // sha2 rides the groupBy). Every 4th doc's media carries the
    // previous doc's bytes, so the dup groups provably form
    "mm_binary_dedup" -> { (s, dir) =>
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val planted = d.alias("a")
        .join(d.alias("b"), col("a.doc_id") - 1 === col("b.doc_id"), "left")
        .select(
          col("a.doc_id").as("doc_id"),
          when(col("a.doc_id") % 4 === 0 && col("b.text").isNotNull, col("b.text"))
            .otherwise(col("a.text")).as("text"))
      Multimodal
        .fromText(planted, "doc_id", "text", "image")
        .withColumn("fp", sha2(col("content"), 256))
        .groupBy(col("fp"))
        .agg(
          min(col("media_id")).as("canonical_id"),
          count(lit(1)).as("n_copies"),
          concat_ws(",", array_sort(collect_list(col("media_id")))).as("ids_csv"))
        .filter(col("n_copies") > 1)
        .select(col("canonical_id"), col("n_copies"), col("ids_csv"))
        .orderBy(col("canonical_id"))
    },
    // Multimodal stub pipeline — no SQL oracle (rows-only check):
    // binary media column -> mapPartitions feature extraction
    "mm_media_features" -> { (s, dir) =>
      val media = Multimodal.fromText(t(s, dir, "documents"), "doc_id", "text", "image")
      Multimodal
        .extractFeatures(media)
        .select(
          col("media_id"),
          col("n_bytes"),
          element_at(col("features"), 1).as("f0"),
          element_at(col("features"), 2).as("f1"))
        .orderBy(col("media_id"))
    },
    // T17 near-dup: perceptual-hash pairs over the media corpus —
    // aHash bits from the stub features, high-byte prefix buckets,
    // exact Hamming verify (the image analog of dd_simhash_pairs).
    // maxBucket 8 exercises the degenerate-bucket cap: same-language
    // text byte-histograms cluster into a few perceptual classes
    // (39k pairs uncapped at sf0.01 — the quadratic failure the cap
    // exists for), so only discriminative buckets emit pairs.
    "mm_phash_neardup" -> { (s, dir) =>
      val media = Multimodal.fromText(t(s, dir, "documents"), "doc_id", "text", "image")
      Multimodal
        .phashNearDupPairs(media, 2, maxBucket = 8)
        .orderBy(col("id_a"), col("id_b"))
    },
    // T17 persisted: the phash CODES are the build-time artifact (the
    // hash of DECODED media — the expensive step at 100 TB of
    // images); written once partitioned by prefix bucket
    // (Io.writePhashIndex), the dedup consumer loads 2-byte codes and
    // never touches media bytes. Must equal the in-line pair set —
    // one oracle, two paths.
    "mm_phash_persisted" -> { (s, dir) =>
      val media = Multimodal.fromText(t(s, dir, "documents"), "doc_id", "text", "image")
      val idxPath = s"/tmp/graft_idx/phash_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      graft.sources.Io.writePhashIndex(Multimodal.phashCodes(media), idxPath)
      Multimodal
        .phashPairsFromCodes(
          graft.sources.Io.readPhashIndex(s, idxPath), 2, maxBucket = 8)
        .orderBy(col("id_a"), col("id_b"))
    },
    // T17 upsert: the phash index joins the incremental family
    // (Io.upsertPhashIndex) — base codes from the <250 history, the
    // increment hashed and appended at seq 1 (decode+hash runs only
    // on new media), and every 5th doc RE-appended at seq 2: the
    // last-wins reader must collapse the double append to one row
    // per id (a naive union would emit duplicate pairs and fail the
    // oracle) and converge the index to the full-corpus code table —
    // mm_phash_neardup's oracle, one more path.
    "mm_phash_upsert" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val idxPath = s"/tmp/graft_idx/phash_up_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      def codesOf(d: org.apache.spark.sql.DataFrame) =
        Multimodal.phashCodes(Multimodal.fromText(d, "doc_id", "text", "image"))
      graft.sources.Io.writePhashIndex(
        codesOf(docs.filter(col("doc_id") < 250)), idxPath)
      graft.sources.Io.upsertPhashIndex(
        codesOf(docs.filter(col("doc_id") >= 250)), idxPath, seq = 1L)
      graft.sources.Io.upsertPhashIndex(
        codesOf(docs.filter(col("doc_id") % 5 === 0)), idxPath, seq = 2L)
      Multimodal
        .phashPairsFromCodes(
          graft.sources.Io.readPhashIndexLatest(s, idxPath), 2, maxBucket = 8)
        .orderBy(col("id_a"), col("id_b"))
    },
    // T17 time travel: same base+upsert history as mm_phash_upsert
    // plus a seq-2 takedown — the as-of-1 read serves the FULL
    // pre-takedown code table (the later tombstone invisible to the
    // time-travel clock), so its pair set equals the in-line
    // full-corpus run: mm_phash_neardup's oracle, one more path.
    "mm_phash_asof" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val idxPath = s"/tmp/graft_idx/phash_asof_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      def codesOf(d: org.apache.spark.sql.DataFrame) =
        Multimodal.phashCodes(Multimodal.fromText(d, "doc_id", "text", "image"))
      graft.sources.Io.writePhashIndex(
        codesOf(docs.filter(col("doc_id") < 250)), idxPath)
      graft.sources.Io.upsertPhashIndex(
        codesOf(docs.filter(col("doc_id") >= 250)), idxPath, seq = 1L)
      graft.sources.Io.deletePhashIds(
        docs.filter(col("doc_id") % 9 === 0).select(col("doc_id")), idxPath, seq = 2L)
      Multimodal
        .phashPairsFromCodes(
          graft.sources.Io.readPhashIndexAsOf(s, idxPath, asOfSeq = 1L), 2, maxBucket = 8)
        .orderBy(col("id_a"), col("id_b"))
    },
    // T17 radius tuning: candidate-pair count per Hamming distance
    // over the SAME capped-bucket candidate set (no radius filter) —
    // the dd_threshold_sweep analog for the perceptual hash: read the
    // knee off the histogram, pick the verify radius with evidence
    // instead of folklore.
    "mm_phash_hist" -> { (s, dir) =>
      val media = Multimodal.fromText(t(s, dir, "documents"), "doc_id", "text", "image")
      Multimodal
        .phashNearDupPairs(media, 16, maxBucket = 8)
        .groupBy(col("hamming"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("hamming"))
    },
    // T17 multiprobe: radius-1 prefix probes recover the near-dup
    // pairs whose Hamming distance falls in the PREFIX byte — plain
    // prefix blocking structurally misses them (21 vs 15 pairs at
    // sf0.01); fixed ×9 fan-out on 2-byte codes, exact verify
    // unchanged
    "mm_phash_multiprobe" -> { (s, dir) =>
      val media = Multimodal.fromText(t(s, dir, "documents"), "doc_id", "text", "image")
      Multimodal
        .phashPairsMultiprobe(Multimodal.phashCodes(media), 2, maxBucket = 8)
        .orderBy(col("id_a"), col("id_b"))
    },
    // T17 takedown + compaction: every 9th doc tombstoned
    // (Io.deletePhashIds — codes unservable immediately, no file
    // rewritten), then compactPhashIndex resolves the upsert+delete
    // history to a fresh stamp-0 base and purges the sidecar — the
    // PLAIN reader must serve the survivor pair set (the oracle runs
    // over documents with the takedowns excluded).
    "mm_phash_compacted" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val idxPath = s"/tmp/graft_idx/phash_cmp_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      def codesOf(d: org.apache.spark.sql.DataFrame) =
        Multimodal.phashCodes(Multimodal.fromText(d, "doc_id", "text", "image"))
      graft.sources.Io.writePhashIndex(
        codesOf(docs.filter(col("doc_id") < 250)), idxPath)
      graft.sources.Io.upsertPhashIndex(
        codesOf(docs.filter(col("doc_id") >= 250)), idxPath, seq = 1L)
      graft.sources.Io.deletePhashIds(
        docs.filter(col("doc_id") % 9 === 0).select(col("doc_id")), idxPath, seq = 2L)
      graft.sources.Io.compactPhashIndex(s, idxPath)
      Multimodal
        .phashPairsFromCodes(
          graft.sources.Io.readPhashIndex(s, idxPath), 2, maxBucket = 8)
        .orderBy(col("id_a"), col("id_b"))
    }
  )

  /** DuckDB mirror of Dedup.simhashFingerprint: 16 hex digits, each
    * from 4 bit-votes, votes summed over token md5 bits.
    */
  private def sqlSimhash(tk: String): String = {
    val digits = (0 until 16).map { pos =>
      val votes = (0 until 4).map { bit =>
        val mask = 1 << (3 - bit)
        s"(CASE WHEN list_reduce(list_transform($tk, t -> CASE WHEN (CAST(floor((strpos('0123456789abcdef', substring(md5(t), ${pos + 1}, 1)) - 1) / $mask) AS INT) % 2) = 1 THEN 1 ELSE -1 END), (x,y) -> x+y) > 0 THEN $mask ELSE 0 END)"
      }.mkString(" + ")
      s"substring('0123456789abcdef', ($votes) + 1, 1)"
    }
    digits.mkString(" || ")
  }

  private def miscOracle: Map[String, String] = Map(
    // sha256 of the VARCHAR hashes its UTF-8 bytes — exactly the bytes
    // Multimodal.fromText encodes, so the digests agree
    "mm_binary_dedup" ->
      """WITH planted AS (
        |  SELECT a.doc_id,
        |         CASE WHEN a.doc_id % 4 = 0 AND b.text IS NOT NULL THEN b.text
        |              ELSE a.text END AS text
        |  FROM documents a LEFT JOIN documents b ON a.doc_id - 1 = b.doc_id),
        |g AS (SELECT sha256(text) AS fp,
        |        min(doc_id) AS canonical_id,
        |        CAST(count(*) AS BIGINT) AS n_copies,
        |        array_to_string(list_sort(list(doc_id)), ',') AS ids_csv
        |      FROM planted GROUP BY 1)
        |SELECT canonical_id, n_copies, ids_csv FROM g
        |WHERE n_copies > 1 ORDER BY canonical_id""".stripMargin,
    "j2_substring_join" ->
      """WITH lexicon(kw) AS (VALUES ('data'), ('spark'), ('join'), ('merge'))
        |SELECT kw, CAST(COUNT(*) AS BIGINT) AS n_docs
        |FROM documents JOIN lexicon ON contains(text, kw)
        |GROUP BY kw ORDER BY kw""".stripMargin,
    "j4_normalized_join" ->
      """WITH dim(post_key) AS (VALUES ('src-1'), ('src-3'), ('src-15'))
        |SELECT post_key, CAST(COUNT(*) AS BIGINT) AS n_docs
        |FROM documents JOIN dim ON replace(lower(post_key), '-', '') = source
        |GROUP BY post_key ORDER BY post_key""".stripMargin,
    "j6_customer_payload" ->
      """SELECT c_custkey, c_name,
        | COALESCE(cnt, 0) AS n_orders,
        | COALESCE(csv, '') AS orderkeys_csv,
        | COALESCE(total, 0.0) AS total_spent
        |FROM customer LEFT JOIN (
        | SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS cnt,
        |        array_to_string(list_sort(list(o_orderkey)), ',') AS csv,
        |        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        | FROM orders GROUP BY o_custkey) ON c_custkey = o_custkey
        |ORDER BY c_custkey""".stripMargin,
    "j7_first_match_join" ->
      """SELECT s_suppkey, s_name, l_orderkey, l_linenumber FROM (
        | SELECT s_suppkey, s_name, l_orderkey, l_linenumber,
        |        row_number() OVER (PARTITION BY s_suppkey
        |          ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn
        | FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
        | WHERE l_quantity >= 49) WHERE rn = 1 ORDER BY s_suppkey""".stripMargin,
    "d8_source_sets" ->
      """SELECT lang,
        | array_to_string(list_sort(list_distinct(list(source))), ',') AS sources_csv
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "f10_amount_threshold" ->
      """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_items,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM lineitem WHERE l_extendedprice >= 90000
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "c4_founded_year" ->
      """WITH b AS (
        | SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 2 = 0 THEN 'founded in ' || CAST(year(o_orderdate) AS VARCHAR)
        |       ELSE 'established back in ' || CAST(year(o_orderdate) AS VARCHAR) END AS blurb
        | FROM orders),
        |x AS (
        | SELECT o_orderkey, blurb,
        |  CAST(COALESCE(NULLIF(regexp_extract(blurb, 'founded in (\d{4})', 1), ''),
        |                NULLIF(regexp_extract(blurb, 'established.*?(\d{4})', 1), '')) AS BIGINT) AS y
        | FROM b)
        |SELECT o_orderkey, blurb,
        | CASE WHEN y BETWEEN 1900 AND 2100 THEN y ELSE NULL END AS founded_year
        |FROM x ORDER BY o_orderkey""".stripMargin,
    "c8_url_normalize" ->
      """WITH b AS (
        | SELECT doc_id, 'https://www.' || source || '.example.com/p/' || CAST(doc_id AS VARCHAR) AS url
        | FROM documents)
        |SELECT doc_id, url,
        | regexp_replace(regexp_extract(url, '^https?://([^/]+)', 1), '^www\.', '') AS host
        |FROM b ORDER BY doc_id""".stripMargin,
    "c17_classifier" ->
      """SELECT doc_id,
        | CASE WHEN contains(text, 'stream') THEN 'streaming'
        |      WHEN contains(text, 'batch') THEN 'batch'
        |      WHEN contains(text, 'table') THEN 'relational'
        |      ELSE 'other' END AS category
        |FROM documents ORDER BY doc_id""".stripMargin,
    "i2_worklist" ->
      """WITH halves AS (
        | SELECT user_id, event_type, (ts >= TIMESTAMP '2024-01-16 00:00:00') AS is_new,
        |        COUNT(*) AS cnt,
        |        CAST(SUM(CAST(value * 100 AS DECIMAL(18,0))) AS BIGINT) AS cents
        | FROM events GROUP BY user_id, event_type, is_new),
        |o AS (SELECT user_id, event_type, md5(CAST(cnt AS VARCHAR) || ':' || CAST(cents AS VARCHAR)) AS h FROM halves WHERE NOT is_new),
        |n AS (SELECT user_id, event_type, md5(CAST(cnt AS VARCHAR) || ':' || CAST(cents AS VARCHAR)) AS h FROM halves WHERE is_new),
        |changed AS (
        | SELECT o.user_id, o.event_type FROM o JOIN n
        |   ON o.user_id = n.user_id AND o.event_type = n.event_type
        | WHERE o.h <> n.h)
        |SELECT e.user_id, e.event_type, CAST(COUNT(*) AS BIGINT) AS n_rows
        |FROM events e JOIN changed c ON e.user_id = c.user_id AND e.event_type = c.event_type
        |WHERE e.ts >= TIMESTAMP '2024-01-16 00:00:00'
        |GROUP BY e.user_id, e.event_type ORDER BY e.user_id, e.event_type""".stripMargin,
    "u1_union_by_name" ->
      """SELECT id, tag, src FROM (
        | SELECT p_partkey AS id, p_brand AS tag, 'part' AS src FROM part
        | UNION ALL BY NAME
        | SELECT s_suppkey AS id, 'supplier' AS src FROM supplier)
        |ORDER BY src, id""".stripMargin,
    "dd_simhash" -> {
      s"""WITH tok AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk FROM documents)
         |SELECT doc_id, ${sqlSimhash("tk")} AS simhash
         |FROM tok ORDER BY doc_id""".stripMargin
    },
    // mirror of Multimodal.decodeStub's 16-bin byte histogram —
    // valid because the fixture text is pure ASCII (byte == codepoint)
    "mm_media_features" -> {
      def bin(b: Int) =
        s"CAST(len(list_filter(list_transform(generate_series(1, CAST(length(text) AS INT)), " +
          s"i -> ascii(substring(text, i, 1)) % 16), x -> x = $b)) AS DOUBLE)"
      s"""SELECT doc_id AS media_id, CAST(length(text) AS BIGINT) AS n_bytes,
         | ${bin(0)} AS f0, ${bin(1)} AS f1
         |FROM documents ORDER BY media_id""".stripMargin
    },
    "mm_phash_neardup" -> phashPairsOracleFor("TRUE"),
    "mm_phash_hist" -> phashHistOracle
  )

  /** DuckDB mirror of the phash pair set over `documents WHERE pred`
    * — same byte-histogram as mm_media_features; bit i set when bin
    * count * 16 exceeds the byte length (integer-exact mean test,
    * identical to the Spark side). Shared by the in-line, persisted,
    * upserted and compacted variants (the delete/compaction one
    * restricts the corpus to the takedown survivors).
    */
  private def phashPairsOracleFor(pred: String, probed: Boolean = false): String = {
    def bin(b: Int) =
      s"len(list_filter(list_transform(generate_series(1, CAST(length(text) AS INT)), " +
        s"i -> ascii(substring(text, i, 1)) % 16), x -> x = $b))"
    val phash = (0 until 16)
      .map(i => s"(CASE WHEN ${bin(i)} * 16 > length(text) THEN ${1L << i} ELSE 0 END)")
      .mkString(" + ")
    // plain: same-bucket candidates; probed: side a additionally
    // reaches the 8 one-bit-flip buckets (radius-1 multiprobe)
    val cand =
      if (!probed)
        """p AS (SELECT a.id AS id_a, b.id AS id_b,
          |        bit_count(xor(a.phash, b.phash)) AS hamming
          |      FROM c a JOIN c b ON a.pfx = b.pfx AND a.id < b.id)""".stripMargin
      else
        """pr AS (SELECT id, phash, xor(pfx, CAST(f AS BIGINT)) AS pfx
          |       FROM c, (SELECT unnest([0, 1, 2, 4, 8, 16, 32, 64, 128]) AS f)),
          |p AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b,
          |        bit_count(xor(a.phash, b.phash)) AS hamming
          |      FROM pr a JOIN c b ON a.pfx = b.pfx AND a.id < b.id)""".stripMargin
    s"""WITH h AS (SELECT doc_id AS id, CAST($phash AS BIGINT) AS phash
       |           FROM documents WHERE $pred),
       |hp AS (SELECT id, phash, phash // 256 AS pfx FROM h),
       |small AS (SELECT pfx FROM hp GROUP BY pfx HAVING count(*) <= 8),
       |c AS (SELECT hp.* FROM hp JOIN small USING (pfx)),
       |$cand
       |SELECT id_a, id_b, CAST(hamming AS BIGINT) AS hamming FROM p
       |WHERE hamming <= 2 ORDER BY id_a, id_b""".stripMargin
  }

  /** The same candidate machinery, aggregated into the radius-tuning
    * histogram: candidate-pair count per Hamming distance (no radius
    * filter) — read the knee, pick the verify radius.
    */
  private def phashHistOracle: String = {
    val full = phashPairsOracleFor("TRUE")
    val base = full.substring(0, full.indexOf("SELECT id_a, id_b,"))
    base +
      """SELECT CAST(hamming AS BIGINT) AS hamming, CAST(count(*) AS BIGINT) AS n_pairs
        |FROM p GROUP BY 1 ORDER BY hamming""".stripMargin
  }
}
