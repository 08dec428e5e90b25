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
      // events.ts is Parquet TIMESTAMP(NANOS) which Spark refuses by
      // default; read as long nanos and truncate to microseconds.
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.read
        .parquet(s"$dir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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
      val o = t(s, dir, "orders")
      val agg = o
        .groupBy(col("o_custkey"))
        .agg(dsum(col("o_totalprice")).as("total_spent"), count(lit(1)).as("order_count"))
      val latest = Relational
        .latestPerKey(o, Seq(col("o_custkey")), Seq(col("o_orderdate"), col("o_orderkey")))
        .select(
          col("o_custkey"),
          col("o_orderstatus").as("last_status"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("last_orderdate"))
      agg.join(latest, "o_custkey").orderBy(col("o_custkey"))
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

  def oracleSql: Map[String, String] = Map(
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
}
