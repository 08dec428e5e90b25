package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Third relational wave: the full TPC-H plan-shape suite over the
  * driver's trimmed schema. Q6/Q7/Q10/Q14/Q18/Q19/Q22 mirror their
  * originals (value domains adapted to the synthetic data); the
  * partsupp/shipmode/receipt-commit-dependent queries keep the
  * PLANNER shape with substituted semantics — Q2/Q9/Q11/Q20 emulate
  * supply cost / availqty from lineitem and p_retailprice aggregates,
  * Q12 uses l_returnflag for shipmode with l_shipdate >= o_orderdate
  * as the date-sanity residual, Q21 uses l_returnflag = 'R' as the
  * late marker for its EXISTS / NOT EXISTS anti-join chain. These
  * deepen the analytics surface beyond the reference's own query set:
  * single-pass filtered aggregates, two-sided nation-pair volume
  * joins, returned-item top-k, conditional promo share,
  * having-filtered semi joins, OR-of-brackets join predicates,
  * correlated-aggregate semi joins, and scalar-subquery + anti-join
  * rollups.
  *
  * Scale notes: every dim side is broadcast; q18's HAVING subquery is
  * a semi join on the orders key (no double scan of the fact in the
  * joined plan — AQE reuses the exchange); q19's bracket predicate is
  * partially pushable (p_size/p_brand reach the part scan, quantity
  * reaches lineitem); money math follows the repo determinism rule
  * (exact DECIMAL(18,2) sums, cast to double at the edge).
  */
object SparkEntryTpch {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  private def rev = // l_extendedprice * (1 - l_discount), exact
    col("l_extendedprice").cast("decimal(18,2)") *
      (lit(1) - col("l_discount")).cast("decimal(18,2)")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q6 — forecasting revenue change: one pruned scan, one agg row
    "q6_revenue_delta" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(
          col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
            col("l_discount").between(0.05, 0.07) &&
            col("l_quantity") < 24)
        .agg(
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            col("l_discount").cast("decimal(18,2)"))
            .cast("double").as("revenue"))
    },
    // Q7 — volume shipping between a nation pair, by ship year
    "q7_volume_shipping" -> { (s, dir) =>
      val pair = Seq("NATION_1", "NATION_2")
      val n1 = broadcast(t(s, dir, "nation")
        .filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
      val n2 = broadcast(t(s, dir, "nation")
        .filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation")))
      t(s, dir, "supplier")
        .join(n1, col("s_nationkey") === col("s_nk"))
        .join(
          t(s, dir, "lineitem").filter(
            col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1998-01-01").cast("timestamp")),
          col("s_suppkey") === col("l_suppkey"))
        .join(t(s, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
        .join(t(s, dir, "customer"), col("c_custkey") === col("o_custkey"))
        .join(n2, col("c_nationkey") === col("c_nk"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(
          col("supp_nation"),
          col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(sum(rev).cast("double").as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    },
    // Q10 — returned-item reporting: top 20 customers by lost revenue
    "q10_returned_items" -> { (s, dir) =>
      t(s, dir, "customer")
        .join(
          t(s, dir, "orders").filter(
            col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1997-04-01").cast("timestamp")),
          col("c_custkey") === col("o_custkey"))
        .join(
          t(s, dir, "lineitem").filter(col("l_returnflag") === "R"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(sum(rev).cast("double").as("revenue"))
        .select(col("c_custkey"), col("c_name"), col("revenue"), col("c_acctbal"), col("n_name"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },
    // Q14 — promo revenue share: conditional exact sums, one ratio row
    "q14_promo_share" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(
          col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
        .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0).cast("decimal(18,2)")))
            .cast("double").as("__promo"),
          sum(rev).cast("double").as("__all"))
        .select((lit(100.0) * col("__promo") / col("__all")).as("promo_share"))
    },
    // Q18 — large-volume orders: HAVING-filtered keys as a semi join
    "q18_large_orders" -> { (s, dir) =>
      val li = t(s, dir, "lineitem")
      val big = li
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("__q"))
        .filter(col("__q") > 200)
        .select(col("l_orderkey").as("__big_key"))
      t(s, dir, "customer")
        .join(
          t(s, dir, "orders").join(big, col("o_orderkey") === col("__big_key"), "left_semi"),
          col("c_custkey") === col("o_custkey"))
        .join(li, col("l_orderkey") === col("o_orderkey"))
        .groupBy(
          col("c_custkey"), col("c_name"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          col("o_totalprice"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },
    // Q19 — OR-of-brackets join predicate (brand × size × quantity)
    "q19_bracket_revenue" -> { (s, dir) =>
      val bracket =
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
          col("l_quantity") >= 1 && col("l_quantity") <= 11) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
            col("l_quantity") >= 10 && col("l_quantity") <= 20) ||
          (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
            col("l_quantity") >= 20 && col("l_quantity") <= 30)
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")), col("p_partkey") === col("l_partkey"))
        .filter(bracket)
        .agg(sum(rev).cast("double").as("revenue"))
    },
    // Q8 — national market share inside a region, by order year:
    // the deepest join tree the schema expresses (7 relations), with
    // a conditional-share ratio on exact decimal sums
    "q8_market_share" -> { (s, dir) =>
      val vol = rev
      t(s, dir, "part")
        .filter(col("p_type") === "PROMO")
        .join(t(s, dir, "lineitem"), col("p_partkey") === col("l_partkey"))
        .join(t(s, dir, "supplier"), col("s_suppkey") === col("l_suppkey"))
        .join(
          t(s, dir, "orders").filter(
            col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(
          broadcast(t(s, dir, "nation")
            .select(col("n_nationkey").as("c_nk"), col("n_regionkey"))),
          col("c_nationkey") === col("c_nk"))
        .join(
          broadcast(t(s, dir, "region").filter(col("r_name") === "AMERICA")),
          col("n_regionkey") === col("r_regionkey"))
        .join(
          broadcast(t(s, dir, "nation")
            .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("s_nk"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(
          (sum(when(col("supp_nation") === "NATION_3", vol).otherwise(lit(0).cast("decimal(18,2)")))
            .cast("double") /
            sum(vol).cast("double")).as("mkt_share"))
        .orderBy(col("o_year"))
    },
    // Q13 — customer order-count distribution: double aggregation
    // (count per customer, then histogram of the counts) over a
    // conditioned left join — the distribution-of-counts shape
    "q13_custdist" -> { (s, dir) =>
      val perCust = t(s, dir, "customer")
        .join(
          t(s, dir, "orders").filter(col("o_orderpriority") =!= "1-URGENT"),
          col("c_custkey") === col("o_custkey"),
          "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
      perCust
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },
    // Q15 — top supplier by quarter revenue: a scalar max subquery
    // over the same derived revenue table (Catalyst reuses the agg
    // subtree rather than recomputing it per row)
    "q15_top_supplier" -> { (s, dir) =>
      val quarterRev = t(s, dir, "lineitem")
        .filter(
          col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(sum(rev).cast("double").as("total_revenue"))
      val best = quarterRev.agg(max(col("total_revenue")).as("__best"))
      t(s, dir, "supplier")
        .join(quarterRev, col("s_suppkey") === col("l_suppkey"))
        .crossJoin(broadcast(best))
        .filter(col("total_revenue") === col("__best"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy(col("s_suppkey"))
    },
    // Q22 — idle wealthy customers: scalar-subquery threshold +
    // anti join on recent orders, rolled up by nation. The threshold
    // follows the repo determinism rule (a_zscore_outliers): exact
    // decimal SUM and COUNT cast to double and divided — Spark's
    // avg(DECIMAL) returns a 6-dp-rounded DECIMAL(22,6) while DuckDB's
    // is an unrounded double, so a bare avg can put the two engines'
    // thresholds ~5e-7 apart
    "q22_idle_customers" -> { (s, dir) =>
      val cust = t(s, dir, "customer")
      val avgBal = cust
        .filter(col("c_acctbal") > 0.0)
        .agg((sum(col("c_acctbal").cast("decimal(18,2)")).cast("double") /
          count(lit(1)).cast("double")).as("__avg"))
      val recent = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      cust
        .crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("__avg"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(
          count(lit(1)).as("n_custs"),
          sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("total_acctbal"))
        .orderBy(col("c_nationkey"))
    },
    // Q21 — suppliers who kept orders waiting (adapted: the fault
    // marker is l_returnflag = 'R' in place of receipt > commit,
    // which the trimmed schema lacks). The planner shape is the
    // point: the same fact table appears as the probe, an EXISTS
    // (left-semi with an equi orderkey key + suppkey-inequality
    // residual) and a NOT EXISTS (left-anti, same key structure) —
    // TPC-H's hardest nested-subquery chain, no cartesian anywhere.
    "q21_waiting_suppliers" -> { (s, dir) =>
      val li = t(s, dir, "lineitem")
      val others = li.select(col("l_orderkey").as("o2_orderkey"), col("l_suppkey").as("o2_suppkey"))
      val lateOthers = li
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("o3_orderkey"), col("l_suppkey").as("o3_suppkey"))
      li.filter(col("l_returnflag") === "R")
        .join(
          t(s, dir, "orders").filter(col("o_orderstatus") === "F").select("o_orderkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(
          broadcast(t(s, dir, "nation").filter(col("n_name").isin("NATION_1", "NATION_2"))),
          col("s_nationkey") === col("n_nationkey"))
        .join(
          others,
          col("l_orderkey") === col("o2_orderkey") && col("l_suppkey") =!= col("o2_suppkey"),
          "left_semi")
        .join(
          lateOthers,
          col("l_orderkey") === col("o3_orderkey") && col("l_suppkey") =!= col("o3_suppkey"),
          "left_anti")
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    },
    // Q20 — suppliers with excess shipped volume (adapted: partsupp's
    // availqty is gone, so "excess" = this supplier's all-time shipped
    // quantity of a part exceeds half the part's 1997 corpus-wide
    // quantity). Semi-join over a correlated aggregate — q20's shape.
    "q20_excess_suppliers" -> { (s, dir) =>
      val li = t(s, dir, "lineitem")
      val qty = col("l_quantity").cast("decimal(18,2)")
      val shipped = li
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(qty).as("sq"))
      val partTotal = li
        .filter(
          col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .groupBy(col("l_partkey").as("pt_partkey"))
        .agg(sum(qty).as("tq"))
      val excess = shipped
        .join(
          broadcast(t(s, dir, "part")
            .filter(col("p_name").startsWith("small"))
            .select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"))
        .join(partTotal, col("l_partkey") === col("pt_partkey"))
        .filter(col("sq").cast("double") > lit(0.5) * col("tq").cast("double"))
        .select(col("l_suppkey").as("x_suppkey"))
        .distinct()
      t(s, dir, "supplier")
        .join(
          broadcast(t(s, dir, "nation")
            .filter(col("n_name").isin("NATION_1", "NATION_2", "NATION_3"))
            .select(col("n_nationkey"))),
          col("s_nationkey") === col("n_nationkey"),
          "left_semi")
        .join(excess, col("s_suppkey") === col("x_suppkey"), "left_semi")
        .select(col("s_name"), col("s_suppkey"))
        .orderBy(col("s_name"), col("s_suppkey"))
    },
    // Q2 — min-cost supplier per part in a region (adapted: unit cost
    // = min observed l_extendedprice / l_quantity per (part, supplier)
    // in place of partsupp supplycost). Correlated-min subquery →
    // per-part min aggregate + equality join back, all dims broadcast.
    "q2_min_cost_supplier" -> { (s, dir) =>
      val cost = t(s, dir, "lineitem")
        .filter(col("l_quantity") > 0)
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(col("l_extendedprice") / col("l_quantity")).as("unit_cost"))
      val eligible = cost
        .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(
          broadcast(t(s, dir, "region").filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("l_partkey"), col("unit_cost"), col("s_acctbal"), col("s_name"), col("n_name"))
      val best = eligible
        .groupBy(col("l_partkey").as("b_partkey"))
        .agg(min(col("unit_cost")).as("best_cost"))
      eligible
        .join(
          best,
          col("l_partkey") === col("b_partkey") && col("unit_cost") === col("best_cost"))
        .join(
          broadcast(t(s, dir, "part")
            .filter(col("p_size") <= 10 && col("p_type") === "SMALL")
            .select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"), col("p_partkey"), col("unit_cost"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
        .limit(100)
    },
    // Q9 — product-line profit by supplier nation and order year
    // (adapted: supply cost = 0.6 × p_retailprice in place of
    // partsupp). Decimals stay EXACT until the edge: the 0.6 factor
    // multiplies the double-cast SUM, never the per-row decimal — a
    // mid-stream double→decimal cast would hang the oracle match on
    // Spark and DuckDB rounding doubles to 2dp identically at .xx5
    // boundaries.
    "q9_product_profit" -> { (s, dir) =>
      val cost = col("p_retailprice").cast("decimal(18,2)") *
        col("l_quantity").cast("decimal(18,2)")
      t(s, dir, "lineitem")
        .join(
          broadcast(t(s, dir, "part")
            .filter(col("p_name").contains("gear"))
            .select(col("p_partkey"), col("p_retailprice"))),
          col("l_partkey") === col("p_partkey"))
        .join(
          broadcast(t(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(
          t(s, dir, "orders").select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).cast("int").as("o_year"))
        .agg((sum(rev).cast("double") - lit(0.6) * sum(cost).cast("double")).as("profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },
    // Q11 — important parts by shipped value for a nation group:
    // group-by value + scalar-subquery share threshold (the q11
    // HAVING > fraction × total shape), threshold compared in double
    // on both sides
    "q11_important_parts" -> { (s, dir) =>
      val value = t(s, dir, "lineitem")
        .join(
          broadcast(t(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .join(
          broadcast(t(s, dir, "nation")
            .filter(col("n_name").isin("NATION_1", "NATION_2"))
            .select(col("n_nationkey"))),
          col("s_nationkey") === col("n_nationkey"),
          "left_semi")
        .groupBy(col("l_partkey"))
        .agg(sum(rev).as("v"))
      val total = value.agg(sum(col("v")).as("t"))
      value
        .crossJoin(broadcast(total))
        .filter(col("v").cast("double") > lit(0.001) * col("t").cast("double"))
        .select(col("l_partkey").as("p_partkey"), col("v").cast("double").as("value"))
        .orderBy(col("value").desc, col("p_partkey"))
    },
    // Q12 — late-shipment priority classes (adapted: l_returnflag
    // plays shipmode, l_shipdate >= o_orderdate plays the date sanity
    // chain as a non-equi join residual)
    // Q4 — order priority checking: EXISTS-late-lineitem semi join,
    // count per priority inside one quarter. Late marker substituted
    // per this file's q21 convention (no commit/receipt dates in the
    // trimmed schema): l_returnflag = 'R' with the shipdate >=
    // orderdate sanity residual.
    "q4_order_priority" -> { (s, dir) =>
      val late = t(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_shipdate"))
      t(s, dir, "orders")
        .filter(
          col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
        .join(
          late,
          col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") >= col("o_orderdate"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    },
    // Q16 — parts/supplier relationship: supplier-part pairs emulated
    // from DISTINCT lineitem (no partsupp in the trimmed schema),
    // complaint suppliers emulated as the deterministic s_suppkey %
    // 10 = 0 list (the original's LIKE '%Customer%Complaints%' scan),
    // excluded by ANTI JOIN exactly like the original's NOT IN.
    "q16_parts_supplier" -> { (s, dir) =>
      val ps = t(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"))
        .distinct()
      val complaints = t(s, dir, "supplier")
        .filter(col("s_suppkey") % 10 === 0)
        .select(col("s_suppkey"))
      ps
        .join(complaints, col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(
          broadcast(
            t(s, dir, "part")
              .filter(
                col("p_brand") =!= "Brand#1" &&
                  !col("p_type").startsWith("PROMO") &&
                  col("p_size").isin(1, 4, 9, 14, 19, 24, 28, 32))
              .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(count_distinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(
          col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
    },
    // Q17 — small-quantity-order revenue: the correlated per-part
    // avg-quantity subquery as a grouped join; the 0.2·avg threshold
    // kept EXACT by cross-multiplying integers (5·qty·cnt < Σqty —
    // quantities are integer-valued doubles, cast to long), so no
    // float average crosses the engine/oracle boundary. Brand/
    // container filter adapted to the trimmed part schema.
    "q17_small_qty_revenue" -> { (s, dir) =>
      val li = t(s, dir, "lineitem")
        .select(
          col("l_partkey"),
          col("l_quantity").cast("long").as("qty"),
          col("l_extendedprice"))
      val perPart = li
        .groupBy(col("l_partkey").as("__pk"))
        .agg(sum(col("qty")).as("__sq"), count(lit(1)).as("__cnt"))
      li
        .join(
          broadcast(
            t(s, dir, "part")
              .filter(col("p_brand") === "Brand#3" && col("p_type") === "ECONOMY")
              .select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"))
        .join(perPart, col("l_partkey") === col("__pk"))
        .filter(col("qty") * 5L * col("__cnt") < col("__sq"))
        .agg(
          (sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double") / 7.0)
            .as("avg_yearly"))
    },
    "q12_priority_class" -> { (s, dir) =>
      val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      t(s, dir, "lineitem")
        .filter(
          col("l_returnflag").isin("A", "R") &&
            col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(
          t(s, dir, "orders").select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority")),
          col("l_orderkey") === col("o_orderkey") && col("l_shipdate") >= col("o_orderdate"))
        .groupBy(col("l_returnflag").as("mode"))
        .agg(
          sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(hi, 0L).otherwise(1L)).as("low_line_count"))
        .orderBy(col("mode"))
    }
  )

  def oracleSql: Map[String, String] = Map(
    "q4_order_priority" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_returnflag = 'R'
        |                AND l.l_shipdate >= o.o_orderdate)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q16_parts_supplier" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        |keep AS (SELECT ps.* FROM ps
        |         WHERE l_suppkey NOT IN
        |           (SELECT s_suppkey FROM supplier WHERE s_suppkey % 10 = 0))
        |SELECT p_brand, p_type, p_size,
        |       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM keep JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1' AND p_type NOT LIKE 'PROMO%'
        |  AND p_size IN (1, 4, 9, 14, 19, 24, 28, 32)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q17_small_qty_revenue" ->
      """WITH li AS (SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty, l_extendedprice
        |            FROM lineitem),
        |pp AS (SELECT l_partkey AS pk, CAST(SUM(qty) AS BIGINT) AS sq,
        |              CAST(COUNT(*) AS BIGINT) AS cnt
        |       FROM li GROUP BY 1)
        |SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
        |FROM li
        |JOIN part ON l_partkey = p_partkey
        |JOIN pp ON l_partkey = pp.pk
        |WHERE p_brand = 'Brand#3' AND p_type = 'ECONOMY'
        |  AND qty * 5 * cnt < sq""".stripMargin,
    "q6_revenue_delta" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q7_volume_shipping" ->
      """SELECT supp_nation, cust_nation, l_year, CAST(SUM(vol) AS DOUBLE) AS revenue
        |FROM (
        | SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |        CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |        CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2)) AS vol
        | FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
        | JOIN orders ON o_orderkey = l_orderkey
        | JOIN customer ON c_custkey = o_custkey
        | JOIN nation n1 ON s_nationkey = n1.n_nationkey
        | JOIN nation n2 ON c_nationkey = n2.n_nationkey
        | WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |   AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |   AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00')
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "q10_returned_items" ->
      """SELECT c_custkey, c_name,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        | c_acctbal, n_name
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q14_promo_share" ->
      """SELECT CAST(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
        |         THEN CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))
        |         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS DOUBLE) AS promo_share
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00' AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'""".stripMargin,
    "q18_large_orders" ->
      """SELECT c_custkey, c_name, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        | o_totalprice, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 200)
        |GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q19_bracket_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity >= 1 AND l_quantity <= 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity >= 10 AND l_quantity <= 20)
        |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 20 AND l_quantity <= 30)""".stripMargin,
    "q8_market_share" ->
      """SELECT o_year,
        | CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
        |      CAST(SUM(vol) AS DOUBLE) AS DOUBLE) AS mkt_share
        |FROM (
        | SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |        CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2)) AS vol,
        |        n2.n_name AS supp_nation
        | FROM part JOIN lineitem ON p_partkey = l_partkey
        | JOIN supplier ON s_suppkey = l_suppkey
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation n1 ON c_nationkey = n1.n_nationkey
        | JOIN region ON n1.n_regionkey = r_regionkey
        | JOIN nation n2 ON s_nationkey = n2.n_nationkey
        | WHERE r_name = 'AMERICA'
        |   AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |   AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |   AND p_type = 'PROMO')
        |GROUP BY o_year ORDER BY o_year""".stripMargin,
    "q13_custdist" ->
      """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
        |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM supplier JOIN rev ON s_suppkey = l_suppkey
        |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "q22_idle_customers" ->
      """SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_custs,
        | CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
        |FROM customer
        |WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
        |                   FROM customer WHERE c_acctbal > 0.0)
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q21_waiting_suppliers" ->
      """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM lineitem l1
        |JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
        |JOIN supplier s ON s.s_suppkey = l1.l_suppkey
        |JOIN nation n ON n.n_nationkey = s.s_nationkey AND n.n_name IN ('NATION_1','NATION_2')
        |WHERE l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin,
    "q20_excess_suppliers" ->
      """WITH shipped AS (
        |  SELECT l_partkey, l_suppkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS sq
        |  FROM lineitem GROUP BY 1, 2),
        |pt AS (
        |  SELECT l_partkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS tq
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  GROUP BY 1)
        |SELECT s_name, s_suppkey
        |FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT sh.l_suppkey FROM shipped sh
        |  JOIN part p ON p.p_partkey = sh.l_partkey AND p.p_name LIKE 'small%'
        |  JOIN pt ON pt.l_partkey = sh.l_partkey
        |  WHERE CAST(sh.sq AS DOUBLE) > 0.5 * CAST(pt.tq AS DOUBLE))
        |AND s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_name IN ('NATION_1','NATION_2','NATION_3'))
        |ORDER BY s_name, s_suppkey""".stripMargin,
    "q2_min_cost_supplier" ->
      """WITH cost AS (
        |  SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS unit_cost
        |  FROM lineitem WHERE l_quantity > 0 GROUP BY 1, 2),
        |eligible AS (
        |  SELECT c.l_partkey, c.unit_cost, s.s_acctbal, s.s_name, n.n_name
        |  FROM cost c
        |  JOIN supplier s ON s.s_suppkey = c.l_suppkey
        |  JOIN nation n ON n.n_nationkey = s.s_nationkey
        |  JOIN region r ON r.r_regionkey = n.n_regionkey AND r.r_name = 'ASIA'),
        |best AS (SELECT l_partkey, min(unit_cost) AS best_cost FROM eligible GROUP BY 1)
        |SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, e.unit_cost
        |FROM eligible e
        |JOIN best b ON b.l_partkey = e.l_partkey AND e.unit_cost = b.best_cost
        |JOIN part p ON p.p_partkey = e.l_partkey AND p.p_size <= 10 AND p.p_type = 'SMALL'
        |ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, p.p_partkey
        |LIMIT 100""".stripMargin,
    "q9_product_profit" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE)
        |  - CAST(0.6 AS DOUBLE) * CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS profit
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey AND p_name LIKE '%gear%'
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN nation ON n_nationkey = s_nationkey
        |JOIN orders ON o_orderkey = l_orderkey
        |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,
    "q11_important_parts" ->
      """WITH val AS (
        |  SELECT l_partkey,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS v
        |  FROM lineitem
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN nation ON n_nationkey = s_nationkey AND n_name IN ('NATION_1','NATION_2')
        |  GROUP BY 1),
        |tot AS (SELECT sum(v) AS t FROM val)
        |SELECT l_partkey AS p_partkey, CAST(v AS DOUBLE) AS value
        |FROM val, tot WHERE CAST(v AS DOUBLE) > CAST(0.001 AS DOUBLE) * CAST(t AS DOUBLE)
        |ORDER BY value DESC, p_partkey""".stripMargin,
    "q12_priority_class" ->
      """SELECT l_returnflag AS mode,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE l_returnflag IN ('A','R') AND l_shipdate >= o_orderdate
        |  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
