package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.PortableFns._
import graft.sources.Sources

/** Relational extension surface (SURVEY.md §2B): joins, aggregation,
  * top-k, set ops. The reference has none of these (its only aggregate is
  * count(*) — reference: clickhouse_migrator/services/validator.py:24-31);
  * they are required by the north star and exercised on the TPC-H-ish
  * testdata.
  *
  * Scale notes: dimension tables (region/nation/supplier/customer) are
  * broadcast explicitly; fact-fact joins shuffle on the join key and rely
  * on AQE for skew. Money sums use exact decimal arithmetic (see
  * [[graft.functions.PortableFns]]).
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, n: String) = Sources.table(s, dir, n)

  /** revenue = extendedprice * (1 - discount), exact decimal. */
  private def revenueExpr =
    col("l_extendedprice").cast(DecimalType(18, 2)) *
      (lit(1).cast(DecimalType(3, 2)) - col("l_discount").cast(DecimalType(3, 2)))

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-shaped pricing summary: grouped aggregation with decimal
    // sums, exact-mean, and count — the canonical map-side-combine agg.
    "q1_pricing" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(revenueExpr).cast("double").as("sum_disc_price"),
          sum(revenueExpr *
            (lit(1).cast(DecimalType(3, 2)) + col("l_tax").cast(DecimalType(3, 2))))
            .cast("double").as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // TPC-H Q3-shaped: fact-fact-dim join + grouped revenue + top-N.
    // customer (small) is broadcast; lineitem⋈orders shuffles on orderkey.
    "q3_top_orders" -> ((s, dir) => {
      val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = t(s, dir, "orders")
      val line = t(s, dir, "lineitem")
      line
        .join(ord, line("l_orderkey") === ord("o_orderkey"))
        .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
        .groupBy(col("l_orderkey"), dateStr(col("o_orderdate")).as("o_orderdate_s"))
        .agg(sum(revenueExpr).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5-shaped: star join up the supplier→nation→region chain,
    // dims broadcast, grouped revenue per region/nation.
    "q5_region_revenue" -> ((s, dir) => {
      val line = t(s, dir, "lineitem")
      val supp = t(s, dir, "supplier")
      val nat = t(s, dir, "nation")
      val reg = t(s, dir, "region")
      line
        .join(broadcast(supp), line("l_suppkey") === supp("s_suppkey"))
        .join(broadcast(nat), supp("s_nationkey") === nat("n_nationkey"))
        .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(sum(revenueExpr).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("r_name", "n_name")
    }),

    // TPC-H Q7-shaped: bidirectional nation-to-nation trade volume by
    // year — a 6-relation join. Scale shape: supplier/customer are
    // pre-restricted to the two nations BEFORE joining the facts (the
    // filter travels into the broadcast build side, so the fact join
    // output is already nation-pruned), then the cross-pair condition
    // keeps only opposite-nation flows.
    "q7_nation_volume" -> ((s, dir) => {
      val pair = Seq("NATION_18", "NATION_19")
      val nat = t(s, dir, "nation").filter(col("n_name").isin(pair: _*))
      val supp = t(s, dir, "supplier")
        .join(broadcast(nat.select(col("n_nationkey").as("sn_key"),
          col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("sn_key"))
        .select("s_suppkey", "supp_nation")
      val cust = t(s, dir, "customer")
        .join(broadcast(nat.select(col("n_nationkey").as("cn_key"),
          col("n_name").as("cust_nation"))),
          col("c_nationkey") === col("cn_key"))
        .select("c_custkey", "cust_nation")
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          date_format(col("l_shipdate"), "yyyy").as("l_year"))
        .agg(sum(revenueExpr).cast("double").as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // TPC-H Q8-shaped: one nation's market share of PROMO-part revenue
    // sold to EUROPE customers, by order year. Every dimension is
    // broadcast and pre-filtered; the only shuffle is lineitem⋈orders.
    "q8_market_share" -> ((s, dir) => {
      val part = t(s, dir, "part").filter(col("p_type") === "PROMO")
        .select("p_partkey")
      val eurNat = t(s, dir, "nation")
        .join(broadcast(t(s, dir, "region").filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("cn_key"))
      val cust = t(s, dir, "customer")
        .join(broadcast(eurNat), col("c_nationkey") === col("cn_key"))
        .select("c_custkey")
      val supp = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("sn_key"))
        .select("s_suppkey", "supp_nation")
      t(s, dir, "lineitem")
        .join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .groupBy(date_format(col("o_orderdate"), "yyyy").as("o_year"))
        .agg(round(
          sum(when(col("supp_nation") === "NATION_1", revenueExpr)).cast("double") /
            sum(revenueExpr).cast("double"), 6).as("mkt_share"))
        .orderBy("o_year")
    }),

    // Left-semi join: customers that placed at least one urgent order
    // (EXISTS), counted per nation.
    "q_semi_join" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val urgent = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
      cust.join(urgent, cust("c_custkey") === urgent("o_custkey"), "left_semi")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("c_nationkey")
    }),

    // Left-anti join: customers with no pending ('P') order (NOT EXISTS).
    "q_anti_join" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val pend = t(s, dir, "orders").filter(col("o_orderstatus") === "P")
      cust.join(pend, cust("c_custkey") === pend("o_custkey"), "left_anti")
        .select("c_custkey", "c_nationkey")
        .orderBy("c_custkey")
    }),

    // Global top-k: total-order sort + limit with deterministic tie-break.
    "q_topk" -> ((s, dir) =>
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
        .select(col("o_orderkey"), col("o_totalprice"),
          dateStr(col("o_orderdate")).as("o_orderdate_s"))),

    // RECURSIVE CTE (Spark 4 UnionLoop): per-customer order chains
    // walked step-by-step from each customer's first order — the
    // iterate-until-empty-frontier SQL surface (hierarchies, BOM,
    // graph reachability), capped at depth 8 (the bounded-recursion
    // idiom; an uncapped walk is ~25 deep here and each UnionLoop
    // iteration re-evaluates the frontier join, so the cap bounds
    // wall-clock at every SF while touching every customer).
    // Scale note: recursion executes O(depth) frontier joins — right
    // for depth-bounded hierarchies; unbounded-diameter closure over
    // big graphs belongs to d_components' pointer doubling (O(log n)
    // rounds), which this query deliberately complements, not
    // replaces.
    "q_recursive" -> ((s, dir) => {
      // The edge relation is loop-INVARIANT but referenced by every
      // UnionLoop iteration, which would re-run its window each round.
      // Materialize it ONCE to a scratch parquet and recurse over the
      // file-backed relation — the RELIABLE-checkpoint shape:
      //  - the window shuffle is paid exactly once; each UnionLoop
      //    iteration re-scans a slim 3-column columnar file instead of
      //    re-executing the window;
      //  - lineage for the recursion roots at a FILE, so an executor
      //    loss (routine under dynamic allocation at 100 TB) re-reads
      //    instead of failing — unlike localCheckpoint, whose
      //    non-replicated blocks + truncated lineage kill the query
      //    when their host dies (the r13 perf-weak flag), and unlike
      //    persist(), which pins a session CacheManager entry this
      //    builder has no post-action hook to release;
      //  - [[graft.sources.Scratch]] keys the path per INVOCATION (the
      //    dataset key carries a fresh UUID): two same-JVM builds of
      //    this query can never overwrite the files a previously
      //    analyzed plan still reads — localCheckpoint's isolation,
      //    kept. Every invocation's dir is tracked for deletion at JVM
      //    exit, so accretion is bounded by the process lifetime. The
      //    view is unique-named and dropped as soon as sql() has
      //    analyzed the plan (the q_lateral scoping pattern).
      import org.apache.spark.sql.expressions.Window
      val scratch = graft.sources.Scratch.dir("qrec_edges",
        dir + ":" + java.util.UUID.randomUUID())
      // Land the staged relation hash-split on the JOIN KEY across
      // ≥ defaultParallelism files (never fewer partitions than the
      // plan already has): AQE's post-window coalesce would otherwise
      // land ONE tiny file, and every UnionLoop round's broadcast-join
      // scan of it would run single-task (guide §2.5 input skew). At
      // production scale shuffle.partitions ≥ parallelism keeps this a
      // no-downsize no-op.
      val stagedEdges = t(s, dir, "orders")
        .select(col("o_custkey").as("cust"), col("o_orderkey").as("ok"),
          lag(col("o_orderkey"), 1).over(Window.partitionBy(col("o_custkey"))
            .orderBy(col("o_orderdate"), col("o_orderkey"))).as("prev_ok"))
      stagedEdges.repartition(
        math.max(s.sparkContext.defaultParallelism,
          s.conf.get("spark.sql.shuffle.partitions").toInt),
        col("prev_ok"))
        .write.mode("overwrite").parquet(scratch)
      val edges = s.read.parquet(scratch)
      val view = "edges_qrec_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      edges.createOrReplaceTempView(view)
      try s.sql(s"""
        WITH RECURSIVE chain AS (
          SELECT cust, ok, 1 AS depth FROM $view WHERE prev_ok IS NULL
          UNION ALL
          SELECT e.cust, e.ok, c.depth + 1
          FROM chain c JOIN $view e ON e.prev_ok = c.ok
          WHERE c.depth < 8
        )
        SELECT cust, ok, depth FROM chain ORDER BY cust, depth
      """)
      finally s.catalog.dropTempView(view)
    }),

    // Correlated LATERAL subquery: top-2 suppliers by balance PER
    // nation, expressed as the lateral join both engines support (the
    // per-group-limit idiom that windowless SQL users reach for).
    // Catalyst decorrelates the LIMIT-per-group into a ranked join —
    // verify with explain: no nested-loop re-execution per outer row,
    // so the shape scales like the window formulation it rewrites to.
    "q_lateral" -> ((s, dir) => {
      // LATERAL needs SQL, and SQL needs views — but session-global view
      // names leak across queries sharing the SparkSession. Unique names,
      // dropped as soon as sql() has ANALYZED the plan (analysis binds the
      // views' logical plans into the DataFrame, so the later execution
      // doesn't re-resolve them).
      val tag = java.util.UUID.randomUUID().toString.replace("-", "")
      val (nv, sv) = (s"lat_nation_$tag", s"lat_supplier_$tag")
      t(s, dir, "nation").createOrReplaceTempView(nv)
      t(s, dir, "supplier").createOrReplaceTempView(sv)
      try s.sql(
        s"""SELECT n_name, t.s_name, t.s_acctbal
           |FROM $nv JOIN LATERAL (
           |  SELECT s_name, s_acctbal, s_suppkey FROM $sv
           |  WHERE s_nationkey = n_nationkey
           |  ORDER BY s_acctbal DESC, s_suppkey LIMIT 2) t
           |ORDER BY n_name, s_acctbal DESC, s_name""".stripMargin)
      finally {
        s.catalog.dropTempView(nv)
        s.catalog.dropTempView(sv)
      }
    }),

    // Set operations: UNION / INTERSECT / EXCEPT over customer key sets.
    "q_setops" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val rich = cust.filter(col("c_acctbal") > 9000).select("c_custkey")
      val auto = cust.filter(col("c_mktsegment") === "AUTOMOBILE").select("c_custkey")
      val machinery = cust.filter(col("c_mktsegment") === "MACHINERY").select("c_custkey")
      rich.union(auto).distinct()
        .intersect(rich.union(machinery).distinct())
        .except(cust.filter(col("c_acctbal") < 0).select("c_custkey"))
        .orderBy("c_custkey")
    }),

    // Full outer join on day-of-month: orders exclude days 29-30 (so
    // those are events-only) and events never land on day 31 (orders-
    // only), leaving days 1-28 matched — all three outer-join cases are
    // exercised; one shuffle per side on the slim day key.
    "q_full_outer" -> ((s, dir) => {
      val od = t(s, dir, "orders")
        .withColumn("day", dayofmonth(col("o_orderdate")))
        .filter(!col("day").isin(29, 30))
        .groupBy("day").agg(count(lit(1)).as("n_orders"))
      val ed = t(s, dir, "events")
        .groupBy(dayofmonth(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_events"))
      od.join(ed, Seq("day"), "full_outer")
        .select(col("day"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          coalesce(col("n_events"), lit(0L)).as("n_events"))
        .orderBy("day")
    }),

    // Distinct aggregation: exact COUNT(DISTINCT) per group.
    "q_distinct_agg" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")),

    // TPC-H Q2-shaped groupwise-min: the cheapest part of every type.
    // Scale shape: the per-type minima are a tiny aggregate (one row per
    // type) broadcast back against the full table — no window, no second
    // shuffle of the fact.
    "q2_min_price" -> ((s, dir) => {
      val part = t(s, dir, "part")
      val mins = part.groupBy(col("p_type").as("mt"))
        .agg(min(col("p_retailprice")).as("mp"))
      part.join(broadcast(mins),
          col("p_type") === col("mt") && col("p_retailprice") === col("mp"))
        .select("p_type", "p_partkey", "p_retailprice")
        .orderBy("p_type", "p_partkey")
    }),

    // TPC-H Q4-shaped EXISTS: orders in a quarter with at least one
    // returned lineitem, counted per priority. The EXISTS compiles to a
    // left-semi join — no row duplication, lineitem pre-filtered before
    // the shuffle.
    "q4_priority_exists" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      val ret = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      ord.join(ret, ord("o_orderkey") === ret("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),

    // TPC-H Q21-shaped DEEP decorrelation: the same fact (lineitem) at
    // THREE aliases — the outer l1 plus an EXISTS and a NOT EXISTS both
    // correlated on l1's orderkey with a non-equi suppkey disequality —
    // the hardest standard subquery-rewrite pattern. (The dataset has no
    // receipt/commit dates, so "kept the order waiting" becomes "sole
    // supplier with a returned item on a finished multi-supplier
    // order" — identical join topology to Q21.) Catalyst must rewrite
    // EXISTS → left-semi and NOT EXISTS → left-anti, each an equi-join
    // on orderkey carrying the suppkey disequality as a residual — a
    // nested-loop re-execution per outer row would be the scale-killer
    // (asserted in PlanShapeSpec). nation is a broadcast dim; the three
    // fact legs all shuffle on the same orderkey.
    "q21_sole_blame" -> ((s, dir) => {
      val tag = java.util.UUID.randomUUID().toString.replace("-", "")
      val views = Map("lineitem" -> s"q21_line_$tag", "orders" -> s"q21_ord_$tag",
        "supplier" -> s"q21_supp_$tag", "nation" -> s"q21_nat_$tag")
      views.foreach { case (n, v) => t(s, dir, n).createOrReplaceTempView(v) }
      try s.sql(
        s"""SELECT s_name, count(*) AS numwait
           |FROM ${views("supplier")}
           |JOIN ${views("lineitem")} l1 ON s_suppkey = l1.l_suppkey
           |JOIN ${views("orders")} ON o_orderkey = l1.l_orderkey
           |JOIN ${views("nation")} ON s_nationkey = n_nationkey
           |WHERE o_orderstatus = 'F'
           |  AND l1.l_returnflag = 'R'
           |  AND n_name = 'NATION_3'
           |  AND EXISTS (SELECT 1 FROM ${views("lineitem")} l2
           |    WHERE l2.l_orderkey = l1.l_orderkey
           |      AND l2.l_suppkey <> l1.l_suppkey)
           |  AND NOT EXISTS (SELECT 1 FROM ${views("lineitem")} l3
           |    WHERE l3.l_orderkey = l1.l_orderkey
           |      AND l3.l_suppkey <> l1.l_suppkey
           |      AND l3.l_returnflag = 'R')
           |GROUP BY s_name
           |ORDER BY numwait DESC, s_name""".stripMargin)
      finally views.values.foreach(s.catalog.dropTempView(_))
    }),

    // TPC-H Q17-shaped CROSS-TABLE correlated scalar aggregate: lineitem
    // rows below 20% of THEIR part's average quantity — the correlated
    // subquery aggregates a DIFFERENT relation (the fact) than the outer
    // filter row, so Catalyst must decorrelate it into a per-partkey
    // aggregate joined back on the fact's own key (vs a_correlated's
    // same-table form). Exact-decimal sum/count for the threshold so
    // both engines compare identical doubles. Per-brand output keeps the
    // result multi-row.
    "q17_small_quantity" -> ((s, dir) => {
      val tag = java.util.UUID.randomUUID().toString.replace("-", "")
      val (lv, pv) = (s"q17_line_$tag", s"q17_part_$tag")
      t(s, dir, "lineitem").createOrReplaceTempView(lv)
      t(s, dir, "part").createOrReplaceTempView(pv)
      try s.sql(
        s"""SELECT p_brand,
           |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
           |    / 7.0 AS avg_yearly
           |FROM $lv JOIN $pv ON p_partkey = l_partkey
           |WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
           |  AND l_quantity < (
           |    SELECT 0.2 * (CAST(sum(CAST(l2.l_quantity AS DECIMAL(18,2)))
           |        AS DOUBLE) / CAST(count(*) AS DOUBLE))
           |    FROM $lv l2 WHERE l2.l_partkey = p_partkey)
           |GROUP BY p_brand
           |ORDER BY p_brand""".stripMargin)
      finally {
        s.catalog.dropTempView(lv)
        s.catalog.dropTempView(pv)
      }
    }),

    // TPC-H Q6-shaped banded-predicate scan: every predicate (date range,
    // discount band, quantity cap) pushes into the parquet scan; the agg
    // is a single map-side-combine sum. The canonical "filter pushdown
    // must reach the scan" showcase.
    "q6_banded_revenue" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").cast(DecimalType(3, 2))
            .between(lit("0.05").cast(DecimalType(3, 2)),
              lit("0.07").cast(DecimalType(3, 2))) &&
          col("l_quantity") < 24)
        .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
          col("l_discount").cast(DecimalType(3, 2)))
          .cast("double").as("revenue"))),

    // TPC-H Q9-shaped: revenue from one part family by supplier nation
    // and ship year. part is filtered by LIKE before the broadcast, so
    // the fact join output is already family-pruned.
    "q9_profit_by_nation" -> ((s, dir) => {
      val prt = t(s, dir, "part").filter(col("p_name").like("%red%"))
        .select("p_partkey")
      t(s, dir, "lineitem")
        .join(broadcast(prt), col("l_partkey") === col("p_partkey"))
        .join(broadcast(t(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"),
          date_format(col("l_shipdate"), "yyyy").as("l_year"))
        .agg(sum(revenueExpr).cast("double").as("profit"))
        .orderBy("n_name", "l_year")
    }),

    // TPC-H Q12-shaped conditional counts: high/low order-priority
    // classes per return flag for one ship year — CASE aggregation over a
    // fact-fact join (both sides pre-filtered before the shuffle).
    "q12_priority_class" -> ((s, dir) => {
      val high = Seq("1-URGENT", "2-HIGH")
      val line = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      line.join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
          sum(when(col("o_orderpriority").isin(high: _*), 1).otherwise(0))
            .as("high_count"),
          sum(when(col("o_orderpriority").isin(high: _*), 0).otherwise(1))
            .as("low_count"))
        .orderBy("l_returnflag")
    }),

    // TPC-H Q14-shaped conditional ratio: PROMO share of one month's
    // revenue. The NULL-else conditional sum matches the oracle's CASE
    // without ELSE; single broadcast join, single scalar row.
    "q14_promo_share" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .join(broadcast(t(s, dir, "part")),
          col("l_partkey") === col("p_partkey"))
        .agg(round(lit(100) *
          sum(when(col("p_type") === "PROMO", revenueExpr)).cast("double") /
          sum(revenueExpr).cast("double"), 6).as("promo_share"))),

    // TPC-H Q18-shaped HAVING + join-back: orders whose total quantity
    // exceeds a threshold, re-joined to orders+customer for detail. The
    // aggregate output (few rows) drives the join — orders shuffles once
    // on orderkey, customer broadcasts.
    "q18_big_orders" -> ((s, dir) => {
      val big = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey").as("bok"))
        .agg(sum(col("l_quantity").cast(DecimalType(18, 2)))
          .cast("double").as("sum_qty"))
        .filter(col("sum_qty") > 250)
      t(s, dir, "orders")
        .join(big, col("o_orderkey") === col("bok"))
        .join(broadcast(t(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          dateStr(col("o_orderdate")).as("o_orderdate_s"),
          col("o_totalprice"), col("sum_qty"))
        .orderBy(col("sum_qty").desc, col("o_orderkey"))
        .limit(20)
    }),

    // Bloom-prefiltered semi join: lineitems of a selected 2% of parts,
    // revenue per return flag. The Bloom filter (built on the ~2% dim
    // keys, probed map-side in codegen) keeps non-matching fact rows out
    // of the shuffle; no false negatives ⇒ identical output to a plain
    // EXISTS. See [[graft.plans.BloomOps]]. (Key-modulus selection keeps
    // the dim ~2% at every SF; a price threshold would be empty at
    // sf0.001.)
    "q_bloom_semi" -> ((s, dir) => {
      val premium = t(s, dir, "part").filter(col("p_partkey") % 50 === 0)
      graft.plans.BloomOps.bloomSemiJoin(
          t(s, dir, "lineitem"), premium, "l_partkey", "p_partkey",
          expectedItems = 1L << 16)
        .groupBy("l_returnflag")
        .agg(sum(revenueExpr).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("l_returnflag")
    }),

    // TPC-H Q19-shaped disjunctive join predicate: OR of three
    // brand/size/quantity conjunctions. Catalyst extracts the common
    // `l_partkey = p_partkey` equi-condition so this stays a broadcast
    // hash join (not a nested loop) with the disjunction as a residual
    // filter.
    "q19_disjunctive" -> ((s, dir) => {
      val line = t(s, dir, "lineitem")
      val part = t(s, dir, "part")
      line.join(broadcast(part),
          col("l_partkey") === col("p_partkey") && (
            (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
              col("l_quantity").between(1, 20)) ||
            (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
              col("l_quantity").between(10, 30)) ||
            (col("p_brand") === "Brand#3" && col("p_size").between(20, 50) &&
              col("l_quantity").between(20, 40))))
        .agg(sum(revenueExpr).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // TPC-H Q13-shaped: customer order-count DISTRIBUTION — the
    // left-join-with-ON-predicate + double aggregation shape (customers
    // with zero qualifying orders must appear at c_count = 0, which an
    // inner join would lose). The priority filter stands in for Q13's
    // comment LIKE (the testdata carries no o_comment). Scale shape:
    // one shuffle on custkey for the per-customer count (map-side
    // combined), then the distribution aggregates over the tiny
    // distinct-count domain.
    "q13_order_distribution" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderpriority") =!= "1-URGENT")
      cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // TPC-H Q15-shaped: top supplier by quarterly revenue — the
    // aggregate-then-compare-to-its-own-max shape (Q15's revenue view).
    // The max is a broadcast 1-row aggregate; equality on the exact
    // decimal sum (cast to double identically on both engines) keeps
    // the tie semantics portable. One shuffle on suppkey; supplier is
    // broadcast.
    "q15_top_supplier" -> ((s, dir) => {
      val rev = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(sum(revenueExpr).cast("double").as("total_revenue"))
      val mx = rev.agg(max(col("total_revenue")).as("mx"))
      rev.crossJoin(broadcast(mx))
        .filter(col("total_revenue") === col("mx"))
        .join(broadcast(t(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy("s_suppkey")
    }),

    // TPC-H Q22-shaped: sales opportunity among LAPSED positive-balance
    // customers — scalar subquery (avg positive balance, broadcast
    // 1-row) + anti-join (no orders since the cutoff; the classic Q22
    // "never ordered" is empty on this testdata, where every customer
    // has ordered at least once — churn-by-recency is the live analog)
    // + group by country code (nationkey mod 5 stands in for the phone
    // prefix the schema doesn't carry). Anti-join shuffles on custkey;
    // everything else is broadcast or domain-sized.
    "q22_sales_opportunity" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
        .withColumn("cntrycode", pmod(col("c_nationkey"), lit(5)).cast("int"))
        .filter(col("cntrycode").isin(0, 1, 2))
      val ab = cust.filter(col("c_acctbal") > 0.0)
        .agg(davg(col("c_acctbal")).as("avg_bal"))
      val recent = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
        .select(col("o_custkey"))
      cust.crossJoin(broadcast(ab))
        .filter(col("c_acctbal").cast("double") > col("avg_bal"))
        .join(recent, cust("c_custkey") === recent("o_custkey"), "left_anti")
        .groupBy(col("cntrycode"))
        .agg(count(lit(1)).as("numcust"),
          dsum(col("c_acctbal")).as("totacctbal"))
        .orderBy("cntrycode")
    }),

    // TPC-H Q10-shaped returned-item reporting: customers who returned
    // goods ordered in one quarter, ranked by lost revenue. lineitem is
    // pre-filtered to returns and orders to the quarter BEFORE the
    // orderkey shuffle (the only shuffle); customer and nation broadcast.
    // Top-20 via TakeOrderedAndProject — no global sort materializes.
    "q10_returned_items" -> ((s, dir) => {
      val line = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-10-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      line.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(sum(revenueExpr).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // TPC-H Q11-shaped important-inventory scan: per-part revenue from
    // one nation's suppliers, kept only where it exceeds a threshold
    // derived from a global aggregate (the classic group-by +
    // global-aggregate-threshold shape; partsupp doesn't exist in this
    // dataset, so lineitem revenue stands in for supplycost*availqty —
    // identical topology). TPC-H's own fraction scales by 1/SF; the
    // scale-free equivalent is a multiple of the AVERAGE per-part
    // share — 2× average stays non-degenerate at every SF where a
    // fixed fraction empties out as the part domain grows. The
    // threshold is a 1-row broadcast; the only shuffle is the per-part
    // aggregation.
    "q11_important_parts" -> ((s, dir) => {
      // region-level supplier restriction (TPC-H uses a nation; at the
      // smallest SF single nations have zero suppliers, a region never
      // does — same dim-filtered-broadcast topology)
      val asia = t(s, dir, "nation")
        .join(broadcast(t(s, dir, "region")
          .filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey")
      val supp = t(s, dir, "supplier")
        .join(broadcast(asia), col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey")
      val base = t(s, dir, "lineitem")
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .select(col("l_partkey"), revenueExpr.as("v"))
      val thr = base.agg((sum(col("v")).cast("double") * 2.0 /
        countDistinct(col("l_partkey")).cast("double")).as("thr"))
      base.groupBy("l_partkey")
        .agg(sum(col("v")).cast("double").as("value"))
        .crossJoin(broadcast(thr))
        .filter(col("value") > col("thr"))
        .select("l_partkey", "value")
        .orderBy(col("value").desc, col("l_partkey"))
    }),

    // TPC-H Q16-shaped supplier-count per part attribute: distinct
    // suppliers able to supply each (brand, type, size) bucket,
    // excluding blacklisted suppliers via NOT IN → left-anti (suppkeys
    // are non-null, so anti-join is semantics-exact; negative account
    // balance stands in for the complaint predicate the schema lacks).
    // part broadcasts pre-filtered; the distinct-count shuffles once on
    // the group key.
    "q16_supplier_counts" -> ((s, dir) => {
      val prt = t(s, dir, "part")
        .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
        .select("p_partkey", "p_brand", "p_type", "p_size")
      val bad = t(s, dir, "supplier").filter(col("s_acctbal") < 0)
        .select("s_suppkey")
      t(s, dir, "lineitem")
        .join(broadcast(prt), col("l_partkey") === col("p_partkey"))
        .join(broadcast(bad), col("l_suppkey") === col("s_suppkey"),
          "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    }),

    // TPC-H Q20-shaped nested semi-join promotion scan: suppliers in one
    // region (a nation in TPC-H; empty at the smallest SF here) who
    // pushed more than half their all-time shipped quantity
    // of a part family inside one year (the correlated-threshold pair
    // aggregate stands in for availqty > 0.5*shipped, which needs the
    // absent partsupp). Pair aggregate shuffles once on (part, supp);
    // conditional + total sums come from the SAME pass (no second scan);
    // the supplier probe is a left-semi against the tiny surviving pair
    // set.
    "q20_promotable_suppliers" -> ((s, dir) => {
      val prt = t(s, dir, "part").filter(col("p_name").like("%red%"))
        .select("p_partkey")
      val qdec = col("l_quantity").cast(DecimalType(18, 2))
      val pairs = t(s, dir, "lineitem")
        .join(broadcast(prt), col("l_partkey") === col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
          sum(when(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp"), qdec))
            .cast("double").as("q_win"),
          sum(qdec).cast("double").as("q_tot"))
        .filter(col("q_win") > lit(0.5) * col("q_tot"))
        .select("l_suppkey")
      val asia = t(s, dir, "nation")
        .join(broadcast(t(s, dir, "region")
          .filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey")
      t(s, dir, "supplier")
        .join(broadcast(asia), col("s_nationkey") === col("n_nationkey"))
        .join(pairs, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    }),
  )

  val oracles: Map[String, String] = Map(
    "q10_returned_items" ->
      """SELECT c_custkey, c_name, n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
        |    AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-10-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,
    "q11_important_parts" ->
      """WITH base AS (
        |  SELECT l_partkey, CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) AS v
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'ASIA'),
        |tot AS (SELECT CAST(sum(v) AS DOUBLE) * 2.0
        |    / CAST(count(DISTINCT l_partkey) AS DOUBLE) AS thr FROM base)
        |SELECT l_partkey, CAST(sum(v) AS DOUBLE) AS value
        |FROM base, tot GROUP BY l_partkey, thr
        |HAVING CAST(sum(v) AS DOUBLE) > thr
        |ORDER BY value DESC, l_partkey""".stripMargin,
    "q16_supplier_counts" ->
      """SELECT p_brand, p_type, p_size,
        |  count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
        |  AND l_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q20_promotable_suppliers" ->
      """WITH pairs AS (
        |  SELECT l_partkey, l_suppkey,
        |    CAST(sum(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
        |        AND l_shipdate < TIMESTAMP '1998-01-01'
        |        THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE)
        |      AS q_win,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS q_tot
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE '%red%'
        |  GROUP BY 1, 2)
        |SELECT s_suppkey, s_name FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND s_suppkey IN
        |    (SELECT l_suppkey FROM pairs WHERE q_win > 0.5 * q_tot)
        |ORDER BY s_suppkey""".stripMargin,
    "q13_order_distribution" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        |  FROM customer c LEFT JOIN orders o
        |    ON c.c_custkey = o.o_custkey
        |    AND o.o_orderpriority <> '1-URGENT'
        |  GROUP BY c.c_custkey) t
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q15_top_supplier" ->
      """WITH rev AS (SELECT l_suppkey,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |        (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
        |      AS DOUBLE) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "q22_sales_opportunity" ->
      """WITH c AS (SELECT c_custkey, c_acctbal,
        |    CAST(c_nationkey % 5 AS INT) AS cntrycode
        |  FROM customer WHERE CAST(c_nationkey % 5 AS INT) IN (0, 1, 2)),
        |ab AS (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |    / CAST(count(c_acctbal) AS DOUBLE) AS avg_bal
        |  FROM c WHERE c_acctbal > 0)
        |SELECT cntrycode, count(*) AS numcust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM c, ab
        |WHERE CAST(c_acctbal AS DOUBLE) > avg_bal
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey
        |    AND o_orderdate >= TIMESTAMP '2001-01-01')
        |GROUP BY cntrycode
        |ORDER BY cntrycode""".stripMargin,
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
        |    AS sum_disc_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) *
        |      (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))) AS DOUBLE)
        |    AS sum_charge,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |    / CAST(count(l_quantity) AS DOUBLE) AS avg_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    / CAST(count(l_extendedprice) AS DOUBLE) AS avg_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-12-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_top_orders" ->
      """SELECT l_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_s,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
        |    AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey, o_orderdate_s
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q5_region_revenue" ->
      """SELECT r_name, n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
        |    AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
    "q7_nation_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  strftime(l_shipdate, '%Y') AS l_year,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
        |    AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE n1.n_name IN ('NATION_18', 'NATION_19')
        |  AND n2.n_name IN ('NATION_18', 'NATION_19')
        |  AND n1.n_name <> n2.n_name
        |GROUP BY 1, 2, 3
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "q8_market_share" ->
      """SELECT strftime(o_orderdate, '%Y') AS o_year,
        |  round(CAST(sum(CASE WHEN n1.n_name = 'NATION_1' THEN
        |      CAST(l_extendedprice AS DECIMAL(18,2)) *
        |        (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
        |      END) AS DOUBLE)
        |    / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |        (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
        |      AS DOUBLE), 6) AS mkt_share
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |JOIN region ON n2.n_regionkey = r_regionkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |WHERE p_type = 'PROMO' AND r_name = 'EUROPE'
        |GROUP BY 1 ORDER BY o_year""".stripMargin,
    "q_semi_join" ->
      """SELECT c_nationkey, count(*) AS cnt FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_nationkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin,
    "q_recursive" ->
      """WITH RECURSIVE edges AS (
        |  SELECT o_custkey AS cust, o_orderkey AS ok,
        |    lag(o_orderkey) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) AS prev_ok
        |  FROM orders),
        |chain AS (
        |  SELECT cust, ok, 1 AS depth FROM edges WHERE prev_ok IS NULL
        |  UNION ALL
        |  SELECT e.cust, e.ok, c.depth + 1
        |  FROM chain c JOIN edges e ON e.prev_ok = c.ok
        |  WHERE c.depth < 8
        |)
        |SELECT cust, ok, depth FROM chain ORDER BY cust, depth""".stripMargin,
    "q_topk" ->
      """SELECT o_orderkey, o_totalprice,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_s
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 20""".stripMargin,
    "q_lateral" ->
      """SELECT n_name, t.s_name, t.s_acctbal
        |FROM nation JOIN LATERAL (
        |  SELECT s_name, s_acctbal, s_suppkey FROM supplier
        |  WHERE s_nationkey = n_nationkey
        |  ORDER BY s_acctbal DESC, s_suppkey LIMIT 2) t ON true
        |ORDER BY n_name, s_acctbal DESC, s_name""".stripMargin,
    "q_setops" ->
      """SELECT c_custkey FROM (
        |  (SELECT c_custkey FROM customer WHERE c_acctbal > 9000
        |   UNION
        |   SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
        |  INTERSECT
        |  (SELECT c_custkey FROM customer WHERE c_acctbal > 9000
        |   UNION
        |   SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
        |  EXCEPT
        |  SELECT c_custkey FROM customer WHERE c_acctbal < 0
        |) ORDER BY c_custkey""".stripMargin,
    "q_full_outer" ->
      """WITH od AS (SELECT day(o_orderdate) AS day, count(*) AS n_orders
        |  FROM orders WHERE day(o_orderdate) NOT IN (29, 30) GROUP BY 1),
        |ed AS (SELECT day(ts) AS day, count(*) AS n_events
        |  FROM events GROUP BY 1)
        |SELECT COALESCE(od.day, ed.day) AS day,
        |  COALESCE(n_orders, 0) AS n_orders,
        |  COALESCE(n_events, 0) AS n_events
        |FROM od FULL OUTER JOIN ed ON od.day = ed.day
        |ORDER BY day""".stripMargin,
    "q_distinct_agg" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q2_min_price" ->
      """SELECT p_type, p_partkey, p_retailprice FROM part
        |JOIN (SELECT p_type AS mt, min(p_retailprice) AS mp
        |      FROM part GROUP BY 1)
        |  ON p_type = mt AND p_retailprice = mp
        |ORDER BY p_type, p_partkey""".stripMargin,
    "q4_priority_exists" ->
      """SELECT o_orderpriority, count(*) AS order_count FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q21_sole_blame" ->
      """SELECT s_name, count(*) AS numwait
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE o_orderstatus = 'F'
        |  AND l1.l_returnflag = 'R'
        |  AND n_name = 'NATION_3'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_returnflag = 'R')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name""".stripMargin,
    "q17_small_quantity" ->
      """SELECT p_brand,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    / 7.0 AS avg_yearly
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
        |  AND l_quantity < (
        |    SELECT 0.2 * (CAST(sum(CAST(l2.l_quantity AS DECIMAL(18,2)))
        |        AS DOUBLE) / CAST(count(*) AS DOUBLE))
        |    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin,
    "q6_banded_revenue" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND CAST(l_discount AS DECIMAL(3,2))
        |    BETWEEN CAST('0.05' AS DECIMAL(3,2)) AND CAST('0.07' AS DECIMAL(3,2))
        |  AND l_quantity < 24""".stripMargin,
    "q9_profit_by_nation" ->
      """SELECT n_name, strftime(l_shipdate, '%Y') AS l_year,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
        |    AS profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY 1, 2 ORDER BY n_name, l_year""".stripMargin,
    "q12_priority_class" ->
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q14_promo_share" ->
      """SELECT round(100 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN
        |    CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
        |    END) AS DOUBLE)
        |  / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
        |    AS DOUBLE), 6) AS promo_share
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-03-01'
        |  AND l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin,
    "q18_big_orders" ->
      """SELECT c_custkey, c_name, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_s,
        |  o_totalprice, sum_qty
        |FROM orders
        |JOIN (SELECT l_orderkey AS bok,
        |        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |      FROM lineitem GROUP BY 1 HAVING sum_qty > 250)
        |  ON o_orderkey = bok
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY sum_qty DESC, o_orderkey
        |LIMIT 20""".stripMargin,
    "q_bloom_semi" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
        |    AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |WHERE EXISTS (SELECT 1 FROM part
        |  WHERE p_partkey = l_partkey AND p_partkey % 50 = 0)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q19_disjunctive" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
        |    AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        |        AND l_quantity BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
        |        AND l_quantity BETWEEN 10 AND 30)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
        |        AND l_quantity BETWEEN 20 AND 40)""".stripMargin,
  )
}
