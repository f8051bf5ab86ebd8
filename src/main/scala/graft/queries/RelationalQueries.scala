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

    // Distinct aggregation: exact COUNT(DISTINCT) per group.
    "q_distinct_agg" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")),
  )

  val oracles: Map[String, String] = Map(
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
    "q_topk" ->
      """SELECT o_orderkey, o_totalprice,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_s
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 20""".stripMargin,
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
    "q_distinct_agg" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
  )
}
