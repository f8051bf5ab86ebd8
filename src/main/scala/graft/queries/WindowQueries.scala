package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.PortableFns._
import graft.sources.Sources

/** Window-function surface (SURVEY.md §2B — absent from the reference).
  *
  * Scale notes: every window here partitions by a real key
  * (nation/supplier/customer), so the sort is per-partition after one
  * shuffle — no global sort, no single-task window. Running sums use
  * exact decimal arithmetic so the sequential fold matches DuckDB
  * bit-for-bit.
  */
object WindowQueries {

  private def t(s: SparkSession, dir: String, n: String) = Sources.table(s, dir, n)

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // row_number top-k per group: top-3 customers by balance per nation.
    "w_rank_per_group" -> ((s, dir) => {
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, dir, "customer")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("c_nationkey", "rn", "c_custkey", "c_acctbal")
        .orderBy("c_nationkey", "rn")
    }),

    // rank vs dense_rank on ties: order priorities per status.
    "w_rank_dense" -> ((s, dir) => {
      val byCnt = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_orderpriority"))
      t(s, dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("cnt"))
        .withColumn("rnk", rank().over(byCnt))
        .withColumn("drnk", dense_rank().over(byCnt))
        .orderBy("o_orderstatus", "o_orderpriority")
    }),

    // running (prefix) sum per supplier in deterministic order — exact
    // decimal so the fold is engine-independent.
    "w_running_sum" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "lineitem")
        .filter(col("l_suppkey") <= 5)
        .withColumn("running_qty",
          sum(col("l_quantity").cast(DecimalType(18, 2))).over(w).cast("double"))
        .select(col("l_suppkey"), dateStr(col("l_shipdate")).as("ship_s"),
          col("l_orderkey"), col("l_linenumber"), col("running_qty"))
        .orderBy("l_suppkey", "ship_s", "l_orderkey", "l_linenumber")
    }),

    // lag/lead: previous/next order price per customer + day gap.
    "w_lag_lead" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .filter(col("o_custkey") <= 100)
        .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
        .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
        .withColumn("days_since_prev",
          datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w)))
        .select(col("o_custkey"), col("o_orderkey"),
          dateStr(col("o_orderdate")).as("odate_s"),
          col("o_totalprice"), col("prev_price"), col("next_price"),
          col("days_since_prev"))
        .orderBy("o_custkey", "odate_s", "o_orderkey")
    }),

    // value-based frame: moving average over the last 2 rows + current,
    // exact decimal mean of a fixed 3-row frame.
    "w_moving_avg" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(-2, Window.currentRow)
      t(s, dir, "lineitem")
        .filter(col("l_suppkey") <= 3)
        .withColumn("mov_sum",
          sum(col("l_extendedprice").cast(DecimalType(18, 2))).over(w).cast("double"))
        .withColumn("mov_n", count(lit(1)).over(w))
        .select(col("l_suppkey"), dateStr(col("l_shipdate")).as("ship_s"),
          col("l_orderkey"), col("l_linenumber"), col("mov_sum"), col("mov_n"))
        .orderBy("l_suppkey", "ship_s", "l_orderkey", "l_linenumber")
    }),

    // rank-fraction functions: percent_rank / cume_dist / ntile (exact
    // rational doubles — identical across engines).
    "w_percentiles" -> ((s, dir) => {
      val w = Window.partitionBy(col("c_nationkey")).orderBy(col("c_acctbal"), col("c_custkey"))
      t(s, dir, "customer")
        .filter(col("c_nationkey") <= 5)
        .withColumn("pr", percent_rank().over(w))
        .withColumn("cd", cume_dist().over(w))
        .withColumn("quartile", ntile(4).over(w))
        .select("c_nationkey", "c_custkey", "c_acctbal", "pr", "cd", "quartile")
        .orderBy("c_nationkey", "c_acctbal", "c_custkey")
    }),

    // RANGE frame (value-based, not row-based): how many same-nation
    // customers sit within 500 balance units below each customer, and
    // their summed balance. Peers at equal balance are all in-frame, so
    // the result is tie-order-independent by construction.
    "w_range_frame" -> ((s, dir) => {
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal"))
        .rangeBetween(-500, 0)
      t(s, dir, "customer")
        .filter(col("c_nationkey") <= 3)
        .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
          count(lit(1)).over(w).as("peers_500"),
          sum(col("c_acctbal").cast(DecimalType(18, 2))).over(w)
            .cast("double").as("bal_500"))
        .orderBy("c_nationkey", "c_custkey")
    }),
  )

  val oracles: Map[String, String] = Map(
    "w_rank_per_group" ->
      """SELECT c_nationkey, rn, c_custkey, c_acctbal FROM (
        |  SELECT c_nationkey, c_custkey, c_acctbal,
        |    row_number() OVER (PARTITION BY c_nationkey
        |      ORDER BY c_acctbal DESC, c_custkey) AS rn
        |  FROM customer)
        |WHERE rn <= 3 ORDER BY c_nationkey, rn""".stripMargin,
    "w_rank_dense" ->
      """SELECT o_orderstatus, o_orderpriority, cnt,
        |  rank() OVER (PARTITION BY o_orderstatus ORDER BY o_orderpriority) AS rnk,
        |  dense_rank() OVER (PARTITION BY o_orderstatus ORDER BY o_orderpriority) AS drnk
        |FROM (SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
        |      FROM orders GROUP BY 1, 2)
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,
    "w_running_sum" ->
      """SELECT l_suppkey, strftime(l_shipdate, '%Y-%m-%d') AS ship_s,
        |  l_orderkey, l_linenumber,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) OVER (
        |    PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS running_qty
        |FROM lineitem WHERE l_suppkey <= 5
        |ORDER BY l_suppkey, ship_s, l_orderkey, l_linenumber""".stripMargin,
    "w_lag_lead" ->
      """SELECT o_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS odate_s, o_totalprice,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lead(o_totalprice, 1) OVER w AS next_price,
        |  date_diff('day', lag(o_orderdate, 1) OVER w, o_orderdate)
        |    AS days_since_prev
        |FROM orders WHERE o_custkey <= 100
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, odate_s, o_orderkey""".stripMargin,
    "w_moving_avg" ->
      """SELECT l_suppkey, strftime(l_shipdate, '%Y-%m-%d') AS ship_s,
        |  l_orderkey, l_linenumber,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS mov_sum,
        |  count(*) OVER w AS mov_n
        |FROM lineitem WHERE l_suppkey <= 3
        |WINDOW w AS (PARTITION BY l_suppkey
        |  ORDER BY l_shipdate, l_orderkey, l_linenumber
        |  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY l_suppkey, ship_s, l_orderkey, l_linenumber""".stripMargin,
    "w_percentiles" ->
      """SELECT c_nationkey, c_custkey, c_acctbal,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd,
        |  ntile(4) OVER w AS quartile
        |FROM customer WHERE c_nationkey <= 5
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_nationkey, c_acctbal, c_custkey""".stripMargin,
    "w_range_frame" ->
      """SELECT c_nationkey, c_custkey, c_acctbal,
        |  count(*) OVER w AS peers_500,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) OVER w AS DOUBLE) AS bal_500
        |FROM customer WHERE c_nationkey <= 3
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal
        |  RANGE BETWEEN 500 PRECEDING AND CURRENT ROW)
        |ORDER BY c_nationkey, c_custkey""".stripMargin,
  )
}
