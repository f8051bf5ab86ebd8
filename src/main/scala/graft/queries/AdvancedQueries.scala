package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.PortableFns._
import graft.sources.Sources

/** Advanced aggregate surface: statistical moments (computed from exact
  * decimal power sums, so cross-engine deterministic), percentiles,
  * deterministic arg-max, ordered string aggregation, pivot, and
  * subquery shapes.
  */
object AdvancedQueries {

  private def t(s: SparkSession, dir: String, n: String) = Sources.table(s, dir, n)

  /** Scale-adaptive fan-out (Sources.fannedTable scaladoc) for queries
    * whose per-row AGGREGATE work (HLL updates, percentile state, KMV
    * sketch inserts) dominates a scan the testdata layout starves down
    * to one task. Selective by measurement (OPTIMIZATION_r20.md);
    * no-op at production split counts.
    */
  private def tF(s: SparkSession, dir: String, n: String, key: String) =
    Sources.fannedTable(s, dir, n, key)

  /** revenue = extendedprice * (1 - discount), exact decimal. */
  private def revenueAdv =
    col("l_extendedprice").cast(DecimalType(18, 2)) *
      (lit(1).cast(DecimalType(3, 2)) - col("l_discount").cast(DecimalType(3, 2)))

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Data-quality constraint report (Deequ-style): completeness,
    // range, domain, and uniqueness checks over lineitem, emitted as a
    // tall (check_name, metric, passed) audit table. ONE pass over the
    // fact computes every metric (conditional sums + one distinct count
    // in a single aggregate — no per-check scans); the pivot to tall
    // form is a zero-shuffle stack over the 1-row aggregate. The
    // discount_le_008 rule is deliberately violated by the data so the
    // report demonstrates failure accounting, not just green checks.
    "a_dq_report" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val agg = li.agg(
        count(lit(1)).cast("double").as("n"),
        sum(when(col("l_quantity").isNotNull, 1).otherwise(0))
          .cast("double").as("nn_qty"),
        sum(when(col("l_quantity").between(1, 50), 1).otherwise(0))
          .cast("double").as("in_qty"),
        sum(when(col("l_discount") <= 0.08, 1).otherwise(0))
          .cast("double").as("lo_disc"),
        sum(when(col("l_extendedprice") > 0, 1).otherwise(0))
          .cast("double").as("pos_pr"),
        countDistinct(concat_ws("#",
          col("l_orderkey"), col("l_linenumber")))
          .cast("double").as("uniq_ol"),
        sum(when(col("l_returnflag").isin("A", "N", "R"), 1).otherwise(0))
          .cast("double").as("dom_rf"))
      agg.select(expr(
        "stack(6, " +
          "'completeness_quantity', nn_qty/n, " +
          "'range_quantity_1_50', in_qty/n, " +
          "'discount_le_008', lo_disc/n, " +
          "'positive_price', pos_pr/n, " +
          "'uniqueness_orderline', uniq_ol/n, " +
          "'domain_returnflag', dom_rf/n) as (check_name, metric)"))
        .select(col("check_name"),
          round(col("metric"), 6).as("metric"),
          (col("metric") >= 1.0).as("passed"))
        .orderBy("check_name")
    }),

    // Population-stability-index shape drift
    // (DataQuality.psiBetween): PSI = Σ (p−q)·ln(p/q) between two
    // relations' value distributions over the BASELINE's equi-width
    // bins (out-of-range current values clamp into the edge bins;
    // proportions floored at 1e-6). Catches the same-bounds,
    // same-cardinality shifts the profile drift gate provably misses
    // (DataQualitySpec). Scale shape: bounds reduce to one broadcast
    // row, each side buckets MAP-SIDE into ≤ 10 cells, and the fold
    // runs over the joined bin counts — nothing row-proportional
    // shuffles. Here: view-event values as baseline, purchase-event
    // values as current.
    "a_dq_psi" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      graft.operators.DataQuality.psiBetween(
        ev.filter(col("event_type") === "view"),
        ev.filter(col("event_type") === "purchase"),
        "value", bins = 10)
    }),

    // CATEGORICAL PSI (DataQuality.psiBetweenCategorical): same
    // population-stability fold, but the bins are the BASELINE's top-K
    // categories (count desc, value asc — a total order both engines
    // replay) plus one `__other__` tail bucket — the shape rule for
    // columns where "distribution" means category MIX, which can shift
    // arbitrarily inside stable cardinality and completeness. Scale
    // shape: the top-K head reduces via TakeOrdered (K rows) and
    // broadcasts into both sides' MAP-SIDE binning; ≤ K+1 bin-count
    // rows shuffle per side. Here: source mix of English documents as
    // baseline vs non-English documents as current, K=8 (20 sources,
    // so the tail bucket carries real mass).
    "a_dq_psi_cat" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.operators.DataQuality.psiBetweenCategorical(
        docs.filter(col("lang") === "en"),
        docs.filter(col("lang") =!= "en"),
        "source", topK = 8)
    }),

    // Categorical concentration profile by GINI IMPURITY — the
    // log-free face of column entropy (1 − Σp², monotone with entropy
    // for profiling purposes; libm log would diverge between engines,
    // the t_collocations/t_tfidf precedent). gini = (N² − Σc²)/N² is
    // RATIONAL: per-value counts from one map-combined agg per column,
    // exact integer numerator, one IEEE division → hash-identical.
    // Profiling shape: one pass per column over the value domain, rows
    // out = |columns|.
    "a_gini" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      def giniOf(c: String) = {
        val cd = col("cnt").cast(DecimalType(18, 0))
        val m = o.groupBy(col(c)).agg(count(lit(1)).as("cnt"))
          .agg(count(lit(1)).as("n_distinct"), sum(col("cnt")).as("n"),
            sum(cd * cd).as("ss")) // decimal: c² would overflow long
        // doubles with a fixed op order (not n·n in longs — overflows
        // at cluster-scale row counts); both engines round identically
        val nD = col("n").cast("double")
        m.select(lit(c).as("column_name"), col("n_distinct"),
          round((nD * nD - col("ss").cast("double")) / (nD * nD), 6)
            .as("gini"))
      }
      giniOf("o_orderstatus")
        .unionByName(giniOf("o_orderpriority"))
        .orderBy("column_name")
    }),

    // Deterministic NEGATIVE SAMPLING via the sort-free
    // [[graft.operators.Sampling.negativeSample]] operator (map-only +
    // two broadcasts; see its scaladoc for the hash-mod recipe and FK
    // proof). This wrapper is the VERIFY EDGE: the hash-compare
    // contract needs a canonical total order, so the global sort lives
    // here — library callers of the operator never pay it.
    "a_neg_sampling" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val dim = t(s, dir, "part")
        .select(col("p_partkey"), col("p_type").as("neg_type"))
      graft.operators.Sampling
        .negativeSample(li, dim,
          Seq("l_orderkey", "l_linenumber"), "l_partkey", "p_partkey")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("pos_key").as("pos_part"), col("neg_key").as("neg_part"),
          col("collision"), col("neg_type"))
        // (orderkey, linenumber) is NOT unique in the synthetic data —
        // pos_part completes the deterministic total order
        .orderBy("l_orderkey", "l_linenumber", "pos_part")
    }),

    // Pearson correlation + OLS slope from exact decimal power sums
    // (Σx, Σy, Σx², Σy², Σxy) — the bivariate extension of a_stats'
    // recipe: every sum is an exact decimal, converted to double only
    // in the final closed-form expressions, so both engines emit
    // identical doubles. ONE pass over the fact per group; the five
    // power sums are the entire sufficient statistic (and a mergeable
    // one — partial sums combine map-side, and the same five numbers
    // would merge across 1000 executors or across days).
    "a_corr" -> ((s, dir) => {
      val x = col("l_quantity").cast(DecimalType(9, 2))
      val y = col("l_extendedprice").cast(DecimalType(18, 2))
      val m = tF(s, dir, "lineitem", "l_orderkey")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum(x).as("sx"), sum(y).as("sy"),
          sum(x * x).as("sxx"), sum(y * y).as("syy"), sum(x * y).as("sxy"))
      val (nD, sxD, syD) =
        (col("n").cast("double"), col("sx").cast("double"), col("sy").cast("double"))
      val (sxxD, syyD, sxyD) =
        (col("sxx").cast("double"), col("syy").cast("double"), col("sxy").cast("double"))
      val covN = nD * sxyD - sxD * syD
      m.select(col("l_returnflag"), col("n"),
        round(covN / (sqrt(nD * sxxD - sxD * sxD) * sqrt(nD * syyD - syD * syD)), 6)
          .as("corr"),
        round(covN / (nD * sxxD - sxD * sxD), 6).as("slope"))
        .orderBy("l_returnflag")
    }),

    // Sample variance/stddev from exact decimal power sums:
    // var = (n·Σx² − (Σx)²) / (n·(n−1)) — the decimal numerator is exact,
    // so both engines produce the same double.
    "a_stats" -> ((s, dir) => {
      // widths chosen so every decimal product stays ≤ precision 38 with
      // no scale reduction in EITHER engine; the numerator terms n·Σx²
      // and (Σx)² are exact decimals, converted to double only at the end
      // (both engines round the same exact values → identical doubles).
      val x = col("l_quantity").cast(DecimalType(9, 2))
      // r20 opt: fanned like a_corr — same decimal power-sum shape
      // over the same starved single-split scan (guide §2.5).
      val base = tF(s, dir, "lineitem", "l_orderkey")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum(x).as("s1r"), sum(x * x).as("s2r"))
        .select(col("l_returnflag"), col("n"),
          col("n").cast(DecimalType(10, 0)).as("nd"),
          col("s1r").cast(DecimalType(18, 2)).as("s1"),
          col("s2r").cast(DecimalType(27, 4)).as("s2"))
      val numer = (col("nd") * col("s2")).cast("double") -
        (col("s1") * col("s1")).cast("double")
      val denom = (col("n") * (col("n") - 1)).cast("double")
      base.select(col("l_returnflag"), col("n"),
          col("s1").cast("double").as("sum_qty"),
          (numer / denom).as("var_qty"),
          sqrt(numer / denom).as("std_qty"))
        .orderBy("l_returnflag")
    }),

    // Percentiles (linear interpolation); rounded to absorb the engines'
    // different-but-equivalent interpolation arithmetic.
    "a_percentile" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 2).as("p50"),
          round(expr("percentile(o_totalprice, 0.9)"), 2).as("p90"),
          round(expr("percentile(o_totalprice, 0.99)"), 2).as("p99"))
        .orderBy("o_orderstatus")),

    // WINSORIZED mean: per-group p05/p95 caps (a_percentile's portable
    // interpolated-percentile recipe, rounded to 2 dp so both engines
    // clamp against identical decimal bounds), values clamped as exact
    // decimals, mean via the davg decimal-sum recipe. The outlier-
    // robust location statistic a feature pipeline prefers over a raw
    // mean. Scale shape: the percentile pass is one grouped aggregate
    // over the 4-value status domain, broadcast back to the fact —
    // clamping is map-only on the one real scan.
    "a_winsorize" -> ((s, dir) => {
      val o = tF(s, dir, "orders", "o_orderkey")
      val caps = o.groupBy("o_orderstatus").agg(
        round(expr("percentile(o_totalprice, 0.05)"), 2)
          .cast(DecimalType(18, 2)).as("lo"),
        round(expr("percentile(o_totalprice, 0.95)"), 2)
          .cast(DecimalType(18, 2)).as("hi"))
      val clamped = o.join(broadcast(caps), "o_orderstatus")
        .select(col("o_orderstatus"),
          least(greatest(col("o_totalprice").cast(DecimalType(18, 2)),
            col("lo")), col("hi")).as("w"))
      clamped.groupBy("o_orderstatus")
        .agg(round(sum(col("w")).cast("double") /
            count(lit(1)).cast("double"), 4).as("wmean"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus")
    }),

    // Deterministic MODE (most frequent value) per group, ties broken
    // toward the smaller value — engine-portable where a native mode()
    // is not (tie behavior differs across engines). Two grouped
    // aggregates: value-counts (map-side combined), then a per-group
    // top-1 window over the tiny (group × distinct-value) domain.
    "a_mode" -> ((s, dir) => {
      val counts = t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_quantity")
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("n").desc, col("l_quantity"))
      counts.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("l_returnflag"), col("l_quantity").as("mode_qty"),
          col("n").as("n_mode"))
        .orderBy("l_returnflag")
    }),

    // Deterministic arg-max: the order with the max price per status;
    // ties broken by min orderkey (join-based, no engine-specific
    // arg_max tie behavior).
    "a_argmax" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val mx = o.groupBy(col("o_orderstatus").as("status"))
        .agg(max(col("o_totalprice")).as("max_price"))
      o.join(broadcast(mx), o("o_orderstatus") === mx("status") &&
          o("o_totalprice") === mx("max_price"))
        .groupBy("status", "max_price")
        .agg(min(col("o_orderkey")).as("best_order"))
        .orderBy("status")
    }),

    // Ordered string aggregation (sorted concat — deterministic).
    "a_string_agg" -> ((s, dir) =>
      t(s, dir, "nation")
        .groupBy("n_regionkey")
        .agg(array_join(array_sort(collect_list(col("n_name"))), ",")
          .as("nations"))
        .orderBy("n_regionkey")),

    // Pivot: linestatus columns per returnflag (explicit value list so
    // output columns are stable).
    "a_pivot" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(count(lit(1)))
        .orderBy("l_returnflag")),

    // Scalar subquery: orders above the global average price.
    "a_scalar_subquery" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders_sq")
      s.sql(
        """SELECT o_orderstatus, count(*) AS cnt FROM orders_sq
          |WHERE o_totalprice > (SELECT CAST(sum(CAST(o_totalprice AS
          |    DECIMAL(18,2))) AS DOUBLE) / CAST(count(*) AS DOUBLE)
          |  FROM orders_sq)
          |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
    }),

    // TPC-H Q10-shaped multi-join: returned-item revenue per customer,
    // top-20. Two fact tables shuffle on orderkey; customer/nation
    // broadcast.
    "a_returned_revenue" -> ((s, dir) => {
      val line = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      val ord = t(s, dir, "orders")
      val cust = t(s, dir, "customer")
      val nat = t(s, dir, "nation")
      line
        .join(ord, line("l_orderkey") === ord("o_orderkey"))
        .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
        .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(sum(revenueAdv).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // Correlated scalar subquery: parts above their own brand's mean
    // price (exact-decimal mean → identical threshold in both engines).
    "a_correlated" -> ((s, dir) => {
      t(s, dir, "part").createOrReplaceTempView("part_cs")
      s.sql(
        """SELECT p_brand, count(*) AS n_above
          |FROM part_cs p
          |WHERE p_retailprice > (
          |  SELECT CAST(sum(CAST(p2.p_retailprice AS DECIMAL(18,2)))
          |      AS DOUBLE) / CAST(count(*) AS DOUBLE)
          |  FROM part_cs p2 WHERE p2.p_brand = p.p_brand)
          |GROUP BY p_brand ORDER BY p_brand""".stripMargin)
    }),

    // Time-series gap fill: every (event_type × hour) slot over January
    // 2024, zero-filled — sequence generation + cross join + left join.
    "a_gapfill" -> ((s, dir) => {
      val hours = s.range(1).select(explode(sequence(
        lit("2024-01-01 00:00:00").cast("timestamp"),
        lit("2024-01-30 23:00:00").cast("timestamp"),
        expr("INTERVAL 1 HOUR"))).as("h"))
      val types = t(s, dir, "events").select("event_type").distinct()
      val hourly = t(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
        .agg(count(lit(1)).as("c"))
      hours.crossJoin(broadcast(types))
        .join(hourly, Seq("h", "event_type"), "left_outer")
        .select(date_format(col("h"), "yyyy-MM-dd HH:mm").as("hour"),
          col("event_type"), coalesce(col("c"), lit(0L)).as("cnt"))
        .orderBy("hour", "event_type")
    }),

    // first/last/nth value window functions.
    "a_first_last" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "orders")
        .filter(col("o_custkey") <= 50)
        .select(col("o_custkey"), col("o_orderkey"),
          first(col("o_totalprice")).over(w).as("first_price"),
          last(col("o_totalprice")).over(w).as("last_price"),
          nth_value(col("o_totalprice"), 2).over(w).as("second_price"))
        .orderBy("o_custkey", "o_orderkey")
    }),
  )

  val oracles: Map[String, String] = Map(
    "a_neg_sampling" ->
      """WITH p AS (SELECT max(p_partkey) AS mp FROM part),
        |n AS (SELECT l_orderkey, l_linenumber, l_partkey AS pos_part,
        |    1 + CAST(('0x' || substring(md5('neg:' || l_orderkey || ':'
        |      || l_linenumber), 1, 8)) AS BIGINT) % mp AS neg_part
        |  FROM lineitem, p)
        |SELECT n.l_orderkey, n.l_linenumber, n.pos_part, n.neg_part,
        |  n.neg_part = n.pos_part AS collision, pt.p_type AS neg_type
        |FROM n JOIN part pt ON n.neg_part = pt.p_partkey
        |ORDER BY l_orderkey, l_linenumber, pos_part""".stripMargin,
    "a_corr" ->
      """WITH m AS (SELECT l_returnflag, count(*) AS n,
        |    sum(CAST(l_quantity AS DECIMAL(9,2))) AS sx,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
        |    sum(CAST(l_quantity AS DECIMAL(9,2))
        |      * CAST(l_quantity AS DECIMAL(9,2))) AS sxx,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * CAST(l_extendedprice AS DECIMAL(18,2))) AS syy,
        |    sum(CAST(l_quantity AS DECIMAL(9,2))
        |      * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, n,
        |  round((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
        |    / (sqrt(CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
        |      * sqrt(CAST(n AS DOUBLE)*CAST(syy AS DOUBLE)
        |        - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))), 6) AS corr,
        |  round((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
        |    / (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)), 6) AS slope
        |FROM m ORDER BY l_returnflag""".stripMargin,
    "a_gini" ->
      """WITH s AS (SELECT o_orderstatus AS v FROM orders),
        |cs AS (SELECT v, count(*) AS cnt FROM s GROUP BY 1),
        |gs AS (SELECT 'o_orderstatus' AS column_name,
        |    count(*) AS n_distinct,
        |    round((CAST(sum(cnt) AS DOUBLE) * CAST(sum(cnt) AS DOUBLE)
        |        - CAST(sum(cnt * cnt) AS DOUBLE))
        |      / (CAST(sum(cnt) AS DOUBLE) * CAST(sum(cnt) AS DOUBLE)), 6)
        |      AS gini
        |  FROM cs),
        |p AS (SELECT o_orderpriority AS v FROM orders),
        |cp AS (SELECT v, count(*) AS cnt FROM p GROUP BY 1),
        |gp AS (SELECT 'o_orderpriority' AS column_name,
        |    count(*) AS n_distinct,
        |    round((CAST(sum(cnt) AS DOUBLE) * CAST(sum(cnt) AS DOUBLE)
        |        - CAST(sum(cnt * cnt) AS DOUBLE))
        |      / (CAST(sum(cnt) AS DOUBLE) * CAST(sum(cnt) AS DOUBLE)), 6)
        |      AS gini
        |  FROM cp)
        |SELECT * FROM gp UNION ALL SELECT * FROM gs
        |ORDER BY column_name""".stripMargin,
    "a_dq_report" ->
      """WITH a AS (SELECT
        |    CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(CASE WHEN l_quantity IS NOT NULL THEN 1 ELSE 0 END)
        |      AS DOUBLE) AS nn_qty,
        |    CAST(sum(CASE WHEN l_quantity BETWEEN 1 AND 50 THEN 1 ELSE 0
        |      END) AS DOUBLE) AS in_qty,
        |    CAST(sum(CASE WHEN l_discount <= 0.08 THEN 1 ELSE 0 END)
        |      AS DOUBLE) AS lo_disc,
        |    CAST(sum(CASE WHEN l_extendedprice > 0 THEN 1 ELSE 0 END)
        |      AS DOUBLE) AS pos_pr,
        |    CAST(count(DISTINCT CAST(l_orderkey AS VARCHAR) || '#'
        |      || CAST(l_linenumber AS VARCHAR)) AS DOUBLE) AS uniq_ol,
        |    CAST(sum(CASE WHEN l_returnflag IN ('A','N','R') THEN 1
        |      ELSE 0 END) AS DOUBLE) AS dom_rf
        |  FROM lineitem),
        |tall AS (
        |  SELECT 'completeness_quantity' AS check_name, nn_qty/n AS m FROM a
        |  UNION ALL SELECT 'range_quantity_1_50', in_qty/n FROM a
        |  UNION ALL SELECT 'discount_le_008', lo_disc/n FROM a
        |  UNION ALL SELECT 'positive_price', pos_pr/n FROM a
        |  UNION ALL SELECT 'uniqueness_orderline', uniq_ol/n FROM a
        |  UNION ALL SELECT 'domain_returnflag', dom_rf/n FROM a)
        |SELECT check_name, round(m, 6) AS metric, m >= 1.0 AS passed
        |FROM tall ORDER BY check_name""".stripMargin,
    "a_dq_psi" ->
      """WITH b AS (SELECT min("value") AS lo, max("value") AS hi
        |    FROM events WHERE event_type = 'view'),
        |bb AS (SELECT LEAST(GREATEST(CAST(floor(("value" - lo)
        |      / ((hi - lo) / 10.0)) AS BIGINT), 0), 9) AS bucket,
        |    count(*) AS nb
        |  FROM events, b
        |  WHERE event_type = 'view' AND "value" IS NOT NULL GROUP BY 1),
        |cb AS (SELECT LEAST(GREATEST(CAST(floor(("value" - lo)
        |      / ((hi - lo) / 10.0)) AS BIGINT), 0), 9) AS bucket,
        |    count(*) AS nc
        |  FROM events, b
        |  WHERE event_type = 'purchase' AND "value" IS NOT NULL GROUP BY 1),
        |j AS (SELECT COALESCE(bb.nb, 0) AS nb, COALESCE(cb.nc, 0) AS nc
        |  FROM bb FULL OUTER JOIN cb ON bb.bucket = cb.bucket),
        |t AS (SELECT CAST(sum(nb) AS DOUBLE) AS tb,
        |    CAST(sum(nc) AS DOUBLE) AS tc FROM j)
        |SELECT round(sum(
        |    (GREATEST(nb / tb, 1e-6) - GREATEST(nc / tc, 1e-6))
        |    * ln(GREATEST(nb / tb, 1e-6) / GREATEST(nc / tc, 1e-6))), 4)
        |  AS psi,
        |  CAST(max(tb) AS BIGINT) AS n_base,
        |  CAST(max(tc) AS BIGINT) AS n_cur
        |FROM j, t""".stripMargin,
    "a_dq_psi_cat" ->
      """WITH b AS (SELECT CAST(source AS VARCHAR) AS v FROM documents
        |  WHERE lang = 'en' AND source IS NOT NULL),
        |c AS (SELECT CAST(source AS VARCHAR) AS v FROM documents
        |  WHERE lang <> 'en' AND source IS NOT NULL),
        |tk AS (SELECT v, count(*) AS n FROM b GROUP BY v
        |  ORDER BY n DESC, v ASC LIMIT 8),
        |bb AS (SELECT CASE WHEN v IN (SELECT v FROM tk) THEN v
        |    ELSE '__other__' END AS bin, count(*) AS nb FROM b GROUP BY 1),
        |cb AS (SELECT CASE WHEN v IN (SELECT v FROM tk) THEN v
        |    ELSE '__other__' END AS bin, count(*) AS nc FROM c GROUP BY 1),
        |j AS (SELECT COALESCE(bb.nb, 0) AS nb, COALESCE(cb.nc, 0) AS nc
        |  FROM bb FULL OUTER JOIN cb ON bb.bin = cb.bin),
        |t AS (SELECT CAST(sum(nb) AS DOUBLE) AS tb,
        |    CAST(sum(nc) AS DOUBLE) AS tc FROM j)
        |SELECT round(sum(
        |    (GREATEST(nb / tb, 1e-6) - GREATEST(nc / tc, 1e-6))
        |    * ln(GREATEST(nb / tb, 1e-6) / GREATEST(nc / tc, 1e-6))), 4)
        |  AS psi,
        |  CAST(max(tb) AS BIGINT) AS n_base,
        |  CAST(max(tc) AS BIGINT) AS n_cur
        |FROM j, t""".stripMargin,
    "a_stats" ->
      """WITH m AS (SELECT l_returnflag, count(*) AS n,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(9,2))) AS DECIMAL(18,2)) AS s1,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(9,2))
        |      * CAST(l_quantity AS DECIMAL(9,2))) AS DECIMAL(27,4)) AS s2
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  CAST(s1 AS DOUBLE) AS sum_qty,
        |  (CAST(CAST(n AS DECIMAL(10,0)) * s2 AS DOUBLE)
        |      - CAST(s1 * s1 AS DOUBLE))
        |    / CAST(n * (n - 1) AS DOUBLE) AS var_qty,
        |  sqrt((CAST(CAST(n AS DECIMAL(10,0)) * s2 AS DOUBLE)
        |      - CAST(s1 * s1 AS DOUBLE))
        |    / CAST(n * (n - 1) AS DOUBLE)) AS std_qty
        |FROM m ORDER BY l_returnflag""".stripMargin,
    "a_percentile" ->
      """SELECT o_orderstatus,
        |  round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
        |  round(quantile_cont(o_totalprice, 0.9), 2) AS p90,
        |  round(quantile_cont(o_totalprice, 0.99), 2) AS p99
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "a_winsorize" ->
      """WITH caps AS (SELECT o_orderstatus,
        |    CAST(round(quantile_cont(o_totalprice, 0.05), 2)
        |      AS DECIMAL(18,2)) AS lo,
        |    CAST(round(quantile_cont(o_totalprice, 0.95), 2)
        |      AS DECIMAL(18,2)) AS hi
        |  FROM orders GROUP BY o_orderstatus),
        |w AS (SELECT o.o_orderstatus,
        |    least(greatest(CAST(o.o_totalprice AS DECIMAL(18,2)), c.lo),
        |      c.hi) AS w
        |  FROM orders o JOIN caps c ON o.o_orderstatus = c.o_orderstatus)
        |SELECT o_orderstatus,
        |  round(CAST(sum(w) AS DOUBLE) / CAST(count(*) AS DOUBLE), 4)
        |    AS wmean,
        |  count(*) AS n
        |FROM w GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "a_mode" ->
      """WITH c AS (SELECT l_returnflag, l_quantity, count(*) AS n
        |  FROM lineitem GROUP BY 1, 2),
        |r AS (SELECT l_returnflag, l_quantity, n,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY n DESC, l_quantity) AS rn
        |  FROM c)
        |SELECT l_returnflag, l_quantity AS mode_qty, n AS n_mode
        |FROM r WHERE rn = 1 ORDER BY l_returnflag""".stripMargin,
    "a_argmax" ->
      """WITH mx AS (SELECT o_orderstatus AS status, max(o_totalprice) AS max_price
        |  FROM orders GROUP BY 1)
        |SELECT status, max_price, min(o_orderkey) AS best_order
        |FROM orders JOIN mx
        |  ON o_orderstatus = status AND o_totalprice = max_price
        |GROUP BY status, max_price ORDER BY status""".stripMargin,
    "a_string_agg" ->
      """SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
    "a_pivot" ->
      """SELECT l_returnflag,
        |  count(*) FILTER (l_linestatus = 'F') AS "F",
        |  count(*) FILTER (l_linestatus = 'O') AS "O"
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "a_scalar_subquery" ->
      """SELECT o_orderstatus, count(*) AS cnt FROM orders
        |WHERE o_totalprice > (SELECT CAST(sum(CAST(o_totalprice AS
        |    DECIMAL(18,2))) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |  FROM orders)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "a_returned_revenue" ->
      """SELECT c_custkey, c_name, n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
        |    AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,
    "a_correlated" ->
      """SELECT p_brand, count(*) AS n_above
        |FROM part p
        |WHERE p_retailprice > (
        |  SELECT CAST(sum(CAST(p2.p_retailprice AS DECIMAL(18,2)))
        |      AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |  FROM part p2 WHERE p2.p_brand = p.p_brand)
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "a_gapfill" ->
      """WITH hours AS (
        |  SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
        |    TIMESTAMP '2024-01-30 23:00:00', INTERVAL 1 HOUR)) AS h),
        |types AS (SELECT DISTINCT event_type AS et FROM events),
        |hourly AS (SELECT date_trunc('hour', ts) AS h, event_type,
        |    count(*) AS c
        |  FROM events GROUP BY 1, 2)
        |SELECT strftime(hours.h, '%Y-%m-%d %H:%M') AS hour,
        |  types.et AS event_type,
        |  COALESCE(hourly.c, 0) AS cnt
        |FROM hours CROSS JOIN types
        |LEFT JOIN hourly ON hours.h = hourly.h
        |  AND types.et = hourly.event_type
        |ORDER BY hour, event_type""".stripMargin,
    "a_first_last" ->
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_totalprice) OVER w AS first_price,
        |  last_value(o_totalprice) OVER w AS last_price,
        |  nth_value(o_totalprice, 2) OVER w AS second_price
        |FROM orders WHERE o_custkey <= 50
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
  )
}
