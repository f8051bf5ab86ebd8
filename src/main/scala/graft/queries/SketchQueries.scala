package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Joins
import graft.sources.Sources

/** Sketch/approximate operators and the as-of join.
  *
  * `x_approx_distinct` / `x_approx_quantiles` have NO oracle entry on
  * purpose: HLL and t-digest internals differ across engines, so the
  * driver records the rows-only check (per the contract comment in
  * SparkEntry); their exact twins (q_distinct_agg, a_percentile) ARE
  * oracle-checked. `x_kmv_distinct` shows the alternative: a sketch
  * whose hash function is engine-portable (md5) is deterministic and
  * fully oracle-checkable, estimate and error included.
  */
object SketchQueries {

  private def t(s: SparkSession, dir: String, n: String) = Sources.table(s, dir, n)

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // HLL approximate distinct (exact twin: q_distinct_agg).
    "x_approx_distinct" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          approx_count_distinct(col("l_partkey")).as("approx_parts"),
          approx_count_distinct(col("l_suppkey"), rsd = 0.01).as("approx_supps"))
        .orderBy("l_returnflag")),

    // Approximate quantiles (exact twin: a_percentile). Projected as
    // three SCALAR double columns — the driver's rows-only harness
    // sorts/hashes cell values, and an array cell is unhashable there.
    "x_approx_quantiles" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(expr("approx_percentile(o_totalprice, array(0.5, 0.9, 0.99))")
          .as("approx_p"))
        .select(col("o_orderstatus"),
          element_at(col("approx_p"), 1).cast("double").as("p50"),
          element_at(col("approx_p"), 2).cast("double").as("p90"),
          element_at(col("approx_p"), 3).cast("double").as("p99"))
        .orderBy("o_orderstatus")),

    // KMV (k-minimum-values) distinct-count sketch, k=64: estimate =
    // (k-1)·2³² / kth-smallest-hash over DISTINCT md5-prefix hashes.
    // Engine-portable (md5, integer hash space) → deterministic →
    // oracle-checked INCLUDING the estimate and its signed error vs the
    // exact count. EXECUTION runs the bounded-state [[graft.functions
    // .KmvSketch]] UDAF — the k smallest hashes per group are a k-row
    // mergeable partial aggregate (map-side combined, shuffles k longs
    // per group regardless of group size; at 100 TB never a global
    // per-group sort). The ORACLE stays the window/row_number
    // formulation, which KmvSketchSpec proves bit-identical.
    "x_kmv_distinct" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val k = 64
      val kmv = udaf(new graft.functions.KmvSketch(k))
      val h = conv(substring(md5(col("l_orderkey").cast("string")), 1, 8), 16, 10)
        .cast("long")
      val estRaw = col("est_raw")
      li.select(col("l_returnflag"), h.as("h"), col("l_orderkey"))
        .groupBy("l_returnflag")
        .agg(kmv(col("h")).as("est_raw"),
          countDistinct(col("l_orderkey")).as("exact_distinct"))
        .select(col("l_returnflag"),
          round(estRaw, 4).as("est_distinct"),
          col("exact_distinct"),
          round((estRaw / col("exact_distinct").cast("double") - 1) * 100, 4)
            .as("err_pct"))
        .orderBy("l_returnflag")
    }),

    // KMV sketch SET ALGEBRA (Beyer et al. 2007, "On synopses for
    // distinct-value estimation under multiset operations"): the k
    // smallest hashes of two key sets are mergeable states whose merge
    // (k smallest of the union) estimates |A∪B|, and the fraction of the
    // union sketch present in BOTH input sketches estimates Jaccard,
    // giving |A∩B| ≈ ρ·|A∪B| — distinct-set intersection WITHOUT ever
    // joining the sets. The 100-TB shape: each side's k-minima come from
    // TakeOrderedAndProject (per-partition top-k, merged at the driver —
    // no global sort), so two 100-TB scans reduce to two k-row states
    // before any cross-side work; the exact columns (for the
    // oracle-checked error) are the expensive distinct counts the sketch
    // replaces. A = orderkeys shipped 1995, B = shipped 1995H2..1996
    // (overlapping ranges → nontrivial intersection).
    "x_kmv_setops" -> ((s, dir) => {
      val liDf = t(s, dir, "lineitem")
      val k = 64
      def keys(lo: String, hi: String) = liDf
        .filter(col("l_shipdate") >= lit(lo).cast("timestamp") &&
          col("l_shipdate") < lit(hi).cast("timestamp"))
        .select(col("l_orderkey")).distinct()
      def sketch(df: DataFrame) = df
        .select(conv(substring(md5(col("l_orderkey").cast("string")), 1, 8),
          16, 10).cast("long").as("h"))
        .distinct().orderBy("h").limit(k)
      val (aKeys, bKeys) = (keys("1995-01-01", "1996-01-01"),
        keys("1995-07-01", "1997-01-01"))
      val (kA, kB) = (sketch(aKeys), sketch(bKeys))
      val kU = kA.union(kB).distinct().orderBy("h").limit(k)
      val flagged = kU
        .join(kA.withColumn("in_a", lit(1)), Seq("h"), "left")
        .join(kB.withColumn("in_b", lit(1)), Seq("h"), "left")
        .agg(count(lit(1)).as("n_u"), max(col("h")).as("kth"),
          sum(coalesce(col("in_a"), lit(0)) * coalesce(col("in_b"), lit(0)))
            .as("n_both"))
      val exact = keys("1995-01-01", "1997-01-01")
        .agg(count(lit(1)).as("exact_union"))
        .crossJoin(
          aKeys.join(bKeys, Seq("l_orderkey"), "left_semi")
            .agg(count(lit(1)).as("exact_inter")))
      val estU = when(col("n_u") < k, col("n_u").cast("double"))
        .otherwise(lit((k - 1).toDouble * 4294967296.0) / col("kth").cast("double"))
      flagged.crossJoin(exact).select(
        round(estU, 4).as("est_union"),
        col("exact_union"),
        col("n_both"),
        round((col("n_both").cast("double") / col("n_u").cast("double"))
          * estU, 4).as("est_inter"),
        col("exact_inter"))
    }),

    // As-of join: every event picks up the user's latest prior (or
    // simultaneous) signup. DuckDB's native ASOF LEFT JOIN is the
    // oracle; the Spark side is the union-window composition
    // (graft.operators.Joins.asofJoin).
    "j_asof_signup" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val signups = ev.filter(col("event_type") === "signup")
        .groupBy("user_id", "ts")
        .agg(max(col("event_id")).as("event_id")) // dedupe simultaneous
      Joins.asofJoin(
        left = ev.select("event_id", "user_id", "ts"),
        right = signups,
        keys = Seq("user_id"),
        leftTs = "ts", rightTs = "ts",
        rightPayload = Seq("event_id", "ts"))
        .select(
          col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_s"),
          coalesce(col("event_id_asof"), lit(-1L)).as("signup_id"),
          coalesce(date_format(col("ts_asof"), "yyyy-MM-dd HH:mm:ss.SSSSSS"),
            lit("none")).as("signup_ts_s"))
        .orderBy("event_id")
    }),
  )

  val oracles: Map[String, String] = Map(
    // Sub-k convention (matches KmvSketch.finish): a group holding fewer
    // than k=64 distinct hashes reports the EXACT distinct-hash count, so
    // the oracle keys on rn = LEAST(nh, 64) instead of rn = 64 — a bare
    // rn = 64 would silently DROP such groups (latent mismatch at tiny
    // SFs or under a higher-cardinality group column).
    "x_kmv_distinct" ->
      """WITH ks AS (SELECT DISTINCT l_returnflag,
        |    CAST(('0x' || substring(md5(CAST(l_orderkey AS VARCHAR)), 1, 8))
        |      AS BIGINT) AS h
        |  FROM lineitem),
        |r AS (SELECT l_returnflag, h,
        |    row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn,
        |    count(*) OVER (PARTITION BY l_returnflag) AS nh
        |  FROM ks),
        |kth AS (SELECT l_returnflag,
        |    CASE WHEN nh < 64 THEN CAST(nh AS DOUBLE)
        |         ELSE 63.0 * 4294967296.0 / CAST(h AS DOUBLE) END AS est
        |  FROM r WHERE rn = LEAST(nh, 64)),
        |ex AS (SELECT l_returnflag, count(DISTINCT l_orderkey)
        |    AS exact_distinct
        |  FROM lineitem GROUP BY 1)
        |SELECT k.l_returnflag,
        |  round(est, 4) AS est_distinct,
        |  ex.exact_distinct,
        |  round((est / CAST(exact_distinct AS DOUBLE) - 1) * 100, 4)
        |    AS err_pct
        |FROM kth k JOIN ex ON k.l_returnflag = ex.l_returnflag
        |ORDER BY k.l_returnflag""".stripMargin,
    "x_kmv_setops" ->
      """WITH a AS (SELECT DISTINCT l_orderkey FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-01-01'),
        |b AS (SELECT DISTINCT l_orderkey FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1995-07-01'
        |    AND l_shipdate < TIMESTAMP '1997-01-01'),
        |ka AS (SELECT DISTINCT CAST(('0x' ||
        |      substring(md5(CAST(l_orderkey AS VARCHAR)), 1, 8)) AS BIGINT)
        |    AS h
        |  FROM a ORDER BY h LIMIT 64),
        |kb AS (SELECT DISTINCT CAST(('0x' ||
        |      substring(md5(CAST(l_orderkey AS VARCHAR)), 1, 8)) AS BIGINT)
        |    AS h
        |  FROM b ORDER BY h LIMIT 64),
        |ku AS (SELECT DISTINCT h FROM (
        |    SELECT h FROM ka UNION ALL SELECT h FROM kb) u
        |  ORDER BY h LIMIT 64),
        |fl AS (SELECT count(*) AS n_u, max(ku.h) AS kth,
        |    CAST(sum(CASE WHEN ka.h IS NOT NULL AND kb.h IS NOT NULL
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_both
        |  FROM ku LEFT JOIN ka ON ku.h = ka.h LEFT JOIN kb ON ku.h = kb.h),
        |ex AS (SELECT
        |    (SELECT count(DISTINCT l_orderkey) FROM lineitem
        |      WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |        AND l_shipdate < TIMESTAMP '1997-01-01') AS exact_union,
        |    (SELECT count(*) FROM a
        |      WHERE l_orderkey IN (SELECT l_orderkey FROM b)) AS exact_inter)
        |SELECT
        |  round(CASE WHEN n_u < 64 THEN CAST(n_u AS DOUBLE)
        |    ELSE 63.0 * 4294967296.0 / CAST(kth AS DOUBLE) END, 4)
        |    AS est_union,
        |  exact_union, n_both,
        |  round((CAST(n_both AS DOUBLE) / CAST(n_u AS DOUBLE)) *
        |    (CASE WHEN n_u < 64 THEN CAST(n_u AS DOUBLE)
        |      ELSE 63.0 * 4294967296.0 / CAST(kth AS DOUBLE) END), 4)
        |    AS est_inter,
        |  exact_inter
        |FROM fl, ex""".stripMargin,
    "j_asof_signup" ->
      """WITH su AS (SELECT user_id, ts, max(event_id) AS sid
        |  FROM events WHERE event_type = 'signup' GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id,
        |  strftime(e.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_s,
        |  COALESCE(su.sid, -1) AS signup_id,
        |  COALESCE(strftime(su.ts, '%Y-%m-%d %H:%M:%S.%f'), 'none')
        |    AS signup_ts_s
        |FROM events e
        |ASOF LEFT JOIN su ON e.user_id = su.user_id AND e.ts >= su.ts
        |ORDER BY e.event_id""".stripMargin,
  )
}
