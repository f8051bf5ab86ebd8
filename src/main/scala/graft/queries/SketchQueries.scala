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
