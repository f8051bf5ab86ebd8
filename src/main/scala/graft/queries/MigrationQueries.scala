package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.PortableFns._
import graft.sources.Sources

/** The reference's SQL surface re-expressed over the testdata
  * (SURVEY.md §2A): lineitem partitioned by month(l_shipdate) stands in
  * for a ClickHouse MergeTree table with a date-derived partition key.
  * Each entry has a DuckDB oracle in [[MigrationQueries.oracles]].
  */
object MigrationQueries {

  private def li(s: SparkSession, dir: String) = Sources.table(s, dir, "lineitem")

  /** Completed-partition fixture for the resume diff (SURVEY.md A25). */
  private val completedParts = Seq("1995-01", "1995-02", "1995-03")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A24: partition enumeration — DISTINCT + ORDER BY over the key only.
    "m_partition_enum" -> ((s, dir) =>
      li(s, dir)
        .select(monthStr(col("l_shipdate")).as("part"))
        .distinct()
        .orderBy("part")),

    // A20: filtered scalar count for one partition. The month-equality
    // predicate is expressed as a timestamp RANGE so it pushes into the
    // parquet scan (row-group pruning); identical row set.
    "m_partition_count" -> ((s, dir) =>
      li(s, dir)
        .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .agg(count(lit(1)).as("cnt"))),

    // One-pass upgrade of A20: every partition's count in a single scan
    // (the reference issues 2 queries per partition; SURVEY.md §6).
    "m_counts_by_partition" -> ((s, dir) =>
      li(s, dir)
        .groupBy(monthStr(col("l_shipdate")).as("part"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("part")),

    // Partition-SKEW diagnosis — the planning step before a migration
    // (or any shuffle keyed on the partition column): per-partition row
    // counts plus each partition's share of the table and a hot flag
    // (> 1.5× the mean). The per-partition counts are the same one-pass
    // aggregate as m_counts_by_partition; the table totals reduce to a
    // single broadcast row. Hot partitions are the ones Skew.saltedAgg /
    // AQE skew-splitting exist for.
    "m_partition_skew" -> ((s, dir) => {
      val counts = li(s, dir)
        .groupBy(monthStr(col("l_shipdate")).as("part"))
        .agg(count(lit(1)).as("n_rows"))
      val totals = counts.agg(sum(col("n_rows")).as("total"),
        count(lit(1)).as("n_parts"))
      counts.crossJoin(broadcast(totals))
        .select(col("part"), col("n_rows"),
          round(col("n_rows").cast("double") / col("total").cast("double"), 6)
            .as("share"),
          (col("n_rows").cast("double") >
            lit(1.5) * col("total").cast("double") / col("n_parts").cast("double"))
            .as("hot"))
        .orderBy("part")
    }),

    // Composite-key analogs of A24/A20 (SURVEY.md §7.5 hard part 1): the
    // two-key (month, returnflag) partitioning at the oracle-checked
    // query surface — enumeration and the one-pass per-partition counts.
    "m_composite_enum" -> ((s, dir) =>
      li(s, dir)
        .select(monthStr(col("l_shipdate")).as("part_month"),
          col("l_returnflag").as("part_rf"))
        .distinct()
        .orderBy("part_month", "part_rf")),

    "m_composite_count" -> ((s, dir) =>
      li(s, dir)
        .groupBy(monthStr(col("l_shipdate")).as("part_month"),
          col("l_returnflag").as("part_rf"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("part_month", "part_rf")),

    // A25: resume set-difference as a left_anti join (EXCEPT semantics).
    "m_resume_diff" -> ((s, dir) => {
      import s.implicits._
      val all = li(s, dir)
        .select(monthStr(col("l_shipdate")).as("part")).distinct()
      val done = completedParts.toDF("part")
      all.join(broadcast(done), Seq("part"), "left_anti").orderBy("part")
    }),

    // A10/A15: the filtered copy — partition-predicate scan, projected.
    // (The write side is exercised by CopyService + its integration spec;
    // here the scan half is oracle-checked.)
    "m_filtered_copy" -> ((s, dir) =>
      li(s, dir)
        .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .select(
          col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"),
          dateStr(col("l_shipdate")).as("l_shipdate_s"))
        .orderBy("l_orderkey", "l_linenumber")),

    // A20+A35: src/dst count validation as ONE full-outer join of two
    // single-pass aggregates (dst simulated as a partial copy).
    "m_validation_gate" -> ((s, dir) => {
      val src = li(s, dir)
        .groupBy(monthStr(col("l_shipdate")).as("part"))
        .agg(count(lit(1)).as("src_count"))
      val dst = li(s, dir)
        .filter(col("l_quantity") <= 49)
        .groupBy(monthStr(col("l_shipdate")).as("part"))
        .agg(count(lit(1)).as("dst_count"))
      src.join(dst, Seq("part"), "full_outer")
        .select(
          col("part"),
          coalesce(col("src_count"), lit(0L)).as("src_count"),
          coalesce(col("dst_count"), lit(0L)).as("dst_count"),
          (coalesce(col("src_count"), lit(0L)) ===
            coalesce(col("dst_count"), lit(0L))).as("passed"))
        .orderBy("part")
    }),

    // A17: NOT IN set predicate (view exclusion analog).
    "m_not_in" -> ((s, dir) =>
      Sources.table(s, dir, "orders")
        .filter(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("o_orderstatus")),

    // A19: substring-membership predicate (skip-if-already-migrated analog).
    "m_skip_check" -> ((s, dir) =>
      Sources.table(s, dir, "documents")
        .filter(col("text").contains("spark"))
        .groupBy("lang")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("lang")),

    // Incremental-sync delta detection — the operation a RE-RUN of the
    // migrator needs once a target already exists: which partitions
    // drifted since the last sync? Per partition, ONE scan of each side
    // computes (row count, order-independent content checksum: sum of a
    // 32-bit md5 prefix over a typed row fingerprint); a full-outer join
    // on the partition key classifies every partition as clean / missing
    // (in src only) / orphaned (in dst only) / changed (content drift
    // count alone would miss). This is the scale shape for 100 TB
    // incremental syncs: no row-level compare, no shuffle of row data —
    // two map-side-combined aggregates of O(partitions) rows each, so
    // re-sync work is proportional to the drift, not the table. The
    // checksum sums 32-bit values in a 64-bit long (overflow-free up to
    // ~2^31 rows per partition; at bigger partitions widen to
    // decimal(38,0) — DuckDB's hugeint — before summing). The simulated
    // prior target drops one whole partition and one partition's
    // high-quantity rows, so both non-clean classes appear.
    "m_delta_detect" -> ((s, dir) => {
      val src = li(s, dir)
      val dst = src.filter(
        monthStr(col("l_shipdate")) =!= "1995-06" &&
          !(monthStr(col("l_shipdate")) === "1996-03" &&
            col("l_quantity") > 40))
      // The per-row 32-bit md5 prefix accumulates as DECIMAL(38,0): a
      // signed-64 sum would wrap silently past ~2^31 rows/partition while
      // the DuckDB oracle (HUGEINT sum) kept exact values — the two
      // engines diverging in different ways at overflow. Decimal keeps
      // both sides exact to 10^38 (≈2^95 rows), far past any partition.
      def state(df: DataFrame, cnt: String, ck: String) = df
        .groupBy(monthStr(col("l_shipdate")).as("part"))
        .agg(count(lit(1)).as(cnt),
          // fused md5-prefix (graft.plans.Md5PrefixLong) — same value
          // as the conv/substring chain the oracle SQL spells
          sum(graft.plans.HashOps.md5PrefixLong(concat_ws("|",
            col("l_orderkey").cast("string"),
            col("l_linenumber").cast("string"),
            col("l_quantity").cast("long").cast("string")), 1, 8)
            .cast(org.apache.spark.sql.types.DecimalType(38, 0))).as(ck))
      state(src, "src_count", "src_ck")
        .join(state(dst, "dst_count", "dst_ck"), Seq("part"), "full_outer")
        .select(col("part"),
          coalesce(col("src_count"), lit(0L)).as("src_count"),
          coalesce(col("dst_count"), lit(0L)).as("dst_count"),
          when(col("dst_count").isNull, lit("missing"))
            .when(col("src_count").isNull, lit("orphaned"))
            .when(col("src_count") === col("dst_count") &&
              col("src_ck") === col("dst_ck"), lit("clean"))
            .otherwise(lit("changed")).as("status"))
        .orderBy("part")
    }),
  )

  val oracles: Map[String, String] = Map(
    "m_partition_enum" ->
      """SELECT DISTINCT strftime(l_shipdate, '%Y-%m') AS part
        |FROM lineitem ORDER BY part""".stripMargin,
    "m_partition_count" ->
      """SELECT count(*) AS cnt FROM lineitem
        |WHERE strftime(l_shipdate, '%Y-%m') = '1996-03'""".stripMargin,
    "m_partition_skew" ->
      """WITH c AS (SELECT strftime(l_shipdate, '%Y-%m') AS part,
        |    count(*) AS n_rows
        |  FROM lineitem GROUP BY 1),
        |t AS (SELECT sum(n_rows) AS total, count(*) AS n_parts FROM c)
        |SELECT part, n_rows,
        |  round(CAST(n_rows AS DOUBLE) / CAST(total AS DOUBLE), 6) AS share,
        |  CAST(n_rows AS DOUBLE)
        |    > 1.5 * CAST(total AS DOUBLE) / CAST(n_parts AS DOUBLE) AS hot
        |FROM c, t ORDER BY part""".stripMargin,
    "m_counts_by_partition" ->
      """SELECT strftime(l_shipdate, '%Y-%m') AS part, count(*) AS cnt
        |FROM lineitem GROUP BY 1 ORDER BY part""".stripMargin,
    "m_composite_enum" ->
      """SELECT DISTINCT strftime(l_shipdate, '%Y-%m') AS part_month,
        |  l_returnflag AS part_rf
        |FROM lineitem ORDER BY part_month, part_rf""".stripMargin,
    "m_composite_count" ->
      """SELECT strftime(l_shipdate, '%Y-%m') AS part_month,
        |  l_returnflag AS part_rf, count(*) AS cnt
        |FROM lineitem GROUP BY 1, 2 ORDER BY part_month, part_rf""".stripMargin,
    "m_resume_diff" ->
      """SELECT DISTINCT strftime(l_shipdate, '%Y-%m') AS part FROM lineitem
        |WHERE strftime(l_shipdate, '%Y-%m')
        |  NOT IN ('1995-01', '1995-02', '1995-03')
        |ORDER BY part""".stripMargin,
    "m_filtered_copy" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
        |  strftime(l_shipdate, '%Y-%m-%d') AS l_shipdate_s
        |FROM lineitem WHERE strftime(l_shipdate, '%Y-%m') = '1996-03'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "m_validation_gate" ->
      """WITH src AS (
        |  SELECT strftime(l_shipdate, '%Y-%m') AS part, count(*) AS src_count
        |  FROM lineitem GROUP BY 1),
        |dst AS (
        |  SELECT strftime(l_shipdate, '%Y-%m') AS part, count(*) AS dst_count
        |  FROM lineitem WHERE l_quantity <= 49 GROUP BY 1)
        |SELECT COALESCE(src.part, dst.part) AS part,
        |  COALESCE(src_count, 0) AS src_count,
        |  COALESCE(dst_count, 0) AS dst_count,
        |  COALESCE(src_count, 0) = COALESCE(dst_count, 0) AS passed
        |FROM src FULL JOIN dst ON src.part = dst.part
        |ORDER BY part""".stripMargin,
    "m_not_in" ->
      """SELECT o_orderstatus, count(*) AS cnt FROM orders
        |WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |GROUP BY 1 ORDER BY o_orderstatus""".stripMargin,
    "m_skip_check" ->
      """SELECT lang, count(*) AS cnt FROM documents
        |WHERE text LIKE '%spark%'
        |GROUP BY 1 ORDER BY lang""".stripMargin,
    "m_delta_detect" ->
      """WITH fp AS (SELECT strftime(l_shipdate, '%Y-%m') AS part,
        |    l_quantity,
        |    CAST(('0x' || substring(md5(
        |        CAST(l_orderkey AS VARCHAR) || '|' ||
        |        CAST(l_linenumber AS VARCHAR) || '|' ||
        |        CAST(CAST(l_quantity AS BIGINT) AS VARCHAR)), 1, 8))
        |      AS BIGINT) AS h
        |  FROM lineitem),
        |src AS (SELECT part, count(*) AS src_count,
        |    sum(h) AS src_ck
        |  FROM fp GROUP BY 1),
        |dst AS (SELECT part, count(*) AS dst_count,
        |    sum(h) AS dst_ck
        |  FROM fp
        |  WHERE part <> '1995-06' AND NOT (part = '1996-03' AND l_quantity > 40)
        |  GROUP BY 1)
        |SELECT COALESCE(src.part, dst.part) AS part,
        |  COALESCE(src_count, 0) AS src_count,
        |  COALESCE(dst_count, 0) AS dst_count,
        |  CASE WHEN dst_count IS NULL THEN 'missing'
        |       WHEN src_count IS NULL THEN 'orphaned'
        |       WHEN src_count = dst_count AND src_ck = dst_ck THEN 'clean'
        |       ELSE 'changed' END AS status
        |FROM src FULL JOIN dst ON src.part = dst.part
        |ORDER BY part""".stripMargin,
  )
}
