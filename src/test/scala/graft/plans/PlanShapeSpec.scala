package graft.plans

import org.apache.spark.sql.DataFrame

import graft.SparkFunSuite

/** Physical-plan regression guards: the scale properties SCALING.md
  * documents (broadcast star joins, scan-level predicate pushdown,
  * top-k without a global sort, exchange reuse, no row-explosion /
  * cartesian shapes in the LLM operators) asserted against the FINAL
  * (post-AQE) executed plan, so a refactor that silently reintroduces a
  * scale-killer fails a spec rather than a bench round.
  */
class PlanShapeSpec extends SparkFunSuite {

  /** Execute, then render the AQE-final physical plan. */
  private def finalPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  private def plan(name: String): String =
    finalPlan(graft.SparkEntry.queries(name)(spark, sf0001))

  test("q5_region_revenue: all dims broadcast, no sort-merge join") {
    val p = plan("q5_region_revenue")
    assert(!p.contains("SortMergeJoin"), p)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p)
  }

  test("m_partition_count: partition predicate reaches the parquet scan") {
    val p = plan("m_partition_count")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("l_shipdate"), p)
  }

  test("q_topk: global top-k uses per-partition heaps, not a full sort") {
    val p = plan("q_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("d_minhash: band self-join reuses the signature exchange; no cartesian") {
    val p = plan("d_minhash")
    assert(p.contains("ReusedExchange") || p.contains("ReusedQueryStage"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("s_ann_ivf: assignment has no row explosion and no cartesian") {
    val p = plan("s_ann_ivf")
    assert(!p.contains("Generate"), p) // no posexplode in the assignment
    assert(!p.contains("CartesianProduct"), p)
  }

  test("s_embed_neardup: candidates from equality joins only") {
    val p = plan("s_embed_neardup")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("s_embed_neardup_wide: equality-join candidates; one signature exchange reused") {
    val p = plan("s_embed_neardup_wide")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the band self-join must canonicalize both sides onto ONE
    // (band, key) exchange (ReuseExchange), like d_minhash's — the
    // wide signature changes the key WIDTH, never the plan shape
    assert(p.contains("ReusedExchange"), p)
  }

  test("e_funnel_cohort: conditional-min chain runs without window operators") {
    val p = plan("e_funnel_cohort")
    assert(!p.contains("Window"), p)
  }

  test("q13_order_distribution: outer join survives, one custkey exchange feeds both aggs") {
    val p = plan("q13_order_distribution")
    // zero-order customers must reach the count — the left join must
    // not degrade to inner under the ON-clause predicate
    assert(p.contains("LeftOuter"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q22_sales_opportunity: anti join + broadcast scalar, no cartesian") {
    val p = plan("q22_sales_opportunity")
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q10_returned_items: dims broadcast, top-20 without a global sort") {
    val p = plan("q10_returned_items")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q11_important_parts: 1-row broadcast threshold, no cartesian") {
    val p = plan("q11_important_parts")
    assert(!p.contains("CartesianProduct"), p)
    // the HAVING threshold must arrive as a broadcast, not a shuffle
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
  }

  test("q16_supplier_counts: NOT IN lowered to anti-join, part broadcast") {
    val p = plan("q16_supplier_counts")
    assert(p.contains("LeftAnti"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q20_promotable_suppliers: IN-subquery lowered to semi-join, no cartesian") {
    val p = plan("q20_promotable_suppliers")
    assert(p.contains("LeftSemi"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("d_winnow_pairs: self-join reuses ONE winnow exchange; no cartesian") {
    val p = plan("d_winnow_pairs")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the expensive winnow pass must be computed once, not per leg
    assert(p.contains("ReusedExchange") || p.contains("ReusedQueryStage"), p)
  }

  test("t_tfidf: df-join shuffles on the term key; 1-row N broadcast") {
    val p = plan("t_tfidf")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("mm_neardup: banded pairing via equality joins only") {
    val p = plan("mm_neardup")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("hive-layout partition dirs prune at the scan (PartitionFilters)") {
    val s = spark
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("prune").toString
    s.read.parquet(s"$sf0001/lineitem.parquet")
      .withColumn("l_month", date_format(col("l_shipdate"), "yyyy-MM"))
      .write.partitionBy("l_month").mode("overwrite").parquet(dir)
    val one = s.read.option("basePath", dir).parquet(dir)
      .filter(col("l_month") === "1995-03")
      .select("l_orderkey", "l_quantity")
    one.collect()
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("l_month"), plan)
    // the scan must touch ONE partition's files, not all of them
    val scanned = one.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount
    }
    assert(scanned.contains(1), s"expected 1 selected partition, got $scanned")
  }

  test("AQE splits a skewed join partition at runtime (skew=true in plan)") {
    val s = spark
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.shuffle.partitions" -> "4")
    val prev = confs.keys.map(k => k -> s.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => s.conf.set(k, v) }
      import org.apache.spark.sql.functions._
      // one hot key (0) carrying ~97% of the rows, plus a long payload
      // so the hot partition clears the size threshold
      val skewed = s.range(50000).select(
        when(col("id") % 30 =!= 0, 0L).otherwise(col("id") % 1000).as("k"),
        concat(lit("x"), col("id").cast("string"),
          lit("p" * 64)).as("payload"))
      val other = s.range(1000).select(col("id").as("k"),
        col("id").cast("string").as("name"))
      val joined = skewed.join(other, "k")
      // collect() executes THIS dataset's queryExecution (count() would
      // build and run a separate one, leaving this plan un-finalized)
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), plan.take(4000))
    } finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  test("q_lateral: correlated LIMIT-per-group decorrelates, never re-executes") {
    val p = plan("q_lateral")
    // Catalyst must rewrite the lateral subquery into a ranked join with
    // WindowGroupLimit (map-side partial top-k per group) — a
    // nested-loop re-execution per outer row would be the scale-killer.
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q21_sole_blame: multi EXISTS/NOT EXISTS decorrelates to semi/anti joins") {
    val p = plan("q21_sole_blame")
    // The deepest standard decorrelation pattern: both correlated
    // subqueries must become equi-joins on orderkey (semi + anti) with
    // the suppkey disequality as a join residual — never a nested-loop
    // or cartesian re-execution of the fact per outer row.
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("LeftAnti"), p)
  }

  test("q17_small_quantity: cross-table correlated scalar agg decorrelates") {
    val p = plan("q17_small_quantity")
    // the correlated per-partkey average must become ONE aggregate over
    // the fact joined back on l_partkey — not a re-executed subquery or
    // nested-loop per outer row
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("t_quality: text scoring is map-only — no shuffle before the sort") {
    val p = plan("t_quality")
    // one exchange for the final presentation sort is allowed; no
    // aggregate/join exchanges should appear.
    assert(!p.contains("SortMergeJoin") && !p.contains("HashAggregate"), p)
  }

  test("e_cusum: all three window frames ride ONE event_type exchange") {
    val p = plan("e_cusum")
    // count-shuffle hash exchange + one window exchange + the final
    // presentation range exchange — the two cumulative windows and the
    // whole-partition target windows must NOT add exchanges of their own.
    // (AQE renders Final + Initial sections; count the final one only.)
    val finalOnly = p.split("== Initial Plan ==").head
    val hashEx = "Exchange hashpartitioning".r.findAllIn(finalOnly).length
    assert(hashEx == 2, s"expected agg+window hash exchanges only:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("Join"), p)
  }

  test("e_autocorr: one window computes all three lags; no join") {
    val p = plan("e_autocorr")
    assert("Window ".r.findAllIn(p).length <= 2,
      s"lags must share one window pass:\n$p")
    assert(!p.contains("Join"), p)
  }

  test("g_pagerank warm search: per-round ranks broadcast, no SMJ") {
    val p = plan("g_pagerank")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("g_rank_weighted warm search: bucketed edges, only rank rows exchange") {
    val p = plan("g_rank_weighted")
    // the weighted |E| table must come off the standing BUCKETED scan
    // (its bucket spec absorbs the per-round join distribution)…
    assert(p.contains("SelectedBucketsCount"), p)
    // …so each of the 3 rounds pays exactly 2 hash exchanges (the |V|
    // rank rows into the bucket layout + the map-combined sum to dst);
    // an un-bucketed layout re-exchanges the edge side every round and
    // pushes this count to ≥9. (AQE renders Final + Initial sections;
    // count the final one only.)
    val finalOnly = p.split("== Initial Plan ==").head
    val hashEx = "Exchange hashpartitioning".r.findAllIn(finalOnly).length
    assert(hashEx <= 6, s"expected ≤2 hash exchanges per rank round:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("as-of tolerance/strict variants add ZERO exchanges over the base as-of") {
    // the tolerance gate is a map-side comparison on the carried
    // payload and strict is a sort-order flip — neither may cost a
    // shuffle, a join, or an extra window pass vs j_asof_signup
    def shape(name: String): (Int, Int) = {
      val finalOnly = plan(name).split("== Initial Plan ==").head
      ("Exchange hashpartitioning".r.findAllIn(finalOnly).length,
        "Window ".r.findAllIn(finalOnly).length)
    }
    val base = shape("j_asof_signup")
    assert(shape("j_asof_tolerance") == base,
      s"tolerance changed the exchange/window shape: " +
        s"${shape("j_asof_tolerance")} vs $base")
    assert(shape("j_asof_strict") == base,
      s"strict changed the exchange/window shape: " +
        s"${shape("j_asof_strict")} vs $base")
    Seq("j_asof_tolerance", "j_asof_strict").foreach { n =>
      val p = plan(n)
      assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
        s"$n must stay join-free (union-window composition):\n$p")
    }
    // same claim for the nearest pair: strict-nearest is the identical
    // two-scan composition with only the tag sort order flipped
    val nearBase = shape("j_asof_nearest")
    assert(shape("j_asof_nearest_strict") == nearBase,
      s"strict-nearest changed the exchange/window shape: " +
        s"${shape("j_asof_nearest_strict")} vs $nearBase")
    val pns = plan("j_asof_nearest_strict")
    assert(!pns.contains("SortMergeJoin") && !pns.contains("CartesianProduct"),
      s"j_asof_nearest_strict must stay join-free:\n$pns")
  }

  test("a_dq_psi: type filter pushed to both scans; bin counts map-combine; no cartesian") {
    val p = plan("a_dq_psi")
    // each side's event_type equality must reach the parquet scan —
    // at 100 TB the PSI pass reads only the compared slices
    assert("EqualTo\\(event_type,(view|purchase)\\)".r
      .findAllIn(p).nonEmpty, p)
    // the per-bucket counts must partial-aggregate BEFORE their
    // exchange: only ≤ bins rows per side ever cross the wire
    assert(p.contains("partial_count") || p.contains("Partial"), p)
    // 1-row bounds/totals ride broadcast joins, never a cartesian
    assert(!p.contains("CartesianProduct"), p)
  }

  test("j_range_binned: no multi-distinct Expand over the 4.5M-pair join output") {
    // two exact distincts over different keys would triple the binned
    // join's output through one shuffle; the two-level chain + sibling
    // distinct must keep the plan Expand-free
    val p = plan("j_range_binned")
    assert(!p.contains("Expand"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x_approx_distinct: no multi-distinct Expand; linear sibling passes") {
    // two exact countDistinct columns in ONE agg plan via Expand
    // (~4× row replication of lineitem — measured as the most
    // expensive query on the r16 board); the two-level sibling-pass
    // form must keep every pass linear
    val p = plan("x_approx_distinct")
    assert(!p.contains("Expand"), p)
    assert(!p.contains("CartesianProduct"), p)
  }
}
